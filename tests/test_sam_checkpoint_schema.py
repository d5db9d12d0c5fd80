"""Day-one loadability of the official SAM checkpoints, without the files.

The reference consumes SAM via the pip `segment_anything` package
(tools/base_segmenter.py:7,25-27 — sam_model_registry[...](checkpoint)), so
unlike XMem/E2FGVI there is no vendored torch source to cross-check against.
This module encodes the EXACT key/shape schema of `sam_vit_b_01ec64.pth` /
`sam_vit_h_4b8939.pth` / `sam_hq_vit_h.pth` independently (generated from
the published architecture constants, the same way build_sam.py constructs
the modules) and proves the converter maps it 1:1 onto this framework's
param tree:

  - vit_b: full file roundtrip (torch.save -> load_sam_checkpoint ->
    tree_shapes equality with sam_init).
  - vit_h / HQ vit_h: schema-level roundtrip via jax.eval_shape (no 2.5 GB
    materialization) with the converter's transform rules applied
    symbolically.
"""

from typing import Dict, Tuple

import jax
import numpy as np
import pytest
import torch

from vosesam_tpu.config import SAMConfig
from vosesam_tpu.models.sam import predictor
from vosesam_tpu.utils import checkpoint as ckpt

EMBED = 256


def _attn(s, p, rate):
    idim = EMBED // rate
    for proj, shp in (("q_proj", (idim, EMBED)), ("k_proj", (idim, EMBED)),
                      ("v_proj", (idim, EMBED)), ("out_proj", (EMBED, idim))):
        s[f"{p}.{proj}.weight"] = shp
        s[f"{p}.{proj}.bias"] = (shp[0],)


def _mlp3(s, p, out):
    s[f"{p}.layers.0.weight"] = (EMBED, EMBED)
    s[f"{p}.layers.0.bias"] = (EMBED,)
    s[f"{p}.layers.1.weight"] = (EMBED, EMBED)
    s[f"{p}.layers.1.bias"] = (EMBED,)
    s[f"{p}.layers.2.weight"] = (out, EMBED)
    s[f"{p}.layers.2.bias"] = (out,)


def official_sam_schema(variant: str, hq: bool) -> Dict[str, Tuple[int, ...]]:
    """(key -> torch shape) of the official checkpoint state dict."""
    dims = {"vit_b": (768, 12, 12, (2, 5, 8, 11)),
            "vit_l": (1024, 24, 16, (5, 11, 17, 23)),
            "vit_h": (1280, 32, 16, (7, 15, 23, 31))}
    d, depth, heads, glb = dims[variant]
    hd = d // heads
    s: Dict[str, Tuple[int, ...]] = {}

    # ---- image encoder (ImageEncoderViT, 1024/16 = 64 token grid) --------
    s["image_encoder.pos_embed"] = (1, 64, 64, d)
    s["image_encoder.patch_embed.proj.weight"] = (d, 3, 16, 16)
    s["image_encoder.patch_embed.proj.bias"] = (d,)
    for i in range(depth):
        p = f"image_encoder.blocks.{i}"
        rel = 2 * 64 - 1 if i in glb else 2 * 14 - 1
        s[f"{p}.norm1.weight"] = (d,)
        s[f"{p}.norm1.bias"] = (d,)
        s[f"{p}.attn.rel_pos_h"] = (rel, hd)
        s[f"{p}.attn.rel_pos_w"] = (rel, hd)
        s[f"{p}.attn.qkv.weight"] = (3 * d, d)
        s[f"{p}.attn.qkv.bias"] = (3 * d,)
        s[f"{p}.attn.proj.weight"] = (d, d)
        s[f"{p}.attn.proj.bias"] = (d,)
        s[f"{p}.norm2.weight"] = (d,)
        s[f"{p}.norm2.bias"] = (d,)
        s[f"{p}.mlp.lin1.weight"] = (4 * d, d)
        s[f"{p}.mlp.lin1.bias"] = (4 * d,)
        s[f"{p}.mlp.lin2.weight"] = (d, 4 * d)
        s[f"{p}.mlp.lin2.bias"] = (d,)
    s["image_encoder.neck.0.weight"] = (EMBED, d, 1, 1)
    s["image_encoder.neck.1.weight"] = (EMBED,)
    s["image_encoder.neck.1.bias"] = (EMBED,)
    s["image_encoder.neck.2.weight"] = (EMBED, EMBED, 3, 3)
    s["image_encoder.neck.3.weight"] = (EMBED,)
    s["image_encoder.neck.3.bias"] = (EMBED,)

    # ---- prompt encoder --------------------------------------------------
    s["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = (2, 128)
    for i in range(4):
        s[f"prompt_encoder.point_embeddings.{i}.weight"] = (1, EMBED)
    s["prompt_encoder.not_a_point_embed.weight"] = (1, EMBED)
    s["prompt_encoder.no_mask_embed.weight"] = (1, EMBED)
    s["prompt_encoder.mask_downscaling.0.weight"] = (4, 1, 2, 2)
    s["prompt_encoder.mask_downscaling.0.bias"] = (4,)
    s["prompt_encoder.mask_downscaling.1.weight"] = (4,)
    s["prompt_encoder.mask_downscaling.1.bias"] = (4,)
    s["prompt_encoder.mask_downscaling.3.weight"] = (16, 4, 2, 2)
    s["prompt_encoder.mask_downscaling.3.bias"] = (16,)
    s["prompt_encoder.mask_downscaling.4.weight"] = (16,)
    s["prompt_encoder.mask_downscaling.4.bias"] = (16,)
    s["prompt_encoder.mask_downscaling.6.weight"] = (EMBED, 16, 1, 1)
    s["prompt_encoder.mask_downscaling.6.bias"] = (EMBED,)

    # ---- mask decoder (TwoWayTransformer depth 2) ------------------------
    for i in (0, 1):
        p = f"mask_decoder.transformer.layers.{i}"
        _attn(s, f"{p}.self_attn", 1)
        _attn(s, f"{p}.cross_attn_token_to_image", 2)
        _attn(s, f"{p}.cross_attn_image_to_token", 2)
        for n in (1, 2, 3, 4):
            s[f"{p}.norm{n}.weight"] = (EMBED,)
            s[f"{p}.norm{n}.bias"] = (EMBED,)
        s[f"{p}.mlp.lin1.weight"] = (2048, EMBED)
        s[f"{p}.mlp.lin1.bias"] = (2048,)
        s[f"{p}.mlp.lin2.weight"] = (EMBED, 2048)
        s[f"{p}.mlp.lin2.bias"] = (EMBED,)
    _attn(s, "mask_decoder.transformer.final_attn_token_to_image", 2)
    s["mask_decoder.transformer.norm_final_attn.weight"] = (EMBED,)
    s["mask_decoder.transformer.norm_final_attn.bias"] = (EMBED,)

    s["mask_decoder.iou_token.weight"] = (1, EMBED)
    s["mask_decoder.mask_tokens.weight"] = (4, EMBED)
    # ConvTranspose2d weights are IOHW in torch
    s["mask_decoder.output_upscaling.0.weight"] = (EMBED, 64, 2, 2)
    s["mask_decoder.output_upscaling.0.bias"] = (64,)
    s["mask_decoder.output_upscaling.1.weight"] = (64,)
    s["mask_decoder.output_upscaling.1.bias"] = (64,)
    s["mask_decoder.output_upscaling.3.weight"] = (64, 32, 2, 2)
    s["mask_decoder.output_upscaling.3.bias"] = (32,)
    for i in range(4):
        _mlp3(s, f"mask_decoder.output_hypernetworks_mlps.{i}", 32)
    _mlp3(s, "mask_decoder.iou_prediction_head", 5 if hq else 4)

    if hq:
        s["mask_decoder.hf_token.weight"] = (1, EMBED)
        _mlp3(s, "mask_decoder.hf_mlp", 32)
        s["mask_decoder.compress_vit_feat.0.weight"] = (d, EMBED, 2, 2)
        s["mask_decoder.compress_vit_feat.0.bias"] = (EMBED,)
        s["mask_decoder.compress_vit_feat.1.weight"] = (EMBED,)
        s["mask_decoder.compress_vit_feat.1.bias"] = (EMBED,)
        s["mask_decoder.compress_vit_feat.3.weight"] = (EMBED, 32, 2, 2)
        s["mask_decoder.compress_vit_feat.3.bias"] = (32,)
        s["mask_decoder.embedding_encoder.0.weight"] = (EMBED, 64, 2, 2)
        s["mask_decoder.embedding_encoder.0.bias"] = (64,)
        s["mask_decoder.embedding_encoder.1.weight"] = (64,)
        s["mask_decoder.embedding_encoder.1.bias"] = (64,)
        s["mask_decoder.embedding_encoder.3.weight"] = (64, 32, 2, 2)
        s["mask_decoder.embedding_encoder.3.bias"] = (32,)
        s["mask_decoder.embedding_maskfeature.0.weight"] = (64, 32, 3, 3)
        s["mask_decoder.embedding_maskfeature.0.bias"] = (64,)
        s["mask_decoder.embedding_maskfeature.1.weight"] = (64,)
        s["mask_decoder.embedding_maskfeature.1.bias"] = (64,)
        s["mask_decoder.embedding_maskfeature.3.weight"] = (32, 64, 3, 3)
        s["mask_decoder.embedding_maskfeature.3.bias"] = (32,)
    return s


_CONVT_KEYS = (
    "output_upscaling.0.weight", "output_upscaling.3.weight",
    "compress_vit_feat.0.weight", "compress_vit_feat.3.weight",
    "embedding_encoder.0.weight", "embedding_encoder.3.weight",
)
_EMBEDDING_MARKERS = ckpt._EMBEDDING_MARKERS


def _converted_shape(key: str, shape: Tuple[int, ...]) -> Tuple[int, ...]:
    """The converter's shape action (mirrors checkpoint._convert_leaf)."""
    if any(k in key for k in _CONVT_KEYS):
        return (shape[2], shape[3], shape[0], shape[1])      # IOHW -> HWIO
    if key.endswith(".weight"):
        if len(shape) == 4:
            return (shape[2], shape[3], shape[1], shape[0])  # OIHW -> HWIO
        if len(shape) == 2 and not any(m in key for m in _EMBEDDING_MARKERS):
            return (shape[1], shape[0])
    return shape


def _init_shapes(cfg: SAMConfig) -> Dict[str, Tuple[int, ...]]:
    abstract = jax.eval_shape(
        lambda k: predictor.sam_init(k, cfg), jax.random.PRNGKey(0))
    out = {}
    for section in ("image_encoder", "prompt_encoder", "mask_decoder"):
        out.update(ckpt.tree_shapes(getattr(abstract, section), section))
    return out


@pytest.mark.parametrize("variant,hq", [("vit_h", False), ("vit_h", True),
                                        ("vit_l", False), ("vit_b", True)])
def test_official_schema_maps_onto_init_tree(variant, hq):
    """Every key of the official checkpoint converts to exactly one leaf of
    sam_init's tree with the right shape — nothing missing, nothing extra."""
    cfg = SAMConfig(model_type=variant, hq=hq)
    schema = official_sam_schema(variant, hq)
    converted = {k: _converted_shape(k, v) for k, v in schema.items()}
    want = _init_shapes(cfg)
    missing = set(want) - set(converted)
    extra = set(converted) - set(want)
    assert not missing, f"init leaves absent from checkpoint: {sorted(missing)[:8]}"
    assert not extra, f"checkpoint keys with no init leaf: {sorted(extra)[:8]}"
    mismatched = {k: (converted[k], want[k]) for k in want
                  if converted[k] != want[k]}
    assert not mismatched, dict(list(mismatched.items())[:8])


def test_vit_b_file_roundtrip(tmp_path):
    """Full file path: synthesize a vit_b-schema .pth, run the real loader,
    and get a tree shape-identical to sam_init (day-one load guarantee)."""
    cfg = SAMConfig(model_type="vit_b", hq=False)
    schema = official_sam_schema("vit_b", False)
    sd = {k: torch.zeros(v) for k, v in schema.items()}
    path = tmp_path / "sam_vit_b_synth.pth"
    torch.save(sd, str(path))

    params = ckpt.load_sam_checkpoint(str(path), cfg)
    got = {}
    for section in ("image_encoder", "prompt_encoder", "mask_decoder"):
        got.update(ckpt.tree_shapes(getattr(params, section), section))
    assert got == _init_shapes(cfg)

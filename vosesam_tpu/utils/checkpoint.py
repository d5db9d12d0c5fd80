"""Torch checkpoint -> JAX param-tree conversion.

Loads the reference's original checkpoints (`XMem-s012.pth`,
`sam_vit_h_4b8939.pth`, `sam_hq_vit_h.pth`, E2FGVI-HQ) into the param trees
used by this framework. Because the trees mirror the torch module paths, the
conversion is a mechanical walk:

  - conv weights   OIHW -> HWIO          (transpose 2,3,1,0)
  - conv-transpose IOHW -> HWIO          (transpose 2,3,0,1)
  - linear weights (out,in) -> (in,out)  (transpose)
  - BN buffers kept; `num_batches_tracked` dropped

XMem specifics (tracker/model/network.py:134-198):
  - hyperparameters (key/value/hidden dims) are *inferred from weight
    shapes*, not stored: key_dim from key_proj.key_proj.weight, value_dim
    from value_encoder.fuser.block2.conv2.weight, hidden_dim from
    decoder.hidden_update.transform.weight (or 0 if absent);
  - single->multi-object surgery: if value_encoder.conv1.weight has 4 input
    channels and multi-object mode is wanted, a 5th (others) channel is
    padded in (zero- or orthogonal-init);
  - the KeyEncoder names its layer1 `res2` — renamed here to the uniform
    `layer1`.

Torch is only imported lazily (host-side tooling; never on the compute path).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from vosesam_tpu.config import XMemConfig

# Embedding tables: 2-D `.weight` leaves that must NOT be transposed.
_EMBEDDING_MARKERS = (
    "point_embeddings", "not_a_point_embed", "no_mask_embed",
    "iou_token", "mask_tokens", "hf_token",
)


def _convert_leaf(path: str, arr: np.ndarray, transpose_spec: Mapping[str, str]) -> np.ndarray:
    kind = transpose_spec.get(path)
    if kind == "conv_transpose":
        return np.transpose(arr, (2, 3, 0, 1))
    if kind == "chw_to_hwc":
        return np.transpose(arr, (1, 2, 0))
    if kind == "keep":
        return arr
    if path.endswith(".weight"):
        if arr.ndim == 4:  # conv OIHW -> HWIO
            return np.transpose(arr, (2, 3, 1, 0))
        if arr.ndim == 2:  # linear
            if any(m in path for m in _EMBEDDING_MARKERS):
                return arr
            return arr.T
    return arr


def state_dict_to_tree(
    state_dict: Mapping[str, Any],
    renames: Mapping[str, str] = (),
    transpose_spec: Mapping[str, str] = (),
) -> Dict[str, Any]:
    """Build a nested dict from a flat torch state_dict.

    `renames`: prefix -> prefix replacements applied to dotted paths.
    `transpose_spec`: dotted path -> 'conv_transpose' for ConvTranspose2d
    weights (IOHW layout in torch)."""
    renames = dict(renames)
    transpose_spec = dict(transpose_spec)
    tree: Dict[str, Any] = {}
    for key, val in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        for old, new in renames.items():
            if key.startswith(old):
                key = new + key[len(old):]
                break
        arr = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach") else val)
        arr = _convert_leaf(key, arr.astype(np.float32), transpose_spec)
        node = tree
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


# ------------------------------------------------------------------- XMem

def infer_xmem_dims(state_dict: Mapping[str, Any]) -> Tuple[int, int, int]:
    """network.py:134-182: read (key_dim, value_dim, hidden_dim) from shapes."""
    def shape(k):
        v = state_dict[k]
        return tuple(v.shape)

    key_dim = shape("key_proj.key_proj.weight")[0]
    value_dim = shape("value_encoder.fuser.block2.conv2.weight")[0]
    if "decoder.hidden_update.transform.weight" in state_dict:
        hidden_dim = shape("decoder.hidden_update.transform.weight")[0] // 3
    else:
        hidden_dim = 0
    return key_dim, value_dim, hidden_dim


def load_xmem_checkpoint(
    path: str,
    cfg: XMemConfig | None = None,
    init_as_zero_if_needed: bool = True,
) -> Tuple[Dict[str, Any], XMemConfig]:
    """Load XMem-s012.pth (or compatible) into the framework param tree."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "network" in sd and isinstance(sd["network"], dict):
        sd = sd["network"]  # trainer-format checkpoint (trainer.py:170-224)
    sd = {k: v for k, v in sd.items()}

    key_dim, value_dim, hidden_dim = infer_xmem_dims(sd)
    if cfg is None:
        cfg = XMemConfig(key_dim=key_dim, value_dim=value_dim, hidden_dim=hidden_dim)
    else:
        cfg = XMemConfig(
            key_dim=key_dim, value_dim=value_dim, hidden_dim=hidden_dim,
            max_objects=cfg.max_objects, single_object=cfg.single_object,
        )

    # Single->multi-object conv surgery (network.py:184-198).
    w = np.asarray(sd["value_encoder.conv1.weight"])  # (64, 4 or 5, 7, 7)
    in_ch = w.shape[1]
    want = 4 if cfg.single_object else 5
    if in_ch != want:
        if in_ch == 4 and want == 5:
            if init_as_zero_if_needed:
                pad = np.zeros((w.shape[0], 1, *w.shape[2:]), w.dtype)
            else:
                rng = np.random.default_rng(0)
                pad = _orthogonal_like(rng, (w.shape[0], 1, *w.shape[2:]))
            sd["value_encoder.conv1.weight"] = np.concatenate([w, pad], axis=1)
        elif in_ch == 5 and want == 4:
            sd["value_encoder.conv1.weight"] = w[:, :4]
        else:
            raise ValueError(f"unexpected value_encoder.conv1 input channels {in_ch}")

    tree = state_dict_to_tree(sd, renames={"key_encoder.res2.": "key_encoder.layer1."})
    return tree, cfg


# -------------------------------------------------------------------- SAM

def load_sam_checkpoint(path: str, cfg) -> "SamParams":
    """Load sam_vit_{b,l,h}_*.pth or sam_hq_vit_h.pth into SamParams.

    The official state dict is flat with image_encoder./prompt_encoder./
    mask_decoder. prefixes; ConvTranspose2d weights (output_upscaling.0/.3,
    and the HQ compress_vit_feat/embedding_encoder pairs) need the IOHW
    spec."""
    import torch

    from vosesam_tpu.models.sam.predictor import SamParams

    sd = torch.load(path, map_location="cpu", weights_only=True)
    convt = {}
    for k in sd:
        if any(
            s in k
            for s in (
                "output_upscaling.0.weight", "output_upscaling.3.weight",
                "compress_vit_feat.0.weight", "compress_vit_feat.3.weight",
                "embedding_encoder.0.weight", "embedding_encoder.3.weight",
            )
        ):
            convt[k] = "conv_transpose"
    tree = state_dict_to_tree(sd, transpose_spec=convt)
    # pos_embed is stored (1, H, W, C) already channel-last in torch SAM.
    return SamParams(
        image_encoder=tree["image_encoder"],
        prompt_encoder=tree["prompt_encoder"],
        mask_decoder=tree["mask_decoder"],
    )


# ------------------------------------------------------------------ E2FGVI

def load_e2fgvi_checkpoint(path: str) -> Dict[str, Any]:
    """Load an E2FGVI generator state dict (inpainter/base_inpainter.py:23
    loads it directly into InpaintGenerator). No ConvTranspose layers — the
    'deconv' blocks are bilinear-resize + conv. Handles both variants: the
    HQ checkpoint (sc.bias_conv.*) and the original E2FGVI checkpoint,
    whose sc.bias is a learned (C, 60, 108) additive map (converted to
    NHWC; models/e2fgvi/modules.py soft_comp dispatches on the key)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "netG" in sd:
        sd = sd["netG"]
    return state_dict_to_tree(sd, transpose_spec={"sc.bias": "chw_to_hwc"})


def tree_to_state_dict(
    tree: Mapping[str, Any],
    renames: Mapping[str, str] = (),
    transpose_spec: Mapping[str, str] = (),
    prefix: str = "",
) -> Dict[str, Any]:
    """Exact inverse of state_dict_to_tree: param tree -> torch-layout flat
    state dict (numpy leaves; wrap with torch.from_numpy to torch.save).

    Used to synthesize official-schema .pth files at arbitrary dims
    (run_parity.py --synthetic, checkpoint round-trip tests). `renames` maps
    OUR prefix back to the torch one (e.g. 'key_encoder.layer1.' ->
    'key_encoder.res2.'); `transpose_spec` takes the SAME dotted torch paths
    and kinds as the forward direction."""
    renames = dict(renames)
    transpose_spec = dict(transpose_spec)
    out: Dict[str, Any] = {}
    for k, v in tree.items():
        p = f"{prefix}.{k}" if prefix else k
        if isinstance(v, Mapping):
            out.update(tree_to_state_dict(v, renames, transpose_spec, p))
            continue
        key = p
        for old, new in renames.items():
            if key.startswith(old):
                key = new + key[len(old):]
                break
        a = np.ascontiguousarray(np.asarray(v))
        kind = transpose_spec.get(key)
        if kind == "conv_transpose":      # HWIO -> IOHW
            a = np.transpose(a, (2, 3, 0, 1))
        elif kind == "chw_to_hwc":        # hwc -> chw
            a = np.transpose(a, (2, 0, 1))
        elif kind == "keep":
            pass
        elif key.endswith(".weight"):
            if a.ndim == 4:               # HWIO -> OIHW
                a = np.transpose(a, (3, 2, 0, 1))
            elif a.ndim == 2 and not any(m in key for m in _EMBEDDING_MARKERS):
                a = a.T
        # always a fresh writable buffer (jax array views are read-only and
        # trip torch.from_numpy's non-writable warning)
        out[key] = np.array(a)
    return out


def _orthogonal_like(rng, shape):
    flat = rng.normal(size=(shape[0], int(np.prod(shape[1:]))))
    q, _ = np.linalg.qr(flat.T)
    return q.T.reshape(shape).astype(np.float32)


def tree_shapes(tree: Mapping[str, Any], prefix: str = "") -> Dict[str, tuple]:
    """Flatten a param tree to {dotted_path: shape} for diffing/tests."""
    out: Dict[str, tuple] = {}
    for k, v in tree.items():
        p = f"{prefix}.{k}" if prefix else k
        if isinstance(v, Mapping):
            out.update(tree_shapes(v, p))
        else:
            out[p] = tuple(np.shape(v))
    return out

"""SAM numerics vs an INDEPENDENT torch implementation (transformers.SamModel).

The reference consumes SAM through the pip `segment_anything` package
(/root/reference/tools/base_segmenter.py:7), which is not installed here —
round 1 flagged the SAM stack as "no torch cross-check at all, biggest
residual numerics risk". The HuggingFace `transformers` port of SAM (a
faithful re-implementation of the same published architecture, validated
against the official checkpoints upstream) IS installed, so it serves as the
external oracle: build a random-weight HF SamModel at vit_b dims
(image_size=256 for CPU speed), remap its state dict into the OFFICIAL
sam_vit_*.pth naming (the exact schema tests/test_sam_checkpoint_schema.py
pins), load it through our real converter (utils/checkpoint.load_sam_checkpoint),
and assert the JAX pipeline reproduces torch numerics end to end:

  - ViT-det image encoder (windowed + global rel-pos attention, neck)
  - prompt encoder (point PE + labels, mask downscaling, no-mask dense)
  - two-way mask decoder (low-res mask logits + IoU for all tokens)

Conventions mirrored from the official predictor: point coords are
original-image xy; point-only prompts are padded with ONE (0,0,-1)
not-a-point entry (official PromptEncoder._embed_points pad=True when no
boxes; HF modeling_sam.py does the same).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vosesam_tpu.config import SAMConfig  # noqa: E402
from vosesam_tpu.models.sam import predictor  # noqa: E402
from vosesam_tpu.utils.checkpoint import load_sam_checkpoint  # noqa: E402

IMAGE_SIZE = 256  # 16x16 token grid — fast on the single-core CPU host

SAM_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_STD = np.array([58.395, 57.12, 57.375], np.float32)


def _hf_key_to_official(k: str) -> str:
    """transformers SamModel param name -> official sam_vit_*.pth name."""
    if k == "shared_image_embedding.positional_embedding":
        return ""  # duplicate of prompt_encoder.shared_embedding — dropped
    if k.startswith("vision_encoder."):
        k = "image_encoder." + k[len("vision_encoder."):]
        k = k.replace(".patch_embed.projection.", ".patch_embed.proj.")
        if ".neck." in k:
            k = (k.replace(".neck.conv1.", ".neck.0.")
                  .replace(".neck.layer_norm1.", ".neck.1.")
                  .replace(".neck.conv2.", ".neck.2.")
                  .replace(".neck.layer_norm2.", ".neck.3."))
            return k
        k = k.replace(".layers.", ".blocks.")
        k = k.replace(".layer_norm1.", ".norm1.").replace(".layer_norm2.", ".norm2.")
        return k
    if k.startswith("prompt_encoder."):
        k = k.replace(".shared_embedding.positional_embedding",
                      ".pe_layer.positional_encoding_gaussian_matrix")
        k = k.replace(".point_embed.", ".point_embeddings.")
        k = (k.replace(".mask_embed.conv1.", ".mask_downscaling.0.")
              .replace(".mask_embed.layer_norm1.", ".mask_downscaling.1.")
              .replace(".mask_embed.conv2.", ".mask_downscaling.3.")
              .replace(".mask_embed.layer_norm2.", ".mask_downscaling.4.")
              .replace(".mask_embed.conv3.", ".mask_downscaling.6."))
        return k
    if k.startswith("mask_decoder."):
        for i in range(1, 5):
            k = k.replace(f".layer_norm{i}.", f".norm{i}.")
        k = k.replace(".transformer.layer_norm_final_attn.",
                      ".transformer.norm_final_attn.")
        k = (k.replace(".upscale_conv1.", ".output_upscaling.0.")
              .replace(".upscale_layer_norm.", ".output_upscaling.1.")
              .replace(".upscale_conv2.", ".output_upscaling.3."))
        # SAM-HQ extras (transformers/models/sam_hq vs official sam_hq_vit_*.pth)
        k = k.replace(".hq_token.", ".hf_token.")
        k = k.replace(".hq_mask_mlp.", ".hf_mlp.")
        k = (k.replace(".compress_vit_conv1.", ".compress_vit_feat.0.")
              .replace(".compress_vit_norm.", ".compress_vit_feat.1.")
              .replace(".compress_vit_conv2.", ".compress_vit_feat.3.")
              .replace(".encoder_conv1.", ".embedding_encoder.0.")
              .replace(".encoder_norm.", ".embedding_encoder.1.")
              .replace(".encoder_conv2.", ".embedding_encoder.3.")
              .replace(".mask_conv1.", ".embedding_maskfeature.0.")
              .replace(".mask_norm.", ".embedding_maskfeature.1.")
              .replace(".mask_conv2.", ".embedding_maskfeature.3."))
        # HF MLP heads (proj_in / layers.0 / proj_out) == official MLP
        # layers.0/1/2 — only in the hypernetwork/iou heads, NOT the
        # two-way transformer's own .layers.N. stack
        if (".output_hypernetworks_mlps." in k or ".iou_prediction_head." in k
                or ".hf_mlp." in k):
            k = k.replace(".proj_in.", ".layers.0#.")
            k = k.replace(".layers.0.", ".layers.1.")
            k = k.replace(".proj_out.", ".layers.2.")
            k = k.replace(".layers.0#.", ".layers.0.")
        return k
    return k


@pytest.fixture(scope="module")
def sam_pair(tmp_path_factory):
    torch.manual_seed(0)
    hf_cfg = transformers.SamConfig(
        vision_config=dict(image_size=IMAGE_SIZE),
        prompt_encoder_config=dict(image_size=IMAGE_SIZE),
    )
    hf = transformers.SamModel(hf_cfg).eval()

    official = {}
    for k, v in hf.state_dict().items():
        ok = _hf_key_to_official(k)
        if ok:
            official[ok] = v
    path = str(tmp_path_factory.mktemp("ck") / "sam_vit_b_hfinit.pth")
    torch.save(official, path)

    cfg = SAMConfig(model_type="vit_b", image_size=IMAGE_SIZE, hq=False,
                    use_flash_attention=False,
                    windowed_attention_impl="xla")
    params = load_sam_checkpoint(path, cfg)

    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (IMAGE_SIZE, IMAGE_SIZE, 3), np.uint8)
    pixel_values = torch.from_numpy(
        ((img.astype(np.float32) - SAM_MEAN) / SAM_STD).transpose(2, 0, 1)
    )[None]
    return hf, params, cfg, img, pixel_values


def test_image_encoder_matches_torch(sam_pair):
    hf, params, cfg, img, pixel_values = sam_pair
    with torch.no_grad():
        ref = hf.get_image_embeddings(pixel_values)[0].numpy()  # (256, 16, 16)
    emb = predictor.encode_image(params, jnp.asarray(img), cfg)
    got = np.asarray(emb.embedding, np.float32).transpose(2, 0, 1)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_fused_bias_windowed_impl_matches_torch(sam_pair):
    """The PRODUCTION windowed-attention path (bias folded into the QK
    matmul via one-hot key lanes) against the torch oracle directly."""
    hf, params, cfg, img, pixel_values = sam_pair
    import dataclasses
    fcfg = dataclasses.replace(cfg, windowed_attention_impl="xla_fused_bias")
    with torch.no_grad():
        ref = hf.get_image_embeddings(pixel_values)[0].numpy()
    emb = predictor.encode_image(params, jnp.asarray(img), fcfg)
    got = np.asarray(emb.embedding, np.float32).transpose(2, 0, 1)
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=5e-4)


def _hf_forward(hf, pixel_values, points, labels, masks=None, multimask=True):
    kw = {}
    if masks is not None:
        kw["input_masks"] = torch.from_numpy(masks[None, None].astype(np.float32))
    with torch.no_grad():
        out = hf(
            pixel_values=pixel_values,
            input_points=torch.from_numpy(
                np.asarray(points, np.float32)[None, None]),
            input_labels=torch.from_numpy(
                np.asarray(labels, np.int64)[None, None]),
            multimask_output=multimask,
            **kw,
        )
    return (out.pred_masks[0, 0].numpy(), out.iou_scores[0, 0].numpy())


def _our_predict(params, cfg, img, points, labels, mask_input=None):
    emb = predictor.encode_image(params, jnp.asarray(img), cfg)
    # official predictor semantics: point-only prompts get ONE (0,0,-1) pad
    pts = np.concatenate([np.asarray(points, np.float32), [[0.0, 0.0]]], 0)
    lbl = np.concatenate([np.asarray(labels, np.int32), [-1]], 0)
    mi = None if mask_input is None else jnp.asarray(mask_input)
    low, iou = predictor.predict_low_res(
        params, emb, jnp.asarray(pts), jnp.asarray(lbl), mi, cfg)
    return np.asarray(low, np.float32), np.asarray(iou, np.float32)


def test_point_prompt_masks_match_torch(sam_pair):
    hf, params, cfg, img, pixel_values = sam_pair
    points = [[70.0, 100.0], [180.0, 60.0], [120.0, 200.0]]
    labels = [1, 1, 0]

    low, iou = _our_predict(params, cfg, img, points, labels)
    ref_masks, ref_iou = _hf_forward(hf, pixel_values, points, labels,
                                     multimask=True)
    np.testing.assert_allclose(low[1:4], ref_masks, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(iou[1:4], ref_iou, atol=2e-4, rtol=1e-3)

    ref_m0, ref_i0 = _hf_forward(hf, pixel_values, points, labels,
                                 multimask=False)
    np.testing.assert_allclose(low[0:1], ref_m0, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(iou[0:1], ref_i0, atol=2e-4, rtol=1e-3)


@pytest.fixture(scope="module")
def sam_hq_pair(tmp_path_factory):
    torch.manual_seed(1)
    hf_cfg = transformers.SamHQConfig(
        vision_config=dict(image_size=IMAGE_SIZE),
        prompt_encoder_config=dict(image_size=IMAGE_SIZE),
    )
    hf = transformers.SamHQModel(hf_cfg).eval()

    official = {}
    for k, v in hf.state_dict().items():
        ok = _hf_key_to_official(k)
        if ok:
            official[ok] = v
    path = str(tmp_path_factory.mktemp("ckhq") / "sam_hq_vit_b_hfinit.pth")
    torch.save(official, path)

    cfg = SAMConfig(model_type="vit_b", image_size=IMAGE_SIZE, hq=True,
                    use_flash_attention=False,
                    windowed_attention_impl="xla")
    params = load_sam_checkpoint(path, cfg)

    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (IMAGE_SIZE, IMAGE_SIZE, 3), np.uint8)
    pixel_values = torch.from_numpy(
        ((img.astype(np.float32) - SAM_MEAN) / SAM_STD).transpose(2, 0, 1)
    )[None]
    return hf, params, cfg, img, pixel_values


@pytest.mark.slow
def test_hq_masks_match_torch(sam_hq_pair):
    """SAM-HQ decoder (interm ViT features, embedding_encoder /
    compress_vit_feat / embedding_maskfeature fusion, hf_token mask) vs a
    torch oracle built from transformers SamHQModel SUBMODULES.

    We drive the submodules with the OFFICIAL sam_hq dataflow rather than
    calling SamHQModel.forward: transformers 4.57 modeling_sam_hq.py:968
    discards the two-way transformer's updated image embeddings (binds keys
    to `iou_token_out`, instantly overwritten) and upscales the
    PRE-transformer src — a porting bug; the official sam_hq MaskDecoderHQ
    (and modeling_sam.py:508 vanilla HF) upscale the transformer-updated
    src. This implementation follows the official repo."""
    hf, params, cfg, img, pixel_values = sam_hq_pair
    points = [[90.0, 140.0], [200.0, 80.0]]
    labels = [1, 0]
    low, iou = _our_predict(params, cfg, img, points, labels)

    md = hf.mask_decoder
    act = md.activation
    with torch.no_grad():
        vout = hf.vision_encoder(pixel_values)
        image_embeddings = vout.last_hidden_state           # (1, 256, g, g)
        vit_features = vout.intermediate_embeddings[0].permute(0, 3, 1, 2)
        sparse, dense = hf.prompt_encoder(
            input_points=torch.from_numpy(
                np.asarray(points, np.float32))[None, None],
            input_labels=torch.from_numpy(
                np.asarray(labels, np.int64))[None, None],
            input_boxes=None, input_masks=None)
        image_pe = hf.get_image_wide_positional_embeddings()

        embed_encode = md.encoder_conv2(
            act(md.encoder_norm(md.encoder_conv1(image_embeddings))))
        comp = md.compress_vit_conv2(
            act(md.compress_vit_norm(md.compress_vit_conv1(vit_features))))
        hq_features = embed_encode + comp

        output_tokens = torch.cat(
            [md.iou_token.weight, md.mask_tokens.weight, md.hq_token.weight], 0)
        tokens = torch.cat([output_tokens[None, None], sparse], dim=2)
        src = image_embeddings + dense
        b, c, h, w = src.shape
        point_embedding, keys = md.transformer(
            point_embeddings=tokens, image_embeddings=src,
            image_positional_embeddings=image_pe,
            attention_similarity=None, target_embedding=None)
        iou_token_out = point_embedding[:, :, 0, :]
        n_tok = md.num_mask_tokens                 # 5 = 4 sam + 1 hq
        mask_tokens_out = point_embedding[:, :, 1:1 + n_tok, :]
        src_upd = keys.transpose(2, 3).reshape(b, c, h, w)  # OFFICIAL dataflow

        up = act(md.upscale_conv2(act(md.upscale_layer_norm(
            md.upscale_conv1(src_upd)))))
        up_hq = md.mask_conv2(act(md.mask_norm(md.mask_conv1(up)))) + hq_features

        hyper = [
            (md.output_hypernetworks_mlps[i] if i < n_tok - 1
             else md.hq_mask_mlp)(mask_tokens_out[:, :, i, :])
            for i in range(n_tok)
        ]
        hyper_in = torch.stack(hyper, dim=2)
        _, cu, hu, wu = up.shape
        ref_sam = (hyper_in[:, :, :n_tok - 1] @ up.reshape(1, 1, cu, hu * wu)
                   ).reshape(-1, hu, wu).numpy()
        ref_hq = (hyper_in[:, :, n_tok - 1:] @ up_hq.reshape(1, 1, cu, hu * wu)
                  ).reshape(-1, hu, wu).numpy()
        ref_iou = md.iou_prediction_head(iou_token_out)[0, 0].numpy()

    np.testing.assert_allclose(low[:4], ref_sam, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(low[4:5], ref_hq, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(iou)[:len(ref_iou)], ref_iou,
                               atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_mask_prompt_matches_torch(sam_pair):
    hf, params, cfg, img, pixel_values = sam_pair
    rng = np.random.default_rng(3)
    # (S/4, S/4) low-res mask logits — the previous-iteration mask input
    mask_logits = rng.normal(0.0, 4.0, (IMAGE_SIZE // 4, IMAGE_SIZE // 4))
    points = [[128.0, 128.0]]
    labels = [1]

    low, iou = _our_predict(params, cfg, img, points, labels,
                            mask_input=mask_logits.astype(np.float32))
    ref_masks, ref_iou = _hf_forward(
        hf, pixel_values, points, labels,
        masks=mask_logits.astype(np.float32), multimask=True)
    np.testing.assert_allclose(low[1:4], ref_masks, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(iou[1:4], ref_iou, atol=2e-4, rtol=1e-3)

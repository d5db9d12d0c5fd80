"""SAM mask decoder: two-way transformer + hypernetwork heads; SAM-HQ variant.

Re-implements segment_anything's MaskDecoder/TwoWayTransformer and sam_hq's
MaskDecoderHQ. The reference switches SAM vs SAM-HQ by installing a different
pip package into a different venv (README.md:93-131, app.py:383-388); here HQ
is a config flag with its extra parameters present only when enabled.

Param names mirror the official checkpoints (transformer.layers.N.self_attn.
q_proj..., output_hypernetworks_mlps.N.layers.M, hf_token, compress_vit_feat,
embedding_encoder, embedding_maskfeature) for mechanical conversion.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vosesam_tpu.config import SAMConfig
from vosesam_tpu.models.layers import (
    Params,
    conv2d,
    conv_init,
    conv_transpose2d,
    gelu,
    layer_norm,
    linear,
    linear_init,
    ln_init,
    relu,
)

NUM_MASK_TOKENS = 4  # 1 primary + 3 multimask


# ----------------------------------------------------------------------- init

def _attn_init(key, dim, rate, dtype):
    internal = dim // rate
    ks = jax.random.split(key, 4)
    return {
        "q_proj": linear_init(ks[0], dim, internal, dtype=dtype),
        "k_proj": linear_init(ks[1], dim, internal, dtype=dtype),
        "v_proj": linear_init(ks[2], dim, internal, dtype=dtype),
        "out_proj": linear_init(ks[3], internal, dim, dtype=dtype),
    }


def _mlp_init(key, dims, dtype):
    ks = jax.random.split(key, len(dims) - 1)
    return {
        "layers": {
            str(i): linear_init(ks[i], dims[i], dims[i + 1], dtype=dtype)
            for i in range(len(dims) - 1)
        }
    }


def _twoway_layer_init(key, dim, heads, mlp_dim, dtype):
    ks = jax.random.split(key, 4)
    return {
        "self_attn": _attn_init(ks[0], dim, 1, dtype),
        "norm1": ln_init(dim, dtype),
        "cross_attn_token_to_image": _attn_init(ks[1], dim, 2, dtype),
        "norm2": ln_init(dim, dtype),
        "mlp": {
            "lin1": linear_init(jax.random.fold_in(ks[2], 0), dim, mlp_dim, dtype=dtype),
            "lin2": linear_init(jax.random.fold_in(ks[2], 1), mlp_dim, dim, dtype=dtype),
        },
        "norm3": ln_init(dim, dtype),
        "cross_attn_image_to_token": _attn_init(ks[3], dim, 2, dtype),
        "norm4": ln_init(dim, dtype),
    }


def mask_decoder_init(key, cfg: SAMConfig, dtype=jnp.float32) -> Params:
    d = cfg.prompt_embed_dim
    ks = jax.random.split(key, 12)
    n_tokens = NUM_MASK_TOKENS + (1 if cfg.hq else 0)
    p: Params = {
        "transformer": {
            "layers": {
                "0": _twoway_layer_init(ks[0], d, 8, 2048, dtype),
                "1": _twoway_layer_init(ks[1], d, 8, 2048, dtype),
            },
            "final_attn_token_to_image": _attn_init(ks[2], d, 2, dtype),
            "norm_final_attn": ln_init(d, dtype),
        },
        "iou_token": {"weight": 0.02 * jax.random.normal(ks[3], (1, d), dtype)},
        "mask_tokens": {"weight": 0.02 * jax.random.normal(ks[4], (NUM_MASK_TOKENS, d), dtype)},
        "output_upscaling": {
            "0": conv_init(ks[5], 2, 2, d, d // 4, dtype=dtype),       # ConvT 256->64
            "1": ln_init(d // 4, dtype),
            "3": conv_init(ks[6], 2, 2, d // 4, d // 8, dtype=dtype),  # ConvT 64->32
        },
        # Official MLP(dim, dim, out, num_layers=3): layers.0/1/2 — two
        # hidden layers, not one (checkpoint keys ...layers.2.weight).
        "output_hypernetworks_mlps": {
            str(i): _mlp_init(jax.random.fold_in(ks[7], i), (d, d, d, d // 8), dtype)
            for i in range(NUM_MASK_TOKENS)
        },
        "iou_prediction_head": _mlp_init(ks[8], (d, d, d, n_tokens), dtype),
    }
    if cfg.hq:
        vit_dim = cfg.encoder_dims()[0]
        p.update({
            "hf_token": {"weight": 0.02 * jax.random.normal(ks[9], (1, d), dtype)},
            "hf_mlp": _mlp_init(jax.random.fold_in(ks[9], 1), (d, d, d, d // 8), dtype),
            "compress_vit_feat": {
                "0": conv_init(jax.random.fold_in(ks[10], 0), 2, 2, vit_dim, d, dtype=dtype),
                "1": ln_init(d, dtype),
                "3": conv_init(jax.random.fold_in(ks[10], 1), 2, 2, d, d // 8, dtype=dtype),
            },
            "embedding_encoder": {
                "0": conv_init(jax.random.fold_in(ks[11], 0), 2, 2, d, d // 4, dtype=dtype),
                "1": ln_init(d // 4, dtype),
                "3": conv_init(jax.random.fold_in(ks[11], 1), 2, 2, d // 4, d // 8, dtype=dtype),
            },
            "embedding_maskfeature": {
                "0": conv_init(jax.random.fold_in(ks[11], 2), 3, 3, d // 8, d // 4, dtype=dtype),
                "1": ln_init(d // 4, dtype),
                "3": conv_init(jax.random.fold_in(ks[11], 3), 3, 3, d // 4, d // 8, dtype=dtype),
            },
        })
    return p


# ------------------------------------------------------------------- forward

def _attn(q, k, v, p: Params, heads: int = 8):
    """Multi-head attention with projection to an internal dim."""
    qp, kp, vp = linear(q, p["q_proj"]), linear(k, p["k_proj"]), linear(v, p["v_proj"])
    internal = qp.shape[-1]
    hd = internal // heads

    def split(x):
        return x.reshape(*x.shape[:-1], heads, hd)

    qh, kh, vh = split(qp), split(kp), split(vp)
    logits = jnp.einsum("qnc,knc->nqk", qh, kh, preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(hd)
    w = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    out = jnp.einsum("nqk,knc->qnc", w, vh).reshape(*qp.shape[:-1], internal)
    return linear(out, p["out_proj"])


def _mlp(x, p: Params, act=relu):
    layers = p["layers"]
    n = len(layers)
    for i in range(n):
        x = linear(x, layers[str(i)])
        if i < n - 1:
            x = act(x)
    return x


def two_way_transformer(
    p: Params,
    image_embedding: jax.Array,  # (H, W, 256)
    image_pe: jax.Array,         # (H, W, 256)
    point_embedding: jax.Array,  # (T, 256)
) -> Tuple[jax.Array, jax.Array]:
    """Official TwoWayTransformer (depth 2). Returns (queries, keys)."""
    h, w, c = image_embedding.shape
    keys = image_embedding.reshape(h * w, c)
    key_pe = image_pe.reshape(h * w, c)
    queries = point_embedding

    for i in range(2):
        lp = p["layers"][str(i)]
        if i == 0:
            queries = _attn(queries, queries, queries, lp["self_attn"])
        else:
            q = queries + point_embedding
            queries = queries + _attn(q, q, queries, lp["self_attn"])
        queries = layer_norm(queries, lp["norm1"])

        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + _attn(q, k, keys, lp["cross_attn_token_to_image"])
        queries = layer_norm(queries, lp["norm2"])

        queries = queries + linear(relu(linear(queries, lp["mlp"]["lin1"])), lp["mlp"]["lin2"])
        queries = layer_norm(queries, lp["norm3"])

        q = queries + point_embedding
        k = keys + key_pe
        keys = keys + _attn(k, q, queries, lp["cross_attn_image_to_token"])
        keys = layer_norm(keys, lp["norm4"])

    q = queries + point_embedding
    k = keys + key_pe
    queries = queries + _attn(q, k, keys, p["final_attn_token_to_image"])
    queries = layer_norm(queries, p["norm_final_attn"])
    return queries, keys


def _upscale(src: jax.Array, p: Params) -> jax.Array:
    """(H, W, 256) -> (4H, 4W, 32) output upscaling (ConvT-LN-GELU-ConvT-GELU)."""
    y = conv_transpose2d(src[None], p["0"], stride=2, padding=0)
    y = gelu(layer_norm(y, p["1"]))
    y = gelu(conv_transpose2d(y, p["3"], stride=2, padding=0))
    return y[0]


def _seq_convT_ln_gelu_convT(x: jax.Array, p: Params) -> jax.Array:
    y = conv_transpose2d(x[None], p["0"], stride=2, padding=0)
    y = gelu(layer_norm(y, p["1"]))
    return conv_transpose2d(y, p["3"], stride=2, padding=0)[0]


def decode_masks(
    params: Params,
    image_embedding: jax.Array,      # (64, 64, 256)
    image_pe: jax.Array,             # (64, 64, 256)
    sparse_prompt: jax.Array,        # (P, 256)
    dense_prompt: jax.Array,         # (64, 64, 256)
    cfg: SAMConfig,
    interm_vit: Optional[jax.Array] = None,  # (64, 64, vit_dim) for HQ
) -> Tuple[jax.Array, jax.Array]:
    """Returns (masks (n_tokens, 256, 256) logits, iou_pred (n_tokens,)).

    Token 0 is the single-mask output; tokens 1..3 the multimask outputs;
    token 4 (HQ only) the high-quality output."""
    hq = cfg.hq
    n_tokens = NUM_MASK_TOKENS + (1 if hq else 0)
    toks = [params["iou_token"]["weight"], params["mask_tokens"]["weight"]]
    if hq:
        toks.append(params["hf_token"]["weight"])
    output_tokens = jnp.concatenate(toks, axis=0)
    tokens = jnp.concatenate([output_tokens, sparse_prompt], axis=0)

    src = image_embedding + dense_prompt
    hs, src_out = two_way_transformer(params["transformer"], src, image_pe, tokens)
    iou_token_out = hs[0]
    mask_tokens_out = hs[1:1 + n_tokens]

    h, w, c = image_embedding.shape
    src_img = src_out.reshape(h, w, c)
    upscaled = _upscale(src_img, params["output_upscaling"])  # (4h, 4w, 32)

    hyper = [
        _mlp(mask_tokens_out[i], params["output_hypernetworks_mlps"][str(i)])
        for i in range(NUM_MASK_TOKENS)
    ]
    if hq:
        hyper.append(_mlp(mask_tokens_out[NUM_MASK_TOKENS], params["hf_mlp"]))
    hyper_in = jnp.stack(hyper, axis=0)                        # (n_tokens, 32)

    uh, uw, uc = upscaled.shape
    masks_sam = jnp.dot(
        hyper_in[:NUM_MASK_TOKENS], upscaled.reshape(-1, uc).T,
        preferred_element_type=jnp.float32,
    ).reshape(NUM_MASK_TOKENS, uh, uw)

    if hq:
        if interm_vit is None:
            raise ValueError("SAM-HQ decoding needs the early ViT features")
        hq_feat = (
            _seq_convT_ln_gelu_convT(image_embedding, params["embedding_encoder"])
            + _seq_convT_ln_gelu_convT(interm_vit, params["compress_vit_feat"])
        )
        mf = params["embedding_maskfeature"]
        up_hq = conv2d(upscaled[None], mf["0"], padding=1)
        up_hq = gelu(layer_norm(up_hq, mf["1"]))
        up_hq = conv2d(up_hq, mf["3"], padding=1)[0] + hq_feat
        mask_hq = jnp.dot(
            hyper_in[NUM_MASK_TOKENS:], up_hq.reshape(-1, uc).T,
            preferred_element_type=jnp.float32,
        ).reshape(1, uh, uw)
        masks = jnp.concatenate([masks_sam, mask_hq], axis=0)
    else:
        masks = masks_sam

    iou_pred = _mlp(iou_token_out, params["iou_prediction_head"])
    return masks, iou_pred

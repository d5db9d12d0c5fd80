"""SAM ViT image encoder, functional JAX.

Re-implements the `segment_anything` package's ImageEncoderViT (the reference
consumes it via `sam_model_registry`, tools/base_segmenter.py:7,25): patch
embed, absolute position embedding, `depth` transformer blocks with 14x14
windowed attention (global attention at the per-variant global indexes) and
decomposed relative position embeddings, and the 256-channel neck.

TPU-first notes:
  - activations NHWC; attention computed in (tokens, heads, dim) with fp32
    softmax over bf16 matmuls;
  - window partition is a reshape/transpose (static shapes: 1024/16=64 tokens
    pad to 70 = 5x14 windows);
  - param-tree names mirror the official checkpoint
    (image_encoder.blocks.N.attn.qkv / rel_pos_h / ... ) for mechanical
    conversion.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from vosesam_tpu.config import SAMConfig
from vosesam_tpu.models.layers import (
    Params,
    conv2d,
    conv_init,
    gelu_fast,
    layer_norm,
    linear,
    linear_init,
    ln_init,
)


# ----------------------------------------------------------------------- init

def vit_init(key, cfg: SAMConfig, dtype=jnp.float32) -> Params:
    dim, depth, heads, global_idx = cfg.encoder_dims()
    tokens = cfg.image_size // cfg.patch_size
    head_dim = dim // heads
    ks = jax.random.split(key, depth + 3)
    blocks: Params = {}
    for i in range(depth):
        kb = jax.random.split(ks[i], 6)
        wsz = tokens if i in global_idx else cfg.window_size
        rel = 2 * wsz - 1
        blocks[str(i)] = {
            "norm1": ln_init(dim, dtype),
            "attn": {
                "qkv": linear_init(kb[0], dim, dim * 3, dtype=dtype),
                "proj": linear_init(kb[1], dim, dim, dtype=dtype),
                "rel_pos_h": jnp.zeros((rel, head_dim), dtype),
                "rel_pos_w": jnp.zeros((rel, head_dim), dtype),
            },
            "norm2": ln_init(dim, dtype),
            "mlp": {
                "lin1": linear_init(kb[2], dim, dim * 4, dtype=dtype),
                "lin2": linear_init(kb[3], dim * 4, dim, dtype=dtype),
            },
        }
    return {
        "patch_embed": {"proj": conv_init(ks[depth], cfg.patch_size, cfg.patch_size, 3, dim, dtype=dtype)},
        "pos_embed": 0.02 * jax.random.normal(ks[depth + 1], (1, tokens, tokens, dim), dtype),
        "blocks": blocks,
        "neck": {
            "0": conv_init(jax.random.fold_in(ks[depth + 2], 0), 1, 1, dim, 256, bias=False, dtype=dtype),
            "1": ln_init(256, dtype),
            "2": conv_init(jax.random.fold_in(ks[depth + 2], 1), 3, 3, 256, 256, bias=False, dtype=dtype),
            "3": ln_init(256, dtype),
        },
    }


# ------------------------------------------------------------------ attention

def _get_rel_pos(q_size: int, k_size: int, rel_pos: jax.Array) -> jax.Array:
    """Gather relative position embeddings (official get_rel_pos semantics,
    with one fidelity improvement for sub-grids).

    When the table is LARGER than needed and q_size == k_size (the
    encode_rect case: a 36-row grid against the 127-entry table trained for
    the 64-row square), the relative offsets mean exactly the same thing —
    so the center crop of the table gives the EXACT trained embedding per
    offset, where the official interpolation would squeeze the whole
    +-63-offset range into +-35 and misassign every offset. Interpolation is
    kept for the remaining (cross-resolution) cases."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        if q_size == k_size and rel_pos.shape[0] > max_rel_dist:
            lo = (rel_pos.shape[0] - max_rel_dist) // 2
            rel_pos = rel_pos[lo: lo + max_rel_dist]
        else:
            rel_pos = jax.image.resize(
                rel_pos, (max_rel_dist, rel_pos.shape[1]), method="linear"
            )
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


def _factorized_rel_pos_bias(
    q: jax.Array,  # (B, qh*qw, heads, hd)
    rel_pos_h: jax.Array,
    rel_pos_w: jax.Array,
    q_hw: Tuple[int, int],
    k_hw: Tuple[int, int],
) -> Tuple[jax.Array, jax.Array]:
    """Decomposed rel-pos bias in FACTORIZED form: (bias_h (B, heads, N, kh),
    bias_w (B, heads, N, kw)) with bias[q, k] = bias_h[q, row(k)] +
    bias_w[q, col(k)]. The full (N, N) bias is never materialized here —
    the flash kernel reconstructs tiles, and the XLA fallback broadcasts."""
    qh, qw = q_hw
    kh, kw = k_hw
    rh = _get_rel_pos(qh, kh, rel_pos_h)   # (qh, kh, hd)
    rw = _get_rel_pos(qw, kw, rel_pos_w)   # (qw, kw, hd)
    b, _, heads, hd = q.shape
    rq = q.reshape(b, qh, qw, heads, hd).astype(jnp.float32)
    bias_h = jnp.einsum("bhwnc,hkc->bnhwk", rq, rh.astype(jnp.float32))
    bias_w = jnp.einsum("bhwnc,wkc->bnhwk", rq, rw.astype(jnp.float32))
    return (
        bias_h.reshape(b, heads, qh * qw, kh),
        bias_w.reshape(b, heads, qh * qw, kw),
    )


def _attention(
    x: jax.Array, p: Params, heads: int, hw: Tuple[int, int],
    use_flash: bool = False, windowed_impl: str = "xla",
) -> jax.Array:
    """x: (B, H, W, C) windowed (b = num windows > 1) or global (b == 1)
    tokens. `use_flash` gates the global-block flash kernel; `windowed_impl`
    picks the windowed-path implementation ("xla" | "pallas" | "pallas_mh")."""
    b, h, w, c = x.shape
    hd = c // heads
    xt = x.reshape(b, h * w, c)
    # three separate dots instead of one (c, 3c) qkv matmul + strided
    # unpack: each output is contiguous in its consumer layout, so the
    # (b, N, 3, heads, hd) materialization + 3 slice copies disappear
    wq, wk, wv = jnp.split(p["qkv"]["weight"], 3, axis=1)
    bq, bk, bv = jnp.split(p["qkv"]["bias"], 3)
    q = linear(xt, {"weight": wq, "bias": bq}).reshape(b, h * w, heads, hd)
    k = linear(xt, {"weight": wk, "bias": bk}).reshape(b, h * w, heads, hd)
    v = linear(xt, {"weight": wv, "bias": bv}).reshape(b, h * w, heads, hd)
    if not (b > 1 and windowed_impl == "xla_fused_bias"):
        bias_h, bias_w = _factorized_rel_pos_bias(
            q, p["rel_pos_h"], p["rel_pos_w"], hw, hw
        )

    # flash global kernel: pick the largest q-tile dividing N (the square
    # 4096 and rect 2304 grids take 256; the fixed-hw 28x56 grid = 1568
    # takes 224). Grids with no MXU-friendly divisor fall back to XLA.
    flash_qt = (next((t for t in (256, 224, 192, 128, 112, 64)
                      if (h * w) % t == 0), None)
                if use_flash and b == 1 and h * w >= 256 else None)
    if flash_qt is not None:
        from vosesam_tpu.ops.pallas.flash_attention import flash_attention_relpos

        out = flash_attention_relpos(
            q[0].transpose(1, 0, 2), k[0].transpose(1, 0, 2),
            v[0].transpose(1, 0, 2),
            bias_h[0], bias_w[0], hw,
            q_tile=flash_qt,
            interpret=jax.default_backend() != "tpu",
        )                                           # (heads, N, hd)
        out = out.transpose(1, 0, 2).reshape(1, h * w, c)
        return linear(out, p["proj"]).reshape(b, h, w, c)

    if b > 1 and windowed_impl == "xla_fused_bias":
        # Fold the decomposed rel-pos bias INTO the QK matmul instead of a
        # broadcast-add over the (b, heads, T, wh, ww) score tensor:
        #   q' = [q*scale, bh_q, bw_q],  k' = [k, onehot_row(k), onehot_col(k)]
        #   q'.k' = scale*q.k + bh[q, row(k)] + bw[q, col(k)]
        # The one-hot lanes ride the same MXU pass (hd 80 -> 108 still pads
        # to the same 128-lane tile, so the extra lanes are free), and the
        # separate scale/add passes over the score tensor disappear.
        # Measured on-chip (scripts/exp_encoder_opt.py, K=4 dependent scan):
        # 40.6 ms vs 44.3 ms for the broadcast-add path per windowed block.
        n = h * w
        scale = 1.0 / math.sqrt(hd)
        # Bias einsums emitted DIRECTLY in the (b, N, heads, k) layout and
        # q.dtype this path concatenates (the generic factorized form is
        # (b, heads, N, k) f32 + transpose + cast — a layout/cast pass over
        # two 5M-element tensors per block). MXU accumulates f32 either
        # way, so the bf16 downcast lands at the same point numerically.
        rh = _get_rel_pos(h, h, p["rel_pos_h"]).astype(q.dtype)  # (h, h, hd)
        rw = _get_rel_pos(w, w, p["rel_pos_w"]).astype(q.dtype)
        rq = q.reshape(b, h, w, heads, hd)
        # ONE einsum builds qp = [q*scale | bias_h | bias_w] directly from a
        # per-(row, col) projection table P (h, w, hd, hd+h+w): a scaled
        # identity block emits q*scale and the transposed rel-pos tables emit
        # the biases. The separate bias passes had k=14 outputs (wasting
        # 128-lane MXU tiles) plus a 3-way qp concat; here the output minor
        # dim 108 pads to the SAME 128-lane tile a k=28 pass would, so the
        # MXU time is unchanged while the bias buffers, the q*scale pass and
        # the concat all disappear.
        proj = jnp.concatenate([
            jnp.broadcast_to(
                (scale * jnp.eye(hd, dtype=q.dtype))[None, None],
                (h, w, hd, hd)),
            jnp.broadcast_to(rh.transpose(0, 2, 1)[:, None], (h, w, hd, h)),
            jnp.broadcast_to(rw.transpose(0, 2, 1)[None, :], (h, w, hd, w)),
        ], axis=-1)
        qp = jnp.einsum("bhwnc,hwck->bhwnk", rq, proj)
        qp = qp.reshape(b, n, heads, hd + h + w)
        rows = jnp.arange(n) // w
        cols = jnp.arange(n) % w
        erow = jax.nn.one_hot(rows, h, dtype=q.dtype)
        ecol = jax.nn.one_hot(cols, w, dtype=q.dtype)
        kp = jnp.concatenate([
            k,
            jnp.broadcast_to(erow[None, :, None, :], (b, n, heads, h)),
            jnp.broadcast_to(ecol[None, :, None, :], (b, n, heads, w)),
        ], axis=-1)
        attn = jnp.einsum("bqnc,bknc->bnqk", qp, kp)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bnqk,bknc->bqnc", attn, v).reshape(b, n, c)
        return linear(out, p["proj"]).reshape(b, h, w, c)

    if b > 1 and windowed_impl != "xla":
        # windowed path: fused kernel avoiding the (B*nw, heads, T, T) HBM
        # materialization. "pallas" = one instance per (window, head);
        # "pallas_mh" = one instance per window, heads looped in-kernel
        # (16x fewer instances).
        from vosesam_tpu.ops.pallas.flash_attention import (
            window_attention_relpos,
            window_attention_relpos_mh,
        )

        kernel_fn = (window_attention_relpos_mh if windowed_impl == "pallas_mh"
                     else window_attention_relpos)
        out = kernel_fn(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), bias_h, bias_w, hw,
            interpret=jax.default_backend() != "tpu",
        )                                           # (b, heads, T, hd)
        out = out.transpose(0, 2, 1, 3).reshape(b, h * w, c)
        return linear(out, p["proj"]).reshape(b, h, w, c)

    scale = 1.0 / math.sqrt(hd)
    attn = jnp.einsum(
        "bqnc,bknc->bnqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    attn = attn + (
        bias_h[..., :, None] + bias_w[..., None, :]
    ).reshape(b, heads, h * w, hw[0] * hw[1])
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bnqk,bknc->bqnc", attn, v).reshape(b, h * w, c)
    return linear(out, p["proj"]).reshape(b, h, w, c)


def _window_partition(x: jax.Array, wsz: int):
    b, h, w, c = x.shape
    ph, pw = (wsz - h % wsz) % wsz, (wsz - w % wsz) % wsz
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // wsz, wsz, wp // wsz, wsz, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, wsz, wsz, c)
    return x, (hp, wp)


def _window_unpartition(x: jax.Array, wsz: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // ((hp // wsz) * (wp // wsz))
    x = x.reshape(b, hp // wsz, wp // wsz, wsz, wsz, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _block(x: jax.Array, p: Params, heads: int, window: int,
           use_flash: bool = False, windowed_impl: str = "xla") -> jax.Array:
    shortcut = x
    y = layer_norm(x, p["norm1"])
    if window > 0:
        # Windowed attention runs on XLA, with the rel-pos bias folded into
        # the QK matmul ("xla_fused_bias", default — measured fastest at
        # in-situ shapes, scripts/exp_encoder_opt.py: 40.6 vs 44.3 ms per
        # K=4 block). The Pallas window kernels lose in-situ (5.75 / 5.90
        # vs 6.46 fps): their 196x80 matmul instances underutilize the MXU
        # more than the XLA score materialization costs. Flash pays off only
        # for the global blocks' 4096-token attention. A window-major
        # persistent layout (partition once per run of windowed blocks) was
        # also measured and REJECTED: (100, 14, 14, 1280) activations are
        # tile-hostile (14 pads to 16 sublanes on every op) — 66.4 vs
        # 44.3 ms/block.
        y, pad_hw = _window_partition(y, window)
        y = _attention(y, p["attn"], heads, (window, window),
                       windowed_impl=windowed_impl)
        y = _window_unpartition(y, window, pad_hw, (x.shape[1], x.shape[2]))
    else:
        y = _attention(y, p["attn"], heads, (x.shape[1], x.shape[2]),
                       use_flash=use_flash)
    x = shortcut + y
    y = layer_norm(x, p["norm2"])
    # gelu_fast: tanh form in bf16 (error below bf16 rounding), exact erf
    # in fp32 — the encoder MLPs apply gelu to ~378M activations/frame at
    # the K=8 bench and the erf polynomial alone cost 3.55 ms/frame
    # (scripts/exp_gelu.py).
    y = linear(gelu_fast(linear(y, p["mlp"]["lin1"])), p["mlp"]["lin2"])
    return x + y


def _layer_norm_2d(x: jax.Array, p: Params, eps: float = 1e-6) -> jax.Array:
    """segment_anything's LayerNorm2d == channel-wise LN over NHWC last dim."""
    return layer_norm(x, p, eps)


def vit_encode(
    params: Params, x: jax.Array, cfg: SAMConfig, return_interm: bool = False
):
    """x: (H, W, 3) preprocessed image -> (H/16, W/16, 256) embedding.

    `return_interm` also returns the early global-attention block outputs
    (needed by the SAM-HQ decoder's ViT-feature fusion)."""
    dim, depth, heads, global_idx = cfg.encoder_dims()
    # Patch embed as an exact space-to-depth matmul instead of the 16x16/s16
    # conv: non-overlapping stride==kernel means the conv IS a reshape+dot,
    # but XLA:TPU lowers the C_in=3 conv form poorly (same pathology as the
    # ResNet stem, BASELINE.md). Measured 0.525 -> 0.213 ms/frame at the
    # rect bench shape (scripts/exp_patch_embed.py, device-loop); identical
    # MACs, bf16 rounding only.
    pw = params["patch_embed"]["proj"]["weight"]   # (P, P, 3, dim) HWIO
    P = cfg.patch_size
    xh, xw, _ = x.shape
    t = x.reshape(xh // P, P, xw // P, P, 3)
    t = t.transpose(0, 2, 1, 3, 4).reshape(1, xh // P, xw // P, P * P * 3)
    y = (jnp.dot(t, pw.reshape(P * P * 3, dim).astype(t.dtype),
                 preferred_element_type=t.dtype)
         + params["patch_embed"]["proj"]["bias"].astype(t.dtype))
    pe = params["pos_embed"]
    if pe.shape[1] != y.shape[1] or pe.shape[2] != y.shape[2]:
        if (cfg.encode_fixed_hw is None
                and pe.shape[1] >= y.shape[1] and pe.shape[2] >= y.shape[2]):
            # Sub-grid (encode_rect): the real tokens of a rect input sit in
            # the TOP-LEFT of the square grid, so the top-left crop of the
            # trained pos embed is exactly what those tokens would have seen
            # in the square encode.
            pe = pe[:, : y.shape[1], : y.shape[2]]
        else:
            # encode_fixed_hw: the frame FILLS the grid — interpolate the
            # trained table over the whole span (standard ViT resize).
            pe = jax.image.resize(
                pe, (1, y.shape[1], y.shape[2], pe.shape[3]), "linear")
    y = y + pe.astype(y.dtype)

    interm = []
    for i in range(depth):
        window = 0 if i in global_idx else cfg.window_size
        y = _block(y, params["blocks"][str(i)], heads, window,
                   use_flash=cfg.use_flash_attention,
                   windowed_impl=cfg.windowed_attention_impl)
        if return_interm and i in global_idx:
            interm.append(y[0])

    neck = params["neck"]
    y = conv2d(y, neck["0"])
    y = _layer_norm_2d(y, neck["1"])
    y = conv2d(y, neck["2"], padding=1)
    y = _layer_norm_2d(y, neck["3"])
    if return_interm:
        return y[0], interm
    return y[0]

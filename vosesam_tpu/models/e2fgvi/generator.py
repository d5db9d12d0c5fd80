"""E2FGVI-HQ inpainting generator, functional JAX.

Reference: inpainter/model/e2fgvi_hq.py — grouped-conv Encoder (:71-110 with
the group fusion trick), InpaintGenerator (:134-263: SPyNet flows at 1/4 res,
BasicVSR++-style bidirectional propagation with second-order deformable
alignment, SoftSplit/SoftComp token fold/unfold, 8 temporal-focal transformer
blocks — hidden 512, heads 4, window (5,9), focal level 2 — and a deconv
decoder with tanh output). The HQ variant's arbitrary-resolution
SoftSplit/SoftComp (output size passed at call time) is used; shapes stay
static per (H, W) under jit.

The temporal focal window attention (tfocal_transformer_hq.py:173-428) is
realized TPU-first: window partition as reshape/transpose, the 4 diagonal
rolled-key expansions with their static validity selection, and the fc-pooled
focal level as one extra key group — one fused softmax over
[window | rolled | pooled] keys.

Why focal attention stays XLA (no Pallas kernel): in-situ A/B of the
analogous SAM windowed attention showed both Pallas window-kernel designs
losing to XLA's batched einsum on this hardware class (BASELINE.md: 5.75 /
5.90 vs 6.46 fps — small-window attention is dominated by per-instance
overhead, not score-tensor HBM traffic), and the measured generator cost is
46.6 ms/frame at the app's 240x432 inpaint setting (scripts/bench_inpaint.py)
with the focal blocks a minority of it — a kernel would not pay for itself."""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vosesam_tpu.config import InpainterConfig
from vosesam_tpu.models.layers import (
    Params,
    conv2d,
    conv_init,
    layer_norm,
    linear,
    linear_init,
    ln_init,
)
from vosesam_tpu.models.e2fgvi import modules as M

WINDOW = (5, 9)
EXPAND = (2, 4)           # window // 2
KERNEL = (7, 7)
STRIDE = (3, 3)
PADDING = (3, 3)
HIDDEN = 512
CHANNEL = 128             # encoder output channels (channel//2 in reference)
HEADS = 4


# ------------------------------------------------------------------- encoder

ENC_SPEC = [
    # (cin, cout, stride, groups)
    (3, 64, 2, 1), (64, 64, 1, 1), (64, 128, 2, 1), (128, 256, 1, 1),
    (256, 384, 1, 1), (640, 512, 1, 2), (768, 384, 1, 4), (640, 256, 1, 8),
    (512, 128, 1, 1),
]


def encoder_init(key, dtype=jnp.float32) -> Params:
    layers: Params = {}
    for i, (cin, cout, _, groups) in enumerate(ENC_SPEC):
        layers[str(2 * i)] = conv_init(
            jax.random.fold_in(key, i), 3, 3, cin // groups, cout, dtype=dtype
        )
    return {"layers": layers}


def encoder_forward(p: Params, x: jax.Array) -> jax.Array:
    """(BT, H, W, 3) -> (BT, H/4, W/4, 128) with the group-fusion trick
    (e2fgvi_hq.py:96-110: from layer 5 on, the stride-4 feature x0 is
    re-interleaved group-wise with the running activation)."""
    bt = x.shape[0]
    out = x
    x0 = None
    for i, (cin, cout, stride, groups) in enumerate(ENC_SPEC):
        if i == 4:
            x0 = out
        if i > 4:
            g = groups
            h, w = x0.shape[1], x0.shape[2]
            xs = x0.reshape(bt, h, w, g, -1)
            os_ = out.reshape(bt, h, w, g, -1)
            out = jnp.concatenate([xs, os_], axis=-1).reshape(bt, h, w, -1)
        out = conv2d(out, p["layers"][str(2 * i)], stride=stride, padding=1,
                     feature_group_count=groups)
        out = M.leaky_relu(out, 0.2)
    return out


def decoder_init(key, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "0": {"conv": conv_init(ks[0], 3, 3, CHANNEL, 128, dtype=dtype)},
        "2": conv_init(ks[1], 3, 3, 128, 64, dtype=dtype),
        "4": {"conv": conv_init(ks[2], 3, 3, 64, 64, dtype=dtype)},
        "6": conv_init(ks[3], 3, 3, 64, 3, dtype=dtype),
    }


def _deconv(x, p):
    # x2 bilinear upsample with align_corners=True (e2fgvi_hq.py:127-130)
    from vosesam_tpu.ops.image import resize_bilinear_align_corners

    h, w = x.shape[1] * 2, x.shape[2] * 2
    x = resize_bilinear_align_corners(x, (h, w))
    return conv2d(x, p["conv"], padding=1)


def decoder_forward(p: Params, x: jax.Array) -> jax.Array:
    x = M.leaky_relu(_deconv(x, p["0"]), 0.2)
    x = M.leaky_relu(conv2d(x, p["2"], padding=1), 0.2)
    x = M.leaky_relu(_deconv(x, p["4"]), 0.2)
    return conv2d(x, p["6"], padding=1)


# ------------------------------------------------- bidirectional propagation

def bidir_prop_init(key, channel: int = CHANNEL, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 6)
    p: Params = {"deform_align": {}, "backbone": {}}
    for i, name in enumerate(("backward_", "forward_")):
        p["deform_align"][name] = M.deform_align_init(ks[i], channel, dtype=dtype)
        p["backbone"][name] = {
            "0": conv_init(ks[2 + i], 3, 3, (2 + i) * channel, channel, dtype=dtype),
            "2": conv_init(jax.random.fold_in(ks[2 + i], 1), 3, 3, channel, channel, dtype=dtype),
        }
    p["fusion"] = conv_init(ks[4], 1, 1, 2 * channel, channel, dtype=dtype)
    return p


def bidirectional_propagation(
    p: Params,
    x: jax.Array,             # (T, H, W, C) local features (batch folded out)
    flows_backward: jax.Array,  # (T-1, H, W, 2)
    flows_forward: jax.Array,   # (T-1, H, W, 2)
) -> jax.Array:
    """feat_prop.py:60-149 (batch=1 specialization; the reference also runs
    b=1 through the inpaint driver). Python loop over T — T is static (the
    driver uses fixed windows)."""
    t, h, w, c = x.shape
    spatial = [x[i] for i in range(t)]
    feats = {"spatial": spatial}

    for mi, name in enumerate(("backward_", "forward_")):
        out: List[jax.Array] = []
        frame_idx = list(range(t))
        flow_idx = list(range(-1, t - 1))
        if name == "backward_":
            frame_idx = frame_idx[::-1]
            flows = flows_backward
        else:
            flows = flows_forward

        feat_prop = jnp.zeros((h, w, c), x.dtype)
        for i, idx in enumerate(frame_idx):
            feat_current = spatial[idx]
            if i > 0:
                flow_n1 = flows[flow_idx[i]]
                cond_n1 = M.flow_warp(feat_prop, flow_n1)
                feat_n2 = jnp.zeros_like(feat_prop)
                flow_n2 = jnp.zeros_like(flow_n1)
                cond_n2 = jnp.zeros_like(cond_n1)
                if i > 1:
                    feat_n2 = out[-2]
                    flow_n2 = flows[flow_idx[i - 1]]
                    flow_n2 = flow_n1 + M.flow_warp(flow_n2, flow_n1)
                    cond_n2 = M.flow_warp(feat_n2, flow_n2)
                cond = jnp.concatenate([cond_n1, feat_current, cond_n2], -1)
                packed = jnp.concatenate([feat_prop, feat_n2], -1)
                feat_prop = M.second_order_deform_align(
                    p["deform_align"][name], packed[None], cond[None],
                    flow_n1[None], flow_n2[None],
                )[0]
            cat = [feat_current]
            if mi == 1:  # forward pass also sees the backward features
                cat.append(feats["backward_"][idx])
            cat.append(feat_prop)
            feat = jnp.concatenate(cat, -1)
            y = M.leaky_relu(conv2d(feat, p["backbone"][name]["0"], padding=1), 0.1)
            y = conv2d(y, p["backbone"][name]["2"], padding=1)
            feat_prop = feat_prop + y
            out.append(feat_prop)
        if name == "backward_":
            out = out[::-1]
        feats[name] = out

    fused = [
        conv2d(
            jnp.concatenate([feats["backward_"][i], feats["forward_"][i]], -1),
            p["fusion"],
        )
        for i in range(t)
    ]
    return jnp.stack(fused) + x


# -------------------------------------------------- temporal focal attention

def _rolled_valid_indices() -> np.ndarray:
    """Static key-selection for the 4 diagonal rolled windows
    (tfocal_transformer_hq.py:190-205)."""
    wh, ww = WINDOW
    eh, ew = EXPAND
    masks = []
    for corner in ("tl", "tr", "bl", "br"):
        m = np.ones((wh, ww), np.float32)
        if corner == "tl":
            m[:-eh, :-ew] = 0
        elif corner == "tr":
            m[:-eh, ew:] = 0
        elif corner == "bl":
            m[eh:, :-ew] = 0
        else:
            m[eh:, ew:] = 0
        masks.append(m)
    flat = np.stack(masks, 0).reshape(-1)
    return np.nonzero(flat)[0]


ROLLED_IDX = _rolled_valid_indices()


def _window_partition(x: jax.Array, win: Tuple[int, int]) -> jax.Array:
    """(T, H, W, C) -> (nW, T, wh*ww, C); H, W must be multiples of win."""
    t, h, w, c = x.shape
    wh, ww = win
    x = x.reshape(t, h // wh, wh, w // ww, ww, c)
    x = x.transpose(1, 3, 0, 2, 4, 5)
    return x.reshape(-1, t, wh * ww, c)


def _window_reverse(x: jax.Array, win: Tuple[int, int], hw: Tuple[int, int]) -> jax.Array:
    h, w = hw
    wh, ww = win
    nwh, nww = h // wh, w // ww
    t = x.shape[1]
    x = x.reshape(nwh, nww, t, wh, ww, -1)
    return x.transpose(2, 0, 3, 1, 4, 5).reshape(t, h, w, -1)


def focal_block_init(key, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 5)
    return {
        "norm1": ln_init(HIDDEN, dtype),
        "attn": {
            "qkv": linear_init(ks[0], HIDDEN, 3 * HIDDEN, dtype=dtype),
            "proj": linear_init(ks[1], HIDDEN, HIDDEN, dtype=dtype),
        },
        "pool_layers": {
            "0": {
                "weight": jnp.full((WINDOW[0] * WINDOW[1], 1), 1.0 / 45.0, dtype),
                "bias": jnp.zeros((1,), dtype),
            }
        },
        "norm2": ln_init(HIDDEN, dtype),
        "mlp": M.fusion_feed_forward_init(ks[2], HIDDEN, dtype),
    }


def focal_attention(p: Params, x: jax.Array, pooled: jax.Array,
                    pooled_valid: jax.Array,
                    frame_valid: Optional[jax.Array] = None) -> jax.Array:
    """x: (T, H, W, C) padded to window multiples; pooled: (T, nWh, nWw, C);
    pooled_valid: (nWh, nWw) bool (False on padding). One fused softmax over
    [window | rolled | pooled-context] keys per window.

    `frame_valid` ((T,) bool, optional): frames marked False contribute NO
    keys anywhere (additive -1e9 before the fp32 softmax -> exactly zero
    weight), making a window padded with invalid frames bit-identical to
    the unpadded computation for the valid frames — the static-shape
    inpaint-window fast path (pipeline/inpaint.py)."""
    t, h, w, c = x.shape
    wh, ww = WINDOW
    hd = c // HEADS

    qkv = linear(x, p["attn"]["qkv"]).reshape(t, h, w, 3, c)
    q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]

    def part(a):  # (nW, T, wa, heads, hd)
        win = _window_partition(a, WINDOW)
        return win.reshape(win.shape[0], t, wh * ww, HEADS, hd)

    qw, kw, vw = part(q), part(k), part(v)
    nw = qw.shape[0]
    wa = t * wh * ww
    qf = qw.transpose(0, 3, 1, 2, 4).reshape(nw, HEADS, wa, hd)

    # rolled expansions (4 diagonal shifts, static valid-index selection)
    rolled_k, rolled_v = [], []
    for sy, sx in ((-EXPAND[0], -EXPAND[1]), (-EXPAND[0], EXPAND[1]),
                   (EXPAND[0], -EXPAND[1]), (EXPAND[0], EXPAND[1])):
        kr = jnp.roll(k, (sy, sx), axis=(1, 2))
        vr = jnp.roll(v, (sy, sx), axis=(1, 2))
        rolled_k.append(part(kr))
        rolled_v.append(part(vr))
    k_rolled = jnp.concatenate(rolled_k, axis=2)   # (nW, T, 4*wa', heads, hd)
    v_rolled = jnp.concatenate(rolled_v, axis=2)
    k_rolled = k_rolled[:, :, ROLLED_IDX]
    v_rolled = v_rolled[:, :, ROLLED_IDX]

    # pooled focal context: per-window (5,9) neighborhood of the pooled map
    qkv_p = linear(pooled, p["attn"]["qkv"]).reshape(t, *pooled.shape[1:3], 3, c)
    kp, vp = qkv_p[..., 1, :], qkv_p[..., 2, :]

    def unfold_ctx(a):  # (T, nWh, nWw, C) -> (nW, T, 45, C)
        bt = a.reshape(t, *a.shape[1:])
        u = M.unfold(bt, WINDOW, (1, 1), (WINDOW[0] // 2, WINDOW[1] // 2))
        # (T, nWh*nWw, C*45) channel-major -> (T, nW, C, 45)
        u = u.reshape(t, -1, c, wh * ww).transpose(1, 0, 3, 2)
        return u  # (nW, T, 45, C)

    k_pool = unfold_ctx(kp)
    v_pool = unfold_ctx(vp)
    vmask = M.unfold(
        pooled_valid[None, :, :, None].astype(jnp.float32),
        WINDOW, (1, 1), (WINDOW[0] // 2, WINDOW[1] // 2),
    ).reshape(-1, wh * ww)                      # (nW, 45)
    pool_bias = jnp.where(vmask > 0, 0.0, -100.0)

    def heads_of(a):  # (nW, T, N, C) or (nW, T, N, HEADS, hd) -> (nW, HEADS, T*N, hd)
        if a.ndim == 4:
            nwl, tl, nl, _ = a.shape
            a = a.reshape(nwl, tl, nl, HEADS, hd)
        nwl, tl, nl = a.shape[:3]
        return a.transpose(0, 3, 1, 2, 4).reshape(nwl, HEADS, tl * nl, hd)

    k_all = jnp.concatenate(
        [kw.transpose(0, 3, 1, 2, 4).reshape(nw, HEADS, wa, hd),
         heads_of(k_rolled), heads_of(k_pool)], axis=2)
    v_all = jnp.concatenate(
        [vw.transpose(0, 3, 1, 2, 4).reshape(nw, HEADS, wa, hd),
         heads_of(v_rolled), heads_of(v_pool)], axis=2)

    scale = 1.0 / math.sqrt(hd)
    attn = jnp.einsum(
        "nhqd,nhkd->nhqk", qf * scale, k_all, preferred_element_type=jnp.float32
    )
    # additive -100 bias on invalid pooled keys (per T slice, tiled)
    n_roll = k_rolled.shape[2]
    bias = jnp.concatenate(
        [jnp.zeros((nw, wa + t * n_roll)),
         jnp.tile(pool_bias, (1, t))], axis=1)
    attn = attn + bias[:, None, None, :]
    if frame_valid is not None:
        fb = jnp.where(frame_valid, 0.0, -1e9).astype(jnp.float32)  # (T,)
        frame_bias = jnp.concatenate([
            jnp.repeat(fb, wh * ww),          # window keys, T-major
            jnp.repeat(fb, n_roll),           # rolled keys, T-major
            jnp.repeat(fb, k_pool.shape[2]),  # pooled keys, T-major
        ])
        attn = attn + frame_bias[None, None, None, :]
    attn = jax.nn.softmax(attn, axis=-1).astype(v_all.dtype)
    out = jnp.einsum("nhqk,nhkd->nhqd", attn, v_all)
    out = out.transpose(0, 2, 1, 3).reshape(nw, t, wh * ww, c)
    out = _window_reverse(out, WINDOW, (h, w))
    return linear(out, p["attn"]["proj"])


def focal_block_forward(p: Params, x: jax.Array, output_size: Tuple[int, int],
                        frame_valid: Optional[jax.Array] = None) -> jax.Array:
    """TemporalFocalTransformerBlock (:430-530). x: (T, fh, fw, C)."""
    t, fh, fw, c = x.shape
    wh, ww = WINDOW
    shortcut = x
    y = layer_norm(x, p["norm1"])

    # pad to window multiples
    ph = -fh % wh
    pw = -fw % ww
    yp = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hh, wwid = fh + ph, fw + pw

    # fc-pooled focal map: one pooled token per window (pool_layers.0)
    nwh, nww = hh // wh, wwid // ww
    win = yp.reshape(t, nwh, wh, nww, ww, c).transpose(0, 1, 3, 5, 2, 4)
    win = win.reshape(t, nwh, nww, c, wh * ww)
    pooled = (
        jnp.einsum("tnmck,ko->tnmco", win, p["pool_layers"]["0"]["weight"].astype(win.dtype))[..., 0]
        + p["pool_layers"]["0"]["bias"].astype(win.dtype)
    )
    # validity: windows fully inside the unpadded area count as valid pools
    valid = jnp.ones((nwh, nww), bool)

    att = focal_attention(p, yp, pooled, valid, frame_valid)[:, :fh, :fw]
    x = shortcut + att

    y = layer_norm(x, p["norm2"])
    y = M.fusion_feed_forward(
        p["mlp"], y.reshape(1, t * fh * fw, c), output_size, KERNEL, STRIDE, PADDING
    ).reshape(t, fh, fw, c)
    return x + y


# ----------------------------------------------------------------- generator

def generator_init(key, cfg: InpainterConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 8)
    return {
        "encoder": encoder_init(ks[0], dtype),
        "decoder": decoder_init(ks[1], dtype),
        "feat_prop_module": bidir_prop_init(ks[2], CHANNEL, dtype),
        "ss": M.soft_split_init(ks[3], CHANNEL, HIDDEN, KERNEL, dtype),
        "sc": M.soft_comp_init(ks[4], CHANNEL, HIDDEN, KERNEL, dtype,
                               hq=cfg.hq),
        "transformer": {
            str(i): focal_block_init(jax.random.fold_in(ks[5], i), dtype)
            for i in range(cfg.num_blocks)
        },
        "update_spynet": M.spynet_init(ks[6], dtype),
    }


def _resize_quarter(x: jax.Array) -> jax.Array:
    # align_corners=True per forward_bidirect_flow (e2fgvi_hq.py:214-221)
    from vosesam_tpu.ops.image import resize_bilinear_align_corners

    t, h, w, c = x.shape
    return resize_bilinear_align_corners(x, (h // 4, w // 4))


def generator_forward(
    params: Params,
    masked_frames: jax.Array,   # (T, H, W, 3) in [-1, 1]
    num_local: int,
    cfg: InpainterConfig,
    frame_valid: Optional[jax.Array] = None,   # (T,) bool; pads False
    remat: bool = False,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """e2fgvi_hq.py:235-263. Returns ((T, H, W, 3) tanh output,
    (forward, backward) 1/4-res flows of the local frames).

    `frame_valid` marks padded NON-LOCAL slots (static-window fast path):
    they are excluded from every attention softmax, so valid frames'
    outputs are bit-identical to running the unpadded window. All local
    frames must be valid (they feed the flow/propagation path).

    `remat` (training only): jax.checkpoint each stage (spynet, encoder,
    propagation, every focal block, decoder) so the GAN step's backward
    recomputes stage activations instead of keeping them live — without
    it the standard T=8 240x432 training step exceeds one v5e's HBM
    (BASELINE.md). Forward-only values are identical; inference callers
    leave it off."""
    t, h, w, _ = masked_frames.shape
    lt = num_local
    if "bias" in params["sc"]:
        # Non-HQ E2FGVI: SoftComp carries a learned additive bias pinned to
        # the (60, 108) feature grid (tfocal_transformer.py:56-63), so only
        # the 240x432 training size is valid. Fail with a clear message
        # instead of an opaque broadcast error in soft_comp's bias add.
        bh, bw = params["sc"]["bias"].shape[:2]
        if (h, w) != (bh * 4, bw * 4):
            raise ValueError(
                f"InpainterConfig(hq=False) only supports "
                f"{bh * 4}x{bw * 4} inputs (SoftComp's learned bias is "
                f"pinned to the ({bh}, {bw}) feature grid); got {h}x{w}. "
                f"Use hq=True for arbitrary resolutions.")

    ckpt = jax.checkpoint if remat else (lambda f: f)

    # bidirectional flows on the local window (frames mapped back to [0,1])
    local01 = (masked_frames[:lt] + 1.0) / 2.0
    small = _resize_quarter(local01)
    sh, sw = small.shape[1:3]
    # spynet needs /32: resize up then scale flow back (flow_comp.py:137-170)
    uh = -(-sh // 32) * 32
    uw = -(-sw // 32) * 32
    up = jax.image.resize(small, (lt, uh, uw, 3), "linear")
    f_fwd = ckpt(M.spynet_flow)(params["update_spynet"], up[:-1], up[1:])
    f_bwd = ckpt(M.spynet_flow)(params["update_spynet"], up[1:], up[:-1])

    def down_flow(f):
        f = jax.image.resize(f, (lt - 1, sh, sw, 2), "linear")
        return f * jnp.array([sw / uw, sh / uh], f.dtype)

    flows_forward = down_flow(f_fwd)
    flows_backward = down_flow(f_bwd)

    enc = ckpt(encoder_forward)(params["encoder"], masked_frames)  # (T, h/4, w/4, 128)
    eh, ew = enc.shape[1:3]
    local_feat = ckpt(bidirectional_propagation)(
        params["feat_prop_module"], enc[:lt], flows_backward, flows_forward
    )
    enc_feat = jnp.concatenate([local_feat, enc[lt:]], axis=0)

    tokens = M.soft_split(params["ss"], enc_feat, KERNEL, STRIDE, PADDING)
    fh = (eh + 2 * PADDING[0] - KERNEL[0]) // STRIDE[0] + 1
    fw = (ew + 2 * PADDING[1] - KERNEL[1]) // STRIDE[1] + 1
    x = tokens.reshape(t, fh, fw, HIDDEN)
    block_fn = ckpt(lambda p, xx: focal_block_forward(
        p, xx, (eh, ew), frame_valid=frame_valid))
    for i in range(cfg.num_blocks):
        x = block_fn(params["transformer"][str(i)], x)
    trans = M.soft_comp(
        params["sc"], x.reshape(t, fh * fw, HIDDEN), (eh, ew), KERNEL, STRIDE, PADDING
    )
    enc_feat = enc_feat + trans

    out = ckpt(decoder_forward)(params["decoder"], enc_feat)
    return jnp.tanh(out), (flows_forward, flows_backward)

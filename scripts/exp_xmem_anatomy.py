"""Per-component timing of the XMem step on the real chip, with a
space-to-depth stem A/B for the ResNet trunks.

Context (BASELINE.md 2026-08-18): the xmem stage costs ~11.9 ms/frame at
K=8 — fused memory read 4.86, "ResNet convs 4.7" (trace attribution),
rest ~2.4. This breaks the conv side down: stem vs layer1/2/3 vs key
projection vs decoder vs value encoder, each device-loop timed (1-element
sync; see BASELINE.md on why per-dispatch timing lies on this tunnel).

The s2d hypothesis: the 7x7/s2 stem conv contracts only 7*7*3=147 input
values with C_in=3 — lanes pad 3->8 and the MXU runs nearly empty. An
exact rewrite (space-to-depth by 2, then a 4x4/s1 conv on 4C channels with
asymmetric pad (2,1)) keeps the math identical while quadrupling channel
occupancy. Verified bit-level-equivalent modulo fp reassociation before
timing.

Reference stem: tracker/model/resnet.py:117-131 (conv1 7x7 s2 p3 + bn +
relu + 3x3 s2 maxpool).

Run: python scripts/exp_xmem_anatomy.py [dtype]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

from vosesam_tpu.config import XMemConfig
from vosesam_tpu.models import resnet
from vosesam_tpu.models.layers import batch_norm, conv2d, max_pool, relu
from vosesam_tpu.models.xmem import modules as M
from vosesam_tpu.models.xmem import network as xnet


def timeit(name, fn, *args, n=20, flops=None):
    out = fn(*args)
    first = out[0] if isinstance(out, (tuple, list)) else out
    np.asarray(first.ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    first = out[0] if isinstance(out, (tuple, list)) else out
    np.asarray(first.ravel()[0:1])
    ms = (time.perf_counter() - t0) / n * 1e3
    tf = f"  {flops / (ms / 1e3) / 1e12:6.2f} TFLOPS" if flops else ""
    print(f"  {name:40s} {ms:8.2f} ms{tf}", flush=True)
    return ms


# ----------------------------------------------------------- s2d stem rewrite

def s2d_stem_weight(w: jax.Array) -> jax.Array:
    """(7,7,C,64) stride-2 kernel -> (4,4,4C,64) stride-1 kernel over the
    2x-space-to-depth input. Index map: i = 2*ka + dy - 1 (one zero slot)."""
    c, o = w.shape[2], w.shape[3]
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))       # i+1 = 2*ka+dy
    wp = wp.reshape(4, 2, 4, 2, c, o)                        # (ka,dy,kb,dx,c,o)
    wp = wp.transpose(0, 2, 1, 3, 4, 5)                      # (ka,kb,dy,dx,c,o)
    return wp.reshape(4, 4, 4 * c, o)


def s2d_stem(x: jax.Array, p) -> jax.Array:
    """Exact replacement for conv2d(x, conv1, stride=2, padding=3) + bn +
    relu + maxpool. x: (N,H,W,C) with even H,W."""
    n, h, w, c = x.shape
    x2 = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    x2 = x2.reshape(n, h // 2, w // 2, 4 * c)
    w2 = s2d_stem_weight(p["conv1"]["weight"])
    y = jax.lax.conv_general_dilated(
        x2, w2.astype(x2.dtype), window_strides=(1, 1),
        padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = relu(batch_norm(y, p["bn1"]))
    return max_pool(y, 3, 2, 1)


def plain_stem(x, p):
    y = relu(batch_norm(conv2d(x, p["conv1"], stride=2, padding=3), p["bn1"]))
    return max_pool(y, 3, 2, 1)


def main():
    dtype = jnp.bfloat16 if (len(sys.argv) < 2 or sys.argv[1] == "bf16") else jnp.float32
    h, w = 480, 864
    cfg = XMemConfig(max_objects=3)
    params = xnet.xmem_init(jax.random.PRNGKey(0), cfg, dtype=dtype)
    kp = params["key_encoder"]

    frame = jax.random.normal(jax.random.PRNGKey(1), (h, w, 3), dtype)
    fb = frame[None]

    # --- equivalence check (fp32 for a tight tolerance) -------------------
    kp32 = jax.tree.map(lambda a: a.astype(jnp.float32), kp)
    f32 = frame[None].astype(jnp.float32)
    a = jax.jit(plain_stem)(f32, kp32)
    b = jax.jit(s2d_stem)(f32, kp32)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"s2d stem max|diff| (fp32): {err:.3e}")
    assert err < 1e-4, "s2d stem is not equivalent"

    print(f"\nXMem component anatomy @ {h}x{w}, {np.dtype(dtype.dtype if hasattr(dtype, 'dtype') else dtype).name}")

    # --- stems -------------------------------------------------------------
    stem_flops = 2 * (h // 2) * (w // 2) * 64 * 7 * 7 * 3
    timeit("stem (7x7 s2 conv+bn+relu+maxpool)",
           jax.jit(plain_stem), fb, kp, flops=stem_flops)
    timeit("stem s2d (4x4 s1 on 12ch)",
           jax.jit(s2d_stem), fb, kp, flops=stem_flops)

    # --- stages ------------------------------------------------------------
    def run_stage(params_stage, x, si):
        y = x
        for bi in range(len(params_stage)):
            stride = 1 if (si == 0 or bi > 0) else 2
            y = resnet._bottleneck(y, params_stage[str(bi)], stride)
        return y

    x4 = jax.jit(plain_stem)(fb, kp)                   # (1,120,216,64)
    l1 = jax.jit(lambda s, x: run_stage(s, x, 0))
    x_l1 = l1(kp["layer1"], x4)
    l2 = jax.jit(lambda s, x: run_stage(s, x, 1))
    x_l2 = l2(kp["layer2"], x_l1)
    l3 = jax.jit(lambda s, x: run_stage(s, x, 2))
    timeit("resnet50 layer1 (120x216, 64->256)", l1, kp["layer1"], x4)
    timeit("resnet50 layer2 (->60x108, 512)", l2, kp["layer2"], x_l1)
    timeit("resnet50 layer3 (->30x54, 1024)", l3, kp["layer3"], x_l2)

    # --- full encoders -----------------------------------------------------
    ek = jax.jit(lambda p, f: xnet.encode_key(p, f))
    timeit("encode_key full (rn50 + key proj)", ek, params, frame)

    key, sk, ekk, feats = ek(params, frame)
    timeit("key_projection only",
           jax.jit(lambda p, f: M.key_projection(f, p, True, True)),
           params["key_proj"], feats.f16[None])

    masks = jnp.zeros((cfg.max_objects, h, w), dtype).at[0, 100:300, 100:400].set(1.0)
    valid = jnp.array([True, True, False])
    hidden = jnp.zeros((cfg.max_objects, h // 16, w // 16, cfg.hidden_dim), dtype)
    ev = jax.jit(lambda p, f, f16, hd, m, v: xnet.encode_value(
        p, f, f16, hd, m, v, cfg))
    timeit("encode_value (rn18, O=3)", ev, params, frame, feats.f16,
           hidden, masks, valid)

    readout = jax.random.normal(
        jax.random.PRNGKey(2),
        (cfg.max_objects, h // 16, w // 16, cfg.value_dim), dtype)
    seg = jax.jit(lambda p, f16, f8, f4, r, hd, v: xnet.segment(
        p, xnet.MultiScaleFeatures(f16, f8, f4), r, hd, v, cfg))
    timeit("segment (decoder+agg, O=3)", seg, params, feats.f16, feats.f8,
           feats.f4, readout, hidden, valid)

    # --- rn50 with s2d stem end-to-end --------------------------------------
    def rn50_s2d(p, f):
        y = s2d_stem(f[None], p)
        for si in range(3):
            y = run_stage(p[f"layer{si + 1}"], y, si)
        return y

    def rn50_plain(p, f):
        y = plain_stem(f[None], p)
        for si in range(3):
            y = run_stage(p[f"layer{si + 1}"], y, si)
        return y

    timeit("resnet50 full (plain stem)", jax.jit(rn50_plain), kp, frame)
    timeit("resnet50 full (s2d stem)", jax.jit(rn50_s2d), kp, frame)


if __name__ == "__main__":
    main()

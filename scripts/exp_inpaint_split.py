"""Stage split of the E2FGVI-HQ generator window on the real chip.

Times each sub-stage of generator_forward in isolation with a device loop
(lax.fori-style chaining is impossible across stages with different
signatures; instead each stage is its own jit, timed over n dispatches with
one final sync — on this tunneled platform that attributes ~25 ms of fixed
latency to each stage ONCE, amortized over n).

Stages (shapes for T=15 local=11 at 240x432):
  resize_q   : local frames -> 1/4 (60x108) -> /32 pad (64x128)
  spynet     : 2 x 14-pair flow pyramids at 64x128
  downflow   : flow back-resize to 60x108
  encoder    : (15, 240, 432, 3) conv encoder -> (15, 60, 108, 128)
  prop       : bidirectional deformable propagation on locals
  focal      : 8 focal transformer blocks on (15, 60x108 tokens)
  softsplit/comp + decoder: the rest

Run: python scripts/exp_inpaint_split.py [T] [num_local] [H W] [dtype]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync1(out):
    # 1-element device-side slice sync (tunnel is ~34 MB/s: a full-output
    # np.asarray bills seconds of host transfer to the stage)
    jax.tree.map(lambda a: np.asarray(a.ravel()[0:1]), out)


def timeit(name, fn, *args, n=8):
    out = fn(*args)
    _sync1(out)      # sync after compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync1(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"  {name:28s} {ms:8.2f} ms", flush=True)
    return out


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))

    from vosesam_tpu.config import InpainterConfig
    from vosesam_tpu.models.e2fgvi import generator as G
    from vosesam_tpu.models.e2fgvi import modules as M

    t = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    lt = int(sys.argv[2]) if len(sys.argv) > 2 else 11
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 240
    w = int(sys.argv[4]) if len(sys.argv) > 4 else 432
    dtype = jnp.bfloat16 if (len(sys.argv) > 5 and sys.argv[5] == "bf16") else jnp.float32

    cfg = InpainterConfig()
    params = G.generator_init(jax.random.PRNGKey(0), cfg, dtype=dtype)
    frames = jax.random.uniform(jax.random.PRNGKey(1), (t, h, w, 3), dtype, -1.0, 1.0)
    print(f"T={t} local={lt} {h}x{w} {dtype.__name__}")

    local01 = (frames[:lt] + 1.0) / 2.0
    small = timeit("resize_quarter", jax.jit(G._resize_quarter), local01)
    sh, sw = small.shape[1:3]
    uh, uw = -(-sh // 32) * 32, -(-sw // 32) * 32
    up = timeit("resize_up_to_32", jax.jit(
        lambda s: jax.image.resize(s, (lt, uh, uw, 3), "linear")), small)

    spy = jax.jit(lambda p, a, b: M.spynet_flow(p, a, b))
    f_fwd = timeit("spynet_fwd(14 pairs)", spy, params["update_spynet"], up[:-1], up[1:])
    timeit("spynet_bwd", spy, params["update_spynet"], up[1:], up[:-1])

    def down_flow(f):
        f = jax.image.resize(f, (lt - 1, sh, sw, 2), "linear")
        return f * jnp.array([sw / uw, sh / uh], f.dtype)
    flows_f = timeit("down_flow", jax.jit(down_flow), f_fwd)
    flows_b = jax.jit(down_flow)(f_fwd)

    enc = timeit("encoder", jax.jit(
        lambda p, f: G.encoder_forward(p, f)), params["encoder"], frames)

    prop = timeit("bidir_prop", jax.jit(
        lambda p, e, fb, ff: G.bidirectional_propagation(p, e, fb, ff)),
        params["feat_prop_module"], enc[:lt], flows_b, flows_f)

    enc_feat = jnp.concatenate([prop, enc[lt:]], axis=0)
    eh, ew = enc.shape[1:3]
    tokens = jax.jit(lambda p, e: M.soft_split(
        p, e, G.KERNEL, G.STRIDE, G.PADDING))(params["ss"], enc_feat)
    fh = (eh + 2 * G.PADDING[0] - G.KERNEL[0]) // G.STRIDE[0] + 1
    fw = (ew + 2 * G.PADDING[1] - G.KERNEL[1]) // G.STRIDE[1] + 1
    x = tokens.reshape(t, fh, fw, G.HIDDEN)

    def all_blocks(p, xx):
        for i in range(cfg.num_blocks):
            xx = G.focal_block_forward(p[str(i)], xx, (eh, ew))
        return xx
    x = timeit(f"focal x{cfg.num_blocks}", jax.jit(all_blocks),
               params["transformer"], x)

    def tail(p, xx, ef):
        trans = M.soft_comp(p["sc"], xx.reshape(t, fh * fw, G.HIDDEN),
                            (eh, ew), G.KERNEL, G.STRIDE, G.PADDING)
        return jnp.tanh(G.decoder_forward(p["decoder"], ef + trans))
    timeit("softcomp+decoder", jax.jit(tail), params, x, enc_feat)

    fwd = jax.jit(lambda p, f: G.generator_forward(p, f, lt, cfg)[0])
    timeit("FULL generator", fwd, params, frames, n=5)


if __name__ == "__main__":
    main()

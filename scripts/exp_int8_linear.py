"""Is int8 worth it for the encoder linears on this chip?

The v5e MXU runs s8 x s8 -> s32 at 2x the bf16 rate, and the encode
stage's linear dots are the single largest device cost (22.1 ms/frame in
the round-2 trace, ~140 TFLOPS effective — at roofline for bf16). This
measures, at the REAL vit_h MLP shapes under the K=8 chunk, a dependent
chain of MLP blocks in three arithmetic modes:

  bf16       : x @ W1 -> gelu -> @ W2                      (production today)
  int8-dyn   : per-token dynamic absmax quant of activations + per-out-
               channel weight scales, s8xs8->s32 dots, dequant between
               (the honest serving recipe — quant overhead included)
  int8-static: activation scale fixed (calibrated), so the absmax reduce
               disappears; lower bound for the quant-overhead tax

Device-loop timing (jit contains the whole chain; one final np.asarray
sync), NOT per-dispatch. Decision rule: int8-dyn must beat bf16 by >20%
on the chain to justify wiring an opt-in SAMConfig gear; otherwise this
file is the rejection ledger entry.

Run: PYTHONPATH=.:$PYTHONPATH python scripts/exp_int8_linear.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

# vit_h windowed-block MLP at K=8 rect-encode: 8 frames x 36x64 tokens
TOKENS = 8 * 36 * 64          # 18432
CIN, CHID = 1280, 5120
DEPTH = 8                     # dependent blocks per timed call
REPS = 30


def _time(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])            # warm + compile
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / REPS * 1e3  # ms per chain call


def _log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    rng = np.random.default_rng(0)
    # cheap support probe: does the backend compile an s8xs8->s32 dot at all?
    _log("probe: tiny int8 dot compile...")
    a = jnp.ones((256, 256), jnp.int8)
    r = jax.jit(lambda a: jax.lax.dot_general(
        a, a, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32))(a)
    np.asarray(r)
    _log("probe OK")
    x0 = jnp.asarray(rng.standard_normal((TOKENS, CIN)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((CIN, CHID)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((CHID, CIN)) * 0.02, jnp.bfloat16)

    # pre-quantized weights: per-out-channel symmetric
    def quant_w(w):
        wf = np.asarray(w, np.float32)
        s = np.abs(wf).max(axis=0) / 127.0 + 1e-12
        return jnp.asarray(np.round(wf / s).astype(np.int8)), jnp.asarray(
            s, jnp.float32)

    w1q, s1 = quant_w(w1)
    w2q, s2 = quant_w(w2)

    def mlp_bf16(x, w1, w2):
        def body(x, _):
            h = jax.nn.gelu(
                jnp.dot(x, w1, preferred_element_type=jnp.bfloat16),
                approximate=True).astype(jnp.bfloat16)
            y = jnp.dot(h, w2, preferred_element_type=jnp.bfloat16)
            return (x + y).astype(jnp.bfloat16), ()
        x, _ = jax.lax.scan(body, x, None, length=DEPTH)
        return x

    def q_dyn(x):
        s = (jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
             / 127.0 + 1e-12)
        xq = jnp.round(x.astype(jnp.float32) / s).astype(jnp.int8)
        return xq, s

    def mlp_int8(x, w1q, s1, w2q, s2, static_scale):
        def body(x, _):
            if static_scale is None:
                xq, sx = q_dyn(x)
            else:
                sx = static_scale
                xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                              -127, 127).astype(jnp.int8)
            h32 = jax.lax.dot_general(
                xq, w1q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            h = jax.nn.gelu(
                (h32.astype(jnp.float32) * sx * s1[None, :]),
                approximate=True).astype(jnp.bfloat16)
            if static_scale is None:
                hq, sh = q_dyn(h)
            else:
                sh = static_scale
                hq = jnp.clip(jnp.round(h.astype(jnp.float32) / sh),
                              -127, 127).astype(jnp.int8)
            y32 = jax.lax.dot_general(
                hq, w2q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = (y32.astype(jnp.float32) * sh * s2[None, :]).astype(
                jnp.bfloat16)
            return (x + y).astype(jnp.bfloat16), ()
        x, _ = jax.lax.scan(body, x, None, length=DEPTH)
        return x

    flops = 2 * TOKENS * CIN * CHID * 2 * DEPTH   # both dots, per chain call

    _log("compiling bf16 chain...")
    jb = jax.jit(mlp_bf16)
    ms_b = _time(jb, x0, w1, w2)
    print(f"bf16        : {ms_b:8.2f} ms/chain  "
          f"{flops / ms_b / 1e9:7.1f} TFLOPS")

    _log("compiling int8-dyn chain...")
    jd = jax.jit(lambda x, a, b, c, d: mlp_int8(x, a, b, c, d, None))
    ms_d = _time(jd, x0, w1q, s1, w2q, s2)
    print(f"int8 dynamic: {ms_d:8.2f} ms/chain  "
          f"{flops / ms_d / 1e9:7.1f} TOPS   speedup {ms_b / ms_d:.3f}x")

    _log("compiling int8-static chain...")
    js = jax.jit(lambda x, a, b, c, d: mlp_int8(x, a, b, c, d,
                                                jnp.float32(0.05)))
    ms_s = _time(js, x0, w1q, s1, w2q, s2)
    print(f"int8 static : {ms_s:8.2f} ms/chain  "
          f"{flops / ms_s / 1e9:7.1f} TOPS   speedup {ms_b / ms_s:.3f}x")

    _log("numerics check...")
    # numerics: relative error of one dynamic-quant block vs fp32
    xf = x0.astype(jnp.float32)
    ref = np.asarray(
        xf + jnp.dot(jax.nn.gelu(jnp.dot(xf, w1.astype(jnp.float32)),
                                 approximate=True),
                     w2.astype(jnp.float32)))
    got = np.asarray(
        jax.jit(lambda x, a, b, c, d: mlp_int8(x, a, b, c, d, None))(
            x0, w1q, s1, w2q, s2)).astype(np.float32)
    one = np.asarray(jax.jit(mlp_bf16)(x0, w1, w2)).astype(np.float32)
    # compare DEPTH-block chains: int8 vs bf16, both against fp32
    err_b = np.abs(one - _chain_fp32(xf, w1, w2)).mean()
    err_q = np.abs(got - _chain_fp32(xf, w1, w2)).mean()
    print(f"mean |err| vs fp32 chain: bf16 {err_b:.4e}  int8-dyn {err_q:.4e}")


def _chain_fp32(x, w1, w2):
    w1f, w2f = w1.astype(jnp.float32), w2.astype(jnp.float32)
    for _ in range(DEPTH):
        x = x + jnp.dot(jax.nn.gelu(jnp.dot(x, w1f), approximate=True), w2f)
    return np.asarray(x)


if __name__ == "__main__":
    main()

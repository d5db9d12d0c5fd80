"""Repeatable on-chip verification: compiled-Mosaic kernel parity + a real
480p frame step.

CPU CI runs the Pallas kernels in interpret mode only
(tests/test_flash_attention.py, tests/test_fused_memory_read.py); Mosaic
regressions can hide behind that. This script runs the same parities
COMPILED on the real TPU, plus one end-to-end 480p XMem step, and quantifies
the opt-in `top_k_approx` divergence against the exact read. Run:

    PYTHONPATH=. python scripts/tpu_verify.py

Exits non-zero on any failure; prints one PASS/FAIL line per check.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


FAILURES = []


def check(name, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}", flush=True)
    if not ok:
        FAILURES.append(name)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    check("platform is TPU", jax.default_backend() == "tpu",
          jax.default_backend())

    rng = np.random.default_rng(0)

    # ---- flash attention (global rel-pos) compiled vs XLA ----------------
    from vosesam_tpu.ops.pallas.flash_attention import (
        flash_attention_relpos, window_attention_relpos,
    )

    heads, n, d, gh, gw = 4, 1024, 64, 32, 32
    q = jnp.asarray(rng.standard_normal((heads, n, d)).astype(np.float32) * 0.2)
    k = jnp.asarray(rng.standard_normal((heads, n, d)).astype(np.float32) * 0.2)
    v = jnp.asarray(rng.standard_normal((heads, n, d)).astype(np.float32))
    bh = jnp.asarray(rng.standard_normal((heads, n, gh)).astype(np.float32) * 0.1)
    bw = jnp.asarray(rng.standard_normal((heads, n, gw)).astype(np.float32) * 0.1)

    def xla_ref():
        scale = 1.0 / math.sqrt(d)
        attn = jnp.einsum("hqc,hkc->hqk", q, k) * scale
        bias = (bh[..., :, None] + bw[..., None, :]).reshape(heads, n, n)
        attn = jax.nn.softmax(attn + bias, axis=-1)
        return jnp.einsum("hqk,hkc->hqc", attn, v)

    out = jax.jit(lambda: flash_attention_relpos(q, k, v, bh, bw, (gh, gw)))()
    ref = jax.jit(xla_ref)()
    err = float(jnp.max(jnp.abs(out - ref)))
    check("flash_attention_relpos compiled parity", err < 5e-3, f"max_err={err:.2e}")

    w, t, wh, ww = 6, 196, 14, 14
    qw = jnp.asarray(rng.standard_normal((w, heads, t, d)).astype(np.float32) * 0.2)
    kw = jnp.asarray(rng.standard_normal((w, heads, t, d)).astype(np.float32) * 0.2)
    vw = jnp.asarray(rng.standard_normal((w, heads, t, d)).astype(np.float32))
    bhw = jnp.asarray(rng.standard_normal((w, heads, t, wh)).astype(np.float32) * 0.1)
    bww = jnp.asarray(rng.standard_normal((w, heads, t, ww)).astype(np.float32) * 0.1)

    def xla_win():
        scale = 1.0 / math.sqrt(d)
        attn = jnp.einsum("whqc,whkc->whqk", qw, kw) * scale
        bias = (bhw[..., :, None] + bww[..., None, :]).reshape(w, heads, t, t)
        attn = jax.nn.softmax(attn + bias, axis=-1)
        return jnp.einsum("whqk,whkc->whqc", attn, vw)

    outw = jax.jit(lambda: window_attention_relpos(qw, kw, vw, bhw, bww, (wh, ww)))()
    refw = jax.jit(xla_win)()
    errw = float(jnp.max(jnp.abs(outw - refw)))
    check("window_attention_relpos compiled parity", errw < 5e-3, f"max_err={errw:.2e}")

    # ---- fused memory read compiled vs XLA exact chain -------------------
    from vosesam_tpu.ops.memory_attention import read_memory_multiobject
    from vosesam_tpu.ops.pallas.memory_read import fused_memory_read

    O, Q, M, CK, CV, K = 3, 1620, 17200, 64, 512, 30
    mk = jnp.asarray(rng.standard_normal((M, CK)).astype(np.float32)).astype(jnp.bfloat16)
    ms = jnp.asarray(rng.uniform(1, 5, (M,)).astype(np.float32))
    qk = jnp.asarray(rng.standard_normal((Q, CK)).astype(np.float32)).astype(jnp.bfloat16)
    qe = jnp.asarray(rng.uniform(0, 1, (Q, CK)).astype(np.float32)).astype(jnp.bfloat16)
    mv = jnp.asarray(rng.standard_normal((O, M, CV)).astype(np.float32)).astype(jnp.bfloat16)
    kv = jnp.asarray(rng.uniform(0, 1, (M,)) > 0.1)
    vv = jnp.asarray(rng.uniform(0, 1, (O, M)) > 0.2) & kv[None]

    # arrays as jit ARGUMENTS (closing over mv's 53 MB inlines it into the
    # HLO as constants and stalls the remote-compile tunnel for minutes)
    r_out, r_use = jax.jit(
        lambda a, b, c, d, e, f, g: read_memory_multiobject(
            a, b, c, d, e, f, g, K, return_usage=True)
    )(mk, ms, mv, qk, qe, kv, vv)
    f_out, f_use = jax.jit(
        lambda a, b, c, d, e, f: fused_memory_read(
            a, b, c, d, e, f, K, return_usage=True)
    )(mk, ms, qk, qe, mv, kv[None] & vv)
    e_out = float(jnp.max(jnp.abs(r_out - f_out)))
    e_use = float(jnp.max(jnp.abs(r_use - f_use)))
    check("fused_memory_read compiled parity (readout)", e_out < 1e-3,
          f"max_err={e_out:.2e}")
    check("fused_memory_read compiled parity (usage)", e_use < 1e-3,
          f"max_err={e_use:.2e}")

    # shared-validity variant (MemoryConfig.live_objects fast path): same
    # inputs with validity rows identical across objects
    from vosesam_tpu.ops.pallas.memory_read import fused_memory_read_shared

    vv_sh = jnp.broadcast_to(kv[None], (O, M))
    rs_out, rs_use = jax.jit(
        lambda a, b, c, d, e, f, g: read_memory_multiobject(
            a, b, c, d, e, f, g, K, return_usage=True)
    )(mk, ms, mv, qk, qe, kv, vv_sh)
    s_out, s_use = jax.jit(
        lambda a, b, c, d, e, f: fused_memory_read_shared(
            a, b, c, d, e, f, K, return_usage=True)
    )(mk, ms, qk, qe, mv, kv)
    es_out = float(jnp.max(jnp.abs(rs_out - s_out)))
    es_use = float(jnp.max(jnp.abs(rs_use - s_use)))
    check("fused_memory_read_shared compiled parity (readout)", es_out < 1e-3,
          f"max_err={es_out:.2e}")
    check("fused_memory_read_shared compiled parity (usage)", es_use < 1e-3,
          f"max_err={es_use:.2e}")

    # microbenchmark at DAVIS-480p sizes. Timed as N reads scanned inside
    # ONE jit: per-dispatch timing on this tunneled chip folds in ~25 ms
    # fixed latency + pipelining effects and once inverted the fused/XLA
    # ordering entirely (BASELINE.md "dispatch-pipelining measurement").
    def timeit(body, args, n=16):
        # memory arrays ride as jit ARGUMENTS (closed-over they become HLO
        # constants — 53 MB of them — and stall the remote compile)
        @jax.jit
        def run(qk_in, args_in):
            def step(carry, _):
                out = body(qk_in + carry.astype(qk_in.dtype) * 0, *args_in)
                lead = jax.tree.leaves(out)[0]
                s = jnp.sum(lead.astype(jnp.float32)) * 1e-30
                return carry + s.astype(jnp.float32), 0
            c, _ = jax.lax.scan(step, jnp.float32(0), None, length=n)
            return c
        np.asarray(run(qk, args))
        t0 = time.perf_counter()
        np.asarray(run(qk, args))
        return (time.perf_counter() - t0) / n * 1e3

    marrs = (mk, ms, mv, qe, kv, vv)
    t_xla = timeit(lambda q, a, b, c, d, e, f: read_memory_multiobject(
        a, b, c, q, d, e, f, K, return_usage=True), marrs)
    t_fused = timeit(lambda q, a, b, c, d, e, f: fused_memory_read(
        a, b, q, d, c, e[None] & f, K, return_usage=True), marrs)
    t_approx = timeit(lambda q, a, b, c, d, e, f: read_memory_multiobject(
        a, b, c, q, d, e, f, K, return_usage=True, approx=True), marrs)
    print(f"      memory-read O={O} Q={Q} M={M}: xla_exact={t_xla:.1f}ms "
          f"fused={t_fused:.1f}ms xla_approx={t_approx:.1f}ms", flush=True)
    check("fused read faster than XLA exact", t_fused < t_xla,
          f"{t_fused:.1f} vs {t_xla:.1f} ms")

    # quantify approx divergence (the opt-in knob, VERDICT r1 item 5)
    a_out, _ = jax.jit(
        lambda a, b, c, d, e, f, g: read_memory_multiobject(
            a, b, c, d, e, f, g, K, return_usage=True, approx=True)
    )(mk, ms, mv, qk, qe, kv, vv)
    div = float(jnp.max(jnp.abs(r_out - a_out)))
    print(f"      approx_max_k readout divergence vs exact: {div:.3e}", flush=True)

    # ---- 480p XMem frame step on the chip --------------------------------
    from vosesam_tpu.config import FrameworkConfig, RefinementConfig, XMemConfig
    from vosesam_tpu.inference import core, tracker
    from vosesam_tpu.models.xmem import network as xnet

    cfg = FrameworkConfig(
        xmem=XMemConfig(max_objects=3),
        refinement=RefinementConfig(use_refinement=False),
        dtype="bfloat16",
    )
    h, w2 = 480, 854
    frame = jnp.asarray(rng.integers(0, 255, (h, w2, 3), np.uint8))
    params = xnet.xmem_init(jax.random.PRNGKey(0), cfg.xmem, dtype=jnp.bfloat16)
    state = core.init_tracker_state(cfg, (h, w2))
    mask = jnp.zeros((3, h, w2)).at[0, 100:320, 150:500].set(1.0)
    mask = mask.at[1, 50:150, 600:750].set(1.0)
    state, *_ = tracker.track_first_frame(
        params, state, frame, mask, jnp.array([True, True, False]), cfg,
        paint=False)
    st, idx, lg, sc, _ = tracker.track_frame(params, None, state, frame, cfg,
                                             paint=False)
    np.asarray(idx)
    # 60 propagation frames: with mem_every=5 and max_mid_term_frames=10
    # this drives the working memory past capacity, so the jitted
    # consolidation/potentiation + LT paths EXECUTE on the chip (8 frames
    # never reached them; CPU CI covers them only at toy sizes)
    t0 = time.perf_counter()
    n_roll = 60
    for _ in range(n_roll):
        st, idx, lg, sc, _ = tracker.track_frame(params, None, st, frame, cfg,
                                                 paint=False)
    np.asarray(idx.ravel()[0:1])    # 1-elem sync; full transfer is ~34 MB/s
    dt = (time.perf_counter() - t0) / n_roll * 1e3
    labels = np.unique(np.asarray(idx))
    sc = np.asarray(sc)
    check("480p frame step finite scores", np.isfinite(sc[:2]).all(), str(sc))
    check("480p frame step tracks objects", len(labels) > 1, str(labels))
    lt_n = int(np.asarray(jnp.sum(st.memory.long.key_valid)))
    check("long-term memory populated by 60-frame rollout", lt_n > 0,
          f"lt slots: {lt_n}")
    print(f"      480p XMem-only step over {n_roll} frames: {dt:.1f} ms/frame"
          f" (long-term slots used: {lt_n})", flush=True)

    print(f"\n{'ALL PASS' if not FAILURES else 'FAILURES: ' + ', '.join(FAILURES)}")
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()

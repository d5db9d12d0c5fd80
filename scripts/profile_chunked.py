"""Per-stage profile of the CHUNKED DAVIS-480p path on the real chip.

Times, steady-state, for chunk sizes K in CHUNK_SIZES:
  - batched SAM ViT encode of K frames (the vmapped step 2 of
    inference/chunked.py::track_chunk)
  - the XMem lax.scan over K frames (step 1)
  - batched refinement given precomputed embeddings (step 3)
  - full track_chunk
Prints ms/frame for each so chunk sizes are directly comparable.
Run: python scripts/profile_chunked.py [vit_h|vit_b|vit_l] [K ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timeit(fn, n=6, warmup=2):
    # the axon remote-compile tunnel drops long jobs occasionally
    # (BASELINE.md platform caveats) — retry the compiling call
    for attempt in range(3):
        try:
            out = fn()
            break
        except Exception as e:  # noqa: BLE001 - jax runtime transport errors
            print(f"  [compile attempt {attempt + 1} failed: "
                  f"{type(e).__name__}; retrying]", flush=True)
            time.sleep(5)
    else:
        raise RuntimeError("compile failed 3x")
    for _ in range(warmup - 1):
        out = fn()
    np.asarray(jax.tree.leaves(out)[-1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(jax.tree.leaves(out)[-1])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from vosesam_tpu.config import (
        FrameworkConfig, RefinementConfig, SAMConfig, XMemConfig,
    )
    from vosesam_tpu.inference import core, tracker
    from vosesam_tpu.inference.chunked import track_chunk
    from vosesam_tpu.inference.refinement import (
        masks_from_prob, refine_masks, xmem_object_scores,
    )
    from vosesam_tpu.models.sam import predictor
    from vosesam_tpu.models.xmem import network as xnet

    sam_type = sys.argv[1] if len(sys.argv) > 1 else "vit_h"
    chunk_sizes = [int(a) for a in sys.argv[2:]] or [1, 2, 4, 8]

    cfg = FrameworkConfig(
        xmem=XMemConfig(max_objects=3),
        sam=SAMConfig(model_type=sam_type, hq=True, use_flash_attention=True,
                      encode_rect=os.environ.get("BENCH_RECT", "1") == "1",
                      windowed_attention_impl=os.environ.get(
                          "BENCH_WIN_IMPL", "xla_fused_bias"),
                      encode_fixed_hw=(
                          tuple(int(v) for v in
                                os.environ["BENCH_FIXED_HW"].split("x"))
                          if os.environ.get("BENCH_FIXED_HW") else None),
                      encode_letterbox_hw=(
                          tuple(int(v) for v in
                                os.environ["BENCH_LETTERBOX_HW"].split("x"))
                          if os.environ.get("BENCH_LETTERBOX_HW") else None)),
        refinement=RefinementConfig(use_refinement=True, mode="both_neg",
                                    optimized=True),
        dtype="bfloat16",
    )
    print(f"encode_rect={cfg.sam.encode_rect} "
          f"windowed={cfg.sam.windowed_attention_impl}")
    sam_params = predictor.sam_init(jax.random.PRNGKey(1), cfg.sam,
                                    dtype=jnp.bfloat16)
    xmem_params = xnet.xmem_init(jax.random.PRNGKey(0), cfg.xmem,
                                 dtype=jnp.bfloat16)

    h, w = 480, 854
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (h, w, 3), np.uint8))

    state0 = core.init_tracker_state(cfg, (h, w))
    mask = jnp.zeros((cfg.xmem.max_objects, h, w)).at[0, 100:320, 150:500].set(1.0)
    mask = mask.at[1, 50:150, 600:750].set(1.0)
    valid = jnp.array([True, True, False])
    state0, *_ = tracker.track_first_frame(
        xmem_params, state0, frame, mask, valid, cfg, paint=False)

    for k in chunk_sizes:
        fbatch = jnp.stack([frame] * k)

        # NOTE: params must be jit ARGUMENTS — closing over them inlines
        # ~1.3 GB of constants into the HLO, which the remote-compile tunnel
        # cannot digest (observed 30+ min hangs / dropped jobs).
        enc = jax.jit(lambda sp, fb: jax.vmap(
            lambda f: predictor.encode_image(sp, f, cfg.sam))(fb))
        ms = timeit(lambda: enc(sam_params, fbatch))
        print(f"K={k:2d} batched encode: {ms:8.2f} ms  ({ms / k:7.2f} ms/frame)")

        @jax.jit
        def xscan(xp, st, fb):
            def step(s, f):
                s, prob, logits = core.step(xp, s, f, cfg)
                m, idx = masks_from_prob(prob, cfg.xmem.max_objects)
                sc = xmem_object_scores(prob[1:])
                return s, (m, logits[1:], sc, idx, s.memory.obj_valid)
            return jax.lax.scan(step, st, fb)

        st1, (masks_k, lg_k, sc_k, idx_k, ov_k) = xscan(
            xmem_params, state0, fbatch)
        ms = timeit(lambda: xscan(xmem_params, state0, fbatch))
        print(f"K={k:2d} xmem scan:      {ms:8.2f} ms  ({ms / k:7.2f} ms/frame)")

        emb = enc(sam_params, fbatch)

        @jax.jit
        def refine(sp, emb, masks_k, lg_k, sc_k, ov_k):
            def one(e, m, lg, sc, ov):
                res = refine_masks(sp, e, m, lg, sc, ov, cfg)
                return res.indexed, res.scores
            return jax.vmap(one)(emb, masks_k, lg_k, sc_k, ov_k)

        out = refine(sam_params, emb, masks_k, lg_k, sc_k, ov_k)
        ms = timeit(lambda: refine(sam_params, emb, masks_k, lg_k, sc_k, ov_k))
        print(f"K={k:2d} batched refine: {ms:8.2f} ms  ({ms / k:7.2f} ms/frame)")

        full = lambda: track_chunk(xmem_params, sam_params, state0, fbatch, cfg)
        full()
        ms = timeit(full)
        print(f"K={k:2d} full chunk:     {ms:8.2f} ms  ({ms / k:7.2f} ms/frame"
              f"  = {1e3 * k / ms:.2f} fps)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()

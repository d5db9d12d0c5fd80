"""Attribute the long-rollout fps decay (bench.py:_soak tail window) to a
pipeline stage, controlling for tunnel drift.

The 1536-frame soak shows frame_512 at full speed (21.7 fps, LT saturated,
evictions firing) but frame_tail at ~14.7 fps while a fresh-state control
replayed at the END of the run still hits 21.6 — so the decay is
state/data-dependent, and the only monotone covariate is mask degradation
(area 0.167 -> 0.108 under random weights).

Method: run the soak loop via the chunked driver's own jits
(_xmem_chunk_step / _encode_chunk / _refine_chunk_pre — mirroring
track_chunk), snapshot (frames, per_frame XMem outputs) at an EARLY chunk
(ti~64) and a LATE chunk (ti~n-64), then at the very end time each stage on
both snapshots BACK-TO-BACK (same wall-clock window, same jits):

  - encode  (mask-independent — must be flat; a delta would mean drift)
  - refine  (prompt gen + SAM decode — the data-dependent suspect)
  - xmem    (replay the chunk's 8 steps from the snapshotted state)

Usage: python scripts/exp_soak_decay.py [n_frames]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main() -> None:
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from vosesam_tpu.config import (
        FrameworkConfig, MemoryConfig, RefinementConfig, SAMConfig, XMemConfig,
    )
    from vosesam_tpu.inference import core, tracker
    from vosesam_tpu.inference.chunked import (
        _encode_chunk, _refine_chunk_pre, _xmem_chunk_step,
    )
    from vosesam_tpu.models.sam import predictor
    from vosesam_tpu.models.xmem import network as xnet

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 1536
    if n_frames < 256:
        raise SystemExit("need >= 256 frames: the early (chunk 7) and late "
                         "(chunk n-9) snapshots must be distinct and ordered")
    chunk = 8
    h, w = 480, 854
    cfg = FrameworkConfig(
        xmem=XMemConfig(max_objects=2),
        memory=MemoryConfig(live_objects=2),
        sam=SAMConfig(model_type="vit_h", hq=True, encode_rect=True),
        refinement=RefinementConfig(use_refinement=True, mode="both_neg",
                                    optimized=True),
        dtype="bfloat16",
    )
    n_frames = -(-n_frames // chunk) * chunk
    frames_np = bench.soak_frames(1 + n_frames, h, w)
    xmem_params = xnet.xmem_init(jax.random.PRNGKey(0), cfg.xmem,
                                 dtype=jnp.bfloat16)
    sam_params = predictor.sam_init(jax.random.PRNGKey(1), cfg.sam,
                                    dtype=jnp.bfloat16)
    state = core.init_tracker_state(cfg, (h, w))
    mask = (jnp.zeros((cfg.xmem.max_objects, h, w))
            .at[0, 40:260, 10:360].set(1.0)
            .at[1, 30:130, 560:710].set(1.0))
    valid = jnp.arange(cfg.xmem.max_objects) < 2
    state, *_ = tracker.track_first_frame(
        xmem_params, state, jnp.asarray(frames_np[0]), mask, valid, cfg,
        paint=False)

    n_chunks = n_frames // chunk
    snap_chunks = {7: "early", n_chunks - 9: "late"}
    snaps = {}

    for j in range(n_chunks):
        fb = tuple(jnp.asarray(frames_np[1 + j * chunk + t])
                   for t in range(chunk))
        embs = _encode_chunk(sam_params, fb, cfg)
        state_in = state
        per_frame = []
        for f in fb:
            state, outs = _xmem_chunk_step(xmem_params, state, f, cfg)
            per_frame.append(outs)
        per_frame = tuple(per_frame)
        r_idx, _ = _refine_chunk_pre(sam_params, embs, per_frame, cfg)
        if j in snap_chunks:
            snaps[snap_chunks[j]] = (fb, embs, per_frame, state_in)
        if j % 16 == 0:
            np.asarray(state.memory.work.count)   # bound dispatch queue
    np.asarray(r_idx.ravel()[0:1])

    area_j = jax.jit(lambda pf: jnp.mean(
        (jnp.stack([o[3] for o in pf]) > 0).astype(jnp.float32)))

    # ---- back-to-back stage timing on both snapshots --------------------
    print("# stage ms/frame, early vs late snapshot (back-to-back):")
    for stage in ("encode", "refine", "xmem"):
        row = {}
        for name in ("early", "late"):
            fb, embs, per_frame, state_in = snaps[name]
            if stage == "encode":
                fn = lambda: _encode_chunk(sam_params, fb, cfg)
                sync = lambda r: np.asarray(r.embedding.ravel()[0:1])
            elif stage == "refine":
                fn = lambda: _refine_chunk_pre(sam_params, embs, per_frame, cfg)
                sync = lambda r: np.asarray(r[0].ravel()[0:1])
            else:
                def fn():
                    st = state_in
                    for f in fb:
                        st, o = _xmem_chunk_step(xmem_params, st, f, cfg)
                    return o[3]
                sync = lambda r: np.asarray(r.ravel()[0:1])
            sync(fn())
            t0 = time.perf_counter()
            for _ in range(3):
                r = fn()
            sync(r)
            row[name] = (time.perf_counter() - t0) / 3 / chunk * 1e3
        print(f"  {stage:7s} early={row['early']:7.2f}  late={row['late']:7.2f}"
              f"  ratio={row['late'] / max(row['early'], 1e-9):5.2f}")
    for name in ("early", "late"):
        fb, embs, per_frame, _ = snaps[name]
        print(f"  mask_area[{name}] = "
              f"{float(np.asarray(area_j(per_frame))):.4f}")


if __name__ == "__main__":
    main()

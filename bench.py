"""Headline benchmark: DAVIS-480p frames/sec/chip, full XMem + SAM refinement.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

vs_baseline is measured fps over the driver target of 20 fps/chip for the
end-to-end XMem + SAM-HQ refinement loop at DAVIS-480p (BASELINE.md).

Env knobs:
  BENCH_SAM      vit_b | vit_l | vit_h   (default vit_h — the headline model)
  BENCH_HQ       1|0                     (default 1: SAM-HQ decoder)
  BENCH_FRAMES   measured frames         (default 16)
  BENCH_REFINE   1|0                     (default 1)
  BENCH_CHUNK    K                       (default 4 — the measured sweet spot;
                                          1 = per-frame stepping. K>1 scans
                                          XMem then batches the SAM
                                          encode+refine across K frames —
                                          bit-equal to per-frame, proven by
                                          tests/test_chunked.py)
  BENCH_WIN_IMPL xla|xla_fused_bias|pallas|pallas_mh
                                         (default xla_fused_bias — windowed-
                                          attention impl A/B knob, see
                                          SAMConfig.windowed_attention_impl)
  BENCH_FLASH    1|0                     (default 1 — Pallas flash kernel for
                                          the ViT global-attention blocks)
  BENCH_RECT     1|0                     (default 1 — rectangular SAM encode:
                                          576x1024 model input for 480p
                                          instead of the official 1024
                                          square; ~44% fewer encoder tokens.
                                          0 = official square encode.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main() -> None:
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from vosesam_tpu.config import (
        FrameworkConfig, RefinementConfig, SAMConfig, XMemConfig,
    )
    from vosesam_tpu.inference import core, tracker
    from vosesam_tpu.models.sam import predictor
    from vosesam_tpu.models.xmem import network as xnet

    sam_type = os.environ.get("BENCH_SAM", "vit_h")
    hq = os.environ.get("BENCH_HQ", "1") == "1"
    n_frames = int(os.environ.get("BENCH_FRAMES", "16"))
    refine = os.environ.get("BENCH_REFINE", "1") == "1"
    chunk = int(os.environ.get("BENCH_CHUNK", "4"))

    cfg = FrameworkConfig(
        xmem=XMemConfig(max_objects=3),
        sam=SAMConfig(model_type=sam_type, hq=hq,
                      use_flash_attention=os.environ.get("BENCH_FLASH",
                                                         "1") == "1",
                      windowed_attention_impl=os.environ.get(
                          "BENCH_WIN_IMPL", "xla_fused_bias"),
                      encode_rect=os.environ.get("BENCH_RECT", "1") == "1"),
        refinement=RefinementConfig(use_refinement=refine, mode="both_neg",
                                    optimized=True),
        dtype="bfloat16",
    )

    h, w = 480, 854
    rng = np.random.default_rng(0)
    frames = [
        jnp.asarray(rng.integers(0, 255, (h, w, 3), np.uint8)) for _ in range(4)
    ]

    xmem_params = xnet.xmem_init(jax.random.PRNGKey(0), cfg.xmem, dtype=jnp.bfloat16)
    sam_params = (
        predictor.sam_init(jax.random.PRNGKey(1), cfg.sam, dtype=jnp.bfloat16)
        if refine else None
    )

    state = core.init_tracker_state(cfg, (h, w))
    mask = jnp.zeros((cfg.xmem.max_objects, h, w)).at[0, 100:320, 150:500].set(1.0)
    mask = mask.at[1, 50:150, 600:750].set(1.0)
    valid = jnp.array([True, True, False])
    state, *_ = tracker.track_first_frame(
        xmem_params, state, frames[0], mask, valid, cfg, paint=False
    )

    if chunk > 1:
        from vosesam_tpu.inference.chunked import track_chunk

        n_frames = -(-n_frames // chunk) * chunk
        fbatch = jnp.stack([frames[i % len(frames)] for i in range(chunk)])

        def step(state, _i):
            state, indexed, scores = track_chunk(
                xmem_params, sam_params, state, fbatch, cfg
            )
            return state, indexed, scores

        state_w, idx, _ = step(state, 0)
        np.asarray(idx)
        state = state_w
        # On-device finiteness accumulator: a NaN in ANY chunk's logits
        # propagates through the running sum of scores and is caught at the
        # final sync (a mid-run NaN must not pass silently — the round-1
        # CBAM miscompile produced exactly that failure mode).
        fin_acc = jnp.zeros((), jnp.float32)
        t0 = time.time()
        for i in range(n_frames // chunk):
            state, idx, scores = step(state, i)
            fin_acc = fin_acc + jnp.sum(
                jnp.where(jnp.isneginf(scores), 0.0, scores).astype(jnp.float32))
        sync = np.asarray(idx)
        dt = time.time() - t0
        fps = n_frames / dt
        assert np.isfinite(sync).all()
        assert np.isfinite(np.asarray(fin_acc)), "non-finite scores mid-run"
    else:
        def step(state, frame):
            state, indexed, logits, scores, _ = tracker.track_frame(
                xmem_params, sam_params, state, frame, cfg, paint=False
            )
            return state, indexed, scores

        # warmup / compile (np.asarray forces a device->host sync; on the
        # axon tunnel block_until_ready does not reliably block)
        state_w, idx, _ = step(state, frames[1])
        np.asarray(idx)
        state = state_w

        fin_acc = jnp.zeros((), jnp.float32)
        t0 = time.time()
        for i in range(n_frames):
            state, idx, scores = step(state, frames[(i + 2) % len(frames)])
            fin_acc = fin_acc + jnp.sum(
                jnp.where(jnp.isneginf(scores), 0.0, scores).astype(jnp.float32))
        sync = np.asarray(idx)
        dt = time.time() - t0
        fps = n_frames / dt
        assert np.isfinite(np.asarray(sync)).all()
        assert np.isfinite(np.asarray(fin_acc)), "non-finite scores mid-run"

    label = f"XMem+SAM{'-HQ' if hq else ''} {sam_type}" if refine else "XMem-only"
    print(json.dumps({
        "metric": f"DAVIS-480p frames/sec/chip ({label} refinement loop)",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 20.0, 3),
    }))


if __name__ == "__main__":
    main()

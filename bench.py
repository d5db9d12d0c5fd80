"""Headline benchmark: DAVIS-480p frames/sec/chip, full XMem + SAM refinement.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

vs_baseline is measured fps over the driver target of 20 fps/chip for the
end-to-end XMem + SAM-HQ refinement loop at DAVIS-480p (BASELINE.md).

Long-form by default (honest steady state): 64 measured frames of MOVING
synthetic objects, so the run crosses the long-term consolidation boundary
(work arena = max_mid_term_frames(10) x mem_every(5) = ~50 frames) and the
benched loop includes LT consolidation, LT reads and near-capacity memory —
asserted via `state.memory.long.count > 0` at the end. A per-stage table
(encode / xmem scan / refine) prints before the JSON line.

Env knobs:
  BENCH_SAM      vit_b | vit_l | vit_h   (default vit_h — the headline model)
  BENCH_HQ       1|0                     (default 1: SAM-HQ decoder)
  BENCH_FRAMES   measured frames         (default 64; 16 = the quick smoke —
                                          no consolidation in steady state)
  BENCH_REFINE   1|0                     (default 1)
  BENCH_CHUNK    K                       (default 8 — the rect-encode sweep
                                          optimum: 10.69 fps vs 10.31 @K=4,
                                          9.74 @K=2; K=6 hits a pathological
                                          XLA tiling (4.8 fps) — avoid.
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
  BENCH_STAGES   1|0                     (default 1 — per-stage table; extra
                                          compiles on a cold cache)
  BENCH_MAXOBJ   O                       (default 2 — the object-axis width.
                                          2 = what Tracker._ensure_state
                                          derives for this 2-object video
                                          (per-video object sizing); 3+ =
                                          padded dead slots, the pre-sizing
                                          behavior, for A/B.)
  BENCH_FIXED_HW HxW                     (default unset — opt-in aspect-
                                          DISTORTING fixed-size encode, e.g.
                                          448x896: 28x56 tokens, zero pad
                                          windows; overrides BENCH_RECT. A
                                          speed/quality trade — validate vs
                                          real checkpoints first.)
  BENCH_LETTERBOX_HW HxW                 (default unset — opt-in LETTERBOX
                                          fast gear: longest-fit resize +
                                          pad to a fixed HxW grid, aspect
                                          preserved (the official square's
                                          own semantics at 0.875x internal
                                          resolution for 448x896). Same
                                          token count as the distorting
                                          gear, geometry-true; ~10.7% pad
                                          tokens. Mutually exclusive with
                                          BENCH_FIXED_HW.)
  BENCH_EXTRAS   1|0                     (default 1 — after the default
                                          headline row, also measure the
                                          letterbox-448x896 gear and the
                                          fused-read live_end occupancy
                                          corridor, and emit both as extra
                                          keys in the JSON line so the
                                          artifact records the sensitivity,
                                          not just the point estimate. Set
                                          0 for A/B ladders.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def moving_frames(n: int, h: int, w: int, seed: int = 0) -> np.ndarray:
    """n synthetic 480p frames with two objects translating over textured
    noise — refinement sees real moving prompts, memory sees novel keys."""
    r = np.random.default_rng(seed)
    base = r.integers(0, 255, (h, w, 3), np.uint8)
    out = np.empty((n, h, w, 3), np.uint8)
    for i in range(n):
        f = base.copy()
        y0 = 100 + 2 * i
        x0 = (150 + 5 * i) % (w - 360)
        f[y0:y0 + 220, x0:x0 + 350] = (220, 60, 60)
        y1 = (50 + 3 * i) % (h - 110)
        f[y1:y1 + 100, 600:750] = (60, 200, 220)
        out[i] = f
    return out


_OBJ_COLORS = (
    (220, 60, 60), (60, 200, 220), (60, 220, 90), (230, 200, 50),
    (200, 60, 220), (240, 140, 40), (80, 90, 230), (160, 230, 160),
)


def tri(t: int, amp: int) -> int:
    """Triangle wave in [0, amp] — the bounded periodic motion primitive
    shared by every synthetic-video family here (linear motion walks
    objects off-frame past ~190 frames)."""
    m = t % (2 * amp)
    return amp - abs(amp - m)


def multi_object_frames(n: int, h: int, w: int, o: int,
                        seed: int = 0) -> np.ndarray:
    """n frames with `o` 120x160 rectangles on distinct periodic
    trajectories (grid-anchored, per-object velocities) — the uniform
    object family for the O-scaling row (VERDICT r4 task 2; DAVIS-17/LVOS
    run up to ~8 objects, /root/reference/dataset/dataset.py:36-41)."""
    assert 1 <= o <= 8
    r = np.random.default_rng(seed)
    base = r.integers(0, 255, (h, w, 3), np.uint8)
    anchors = [(30 + (k // 4) * 240, 20 + (k % 4) * 210) for k in range(o)]
    out = np.empty((n, h, w, 3), np.uint8)
    for i in range(n):
        f = base.copy()
        for k, (yb, xb) in enumerate(anchors):
            y0 = yb + tri((2 + k % 3) * i, 60)
            x0 = xb + tri((3 + k % 2) * i, 40)
            f[y0:y0 + 120, x0:x0 + 160] = _OBJ_COLORS[k]
        out[i] = f
    return out


def multi_object_seed_mask(h: int, w: int, o: int,
                           max_objects: int) -> np.ndarray:
    """Frame-0 per-object masks matching multi_object_frames(i=0)."""
    m = np.zeros((max_objects, h, w), np.float32)
    for k in range(o):
        yb, xb = 30 + (k // 4) * 240, 20 + (k % 4) * 210
        m[k, yb:yb + 120, xb:xb + 160] = 1.0
    return m


def soak_frames(n: int, h: int, w: int, seed: int = 0) -> np.ndarray:
    """n synthetic frames with two objects on PERIODIC (triangle-wave)
    trajectories that stay fully in-frame for arbitrarily long rollouts —
    `moving_frames`' linear motion walks object 0 off the bottom edge past
    ~190 frames, which would degenerate a 1.5k-frame soak."""
    r = np.random.default_rng(seed)
    base = r.integers(0, 255, (h, w, 3), np.uint8)
    out = np.empty((n, h, w, 3), np.uint8)
    for i in range(n):
        f = base.copy()
        y0 = 40 + tri(2 * i, 180)
        x0 = 10 + tri(5 * i, 470)
        f[y0:y0 + 220, x0:x0 + 350] = (220, 60, 60)
        y1 = 30 + tri(3 * i, 340)
        x1 = 560 + tri(2 * i, 140)
        f[y1:y1 + 100, x1:x1 + 150] = (60, 200, 220)
        out[i] = f
    return out


def _fps_by_objects(base_cfg, h: int, w: int, chunk: int,
                    n_frames: int = 64, reps: int = 3) -> dict:
    """fps at O in {1, 2, 4, 8} moving objects (VERDICT r4 task 2).

    Each O runs the SAME measured loop as the headline (`_measure`,
    median-of-reps, 64-frame long-form steady state) on the uniform
    `multi_object_frames` family, with the object axis and live_objects
    hint sized to O — exactly what Tracker's per-video sizing derives.
    The headline 2-object row stays the anchor; this row records the
    marginal per-object cost (refinement vmaps over the object axis,
    memory values are per-object — cost is expected ~linear in O)."""
    import dataclasses

    from vosesam_tpu.config import MemoryConfig, XMemConfig

    if chunk > 1:   # same chunk-multiple rounding as main()
        n_frames = -(-n_frames // chunk) * chunk
    out = {}
    for o in (1, 2, 4, 8):
        cfg = dataclasses.replace(
            base_cfg,
            xmem=dataclasses.replace(base_cfg.xmem, max_objects=o),
            memory=dataclasses.replace(base_cfg.memory, live_objects=o),
        )
        all_np = multi_object_frames(1 + max(chunk, 1) + n_frames, h, w, o)
        seed = (multi_object_seed_mask(h, w, o, o), o)
        fps_runs, _, _ = _measure(
            cfg, all_np, h, w, chunk, n_frames, refine=True, stages=False,
            reps=reps, seed_objects=seed)
        out[str(o)] = round(float(np.median(fps_runs)), 3)
    return out


def _interactive_bench(cfg, h: int = 480, w: int = 854) -> dict:
    """Steady-state K=1 interactive latency (VERDICT r4 task 3).

    The product's interactive regime (/root/reference/app.py:162-192): the
    user clicks the cached template frame and sees a painted mask
    (SamControler.first_frame_click), then tracks frame by frame. Measures
    p50/p95 over 30 iterations of
      - click-to-mask: one positive click with the template embedding
        CACHED (set_image done once) — includes the mask/painted-frame
        downloads the UI consumes (host round-trips are part of the
        product latency on this tunnel, not overhead to exclude);
      - single-frame track: per-frame tracker.track_frame (refinement on)
        with the indexed mask pulled to host each frame (what
        Tracker.track yields to the app loop).
    """
    import jax
    import jax.numpy as jnp

    from vosesam_tpu.inference import core, tracker
    from vosesam_tpu.models.sam import predictor
    from vosesam_tpu.models.xmem import network as xnet
    from vosesam_tpu.pipeline.interact import SamController

    frames = moving_frames(34, h, w)
    sam_params = predictor.sam_init(jax.random.PRNGKey(1), cfg.sam,
                                    dtype=jnp.bfloat16)
    xmem_params = xnet.xmem_init(jax.random.PRNGKey(0), cfg.xmem,
                                 dtype=jnp.bfloat16)

    sc = SamController(sam_params, cfg.sam)
    sc.set_image(frames[0])
    pts = np.array([[300.0, 200.0]], np.float32)
    lbl = np.array([1], np.int32)
    sc.first_frame_click(frames[0], pts, lbl)          # compile warm-up
    click_ms = []
    for i in range(30):
        p = np.array([[150.0 + 5 * i, 150.0 + 3 * i]], np.float32)
        t0 = time.perf_counter()
        sc.first_frame_click(frames[0], p, lbl)
        click_ms.append((time.perf_counter() - t0) * 1e3)

    state = core.init_tracker_state(cfg, (h, w))
    mask = (jnp.zeros((cfg.xmem.max_objects, h, w))
            .at[0, 100:320, 150:500].set(1.0)
            .at[1, 50:150, 600:750].set(1.0))
    valid = jnp.arange(cfg.xmem.max_objects) < 2
    state, *_ = tracker.track_first_frame(
        xmem_params, state, jnp.asarray(frames[0]), mask, valid, cfg,
        paint=False)
    frames_dev = [jnp.asarray(frames[1 + i]) for i in range(33)]
    # warm-up: 3 frames (compile + steady dispatch)
    for f in frames_dev[:3]:
        state, indexed, *_ = tracker.track_frame(
            xmem_params, sam_params, state, f, cfg, paint=False)
    np.asarray(indexed)
    track_ms = []
    for f in frames_dev[3:33]:
        t0 = time.perf_counter()
        state, indexed, *_ = tracker.track_frame(
            xmem_params, sam_params, state, f, cfg, paint=False)
        np.asarray(indexed)        # the per-frame host mask the app consumes
        track_ms.append((time.perf_counter() - t0) * 1e3)

    def pct(xs, q):
        return round(float(np.percentile(xs, q)), 1)

    return {
        "click_to_mask_ms_p50": pct(click_ms, 50),
        "click_to_mask_ms_p95": pct(click_ms, 95),
        "track_frame_ms_p50": pct(track_ms, 50),
        "track_frame_ms_p95": pct(track_ms, 95),
    }


def _soak(cfg, h: int, w: int, chunk: int, n_frames: int,
          objects: int = 2) -> dict:
    """Long-video soak at the PRODUCTION memory config (VERDICT r4 task 1).

    Runs one continuous `n_frames`-frame rollout through the chunked driver
    at the default memory config (max_long_term_elements=1000,
    num_prototypes=128, top_k=30, mem_every=5 — tracker/config/config.yaml:
    4-9) and measures the fps DECAY CURVE in windows at frames ~64, ~512 and
    ~1500 (LongDataset/LVOS sequences are 1-3k frames,
    /root/reference/dataset/longdataset.py:8).

    LT eviction accounting: the memory-add schedule is deterministic
    (ti % mem_every == 0, inference/core.py:164-167), so the consolidation
    count is analytic — consols = 1 + (adds - max_mid)/min_mid once the work
    arena first fills (memory/manager.py:205-210) — and is CROSS-CHECKED
    against the probed `work.count` (mismatch raises). Eviction-overwrite
    cycles (consolidations that overwrite live LT slots,
    manager.py:276-287) = consols - floor(lt_capacity / num_prototypes);
    the probes additionally assert LT saturates to capacity AND that the LT
    key contents keep CHANGING between post-saturation probes (overwrite
    demonstrably firing — it had never executed at production shapes)."""
    import jax
    import jax.numpy as jnp

    from vosesam_tpu.inference import core, tracker
    from vosesam_tpu.inference.chunked import track_chunk
    from vosesam_tpu.models.sam import predictor
    from vosesam_tpu.models.xmem import network as xnet

    t_start = time.time()
    n_frames = -(-n_frames // chunk) * chunk
    if objects == 2:   # the headline 2-object family (anchor)
        frames_np = soak_frames(1 + n_frames, h, w)
        mask = (jnp.zeros((cfg.xmem.max_objects, h, w))
                .at[0, 40:260, 10:360].set(1.0)
                .at[1, 30:130, 560:710].set(1.0))
    else:              # the uniform O-scaling family (SOAK_OBJECTS)
        frames_np = multi_object_frames(1 + n_frames, h, w, objects)
        mask = jnp.asarray(
            multi_object_seed_mask(h, w, objects, cfg.xmem.max_objects))

    xmem_params = xnet.xmem_init(jax.random.PRNGKey(0), cfg.xmem,
                                 dtype=jnp.bfloat16)
    sam_params = (
        predictor.sam_init(jax.random.PRNGKey(1), cfg.sam, dtype=jnp.bfloat16)
        if cfg.refinement.use_refinement else None)

    state = core.init_tracker_state(cfg, (h, w))
    valid = jnp.arange(cfg.xmem.max_objects) < objects
    state, *_ = tracker.track_first_frame(
        xmem_params, state, jnp.asarray(frames_np[0]), mask, valid, cfg,
        paint=False)

    # ---- analytic memory schedule (cross-checked below) -----------------
    hw_tok = (-(-h // 16)) * (-(-w // 16))
    cw = cfg.memory.work_capacity(hw_tok)
    mw = cfg.memory.min_work_elements(hw_tok)
    lt_cap = cfg.memory.max_long_term_elements
    p = min(cfg.memory.num_prototypes, cw - mw)
    adds = n_frames // cfg.memory.mem_every + 1          # ti = 0,5,10,...
    max_adds = cw // hw_tok                              # first fill
    consols = 0 if adds < max_adds else 1 + (adds - max_adds) * hw_tok // (cw - mw)
    evictions = max(0, consols - lt_cap // p)

    lt_valid_j = jax.jit(lambda m: m.long.key_valid.sum())
    lt_sum_j = jax.jit(lambda m: jnp.sum(jnp.abs(m.long.keys.astype(jnp.float32))))
    area_j = jax.jit(lambda ix: jnp.mean((ix > 0).astype(jnp.float32)))

    def probe(state, idx=None):
        d = {
            "ti": int(np.asarray(state.curr_ti)),
            "work_count": int(np.asarray(state.memory.work.count)),
            "lt_valid": int(np.asarray(lt_valid_j(state.memory))),
            "lt_keys_absum": float(np.asarray(lt_sum_j(state.memory))),
        }
        if idx is not None:
            d["mask_area"] = round(float(np.asarray(area_j(idx))), 4)
        return d

    fin_update = jax.jit(lambda acc, s: acc + jnp.sum(
        jnp.where(jnp.isneginf(s), 0.0, s).astype(jnp.float32)))
    fin_acc = jnp.zeros((), jnp.float32)

    # fps windows (chunk-aligned): ~64 / ~512 / tail. Each window is the
    # MEDIAN of `reps` consecutive 64-frame measures on the continuing
    # rollout — a single-shot window is hostage to the tunnel's transient
    # stalls (a one-off 28->5 fps stall is on record, BASELINE.md; the
    # first soak attempt measured a "14.7 fps tail decay" that the
    # back-to-back stage replay, scripts/exp_soak_decay.py, proved was a
    # stall artifact: every stage is flat early-vs-late).
    reps, rep_c = 3, max(1, 64 // chunk)   # >=1 chunk/rep for any chunk
    n_chunks = n_frames // chunk
    win_defs = []
    for label, start_f in (
        ("frame_64", 56), ("frame_512", 448),
        ("frame_tail", n_frames - reps * rep_c * chunk),
    ):
        s_c, l_c = start_f // chunk, reps * rep_c
        if 0 <= s_c and s_c + l_c <= n_chunks and all(
                s_c + l_c <= ws or ws + wl <= s_c for ws, wl, _ in win_defs):
            win_defs.append((s_c, l_c, label))
    win_start = {s: (l, label) for s, l, label in win_defs}

    fps_windows = {}
    fps_window_runs = {}
    probes = []
    idx = None
    j = 0
    while j < n_chunks:
        if j in win_start:
            l_c, label = win_start[j]
            # pre-stage the window's frames on device as per-frame tuples
            # (production pipelines transfers; the timed loop measures
            # compute + dispatch, same discipline as the headline row)
            staged = [
                tuple(jnp.asarray(frames_np[1 + (j + m) * chunk + t])
                      for t in range(chunk))
                for m in range(l_c)
            ]
            # drain the untimed backlog before starting the clock
            np.asarray(state.memory.work.count)
            runs = []
            for r in range(reps):
                t0 = time.perf_counter()
                for fb in staged[r * rep_c:(r + 1) * rep_c]:
                    state, idx, scores = track_chunk(
                        xmem_params, sam_params, state, fb, cfg)
                    fin_acc = fin_update(fin_acc, scores)
                np.asarray(idx.ravel()[0:1])
                runs.append(rep_c * chunk / (time.perf_counter() - t0))
            fps_windows[label] = round(float(np.median(runs)), 3)
            fps_window_runs[label] = [round(r, 3) for r in runs]
            j += l_c
            probes.append({"window": label, **probe(state, idx)})
        else:
            fb = tuple(jnp.asarray(frames_np[1 + j * chunk + t])
                       for t in range(chunk))
            state, idx, scores = track_chunk(
                xmem_params, sam_params, state, fb, cfg)
            fin_acc = fin_update(fin_acc, scores)
            j += 1
            if j % 16 == 0:
                probes.append(probe(state))   # syncs: bounds dispatch queue

    assert np.isfinite(np.asarray(fin_acc)), "non-finite scores mid-soak"
    final = probe(state, idx)
    probes.append(final)

    # ---- cross-check the analytic schedule against the probed arena -----
    expect_count = adds * hw_tok - consols * (cw - mw)
    if final["work_count"] != expect_count:
        raise AssertionError(
            f"soak arena accounting broke: work.count {final['work_count']} "
            f"!= analytic {expect_count} (adds={adds}, consols={consols})")
    if consols >= lt_cap // p + 1 and final["lt_valid"] != lt_cap:
        raise AssertionError(
            f"LT never saturated: {final['lt_valid']} != {lt_cap}")
    # overwrite must demonstrably fire: LT key contents keep changing
    # between distinct-time post-saturation probes
    sat = [pr for pr in probes if pr["lt_valid"] == lt_cap]
    overwrites_seen = sum(
        1 for a, b in zip(sat, sat[1:])
        if a["ti"] != b["ti"] and a["lt_keys_absum"] != b["lt_keys_absum"])
    if evictions > 0 and overwrites_seen == 0:
        raise AssertionError("LT eviction-overwrite never observed despite "
                             f"{evictions} analytic eviction cycles")

    # ---- fresh-state control (drift vs state-dependence) ----------------
    # Replay the frame_64 window from a FRESH tracker state at the END of
    # the run (same frames, same jits). If this matches the original
    # frame_64 fps, any tail decay is state/data-dependent (memory
    # occupancy, mask structure), not tunnel-rate drift over the run.
    fps_fresh = None
    if "frame_64" in fps_windows:
        warm_c = 56 // chunk               # warm to the frame_64 window
        st2 = core.init_tracker_state(cfg, (h, w))
        st2, *_ = tracker.track_first_frame(
            xmem_params, st2, jnp.asarray(frames_np[0]), mask, valid, cfg,
            paint=False)
        for m in range(warm_c):
            fb = tuple(jnp.asarray(frames_np[1 + m * chunk + t])
                       for t in range(chunk))
            st2, idx2, _ = track_chunk(xmem_params, sam_params, st2, fb, cfg)
        staged = [
            tuple(jnp.asarray(frames_np[1 + (warm_c + m) * chunk + t])
                  for t in range(chunk))
            for m in range(rep_c)
        ]
        np.asarray(st2.memory.work.count)
        runs = []
        for _ in range(3):     # median-of-3, same stall robustness
            t0 = time.perf_counter()
            for fb in staged:
                st2, idx2, _ = track_chunk(
                    xmem_params, sam_params, st2, fb, cfg)
            np.asarray(idx2.ravel()[0:1])
            runs.append(rep_c * chunk / (time.perf_counter() - t0))
        fps_fresh = round(float(np.median(runs)), 3)

    out = {
        "frames": n_frames,
        "fps_windows": fps_windows,
        "fps_window_runs": fps_window_runs,
        "fps_fresh_control": fps_fresh,
        "lt_valid_final": final["lt_valid"],
        "consolidations": consols,
        "lt_eviction_cycles": evictions,
        "lt_overwrites_observed": overwrites_seen,
        "mask_area_final": final.get("mask_area"),
        "wall_s": round(time.time() - t_start, 1),
    }
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "peak_bytes_in_use" in stats:
            out["peak_device_bytes"] = int(stats["peak_bytes_in_use"])
    except Exception:
        pass
    return out


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
        FrameworkConfig, MemoryConfig, RefinementConfig, SAMConfig,
        XMemConfig,
    )
    from vosesam_tpu.inference import core, tracker
    from vosesam_tpu.models.sam import predictor
    from vosesam_tpu.models.xmem import network as xnet

    sam_type = os.environ.get("BENCH_SAM", "vit_h")
    hq = os.environ.get("BENCH_HQ", "1") == "1"
    n_frames = int(os.environ.get("BENCH_FRAMES", "64"))
    refine = os.environ.get("BENCH_REFINE", "1") == "1"
    chunk = int(os.environ.get("BENCH_CHUNK", "8"))
    stages = os.environ.get("BENCH_STAGES", "1") == "1"

    maxobj = int(os.environ.get("BENCH_MAXOBJ", "2"))
    cfg = FrameworkConfig(
        # object axis sized to the video's 2 objects — what the Tracker
        # session derives per video (tests/test_object_sizing.py proves
        # capacity never changes results)
        xmem=XMemConfig(max_objects=maxobj),
        # both objects are registered at frame 0, so the shared-validity
        # read contract holds (what Tracker._track_cfg would derive);
        # BENCH_LIVE=0 disables the hint for A/B.
        memory=MemoryConfig(
            live_objects=(int(os.environ.get("BENCH_LIVE", "2")) or None)),
        sam=SAMConfig(model_type=sam_type, hq=hq,
                      use_flash_attention=os.environ.get("BENCH_FLASH",
                                                         "1") == "1",
                      windowed_attention_impl=os.environ.get(
                          "BENCH_WIN_IMPL", "xla_fused_bias"),
                      encode_rect=os.environ.get("BENCH_RECT", "1") == "1",
                      encode_fixed_hw=(
                          tuple(int(v) for v in
                                os.environ["BENCH_FIXED_HW"].split("x"))
                          if os.environ.get("BENCH_FIXED_HW") else None),
                      encode_letterbox_hw=(
                          tuple(int(v) for v in
                                os.environ["BENCH_LETTERBOX_HW"].split("x"))
                          if os.environ.get("BENCH_LETTERBOX_HW") else None)),
        refinement=RefinementConfig(use_refinement=refine, mode="both_neg",
                                    optimized=True),
        dtype="bfloat16",
    )

    h, w = 480, 854
    warm_n = max(chunk, 1)
    if chunk > 1:
        # measured frames round UP to a whole number of chunks
        n_frames = -(-n_frames // chunk) * chunk
    all_np = moving_frames(1 + warm_n + n_frames, h, w)

    # Median-of-3 on the headline row: the tunneled chip's rate moves ±30%
    # between sessions and a single 3 s window also jitters WITHIN one —
    # the median (plus the raw runs in `fps_runs`) makes the recorded
    # artifact robust to a one-off stall (VERDICT r3 weak #5).
    reps = int(os.environ.get("BENCH_REPS", "3"))
    fps_runs, lt_count, stage_info = _measure(
        cfg, all_np, h, w, chunk, n_frames, refine, stages, reps=reps)
    fps = float(np.median(fps_runs))

    extras = {}
    if len(fps_runs) > 1:
        extras["fps_median"] = round(fps, 3)
        extras["fps_runs"] = [round(f, 3) for f in fps_runs]
    extras.update(stage_info)
    if (os.environ.get("BENCH_EXTRAS", "1") == "1" and refine and chunk > 1
            and cfg.sam.encode_fixed_hw is None
            and cfg.sam.encode_letterbox_hw is None):
        import dataclasses

        # Letterbox-448x896 fast gear on the SAME frames/loop — the opt-in
        # geometry-true row (BASELINE.md) recorded alongside the honest
        # default headline.
        lb_cfg = dataclasses.replace(
            cfg, sam=dataclasses.replace(cfg.sam,
                                         encode_letterbox_hw=(448, 896)))
        # median-of-reps here too: a single-shot letterbox row caught a
        # transient session stall (28.3 -> 5.2 fps for identical code,
        # 2026-08-20 pm) that the median-of-3 default row rode out.
        lb_runs, _, _ = _measure(lb_cfg, all_np, h, w, chunk, n_frames,
                                 refine, stages=False, reps=reps)
        lb_fps = float(np.median(lb_runs))
        extras["letterbox_fps_runs"] = [round(f, 3) for f in lb_runs]
        extras["letterbox_fps"] = round(lb_fps, 3)
        extras["letterbox_vs_baseline"] = round(lb_fps / 20.0, 3)
        # live_end occupancy corridor of the fused memory read at the
        # production 480p O=2 shape: the read costs what the arena HOLDS
        # (count cycles ~8k-16k of the padded capacity with real videos),
        # so the corridor bounds how much the headline can move with mask
        # geometry (VERDICT r2 weak #5).
        extras["read_ms_at_occupancy"] = _read_occupancy_corridor()
        if os.environ.get("BENCH_INPAINT", "1") == "1":
            extras.update(_inpaint_bench())
        if os.environ.get("BENCH_OBJECTS", "1") == "1":
            # Object-count scaling row (VERDICT r4 task 2). BENCH_OBJECTS=0
            # skips (A/B ladders).
            extras["fps_by_objects"] = _fps_by_objects(cfg, h, w, chunk)
        if os.environ.get("BENCH_INTERACTIVE", "1") == "1":
            # K=1 interactive latency (VERDICT r4 task 3).
            extras["interactive_ms"] = _interactive_bench(cfg)
    if (os.environ.get("BENCH_SOAK", "1") == "1" and refine and chunk > 1
            and cfg.sam.encode_fixed_hw is None
            and cfg.sam.encode_letterbox_hw is None):
        # Long-video soak at the production operating point (VERDICT r4
        # task 1): 1.5k frames, LT eviction firing, fps decay curve.
        # BENCH_SOAK=0 skips (A/B ladders); BENCH_SOAK_FRAMES overrides.
        extras["soak"] = _soak(
            cfg, h, w, chunk, int(os.environ.get("BENCH_SOAK_FRAMES", "1536")))
    _emit(cfg, fps, n_frames, refine, extras)


def _measure(cfg, all_np, h, w, chunk, n_frames, refine, stages, reps=1,
             seed_objects=None):
    """Run the measured tracking loop `reps` times for one config; returns
    (fps_list, lt_count, stage_info). Repeats continue the SAME rollout
    (memory state keeps evolving in long-form steady state), so each rep is
    an honest i.i.d.-ish sample of the steady-state rate.

    `seed_objects`: optional ((O, H, W) frame-0 mask, n_live) overriding the
    default 2-object seed (the O-scaling row passes the uniform family)."""
    import jax
    import jax.numpy as jnp

    from vosesam_tpu.config import FrameworkConfig, RefinementConfig
    from vosesam_tpu.inference import core, tracker
    from vosesam_tpu.models.sam import predictor
    from vosesam_tpu.models.xmem import network as xnet

    xmem_params = xnet.xmem_init(jax.random.PRNGKey(0), cfg.xmem, dtype=jnp.bfloat16)
    sam_params = (
        predictor.sam_init(jax.random.PRNGKey(1), cfg.sam, dtype=jnp.bfloat16)
        if refine else None
    )
    warm_n = max(chunk, 1)

    state = core.init_tracker_state(cfg, (h, w))
    if seed_objects is None:
        mask = jnp.zeros((cfg.xmem.max_objects, h, w)).at[0, 100:320, 150:500].set(1.0)
        mask = mask.at[1, 50:150, 600:750].set(1.0)
        valid = jnp.arange(cfg.xmem.max_objects) < 2
    else:
        m_np, n_live = seed_objects
        mask = jnp.asarray(m_np)
        valid = jnp.arange(cfg.xmem.max_objects) < n_live
    state, *_ = tracker.track_first_frame(
        xmem_params, state, jnp.asarray(all_np[0]), mask, valid, cfg,
        paint=False,
    )

    if chunk > 1:
        from vosesam_tpu.inference.chunked import track_chunk

        # pre-stage all measured chunks on device as per-frame tuples
        # (production pipelines transfers; we keep the loop measuring
        # compute + dispatch — pre-split frames skip the per-frame device
        # slice dispatch inside track_chunk)
        chunks = [
            tuple(jnp.asarray(all_np[1 + warm_n + i + j])
                  for j in range(chunk))
            for i in range(0, n_frames, chunk)
        ]
        warm_batch = tuple(jnp.asarray(all_np[1 + j]) for j in range(chunk))

        def step(state, fbatch):
            # donate_state measured a 3x SLOWDOWN on the tunneled chip
            # (13.3 -> 4.3 fps: donation serializes the dispatch pipeline
            # on this backend) — keep buffer-copy semantics.
            return track_chunk(xmem_params, sam_params, state, fbatch, cfg)

        state_w, idx, _ = step(state, warm_batch)
        np.asarray(idx.ravel()[0:1])
        state = state_w
        # On-device finiteness accumulator: a NaN in ANY chunk's scores
        # propagates through the running sum and is caught at the final
        # sync (the round-1 CBAM miscompile produced exactly this mode).
        # One jitted dispatch per chunk (unjitted jnp ops cost ~1 ms of
        # dispatch overhead EACH on this platform).
        fin_update = jax.jit(lambda acc, s: acc + jnp.sum(
            jnp.where(jnp.isneginf(s), 0.0, s).astype(jnp.float32)))
        fin_acc = jnp.zeros((), jnp.float32)
        fps_runs = []
        for _rep in range(reps):
            t0 = time.time()
            for fbatch in chunks:
                state, idx, scores = step(state, fbatch)
                fin_acc = fin_update(fin_acc, scores)
            # sync on ONE element sliced on-device: the tunnel moves
            # ~34 MB/s, so np.asarray of the full (K, H, W) i32 indexed
            # mask (13 MB) would bill ~380 ms of host transfer to the loop.
            np.asarray(idx.ravel()[0:1])
            fps_runs.append(n_frames / (time.time() - t0))
        fps = fps_runs[0]
        assert np.isfinite(np.asarray(fin_acc)), "non-finite scores mid-run"
        assert np.isfinite(np.asarray(idx)).all()
    else:
        def step(state, frame):
            state, indexed, logits, scores, _ = tracker.track_frame(
                xmem_params, sam_params, state, frame, cfg, paint=False
            )
            return state, indexed, scores

        frames_dev = [jnp.asarray(all_np[1 + warm_n + i]) for i in range(n_frames)]
        state_w, idx, _ = step(state, jnp.asarray(all_np[1]))
        np.asarray(idx.ravel()[0:1])
        state = state_w

        fin_acc = jnp.zeros((), jnp.float32)
        fps_runs = []
        for _rep in range(reps):
            t0 = time.time()
            for fr in frames_dev:
                state, idx, scores = step(state, fr)
                fin_acc = fin_acc + jnp.sum(
                    jnp.where(jnp.isneginf(scores), 0.0, scores).astype(jnp.float32))
            np.asarray(idx.ravel()[0:1])   # 1-element sync; see chunked branch
            fps_runs.append(n_frames / (time.time() - t0))
        fps = fps_runs[0]
        assert np.isfinite(np.asarray(fin_acc)), "non-finite scores mid-run"
        assert np.isfinite(np.asarray(idx)).all()

    # Long-form honesty: the measured window must have crossed the LT
    # consolidation boundary so steady state includes LT reads.
    lt_count = int(np.asarray(state.memory.long.key_valid.sum()))
    if n_frames >= 64:
        assert lt_count > 0, (
            f"LT consolidation never fired in {n_frames} frames — "
            "bench not measuring the long-form steady state")

    # ---- per-stage attribution (steady-state, same jits) ----------------
    stage_info = {}
    if stages and refine and chunk > 1:
        fbatch = jnp.stack(chunks[-1])

        def encode_only(sp, fb):
            return jax.vmap(lambda f: predictor.encode_image(sp, f, cfg.sam).embedding)(fb)

        enc_j = jax.jit(encode_only)
        emb = enc_j(sam_params, fbatch)
        np.asarray(emb.ravel()[0:1])
        t0 = time.time()
        for _ in range(3):
            emb = enc_j(sam_params, fbatch)
        np.asarray(emb.ravel()[0:1])
        enc_ms = (time.time() - t0) / 3 / chunk * 1e3

        # Achieved encode TFLOPS vs the chip's measured 76.5 TFLOPS
        # dependent-chain ceiling (BASELINE.md): FLOPs are static at trace
        # time, so the artifact records MFU, not just fps on a ±30%-variance
        # tunnel (VERDICT r3 task 6).
        try:
            ca = enc_j.lower(sam_params, fbatch).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            enc_flops = float(ca["flops"]) / chunk   # per frame
            tflops = enc_flops / (enc_ms * 1e-3) / 1e12
            stage_info["encode_tflops"] = round(tflops, 2)
            # vs the 76.5 TFLOPS dependent-chain measurement (BASELINE.md;
            # a ratio > 1 re-confirms that "ceiling" was a latency artifact)
            stage_info["mfu_vs_ceiling"] = round(tflops / 76.5, 3)
            # vs the v5e spec peak (394 TFLOPS bf16) — the honest MFU
            stage_info["mfu_vs_peak"] = round(tflops / 394.0, 3)
        except Exception as e:                       # backend w/o cost model
            print(f"# encode cost_analysis unavailable: {e}", file=sys.stderr)

        norefine_cfg = FrameworkConfig(
            xmem=cfg.xmem, memory=cfg.memory, sam=cfg.sam,
            refinement=RefinementConfig(use_refinement=False),
            dtype=cfg.dtype,
        )
        from vosesam_tpu.inference.chunked import (
            _refine_chunk, _xmem_chunk_step, track_chunk as tc,
        )

        fb_tuple = chunks[-1]
        st2 = state
        st2, idx2, _ = tc(xmem_params, None, st2, fb_tuple, norefine_cfg)
        np.asarray(idx2.ravel()[0:1])
        t0 = time.time()
        for _ in range(3):
            st2, idx2, _ = tc(xmem_params, None, st2, fb_tuple, norefine_cfg)
        np.asarray(idx2.ravel()[0:1])
        xmem_ms = (time.time() - t0) / 3 / chunk * 1e3

        # refine stage alone (one dispatch per chunk, same jit as the run):
        # reuse the last chunk's XMem outputs as inputs
        st3 = state
        per_frame = []
        for f in fb_tuple:
            st3, outs = _xmem_chunk_step(xmem_params, st3, f, cfg)
            per_frame.append(outs)
        per_frame = tuple(per_frame)
        r_idx, _rs = _refine_chunk(sam_params, fb_tuple, per_frame, cfg)
        np.asarray(r_idx.ravel()[0:1])
        t0 = time.time()
        for _ in range(3):
            r_idx, _rs = _refine_chunk(sam_params, fb_tuple, per_frame, cfg)
        np.asarray(r_idx.ravel()[0:1])
        ref_ms = (time.time() - t0) / 3 / chunk * 1e3

        total_ms = 1e3 / fps
        # Each stage is timed STANDALONE with its own dispatch latency; in
        # the measured loop the stages' dispatches overlap, so the columns
        # are upper bounds and do NOT sum to `total` (the honest number).
        print(f"# stage ms/frame @K={chunk} (standalone, non-additive): "
              f"encode={enc_ms:.1f} xmem={xmem_ms:.1f} "
              f"encode+refine={ref_ms:.1f} total={total_ms:.1f}  "
              f"lt_count={lt_count}",
              file=sys.stderr)

    return fps_runs, lt_count, stage_info


def _inpaint_bench():
    """E2FGVI-HQ generator at the app's production inpaint setting (T=15
    window, 11 locals, 240x432, fp32 — scripts/bench_inpaint.py's hot call),
    so BENCH_r*.json finally records the inpainter stage (VERDICT r3 #1).

    Honest per-OUTPUT-frame cost divides by the 5 stride-advanced frames a
    window emits (neighbor_stride=5, pipeline/inpaint.py), NOT by T=15."""
    import time

    import jax
    import jax.numpy as jnp

    from vosesam_tpu.config import InpainterConfig
    from vosesam_tpu.models.e2fgvi import generator as G

    t, nl, h, w = 15, 11, 240, 432
    cfg = InpainterConfig()
    params = G.generator_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    frames = jax.random.uniform(
        jax.random.PRNGKey(1), (t, h, w, 3), jnp.float32, -1.0, 1.0)
    fwd = jax.jit(lambda p, f: G.generator_forward(p, f, nl, cfg)[0])
    out = fwd(params, frames)
    np.asarray(out.ravel()[0:1])      # 1-elem sync (34 MB/s tunnel)
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fwd(params, frames)
        np.asarray(out.ravel()[0:1])
        runs.append((time.perf_counter() - t0) * 1e3)
    ms = float(np.median(runs))
    return {
        "inpaint_ms_per_window": round(ms, 1),
        "inpaint_ms_per_output_frame": round(ms / cfg.neighbor_stride, 1),
    }


def _read_occupancy_corridor():
    """Fused-read device-loop ms at live_end = {1.0, 0.5, 0.25} x capacity
    (the exp_read_scan.py sweep, production O=2 480p shapes)."""
    import time

    import jax
    import jax.numpy as jnp

    from vosesam_tpu.ops.pallas.memory_read import fused_memory_read_shared

    O, Q, M, CK, CV, K = 2, 1620, 17200, 64, 512, 30
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    mk = jax.random.normal(ks[0], (M, CK), jnp.bfloat16)
    ms = 1.0 + jax.nn.softplus(jax.random.normal(ks[1], (M,))).astype(jnp.float32)
    mv = jax.random.normal(ks[2], (O, M, CV), jnp.bfloat16)
    qk = jax.random.normal(ks[3], (Q, CK), jnp.bfloat16)
    qe = jax.nn.sigmoid(jax.random.normal(ks[4], (Q, CK))).astype(jnp.bfloat16)
    kv = jnp.ones((M,), bool)
    N = 20

    out = {}
    for frac in (1.0, 0.5, 0.25):
        le = jnp.int32(int(M * frac))

        @jax.jit
        def run(qk, _le=le):
            def step(carry, _):
                o, _u = fused_memory_read_shared(
                    mk, ms, qk + carry.astype(qk.dtype) * 0, qe, mv, kv, K,
                    return_usage=True, live_end=_le)
                return carry + jnp.float32(
                    jnp.sum(o.astype(jnp.float32))) * 1e-30, 0

            c, _ = jax.lax.scan(step, jnp.float32(0), None, length=N)
            return c

        np.asarray(run(qk))
        t0 = time.perf_counter()
        np.asarray(run(qk))
        out[f"live_{frac:g}"] = round(
            (time.perf_counter() - t0) / N * 1e3, 2)
    return out


def _emit(cfg, fps, n_frames, refine, extras):
    sam_type = cfg.sam.model_type
    hq = cfg.sam.hq
    label = f"XMem+SAM{'-HQ' if hq else ''} {sam_type}" if refine else "XMem-only"
    print(json.dumps({
        "metric": f"DAVIS-480p frames/sec/chip ({label} refinement loop, "
                  f"{n_frames}-frame steady state)",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 20.0, 3),
        **extras,
    }))


if __name__ == "__main__":
    main()

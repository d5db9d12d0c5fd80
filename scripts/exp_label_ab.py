"""Is the 128-iteration blob-labeling chain worth accelerating?

label_blobs (ops/morphology.py) propagates max labels with a fori_loop of
128 sequential 3x3 reduce_window maxes — an O(diameter) chain. A
pointer-jumping variant (hook one local propagation, then indirect through
the label values: l <- max(l, l[l-1])) reaches the same fixed point in
O(log D) rounds, at the price of one gather per round (XLA:TPU gathers run
~15 GB/s, but the label grid is ~100 KB — microseconds).

This measures, on the real chip at the production prompt path's shapes
(480p masks, downsample-4 labeling grid, vmapped over 16 (frame, object)
lanes as the K=8 chunked refine does):

  A. points_C with the shipped 128-iteration labeling   (production)
  B. points_C with iterations=8                          (lower bound probe:
     if B ~= A, the chain costs nothing in situ — stop here)
  C. standalone label_blobs 128-iter vs pointer-jump 16-round, bit-equality
     checked on multi-blob masks

Decision rule (pre-registered): wire the jump variant only if A-B shows
>= 0.5 ms per vmapped call AND the jump variant captures >= half of it.
Device-loop timing; one np.asarray sync per measurement.

Run: PYTHONPATH=.:$PYTHONPATH python scripts/exp_label_ab.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vosesam_tpu.config import RefinementConfig
from vosesam_tpu.ops import morphology as morph
from vosesam_tpu.ops import prompts as P

LANES = 16          # K=8 frames x O=2 objects
H, W = 480, 854
REPS = 20


def _log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def _masks(rng):
    """Realistic multi-blob 480p masks: 2 moving elliptical blobs + a speck."""
    ms = np.zeros((LANES, H, W), np.float32)
    yy, xx = np.mgrid[:H, :W]
    for i in range(LANES):
        cy, cx = rng.integers(100, 380), rng.integers(150, 700)
        a, b = rng.integers(40, 90), rng.integers(60, 130)
        ms[i] += ((yy - cy) ** 2 / a**2 + (xx - cx) ** 2 / b**2 < 1)
        cy2, cx2 = rng.integers(60, 420), rng.integers(80, 770)
        ms[i] += ((yy - cy2) ** 2 / 900 + (xx - cx2) ** 2 / 1600 < 1)
    return jnp.asarray((ms > 0).astype(np.float32))


def _time_loop(fn, masks):
    out = fn(masks)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(masks)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / REPS * 1e3


def label_blobs_jump(mask: jax.Array, rounds: int = 16) -> jax.Array:
    """Pointer-jumping variant of label_blobs: same fixed point (max linear
    index per component), O(log D) rounds of hook + jump."""
    h, w = mask.shape
    m = mask.astype(bool)
    idx = (jnp.arange(h * w, dtype=jnp.float32) + 1.0).reshape(h, w)
    lab = jnp.where(m, idx, 0.0)

    def body(_, lab):
        lab = jnp.where(m, morph._window3_max(lab), 0.0)       # hook
        flat = lab.reshape(-1)
        li = jnp.maximum(flat.astype(jnp.int32) - 1, 0)
        jumped = flat[li].reshape(h, w)                         # jump
        return jnp.where(m, jnp.maximum(lab, jumped), 0.0)

    lab = jax.lax.fori_loop(0, rounds, body, lab)
    return lab.astype(jnp.int32)


def main():
    rng = np.random.default_rng(0)
    masks = _masks(rng)
    cfg = RefinementConfig(min_region_area=100.0)

    # --- C. equality first (CPU-fast shapes exercised too)
    _log("equality check (jump vs 128-iter) ...")
    small = np.zeros((60, 108), np.float32)
    small[5:20, 5:40] = 1          # wide blob
    small[30:32, 2:100] = 1        # long thin snake (diameter ~98)
    small[50:55, 80:90] = 1
    a = np.asarray(morph.label_blobs(jnp.asarray(small), iterations=128))
    b = np.asarray(label_blobs_jump(jnp.asarray(small), rounds=16))
    print(f"bit-equal on snake corpus: {np.array_equal(a, b)}")

    # --- A/B in situ: the production points_C path, vmapped like refine
    pc = jax.jit(jax.vmap(partial(P.points_C, cfg=cfg)))
    _log("A: vmapped points_C (shipped 128-iter labeling) ...")
    ms_a = _time_loop(pc, masks)
    print(f"A points_C/128: {ms_a:7.2f} ms per {LANES}-lane call")

    # B: temporarily shrink the labeling chain (measurement-only probe)
    orig = morph.top_blobs
    def probe_top_blobs(mask, num_blobs, min_area, label_iterations=8,
                        downsample=4):
        return orig(mask, num_blobs, min_area, 8, downsample)
    morph.top_blobs = probe_top_blobs
    P.morph.top_blobs = probe_top_blobs
    try:
        pcb = jax.jit(jax.vmap(partial(P.points_C, cfg=cfg)))
        _log("B: vmapped points_C (8-iter probe) ...")
        ms_b = _time_loop(pcb, masks)
    finally:
        morph.top_blobs = orig
        P.morph.top_blobs = orig
    print(f"B points_C/8  : {ms_b:7.2f} ms per call  "
          f"(labeling chain cost <= {ms_a - ms_b:.2f} ms)")

    # --- standalone labeling compare at the downsampled grid, vmapped
    hd, wd = H // 4, W // 4
    small_masks = jnp.asarray(
        np.asarray(masks)[:, : hd * 4 : 4, : wd * 4 : 4])
    l128 = jax.jit(jax.vmap(partial(morph.label_blobs, iterations=128)))
    ljmp = jax.jit(jax.vmap(partial(label_blobs_jump, rounds=16)))
    _log("standalone labeling ...")
    ms_128 = _time_loop(l128, small_masks)
    ms_jmp = _time_loop(ljmp, small_masks)
    eq = np.array_equal(np.asarray(l128(small_masks)),
                        np.asarray(ljmp(small_masks)))
    print(f"standalone label (vmapped {LANES}x{hd}x{wd}): "
          f"128-iter {ms_128:.2f} ms vs jump-16 {ms_jmp:.2f} ms  equal={eq}")


if __name__ == "__main__":
    main()

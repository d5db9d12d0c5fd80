"""Per-stage profile of the DAVIS-480p frame step on the real chip.

Times, steady-state, each independently:
  - SAM ViT encode (flash on / off)
  - XMem step (key encode + memory read + segment)
  - refinement given a precomputed embedding
  - full per-frame track_frame
Run: python scripts/profile_stages.py [vit_h|vit_b|vit_l]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, n=8, warmup=2):
    for _ in range(warmup):
        out = fn()
    np.asarray(jax.tree.leaves(out)[-1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(jax.tree.leaves(out)[-1])
    return (time.perf_counter() - t0) / n * 1e3


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from vosesam_tpu.config import (
        FrameworkConfig, RefinementConfig, SAMConfig, XMemConfig,
    )
    from vosesam_tpu.inference import core, tracker
    from vosesam_tpu.inference.refinement import (
        masks_from_prob, refine_masks, xmem_object_scores,
    )
    from vosesam_tpu.models.sam import predictor
    from vosesam_tpu.models.xmem import network as xnet

    sam_type = sys.argv[1] if len(sys.argv) > 1 else "vit_h"

    h, w = 480, 854
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (h, w, 3), np.uint8))

    for flash in (True, False):
        cfg = FrameworkConfig(
            xmem=XMemConfig(max_objects=3),
            sam=SAMConfig(model_type=sam_type, hq=True, use_flash_attention=flash),
            refinement=RefinementConfig(use_refinement=True, mode="both_neg",
                                        optimized=True),
            dtype="bfloat16",
        )
        sam_params = predictor.sam_init(jax.random.PRNGKey(1), cfg.sam, dtype=jnp.bfloat16)
        # params as jit args (closed-over params inline ~1.3 GB of HLO
        # constants, which hangs the remote-compile tunnel)
        enc = jax.jit(lambda sp, f: predictor.encode_image(sp, f, cfg.sam))
        ms = timeit(lambda: enc(sam_params, frame))
        print(f"encode {sam_type} flash={flash}: {ms:8.2f} ms")
        if not flash:
            break  # keep the flash sam_params/cfg for the rest

    cfg = FrameworkConfig(
        xmem=XMemConfig(max_objects=3),
        sam=SAMConfig(model_type=sam_type, hq=True, use_flash_attention=True),
        refinement=RefinementConfig(use_refinement=True, mode="both_neg",
                                    optimized=True),
        dtype="bfloat16",
    )
    sam_params = predictor.sam_init(jax.random.PRNGKey(1), cfg.sam, dtype=jnp.bfloat16)
    xmem_params = xnet.xmem_init(jax.random.PRNGKey(0), cfg.xmem, dtype=jnp.bfloat16)

    state = core.init_tracker_state(cfg, (h, w))
    mask = jnp.zeros((cfg.xmem.max_objects, h, w)).at[0, 100:320, 150:500].set(1.0)
    mask = mask.at[1, 50:150, 600:750].set(1.0)
    valid = jnp.array([True, True, False])
    state, *_ = tracker.track_first_frame(
        xmem_params, state, frame, mask, valid, cfg, paint=False)

    # XMem step alone
    @jax.jit
    def xstep(xp, st, f):
        st, prob, logits = core.step(xp, st, f, cfg)
        return st, prob, logits

    st2, prob, logits = xstep(xmem_params, state, frame)
    ms = timeit(lambda: xstep(xmem_params, state, frame))
    print(f"xmem step:            {ms:8.2f} ms")

    # refinement alone, embedding precomputed
    emb = jax.jit(
        lambda sp, f: predictor.encode_image(sp, f, cfg.sam))(sam_params, frame)

    @jax.jit
    def refine(sp, emb, prob, logits, ov):
        masks, indexed = masks_from_prob(prob, cfg.xmem.max_objects)
        scores = xmem_object_scores(prob[1:])
        return refine_masks(sp, emb, masks, logits[1:], scores, ov, cfg)

    out = refine(sam_params, emb, prob, logits, state.memory.obj_valid)
    ms = timeit(lambda: refine(
        sam_params, emb, prob, logits, state.memory.obj_valid))
    print(f"refine (no encode):   {ms:8.2f} ms")

    # full frame
    def full(st, f):
        st, indexed, lg, sc, _ = tracker.track_frame(
            xmem_params, sam_params, st, f, cfg, paint=False)
        return st, indexed

    st3, idx = full(state, frame)
    ms = timeit(lambda: full(state, frame))
    print(f"full track_frame:     {ms:8.2f} ms  ({1e3/ms:.2f} fps)")


if __name__ == "__main__":
    main()

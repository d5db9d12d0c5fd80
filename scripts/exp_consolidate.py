"""Measure the LT-consolidation branch in isolation on the chip.

Near-capacity steady state costs ~25 ms/frame vs ~16 fresh (BASELINE.md);
consolidation fires every ~mem_every frames there. This times _consolidate
(and the memorize-step value encode for comparison) on a full 480p-sized
state to attribute that gap.

    PYTHONPATH=.:$PYTHONPATH python scripts/exp_consolidate.py [reps]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from vosesam_tpu.config import FrameworkConfig, RefinementConfig, XMemConfig
    from vosesam_tpu.inference import core, tracker
    from vosesam_tpu.memory import manager
    from vosesam_tpu.models.xmem import network as xnet

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    h, w = 480, 854
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (h, w, 3), np.uint8))

    cfg = FrameworkConfig(
        xmem=XMemConfig(max_objects=3),
        refinement=RefinementConfig(use_refinement=False),
        dtype="bfloat16",
    )
    params = xnet.xmem_init(jax.random.PRNGKey(0), cfg.xmem, dtype=jnp.bfloat16)
    state = core.init_tracker_state(cfg, (h, w))
    mask = jnp.zeros((3, h, w)).at[0, 100:320, 150:500].set(1.0)
    mask = mask.at[1, 50:150, 600:750].set(1.0)
    state, *_ = tracker.track_first_frame(
        params, state, frame, mask, jnp.array([True, True, False]), cfg,
        paint=False)
    # roll to capacity so the consolidation inputs are realistic
    st = state
    for _ in range(55):
        st, *_ = tracker.track_frame(params, None, st, frame, cfg, paint=False)
    np.asarray(st.memory.work.count)
    hw16 = (480 // 16 + (1 if 480 % 16 else 0)) * (864 // 16)
    hw16 = ( (480 + 15) // 16 ) * ( (854 + 15) // 16 )
    print(f"work count at capacity probe: {int(np.asarray(st.memory.work.count))}"
          f" / cap {st.memory.work.keys.shape[0]}  hw={hw16}", flush=True)

    cons = jax.jit(partial(manager._consolidate, cfg=cfg.memory, hw=hw16))
    mem2 = cons(st.memory)
    np.asarray(mem2.work.count)
    t0 = time.perf_counter()
    m = st.memory
    for _ in range(reps):
        m = cons(m)
    np.asarray(m.work.count)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"_consolidate alone: {ms:6.1f} ms/call "
          f"(~{ms / cfg.memory.mem_every:.1f} ms/frame amortized at "
          f"mem_every={cfg.memory.mem_every})", flush=True)

    # steady-state per-frame step at capacity, for the end-to-end number
    t0 = time.perf_counter()
    s2 = st
    n = 24
    for _ in range(n):
        s2, idx, *_ = tracker.track_frame(params, None, s2, frame, cfg,
                                          paint=False)
    np.asarray(idx).ravel()[:1]
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"steady-state per-frame step at capacity: {ms:6.1f} ms/frame",
          flush=True)


if __name__ == "__main__":
    main()

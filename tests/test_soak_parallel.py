"""Soak x parallel (VERDICT r4 task 5): long-video lockstep lanes through
the batched chunked driver with LT eviction actually firing.

The round-4 dryrun covered 3-frame lockstep videos; this composes the two
behaviors that had never met: uneven >=512-frame lanes (LongDataset/LVOS
regime, /root/reference/dataset/longdataset.py:8) and long-term-memory
consolidation/eviction cycling (memory/manager.py:232-306) — inside
BatchedGenerator(chunk=8) (parallel/evaluation.py) over a 2-device data
mesh. At the tiny test config (48x64 -> hw=12, work=36, lt=64, proto=8,
mem_every=2) a 520-frame lane runs 258 consolidations and ~250
eviction-overwrite cycles.

Pinned:
  - the long lane's final LT arena is saturated (eviction demonstrably
    cycled at >=512-frame scale);
  - the SHORT lane's outputs are bit-equal to a sequential single-video
    Tracker run of its true length (lockstep dead-frame stepping never
    leaks into kept outputs, even across hundreds of dead frames);
  - the LONG lane's outputs are bit-equal to the sequential Tracker too
    (the batched chunk step walks the exact same 258-consolidation memory
    trajectory).
"""

import numpy as np
import pytest

from bench import tri as _tri
from tests.test_pipeline import H, W, fresh_ta

pytestmark = pytest.mark.slow

LONG_N = 520          # >= 512-frame lane (the task's bar)
SHORT_N = 140


def _video(n, seed, label):
    """n frames with a periodically moving box (stays in-frame forever)."""
    r = np.random.default_rng(seed)
    base = r.integers(0, 255, (H, W, 3), np.uint8)
    frames = []
    for i in range(n):
        f = base.copy()
        y, x = 8 + _tri(i, 18), 10 + _tri(2 * i, 28)
        f[y:y + 14, x:x + 20] = [255, 40, 40]
        frames.append(f)
    tpl = np.zeros((H, W), np.uint8)
    tpl[8:22, 10:30] = label
    return frames, tpl


def _sequential(ta, frames, template):
    ta.xmem.clear_memory()
    masks = []
    for i, f in enumerate(frames):
        m, _lg, _p, _s = ta.xmem.track(f, template if i == 0 else None)
        masks.append(m)
    ta.xmem.clear_memory()
    return masks


def test_soak_parallel_lt_eviction_uneven_lanes():
    import jax
    from jax.sharding import Mesh

    from vosesam_tpu.parallel.evaluation import BatchedGenerator

    ta = fresh_ta(False)
    cfg = ta.cfg
    mem = cfg.memory
    vid_a, tpl_a = _video(LONG_N, 1, label=3)
    vid_b, tpl_b = _video(SHORT_N, 2, label=2)

    # analytic schedule at the tiny config (see bench.py:_soak for the
    # production-shape version of the same accounting)
    hw = (-(-H // 16)) * (-(-W // 16))
    cw, mw = mem.work_capacity(hw), mem.min_work_elements(hw)
    adds = (LONG_N - 1) // mem.mem_every + 1
    consols = 1 + (adds - cw // hw) * hw // (cw - mw)
    evictions = consols - mem.max_long_term_elements // mem.num_prototypes
    assert evictions > 100, "test config must cycle eviction heavily"

    mesh = Mesh(np.asarray(jax.devices()[:2]), (cfg.parallel.data_axis,))
    gen = BatchedGenerator(ta.xmem_params, ta.sam_params, cfg,
                           mesh=mesh, chunk=8)
    got, states = gen.run([vid_a, vid_b], [tpl_a, tpl_b], return_states=True)

    # --- LT eviction fired at >=512-frame scale: lane 0 saturated --------
    lt_valid = np.asarray(states.memory.long.key_valid).sum(axis=1)
    assert lt_valid[0] == mem.max_long_term_elements, (
        f"long lane LT not saturated: {lt_valid[0]}")
    # lockstep accounting: the batched work arena matches the analytic
    # schedule at t_max frames for every lane (dead frames still step)
    count = np.asarray(states.memory.work.count)
    assert int(count[0]) == adds * hw - consols * (cw - mw)

    # --- short lane bit-equal to its sequential run (dead-frame isolation)
    want_b = _sequential(ta, vid_b, tpl_b)
    assert len(got[1]["masks"]) == SHORT_N
    for t in range(SHORT_N):
        np.testing.assert_array_equal(got[1]["masks"][t], want_b[t],
                                      err_msg=f"short lane frame {t}")

    # --- long lane bit-equal through all ~250 eviction cycles ------------
    want_a = _sequential(ta, vid_a, tpl_a)
    assert len(got[0]["masks"]) == LONG_N
    for t in range(0, LONG_N, 7):   # stride keeps the compare cheap
        np.testing.assert_array_equal(got[0]["masks"][t], want_a[t],
                                      err_msg=f"long lane frame {t}")

"""Op-level jax.profiler trace of a steady-state track_chunk on the chip.

Captures N steady-state chunks of the EXACT bench configuration under
jax.profiler.trace and prints the top device ops aggregated by name, with a
matmul / conv / gather / other split — the ground-truth answer to "where do
the encode's non-matmul milliseconds go".

Honors the bench env knobs (BENCH_SAM / BENCH_LETTERBOX_HW / ...).

Run:  python scripts/profile_trace.py [n_traced_chunks]
Then: the aggregate table prints; the raw trace stays in /tmp/vosesam_trace
      (~MBs; not committed).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def capture(n_chunks: int, trace_dir: str) -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))

    os.environ.setdefault("BENCH_STAGES", "0")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    from vosesam_tpu.config import (
        FrameworkConfig, RefinementConfig, SAMConfig, XMemConfig,
    )
    from vosesam_tpu.inference import core, tracker
    from vosesam_tpu.inference.chunked import track_chunk
    from vosesam_tpu.models.sam import predictor
    from vosesam_tpu.models.xmem import network as xnet

    cfg = FrameworkConfig(
        xmem=XMemConfig(max_objects=3),
        sam=SAMConfig(model_type=os.environ.get("BENCH_SAM", "vit_h"),
                      hq=True,
                      use_flash_attention=True,
                      windowed_attention_impl="xla_fused_bias",
                      encode_rect=True,
                      encode_letterbox_hw=(
                          tuple(int(v) for v in
                                os.environ["BENCH_LETTERBOX_HW"].split("x"))
                          if os.environ.get("BENCH_LETTERBOX_HW") else None)),
        refinement=RefinementConfig(use_refinement=True, mode="both_neg",
                                    optimized=True),
        dtype="bfloat16",
    )
    h, w, K = 480, 854, 8
    n_frames = (2 + n_chunks) * K
    all_np = bench.moving_frames(1 + n_frames, h, w)

    xmem_params = xnet.xmem_init(jax.random.PRNGKey(0), cfg.xmem, dtype=jnp.bfloat16)
    sam_params = predictor.sam_init(jax.random.PRNGKey(1), cfg.sam, dtype=jnp.bfloat16)

    state = core.init_tracker_state(cfg, (h, w))
    mask = jnp.zeros((3, h, w)).at[0, 100:320, 150:500].set(1.0)
    mask = mask.at[1, 50:150, 600:750].set(1.0)
    print("compiling first frame ...", flush=True)
    state, *_ = tracker.track_first_frame(
        xmem_params, state, jnp.asarray(all_np[0]), mask,
        jnp.array([True, True, False]), cfg, paint=False)

    chunks = [tuple(jnp.asarray(all_np[1 + i + j]) for j in range(K))
              for i in range(0, n_frames, K)]
    # two warm chunks (compile + steady memory)
    for ci, fb in enumerate(chunks[:2]):
        print(f"warm chunk {ci} ...", flush=True)
        state, idx, _ = track_chunk(xmem_params, sam_params, state, fb, cfg)
        np.asarray(idx.ravel()[0:1])
    print("warmup done, tracing ...", flush=True)

    with jax.profiler.trace(trace_dir):
        for fb in chunks[2:]:
            state, idx, _ = track_chunk(xmem_params, sam_params, state, fb, cfg)
        np.asarray(idx.ravel()[0:1])
    print(f"traced {n_chunks} chunks ({n_chunks * K} frames)", flush=True)


def classify(name: str) -> str:
    n = name.lower()
    if "conv" in n:
        return "conv"
    if n.startswith("dot") or "matmul" in n or "einsum" in n:
        return "matmul"
    if "gather" in n or "scatter" in n or "dynamic-update" in n or "dynamic_update" in n:
        return "gather/scatter"
    if "fusion" in n:
        return "fusion(elementwise/mixed)"
    if "copy" in n or "transpose" in n or "reshape" in n or "bitcast" in n:
        return "layout/copy"
    if "reduce" in n or "sort" in n or "top-k" in n or "softmax" in n:
        return "reduce/sort"
    if "custom-call" in n or "custom_call" in n or "mosaic" in n or "tpu_custom" in n:
        return "pallas/custom"
    return "other"


def report(trace_dir: str, top: int = 30) -> None:
    files = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not files:
        print("no trace file found", file=sys.stderr)
        sys.exit(1)
    d = json.load(gzip.open(files[-1]))
    evs = d.get("traceEvents", [])
    procs = {e.get("pid"): e.get("args", {}).get("name")
             for e in evs if e.get("ph") == "M" and e.get("name") == "process_name"}
    tpu_pids = {p for p, n in procs.items() if n and "TPU" in n}
    tnames = {(e.get("pid"), e.get("tid")): e.get("args", {}).get("name")
              for e in evs
              if e.get("ph") == "M" and e.get("name") == "thread_name"}
    # The device trace has TWO lanes: "XLA Modules" (one region per jit
    # execution) and "XLA Ops" (the leaf HLO ops). Aggregate the ops lane;
    # attribute each op to the module region covering its timestamp.
    mods, leaf = [], []
    for e in evs:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        lane = tnames.get((e.get("pid"), e.get("tid")), "")
        if lane == "XLA Modules":
            mods.append((e["ts"], e["ts"] + e.get("dur", 0),
                         e.get("name", "?").split("(")[0]))
        elif lane == "XLA Ops":
            leaf.append(e)
    mods.sort()

    import bisect
    mstarts = [m[0] for m in mods]

    def region_of(ts):
        i = bisect.bisect_right(mstarts, ts) - 1
        if i >= 0 and ts < mods[i][1]:
            return mods[i][2]
        return "<outside-module>"

    ops = {}
    regions = {}
    total = 0.0
    for e in leaf:
        ms = e.get("dur", 0) / 1e3
        nm = e.get("name", "?")
        o = ops.setdefault(nm, [0, 0.0])
        o[0] += 1
        o[1] += ms
        total += ms
        r = regions.setdefault(region_of(e["ts"]), {})
        cc = r.setdefault(classify(nm), [0, 0.0])
        cc[0] += 1
        cc[1] += ms

    print(f"\nTPU device LEAF time in trace: {total:.1f} ms "
          f"over {len(ops)} distinct ops")
    print("\nBy region x category:")
    for rname, cats in sorted(regions.items(),
                              key=lambda kv: -sum(v[1] for v in kv[1].values())):
        rtot = sum(v[1] for v in cats.values())
        print(f"  {rtot:9.2f} ms  {rname[:60]}")
        for cat, (c, ms) in sorted(cats.items(), key=lambda kv: -kv[1][1]):
            print(f"      {ms:9.2f} ms  {100 * ms / rtot:5.1f}%  x{c:5d}  {cat}")
    print(f"\nTop {top} leaf ops:")
    for nm, (c, ms) in sorted(ops.items(), key=lambda kv: -kv[1][1])[:top]:
        print(f"  {ms:9.2f} ms  x{c:5d}  [{classify(nm):24s}] {nm[:80]}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    tdir = "/tmp/vosesam_trace"
    capture(n, tdir)
    report(tdir)

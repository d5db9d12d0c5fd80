"""Standalone long-video soak runner (the BENCH soak block, bench.py:_soak).

Runs a 1.5k-frame (configurable) continuous rollout through the chunked
tracking driver at the PRODUCTION memory config — max_long_term_elements
1000 / num_prototypes 128 / top_k 30 / mem_every 5, the reference's shipped
knobs (tracker/config/config.yaml:4-9) — and prints the soak JSON:
fps windows at frames ~64 / ~512 / tail, consolidation + LT eviction-cycle
counts (cross-checked analytic vs probed arena state), observed LT
overwrites, and peak device memory.

Usage:  python scripts/tpu_soak.py [n_frames] [chunk]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from vosesam_tpu.config import (
        FrameworkConfig, MemoryConfig, RefinementConfig, SAMConfig, XMemConfig,
    )

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 1536
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    objects = int(os.environ.get("SOAK_OBJECTS", "2"))
    # SOAK_ENCODE=letterbox:448x896 soaks the opt-in fast gear
    enc = os.environ.get("SOAK_ENCODE", "rect")
    enc_kw = ({"encode_rect": True} if enc == "rect" else
              {"encode_letterbox_hw": tuple(
                  int(v) for v in enc.split(":")[1].split("x"))})
    cfg = FrameworkConfig(
        xmem=XMemConfig(max_objects=objects),
        memory=MemoryConfig(live_objects=objects),
        sam=SAMConfig(model_type=os.environ.get("BENCH_SAM", "vit_h"),
                      hq=True, **enc_kw),
        refinement=RefinementConfig(
            use_refinement=os.environ.get("SOAK_REFINE", "1") == "1",
            mode="both_neg", optimized=True),
        dtype="bfloat16",
    )
    out = bench._soak(cfg, 480, 854, chunk, n_frames, objects=objects)
    print(json.dumps({"soak": out, "objects": objects}))


if __name__ == "__main__":
    main()

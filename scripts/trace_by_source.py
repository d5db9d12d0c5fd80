"""Join the op-level device trace with compiled-HLO metadata: aggregate TPU
leaf-op time by SOURCE LINE (the ground-truth 'where do the milliseconds go'
table the opaque fusion.N names hide).

Reads the trace captured by scripts/profile_trace.py (/tmp/vosesam_trace) and
AOT-compiles the same two programs to recover each op's `metadata={op_name=..
source_file=.. source_line=..}`.

Run: python scripts/profile_trace.py 2   (capture)
     python scripts/trace_by_source.py   (join + report)
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def hlo_texts():
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    from scripts.hlo_attrib import build_programs
    return {label: low.compile().as_text()
            for label, low in build_programs().items()}


META_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w\.\-]+)\s*=.*?metadata=\{([^}]*)\}", re.MULTILINE)


def parse_meta(txt: str):
    """op name -> (op_name_path, source_file:line)."""
    out = {}
    for m in META_RE.finditer(txt):
        name, meta = m.group(1), m.group(2)
        op = re.search(r'op_name="([^"]*)"', meta)
        sf = re.search(r'source_file="([^"]*)"', meta)
        sl = re.search(r'source_line=(\d+)', meta)
        src = (f"{os.path.basename(sf.group(1))}:{sl.group(1)}"
               if sf and sl else "?")
        out[name] = (op.group(1) if op else "?", src)
    return out


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vosesam_trace"
    files = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    d = json.load(gzip.open(files[-1]))
    evs = d.get("traceEvents", [])
    procs = {e.get("pid"): e.get("args", {}).get("name")
             for e in evs if e.get("ph") == "M" and e.get("name") == "process_name"}
    tpu_pids = {p for p, n in procs.items() if n and "TPU" in n}
    tnames = {(e.get("pid"), e.get("tid")): e.get("args", {}).get("name")
              for e in evs if e.get("ph") == "M" and e.get("name") == "thread_name"}
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
        return mods[i][2] if i >= 0 and ts < mods[i][1] else "<none>"

    metas = {}
    for label, txt in hlo_texts().items():
        key = "refine" if label == "refine" else "xmem"
        metas[key] = parse_meta(txt)

    # how many frames the trace covers (for ms/frame): count xmem module execs
    n_frames = sum(1 for m in mods if "_xmem_chunk_step" in m[2]) or 1

    agg = {}
    unattributed = {}
    for e in leaf:
        ms = e.get("dur", 0) / 1e3
        nm = e.get("name", "?")
        region = region_of(e["ts"])
        key = ("refine" if "refine" in region
               else "xmem" if "xmem" in region else None)
        meta = metas.get(key, {}).get(nm) if key else None
        if meta is None:
            u = unattributed.setdefault((region, nm), [0, 0.0])
            u[0] += 1
            u[1] += ms
            bucket = (region, "<unattributed>", nm.split(".")[0])
        else:
            op_path, src = meta
            # collapse vmap/jit prefixes; keep the tail primitive
            prim = op_path.split("/")[-1]
            bucket = (key, src, prim)
        a = agg.setdefault(bucket, [0, 0.0])
        a[0] += 1
        a[1] += ms

    total = sum(v[1] for v in agg.values())
    print(f"\n{n_frames} frames traced; device leaf total "
          f"{total:.1f} ms = {total / n_frames:.2f} ms/frame\n")
    print(f"{'ms/frame':>9}  {'%':>5}  {'count':>6}  region  source  primitive")
    for (key, src, prim), (c, ms) in sorted(
            agg.items(), key=lambda kv: -kv[1][1])[:45]:
        print(f"{ms / n_frames:9.3f}  {100 * ms / total:5.1f}  {c:6d}  "
              f"{key:7s} {src:34s} {prim[:40]}")


if __name__ == "__main__":
    main()

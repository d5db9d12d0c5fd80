"""Checkpoint-day playbook: the ONE command to run when real weights land.

Collapses the scattered "when checkpoints + datasets arrive" procedures
(BASELINE.md "To be measured" table, the letterbox-gear promotion question,
the chunked/batched fast-path rows) into a single unattended pipeline:

  python scripts/checkpoint_day.py --checkpoints /path/ckpts --data /path/data \
      [--reference_csv ref.csv] [--max_videos N] [--out result/checkpoint_day]

Phases (each an isolated run_parity.py subprocess):

  A. OFFICIAL ENCODE, all five BASELINE configs, through the measured-
     fastest program (--chunk 8 --batch: generator_chunked for 1-4,
     BatchedGenerator over the mesh for 5 — bit-equal to sequential,
     tests/test_run_parity.py). With --reference_csv the report gains
     dJ&F columns vs the reference repo's own runner.py numbers.
  B. LETTERBOX GEAR (--encode letterbox:448x896 by default): the opt-in
     1.5x fast gear whose J&F-vs-official delta has been checkpoint-
     blocked since round 3 (BASELINE.md encode-resolution corridor).
  C. VERDICT: letterbox is PROMOTED when every J&F-bearing config's
     |JF_letterbox - JF_official| <= --jf_gate (default 0.2, the BASELINE
     parity target), else KEPT opt-in. Emitted both human-readable and in
     checkpoint_day_report.json (letterbox_verdict: "promote" | "keep").
  D. Reminder notes for the parked measured-rejection re-checks (int8
     encoder linears — scripts/exp_int8_linear.py — only worth re-running
     on a chip generation that actually delivers 2x s8 MXU rate).

`--synthetic` proves the whole DECISION PIPELINE executes end-to-end today
(official-schema random checkpoints + generated dataset trees at toy scale,
shared across phases so the delta math runs on consistent inputs);
tests/test_checkpoint_day.py drives it in CI.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# configs that produce J&F numbers (2 is fps-only: no GT in the clip;
# 5 saves masks and yields J&F only where GT is present)
JF_CONFIGS = ("1_davis2016_bear_xmem_only", "3_davis2017_val_samhq",
              "4_longdataset_consolidation", "5_lvos_val")


def compute_verdict(official: list, letterbox: list, jf_gate: float) -> dict:
    """The promotion decision, pure: per-JF-config deltas, incomplete
    (J&F in exactly one phase -> never promote) and excluded (J&F in
    neither — dataset/GT absent) sets, and the promote/keep verdict.
    Promote ONLY on a complete comparison: >=1 delta, no incomplete
    config, every delta within the gate."""
    off = {r["config"]: r for r in official}
    lb = {r["config"]: r for r in letterbox}
    deltas = {}
    incomplete = []
    for cfg in JF_CONFIGS:
        jo = off.get(cfg, {}).get("JF_mean")
        jl = lb.get(cfg, {}).get("JF_mean")
        if jo is not None and jl is not None:
            deltas[cfg] = round(jl - jo, 4)
        elif jo is not None or jl is not None:
            incomplete.append(cfg)
    excluded = [c for c in JF_CONFIGS if c not in deltas
                and c not in incomplete]
    verdict = ("promote"
               if deltas and not incomplete
               and all(abs(d) <= jf_gate for d in deltas.values())
               else "keep")
    return {"deltas": deltas, "incomplete": incomplete,
            "excluded": excluded, "verdict": verdict}


def _run_phase(out: str, extra: list, platform: str) -> list:
    cmd = [sys.executable, os.path.join(REPO, "run_parity.py"),
           "--out", out, *extra]
    if platform != "default":
        cmd += ["--platform", platform]
    print("$ " + " ".join(cmd), flush=True)
    proc = subprocess.run(cmd)
    if proc.returncode != 0:
        raise SystemExit(f"phase failed (rc={proc.returncode}): {cmd}")
    with open(os.path.join(out, "parity_report.json")) as f:
        return json.load(f)


def main() -> None:
    ap = argparse.ArgumentParser(
        description="one-command checkpoint-day decision pipeline")
    ap.add_argument("--checkpoints", default=None)
    ap.add_argument("--data", default=None)
    ap.add_argument("--synthetic", action="store_true",
                    help="toy-scale end-to-end proof (official-schema "
                         "random checkpoints + synthetic trees)")
    ap.add_argument("--reference_csv", default=None)
    ap.add_argument("--max_videos", type=int, default=None)
    ap.add_argument("--out", default=os.path.join("result", "checkpoint_day"))
    ap.add_argument("--platform", default="default",
                    choices=("default", "cpu"))
    ap.add_argument("--chunk", type=int, default=8,
                    help="chunked fast-path K (8 = the measured v5e optimum)")
    ap.add_argument("--letterbox", default="448x896",
                    help="letterbox gear geometry HxW (448x896 = the "
                         "measured 1.5x gear for 480p)")
    ap.add_argument("--jf_gate", type=float, default=0.2,
                    help="promote the letterbox gear iff every J&F delta "
                         "is within this gate (BASELINE parity target)")
    args = ap.parse_args()
    if not args.synthetic and (not args.checkpoints or not args.data):
        ap.error("--checkpoints and --data are required (or --synthetic)")
    os.makedirs(args.out, exist_ok=True)

    common = ["--chunk", str(args.chunk), "--batch"]
    if args.max_videos is not None:
        common += ["--max_videos", str(args.max_videos)]

    # ---- phase A: official encode, all five configs ---------------------
    a_out = os.path.join(args.out, "official")
    a_extra = list(common)
    if args.checkpoints:
        a_extra += ["--checkpoints", args.checkpoints, "--data", args.data]
    if args.synthetic:
        a_extra += ["--synthetic"]
    if args.reference_csv:
        a_extra += ["--reference_csv", args.reference_csv]
    official = _run_phase(a_out, a_extra, args.platform)

    # phase B must see the SAME artifacts (in synthetic mode phase A
    # generated them under its out dir)
    ck = args.checkpoints or os.path.join(a_out, "synthetic", "checkpoints")
    data = args.data or os.path.join(a_out, "synthetic", "data")

    # ---- phase B: letterbox gear on the J&F-bearing configs -------------
    b_out = os.path.join(args.out, "letterbox")
    b_extra = list(common) + [
        "--checkpoints", ck, "--data", data,
        "--encode", f"letterbox:{args.letterbox}",
        "--configs", "1", "3", "4", "5",
    ]
    if args.synthetic:
        b_extra += ["--synthetic"]
    letterbox = _run_phase(b_out, b_extra, args.platform)

    # ---- phase C: the promotion verdict ---------------------------------
    v = compute_verdict(official, letterbox, args.jf_gate)
    deltas, incomplete = v["deltas"], v["incomplete"]
    excluded, verdict = v["excluded"], v["verdict"]

    report = {
        "official": official,
        "letterbox": letterbox,
        "letterbox_geometry": args.letterbox,
        "letterbox_jf_delta": deltas,
        "letterbox_incomplete": incomplete,
        "letterbox_excluded": excluded,
        "jf_gate": args.jf_gate,
        "letterbox_verdict": verdict,
        "notes": [
            "verdict 'promote': set SAMConfig.encode_letterbox_hw="
            f"({args.letterbox.replace('x', ', ')}) as the default gear "
            "(+~50% fps measured, BENCH letterbox rows); 'keep': leave the "
            "gear opt-in.",
            "parked re-check: int8 encoder linears "
            "(scripts/exp_int8_linear.py) — re-run only on a chip "
            "generation delivering the nominal 2x s8 MXU rate "
            "(BASELINE.md measured-rejection ledger).",
        ],
    }
    path = os.path.join(args.out, "checkpoint_day_report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)

    print("\n===== CHECKPOINT-DAY VERDICT =====")
    for cfg, d in deltas.items():
        print(f"  {cfg:36s} dJ&F(letterbox-official) = {d:+.4f}")
    if not deltas:
        print("  (no J&F-bearing config produced numbers in both phases)")
    for cfg in incomplete:
        print(f"  {cfg:36s} INCOMPLETE: J&F in only one phase — "
              "verdict forced to 'keep'")
    for cfg in excluded:
        print(f"  {cfg:36s} excluded: no J&F in either phase "
              "(dataset/GT absent)")
    print(f"  letterbox gear: **{verdict.upper()}**  (gate ±{args.jf_gate})")
    for n in report["notes"]:
        print(f"  note: {n}")
    print(f"written: {path}")


if __name__ == "__main__":
    main()

"""Results review harness (reference: metricsInspection.ipynb).

Loads ./result/all_tests.csv, sorts runs by J&F-Mean, and diff-compares the
best runs per dataset (cells 1-5 semantics)."""

from __future__ import annotations

import argparse
import os

import pandas as pd


def load_ledger(path: str = "./result/all_tests.csv") -> pd.DataFrame:
    if not os.path.exists(path):
        raise FileNotFoundError(f"no ledger at {path}; run an evaluation first")
    return pd.read_csv(path)


def best_runs(df: pd.DataFrame) -> pd.DataFrame:
    """Best run per (dataset) by JF_mean, plus deltas vs the dataset's
    baseline (lowest-JF run named *baseline* if present)."""
    df = df.sort_values("JF_mean", ascending=False)
    out = []
    for ds, grp in df.groupby("dataset"):
        best = grp.iloc[0].to_dict()
        base = grp[grp["run"].str.contains("baseline", na=False)]
        if len(base):
            b = base.iloc[0]
            best["JF_delta_vs_baseline"] = best["JF_mean"] - b["JF_mean"]
            best["J_delta"] = best["J_mean"] - b["J_mean"]
            best["F_delta"] = best["F_mean"] - b["F_mean"]
        out.append(best)
    return pd.DataFrame(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ledger", default="./result/all_tests.csv")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()
    df = load_ledger(args.ledger)
    print("=== all runs by J&F ===")
    print(df.sort_values("JF_mean", ascending=False).head(args.top).to_string(index=False))
    print("\n=== best per dataset (delta vs baseline) ===")
    print(best_runs(df).to_string(index=False))


if __name__ == "__main__":
    main()

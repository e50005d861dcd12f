"""Compare two log_norms diagnostic jsonl files (good vs bad seed).

Each `kind=phase` record carries per-phase inner/outer losses and the
weight-scale norms (user/item tables, hat/last snapshots, theta). This
prints a period-by-period side-by-side and flags the first period where
the two runs' item/user table norms or losses diverge by more than
--tol relative — i.e. WHERE the bad seed's constant metric offset is
created.

Usage: python scripts/compare_diag.py /tmp/diag_nows2000.jsonl \
           /tmp/diag_nows2001.jsonl
"""

import argparse
import json
import sys


def load(path):
    periods = {}
    with open(path) as fh:
        for line in fh:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("kind") == "phase":
                periods.setdefault(rec["d_time"], []).append(rec)
    return periods


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("--tol", type=float, default=0.10,
                    help="relative divergence to flag")
    args = ap.parse_args()
    A, B = load(args.a), load(args.b)

    fields = ["inner_loss", "outer_loss", "user_norm", "item_norm",
              "theta_norm"]
    first_div = None
    print(f"{'per':>4} {'ph':>3} " + " ".join(
        f"{f+'(A/B)':>26}" for f in fields))
    for p in sorted(set(A) & set(B)):
        for ra, rb in zip(A[p], B[p]):
            row, div = [], []
            for f in fields:
                va, vb = ra.get(f), rb.get(f)
                if va is None or vb is None:
                    row.append(f"{'--':>26}")
                    continue
                rel = abs(va - vb) / max(abs(va), abs(vb), 1e-12)
                mark = "*" if rel > args.tol else " "
                if rel > args.tol:
                    div.append(f)
                row.append(f"{va:>12.4f}/{vb:<12.4f}{mark}")
            print(f"{p:>4} {ra['phase']:>3} " + " ".join(row))
            if div and first_div is None:
                first_div = (p, ra["phase"], div)
    if first_div:
        print(f"\nFIRST DIVERGENCE: period {first_div[0]} phase "
              f"{first_div[1]} fields {first_div[2]}", file=sys.stderr)
    else:
        print("\nno divergence above tol", file=sys.stderr)


if __name__ == "__main__":
    main()

"""Stall-proof program-time metric for a block of warm sweeps
(VERDICT r3 "Next" #7).

The axon tunnel stalls for up to minutes at random, so per-run wall
totals have a multi-x spread that says nothing about the program. Two
robust views over a run block:

  per-run      median(period_seconds) * n_periods  — one number per run;
               robust unless >half of one run's periods stall
  cross-run    sum over periods of median across runs of period i  —
               one number for the block; a stall must hit the SAME
               period in >half the runs to move it

Usage: python scripts/program_time.py <results.json> <key-prefix>
Prints one JSON doc.
"""

import json
import statistics as st
import sys


def main():
    path, prefix = sys.argv[1], sys.argv[2]
    data = json.load(open(path))
    runs = {k: v["period_seconds"] for k, v in sorted(data.items())
            if k.startswith(prefix) and isinstance(v, dict)
            and "period_seconds" in v}
    if not runs:
        sys.exit(f"no keys with prefix {prefix!r} in {path}")
    n_periods = len(next(iter(runs.values())))
    per_run = {k: round(st.median(ps) * len(ps), 1)
               for k, ps in runs.items()}
    cross = [st.median([runs[k][i] for k in runs])
             for i in range(n_periods)]
    vals = sorted(per_run.values())
    out = {
        "runs": len(runs),
        "n_periods": n_periods,
        # period-sum = training span only (NOT process wall; the record's
        # total_seconds is the wall — BASELINE.md label taxonomy)
        "period_sums_s": {k: round(sum(ps), 1) for k, ps in runs.items()},
        "process_walls_s": {k: data[k].get("total_seconds")
                            for k in runs},
        "per_run_program_time_s": per_run,
        "per_run_spread": round(vals[-1] / vals[0], 2),
        "cross_run_program_time_s": round(sum(cross), 1),
        "cross_run_period_median_s": round(st.median(cross), 3),
        "cross_run_period_max_s": round(max(cross), 2),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

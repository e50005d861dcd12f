"""The round-3 parity-denominator table: reference full-sweep seed
distribution at Yelp scale vs ours, on matched metrics.

Reads reference_seed* records (per-period recall lists + test_num) from
the round-1/3 campaign results and reproduces the reference's own
weighted aggregation (transfer.py:991-1025: first 1/3 of test periods =
validation, rest = test, weighted by per-period test count), plus the
mean-per-period number, for every reference run and for the ours groups.
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def weighted(rec, n):
    # the shared aggregation helper (round-split + drop-last,
    # transfer.py:991-1025) — the same function every 'ours' summary uses,
    # so the printed denominator table is on matched metrics (ADVICE r3)
    sys.path.insert(0, REPO)
    from sml_tpu.ops.metrics import weighted_period_average
    val, test = weighted_period_average(rec, n)
    return float(val), float(test)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/yelp_scale_r2/results.json"
    with open(path) as fh:
        d = json.load(fh)
    with open(os.path.join(REPO, "yelp_scale_r1.json")) as fh:
        d1 = json.load(fh)

    print("reference full sweeps (weighted val/test r@20 | mean-pp r@20):")
    rows = []
    for src, data in (("r1", d1), ("r3", d)):
        for k in sorted(data):
            if not k.startswith("reference"):
                continue
            v = data[k]
            if not isinstance(v, dict) or "recall@20" not in v:
                continue
            # round 1's reference_seed7 record predates the test_num field;
            # per-period test counts are a dataset property, identical
            # across seeds, so borrow them from ANY sibling record that
            # has one of matching length (a bare 'reference' key may be
            # absent on a freshly seeded root — ADVICE r3)
            tn = v.get("test_num")
            if not tn:
                want = len(v["recall@20"])
                tn = next((w["test_num"] for w in data.values()
                           if isinstance(w, dict)
                           and len(w.get("test_num") or []) == want), None)
            if not tn:
                print(f"  {src} {k}: skipped (no sibling test_num of "
                      f"length {len(v['recall@20'])})")
                continue
            val, test = weighted(v["recall@20"], tn)
            mp = float(np.mean(v["recall@20"]))
            rows.append((src, k, val, test, mp, v.get("total_seconds")))
            print(f"  {src} {k}: val={val:.4f} test={test:.4f} "
                  f"mean_pp={mp:.4f} ({v.get('total_seconds')}s)")
    tests = [r[3] for r in rows]
    if tests:
        print(f"  -> reference n={len(tests)}: mean {np.mean(tests):.4f} "
              f"std {np.std(tests):.4f} range {min(tests):.4f}-{max(tests):.4f}")

    for name, pref in (("ours unguarded (r2 shapes)", "ours_nows_seed"),
                       ("ours r3 uniform+guard fleet", "ours_r3u_guard_seed")):
        vals = [v["summary"]["test_recall@20"] for k, v in d.items()
                if k.startswith(pref) and isinstance(v, dict)
                and "summary" in v]
        if vals:
            print(f"{name}: n={len(vals)} mean {np.mean(vals):.4f} "
                  f"std {np.std(vals):.4f} "
                  f"range {min(vals):.4f}-{max(vals):.4f}")


if __name__ == "__main__":
    main()

"""Summarize the round-2 Yelp-scale campaigns into `yelp_scale_r2.json`.

Reads <root>/results.json (written by scripts/r2_sweep_campaign.sh,
r2_variance_campaign.sh and r2_ablation_lane.sh) and groups every run by
variant:

  ours_nows   — no theta warm-start (reference-faithful config)
  ours_ws*    — theta identity warm-start variants
  ours_thfix  — theta init frozen, data stream varies   (ablation A)
  ours_strfix — data stream frozen, theta init varies   (ablation B)
  reference*  — the reference driver, run from /root/reference on CPU

The headline statistic is the plain mean of per-period recall@20 across
ALL 10 test periods (all test periods have equal test_num here, so it
equals the reference's test-count-weighted average over every period —
the number BASELINE.md's "0.0589" refers to). The reference-protocol
val/test weighted split (first third validation, transfer.py:991-1025)
is also carried per run.

Usage: python scripts/summarize_r2.py --root /tmp/yelp_scale_r2 \
           --out yelp_scale_r2.json
"""

import argparse
import json
import os
import statistics


def mean10(v):
    pp = v.get("per_period_recall@20") or v.get("recall@20")
    return sum(pp) / len(pp) if pp else None


def group_stats(vals):
    if not vals:
        return None
    return {
        "n": len(vals),
        "mean": round(statistics.mean(vals), 5),
        "stdev": round(statistics.stdev(vals), 5) if len(vals) > 1 else None,
        "min": round(min(vals), 5),
        "max": round(max(vals), 5),
        "values": [round(x, 5) for x in sorted(vals)],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--out", default="yelp_scale_r2.json")
    ap.add_argument("--r1", default="yelp_scale_r1.json",
                    help="round-1 artifact with extra reference/ours runs "
                         "on the same protocol + dataset gen seed")
    args = ap.parse_args()

    with open(os.path.join(args.root, "results.json")) as fh:
        res = json.load(fh)

    def variant(key):
        for pre in ("ours_nows", "ours_ws", "ours_thfix", "ours_strfix",
                    "ours_faithful", "ours_guard3", "ours_guard2",
                    "ours_guard", "reference"):
            if key.startswith(pre):
                return pre
        return None

    groups, runs = {}, {}
    for k, v in res.items():
        g = variant(k)
        if g is None:
            continue
        m = mean10(v)
        if m is None:
            continue
        groups.setdefault(g, []).append(m)
        runs[k] = {
            "mean10_recall@20": round(m, 5),
            "total_seconds": v.get("total_seconds"),
            "saddle_retries_used": v.get("saddle_retries_used"),
            "weighted_test_recall@20":
                (v.get("summary") or {}).get("test_recall@20"),
            "per_period_recall@20":
                v.get("per_period_recall@20") or v.get("recall@20"),
        }

    # Guard-on fleet composite over the 16 nows seeds: where a guard3 run
    # exists the guard triggered and its value applies; everywhere else the
    # guard is untriggered and bitwise inert (tests/test_saddle_guard.py),
    # so the nows value IS the guard-on value.
    guard3_by_seed = {k.rsplit("seed", 1)[-1]: mean10(v)
                      for k, v in res.items()
                      if k.startswith("ours_guard3_") and mean10(v)}
    fleet = []
    for k, v in res.items():
        if not k.startswith("ours_nows_seed"):
            continue
        seed = k.rsplit("seed", 1)[-1]
        m = guard3_by_seed.get(seed) or mean10(v)
        if m:
            fleet.append(m)
    if fleet:
        groups["ours_guard_on_fleet"] = fleet

    # Period-0 probe stall classification (outer-loss thresholds from
    # scripts/period0_probe.py: final <=1.04 good, >=1.11 bad).
    probes = {}
    for k, v in res.items():
        if not k.startswith("probe_"):
            continue
        side = "reference" if "reference" in k else "ours"
        final = v["outer_loss"][-1]
        cls = "good" if final <= 1.04 else ("bad" if final >= 1.11 else "mid")
        probes.setdefault(side, []).append(
            {"seed": v.get("seed"), "outer_final": final, "class": cls})
    probe_summary = {
        side: {
            "n": len(rows),
            "bad": sum(r["class"] == "bad" for r in rows),
            "mid": sum(r["class"] == "mid" for r in rows),
            "rows": sorted(rows, key=lambda r: r["seed"]),
        } for side, rows in probes.items()}

    out = {
        "protocol": {"periods": 40, "train_start": 10, "test_start": 30,
                     "neg": 999, "multi_num": 10, "latent": 64,
                     "metric": "mean per-period recall@20 over the 10 test "
                               "periods (equal test_num => equals the "
                               "weighted all-period average)"},
        "dataset": res.get("dataset"),
        "pretrain": res.get("pretrain"),
        "groups": {g: group_stats(vals) for g, vals in sorted(groups.items())},
        "period0_probes": probe_summary,
        "runs": runs,
    }

    if os.path.exists(args.r1):
        with open(args.r1) as fh:
            r1 = json.load(fh)
        r1_ref = [mean10(v) for k, v in r1.items()
                  if k.startswith("reference")]
        r1_ours = [mean10(v) for k, v in r1.items() if k == "ours"]
        r1_ours += [sum(pp) / len(pp)
                    for pp in r1.get("ours_extra_seeds", {}).values()]
        out["round1_same_protocol"] = {
            "note": "same gen seed + protocol, earlier harness revision "
                    "(neg_tries=8, pre-hoist); reference CPU wall-clocks "
                    "7036-7334 s",
            "reference_mean10": group_stats([x for x in r1_ref if x]),
            "ours_mean10": group_stats([x for x in r1_ours if x]),
        }

    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["groups"], indent=1))


if __name__ == "__main__":
    main()

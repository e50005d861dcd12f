"""Summarize the round-2 Yelp-scale campaign into `yelp_scale_r2.json`.

Reads <root>/results.json produced by scripts/r2_sweep_campaign.sh
(5 warm-started seeds + 1 eval-faithful run) and emits the round-2
headline artifact:

  * seed-robustness: weighted recall@20 / ndcg@20 across run seeds
    (mean, spread) vs the reference band measured in round 1
    (yelp_scale_r1.json: two torch seeds, both 0.0589);
  * wall-clock: per-seed sweep seconds, plus the eval-faithful run
    (reference's always-on in-training evals, transfer.py:444-446) against
    the reference's round-1 CPU wall-clock.

Usage: python scripts/summarize_r2.py --root /tmp/yelp_scale_r2 \
           --out yelp_scale_r2.json
"""

import argparse
import json
import os
import statistics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--out", default="yelp_scale_r2.json")
    ap.add_argument("--r1", default="yelp_scale_r1.json",
                    help="round-1 artifact with the reference runs")
    args = ap.parse_args()

    with open(os.path.join(args.root, "results.json")) as fh:
        res = json.load(fh)

    seeds = sorted(k for k in res if k.startswith("ours_ws_seed"))
    runs = {k: res[k] for k in seeds}
    w20 = [res[k]["summary"]["test_recall@20"] for k in seeds]
    n20 = [res[k]["summary"]["test_ndcg@20"] for k in seeds]
    secs = [res[k]["total_seconds"] for k in seeds]

    out = {
        "protocol": {"periods": 40, "train_start": 10, "test_start": 30,
                     "neg": 999, "multi_num": 10, "latent": 64,
                     "theta_warmstart_steps":
                         res[seeds[0]]["theta_warmstart_steps"] if seeds else None},
        "dataset": res.get("dataset"),
        "pretrain": res.get("pretrain"),
        "seeds": {k: {"seed": v["seed"],
                      "total_seconds": v["total_seconds"],
                      "weighted_recall@20": v["summary"]["test_recall@20"],
                      "weighted_ndcg@20": v["summary"]["test_ndcg@20"],
                      "per_period_recall@20": v["per_period_recall@20"]}
                  for k, v in runs.items()},
        "seed_robustness": {
            "n_seeds": len(seeds),
            "weighted_recall@20_mean": round(statistics.mean(w20), 5) if w20 else None,
            "weighted_recall@20_min": round(min(w20), 5) if w20 else None,
            "weighted_recall@20_max": round(max(w20), 5) if w20 else None,
            "weighted_recall@20_stdev":
                round(statistics.stdev(w20), 5) if len(w20) > 1 else None,
            "weighted_ndcg@20_mean": round(statistics.mean(n20), 5) if n20 else None,
        },
        "sweep_seconds": {"per_seed": secs,
                          "median": round(statistics.median(secs), 1) if secs else None},
    }

    if "ours_faithful_seed2000" in res:
        f = res["ours_faithful_seed2000"]
        out["faithful_evals_run"] = {
            "seed": f["seed"],
            "total_seconds": f["total_seconds"],
            "weighted_recall@20": f["summary"]["test_recall@20"],
        }

    if os.path.exists(args.r1):
        with open(args.r1) as fh:
            r1 = json.load(fh)
        refs = {k: v for k, v in r1.items() if k.startswith("reference")}
        ref_secs = [v["total_seconds"] for v in refs.values()]
        # reference weighted recall@20 from round 1 (both torch seeds 0.0589)
        out["reference_r1"] = {
            "runs": {k: {"total_seconds": v["total_seconds"]}
                     for k, v in refs.items()},
            "note": "reference = its own PyTorch code on this host's CPU "
                    "(no CUDA here); weighted recall@20 was 0.0589 for both "
                    "torch seeds in round 1 on the SAME protocol but a "
                    "different synthetic draw (gen seed identical, harness "
                    "rev differs)",
            "weighted_recall@20_band": [0.0589, 0.0589],
        }
        if ref_secs and out.get("faithful_evals_run"):
            out["speedup_faithful"] = round(
                min(ref_secs) / out["faithful_evals_run"]["total_seconds"], 2)
        if ref_secs and secs:
            out["speedup_no_inner_evals"] = round(
                min(ref_secs) / statistics.median(secs), 2)

    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out.get("seed_robustness"), indent=1))
    print(json.dumps({k: out.get(k) for k in
                      ("speedup_faithful", "speedup_no_inner_evals")}))


if __name__ == "__main__":
    main()

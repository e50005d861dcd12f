"""Aggregate the round-5 headline numbers into summary_r5.json.

Reads only repo-committed artifacts so the summary is reproducible:
yelp_scale_r3.json, adressa_r3.json, bench_r5_check.json,
roofline_r5.json, eval_kernel_probe2_r5*.json, serving_probe_r5.json.
"""

import json
import os
import statistics as st
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(name):
    with open(os.path.join(REPO, name)) as fh:
        return json.load(fh)


def lane(d, prefix):
    runs = {k: v for k, v in d.items()
            if k.startswith(prefix) and isinstance(v, dict)
            and "period_seconds" in v}
    walls = sorted(v["total_seconds"] for v in runs.values())
    psums = sorted(round(sum(v["period_seconds"]), 1)
                   for v in runs.values())
    r20 = sorted({round(v["summary"]["test_recall@20"], 5)
                  for v in runs.values()})
    n_periods = len(next(iter(runs.values()))["period_seconds"])
    cross = round(sum(
        st.median([v["period_seconds"][i] for v in runs.values()])
        for i in range(n_periods)), 1)
    per_run = sorted(round(st.median(v["period_seconds"]) * n_periods, 1)
                     for v in runs.values())
    return {"n": len(runs), "process_walls_s": walls,
            "period_sums_s": psums, "per_run_program_time_s": per_run,
            "cross_run_program_time_s": cross,
            "test_recall20_values": r20}


def main():
    y = load("yelp_scale_r3.json")
    a = load("adressa_r3.json")
    bench = load("bench_r5_check.json")
    roof = load("roofline_r5.json")
    k2 = load("eval_kernel_probe2_r5.json")
    serve = load("serving_probe_r5.json")

    out = {
        "bench_validation": bench,
        "yelp_blocks": {
            "fused_warm": lane(y, "perf_r5_fused_warm_"),
            "unfused_warm": lane(y, "perf_r5_unfused_warm_"),
            "evals_off_warm": lane(y, "perf_r5_nows_warm_"),
            "auto_cold_wall_s": y["perf_r5_auto_cold"]["total_seconds"],
            "fused_first_compile_wall_s":
                y["perf_r5_fused_compile"]["total_seconds"],
            "auto_warmfused_wall_s":
                y["perf_r5_auto_warmfused"]["total_seconds"],
            "reference_full_sweep_s": [6991.0, 7036.0, 7334.0],
        },
        "adressa_blocks": {
            "fused_warm": lane(a, "aperf_r5_fused_warm_"),
            "unfused_warm": lane(a, "aperf_r5_unfused_warm_"),
            "reference_full_sweep_s": sorted(
                a[k]["total_seconds"] for k in a
                if k.startswith("reference_seed")),
        },
        "eval_kernel": {
            "blocking_ms": k2["blocking"]["best_ms_per_call"],
            "device_ms": k2["scanned"]["best_ms_per_call"],
            "device_rows_per_s": k2["scanned"]["rows_per_s"],
            "evaluator_masked_device_rows_per_s":
                roof["eval"]["items_20000"]["masked"]["device_rows_per_s"],
        },
        "serving_topk": {
            shape: {m: v for m, v in r.items()
                    if m.startswith("recall_") or
                    (isinstance(v, dict) and "users_per_s" in v)}
            for shape, r in serve["shapes"].items()
        },
        "accuracy_fleets_r5": {
            "yelp_guard_n12": sorted(round(
                y[f"ours_r5_guard_seed{s}"]["summary"]["test_recall@20"], 5)
                for s in range(2001, 2013) if f"ours_r5_guard_seed{s}" in y),
            "news_guard_n6": sorted(round(
                a[f"ours_r5_aguard_seed{s}"]["summary"]["test_recall@20"], 5)
                for s in range(2001, 2007) if f"ours_r5_aguard_seed{s}" in a),
            "news_reference": sorted(round(
                a[k]["summary"]["test_recall@20"], 5) for k in a
                if k.startswith("reference_seed")),
        },
        "baselines_yelp_scale": {
            m: {"ours_r5": {"wall_s": y[f"ours_baseline_{m}_r5"]
                            ["total_seconds"],
                            "test_recall20": y[f"ours_baseline_{m}_r5"]
                            ["summary"]["test_recall@20"]},
                "reference": {"wall_s": y[f"ref_baseline_{m}"]
                              ["total_seconds"],
                              "test_recall20": y[f"ref_baseline_{m}"]
                              ["summary"]["test_recall@20"]}}
            for m in ("full", "fine", "spmf")
        },
        "baselines_news": {
            m: {"ours": {"wall_s": a["baselines"][m]["seconds"],
                         "test_recall20": a["baselines"][m]["summary"]
                         ["test_recall@20"]},
                "reference": {"wall_s": a[f"ref_baseline_{m}"]
                              ["total_seconds"],
                              "test_recall20": a[f"ref_baseline_{m}"]
                              ["summary"]["test_recall@20"]}}
            for m in ("full", "fine", "spmf")
        },
    }
    path = os.path.join(REPO, "summary_r5.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}", file=sys.stderr)
    print(json.dumps({"yelp_fused_walls":
                      out["yelp_blocks"]["fused_warm"]["process_walls_s"],
                      "news_ref_range":
                      out["adressa_blocks"]["reference_full_sweep_s"]}))


if __name__ == "__main__":
    main()

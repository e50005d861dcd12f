"""Full sequential-retraining sweep benchmark at Yelp scale.

Generates an in-memory Yelp-shaped workload (default: 100k users / 20k
items / d=64, ~120k interactions per period, 999-neg eval rows for the test
span), runs the COMPLETE SML protocol (multi_num=10, MF_epochs=1,
TR_epochs=1 — the reference README command) over all periods on the current
JAX backend, and reports per-period wall-clock plus the final weighted
metrics — the BASELINE.md "full sweep" measurement.

Usage: python scripts/bench_sweep.py [--periods 12] [--test-start 8]
       [--users 100000] [--items 20000] [--inter 120000] [--out sweep.json]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=100_000)
    ap.add_argument("--items", type=int, default=20_000)
    ap.add_argument("--inter", type=int, default=120_000)
    ap.add_argument("--periods", type=int, default=12)
    ap.add_argument("--train-start", type=int, default=4)
    ap.add_argument("--test-start", type=int, default=8)
    ap.add_argument("--neg-num", type=int, default=999)
    ap.add_argument("--eval-rows-per-period", type=int, default=20_000)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from sml_tpu.config import DataSpec, SMLConfig
    from sml_tpu.data.formats import DatasetInfo, write_dataset
    from sml_tpu.data.native import build_eval_rows_native
    from sml_tpu.train.driver import SMLDriver
    from sml_tpu.train.engine import SMLEngine

    rng = np.random.default_rng(0)
    t0 = time.time()
    periods = []
    for p in range(args.periods):
        users = rng.integers(0, args.users, args.inter)
        items = (rng.pareto(1.2, args.inter) * 50).astype(np.int64) % args.items
        periods.append(np.unique(np.stack([users, items], 1), axis=0))

    test_files = {}
    catalog = np.arange(args.items, dtype=np.int64)
    for p in range(args.train_start, args.periods):
        hist = np.concatenate(periods[:p + 1], axis=0)
        rows = periods[p][:args.eval_rows_per_period]
        ev = build_eval_rows_native(rows, hist, catalog, args.neg_num, seed=p)
        if ev is None:
            raise RuntimeError("native builder required for this benchmark")
        test_files[p] = ev
    print(f"workload built in {time.time() - t0:.1f}s "
          f"({sum(p.shape[0] for p in periods):,} interactions)",
          file=sys.stderr, flush=True)

    root = tempfile.mkdtemp(prefix="sweep_")
    info = DatasetInfo(sum(p.shape[0] for p in periods), args.users,
                       args.items)
    write_dataset(os.path.join(root, "synth"), periods, test_files, info)
    spec = DataSpec(root=root, name="synth", num_periods=args.periods,
                    online_train_start=args.train_start,
                    online_test_start=args.test_start,
                    eval_neg_num=args.neg_num)

    cfg = SMLConfig()   # reference yelp defaults: multi 10 / 1 / 1, 'all'
    engine = SMLEngine(cfg, args.users, args.items)
    driver = SMLDriver(cfg, spec, engine=engine)
    state = engine.init_state()

    t0 = time.time()
    report = driver.run(state)
    total = time.time() - t0
    result = {
        "periods_run": len(report.period_seconds),
        "per_period_seconds": [round(s, 2) for s in report.period_seconds],
        "total_seconds": round(total, 2),
        "summary": report.summary(),
    }
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh)


if __name__ == "__main__":
    main()

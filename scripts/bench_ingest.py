"""End-to-end ingest benchmark at production log size (>= 10M events).

Measures the raw-log -> dataset-directory path (VERDICT r1 item 7):

  1. synthesize a (user, item, timestamp) CSV log of --events rows,
  2. `ingest_csv`: native C++ parse -> densify (vectorized) -> period split
     -> negative attachment (native sampler) -> write period files.

Reports events/s for the core path and for each stage. Runs entirely on
CPU (no TPU contention); results go to stdout as one JSON line.

Usage:
    python scripts/bench_ingest.py --events 10_000_000 --out bench_ingest.json
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def synth_log(path: str, n: int, n_users: int, n_items: int, seed: int = 7):
    """Zipf-ish raw log with non-contiguous ids, written as CSV."""
    rng = np.random.default_rng(seed)
    # raw ids are sparse (multiplied) to exercise densification
    users = rng.zipf(1.3, size=n) % n_users * 17 + 3
    items = rng.zipf(1.2, size=n) % n_items * 23 + 5
    times = np.sort(rng.integers(1_500_000_000, 1_600_000_000, size=n))
    t0 = time.time()
    arr = np.stack([users, items, times], axis=1)
    # benchmark SETUP only (not measured): np.savetxt is slow but simple
    with open(path, "w") as fh:
        fh.write("user,item,ts\n")
        np.savetxt(fh, arr, fmt="%d", delimiter=",")
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=10_000_000)
    ap.add_argument("--users", type=int, default=1_000_000)
    ap.add_argument("--items", type=int, default=200_000)
    ap.add_argument("--periods", type=int, default=40)
    ap.add_argument("--first-test", type=int, default=39)
    ap.add_argument("--neg", type=int, default=999)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from sml_tpu.data.ingest import IngestSpec, densify_ids, ingest_csv

    work = tempfile.mkdtemp(prefix="bench_ingest_")
    csv_path = os.path.join(work, "log.csv")
    log(f"writing synthetic log ({args.events} events)...")
    gen_s = synth_log(csv_path, args.events, args.users, args.items)
    log(f"log written in {gen_s:.1f}s "
        f"({os.path.getsize(csv_path) / 1e6:.0f} MB)")

    # stage timing: densify alone (the r1 hot spot)
    rng = np.random.default_rng(3)
    sample = rng.integers(0, 10_000_000, size=args.events) * 13
    t0 = time.time()
    densify_ids(sample)
    densify_s = time.time() - t0
    del sample

    spec = IngestSpec(n_periods=args.periods,
                      first_test_period=args.first_test, neg_num=args.neg)
    out_dir = os.path.join(work, "ds")
    t0 = time.time()
    info = ingest_csv(csv_path, out_dir, spec)
    total_s = time.time() - t0
    log(f"ingest done in {total_s:.1f}s: {info}")

    result = {
        "metric": "ingest_events_per_s",
        "value": round(args.events / total_s),
        "unit": "events/s",
        "events": args.events,
        "n_users": info.n_users,
        "n_items": info.n_items,
        "neg_num": args.neg,
        "test_rows": args.events // args.periods
        * (args.periods - args.first_test),
        "densify_10M_seconds": round(densify_s, 2),
        "end_to_end_seconds": round(total_s, 1),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=2)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Head-to-head: SML vs full-retrain vs fine-tune vs SPMF.

Reproduces the paper's comparison protocol end to end on a synthetic
drifting dataset: one shared pretrained base, then each method runs the
same sequential test span and reports the weighted recall/NDCG protocol.
Writes a JSON artifact.

Usage: python scripts/compare_methods.py [--out compare.json] [--platform cpu]
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
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--users", type=int, default=2000)
    ap.add_argument("--items", type=int, default=1000)
    ap.add_argument("--periods", type=int, default=12)
    ap.add_argument("--inter", type=int, default=6000)
    ap.add_argument("--drift", type=float, default=0.08)
    ap.add_argument("--drift-mode", default="rotate",
                    choices=["random", "rotate"])
    ap.add_argument("--neg-num", type=int, default=199)
    ap.add_argument("--latent", type=int, default=32)
    ap.add_argument("--fc-hidden", type=int, default=512)
    ap.add_argument("--first-test", type=int, default=None)
    ap.add_argument("--test-start", type=int, default=None)
    ap.add_argument("--multi-num", type=int, default=10)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from sml_tpu.config import (BaselineConfig, DataSpec, PretrainConfig,
                                SMLConfig, TransferConfig)
    from sml_tpu.data.synthetic import SyntheticSpec, generate_synthetic_dataset
    from sml_tpu.train.baselines import BaselineDriver
    from sml_tpu.train.driver import SMLDriver
    from sml_tpu.train.engine import SMLEngine
    from sml_tpu.train.pretrain import pretrain_mf

    root = tempfile.mkdtemp(prefix="cmp_")
    first_test = args.first_test if args.first_test is not None \
        else args.periods // 3
    test_start = args.test_start if args.test_start is not None \
        else 2 * args.periods // 3
    spec = SyntheticSpec(n_users=args.users, n_items=args.items,
                         n_periods=args.periods,
                         interactions_per_period=args.inter,
                         first_test_period=first_test,
                         neg_num=args.neg_num, drift=args.drift,
                         drift_mode=args.drift_mode, seed=3)
    info = generate_synthetic_dataset(os.path.join(root, "synth"), spec)
    dspec = DataSpec(root=root, name="synth", num_periods=args.periods,
                     online_train_start=first_test,
                     online_test_start=test_start,
                     eval_neg_num=args.neg_num)
    print(f"dataset: {info}", file=sys.stderr, flush=True)

    pcfg = PretrainConfig(max_epochs=120, eval_every=2, patience=10,
                          batch_size=256, latent_dim=args.latent,
                          emb_init_scale=0.1)
    t0 = time.time()
    pre, pre_metrics = pretrain_mf(pcfg, dspec,
                                   pretrain_period=test_start - 1)
    print(f"pretrain {time.time()-t0:.0f}s: "
          f"{ {k: round(v, 4) for k, v in pre_metrics.items()} }",
          file=sys.stderr, flush=True)

    results = {"pretrain": pre_metrics}

    # ---- SML
    cfg = SMLConfig(multi_num=args.multi_num, mf_epochs=1, tr_epochs=1,
                    latent_dim=args.latent,
                    transfer=TransferConfig(latent_dim=args.latent,
                                            fc_hidden=args.fc_hidden),
                    mf_batch_size=1024, tr_batch_size=256,
                    mf_sample="all", tr_sample_type="alone")
    engine = SMLEngine(cfg, info.n_users, info.n_items)
    driver = SMLDriver(cfg, dspec, engine=engine)
    t0 = time.time()
    report = driver.run(engine.init_state(pretrained_mf=pre))
    results["sml"] = {**report.summary(), "seconds": time.time() - t0,
                      "per_period_recall@5": report.per_period[5]}
    print(f"sml: {results['sml']['test_recall@5']:.4f} recall@5",
          file=sys.stderr, flush=True)

    # ---- baselines (same weighting protocol as their reference driver)
    for method in ("full", "fine", "spmf"):
        bcfg = BaselineConfig(method=method, epochs=5, batch_size=256,
                              lr=0.01, latent_dim=args.latent,
                              start_period=test_start,
                              pool_size=3000 if method == "spmf" else 0)
        bdriver = BaselineDriver(bcfg, dspec, pretrained=pre)
        t0 = time.time()
        summary = bdriver.run()
        results[method] = {**summary, "seconds": time.time() - t0}
        print(f"{method}: {summary.get('test_recall@5', float('nan')):.4f} "
              f"recall@5", file=sys.stderr, flush=True)

    print(json.dumps(results, indent=2, default=float))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=2, default=float)


if __name__ == "__main__":
    main()

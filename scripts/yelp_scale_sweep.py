"""Full Yelp-scale SML sweep: our TPU driver vs the reference driver on CPU.

Measures the BASELINE.md wall-clock target (>=5x speedup on the full
sequential sweep) at the reference's protocol shape: 40 periods, online
training from period 10, online testing 30-39, 999 eval negatives, d=64,
multi_num=10, MF/TR 1 epoch — on a synthetic dataset of Yelp-like size
(defaults: 31k users / 21k items / 30k interactions per period ~= 1.2M).

Phased so the two drivers can run concurrently in separate processes
(reference on CPU, ours on the TPU):

    python scripts/yelp_scale_sweep.py --phase gen --root /tmp/yelp_scale
    python scripts/yelp_scale_sweep.py --phase pretrain --root /tmp/yelp_scale
    python scripts/yelp_scale_sweep.py --phase ours --root /tmp/yelp_scale
    python scripts/yelp_scale_sweep.py --phase reference --platform cpu \
        --root /tmp/yelp_scale

Each phase appends its result to <root>/results.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PERIODS = 40
TRAIN_START = 10
TEST_START = 30
NEG = 999
MULTI = 10
LATENT = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def record(root, key, value):
    """Merge one phase's result into results.json (locked: phases run as
    concurrent processes)."""
    from sml_tpu.utils.results import record as _rec
    _rec(os.path.join(root, "results.json"), key, value)
    log(f"recorded {key}")


def dspec_for(root):
    from sml_tpu.config import DataSpec
    return DataSpec(root=root, name="synth", num_periods=N_PERIODS,
                    online_train_start=TRAIN_START,
                    online_test_start=TEST_START, eval_neg_num=NEG)


def load_pre(root):
    from sml_tpu.models.mf import MFParams
    import jax.numpy as jnp
    blob = np.load(os.path.join(root, "pre.npz"))
    return MFParams(user_emb=jnp.asarray(blob["user_emb"]),
                    item_emb=jnp.asarray(blob["item_emb"]),
                    user_bias=jnp.asarray(blob["user_bias"]),
                    item_bias=jnp.asarray(blob["item_bias"]))


def phase_gen(args):
    from sml_tpu.data.synthetic import SyntheticSpec, generate_synthetic_dataset
    t0 = time.time()
    spec = SyntheticSpec(n_users=args.users, n_items=args.items,
                         n_periods=N_PERIODS,
                         interactions_per_period=args.inter,
                         first_test_period=TRAIN_START, neg_num=NEG,
                         latent_dim=8, drift=0.05, seed=17)
    info = generate_synthetic_dataset(os.path.join(args.root, "synth"), spec)
    record(args.root, "dataset",
           {"n_users": info.n_users, "n_items": info.n_items,
            "n_interactions": info.n_interactions,
            "gen_seconds": round(time.time() - t0, 1)})


def phase_pretrain(args):
    from sml_tpu.config import PretrainConfig
    from sml_tpu.train.pretrain import pretrain_mf
    t0 = time.time()
    pcfg = PretrainConfig(max_epochs=60, eval_every=2, patience=8,
                          batch_size=1024, latent_dim=LATENT,
                          emb_init_scale=0.1)
    params, metrics = pretrain_mf(pcfg, dspec_for(args.root),
                                  pretrain_period=TEST_START - 1)
    np.savez(os.path.join(args.root, "pre.npz"),
             user_emb=np.asarray(params.user_emb),
             item_emb=np.asarray(params.item_emb),
             user_bias=np.asarray(params.user_bias),
             item_bias=np.asarray(params.item_bias))
    record(args.root, "pretrain",
           {**{k: round(v, 4) for k, v in metrics.items()},
            "seconds": round(time.time() - t0, 1)})


def phase_ours(args):
    import jax
    # persistent XLA compile cache shared across seed runs: one cold run
    # compiles the sweep's shape buckets; every later run loads them.
    # One shared helper owns the env var / 'off' sentinel / threshold.
    from sml_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(log=lambda m: log(m))
    from sml_tpu.config import SMLConfig, TransferConfig
    from sml_tpu.train.driver import SMLDriver
    from sml_tpu.utils.logging import MetricsLogger

    cfg = SMLConfig(multi_num=MULTI, mf_epochs=1, tr_epochs=1,
                    latent_dim=LATENT,
                    transfer=TransferConfig(latent_dim=LATENT),
                    mf_batch_size=1024, tr_batch_size=256,
                    eval_batch_size=1024, mf_sample="all",
                    tr_sample_type="alone", seed=args.seed,
                    eval_during_inner=args.evals, eval_during_outer=args.evals,
                    log_norms=bool(args.log),
                    theta_warmstart_steps=args.warmstart,
                    theta_seed=args.theta_seed,
                    saddle_retries=args.saddle_retries,
                    uniform_shapes=not args.per_period_shapes,
                    upload_dedup=not args.no_upload_dedup,
                    fuse_period={"auto": "auto", "on": True,
                                 "off": False}[args.fuse_period])
    dspec = dspec_for(args.root)
    logger = MetricsLogger(args.log) if args.log else None
    driver = SMLDriver(cfg, dspec, logger=logger)
    params = load_pre(args.root)
    state = driver.engine.init_state(pretrained_mf=params)
    t0 = time.time()
    report = driver.run(state)
    total = time.time() - t0
    record(args.root, args.key or "ours", {
        "backend": jax.default_backend(),
        "seed": args.seed,
        "evals_during_train": args.evals,
        "theta_warmstart_steps": args.warmstart,
        "total_seconds": round(total, 1),
        "saddle_retries_used": report.saddle_retries_used,
        "period_seconds": [round(s, 2) for s in report.period_seconds],
        "summary": {k: round(v, 5) for k, v in report.summary().items()},
        "per_period_recall@20":
            [round(v, 4) for v in report.per_period.get(20, [])],
    })


def _load_pvr():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "pvr", os.path.join(REPO, "scripts", "parity_vs_reference.py"))
    pvr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pvr)
    pvr.set_protocol(n_periods=N_PERIODS, train_start=TRAIN_START,
                     test_start=TEST_START, neg=NEG, multi=MULTI,
                     latent=LATENT)
    return pvr


def _weighted(values, counts, drop_last):
    from sml_tpu.ops.metrics import weighted_period_average
    val, test = weighted_period_average(values, counts,
                                        drop_last_test=drop_last)
    return round(float(val), 5), round(float(test), 5)


def phase_ref_baseline(args):
    """Reference full/fine/spmf at Yelp scale (VERDICT r3 "Next" #5): the
    paper's SML>baselines ordering, reproduced by the REFERENCE driver on
    the shared scaled dataset. Protocol (documented, matched on both
    sides): epochs via --epochs (full uses fewer — it trains on ALL
    history every stage and 20 reference-default epochs would be ~60 h
    single-core), batch 256, lr 0.01, l2 1e-5, start period 30.
    Aggregation: baseline protocol keeps the last period
    (baseline.py:546 slices [N3:], unlike transfer.py:994's [N3:-1])."""
    pvr = _load_pvr()
    params = load_pre(args.root)
    t0 = time.time()
    ref = pvr.run_reference_baseline(
        args.root, params, args.method, seed=args.seed, epochs=args.epochs,
        pool=args.pool if args.method == "spmf" else 0, numworkers=0)
    total = time.time() - t0
    val20, test20 = _weighted(ref["recall@20"], ref["test_num"],
                              drop_last=False)
    record(args.root, args.key or f"ref_baseline_{args.method}", {
        "seed": args.seed, "method": args.method, "epochs": args.epochs,
        "pool": args.pool if args.method == "spmf" else 0,
        "total_seconds": round(total, 1),
        "summary": {"val_recall@20": val20, "test_recall@20": test20},
        "recall@20": [round(v, 4) for v in ref["recall@20"]],
        "recall@5": [round(v, 4) for v in ref["recall@5"]],
        "ndcg@20": [round(v, 4) for v in ref["ndcg@20"]],
        "test_num": ref["test_num"],
    })


def phase_baseline(args):
    """Ours-side full/fine/spmf at Yelp scale, matched to phase_ref_baseline."""
    from sml_tpu.config import BaselineConfig
    from sml_tpu.train.baselines import BaselineDriver
    from sml_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(log=lambda m: log(m))

    cfg = BaselineConfig(method=args.method, lr=0.01, l2_user=1e-5,
                         l2_item=1e-5, epochs=args.epochs, batch_size=256,
                         pool_size=args.pool if args.method == "spmf" else 0,
                         pool_init_type=0, start_period=TEST_START,
                         latent_dim=LATENT, eval_batch_size=1024,
                         seed=args.seed)
    driver = BaselineDriver(cfg, dspec_for(args.root),
                            pretrained=load_pre(args.root))
    t0 = time.time()
    summary = driver.run()
    total = time.time() - t0
    rec = np.asarray(driver.recall, dtype=float)
    counts = driver.test_counts
    val20, test20 = _weighted(rec[:, 2], counts, drop_last=False)
    record(args.root, args.key or f"ours_baseline_{args.method}", {
        "seed": args.seed, "method": args.method, "epochs": args.epochs,
        "pool": args.pool if args.method == "spmf" else 0,
        "total_seconds": round(total, 1),
        "summary": {"val_recall@20": val20, "test_recall@20": test20,
                    **{k: round(v, 5) for k, v in summary.items()}},
        "recall@20": [round(v, 4) for v in rec[:, 2]],
        "recall@5": [round(v, 4) for v in rec[:, 0]],
        "test_num": counts,
    })


def phase_reference(args):
    pvr = _load_pvr()
    params = load_pre(args.root)
    t0 = time.time()
    ref = pvr.run_reference(args.root, params, ref_seed=args.seed,
                            ckpt_path=args.ckpt)
    total = ref.pop("train_seconds_banked", None) or (time.time() - t0)
    record(args.root, args.key or "reference", {
        "seed": args.seed,
        "total_seconds": round(total, 1),
        "recall@20": [round(v, 4) for v in ref["recall@20"]],
        "recall@5": [round(v, 4) for v in ref["recall@5"]],
        "ndcg@20": [round(v, 4) for v in ref["ndcg@20"]],
        "test_num": ref["test_num"],
    })


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", required=True,
                    choices=["gen", "pretrain", "ours", "reference",
                             "baseline", "ref-baseline"])
    ap.add_argument("--method", default="fine",
                    help="baseline phases: full | fine | spmf")
    ap.add_argument("--epochs", type=int, default=10,
                    help="baseline phases: epochs per period")
    ap.add_argument("--pool", type=int, default=30_000,
                    help="baseline phases: spmf reservoir size")
    ap.add_argument("--root", required=True)
    ap.add_argument("--users", type=int, default=31_000)
    ap.add_argument("--items", type=int, default=21_000)
    ap.add_argument("--inter", type=int, default=30_000)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--seed", type=int, default=2000)
    ap.add_argument("--key", default=None,
                    help="results.json key (default: the phase name)")
    ap.add_argument("--ckpt", default=None,
                    help="reference: period-boundary checkpoint file; the "
                         "sweep resumes from it if present (a resumed sweep "
                         "is bit-identical to an uninterrupted one)")
    ap.add_argument("--evals", action="store_true",
                    help="ours: run the reference's always-on in-training "
                         "evals (wall-clock-faithful mode)")
    ap.add_argument("--log", default=None,
                    help="ours: jsonl diagnostics path (enables log_norms)")
    ap.add_argument("--warmstart", type=int, default=0,
                    help="ours: theta_warmstart_steps (saddle stabilizer)")
    ap.add_argument("--saddle-retries", type=int, default=0,
                    help="ours: SMLConfig.saddle_retries (first-period "
                         "bad-stream guard)")
    ap.add_argument("--theta-seed", type=int, default=None,
                    help="ours: freeze theta init to this seed while "
                         "--seed varies the data stream (variance "
                         "ablation)")
    ap.add_argument("--fuse-period", default="auto",
                    choices=["auto", "on", "off"],
                    help="one-dispatch periods (auto = only when this "
                         "config's program is already compile-cached)")
    ap.add_argument("--per-period-shapes", action="store_true",
                    help="ours: disable uniform sweep-wide shape buckets "
                         "(round-2 per-period bucketing, for A/B timing)")
    ap.add_argument("--no-upload-dedup", action="store_true",
                    help="ours: disable the content-keyed device-upload "
                         "LRU (round-2 behavior, for A/B timing)")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    os.makedirs(args.root, exist_ok=True)
    {"gen": phase_gen, "pretrain": phase_pretrain,
     "ours": phase_ours, "reference": phase_reference,
     "baseline": phase_baseline,
     "ref-baseline": phase_ref_baseline}[args.phase](args)


if __name__ == "__main__":
    main()

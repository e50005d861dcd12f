"""Adressa ("news") protocol end-to-end: SML + all three baselines.

Runs the full news protocol shape (reference ``main_news.py:221-227``,
``model/baseline.py:624-625``): 63 periods, online training from 21, online
test 48-62, MF_epochs=2 / TR_epochs=2 / multi_num=7, baselines with
``pool_init_type=1`` (which enables the reference's early stop,
``baseline.py:294-295,374-375``) — on a synthetic dataset at a reduced but
non-toy size. Fills VERDICT r1 item 5 (the presets were dead code).

Phases (so SML can take the TPU while baselines run elsewhere):

    python scripts/adressa_run.py --phase gen --root /tmp/adressa
    python scripts/adressa_run.py --phase pretrain --root /tmp/adressa
    python scripts/adressa_run.py --phase sml --root /tmp/adressa
    python scripts/adressa_run.py --phase baselines --root /tmp/adressa

Each phase merges results into <root>/results.json.
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PERIODS = 63
TRAIN_START = 21
TEST_START = 48
NEG = 999
MULTI = 7
EPOCHS = 2          # MF_epochs = TR_epochs = 2 (main_news.py:22,34)
LATENT = 64
BASE_EPOCHS = 20    # baseline --epochs default (baseline.py:604)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def record(root, key, value):
    from sml_tpu.utils.results import record as _rec
    _rec(os.path.join(root, "results.json"), key, value)
    log(f"recorded {key}")


def dspec_for(root):
    from sml_tpu.config import adressa_data
    return adressa_data(root)


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
                         latent_dim=8, drift=0.08, seed=23)
    info = generate_synthetic_dataset(os.path.join(args.root, "news"), spec)
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


def phase_sml(args):
    import jax
    from sml_tpu.config import adressa_sml, TransferConfig
    from sml_tpu.train.driver import SMLDriver
    from sml_tpu.utils.logging import MetricsLogger

    from sml_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(log=log)
    cfg = adressa_sml().replace(
        latent_dim=LATENT, transfer=TransferConfig(latent_dim=LATENT),
        seed=args.seed, saddle_retries=args.saddle_retries,
        log_norms=bool(args.log),
        fuse_period={"auto": "auto", "on": True,
                     "off": False}[args.fuse_period])
    assert cfg.multi_num == MULTI and cfg.mf_epochs == EPOCHS \
        and cfg.tr_epochs == EPOCHS
    logger = MetricsLogger(args.log) if args.log else None
    driver = SMLDriver(cfg, dspec_for(args.root), logger=logger)
    assert driver._stop_stage == TEST_START - TRAIN_START - 1  # news != 19
    state = driver.engine.init_state(pretrained_mf=load_pre(args.root))
    t0 = time.time()
    report = driver.run(state)
    total = time.time() - t0
    record(args.root, args.key or "sml", {
        "backend": jax.default_backend(),
        "seed": args.seed,
        "total_seconds": round(total, 1),
        "fuse_period": args.fuse_period,
        "saddle_retries_used": report.saddle_retries_used,
        "period_seconds": [round(s, 2) for s in report.period_seconds],
        "summary": {k: round(v, 5) for k, v in report.summary().items()},
        "per_period_recall@20":
            [round(v, 4) for v in report.per_period.get(20, [])],
        "test_num": report.test_counts,
    })


def phase_baselines(args):
    import jax
    from sml_tpu.config import BaselineConfig
    from sml_tpu.train.baselines import BaselineDriver

    out = {"backend": jax.default_backend()}
    for method in ("fine", "full", "spmf"):
        t0 = time.time()
        cfg = BaselineConfig(
            method=method, epochs=BASE_EPOCHS, batch_size=256,
            pool_size=args.pool if method == "spmf" else 0,
            pool_init_type=1,                      # news: early stop active
            start_period=TEST_START, latent_dim=LATENT,
            seed=args.seed)
        driver = BaselineDriver(cfg, dspec_for(args.root),
                                pretrained=load_pre(args.root))
        summary = driver.run()
        out[method] = {
            "seconds": round(time.time() - t0, 1),
            "summary": {k: round(v, 5) for k, v in summary.items()},
            "per_period_recall@20":
                [round(r[-1], 4) for r in driver.recall],
        }
        log(f"{method}: {out[method]['summary']}")
    record(args.root, "baselines", out)


def phase_reference(args):
    """The reference driver (imported from /root/reference, CPU) at the
    news protocol on the SAME dataset + shared pretrain: the accuracy-parity
    counterpart of phase_sml (round 1/2 parity was Yelp-protocol only)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "pvr", os.path.join(REPO, "scripts", "parity_vs_reference.py"))
    pvr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pvr)
    pvr.set_protocol(n_periods=N_PERIODS, train_start=TRAIN_START,
                     test_start=TEST_START, neg=NEG, multi=MULTI,
                     latent=LATENT, mf_epochs=EPOCHS, tr_epochs=EPOCHS)
    params = load_pre(args.root)
    t0 = time.time()
    ref = pvr.run_reference(args.root, params, ref_seed=args.seed,
                            dataset_name="news", ckpt_path=args.ckpt)
    total = ref.pop("train_seconds_banked", None) or (time.time() - t0)
    weighted = _weighted_summary(ref)
    log(f"reference news: {weighted}")
    record(args.root, f"reference_seed{args.seed}", {
        "seed": args.seed,
        "total_seconds": round(total, 1),
        "summary": weighted,
        "per_period_recall@20": [round(v, 4) for v in ref["recall@20"]],
        "test_num": ref["test_num"],
    })


def phase_ref_baselines(args):
    """Reference full/fine/spmf (imported from /root/reference, CPU) at the
    news protocol on the SAME dataset + shared pretrain (VERDICT r4 "Next"
    #6): completes the both-frameworks SML>full>SPMF~fine ordering table at
    the news shape. Protocol matched to phase_baselines: epochs=20,
    batch 256, lr 0.01, l2 1e-5, pool_init_type=1 (the reference's
    news-protocol early stop, ``baseline.py:294-295,374-375``), start 48.
    Aggregation: the baselines keep the final period (``baseline.py:546``)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "pvr", os.path.join(REPO, "scripts", "parity_vs_reference.py"))
    pvr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pvr)
    pvr.set_protocol(n_periods=N_PERIODS, train_start=TRAIN_START,
                     test_start=TEST_START, neg=NEG, multi=MULTI,
                     latent=LATENT, mf_epochs=EPOCHS, tr_epochs=EPOCHS)
    params = load_pre(args.root)
    method = args.method
    assert method in ("full", "fine", "spmf"), method
    t0 = time.time()
    ref = pvr.run_reference_baseline(
        args.root, params, method, seed=args.seed, epochs=BASE_EPOCHS,
        pool=args.pool if method == "spmf" else 0, dataset_name="news",
        numworkers=0, pool_init_type=1, ckpt_path=args.ckpt)
    total = ref.pop("train_seconds_banked", None) or (time.time() - t0)
    from sml_tpu.ops.metrics import weighted_period_average
    summary = {}
    n = ref["test_num"]
    for k in (5, 10, 20):
        for name in ("recall", "ndcg"):
            val, test = weighted_period_average(
                ref[f"{name}@{k}"], n, drop_last_test=False)
            summary[f"val_{name}@{k}"] = round(float(val), 5)
            summary[f"test_{name}@{k}"] = round(float(test), 5)
    log(f"reference news {method}: {summary}")
    record(args.root, args.key or f"ref_baseline_{method}", {
        "seed": args.seed, "method": method, "epochs": BASE_EPOCHS,
        "pool": args.pool if method == "spmf" else 0,
        "pool_init_type": 1,
        "total_seconds": round(total, 1),
        "summary": summary,
        "per_period_recall@20": [round(v, 4) for v in ref["recall@20"]],
        "test_num": ref["test_num"],
    })


def _weighted_summary(ref):
    """The reference's val/test split + test-count weighting
    (``transfer.py:991-1025``), via the SAME shared helper every 'ours'
    summary uses (round-split, drop-last-test) so reference and ours
    records are on one protocol (ADVICE r3 — the old hand-rolled slice
    included the final period the reference drops)."""
    from sml_tpu.ops.metrics import weighted_period_average
    out = {}
    n = ref["test_num"]
    for k in (5, 10, 20):
        for name in ("recall", "ndcg"):
            val, test = weighted_period_average(ref[f"{name}@{k}"], n)
            out[f"val_{name}@{k}"] = round(float(val), 5)
            out[f"test_{name}@{k}"] = round(float(test), 5)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", required=True,
                    choices=["gen", "pretrain", "sml", "baselines",
                             "reference", "ref-baselines"])
    ap.add_argument("--method", default="full",
                    help="ref-baselines: full | fine | spmf")
    ap.add_argument("--fuse-period", default="auto",
                    choices=["auto", "on", "off"],
                    help="sml: one-dispatch periods (auto = only when "
                         "this config's program is already compile-cached)")
    ap.add_argument("--root", required=True)
    ap.add_argument("--users", type=int, default=12_000)
    ap.add_argument("--items", type=int, default=8_000)
    ap.add_argument("--inter", type=int, default=8_000)
    ap.add_argument("--pool", type=int, default=30_000)
    ap.add_argument("--seed", type=int, default=2000)
    ap.add_argument("--key", default=None,
                    help="results.json key (default: the phase name)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--saddle-retries", type=int, default=0,
                    help="sml: first-period bad-stream guard (0 = "
                         "reference-faithful, matching the parity runs)")
    ap.add_argument("--log", default=None,
                    help="sml: per-phase diagnostics jsonl (log_norms)")
    ap.add_argument("--ckpt", default=None,
                    help="reference: period-boundary checkpoint file "
                         "(resume is bit-identical)")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    os.makedirs(args.root, exist_ok=True)
    {"gen": phase_gen, "pretrain": phase_pretrain,
     "sml": phase_sml, "baselines": phase_baselines,
     "reference": phase_reference,
     "ref-baselines": phase_ref_baselines}[args.phase](args)


if __name__ == "__main__":
    main()

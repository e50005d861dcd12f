"""Run-seed variance study: spread of final weighted metrics, torch vs ours.

VERDICT r1 item 1 asks for seed-robust accuracy parity: mean inside the
reference band AND comparable spread. At toy scale the spreads already
overlap (parity_seed*.json); at Yelp scale only 2 reference / 3 ours seeds
existed, which cannot establish a variance claim either way. This study
runs the FULL sequential sweep at a medium scale (minutes per run) with
N>=8 seeds per framework on a shared dataset + shared pretrained tables:

    python scripts/seed_variance_study.py --phase gen
    python scripts/seed_variance_study.py --phase ref   --seeds 2000-2007
    python scripts/seed_variance_study.py --phase ours  --seeds 2000-2007
    python scripts/seed_variance_study.py --phase ours_ws --seeds 2000-2007
    python scripts/seed_variance_study.py --phase summary

The reference driver is imported from /root/reference at runtime and run
as-is (measurement, not copying). Weighted metrics follow the reference's
protocol: first third of test periods = validation, rest minus the last
period = test (transfer.py:991-1025).
"""

import argparse
import importlib.util
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# medium protocol: large enough for the warm-up refresh pathology to show
# (the saddle config used 8k users; saddle_experiment.py), small enough for
# a full reference sweep in minutes on CPU
N_PERIODS = 12
TRAIN_START = 2
TEST_START = 8
NEG = 99
MULTI = 5
LATENT = 32
USERS = 8000
ITEMS = 4000
INTER = 8000


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _pvr():
    spec = importlib.util.spec_from_file_location(
        "pvr", os.path.join(REPO, "scripts", "parity_vs_reference.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.set_protocol(n_periods=N_PERIODS, train_start=TRAIN_START,
                     test_start=TEST_START, neg=NEG, multi=MULTI,
                     latent=LATENT)
    return mod


def gen(root):
    from sml_tpu.data.synthetic import SyntheticSpec, generate_synthetic_dataset
    spec = SyntheticSpec(n_users=USERS, n_items=ITEMS, n_periods=N_PERIODS,
                         interactions_per_period=INTER,
                         first_test_period=TRAIN_START, neg_num=NEG,
                         latent_dim=8, drift=0.05, seed=77)
    info = generate_synthetic_dataset(os.path.join(root, "synth"), spec)
    log("dataset", info)


def shared_pretrain(root, pvr):
    """Pretrain once, store as npz; later phases load it."""
    path = os.path.join(root, "pre.npz")
    if os.path.exists(path):
        d = np.load(path)
        from sml_tpu.models.mf import MFParams
        import jax.numpy as jnp
        params = MFParams(user_emb=jnp.asarray(d["user_emb"]),
                          item_emb=jnp.asarray(d["item_emb"]),
                          user_bias=jnp.asarray(d["user_bias"]),
                          item_bias=jnp.asarray(d["item_bias"]))
        from sml_tpu.config import DataSpec
        dspec = DataSpec(root=root, name="synth", num_periods=N_PERIODS,
                         online_train_start=TRAIN_START,
                         online_test_start=TEST_START, eval_neg_num=NEG)
        return dspec, params
    dspec, params, metrics = pvr.pretrain(root, None)
    np.savez(path, user_emb=np.asarray(params.user_emb),
             item_emb=np.asarray(params.item_emb),
             user_bias=np.asarray(params.user_bias),
             item_bias=np.asarray(params.item_bias))
    log("pretrain", metrics)
    return dspec, params


def weighted(report, test_num):
    """Reference weighted protocol (transfer.py:991-1025)."""
    out = {}
    for key, vals in report.items():
        if key == "test_num":
            continue
        v, n = np.asarray(vals, float), np.asarray(test_num, float)
        n3 = len(v) // 3
        out[f"val_{key}"] = float(np.average(v[:n3], weights=n[:n3]))
        out[f"test_{key}"] = float(np.average(v[n3:-1], weights=n[n3:-1]))
    return out


def run_ours(dspec, params, seed, warmstart=0):
    from sml_tpu.config import SMLConfig, TransferConfig
    from sml_tpu.train.driver import SMLDriver
    from sml_tpu.train.engine import SMLEngine

    cfg = SMLConfig(multi_num=MULTI, mf_epochs=1, tr_epochs=1,
                    latent_dim=LATENT,
                    transfer=TransferConfig(latent_dim=LATENT),
                    mf_batch_size=1024, tr_batch_size=256,
                    eval_batch_size=1024, mf_sample="all",
                    tr_sample_type="alone", seed=seed,
                    theta_warmstart_steps=warmstart)
    engine = SMLEngine(cfg, params.user_emb.shape[0],
                       params.item_emb.shape[0])
    driver = SMLDriver(cfg, dspec, engine=engine)
    report = driver.run(engine.init_state(pretrained_mf=params))
    return {
        "recall@20": report.per_period[20],
        "ndcg@20": report.per_period_ndcg[20],
        "recall@5": report.per_period[5],
        "ndcg@5": report.per_period_ndcg[5],
        "test_num": report.test_counts,
    }


def parse_seeds(s):
    if "-" in s:
        a, b = s.split("-")
        return list(range(int(a), int(b) + 1))
    return [int(x) for x in s.split(",")]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", required=True,
                    choices=["gen", "ref", "ours", "ours_ws", "summary"])
    ap.add_argument("--root", default="/tmp/seedvar")
    ap.add_argument("--seeds", default="2000-2007")
    ap.add_argument("--warmstart", type=int, default=400)
    ap.add_argument("--out", default=None)
    # protocol-knob overrides for bisecting WHICH knob separates the
    # medium protocol (parity at n=8) from the Yelp-scale one: each flag
    # moves one constant toward the Yelp value (periods 40/10/30,
    # multi 10, latent 64, neg 999, 31k/21k/30k size)
    ap.add_argument("--periods", type=int, default=None)
    ap.add_argument("--multi", type=int, default=None)
    ap.add_argument("--latent", type=int, default=None)
    ap.add_argument("--neg", type=int, default=None)
    ap.add_argument("--users", type=int, default=None)
    ap.add_argument("--items", type=int, default=None)
    ap.add_argument("--inter", type=int, default=None)
    ap.add_argument("--train-start", type=int, default=None)
    ap.add_argument("--test-start", type=int, default=None)
    args = ap.parse_args()
    g = globals()
    for flag, const in [("periods", "N_PERIODS"), ("multi", "MULTI"),
                        ("latent", "LATENT"), ("neg", "NEG"),
                        ("users", "USERS"), ("items", "ITEMS"),
                        ("inter", "INTER"), ("train_start", "TRAIN_START"),
                        ("test_start", "TEST_START")]:
        v = getattr(args, flag)
        if v is not None:
            g[const] = v
    os.makedirs(args.root, exist_ok=True)
    res_path = os.path.join(args.root, "results.json")

    from sml_tpu.utils.results import record

    if args.phase == "gen":
        gen(args.root)
        pvr = _pvr()
        shared_pretrain(args.root, pvr)
        return

    if args.phase == "summary":
        d = json.load(open(res_path))
        groups = {}
        for k, v in d.items():
            g = k.rsplit("_seed", 1)[0]
            groups.setdefault(g, []).append(v["summary"]["test_recall@20"])
        out = {"protocol": {"users": USERS, "items": ITEMS,
                            "periods": N_PERIODS, "multi": MULTI,
                            "latent": LATENT, "inter": INTER,
                            "neg": NEG}}
        for g, vals in sorted(groups.items()):
            vals = np.asarray(vals)
            out[g] = {"n": len(vals),
                      "mean": round(float(vals.mean()), 5),
                      "std": round(float(vals.std(ddof=1)), 5),
                      "min": round(float(vals.min()), 5),
                      "max": round(float(vals.max()), 5),
                      "values": [round(float(v), 5) for v in vals]}
        print(json.dumps(out, indent=1))
        if args.out:
            record(args.out, "seed_variance_study", out)
        return

    pvr = _pvr()
    dspec, params = shared_pretrain(args.root, pvr)

    for seed in parse_seeds(args.seeds):
        key = (f"ours_ws{args.warmstart}_seed{seed}"
               if args.phase == "ours_ws" and args.warmstart != 400
               else f"{args.phase}_seed{seed}")
        done = json.load(open(res_path)) if os.path.exists(res_path) else {}
        if key in done:
            log("skip", key)
            continue
        t0 = time.time()
        if args.phase == "ref":
            rep = pvr.run_reference(args.root, params, ref_seed=seed)
        else:
            ws = args.warmstart if args.phase == "ours_ws" else 0
            rep = run_ours(dspec, params, seed, warmstart=ws)
        summ = weighted(rep, rep["test_num"])
        record(res_path, key, {
            "seconds": round(time.time() - t0, 1),
            "per_period_recall@20": [round(float(v), 5)
                                     for v in rep["recall@20"]],
            "summary": {k: round(v, 5) for k, v in summ.items()},
        })
        log(f"{key}: test_recall@20={summ['test_recall@20']:.4f} "
            f"({time.time() - t0:.0f}s)")


if __name__ == "__main__":
    main()

"""Saddle fall-in probability: warm-up phase-0 dynamics, torch vs ours.

Background (VERDICT item 1): bad run seeds fall into the degenerate BCE
saddle (outer loss ~= 2 ln 2, zero-score solution) during the FIRST period's
outer training — θ's item tower output collapses, the refresh wipes the
pretrained item table, and the sweep never recovers the lost ground. θ init
output scales are statistically identical torch-vs-jax
(scripts/theta_init_scale.py), so the differentiator must be (or not be) the
stochastic training dynamics.

This experiment runs ONLY the first online period (multi_num=10 phases,
regime-A warm-up, ``/root/reference/model/transfer.py:772-792``) on a shared
medium-scale dataset + shared pretrained tables, across many seeds in BOTH
frameworks, recording per-phase inner-MF losses and final θ / item-table
norms. Output: fall-in fraction and escape trajectories per framework.

Usage:
    python scripts/saddle_experiment.py --phase gen --root /tmp/saddle
    python scripts/saddle_experiment.py --phase ours --root /tmp/saddle --seeds 24
    python scripts/saddle_experiment.py --phase reference --root /tmp/saddle --seeds 16
"""

import argparse
import contextlib
import importlib.util
import io
import json
import os
import re
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Only periods [TRAIN_START, N_PERIODS-2] can train (stage t needs period
# t+1 for set_tt), so N_PERIODS = TRAIN_START + 2 -> exactly ONE trained
# period. TEST_START beyond the horizon keeps every stage in regime A.
N_PERIODS = 12
TRAIN_START = 10
TEST_START = 30
NEG = 49
MULTI = 10
LATENT = 64
USERS = 8000
ITEMS = 4000
INTER = 10000


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _load_pvr():
    spec = importlib.util.spec_from_file_location(
        "pvr", os.path.join(REPO, "scripts", "parity_vs_reference.py"))
    pvr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pvr)
    pvr.set_protocol(n_periods=N_PERIODS, train_start=TRAIN_START,
                     test_start=TEST_START, neg=NEG, multi=MULTI,
                     latent=LATENT)
    return pvr


def dspec_for(root):
    from sml_tpu.config import DataSpec
    return DataSpec(root=root, name="synth", num_periods=N_PERIODS,
                    online_train_start=TRAIN_START,
                    online_test_start=TEST_START, eval_neg_num=NEG)


def phase_gen(args):
    from sml_tpu.config import PretrainConfig
    from sml_tpu.data.synthetic import SyntheticSpec, generate_synthetic_dataset
    from sml_tpu.train.pretrain import pretrain_mf
    spec = SyntheticSpec(n_users=USERS, n_items=ITEMS, n_periods=N_PERIODS,
                         interactions_per_period=INTER,
                         first_test_period=TRAIN_START, neg_num=NEG,
                         latent_dim=8, drift=0.05, seed=17)
    info = generate_synthetic_dataset(os.path.join(args.root, "synth"), spec)
    log(f"dataset: {info}")
    pcfg = PretrainConfig(max_epochs=60, eval_every=2, patience=8,
                          batch_size=1024, latent_dim=LATENT,
                          emb_init_scale=0.1)
    # Mirror the Yelp protocol (model/baseline.py:666-669: pretrain at
    # TEST_START-1, i.e. on ALL data before testing): pretrain through the
    # last period so the warm-up REPLAYS data the pretrained tables already
    # fit — exactly the regime the full-scale sweep runs in.
    params, metrics = pretrain_mf(pcfg, dspec_for(args.root),
                                  pretrain_period=N_PERIODS - 1)
    np.savez(os.path.join(args.root, "pre.npz"),
             user_emb=np.asarray(params.user_emb),
             item_emb=np.asarray(params.item_emb),
             user_bias=np.asarray(params.user_bias),
             item_bias=np.asarray(params.item_bias))
    log(f"pretrain: { {k: round(v, 4) for k, v in metrics.items()} }")


def _load_pre(root):
    import jax.numpy as jnp
    from sml_tpu.models.mf import MFParams
    blob = np.load(os.path.join(root, "pre.npz"))
    return MFParams(user_emb=jnp.asarray(blob["user_emb"]),
                    item_emb=jnp.asarray(blob["item_emb"]),
                    user_bias=jnp.asarray(blob["user_bias"]),
                    item_bias=jnp.asarray(blob["item_bias"]))


def phase_ours(args):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from sml_tpu.config import SMLConfig, TransferConfig
    from sml_tpu.train.driver import SMLDriver
    from sml_tpu.utils.logging import MetricsLogger

    dspec = dspec_for(args.root)
    params = _load_pre(args.root)
    runs = []
    for seed in range(args.seeds):
        diag = os.path.join(args.root, f"ours_diag_{seed}.jsonl")
        if os.path.exists(diag):
            os.unlink(diag)
        cfg = SMLConfig(multi_num=MULTI, mf_epochs=1, tr_epochs=1,
                        latent_dim=LATENT,
                        transfer=TransferConfig(latent_dim=LATENT),
                        mf_batch_size=1024, tr_batch_size=256,
                        eval_batch_size=1024, mf_sample="all",
                        tr_sample_type="alone", seed=seed, log_norms=True,
                        theta_warmstart_steps=args.warmstart)
        driver = SMLDriver(cfg, dspec, logger=MetricsLogger(diag))
        t0 = time.time()
        driver.run(driver.engine.init_state(pretrained_mf=params))
        rows = [json.loads(l) for l in open(diag)]
        ph = [r for r in rows if r.get("kind") == "phase"]
        runs.append({
            "seed": seed,
            "inner_losses": [round(r["inner_loss"], 4) for r in ph],
            "outer_losses": [round(r["outer_loss"], 4) for r in ph],
            "theta_norms": [round(r["theta_norm"], 3) for r in ph],
            "item_norms": [round(r["item_norm"], 4) for r in ph],
            "seconds": round(time.time() - t0, 1),
        })
        log(f"ours seed {seed}: inner={runs[-1]['inner_losses']}")
        _record(args.root,
                "ours_warmstart" if args.warmstart else "ours", runs)


def phase_reference(args):
    import torch
    pvr = _load_pvr()
    pvr._setup_reference_import()
    import types

    from data import dataset2 as ref_dataset2
    from model import transfer as ref_transfer

    params = _load_pre(args.root)
    base_state = {k: v.clone() for k, v in
                  pvr._shared_pretrained_mfbase(params).state_dict().items()}
    runs = []
    for seed in range(args.seeds):
        # fresh pickle each run so meta_train's torch.load sees clean tables
        base = pvr._shared_pretrained_mfbase(params)
        base.load_state_dict(base_state)
        pre_path = os.path.join(args.root, "ref_pre.pkl")
        torch.save(base, pre_path)
        a = types.SimpleNamespace(
            data_name="synthetic", data_path=args.root + "/",
            multi_num=MULTI, MF_lr=0.01, MF_epochs=1, l2=1e-6,
            MF_batch_size=1024, laten=LATENT, pre_model=pre_path,
            MF_sample="all", Load_W_hat=False, clip_grad=False,
            need_adaptive=False, maxnorm_grad=3.0,
            TR_lr=0.001, TR_l2=1e-4, TR_epochs=1, TR_batch_size=256,
            TR_sample_type="alone", TR_with_MF_bias=False, TR_stop_=False,
            transfer_type="conv_com", seed=seed, numworkers=0, topK=20,
            pass_num=1, norm=False, Lambda_lr=0.01, min_l2=1e-4,
            set_t_as_tt=False, tqdm=False, need_writer=False,
            test_in_TR_Train=False)
        torch.manual_seed(seed)
        np.random.seed(seed + 2)
        file_list = [str(i) for i in range(N_PERIODS)]
        datasets = ref_dataset2.transfer_data(
            a, path=args.root + "/", datasetname="synth",
            file_path_list=file_list, test_list=[], validation_list=None,
            online_train_time=TRAIN_START, online_test_time=TEST_START)
        t0 = time.time()
        sink = io.StringIO()
        with contextlib.redirect_stdout(sink):
            model = ref_transfer.meta_train(a, datasets,
                                            datasets.user_number,
                                            datasets.item_number, LATENT)
            model.run(a)
        out = sink.getvalue()
        # "MF-stage: 10 epoch: 0 loss:0.00135 recall..." (transfer.py:519).
        # The reference prints mean_batch_loss / MF_batch_size
        # (transfer.py:513-514); multiply back to the mean batch loss, the
        # same normalization our jsonl inner_loss uses.
        mf_losses = [round(float(v) * 1024, 4) for v in
                     re.findall(r"MF-stage:.*?loss:\s*([\d.]+)", out)]
        with torch.no_grad():
            theta_norm = float(torch.sqrt(sum(
                p.pow(2).sum() for p in model.transfer.parameters())))
            # mean SQUARED per-row norm — the same statistic
            # SMLEngine.diagnostics records, so the fall-in/wipe
            # thresholds are comparable across frameworks
            item_norm = float(
                model.MFbase.item_laten.weight.pow(2).sum(-1).mean())
            user_norm = float(
                model.MFbase.user_laten.weight.pow(2).sum(-1).mean())
        runs.append({
            "seed": seed, "inner_losses": mf_losses,
            "theta_norm_final": round(theta_norm, 3),
            "item_norm_final": round(item_norm, 4),
            "user_norm_final": round(user_norm, 4),
            "seconds": round(time.time() - t0, 1),
        })
        log(f"ref seed {seed}: inner={mf_losses} theta={theta_norm:.1f} "
            f"item={item_norm:.3f}")
        _record(args.root, "reference", runs)


def _record(root, key, value):
    from sml_tpu.utils.results import record as _rec
    _rec(os.path.join(root, "saddle.json"), key, value)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", required=True,
                    choices=["gen", "ours", "reference"])
    ap.add_argument("--root", required=True)
    ap.add_argument("--seeds", type=int, default=16)
    ap.add_argument("--warmstart", type=int, default=0,
                    help="ours: theta_warmstart_steps")
    args = ap.parse_args()
    os.makedirs(args.root, exist_ok=True)
    phase_fn = {"gen": phase_gen, "ours": phase_ours,
                "reference": phase_reference}[args.phase]
    phase_fn(args)


if __name__ == "__main__":
    main()

"""Period-0 saddle probe: cheap bad-stream frequency estimation, both drivers.

The good-vs-bad diagnostics (scripts/compare_diag.py on /tmp/diag_nows*.jsonl)
show run quality at Yelp scale is decided in the FIRST online-train period:
good streams end period 0 with outer (transfer) loss ~1.03, bad streams stall
at >=1.15 and carry a constant recall deficit through every test period.
That makes one truncated period a ~4-minute classifier for the reference on
CPU (vs ~2.5 h for its full sweep) and a ~1-minute one for ours on the TPU —
cheap enough to estimate P(bad stream) on BOTH sides with real n.

    python scripts/period0_probe.py --side ours --root /tmp/yelp_scale_r2 \
        --seed 4000 [--periods 1] [--key probe_ours_seed4000]
    python scripts/period0_probe.py --side reference --platform cpu \
        --root /tmp/yelp_scale_r2 --seed 3000

Records to <root>/results.json: per-phase inner (MF) and outer (TR) losses
for the probed periods. The reference's printed losses use the same
sum-BCE/batch-size normalization as ours (transfer.py:513-515, 726-729), so
the stall threshold is directly comparable.
"""

import argparse
import contextlib
import importlib.util
import io
import json
import os
import re
import sys
import tempfile
import time
import types

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
    from sml_tpu.utils.results import record as _rec
    _rec(os.path.join(root, "results.json"), key, value)
    log(f"recorded {key}")


def load_pre(root):
    from sml_tpu.models.mf import MFParams
    import jax.numpy as jnp
    blob = np.load(os.path.join(root, "pre.npz"))
    return MFParams(user_emb=jnp.asarray(blob["user_emb"]),
                    item_emb=jnp.asarray(blob["item_emb"]),
                    user_bias=jnp.asarray(blob["user_bias"]),
                    item_bias=jnp.asarray(blob["item_bias"]))


def probe_ours(args):
    from sml_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(log=lambda m: log(m))
    from sml_tpu.config import DataSpec, SMLConfig, TransferConfig
    from sml_tpu.train.driver import SMLDriver
    from sml_tpu.utils.logging import MetricsLogger

    cfg = SMLConfig(multi_num=MULTI, mf_epochs=1, tr_epochs=1,
                    latent_dim=LATENT,
                    transfer=TransferConfig(latent_dim=LATENT),
                    mf_batch_size=1024, tr_batch_size=256,
                    eval_batch_size=1024, mf_sample="all",
                    tr_sample_type="alone", seed=args.seed, log_norms=True,
                    eval_during_inner=args.evals)
    dspec = DataSpec(root=args.root, name="synth", num_periods=N_PERIODS,
                     online_train_start=TRAIN_START,
                     online_test_start=TEST_START, eval_neg_num=NEG)
    tmp = tempfile.mktemp(suffix=".jsonl", prefix="probe_")
    driver = SMLDriver(cfg, dspec, logger=MetricsLogger(tmp))
    state = driver.engine.init_state(pretrained_mf=load_pre(args.root))
    t0 = time.time()
    driver.run(state, max_periods=args.periods)
    total = time.time() - t0

    inner, outer, inner_recall = [], [], []
    with open(tmp) as fh:
        for line in fh:
            row = json.loads(line)
            if row.get("kind") == "phase":
                inner.append(round(row["inner_loss"], 4))
                outer.append(round(row["outer_loss"], 4))
            elif row.get("kind") == "inner_eval":
                inner_recall.append(round(row["recall@20"], 4))
    os.unlink(tmp)
    return {"side": "ours", "seed": args.seed, "periods": args.periods,
            "seconds": round(total, 1),
            "inner_loss": inner, "outer_loss": outer,
            "inner_val_recall": inner_recall,
            "outer_last": outer[-1] if outer else None,
            "val_recall_last": (inner_recall[-1] if inner_recall else None)}


# with val (the warm-up branch): "MF-stage: 0 epoch: 0 loss:0.00140
# recall:0.0512 ndcg:0.0312" (transfer.py:519 — loss printed as
# mean-BCE/batch_size at 5 decimals, too coarse alone, so ALSO take the
# 4-decimal val recall printed right after it)
_MF_VAL_RE = re.compile(r"MF-stage:\s*(\d+)\s*epoch:\s*(\d+)\s*"
                        r"loss:([0-9.eE+-]+)\s*recall:([0-9.]+)")
# TR val-branch line (transfer.py:745): fullwidth punctuation + typos as-is
_TR_VAL_RE = re.compile(r"stage:(\d+), epcoh：(\d+)，loss:([0-9.eE+-]+),"
                        r"\*+val result\s+reacll:([0-9.]+)")
# no-val fallbacks (transfer.py:525, :747)
_MF_RE = re.compile(r"MF-stage:\s*(\d+)\s*epoch:\s*(\d+)\s*loss:\s*([0-9.eE+-]+)")
_TR_RE = re.compile(
    r"stage:\s*(\d+)\s*epoch:\s*(\d+)\s*transfer train loss:\s*([0-9.eE+-]+)")


def probe_reference(args):
    import torch

    spec = importlib.util.spec_from_file_location(
        "pvr", os.path.join(REPO, "scripts", "parity_vs_reference.py"))
    pvr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pvr)
    pvr.set_protocol(n_periods=N_PERIODS, train_start=TRAIN_START,
                     test_start=TEST_START, neg=NEG, multi=MULTI,
                     latent=LATENT)
    pvr._setup_reference_import()
    from model import transfer as ref_transfer
    from data import dataset2 as ref_dataset2

    torch.set_num_threads(int(os.environ.get("OMP_NUM_THREADS", "2")))
    base = pvr._shared_pretrained_mfbase(load_pre(args.root))
    pre_path = os.path.join(args.root, f"ref_pre_probe{args.seed}.pkl")
    torch.save(base, pre_path)

    ref_args = types.SimpleNamespace(
        data_name="synthetic", data_path=args.root + "/",
        multi_num=MULTI, MF_lr=0.01, MF_epochs=1, l2=1e-6,
        MF_batch_size=1024, laten=LATENT, pre_model=pre_path,
        MF_sample="all", Load_W_hat=False, clip_grad=False,
        need_adaptive=False, maxnorm_grad=3.0,
        TR_lr=0.001, TR_l2=1e-4, TR_epochs=1, TR_batch_size=256,
        TR_sample_type="alone", TR_with_MF_bias=False, TR_stop_=False,
        transfer_type="conv_com", seed=args.seed, numworkers=0, topK=20,
        pass_num=1, norm=False, Lambda_lr=0.01, min_l2=1e-4,
        set_t_as_tt=False, tqdm=False, need_writer=False,
        test_in_TR_Train=False)

    torch.manual_seed(ref_args.seed)
    np.random.seed(ref_args.seed + 2)

    file_list = [str(i) for i in range(N_PERIODS)]
    test_list = [str(j) for j in range(TEST_START, N_PERIODS)]
    datasets = ref_dataset2.transfer_data(
        ref_args, path=args.root + "/", datasetname="synth",
        file_path_list=file_list, test_list=test_list,
        validation_list=None, online_train_time=TRAIN_START,
        online_test_time=TEST_START)

    # truncate: after `periods` successful fetches the run sees "no data"
    # and stops (train_one_stage3 returns False, transfer.py:770-771)
    orig_next = datasets.next_train
    served = [0]

    def next_train(d_time):
        if served[0] >= args.periods:
            return None, None, None, None
        served[0] += 1
        return orig_next(d_time)

    datasets.next_train = next_train

    sink = io.StringIO()
    t0 = time.time()
    with contextlib.redirect_stdout(sink):
        model = ref_transfer.meta_train(ref_args, datasets,
                                        datasets.user_number,
                                        datasets.item_number, LATENT)
        model.run(ref_args)
    total = time.time() - t0
    os.unlink(pre_path)

    text = sink.getvalue()
    mf_val = _MF_VAL_RE.findall(text)
    tr_val = _TR_VAL_RE.findall(text)
    if mf_val:
        # reference prints mean-BCE/batch_size: rescale to our per-example
        # convention (transfer.py:514-515, 728-729)
        inner = [round(float(m[2]) * 1024, 4) for m in mf_val]
        outer = [round(float(m[2]) * 256, 4) for m in tr_val]
        inner_recall = [float(m[3]) for m in mf_val]
        outer_recall = [float(m[3]) for m in tr_val]
    else:
        inner = [round(float(m[2]) * 1024, 4) for m in _MF_RE.findall(text)]
        outer = [round(float(m[2]) * 256, 4) for m in _TR_RE.findall(text)]
        inner_recall, outer_recall = [], []
    return {"side": "reference", "seed": args.seed, "periods": args.periods,
            "seconds": round(total, 1),
            "inner_loss": inner, "outer_loss": outer,
            "inner_val_recall": inner_recall, "outer_val_recall": outer_recall,
            "outer_last": outer[-1] if outer else None,
            "val_recall_last": (inner_recall[-1] if inner_recall else None)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", required=True, choices=["ours", "reference"])
    ap.add_argument("--root", required=True)
    ap.add_argument("--seed", type=int, required=True)
    ap.add_argument("--periods", type=int, default=1)
    ap.add_argument("--evals", action="store_true",
                    help="ours: log the per-inner-epoch val recall@20 "
                         "trajectory (matches the reference's always-on "
                         "val prints for cross-side comparison)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--key", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    out = (probe_ours if args.side == "ours" else probe_reference)(args)
    key = args.key or f"probe_{args.side}_seed{args.seed}"
    record(args.root, key, out)
    log(json.dumps(out))


if __name__ == "__main__":
    main()

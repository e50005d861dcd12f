"""Lockstep cumulative parity: replay the reference's EXACT run through us.

The torch-golden tests pin single inner/outer steps; this harness pins the
whole cumulative discipline — optimizer-moment persistence across phases,
snapshot/refresh ordering, epoch batching (incl. the ragged final batch),
loss normalization — by removing every source of randomness asymmetry:

1. run the REFERENCE driver (`/root/reference/model/transfer.py`,
   imported at runtime, not copied) on a small synthetic protocol, with
   `torch.utils.data.DataLoader` wrapped so every (user, item, neg) train
   batch and every snapshot/refresh call is recorded as an event stream,
   and the torch Θ init exported;
2. replay the identical event stream through `SMLEngine` in
   ``replay_mode`` (verbatim rows, no shuffle, no sampling), starting from
   the same pretrained tables and the exported Θ;
3. after every `updata` (refresh) event, compare the full MF tables and Θ
   element-wise.

Any drift beyond float-reassociation noise is an implementation divergence
in the engine, localized to the first offending phase.

    python scripts/lockstep_parity.py --platform cpu --out lockstep_r2.json
"""

import argparse
import importlib.util
import io
import json
import os
import sys
import time
import types
import contextlib

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# protocol: small, CPU-fast, but multi-period with warm-up AND test periods
N_PERIODS = 9
TRAIN_START = 2
TEST_START = 6
NEG = 49
MULTI = 3
LATENT = 16
N_USERS, N_ITEMS, INTER = 3000, 1200, 6000


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


def gen_dataset(root):
    from sml_tpu.data.synthetic import SyntheticSpec, generate_synthetic_dataset
    spec = SyntheticSpec(n_users=N_USERS, n_items=N_ITEMS,
                         n_periods=N_PERIODS,
                         interactions_per_period=INTER,
                         first_test_period=TRAIN_START, neg_num=NEG,
                         latent_dim=8, drift=0.05, seed=31)
    return generate_synthetic_dataset(os.path.join(root, "synth"), spec)


def make_pretrained(rng):
    import jax.numpy as jnp
    from sml_tpu.models.mf import MFParams
    return MFParams(
        user_emb=jnp.asarray(rng.normal(0, 0.1, (N_USERS, LATENT)),
                             jnp.float32),
        item_emb=jnp.asarray(rng.normal(0, 0.1, (N_ITEMS, LATENT)),
                             jnp.float32),
        user_bias=jnp.zeros((N_USERS, 1), jnp.float32),
        item_bias=jnp.zeros((N_ITEMS, 1), jnp.float32))


def theta_from_torch(transfer):
    """torch ConvTransfer_com -> our TransferParams (layout mapping is the
    inverse of tests/test_torch_golden.py::_torch_tower).

    Every tensor goes through ``np.array(..., copy=True)``: on CPU
    ``jnp.asarray`` may zero-copy alias the torch storage, and torch's
    in-place Adam updates would then silently mutate the captured "init"
    (this exact bug produced a phantom d_theta=0.35 at refresh 0 in the
    first lockstep run — the transposed fc weights, which forced copies,
    matched exactly while every aliased leaf tracked torch's training).
    """
    import jax.numpy as jnp
    from sml_tpu.models.transfer import TransferParams, ConvTower

    def arr(t):
        return np.array(t.detach().numpy(), copy=True)

    def tower(t):
        return ConvTower(
            conv1_w=jnp.asarray(
                arr(t.conv1.weight).reshape(t.conv1.weight.shape[0], 3)),
            conv1_b=jnp.asarray(arr(t.conv1.bias)),
            conv2_w=jnp.asarray(
                arr(t.conv2.weight).reshape(
                    t.conv2.weight.shape[0], t.conv2.weight.shape[1])),
            conv2_b=jnp.asarray(arr(t.conv2.bias)),
            fc1_w=jnp.asarray(arr(t.fc1.weight).T),
            fc1_b=jnp.asarray(arr(t.fc1.bias)),
            fc2_w=jnp.asarray(arr(t.fc2.weight).T),
            fc2_b=jnp.asarray(arr(t.fc2.bias)),
        )

    return TransferParams(user=tower(transfer.user_transfer),
                          item=tower(transfer.item_transfer))


def run_reference_recorded(pvr, root, params, seed=2000):
    """Run the reference driver; return (events, theta_init, ref_report).

    events: list of ("snap", which) | ("refresh",) | ("epoch", B, rows)
    ref state snapshots (after each refresh) go into ref_snaps.
    """
    import torch

    pvr._setup_reference_import()
    from model import transfer as ref_transfer
    from data import dataset2 as ref_dataset2

    torch.manual_seed(seed)
    np.random.seed(seed + 2)

    # CPU: test_model's ndcg is a numpy scalar; .cpu() crashes
    # (transfer.py:858) — same wrapper parity_vs_reference uses
    class _NdcgVal(float):
        def cpu(self):
            return self

        def numpy(self):
            return np.float32(float(self))

    orig_tm = ref_transfer.test_model

    def _tm(*a, **k):
        r, n = orig_tm(*a, **k)
        return r, _NdcgVal(float(n))

    ref_transfer.test_model = _tm

    events = []
    ref_snaps = []

    real_DL = torch.utils.data.DataLoader

    class RecordingDL(real_DL):
        def __iter__(self):
            batches = []
            events.append(("epoch", getattr(self, "batch_size", 1), batches))
            for b in super().__iter__():
                if (isinstance(b, (list, tuple)) and len(b) == 3
                        and b[0].dim() == 1):
                    batches.append(np.stack(
                        [np.asarray(x, dtype=np.int64) for x in b], axis=1))
                yield b

    base = pvr._shared_pretrained_mfbase(params)
    pre_path = os.path.join(root, "ref_pre.pkl")
    torch.save(base, pre_path)

    args = types.SimpleNamespace(
        data_name="synthetic", data_path=root + "/",
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

    file_list = [str(i) for i in range(N_PERIODS)]
    test_list = [str(j) for j in range(TEST_START, N_PERIODS)]
    datasets = ref_dataset2.transfer_data(
        args, path=root + "/", datasetname="synth",
        file_path_list=file_list, test_list=test_list,
        validation_list=None, online_train_time=TRAIN_START,
        online_test_time=TEST_START)

    torch.utils.data.DataLoader = RecordingDL
    try:
        sink = io.StringIO()
        with contextlib.redirect_stdout(sink):
            model = ref_transfer.meta_train(
                args, datasets, user_num=N_USERS, item_num=N_ITEMS,
                laten_dim=LATENT)
            theta_init = theta_from_torch(model.transfer)

            orig_save = model.save_MF_weight
            orig_updata = model.updata

            def save_hook(save_as="last"):
                events.append(("snap", save_as))
                return orig_save(save_as=save_as)

            def updata_hook():
                orig_updata()
                events.append(("refresh",))
                ref_snaps.append((
                    model.MFbase.user_laten.weight.detach().numpy().copy(),
                    model.MFbase.item_laten.weight.detach().numpy().copy(),
                    [p.detach().numpy().copy()
                     for p in model.transfer.parameters()],
                ))

            model.save_MF_weight = save_hook
            model.updata = updata_hook
            model.run(args)
    finally:
        torch.utils.data.DataLoader = real_DL

    report = {
        "recall@20": [float(v) for v in model.recall],
        "ndcg@20": [float(v) for v in np.asarray(model.ndcg, dtype=float)],
    }
    return events, theta_init, ref_snaps, report


def replay_ours(events, theta_init, params):
    """Interpret the recorded event stream with SMLEngine operations."""
    import jax
    from sml_tpu.config import SMLConfig, TransferConfig
    from sml_tpu.train.engine import SMLEngine

    cfg = SMLConfig(multi_num=MULTI, mf_epochs=1, tr_epochs=1,
                    latent_dim=LATENT,
                    transfer=TransferConfig(latent_dim=LATENT),
                    mf_batch_size=1024, tr_batch_size=256,
                    eval_batch_size=1024, mf_sample="all",
                    tr_sample_type="alone", replay_mode=True)
    engine = SMLEngine(cfg, N_USERS, N_ITEMS)
    state = engine.init_state(pretrained_mf=params)
    state = state._replace(theta=theta_init,
                           tr_opt=engine.tr_tx.init(theta_init))

    snaps = []
    for ev in events:
        kind = ev[0]
        if kind == "snap":
            state = (engine.snapshot_last(state) if ev[1] == "last"
                     else engine.snapshot_hat(state))
        elif kind == "refresh":
            state = engine.refresh(state)
            # materialize: the jitted epochs donate state, so live jax
            # buffers stored here would be invalidated by later steps
            snaps.append((np.asarray(state.mf.user_emb).copy(),
                          np.asarray(state.mf.item_emb).copy(),
                          [np.asarray(x).copy()
                           for x in jax.tree.leaves(state.theta)]))
        elif kind == "epoch":
            _, bsz, batches = ev
            if not batches:        # eval loader (no 3-tuple batches)
                continue
            rows = np.concatenate(batches, axis=0).astype(np.int64)
            if bsz == cfg.mf_batch_size:
                padded, idx = engine.prep_inner(rows)
                state, _ = engine.inner_epoch(state, padded, idx)
            elif bsz == cfg.tr_batch_size:
                padded, idx = engine.prep_outer(rows)
                state, _ = engine.outer_epoch(state, padded, idx)
            else:
                raise RuntimeError(f"unexpected batch size {bsz}")
    return snaps


def theta_leaves_torch_order(theta):
    """Reference model.transfer.parameters() order: user tower then item
    tower, each [conv1.w, conv1.b, conv2.w, conv2.b, fc1.w, fc1.b, fc2.w,
    fc2.b] in torch layouts."""
    out = []
    for tw in (theta[0], theta[1]):
        c1 = np.asarray(tw[0])
        out.append(c1.reshape(c1.shape[0], 1, c1.shape[1], 1))
        out.append(np.asarray(tw[1]))
        c2 = np.asarray(tw[2])
        out.append(c2.reshape(c2.shape[0], c2.shape[1], 1, 1))
        out.append(np.asarray(tw[3]))
        out.append(np.asarray(tw[4]).T)
        out.append(np.asarray(tw[5]))
        out.append(np.asarray(tw[6]).T)
        out.append(np.asarray(tw[7]))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/lockstep")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--seed", type=int, default=2000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    os.makedirs(args.root, exist_ok=True)
    if not os.path.exists(os.path.join(args.root, "synth",
                                       "information.npy")):
        log("gen dataset")
        gen_dataset(args.root)

    pvr = _pvr()
    params = make_pretrained(np.random.default_rng(97))

    t0 = time.time()
    log("reference run (recording)")
    events, theta_init, ref_snaps, report = run_reference_recorded(
        pvr, args.root, params, seed=args.seed)
    t_ref = time.time() - t0
    n_batches = sum(len(e[2]) for e in events if e[0] == "epoch")
    log(f"reference done in {t_ref:.0f}s: {len(events)} events, "
        f"{n_batches} train batches, {len(ref_snaps)} refreshes")

    t0 = time.time()
    ours_snaps = replay_ours(events, theta_init, params)
    t_ours = time.time() - t0
    assert len(ours_snaps) == len(ref_snaps), \
        (len(ours_snaps), len(ref_snaps))

    deltas = []
    for k, ((ru, ri, rth), (ou, oi, oth)) in enumerate(
            zip(ref_snaps, ours_snaps)):
        oth_t = theta_leaves_torch_order((
            [np.asarray(x) for x in oth[:8]],
            [np.asarray(x) for x in oth[8:]]))
        du = float(np.max(np.abs(ru - ou)))
        di = float(np.max(np.abs(ri - oi)))
        dt = max(float(np.max(np.abs(a - b)))
                 for a, b in zip(rth, oth_t))
        deltas.append({"refresh": k, "d_user": du, "d_item": di,
                       "d_theta": dt})
        if k % 10 == 0 or k == len(ref_snaps) - 1:
            log(f"refresh {k}: d_user={du:.2e} d_item={di:.2e} "
                f"d_theta={dt:.2e}")

    worst = max(max(d["d_user"], d["d_item"], d["d_theta"])
                for d in deltas)
    res = {
        "protocol": {"periods": N_PERIODS, "train_start": TRAIN_START,
                     "test_start": TEST_START, "multi": MULTI,
                     "users": N_USERS, "items": N_ITEMS,
                     "latent": LATENT, "seed": args.seed},
        "n_refreshes": len(deltas),
        "n_train_batches": n_batches,
        "worst_delta": worst,
        "final": deltas[-1],
        "first": deltas[0],
        "ref_seconds": round(t_ref, 1),
        "ours_seconds": round(t_ours, 1),
        "ref_recall@20": report["recall@20"],
        "deltas_every_5": deltas[::5],
    }
    print(json.dumps({"worst_delta": worst, "final": deltas[-1],
                      "n_refreshes": len(deltas)}))
    if args.out:
        from sml_tpu.utils.results import record
        record(args.out, f"lockstep_seed{args.seed}", res)


if __name__ == "__main__":
    main()

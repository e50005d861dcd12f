"""Production-scale run of the REAL SML engine (not raw steps).

VERDICT r1 item 3: "numbers, not AOT checks". Runs full SML periods —
inner epoch -> snapshot -> Pallas full-table refresh -> outer epoch ->
refresh -> eval — through ``SMLEngine`` at production table sizes with
synthetic in-memory period data, and reports examples/s, per-op wall
times and the refresh ms. Two intended shapes:

  one real TPU chip (bf16 snapshots make 5M users fit):
    python scripts/scale_engine_run.py --users 5000000 --items 1000000 \
        --snapshot-dtype bfloat16 --out benchmarks_scale_r2.json
  50M/5M row-sharded on the virtual 8-mesh (CPU, reduced-memory bf16):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/scale_engine_run.py --platform cpu --devices 8 \
        --users 50000000 --items 5000000 --snapshot-dtype bfloat16 \
        --inter 100000 --key scale_50m --out benchmarks_scale_r2.json

The full-table refresh is the op the reference fears
(``/root/reference/model/transfer.py:895`` "maybe out of memory!!!").
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=5_000_000)
    ap.add_argument("--items", type=int, default=1_000_000)
    ap.add_argument("--inter", type=int, default=300_000,
                    help="interactions per period")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--phases", type=int, default=2)
    ap.add_argument("--eval-rows", type=int, default=4096)
    ap.add_argument("--neg", type=int, default=999)
    ap.add_argument("--snapshot-dtype", default="float32")
    ap.add_argument("--latent", type=int, default=64,
                    help="reduced-memory form for host-RAM-bound virtual-"
                         "mesh runs (the 50M/5M f32 state at d=64 is "
                         "~56 GB and OOMs a 125 GB host with transients)")
    ap.add_argument("--devices", type=int, default=0,
                    help="row-shard tables over an N-device mesh")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--key", default="scale_5m_chip")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from sml_tpu.config import SMLConfig, TransferConfig
    from sml_tpu.train.engine import SMLEngine

    U, I = args.users, args.items
    if args.devices:
        U = (U // args.devices) * args.devices
        I = (I // args.devices) * args.devices
    log(f"backend={jax.default_backend()} users={U} items={I} "
        f"snap={args.snapshot_dtype} devices={args.devices or 1}")

    cfg = SMLConfig(mf_batch_size=args.batch, tr_batch_size=args.batch,
                    eval_batch_size=1024, latent_dim=args.latent, multi_num=1,
                    transfer=TransferConfig(latent_dim=args.latent),
                    mf_sample="alone", tr_sample_type="alone",
                    snapshot_dtype=args.snapshot_dtype)
    engine = SMLEngine(cfg, U, I)
    log(f"fast_table_adam={engine.cfg.fast_table_adam}")

    t0 = time.time()
    if args.devices:
        from sml_tpu.parallel.sharding import make_mesh
        mesh = make_mesh(1, args.devices)
        state = engine.init_state_sharded(mesh)
        log(f"mesh={dict(mesh.shape)} "
            f"user shard={state.mf.user_emb.sharding.spec}")
    else:
        state = engine.init_state()
    jax.block_until_ready(state.mf.user_emb)
    log(f"state init {time.time()-t0:.1f}s")

    rng = np.random.default_rng(0)

    def period(n):
        return np.unique(np.stack([rng.integers(0, U, n),
                                   rng.integers(0, I, n)], 1), axis=0)

    set_t, set_tt = period(args.inter), period(args.inter)
    test_rows = np.stack([rng.integers(0, U, args.eval_rows),
                          rng.integers(0, I, args.eval_rows)] +
                         [rng.integers(0, I, args.eval_rows)
                          for _ in range(args.neg)], axis=1)

    padded_t, idx_t = engine.prep_inner(set_t)
    padded_tt, idx_tt = engine.prep_outer(set_tt)

    times = {"inner": [], "outer": [], "refresh": [], "snapshot": []}
    t_all = time.time()
    for phase in range(args.phases):
        t = time.time()
        state = engine.snapshot_last(state)
        state, losses = engine.inner_epoch(state, padded_t, idx_t)
        jax.block_until_ready(state.mf.user_emb)
        times["inner"].append(time.time() - t)

        t = time.time()
        state = engine.snapshot_hat(state)
        jax.block_until_ready(state.hat_user)
        times["snapshot"].append(time.time() - t)

        t = time.time()
        state = engine.refresh(state)
        jax.block_until_ready(state.mf.user_emb)
        times["refresh"].append(time.time() - t)

        t = time.time()
        state, _ = engine.outer_epoch(state, padded_tt, idx_tt)
        state = engine.refresh(state)
        jax.block_until_ready(state.mf.user_emb)
        times["outer"].append(time.time() - t)
        log(f"phase {phase}: inner={times['inner'][-1]:.2f}s "
            f"refresh={times['refresh'][-1]:.2f}s "
            f"outer+refresh={times['outer'][-1]:.2f}s "
            f"loss={float(np.asarray(losses).mean()):.4f}")

    t = time.time()
    metrics = engine.evaluate(state.mf, test_rows)
    eval_s = time.time() - t
    total = time.time() - t_all

    # steady-state numbers come from the LAST phase (first includes compile)
    inner_s = times["inner"][-1]
    res = {
        "backend": jax.default_backend(),
        "users": U, "items": I, "latent": args.latent,
        "snapshot_dtype": args.snapshot_dtype,
        "devices": args.devices or 1,
        "interactions_per_epoch": int(set_t.shape[0]),
        "inner_epoch_seconds": round(inner_s, 3),
        "train_examples_per_s": round(set_t.shape[0] / inner_s, 1),
        "refresh_seconds": round(times["refresh"][-1], 3),
        "refresh_rows_per_s": round((U + I) / times["refresh"][-1], 1),
        "outer_epoch_plus_refresh_seconds": round(times["outer"][-1], 3),
        "eval_seconds": round(eval_s, 3),
        "eval_rows": int(test_rows.shape[0]),
        # throughput probe on random synthetic tables — NOT an accuracy
        # claim (with an untrained theta the refresh can zero the tables,
        # making all scores tie and the positional positive win: 1.0)
        "recall@20_synthetic_probe": round(metrics[20]["recall"], 4),
        "phase_seconds_all": {k: [round(v, 2) for v in vs]
                              for k, vs in times.items()},
        "total_seconds": round(total, 1),
    }
    print(json.dumps(res))
    if args.out:
        from sml_tpu.utils.results import record
        record(args.out, args.key, res)


if __name__ == "__main__":
    main()

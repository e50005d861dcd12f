"""Command-line entry points.

Replaces the reference's three entry scripts (``main_yelp.py``,
``main_news.py``, ``model/baseline.py __main__``) with one typed CLI:

    python -m sml_tpu sml       --data-root D --data-name yelp ...
    python -m sml_tpu pretrain  --data-root D --data-name yelp ...
    python -m sml_tpu baseline  --data-root D --method full|fine|spmf ...
    python -m sml_tpu synth     --out D/synth ...

Dataset presets carry the reference's per-dataset constants
(``main_yelp.py:159-165``, ``main_news.py:221-227``,
``model/baseline.py:624-625``).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

from sml_tpu import config as C


def _dataspec(args) -> C.DataSpec:
    if args.data_name == "yelp":
        spec = C.yelp_data(args.data_root)
    elif args.data_name in ("news", "adressa"):
        spec = C.adressa_data(args.data_root)
    else:
        spec = C.DataSpec(root=args.data_root, name=args.data_name,
                          num_periods=args.num_periods,
                          online_train_start=args.online_train_start,
                          online_test_start=args.online_test_start)
    return spec


def _add_data_args(p):
    p.add_argument("--data-root", required=True)
    p.add_argument("--data-name", default="yelp")
    p.add_argument("--num-periods", type=int, default=40)
    p.add_argument("--online-train-start", type=int, default=10)
    p.add_argument("--online-test-start", type=int, default=30)
    p.add_argument("--metrics-jsonl", default=None,
                   help="write structured metrics to this jsonl file")
    p.add_argument("--checkpoint-dir", default=None)


def cmd_sml(args) -> int:
    from sml_tpu.train.driver import SMLDriver
    from sml_tpu.train.engine import SMLEngine
    from sml_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint, latest_step
    from sml_tpu.utils.logging import MetricsLogger
    from sml_tpu.models.mf import MFParams
    import jax.numpy as jnp
    import numpy as np

    spec = _dataspec(args)
    preset = C.adressa_sml() if spec.name == "news" else C.yelp_sml()
    cfg = preset.replace(
        multi_num=args.multi_num if args.multi_num is not None else preset.multi_num,
        mf_epochs=args.mf_epochs if args.mf_epochs is not None else preset.mf_epochs,
        tr_epochs=args.tr_epochs if args.tr_epochs is not None else preset.tr_epochs,
        mf_lr=args.mf_lr, mf_l2=args.mf_l2, tr_lr=args.tr_lr,
        tr_l2=args.tr_l2, latent_dim=args.latent,
        # the reference's com2/com3 tower is 1024-wide (one_transfer_com,
        # conv_transfer.py:146-149); the conv_com tower is 512
        transfer=C.TransferConfig(
            latent_dim=args.latent, kind=args.transfer_type,
            fc_hidden=1024 if args.transfer_type == "conv_com_root" else 512),
        mf_sample=args.mf_sample, tr_sample_type=args.tr_sample_type,
        tr_stop=args.tr_stop, load_w_hat=args.load_w_hat,
        pass_num=args.pass_num, seed=args.seed,
        attributed_eval=args.attributed_eval,
        uniform_shapes=not args.per_period_shapes,
        emb_init_scale=args.emb_init_scale,
        eval_during_inner=args.eval_during_inner,
        eval_during_outer=args.eval_during_outer,
        eval_scoring=args.eval_scoring,
        theta_warmstart_steps=args.theta_warmstart,
        saddle_retries=args.saddle_retries,
        snapshot_dtype=args.snapshot_dtype,
        profile_dir=args.profile_dir)

    import jax
    main_proc = jax.process_index() == 0
    logger = MetricsLogger(args.metrics_jsonl if main_proc else None,
                           echo=main_proc)
    driver = SMLDriver(cfg, spec, logger=logger)
    engine = driver.engine

    placement = None
    if jax.process_count() > 1:
        from sml_tpu.parallel.multihost import (MultihostPlacement,
                                                make_global_mesh)
        mesh = make_global_mesh()
        placement = MultihostPlacement(mesh, engine.n_users, engine.n_items)
        engine.placement = placement
        if main_proc:
            print(f"multi-host: {jax.process_count()} processes, "
                  f"mesh {dict(mesh.shape)}", file=sys.stderr)

    pretrained = None
    if args.pre_model:
        import numpy as _np
        blob = _np.load(args.pre_model)
        pretrained = MFParams(
            user_emb=jnp.asarray(blob["user_emb"]),
            item_emb=jnp.asarray(blob["item_emb"]),
            user_bias=jnp.asarray(blob["user_bias"]),
            item_bias=jnp.asarray(blob["item_bias"]))
    # Decide resume BEFORE init_state: (a) skip the theta warm-start whose
    # result restore_checkpoint would overwrite, (b) under multi-process,
    # every process must agree on the resume period or the SPMD programs
    # diverge and the first collective hangs — require a shared checkpoint
    # dir and verify agreement instead of hanging.
    resume_step = None
    if args.checkpoint_dir:
        resume_step = latest_step(args.checkpoint_dir)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            import numpy as _np
            local = -1 if resume_step is None else int(resume_step)
            steps = _np.asarray(
                multihost_utils.process_allgather(_np.int64(local)))
            if len(set(steps.tolist())) != 1:
                raise RuntimeError(
                    "checkpoint resume disagrees across processes "
                    f"(latest steps per process: {steps.tolist()}); "
                    "--checkpoint-dir must be shared storage visible to "
                    "every host")

    state = engine.init_state(
        pretrained_mf=pretrained,
        skip_theta_warmstart=resume_step is not None)

    start_pass, start_period = 0, 0
    if resume_step is not None:
        from sml_tpu.train.driver import RunReport
        state, _, extra = restore_checkpoint(args.checkpoint_dir, state)
        # pre-extra checkpoints (round <=2) carried only the period in
        # ``step``; new ones record (pass_id, period, report) in extra
        start_pass = int(extra.get("pass_id", 0))
        start_period = int(extra.get("period", resume_step)) + 1
        if "report" in extra:
            driver.report = RunReport.from_dict(extra["report"])
        if main_proc:
            print(f"resumed at pass {start_pass} period {start_period}",
                  file=sys.stderr)
    if placement is not None:
        state = placement.state(state)

    def host_state(st):
        # collective on every process; written by process 0 only
        return (jax.tree.map(placement.fetch, st)
                if placement is not None else st)

    def on_period_end(st, pass_id, d_time, drv):
        if not args.checkpoint_dir:
            return
        hs = host_state(st)
        # drain deferred test/eval metrics NOW so the checkpointed report
        # covers every completed test period: after a crash+resume the
        # end-of-run weighted summary must equal the uninterrupted run's
        drv.finalize()
        if main_proc:
            save_checkpoint(
                args.checkpoint_dir,
                pass_id * spec.num_periods + d_time, hs,
                extra={"pass_id": pass_id, "period": d_time,
                       "report": drv.report.to_dict()})

    driver.run(state, start_pass=start_pass, start_period=start_period,
               on_period_end=on_period_end)
    state = driver.final_state

    if args.save_model:
        hs = host_state(state)
        if main_proc:
            np.savez(args.save_model,
                     user_emb=np.asarray(hs.mf.user_emb),
                     item_emb=np.asarray(hs.mf.item_emb),
                     user_bias=np.asarray(hs.mf.user_bias),
                     item_bias=np.asarray(hs.mf.item_bias))
            print(f"saved final tables to {args.save_model}", file=sys.stderr)

    summary = driver.report.summary()   # run() already finalized
    if main_proc:
        print(json.dumps(summary, indent=2))
    return 0


def cmd_pretrain(args) -> int:
    from sml_tpu.train.pretrain import pretrain_mf
    from sml_tpu.utils.logging import MetricsLogger
    import numpy as np

    spec = _dataspec(args)
    pcfg = C.PretrainConfig(lr=args.lr, l2_user=args.l2, l2_item=args.l2,
                            batch_size=args.batch_size,
                            max_epochs=args.epochs, latent_dim=args.latent,
                            seed=args.seed)
    period = args.period if args.period is not None \
        else spec.online_test_start - 1
    logger = MetricsLogger(args.metrics_jsonl, echo=True)
    params, metrics = pretrain_mf(pcfg, spec, period, logger=logger)
    np.savez(args.out,
             user_emb=np.asarray(params.user_emb),
             item_emb=np.asarray(params.item_emb),
             user_bias=np.asarray(params.user_bias),
             item_bias=np.asarray(params.item_bias))
    print(json.dumps(metrics, indent=2))
    return 0


def cmd_baseline(args) -> int:
    from sml_tpu.train.baselines import BaselineDriver
    from sml_tpu.models.mf import MFParams
    from sml_tpu.utils.logging import MetricsLogger
    import jax.numpy as jnp
    import numpy as np

    spec = _dataspec(args)
    start = args.start_period if args.start_period is not None \
        else spec.online_test_start
    bcfg = C.BaselineConfig(
        method=args.method, lr=args.lr, l2_user=args.l2, l2_item=args.l2,
        epochs=args.epochs, batch_size=args.batch_size,
        pool_size=args.pool_size, start_period=start,
        pool_init_type=1 if spec.name == "news" else 0,
        latent_dim=args.latent, seed=args.seed)
    pretrained = None
    if args.pre_model:
        blob = np.load(args.pre_model)
        pretrained = MFParams(
            user_emb=jnp.asarray(blob["user_emb"]),
            item_emb=jnp.asarray(blob["item_emb"]),
            user_bias=jnp.asarray(blob["user_bias"]),
            item_bias=jnp.asarray(blob["item_bias"]))
    logger = MetricsLogger(args.metrics_jsonl, echo=True)
    driver = BaselineDriver(bcfg, spec, pretrained=pretrained, logger=logger)
    summary = driver.run()
    print(json.dumps(summary, indent=2))
    return 0


def cmd_synth(args) -> int:
    from sml_tpu.data.synthetic import SyntheticSpec, generate_synthetic_dataset

    spec = SyntheticSpec(n_users=args.users, n_items=args.items,
                         n_periods=args.periods,
                         interactions_per_period=args.interactions,
                         first_test_period=args.first_test,
                         neg_num=args.neg_num, seed=args.seed)
    info = generate_synthetic_dataset(args.out, spec)
    print(json.dumps(dataclasses.asdict(info)))
    return 0


def cmd_ingest(args) -> int:
    from sml_tpu.data.ingest import IngestSpec, ingest_csv

    spec = IngestSpec(n_periods=args.periods,
                      first_test_period=args.first_test,
                      neg_num=args.neg_num, split=args.split, seed=args.seed)
    info = ingest_csv(args.csv, args.out, spec,
                      user_col=args.user_col, item_col=args.item_col,
                      time_col=args.time_col, delimiter=args.delimiter,
                      skip_header=args.skip_header)
    print(json.dumps(dataclasses.asdict(info)))
    return 0


def cmd_rank(args) -> int:
    """Full-catalog top-K serving from trained tables (the production path
    the reference approximates with 999-negative eval; ``model/MF.py:45-57``
    scoring over all items instead of a candidate slate)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sml_tpu.eval.full_ranking import recommend
    from sml_tpu.models.mf import MFParams

    blob = np.load(args.model)
    mf = MFParams(user_emb=jnp.asarray(blob["user_emb"]),
                  item_emb=jnp.asarray(blob["item_emb"]),
                  user_bias=jnp.asarray(blob["user_bias"]),
                  item_bias=jnp.asarray(blob["item_bias"]))

    if args.users:
        users = np.asarray([int(u) for u in args.users.split(",")], np.int32)
    else:
        with open(args.users_file) as fh:
            users = np.asarray([int(line) for line in fh if line.strip()],
                               np.int32)
    n_users = mf.user_emb.shape[0]
    bad = users[(users < 0) | (users >= n_users)]
    if bad.size:
        print(f"error: user ids out of range [0, {n_users}): "
              f"{bad[:10].tolist()}", file=sys.stderr)
        return 2

    mesh = None
    if args.shard and len(jax.devices()) > 1:
        from sml_tpu.parallel.sharding import make_mesh
        mesh = make_mesh(1, len(jax.devices()))

    dtype = jnp.bfloat16 if args.bf16 else None
    for start in range(0, users.shape[0], args.batch_size):
        chunk = jnp.asarray(users[start:start + args.batch_size])
        scores, items = recommend(mf, chunk, args.k, mesh=mesh,
                                  compute_dtype=dtype,
                                  topk_method=args.topk_method)
        scores = np.asarray(scores)
        items = np.asarray(items)
        for r in range(chunk.shape[0]):
            print(json.dumps({"user": int(chunk[r]),
                              "items": items[r].tolist(),
                              "scores": [round(float(s), 4)
                                         for s in scores[r]]}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser("sml_tpu")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a JAX backend (the axon environment pins "
                        "JAX_PLATFORMS; this overrides it pre-init)")
    from sml_tpu.utils.compile_cache import default_cache_dir
    p.add_argument("--compile-cache", metavar="DIR",
                   default=default_cache_dir(),
                   help="persistent XLA compilation cache directory "
                        "(default %(default)s; 'off' disables). A cold "
                        "Yelp-scale sweep spends ~85%% of its wall-clock "
                        "compiling the ~10 shape buckets; warm runs take "
                        "~95 s vs ~450 s cold on one v5e chip")
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator host:port "
                        "(jax.distributed). On TPU pods omit all three "
                        "flags — everything auto-detects")
    p.add_argument("--num-processes", type=int, default=None,
                   help="multi-host: total process count")
    p.add_argument("--process-id", type=int, default=None,
                   help="multi-host: this process's rank")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("sml", help="run the SML sequential-retraining sweep")
    _add_data_args(ps)
    ps.add_argument("--pre-model", default=None,
                    help=".npz from `pretrain` (reference --pre_model)")
    ps.add_argument("--save-model", default=None,
                    help="write the final transferred tables as .npz "
                         "(consumable by `rank`)")
    ps.add_argument("--multi-num", type=int, default=None)
    ps.add_argument("--mf-epochs", type=int, default=None)
    ps.add_argument("--tr-epochs", type=int, default=None)
    ps.add_argument("--mf-lr", type=float, default=0.01)
    ps.add_argument("--mf-l2", type=float, default=1e-6)
    ps.add_argument("--tr-lr", type=float, default=0.001)
    ps.add_argument("--tr-l2", type=float, default=1e-4)
    ps.add_argument("--latent", type=int, default=64)
    ps.add_argument("--mf-sample", default="all", choices=["all", "alone"])
    ps.add_argument("--tr-sample-type", default="alone",
                    choices=["all", "alone"])
    ps.add_argument("--tr-stop", action="store_true")
    ps.add_argument("--transfer-type", default="conv_com",
                    choices=["conv_com", "conv2ch", "conv_com_root",
                             "mlp_delta", "linear", "gru", "gated"])
    ps.add_argument("--seed", type=int, default=2000)
    ps.add_argument("--load-w-hat", action="store_true",
                    help="restore MF <- W_hat after each outer step "
                         "(reference --Load_W_hat)")
    ps.add_argument("--pass-num", type=int, default=1)
    ps.add_argument("--attributed-eval", action="store_true",
                    help="per-test-period hit attribution by entity "
                         "freshness (new users/items), logged as "
                         "kind='test_attribution' jsonl records (the "
                         "reference's test_model_pre analysis); needs "
                         "test_new_user.npy/test_new_item.npy")
    ps.add_argument("--emb-init-scale", type=float, default=1.0)
    ps.add_argument("--per-period-shapes", action="store_true",
                    help="disable uniform sweep-wide shape buckets and pad "
                         "each period to its own bucket (more XLA "
                         "compilations, marginally less padding)")
    ps.add_argument("--eval-during-inner", action="store_true")
    ps.add_argument("--eval-during-outer", action="store_true")
    ps.add_argument("--eval-scoring", default="auto",
                    choices=["auto", "gather", "matmul", "gather_bf16",
                             "matmul_bf16", "masked", "masked_bf16"],
                    help="candidate scoring mode (eval/evaluator.py): "
                         "'gather' is the reference's exact per-row "
                         "embedding gather; 'masked*' stream scores "
                         "through the MXU against a packed per-eval-set "
                         "candidate mask (fused Pallas kernel on TPU, "
                         "zero indexed reads); 'auto' (default) picks "
                         "masked for re-evaluated sets, gather otherwise")
    ps.add_argument("--saddle-retries", type=int, default=2,
                    help="retry the first online-train period (at most N "
                         "times, re-rolled theta/stream pair) when the "
                         "outer loss stalls near the zero-score BCE saddle "
                         "— the bad-stream signature behind run-to-run "
                         "recall spread (~25%% of seeds at Yelp scale). "
                         "Default ON; set 0 for strict reference-faithful "
                         "behavior (the reference has the same bad tail "
                         "and no recovery)")
    ps.add_argument("--theta-warmstart", type=int, default=0,
                    help="identity warm-start steps for Θ before the sweep "
                         "(saddle stabilizer; 400 recommended at d=64, 0 = "
                         "strict reference init)")
    ps.add_argument("--snapshot-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="dtype of the last/hat table snapshots (bfloat16 "
                         "halves snapshot HBM; 5M users fit one v5e chip)")
    ps.add_argument("--profile-dir", default=None,
                    help="write a jax.profiler trace of period 0 here")
    ps.set_defaults(fn=cmd_sml)

    pp = sub.add_parser("pretrain", help="pretrain the base MF model")
    _add_data_args(pp)
    pp.add_argument("--out", required=True, help="output .npz path")
    pp.add_argument("--period", type=int, default=None,
                    help="pretrain period (default online_test_start-1)")
    pp.add_argument("--lr", type=float, default=0.01)
    pp.add_argument("--l2", type=float, default=1e-5)
    pp.add_argument("--epochs", type=int, default=200)
    pp.add_argument("--batch-size", type=int, default=256)
    pp.add_argument("--latent", type=int, default=64)
    pp.add_argument("--seed", type=int, default=2000)
    pp.set_defaults(fn=cmd_pretrain)

    pb = sub.add_parser("baseline", help="full-retrain / fine-tune / SPMF")
    _add_data_args(pb)
    pb.add_argument("--method", default="full",
                    choices=["full", "fine", "spmf"])
    pb.add_argument("--pre-model", default=None)
    pb.add_argument("--start-period", type=int, default=None)
    pb.add_argument("--lr", type=float, default=0.01)
    pb.add_argument("--l2", type=float, default=1e-5)
    pb.add_argument("--epochs", type=int, default=20)
    pb.add_argument("--batch-size", type=int, default=256)
    pb.add_argument("--pool-size", type=int, default=0)
    pb.add_argument("--latent", type=int, default=64)
    pb.add_argument("--seed", type=int, default=2000)
    pb.set_defaults(fn=cmd_baseline)

    pg = sub.add_parser("synth", help="generate a synthetic dataset")
    pg.add_argument("--out", required=True)
    pg.add_argument("--users", type=int, default=2000)
    pg.add_argument("--items", type=int, default=1000)
    pg.add_argument("--periods", type=int, default=12)
    pg.add_argument("--interactions", type=int, default=4000)
    pg.add_argument("--first-test", type=int, default=4)
    pg.add_argument("--neg-num", type=int, default=999)
    pg.add_argument("--seed", type=int, default=0)
    pg.set_defaults(fn=cmd_synth)

    pi = sub.add_parser("ingest", help="raw (user,item,timestamp) CSV log "
                                       "-> period-file dataset")
    pi.add_argument("--csv", required=True)
    pi.add_argument("--out", required=True)
    pi.add_argument("--periods", type=int, required=True)
    pi.add_argument("--first-test", type=int, required=True)
    pi.add_argument("--neg-num", type=int, default=999)
    pi.add_argument("--split", default="count", choices=["count", "time"])
    pi.add_argument("--user-col", type=int, default=0)
    pi.add_argument("--item-col", type=int, default=1)
    pi.add_argument("--time-col", type=int, default=2)
    pi.add_argument("--delimiter", default=",")
    pi.add_argument("--skip-header", type=int, default=1)
    pi.add_argument("--seed", type=int, default=0)
    pi.set_defaults(fn=cmd_ingest)

    pr = sub.add_parser("rank", help="exact full-catalog top-K "
                                     "recommendations from trained tables")
    pr.add_argument("--model", required=True,
                    help=".npz with user_emb/item_emb/user_bias/item_bias "
                         "(pretrain output or exported SML tables)")
    g = pr.add_mutually_exclusive_group(required=True)
    g.add_argument("--users", default=None, help="comma list of user ids")
    g.add_argument("--users-file", default=None, help="file of user ids")
    pr.add_argument("-k", type=int, default=20)
    pr.add_argument("--batch-size", type=int, default=1024)
    pr.add_argument("--shard", action="store_true",
                    help="row-shard the item table over all devices")
    pr.add_argument("--bf16", action="store_true",
                    help="score in bfloat16 (MXU native rate, ~2x; "
                         "near-tie ranks may swap)")
    pr.add_argument("--topk-method", default="exact",
                    choices=["exact", "exact_sort", "exact_bucket",
                             "approx", "approx99"],
                    help="'exact' = exact scores (wide catalogs use the "
                         "bucketed two-pass select, narrow ones plain "
                         "lax.top_k); 'exact_sort'/'exact_bucket' pin one "
                         "engine; 'approx'/'approx99' = the TPU's hardware "
                         "PartialReduce at 0.95/0.99 recall per returned K")
    pr.set_defaults(fn=cmd_rank)

    args = p.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from sml_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(args.compile_cache)
    if args.coordinator:
        from sml_tpu.parallel.multihost import init_distributed
        init_distributed(args.coordinator, args.num_processes,
                         args.process_id)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())

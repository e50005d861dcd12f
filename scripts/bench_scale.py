"""Production-scale single-chip benchmark: 5M users / 1M items / d=64.

Exercises the big-table regime of SURVEY.md §7 #8 on one chip (the 50M/5M
north-star config is multi-chip; scripts/scale_check.py validates its
partitioning). Reports, all as device-true timings (K repeats inside one
jitted program — per-dispatch timing is buried by the axon tunnel's ~30 ms
round-trip):

  * SML inner-loop training throughput (examples/s) at reference
    hyper-parameters, dense-Adam semantics (reference
    ``model/transfer.py:417-534``);
  * full-table conv-transfer refresh (the reference's "maybe out of
    memory!!!" op, ``model/transfer.py:884-902``) over all 6M rows,
    fused Pallas kernel vs XLA;
  * full-catalog serving: exact top-K recommendation over all 1M items
    (users/s) — the production path the reference approximates with
    999-negative sampling.

Memory at this shape: MF tables+biases 1.6 GB, last/hat snapshots 3.1 GB,
Adam moments 3.2 GB, transient dense grads 1.5 GB -> ~9.5 GB of 16 GB HBM.

Diagnostics to stderr; one JSON line to stdout. Run exclusively.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap = argparse.ArgumentParser()
ap.add_argument("--users", type=int, default=5_000_000)
ap.add_argument("--items", type=int, default=1_000_000)
ap.add_argument("--steps", type=int, default=100)
ap.add_argument("--skip-train", action="store_true")
ap.add_argument("--fast-adam", action="store_true",
                help="use sparse_dense_adam_update in the train step")
ARGS = ap.parse_args()

N_USERS, N_ITEMS, DIM, BATCH = ARGS.users, ARGS.items, 64, 1024
STEPS = ARGS.steps   # inner steps per timed program
TOPK = 100
SERVE_BATCH = 1024
SERVE_REPS = 50


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    from sml_tpu.config import SMLConfig, TransferConfig
    from sml_tpu.models.mf import init_mf
    from sml_tpu.models.transfer import apply_tables, init_transfer
    from sml_tpu.ops.transfer_kernel import fused_table_transfer, pallas_available
    from sml_tpu.train.optim import torch_adam
    from sml_tpu.train.steps import transferred_pair_loss

    log(f"backend={jax.default_backend()}")
    cfg = SMLConfig(mf_batch_size=BATCH, latent_dim=DIM,
                    transfer=TransferConfig(latent_dim=DIM), mf_sample="all")
    rng = np.random.default_rng(0)

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    mf = init_mf(key, N_USERS, N_ITEMS, DIM, emb_scale=0.1)
    theta = init_transfer(key, cfg.transfer)
    # last/hat snapshots: views of the same init (values don't affect timing)
    last_u = mf.user_emb + 0.01
    last_i = mf.item_emb + 0.01
    tx = torch_adam(cfg.mf_lr)
    opt = tx.init(mf)
    jax.block_until_ready(opt[1].mu.user_emb)
    log(f"state allocated in {time.time() - t0:.1f}s "
        f"(~{(3 * (N_USERS + N_ITEMS) * DIM * 4) / 2**30:.1f} GiB "
        f"tables+moments, plus last/hat snapshots)")

    rows = jnp.asarray(np.stack(
        [rng.integers(0, N_USERS, (STEPS, BATCH)),
         rng.integers(0, N_ITEMS, (STEPS, BATCH)),
         rng.integers(0, N_ITEMS, (STEPS, BATCH))], axis=2), jnp.int32)

    m = jnp.ones((BATCH,), jnp.float32)

    # NOTE: every big array is an explicit jit ARGUMENT — the axon remote
    # compile serializes closed-over device arrays into the compile request
    # and rejects bodies over its length limit (HTTP 413).
    def loss_fn(mfp, lu, li, b):
        u, i, j = b[:, 0], b[:, 1], b[:, 2]
        return transferred_pair_loss(theta, cfg.transfer, lu[u],
                                     li[i], li[j], mfp.user_emb[u],
                                     mfp.item_emb[i], mfp.item_emb[j], m, True)

    import functools

    from sml_tpu.train.optim import TableGrad, sparse_dense_adam_update

    def row_loss(xu, xi, xj, lu_r, li_r, lj_r):
        return transferred_pair_loss(theta, cfg.transfer, lu_r, li_r, lj_r,
                                     xu, xi, xj, m, True)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_steps(mfp, opt, lu, li, rows):
        def body(c, b):
            mfp, opt = c
            if ARGS.fast_adam:
                u, i, j = b[:, 0], b[:, 1], b[:, 2]
                gu, gi, gj = jax.grad(row_loss, argnums=(0, 1, 2))(
                    mfp.user_emb[u], mfp.item_emb[i], mfp.item_emb[j],
                    lu[u], li[i], li[j])
                sparse = {"user_emb": TableGrad(u, gu),
                          "item_emb": TableGrad(jnp.concatenate([i, j]),
                                                jnp.concatenate([gi, gj],
                                                                axis=0))}
                mfp, opt = sparse_dense_adam_update(mfp, opt, sparse,
                                                    lr=cfg.mf_lr)
                return (mfp, opt), jnp.float32(0)
            grads = jax.grad(loss_fn)(mfp, lu, li, b)
            updates, opt = tx.update(grads, opt, mfp)
            return (optax.apply_updates(mfp, updates), opt), jnp.float32(0)
        (mfp, opt), _ = lax.scan(body, (mfp, opt), rows)
        return mfp, opt

    train_ex_s = None
    if not ARGS.skip_train:
        t0 = time.time()
        mf, opt = train_steps(mf, opt, last_u, last_i, rows)
        jax.block_until_ready(mf.user_emb)
        log(f"inner compile+first {STEPS} steps: {time.time() - t0:.1f}s")
        t0 = time.time()
        mf, opt = train_steps(mf, opt, last_u, last_i, rows)
        jax.block_until_ready(mf.user_emb)
        dt = time.time() - t0
        train_ex_s = STEPS * BATCH / dt
        log(f"inner train: {STEPS} steps x {BATCH} in {dt:.2f}s -> "
            f"{train_ex_s:,.0f} ex/s ({dt / STEPS * 1e3:.2f} ms/step)")

    # ---- full-table transfer refresh, XLA vs fused Pallas
    def time_refresh(fn, tag, reps=3):
        @jax.jit
        def run(last_u, hat_u, last_i, hat_i):
            def body(c, _):
                nu, ni = fn(last_u, hat_u + c * 1e-20, last_i, hat_i)
                return nu[0, 0] * 1e-20, (nu[0, 0] + ni[0, 0]) * 1e-20
            c, _ = lax.scan(body, jnp.float32(0), None, length=reps)
            return c
        out = run(last_u, mf.user_emb, last_i, mf.item_emb)
        jax.block_until_ready(out)
        t0 = time.time()
        out = run(last_u, mf.user_emb, last_i, mf.item_emb)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        log(f"refresh[{tag}]: {dt * 1e3:.1f} ms for {N_USERS + N_ITEMS:,} rows")
        return dt

    def xla_refresh(lu, hu, li, hi):
        return apply_tables(theta=theta, last_user=lu, hat_user=hu,
                            last_item=li, hat_item=hi, cfg=cfg.transfer,
                            use_pallas="never")

    refresh_xla = time_refresh(xla_refresh, "xla")
    refresh_pallas = None
    if pallas_available():
        def pallas_refresh(lu, hu, li, hi):
            return (fused_table_transfer(theta.user, lu, hu),
                    fused_table_transfer(theta.item, li, hi))
        refresh_pallas = time_refresh(pallas_refresh, "pallas")

    # ---- full-catalog top-K serving
    users = jnp.asarray(rng.integers(0, N_USERS, (SERVE_REPS, SERVE_BATCH)),
                        jnp.int32)

    def make_serve(compute_dtype):
        @jax.jit
        def serve(mfp, users):
            def body(c, u):
                xu = mfp.user_emb[u]
                it = mfp.item_emb
                if compute_dtype is not None:
                    xu = xu.astype(compute_dtype)
                    it = it.astype(compute_dtype)
                scores = jnp.dot(xu, it.T,
                                 preferred_element_type=jnp.float32)
                _, top = lax.top_k(scores, TOPK)
                return c + top[0, 0] * 0, jnp.int32(0)
            c, _ = lax.scan(body, jnp.int32(0), users)
            return c
        return serve

    serve_results = {}
    for tag, dt_ in (("f32", None), ("bf16", jnp.bfloat16)):
        serve = make_serve(dt_)
        best = None
        out = serve(mf, users)
        jax.block_until_ready(out)
        for _ in range(3):
            t0 = time.time()
            out = serve(mf, users)
            jax.block_until_ready(out)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        serve_users_s = SERVE_REPS * SERVE_BATCH / best
        serve_results[tag] = serve_users_s
        log(f"serving[{tag}]: exact top-{TOPK} over {N_ITEMS:,} items: "
            f"{serve_users_s:,.0f} users/s "
            f"({best / SERVE_REPS * 1e3:.2f} ms / {SERVE_BATCH} users)")
    serve_users_s = serve_results["f32"]

    print(json.dumps({
        "shape": {"users": N_USERS, "items": N_ITEMS, "dim": DIM},
        "inner_train_examples_per_s": (round(train_ex_s, 1)
                                       if train_ex_s else None),
        "refresh_xla_ms": round(refresh_xla * 1e3, 1),
        "refresh_pallas_ms": (round(refresh_pallas * 1e3, 1)
                              if refresh_pallas else None),
        "serving_full_catalog_users_per_s": round(serve_users_s, 1),
        "serving_bf16_users_per_s": round(serve_results["bf16"], 1),
    }))


if __name__ == "__main__":
    main()

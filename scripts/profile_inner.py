"""Decompose the SML inner-step cost on the current backend.

Every variant runs as ONE device program — a ``lax.scan`` over STEPS
steps — because on the axon tunnel each dispatch pays a ~30 ms host
round-trip, which buries per-call timings. Variants, at the bench
workload shape (100k users / 20k items / d=64, batch 1024):

  adam_only     dense torch-Adam update of the MF pytree from fixed grads —
                the pure full-table HBM-traffic floor;
  plain_mf      dot-product BCE step (gather + scatter-grad + dense Adam);
  sml_inner     the real thing — loss through the frozen conv transfer;
  transfer_only theta-grads of the transferred loss, no table update.

Diagnostics to stderr, one JSON summary to stdout. Run exclusively (one
TPU process at a time).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_USERS, N_ITEMS, DIM, BATCH = 100_000, 20_000, 64, 1024
STEPS = 200


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    from sml_tpu.config import SMLConfig, TransferConfig
    from sml_tpu.models.mf import init_mf
    from sml_tpu.models.transfer import init_transfer
    from sml_tpu.ops.losses import bce_pair_loss
    from sml_tpu.train.optim import torch_adam
    from sml_tpu.train.steps import transferred_pair_loss

    log(f"backend={jax.default_backend()}")
    cfg = SMLConfig(mf_batch_size=BATCH, latent_dim=DIM,
                    transfer=TransferConfig(latent_dim=DIM), mf_sample="all")
    rng = np.random.default_rng(0)
    rows = jnp.asarray(np.stack([rng.integers(0, N_USERS, (STEPS, BATCH)),
                                 rng.integers(0, N_ITEMS, (STEPS, BATCH)),
                                 rng.integers(0, N_ITEMS, (STEPS, BATCH))],
                                axis=2), jnp.int32)   # (STEPS, BATCH, 3)

    key = jax.random.PRNGKey(0)
    mf = init_mf(key, N_USERS, N_ITEMS, DIM)
    theta = init_transfer(key, cfg.transfer)
    last_u = jnp.asarray(rng.normal(0, 0.1, (N_USERS, DIM)), jnp.float32)
    last_i = jnp.asarray(rng.normal(0, 0.1, (N_ITEMS, DIM)), jnp.float32)
    tx = torch_adam(cfg.mf_lr)
    opt0 = tx.init(mf)
    m = jnp.ones((BATCH,), jnp.float32)

    def sml_loss(mfp, b):
        u, i, j = b[:, 0], b[:, 1], b[:, 2]
        return transferred_pair_loss(theta, cfg.transfer, last_u[u], last_i[i],
                                     last_i[j], mfp.user_emb[u],
                                     mfp.item_emb[i], mfp.item_emb[j], m, True)

    def mf_loss(mfp, b):
        u, i, j = b[:, 0], b[:, 1], b[:, 2]
        pos = jnp.sum(mfp.user_emb[u] * mfp.item_emb[i], axis=-1)
        neg = jnp.sum(mfp.user_emb[u] * mfp.item_emb[j], axis=-1)
        return bce_pair_loss(pos, neg, m)

    fixed_grads = jax.jit(lambda mfp: jax.grad(sml_loss)(mfp, rows[0]))(mf)
    fixed_grads = jax.tree.map(lambda x: x + 0.0, fixed_grads)

    def scan_of(step):
        @jax.jit
        def run(mfp, opt):
            def body(c, b):
                mfp, opt = step(*c, b)
                return (mfp, opt), jnp.float32(0)
            (mfp, opt), _ = lax.scan(body, (mfp, opt), rows)
            return mfp
        return run

    def adam_only_step(mfp, opt, b):
        updates, opt = tx.update(fixed_grads, opt, mfp)
        return optax.apply_updates(mfp, updates), opt

    def plain_step(mfp, opt, b):
        grads = jax.grad(mf_loss)(mfp, b)
        updates, opt = tx.update(grads, opt, mfp)
        return optax.apply_updates(mfp, updates), opt

    def sml_step(mfp, opt, b):
        grads = jax.grad(sml_loss)(mfp, b)
        updates, opt = tx.update(grads, opt, mfp)
        return optax.apply_updates(mfp, updates), opt

    def transfer_only_step(mfp, opt, b):
        g = jax.grad(lambda th: transferred_pair_loss(
            th, cfg.transfer, last_u[b[:, 0]], last_i[b[:, 1]],
            last_i[b[:, 2]], mfp.user_emb[b[:, 0]], mfp.item_emb[b[:, 1]],
            mfp.item_emb[b[:, 2]], m, True))(theta)
        # keep mfp data-dependent on g so the scan isn't DCE'd
        leak = jax.tree.leaves(g)[0].reshape(-1)[0]
        mfp = mfp._replace(user_emb=mfp.user_emb + 0.0 * leak)
        return mfp, opt

    def row_grads_only_step(mfp, opt, b):
        """Gather + loss fwd/bwd wrt the GATHERED rows — no dense scatter,
        no Adam."""
        u, i, j = b[:, 0], b[:, 1], b[:, 2]

        def loss(xu, xi, xj):
            pos = jnp.sum(xu * xi, axis=-1)
            neg = jnp.sum(xu * xj, axis=-1)
            return bce_pair_loss(pos, neg, m)

        gu, gi, gj = jax.grad(loss, argnums=(0, 1, 2))(
            mfp.user_emb[u], mfp.item_emb[i], mfp.item_emb[j])
        leak = gu[0, 0] + gi[0, 0] + gj[0, 0]
        return mfp._replace(user_emb=mfp.user_emb + 0.0 * leak), opt

    def scatter_only_step(mfp, opt, b):
        """Dense-grad materialization alone: zeros + scatter-add + consume."""
        u, i, j = b[:, 0], b[:, 1], b[:, 2]
        gu = mfp.user_emb[u] * 0.5
        gi = mfp.item_emb[i] * 0.5
        gj = mfp.item_emb[j] * 0.5
        du = jnp.zeros_like(mfp.user_emb).at[u].add(gu)
        di = jnp.zeros_like(mfp.item_emb).at[i].add(gi).at[j].add(gj)
        return mfp._replace(user_emb=mfp.user_emb + 1e-30 * du,
                            item_emb=mfp.item_emb + 1e-30 * di), opt

    def scatter_sorted_step(mfp, opt, b):
        """Same, but indices sorted first + indices_are_sorted=True."""
        u, i, j = b[:, 0], b[:, 1], b[:, 2]
        gu = mfp.user_emb[u] * 0.5
        ij = jnp.concatenate([i, j])
        gij = jnp.concatenate([mfp.item_emb[i], mfp.item_emb[j]]) * 0.5
        su = jnp.argsort(u)
        sij = jnp.argsort(ij)
        du = jnp.zeros_like(mfp.user_emb).at[u[su]].add(
            gu[su], indices_are_sorted=True)
        di = jnp.zeros_like(mfp.item_emb).at[ij[sij]].add(
            gij[sij], indices_are_sorted=True)
        return mfp._replace(user_emb=mfp.user_emb + 1e-30 * du,
                            item_emb=mfp.item_emb + 1e-30 * di), opt

    from sml_tpu.train.optim import TableGrad, sparse_dense_adam_update

    def sml_fast_step(mfp, opt, b):
        """SML inner step via the row-sparse exact-dense Adam."""
        u, i, j = b[:, 0], b[:, 1], b[:, 2]

        def loss(xu, xi, xj):
            return transferred_pair_loss(theta, cfg.transfer, last_u[u],
                                         last_i[i], last_i[j], xu, xi, xj,
                                         m, True)

        gu, gi, gj = jax.grad(loss, argnums=(0, 1, 2))(
            mfp.user_emb[u], mfp.item_emb[i], mfp.item_emb[j])
        sparse = {"user_emb": TableGrad(u, gu),
                  "item_emb": TableGrad(jnp.concatenate([i, j]),
                                        jnp.concatenate([gi, gj], axis=0))}
        return sparse_dense_adam_update(mfp, opt, sparse, lr=cfg.mf_lr)

    results = {}
    for tag, step in [("adam_only", adam_only_step),
                      ("sml_fast", sml_fast_step),
                      ("plain_mf", plain_step),
                      ("sml_inner", sml_step),
                      ("transfer_only", transfer_only_step),
                      ("row_grads_only", row_grads_only_step),
                      ("scatter_only", scatter_only_step),
                      ("scatter_sorted", scatter_sorted_step)]:
        run = scan_of(step)
        out = run(mf, opt0)                       # compile + 1st run
        float(out.user_emb[0, 0])
        t0 = time.time()
        out = run(mf, opt0)
        float(out.user_emb[0, 0])
        per_step = (time.time() - t0) / STEPS * 1e3
        log(f"{tag}: {per_step:.3f} ms/step ({STEPS}-step scan)")
        results[tag + "_ms"] = round(per_step, 3)

    print(json.dumps(results))


if __name__ == "__main__":
    main()

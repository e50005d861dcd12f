"""Jitted training epochs: the reference's Python batch loops as lax.scans.

Each epoch is ONE device program: shuffle (real rows first), then scan over a
bucketed batch count, `lax.cond`-skipping tail batches so the optimizer step
count equals the reference's ``ceil(N/B)`` exactly and Adam moments are never
decayed by phantom steps.

Gradient-flow fidelity (the SURVEY.md §7 "hard part"):

* inner epoch (``MF_train_onestage``, ``model/transfer.py:417-534``): the
  loss is computed **through the frozen transfer** — lookups of the
  ``last`` snapshots are constants, MF-table lookups are the trainable
  W_hat-in-progress, and only the MF pytree is differentiated (the reference
  zeroes Θ's grads and steps only ``MF_optimizer``, ``:464-511``);
* outer epoch (``transfer_train_onestage``, ``:644-749``): lookups come from
  the detached ``last``/``hat`` snapshot tables (plain tensors in the
  reference, ``:707-712``) so only Θ receives gradients — the first-order
  meta-gradient of the paper's Eq. 8. Here that is simply "differentiate
  w.r.t. theta with the tables as non-diff arguments".
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax import lax

from sml_tpu.config import SMLConfig, TransferConfig
from sml_tpu.models.transfer import TransferParams, apply_rows
from sml_tpu.ops.batching import num_batches, shuffle_real_first
from sml_tpu.ops.losses import bce_pair_loss, bpr_loss, l2_embedding_penalty
from sml_tpu.ops.sampling import PeriodIndex, sample_negatives
from sml_tpu.train.optim import TableGrad, sparse_dense_adam_update


def scan_epoch(carry, rows, mask, n_real, key, batch_size, step_fn,
               shuffle=True):
    """Shuffle + scan one epoch. ``step_fn(carry, rows_b, mask_b, key) ->
    (carry, loss)``; tail batches beyond ``ceil(n_real/B)`` are skipped.
    ``shuffle=False`` (replay mode) consumes rows in their given order."""
    kshuf, kscan = jax.random.split(key)
    if shuffle:
        rows, mask = shuffle_real_first(kshuf, rows, mask)
    nb_max = rows.shape[0] // batch_size
    nb_real = num_batches(n_real, batch_size)
    keys = jax.random.split(kscan, nb_max)

    def body(c, xs):
        i, k = xs

        def real(c):
            r = lax.dynamic_slice_in_dim(rows, i * batch_size, batch_size)
            m = lax.dynamic_slice_in_dim(mask, i * batch_size, batch_size)
            return step_fn(c, r, m, k)

        def skip(c):
            return c, jnp.float32(0.0)

        return lax.cond(i < nb_real, real, skip, c)

    carry, losses = lax.scan(body, carry, (jnp.arange(nb_max), keys))
    return carry, losses


def transferred_pair_loss(theta: TransferParams, tcfg: TransferConfig,
                          lu, li, lj, xu, xi, xj, mask, use_bce: bool):
    """Score a (u, i, j) triple through Θ and reduce to the SML loss
    (``ConvTransfer_com.run_MF``, ``conv_transfer.py:113-135``).

    The positive and negative item rows go through the item tower as ONE
    concatenated batch — a single (2B, ·) MXU matmul chain instead of two
    (B, ·) ones.
    """
    b = xu.shape[0]
    nu = apply_rows(theta, tcfg, "user", lu, xu)
    nij = apply_rows(theta, tcfg, "item",
                     jnp.concatenate([li, lj], axis=0),
                     jnp.concatenate([xi, xj], axis=0))
    pos = jnp.sum(nu * nij[:b], axis=-1)
    neg = jnp.sum(nu * nij[b:], axis=-1)
    if use_bce:
        return bce_pair_loss(pos, neg, mask)
    return bpr_loss(pos, neg, mask)


def _epoch_triples(rows, key, mode):
    """Narrow the epoch's rows to (n, 2|3) BEFORE shuffling.

    'all' mode rows are eval-format (n, 2 + neg_num); materializing the
    chosen negative column up front means the shuffle and the per-batch
    slices move 3 int32 columns instead of the whole presampled pool
    (1001 columns for the reference format) every epoch.
    """
    if mode != "all":
        return rows
    col = jax.random.randint(key, (), 0, rows.shape[1] - 2)
    j = lax.dynamic_slice_in_dim(rows, 2 + col, 1, axis=1)[:, 0]
    return jnp.stack([rows[:, 0], rows[:, 1], j], axis=1)


def _g32(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather rows and upcast to f32: snapshot tables may be stored bf16
    (``SMLConfig.snapshot_dtype``) but all loss math runs in f32."""
    return table[idx].astype(jnp.float32)


def make_inner_epoch(cfg: SMLConfig, mf_tx: optax.GradientTransformation):
    """Inner (MF) epoch; trains the MF pytree through frozen Θ.

    With ``cfg.fast_table_adam`` (default) the optimizer step differentiates
    w.r.t. the GATHERED embedding rows and applies
    :func:`sparse_dense_adam_update` — same numbers as the dense-gradient
    path, two fewer full-table memory passes per step.
    """
    tcfg = cfg.transfer
    batch = cfg.mf_batch_size
    mode = "replay" if cfg.replay_mode else cfg.mf_sample

    def row_loss(xu, xi, xj, theta, lu, li, lj, m):
        loss = transferred_pair_loss(theta, tcfg, lu, li, lj,
                                     xu, xi, xj, m, cfg.use_bce)
        # l2 * 0.5 * sum over batch embeddings (transfer.py:486-488)
        return loss + cfg.mf_l2 * l2_embedding_penalty(m, xu, xi, xj)

    def loss_fn(mfp, theta, last_u, last_i, u, i, j, m):
        return row_loss(mfp.user_emb[u], mfp.item_emb[i], mfp.item_emb[j],
                        theta, _g32(last_u, u), _g32(last_i, i),
                        _g32(last_i, j), m)

    def epoch(mfp, opt, theta, last_u, last_i, rows, mask, n_real, key,
              index: Optional[PeriodIndex] = None):
        kcol, krest = jax.random.split(key)
        rows = _epoch_triples(rows, kcol, mode)

        def step(c, r, m, k):
            mfp, opt = c
            u, i = r[:, 0], r[:, 1]
            if mode in ("all", "replay"):
                j = r[:, 2]
            else:
                j = sample_negatives(index, u, k, cfg.neg_tries)
            if cfg.fast_table_adam:
                # NOTE: this branch reimplements mf_tx =
                # torch_adam(cfg.mf_lr, weight_decay=0) with the shared
                # ADAM_B1/B2/EPS defaults; if the engine's MF optimizer ever
                # grows a schedule or decay, it must be threaded here too
                loss, (gu, gi, gj) = jax.value_and_grad(
                    row_loss, argnums=(0, 1, 2))(
                    mfp.user_emb[u], mfp.item_emb[i], mfp.item_emb[j],
                    theta, _g32(last_u, u), _g32(last_i, i),
                    _g32(last_i, j), m)
                sparse = {
                    "user_emb": TableGrad(u, gu),
                    "item_emb": TableGrad(jnp.concatenate([i, j]),
                                          jnp.concatenate([gi, gj], axis=0)),
                }
                mfp, opt = sparse_dense_adam_update(mfp, opt, sparse,
                                                    lr=cfg.mf_lr)
                return (mfp, opt), loss
            loss, grads = jax.value_and_grad(loss_fn)(
                mfp, theta, last_u, last_i, u, i, j, m)
            updates, opt = mf_tx.update(grads, opt, mfp)
            mfp = optax.apply_updates(mfp, updates)
            return (mfp, opt), loss

        (mfp, opt), losses = scan_epoch((mfp, opt), rows, mask, n_real,
                                        krest, batch, step,
                                        shuffle=mode != "replay")
        return mfp, opt, losses

    return epoch


def make_outer_epoch(cfg: SMLConfig, tr_tx: optax.GradientTransformation):
    """Outer (transfer) epoch; trains Θ on detached snapshot lookups."""
    tcfg = cfg.transfer
    batch = cfg.tr_batch_size
    mode = "replay" if cfg.replay_mode else cfg.tr_sample_type

    def loss_fn(theta, last_u, last_i, hat_u, hat_i, u, i, j, m):
        return transferred_pair_loss(
            theta, tcfg, _g32(last_u, u), _g32(last_i, i), _g32(last_i, j),
            _g32(hat_u, u), _g32(hat_i, i), _g32(hat_i, j), m, cfg.use_bce)

    def epoch(theta, opt, last_u, last_i, hat_u, hat_i, rows, mask, n_real,
              key, index: Optional[PeriodIndex] = None):
        kcol, krest = jax.random.split(key)
        rows = _epoch_triples(rows, kcol, mode)

        def step(c, r, m, k):
            theta, opt = c
            u, i = r[:, 0], r[:, 1]
            if mode in ("all", "replay"):
                j = r[:, 2]
            else:
                j = sample_negatives(index, u, k, cfg.neg_tries)
            loss, grads = jax.value_and_grad(loss_fn)(
                theta, last_u, last_i, hat_u, hat_i, u, i, j, m)
            updates, opt = tr_tx.update(grads, opt, theta)
            theta = optax.apply_updates(theta, updates)
            return (theta, opt), loss

        (theta, opt), losses = scan_epoch((theta, opt), rows, mask, n_real,
                                          krest, batch, step,
                                          shuffle=mode != "replay")
        return theta, opt, losses

    return epoch


def make_plain_mf_epoch(batch_size: int, l2_user: float, l2_item: float,
                        tx: optax.GradientTransformation, neg_tries: int = 16,
                        biased: bool = False, fast_lr: Optional[float] = None):
    """Plain BCE-MF epoch for the pretrainer / full-retrain / fine-tune
    baselines (``model/baseline.py:179-201,338-361``): mean-BCE plus per-side
    summed L2, uniform rejection-sampled negatives.

    ``fast_lr``: when set (and ``biased`` is False), the step uses
    :func:`sparse_dense_adam_update` at that learning rate instead of the
    dense-gradient optax path — identical numbers, less HBM traffic. The
    biased variant scores through the bias tables, whose row-sparse grads
    aren't plumbed here, so it keeps the dense path.
    """
    from sml_tpu.models.mf import score_pairs, score_pairs_biased
    score = score_pairs_biased if biased else score_pairs

    def row_loss(xu, xi, xj, m):
        pos = jnp.sum(xu * xi, axis=-1)
        neg = jnp.sum(xu * xj, axis=-1)
        bce = bce_pair_loss(pos, neg, m)
        l2 = l2_user * l2_embedding_penalty(m, xu) \
            + l2_item * l2_embedding_penalty(m, xi, xj)
        return bce + l2

    def loss_fn(mfp, u, i, j, m):
        pos = score(mfp, u, i)
        neg = score(mfp, u, j)
        xu = mfp.user_emb[u]
        xi = mfp.item_emb[i]
        xj = mfp.item_emb[j]
        bce = bce_pair_loss(pos, neg, m)
        l2 = l2_user * l2_embedding_penalty(m, xu) \
            + l2_item * l2_embedding_penalty(m, xi, xj)
        return bce + l2

    use_fast = fast_lr is not None and not biased

    def epoch(mfp, opt, rows, mask, n_real, key, index: PeriodIndex):
        def step(c, r, m, k):
            mfp, opt = c
            u, i = r[:, 0], r[:, 1]
            j = sample_negatives(index, u, k, neg_tries)
            if use_fast:
                loss, (gu, gi, gj) = jax.value_and_grad(
                    row_loss, argnums=(0, 1, 2))(
                    mfp.user_emb[u], mfp.item_emb[i], mfp.item_emb[j], m)
                sparse = {
                    "user_emb": TableGrad(u, gu),
                    "item_emb": TableGrad(jnp.concatenate([i, j]),
                                          jnp.concatenate([gi, gj], axis=0)),
                }
                mfp, opt = sparse_dense_adam_update(mfp, opt, sparse,
                                                    lr=fast_lr)
                return (mfp, opt), loss
            loss, grads = jax.value_and_grad(loss_fn)(mfp, u, i, j, m)
            updates, opt = tx.update(grads, opt, mfp)
            mfp = optax.apply_updates(mfp, updates)
            return (mfp, opt), loss

        (mfp, opt), losses = scan_epoch((mfp, opt), rows, mask, n_real,
                                        key, batch_size, step)
        return mfp, opt, losses

    return epoch

"""Pairwise ranking losses, masked for static-shape padding.

The live SML loss is the "BCE" pair form (``model/conv_transfer.py:122-126``;
also the pretrainer / baselines, ``model/baseline.py:196-198,275-276``):

    L = -mean(log(sigmoid(s_pos) + 1e-15)) - mean(log(1 - sigmoid(s_neg) + 1e-15))

and the alternative is summed BPR: ``-sum(logsigmoid(s_pos - s_neg))``
(``conv_transfer.py:128-134``). Means/sums here run over *valid* rows only
(``mask``), which makes padded batches exactly equivalent to the reference's
variable-size final batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-15


def bce_pair_loss(pos_score: jax.Array, neg_score: jax.Array,
                  mask: jax.Array) -> jax.Array:
    """Masked mean BCE over a (positive, negative) score pair batch.

    The negative term uses ``sigmoid(-x) == 1 - sigmoid(x)``: writing the
    reference's literal ``1 - sigmoid(x) + eps`` invites XLA's algebraic
    simplifier to constant-fold ``1 + eps -> 1`` in f32 and reassociate to
    ``1 - sigmoid(x)``, which is exactly 0 for x ≳ 17 — log(0) = -inf. The
    flipped form is mathematically identical and strictly more accurate in
    the saturated regime.
    """
    denom = jnp.maximum(mask.sum(), 1.0)
    pos = -jnp.sum(mask * jnp.log(jax.nn.sigmoid(pos_score) + _EPS)) / denom
    neg = -jnp.sum(mask * jnp.log(jax.nn.sigmoid(-neg_score) + _EPS)) / denom
    return pos + neg


def bpr_loss(pos_score: jax.Array, neg_score: jax.Array,
             mask: jax.Array, normalize_by: jax.Array | None = None) -> jax.Array:
    """Masked summed BPR; optional per-row score normalization
    (the reference's ``norm=True`` path, ``conv_transfer.py:129-131``)."""
    diff = pos_score - neg_score
    if normalize_by is not None:
        diff = diff / normalize_by
    return -jnp.sum(mask * jax.nn.log_sigmoid(diff))


def l2_embedding_penalty(mask: jax.Array, *embs: jax.Array) -> jax.Array:
    """``0.5 * sum(emb**2)`` over valid rows (``model/transfer.py:486``)."""
    total = 0.0
    for e in embs:
        total = total + jnp.sum(mask[:, None] * e * e)
    return 0.5 * total

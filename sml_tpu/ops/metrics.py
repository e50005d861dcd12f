"""Ranking metrics, vectorized and jit-friendly.

The reference's eval protocol (``model/MF.py:45-80``): each eval row is
``[user, pos_item, neg_1..neg_C]``; score all 1+C candidates with the dot
product; the positive "hits" at K iff its rank among candidates is < K, and
contributes ``1/log2(rank+2)`` NDCG. The positional trick (candidate 0 is
the target, ``evalution/evalution_function.py:3-11``) becomes a simple
strictly-greater count here: ``rank = #{j >= 1 : s_j > s_0}``. Ties are
broken in favor of the target (the reference's topk tie behavior is
unspecified; with float scores, exact ties are measure-zero).

Also provides the multi-target metric kernels matching
``evalution/evalution_function.py`` (hit / precision / recall / NDCG / MRR /
MAP over a ranklist using the positional-index encoding).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp


def rank_of_target(scores: jax.Array) -> jax.Array:
    """Rank (0-based) of candidate 0 among all candidates, per row.

    ``scores``: (B, 1+C). Returns int32 (B,).
    """
    pos = scores[:, :1]
    return jnp.sum((scores[:, 1:] > pos), axis=1).astype(jnp.int32)


def hits_and_ndcg_at(rank: jax.Array, mask: jax.Array,
                     topks: Sequence[int]) -> Dict[int, Tuple[jax.Array, jax.Array]]:
    """Masked hit and NDCG sums at each K for a batch of target ranks.

    NDCG per hit row is ``1/log2(rank+2)`` (``model/MF.py:74``); a single
    relevant item means IDCG == 1.
    """
    out = {}
    ndcg_all = 1.0 / jnp.log2(rank.astype(jnp.float32) + 2.0)
    for k in topks:
        hit = (rank < k).astype(jnp.float32) * mask
        out[k] = (hit.sum(), (hit * ndcg_all).sum())
    return out


def weighted_period_average(values, counts, val_fraction: float = 1.0 / 3.0,
                            drop_last_test: bool = True):
    """The reference's end-of-run aggregation (``model/transfer.py:991-1025``).

    First ``round(T * val_fraction)`` test periods are validation; the rest
    are test. Each side is weighted by its per-period eval counts. The
    reference's slice ``[N3:-1]`` EXCLUDES the final test period from the
    test average (``transfer.py:994``); reproduced when
    ``drop_last_test=True``. The baselines use ``[N3:]`` instead
    (``baseline.py:546``) — pass ``drop_last_test=False`` for that protocol.

    Returns ``(val_avg, test_avg)`` (numpy scalars or arrays if ``values``
    rows are vectors).
    """
    import numpy as np
    values = np.asarray(values, dtype=np.float64)
    counts = np.asarray(counts, dtype=np.float64)
    n3 = round(counts.shape[0] * val_fraction)
    val_w = counts[:n3] / max(counts[:n3].sum(), 1.0)
    sl = slice(n3, -1) if drop_last_test else slice(n3, None)
    test_w = counts[sl] / max(counts[sl].sum(), 1.0)
    val_avg = (values[:n3].T * val_w).T.sum(axis=0)
    test_avg = (values[sl].T * test_w).T.sum(axis=0)
    return val_avg, test_avg


# ---------------------------------------------------------------------------
# Multi-target ranklist kernels (parity with evalution/evalution_function.py).
# ``ranklist`` holds candidate *indices* sorted by score; targets are encoded
# as indices 0..n_targets-1 (the positional trick, evalution_function.py:5-10).
# ---------------------------------------------------------------------------

def _target_positions(ranklist: jax.Array, n_targets: int) -> jax.Array:
    """Boolean mask over ranklist positions that hold a target item."""
    return ranklist < n_targets


def hit_count(ranklist: jax.Array, n_targets: int) -> jax.Array:
    return jnp.sum(_target_positions(ranklist, n_targets))


def precision_at(ranklist: jax.Array, n_targets: int, topk: int) -> jax.Array:
    return hit_count(ranklist, n_targets) / topk


def recall_at(ranklist: jax.Array, n_targets: int) -> jax.Array:
    return hit_count(ranklist, n_targets) / n_targets


def idcg(n: int) -> jax.Array:
    """Ideal DCG for n relevant items (``evalution_function.py:86-95``)."""
    arr = jnp.arange(n, dtype=jnp.float32) + 2.0
    return jnp.sum(1.0 / jnp.log2(arr))


def ndcg(ranklist: jax.Array, n_targets: int) -> jax.Array:
    hits = _target_positions(ranklist, n_targets)
    pos = jnp.arange(ranklist.shape[0], dtype=jnp.float32)
    dcg = jnp.sum(jnp.where(hits, 1.0 / jnp.log2(pos + 2.0), 0.0))
    return dcg / idcg(n_targets)


def rec_ndcg(ranklist: jax.Array, n_targets: int):
    """(recall, ndcg) pair (``evalution_function.py:26-39``)."""
    return recall_at(ranklist, n_targets), ndcg(ranklist, n_targets)


def mrr(ranklist: jax.Array, n_targets: int) -> jax.Array:
    hits = _target_positions(ranklist, n_targets)
    pos = jnp.arange(ranklist.shape[0], dtype=jnp.float32)
    first = jnp.min(jnp.where(hits, pos, jnp.inf))
    return jnp.where(jnp.isfinite(first), 1.0 / (first + 1.0), 0.0)


def average_precision(ranklist: jax.Array, n_targets: int) -> jax.Array:
    """MAP kernel (``evalution_function.py:114-133``): precision at each hit
    position, normalized by min(len(ranklist), n_targets)."""
    hits = _target_positions(ranklist, n_targets).astype(jnp.float32)
    pos = jnp.arange(ranklist.shape[0], dtype=jnp.float32) + 1.0
    cum_hits = jnp.cumsum(hits)
    precs = jnp.where(hits > 0, cum_hits / pos, 0.0)
    denom = min(ranklist.shape[0], n_targets) * 1.0
    return jnp.sum(precs) / denom

"""Batched leave-one-out evaluation, fully on device.

Replaces the reference's DataLoader-driven eval loop
(``evalution/evaluation2.py:8-26`` calling ``MFbasemode.test``,
``model/MF.py:45-80``) with a single jitted scan that scores every
``[user, pos, negs...]`` row, ranks the positive by a strictly-greater count,
and accumulates hit/NDCG sums for ALL requested K values in one pass (the
reference re-runs topk per K, ``model/transfer.py:810-823``).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from sml_tpu.models.mf import MFParams, score_candidates
from sml_tpu.ops.metrics import hits_and_ndcg_at, rank_of_target


def make_eval_fn(topks: Sequence[int], batch_size: int):
    """Build ``evaluate(mf, rows, mask) -> {K: (hit_sum, ndcg_sum)}``.

    ``rows``: (n_pad, 2 + C) int32, ``mask``: (n_pad,). Padded rows
    contribute zero via the mask, so no cond-skip is needed.
    """
    topks = tuple(topks)

    def evaluate(mfp: MFParams, rows: jax.Array, mask: jax.Array
                 ) -> Dict[int, Tuple[jax.Array, jax.Array]]:
        nb = rows.shape[0] // batch_size

        def body(acc, i):
            r = lax.dynamic_slice_in_dim(rows, i * batch_size, batch_size)
            m = lax.dynamic_slice_in_dim(mask, i * batch_size, batch_size)
            scores = score_candidates(mfp, r[:, 0], r[:, 1:])
            rank = rank_of_target(scores)
            res = hits_and_ndcg_at(rank, m, topks)
            return {k: (acc[k][0] + res[k][0], acc[k][1] + res[k][1])
                    for k in topks}, None

        acc0 = {k: (jnp.float32(0.0), jnp.float32(0.0)) for k in topks}
        acc, _ = lax.scan(body, acc0, jnp.arange(nb))
        return acc

    return evaluate


def make_attributed_eval_fn(topks: Sequence[int], batch_size: int):
    """Evaluation with hit attribution by entity freshness.

    Capability parity with ``test_hit_new`` / ``test_model_pre``
    (``model/baseline.py:18-30``, ``evalution/evaluation2.py:28-70``):
    besides hit/NDCG sums per K, counts how many hits fall on *new* users /
    *new* items (ids first seen during the test span) and the four
    old/new-user x old/new-item buckets at the largest K.

    ``is_new_user``: (U,) bool device array; ``is_new_item``: (I,) bool.
    """
    topks = tuple(topks)
    kmax = max(topks)

    def evaluate(mfp: MFParams, rows: jax.Array, mask: jax.Array,
                 is_new_user: jax.Array, is_new_item: jax.Array):
        nb = rows.shape[0] // batch_size

        def body(acc, i):
            base, new_u, new_i, buckets = acc
            r = lax.dynamic_slice_in_dim(rows, i * batch_size, batch_size)
            m = lax.dynamic_slice_in_dim(mask, i * batch_size, batch_size)
            scores = score_candidates(mfp, r[:, 0], r[:, 1:])
            rank = rank_of_target(scores)
            res = hits_and_ndcg_at(rank, m, topks)
            base = {k: (base[k][0] + res[k][0], base[k][1] + res[k][1])
                    for k in topks}
            nu = is_new_user[r[:, 0]]
            ni = is_new_item[r[:, 1]]
            new_u_hits = []
            new_i_hits = []
            for k in topks:
                hit = (rank < k).astype(jnp.float32) * m
                new_u_hits.append(jnp.sum(hit * nu))
                new_i_hits.append(jnp.sum(hit * ni))
            hit_kmax = (rank < kmax).astype(jnp.float32) * m
            b = jnp.stack([
                jnp.sum(hit_kmax * (1 - nu) * (1 - ni)),   # old u, old i
                jnp.sum(hit_kmax * (1 - nu) * ni),         # old u, new i
                jnp.sum(hit_kmax * nu * (1 - ni)),         # new u, old i
                jnp.sum(hit_kmax * nu * ni),               # new u, new i
            ])
            return (base,
                    tuple(a + h for a, h in zip(new_u, new_u_hits)),
                    tuple(a + h for a, h in zip(new_i, new_i_hits)),
                    buckets + b), None

        acc0 = ({k: (jnp.float32(0.0), jnp.float32(0.0)) for k in topks},
                tuple(jnp.float32(0.0) for _ in topks),
                tuple(jnp.float32(0.0) for _ in topks),
                jnp.zeros(4, jnp.float32))
        acc, _ = lax.scan(body, acc0, jnp.arange(nb))
        base, new_u, new_i, buckets = acc
        return {"base": base,
                "hit_new_user": dict(zip(topks, new_u)),
                "hit_new_item": dict(zip(topks, new_i)),
                "buckets_at_max_k": buckets}

    return evaluate

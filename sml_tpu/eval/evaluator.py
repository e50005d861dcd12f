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

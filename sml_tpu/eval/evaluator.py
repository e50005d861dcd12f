"""Batched leave-one-out evaluation, fully on device.

Replaces the reference's DataLoader-driven eval loop
(``evalution/evaluation2.py:8-26`` calling ``MFbasemode.test``,
``model/MF.py:45-80``) with a single jitted scan that scores every
``[user, pos, negs...]`` row, ranks the positive by a strictly-greater count,
and accumulates hit/NDCG sums for ALL requested K values in one pass (the
reference re-runs topk per K, ``model/transfer.py:810-823``).

Scoring modes (``scoring=``):

``gather``       the reference semantics verbatim: gather the C+1 candidate
                 embedding rows per example and dot them (``MF.py:50-57``).
                 Exact, but each row costs C random 4·d-byte HBM reads —
                 the round-3 roofline put this at 7.4% of HBM peak.
``matmul``       score ALL items on the MXU, ``(B,d)@(d,I)``, then pick the
                 candidate columns with a 4-byte row-local gather. Streams
                 the item table instead of random-reading it; reduction
                 runs on the MXU in a different order, so scores can differ
                 from ``gather`` by f32 rounding (observed: ≤1 rank flip
                 per ~16k rows on random tables).
``gather_bf16``/
``matmul_bf16``  same data movement with bf16 tables (cast once per eval,
                 outside the scan) and f32 accumulation — halves the hot
                 traffic again; metric drift stays at bf16-input tolerance.
``auto``         ``matmul`` when the score matrix is cheaper to stream than
                 the candidate rows (items ≤ 48·C), else ``gather``. Shapes
                 are static under jit, so the choice is made at trace time.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from sml_tpu.models.mf import MFParams
from sml_tpu.ops.metrics import hits_and_ndcg_at, rank_of_target

SCORING_MODES = ("gather", "matmul", "gather_bf16", "matmul_bf16", "auto")


def _resolve_mode(scoring: str, n_items: int, n_cand: int) -> str:
    if scoring == "auto":
        # streaming the (B, I) score matrix costs I·4 bytes/row; gathering
        # candidate rows costs C·4·d bytes/row (d=64 ⇒ 256 B each, served
        # at single-digit % of HBM peak). 48·C keeps a safety margin for
        # the score-pick pass re-reading hot score rows.
        return "matmul" if n_items <= 48 * n_cand else "gather"
    if scoring not in SCORING_MODES:
        raise ValueError(f"unknown eval scoring mode: {scoring!r}")
    return scoring


def _make_scorer(scoring: str):
    """Returns ``(prep, score)``: ``prep(mfp) -> ctx`` once per eval (casts
    live here so the scan body stays cheap), ``score(ctx, users, cand)``
    per batch."""

    def prep(mfp: MFParams):
        if scoring.endswith("bf16"):
            return (mfp.user_emb.astype(jnp.bfloat16),
                    mfp.item_emb.astype(jnp.bfloat16))
        return (mfp.user_emb, mfp.item_emb)

    def score(ctx, users: jax.Array, cand: jax.Array) -> jax.Array:
        ue_t, ie_t = ctx
        mode = _resolve_mode(scoring, ie_t.shape[0], cand.shape[1])
        if mode.startswith("matmul"):
            all_s = jax.lax.dot_general(
                ue_t[users], ie_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (B, I)
            return jnp.take_along_axis(all_s, cand, axis=1)
        ue = ue_t[users]                                   # (B, d)
        ce = ie_t[cand]                                    # (B, C, d)
        return jnp.einsum("bd,bcd->bc", ue, ce,
                          preferred_element_type=jnp.float32)

    return prep, score


def make_eval_fn(topks: Sequence[int], batch_size: int,
                 scoring: str = "gather"):
    """Build ``evaluate(mf, rows, mask) -> {K: (hit_sum, ndcg_sum)}``.

    ``rows``: (n_pad, 2 + C) int32, ``mask``: (n_pad,). Padded rows
    contribute zero via the mask, so no cond-skip is needed.
    """
    topks = tuple(topks)
    prep, score = _make_scorer(scoring)

    def evaluate(mfp: MFParams, rows: jax.Array, mask: jax.Array
                 ) -> Dict[int, Tuple[jax.Array, jax.Array]]:
        ctx = prep(mfp)
        nb = rows.shape[0] // batch_size

        def body(acc, i):
            r = lax.dynamic_slice_in_dim(rows, i * batch_size, batch_size)
            m = lax.dynamic_slice_in_dim(mask, i * batch_size, batch_size)
            scores = score(ctx, r[:, 0], r[:, 1:])
            rank = rank_of_target(scores)
            res = hits_and_ndcg_at(rank, m, topks)
            return {k: (acc[k][0] + res[k][0], acc[k][1] + res[k][1])
                    for k in topks}, None

        acc0 = {k: (jnp.float32(0.0), jnp.float32(0.0)) for k in topks}
        acc, _ = lax.scan(body, acc0, jnp.arange(nb))
        return acc

    return evaluate


def make_attributed_eval_fn(topks: Sequence[int], batch_size: int,
                            scoring: str = "gather"):
    """Evaluation with hit attribution by entity freshness.

    Capability parity with ``test_hit_new`` / ``test_model_pre``
    (``model/baseline.py:18-30``, ``evalution/evaluation2.py:28-70``):
    besides hit/NDCG sums per K, counts how many hits fall on *new* users /
    new items (ids first seen during the test span) and the four
    old/new-user x old/new-item buckets at the largest K.

    ``is_new_user``: (U,) bool device array; ``is_new_item``: (I,) bool.
    """
    topks = tuple(topks)
    kmax = max(topks)
    prep, score = _make_scorer(scoring)

    def evaluate(mfp: MFParams, rows: jax.Array, mask: jax.Array,
                 is_new_user: jax.Array, is_new_item: jax.Array):
        ctx = prep(mfp)
        nb = rows.shape[0] // batch_size

        def body(acc, i):
            base, new_u, new_i, buckets = acc
            r = lax.dynamic_slice_in_dim(rows, i * batch_size, batch_size)
            m = lax.dynamic_slice_in_dim(mask, i * batch_size, batch_size)
            scores = score(ctx, r[:, 0], r[:, 1:])
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

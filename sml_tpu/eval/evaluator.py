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
``auto``         ``masked`` when a candidate mask is supplied, else
                 ``gather`` (measured fastest maskless mode on hardware —
                 the matmul pick is index-issue-bound). Decided at trace
                 time; shapes and mask presence are static under jit.
``masked``/
``masked_bf16``  zero indexed reads in steady state: scores stream through
                 the MXU tile-by-tile and are compared against the target
                 score under a precomputed packed candidate-membership mask
                 (``ops/eval_kernel.py``) — the (B, I) score matrix never
                 reaches HBM when the fused Pallas kernel is available. The
                 mask is built once per eval set and cached with it; when
                 no mask operand is supplied these modes degrade to
                 ``matmul``/``matmul_bf16``. ``auto`` prefers ``masked``
                 whenever a mask is present.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from sml_tpu.models.mf import MFParams
from sml_tpu.ops import eval_kernel
from sml_tpu.ops.metrics import hits_and_ndcg_at, rank_of_target

SCORING_MODES = ("gather", "matmul", "gather_bf16", "matmul_bf16",
                 "masked", "masked_bf16", "auto")


def _resolve_mode(scoring: str, n_items: int, n_cand: int,
                  has_mask: bool) -> str:
    if scoring == "auto":
        if has_mask:
            return "masked"
        # Maskless, 'gather' wins at every shape measured on the real
        # chip: the matmul mode's candidate column pick is index-ISSUE
        # bound (~68k picks/ms, scripts/eval_probe.py 'score_pick') and
        # costs more than the row gathers it replaces — measured 84k vs
        # 238k rows/s at items=20k (masked_eval_check). The round-4
        # shape heuristic (items <= 48*C -> matmul) timed the dot, not
        # the pick, and was wrong on hardware.
        return "gather"
    if scoring not in SCORING_MODES:
        raise ValueError(f"unknown eval scoring mode: {scoring!r}")
    if scoring.startswith("masked") and not has_mask:
        # no mask shipped with this eval set: same data movement class
        return "matmul_bf16" if scoring.endswith("bf16") else "matmul"
    return scoring


def _make_ranker(scoring: str, use_pallas: bool):
    """Returns ``(prep, rank)``: ``prep(mfp) -> ctx`` once per eval (casts /
    transposes live here so the scan body stays cheap),
    ``rank(ctx, rows, cand_mask) -> (B,) int32`` per batch."""

    def prep(mfp: MFParams):
        ue_t, ie_t = mfp.user_emb, mfp.item_emb
        if scoring.endswith("bf16"):
            ue_t = ue_t.astype(jnp.bfloat16)
            ie_t = ie_t.astype(jnp.bfloat16)
        it_t = None
        if scoring.startswith("masked") or scoring == "auto":
            # (d, I_pad) transposed table for the masked kernel: lanes run
            # along items, and the pad rows are masked out by construction
            ipad = eval_kernel.pad_items(ie_t.shape[0])
            it_t = jnp.pad(ie_t, ((0, ipad - ie_t.shape[0]), (0, 0))).T
        return (ue_t, ie_t, it_t)

    def rank(ctx, r: jax.Array, cand_mask) -> jax.Array:
        ue_t, ie_t, it_t = ctx
        users, cand = r[:, 0], r[:, 1:]
        mode = _resolve_mode(scoring, ie_t.shape[0], cand.shape[1],
                             cand_mask is not None)
        if mode.startswith("masked"):
            ue = ue_t[users]                               # (B, d)
            # target score via a B-row gather + VPU dot; the mask covers
            # negatives only, so the target never self-compares and the
            # reduction-order difference vs the MXU tile is harmless
            sstar = jnp.sum(ue.astype(jnp.float32)
                            * ie_t[r[:, 1]].astype(jnp.float32),
                            axis=1, keepdims=True)
            return eval_kernel.masked_rank(ue, it_t, sstar, cand_mask,
                                           use_pallas=use_pallas)
        if mode.startswith("matmul"):
            all_s = jax.lax.dot_general(
                ue_t[users], ie_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (B, I)
            return rank_of_target(jnp.take_along_axis(all_s, cand, axis=1))
        ue = ue_t[users]                                   # (B, d)
        ce = ie_t[cand]                                    # (B, C, d)
        return rank_of_target(jnp.einsum("bd,bcd->bc", ue, ce,
                                         preferred_element_type=jnp.float32))

    return prep, rank


def make_eval_fn(topks: Sequence[int], batch_size: int,
                 scoring: str = "gather", use_pallas: bool = False):
    """Build ``evaluate(mf, rows, mask, cand_mask=None)
    -> {K: (hit_sum, ndcg_sum)}``.

    ``rows``: (n_pad, 2 + C) int32, ``mask``: (n_pad,). Padded rows
    contribute zero via the mask, so no cond-skip is needed. ``cand_mask``
    (optional): (n_pad, words) uint32 packed negative-membership mask
    (``ops/eval_kernel.py``) enabling the masked scoring modes.
    """
    topks = tuple(topks)
    prep, rank_fn = _make_ranker(scoring, use_pallas)

    def evaluate(mfp: MFParams, rows: jax.Array, mask: jax.Array,
                 cand_mask: jax.Array = None
                 ) -> Dict[int, Tuple[jax.Array, jax.Array]]:
        ctx = prep(mfp)
        nb = rows.shape[0] // batch_size

        def body(acc, i):
            r = lax.dynamic_slice_in_dim(rows, i * batch_size, batch_size)
            m = lax.dynamic_slice_in_dim(mask, i * batch_size, batch_size)
            cm = (None if cand_mask is None else
                  lax.dynamic_slice_in_dim(cand_mask, i * batch_size,
                                           batch_size))
            rank = rank_fn(ctx, r, cm)
            res = hits_and_ndcg_at(rank, m, topks)
            return {k: (acc[k][0] + res[k][0], acc[k][1] + res[k][1])
                    for k in topks}, None

        acc0 = {k: (jnp.float32(0.0), jnp.float32(0.0)) for k in topks}
        acc, _ = lax.scan(body, acc0, jnp.arange(nb))
        return acc

    return evaluate


def make_attributed_eval_fn(topks: Sequence[int], batch_size: int,
                            scoring: str = "gather",
                            use_pallas: bool = False):
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
    prep, rank_fn = _make_ranker(scoring, use_pallas)

    def evaluate(mfp: MFParams, rows: jax.Array, mask: jax.Array,
                 is_new_user: jax.Array, is_new_item: jax.Array,
                 cand_mask: jax.Array = None):
        ctx = prep(mfp)
        nb = rows.shape[0] // batch_size

        def body(acc, i):
            base, new_u, new_i, buckets = acc
            r = lax.dynamic_slice_in_dim(rows, i * batch_size, batch_size)
            m = lax.dynamic_slice_in_dim(mask, i * batch_size, batch_size)
            cm = (None if cand_mask is None else
                  lax.dynamic_slice_in_dim(cand_mask, i * batch_size,
                                           batch_size))
            rank = rank_fn(ctx, r, cm)
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

"""Matrix-factorization core: pure-functional embedding tables.

Capability parity with ``model/MF.py``'s ``MFbasemode``: user/item latent
tables plus bias tables that are allocated but **excluded from scoring** —
``forward`` returns the raw dot product (``model/MF.py:39-43``) and ranking
likewise (``:54-57``). The bias tables exist so checkpoints and the
``with_mf_bias`` transfer capability (``model/transfer.py:347-354``) have
state to carry; scoring functions ignore them, exactly like the live
reference path. The biased variant ``MF2`` (``model/MF.py:118-156``) is
covered by :func:`score_pairs_biased`.

Tables default to N(0,1) init, torch's ``nn.Embedding`` default, so the
pretraining trajectory matches the reference's.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MFParams(NamedTuple):
    user_emb: jax.Array   # (U, d)
    item_emb: jax.Array   # (I, d)
    user_bias: jax.Array  # (U, 1)
    item_bias: jax.Array  # (I, 1)


def init_mf(key: jax.Array, n_users: int, n_items: int, dim: int,
            dtype=jnp.float32, emb_scale: float = 1.0) -> MFParams:
    ku, ki, kbu, kbi = jax.random.split(key, 4)
    return MFParams(
        user_emb=jax.random.normal(ku, (n_users, dim), dtype) * emb_scale,
        item_emb=jax.random.normal(ki, (n_items, dim), dtype) * emb_scale,
        user_bias=jax.random.normal(kbu, (n_users, 1), dtype) * emb_scale,
        item_bias=jax.random.normal(kbi, (n_items, 1), dtype) * emb_scale,
    )


def score_pairs(params: MFParams, users: jax.Array,
                items: jax.Array) -> jax.Array:
    """Dot-product score per (user, item) pair (``model/MF.py:34-43``)."""
    ue = params.user_emb[users]
    ie = params.item_emb[items]
    return jnp.sum(ue * ie, axis=-1)


def score_pairs_biased(params: MFParams, users: jax.Array,
                       items: jax.Array) -> jax.Array:
    """Biased variant (capability of ``MF2``, ``model/MF.py:139-143``)."""
    s = score_pairs(params, users, items)
    return s + params.user_bias[users, 0] + params.item_bias[items, 0]


def score_candidates(params: MFParams, users: jax.Array,
                     cand_items: jax.Array) -> jax.Array:
    """Score a per-row candidate slate.

    ``users``: (B,), ``cand_items``: (B, C). Returns (B, C) scores — the
    ranking path of ``MFbasemode.test`` (``model/MF.py:50-57``).
    """
    ue = params.user_emb[users]                  # (B, d)
    ce = params.item_emb[cand_items]             # (B, C, d)
    return jnp.einsum("bd,bcd->bc", ue, ce)


def tables(params: MFParams):
    return params.user_emb, params.item_emb


def with_tables(params: MFParams, user_emb: jax.Array,
                item_emb: jax.Array) -> MFParams:
    """Functional analogue of ``load_MFbase_weight`` (``transfer.py:945-959``)."""
    return params._replace(user_emb=user_emb, item_emb=item_emb)

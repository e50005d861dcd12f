"""Full-catalog top-K ranking over a row-sharded item table.

The reference only ranks 1000-candidate slates (``model/MF.py:45-57``). A
production recommender must rank the FULL catalog; with the item table
row-sharded over the mesh 'model' axis (SURVEY.md §2.3: the item axis is
this workload's "long dimension"), the TPU-native formulation is:

1. each shard computes local scores ``(B, I/shard)`` as one MXU matmul,
2. takes a LOCAL top-K (k small, jax.lax.top_k),
3. all-gathers the ``(B, k)`` candidate (score, global-id) pairs — k·shards
   values per row instead of the full catalog — and
4. re-ranks the gathered pool for the global top-K.

Communication is ``O(B · k · n_shards)`` instead of ``O(B · I)``; the merge
is exact because the global top-K is contained in the union of local
top-Ks.

Also provides the single-device dense path and a history mask (exclude a
user's already-seen items, the standard serving filter).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sml_tpu.models.mf import MFParams


def dense_full_topk(user_emb_rows: jax.Array, item_table: jax.Array,
                    k: int, mask_scores: Optional[jax.Array] = None,
                    compute_dtype=None,
                    topk_method: str = "exact"
                    ) -> Tuple[jax.Array, jax.Array]:
    """Reference path: one (B, d) x (d, I) matmul + top-K.

    ``mask_scores``: optional (B, I) additive mask (-inf to exclude).
    ``compute_dtype``: cast the matmul INPUTS (e.g. ``jnp.bfloat16`` for the
    MXU's native rate); scores still accumulate and rank in f32.
    ``topk_method``: ``'exact'`` = ``lax.top_k`` (sort-class; measured
    ~23 ms per 1024x20k scores on v5e — it, not the matmul at ~0.1 ms,
    bounds dense serving); ``'approx'`` = the TPU's hardware PartialReduce
    (``lax.approx_max_k``, default recall target 0.95 per returned k);
    ``'approx99'`` = the same at 0.99 recall. Returns
    (scores (B, k), item_ids (B, k)).
    """
    if compute_dtype is not None:
        user_emb_rows = user_emb_rows.astype(compute_dtype)
        item_table = item_table.astype(compute_dtype)
    scores = jnp.einsum("bd,id->bi", user_emb_rows, item_table,
                        preferred_element_type=jnp.float32)
    if mask_scores is not None:
        scores = scores + mask_scores
    if topk_method == "approx":
        return jax.lax.approx_max_k(scores, k)
    if topk_method == "approx99":
        return jax.lax.approx_max_k(scores, k, recall_target=0.99)
    return jax.lax.top_k(scores, k)


import functools


@functools.lru_cache(maxsize=8)
def make_sharded_full_topk(mesh: Mesh, k: int, compute_dtype=None,
                           topk_method: str = "exact"):
    """Build ``topk(user_rows, item_table) -> (scores, ids)`` with the item
    table sharded ``P('model')``; local-topk + all-gather merge (exact
    when ``topk_method='exact'``: the global top-K is contained in the
    union of local top-Ks; with ``'approx'``/``'approx99'`` the local
    step uses the TPU PartialReduce at that recall target and the merge
    stays exact over the gathered pool).

    Cached per (mesh, k, dtype, method) so repeated ``recommend`` calls
    (the rank CLI's batch loop) reuse one compiled program.
    """

    n_shards = mesh.shape["model"]

    def local_topk(scores):
        if topk_method == "approx":
            return jax.lax.approx_max_k(scores, k)
        if topk_method == "approx99":
            return jax.lax.approx_max_k(scores, k, recall_target=0.99)
        return jax.lax.top_k(scores, k)

    def inner(user_rows, item_shard):
        rows_per = item_shard.shape[0]
        shard = jax.lax.axis_index("model")
        if compute_dtype is not None:
            user_rows = user_rows.astype(compute_dtype)
            item_shard = item_shard.astype(compute_dtype)
        local_scores = jnp.einsum("bd,id->bi", user_rows, item_shard,
                                  preferred_element_type=jnp.float32)
        ls, li = local_topk(local_scores)                # (B, k) local
        gids = li + shard * rows_per
        # gather every shard's candidates: (B, n_shards * k)
        all_s = jax.lax.all_gather(ls, "model", axis=1, tiled=True)
        all_i = jax.lax.all_gather(gids, "model", axis=1, tiled=True)
        ms, sel = jax.lax.top_k(all_s, k)
        mi = jnp.take_along_axis(all_i, sel, axis=1)
        return ms, mi

    fn = jax.shard_map(inner, mesh=mesh,
                       in_specs=(P(), P("model")),
                       out_specs=(P(), P()),
                       check_vma=False)
    return jax.jit(fn)


def recommend(mf: MFParams, users: jax.Array, k: int,
              mesh: Optional[Mesh] = None, compute_dtype=None,
              topk_method: str = "exact"):
    """Top-K catalog recommendation for a user batch (serving entry)."""
    rows = mf.user_emb[users]
    if mesh is not None and "model" in mesh.axis_names:
        return make_sharded_full_topk(mesh, k, compute_dtype,
                                      topk_method)(rows, mf.item_emb)
    return dense_full_topk(rows, mf.item_emb, k, compute_dtype=compute_dtype,
                           topk_method=topk_method)

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
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sml_tpu.models.mf import MFParams

# Width below which a plain lax.top_k beats the two-pass bucket select
# (two small sorts + a gather do not amortize on narrow score matrices).
_BUCKET_MIN_WIDTH = 16_384


def _bucket_topk(scores: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Exact top-K via bucketed max-select — two SMALL sorts, no big one.

    ``lax.top_k`` lowers to a sort-class kernel whose cost scales with the
    catalog width; at serving widths (10^5..10^7 items) it, not the scoring
    matmul, bounds dense serving (``serving_probe_r5.json``: 190 ms per
    1024x120k vs ~0.1 ms matmul). This replaces the one wide sort with:

    1. reshape to (B, n_bins, bin) and take per-bin max — a cheap VPU
       reduction over the score matrix,
    2. ``lax.top_k`` over the (B, n_bins) bin maxima to pick the k
       winning bins,
    3. gather ONLY those k bins' contents and ``lax.top_k`` the
       (B, k·bin) pool.

    Exactness: let tau be the k-th largest bin max. The k selected bins'
    maxima are k distinct items >= tau, so the true k-th value v_k >= tau;
    any discarded bin has max < tau <= v_k, hence holds no top-k item.
    Every item > tau lives in a bin whose max > tau, which is necessarily
    selected. The returned score multiset therefore equals ``lax.top_k``'s
    (ids may differ only among equal scores). ``n_bins ~ sqrt(k·I)``
    equalizes the two sort widths, minimizing their summed cost.
    """
    B, I = scores.shape
    n_bins = int(np.sqrt(k * I))
    # bins must be rankable (>= k of them) and hold >= 1 item each
    n_bins = int(np.clip(n_bins, k, I))
    bin_size = -(-I // n_bins)          # ceil
    padded = n_bins * bin_size
    if padded != I:
        scores = jnp.pad(scores, ((0, 0), (0, padded - I)),
                         constant_values=-jnp.inf)
    s3 = scores.reshape(B, n_bins, bin_size)
    bin_max = s3.max(axis=2)                              # (B, n_bins)
    if n_bins >= _BUCKET_MIN_WIDTH:                       # e.g. 10^7 items
        _, top_bins = _bucket_topk(bin_max, k)            # recurse: exact
    else:
        _, top_bins = jax.lax.top_k(bin_max, k)           # (B, k)
    pool = jnp.take_along_axis(s3, top_bins[:, :, None], axis=1)
    ms, sel = jax.lax.top_k(pool.reshape(B, k * bin_size), k)
    bin_of = jnp.take_along_axis(top_bins, sel // bin_size, axis=1)
    ids = bin_of * bin_size + sel % bin_size              # (B, k) global
    return ms, ids


def _select_topk(scores: jax.Array, k: int, topk_method: str
                 ) -> Tuple[jax.Array, jax.Array]:
    """Dispatch one of the top-K engines over a dense (B, I) score matrix."""
    if topk_method == "approx":
        return jax.lax.approx_max_k(scores, k)
    if topk_method == "approx99":
        return jax.lax.approx_max_k(scores, k, recall_target=0.99)
    if topk_method == "exact_sort":
        return jax.lax.top_k(scores, k)
    if topk_method not in ("exact", "exact_bucket"):
        raise ValueError(f"unknown topk_method {topk_method!r}")
    wide = scores.shape[1] >= _BUCKET_MIN_WIDTH or topk_method == "exact_bucket"
    if wide and k <= scores.shape[1]:
        return _bucket_topk(scores, k)
    return jax.lax.top_k(scores, k)


def dense_full_topk(user_emb_rows: jax.Array, item_table: jax.Array,
                    k: int, mask_scores: Optional[jax.Array] = None,
                    compute_dtype=None,
                    topk_method: str = "exact"
                    ) -> Tuple[jax.Array, jax.Array]:
    """Reference path: one (B, d) x (d, I) matmul + top-K.

    ``mask_scores``: optional (B, I) additive mask (-inf to exclude).
    ``compute_dtype``: cast the matmul INPUTS (e.g. ``jnp.bfloat16`` for the
    MXU's native rate); scores still accumulate and rank in f32.
    ``topk_method``: ``'exact'`` = exact scores; wide catalogs
    (>= ``_BUCKET_MIN_WIDTH``) route through the bucketed two-pass select
    (``_bucket_topk`` — same result as ``lax.top_k`` up to id choice among
    tied scores), narrow ones through ``lax.top_k`` directly.
    ``'exact_sort'`` pins the plain ``lax.top_k`` sort (sort-class cost;
    measured 190 ms per 1024x120k scores on v5e vs ~0.1 ms for the matmul
    — it bounds dense serving, which is why the bucket path exists);
    ``'exact_bucket'`` pins the bucket path. ``'approx'`` = the TPU's
    hardware PartialReduce (``lax.approx_max_k``, default recall target
    0.95 per returned k); ``'approx99'`` = the same at 0.99 recall.
    Returns (scores (B, k), item_ids (B, k)).
    """
    if compute_dtype is not None:
        user_emb_rows = user_emb_rows.astype(compute_dtype)
        item_table = item_table.astype(compute_dtype)
    scores = jnp.einsum("bd,id->bi", user_emb_rows, item_table,
                        preferred_element_type=jnp.float32)
    if mask_scores is not None:
        scores = scores + mask_scores
    return _select_topk(scores, k, topk_method)


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
        return _select_topk(scores, k, topk_method)

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

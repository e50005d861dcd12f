"""Static-shape batching: bucketed padding + masked validity.

XLA traces/compiles one program per distinct input shape, so feeding it the
reference's per-period variable-length epochs naively would trigger a
recompile per period. Instead:

* row counts are padded up to a *bucket* (next multiple of a coarse
  granularity — ≤ 1/``granularity`` waste, O(log) distinct shapes),
* a float ``mask`` marks real rows; all losses/metrics are mask-weighted,
* epochs shuffle **only the real rows** (random sort keys with ``+inf`` on
  padding) so batch 0..ceil(N/B)-1 hold every real row and padding stays in
  the tail batch — optimizer step *count* therefore matches the reference's
  ``ceil(N/B)`` exactly,
* the scan runs over the bucketed batch count and skips tail batches with a
  ``lax.cond`` no-op, which preserves Adam state semantics exactly (a skipped
  batch must not decay moments).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def bucket_rows(n: int, multiple: int, granularity: int = 8) -> int:
    """Round ``n`` up to a shape bucket: a multiple of ``multiple`` with at
    most ``1/granularity`` relative slack beyond it."""
    n = max(n, 1)
    nb = -(-n // multiple)                      # ceil batches
    if nb <= granularity:
        return nb * multiple
    # round batch count up to a multiple of its own top granularity chunk
    step = 1 << max(0, (nb - 1).bit_length() - granularity.bit_length())
    nb_b = -(-nb // step) * step
    return nb_b * multiple


class PaddedRows(NamedTuple):
    rows: jax.Array    # (n_pad, C) int32
    mask: jax.Array    # (n_pad,) float32, 1.0 for real rows
    n_real: int        # true row count (host int)
    # optional packed negative-membership mask for the masked eval modes
    # ((n_pad, words) uint32, ``ops/eval_kernel.py`` bitplane layout);
    # built once per eval set and cached with it
    cand_mask: jax.Array = None


def pad_rows(arr: np.ndarray, batch_size: int,
             granularity: int = 8, pad_to: int = 0) -> PaddedRows:
    """Pad a host int array (N, C) to a bucketed shape and ship to device.

    ``pad_to`` raises the bucket to a caller-chosen floor (itself rounded
    up to a batch multiple): padding every period of a stream to ONE
    sweep-wide shape means XLA compiles each op once per sweep instead of
    once per period-size bucket. Skipped tail batches are ``lax.cond``
    no-ops, so the extra rows cost scan iterations, not compute.

    Ids that fit uint16 travel the host->device link half-width and widen
    to int32 on device: the eval sets are (rows, 1+1000) id matrices
    (~120 MB/period at Yelp scale as int32) and their transfer over the
    remote-TPU tunnel dominates the test span's wall-clock."""
    n = arr.shape[0]
    n_pad = bucket_rows(n, batch_size, granularity)
    if pad_to:
        # bucket the floor itself: a ceil-to-batch floor would give the
        # stream's largest period (whose natural bucket is coarser) a
        # different shape than everyone else's, recompiling mid-sweep
        n_pad = max(n_pad, bucket_rows(pad_to, batch_size, granularity))
    out = np.zeros((n_pad, arr.shape[1]), dtype=np.int32)
    out[:n] = arr
    mask = np.zeros((n_pad,), dtype=np.float32)
    mask[:n] = 1.0
    if n > 0 and out.min() >= 0 and out.max() < np.iinfo(np.uint16).max + 1:
        rows = jnp.asarray(out.astype(np.uint16)).astype(jnp.int32)
    else:
        rows = jnp.asarray(out)
    return PaddedRows(rows, jnp.asarray(mask), n)


def shuffle_real_first(key: jax.Array, rows: jax.Array,
                       mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Random permutation that keeps padded rows at the tail.

    Real rows get uniform sort keys, padded rows ``+inf``; argsort then
    shuffles real rows into the leading positions. Shapes stay static.
    """
    r = jax.random.uniform(key, (rows.shape[0],))
    r = jnp.where(mask > 0, r, jnp.inf)
    order = jnp.argsort(r)
    return rows[order], mask[order]


def num_batches(n_real: jax.Array, batch_size: int) -> jax.Array:
    """ceil(n_real / batch_size) as a traced scalar."""
    return (n_real + batch_size - 1) // batch_size

"""On-device negative sampling.

The reference's ``'alone'`` sampler is a per-row Python rejection loop
(``data/dataset.py:64-71``): draw uniformly from the period's unique items
until the draw is not among the user's positives *within that period*. That
cannot be jitted as-is; here it becomes a vectorized bounded-retry sampler:

1. host side, once per period: the period's unique-item pool and a sorted
   array of 32-bit (user, item) pair hashes (:func:`build_period_index`);
2. device side, per batch: draw ``tries`` candidates per row, test membership
   with a binary search over the sorted hashes (``jnp.searchsorted``), and
   take the first non-positive candidate (:func:`sample_negatives`).

Membership is hash-exact for true positives (a positive pair's hash is
always present, so it can never be *missed*); a hash collision between
distinct pairs can only cause a spurious rejection of a valid negative
(probability ~ |positives| / 2^32 per draw — harmless). The pair hash runs
in pure uint32 arithmetic so it is identical on host (numpy) and device and
never overflows, regardless of catalog size (user*n_items+item would
overflow int32 at ~100k users x 50k items; JAX disables x64 by default).

With ``tries=16`` the residual probability that all candidates collide with
the user's positives is ``p^16`` where ``p`` is the user's positive rate over
the pool — negligible for real data; the fallback keeps the last candidate
(matching the reference's guarantee only statistically, as flagged in
SURVEY.md §7).

The ``'all'`` sampler mirrors ``trainDataset_withPreSample``
(``data/dataset2.py:172-201``): eval-format rows double as a presampled
training pool and each epoch consumes one negative column. The reference's
column rotation can (1/1000 chance) pick the *positive* column as the
"negative" (its ``neg_flag = arange(1, width)`` includes column 1,
``dataset2.py:181``); this engine draws only from the true negative columns.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_M1 = 0x85EBCA6B
_M2 = 0xC2B2AE35
_M3 = 0x27D4EB2F


def _hash_pair_np(u: np.ndarray, i: np.ndarray) -> np.ndarray:
    """Mix a (user, item) pair into a uint32 key (host side)."""
    with np.errstate(over="ignore"):
        u = u.astype(np.uint32)
        i = i.astype(np.uint32)
        h = u * np.uint32(_M1)
        h ^= h >> np.uint32(13)
        h ^= i * np.uint32(_M2)
        h *= np.uint32(_M3)
        h ^= h >> np.uint32(15)
    return h


def _hash_pair_jnp(u: jax.Array, i: jax.Array) -> jax.Array:
    """Same mix on device (uint32 wraparound semantics match numpy)."""
    u = u.astype(jnp.uint32)
    i = i.astype(jnp.uint32)
    h = u * jnp.uint32(_M1)
    h = h ^ (h >> 13)
    h = h ^ (i * jnp.uint32(_M2))
    h = h * jnp.uint32(_M3)
    h = h ^ (h >> 15)
    return h


# Bloom sizing: ~16 bits/key with 2 probes → false-positive rate ≈ 1.4%.
# A false positive only over-rejects a valid negative candidate.
_BLOOM_BITS_PER_KEY = 16


def _bloom_second_hash(h):
    """Second probe position derived from the pair hash (uint32 ops only).

    The multiplier is an np.uint32 scalar so the expression stays uint32 for
    both numpy and jnp operands (a bare Python literal > int32 max raises
    under jnp's promotion rules).
    """
    return (h * np.uint32(0x9E3779B1)) ^ (h >> 16)


class PeriodIndex(NamedTuple):
    """Static per-period sampling index (device arrays, padded)."""
    item_pool: jax.Array      # (P,) int32 unique items, padded by repeating
    pool_size: jax.Array      # () int32 true number of unique items
    pos_hashes: jax.Array     # (K,) uint32 sorted pair hashes, padded with MAX
    bloom: jax.Array          # (M/32,) uint32 bit array over pair hashes
    bloom_mask: jax.Array     # () uint32, M-1 (M = power-of-two bit count)


def build_period_index(interactions: np.ndarray, n_items: int,
                       pad_to_multiple: int = 1024,
                       min_rows: int = 0) -> PeriodIndex:
    """Build the device-side sampling index for one period's interactions.

    ``n_items`` is accepted for interface stability (the hash does not need
    it) and validated against the data. ``min_rows`` (a sweep-wide row-count
    bound) floors the padded pool/hash lengths and the bloom size so every
    period's index has ONE shape — a per-period index shape would recompile
    every op that closes over it. A larger bloom only lowers its
    false-positive rate; the padded tails are never read (``pool_size`` /
    MAX-sentinel binary search).
    """
    users = interactions[:, 0]
    items = interactions[:, 1]
    assert items.max(initial=0) < n_items
    pool = np.unique(items)
    psize = int(pool.shape[0])
    pfloor = max(psize, min(min_rows, n_items))
    ppad = -(-pfloor // pad_to_multiple) * pad_to_multiple
    pool_padded = np.concatenate(
        [pool, np.full(ppad - psize, pool[0], dtype=pool.dtype)])

    hashes = np.unique(_hash_pair_np(users, items))
    kfloor = max(hashes.shape[0], min_rows)
    kpad = -(-kfloor // pad_to_multiple) * pad_to_multiple
    hashes_padded = np.concatenate(
        [hashes, np.full(kpad - hashes.shape[0], np.uint32(0xFFFFFFFF))])

    # Bloom filter: 2 probes per key; sized to the next power of two
    m_bits = 1024
    while m_bits < _BLOOM_BITS_PER_KEY * max(hashes.shape[0], min_rows):
        m_bits <<= 1
    mask = np.uint32(m_bits - 1)
    words = np.zeros(m_bits // 32, dtype=np.uint32)
    with np.errstate(over="ignore"):
        for pos in (hashes & mask, _bloom_second_hash(hashes) & mask):
            np.bitwise_or.at(words, pos >> 5,
                             np.uint32(1) << (pos & np.uint32(31)))

    return PeriodIndex(
        item_pool=jnp.asarray(pool_padded, dtype=jnp.int32),
        pool_size=jnp.asarray(psize, dtype=jnp.int32),
        pos_hashes=jnp.asarray(hashes_padded),
        bloom=jnp.asarray(words),
        bloom_mask=jnp.asarray(mask),
    )


def maybe_positive(index: PeriodIndex, users: jax.Array,
                   items: jax.Array) -> jax.Array:
    """Bloom membership test: True for EVERY true positive (no false
    negatives), plus ~1.4% false positives. Two 32-bit gathers per query vs
    ~log2(K) for the exact binary search — this is the sampler's hot test.
    """
    h = _hash_pair_jnp(users, items)
    hit = None
    for probe in (h, _bloom_second_hash(h)):
        b = probe & index.bloom_mask
        word = index.bloom[(b >> 5).astype(jnp.int32)]
        bit = (word >> (b & 31)) & 1
        hit = bit if hit is None else (hit & bit)
    return hit == 1


def is_positive(index: PeriodIndex, users: jax.Array,
                items: jax.Array) -> jax.Array:
    """Membership test (user, item) ∈ period positives, any broadcast shape.

    No false negatives; false-positive probability ~ |positives|/2^32.
    """
    key = _hash_pair_jnp(users, items)
    loc = jnp.searchsorted(index.pos_hashes, key)
    loc = jnp.clip(loc, 0, index.pos_hashes.shape[0] - 1)
    return index.pos_hashes[loc] == key


def _draw_negatives(index: PeriodIndex, users: jax.Array, key: jax.Array,
                    tries: int):
    """Shared draw: returns (picked, all_pos) where ``all_pos`` marks rows
    whose every candidate hit the bloom (the fallback rows)."""
    b = users.shape[0]
    draws = jax.random.randint(key, (b, tries), 0, index.pool_size)
    cands = index.item_pool[draws]                          # (B, T)
    pos = maybe_positive(index, users[:, None], cands)      # (B, T) bool
    # first non-positive candidate; if all positive, keep the last draw
    first_ok = jnp.argmax(~pos, axis=1)
    all_pos = jnp.all(pos, axis=1)
    pick = jnp.where(all_pos, tries - 1, first_ok)
    return cands[jnp.arange(b), pick], all_pos


def sample_negatives(index: PeriodIndex, users: jax.Array, key: jax.Array,
                     tries: int = 16) -> jax.Array:
    """Draw one negative item per user with bounded rejection.

    ``users``: (B,) int32. Returns (B,) int32 items from the period pool that
    are (with overwhelming probability) not among that user's positives.
    """
    picked, _ = _draw_negatives(index, users, key, tries)
    return picked


def sampler_stats(index: PeriodIndex, users: jax.Array, key: jax.Array,
                  tries: int = 16):
    """Statistical quality probe of :func:`sample_negatives` at the shipped
    ``tries``: (fallback_rate, leak_rate) over one draw per row.

    * ``fallback_rate`` — fraction of rows where all ``tries`` candidates hit
      the bloom, so the sampler kept its last draw (bound: ``(p + 1.4%)^T``
      for a user with positive-rate ``p`` over the pool).
    * ``leak_rate`` — fraction of RETURNED samples that are true positives
      (exact membership, not bloom) — the rate of corrupted training rows.
    """
    picked, all_pos = _draw_negatives(index, users, key, tries)
    leak = is_positive(index, users, picked)
    return (jnp.mean(all_pos.astype(jnp.float32)),
            jnp.mean(leak.astype(jnp.float32)))


def presampled_neg_column(rows: jax.Array, col: jax.Array) -> jax.Array:
    """Select one negative column from eval-format rows ``[u, pos, negs...]``.

    ``col`` indexes into the negatives only (0..neg_num-1).
    """
    return rows[:, 2 + col]

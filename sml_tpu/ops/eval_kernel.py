"""Fused masked-rank Pallas TPU kernel for 999-negative evaluation.

The reference evaluation (``model/MF.py:45-80``) ranks each test row's
target among its 999 sampled negatives. The round-3 roofline showed the
candidate-gather formulation runs at 7.4% of HBM peak; the round-4 probe
(``scripts/eval_probe.py``) showed the path is *index-issue*-bound: 16.4M
row gathers (or 4-byte score picks) cost 130-240 ms per 16k rows while the
full ``(B, d) @ (d, I)`` score matmul costs only ~27 ms — and that 27 ms is
itself dominated by materializing the (B, I) f32 score matrix in HBM.

This kernel removes both costs: scores are computed tile-by-tile on the
MXU and compared against the target score and a precomputed candidate
*membership mask* entirely in VMEM — the score matrix never reaches HBM,
and there are zero indexed memory ops in steady state.

Mask layout (bitplane packing). Items are grouped into blocks of
``I_BLK = 4096 = 32 planes x 128 lanes``; for block ``j`` the uint32 word
at column ``j*128 + w`` holds, in bit ``k``, the membership of item
``j*4096 + k*128 + w``. This makes the in-kernel unpack 32 lane-aligned
shift-and-mask ops on (R, 128) tiles — no relayout, no gather.

The mask is built once per eval set (it depends only on the candidate id
matrix, which the engine's upload LRU already dedups per period) and
amortizes over the up-to ``multi_num * (mf+tr epochs)`` in-training evals
the reference protocol runs against the same set per period
(``transfer.py:444-446,517-519,684-690``).

Semantics: the mask covers the 999 *negatives only* (``rows[:, 2:]``); the
rank is the strictly-greater count against the target score, exactly
``ops.metrics.rank_of_target``. Excluding the target from the mask means
the target's self-comparison never occurs, so the kernel is correct even
though the target score is computed by a VPU row-dot rather than sliced
out of the MXU score tile. Negatives are distinct by construction on both
sides (``data/formats.py:attach_negatives``; reference
``data/dataset2.py:356``), so membership == multiplicity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I_BLK = 4096          # items per mask block = PLANES * LANES
PLANES = 32           # bits per uint32 word
LANES = 128           # TPU lane width


def pad_items(n_items: int) -> int:
    """Item-axis padding so the mask/bitplane grid tiles exactly."""
    return -(-n_items // I_BLK) * I_BLK


def mask_words(n_items: int) -> int:
    """uint32 words per row of the packed mask."""
    return pad_items(n_items) // PLANES


def _row_chunk(B: int, want: int = 256) -> int:
    """Largest row-chunk <= want that divides B (B is a batch multiple)."""
    rc = min(want, B)
    while B % rc:
        rc -= 1
    return rc


def build_packed_mask(neg: jax.Array, n_items: int,
                      item_chunk: int = 2048,
                      row_chunk: int = 256,
                      method: str = "mxu") -> jax.Array:
    """(B, C) int32 negative ids -> (B, mask_words) uint32 bitplane mask.

    Two scatter-free membership constructions (the round-4 probe measured
    on-device scatter at 145 ms steady / 40 s compile for 16k x 1000 x
    20k — off the table):

    ``mxu``      membership by digit factorization: with ``i = 128*hi(i)
                 + lo(i)``, ``member[b,i] = sum_c [hi(cand)=hi(i)] *
                 [lo(cand)=lo(i)]`` — a per-row rank-1 expansion computed
                 as a batched (HI, C) x (C, 128) matmul on the MXU. Turns
                 the brute B*C*I compare volume into B*C*(HI+128)
                 compares plus MXU FLOPs. Counts are exact in f32
                 (<= C < 2^24), so membership == (count > 0).
    ``compare``  chunked all-pairs compare on the VPU (B*C*I bool ops);
                 kept as the reference construction and for backends
                 where the batched-matmul layout underperforms.

    Both run under ``lax.map`` over row chunks so transients stay
    tile-sized, and share the bitplane pack: bit ``k`` of word column
    ``jb*128 + w`` marks item ``jb*4096 + k*128 + w`` (note ``hi(i) =
    32*jb + k``, so the (rc, HI, 128) hit tensor reshapes straight into
    the plane layout).
    """
    B, C = neg.shape
    ipad = pad_items(n_items)
    nblk = ipad // I_BLK
    n_hi = ipad // LANES
    rc = _row_chunk(B, row_chunk)

    def pack(hit):                           # (rc, nblk, PLANES, LANES) bool
        w = jnp.zeros((rc, nblk, LANES), jnp.uint32)
        for k in range(PLANES):
            w = w | (hit[:, :, k, :].astype(jnp.uint32) << k)
        return w.reshape(rc, nblk * LANES)

    def per_chunk_compare(cd):               # (rc, C) int32
        hits = []
        for i0 in range(0, ipad, item_chunk):
            cols = jnp.arange(i0, i0 + item_chunk, dtype=jnp.int32)
            hits.append(jnp.any(cd[:, :, None] == cols[None, None, :],
                                axis=1))
        hit = jnp.concatenate(hits, axis=1)  # (rc, ipad) bool
        return pack(hit.reshape(rc, nblk, PLANES, LANES))

    def per_chunk_mxu(cd):                   # (rc, C) int32
        hi = cd >> 7
        lo = cd & 127
        ehi = (hi[:, :, None] == jnp.arange(n_hi, dtype=jnp.int32)
               [None, None, :]).astype(jnp.bfloat16)      # (rc, C, HI)
        elo = (lo[:, :, None] == jnp.arange(LANES, dtype=jnp.int32)
               [None, None, :]).astype(jnp.bfloat16)      # (rc, C, 128)
        cnt = lax.dot_general(ehi, elo, (((1,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
        hit = cnt > 0.5                                   # (rc, HI, 128)
        return pack(hit.reshape(rc, nblk, PLANES, LANES))

    per_chunk = per_chunk_mxu if method == "mxu" else per_chunk_compare
    return lax.map(per_chunk, neg.reshape(-1, rc, C)).reshape(B, nblk * LANES)


def _kernel(ue_ref, it_ref, ss_ref, mp_ref, out_ref):
    """One (row-block, item-block) tile: MXU scores -> masked GT count.

    The output holds per-LANE partial counts (R, 128) — full-width tiles
    throughout; the final over-lanes reduction happens outside the kernel.
    """
    j = pl.program_id(1)
    s = lax.dot_general(ue_ref[:], it_ref[:], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (R, I_BLK)
    ss = ss_ref[:, :1]                                       # (R, 1) f32
    mw = mp_ref[:]                                           # (R, 128) u32
    acc = jnp.zeros(out_ref.shape, jnp.float32)              # (R, 128)
    for k in range(PLANES):
        sk = s[:, k * LANES:(k + 1) * LANES]                 # (R, 128)
        bit = (lax.shift_right_logical(mw, jnp.uint32(k))
               & jnp.uint32(1)) > 0
        acc = acc + jnp.where(bit & (sk > ss), jnp.float32(1.0),
                              jnp.float32(0.0))

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += acc


def masked_rank_pallas(ue: jax.Array, items_t: jax.Array, sstar: jax.Array,
                       maskp: jax.Array, *, interpret: bool = False
                       ) -> jax.Array:
    """Rank counts via the fused kernel.

    ue: (B, d) user rows (f32 or bf16); items_t: (d, I_pad) transposed
    item table (same dtype); sstar: (B, 1) f32 target scores;
    maskp: (B, I_pad/32) uint32 bitplane mask. Returns (B,) int32.
    """
    B, d = ue.shape
    ipad = items_t.shape[1]
    nbi = ipad // I_BLK
    rblk = _row_chunk(B)
    ss_wide = jnp.broadcast_to(sstar, (B, LANES))   # full-width lane tiles
    out = pl.pallas_call(
        _kernel,
        grid=(B // rblk, nbi),
        in_specs=[
            pl.BlockSpec((rblk, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, I_BLK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rblk, LANES), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rblk, LANES), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rblk, LANES), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, LANES), jnp.float32),
        interpret=interpret,
    )(ue, items_t, ss_wide, maskp)
    return jnp.sum(out, axis=1).astype(jnp.int32)


def masked_rank_xla(ue: jax.Array, items_t: jax.Array, sstar: jax.Array,
                    maskp: jax.Array) -> jax.Array:
    """Pure-XLA formulation of the same computation (CPU / mesh fallback).

    Identical math and mask layout; materializes the (B, I_pad) score
    matrix, so it is the probe's ``masked_rank_*`` speed class (~2.9x the
    gather path) rather than the kernel's.
    """
    s = lax.dot_general(ue, items_t, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)   # (B, ipad)
    B, ipad = s.shape
    nblk = ipad // I_BLK
    s4 = s.reshape(B, nblk, PLANES, LANES)
    w = maskp.reshape(B, nblk, 1, LANES)
    shifts = jnp.arange(PLANES, dtype=jnp.uint32).reshape(1, 1, PLANES, 1)
    bits = ((w >> shifts) & jnp.uint32(1)) > 0
    gt = s4 > sstar.reshape(B, 1, 1, 1)
    return jnp.sum((bits & gt).astype(jnp.float32),
                   axis=(1, 2, 3)).astype(jnp.int32)


def masked_rank(ue: jax.Array, items_t: jax.Array, sstar: jax.Array,
                maskp: jax.Array, *, use_pallas: bool) -> jax.Array:
    if use_pallas:
        return masked_rank_pallas(ue, items_t, sstar, maskp)
    return masked_rank_xla(ue, items_t, sstar, maskp)

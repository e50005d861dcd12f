"""Fused Pallas kernel for the full-table Adam decay pass.

The exact-dense-semantics row-sparse Adam (``train/optim.py::
sparse_dense_adam_update``) spends its time in the full-table g=0 pass:
``mu <- b1*mu``, ``nu <- b2*nu``, ``p <- p - lr*mu_hat/(sqrt(nu_hat)+eps)``
over every row of every table, every optimizer step (torch dense
``nn.Embedding`` semantics — the reference's MF optimizer touches all rows
each step, ``model/transfer.py:392,511``).

As three XLA ops this reads/writes p, mu, nu with poor fusion (measured
37 ms/step at 5M users on v5e vs the ~11 ms traffic floor). Here one Pallas
kernel streams all three arrays once — 3 reads + 3 writes, the floor —
with the elementwise chain fused in VMEM. The tables are viewed as
(-1, 128) so the lane dimension is fully utilized regardless of d.

Numerics are IDENTICAL to the XLA path (same f32 elementwise chain, no
reassociation): tests/test_adam_kernel.py asserts bit-equality in
interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LANES = 128
# per-leaf element threshold below which XLA is fine (kernel launch not worth
# it, and tiny leaves like the bias tables may not divide the lane count)
MIN_ELEMS = 1 << 20


def _kernel(bc_ref, p_ref, mu_ref, nu_ref, op_ref, omu_ref, onu_ref,
            *, lr: float, b1: float, b2: float, eps: float):
    mu = mu_ref[:] * b1
    nu = nu_ref[:] * b2
    mu_hat = mu / bc_ref[0, 0]
    nu_hat = nu / bc_ref[0, 1]
    op_ref[:] = p_ref[:] + (-lr) * (mu_hat / (jnp.sqrt(nu_hat) + eps))
    omu_ref[:] = mu
    onu_ref[:] = nu


def _best_block(n: int, target: int) -> int:
    """Largest multiple-of-8 divisor of ``n`` that is <= ``target``.

    The grid must divide the lane-row count exactly (ragged final blocks
    interact badly with input/output aliasing), but a pure halving search
    collapses for row counts with small power-of-two factors — e.g. the 5M
    users x d=64 table is 2.5M = 32*5^7 lane-rows, whose best power-of-two
    block is 32 rows (16 KB tiles, an 80k-step grid) while 4000 divides it
    exactly. Scanning down from the target finds such divisors cheaply.
    The %8 constraint is the TPU sublane tiling requirement — a 500-row
    block (a divisor of 3M) fails Pallas lowering."""
    cap = min(target, n)
    for b in range(cap, max(cap - 8192, 0), -1):
        if n % b == 0 and b % 8 == 0:
            return b
    return 1


def decay_adam_supported(arr: jax.Array, block_rows: int = 1024) -> bool:
    return (arr.dtype == jnp.float32 and arr.size >= MIN_ELEMS
            and arr.size % LANES == 0
            and _best_block(arr.size // LANES, block_rows) >= 256)


@functools.partial(jax.jit,
                   static_argnames=("lr", "b1", "b2", "eps", "block_rows"))
def fused_decay_adam(p: jax.Array, mu: jax.Array, nu: jax.Array,
                     bc1: jax.Array, bc2: jax.Array, *, lr: float, b1: float,
                     b2: float, eps: float,
                     block_rows: int = 1024):
    """One g=0 dense-Adam step over a whole table. ``bc1``/``bc2`` are the
    bias-correction scalars ``1-b1**t`` / ``1-b2**t`` (traced values).
    Returns (p', mu', nu') with the inputs' shapes/dtypes; buffers are
    aliased in-place.

    ``block_rows``: 1024 (512 KB tiles) keeps the kernel's VMEM footprint
    — ~6 double-buffered pipeline buffers plus the elementwise-chain
    stack temporaries — well under the 16 MB budget. The previous 4096
    default compiled a ~23.4 MB stack at the 5M-user table (Mosaic
    scoped-vmem OOM, caught by the round-5 scale re-run); the kernel is
    HBM-bandwidth-bound, so block size above ~256 rows doesn't affect
    throughput."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = p.shape
    pv = p.reshape(-1, LANES)
    muv = mu.reshape(-1, LANES)
    nuv = nu.reshape(-1, LANES)
    n = pv.shape[0]
    block = _best_block(n, block_rows)
    grid = (n // block,)
    row_spec = pl.BlockSpec((block, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    bc = jnp.stack([bc1, bc2]).astype(jnp.float32).reshape(1, 2)
    bc_spec = pl.BlockSpec((1, 2), lambda i: (0, 0),
                           memory_space=pltpu.SMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, lr=lr, b1=b1, b2=b2, eps=eps),
        grid=grid,
        in_specs=[bc_spec, row_spec, row_spec, row_spec],
        out_specs=[row_spec, row_spec, row_spec],
        out_shape=[jax.ShapeDtypeStruct(pv.shape, jnp.float32)] * 3,
        input_output_aliases={1: 0, 2: 1, 3: 2},
        cost_estimate=pl.CostEstimate(
            flops=8 * pv.size, bytes_accessed=6 * pv.size * 4,
            transcendentals=pv.size),
    )(bc, pv, muv, nuv)
    return tuple(o.reshape(shape) for o in out)

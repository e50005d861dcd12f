"""Fused Pallas TPU kernel for the full-table transfer refresh.

The reference applies the conv transfer to EVERY table row in one torch
forward per side (``model/transfer.py:897-898``) and comments "maybe out of
menmory!!!" (``:895``) — the intermediates ((N, C1, d) conv activations,
(N, H) FC activations) are materialized in HBM.

Here the whole per-row chain

    x_com -> conv1(3->C1) -> gelu -> conv2(C1->C2) -> gelu
          -> flatten -> fc1(C2*d -> H) -> gelu -> fc2(H -> d)

runs inside one Pallas kernel, blocked over rows: a (R, d) block of
``last``/``hat`` rows streams HBM->VMEM, every intermediate lives only in
VMEM/registers, and one (R, d) output block streams back. HBM traffic is
exactly 3 * N * d floats (2 reads + 1 write) — the speed-of-light for this
op — while the FC matmuls hit the MXU at (R, C2*d) x (C2*d, H).

The channel mixes are unrolled into scalar-weighted vector ops (C1=10, C2=5
are tiny), which keeps everything in 2D (R, d) layout — the natural TPU
tile — instead of awkward (R, C, d) 3D tiles.

Only the forward pass is needed: gradients never flow through the full-table
refresh (the refreshed tables are subsequently trained as leaves; per-batch
transfer applications in the train steps use the XLA path, which autodiffs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sml_tpu.models.transfer import ConvTower


def pallas_available() -> bool:
    """Fused kernel is compiled for real TPU backends only."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _kernel(last_ref, hat_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            fc1w_ref, fc1b_ref, fc2w_ref, fc2b_ref, out_ref,
            *, c1: int, c2: int):
    # snapshots may be stored bf16 (SMLConfig.snapshot_dtype): upcast in
    # VMEM so all math (incl. the x_com norm) runs f32; HBM still only
    # streams the narrow inputs
    x_t = last_ref[:].astype(jnp.float32)   # (R, d)
    x_hat = hat_ref[:].astype(jnp.float32)  # (R, d)

    # interaction channel (conv_transfer.py:93-100); forward-only so the
    # stop_gradient is implicit
    prod = x_t * x_hat
    norm = jnp.sqrt(jnp.sum(x_t * x_t, axis=-1, keepdims=True))
    x_com = jnp.where(norm > 0, prod / jnp.where(norm > 0, norm, 1.0), 0.0)

    w1 = w1_ref[:]                          # (C1, 3)
    b1 = b1_ref[:]                          # (C1, 1)
    w2 = w2_ref[:]                          # (C2, C1)
    b2 = b2_ref[:]                          # (C2, 1)

    def gelu(v):
        return v * jax.nn.sigmoid(1.702 * v)

    # conv1: 3 -> C1 channel mix, unrolled; h1[c] is (R, d)
    h1 = [gelu(w1[c, 0] * x_t + w1[c, 1] * x_hat + w1[c, 2] * x_com + b1[c, 0])
          for c in range(c1)]
    # conv2: C1 -> C2 1x1 mix; flatten channel-major to (R, C2*d)
    h2 = [gelu(sum(w2[e, c] * h1[c] for c in range(c1)) + b2[e, 0])
          for e in range(c2)]
    flat = jnp.concatenate(h2, axis=-1)     # (R, C2*d), index c*d+j ✓

    # NOTE: forcing bf16 inputs here was measured a strict no-op (bit-
    # identical output, same ms): TPU default matmul precision already
    # feeds the MXU bf16 inputs for f32 operands (r4 refresh_bf16 probe)
    h3 = gelu(jnp.dot(flat, fc1w_ref[:],
                      preferred_element_type=jnp.float32) + fc1b_ref[:])
    out_ref[:] = jnp.dot(h3, fc2w_ref[:],
                         preferred_element_type=jnp.float32) + fc2b_ref[:]


@functools.partial(jax.jit, static_argnames=("block_rows",))
def fused_table_transfer(tower: ConvTower, last: jax.Array, hat: jax.Array,
                         block_rows: int = 1024) -> jax.Array:
    """Θ_side(last, hat) over all N rows. Shapes (N, d) -> (N, d)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = last.shape
    c1 = tower.conv1_w.shape[0]
    c2 = tower.conv2_w.shape[0]
    h = tower.fc1_w.shape[1]
    n_pad = -(-n // block_rows) * block_rows
    if n_pad != n:
        pad = ((0, n_pad - n), (0, 0))
        last = jnp.pad(last, pad)
        hat = jnp.pad(hat, pad)

    grid = (n_pad // block_rows,)
    row_spec = pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def rep(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    flops_per_row = 2 * (c2 * d * h + h * d) + 40 * d
    out = pl.pallas_call(
        functools.partial(_kernel, c1=c1, c2=c2),
        grid=grid,
        in_specs=[row_spec, row_spec,
                  rep((c1, 3)), rep((c1, 1)),
                  rep((c2, c1)), rep((c2, 1)),
                  rep((c2 * d, h)), rep((1, h)),
                  rep((h, d)), rep((1, d))],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_row * n_pad,
            bytes_accessed=(2 * last.dtype.itemsize + 4) * n_pad * d,
            transcendentals=(c1 + c2) * d * n_pad + h * n_pad,
        ),
    )(last, hat,
      tower.conv1_w, tower.conv1_b.reshape(c1, 1),
      tower.conv2_w, tower.conv2_b.reshape(c2, 1),
      tower.fc1_w, tower.fc1_b.reshape(1, h),
      tower.fc2_w, tower.fc2_b.reshape(1, d))
    return out[:n]

"""Explicit collective embedding lookup over row-sharded tables.

The engine's default path lets GSPMD partition the gathers (computation
follows data, `parallel/sharding.py`). This module is the *explicit*
formulation of the same exchange for when collective choice must be pinned
down (multi-host DCN layouts, cost modeling, or kernels that GSPMD handles
poorly):

* every device holds a contiguous row shard of the table (``P('model')``);
* a replicated index batch is resolved by each shard masking the ids it
  owns, gathering locally, and ``psum``-ing the partial rows over the mesh
  axis — one all-reduce of ``(B, d)`` instead of a gather across HBMs;
* the backward pass is the exact transpose (mask → local scatter-add; the
  psum transposes to identity), which JAX derives automatically, so the
  row-sharded Adam moments receive local updates with no extra collectives.

``shard_map``-based; compose under ``jax.jit`` over a Mesh.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def collective_gather(table_shard: jax.Array, idx: jax.Array,
                      axis_name: str = "model") -> jax.Array:
    """Gather global rows from a row-sharded table. Call inside shard_map.

    ``table_shard``: (rows_per_shard, d) local shard;
    ``idx``: (B,) global row ids, replicated across the axis.
    Returns (B, d) replicated rows.
    """
    rows_per = table_shard.shape[0]
    shard = jax.lax.axis_index(axis_name)
    local = idx - shard * rows_per
    in_range = (local >= 0) & (local < rows_per)
    safe = jnp.clip(local, 0, rows_per - 1)
    rows = jnp.where(in_range[:, None], table_shard[safe], 0.0)
    return jax.lax.psum(rows, axis_name)


def make_sharded_mf_train_step(mesh: Mesh, lr: float = 0.01,
                               l2: float = 1e-5):
    """A BPR/BCE MF SGD step with explicit collective lookups.

    Demonstration/validation harness for the collective path: tables and
    their updates stay shard-local; only the (B, d) activation rows cross
    the interconnect. Returns a jitted ``step(user_tab, item_tab, u, i, j)
    -> (user_tab, item_tab, loss)`` with tables sharded ``P('model')``.
    """

    def step(user_tab, item_tab, u, i, j):
        def inner(ut, it_, u, i, j):
            def loss_fn(tabs):
                ut, it_ = tabs
                xu = collective_gather(ut, u)
                xi = collective_gather(it_, i)
                xj = collective_gather(it_, j)
                pos = jnp.sum(xu * xi, -1)
                neg = jnp.sum(xu * xj, -1)
                bce = -jnp.mean(jnp.log(jax.nn.sigmoid(pos) + 1e-15)) \
                    - jnp.mean(jnp.log(jax.nn.sigmoid(-neg) + 1e-15))
                reg = l2 * 0.5 * (jnp.sum(xu * xu) + jnp.sum(xi * xi)
                                  + jnp.sum(xj * xj))
                return bce + reg

            loss, (gu, gi) = jax.value_and_grad(loss_fn)((ut, it_))
            return ut - lr * gu, it_ - lr * gi, loss

        # check_vma=True (default) is load-bearing: it tracks which values
        # are replicated so the transpose of the lookup's psum is the
        # identity (not another psum) — with it off, gradients through
        # collective_gather are overcounted by the shard count.
        return jax.shard_map(
            inner, mesh=mesh,
            in_specs=(P("model"), P("model"), P(), P(), P()),
            out_specs=(P("model"), P("model"), P()),
        )(user_tab, item_tab, u, i, j)

    return jax.jit(step, donate_argnums=(0, 1))

"""Mesh construction and state sharding.

The reference is single-process single-GPU (SURVEY.md §2.3) — all
parallelism here is new design:

* mesh axes ``('data', 'model')``;
* both embedding tables (and every state leaf that is row-aligned with them:
  Adam moments, the ``last``/``hat`` snapshot tables) are **row-sharded over
  'model'**;
* Θ and its optimizer state are tiny and replicated;
* batches are sharded over 'data'.

The jitted epoch functions are sharding-agnostic: computation follows data
(GSPMD), so the same compiled code path serves 1 chip and an N-chip mesh,
with XLA inserting the all-gather/reduce-scatter collectives for the
row-sharded table lookups and scatter-add gradients.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = 1, n_model: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_model is None:
        n_model = len(devices) // n_data
    assert n_data * n_model <= len(devices), \
        f"need {n_data * n_model} devices, have {len(devices)}"
    arr = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def shard_state(state, mesh: Mesh, n_users: int, n_items: int):
    """Place an SMLState (or any pytree) on the mesh.

    Any leaf whose leading dimension equals the user or item count is a
    table-row-aligned array (embedding tables, bias tables, snapshot tables,
    Adam moments of all of those) and is sharded ``P('model')`` on its rows;
    everything else (Θ, scalars, counts, PRNG keys) is replicated.
    """
    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P("model"))

    def place(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] in (n_users, n_items) \
                and x.shape[0] % mesh.shape["model"] == 0:
            return jax.device_put(x, row)
        return jax.device_put(x, repl)

    return jax.tree.map(place, state)


def state_shardings(tree, mesh: Mesh, n_users: int, n_items: int):
    """Sharding pytree for a state pytree (or its ``jax.eval_shape``
    result), under the same placement rule as :func:`shard_state`: rows
    aligned with a table axis go ``P('model')``, everything else
    replicated. Used as ``out_shardings`` so huge states can be created
    born-sharded instead of materialized unsharded and re-placed."""
    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P("model"))

    def spec(x):
        if len(x.shape) >= 1 and x.shape[0] in (n_users, n_items) \
                and x.shape[0] % mesh.shape["model"] == 0:
            return row
        return repl

    return jax.tree.map(spec, tree)


def shard_batch(padded, mesh: Mesh):
    """Shard padded epoch rows over the 'data' axis (rows replicated over
    'model')."""
    data = NamedSharding(mesh, P("data"))
    cm = getattr(padded, "cand_mask", None)
    return padded._replace(
        rows=jax.device_put(padded.rows, data),
        mask=jax.device_put(padded.mask, data),
        **({"cand_mask": jax.device_put(cm, data)} if cm is not None else {}))


def replicate(tree, mesh: Mesh):
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(jax.numpy.asarray(x), repl),
                        tree)

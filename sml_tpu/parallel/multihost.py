"""Multi-host (multi-process / DCN) execution.

The reference is strictly single-process single-GPU
(``/root/reference/main_yelp.py:125``); this module is new design per
SURVEY.md §2.3's communication-backend row and BASELINE.json's N>=2-host
scaling target.

Layout doctrine (scaling-book style): the **model axis is intra-host** — the
row-sharded table lookups/scatters and the full-table refresh exchange
activation rows over ICI — while the **data axis spans hosts**, so the only
DCN traffic is the gradient ``psum`` over the batch axis and the parameter
re-broadcast, both O(d·B) or amortized. Every process holds the full period
files (recsys logs are small next to tables) and uploads only its data-axis
slice of each padded epoch; table shards live on local devices.

Under JAX's multi-controller model every process runs the SAME program; the
engine's jitted epochs are sharding-agnostic, so single-process and
multi-process runs share one code path. All helpers here are no-op
pass-throughs when ``jax.process_count() == 1``.

Validated by ``tests/test_multihost.py``: two local processes × 4 CPU
devices each must reproduce the single-process state trajectory.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Join (or bootstrap) the multi-process runtime.

    On TPU pods all arguments auto-detect; on CPU/GPU clusters pass
    ``coordinator`` ("host:port"), ``num_processes`` and ``process_id``
    (CLI: ``--coordinator/--num-processes/--process-id``).
    """
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_global_mesh(n_model: Optional[int] = None) -> Mesh:
    """Mesh over ALL processes' devices: ``data`` axis = processes (DCN),
    ``model`` axis = devices within a process (ICI). With ``n_model`` given,
    the local devices are further split (n_local // n_model extra data
    ways)."""
    procs = jax.process_count()
    local = len(jax.local_devices())
    if n_model is None:
        n_model = local
    assert local % n_model == 0, (local, n_model)
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devs).reshape(procs * (local // n_model), n_model)
    return Mesh(arr, ("data", "model"))


def process_slice(n: int) -> slice:
    """This process's contiguous block of ``n`` data-axis rows."""
    p, np_ = jax.process_index(), jax.process_count()
    per = n // np_
    assert n % np_ == 0, f"rows {n} must divide process count {np_}"
    return slice(p * per, (p + 1) * per)


def global_batch(padded, mesh: Mesh):
    """Per-host batch feed: build the global padded epoch from this
    process's slice. All processes must hold identical host-side rows (they
    read the same period files); each uploads only its slice."""
    if jax.process_count() == 1:
        from sml_tpu.parallel.sharding import shard_batch
        return shard_batch(padded, mesh)
    sh = NamedSharding(mesh, P("data"))
    sl = process_slice(padded.rows.shape[0])
    rows = jax.make_array_from_process_local_data(
        sh, np.ascontiguousarray(np.asarray(padded.rows)[sl]))
    mask = jax.make_array_from_process_local_data(
        sh, np.ascontiguousarray(np.asarray(padded.mask)[sl]))
    return padded._replace(rows=rows, mask=mask)


def global_state(state, mesh: Mesh, n_users: int, n_items: int):
    """Multi-process analogue of ``sharding.shard_state``: row-aligned leaves
    sharded ``P('model')`` (intra-host), everything else replicated. Each
    process materializes the full leaf locally (same seed => identical
    values) and contributes the shards its devices own."""
    if jax.process_count() == 1:
        from sml_tpu.parallel.sharding import shard_state
        return shard_state(state, mesh, n_users, n_items)
    row = NamedSharding(mesh, P("model"))
    repl = NamedSharding(mesh, P())

    def place(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] in (n_users, n_items) \
                and x.shape[0] % mesh.shape["model"] == 0:
            # model axis is intra-process: every process holds all rows
            return jax.make_array_from_process_local_data(row, x)
        return jax.make_array_from_process_local_data(repl, x)

    return jax.tree.map(place, state)


def global_replicated(tree, mesh: Mesh):
    """Replicate a pytree of host/device arrays across the global mesh (all
    processes must hold identical values — e.g. a ``PeriodIndex`` built from
    the same period file)."""
    if jax.process_count() == 1:
        from sml_tpu.parallel.sharding import replicate
        return replicate(tree, mesh)
    repl = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
        tree)


def fetch(x) -> np.ndarray:
    """Bring a (possibly non-fully-addressable) array to every host."""
    if jax.process_count() == 1 or isinstance(x, (int, float, np.ndarray)):
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


class MultihostPlacement:
    """Placement strategy plugged into ``SMLEngine.placement``: routes every
    host->device transfer through the global mesh so the unchanged engine /
    driver code runs multi-process. Also valid single-process (where it
    degrades to the plain ``sharding.py`` helpers)."""

    def __init__(self, mesh: Mesh, n_users: int, n_items: int):
        self.mesh = mesh
        self.n_users = n_users
        self.n_items = n_items

    def batch(self, padded):
        return global_batch(padded, self.mesh)

    def replicated(self, tree):
        return None if tree is None else global_replicated(tree, self.mesh)

    def state(self, state):
        return global_state(state, self.mesh, self.n_users, self.n_items)

    @staticmethod
    def fetch(x) -> np.ndarray:
        return fetch(x)

    @staticmethod
    def is_main() -> bool:
        return jax.process_index() == 0

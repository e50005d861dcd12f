"""Worker process for the multi-host validation run.

Launched N times (one per simulated host) by ``tests/test_multihost.py`` or
by hand:

    python scripts/multihost_worker.py --coordinator 127.0.0.1:12345 \
        --num-processes 2 --process-id 0 --local-devices 4 --out /tmp/mh.npz

Each process gets ``--local-devices`` virtual CPU devices; the global mesh is
(data=processes, model=local devices). Runs two full SML phases of the real
engine (same shapes as ``tests/test_sharding.py``) with per-host batch
feeding and writes the final tables + θ (process 0 only) for the parent to
compare against its single-process run.
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")

    from sml_tpu.parallel.multihost import (
        MultihostPlacement, fetch, init_distributed, make_global_mesh)
    init_distributed(args.coordinator, args.num_processes, args.process_id)
    assert jax.process_count() == args.num_processes
    assert len(jax.devices()) == args.num_processes * args.local_devices

    import numpy as np

    from sml_tpu.train.engine import SMLEngine
    from tests.test_multihost import N_ITEMS, N_USERS, mk_cfg, mk_periods

    cfg = mk_cfg()
    periods = mk_periods()
    engine = SMLEngine(cfg, N_USERS, N_ITEMS)
    mesh = make_global_mesh()
    engine.placement = MultihostPlacement(mesh, N_USERS, N_ITEMS)
    state = engine.placement.state(engine.init_state())

    losses = []
    for set_t, set_tt in periods:
        state = engine.snapshot_last(state)
        state, linner = engine.inner_epoch(state, *engine.prep_inner(set_t))
        state = engine.snapshot_hat(state)
        state = engine.refresh(state)
        state, louter = engine.outer_epoch(state, *engine.prep_outer(set_tt))
        state = engine.refresh(state)
        losses.append([float(np.mean(fetch(linner))),
                       float(np.mean(fetch(louter)))])

    user = fetch(state.mf.user_emb)
    item = fetch(state.mf.item_emb)
    theta = [fetch(l) for l in jax.tree.leaves(state.theta)]
    if jax.process_index() == 0:
        np.savez(args.out, user_emb=user, item_emb=item,
                 losses=np.asarray(losses),
                 **{f"theta_{i}": t for i, t in enumerate(theta)})
        with open(args.out + ".done", "w") as fh:
            json.dump({"processes": jax.process_count(),
                       "devices": len(jax.devices())}, fh)
    print(f"[proc {jax.process_index()}] done; losses={losses}", flush=True)


if __name__ == "__main__":
    main()

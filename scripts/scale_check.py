"""Compile-level validation of the scaled configuration (SURVEY.md §7 #8).

The BASELINE.json north star names a 50M-user / 5M-item row-sharded
deployment. No machine here holds that in HBM, but the multi-chip program
can still be *built and partitioned* without materializing anything:
AOT-lower the jitted inner epoch against ShapeDtypeStructs carrying
NamedShardings over an N-device mesh and verify it partitions (GSPMD
accepts the shardings, per-device shapes divide evenly, the compiled HLO
exists).

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/scale_check.py --users 50000000 --items 5000000 --devices 8
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=50_000_000)
    ap.add_argument("--items", type=int, default=5_000_000)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--rows", type=int, default=1_048_576)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sml_tpu.config import SMLConfig, TransferConfig
    from sml_tpu.models.mf import MFParams
    from sml_tpu.models.transfer import init_transfer
    from sml_tpu.parallel.sharding import make_mesh
    from sml_tpu.train.optim import torch_adam
    from sml_tpu.train.steps import make_inner_epoch

    U = (args.users // args.devices) * args.devices
    I = (args.items // args.devices) * args.devices
    d = 64
    mesh = make_mesh(1, args.devices)
    row = NamedSharding(mesh, P("model"))
    repl = NamedSharding(mesh, P())

    cfg = SMLConfig(mf_batch_size=args.batch, latent_dim=d,
                    transfer=TransferConfig(latent_dim=d), mf_sample="all")
    tx = torch_adam(cfg.mf_lr)
    epoch = make_inner_epoch(cfg, tx)

    def tab(n, m, sh):
        return jax.ShapeDtypeStruct((n, m), jnp.float32, sharding=sh)

    mf = MFParams(tab(U, d, row), tab(I, d, row),
                  tab(U, 1, row), tab(I, 1, row))
    opt = (
        # matches torch_adam's chain: add_decayed_weights, scale_by_adam, scale
        __import__("optax").EmptyState(),
        __import__("optax").ScaleByAdamState(
            jax.ShapeDtypeStruct((), jnp.int32, sharding=repl),
            mf, jax.tree.map(lambda x: x, mf)),
        __import__("optax").EmptyState(),
    )
    theta = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=repl),
        init_transfer(jax.random.PRNGKey(0), cfg.transfer))
    rows = jax.ShapeDtypeStruct((args.rows, 1001), jnp.int32, sharding=repl)
    mask = jax.ShapeDtypeStruct((args.rows,), jnp.float32, sharding=repl)
    n_real = jax.ShapeDtypeStruct((), jnp.int32, sharding=repl)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=repl)

    lowered = jax.jit(epoch).lower(
        mf, opt, theta, tab(U, d, row), tab(I, d, row), rows, mask, n_real,
        key, None)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    per_dev_tables = (U + I) * d * 4 * 3 / args.devices / 2**30
    print(f"OK: inner epoch partitioned over {args.devices} devices for "
          f"{U:,} users x {I:,} items")
    print(f"   per-device table+moments memory: {per_dev_tables:.1f} GiB")
    if mem is not None:
        print(f"   compiler-reported argument bytes/device: "
              f"{getattr(mem, 'argument_size_in_bytes', 0)/2**30:.1f} GiB")


if __name__ == "__main__":
    main()

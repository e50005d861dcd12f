"""TPU smoke + timing for the fused masked-rank eval kernel.

Checks the Pallas kernel compiles on the real chip, produces hit/NDCG sums
identical to the gather reference on integer tables, and reports steady
rows/s for kernel vs XLA-masked vs matmul vs gather on the roofline shape
(16,384 rows x 1000 negatives x 20k items). One JSON doc to stdout.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from sml_tpu.eval.evaluator import make_eval_fn
    from sml_tpu.models.mf import MFParams, init_mf
    from sml_tpu.ops.eval_kernel import build_packed_mask

    log(f"backend={jax.default_backend()}")
    res = {"backend": jax.default_backend()}

    # -- exactness on integer tables (gather == masked+pallas, bit-equal)
    rng = np.random.default_rng(11)
    users, items, dim, cands, rows_n, bs = 400, 5000, 64, 60, 256, 64
    tab = lambda shape: jnp.asarray(rng.integers(-2, 3, shape), jnp.float32)
    mfp = MFParams(tab((users, dim)), tab((items, dim)),
                   jnp.zeros((users, 1)), jnp.zeros((items, 1)))
    cand = np.stack([rng.permutation(items)[:cands + 1]
                     for _ in range(rows_n)])
    rows = jnp.asarray(np.concatenate(
        [rng.integers(0, users, (rows_n, 1)), cand], axis=1), jnp.int32)
    mask = jnp.ones((rows_n,))
    log("exactness: building mask...")
    cm = jax.jit(lambda r: build_packed_mask(r, items))(rows[:, 2:])
    jax.block_until_ready(cm)
    log("exactness: gather eval...")
    acc_g = jax.jit(make_eval_fn((5, 10, 20), bs, scoring="gather"))(
        mfp, rows, mask)
    jax.block_until_ready(acc_g)
    log("exactness: masked pallas eval...")
    acc_m = jax.jit(make_eval_fn((5, 10, 20), bs, scoring="masked",
                                 use_pallas=True))(mfp, rows, mask, cm)
    jax.block_until_ready(acc_m)
    exact = all(float(acc_g[k][0]) == float(acc_m[k][0])
                and abs(float(acc_g[k][1]) - float(acc_m[k][1])) < 1e-4
                for k in (5, 10, 20))
    res["integer_table_exact"] = bool(exact)
    res["hits"] = {k: [float(acc_g[k][0]), float(acc_m[k][0])]
                   for k in (5, 10, 20)}
    log(f"exactness: {exact} {res['hits']}")

    # -- timing on the roofline shape
    BATCH = 1024
    n_users, n_items, cands = 100_000, 20_000, 1000
    n_rows = 16 * BATCH
    key = jax.random.PRNGKey(3)
    mfp = init_mf(key, n_users, n_items, 64)
    rows = jnp.concatenate([
        jax.random.randint(key, (n_rows, 1), 0, n_users),
        jax.random.randint(key, (n_rows, cands), 0, n_items)], axis=1)
    mask = jnp.ones((n_rows,))

    def timed(fn, *args, repeats=7):
        outs = fn(*args)
        jax.block_until_ready(outs)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            jax.block_until_ready(fn(*args))
            best = min(best, time.time() - t0)
        return best

    cand_mask = None
    for method in ("mxu", "compare"):
        build = jax.jit(lambda r, m=method: build_packed_mask(
            r, n_items, method=m))
        try:
            tb = timed(build, rows[:, 2:], repeats=3)
            res[f"mask_build_{method}_ms"] = round(tb * 1e3, 1)
            log(f"mask_build[{method}]: {tb*1e3:.1f} ms")
            if cand_mask is None:
                cand_mask = build(rows[:, 2:])
        except Exception as e:
            res[f"mask_build_{method}_ms"] = f"{type(e).__name__}: {e}"
            log(f"mask_build[{method}] FAILED: {type(e).__name__}: {e}")

    for mode, pallas in (("gather", False), ("matmul", False),
                         ("masked", False), ("masked", True),
                         ("masked_bf16", True)):
        name = mode + ("_pallas" if pallas else "")
        fn = jax.jit(make_eval_fn((5, 10, 20), BATCH, scoring=mode,
                                  use_pallas=pallas))
        fargs = ((mfp, rows, mask, cand_mask) if mode.startswith("masked")
                 else (mfp, rows, mask))
        try:
            dt = timed(fn, *fargs)
            res[name] = {"total_ms": round(dt * 1e3, 2),
                         "rows_per_s": round(n_rows / dt)}
            log(f"{name}: {dt*1e3:.2f} ms, {n_rows/dt:,.0f} rows/s")
        except Exception as e:
            res[name] = {"error": f"{type(e).__name__}: {e}"}
            log(f"{name} FAILED: {type(e).__name__}: {e}")

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()

"""Serving-path throughput: full-catalog top-K on one chip.

The reference has no serving path at all (it only ranks 1000-candidate
slates, ``model/MF.py:45-57``); ``eval/full_ranking.py`` is this
framework's production ranking entry (`rank` CLI). Measures the dense
single-chip path at Yelp-scale and the scaled catalog, f32 vs bf16
inputs, with the device-time protocol (in-program scan, CSE-defeated)
next to the blocking number. The sharded path's exactness is covered by
``dryrun_multichip`` section (e) and tests; its throughput needs real
multi-chip hardware.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

from sml_tpu.eval.full_ranking import dense_full_topk


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--latent", type=int, default=64)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--trials", type=int, default=7)
    ap.add_argument("--out", default="/tmp/serving_probe.json")
    args = ap.parse_args()

    B, d, K, N = args.batch, args.latent, args.k, args.reps
    out = {"batch": B, "latent": d, "k": K,
           "backend": jax.default_backend(), "shapes": {}}
    rng = np.random.default_rng(5)
    for n_items in (20_000, 120_000, 1_000_000, 5_000_000):
        # the dense path materializes the (B, I) score matrix; cap it to
        # ~2.1 GB (the 5M catalog at B=1024 would need 20 GB — that size
        # is exactly what the sharded path exists for)
        B_eff = min(B, max(128, int(2**31 // (4 * n_items) // 128 * 128)))
        items = jnp.asarray(rng.standard_normal((n_items, d)),
                            jnp.float32)
        users = jnp.asarray(rng.standard_normal((B_eff, d)), jnp.float32)
        shape_res = {}
        # recall of the hardware PartialReduce vs exact top-K, one batch
        try:
            _, ids_exact = dense_full_topk(users, items, K,
                                           topk_method="exact_sort")
            ids_exact = np.asarray(ids_exact)
            for meth in ("exact", "approx", "approx99"):
                _, ids_a = dense_full_topk(users, items, K,
                                           topk_method=meth)
                ids_a = np.asarray(ids_a)
                overlap = np.mean([
                    len(set(ids_exact[b]) & set(ids_a[b])) / K
                    for b in range(ids_exact.shape[0])])
                shape_res[f"recall_{meth}_vs_exact"] = round(
                    float(overlap), 4)
        except Exception as e:
            shape_res["recall_error"] = f"{type(e).__name__}"
        variants = (("f32_exact", None, "exact"),   # bucket at these widths
                    ("f32_exact_sort", None, "exact_sort"),
                    ("f32_approx", None, "approx"),
                    ("f32_approx99", None, "approx99"),
                    ("bf16_exact", jnp.bfloat16, "exact"),
                    ("bf16_approx99", jnp.bfloat16, "approx99"))
        for dtype_name, cdt, meth in variants:
            @jax.jit
            def run(u, it, cdt=cdt, meth=meth):
                def body(carry, _):
                    s, ids = dense_full_topk(u + carry, it, K,
                                             compute_dtype=cdt,
                                             topk_method=meth)
                    # s[:, 0] finite; carry stays exactly 0.0 — defeats CSE
                    c = jnp.where(jnp.isnan(s[0, 0]), 1.0, 0.0)
                    return c, ids[0, 0]
                c, ids = lax.scan(body, jnp.float32(0.0), None, length=N)
                return ids[-1] + c.astype(jnp.int32)

            try:
                # int(...) materializes the scalar on host: the ONLY
                # reliable completion barrier on the axon platform
                # (block_until_ready returns early — bench.py note; the
                # first capture of this probe "measured" 850 TF/s)
                int(run(users, items))
                best = float("inf")
                for _ in range(args.trials):
                    t0 = time.time()
                    int(run(users, items))
                    best = min(best, time.time() - t0)
            except Exception as e:
                shape_res[dtype_name] = {"error": f"{type(e).__name__}"}
                continue
            dev = best / N
            flops = 2.0 * B_eff * n_items * d
            shape_res[dtype_name] = {
                "batch": B_eff,
                "device_ms": round(dev * 1e3, 3),
                "users_per_s": round(B_eff / dev, 0),
                "tflops": round(flops / dev / 1e12, 2),
            }
            log(f"items={n_items} {dtype_name}: {dev*1e3:.2f} ms/batch "
                f"(B={B_eff}) -> {B_eff/dev:,.0f} users/s "
                f"({flops/dev/1e12:.1f} TF/s)")
        out["shapes"][str(n_items)] = shape_res
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    log(f"wrote {args.out}")


if __name__ == "__main__":
    main()

"""Round-5 masked-rank kernel: dispatch-overhead vs device-time split.

Probe 1 (eval_kernel_probe.py) showed EVERY layout variant — grid order,
row-block size, dimension_semantics, bf16 — lands at ~23 ms for the
16,384 x 20k shape, and ~29 ms at 120k items (6x the FLOPs). A constant
~22 ms independent of work is not kernel physics; it matches the axon
tunnel's per-dispatch round trip. This probe separates the two:

  blocking   one dispatch + block per trial (probe-1 methodology)
  pipelined  N independent dispatches, block once at the end — the
             device queue runs back-to-back; wall/N ~= device time +
             async dispatch cost (this is how production dispatches
             evals: evaluate_deferred never blocks per call)
  scanned    N kernel invocations inside ONE jitted lax.scan (a data
             dependence defeats CSE); wall/N ~= pure device time

Run at 20k and 120k items.
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

from sml_tpu.ops.eval_kernel import (build_packed_mask, masked_rank_pallas,
                                     pad_items)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16384)
    ap.add_argument("--items", type=int, default=20480)
    ap.add_argument("--latent", type=int, default=64)
    ap.add_argument("--neg", type=int, default=999)
    ap.add_argument("--n", type=int, default=20, help="calls per window")
    ap.add_argument("--trials", type=int, default=8)
    ap.add_argument("--out", default="/tmp/eval_kernel_probe2.json")
    args = ap.parse_args()

    B, I, d, N = args.rows, args.items, args.latent, args.n
    ipad = pad_items(I)
    rng = np.random.default_rng(7)
    ue = jnp.asarray(rng.integers(-1, 2, (B, d)).astype(np.float32))
    it = rng.integers(-1, 2, (ipad, d)).astype(np.float32)
    items_t = jnp.asarray(it.T.copy())
    pos = rng.integers(0, I, (B,))
    sstar = jnp.asarray(
        (np.asarray(ue) * it[pos]).sum(1, dtype=np.float32).reshape(B, 1))
    neg = rng.integers(0, I, (B, args.neg)).astype(np.int32)
    maskp = build_packed_mask(jnp.asarray(neg), I)
    jax.block_until_ready(maskp)
    log(f"setup: B={B} I={I} d={d} N={N}")

    run1 = jax.jit(lambda u, t, s, m: masked_rank_pallas(u, t, s, m))
    run1(ue, items_t, sstar, maskp).block_until_ready()   # compile

    @jax.jit
    def run_scan(u, t, s, m):
        # data dependence between iterations that XLA cannot fold away
        # (counts >= 0 always, so carry stays exactly 0.0): defeats CSE /
        # loop-invariant hoisting of the N kernel calls
        def body(carry, _):
            counts = masked_rank_pallas(u, t, s + carry, m)
            carry = jnp.where(counts[0] < 0, jnp.float32(1.0),
                              jnp.float32(0.0))
            return carry, counts[0]
        carry, cs = lax.scan(body, jnp.float32(0.0), None, length=N)
        return cs[-1] + carry

    run_scan(ue, items_t, sstar, maskp).block_until_ready()  # compile

    res = {"rows": B, "items": I, "n": N}

    def window(fn, label):
        times = []
        for _ in range(args.trials):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        best = min(times)
        res[label] = {"best_ms_per_call": round(best * 1e3, 3),
                      "rows_per_s": round(B / best, 0),
                      "trials_ms": [round(t * 1e3, 2) for t in times]}
        log(f"{label}: {best*1e3:.2f} ms/call -> {B/best:,.0f} rows/s "
            f"(trials {[f'{t*1e3:.1f}' for t in times]})")

    def blocking():
        run1(ue, items_t, sstar, maskp).block_until_ready()

    def pipelined():
        outs = [run1(ue, items_t, sstar, maskp) for _ in range(N)]
        outs[-1].block_until_ready()
        del outs

    def scanned():
        run_scan(ue, items_t, sstar, maskp).block_until_ready()

    window(blocking, "blocking")

    t0 = time.time(); pipelined(); dt = (time.time() - t0) / N
    res["pipelined"] = {"best_ms_per_call": round(dt * 1e3, 3),
                        "rows_per_s": round(B / dt, 0)}
    log(f"pipelined warm window: {dt*1e3:.2f} ms/call")
    times = []
    for _ in range(args.trials):
        t0 = time.time(); pipelined(); times.append((time.time() - t0) / N)
    best = min(times)
    res["pipelined"] = {"best_ms_per_call": round(best * 1e3, 3),
                        "rows_per_s": round(B / best, 0),
                        "trials_ms": [round(t * 1e3, 2) for t in times]}
    log(f"pipelined: {best*1e3:.2f} ms/call -> {B/best:,.0f} rows/s")

    times = []
    for _ in range(args.trials):
        t0 = time.time(); scanned(); times.append((time.time() - t0) / N)
    best = min(times)
    res["scanned"] = {"best_ms_per_call": round(best * 1e3, 3),
                      "rows_per_s": round(B / best, 0),
                      "trials_ms": [round(t * 1e3, 2) for t in times]}
    log(f"scanned: {best*1e3:.2f} ms/call -> {B/best:,.0f} rows/s")

    with open(args.out, "w") as fh:
        json.dump(res, fh, indent=2)
    log(f"wrote {args.out}")


if __name__ == "__main__":
    main()

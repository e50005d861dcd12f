"""Roofline / MFU accounting for the three hot paths (VERDICT r2 Weak #4).

Measures device time with amortized dispatch (every timed region is ONE
jitted program — a ``lax.scan`` of N repeats — because each dispatch over
the axon tunnel costs ~20-30 ms host round-trip), then reports achieved
HBM GB/s and MXU FLOP/s against the v5e roofline:

  inner step      batch 1024 SML inner step: conv-transfer loss + dense
                  torch-Adam over the FULL tables (the parity choice that
                  makes it memory-bound; train/optim.py:11-17)
  refresh         fused full-table transfer apply (ops/transfer_kernel.py)
                  at several table sizes — separates per-row cost from the
                  fixed dispatch overhead that round 2 misread as a "10x
                  per-row gap at small tables" (VERDICT r2 Weak #4)
  eval            999-negative scoring + top-K, batch 1024

One JSON document to stdout; diagnostics to stderr.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e (TPU v5 lite) single-chip peaks, public spec
HBM_BYTES_S = 819e9
BF16_FLOPS = 197e12
DIM = 64
BATCH = 1024


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, *args, repeats=7):
    """Best-of wall time of an already-compiled one-dispatch program.

    The device is behind the axon tunnel, which stalls for seconds at
    random (tunnel_bw_r3.json) — stalls only ever ADD time, so the min
    over enough repeats converges on true device+dispatch time. Three
    repeats proved too few (a stall once survived into every sample and
    produced a negative two-point difference); seven is cheap since each
    call is a single dispatch."""
    outs = fn(*args)
    _sync(outs)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        outs = fn(*args)
        _sync(outs)
        best = min(best, time.time() - t0)
    return best, outs


def _sync(tree):
    """Force completion by materializing ONE scalar on host.

    np.asarray(full_array) would ship the whole buffer over the ~27 MB/s
    axon tunnel (512 MB ≈ 19 s at the 2M-row refresh size), swamping the
    device time being measured; indexing first keeps the d2h copy to one
    element."""
    import jax
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        leaf = leaves[0]
        idx = (0,) * getattr(leaf, "ndim", 0)
        np.asarray(leaf[idx] if idx else leaf)


def inner_step_roofline():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sml_tpu.config import SMLConfig, TransferConfig
    from sml_tpu.models.mf import init_mf
    from sml_tpu.models.transfer import init_transfer
    from sml_tpu.train.optim import torch_adam
    from sml_tpu.train.steps import transferred_pair_loss

    import optax

    n_users, n_items = 100_000, 20_000
    steps = 200
    cfg = SMLConfig(mf_batch_size=BATCH, latent_dim=DIM,
                    transfer=TransferConfig(latent_dim=DIM))
    key = jax.random.PRNGKey(0)
    mfp = init_mf(key, n_users, n_items, DIM)
    theta = init_transfer(key, cfg.transfer)
    last_u = jax.random.normal(key, (n_users, DIM)) * 0.1
    last_i = jax.random.normal(key, (n_items, DIM)) * 0.1
    tx = torch_adam(cfg.mf_lr, weight_decay=0.0)
    opt = tx.init(mfp)
    rng = np.random.default_rng(0)
    batches = jnp.asarray(np.stack([
        rng.integers(0, n_users, (steps, BATCH)),
        rng.integers(0, n_items, (steps, BATCH)),
        rng.integers(0, n_items, (steps, BATCH))], axis=2), jnp.int32)
    ones = jnp.ones((BATCH,), jnp.float32)

    def loss_fn(m, b):
        u, i, j = b[:, 0], b[:, 1], b[:, 2]
        return transferred_pair_loss(
            theta, cfg.transfer, last_u[u], last_i[i], last_i[j],
            m.user_emb[u], m.item_emb[i], m.item_emb[j], ones, True)

    @jax.jit
    def run(m, o):
        def body(c, b):
            m, o = c
            g = jax.grad(loss_fn)(m, b)
            up, o = tx.update(g, o, m)
            return (optax.apply_updates(m, up), o), jnp.float32(0)
        (m, o), _ = lax.scan(body, (m, o), batches)
        return m, o

    dt, _ = timed(run, mfp, opt)
    per_step = dt / steps
    table_rows = n_users + n_items
    # dense torch-Adam: read (grad, param, m, v) + write (param, m, v)
    # over the full tables = 7 full-table passes, f32
    adam_bytes = 7 * table_rows * DIM * 4
    # conv transfer fwd+bwd on 3 rows (u, i, j) per example
    tower = (10 * 3 * DIM + 5 * 10 * DIM + 5 * DIM * 512 + 512 * DIM) * 2
    flops = 3 * BATCH * tower * 3          # 3 rows, bwd ~= 2x fwd
    return {
        "per_step_ms": per_step * 1e3,
        "examples_per_s": BATCH / per_step,
        "adam_bytes_per_step": adam_bytes,
        "hbm_gbs": adam_bytes / per_step / 1e9,
        "hbm_frac_of_peak": adam_bytes / per_step / HBM_BYTES_S,
        "transfer_tflops": flops / per_step / 1e12,
        "mxu_frac_of_bf16_peak": flops / per_step / BF16_FLOPS,
        "note": "memory-bound by the dense torch-Adam parity choice: "
                "7 f32 passes over the full (U+I) x d tables per step",
    }


def refresh_roofline(sizes=(131_072, 524_288, 2_097_152)):
    # per-row cost is flat from 131k to 2M rows (56-64M rows/s), so larger
    # single-chip sizes add no roofline information — and deliberately
    # OOM-probing 4M+ rows leaves HBM fragmented enough to crash the eval
    # section that follows (the 5-6M-row regime is measured sharded in
    # benchmarks_scale_r2.json instead)
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sml_tpu.config import TransferConfig
    from sml_tpu.models import transfer as transfer_mod
    from sml_tpu.models.transfer import init_transfer

    tcfg = TransferConfig(latent_dim=DIM)
    theta = init_transfer(jax.random.PRNGKey(1), tcfg)
    out = {}
    lu = hu = li = hi = None
    for rows in sizes:
        # free the previous size's buffers BEFORE allocating the next:
        # rebinding alone holds both generations alive at once and
        # fragmented HBM into a ResourceExhausted at 4.2M rows
        del lu, hu, li, hi
        nu = rows * 5 // 6
        ni = rows - nu
        key = jax.random.PRNGKey(2)
        try:
            lu = jax.random.normal(key, (nu, DIM))
            hu = jax.random.normal(key, (nu, DIM))
            li = jax.random.normal(key, (ni, DIM))
            hi = jax.random.normal(key, (ni, DIM))
        except Exception as e:
            log(f"refresh rows={rows}: alloc skipped ({type(e).__name__})")
            lu = hu = li = hi = None
            continue

        def once(reps):
            # donate nothing (timed() re-runs with the same buffers), but
            # keep the carry = the input tuple so XLA reuses ONE set of
            # table buffers through the scan instead of accumulating copies
            @jax.jit
            def run(lu, hu, li, hi):
                def body(c, _):
                    lu, hu, li, hi = c
                    u, i = transfer_mod.apply_tables(theta, tcfg,
                                                     lu, hu, li, hi)
                    # feed outputs back so scan iterations cannot be CSE'd
                    return (u, hu, i, hi), 0.0
                c, _ = lax.scan(body, (lu, hu, li, hi), None, length=reps)
                return c
            return run

        try:
            t3, _ = timed(once(3), lu, hu, li, hi)
            t19, _ = timed(once(19), lu, hu, li, hi)
        except Exception as e:   # e.g. HBM exhaustion at the largest size
            log(f"refresh rows={rows}: skipped ({type(e).__name__})")
            lu = hu = li = hi = None
            continue
        per_call = (t19 - t3) / 16          # dispatch/sync overhead cancels
        overhead = t3 - 3 * per_call
        if per_call <= 0:                   # a tunnel stall survived all
            log(f"refresh rows={rows}: unreliable (t19 {t19:.3f} <= t3 "
                f"{t3:.3f}), skipped")
            continue
        # bytes: read last+hat, write out = 3 passes x rows x d x 4
        # (NOTE: forcing bf16 FC-matmul inputs was A/B'd on the chip and
        # is a strict no-op — bit-identical outputs, 37.2 vs 37.4 ms at
        # 2.1M rows (/tmp/refresh_bf16_probe.json): TPU default matmul
        # precision already feeds the MXU bf16 inputs for f32 operands)
        bytes_moved = 3 * rows * DIM * 4
        tower = (10 * 3 * DIM + 5 * 10 * DIM + 5 * DIM * 512
                 + 512 * DIM) * 2
        out[str(rows)] = {
            "device_ms_per_call": per_call * 1e3,
            "dispatch_overhead_ms": overhead * 1e3,
            "rows_per_s": rows / per_call,
            "hbm_gbs": bytes_moved / per_call / 1e9,
            "tflops": rows * tower / per_call / 1e12,
            "mxu_frac_of_bf16_peak": rows * tower / per_call / BF16_FLOPS,
        }
        log(f"refresh rows={rows}: {per_call*1e3:.2f} ms/call "
            f"(+{overhead*1e3:.1f} ms overhead), "
            f"{rows/per_call/1e6:.1f}M rows/s")
    return out


def eval_roofline():
    """The 999-negative scoring loop across SCORING_MODES and the two
    production item-table sizes (toy/roofline 20k, Yelp-scale 120k).

    Traffic model per row: gather modes move (C+1)·d·itemsize random
    bytes; matmul modes stream the (B,I) score matrix, ≈ 2·I·4 bytes/row
    (write + column-pick re-read), with the table read amortized over the
    batch. Metric sums are cross-checked against mode='gather' per shape
    (differences are f32-reduction-order rank flips; see
    tests/test_eval_scoring.py for the exact-parity construction)."""
    import jax
    import jax.numpy as jnp

    from sml_tpu.eval.evaluator import make_eval_fn
    from sml_tpu.models.mf import init_mf
    from sml_tpu.ops.eval_kernel import build_packed_mask

    use_pallas = jax.default_backend() == "tpu"
    n_users, cands = 100_000, 1000
    n_rows = 16 * BATCH
    out = {}
    for n_items in (20_000, 120_000):
        key = jax.random.PRNGKey(3)
        mfp = init_mf(key, n_users, n_items, DIM)
        rows = jnp.concatenate([
            jax.random.randint(key, (n_rows, 1), 0, n_users),
            jax.random.randint(key, (n_rows, cands), 0, n_items)], axis=1)
        mask = jnp.ones((n_rows,))
        shape_out = {}
        # once-per-eval-set packed mask build (amortized over the up-to
        # multi_num*(mf+tr epochs) in-training evals per period)
        build = jax.jit(lambda r, n=n_items: build_packed_mask(r, n))
        t_build, cand_mask = timed(build, rows[:, 2:], repeats=3)
        shape_out["mask_build"] = {"total_ms": t_build * 1e3,
                                   "rows_per_s": n_rows / t_build}
        log(f"eval items={n_items} mask_build: {t_build*1e3:.1f} ms")
        base_hit = None
        REPS = 8

        def make_scanned(mode):
            """N eval invocations inside ONE program: wall/N is DEVICE
            time. Round-5 finding (eval_kernel_probe2): a single blocking
            dispatch carries a ~22 ms tunnel round-trip that dominated
            every per-dispatch eval number — e.g. the masked kernel's
            'total_ms' at 20k items is ~23 ms blocking but ~1-2 ms of
            actual device time. Production never pays the per-call RTT:
            in-training evals run inside the fused period scan and test
            evals dispatch without blocking (evaluate_deferred)."""
            core = make_eval_fn((5, 10, 20), BATCH, scoring=mode,
                                use_pallas=use_pallas)
            from jax import lax

            def run(mfp, rows, mask, cand_mask=None):
                def body(carry, _):
                    acc = (core(mfp, rows, mask + carry, cand_mask)
                           if mode.startswith("masked")
                           else core(mfp, rows, mask + carry))
                    h = acc[20][0]
                    # h >= 0 always, so carry stays 0.0 — a data
                    # dependence XLA cannot fold (defeats CSE/hoisting)
                    return jnp.where(h < 0, 1.0, 0.0), h
                c, hs = lax.scan(body, jnp.float32(0.0), None, length=REPS)
                return hs[-1] + c

            return jax.jit(run)

        for mode in ("gather", "matmul", "gather_bf16", "matmul_bf16",
                     "masked", "masked_bf16"):
            fn = jax.jit(make_eval_fn((5, 10, 20), BATCH, scoring=mode,
                                      use_pallas=use_pallas))
            fargs = ((mfp, rows, mask, cand_mask)
                     if mode.startswith("masked") else (mfp, rows, mask))
            try:
                dt, acc = timed(fn, *fargs)
                dt_scan, _ = timed(make_scanned(mode), *fargs, repeats=5)
                dev = dt_scan / REPS
            except Exception as e:   # one mode OOMing must not kill rest
                shape_out[mode] = {"error": f"{type(e).__name__}"}
                continue
            hit20 = float(acc[20][0])
            if mode == "gather":
                base_hit = hit20
            itemsize = 2 if mode.endswith("bf16") else 4
            if mode.startswith("masked"):
                # kernel: table re-streamed per row block + packed mask
                # read; the (B, I) score matrix never leaves VMEM
                ipad = -(-n_items // 4096) * 4096
                bytes_moved = ((n_rows // 256) * ipad * DIM * itemsize
                               + n_rows * ipad // 8)
            elif mode.startswith("matmul"):
                bytes_moved = n_rows * 2 * n_items * 4 \
                    + (n_rows // BATCH) * n_items * DIM * itemsize
            else:
                bytes_moved = n_rows * (cands + 1) * DIM * itemsize
            flops = 2 * n_rows * DIM * (
                cands if mode.startswith("gather") else n_items)
            shape_out[mode] = {
                "total_ms": dt * 1e3,              # one blocking dispatch
                "rows_per_s": n_rows / dt,
                "device_ms": dev * 1e3,            # scanned: RTT excluded
                "device_rows_per_s": n_rows / dev,
                "hbm_gbs": bytes_moved / dev / 1e9,
                "hbm_frac_of_peak": bytes_moved / dev / HBM_BYTES_S,
                "tflops": flops / dev / 1e12,
                "hit20_delta_vs_gather": (None if base_hit is None
                                          else hit20 - base_hit),
            }
            log(f"eval items={n_items} {mode}: blocking {dt*1e3:.1f} ms / "
                f"device {dev*1e3:.2f} ms -> {n_rows/dev:,.0f} rows/s "
                f"device, hitΔ="
                f"{shape_out[mode]['hit20_delta_vs_gather']}")
        out[f"items_{n_items}"] = shape_out
    out["rows"] = n_rows
    return out


def main():
    import argparse

    import jax
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny refresh sizes (CPU CI smoke)")
    ap.add_argument("--sections", default="inner_step,refresh,eval",
                    help="comma-separated subset to run")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    sizes = (16_384, 65_536) if args.smoke else \
        (131_072, 524_288, 2_097_152)
    res = {
        "device": str(jax.devices()[0]),
        "peaks": {"hbm_bytes_s": HBM_BYTES_S, "bf16_flops": BF16_FLOPS},
    }
    # one failed section must not discard the others' measurements
    wanted = {s.strip() for s in args.sections.split(",") if s.strip()}
    for name, fn in (("inner_step", inner_step_roofline),
                     ("refresh", lambda: refresh_roofline(sizes)),
                     ("eval", eval_roofline)):
        if name not in wanted:
            continue
        try:
            res[name] = fn()
        except Exception as e:
            log(f"{name} failed: {type(e).__name__}: {e}")
            res[name] = {"error": f"{type(e).__name__}: {e}"}
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

"""Eval-path roofline push (VERDICT r3 "Next" #4): benchmark candidate
implementations of the 999-negative scoring loop.

The round-3 roofline put eval at 7.4% of HBM peak: the per-row candidate
gather reads (C+1) random f32 item rows per example (256 B each), which
DRAM services badly. Variants measured here:

  v0_gather_f32     current production path (models/mf.py:score_candidates)
  v1_gather_bf16    same gather, item/user tables pre-cast to bf16,
                    f32 accumulation (halves gather traffic)
  v2_matmul_gather  score ALL items per row block on the MXU
                    (B,d)@(d,I), then take_along_axis picks candidate
                    scores — turns 256 B random reads into a streaming
                    matmul + 4 B row-local gathers
  v3_matmul_bf16    v2 with bf16 matmul inputs, f32 scores
  v4_pallas         fused: item table resident in VMEM, per row-block MXU
                    scores + in-VMEM candidate gather; candidate scores
                    never round-trip HBM

Every variant feeds the SAME rank/metric kernels (ops/metrics.py) and is
checked against v0's hit/NDCG sums before timing. One JSON doc to stdout.

Usage: python scripts/eval_variants.py [--platform cpu] [--rows 16384]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
BATCH = 1024


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(tree):
    import jax
    for leaf in jax.tree.leaves(tree):
        np.asarray(leaf)


def timed(fn, *args, repeats=7):
    outs = fn(*args)
    _sync(outs)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        outs = fn(*args)
        _sync(outs)
        best = min(best, time.time() - t0)
    return best, outs


def make_eval_with_scorer(topks, batch_size, scorer, prep=None):
    """The evaluator scan with a pluggable scoring function.

    ``scorer(ctx, users, cand) -> (B, C) scores``; ``prep(mfp) -> ctx``
    runs once per eval (outside the scan) — table casts/transposes live
    there so per-batch work stays honest."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sml_tpu.ops.metrics import hits_and_ndcg_at, rank_of_target

    topks = tuple(topks)

    def evaluate(mfp, rows, mask):
        ctx = prep(mfp) if prep else mfp
        nb = rows.shape[0] // batch_size

        def body(acc, i):
            r = lax.dynamic_slice_in_dim(rows, i * batch_size, batch_size)
            m = lax.dynamic_slice_in_dim(mask, i * batch_size, batch_size)
            scores = scorer(ctx, r[:, 0], r[:, 1:])
            rank = rank_of_target(scores)
            res = hits_and_ndcg_at(rank, m, topks)
            return {k: (acc[k][0] + res[k][0], acc[k][1] + res[k][1])
                    for k in topks}, None

        acc0 = {k: (jnp.float32(0.0), jnp.float32(0.0)) for k in topks}
        acc, _ = lax.scan(body, acc0, jnp.arange(nb))
        return acc

    return evaluate


def scorer_gather_f32(mfp, users, cand):
    import jax.numpy as jnp
    ue = mfp.user_emb[users]
    ce = mfp.item_emb[cand]
    return jnp.einsum("bd,bcd->bc", ue, ce,
                      preferred_element_type=jnp.float32)


def prep_bf16(mfp):
    import jax.numpy as jnp
    return (mfp.user_emb.astype(jnp.bfloat16),
            mfp.item_emb.astype(jnp.bfloat16))


def scorer_gather_bf16(ctx, users, cand):
    import jax.numpy as jnp
    ue_t, ie_t = ctx
    return jnp.einsum("bd,bcd->bc", ue_t[users], ie_t[cand],
                      preferred_element_type=jnp.float32)


def prep_matmul(mfp):
    return (mfp.user_emb, mfp.item_emb.T)


def scorer_matmul(ctx, users, cand):
    import jax.numpy as jnp
    ue_t, ie_T = ctx
    all_scores = jnp.dot(ue_t[users], ie_T,
                         preferred_element_type=jnp.float32)   # (B, I)
    return jnp.take_along_axis(all_scores, cand, axis=1)


def prep_matmul_bf16(mfp):
    import jax.numpy as jnp
    return (mfp.user_emb.astype(jnp.bfloat16),
            mfp.item_emb.astype(jnp.bfloat16).T)


def make_pallas_scorer(n_items, row_block=256, interpret=False):
    """Fused MXU-score + in-VMEM gather kernel. Item table (bf16) stays
    resident in VMEM across the grid; per row block: (Rb,d)@(d,I) on the
    MXU into VMEM f32, then take_along_axis in-register. Falls back by
    raising if Mosaic can't lower the lane gather."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(ue_ref, cand_ref, table_ref, out_ref):
        ue = ue_ref[...].astype(jnp.float32)                   # (Rb, d)
        tab = table_ref[...]                                   # (I, d) bf16
        scores = jax.lax.dot_general(
            ue.astype(jnp.bfloat16), tab,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # (Rb, I)
        out_ref[...] = jnp.take_along_axis(scores, cand_ref[...], axis=1)

    def scorer(ctx, users, cand):
        ue_t, ie_t = ctx                                       # bf16 tables
        ue = ue_t[users]                                       # (B, d)
        b, c = cand.shape
        grid = (b // row_block,)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((row_block, DIM), lambda i: (i, 0)),
                pl.BlockSpec((row_block, c), lambda i: (i, 0)),
                pl.BlockSpec((n_items, DIM), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((row_block, c), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((b, c), jnp.float32),
            interpret=interpret,
        )(ue, cand, ie_t)
        return out

    return scorer


def build_candidate_mask(rows, n_items_pad):
    """(n, 2+C) eval rows -> (n, I_pad) int8 candidate-membership mask.

    Candidates (cols 1:) are DISTINCT within a row (the test-set builder's
    oversample-then-setdiff contract, dataset2.py:395-400), so membership
    ∈ {0,1} and rank-by-count == rank-by-gather. Built on device once per
    eval set, in row chunks to bound the scatter transient."""
    import jax
    import jax.numpy as jnp

    def chunk_mask(cand):
        n = cand.shape[0]
        m = jnp.zeros((n, n_items_pad), jnp.int8)
        return m.at[jnp.arange(n)[:, None], cand].set(1, mode="drop")

    return jax.lax.map(chunk_mask,
                       rows[:, 1:].reshape(-1, 512, rows.shape[1] - 1)
                       ).reshape(rows.shape[0], n_items_pad)


def make_masked_rank_eval(topks, batch_size, n_items_pad, scores_fn):
    """Evaluator computing rank = sum(mask * (s_all > s_target)) — no
    candidate gather at all. ``scores_fn(ctx, ue) -> (B, I_pad)``."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sml_tpu.ops.metrics import hits_and_ndcg_at

    topks = tuple(topks)

    def evaluate(ctx, ue_all, tgt_all, maskm, mask):
        nb = ue_all.shape[0] // batch_size

        def body(acc, i):
            ue = lax.dynamic_slice_in_dim(ue_all, i * batch_size, batch_size)
            tgt = lax.dynamic_slice_in_dim(tgt_all, i * batch_size,
                                           batch_size)
            mm = lax.dynamic_slice_in_dim(maskm, i * batch_size, batch_size)
            m = lax.dynamic_slice_in_dim(mask, i * batch_size, batch_size)
            s_all = scores_fn(ctx, ue)                       # (B, I_pad)
            sstar = jnp.take_along_axis(s_all, tgt[:, None], axis=1)
            rank = jnp.sum((mm > 0) & (s_all > sstar), axis=1,
                           dtype=jnp.int32)
            res = hits_and_ndcg_at(rank, m, topks)
            return {k: (acc[k][0] + res[k][0], acc[k][1] + res[k][1])
                    for k in topks}, None

        acc0 = {k: (jnp.float32(0.0), jnp.float32(0.0)) for k in topks}
        acc, _ = lax.scan(body, acc0, jnp.arange(nb))
        return acc

    return evaluate


def make_masked_rank_pallas(n_items_pad, dim=DIM, row_block=256,
                            item_block=2048, interpret=False):
    """Fused masked-rank kernel: item table resident in VMEM, two passes
    over item blocks per row block (pass 0 accumulates the target's score
    from the SAME matmul tiles pass 1 compares against, so tie semantics
    are exact), rank accumulated on-chip — per-candidate scores never
    exist in HBM."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(ue_ref, tgt_ref, mask_ref, table_ref, rank_ref, sstar_ref):
        # f32-only comparisons: Mosaic on this target rejects sub-32-bit /
        # mixed-int vector compares ("Target does not support this
        # comparison"), so the mask is multiplied in as f32 and the target
        # one-hot is an f32 equality against an f32 column index (item ids
        # < 2^24, exactly representable)
        # grid order (rb, p, ib): row block OUTERMOST so each output block
        # is only revisited on CONSECUTIVE grid steps (Pallas only carries
        # output-block state across adjacent visits); pass p sits between
        # so pass 0 (target score) fully precedes pass 1 (rank) per block
        p = pl.program_id(1)
        ib = pl.program_id(2)
        ue = ue_ref[...]                                    # (Rb, d) bf16
        tab = table_ref[...]                                # (Ib, d) bf16
        s = jax.lax.dot_general(
            ue, tab, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (Rb, Ib)
        colf = (jnp.float32(ib * item_block)
                + jax.lax.broadcasted_iota(
                    jnp.int32, (row_block, item_block), 1
                ).astype(jnp.float32))

        @pl.when((p == 0) & (ib == 0))
        def _init_sstar():
            sstar_ref[...] = jnp.zeros_like(sstar_ref)

        @pl.when(p == 0)
        def _acc_sstar():
            is_tgt = (colf == tgt_ref[...]).astype(jnp.float32)
            sstar_ref[...] += jnp.sum(s * is_tgt, axis=1, keepdims=True)

        @pl.when((p == 1) & (ib == 0))
        def _init_rank():
            rank_ref[...] = jnp.zeros_like(rank_ref)

        @pl.when(p == 1)
        def _acc_rank():
            gt = (s > sstar_ref[...]).astype(jnp.float32)
            maskf = mask_ref[...].astype(jnp.float32)   # int8 block upcast
            rank_ref[...] += jnp.sum(maskf * gt, axis=1, keepdims=True)

    def rank_fn(table_bf16, ue, tgt, maskm):
        b = ue.shape[0]
        grid = (b // row_block, 2, n_items_pad // item_block)
        rank, _ = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((row_block, dim), lambda rb, p, ib: (rb, 0)),
                pl.BlockSpec((row_block, 1), lambda rb, p, ib: (rb, 0)),
                pl.BlockSpec((row_block, item_block),
                             lambda rb, p, ib: (rb, ib)),
                pl.BlockSpec((item_block, dim), lambda rb, p, ib: (ib, 0)),
            ],
            out_specs=[
                pl.BlockSpec((row_block, 1), lambda rb, p, ib: (rb, 0)),
                pl.BlockSpec((row_block, 1), lambda rb, p, ib: (rb, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, 1), jnp.float32),   # rank
                jax.ShapeDtypeStruct((b, 1), jnp.float32),   # s*
            ],
            interpret=interpret,
        )(ue.astype(jnp.bfloat16),
          tgt.astype(jnp.float32)[:, None],
          maskm,
          table_bf16)
        return rank[:, 0].astype(jnp.int32)

    return rank_fn


def make_pallas_masked_eval(topks, batch_size, n_items_pad,
                            interpret=False):
    import jax.numpy as jnp
    from jax import lax

    from sml_tpu.ops.metrics import hits_and_ndcg_at

    topks = tuple(topks)
    rank_fn = make_masked_rank_pallas(n_items_pad, interpret=interpret)

    def evaluate(table_bf16, ue_all, tgt_all, maskm, mask):
        nb = ue_all.shape[0] // batch_size

        def body(acc, i):
            ue = lax.dynamic_slice_in_dim(ue_all, i * batch_size,
                                          batch_size)
            tgt = lax.dynamic_slice_in_dim(tgt_all, i * batch_size,
                                           batch_size)
            mm = lax.dynamic_slice_in_dim(maskm, i * batch_size, batch_size)
            m = lax.dynamic_slice_in_dim(mask, i * batch_size, batch_size)
            rank = rank_fn(table_bf16, ue, tgt, mm)
            res = hits_and_ndcg_at(rank, m, topks)
            return {k: (acc[k][0] + res[k][0], acc[k][1] + res[k][1])
                    for k in topks}, None

        acc0 = {k: (jnp.float32(0.0), jnp.float32(0.0)) for k in topks}
        acc, _ = lax.scan(body, acc0, jnp.arange(nb))
        return acc

    return evaluate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--rows", type=int, default=16 * BATCH)
    ap.add_argument("--users", type=int, default=100_000)
    ap.add_argument("--items", type=int, default=20_000)
    ap.add_argument("--cands", type=int, default=1000)
    ap.add_argument("--rounds", type=int, default=7)
    args = ap.parse_args()
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from sml_tpu.models.mf import init_mf

    log(f"backend={jax.default_backend()}")
    key = jax.random.PRNGKey(3)
    mfp = init_mf(key, args.users, args.items, DIM)
    # Candidates must be DISTINCT within a row (the real eval contract,
    # dataset2.py:395-400) — plain randint would put ~C^2/2I duplicates
    # per row and make the masked-rank variants diverge from the gather
    # ones by construction. Distinct + randomly scattered: a random-base,
    # random-odd-stride arithmetic progression mod I (distinct while
    # (C+1)*stride spans < I cycles... ensured by stride < I/(C+1)).
    rng = np.random.default_rng(3)
    max_stride = max(1, (args.items - 1) // (args.cands + 1))
    base = rng.integers(0, args.items, (args.rows, 1))
    stride = rng.integers(1, max_stride + 1, (args.rows, 1))
    cand_np = (base + stride * np.arange(args.cands + 1)) % args.items
    assert all(len(np.unique(r)) == args.cands + 1 for r in cand_np[:8])
    rows = jnp.concatenate([
        jax.random.randint(key, (args.rows, 1), 0, args.users),
        jnp.asarray(cand_np)], axis=1).astype(jnp.int32)
    mask = jnp.ones((args.rows,))

    interp = jax.default_backend() == "cpu"
    item_block = 2048
    n_items_pad = -(-args.items // item_block) * item_block

    # eval-set prep shared by the masked variants: candidate-membership
    # mask (built once per eval set in production) + padded bf16 table
    t0 = time.time()
    maskm = jax.jit(build_candidate_mask,
                    static_argnums=1)(rows, n_items_pad)
    _sync(maskm)
    mask_build_s = time.time() - t0
    log(f"candidate-mask build: {mask_build_s*1e3:.1f} ms for "
        f"{args.rows} rows ({maskm.nbytes/2**20:.0f} MiB)")

    def pad_table(t):
        return jnp.pad(t, ((0, n_items_pad - t.shape[0]), (0, 0)))

    ev5 = make_masked_rank_eval((5, 10, 20), BATCH, n_items_pad,
                                lambda ieT, ue: jnp.dot(
                                    ue, ieT,
                                    preferred_element_type=jnp.float32))
    ev6 = make_pallas_masked_eval((5, 10, 20), BATCH, n_items_pad,
                                  interpret=interp)

    def run_masked_xla(mfp, rows, mask, maskm):
        return ev5(pad_table(mfp.item_emb).T, mfp.user_emb[rows[:, 0]],
                   rows[:, 1], maskm, mask)

    def run_masked_xla_bf16(mfp, rows, mask, maskm):
        ieT = pad_table(mfp.item_emb).astype(jnp.bfloat16).T
        return ev5(ieT, mfp.user_emb[rows[:, 0]].astype(jnp.bfloat16),
                   rows[:, 1], maskm, mask)

    def run_masked_pallas(mfp, rows, mask, maskm):
        tab = pad_table(mfp.item_emb).astype(jnp.bfloat16)
        return ev6(tab, mfp.user_emb[rows[:, 0]], rows[:, 1], maskm, mask)

    def classic(scorer, prep):
        ev = make_eval_with_scorer((5, 10, 20), BATCH, scorer, prep)
        return lambda mfp, rows, mask, maskm: ev(mfp, rows, mask)

    variants = {
        "v0_gather_f32": classic(scorer_gather_f32, None),
        "v1_gather_bf16": classic(scorer_gather_bf16, prep_bf16),
        "v2_matmul_gather": classic(scorer_matmul, prep_matmul),
        "v3_matmul_bf16": classic(scorer_matmul, prep_matmul_bf16),
        "v4_pallas": classic(make_pallas_scorer(args.items,
                                                interpret=interp),
                             prep_bf16),
        "v5_masked_xla_f32": run_masked_xla,
        "v5b_masked_xla_bf16": run_masked_xla_bf16,
        "v6_masked_pallas": run_masked_pallas,
    }

    res = {"device": str(jax.devices()[0]), "rows": args.rows,
           "items": args.items, "cands": args.cands,
           "mask_build_ms": round(mask_build_s * 1e3, 1)}

    # The device sits behind a tunnel whose dispatch/execution timing
    # drifts 3-4x over MINUTES (the same v0 program measured 75 ms and
    # 287 ms in processes half an hour apart), so variants are compiled
    # first and then timed INTERLEAVED over several rounds — cross-variant
    # ratios within a round are meaningful even when absolute times drift.
    compiled, accs = {}, {}
    for name, runner in variants.items():
        try:
            fn = jax.jit(runner)
            acc = fn(mfp, rows, mask, maskm)          # compile + warm
            accs[name] = {k: (float(v[0]), float(v[1]))
                          for k, v in acc.items()}
            compiled[name] = fn
        except Exception as e:
            res[name] = {"error": f"{type(e).__name__}: {e}"}
            log(f"{name} FAILED: {type(e).__name__}: {e}")

    rounds = {name: [] for name in compiled}
    for r in range(args.rounds):
        for name, fn in compiled.items():
            t0 = time.time()
            _sync(fn(mfp, rows, mask, maskm))
            rounds[name].append(time.time() - t0)
        log(f"round {r}: " + " ".join(
            f"{n}={rounds[n][-1]*1e3:.1f}ms" for n in compiled))

    ref_acc = accs.get("v0_gather_f32")
    for name in compiled:
        dt = min(rounds[name])
        acc = accs[name]
        max_hit_delta = max(abs(acc[k][0] - ref_acc[k][0]) for k in acc)
        max_ndcg_delta = max(abs(acc[k][1] - ref_acc[k][1]) for k in acc)
        res[name] = {
            "total_ms": round(dt * 1e3, 3),
            "all_rounds_ms": [round(v * 1e3, 1) for v in rounds[name]],
            "rows_per_s": round(args.rows / dt),
            "speedup_vs_v0": round(
                min(rounds["v0_gather_f32"]) / dt, 2),
            "hit_sum@20": acc[20][0],
            "max_hit_delta_vs_v0": max_hit_delta,
            "max_ndcg_delta_vs_v0": round(max_ndcg_delta, 4),
        }
        log(f"{name}: min {dt*1e3:.2f} ms, {args.rows/dt:,.0f} rows/s, "
            f"hitΔ={max_hit_delta} ndcgΔ={max_ndcg_delta:.4f}")
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

"""Decompose the eval hot path into primitive costs on the real device.

The round-4 interleaved variant study (eval_variants_tpu5) showed the
999-negative eval is INDEX-ISSUE-bound, not bandwidth-bound: halving
gather bytes (bf16) bought 8%, swapping 256-B row gathers for 4-B score
picks bought nothing, and the only real win (1.75x) was the masked
compare+reduce that does zero indexed reads in steady state. This probe
times each primitive in isolation (same one-dispatch lax.scan harness as
scripts/roofline.py) to find where the masked path's remaining time goes
and whether a unique_indices scatter makes on-device mask builds viable.

One JSON doc to stdout.
"""

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
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        leaf = leaves[0]
        idx = (0,) * getattr(leaf, "ndim", 0)
        np.asarray(leaf[idx] if idx else leaf)


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


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    log(f"backend={jax.default_backend()}")
    n_users, n_items, cands = 100_000, 20_000, 1000
    ipad = 20_480
    n_rows = 16 * BATCH
    key = jax.random.PRNGKey(3)
    ku, ki, kr = jax.random.split(key, 3)
    user_emb = jax.random.normal(ku, (n_users, DIM), jnp.float32)
    item_emb = jax.random.normal(ki, (n_items, DIM), jnp.float32)
    item_pad = jnp.pad(item_emb, ((0, ipad - n_items), (0, 0)))
    rng = np.random.default_rng(3)
    users = jnp.asarray(rng.integers(0, n_users, (n_rows,)), jnp.int32)
    cand = jnp.asarray(rng.integers(0, n_items, (n_rows, cands + 1)),
                       jnp.int32)
    tgt = cand[:, 0]
    ue_all = user_emb[users]                       # (n, d) prefetched
    res = {"rows": n_rows, "items": n_items}

    def scan16(per_batch):
        """One-dispatch: scan the op over 16 batches, reduce to a scalar."""
        def body(acc, i):
            sl = lambda a: lax.dynamic_slice_in_dim(a, i * BATCH, BATCH)
            return acc + per_batch(sl), None
        out, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(n_rows // BATCH))
        return out

    ue_bf = ue_all.astype(jnp.bfloat16)
    tab_bf = item_pad.astype(jnp.bfloat16)
    s_blk = jnp.asarray(rng.normal(size=(BATCH, ipad)), jnp.float32)

    # every case takes its buffers as jit ARGUMENTS — closed-over arrays
    # are baked into the program as constants, which both bloats the
    # (remote) compile payload and lets XLA constant-fold the very op
    # being measured
    cases = {
        # 1. the bare (B,d)@(d,I) score matmul, f32 / bf16
        "dot_f32": ((lambda ue, tab: scan16(
            lambda sl: jnp.sum(jnp.dot(sl(ue), tab.T,
                               preferred_element_type=jnp.float32)))),
            (ue_all, item_pad)),
        "dot_bf16": ((lambda ue, tab: scan16(
            lambda sl: jnp.sum(jax.lax.dot_general(
                sl(ue), tab, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)))),
            (ue_bf, tab_bf)),
        # 2. dot + compare vs per-row target score + full reduce
        #    (rank-in-all: the masked path minus the mask read)
        "dot_cmp_reduce": ((lambda ue, tab, tg: scan16(
            lambda sl: jnp.sum((lambda s: (s > jnp.take_along_axis(
                s, sl(tg)[:, None], axis=1)).astype(jnp.float32))(
                jax.lax.dot_general(sl(ue), tab, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32))))),
            (ue_bf, tab_bf, tgt)),
        # 3. candidate-embedding gather alone (v0's hot op, no einsum)
        "gather_rows": ((lambda ie, cd: scan16(
            lambda sl: jnp.sum(ie[sl(cd)][:, :, 0]))),
            (item_emb, cand)),
        # 4. v0 entire: gather + einsum
        "gather_einsum": ((lambda ue, ie, cd: scan16(
            lambda sl: jnp.sum(jnp.einsum("bd,bcd->bc", sl(ue),
                                          ie[sl(cd)])))),
            (ue_all, item_emb, cand)),
        # 5. take_along_axis picks from a precomputed (B, I) score block
        "score_pick": ((lambda sb, cd: scan16(
            lambda sl: jnp.sum(jnp.take_along_axis(sb, sl(cd), axis=1)))),
            (s_blk, cand)),
    }

    for name, (f, fargs) in cases.items():
        fn = jax.jit(f)
        try:
            dt, _ = timed(fn, *fargs)
            res[name] = {"total_ms": round(dt * 1e3, 2),
                         "rows_per_s": round(n_rows / dt)}
            log(f"{name}: {dt*1e3:.2f} ms")
        except Exception as e:
            res[name] = {"error": f"{type(e).__name__}: {e}"}
            log(f"{name} FAILED: {type(e).__name__}: {e}")

    # 6. scatter mask build, unique_indices hint on/off, int8 vs u32-packed
    def build_scatter(unique):
        def f(cd):
            m = jnp.zeros((n_rows, ipad), jnp.int8)
            return m.at[jnp.arange(n_rows)[:, None], cd].set(
                1, mode="drop", unique_indices=unique)
        return f
    for uniq in (False, True):
        name = f"mask_scatter_uniq{int(uniq)}"
        try:
            fn = jax.jit(build_scatter(uniq))
            t0 = time.time()
            out = fn(cand)
            _sync(out)
            dt1 = time.time() - t0            # includes compile
            t0 = time.time()
            _sync(fn(cand))
            dt = time.time() - t0
            res[name] = {"first_s": round(dt1, 1),
                         "steady_ms": round(dt * 1e3, 1)}
            log(f"{name}: first {dt1:.1f}s steady {dt*1e3:.1f}ms")
            del out
        except Exception as e:
            res[name] = {"error": f"{type(e).__name__}"}
            log(f"{name} FAILED: {type(e).__name__}: {e}")
        if isinstance(res[name], dict) and \
                res[name].get("steady_ms", 1e9) > 120_000:
            break   # don't pay twice if hopeless

    # 6b. scatter-free mask build: membership by all-pairs compare,
    #     any-reduced over candidates, processed in (row, item) chunks so
    #     the (R, C, I_blk) bool transient stays tile-sized under XLA
    #     fusion. Zero indexed memory ops — pure VPU compares
    #     (rows*C*I of them), which is the point: indexed ops are
    #     issue-bound on this part, vector compares are not.
    def build_compare(cd):
        iblk = 2048
        rblk = 256

        def row_chunk(cd_chunk):            # (rblk, C+1)
            outs = []
            for i0 in range(0, ipad, iblk):
                cols = jnp.arange(i0, i0 + iblk, dtype=jnp.int32)
                hit = jnp.any(cd_chunk[:, :, None] == cols[None, None, :],
                              axis=1)
                outs.append(hit)
            return jnp.concatenate(outs, axis=1)   # (rblk, ipad) bool

        return jax.lax.map(row_chunk,
                           cd.reshape(-1, rblk, cands + 1)
                           ).reshape(n_rows, ipad)
    try:
        fn = jax.jit(build_compare)
        t0 = time.time()
        out = fn(cand)
        _sync(out)
        dt1 = time.time() - t0
        t0 = time.time()
        _sync(fn(cand))
        dt = time.time() - t0
        res["mask_build_compare"] = {"first_s": round(dt1, 1),
                                     "steady_ms": round(dt * 1e3, 1)}
        log(f"mask_build_compare: first {dt1:.1f}s steady {dt*1e3:.1f}ms")
        del out
    except Exception as e:
        res["mask_build_compare"] = {"error": f"{type(e).__name__}: {e}"}
        log(f"mask_build_compare FAILED: {type(e).__name__}: {e}")

    # 7. masked rank with a HOST-built uint32-packed mask, fully fused XLA:
    #    unpack via shift/and (vectorized), zero indexed reads per batch
    words = ipad // 32
    mp = np.zeros((n_rows, words), np.uint32)
    cnp = np.asarray(cand)
    r = np.repeat(np.arange(n_rows), cands + 1)
    c = cnp.ravel()
    np.bitwise_or.at(mp, (r, c // 32), (np.uint32(1) << (c % 32)))
    maskp = jnp.asarray(mp)
    shifts = jnp.arange(32, dtype=jnp.uint32)

    def masked_rank_packed(ue, tab, tg, mpk):
        def per_batch(sl):
            s = jax.lax.dot_general(sl(ue), tab, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            sstar = jnp.take_along_axis(s, sl(tg)[:, None], axis=1)
            gt = (s > sstar).reshape(BATCH, words, 32)
            bits = (sl(mpk)[:, :, None] >> shifts) & jnp.uint32(1)
            return jnp.sum(jnp.where(bits.astype(jnp.bool_), gt, False)
                           .astype(jnp.float32))
        return scan16(per_batch)
    try:
        fn = jax.jit(masked_rank_packed)
        dt, _ = timed(fn, ue_bf, tab_bf, tgt, maskp)
        res["masked_rank_packed_u32"] = {"total_ms": round(dt * 1e3, 2),
                                         "rows_per_s": round(n_rows / dt)}
        log(f"masked_rank_packed_u32: {dt*1e3:.2f} ms")
    except Exception as e:
        res["masked_rank_packed_u32"] = {"error": f"{type(e).__name__}: {e}"}
        log(f"masked_rank_packed_u32 FAILED: {type(e).__name__}: {e}")

    # 8. masked rank with int8 mask (v5's layout) for a same-process ratio
    m8 = np.zeros((n_rows, ipad), np.int8)
    m8[r, c] = 1
    mask8 = jnp.asarray(m8)

    def masked_rank_int8(ue, tab, tg, m8buf):
        def per_batch(sl):
            s = jax.lax.dot_general(sl(ue), tab, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            sstar = jnp.take_along_axis(s, sl(tg)[:, None], axis=1)
            return jnp.sum(((sl(m8buf) > 0) & (s > sstar))
                           .astype(jnp.float32))
        return scan16(per_batch)
    try:
        fn = jax.jit(masked_rank_int8)
        dt, _ = timed(fn, ue_bf, tab_bf, tgt, mask8)
        res["masked_rank_int8"] = {"total_ms": round(dt * 1e3, 2),
                                   "rows_per_s": round(n_rows / dt)}
        log(f"masked_rank_int8: {dt*1e3:.2f} ms")
    except Exception as e:
        res["masked_rank_int8"] = {"error": f"{type(e).__name__}: {e}"}

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

"""Eval scoring modes (evaluator.py SCORING_MODES) agree exactly.

Construction makes every mode bit-comparable: embedding entries are small
integers, so candidate scores are integers ≤ a few thousand — exactly
representable in f32 regardless of reduction order, and in bf16's 8-bit
mantissa after f32 accumulation (``preferred_element_type``). Any rank
therefore has ONE correct value and all four concrete modes plus 'auto'
must produce identical hit/NDCG sums, matching the reference's gather
semantics (``model/MF.py:50-57``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sml_tpu.eval.evaluator import SCORING_MODES, _resolve_mode, make_eval_fn
from sml_tpu.models.mf import MFParams
from sml_tpu.ops.batching import PaddedRows


def _int_mf(rng, users, items, dim):
    def table(shape):
        return jnp.asarray(rng.integers(-2, 3, shape), jnp.float32)
    return MFParams(user_emb=table((users, dim)),
                    item_emb=table((items, dim)),
                    user_bias=jnp.zeros((users, 1)),
                    item_bias=jnp.zeros((items, 1)))


@pytest.mark.parametrize("items", [300, 5000])
def test_all_modes_identical_on_integer_tables(items):
    rng = np.random.default_rng(11)
    users, dim, cands, rows_n, bs = 400, 16, 60, 128, 32
    mfp = _int_mf(rng, users, items, dim)
    # distinct candidates per row (the test-set builder's contract,
    # dataset2.py:395-400): a random permutation prefix per row
    cand = np.stack([rng.permutation(items)[:cands + 1]
                     for _ in range(rows_n)])
    rows = jnp.asarray(np.concatenate(
        [rng.integers(0, users, (rows_n, 1)), cand], axis=1), jnp.int32)
    mask = jnp.ones((rows_n,)).at[-5:].set(0.0)   # exercise padding

    results = {}
    for mode in SCORING_MODES:
        fn = jax.jit(make_eval_fn((5, 10, 20), bs, scoring=mode))
        acc = fn(mfp, rows, mask)
        results[mode] = {k: (float(v[0]), float(v[1]))
                         for k, v in acc.items()}
    base = results["gather"]
    for mode, acc in results.items():
        for k in base:
            assert acc[k][0] == base[k][0], (mode, k, acc[k], base[k])
            assert abs(acc[k][1] - base[k][1]) < 1e-4, (mode, k)


def test_auto_threshold_is_shape_driven():
    # maskless auto is always gather (matmul's pick loses on hardware)
    assert _resolve_mode("auto", 1000, 100, has_mask=False) == "gather"
    assert _resolve_mode("auto", 10**6, 100, has_mask=False) == "gather"
    # a shipped mask wins regardless of shape; masked w/o mask degrades
    assert _resolve_mode("auto", 10**6, 100, has_mask=True) == "masked"
    assert _resolve_mode("masked", 1000, 100, has_mask=False) == "matmul"
    assert _resolve_mode("masked_bf16", 1000, 100,
                         has_mask=False) == "matmul_bf16"
    with pytest.raises(ValueError):
        _resolve_mode("nope", 10, 10, has_mask=False)


def _packed_mask_np(neg, n_items):
    """Reference bitplane packing in plain numpy (eval_kernel layout)."""
    from sml_tpu.ops.eval_kernel import I_BLK, LANES, PLANES, pad_items
    B = neg.shape[0]
    ipad = pad_items(n_items)
    hit = np.zeros((B, ipad), bool)
    for b in range(B):
        hit[b, neg[b]] = True
    h = hit.reshape(B, ipad // I_BLK, PLANES, LANES)
    w = np.zeros((B, ipad // I_BLK, LANES), np.uint32)
    for k in range(PLANES):
        w |= h[:, :, k, :].astype(np.uint32) << np.uint32(k)
    return w.reshape(B, -1)


@pytest.mark.parametrize("method", ["mxu", "compare"])
@pytest.mark.parametrize("n_items", [50, 300, 5000])
def test_build_packed_mask_matches_numpy(n_items, method):
    from sml_tpu.ops.eval_kernel import build_packed_mask
    rng = np.random.default_rng(5)
    B, C = 64, 20
    neg = np.stack([rng.permutation(n_items)[:C] for _ in range(B)])
    got = np.asarray(jax.jit(
        lambda x: build_packed_mask(x, n_items, method=method))(
        jnp.asarray(neg)))
    np.testing.assert_array_equal(got, _packed_mask_np(neg, n_items))


def test_masked_modes_match_gather_with_mask():
    """masked / masked_bf16 with a real packed mask reproduce gather's
    sums exactly on integer tables, through both the XLA fallback and the
    Pallas kernel in interpret mode."""
    from jax.experimental.pallas import tpu as pltpu

    from sml_tpu.ops.eval_kernel import build_packed_mask
    rng = np.random.default_rng(11)
    users, items, dim, cands, rows_n, bs = 400, 300, 16, 60, 128, 32
    mfp = _int_mf(rng, users, items, dim)
    cand = np.stack([rng.permutation(items)[:cands + 1]
                     for _ in range(rows_n)])
    rows = jnp.asarray(np.concatenate(
        [rng.integers(0, users, (rows_n, 1)), cand], axis=1), jnp.int32)
    mask = jnp.ones((rows_n,)).at[-5:].set(0.0)
    cm = jax.jit(lambda x: build_packed_mask(x, items))(rows[:, 2:])

    base = jax.jit(make_eval_fn((5, 10, 20), bs, scoring="gather"))(
        mfp, rows, mask)
    base = {k: (float(v[0]), float(v[1])) for k, v in base.items()}

    for mode in ("masked", "masked_bf16", "auto"):
        for use_pallas in (False, True):
            fn = jax.jit(make_eval_fn((5, 10, 20), bs, scoring=mode,
                                      use_pallas=use_pallas))
            if use_pallas:
                with pltpu.force_tpu_interpret_mode():
                    acc = fn(mfp, rows, mask, cm)
            else:
                acc = fn(mfp, rows, mask, cm)
            for k, v in acc.items():
                assert float(v[0]) == base[k][0], (mode, use_pallas, k)
                assert abs(float(v[1]) - base[k][1]) < 1e-4, \
                    (mode, use_pallas, k)


def test_engine_builds_and_caches_eval_masks():
    """make_eval_set(build_mask=True) attaches the packed mask when the
    policy wants one, upgrades an existing cached entry in place, and the
    deferred eval path consumes it (auto -> masked) with unchanged
    metrics vs the mask-free path."""
    from sml_tpu.config import SMLConfig, TransferConfig
    from sml_tpu.train.engine import SMLEngine
    cfg = SMLConfig(latent_dim=8, transfer=TransferConfig(latent_dim=8),
                    eval_batch_size=16, eval_during_inner=True,
                    eval_scoring="auto")
    eng = SMLEngine(cfg, n_users=50, n_items=40)
    assert eng._want_masks
    state = eng.init_state()
    rng = np.random.default_rng(0)
    cand = np.stack([rng.permutation(40)[:11] for _ in range(24)])
    rows = np.concatenate([rng.integers(0, 50, (24, 1)), cand],
                          axis=1).astype(np.int64)

    plain = eng.make_eval_set(rows)                  # test-set path: no mask
    assert plain.cand_mask is None
    upgraded = eng.make_eval_set(rows, build_mask=True)
    assert upgraded.cand_mask is not None
    assert eng.make_eval_set(rows).cand_mask is not None   # cache upgraded

    m_masked = eng.evaluate(state.mf, upgraded)
    m_plain = eng.evaluate(state.mf, PaddedRows(
        upgraded.rows, upgraded.mask, upgraded.n_real))
    for k in m_masked:
        assert m_masked[k]["recall"] == m_plain[k]["recall"], k


def test_matmul_matches_gather_on_random_tables_to_f32_tolerance():
    """On random (non-integer) tables the reduction order differs; ranks
    may flip only where two scores are within f32 rounding. Metric sums
    must stay within one hit of each other at this size."""
    key = jax.random.PRNGKey(0)
    from sml_tpu.models.mf import init_mf
    mfp = init_mf(key, 500, 2000, 32)
    rng = np.random.default_rng(3)
    cand = np.stack([rng.permutation(2000)[:101] for _ in range(256)])
    rows = jnp.asarray(np.concatenate(
        [rng.integers(0, 500, (256, 1)), cand], axis=1), jnp.int32)
    mask = jnp.ones((256,))
    accs = {}
    for mode in ("gather", "matmul"):
        fn = jax.jit(make_eval_fn((20,), 64, scoring=mode))
        accs[mode] = {k: (float(v[0]), float(v[1]))
                      for k, v in fn(mfp, rows, mask).items()}
    assert abs(accs["gather"][20][0] - accs["matmul"][20][0]) <= 1.0
    assert abs(accs["gather"][20][1] - accs["matmul"][20][1]) <= 0.35

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
    assert _resolve_mode("auto", n_items=1000, n_cand=100) == "matmul"
    assert _resolve_mode("auto", n_items=10**6, n_cand=100) == "gather"
    with pytest.raises(ValueError):
        _resolve_mode("nope", 10, 10)


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

"""On-device negative sampling: the '∉ user positives' guarantee."""

import jax
import jax.numpy as jnp
import numpy as np

from sml_tpu.ops.sampling import (build_period_index, is_positive,
                                  presampled_neg_column, sample_negatives)


def _toy_period(rng, n_users=40, n_items=60, n=500):
    inter = np.stack([rng.integers(0, n_users, n),
                      rng.integers(0, n_items, n)], axis=1)
    return np.unique(inter, axis=0), n_items


def test_is_positive(rng):
    inter, n_items = _toy_period(rng)
    index = build_period_index(inter, n_items)
    u = jnp.asarray(inter[:, 0])
    i = jnp.asarray(inter[:, 1])
    assert bool(jnp.all(is_positive(index, u, i)))

    # a (user, item) pair not in the set must test negative
    pos = {(int(a), int(b)) for a, b in inter}
    neg_pairs = [(u0, i0) for u0 in range(5) for i0 in range(n_items)
                 if (u0, i0) not in pos][:50]
    nu = jnp.asarray([p[0] for p in neg_pairs])
    ni = jnp.asarray([p[1] for p in neg_pairs])
    assert not bool(jnp.any(is_positive(index, nu, ni)))


def test_sample_negatives_avoids_positives(rng):
    inter, n_items = _toy_period(rng)
    index = build_period_index(inter, n_items)
    pos = {(int(a), int(b)) for a, b in inter}
    pool = set(np.unique(inter[:, 1]).tolist())

    users = jnp.asarray(rng.integers(0, 40, 256), dtype=jnp.int32)
    negs = sample_negatives(index, users, jax.random.PRNGKey(0), tries=16)
    negs = np.asarray(negs)
    for u, j in zip(np.asarray(users), negs):
        assert int(j) in pool, "negative must come from the period item pool"
        assert (int(u), int(j)) not in pos, "sampled a positive as negative"


def test_sample_negatives_distribution(rng):
    """Sampler should hit the whole pool roughly uniformly."""
    inter, n_items = _toy_period(rng, n_users=10, n_items=30, n=60)
    index = build_period_index(inter, n_items)
    users = jnp.zeros(4000, dtype=jnp.int32)
    negs = np.asarray(sample_negatives(index, users,
                                       jax.random.PRNGKey(1), tries=16))
    pool = np.unique(inter[:, 1])
    user0_pos = {int(i) for u, i in inter if u == 0}
    valid = [i for i in pool if i not in user0_pos]
    counts = np.bincount(negs, minlength=n_items)[valid]
    assert counts.min() > 0
    assert counts.max() / max(counts.mean(), 1) < 2.5


def test_sampler_stats_at_shipped_default():
    """Statistical quality at the SHIPPED ``neg_tries`` default: a heavy user
    whose positives cover 80% of the pool falls back at ~(0.8 + fp)^T, and
    the true positive-leak rate is bounded by the fallback rate."""
    from sml_tpu.config import SMLConfig
    from sml_tpu.ops.sampling import sampler_stats

    tries = SMLConfig().neg_tries
    assert tries == 16, "docs/config contract: shipped default is 16"

    n_items = 50
    pool = np.arange(n_items)
    heavy_pos = pool[:40]                      # user 0: 80% of the pool
    inter = np.concatenate([
        np.stack([np.zeros(40, dtype=np.int64), heavy_pos], axis=1),
        np.stack([np.ones(5, dtype=np.int64), pool[40:45]], axis=1),
    ])
    index = build_period_index(inter, n_items)

    n = 200_000
    users = jnp.zeros(n, dtype=jnp.int32)
    fb, leak = sampler_stats(index, users, jax.random.PRNGKey(2), tries)
    fb, leak = float(fb), float(leak)
    # the sampling pool is the period's UNIQUE items (45 here), so the heavy
    # user's per-draw positive rate is 40/45; fallback ~ (40/45 + fp)^16 with
    # a small bloom fp. 3-sigma of a binomial at n=200k is ~2.4e-3.
    expect = (40 / 45) ** tries
    assert abs(fb - expect) < 8e-3, (fb, expect)
    # a fallback row leaks iff the kept draw is a true positive (~40/45 of
    # bloom hits here)
    assert leak <= fb
    assert leak >= 0.5 * fb

    # a light user (5/45 positives) virtually never falls back
    fb2, leak2 = sampler_stats(index, jnp.ones(n, dtype=jnp.int32),
                               jax.random.PRNGKey(3), tries)
    assert float(fb2) < 1e-4
    assert float(leak2) < 1e-4


def test_presampled_neg_column():
    rows = jnp.asarray(np.arange(40).reshape(4, 10))
    col = jnp.asarray(3)
    np.testing.assert_array_equal(np.asarray(presampled_neg_column(rows, col)),
                                  np.asarray(rows[:, 5]))

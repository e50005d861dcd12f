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


def test_presampled_neg_column():
    rows = jnp.asarray(np.arange(40).reshape(4, 10))
    col = jnp.asarray(3)
    np.testing.assert_array_equal(np.asarray(presampled_neg_column(rows, col)),
                                  np.asarray(rows[:, 5]))

"""Explicit collective lookup == dense single-device math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sml_tpu.parallel.collective import (collective_gather,
                                         make_sharded_mf_train_step)


def _mesh():
    devs = np.asarray(jax.devices()[:8]).reshape(1, 8)
    return Mesh(devs, ("data", "model"))


def test_collective_gather_matches_dense(rng):
    mesh = _mesh()
    table = jnp.asarray(rng.normal(size=(64, 16)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 64, 40), jnp.int32)

    fn = jax.shard_map(lambda t, i: collective_gather(t, i), mesh=mesh,
                       in_specs=(P("model"), P()), out_specs=P(),
                       check_vma=False)
    got = jax.jit(fn)(table, idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(table[idx]),
                               rtol=1e-6)


def test_collective_gather_grad_is_scatter_add(rng):
    mesh = _mesh()
    table = jnp.asarray(rng.normal(size=(64, 8)), jnp.float32)
    idx = jnp.asarray([3, 3, 10, 63], jnp.int32)
    w = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)

    def loss(t, i):
        def inner(t, i):
            rows = collective_gather(t, i)
            return jax.lax.psum(jnp.sum(rows * w), "model") \
                / mesh.shape["model"]
        return jax.shard_map(inner, mesh=mesh, in_specs=(P("model"), P()),
                             out_specs=P(), check_vma=False)(t, i)

    g = jax.jit(jax.grad(loss))(table, idx)
    want = np.zeros((64, 8), np.float32)
    for r, ii in enumerate(np.asarray(idx)):
        want[ii] += np.asarray(w)[r]
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-5, atol=1e-6)


def test_sharded_mf_step_matches_dense(rng):
    mesh = _mesh()
    n_u, n_i, d, b = 64, 32, 8, 16
    ut = jnp.asarray(rng.normal(size=(n_u, d)), jnp.float32)
    it = jnp.asarray(rng.normal(size=(n_i, d)), jnp.float32)
    u = jnp.asarray(rng.integers(0, n_u, b), jnp.int32)
    i = jnp.asarray(rng.integers(0, n_i, b), jnp.int32)
    j = jnp.asarray(rng.integers(0, n_i, b), jnp.int32)

    # dense reference
    def loss_fn(tabs):
        a, c = tabs
        xu, xi, xj = a[u], c[i], c[j]
        pos = jnp.sum(xu * xi, -1)
        neg = jnp.sum(xu * xj, -1)
        bce = -jnp.mean(jnp.log(jax.nn.sigmoid(pos) + 1e-15)) \
            - jnp.mean(jnp.log(jax.nn.sigmoid(-neg) + 1e-15))
        reg = 1e-5 * 0.5 * (jnp.sum(xu**2) + jnp.sum(xi**2) + jnp.sum(xj**2))
        return bce + reg

    gu, gi = jax.grad(loss_fn)((ut, it))
    want_u = np.asarray(ut - 0.01 * gu)
    want_i = np.asarray(it - 0.01 * gi)

    step = make_sharded_mf_train_step(mesh, lr=0.01, l2=1e-5)
    row = NamedSharding(mesh, P("model"))
    ut_s = jax.device_put(ut, row)
    it_s = jax.device_put(it, row)
    new_u, new_i, loss = step(ut_s, it_s, u, i, j)
    assert new_u.sharding.spec == P("model")
    np.testing.assert_allclose(np.asarray(new_u), want_u, rtol=2e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_i), want_i, rtol=2e-5,
                               atol=1e-6)

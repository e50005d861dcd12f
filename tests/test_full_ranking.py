"""Sharded full-catalog top-K == dense top-K."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sml_tpu.eval.full_ranking import (dense_full_topk,
                                       make_sharded_full_topk, recommend)
from sml_tpu.models.mf import MFParams


def _mesh():
    devs = np.asarray(jax.devices()[:8]).reshape(1, 8)
    return Mesh(devs, ("data", "model"))


def test_sharded_topk_matches_dense(rng):
    mesh = _mesh()
    b, i, d, k = 16, 64, 8, 5
    users = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
    items = jnp.asarray(rng.normal(size=(i, d)), jnp.float32)

    ds, di = dense_full_topk(users, items, k)
    items_sharded = jax.device_put(items, NamedSharding(mesh, P("model")))
    ss, si = make_sharded_full_topk(mesh, k)(users, items_sharded)

    np.testing.assert_allclose(np.asarray(ss), np.asarray(ds), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(di))


def test_dense_topk_brute_force(rng):
    b, i, d, k = 8, 40, 4, 6
    users = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
    items = jnp.asarray(rng.normal(size=(i, d)), jnp.float32)
    s, ids = dense_full_topk(users, items, k)
    scores = np.asarray(users) @ np.asarray(items).T
    want_ids = np.argsort(-scores, axis=1)[:, :k]
    np.testing.assert_array_equal(np.asarray(ids), want_ids)


def test_recommend_with_mesh(rng):
    mesh = _mesh()
    n_u, n_i, d = 32, 64, 8
    mf = MFParams(
        user_emb=jnp.asarray(rng.normal(size=(n_u, d)), jnp.float32),
        item_emb=jax.device_put(
            jnp.asarray(rng.normal(size=(n_i, d)), jnp.float32),
            NamedSharding(mesh, P("model"))),
        user_bias=jnp.zeros((n_u, 1)), item_bias=jnp.zeros((n_i, 1)))
    users = jnp.asarray([0, 3, 7], jnp.int32)
    s, ids = recommend(mf, users, 4, mesh=mesh)
    s2, ids2 = recommend(
        mf._replace(item_emb=jnp.asarray(np.asarray(mf.item_emb))), users, 4)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids2))


def test_bf16_serving_matches_on_separated_scores(rng):
    """bf16-input scoring returns the same top-K as f32 when score gaps
    exceed bf16 rounding."""
    import jax.numpy as jnp

    from sml_tpu.eval.full_ranking import dense_full_topk

    d, n_items, b = 16, 64, 8
    # well-separated: item i's embedding is i * e1, users along e1
    items = jnp.asarray(
        np.outer(np.arange(n_items, dtype=np.float32), np.eye(d)[0]))
    users = jnp.asarray(np.outer(np.ones(b, np.float32), np.eye(d)[0]))
    _, ids32 = dense_full_topk(users, items, 5)
    _, ids16 = dense_full_topk(users, items, 5, compute_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(ids32), np.asarray(ids16))


def test_bucket_topk_matches_sort(rng):
    """The bucketed exact select returns lax.top_k's score multiset and a
    valid id for every slot, across widths that do / don't divide into
    bins, k=1, and constant (all-tied) scores."""
    from sml_tpu.eval.full_ranking import _bucket_topk

    for b, i, k in ((4, 20_000, 100), (3, 17_231, 7), (2, 16_384, 1),
                    (5, 50_001, 64)):
        scores = jnp.asarray(rng.normal(size=(b, i)), jnp.float32)
        bs, bi = _bucket_topk(scores, k)
        ss, si = jax.lax.top_k(scores, k)
        np.testing.assert_allclose(np.asarray(bs), np.asarray(ss), rtol=0)
        sn = np.asarray(scores)
        bin_, bid = np.asarray(bs), np.asarray(bi)
        assert ((bid >= 0) & (bid < i)).all()
        # each returned id really carries its returned score
        np.testing.assert_allclose(
            np.take_along_axis(sn, bid, axis=1), bin_, rtol=0)
        # ids are distinct per row
        for r in range(b):
            assert len(set(bid[r])) == k
    # all-tied scores: every slot must hold the tied value, distinct ids
    tied = jnp.full((2, 20_000), 3.25, jnp.float32)
    ts, ti = _bucket_topk(tied, 10)
    assert (np.asarray(ts) == 3.25).all()
    for r in range(2):
        assert len(set(np.asarray(ti)[r])) == 10


def test_bucket_topk_recursive(rng, monkeypatch):
    """When the bin-maxima row is itself wide (10^6+-item catalogs) the
    select recurses; force that branch with a tiny threshold and check
    exactness is preserved."""
    import sml_tpu.eval.full_ranking as fr

    monkeypatch.setattr(fr, "_BUCKET_MIN_WIDTH", 64)
    scores = jnp.asarray(rng.normal(size=(3, 30_000)), jnp.float32)
    bs, bi = fr._bucket_topk(scores, 20)     # n_bins ~ 775 >= 64: recurses
    ss, _ = jax.lax.top_k(scores, 20)
    np.testing.assert_allclose(np.asarray(bs), np.asarray(ss), rtol=0)
    np.testing.assert_allclose(
        np.take_along_axis(np.asarray(scores), np.asarray(bi), axis=1),
        np.asarray(bs), rtol=0)


def test_exact_method_dispatch(rng):
    """'exact' routes wide catalogs through the bucket path and narrow
    ones through lax.top_k — identical results either way; 'exact_sort' /
    'exact_bucket' pin the engines; the sharded path stays id-set-equal
    to dense under each exact method."""
    mesh = _mesh()
    d, k = 8, 6
    for i in (256, 20_000):           # below / above _BUCKET_MIN_WIDTH
        users = jnp.asarray(rng.normal(size=(4, d)), jnp.float32)
        items = jnp.asarray(rng.normal(size=(i, d)), jnp.float32)
        ref_s, ref_i = dense_full_topk(users, items, k,
                                       topk_method="exact_sort")
        for meth in ("exact", "exact_bucket"):
            s, ids = dense_full_topk(users, items, k, topk_method=meth)
            np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s),
                                       rtol=0)
            np.testing.assert_array_equal(np.asarray(ids),
                                          np.asarray(ref_i))
        items_sharded = jax.device_put(items,
                                       NamedSharding(mesh, P("model")))
        for meth in ("exact", "exact_bucket"):
            ss, si = make_sharded_full_topk(mesh, k, None, meth)(
                users, items_sharded)
            # per-shard matmul accumulation differs from dense at ULP level
            np.testing.assert_allclose(np.asarray(ss), np.asarray(ref_s),
                                       rtol=1e-6)
            for r in range(4):
                assert (set(np.asarray(si)[r])
                        == set(np.asarray(ref_i)[r])), meth


def test_topk_method_wiring(rng):
    """`topk_method` variants return valid (score-sorted, in-catalog)
    results on every path, and the id SET matches exact on well-separated
    scores. (On CPU `lax.approx_max_k` falls back to exact; on TPU the
    PartialReduce recall is measured in serving_probe_r5b.json.)"""
    mesh = _mesh()
    b, i, d, k = 8, 256, 8, 4
    users = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
    items = jnp.asarray(rng.normal(size=(i, d)), jnp.float32)
    _, exact_ids = dense_full_topk(users, items, k)
    items_sharded = jax.device_put(items, NamedSharding(mesh, P("model")))
    for meth in ("approx", "approx99"):
        s, ids = dense_full_topk(users, items, k, topk_method=meth)
        assert s.shape == (b, k) and ids.shape == (b, k)
        sn, idn = np.asarray(s), np.asarray(ids)
        assert (np.diff(sn, axis=1) <= 1e-6).all()   # sorted descending
        assert ((idn >= 0) & (idn < i)).all()
        for r in range(b):
            assert set(idn[r]) == set(np.asarray(exact_ids)[r]), meth
        ss, si = make_sharded_full_topk(mesh, k, None, meth)(
            users, items_sharded)
        for r in range(b):
            assert set(np.asarray(si)[r]) == set(np.asarray(exact_ids)[r])

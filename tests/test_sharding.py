"""Sharded vs single-device parity on the virtual 8-device CPU mesh.

This is the multi-chip validation strategy from SURVEY.md §4: the same
jitted epoch functions run with row-sharded tables (mesh 'model' axis) and
data-sharded batches (mesh 'data' axis); results must match the unsharded
run up to float reassociation tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sml_tpu.config import SMLConfig, TransferConfig
from sml_tpu.parallel.sharding import make_mesh, shard_batch, shard_state
from sml_tpu.train.engine import SMLEngine

N_USERS, N_ITEMS, DIM = 320, 160, 16


def _cfg():
    return SMLConfig(mf_batch_size=128, tr_batch_size=64, eval_batch_size=128,
                     latent_dim=DIM, multi_num=1,
                     transfer=TransferConfig(latent_dim=DIM, fc_hidden=64),
                     mf_sample="alone", tr_sample_type="alone")


def _fake_period(rng, n=700):
    inter = np.stack([rng.integers(0, N_USERS, n),
                      rng.integers(0, N_ITEMS, n)], axis=1)
    return np.unique(inter, axis=0)


def _run_phase(engine, state, set_t, set_tt):
    state = engine.snapshot_last(state)
    padded_t, idx_t = engine.prep_inner(set_t)
    state, _ = engine.inner_epoch(state, padded_t, idx_t)
    state = engine.snapshot_hat(state)
    state = engine.refresh(state)
    padded_tt, idx_tt = engine.prep_outer(set_tt)
    state, _ = engine.outer_epoch(state, padded_tt, idx_tt)
    state = engine.refresh(state)
    return state


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4)])
def test_sharded_phase_matches_single_device(rng, mesh_shape):
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    cfg = _cfg()
    set_t = _fake_period(rng)
    set_tt = _fake_period(rng)

    engine = SMLEngine(cfg, N_USERS, N_ITEMS)
    ref_state = _run_phase(engine, engine.init_state(), set_t, set_tt)

    mesh = make_mesh(*mesh_shape)
    engine2 = SMLEngine(cfg, N_USERS, N_ITEMS)
    st = shard_state(engine2.init_state(), mesh, N_USERS, N_ITEMS)
    # verify the tables actually got row-sharded
    assert st.mf.user_emb.sharding.spec == jax.sharding.PartitionSpec("model")
    sh_state = _run_phase(engine2, st, set_t, set_tt)

    np.testing.assert_allclose(np.asarray(sh_state.mf.user_emb),
                               np.asarray(ref_state.mf.user_emb),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sh_state.mf.item_emb),
                               np.asarray(ref_state.mf.item_emb),
                               rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree.leaves(sh_state.theta),
                    jax.tree.leaves(ref_state.theta)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_sharded_eval_matches(rng):
    cfg = _cfg()
    engine = SMLEngine(cfg, N_USERS, N_ITEMS)
    state = engine.init_state()
    rows = np.stack([rng.integers(0, N_USERS, 200),
                     rng.integers(0, N_ITEMS, 200)] +
                    [rng.integers(0, N_ITEMS, 200) for _ in range(30)], axis=1)
    ref = engine.evaluate(state.mf, rows)

    mesh = make_mesh(1, 8)
    st = shard_state(state, mesh, N_USERS, N_ITEMS)
    got = engine.evaluate(st.mf, rows)
    for k in ref:
        np.testing.assert_allclose(got[k]["recall"], ref[k]["recall"],
                                   atol=1e-6)
        np.testing.assert_allclose(got[k]["ndcg"], ref[k]["ndcg"], atol=1e-5)


def test_sharded_fast_adam_matches_single_device(rng):
    """The row-sparse exact-dense Adam path (auto-on for production tables)
    must partition correctly over the mesh: same result as unsharded."""
    cfg = _cfg().replace(fast_table_adam=True)
    set_t = _fake_period(rng)
    set_tt = _fake_period(rng)

    engine = SMLEngine(cfg, N_USERS, N_ITEMS)
    assert engine.cfg.fast_table_adam is True
    ref_state = _run_phase(engine, engine.init_state(), set_t, set_tt)

    mesh = make_mesh(2, 4)
    engine2 = SMLEngine(cfg, N_USERS, N_ITEMS)
    st = shard_state(engine2.init_state(), mesh, N_USERS, N_ITEMS)
    sh_state = _run_phase(engine2, st, set_t, set_tt)

    np.testing.assert_allclose(np.asarray(sh_state.mf.user_emb),
                               np.asarray(ref_state.mf.user_emb),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sh_state.mf.item_emb),
                               np.asarray(ref_state.mf.item_emb),
                               rtol=2e-4, atol=2e-5)

    # and the sharded fast path equals the sharded dense path
    engine3 = SMLEngine(_cfg().replace(fast_table_adam=False),
                        N_USERS, N_ITEMS)
    st3 = shard_state(engine3.init_state(), mesh, N_USERS, N_ITEMS)
    dense_state = _run_phase(engine3, st3, set_t, set_tt)
    np.testing.assert_allclose(np.asarray(sh_state.mf.user_emb),
                               np.asarray(dense_state.mf.user_emb),
                               rtol=2e-4, atol=2e-5)


def test_init_state_sharded_matches_reshard_path(rng):
    """Born-sharded init == init_state()+shard_state(), leaf for leaf, and
    the state survives one donated epoch (catches output aliasing between
    mf tables and same-dtype hat snapshots)."""
    cfg = _cfg()
    mesh = make_mesh(1, 8)

    engine = SMLEngine(cfg, N_USERS, N_ITEMS)
    ref = shard_state(engine.init_state(), mesh, N_USERS, N_ITEMS)
    born = engine.init_state_sharded(mesh)

    for a, b, path in zip(jax.tree.leaves(ref), jax.tree.leaves(born),
                          jax.tree_util.tree_leaves_with_path(ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(path[0]))
        assert b.sharding == a.sharding, path[0]

    # pretrained path: host numpy goes straight to row shards
    from sml_tpu.models.mf import init_mf
    pre = jax.tree.map(np.asarray,
                       init_mf(jax.random.PRNGKey(5), N_USERS, N_ITEMS, DIM))
    born2 = engine.init_state_sharded(mesh, pretrained_mf=pre)
    np.testing.assert_array_equal(np.asarray(born2.mf.user_emb),
                                  pre.user_emb)
    assert born2.mf.user_emb.sharding.spec == \
        jax.sharding.PartitionSpec("model")

    # donated epoch runs (no double-donation of aliased buffers)
    set_t = _fake_period(rng)
    padded_t, idx_t = engine.prep_inner(set_t)
    state = engine.snapshot_last(born2)
    state, _ = engine.inner_epoch(state, padded_t, idx_t)
    assert np.isfinite(np.asarray(state.mf.user_emb)).all()


def test_shard_map_refresh_matches_plain():
    """set_mesh swaps the refresh to the shard_map row-local path; values
    must match the plain jit refresh (which may all-gather) exactly."""
    cfg = _cfg()
    mesh = make_mesh(1, 8)

    engine = SMLEngine(cfg, N_USERS, N_ITEMS)
    plain = engine.init_state()
    plain = engine.snapshot_last(plain)
    plain = engine.snapshot_hat(plain)
    ref = engine.refresh(plain)

    engine2 = SMLEngine(cfg, N_USERS, N_ITEMS)
    st = engine2.init_state_sharded(mesh)   # also calls set_mesh
    assert engine2.mesh is mesh
    st = engine2.snapshot_last(st)
    st = engine2.snapshot_hat(st)
    out = engine2.refresh(st)

    np.testing.assert_allclose(np.asarray(out.mf.user_emb),
                               np.asarray(ref.mf.user_emb),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.mf.item_emb),
                               np.asarray(ref.mf.item_emb),
                               rtol=1e-6, atol=1e-6)
    # rows stayed sharded
    assert out.mf.user_emb.sharding.spec == \
        jax.sharding.PartitionSpec("model")

"""torch_adam must track torch.optim.Adam step-for-step (incl. weight decay,
which torch applies as L2-into-gradient before the moment updates)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sml_tpu.train.optim import torch_adam


@pytest.mark.parametrize("wd", [0.0, 1e-2])
def test_matches_torch_adam(rng, wd):
    torch = pytest.importorskip("torch")
    w0 = rng.normal(size=(5, 3)).astype(np.float32)
    grads = [rng.normal(size=(5, 3)).astype(np.float32) for _ in range(12)]

    # torch trajectory
    p = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adam([p], lr=0.01, weight_decay=wd)
    for g in grads:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        opt.step()
    want = p.detach().numpy()

    # ours
    tx = torch_adam(0.01, weight_decay=wd)
    w = jnp.asarray(w0)
    state = tx.init(w)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, w)
        w = optax.apply_updates(w, updates)

    np.testing.assert_allclose(np.asarray(w), want, rtol=1e-5, atol=1e-6)


def test_sparse_dense_adam_matches_dense(rng):
    """sparse_dense_adam_update == the dense-gradient torch_adam step, over a
    multi-step trajectory with duplicate indices and never-touched rows."""
    from sml_tpu.models.mf import init_mf
    from sml_tpu.train.optim import (TableGrad, sparse_dense_adam_update,
                                     torch_adam)

    n_u, n_i, d, b = 23, 17, 8, 12
    lr = 0.01
    mf = init_mf(jax.random.PRNGKey(0), n_u, n_i, d)
    tx = torch_adam(lr, weight_decay=0.0)

    dense_p, dense_s = mf, tx.init(mf)
    fast_p, fast_s = mf, tx.init(mf)

    for step in range(7):
        u = jnp.asarray(rng.integers(0, n_u - 4, b), jnp.int32)  # rows n_u-4..
        i = jnp.asarray(rng.integers(0, n_i, b), jnp.int32)      # never hit
        j = jnp.asarray(i[::-1])                                 # duplicates
        gu = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
        gi = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
        gj = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)

        dense_grads = type(mf)(
            user_emb=jnp.zeros_like(mf.user_emb).at[u].add(gu),
            item_emb=jnp.zeros_like(mf.item_emb).at[i].add(gi).at[j].add(gj),
            user_bias=jnp.zeros_like(mf.user_bias),
            item_bias=jnp.zeros_like(mf.item_bias))
        updates, dense_s = tx.update(dense_grads, dense_s, dense_p)
        dense_p = optax.apply_updates(dense_p, updates)

        sparse = {"user_emb": TableGrad(u, gu),
                  "item_emb": TableGrad(jnp.concatenate([i, j]),
                                        jnp.concatenate([gi, gj], axis=0))}
        fast_p, fast_s = sparse_dense_adam_update(fast_p, fast_s, sparse,
                                                  lr=lr)

    for name in mf._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(fast_p, name)),
            np.asarray(getattr(dense_p, name)), rtol=1e-6, atol=1e-7,
            err_msg=f"param {name}")
        np.testing.assert_allclose(
            np.asarray(getattr(fast_s[1].mu, name)),
            np.asarray(getattr(dense_s[1].mu, name)), rtol=1e-6, atol=1e-7,
            err_msg=f"mu {name}")
        np.testing.assert_allclose(
            np.asarray(getattr(fast_s[1].nu, name)),
            np.asarray(getattr(dense_s[1].nu, name)), rtol=1e-6, atol=1e-7,
            err_msg=f"nu {name}")
    assert int(fast_s[1].count) == int(dense_s[1].count) == 7


def test_inner_epoch_fast_matches_dense(rng):
    """A full jitted inner epoch with fast_table_adam on vs off produces the
    same losses and the same final tables."""
    import dataclasses

    from sml_tpu.config import SMLConfig, TransferConfig
    from sml_tpu.train.engine import SMLEngine

    n_u, n_i = 60, 40
    kw = dict(mf_batch_size=16, latent_dim=8, mf_sample="alone",
              transfer=TransferConfig(latent_dim=8, fc_hidden=32))
    rows = np.unique(np.stack([rng.integers(0, n_u, 200),
                               rng.integers(0, n_i, 200)], axis=1), axis=0)

    outs = {}
    for fast in (True, False):
        cfg = SMLConfig(fast_table_adam=fast, **kw)
        engine = SMLEngine(cfg, n_u, n_i)
        state = engine.init_state()
        state = engine.snapshot_last(state)
        padded, index = engine.prep_inner(rows)
        state, losses = engine.inner_epoch(state, padded, index)
        state, losses2 = engine.inner_epoch(state, padded, index)
        outs[fast] = (np.asarray(losses2), np.asarray(state.mf.user_emb),
                      np.asarray(state.mf.item_emb))

    np.testing.assert_allclose(outs[True][0], outs[False][0],
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(outs[True][1], outs[False][1],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(outs[True][2], outs[False][2],
                               rtol=1e-5, atol=1e-6)

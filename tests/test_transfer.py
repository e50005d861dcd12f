"""Transfer network Θ: shapes, torch equivalence, gradient-flow fidelity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sml_tpu.config import TransferConfig
from sml_tpu.models import transfer as T


CFG = TransferConfig(latent_dim=16, conv1_channels=10, conv2_channels=5,
                     fc_hidden=32)


def _params(kind="conv_com"):
    cfg = TransferConfig(latent_dim=CFG.latent_dim,
                         conv1_channels=CFG.conv1_channels,
                         conv2_channels=CFG.conv2_channels,
                         fc_hidden=CFG.fc_hidden, kind=kind)
    return T.init_transfer(jax.random.PRNGKey(0), cfg), cfg


@pytest.mark.parametrize("kind", ["conv_com", "conv2ch", "conv_com_root",
                                  "mlp_delta", "linear", "gru", "gated"])
def test_shapes_all_kinds(kind, rng):
    theta, cfg = _params(kind)
    x_t = jnp.asarray(rng.normal(size=(12, CFG.latent_dim)), jnp.float32)
    x_hat = jnp.asarray(rng.normal(size=(12, CFG.latent_dim)), jnp.float32)
    for side in ("user", "item"):
        out = T.apply_rows(theta, cfg, side, x_t, x_hat)
        assert out.shape == x_t.shape
        assert np.isfinite(np.asarray(out)).all()


def test_conv_com_matches_torch(rng):
    """Same weights → same forward as a torch implementation of the reference
    architecture (Conv2d(1,C1,(3,1)) → gelu → Conv2d(C1,C2,(1,1)) → gelu →
    flatten → FC → gelu → FC, with the x_com stop-grad channel)."""
    torch = pytest.importorskip("torch")
    theta, cfg = _params()
    tw = theta.user
    d, c1, c2, h = CFG.latent_dim, CFG.conv1_channels, CFG.conv2_channels, \
        CFG.fc_hidden

    x_t = rng.normal(size=(9, d)).astype(np.float32)
    x_hat = rng.normal(size=(9, d)).astype(np.float32)

    ours = np.asarray(T.apply_rows(theta, cfg, "user",
                                   jnp.asarray(x_t), jnp.asarray(x_hat)))

    with torch.no_grad():
        xt = torch.tensor(x_t)
        xh = torch.tensor(x_hat)
        com = (xt * xh) / (xt ** 2).sum(-1, keepdim=True).sqrt()
        img = torch.stack([xt, xh, com], dim=1).reshape(-1, 1, 3, d)

        conv1 = torch.nn.Conv2d(1, c1, (3, 1))
        conv1.weight.copy_(torch.tensor(np.asarray(tw.conv1_w))
                           .reshape(c1, 1, 3, 1))
        conv1.bias.copy_(torch.tensor(np.asarray(tw.conv1_b)))
        conv2 = torch.nn.Conv2d(c1, c2, (1, 1))
        conv2.weight.copy_(torch.tensor(np.asarray(tw.conv2_w))
                           .reshape(c2, c1, 1, 1))
        conv2.bias.copy_(torch.tensor(np.asarray(tw.conv2_b)))
        fc1 = torch.nn.Linear(c2 * d, h)
        fc1.weight.copy_(torch.tensor(np.asarray(tw.fc1_w)).T)
        fc1.bias.copy_(torch.tensor(np.asarray(tw.fc1_b)))
        fc2 = torch.nn.Linear(h, d)
        fc2.weight.copy_(torch.tensor(np.asarray(tw.fc2_w)).T)
        fc2.bias.copy_(torch.tensor(np.asarray(tw.fc2_b)))

        def gelu(v):
            return v * torch.sigmoid(1.702 * v)

        y = gelu(conv1(img))
        y = conv2(y)
        y = y.reshape(-1, c2 * d)
        y = gelu(y)
        y = gelu(fc1(y))
        want = fc2(y).numpy()

    np.testing.assert_allclose(ours, want, rtol=2e-5, atol=2e-5)


def test_x_com_is_fully_stop_gradient(rng):
    """x_com must carry no gradient to either input
    (conv_transfer.py:93-100: requires_grad=False on x_com)."""
    theta, cfg = _params()
    x_t = jnp.asarray(rng.normal(size=(6, CFG.latent_dim)), jnp.float32)
    x_hat = jnp.asarray(rng.normal(size=(6, CFG.latent_dim)), jnp.float32)

    def f(xh):
        return jnp.sum(T.apply_rows(theta, cfg, "user", x_t, xh))

    # expected: gradient with x_com frozen at its value
    com_const = T.build_x_com(x_t, x_hat)

    def f_const_com(xh):
        stack = jnp.stack([x_t, xh, com_const], axis=1)
        return jnp.sum(T.conv_tower_apply(theta.user, stack))

    g = jax.grad(f)(x_hat)
    g_want = jax.grad(f_const_com)(x_hat)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_want),
                               rtol=1e-5, atol=1e-6)

    # and x_com itself has zero vjp into x_t beyond the direct channel
    def f_t(xt):
        return jnp.sum(T.apply_rows(theta, cfg, "user", xt, x_hat))

    def f_t_const_com(xt):
        stack = jnp.stack([xt, x_hat, com_const], axis=1)
        return jnp.sum(T.conv_tower_apply(theta.user, stack))

    np.testing.assert_allclose(np.asarray(jax.grad(f_t)(x_t)),
                               np.asarray(jax.grad(f_t_const_com)(x_t)),
                               rtol=1e-5, atol=1e-6)


def test_apply_tables_matches_apply_rows(rng):
    theta, cfg = _params()
    n_u, n_i, d = 70, 45, CFG.latent_dim
    lu = jnp.asarray(rng.normal(size=(n_u, d)), jnp.float32)
    hu = jnp.asarray(rng.normal(size=(n_u, d)), jnp.float32)
    li = jnp.asarray(rng.normal(size=(n_i, d)), jnp.float32)
    hi = jnp.asarray(rng.normal(size=(n_i, d)), jnp.float32)
    new_u, new_i = T.apply_tables(theta, cfg, lu, hu, li, hi,
                                  block_rows=32, use_pallas="never")
    np.testing.assert_allclose(
        np.asarray(new_u), np.asarray(T.apply_rows(theta, cfg, "user", lu, hu)),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(new_i), np.asarray(T.apply_rows(theta, cfg, "item", li, hi)),
        rtol=1e-5, atol=1e-6)


def test_zero_last_rows_are_finite(rng):
    """Zero W_{t-1} rows (fresh entities) must not produce NaNs via the
    x_com normalization."""
    theta, cfg = _params()
    x_t = jnp.zeros((4, CFG.latent_dim), jnp.float32)
    x_hat = jnp.asarray(rng.normal(size=(4, CFG.latent_dim)), jnp.float32)
    out = T.apply_rows(theta, cfg, "user", x_t, x_hat)
    assert np.isfinite(np.asarray(out)).all()


def test_conv_com_root_matches_torch(rng):
    """conv_com_root == the reference's ConvTransfer_com2/com3 forward
    (conv_transfer.py:137-181): Conv2d(1,C1,(2,1)) over [x_t,x_hat], flatten,
    concat the detached 4th-root channel, gelu, FC, gelu, FC."""
    torch = pytest.importorskip("torch")
    theta, cfg = _params("conv_com_root")
    tw = theta.user
    d, c1, h = CFG.latent_dim, CFG.conv1_channels, CFG.fc_hidden

    x_t = rng.normal(size=(9, d)).astype(np.float32)
    x_hat = rng.normal(size=(9, d)).astype(np.float32)

    ours = np.asarray(T.apply_rows(theta, cfg, "user",
                                   jnp.asarray(x_t), jnp.asarray(x_hat)))

    with torch.no_grad():
        xt = torch.tensor(x_t)
        xh = torch.tensor(x_hat)
        com = (xt ** 2).sqrt().sqrt() * (xh ** 2).sqrt().sqrt()
        img = torch.stack([xt, xh], dim=1).reshape(-1, 1, 2, d)

        conv1 = torch.nn.Conv2d(1, c1, (2, 1))
        conv1.weight.copy_(torch.tensor(np.asarray(tw.conv1_w))
                           .reshape(c1, 1, 2, 1))
        conv1.bias.copy_(torch.tensor(np.asarray(tw.conv1_b)))
        fc1 = torch.nn.Linear(c1 * d + d, h)
        fc1.weight.copy_(torch.tensor(np.asarray(tw.fc1_w)).T)
        fc1.bias.copy_(torch.tensor(np.asarray(tw.fc1_b)))
        fc2 = torch.nn.Linear(h, d)
        fc2.weight.copy_(torch.tensor(np.asarray(tw.fc2_w)).T)
        fc2.bias.copy_(torch.tensor(np.asarray(tw.fc2_b)))

        def gelu(v):
            return v * torch.sigmoid(1.702 * v)

        y = conv1(img).reshape(-1, c1 * d)
        y = gelu(torch.cat((y, com), dim=-1))
        y = gelu(fc1(y))
        want = fc2(y).numpy()

    np.testing.assert_allclose(ours, want, rtol=2e-5, atol=2e-5)

"""Golden parity vs an independent PyTorch implementation of one SML step.

Builds the reference's math in torch (own code, same architecture), copies
the exact weights from the JAX side, runs ONE inner optimization step and
ONE outer optimization step on identical data, and compares updated
parameters element-wise. This pins down the full gradient-flow contract:

* inner: grads reach ONLY the MF tables, THROUGH the frozen transfer, with
  the last-snapshot lookups and the x_com channel as constants
  (``model/transfer.py:464-511``);
* outer: grads reach ONLY Θ, with last/hat lookups as constants
  (``:701-728``), Adam weight decay applied torch-style.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sml_tpu.config import SMLConfig, TransferConfig
from sml_tpu.models.mf import MFParams
from sml_tpu.models.transfer import init_transfer
from sml_tpu.train.optim import torch_adam
from sml_tpu.train.steps import transferred_pair_loss
from sml_tpu.ops.losses import l2_embedding_penalty

D = 16
N_USERS, N_ITEMS = 40, 30
BATCH = 24
MF_LR, MF_L2 = 0.01, 1e-6
TR_LR, TR_L2 = 0.001, 1e-4


def _torch_tower(torch, tw):
    c1 = tw.conv1_w.shape[0]
    c2 = tw.conv2_w.shape[0]
    h = tw.fc1_w.shape[1]
    conv1 = torch.nn.Conv2d(1, c1, (3, 1))
    conv2 = torch.nn.Conv2d(c1, c2, (1, 1))
    fc1 = torch.nn.Linear(c2 * D, h)
    fc2 = torch.nn.Linear(h, D)
    with torch.no_grad():
        conv1.weight.copy_(torch.tensor(np.asarray(tw.conv1_w)).reshape(c1, 1, 3, 1))
        conv1.bias.copy_(torch.tensor(np.asarray(tw.conv1_b)))
        conv2.weight.copy_(torch.tensor(np.asarray(tw.conv2_w)).reshape(c2, c1, 1, 1))
        conv2.bias.copy_(torch.tensor(np.asarray(tw.conv2_b)))
        fc1.weight.copy_(torch.tensor(np.asarray(tw.fc1_w)).T)
        fc1.bias.copy_(torch.tensor(np.asarray(tw.fc1_b)))
        fc2.weight.copy_(torch.tensor(np.asarray(tw.fc2_w)).T)
        fc2.bias.copy_(torch.tensor(np.asarray(tw.fc2_b)))

    def forward(x_t, x_hat):
        g = lambda v: v * torch.sigmoid(1.702 * v)
        com = (x_t * x_hat.detach()) / (x_t ** 2).sum(-1, keepdim=True).sqrt()
        img = torch.stack([x_t, x_hat, com.detach()], dim=1).reshape(-1, 1, 3, D)
        y = g(conv1(img))
        y = conv2(y).reshape(-1, c2 * D)
        return fc2(g(fc1(g(y))))

    return forward, [conv1.weight, conv1.bias, conv2.weight, conv2.bias,
                     fc1.weight, fc1.bias, fc2.weight, fc2.bias]


@pytest.fixture()
def setup(rng):
    torch = pytest.importorskip("torch")
    cfg = TransferConfig(latent_dim=D)
    theta = init_transfer(jax.random.PRNGKey(5), cfg)
    mf = MFParams(
        user_emb=jnp.asarray(rng.normal(size=(N_USERS, D)), jnp.float32),
        item_emb=jnp.asarray(rng.normal(size=(N_ITEMS, D)), jnp.float32),
        user_bias=jnp.zeros((N_USERS, 1), jnp.float32),
        item_bias=jnp.zeros((N_ITEMS, 1), jnp.float32))
    last_u = jnp.asarray(rng.normal(size=(N_USERS, D)), jnp.float32)
    last_i = jnp.asarray(rng.normal(size=(N_ITEMS, D)), jnp.float32)
    hat_u = jnp.asarray(rng.normal(size=(N_USERS, D)), jnp.float32)
    hat_i = jnp.asarray(rng.normal(size=(N_ITEMS, D)), jnp.float32)
    u = rng.integers(0, N_USERS, BATCH)
    i = rng.integers(0, N_ITEMS, BATCH)
    j = rng.integers(0, N_ITEMS, BATCH)
    return torch, cfg, theta, mf, last_u, last_i, hat_u, hat_i, u, i, j


def test_inner_step_matches_torch(setup):
    torch, cfg, theta, mf, last_u, last_i, hat_u, hat_i, u, i, j = setup
    mask = jnp.ones(BATCH, jnp.float32)
    uj, ij, jj = jnp.asarray(u), jnp.asarray(i), jnp.asarray(j)

    # ---- jax inner step
    def loss_fn(mfp):
        xu = mfp.user_emb[uj]
        xi = mfp.item_emb[ij]
        xj = mfp.item_emb[jj]
        loss = transferred_pair_loss(theta, cfg, last_u[uj], last_i[ij],
                                     last_i[jj], xu, xi, xj, mask, True)
        return loss + MF_L2 * l2_embedding_penalty(mask, xu, xi, xj)

    tx = torch_adam(MF_LR)
    opt = tx.init(mf)
    jloss, grads = jax.value_and_grad(loss_fn)(mf)
    updates, opt = tx.update(grads, opt, mf)
    new_mf = optax.apply_updates(mf, updates)

    # ---- torch inner step
    user_emb = torch.nn.Embedding(N_USERS, D)
    item_emb = torch.nn.Embedding(N_ITEMS, D)
    with torch.no_grad():
        user_emb.weight.copy_(torch.tensor(np.asarray(mf.user_emb)))
        item_emb.weight.copy_(torch.tensor(np.asarray(mf.item_emb)))
    lu = torch.tensor(np.asarray(last_u))
    li = torch.tensor(np.asarray(last_i))
    ut_fwd, _ = _torch_tower(torch, theta.user)
    it_fwd, _ = _torch_tower(torch, theta.item)
    topt = torch.optim.Adam(list(user_emb.parameters())
                            + list(item_emb.parameters()), lr=MF_LR)
    tu = torch.tensor(u)
    ti = torch.tensor(i)
    tj = torch.tensor(j)
    topt.zero_grad()
    xu, xi, xj = user_emb(tu), item_emb(ti), item_emb(tj)
    nu = ut_fwd(lu[tu], xu)
    ni = it_fwd(li[ti], xi)
    nj = it_fwd(li[tj], xj)
    pos = (nu * ni).sum(-1)
    neg = (nu * nj).sum(-1)
    tl = -torch.log(torch.sigmoid(pos) + 1e-15).mean() \
        - torch.log(torch.sigmoid(-neg) + 1e-15).mean() \
        + MF_L2 * 0.5 * ((xu ** 2).sum() + (xi ** 2).sum() + (xj ** 2).sum())
    tl.backward()
    topt.step()

    np.testing.assert_allclose(float(jloss), float(tl.detach()), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_mf.user_emb),
                               user_emb.weight.detach().numpy(),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_mf.item_emb),
                               item_emb.weight.detach().numpy(),
                               rtol=2e-4, atol=1e-5)


def test_outer_step_matches_torch(setup):
    torch, cfg, theta, mf, last_u, last_i, hat_u, hat_i, u, i, j = setup
    mask = jnp.ones(BATCH, jnp.float32)
    uj, ij, jj = jnp.asarray(u), jnp.asarray(i), jnp.asarray(j)

    # ---- jax outer step
    def loss_fn(th):
        return transferred_pair_loss(th, cfg, last_u[uj], last_i[ij],
                                     last_i[jj], hat_u[uj], hat_i[ij],
                                     hat_i[jj], mask, True)

    tx = torch_adam(TR_LR, weight_decay=TR_L2)
    opt = tx.init(theta)
    jloss, grads = jax.value_and_grad(loss_fn)(theta)
    updates, opt = tx.update(grads, opt, theta)
    new_theta = optax.apply_updates(theta, updates)

    # ---- torch outer step
    lu = torch.tensor(np.asarray(last_u))
    li = torch.tensor(np.asarray(last_i))
    hu = torch.tensor(np.asarray(hat_u))
    hi = torch.tensor(np.asarray(hat_i))
    ut_fwd, up = _torch_tower(torch, theta.user)
    it_fwd, ip = _torch_tower(torch, theta.item)
    topt = torch.optim.Adam(up + ip, lr=TR_LR, weight_decay=TR_L2)
    tu, ti, tj = torch.tensor(u), torch.tensor(i), torch.tensor(j)
    topt.zero_grad()
    nu = ut_fwd(lu[tu], hu[tu])
    ni = it_fwd(li[ti], hi[ti])
    nj = it_fwd(li[tj], hi[tj])
    pos = (nu * ni).sum(-1)
    neg = (nu * nj).sum(-1)
    tl = -torch.log(torch.sigmoid(pos) + 1e-15).mean() \
        - torch.log(torch.sigmoid(-neg) + 1e-15).mean()
    tl.backward()
    topt.step()

    np.testing.assert_allclose(float(jloss), float(tl.detach()), rtol=1e-5)
    got = {
        "c1w": np.asarray(new_theta.user.conv1_w),
        "c1b": np.asarray(new_theta.user.conv1_b),
        "c2w": np.asarray(new_theta.user.conv2_w),
        "f1w": np.asarray(new_theta.user.fc1_w),
        "f2w": np.asarray(new_theta.user.fc2_w),
    }
    want = {
        "c1w": up[0].detach().numpy().reshape(got["c1w"].shape),
        "c1b": up[1].detach().numpy(),
        "c2w": up[2].detach().numpy().reshape(got["c2w"].shape),
        "f1w": up[4].detach().numpy().T,
        "f2w": up[6].detach().numpy().T,
    }
    for k in got:
        np.testing.assert_allclose(got[k], want[k], rtol=2e-4, atol=1e-5,
                                   err_msg=k)

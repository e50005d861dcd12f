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

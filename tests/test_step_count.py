"""Optimizer-step-count parity: bucketed padding must not add Adam steps.

The reference runs exactly ``ceil(N/B)`` optimizer steps per epoch
(DataLoader with drop_last=False); phantom steps would decay Adam moments
and silently change the trajectory. The epoch scan cond-skips tail batches
beyond ``ceil(n_real/B)`` — this pins that contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sml_tpu.ops.batching import bucket_rows, pad_rows
from sml_tpu.ops.sampling import build_period_index
from sml_tpu.models.mf import init_mf
from sml_tpu.train.optim import torch_adam
from sml_tpu.train.steps import make_plain_mf_epoch


def _adam_count(opt_state):
    for s in opt_state:
        if hasattr(s, "mu"):            # ScaleByAdamState
            return int(s.count)
    raise AssertionError("no adam state found")


def test_step_count_equals_ceil_n_over_b(rng):
    n, b = 100 * 64 + 5, 64            # ceil = 101; bucket pads to 104
    assert bucket_rows(n, b) // b > -(-n // b), \
        "test requires a bucket with skipped tail batches"
    inter = np.unique(np.stack([rng.integers(0, 50, n),
                                rng.integers(0, 40, n)], 1), axis=0)
    n = inter.shape[0]
    tx = torch_adam(0.01)
    epoch = jax.jit(make_plain_mf_epoch(b, 1e-5, 1e-5, tx, 4),
                    donate_argnums=(0, 1))
    mf = init_mf(jax.random.PRNGKey(0), 50, 40, 4)
    opt = tx.init(mf)
    padded = pad_rows(inter, b)
    index = build_period_index(inter, 40)
    mf, opt, losses = epoch(mf, opt, padded.rows, padded.mask,
                            jnp.int32(padded.n_real), jax.random.PRNGKey(1),
                            index)
    want_steps = -(-n // b)
    assert _adam_count(opt) == want_steps
    # skipped tail batches must report zero loss and not NaN
    losses = np.asarray(losses)
    nb_max = padded.rows.shape[0] // b
    assert losses.shape[0] == nb_max
    assert np.all(losses[want_steps:] == 0.0)
    assert np.isfinite(losses).all()


def test_two_epochs_double_the_count(rng):
    inter = np.unique(np.stack([rng.integers(0, 30, 500),
                                rng.integers(0, 20, 500)], 1), axis=0)
    b = 64
    tx = torch_adam(0.01)
    epoch = jax.jit(make_plain_mf_epoch(b, 0, 0, tx, 4),
                    donate_argnums=(0, 1))
    mf = init_mf(jax.random.PRNGKey(0), 30, 20, 4)
    opt = tx.init(mf)
    padded = pad_rows(inter, b)
    index = build_period_index(inter, 20)
    for e in range(2):
        mf, opt, _ = epoch(mf, opt, padded.rows, padded.mask,
                           jnp.int32(padded.n_real),
                           jax.random.PRNGKey(e), index)
    assert _adam_count(opt) == 2 * -(-inter.shape[0] // b)

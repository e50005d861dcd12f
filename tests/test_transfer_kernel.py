"""Fused Pallas table-transfer kernel vs the XLA reference path.

Runs in Pallas TPU interpret mode so it is exercised on the CPU test mesh;
the same kernel compiles natively on real TPUs (bench.py path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sml_tpu.config import TransferConfig
from sml_tpu.models import transfer as T
from sml_tpu.ops.transfer_kernel import fused_table_transfer


@pytest.mark.parametrize("n_rows", [256, 1000, 1024, 2500])
def test_fused_matches_xla(rng, n_rows):
    from jax.experimental.pallas import tpu as pltpu

    cfg = TransferConfig(latent_dim=64)
    theta = T.init_transfer(jax.random.PRNGKey(1), cfg)
    last = jnp.asarray(rng.normal(size=(n_rows, 64)), jnp.float32)
    hat = jnp.asarray(rng.normal(size=(n_rows, 64)), jnp.float32)

    want = T.apply_rows(theta, cfg, "user", last, hat)
    with pltpu.force_tpu_interpret_mode():
        got = fused_table_transfer(theta.user, last, hat, block_rows=512)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_fused_handles_zero_rows_without_nan(rng):
    from jax.experimental.pallas import tpu as pltpu

    cfg = TransferConfig(latent_dim=64)
    theta = T.init_transfer(jax.random.PRNGKey(1), cfg)
    last = jnp.zeros((128, 64), jnp.float32)
    hat = jnp.asarray(rng.normal(size=(128, 64)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = fused_table_transfer(theta.user, last, hat, block_rows=128)
    assert np.isfinite(np.asarray(got)).all()

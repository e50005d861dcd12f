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


def test_fused_bf16_matmuls_within_tolerance(rng):
    """``TransferConfig.refresh_matmul_bf16``: the FC dots run with bf16
    inputs / f32 accumulation; outputs must track the f32 kernel at bf16
    input tolerance (the conv mixes, activations and x_com stay f32)."""
    from jax.experimental.pallas import tpu as pltpu

    cfg = TransferConfig(latent_dim=64)
    theta = T.init_transfer(jax.random.PRNGKey(1), cfg)
    last = jnp.asarray(rng.normal(size=(1024, 64)), jnp.float32)
    hat = jnp.asarray(rng.normal(size=(1024, 64)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        f32 = fused_table_transfer(theta.user, last, hat, block_rows=512)
        b16 = fused_table_transfer(theta.user, last, hat, block_rows=512,
                                   matmul_bf16=True)
    f32, b16 = np.asarray(f32), np.asarray(b16)
    assert np.isfinite(b16).all()
    scale = np.abs(f32).max()
    drift = np.abs(f32 - b16).max()
    assert 0 < drift < 0.03 * scale, (drift, scale)
    # and the config plumbs through apply_tables' pallas branch
    import dataclasses
    cfg_b = dataclasses.replace(cfg, refresh_matmul_bf16=True)
    with pltpu.force_tpu_interpret_mode():
        u, _ = T.apply_tables(theta, cfg_b, last, hat, last, hat,
                              use_pallas="always")
    np.testing.assert_array_equal(np.asarray(u), b16)


def test_fused_handles_zero_rows_without_nan(rng):
    from jax.experimental.pallas import tpu as pltpu

    cfg = TransferConfig(latent_dim=64)
    theta = T.init_transfer(jax.random.PRNGKey(1), cfg)
    last = jnp.zeros((128, 64), jnp.float32)
    hat = jnp.asarray(rng.normal(size=(128, 64)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = fused_table_transfer(theta.user, last, hat, block_rows=128)
    assert np.isfinite(np.asarray(got)).all()

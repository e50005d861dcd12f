"""Fused decay-Adam Pallas kernel vs the XLA formulation (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sml_tpu.ops.adam_kernel import fused_decay_adam
from sml_tpu.train.optim import ADAM_B1, ADAM_B2, ADAM_EPS


def test_best_block_production_shape():
    from sml_tpu.ops.adam_kernel import _best_block
    # 5M users x d=64 -> 2.5M lane-rows; divisor search must find a
    # near-target MULTIPLE-OF-8 block (TPU sublane tiling), not the
    # 32-row power-of-two floor. The old contract allowed any divisor;
    # a 500-row block (divides 3M) fails Pallas lowering on hardware.
    assert _best_block(2_500_000, 4096) == 4000
    assert _best_block(2_500_000, 1024) == 1000
    # 625 = 5^4 has no multiple-of-8 divisor -> degenerate 1 (caller
    # falls back to XLA via decay_adam_supported's >=256 gate)
    assert _best_block(625, 512) == 1
    assert _best_block(677, 512) == 1


@pytest.mark.parametrize("shape", [
    (2048, 64), (1000 * 128,), (4096, 96),
    # awkward row counts: 1250x64 -> 625 = 5^4 lane-rows (no power-of-two
    # divisor near 512; divisor search must find 125), 677 prime lane-rows
    # (degenerate block=1 must still be correct)
    (1250, 64), (677 * 128,),
])
def test_fused_decay_matches_xla(rng, shape):
    from jax.experimental.pallas import tpu as pltpu

    p = jnp.asarray(rng.normal(size=shape), jnp.float32)
    mu = jnp.asarray(rng.normal(size=shape) * 1e-2, jnp.float32)
    nu = jnp.asarray(rng.random(shape) * 1e-4, jnp.float32)
    t = 7
    bc1 = jnp.float32(1 - ADAM_B1 ** t)
    bc2 = jnp.float32(1 - ADAM_B2 ** t)
    lr = 0.01

    mu_x = ADAM_B1 * mu
    nu_x = ADAM_B2 * nu
    p_x = p + (-lr) * ((mu_x / bc1) / (jnp.sqrt(nu_x / bc2) + ADAM_EPS))

    with pltpu.force_tpu_interpret_mode():
        p_k, mu_k, nu_k = fused_decay_adam(
            p, mu, nu, bc1, bc2, lr=lr, b1=ADAM_B1, b2=ADAM_B2,
            eps=ADAM_EPS, block_rows=512)

    np.testing.assert_array_equal(np.asarray(mu_k), np.asarray(mu_x))
    np.testing.assert_array_equal(np.asarray(nu_k), np.asarray(nu_x))
    np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_x),
                               rtol=1e-6, atol=1e-8)

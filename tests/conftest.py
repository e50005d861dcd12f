"""Test harness: force a virtual 8-device CPU mesh BEFORE jax initializes.

This substitutes for multi-chip hardware (SURVEY.md §4): sharding tests run
against 8 virtual CPU devices, exactly as the driver's multi-chip dry-run
does. Benchmarks (bench.py) do NOT import this and run on the real TPU.
"""

import os

# The axon sitecustomize pins JAX_PLATFORMS=axon before conftest runs, so the
# env var alone is ignored; jax.config.update still wins if no backend has
# been used yet.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_dataset(tmp_path_factory):
    """A small synthetic dataset written in the reference layout."""
    from sml_tpu.config import DataSpec
    from sml_tpu.data.synthetic import SyntheticSpec, generate_synthetic_dataset

    root = tmp_path_factory.mktemp("data")
    spec = SyntheticSpec(n_users=300, n_items=150, n_periods=8,
                         interactions_per_period=600, first_test_period=3,
                         neg_num=49, seed=7, latent_dim=4, drift=0.03)
    info = generate_synthetic_dataset(str(root / "synth"), spec)
    dspec = DataSpec(root=str(root), name="synth", num_periods=8,
                     online_train_start=3, online_test_start=5,
                     eval_neg_num=49)
    return dspec, info, spec


@pytest.fixture()
def rng():
    return np.random.default_rng(0)

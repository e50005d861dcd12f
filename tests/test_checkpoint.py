"""Checkpoint round-trip of the full SML state + resume semantics."""

import os

import jax
import numpy as np

from sml_tpu.config import SMLConfig, TransferConfig
from sml_tpu.train.engine import SMLEngine
from sml_tpu.utils.checkpoint import (latest_step, restore_checkpoint,
                                      save_checkpoint)


def _engine():
    cfg = SMLConfig(latent_dim=8, mf_batch_size=64, tr_batch_size=32,
                    transfer=TransferConfig(latent_dim=8, fc_hidden=32))
    return SMLEngine(cfg, 50, 30)


def test_roundtrip(tmp_path):
    engine = _engine()
    state = engine.init_state()
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 3, state, extra={"note": "x"})
    assert latest_step(d) == 3

    template = engine.init_state()
    restored, step, extra = restore_checkpoint(d, template)
    assert step == 3 and extra == {"note": "x"}
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_retention_and_latest(tmp_path):
    engine = _engine()
    state = engine.init_state()
    d = str(tmp_path / "ckpt")
    for step in range(6):
        save_checkpoint(d, step, state, keep=3)
    files = sorted(f for f in os.listdir(d) if f.endswith(".npz"))
    assert files == ["ckpt_000003.npz", "ckpt_000004.npz", "ckpt_000005.npz"]
    assert latest_step(d) == 5


def test_restore_preserves_dtypes(tmp_path):
    engine = _engine()
    state = engine.init_state()
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 0, state)
    restored, _, _ = restore_checkpoint(d, engine.init_state())
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        assert a.dtype == b.dtype


def test_bfloat16_snapshot_roundtrip(tmp_path):
    """bf16 leaves are an ml_dtypes extension type that np.savez silently
    degrades to void bytes; the bit-view encoding must round-trip them
    exactly (regression: resume crashed with --snapshot-dtype bfloat16)."""
    cfg = SMLConfig(latent_dim=8, mf_batch_size=64, tr_batch_size=32,
                    snapshot_dtype="bfloat16",
                    transfer=TransferConfig(latent_dim=8, fc_hidden=32))
    engine = SMLEngine(cfg, 50, 30)
    state = engine.init_state()
    assert state.last_user.dtype == jax.numpy.bfloat16
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 0, state)
    restored, _, _ = restore_checkpoint(d, engine.init_state())
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(
            np.asarray(a).reshape(-1).view(np.uint8),
            np.asarray(b).reshape(-1).view(np.uint8))

"""Fused one-dispatch SML phase == the epoch-at-a-time path, bitwise.

``SMLEngine.phase_step`` compiles a whole phase (inner epochs -> hat
snapshot -> refresh -> outer epochs, ``transfer.py:772-791`` loop body)
into one device program. The op sequence and the key-split order match the
unfused path exactly, so full-sweep trajectories must be IDENTICAL — this
pins that, plus the automatic bypass when in-training evals need
intermediate states.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sml_tpu.config import SMLConfig, TransferConfig
from sml_tpu.train.driver import SMLDriver
from sml_tpu.train.engine import SMLEngine


def _cfg(**kw):
    base = dict(
        multi_num=3, mf_epochs=2, tr_epochs=2,
        mf_batch_size=256, tr_batch_size=128, eval_batch_size=256,
        latent_dim=16, transfer=TransferConfig(latent_dim=16, fc_hidden=64),
        topk=(5, 10, 20),
    )
    base.update(kw)
    return SMLConfig(**base)


def _run(synthetic_dataset, **cfg_kw):
    dspec, info, spec = synthetic_dataset
    cfg = _cfg(**cfg_kw)
    engine = SMLEngine(cfg, info.n_users, info.n_items)
    driver = SMLDriver(cfg, dspec, engine=engine)
    report = driver.run(engine.init_state())
    return driver.final_state, report


def test_fused_matches_unfused_bitwise(synthetic_dataset):
    sf, rf = _run(synthetic_dataset, fuse_phases=True)
    su, ru = _run(synthetic_dataset, fuse_phases=False)
    assert bool(jnp.all(sf.key == su.key))
    for leaf_f, leaf_u in zip(jax.tree.leaves(sf._replace(key=None)),
                              jax.tree.leaves(su._replace(key=None))):
        np.testing.assert_array_equal(np.asarray(leaf_f),
                                      np.asarray(leaf_u))
    for k in (5, 10, 20):
        assert rf.per_period[k] == ru.per_period[k]
        assert rf.per_period_ndcg[k] == ru.per_period_ndcg[k]


def test_fused_matches_with_guard_and_norms(synthetic_dataset):
    """log_norms + saddle guard read per-phase losses from the fused
    outputs; trajectories must still match the unfused run."""
    kw = dict(log_norms=True, saddle_retries=1)
    sf, rf = _run(synthetic_dataset, fuse_phases=True, **kw)
    su, ru = _run(synthetic_dataset, fuse_phases=False, **kw)
    for k in (5, 10, 20):
        assert rf.per_period[k] == ru.per_period[k]
    assert rf.saddle_retries_used == ru.saddle_retries_used


def test_eval_mode_bypasses_fusion(synthetic_dataset):
    """In-training evals observe intermediate states, so the driver must
    fall back to the unfused path — and still produce the same tables."""
    dspec, info, spec = synthetic_dataset
    cfg = _cfg(eval_during_inner=True, eval_during_outer=True)
    engine = SMLEngine(cfg, info.n_users, info.n_items)
    driver = SMLDriver(cfg, dspec, engine=engine)
    assert not driver._can_fuse(np.zeros((4, 51), np.int32))
    assert driver._can_fuse(None)   # no val set -> nothing to observe

    se, re_ = _run(synthetic_dataset, eval_during_inner=True,
                   eval_during_outer=True)
    su, ru = _run(synthetic_dataset, fuse_phases=False)
    # metric-only evals never change training state
    for k in (5, 10, 20):
        assert re_.per_period[k] == ru.per_period[k]

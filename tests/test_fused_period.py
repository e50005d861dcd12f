"""One-dispatch PERIODS (``SMLEngine.period_step``) == the per-phase path.

``fuse_period`` scans the whole phase alternation of a period inside one
device program, with the protocol's in-training val evals computed INSIDE
the scan on the same intermediate states the unfused driver observes
(``transfer.py:444-446,517-519,684-690,740`` semantics via
``_inner_block``/``_outer_block``). These tests pin:

  * bitwise state/trajectory equality vs the per-phase fused path and the
    fully unfused path, with evals ON (the case the old per-phase fusion
    had to bypass);
  * the stacked in-fused eval sums expand into per-epoch log records
    identical (kind, epoch, every metric) and identically ORDERED to the
    unfused path's records;
  * the period-0 saddle guard still runs per-phase (it must observe
    losses mid-period) while later periods fuse.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sml_tpu.config import SMLConfig, TransferConfig
from sml_tpu.train.driver import SMLDriver
from sml_tpu.train.engine import SMLEngine


class RecordingLogger:
    """Stand-in for MetricsLogger that keeps records in memory."""

    def __init__(self):
        self.records = []

    def log(self, **record):
        record.pop("ts", None)
        record.pop("seconds", None)   # wall-clock differs run to run
        self.records.append(record)

    def close(self):
        pass


def _cfg(**kw):
    base = dict(
        multi_num=3, mf_epochs=2, tr_epochs=2,
        mf_batch_size=256, tr_batch_size=128, eval_batch_size=256,
        latent_dim=16, transfer=TransferConfig(latent_dim=16, fc_hidden=64),
        topk=(5, 10, 20),
        eval_during_inner=True, eval_during_outer=True,
    )
    base.update(kw)
    return SMLConfig(**base)


def _run(synthetic_dataset, **cfg_kw):
    dspec, info, spec = synthetic_dataset
    cfg = _cfg(**cfg_kw)
    engine = SMLEngine(cfg, info.n_users, info.n_items)
    logger = RecordingLogger()
    driver = SMLDriver(cfg, dspec, engine=engine, logger=logger)
    report = driver.run(engine.init_state())
    return driver.final_state, report, logger.records


def test_fused_period_matches_unfused_with_evals(synthetic_dataset):
    sp, rp, lp = _run(synthetic_dataset, fuse_period=True)
    su, ru, lu = _run(synthetic_dataset, fuse_phases=False,
                      fuse_period=False)
    assert bool(jnp.all(sp.key == su.key))
    for leaf_p, leaf_u in zip(jax.tree.leaves(sp._replace(key=None)),
                              jax.tree.leaves(su._replace(key=None))):
        np.testing.assert_array_equal(np.asarray(leaf_p),
                                      np.asarray(leaf_u))
    for k in (5, 10, 20):
        assert rp.per_period[k] == ru.per_period[k]
        assert rp.per_period_ndcg[k] == ru.per_period_ndcg[k]
    # identical eval records, identically ordered: kind, epoch, metrics
    evs_p = [r for r in lp if r["kind"] in ("inner_eval", "outer_eval")]
    evs_u = [r for r in lu if r["kind"] in ("inner_eval", "outer_eval")]
    assert len(evs_p) == len(evs_u) > 0
    assert evs_p == evs_u


def test_fused_period_matches_per_phase_fused(synthetic_dataset):
    """Same trajectory as the per-phase fused path (evals off so the
    per-phase path actually fuses)."""
    kw = dict(eval_during_inner=False, eval_during_outer=False)
    sp, rp, _ = _run(synthetic_dataset, fuse_period=True, **kw)
    sf, rf, _ = _run(synthetic_dataset, fuse_period=False, **kw)
    for leaf_p, leaf_f in zip(jax.tree.leaves(sp),
                              jax.tree.leaves(sf)):
        np.testing.assert_array_equal(np.asarray(leaf_p),
                                      np.asarray(leaf_f))
    for k in (5, 10, 20):
        assert rp.per_period[k] == rf.per_period[k]


def test_guard_rides_fused_period(synthetic_dataset):
    """With the saddle guard armed, period 0 fuses too (VERDICT r4 "Next"
    #8): the guard replays its rule on the outer-loss stack the fused
    program returns — decisions, retry counts and the kept trajectory all
    equal the unfused run's."""
    kw = dict(saddle_retries=1)
    sp, rp, _ = _run(synthetic_dataset, fuse_period=True, **kw)
    su, ru, _ = _run(synthetic_dataset, fuse_phases=False,
                     fuse_period=False, **kw)
    for k in (5, 10, 20):
        assert rp.per_period[k] == ru.per_period[k]
    assert rp.saddle_retries_used == ru.saddle_retries_used


def test_log_norms_fused_parity(synthetic_dataset):
    """``log_norms`` diagnostics no longer force the unfused path: the
    fused program stacks per-phase weight norms and the driver expands
    them into phase records with the same keys, phases, and (fp32-exact)
    values as the unfused path logs."""
    kw = dict(log_norms=True)
    sp, rp, lp = _run(synthetic_dataset, fuse_period=True, **kw)
    su, ru, lu = _run(synthetic_dataset, fuse_phases=False,
                      fuse_period=False, **kw)
    for k in (5, 10, 20):
        assert rp.per_period[k] == ru.per_period[k]
    ph_p = [r for r in lp if r["kind"] == "phase"]
    ph_u = [r for r in lu if r["kind"] == "phase"]
    assert len(ph_p) == len(ph_u) > 0
    for a, b in zip(ph_p, ph_u):
        assert a.keys() == b.keys()
        assert (a["d_time"], a["phase"]) == (b["d_time"], b["phase"])
        for key in a:
            va, vb = a[key], b[key]
            if isinstance(va, float):
                assert va == vb or abs(va - vb) <= 1e-6 * max(
                    abs(va), abs(vb), 1.0), (key, a, b)
            else:
                assert va == vb, (key, a, b)

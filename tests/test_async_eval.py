"""Deferred in-training evals: dispatch-now/fetch-later must be value-exact.

The reference evaluates validation recall synchronously inside the training
loops (``model/transfer.py:444-446``, ``:738-741``); our driver dispatches
those evals without a host fetch and resolves a period's worth in one
transfer (``SMLEngine.evaluate_deferred`` / ``SMLDriver._flush_evals``).
These tests pin (a) exact value equality with the synchronous path and
(b) that the driver logs the same rows, in epoch order, as a synchronous
spy computes at dispatch time.
"""

import json

import numpy as np

from sml_tpu.config import SMLConfig, TransferConfig
from sml_tpu.train.driver import SMLDriver
from sml_tpu.train.engine import SMLEngine
from sml_tpu.utils.logging import MetricsLogger


def _cfg(**kw):
    base = dict(
        multi_num=2, mf_epochs=1, tr_epochs=1,
        mf_batch_size=256, tr_batch_size=128, eval_batch_size=256,
        latent_dim=16, transfer=TransferConfig(latent_dim=16, fc_hidden=64),
        topk=(5, 10, 20),
    )
    base.update(kw)
    return SMLConfig(**base)


def test_deferred_equals_sync(synthetic_dataset):
    dspec, info, spec = synthetic_dataset
    cfg = _cfg()
    engine = SMLEngine(cfg, info.n_users, info.n_items)
    state = engine.init_state()
    rng = np.random.default_rng(0)
    rows = np.concatenate(
        [rng.integers(0, info.n_users, (100, 1)),
         rng.integers(0, info.n_items, (100, 50))], axis=1)

    sync = engine.evaluate(state.mf, rows)
    padded = engine.make_eval_set(rows)
    out = engine.resolve_evals(
        [engine.evaluate_deferred(state.mf, padded),
         engine.evaluate_deferred(state.mf, padded)])
    assert len(out) == 2
    for m in out:
        for k in cfg.topk:
            assert m[k]["recall"] == sync[k]["recall"]
            assert m[k]["ndcg"] == sync[k]["ndcg"]
    assert engine.resolve_evals([]) == []


def test_driver_logs_match_sync_spy(synthetic_dataset, tmp_path):
    """Run a short sweep with in-training evals on; a spy computes each
    eval synchronously at dispatch time and the flushed jsonl rows must
    reproduce those values exactly, in order."""
    dspec, info, spec = synthetic_dataset
    # fuse_period=False: this test pins the per-dispatch deferral
    # machinery; fused periods compute their evals inside one device
    # program instead (pinned against this path in test_fused_period.py)
    cfg = _cfg(eval_during_inner=True, eval_during_outer=True,
               fuse_period=False)
    engine = SMLEngine(cfg, info.n_users, info.n_items)
    log_path = tmp_path / "evals.jsonl"
    driver = SMLDriver(cfg, dspec, engine=engine,
                       logger=MetricsLogger(str(log_path)))

    real_deferred = engine.evaluate_deferred
    sync_vals = []

    def spy(mf, rows):
        d = real_deferred(mf, rows)
        sync_vals.append(engine.resolve_evals([d])[0])
        return d

    # keep ``evaluate`` (used by _record_test) off the spy so sync_vals
    # holds exactly the driver's in-training dispatches, in order
    engine.evaluate = lambda mf, rows: engine.resolve_evals(
        [real_deferred(mf, rows)])[0]
    engine.evaluate_deferred = spy
    state = engine.init_state()
    driver.run(state, max_periods=dspec.online_test_start + 1)
    driver.logger.close()

    logged = [json.loads(l) for l in log_path.read_text().splitlines()]
    eval_rows = [r for r in logged
                 if r["kind"] in ("inner_eval", "outer_eval", "test")]
    # every deferred dispatch (in-training evals AND the per-period test,
    # which also defers through evaluate_deferred) must surface exactly once
    assert len(eval_rows) == len(sync_vals) and len(sync_vals) > 0

    def sig(vals):
        return tuple(round(v, 12) for v in vals)

    logged_sigs = sorted(sig([r[f"recall@{k}"] for k in cfg.topk]
                             + [r[f"ndcg@{k}"] for k in cfg.topk])
                         for r in eval_rows)
    sync_sigs = sorted(sig([m[k]["recall"] for k in cfg.topk]
                           + [m[k]["ndcg"] for k in cfg.topk])
                       for m in sync_vals)
    assert logged_sigs == sync_sigs
    # in-training rows keep dispatch (epoch) order within each kind
    for kind in ("inner_eval", "outer_eval"):
        assert any(r["kind"] == kind for r in eval_rows), kind

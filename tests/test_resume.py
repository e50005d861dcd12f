"""Crash-recovery determinism: resume == uninterrupted run.

The full state (tables, Θ, both Adam states, PRNG key) lives in the
checkpoint, so a run killed at a period boundary and resumed in a FRESH
process/engine must produce bitwise-identical metrics for the remaining
periods. This is the elastic-recovery story the reference lacks entirely
(SURVEY.md §5: "Crash = lose the run").
"""

import numpy as np

from sml_tpu.config import SMLConfig, TransferConfig
from sml_tpu.train.driver import SMLDriver
from sml_tpu.train.engine import SMLEngine
from sml_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint


def _cfg():
    return SMLConfig(multi_num=1, mf_batch_size=256, tr_batch_size=128,
                     eval_batch_size=256, latent_dim=8,
                     transfer=TransferConfig(latent_dim=8, fc_hidden=32),
                     mf_sample="alone")


def test_multipass_resume_summary_equality(synthetic_dataset, tmp_path):
    """Crash mid-FINAL-pass of a pass_num=2 run, resume via the checkpoint
    extra (pass_id, period, report) exactly as the CLI does: the resumed
    run's weighted summary must equal the uninterrupted run's."""
    from sml_tpu.train.driver import RunReport

    dspec, info, spec = synthetic_dataset
    cfg = _cfg().replace(pass_num=2)

    engine_a = SMLEngine(cfg, info.n_users, info.n_items)
    driver_a = SMLDriver(cfg, dspec, engine=engine_a)
    report_a = driver_a.run(engine_a.init_state())
    assert len(report_a.test_counts) == 3

    class Crash(Exception):
        pass

    ck = str(tmp_path / "ck")
    engine_b = SMLEngine(cfg, info.n_users, info.n_items)
    driver_b = SMLDriver(cfg, dspec, engine=engine_b)

    def save_and_maybe_crash(st, pass_id, d_time, drv):
        drv.finalize()
        save_checkpoint(ck, pass_id * 100 + d_time, st,
                        extra={"pass_id": pass_id, "period": d_time,
                               "report": drv.report.to_dict()})
        if pass_id == 1 and d_time == 1:   # after the 1st test period
            raise Crash()

    try:
        driver_b.run(engine_b.init_state(),
                     on_period_end=save_and_maybe_crash)
        raise AssertionError("crash did not fire")
    except Crash:
        pass
    assert len(driver_b.report.test_counts) == 1   # pre-crash test period

    engine_c = SMLEngine(cfg, info.n_users, info.n_items)
    driver_c = SMLDriver(cfg, dspec, engine=engine_c)
    template = engine_c.init_state()
    state_c, _, extra = restore_checkpoint(ck, template)
    driver_c.report = RunReport.from_dict(extra["report"])
    report_c = driver_c.run(state_c,
                            start_pass=int(extra["pass_id"]),
                            start_period=int(extra["period"]) + 1)

    assert report_c.test_counts == report_a.test_counts
    for k, vals in report_a.per_period.items():
        np.testing.assert_array_equal(np.asarray(report_c.per_period[k]),
                                      np.asarray(vals), err_msg=f"K={k}")
    sa, sc = report_a.summary(), report_c.summary()
    for key, v in sa.items():
        if key != "total_seconds":
            assert sc[key] == v, (key, sc[key], v)


def test_resume_reproduces_uninterrupted_run(synthetic_dataset, tmp_path):
    dspec, info, spec = synthetic_dataset

    # uninterrupted reference run
    engine_a = SMLEngine(_cfg(), info.n_users, info.n_items)
    driver_a = SMLDriver(_cfg(), dspec, engine=engine_a)
    report_a = driver_a.run(engine_a.init_state())
    assert len(report_a.test_counts) == 3

    # run 2 periods, checkpoint, then resume in a fresh engine/driver
    engine_b = SMLEngine(_cfg(), info.n_users, info.n_items)
    driver_b = SMLDriver(_cfg(), dspec, engine=engine_b)
    state = engine_b.init_state()
    driver_b.feeder.reinit()
    for d_time in range(2):
        state, ok = driver_b.run_period(state, d_time)
        assert ok
    save_checkpoint(str(tmp_path / "ck"), 1, state)

    engine_c = SMLEngine(_cfg(), info.n_users, info.n_items)
    driver_c = SMLDriver(_cfg(), dspec, engine=engine_c)
    template = engine_c.init_state()
    state_c, step, _ = restore_checkpoint(str(tmp_path / "ck"), template)
    assert step == 1
    driver_c.feeder.reinit()
    d_time = 0
    while True:
        if d_time > step:
            state_c, ok = driver_c.run_period(state_c, d_time)
            if not ok:
                break
        else:
            driver_c.feeder.next_train(d_time)   # advance the test cursor
        d_time += 1

    # driver_b saw test periods 0..(maybe 1); driver_c the rest; together
    # they must equal the uninterrupted sequence exactly
    driver_b.finalize()   # direct run_period callers drain deferred tests
    driver_c.finalize()
    merged = {k: driver_b.report.per_period.get(k, [])
              + driver_c.report.per_period.get(k, [])
              for k in report_a.per_period}
    for k, vals in report_a.per_period.items():
        np.testing.assert_array_equal(np.asarray(merged[k]),
                                      np.asarray(vals), err_msg=f"K={k}")
    merged_n = driver_b.report.test_counts + driver_c.report.test_counts
    assert merged_n == report_a.test_counts


def test_resume_with_fused_periods(synthetic_dataset, tmp_path):
    """Same crash-recovery determinism with one-dispatch periods
    (fuse_period=True, the shipping default once marked) and the
    protocol's in-training evals on: resume must reproduce the
    uninterrupted fused run's metrics bitwise."""
    dspec, info, spec = synthetic_dataset
    fcfg = _cfg().replace(multi_num=2, fuse_period=True,
                          eval_during_inner=True, eval_during_outer=True)

    engine_a = SMLEngine(fcfg, info.n_users, info.n_items)
    driver_a = SMLDriver(fcfg, dspec, engine=engine_a)
    report_a = driver_a.run(engine_a.init_state())
    assert len(report_a.test_counts) == 3

    engine_b = SMLEngine(fcfg, info.n_users, info.n_items)
    driver_b = SMLDriver(fcfg, dspec, engine=engine_b)
    state = engine_b.init_state()
    driver_b.feeder.reinit()
    for d_time in range(2):
        state, ok = driver_b.run_period(state, d_time)
        assert ok
    save_checkpoint(str(tmp_path / "ck"), 1, state)

    engine_c = SMLEngine(fcfg, info.n_users, info.n_items)
    driver_c = SMLDriver(fcfg, dspec, engine=engine_c)
    template = engine_c.init_state()
    state_c, step, _ = restore_checkpoint(str(tmp_path / "ck"), template)
    driver_c.feeder.reinit()
    d_time = 0
    while True:
        if d_time > step:
            state_c, ok = driver_c.run_period(state_c, d_time)
            if not ok:
                break
        else:
            driver_c.feeder.next_train(d_time)
        d_time += 1

    driver_b.finalize()
    driver_c.finalize()
    merged = {k: driver_b.report.per_period.get(k, [])
              + driver_c.report.per_period.get(k, [])
              for k in report_a.per_period}
    for k, vals in report_a.per_period.items():
        np.testing.assert_array_equal(np.asarray(merged[k]),
                                      np.asarray(vals), err_msg=f"K={k}")

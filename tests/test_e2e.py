"""End-to-end: pretrain -> SML sweep -> baselines on the synthetic dataset."""

import jax
import numpy as np
import pytest

from sml_tpu.config import BaselineConfig, PretrainConfig, SMLConfig, TransferConfig
from sml_tpu.train.baselines import BaselineDriver
from sml_tpu.train.driver import SMLDriver
from sml_tpu.train.engine import SMLEngine
from sml_tpu.train.pretrain import pretrain_mf


def _small_cfg(**kw):
    base = dict(
        multi_num=2, mf_epochs=1, tr_epochs=1,
        mf_batch_size=256, tr_batch_size=128, eval_batch_size=256,
        latent_dim=16,
        transfer=TransferConfig(latent_dim=16, fc_hidden=64),
        topk=(5, 10, 20),
    )
    base.update(kw)
    return SMLConfig(**base)


@pytest.fixture(scope="module")
def pretrained(synthetic_dataset):
    dspec, info, spec = synthetic_dataset
    pcfg = PretrainConfig(max_epochs=40, eval_every=2, patience=6,
                          batch_size=256, latent_dim=16, emb_init_scale=0.1)
    params, metrics = pretrain_mf(pcfg, dspec,
                                  pretrain_period=dspec.online_test_start - 1)
    return params, metrics


def test_pretrain_learns(pretrained, synthetic_dataset):
    _, info, spec = synthetic_dataset
    params, metrics = pretrained
    # random ranking over 1+49 candidates gives recall@5 ~ 0.1
    assert metrics["recall@5"] > 0.2, metrics
    assert metrics["ndcg@20"] > metrics["ndcg@5"] - 1e-9


def test_sml_sweep_runs_and_reports(pretrained, synthetic_dataset):
    dspec, info, spec = synthetic_dataset
    cfg = _small_cfg()
    engine = SMLEngine(cfg, info.n_users, info.n_items)
    driver = SMLDriver(cfg, dspec, engine=engine)
    state = engine.init_state(pretrained_mf=pretrained[0])
    report = driver.run(state)

    # online_train 3..6, tests at t+1 = 5, 6, 7 -> 3 test periods
    assert len(report.test_counts) == 3
    for k in (5, 10, 20):
        assert len(report.per_period[k]) == 3
        assert all(np.isfinite(report.per_period[k]))
        assert all(np.isfinite(report.per_period_ndcg[k]))
    s = report.summary()
    assert 0.0 <= s["test_recall@5"] <= 1.0
    # Above random ranking (random recall@5 = 5/50 = 0.1, @20 = 0.4) and the
    # transfer improves as Θ trains across periods
    assert report.per_period[20][-1] > 0.45
    assert report.per_period[20][-1] > report.per_period[20][0]
    assert np.mean(report.per_period[5]) > 0.1

    # recall@20 >= recall@10 >= recall@5 per period (nested top-K)
    for i in range(3):
        assert report.per_period[20][i] >= report.per_period[10][i] >= \
            report.per_period[5][i]


def test_sml_alone_sampling_mode(pretrained, synthetic_dataset):
    """mf_sample='alone' exercises the on-device rejection sampler path."""
    dspec, info, spec = synthetic_dataset
    cfg = _small_cfg(mf_sample="alone", multi_num=1)
    engine = SMLEngine(cfg, info.n_users, info.n_items)
    driver = SMLDriver(cfg, dspec, engine=engine)
    report = driver.run(engine.init_state(pretrained_mf=pretrained[0]),
                        max_periods=2)
    assert len(report.period_seconds) == 2


def test_sml_tr_stop_branch(pretrained, synthetic_dataset):
    """tr_stop=True exercises regime B (MF-only updates in the test span)."""
    dspec, info, spec = synthetic_dataset
    cfg = _small_cfg(tr_stop=True, multi_num=1)
    engine = SMLEngine(cfg, info.n_users, info.n_items)
    driver = SMLDriver(cfg, dspec, engine=engine)
    report = driver.run(engine.init_state(pretrained_mf=pretrained[0]))
    assert len(report.test_counts) == 3


@pytest.mark.parametrize("method", ["full", "fine", "spmf"])
def test_baselines(method, pretrained, synthetic_dataset):
    dspec, info, spec = synthetic_dataset
    cfg = BaselineConfig(method=method, epochs=2, batch_size=256,
                         latent_dim=16, start_period=dspec.online_test_start,
                         pool_size=500 if method == "spmf" else 0)
    driver = BaselineDriver(cfg, dspec, pretrained=pretrained[0])
    summary = driver.run(max_periods=2)
    assert driver.recall, "no periods ran"
    rec = np.asarray(driver.recall)
    assert np.isfinite(rec).all()
    # recall@K nested
    assert (rec[:, 2] >= rec[:, 1]).all() and (rec[:, 1] >= rec[:, 0]).all()
    assert "test_recall@20" in summary

"""``fuse_period='auto'`` cache-aware gating (VERDICT r4 "Next" #4).

The fused-period scan program's first-ever compile is ~13 min over the
remote-TPU tunnel, vs ~112 s for a whole unfused cold sweep — so the
default must not walk cold users into it. 'auto' fuses only once this
config's program has a compile marker on this host; an explicit
``fuse_period=True`` run compiles, marks, and thereby unlocks the fused
path for every later 'auto' run of the same config.
"""

import numpy as np
import pytest

from sml_tpu.config import SMLConfig, TransferConfig
from sml_tpu.train.driver import SMLDriver
from sml_tpu.train.engine import SMLEngine


def _cfg(**kw):
    base = dict(
        multi_num=2, mf_epochs=1, tr_epochs=1,
        mf_batch_size=256, tr_batch_size=128, eval_batch_size=256,
        latent_dim=16, transfer=TransferConfig(latent_dim=16, fc_hidden=64),
    )
    base.update(kw)
    return SMLConfig(**base)


def test_auto_gates_on_marker(synthetic_dataset, tmp_path, monkeypatch):
    monkeypatch.setenv("SML_TPU_CACHE_DIR", str(tmp_path / "cache"))
    dspec, info, spec = synthetic_dataset

    # cold host: 'auto' must NOT take the fused path
    cfg = _cfg(fuse_period="auto")
    engine = SMLEngine(cfg, info.n_users, info.n_items)
    driver = SMLDriver(cfg, dspec, engine=engine)
    assert not engine.fused_program_warm()
    assert not driver._can_fuse_period(object())

    # an explicit fuse_period=True run compiles the program and marks it
    cfg_on = _cfg(fuse_period=True)
    engine_on = SMLEngine(cfg_on, info.n_users, info.n_items)
    driver_on = SMLDriver(cfg_on, dspec, engine=engine_on)
    assert driver_on._can_fuse_period(object())
    driver_on.run(engine_on.init_state(), max_periods=2)
    assert engine_on.fused_program_warm()

    # same config under 'auto' now fuses (marker present). NOTE: the
    # marker key includes shape targets, so the driver must be built the
    # same way (same dataset) for the probe to hit.
    engine2 = SMLEngine(_cfg(fuse_period="auto"), info.n_users,
                        info.n_items)
    driver2 = SMLDriver(engine2.cfg, dspec, engine=engine2)
    assert engine2.fused_program_warm()
    assert driver2._can_fuse_period(object())

    # a DIFFERENT config (other multi_num) is still cold
    engine3 = SMLEngine(_cfg(fuse_period="auto", multi_num=3),
                        info.n_users, info.n_items)
    driver3 = SMLDriver(engine3.cfg, dspec, engine=engine3)
    assert not engine3.fused_program_warm()
    assert not driver3._can_fuse_period(object())

"""Multi-host (multi-process DCN) parity: 2 processes x 4 CPU devices must
reproduce the single-process state trajectory.

The reference has no distributed path at all
(``/root/reference/main_yelp.py:125``); this validates the new SURVEY.md
§2.3 communication-backend design: the parent computes the two-phase SML
trajectory single-process (8 virtual devices in-process via conftest), then
launches two coordinated worker processes (``scripts/multihost_worker.py``)
over gRPC/Gloo and asserts the final tables and θ agree to float
reassociation tolerance.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_USERS, N_ITEMS, DIM = 320, 160, 16


def mk_cfg():
    from sml_tpu.config import SMLConfig, TransferConfig
    return SMLConfig(mf_batch_size=128, tr_batch_size=64, eval_batch_size=128,
                     latent_dim=DIM, multi_num=1,
                     transfer=TransferConfig(latent_dim=DIM, fc_hidden=64),
                     mf_sample="alone", tr_sample_type="alone")


def mk_periods(n_periods: int = 2, n: int = 700):
    """Deterministic synthetic (set_t, set_tt) pairs shared by the parent
    and every worker process."""
    rng = np.random.default_rng(7)
    out = []
    for _ in range(n_periods):
        def draw():
            inter = np.stack([rng.integers(0, N_USERS, n),
                              rng.integers(0, N_ITEMS, n)], axis=1)
            return np.unique(inter, axis=0)
        out.append((draw(), draw()))
    return out


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_single_process():
    from sml_tpu.train.engine import SMLEngine
    engine = SMLEngine(mk_cfg(), N_USERS, N_ITEMS)
    state = engine.init_state()
    for set_t, set_tt in mk_periods():
        state = engine.snapshot_last(state)
        state, _ = engine.inner_epoch(state, *engine.prep_inner(set_t))
        state = engine.snapshot_hat(state)
        state = engine.refresh(state)
        state, _ = engine.outer_epoch(state, *engine.prep_outer(set_tt))
        state = engine.refresh(state)
    return state


@pytest.mark.slow
def test_two_process_parity(tmp_path):
    ref = _run_single_process()

    port = _free_port()
    out = str(tmp_path / "mh.npz")
    procs = []
    env = dict(os.environ)
    # workers set their own device count/platform before importing jax
    env.pop("XLA_FLAGS", None)
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "scripts",
                                          "multihost_worker.py"),
             "--coordinator", f"127.0.0.1:{port}", "--num-processes", "2",
             "--process-id", str(pid), "--local-devices", "4",
             "--out", out],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost workers timed out")
        logs.append(stdout)
    for p, lg in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{lg[-4000:]}"
    assert os.path.exists(out + ".done"), logs[0][-2000:]

    import jax
    got = np.load(out)
    np.testing.assert_allclose(got["user_emb"],
                               np.asarray(ref.mf.user_emb),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got["item_emb"],
                               np.asarray(ref.mf.item_emb),
                               rtol=2e-4, atol=2e-5)
    for i, leaf in enumerate(jax.tree.leaves(ref.theta)):
        np.testing.assert_allclose(got[f"theta_{i}"], np.asarray(leaf),
                                   rtol=2e-4, atol=2e-5)

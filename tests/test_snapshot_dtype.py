"""bf16 snapshot storage (``SMLConfig.snapshot_dtype``) parity.

The last/hat snapshot tables are pure storage between phases: every consumer
(epoch gathers, full-table refresh) upcasts to f32 before any math. So the
only deviation bf16 storage can introduce is the rounding of the stored
values themselves (~3 decimal digits), bounded here over a full two-phase
SML trajectory against f32 snapshots.
"""

import jax.numpy as jnp
import numpy as np

from sml_tpu.config import SMLConfig, TransferConfig
from sml_tpu.train.engine import SMLEngine

N_USERS, N_ITEMS, DIM = 320, 160, 16


def _cfg(snapshot_dtype):
    return SMLConfig(mf_batch_size=128, tr_batch_size=64, eval_batch_size=128,
                     latent_dim=DIM, multi_num=2,
                     transfer=TransferConfig(latent_dim=DIM, fc_hidden=64),
                     mf_sample="alone", tr_sample_type="alone",
                     snapshot_dtype=snapshot_dtype)


def _run(snapshot_dtype, set_t, set_tt):
    engine = SMLEngine(_cfg(snapshot_dtype), N_USERS, N_ITEMS)
    state = engine.init_state()
    for _ in range(2):
        state = engine.snapshot_last(state)
        state, _ = engine.inner_epoch(state, *engine.prep_inner(set_t))
        state = engine.snapshot_hat(state)
        state = engine.refresh(state)
        state, _ = engine.outer_epoch(state, *engine.prep_outer(set_tt))
        state = engine.refresh(state)
    return engine, state


def test_bf16_snapshots_track_f32(rng):
    set_t = np.unique(np.stack([rng.integers(0, N_USERS, 700),
                                rng.integers(0, N_ITEMS, 700)], 1), axis=0)
    set_tt = np.unique(np.stack([rng.integers(0, N_USERS, 700),
                                 rng.integers(0, N_ITEMS, 700)], 1), axis=0)

    _, ref = _run("float32", set_t, set_tt)
    engine, got = _run("bfloat16", set_t, set_tt)

    assert got.last_user.dtype == jnp.bfloat16
    assert got.hat_item.dtype == jnp.bfloat16
    # MF tables stay f32; trajectory deviation bounded by snapshot rounding
    assert got.mf.user_emb.dtype == jnp.float32
    du = np.max(np.abs(np.asarray(got.mf.user_emb)
                       - np.asarray(ref.mf.user_emb)))
    di = np.max(np.abs(np.asarray(got.mf.item_emb)
                       - np.asarray(ref.mf.item_emb)))
    scale = float(np.max(np.abs(np.asarray(ref.mf.user_emb))))
    assert du < 0.02 * scale and di < 0.02 * scale, (du, di, scale)

    # eval metrics agree (ranking is robust to 1e-2-relative table noise)
    rows = np.stack([rng.integers(0, N_USERS, 200),
                     rng.integers(0, N_ITEMS, 200)] +
                    [rng.integers(0, N_ITEMS, 200) for _ in range(49)], axis=1)
    m_ref = _run("float32", set_t, set_tt)[0].evaluate(ref.mf, rows)
    m_got = engine.evaluate(got.mf, rows)
    for k in m_ref:
        assert abs(m_ref[k]["recall"] - m_got[k]["recall"]) < 0.05

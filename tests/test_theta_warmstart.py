"""θ identity warm-start (``SMLConfig.theta_warmstart_steps``).

A fresh conv tower maps table rows to ~17% of their norm, so the first
``updata`` refresh wipes pretrained tables and (in bad seeds, BOTH
frameworks — scripts/saddle_experiment.py) outer training falls into the
zero-score BCE saddle. The warm-start fits Θ_side(x, x) ≈ x on pretrained
rows so the refresh is value-preserving from phase 0.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sml_tpu.config import SMLConfig, TransferConfig
from sml_tpu.models.mf import MFParams
from sml_tpu.models.transfer import apply_rows
from sml_tpu.train.engine import SMLEngine

N_USERS, N_ITEMS, DIM = 320, 160, 16


def _cfg(steps):
    return SMLConfig(mf_batch_size=128, tr_batch_size=64, eval_batch_size=128,
                     latent_dim=DIM, multi_num=1,
                     transfer=TransferConfig(latent_dim=DIM, fc_hidden=64),
                     mf_sample="alone", tr_sample_type="alone",
                     theta_warmstart_steps=steps,
                     theta_warmstart_rows=256)


def _pretrained(rng):
    return MFParams(
        user_emb=jnp.asarray(rng.normal(0, 0.15, (N_USERS, DIM)),
                             jnp.float32),
        item_emb=jnp.asarray(rng.normal(0, 0.15, (N_ITEMS, DIM)),
                             jnp.float32),
        user_bias=jnp.zeros((N_USERS, 1)),
        item_bias=jnp.zeros((N_ITEMS, 1)))


def test_warmstart_theta_is_near_identity(rng):
    pre = _pretrained(rng)

    def refresh_ratio(steps):
        engine = SMLEngine(_cfg(steps), N_USERS, N_ITEMS)
        state = engine.init_state(pretrained_mf=pre)
        out = apply_rows(state.theta, engine.cfg.transfer, "item",
                         state.mf.item_emb, state.mf.item_emb)
        in_n = float(jnp.mean(jnp.linalg.norm(state.mf.item_emb, axis=-1)))
        out_n = float(jnp.mean(jnp.linalg.norm(out, axis=-1)))
        err = float(jnp.mean(jnp.linalg.norm(out - state.mf.item_emb,
                                             axis=-1)))
        return out_n / in_n, err / in_n

    cold_ratio, cold_err = refresh_ratio(0)
    warm_ratio, warm_err = refresh_ratio(400)
    # cold init shrinks rows (the ratio worsens with width: ~0.17 at the
    # production d=64/H=512, ~0.6 at this test's d=16/H=64); warm start
    # preserves
    assert cold_ratio < 0.8, cold_ratio
    assert 0.8 < warm_ratio < 1.2, warm_ratio
    assert warm_err < 0.35, (warm_err, cold_err)
    assert warm_err < cold_err / 2


def test_warmstart_changes_only_theta(rng):
    pre = _pretrained(rng)
    e0 = SMLEngine(_cfg(0), N_USERS, N_ITEMS)
    e1 = SMLEngine(_cfg(100), N_USERS, N_ITEMS)
    s0 = e0.init_state(pretrained_mf=pre)
    s1 = e1.init_state(pretrained_mf=pre)
    np.testing.assert_array_equal(np.asarray(s0.mf.user_emb),
                                  np.asarray(s1.mf.user_emb))
    np.testing.assert_array_equal(np.asarray(s0.hat_item),
                                  np.asarray(s1.hat_item))
    # theta did move
    d = max(float(jnp.max(jnp.abs(a - b))) for a, b in
            zip(jax.tree.leaves(s0.theta), jax.tree.leaves(s1.theta)))
    assert d > 1e-3


def test_skip_warmstart_on_resume(rng):
    """Checkpoint resume passes skip_theta_warmstart=True: the expensive
    identity fit is elided (theta stays at cold init) but the run key
    stream is unchanged, so the restored state's trajectory is identical."""
    pre = _pretrained(rng)
    eng = SMLEngine(_cfg(100), N_USERS, N_ITEMS)
    warm = eng.init_state(pretrained_mf=pre)
    skipped = eng.init_state(pretrained_mf=pre, skip_theta_warmstart=True)
    cold = SMLEngine(_cfg(0), N_USERS, N_ITEMS).init_state(pretrained_mf=pre)
    # skipping leaves theta at the cold init value
    for a, b in zip(jax.tree.leaves(skipped.theta), jax.tree.leaves(cold.theta)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # but the run key stream matches the warm-started engine's
    np.testing.assert_array_equal(np.asarray(skipped.key),
                                  np.asarray(warm.key))

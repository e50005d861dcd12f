"""Why does the Θ identity warm-start not prevent the saddle at Yelp scale?

Measures, per seed, the refresh output/input norm ratio in three regimes:
  diag  — Θ(pre, pre): the exact distribution warm-start trained on
  offd  — Θ(pre, hat): the REAL phase-0 refresh input, where hat is the
          pretrained table after one true inner epoch on period 10
  late  — Θ(hat, hat): the diagonal again but at the drifted point

A ratio « 1 in `offd` while `diag`≈1 means the identity fit does not
generalize off the diagonal, i.e. the warm-start pair distribution is the
bug (fix: train on (x, y) pairs with y = x + realistic inner-epoch drift).

    python scripts/warmstart_probe.py --root /tmp/yelp_scale_r2 --platform cpu
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/yelp_scale_r2")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--seeds", default="7,123,2000,2001,2002")
    ap.add_argument("--warmstart", type=int, default=400)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from sml_tpu.config import SMLConfig, TransferConfig
    from sml_tpu.models.mf import MFParams
    from sml_tpu.models import transfer as tr
    from sml_tpu.train.engine import SMLEngine

    pre = np.load(os.path.join(args.root, "pre.npz"))
    U, d = pre["user_emb"].shape
    I = pre["item_emb"].shape[0]
    mf = MFParams(user_emb=jnp.asarray(pre["user_emb"]),
                  item_emb=jnp.asarray(pre["item_emb"]),
                  user_bias=jnp.zeros((U, 1)), item_bias=jnp.zeros((I, 1)))
    set_t = np.load(os.path.join(args.root, "synth", "train", "10.npy"))[:, :2]
    log(f"tables {U}x{d} / {I}x{d}; period-10 interactions {set_t.shape[0]}")

    def rnorm(x):
        return float(jnp.sqrt(jnp.mean(jnp.sum(x ** 2, -1))))

    for ws in (0, args.warmstart):
        for seed in [int(s) for s in args.seeds.split(",")]:
            cfg = SMLConfig(latent_dim=d, transfer=TransferConfig(latent_dim=d),
                            mf_sample="alone", tr_sample_type="alone",
                            theta_warmstart_steps=ws, seed=seed)
            eng = SMLEngine(cfg, U, I)
            state = eng.init_state(pretrained_mf=mf)
            state = eng.snapshot_last(state)
            padded, idx = eng.prep_inner(set_t)
            state, _ = eng.inner_epoch(state, padded, idx)
            state = eng.snapshot_hat(state)

            pre_i, hat_i = state.last_item, state.hat_item
            diag = tr.apply_rows(state.theta, cfg.transfer, "item",
                                 pre_i, pre_i)
            offd = tr.apply_rows(state.theta, cfg.transfer, "item",
                                 pre_i, hat_i)
            late = tr.apply_rows(state.theta, cfg.transfer, "item",
                                 hat_i, hat_i)
            n_pre, n_hat = rnorm(pre_i), rnorm(hat_i)
            print(json.dumps({
                "seed": seed, "warmstart": ws,
                "pre_norm": round(n_pre, 3), "hat_norm": round(n_hat, 3),
                "hat_drift": round(rnorm(hat_i - pre_i) / n_pre, 3),
                "diag_ratio": round(rnorm(diag) / n_pre, 3),
                "offd_ratio": round(rnorm(offd) / n_hat, 3),
                "late_ratio": round(rnorm(late) / n_hat, 3),
            }), flush=True)


if __name__ == "__main__":
    main()

"""Measure the init-time output scale of the transfer network Θ, torch vs ours.

Diagnosis tool for the seed-variance gap (VERDICT item 1): in bad run seeds
the freshly-initialized item tower maps the pretrained item table to rows of
near-zero norm at the first ``updata`` refresh, wiping the table. This script
quantifies how often that happens at init under (a) the reference's torch
init (``model/conv_transfer.py:18-50`` default Conv2d/Linear init) and
(b) our JAX init (``sml_tpu/models/transfer.py:init_transfer``), applied to
the SAME real pretrained tables.

Usage:
  python scripts/theta_init_scale.py --pre /tmp/yelp_scale/pre.npz --seeds 200
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def torch_norms(x_last: np.ndarray, x_hat: np.ndarray, seeds, d: int) -> list[float]:
    import torch
    sys.path.insert(0, "/root/reference")
    from model.conv_transfer import ConvTransfer_com

    xt = torch.from_numpy(x_last)
    xh = torch.from_numpy(x_hat)
    out = []
    for s in seeds:
        torch.manual_seed(int(s))
        net = ConvTransfer_com(d, d)
        with torch.no_grad():
            y = net(xt, xh, "item")
        out.append(float(y.norm(dim=-1).mean()))
    return out


def jax_norms(x_last: np.ndarray, x_hat: np.ndarray, seeds, d: int) -> list[float]:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from sml_tpu.config import TransferConfig
    from sml_tpu.models.transfer import apply_rows, init_transfer

    cfg = TransferConfig(latent_dim=d)
    xt = jnp.asarray(x_last)
    xh = jnp.asarray(x_hat)

    @jax.jit
    def run(key):
        theta = init_transfer(key, cfg, jnp.float32)
        y = apply_rows(theta, cfg, "item", xt, xh)
        return jnp.mean(jnp.linalg.norm(y, axis=-1))

    return [float(run(jax.random.PRNGKey(int(s)))) for s in seeds]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pre", default="/tmp/yelp_scale/pre.npz")
    ap.add_argument("--seeds", type=int, default=200)
    ap.add_argument("--rows", type=int, default=4096)
    ap.add_argument("--out", default="/tmp/theta_init_scale.json")
    args = ap.parse_args()

    pre = np.load(args.pre)
    item = pre["item_emb"] if "item_emb" in pre else pre[pre.files[1]]
    d = item.shape[1]
    rng = np.random.default_rng(0)
    idx = rng.choice(item.shape[0], size=min(args.rows, item.shape[0]), replace=False)
    # First-period regime: last == hat == pretrained rows (save 'last' then
    # inner-train barely moves tables in epoch terms; scale is what matters).
    x = item[idx].astype(np.float32)
    in_norm = float(np.linalg.norm(x, axis=-1).mean())

    seeds = list(range(args.seeds))
    tn = torch_norms(x, x, seeds, d)
    jn = jax_norms(x, x, seeds, d)

    def stats(v):
        a = np.array(v)
        return {
            "mean": float(a.mean()), "std": float(a.std()),
            "min": float(a.min()), "p5": float(np.percentile(a, 5)),
            "p50": float(np.percentile(a, 50)), "max": float(a.max()),
            "frac_below_10pct_input": float((a < 0.1 * in_norm).mean()),
            "frac_below_25pct_input": float((a < 0.25 * in_norm).mean()),
        }

    res = {"input_row_norm": in_norm, "torch": stats(tn), "jax": stats(jn)}
    print(json.dumps(res, indent=2))
    Path(args.out).write_text(json.dumps({"res": res, "torch": tn, "jax": jn}))


if __name__ == "__main__":
    main()

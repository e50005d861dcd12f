"""Base-MF pretraining.

The reference *loads* a pretrained MF checkpoint for SML
(``model/transfer.py:322-325``); the training protocol that produced it is
``SPMF.base_train`` (``model/baseline.py:161-223``): plain BCE-MF with
per-side L2 on the cumulative history up to the pretrain period, Adam,
eval every 2 epochs on the pretrain period's test rows, keep the best
recall@20 state, stop after ``patience`` best-less eval rounds.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sml_tpu.config import DataSpec, PretrainConfig
from sml_tpu.data.feeder import StreamingPeriods
from sml_tpu.eval.evaluator import make_eval_fn
from sml_tpu.models.mf import MFParams, init_mf
from sml_tpu.ops.batching import pad_rows
from sml_tpu.ops.sampling import build_period_index
from sml_tpu.train.optim import torch_adam
from sml_tpu.train.steps import make_plain_mf_epoch
from sml_tpu.utils.logging import MetricsLogger


def pretrain_mf(cfg: PretrainConfig, spec: DataSpec, pretrain_period: int,
                logger: Optional[MetricsLogger] = None,
                topks=(5, 10, 20)) -> Tuple[MFParams, dict]:
    """Train the base MF on ``train/0..pretrain_period-1``, early-stopping on
    recall@20 of ``test/<pretrain_period>``; returns (best_params, metrics).

    For Yelp the reference pretrains at period 29 and tests on test/29
    (``model/baseline.py:666-669``).
    """
    logger = logger or MetricsLogger(None)
    stream = StreamingPeriods(spec)
    train, test = stream.get_next(pretrain_period, mode="not_only_new")
    if train is None:
        raise ValueError(f"no data for pretrain period {pretrain_period}")

    from sml_tpu.config import resolve_fast_table_adam
    fast = resolve_fast_table_adam(None,
                                   stream.info.n_users + stream.info.n_items,
                                   cfg.batch_size)
    tx = torch_adam(cfg.lr, weight_decay=0.0)
    epoch_fn = jax.jit(
        make_plain_mf_epoch(cfg.batch_size, cfg.l2_user, cfg.l2_item, tx,
                            cfg.neg_tries,
                            fast_lr=cfg.lr if fast else None),
        donate_argnums=(0, 1))
    eval_fn = jax.jit(make_eval_fn(topks, 1024,
                                   scoring=cfg.eval_scoring))

    key = jax.random.PRNGKey(cfg.seed)
    kinit, key = jax.random.split(key)
    mf = init_mf(kinit, stream.info.n_users, stream.info.n_items,
                 cfg.latent_dim, emb_scale=cfg.emb_init_scale)
    opt = tx.init(mf)

    padded = pad_rows(train, cfg.batch_size)
    index = build_period_index(train, stream.info.n_items)
    test_padded = pad_rows(test, 1024)

    def evaluate(mfp):
        sums = eval_fn(mfp, test_padded.rows, test_padded.mask)
        n = max(test_padded.n_real, 1)
        return {k: (float(h) / n, float(nd) / n)
                for k, (h, nd) in sums.items()}

    best = {"recall20": -1.0, "params": mf, "epoch": -1}
    stale = 0
    for epoch in range(cfg.max_epochs):
        key, k = jax.random.split(key)
        mf, opt, losses = epoch_fn(mf, opt, padded.rows, padded.mask,
                                   jnp.int32(padded.n_real), k, index)
        if epoch % cfg.eval_every == 0:
            m = evaluate(mf)
            r20 = m[max(topks)][0]
            stale += 1
            if r20 > best["recall20"]:
                best = {"recall20": r20,
                        "params": jax.tree.map(lambda x: x.copy(), mf),
                        "epoch": epoch}
                stale = 0
            logger.log(kind="pretrain_eval", epoch=epoch,
                       loss=float(losses.mean()),
                       **{f"recall@{k}": v[0] for k, v in m.items()},
                       **{f"ndcg@{k}": v[1] for k, v in m.items()})
            if stale > cfg.patience:
                break

    final = evaluate(best["params"])
    metrics = {"best_epoch": best["epoch"],
               **{f"recall@{k}": v[0] for k, v in final.items()},
               **{f"ndcg@{k}": v[1] for k, v in final.items()}}
    return best["params"], metrics

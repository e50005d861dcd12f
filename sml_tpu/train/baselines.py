"""Retraining baselines: full-retrain, fine-tune, SPMF.

Capability parity with ``model/baseline.py:68-556``:

* **full-retrain** — each period, train on ALL history (``run_one_stage2``
  with ``'not_only_new'``, ``baseline.py:306-386``);
* **fine-tune** — newest period only (``'only_new'``);
* **SPMF** (streaming MF) — reservoir pool ∪ new data, sampled with a
  rank-derived softmax distribution (``run_one_stage`` + ``compute_R_W_P``,
  ``baseline.py:227-304,448-476``), classic reservoir update
  (``Reservious``, ``baseline.py:68-100``).

Loss everywhere is mean-BCE + per-side summed L2 (``baseline.py:196-198``).
The reservoir and stream bookkeeping are host-side numpy (they are stream
logic, not compute); all training/eval math runs on device.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sml_tpu.config import BaselineConfig, DataSpec
from sml_tpu.data.feeder import StreamingPeriods
from sml_tpu.data.formats import row_count
from sml_tpu.eval.evaluator import make_attributed_eval_fn, make_eval_fn
from sml_tpu.models.mf import MFParams, init_mf, score_pairs
from sml_tpu.ops.batching import pad_rows
from sml_tpu.ops.metrics import weighted_period_average
from sml_tpu.ops.sampling import PeriodIndex, build_period_index, sample_negatives
from sml_tpu.train.optim import torch_adam
from sml_tpu.train.steps import make_plain_mf_epoch
from sml_tpu.utils.logging import MetricsLogger


class Reservoir:
    """Streaming reservoir over the interaction stream
    (``model/baseline.py:68-100``): each new row is admitted with probability
    ``len/(t+i+1)`` and overwrites a uniformly random slot."""

    def __init__(self, length: int, rng: np.random.Generator):
        self.len = length
        self.pool = np.zeros((max(length, 1), 2), dtype=np.int64)
        self.pool_have = 0
        self.t = 0
        self.rng = rng

    def update(self, new_data: np.ndarray) -> None:
        if self.len == 0:
            return
        if self.pool_have < self.len:
            take = min(self.len - self.pool_have, new_data.shape[0])
            self.pool[self.pool_have:self.pool_have + take] = new_data[:take]
            self.pool_have += take
            self.t += take
            new_data = new_data[take:]
        n = new_data.shape[0]
        if n == 0:
            return
        p = self.len / (self.t + np.arange(n) + 1.0)
        admit = self.rng.random(n) < p
        selected = new_data[admit]
        slots = self.rng.integers(0, self.len, selected.shape[0])
        self.pool[slots] = selected
        self.t += n

    def init_pool(self, data: np.ndarray) -> None:
        """Fill with the most recent rows (``baseline.py:94-100``;
        ``pool_init_type=1``)."""
        if self.len == 0:
            return
        self.pool[:] = data[-self.len:]
        self.pool_have = self.len
        self.t = data.shape[0]


def rank_sampling_probs(mf: MFParams, pairs: jax.Array,
                        valid: Optional[jax.Array] = None,
                        n_real: Optional[jax.Array] = None) -> jax.Array:
    """SPMF's rank-softmax sampling distribution (``compute_R_W_P``,
    ``baseline.py:448-476``): rank all pool pairs by model score descending,
    weight ``w = exp(rank/N)``, normalize. Higher weight on *worse-ranked*
    (poorly fit) interactions.

    ``valid``/``n_real``: uniform-shape support — pad rows score ``-inf``
    (ranked after every real row, so real ranks are unchanged) and get
    weight zero; ``N`` in ``exp(rank/N)`` is the REAL count."""
    scores = score_pairs(mf, pairs[:, 0], pairs[:, 1])
    n_pad = scores.shape[0]
    if valid is not None:
        scores = jnp.where(valid, scores, -jnp.inf)
    n = jnp.float32(n_pad) if n_real is None else n_real.astype(jnp.float32)
    order = jnp.argsort(-scores)
    ranks = jnp.zeros(n_pad, dtype=jnp.float32).at[order].set(
        jnp.arange(1, n_pad + 1, dtype=jnp.float32))
    w = jnp.exp(ranks / n)
    if valid is not None:
        w = jnp.where(valid, w, 0.0)
    return w / jnp.sum(w)


def _make_spmf_epoch(batch_size: int, l2_u: float, l2_i: float, tx,
                     neg_tries: int):
    """One SPMF epoch: ``ceil(N/B)`` weighted-draw batches
    (``baseline.py:259-280``). The batch is drawn from the pool by inverse-CDF
    over the rank-softmax probabilities; negatives are rejection-sampled
    against the cumulative user history."""
    from sml_tpu.ops.losses import bce_pair_loss, l2_embedding_penalty

    def loss_fn(mfp, u, i, j):
        pos = score_pairs(mfp, u, i)
        neg = score_pairs(mfp, u, j)
        ones = jnp.ones_like(pos)
        xu, xi, xj = mfp.user_emb[u], mfp.item_emb[i], mfp.item_emb[j]
        return bce_pair_loss(pos, neg, ones) \
            + l2_u * l2_embedding_penalty(ones, xu) \
            + l2_i * l2_embedding_penalty(ones, xi, xj)

    def epoch(mfp, opt, pairs, cdf, n_batches, key, hist_index: PeriodIndex):
        def body(c, k):
            mfp, opt = c
            k1, k2 = jax.random.split(k)
            u01 = jax.random.uniform(k1, (batch_size,))
            idx = jnp.searchsorted(cdf, u01)
            idx = jnp.clip(idx, 0, pairs.shape[0] - 1)
            u = pairs[idx, 0]
            i = pairs[idx, 1]
            j = sample_negatives(hist_index, u, k2, neg_tries)
            loss, grads = jax.value_and_grad(loss_fn)(mfp, u, i, j)
            updates, opt = tx.update(grads, opt, mfp)
            mfp = optax.apply_updates(mfp, updates)
            return (mfp, opt), loss

        keys = jax.random.split(key, n_batches)
        (mfp, opt), losses = jax.lax.scan(body, (mfp, opt), keys)
        return mfp, opt, losses

    return epoch


class BaselineDriver:
    def __init__(self, cfg: BaselineConfig, spec: DataSpec,
                 pretrained: Optional[MFParams] = None,
                 logger: Optional[MetricsLogger] = None):
        self.cfg = cfg
        self.stream = StreamingPeriods(spec)
        self.logger = logger or MetricsLogger(None)
        info = self.stream.info
        self.rng = np.random.default_rng(cfg.seed)
        self.reservoir = Reservoir(cfg.pool_size, self.rng)

        from sml_tpu.config import resolve_fast_table_adam
        fast = resolve_fast_table_adam(None, info.n_users + info.n_items,
                                       cfg.batch_size)
        self.tx = torch_adam(cfg.lr, weight_decay=0.0)
        self._epoch = jax.jit(
            make_plain_mf_epoch(cfg.batch_size, cfg.l2_user, cfg.l2_item,
                                self.tx, cfg.neg_tries,
                                fast_lr=cfg.lr if fast else None),
            donate_argnums=(0, 1))
        self._spmf_epoch = jax.jit(
            _make_spmf_epoch(cfg.batch_size, cfg.l2_user, cfg.l2_item,
                             self.tx, cfg.neg_tries),
            donate_argnums=(0, 1), static_argnames=("n_batches",))
        self._eval = jax.jit(make_eval_fn(cfg.topk, cfg.eval_batch_size,
                                          scoring=cfg.eval_scoring))
        self._eval_attr = jax.jit(
            make_attributed_eval_fn(cfg.topk, cfg.eval_batch_size,
                                    scoring=cfg.eval_scoring))
        self._probs = jax.jit(rank_sampling_probs)

        # new-entity masks for hit attribution (baseline.py:120-121,419-421)
        self._is_new_user = jnp.zeros(info.n_users, jnp.float32).at[
            jnp.asarray(self.stream.test_new_user, jnp.int32)].set(1.0) \
            if self.stream.test_new_user.size else None
        self._is_new_item = jnp.zeros(info.n_items, jnp.float32).at[
            jnp.asarray(self.stream.test_new_item, jnp.int32)].set(1.0) \
            if self.stream.test_new_item.size else None

        key = jax.random.PRNGKey(cfg.seed)
        self._key, kinit = jax.random.split(key)
        if pretrained is not None:
            # deep-copy: epochs donate self.mf, which would otherwise
            # invalidate the caller's arrays
            self.mf = jax.tree.map(lambda x: x.copy(), pretrained)
        else:
            self.mf = init_mf(kinit, info.n_users, info.n_items,
                              cfg.latent_dim,
                              emb_scale=cfg.emb_init_scale)
        self.opt = self.tx.init(self.mf)

        # cumulative item catalog + user history for SPMF's negative sampler
        # (baseline.py:237,478-487)
        self._hist_pairs: List[np.ndarray] = []

        # Sweep-wide shape bounds (npy headers only) -> uniform padded
        # shapes, so every period reuses ONE compiled program per op
        # instead of recompiling for each period's row count — at Yelp
        # scale the per-period shape zoo cost full-retrain ~10 remote
        # compiles of the epoch scan (VERDICT r4 Weak #6). Skipped tail
        # batches are lax.cond no-ops.
        self._bounds = self._shape_bounds()
        # final per-period test metrics resolve in ONE host fetch at run
        # end (blocking float() per period paid the tunnel's ~1 s
        # readiness poll each time); early-stop evals still block — their
        # values feed stopping decisions
        self._pending: List[tuple] = []

        self.recall: List[List[float]] = []
        self.ndcg: List[List[float]] = []
        self.test_counts: List[int] = []
        self.hit_new_user: List[List[float]] = []
        self.hit_new_item: List[List[float]] = []

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _shape_bounds(self) -> Dict[str, int]:
        """Sweep-wide max row counts from npy headers: ``train`` covers the
        largest pool any period trains on (cumulative history for full;
        one period for fine; reservoir + one period for spmf), ``eval``
        the largest test set."""
        spec, info = self.stream.spec, self.stream.info
        counts = []
        for p in range(spec.num_periods):
            c = row_count(spec.path, "train", p)
            if c is not None:
                counts.append(c)
        per_period = max(counts, default=0)
        if self.cfg.method == "full":
            train = sum(counts)
        elif self.cfg.method == "spmf":
            train = min(self.cfg.pool_size, sum(counts)) + per_period
        else:
            train = per_period
        evals = [row_count(spec.path, "test", p)
                 for p in range(spec.num_periods)]
        return {"train": train, "hist": sum(counts),
                "eval": max((c for c in evals if c is not None), default=0)}

    def _pad_eval(self, test_rows: np.ndarray):
        """Pad + upload an eval set ONCE per period (sweep-wide shape);
        early-stop evals and the final metrics reuse the device buffers
        instead of re-uploading (rows, 1001) ids per eval call."""
        return pad_rows(test_rows, self.cfg.eval_batch_size,
                        pad_to=self._bounds["eval"])

    def evaluate(self, test_rows) -> Dict[int, Tuple[float, float]]:
        padded = (test_rows if hasattr(test_rows, "n_real")
                  else self._pad_eval(test_rows))
        sums = self._eval(self.mf, padded.rows, padded.mask)
        n = max(padded.n_real, 1)
        return {k: (float(h) / n, float(nd) / n)
                for k, (h, nd) in sums.items()}

    def evaluate_attributed(self, test_rows, deferred: bool = False):
        """Eval + hit attribution on new users/items, normalized by the test
        count like the reference (``baseline.py:434-443``). Returns None if
        the dataset ships no new-entity id files. ``deferred``: return the
        raw device tree + n instead of fetching (resolved at run end)."""
        if self._is_new_user is None or self._is_new_item is None:
            return None
        padded = (test_rows if hasattr(test_rows, "n_real")
                  else self._pad_eval(test_rows))
        out = self._eval_attr(self.mf, padded.rows, padded.mask,
                              self._is_new_user, self._is_new_item)
        n = max(padded.n_real, 1)
        if deferred:
            return out, n
        return self._resolve_attr(jax.device_get(out), n)

    @staticmethod
    def _resolve_attr(out, n):
        return {
            "base": {k: (float(h) / n, float(nd) / n)
                     for k, (h, nd) in out["base"].items()},
            "hit_new_user": {k: float(v) / n
                             for k, v in out["hit_new_user"].items()},
            "hit_new_item": {k: float(v) / n
                             for k, v in out["hit_new_item"].items()},
            "buckets_at_max_k": [float(x) for x in out["buckets_at_max_k"]],
        }

    # ------------------------------------------------------------------ modes
    @property
    def _early_stop(self) -> bool:
        """The reference breaks epoch loops early only when
        ``pool_init_type == 1`` (its news configuration,
        ``baseline.py:294-295,374-375``); ``early_stop`` forces it on for
        any pool type."""
        return self.cfg.early_stop or self.cfg.pool_init_type == 1

    def _recall_at_maxk(self, test: np.ndarray) -> float:
        k = max(self.cfg.topk)
        return self.evaluate(test)[k][0]

    def _train_offline(self, train_data: np.ndarray,
                       test=None) -> None:
        """full-retrain / fine-tune epochs (``run_one_stage2``), with the
        reference's early stop: eval recall@20 every 5 epochs, break after
        >5 epochs without a new best (``baseline.py:366-375``).

        ``test`` may be a pre-uploaded ``PaddedRows`` (one upload per
        period). Train rows and the sampling index pad to the sweep-wide
        bound so every period runs the same compiled epoch."""
        padded = pad_rows(train_data, self.cfg.batch_size,
                          pad_to=self._bounds["train"])
        index = build_period_index(train_data, self.stream.info.n_items,
                                   min_rows=self._bounds["train"])
        best20, not_chang = 0.0, 0
        for epoch in range(self.cfg.epochs):
            self.mf, self.opt, _ = self._epoch(
                self.mf, self.opt, padded.rows, padded.mask,
                jnp.int32(padded.n_real), self._next_key(), index)
            if self._early_stop and test is not None:
                not_chang += 1
                if epoch % 5 == 0:
                    r20 = self._recall_at_maxk(test)
                    if r20 > best20:
                        best20, not_chang = r20, 0
                    if not_chang > 5:
                        break

    def _train_spmf(self, pool_data: np.ndarray,
                    test=None) -> None:
        """SPMF epochs over reservoir ∪ new data with rank-softmax draws.
        Early stop evals every epoch and breaks after 5 without improvement
        (``baseline.py:285-295``).

        Uniform shapes: the pool pads to the sweep-wide bound by REPEATING
        its last row with sampling weight zero — real draws are identical
        (pads rank after every real row and carry w=0; the inverse-CDF
        boundary case u >= cdf[-1] selects a pad, which IS the last real
        row, exactly what the unpadded clip picked). The history index
        floors to the cumulative bound (``min_rows``). ``n_batches`` stays
        the reference's exact ``round(N/B)`` — it is trajectory semantics."""
        hist = np.concatenate(self._hist_pairs, axis=0)
        hist_index = build_period_index(hist, self.stream.info.n_items,
                                        min_rows=self._bounds["hist"])
        n_real = pool_data.shape[0]
        n_pad = -(-max(n_real, self._bounds["train"]) // 1024) * 1024
        pool_padded = np.concatenate(
            [pool_data[:, :2],
             np.repeat(pool_data[-1:, :2], n_pad - n_real, axis=0)], axis=0)
        pairs = jnp.asarray(pool_padded, dtype=jnp.int32)
        valid = jnp.arange(n_pad) < n_real
        n_batches = max(1, round(n_real / self.cfg.batch_size))
        best20, not_chang = 0.0, 0
        for _ in range(self.cfg.epochs):
            p = self._probs(self.mf, pairs, valid, jnp.int32(n_real))
            cdf = jnp.cumsum(p)
            self.mf, self.opt, _ = self._spmf_epoch(
                self.mf, self.opt, pairs, cdf, n_batches=n_batches,
                key=self._next_key(), hist_index=hist_index)
            if self._early_stop and test is not None:
                not_chang += 1
                r20 = self._recall_at_maxk(test)
                if r20 > best20:
                    best20, not_chang = r20, 0
                if not_chang >= 5:
                    break

    # ---------------------------------------------------------------- periods
    def warm_reservoir(self, period: int) -> None:
        """``base_train_not_train`` (``baseline.py:149-156``): seed the
        reservoir with cumulative data before the first SPMF period."""
        train, _ = self.stream.get_next(period, mode="not_only_new")
        if train is None:
            return
        self._hist_pairs.append(train)
        if self.cfg.pool_init_type == 1:
            self.reservoir.init_pool(train)
        else:
            self.reservoir.update(train)

    def run_one_period(self, period: int) -> bool:
        method = self.cfg.method
        mode = "not_only_new" if method == "full" else "only_new"
        train, test = self.stream.get_next(period, mode=mode)
        if train is None or test is None:
            return False
        t0 = time.time()
        self.test_counts.append(int(test.shape[0]))
        padded_test = self._pad_eval(test)   # ONE upload serves every eval

        if method == "spmf":
            self._hist_pairs.append(train)
            pool = (np.concatenate(
                [self.reservoir.pool[:self.reservoir.pool_have], train], axis=0)
                if self.reservoir.pool_have > 0 else train)
            self._train_spmf(pool, padded_test)
            self.reservoir.update(train)
        else:
            self._train_offline(train, padded_test)

        # dispatch the period's final metrics WITHOUT fetching; resolved in
        # one transfer at run end (finalize) — a blocking fetch of pending
        # compute pays the tunnel's ~1 s readiness poll per period
        attr = self.evaluate_attributed(padded_test, deferred=True)
        if attr is not None:
            self._pending.append(("attr", method, period, attr[0], attr[1],
                                  time.time() - t0))
        else:
            sums = self._eval(self.mf, padded_test.rows, padded_test.mask)
            self._pending.append(("base", method, period, sums,
                                  max(padded_test.n_real, 1),
                                  time.time() - t0))
        return True

    def finalize(self) -> None:
        """Resolve the deferred per-period metrics (one host fetch) into
        ``recall``/``ndcg``/attribution lists and the jsonl, in period
        order. Idempotent; called by :meth:`run`."""
        if not self._pending:
            return
        pending, self._pending = self._pending, []
        fetched = jax.device_get([p[3] for p in pending])
        for (kind, method, period, _, n, secs), out in zip(pending, fetched):
            extra = {}
            if kind == "attr":
                attributed = self._resolve_attr(out, n)
                metrics = attributed["base"]
                kx = max(self.cfg.topk)
                self.hit_new_user.append(
                    [attributed["hit_new_user"][k] for k in self.cfg.topk])
                self.hit_new_item.append(
                    [attributed["hit_new_item"][k] for k in self.cfg.topk])
                extra = {f"hit_new_user@{kx}": attributed["hit_new_user"][kx],
                         f"hit_new_item@{kx}": attributed["hit_new_item"][kx]}
            else:
                metrics = {k: (float(h) / n, float(nd) / n)
                           for k, (h, nd) in out.items()}
            self.recall.append([metrics[k][0] for k in self.cfg.topk])
            self.ndcg.append([metrics[k][1] for k in self.cfg.topk])
            self.logger.log(
                kind="baseline_test", method=method, period=period,
                seconds=secs,
                **{f"recall@{k}": metrics[k][0] for k in self.cfg.topk},
                **{f"ndcg@{k}": metrics[k][1] for k in self.cfg.topk},
                **extra)

    def run(self, max_periods: Optional[int] = None) -> Dict[str, float]:
        """Sequential sweep from ``start_period`` (``run``,
        ``baseline.py:505-556``); returns weighted val/test averages (the
        baselines' protocol keeps the final period, ``baseline.py:546``)."""
        if self.cfg.method == "spmf":
            self.warm_reservoir(self.cfg.start_period - 1)
        period = self.cfg.start_period
        done = 0
        while max_periods is None or done < max_periods:
            if not self.run_one_period(period):
                break
            period += 1
            done += 1
        self.finalize()
        out: Dict[str, float] = {}
        if self.test_counts:
            rec = np.asarray(self.recall)
            ndc = np.asarray(self.ndcg)
            counts = np.asarray(self.test_counts)
            for ki, k in enumerate(self.cfg.topk):
                v, t = weighted_period_average(rec[:, ki], counts,
                                               drop_last_test=False)
                out[f"val_recall@{k}"] = float(v)
                out[f"test_recall@{k}"] = float(t)
                v, t = weighted_period_average(ndc[:, ki], counts,
                                               drop_last_test=False)
                out[f"val_ndcg@{k}"] = float(v)
                out[f"test_ndcg@{k}"] = float(t)
        return out

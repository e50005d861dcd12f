"""SML engine: compiled callables + functional state.

Assembles the jitted inner/outer epochs, the full-table refresh and the
evaluator for a fixed config, and owns the host-side data preparation
(bucketed padding, period sampling indices).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from sml_tpu.config import SMLConfig
from sml_tpu.eval.evaluator import make_eval_fn
from sml_tpu.models import transfer as transfer_mod
from sml_tpu.models.mf import MFParams, init_mf, with_tables
from sml_tpu.models.transfer import TransferParams, init_transfer
from sml_tpu.ops import eval_kernel
from sml_tpu.ops.batching import PaddedRows, pad_rows
from sml_tpu.ops.sampling import PeriodIndex, build_period_index
from sml_tpu.train.optim import torch_adam
from sml_tpu.train.steps import make_inner_epoch, make_outer_epoch


class SMLState(NamedTuple):
    """Everything that evolves across periods (``SURVEY.md`` §7 state record).

    Functional analogue of the reference's snapshot plumbing
    (``model/transfer.py:358-364,911-959``): ``last_*`` = W_{t-1},
    ``hat_*`` = W_hat_t, refreshed by ``save_MF_weight`` / ``updata``.
    """
    mf: MFParams
    theta: TransferParams
    last_user: jax.Array
    last_item: jax.Array
    hat_user: jax.Array
    hat_item: jax.Array
    mf_opt: object
    tr_opt: object
    key: jax.Array


DIAG_NAMES = ("user_norm", "item_norm", "hat_user_norm", "hat_item_norm",
              "last_user_norm", "last_item_norm", "theta_norm")


@jax.jit
def _diagnostics_jit(user, item, hat_u, hat_i, last_u, last_i, theta):
    def mean_rownorm(t):
        return jnp.mean(jnp.sum(t * t, axis=-1))

    theta_norm = optax.global_norm(theta)
    return (mean_rownorm(user), mean_rownorm(item), mean_rownorm(hat_u),
            mean_rownorm(hat_i), mean_rownorm(last_u), mean_rownorm(last_i),
            theta_norm)


def _content_key(arr: np.ndarray) -> tuple:
    """Cheap content identity for the device-upload LRU: shape + a hash of
    64 evenly-strided rows + the full element sum. Two different period
    files would have to agree on all sampled rows AND the total to collide
    — not a property real interaction data can have."""
    n = arr.shape[0]
    stride = max(1, n // 64)
    sample = np.ascontiguousarray(arr[::stride][:64])
    return (arr.shape, hash(sample.tobytes()), int(arr.sum()))


class SMLEngine:
    def __init__(self, cfg: SMLConfig, n_users: int, n_items: int):
        from sml_tpu.config import resolve_fast_table_adam
        cfg = cfg.replace(fast_table_adam=resolve_fast_table_adam(
            cfg.fast_table_adam, n_users + n_items, cfg.mf_batch_size))
        self.cfg = cfg
        self.n_users = n_users
        self.n_items = n_items
        self.mf_tx = torch_adam(cfg.mf_lr, weight_decay=0.0)
        self.tr_tx = torch_adam(cfg.tr_lr, weight_decay=cfg.tr_l2)

        self._inner = jax.jit(make_inner_epoch(cfg, self.mf_tx),
                              donate_argnums=(0, 1))
        self._outer = jax.jit(make_outer_epoch(cfg, self.tr_tx),
                              donate_argnums=(0, 1))
        # fused masked-rank eval kernel: single-device TPU only (under a
        # mesh / multihost placement the pure-XLA masked path shards
        # cleanly through GSPMD; a pallas_call would not partition)
        self._eval_pallas = jax.default_backend() == "tpu"
        # raw eval fn kept alongside its jit: the fused period/phase
        # programs inline it so in-training evals run inside one dispatch
        self._eval_fn = make_eval_fn(cfg.topk, cfg.eval_batch_size,
                                     scoring=cfg.eval_scoring,
                                     use_pallas=self._eval_pallas)
        self._eval = jax.jit(self._eval_fn)
        self._eval_attr = None   # lazily-jitted attributed evaluator
        # Build packed candidate masks (ops/eval_kernel.py) for eval sets
        # the protocol re-evaluates (val during in-training evals): the
        # masked modes remove all indexed reads from the eval hot path.
        # ~0.26 s device build per 16k-row set, amortized over up to
        # multi_num*(mf+tr epochs) evals of the same set per period.
        self._want_masks = (
            cfg.eval_scoring in ("masked", "masked_bf16")
            or (cfg.eval_scoring == "auto"
                and (cfg.eval_during_inner or cfg.eval_during_outer)
                and n_items <= cfg.eval_mask_max_items))
        self._mask_build = jax.jit(functools.partial(
            eval_kernel.build_packed_mask, n_items=n_items))
        self._refresh_impl = functools.partial(
            transfer_mod.apply_tables, cfg=cfg.transfer)
        self._refresh = jax.jit(self._refresh_impl)
        # one-dispatch SML phase (inner epochs -> hat -> refresh -> outer
        # epochs); built lazily because set_mesh can swap the refresh impl
        self._phase = None
        # one-dispatch WHOLE period (lax.scan of the phase body), keyed by
        # phase count (branch A runs multi_num, branch C multi_num - 1)
        self._period: Dict[int, object] = {}
        # row-sharded tables: set_mesh() swaps in the shard_map refresh
        # (keeps every row local; the plain blocked path all-gathers)
        self.mesh = None
        # latest sampler quality probe per block kind (log_norms diagnostics)
        self.sampler_stats: Dict[str, float] = {}
        # sweep-wide row-count bounds per stream kind ("set_t"/"set_tt"/
        # "eval"), set by the driver from the feeder's npy-header scan:
        # uniform padding floors so each op compiles ONCE per sweep
        self.shape_targets: Dict[str, int] = {}
        # content-keyed device-upload LRU: the SAME test/<p>.npy matrix is
        # shipped up to three times per sweep (period t's val = test/(t+1),
        # period t+1's now_test = the same file, and in mf_sample='all'
        # mode the training pool set_t as well). Over the axon tunnel each
        # (rows, 1001) upload is ~60 MB at tens of MB/s — the warm-sweep
        # floor — so dedup by content instead
        self._upload_cache: "Dict[tuple, PaddedRows]" = {}
        self._upload_cache_cap = 3
        # optional multi-host placement strategy
        # (``parallel.multihost.MultihostPlacement``): when set, every padded
        # batch / sampling index built here is turned into a global array so
        # the same jitted epochs span processes (property: assigning it
        # swaps the eval to the GSPMD-partitionable masked path)
        self._placement = None

    # ------------------------------------------------------------------ state
    def init_state(self, pretrained_mf: Optional[MFParams] = None,
                   skip_theta_warmstart: bool = False) -> SMLState:
        """Fresh state. ``last`` starts at zeros, ``hat`` at the (pretrained)
        tables (``model/transfer.py:358-364``); the zero ``last`` is never
        consumed because every period snapshots ``last`` first
        (``transfer.py:766``).

        ``skip_theta_warmstart`` elides the identity warm-start when the
        caller is about to overwrite the state anyway (checkpoint resume).
        """
        key = jax.random.PRNGKey(self.cfg.seed)
        kmf, ktr, krun = jax.random.split(key, 3)
        if pretrained_mf is not None:
            # deep-copy: epochs donate the state, which would otherwise
            # invalidate the caller's arrays
            mf = jax.tree.map(lambda x: x.copy(), pretrained_mf)
        else:
            mf = init_mf(kmf, self.n_users, self.n_items,
                         self.cfg.latent_dim,
                         emb_scale=self.cfg.emb_init_scale)
        if self.cfg.theta_seed is not None:
            ktr = jax.random.PRNGKey(self.cfg.theta_seed)
        theta = init_transfer(ktr, self.cfg.transfer)
        if self.cfg.theta_warmstart_steps > 0:
            # split even when skipping so the run key stream is identical
            kws, krun = jax.random.split(krun)
            if not skip_theta_warmstart:
                theta = self._theta_warmstart(theta, mf, kws)
        sdt = jnp.dtype(self.cfg.snapshot_dtype)
        return SMLState(
            mf=mf,
            theta=theta,
            last_user=jnp.zeros(mf.user_emb.shape, sdt),
            last_item=jnp.zeros(mf.item_emb.shape, sdt),
            hat_user=self._snap(mf.user_emb),
            hat_item=self._snap(mf.item_emb),
            mf_opt=self.mf_tx.init(mf),
            tr_opt=self.tr_tx.init(theta),
            key=krun,
        )

    @property
    def placement(self):
        return self._placement

    @placement.setter
    def placement(self, p) -> None:
        self._placement = p
        if p is not None:
            self._disable_eval_pallas()

    def _disable_eval_pallas(self) -> None:
        """Swap the eval jits to the pure-XLA masked path: a pallas_call
        does not partition under GSPMD, while the XLA formulation shards
        cleanly over the mesh's data axis."""
        if not self._eval_pallas:
            return
        self._eval_pallas = False
        self._eval_fn = make_eval_fn(self.cfg.topk,
                                     self.cfg.eval_batch_size,
                                     scoring=self.cfg.eval_scoring,
                                     use_pallas=False)
        self._eval = jax.jit(self._eval_fn)
        self._eval_attr = None
        self._period = {}   # rebuilt: the fused programs inline _eval_fn

    def set_mesh(self, mesh) -> None:
        """Tell the engine its tables are row-sharded over ``mesh``'s
        'model' axis: the full-table refresh switches to the shard_map
        path (:func:`sml_tpu.models.transfer.apply_tables_sharded`).
        The epoch/eval functions need no change — their gathers/scatters
        stay efficient under GSPMD."""
        self.mesh = mesh
        if mesh is not None:
            self._disable_eval_pallas()
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            self._refresh_impl = functools.partial(
                transfer_mod.apply_tables_sharded, cfg=self.cfg.transfer,
                mesh=mesh)
            self._refresh = jax.jit(self._refresh_impl)
            self._phase = None   # rebuild with the shard_map refresh
            self._period = {}

    def init_state_sharded(self, mesh, pretrained_mf: Optional[MFParams]
                           = None, skip_theta_warmstart: bool = False
                           ) -> SMLState:
        """:meth:`init_state`, but every leaf is born row-sharded on
        ``mesh`` — no unsharded materialization.

        At 50M users the f32 state is tens of GB; the
        ``init_state() + shard_state()`` path transiently holds BOTH the
        unsharded and the sharded copy (it OOM-killed the 50M/5M d=16
        virtual-mesh run at 98 GB on a 125 GB host). Here the zero
        snapshots, Adam moments and fresh tables are allocated by a
        jitted builder with ``out_shardings``, so each device only ever
        holds its shard; pretrained tables go host-numpy → row shards
        directly via ``device_put``.

        Key-stream identical to :meth:`init_state` (same splits in the
        same order), so sharded and single-device runs stay comparable.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P
        from sml_tpu.parallel.sharding import state_shardings

        if pretrained_mf is not None:
            row = NamedSharding(mesh, P("model"))
            repl = NamedSharding(mesh, P())

            def place(x):
                x = np.asarray(x)
                sh = row if (x.ndim >= 1
                             and x.shape[0] in (self.n_users, self.n_items)
                             and x.shape[0] % mesh.shape["model"] == 0) \
                    else repl
                return jax.device_put(x, sh)

            mf_in = jax.tree.map(place, pretrained_mf)
        else:
            mf_in = None

        def build(mf):
            key = jax.random.PRNGKey(self.cfg.seed)
            kmf, ktr, krun = jax.random.split(key, 3)
            if mf is None:
                mf = init_mf(kmf, self.n_users, self.n_items,
                             self.cfg.latent_dim,
                             emb_scale=self.cfg.emb_init_scale)
            if self.cfg.theta_seed is not None:
                ktr = jax.random.PRNGKey(self.cfg.theta_seed)
            theta = init_transfer(ktr, self.cfg.transfer)
            if self.cfg.theta_warmstart_steps > 0:
                _, krun = jax.random.split(krun)
            sdt = jnp.dtype(self.cfg.snapshot_dtype)
            return SMLState(
                mf=mf,
                theta=theta,
                last_user=jnp.zeros(mf.user_emb.shape, sdt),
                last_item=jnp.zeros(mf.item_emb.shape, sdt),
                hat_user=mf.user_emb.astype(sdt),
                hat_item=mf.item_emb.astype(sdt),
                mf_opt=self.mf_tx.init(mf),
                tr_opt=self.tr_tx.init(theta),
                key=krun,
            )

        shapes = jax.eval_shape(build, mf_in)
        outs = state_shardings(shapes, mesh, self.n_users, self.n_items)
        state = jax.jit(build, out_shardings=outs)(mf_in)
        self.set_mesh(mesh)
        if self.cfg.theta_warmstart_steps > 0 and not skip_theta_warmstart:
            # same kws derivation as init_state: kws = first split of krun
            _, _, krun = jax.random.split(jax.random.PRNGKey(self.cfg.seed))
            kws, _ = jax.random.split(krun)
            theta = self._theta_warmstart(state.theta, state.mf, kws)
            state = state._replace(theta=theta)
        return state

    def _theta_warmstart(self, theta: TransferParams, mf: MFParams,
                         key: jax.Array,
                         steps: Optional[int] = None) -> TransferParams:
        """Fit Θ_side(x, x) ≈ x on pretrained-table rows (see
        ``SMLConfig.theta_warmstart_steps``). At every period start
        ``last == current tables``, so the identity is the value-preserving
        point of the refresh ``updata`` (``transfer.py:884-902``).

        Off by default: the medium-scale seed study (seedvar_r2.json)
        found it trades ~9% of mean recall@20 for the variance it removes
        (ws400 mean 0.2246/std 0.0054 vs no-ws 0.2469/std 0.0154, ref
        0.2429/std 0.0161) — plain SML already matches the reference's
        seed spread, so the stabilizer is net-negative on quality."""
        cfg = self.cfg
        tx = torch_adam(cfg.theta_warmstart_lr)
        n_rows = cfg.theta_warmstart_rows
        n_steps = cfg.theta_warmstart_steps if steps is None else steps

        def loss_fn(th, xu, xi):
            pu = transfer_mod.apply_rows(th, cfg.transfer, "user", xu, xu)
            pi = transfer_mod.apply_rows(th, cfg.transfer, "item", xi, xi)
            return (jnp.mean(jnp.sum((pu - xu) ** 2, -1))
                    + jnp.mean(jnp.sum((pi - xi) ** 2, -1)))

        def step(carry, k):
            th, opt = carry
            ku, ki = jax.random.split(k)
            xu = mf.user_emb[jax.random.randint(
                ku, (n_rows,), 0, mf.user_emb.shape[0])]
            xi = mf.item_emb[jax.random.randint(
                ki, (n_rows,), 0, mf.item_emb.shape[0])]
            loss, grads = jax.value_and_grad(loss_fn)(th, xu, xi)
            updates, opt = tx.update(grads, opt, th)
            return (optax.apply_updates(th, updates), opt), loss

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(th, key):
            keys = jax.random.split(key, n_steps)
            (th, _), losses = jax.lax.scan(step, (th, tx.init(th)), keys)
            return th, losses

        theta, losses = run(theta, key)
        self.sampler_stats["theta_warmstart_final_loss"] = \
            float(losses[-1])
        return theta

    def reinit_theta(self, state: SMLState, salt: int,
                     warmstart: bool = False) -> SMLState:
        """Fresh Θ init (and optimizer moments) from a salted fold of the
        run's θ key — the saddle guard's re-roll. The first-period stall is
        a property of the (θ-init, stream) PAIR: for some θ draws every
        stream stalls (seed-2001 retry diagnostics, yelp_scale_r2.json), so
        retrying with a new stream alone cannot escape. ``warmstart=True``
        (the guard's last-retry escalation,
        ``SMLConfig.saddle_escalate_warmstart``) additionally θ-identity
        warm-starts the re-rolled init so the final attempt cannot start
        pinned at the zero-score saddle."""
        key = jax.random.PRNGKey(self.cfg.seed)
        _, ktr, _ = jax.random.split(key, 3)
        if self.cfg.theta_seed is not None:
            ktr = jax.random.PRNGKey(self.cfg.theta_seed)
        ktr = jax.random.fold_in(ktr, 104729 + salt)
        theta = init_transfer(ktr, self.cfg.transfer)
        steps = self.cfg.theta_warmstart_steps
        if warmstart:
            steps = max(steps, self.cfg.saddle_warmstart_steps)
        if steps > 0:
            theta = self._theta_warmstart(theta, state.mf,
                                          jax.random.fold_in(ktr, 1),
                                          steps=steps)
        return state._replace(theta=theta, tr_opt=self.tr_tx.init(theta))

    def _next_key(self, state: SMLState) -> Tuple[SMLState, jax.Array]:
        k1, k2 = jax.random.split(state.key)
        return state._replace(key=k1), k2

    # ------------------------------------------------------------- data prep
    def prep_inner(self, set_t: np.ndarray):
        bound = self.shape_targets.get("set_t", 0)
        # mf_sample='all' trains on the SAME (rows, 1001) matrix the eval
        # path uploads (test/<t>.npy); when the driver unified the pad
        # bounds, serve it from the upload LRU instead of shipping a copy
        if (self.cfg.mf_sample == "all" and bound
                and self.cfg.upload_dedup
                and bound == self.shape_targets.get("eval")
                and self.cfg.mf_batch_size == self.cfg.eval_batch_size):
            key = _content_key(set_t)
            padded = self._upload_cache.get(key)
            if padded is None:
                padded = pad_rows(set_t, self.cfg.mf_batch_size,
                                  pad_to=bound)
                if self.placement is not None:
                    padded = self.placement.batch(padded)
                self._cache_upload(key, padded)
            return padded, None
        padded = pad_rows(set_t, self.cfg.mf_batch_size, pad_to=bound)
        index = (build_period_index(set_t, self.n_items, min_rows=bound)
                 if self.cfg.mf_sample == "alone"
                 and not self.cfg.replay_mode else None)
        self._probe_sampler("inner", index, set_t)
        return self._place(padded, index)

    def prep_outer(self, set_tt: np.ndarray):
        bound = self.shape_targets.get("set_tt", 0)
        padded = pad_rows(set_tt, self.cfg.tr_batch_size, pad_to=bound)
        index = (build_period_index(set_tt, self.n_items, min_rows=bound)
                 if self.cfg.tr_sample_type == "alone"
                 and not self.cfg.replay_mode else None)
        self._probe_sampler("outer", index, set_tt)
        return self._place(padded, index)

    def _place(self, padded, index):
        if self.placement is None:
            return padded, index
        return self.placement.batch(padded), self.placement.replicated(index)

    def _probe_sampler(self, tag: str, index, rows: np.ndarray,
                       cap: int = 8192) -> None:
        """Measure the rejection sampler's fallback / positive-leak rates on
        this period's users (log_norms diagnostics only)."""
        if index is None or not self.cfg.log_norms:
            return
        from sml_tpu.ops.sampling import sampler_stats
        users = jnp.asarray(rows[:cap, 0], dtype=jnp.int32)
        fb, leak = sampler_stats(index, users,
                                 jax.random.PRNGKey(0), self.cfg.neg_tries)
        self.sampler_stats[f"{tag}_fallback_rate"] = float(fb)
        self.sampler_stats[f"{tag}_leak_rate"] = float(leak)

    # ------------------------------------------------------------ operations
    def _snap(self, x: jax.Array) -> jax.Array:
        """Snapshot copy in ``cfg.snapshot_dtype``. Must be a NEW buffer even
        at same-dtype (the epochs donate the state; an aliased snapshot
        would be invalidated with it)."""
        sdt = jnp.dtype(self.cfg.snapshot_dtype)
        return x.astype(sdt) if sdt != x.dtype else x.copy()

    def snapshot_last(self, state: SMLState) -> SMLState:
        """``save_MF_weight('last')`` (``transfer.py:925-927``)."""
        return state._replace(last_user=self._snap(state.mf.user_emb),
                              last_item=self._snap(state.mf.item_emb))

    def snapshot_hat(self, state: SMLState) -> SMLState:
        """``save_MF_weight('hat')`` (``transfer.py:928-933``)."""
        return state._replace(hat_user=self._snap(state.mf.user_emb),
                              hat_item=self._snap(state.mf.item_emb))

    def load_hat_into_mf(self, state: SMLState) -> SMLState:
        """``load_MFbase_weight(hat)`` — the ``Load_W_hat`` option
        (``transfer.py:788-789``)."""
        dt = state.mf.user_emb.dtype

        def up(x):   # fresh f32 buffer (donation safety, see _snap)
            return x.astype(dt) if x.dtype != dt else x.copy()

        return state._replace(mf=with_tables(
            state.mf, up(state.hat_user), up(state.hat_item)))

    def refresh(self, state: SMLState) -> SMLState:
        """``updata``: MF tables <- Θ(last, hat) (``transfer.py:884-902``)."""
        new_u, new_i = self._refresh(
            theta=state.theta,
            last_user=state.last_user, hat_user=state.hat_user,
            last_item=state.last_item, hat_item=state.hat_item)
        return state._replace(mf=with_tables(state.mf, new_u, new_i))

    def inner_epoch(self, state: SMLState, padded: PaddedRows,
                    index: Optional[PeriodIndex]):
        state, k = self._next_key(state)
        mf, opt, losses = self._inner(
            state.mf, state.mf_opt, state.theta, state.last_user,
            state.last_item, padded.rows, padded.mask,
            jnp.int32(padded.n_real), k, index)
        return state._replace(mf=mf, mf_opt=opt), losses

    def outer_epoch(self, state: SMLState, padded: PaddedRows,
                    index: Optional[PeriodIndex]):
        state, k = self._next_key(state)
        theta, opt, losses = self._outer(
            state.theta, state.tr_opt, state.last_user, state.last_item,
            state.hat_user, state.hat_item, padded.rows, padded.mask,
            jnp.int32(padded.n_real), k, index)
        return state._replace(theta=theta, tr_opt=opt), losses

    def _make_phase_ops(self):
        """The traced op sequence for ONE SML phase: ``mf_epochs`` inner
        epochs -> hat snapshot -> refresh -> ``tr_epochs`` outer epochs
        (with the per-epoch refresh and the ``load_w_hat`` restore when
        configured). Same op sequence and key-stream as the
        epoch-at-a-time path (``key, k = split(key)`` exactly where
        ``_next_key`` would), so trajectories match; the last inner/outer
        per-batch loss vectors come back for the saddle guard /
        ``log_norms`` without extra dispatches.

        ``ev``: None, or ``(rows, mask, cand_mask)`` of an uploaded eval
        set — then the in-training val evals run INSIDE the phase on the
        same intermediate states the unfused driver observes
        (post-inner-epoch mf; post-outer-epoch refreshed mf), and their
        {K: (hit, ndcg)} sums come back stacked over epochs. The
        None/non-None branch resolves at trace time (jit retraces per
        pytree structure)."""
        cfg = self.cfg
        inner = make_inner_epoch(cfg, self.mf_tx)
        outer = make_outer_epoch(cfg, self.tr_tx)
        refresh = self._refresh_impl
        eval_fn = self._eval_fn
        sdt = jnp.dtype(cfg.snapshot_dtype)

        def phase_ops(state: SMLState, rows_t, mask_t, n_real_t, index_t,
                      rows_tt, mask_tt, n_real_tt, index_tt, ev):
            mf, theta = state.mf, state.theta
            mf_opt, tr_opt, key = state.mf_opt, state.tr_opt, state.key
            last_u, last_i = state.last_user, state.last_item
            inner_losses = outer_losses = jnp.zeros((0,), jnp.float32)
            inner_evals, outer_evals = [], []
            for _ in range(cfg.mf_epochs):
                key, k = jax.random.split(key)
                mf, mf_opt, inner_losses = inner(
                    mf, mf_opt, theta, last_u, last_i,
                    rows_t, mask_t, n_real_t, k, index_t)
                if ev is not None and cfg.eval_during_inner:
                    inner_evals.append(eval_fn(mf, *ev))
            hat_u = mf.user_emb.astype(sdt)
            hat_i = mf.item_emb.astype(sdt)

            def refreshed(mf, theta):
                new_u, new_i = refresh(theta=theta, last_user=last_u,
                                       hat_user=hat_u, last_item=last_i,
                                       hat_item=hat_i)
                return with_tables(mf, new_u, new_i)

            mf = refreshed(mf, theta)
            for _ in range(cfg.tr_epochs):
                key, k = jax.random.split(key)
                theta, tr_opt, outer_losses = outer(
                    theta, tr_opt, last_u, last_i, hat_u, hat_i,
                    rows_tt, mask_tt, n_real_tt, k, index_tt)
                if cfg.refresh_after_outer_epoch:
                    mf = refreshed(mf, theta)
                    if ev is not None and cfg.eval_during_outer:
                        outer_evals.append(eval_fn(mf, *ev))
            if cfg.load_w_hat:
                dt = mf.user_emb.dtype
                mf = with_tables(mf, hat_u.astype(dt), hat_i.astype(dt))
            state = state._replace(mf=mf, theta=theta, mf_opt=mf_opt,
                                   tr_opt=tr_opt, key=key,
                                   hat_user=hat_u, hat_item=hat_i)
            evals = {}
            if inner_evals:
                evals["inner"] = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *inner_evals)
            if outer_evals:
                evals["outer"] = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *outer_evals)
            return state, inner_losses, outer_losses, evals

        return phase_ops

    def _build_phase(self):
        """Compile ONE device program for a whole SML phase (see
        :meth:`_make_phase_ops`). The unfused path dispatches ~5 device
        calls per phase; over the remote-TPU tunnel each dispatch costs a
        host round-trip, and a Yelp-scale warm-up period runs
        ``multi_num`` = 10 phases."""
        return jax.jit(self._make_phase_ops(), donate_argnums=(0,))

    def phase_step(self, state: SMLState, prep_t, prep_tt):
        """One fused SML phase (see :meth:`_build_phase`); returns
        ``(state, last_inner_losses, last_outer_losses)``."""
        if self._phase is None:
            self._phase = self._build_phase()
        (pt, it), (ptt, itt) = prep_t, prep_tt
        state, il, ol, _ = self._phase(
            state, pt.rows, pt.mask, jnp.int32(pt.n_real), it,
            ptt.rows, ptt.mask, jnp.int32(ptt.n_real), itt, None)
        return state, il, ol

    def _build_period(self, length: int, want_diag: bool = False):
        """Compile a period's WHOLE phase alternation into one device
        program: ``lax.scan`` of the phase body over ``length`` slots. The
        per-phase training data is identical across a period's phases
        (the driver builds ``prep_inner``/``prep_outer`` once per period)
        — only the carried state and its RNG stream advance, so the scan
        needs no stacked inputs. With ``ev`` the in-training evals run
        inside the scan and come back with a leading (length,) dim.

        ``n_phases`` is a runtime OPERAND: slots >= n_phases are a
        ``lax.cond`` identity (state and key untouched, zero outputs), so
        ONE compiled program serves both the branch-A period (multi_num
        phases) and the branch-C tail (multi_num - 1) — previously two
        separate ~13 min cold compiles (VERDICT r4 "Next" #4). The RNG
        key only splits inside real phases, so trajectories are unchanged.

        ``want_diag``: additionally stack the 7 per-phase weight-norm
        scalars (:func:`_diagnostics_jit`) read from each phase-end state,
        so ``log_norms`` runs no longer force the unfused path."""
        phase_ops = self._make_phase_ops()

        def period(state: SMLState, n_phases, rows_t, mask_t, n_real_t,
                   index_t, rows_tt, mask_tt, n_real_tt, index_tt, ev):
            def run_phase(st):
                st, il, ol, evals = phase_ops(
                    st, rows_t, mask_t, n_real_t, index_t,
                    rows_tt, mask_tt, n_real_tt, index_tt, ev)
                diag = (_diagnostics_jit(
                    st.mf.user_emb, st.mf.item_emb, st.hat_user,
                    st.hat_item, st.last_user, st.last_item, st.theta)
                    if want_diag else ())
                return st, (il, ol, evals, diag)

            ys_aval = jax.eval_shape(lambda s: run_phase(s)[1], state)
            zeros = jax.tree.map(
                lambda a: jnp.zeros(a.shape, a.dtype), ys_aval)

            def body(st, i):
                return lax.cond(i < n_phases, run_phase,
                                lambda s: (s, zeros), st)

            state, (ils, ols, evals, diags) = lax.scan(
                body, state, jnp.arange(length))
            return state, ils, ols, evals, diags

        return jax.jit(period, donate_argnums=(0,))

    def period_step(self, state: SMLState, prep_t, prep_tt,
                    n_phases: int, val=None, want_diag: bool = False):
        """``n_phases`` fused SML phases in ONE dispatch (see
        :meth:`_build_period`); returns ``(state, evals, (ils, ols),
        diags)`` where ``evals`` is {} or the stacked in-training eval
        sums ({"inner"/"outer": {K: (hit, ndcg)}} with leading dims
        (length, epochs)) — expand them with :meth:`resolve_stacked_evals`
        (pass ``keep=n_phases`` when ``n_phases < cfg.multi_num``);
        ``ils``/``ols`` are the last inner/outer epoch's per-batch loss
        stacks (length, n_batches); ``diags`` is the per-phase weight-norm
        tuple (each (length,)) when ``want_diag``, else empty.

        ``val``: an uploaded eval set (``make_eval_set`` result) when the
        protocol's in-training evals are on; its per-epoch observations
        happen inside the fused program on the same intermediate states
        the unfused path sees."""
        length = max(self.cfg.multi_num, n_phases)
        fn = self._period.get((length, want_diag))
        if fn is None:
            fn = self._period[(length, want_diag)] = \
                self._build_period(length, want_diag)
        ev = None
        if val is not None and (self.cfg.eval_during_inner
                                or self.cfg.eval_during_outer):
            ev = (val.rows, val.mask, val.cand_mask)
        (pt, it), (ptt, itt) = prep_t, prep_tt
        state, ils, ols, evals, diags = fn(
            state, jnp.int32(n_phases),
            pt.rows, pt.mask, jnp.int32(pt.n_real), it,
            ptt.rows, ptt.mask, jnp.int32(ptt.n_real), itt, ev)
        self._mark_period_compiled()
        return state, evals, (ils, ols), diags

    # ------------------------------------------------------------ fused marker
    def _fused_marker_path(self) -> str:
        """Marker file recording that this exact fused-period program has
        been compiled once on this host (and therefore sits in the
        persistent XLA compile cache). ``fuse_period='auto'`` consults it:
        the scan program's first-ever compile is ~13 min over the remote
        TPU tunnel, vs ~112 s for the whole unfused cold sweep — so a
        fresh revision/config runs unfused until something explicitly
        compiles the fused program (``fuse_period=True``, a perf lane, or
        ``dryrun_multichip``), after which every sweep takes the fused
        path at warm-cache cost (~150 s load, then cached in-process)."""
        import hashlib
        cfg = self.cfg
        key = repr((jax.__version__, jax.default_backend(), cfg.multi_num,
                    cfg.mf_epochs, cfg.tr_epochs, cfg.mf_batch_size,
                    cfg.tr_batch_size, cfg.latent_dim, cfg.mf_sample,
                    cfg.use_bce, cfg.load_w_hat, cfg.eval_during_inner,
                    cfg.eval_during_outer, cfg.refresh_after_outer_epoch,
                    str(cfg.snapshot_dtype), self.n_users, self.n_items,
                    sorted((self.shape_targets or {}).items())))
        h = hashlib.sha1(key.encode()).hexdigest()[:16]
        root = os.environ.get("SML_TPU_CACHE_DIR",
                              os.path.expanduser("~/.cache/sml_tpu"))
        return os.path.join(root, "fused_markers", f"{h}.marker")

    def _mark_period_compiled(self) -> None:
        if getattr(self, "_period_marked", False):
            return
        self._period_marked = True
        try:
            path = self._fused_marker_path()
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "w") as fh:
                fh.write("1\n")
        except OSError:
            pass

    def fused_program_warm(self) -> bool:
        """True when the fused-period program for this config/shape set has
        been compiled before on this host (see :meth:`_fused_marker_path`)."""
        if getattr(self, "_period_marked", False):
            return True
        try:
            return os.path.exists(self._fused_marker_path())
        except OSError:
            return False

    def resolve_stacked_evals(self, bundles):
        """Expand ``period_step`` (or single fused phase) eval bundles
        into the exact per-epoch records the unfused path logs, in their
        dispatch order (per phase: inner epochs, then outer epochs).

        ``bundles``: list of ``(evals, n)`` or ``(evals, n, keep)`` —
        ``keep`` limits expansion to the first ``keep`` phase rows (the
        static-length period program zero-pads slots past its ``n_phases``
        operand; a guard-aborted fused attempt keeps only the phases the
        unfused guard would have run). Returns one record list per
        bundle. ONE host fetch covers every bundle — over the remote
        tunnel a blocking fetch of pending compute pays a ~1 s readiness
        poll, so fetching a sweep's worth of bundles one-by-one at
        finalize serializes ~n_periods polls (measured: tens of seconds
        of pure polling on the fused-period warm block)."""
        if not bundles:
            return []
        trees = [b[0] for b in bundles]
        if self.placement is not None:
            fetched_trees = [jax.tree.map(self.placement.fetch, t)
                             for t in trees]
        else:
            fetched_trees = jax.device_get(trees)

        # leading dims: (n_phases, epochs) from period_step, or (epochs,)
        # from a single fused phase
        def norm(section):
            return {k: (np.atleast_2d(h), np.atleast_2d(nd))
                    for k, (h, nd) in section.items()}

        out_all = []
        for fetched, bundle in zip(fetched_trees, bundles):
            _, n = bundle[0], bundle[1]
            keep = bundle[2] if len(bundle) > 2 else None
            sections = [(kind, norm(fetched[key]))
                        for kind, key in (("inner_eval", "inner"),
                                          ("outer_eval", "outer"))
                        if key in fetched]
            out = []
            if sections:
                n_phases = next(iter(sections[0][1].values()))[0].shape[0]
                if keep is not None:
                    n_phases = min(n_phases, keep)
                for p in range(n_phases):
                    for kind, sec in sections:
                        epochs = next(iter(sec.values()))[0].shape[1]
                        for e in range(epochs):
                            out.append((kind, e,
                                        {k: {"recall": float(h[p, e]) / n,
                                             "ndcg": float(nd[p, e]) / n}
                                         for k, (h, nd) in sec.items()}))
            out_all.append(out)
        return out_all

    def diagnostics(self, state: SMLState) -> Dict[str, float]:
        """Weight-scale scalars (reference ``need_writer``,
        ``transfer.py:780-785``): mean per-row squared norm of the MF tables
        and snapshots, plus the global L2 norm of Θ."""
        vals = _diagnostics_jit(state.mf.user_emb, state.mf.item_emb,
                                state.hat_user, state.hat_item,
                                state.last_user, state.last_item,
                                state.theta)
        if self.placement is not None:
            vals = [self.placement.fetch(v) for v in vals]
        return {n: float(v) for n, v in zip(DIAG_NAMES, vals)}

    def fetch_host(self, tree):
        """Fetch a (possibly sharded) pytree of device arrays to host
        numpy in one transfer."""
        if self.placement is not None:
            return jax.tree.map(self.placement.fetch, tree)
        return jax.device_get(tree)

    def make_eval_set(self, test_rows: np.ndarray,
                      build_mask: bool = False) -> PaddedRows:
        """Pad + upload an eval set ONCE; reuse across ``evaluate`` calls.

        In-training evals hit the same val set up to
        ``multi_num * (mf_epochs + tr_epochs)`` times per period; re-uploading
        the (rows, 1001) candidate array each time costs ~2 s over the axon
        tunnel and dominated the eval-faithful sweep (3.4x instead of >5x).

        ``build_mask``: also attach the packed negative-membership mask for
        the masked scoring modes (honored only when the engine's policy
        wants masks). The mask is device-built from the already-uploaded
        rows and cached with them — the same test/<p>.npy serves as period
        t's val and period t+1's now_test, so one build covers both."""
        build_mask = build_mask and self._want_masks
        key = _content_key(test_rows) if self.cfg.upload_dedup else None
        if key is not None:
            hit = self._upload_cache.get(key)
            if hit is not None:
                if build_mask and hit.cand_mask is None:
                    hit = hit._replace(cand_mask=self._build_cand_mask(hit))
                    self._cache_upload(key, hit)
                return hit
        padded = pad_rows(test_rows, self.cfg.eval_batch_size,
                          pad_to=self.shape_targets.get("eval", 0))
        if self.placement is not None:
            padded = self.placement.batch(padded)
        if build_mask:
            padded = padded._replace(cand_mask=self._build_cand_mask(padded))
        if key is not None:
            self._cache_upload(key, padded)
        return padded

    def _build_cand_mask(self, padded: PaddedRows):
        """Packed mask over the row's negatives (``rows[:, 2:]``; col 0 is
        the user, col 1 the target — ``ops/eval_kernel.py`` semantics).
        Built on device from the already-placed rows, so under a mesh /
        multihost placement the output inherits the rows' data sharding."""
        return self._mask_build(padded.rows[:, 2:])

    def _cache_upload(self, key, padded: PaddedRows) -> None:
        """Insert into the upload LRU (evicting oldest; dict preserves
        insertion order). Called from the main thread AND the prefetch
        worker — plain dict ops are atomic under the GIL."""
        self._upload_cache.pop(key, None)
        self._upload_cache[key] = padded
        while len(self._upload_cache) > self._upload_cache_cap:
            self._upload_cache.pop(next(iter(self._upload_cache)))

    def evaluate_deferred(self, mf: MFParams, test_rows):
        """Dispatch an eval WITHOUT fetching the result: returns
        ``(sums, n)`` where ``sums`` maps K -> (hit, ndcg) device scalars.

        In-training evals fire up to ``multi_num * (mf+tr epochs)`` times per
        period and nothing reads their numbers until the jsonl log — blocking
        on ``float(h)`` per call serializes the device queue on a host
        round-trip each time (expensive over the axon tunnel). Deferring lets
        training run ahead; ``resolve_evals`` fetches a whole period's worth
        in one transfer."""
        padded = (test_rows if isinstance(test_rows, PaddedRows)
                  else self.make_eval_set(test_rows))
        return (self._eval(mf, padded.rows, padded.mask, padded.cand_mask),
                max(padded.n_real, 1))

    def resolve_evals(self, deferred):
        """Materialize a list of ``evaluate_deferred`` results with one
        host fetch; returns a list of {K: {recall, ndcg}} dicts."""
        if not deferred:
            return []
        if self.placement is not None:
            fetched = [
                ({k: (self.placement.fetch(h), self.placement.fetch(nd))
                  for k, (h, nd) in sums.items()}, n)
                for sums, n in deferred]
        else:
            fetched = jax.device_get(deferred)
        return [{k: {"recall": float(h) / n, "ndcg": float(nd) / n}
                 for k, (h, nd) in sums.items()}
                for sums, n in fetched]

    def evaluate(self, mf: MFParams, test_rows) -> Dict[int, Dict[str, float]]:
        """recall@K / NDCG@K over eval-format rows (numpy or a cached
        ``make_eval_set`` result); all Ks in one pass."""
        return self.resolve_evals([self.evaluate_deferred(mf, test_rows)])[0]

    def evaluate_attributed_deferred(self, mf: MFParams, test_rows,
                                     is_new_user, is_new_item):
        """Dispatch the hit-attribution evaluator (``test_model_pre``,
        ``evalution/evaluation2.py:28-70``) without fetching: returns
        (device-dict, n_real). Resolve with :meth:`resolve_attributed`."""
        if self._eval_attr is None:
            from sml_tpu.eval.evaluator import make_attributed_eval_fn
            self._eval_attr = jax.jit(make_attributed_eval_fn(
                self.cfg.topk, self.cfg.eval_batch_size,
                scoring=self.cfg.eval_scoring,
                use_pallas=self._eval_pallas))
        padded = (test_rows if isinstance(test_rows, PaddedRows)
                  else self.make_eval_set(test_rows))
        if self.placement is not None:
            # masks are host-built single-device arrays; the jitted eval
            # needs them on the global mesh like every other operand
            is_new_user = self.placement.replicated(np.asarray(is_new_user))
            is_new_item = self.placement.replicated(np.asarray(is_new_item))
        return (self._eval_attr(mf, padded.rows, padded.mask,
                                is_new_user, is_new_item, padded.cand_mask),
                max(padded.n_real, 1))

    def resolve_attributed(self, deferred):
        """Materialize ``evaluate_attributed_deferred`` results in one host
        fetch. Per result: hit shares per K for new users/items and the
        reference's two bucket normalizations (share of all hits, share of
        the test count) at max K."""
        if not deferred:
            return []
        if self.placement is not None:
            fetched = [(jax.tree.map(self.placement.fetch, out), n)
                       for out, n in deferred]
        else:
            fetched = jax.device_get(deferred)
        results = []
        for out, n in fetched:
            buckets = [float(x) for x in out["buckets_at_max_k"]]
            all_hits = max(sum(buckets), 1.0)
            rec = {}
            for k in self.cfg.topk:
                rec[f"hit_share_new_user@{k}"] = \
                    float(out["hit_new_user"][k]) / n
                rec[f"hit_share_new_item@{k}"] = \
                    float(out["hit_new_item"][k]) / n
            for name, v in zip(("old_user_old_item", "old_user_new_item",
                                "new_user_old_item", "new_user_new_item"),
                               buckets):
                rec[f"{name}_of_hits"] = v / all_hits
                rec[f"{name}_of_test"] = v / n
            results.append(rec)
        return results

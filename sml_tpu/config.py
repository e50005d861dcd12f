"""Typed configuration for the engine.

The reference scatters configuration over three argparse groups per entry
point (reference ``main_yelp.py:10-120``, ``main_news.py:8-115``) plus
hard-coded per-dataset constants in ``__main__`` blocks
(``main_yelp.py:159-165``, ``main_news.py:221-227``). Here everything is a
frozen dataclass with per-dataset presets, and no behavior is keyed off
dataset-name string comparisons.

Only the flags that are *live* in the reference's final version are first
class; reference flags documented as "not used in final version" are either
dropped or kept with their default-off semantics.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence


@dataclass(frozen=True)
class DataSpec:
    """On-disk dataset contract.

    Mirrors the reference format (``data/dataset2.py:229-236``;
    ``README.md:23-25``):

    * ``<root>/information.npy`` — int array ``[n_interactions, n_users,
      n_items]`` (cumulative maxima; tables are pre-allocated at these sizes).
    * ``<root>/train/<p>.npy`` — int array ``(N_p, 2)`` of ``[user, item]``
      interactions for period ``p``.
    * ``<root>/test/<p>.npy`` — int array ``(M_p, 2 + neg_num)`` rows
      ``[user, pos_item, neg_1..neg_k]`` for periods ``p >= first_test_file``.
      These double as the presampled-negative training pool
      (``data/dataset2.py:172-201``).
    """

    root: str
    name: str
    num_periods: int              # yelp: 40 (main_yelp.py:159), adressa: 63
    online_train_start: int       # first period of online training (yelp 10, adressa 21)
    online_test_start: int        # first ONLINE TEST period (yelp 30, adressa 48)
    eval_neg_num: int = 999       # negatives per test row (README.md:25)

    @property
    def path(self) -> str:
        return f"{self.root.rstrip('/')}/{self.name}"


# crossover point for the row-sparse dense-Adam formulation (see
# SMLConfig.fast_table_adam): combined table rows at which it starts
# beating the dense-gradient path on TPU v5e
FAST_TABLE_ADAM_AUTO_ROWS = 1_000_000


# the fast path's duplicate collapse builds a (2*batch, 2*batch) equality
# matrix per step; above this batch size that matrix dominates, so auto
# stays on the dense path
FAST_TABLE_ADAM_MAX_BATCH = 2048


def resolve_fast_table_adam(flag: Optional[bool], n_rows: int,
                            batch_size: int = 0) -> bool:
    if flag is not None:
        return flag
    return (n_rows >= FAST_TABLE_ADAM_AUTO_ROWS
            and batch_size <= FAST_TABLE_ADAM_MAX_BATCH)


@dataclass(frozen=True)
class TransferConfig:
    """Conv transfer network Θ (reference ``model/conv_transfer.py:18-50,87-110``).

    The live architecture is ``ConvTransfer_com``: per embedding row, stack
    ``[x_t, x_hat, x_com]`` (x_com = stop-grad interaction channel), run a
    channel-mixing "conv" (3->conv1_channels), 1x1 mix (->conv2_channels),
    GELU(x·σ(1.702x)) activations, then FC(conv2_channels*d -> fc_hidden) and
    FC(fc_hidden -> d). Separate user and item towers.
    """

    latent_dim: int = 64
    conv1_channels: int = 10
    conv2_channels: int = 5
    fc_hidden: int = 512
    # 'conv_com' is the paper architecture; 'conv2ch' is the reference's
    # kernel-2 ConvTransfer (conv_transfer.py:52-68); 'mlp_delta' / 'linear'
    # / 'gru' / 'gated' mirror the unused alternatives (transfer.py:94-291).
    kind: str = "conv_com"

    # NOTE (round-4 measurement, /tmp/refresh_bf16_probe.json): forcing
    # the refresh kernel's FC matmuls to bf16 inputs is a strict no-op on
    # TPU — outputs bit-identical, 37.2 vs 37.4 ms at 2.1M rows — because
    # the default TPU matmul precision already feeds the MXU bf16 inputs
    # for f32 operands. The kernel's 11-12.5%-of-bf16-peak is therefore
    # not matmul-precision-bound (per-row cost is flat 131k->2.1M rows);
    # no knob is exposed.


@dataclass(frozen=True)
class SMLConfig:
    """Hyper-parameters of the alternating SML loop.

    Defaults are the reference's Yelp defaults (``main_yelp.py:24-83``,
    ``README.md:32``).
    """

    # outer loop count per period (main_yelp.py:24)
    multi_num: int = 10

    # --- step 1: MF (inner) training (main_yelp.py:34-47) ---
    mf_lr: float = 0.01
    mf_epochs: int = 1
    mf_l2: float = 1e-6              # reference --l2
    mf_batch_size: int = 1024
    latent_dim: int = 64
    mf_sample: str = "all"           # 'all' = presampled neg column, 'alone' = rejection
    # epochs used by MF when the TR_stop_ branch is active (transfer.py:796)
    mf_epochs_when_tr_stopped: int = 2

    # --- step 2: transfer (outer) training (main_yelp.py:67-83) ---
    tr_lr: float = 0.001
    tr_l2: float = 1e-4              # Adam weight decay on Θ (transfer.py:393)
    tr_epochs: int = 1
    tr_batch_size: int = 256
    tr_sample_type: str = "alone"    # negatives from the period's own items
    tr_stop: bool = False            # stop training Θ during online test periods
    load_w_hat: bool = False         # restore MFbase <- W_hat after outer step

    transfer: TransferConfig = field(default_factory=TransferConfig)

    # loss used inside run_MF: the live default is BCE (conv_transfer.py:114)
    use_bce: bool = True

    # deterministic replay: epoch rows are explicit (user, item, neg)
    # triples consumed verbatim in order — no shuffle, no column draw, no
    # negative sampling. Used by the lockstep parity harness
    # (scripts/lockstep_parity.py) to drive this engine with a batch stream
    # recorded from another framework, and for bit-reproducing a run.
    replay_mode: bool = False

    # Background-thread prefetch of the next period's files + pools while
    # the device trains the current period (the TPU analogue of the
    # reference's unused CUDA-stream prefetcher, dataset2.py:11-48).
    prefetch_periods: bool = True

    # Row-sparse formulation of the dense torch-Adam table update (same
    # numbers; see sparse_dense_adam_update). Crossover measured on v5e:
    # SLOWER at small tables (120k rows: 0.94 vs 0.71 ms/step — the
    # scatter-sets break XLA's elementwise fusion) but 1.4x FASTER at
    # production tables (3M rows: 16.1 vs 22.4 ms/step, where the avoided
    # dense-grad materialization dominates). None = auto: on when the
    # combined tables exceed FAST_TABLE_ADAM_AUTO_ROWS.
    fast_table_adam: Optional[bool] = None

    # Uniform shape buckets: pad every period of each stream (set_t /
    # set_tt / eval rows, and the sampling index) to ONE sweep-wide shape
    # derived from an npy-header scan of the period files. XLA then
    # compiles each op once per sweep instead of once per period-size
    # bucket — round 2's faithful cold sweep spent ~700 s compiling shape
    # variants, including a 328 s mid-sweep spike when the test span's
    # buckets first appeared. Runtime cost of the padding is scan
    # iterations whose batches are lax.cond no-ops, plus slack rows on the
    # host->device link. Off = round-2 per-period bucketing (granularity 8).
    uniform_shapes: bool = True

    # Device-upload dedup: the same test/<p>.npy (rows, 1001) matrix is
    # shipped to the device up to three times per sweep (period t's val =
    # test/(t+1), period t+1's now_test, and mf_sample='all' training
    # pools). A small content-keyed LRU on the engine serves repeats from
    # HBM instead of re-crossing the host->device link (the warm-sweep
    # floor over the axon tunnel). Off = round-2 behavior.
    upload_dedup: bool = True

    # Fuse each SML phase (inner epochs -> hat -> refresh -> outer epochs)
    # into ONE jitted dispatch (SMLEngine.phase_step). Same op sequence and
    # key stream as the epoch-at-a-time path; saves ~4 host round-trips per
    # phase (multi_num per period), which dominate warm-sweep wall-clock on
    # a remote-dispatch TPU. Automatically bypassed where intermediate
    # states are observed (in-training evals; branch-C phase 0).
    fuse_phases: bool = True

    # Fuse a period's whole phase alternation into ONE dispatch: lax.scan
    # over the phase body (the per-phase data is identical across a
    # period's phases — only the RNG stream advances), with the
    # in-training val evals computed INSIDE the scanned program on the
    # same intermediate states the unfused path observes (their summed
    # hit/NDCG accumulators come back stacked and are expanded into the
    # identical per-epoch log records). Cuts the faithful (evals-on)
    # protocol from ~6 dispatches per phase x multi_num phases to one
    # dispatch per period. Diagnostics ride the fused program too: the
    # period-0 saddle guard replays its rule on the returned outer-loss
    # stack and log_norms reads per-phase norms the program stacks —
    # only branch-C phase 0 stays unfused (test-ordering). One static-
    # length program (lax.cond-masked tail) serves every n_phases.
    #
    # "auto" (default): fuse only once this config's period program has
    # been compiled before on this host (SMLEngine.fused_program_warm) —
    # its first-ever compile is ~13 min over the remote-TPU tunnel vs
    # ~112 s for a whole unfused cold sweep, so cold runs go unfused and
    # anything that explicitly compiles the program (fuse_period=True,
    # a perf lane, dryrun_multichip) unlocks the fused path for every
    # later sweep at warm-cache cost. True forces fusing (and pays the
    # one-time compile); False disables.
    fuse_period: bool | str = "auto"

    # After each outer epoch the reference refreshes MFbase <- Θ(last, hat)
    # on its compute_performance path (transfer.py:738-741), which is active
    # for the default TR_sample_type='alone' + val given. Keep on by default.
    refresh_after_outer_epoch: bool = True

    # Metric-only evaluations the reference always runs (val eval before/after
    # each inner epoch, transfer.py:444-446,517-519; eval per outer epoch,
    # transfer.py:684-690,740). They never change training state; off by
    # default for speed, enable for wall-clock-faithful parity runs.
    eval_during_inner: bool = False
    eval_during_outer: bool = False

    # evaluation
    topk: Sequence[int] = (5, 10, 20)
    eval_batch_size: int = 1024
    # Candidate-scoring mode for the batched evaluator
    # (eval/evaluator.py SCORING_MODES): 'gather' is the reference's exact
    # per-row embedding gather (MF.py:50-57); 'matmul' streams the item
    # table through the MXU and picks candidate columns — same ranks up to
    # f32 reduction order; '*_bf16' halve table traffic again; 'auto'
    # picks masked when the eval set carries a mask, else gather (the
    # fastest maskless mode on hardware). 'gather' keeps the reference's
    # exact scoring order. 'masked'/'masked_bf16' stream scores through the MXU
    # against a packed candidate-membership mask (zero indexed reads per
    # eval; ops/eval_kernel.py); 'auto' uses them for eval sets the
    # protocol re-evaluates (val under in-training evals) where the
    # once-per-set mask build amortizes.
    eval_scoring: str = "auto"
    # Upper item-count bound for auto-building candidate masks: mask rows
    # cost pad(I)/8 bytes each (vs 4·(2+C) for the id row itself), so cap
    # where the mask would dominate eval-set memory.
    eval_mask_max_items: int = 262_144
    # Per-test-period hit attribution by entity freshness (the reference's
    # ``test_model_pre`` analysis, ``evalution/evaluation2.py:28-70``):
    # hits on new users / new items per K plus the four old/new-user x
    # old/new-item bucket counts at max K, logged as kind="test_attribution"
    # jsonl records. Needs ``test_new_user.npy``/``test_new_item.npy`` next
    # to the dataset (``model/baseline.py:566-567``); silently skipped if
    # the files are absent.
    attributed_eval: bool = False

    # on-device rejection sampling: candidate draws per row ('alone' mode)
    neg_tries: int = 16

    # multi-pass offline Θ training (reference --pass_num + the stage>=19
    # early break for non-final passes, transfer.py:976-988). pass_num=1 is
    # the paper configuration. The reference hardcodes 19 for yelp and warns
    # "news need be different, not 19" (transfer.py:986): 19 is exactly the
    # warm-up span (online_test_start - online_train_start - 1), so None =
    # derive that from the DataSpec (yelp -> 19, adressa -> 26).
    pass_num: int = 1
    multipass_stop_stage: Optional[int] = None

    # jax.profiler tracing: write a trace of period `profile_period` into
    # `profile_dir` (None disables)
    profile_dir: Optional[str] = None
    profile_period: int = 0

    # Per-phase diagnostics to the jsonl logger: inner/outer mean losses plus
    # table / snapshot / Θ norms — the weight-scale scalars of the reference's
    # --need_writer path (transfer.py:780-785, 447-453) in structured form.
    # Costs one host sync per phase; off by default.
    log_norms: bool = False

    seed: int = 2000
    # Variance-ablation knob: when set, Θ's init key is PRNGKey(theta_seed)
    # instead of a split of PRNGKey(seed), decoupling the two randomness
    # sources a run consumes (Θ init vs the shuffle/negative-sampling
    # stream). Varying one while freezing the other localizes which source
    # drives run-to-run metric spread (scripts/yelp_scale_sweep.py
    # --theta-seed). None = reference-like single seed.
    theta_seed: Optional[int] = None

    # θ identity warm-start (new-design stabilizer, OFF for strict reference
    # parity): before the sweep, fit Θ_side(x, x) ≈ x by Adam on rows drawn
    # from the pretrained tables. A freshly-initialized conv tower outputs
    # rows at ~17% of the table norm (scripts/theta_init_scale.py), so the
    # first full-table refresh WIPES the pretrained tables; in bad seeds the
    # subsequent outer training falls into the zero-score BCE saddle
    # (loss = 2 ln 2) and θ's weight decay collapses it — the round-1
    # seed-variance pathology (VERDICT r1 item 1; the torch reference
    # exhibits the same saddle, scripts/saddle_experiment.py). Starting at
    # the identity makes the refresh value-preserving from phase 0.
    theta_warmstart_steps: int = 0
    theta_warmstart_rows: int = 4096
    theta_warmstart_lr: float = 1e-3

    # Saddle guard (new-design robustness feature; the CLI defaults it ON
    # since round 3): run quality at Yelp scale is decided in the FIRST
    # online-train period — with an unlucky shuffle/negative stream the θ
    # alternation stalls near the zero-score BCE saddle (outer loss ≈
    # 2 ln 2) and the run carries a permanent ~10-20% recall deficit (the
    # stream, not θ init, decides: yelp_scale_r2.json strfix/thfix
    # ablation; period-0 final outer loss separates the modes cleanly:
    # good ≤ 0.750 × 2 ln 2, bad ≥ 0.804, corr(loss, final recall) −0.89
    # over n=16). The guard watches the outer loss at phase
    # ``min(saddle_check_phase, multi_num-1)`` of the first trained period;
    # if it is still above ``saddle_frac * 2 ln 2`` the period is retried
    # from its starting state with a re-rolled (θ-init, stream) pair (at
    # most ``saddle_retries`` times). Cost when triggered: the aborted
    # phases + one state copy held during period 0; cost when calibration
    # does not transfer to an exotic protocol: at most ``saddle_retries``
    # wasted period-0 attempts (the last attempt always runs unguarded).
    # The raw config default stays 0 (reference-faithful core, which the
    # parity/measurement harnesses rely on); the CLI — the product
    # surface — defaults ``--saddle-retries 2`` and documents ``0`` as the
    # strict-parity mode. The torch reference has the same bad-stream tail
    # (scripts/period0_probe.py) and no recovery.
    saddle_retries: int = 0
    # Detection rule (``saddle_mode``):
    #   "auto" (default): scale-free, protocol-independent. Stall iff the
    #     fractional escape from the analytic BCE saddle,
    #     ``(2 ln 2 - outer_loss) / 2 ln 2``, is below
    #     ``saddle_tau * (phase+1) / multi_num`` — i.e. the loss must have
    #     escaped the saddle in proportion to the phase budget spent.
    #     Checked at ~30% of the budget (``max(1, round(0.3*multi_num))``)
    #     and at the final phase. The single universal ``saddle_tau`` was
    #     validated on BOTH recorded protocol fleets (VERDICT r3 "Next"
    #     #8): it reproduces the good/bad classification of all 16+12 ours
    #     and 13 reference Yelp period-0 trajectories and flags the
    #     recorded Adressa stall (tests/test_saddle_autocal.py) with no
    #     per-protocol tuning.
    #   "fixed": the round-3 behavior — hand-pinned fractions of 2 ln 2 at
    #     ``saddle_check_phase`` / the final phase (Yelp-calibrated,
    #     scripts/period0_probe.py), kept for A/B reproducibility.
    saddle_mode: str = "auto"
    saddle_tau: float = 0.23
    # Escalation when plain re-rolls keep stalling: the LAST retry can
    # additionally θ-identity warm-start the re-rolled init
    # (``theta_warmstart_steps`` semantics, forced with
    # ``saddle_warmstart_steps`` steps). Default OFF: the round-4
    # measurement on the seed it targeted (Adressa 2008, retries
    # exhausted) REGRESSED — the escalated final attempt finished at the
    # ~0.02 random floor (test r@20 0.0188, ``adressa_r3.json:
    # sml_seed2008_autocal``) vs 0.0493 for the plain exhausted-retries
    # run, i.e. the identity warm-start can destroy the transfer at the
    # news shape rather than merely dampen it. The final attempt runs
    # unguarded and is kept unconditionally, so escalation must only be
    # enabled where it is measured to help.
    saddle_escalate_warmstart: bool = False
    saddle_warmstart_steps: int = 400
    saddle_check_phase: int = 3
    saddle_frac: float = 0.88
    # second check at the LAST phase of the guarded period: streams that
    # squeeze under the early check but still end period 0 well above the
    # converged level (good streams end at <=0.75 x 2 ln 2, stalled ones
    # >=0.80) are retried too. Both fractions are calibrated for the Yelp
    # protocol (multi_num=10, d=64, scripts/period0_probe.py); with far
    # fewer phases per period the loss legitimately ends higher, so tune
    # the fractions up (or raise saddle_check_phase) before opting in.
    saddle_final_frac: float = 0.78

    # numerics
    dtype: str = "float32"
    # Storage dtype of the last/hat snapshot tables ("float32" |
    # "bfloat16"). bfloat16 halves the two full-table snapshots' HBM
    # footprint (the memory lever for fitting 5M+ users on one chip); all
    # math still runs in f32 — rows are upcast at the gather/refresh
    # boundary, so only the STORED snapshot values are rounded.
    # tests/test_snapshot_dtype.py bounds the training-trajectory deviation.
    snapshot_dtype: str = "float32"
    # table init scale for fresh (non-pretrained) states; 1.0 = torch
    # nn.Embedding default N(0,1)
    emb_init_scale: float = 1.0

    def replace(self, **kw) -> "SMLConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class PretrainConfig:
    """Pretraining of the base MF model (reference ``model/baseline.py:161-223``).

    The reference *loads* a pretrained checkpoint for SML
    (``model/transfer.py:322-325``); the blobs are absent from the mount, so
    the engine regenerates them with this protocol: BCE + per-side L2, Adam,
    early stopping on recall@20 measured every ``eval_every`` epochs.
    """

    lr: float = 0.01
    l2_user: float = 1e-5
    l2_item: float = 1e-5
    batch_size: int = 256
    max_epochs: int = 200
    eval_every: int = 2
    patience: int = 50              # eval rounds without a new best (baseline.py:216)
    seed: int = 2000
    latent_dim: int = 64
    neg_tries: int = 16
    emb_init_scale: float = 1.0
    # 'gather' by default: pretraining early-stops on eval recall, and the
    # committed cross-framework parity runs used reference-exact scoring.
    eval_scoring: str = "gather"


@dataclass(frozen=True)
class BaselineConfig:
    """Full-retrain / fine-tune / SPMF baselines (``model/baseline.py:102-556``)."""

    method: str = "full"            # 'full' | 'fine' | 'spmf'
    lr: float = 0.01
    l2_user: float = 1e-5
    l2_item: float = 1e-5
    epochs: int = 20
    batch_size: int = 256
    neg_num: int = 1
    pool_size: int = 0              # reservoir size (spmf only)
    pool_init_type: int = 0         # 0: warm by reservoir update (yelp), 1: fill with latest (news)
    start_period: int = 30          # yelp 30, adressa 48 (baseline.py:624-625)
    early_stop: bool = False        # reference breaks only when pool_init_type==1
    topk: Sequence[int] = (5, 10, 20)
    eval_batch_size: int = 1024
    latent_dim: int = 64
    seed: int = 2000
    neg_tries: int = 16
    emb_init_scale: float = 1.0
    # 'gather' by default: the news protocol early-stops on val recall
    # (early_stop), so eval scoring feeds back into the trajectory.
    eval_scoring: str = "gather"


def yelp_data(root: str) -> DataSpec:
    """Yelp: 40 periods, online-train from 10, online-test 30-39
    (``main_yelp.py:159-165``)."""
    return DataSpec(root=root, name="yelp", num_periods=40,
                    online_train_start=10, online_test_start=30)


def adressa_data(root: str) -> DataSpec:
    """Adressa ("news"): 63 periods, online-train from 21, online-test 48-62
    (``main_news.py:221-227``)."""
    return DataSpec(root=root, name="news", num_periods=63,
                    online_train_start=21, online_test_start=48)


def yelp_sml() -> SMLConfig:
    """README yelp command: ``--MF_epochs=1 --TR_epochs=1 --multi_num=10``."""
    return SMLConfig(multi_num=10, mf_epochs=1, tr_epochs=1)


def adressa_sml() -> SMLConfig:
    """README adressa command: ``--MF_epochs=2 --TR_epochs=2 --multi_num=7``."""
    return SMLConfig(multi_num=7, mf_epochs=2, tr_epochs=2)

"""sml_tpu — TPU-native sequential-retraining recommender engine.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
SIGIR'20 "Sequential Meta-Learning" (SML) reference implementation
(zyang1580/SML): a BPR/BCE matrix-factorization core, a per-row convolutional
transfer meta-network mapping (W_{t-1}, W_hat_t) -> W_t, the alternating
inner/outer retraining loop, full-retrain / fine-tune / SPMF baselines, and
leave-one-out recall@K / NDCG@K evaluation over sampled negatives.

Everything is designed TPU-first:

* pure functional state records + jitted steps (no mutable module soup),
* static shapes with bucketed padding and masked validity,
* on-device negative sampling (sorted-key binary search),
* a fused Pallas kernel for the full-table transfer refresh,
* row-sharded embedding tables over a ``jax.sharding.Mesh``.

See ``SURVEY.md`` at the repo root for the reference layer map this build
follows, and module docstrings for file:line citations into the reference.
"""

__version__ = "0.1.0"

from sml_tpu import config  # noqa: F401

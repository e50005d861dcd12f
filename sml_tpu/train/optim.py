"""Optimizers with torch-compatible semantics.

The reference uses two ``torch.optim.Adam`` instances: one for the MF tables
(weight_decay=0) and one for Θ (weight_decay=TR_l2)
(``model/transfer.py:392-393``). Torch Adam's ``weight_decay`` is classic
L2-into-gradient (NOT AdamW): ``g <- g + wd * p`` *before* the moment
updates. The optax chain below reproduces that ordering exactly; the
``scale_by_adam`` bias-correction/eps placement already matches torch
(``update = m_hat / (sqrt(v_hat) + eps)``).

Note on dense-vs-sparse embedding updates: torch's dense ``nn.Embedding``
produces a full-table gradient (zeros on untouched rows) and Adam updates
every row's moments each step — rows with decayed-but-nonzero momentum keep
moving. This engine reproduces that (grads of table leaves are dense), which
matters for accuracy parity. A throughput-oriented lazy variant can be added
behind a flag, but it changes the training trajectory.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax


# single source of the Adam hyper-parameter defaults shared by torch_adam
# and sparse_dense_adam_update (the two implementations of the same step)
ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-8


def torch_adam(lr: float, weight_decay: float = 0.0,
               b1: float = ADAM_B1, b2: float = ADAM_B2,
               eps: float = ADAM_EPS) -> optax.GradientTransformation:
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale(-lr),
    )


class TableGrad(NamedTuple):
    """Row-sparse gradient of an embedding table: ``rows[k]`` is the gradient
    of table row ``idx[k]``; ``idx`` may contain duplicates."""
    idx: jax.Array    # (K,) int32
    rows: jax.Array   # (K, d)


def _collapse_duplicates(idx: jax.Array, rows: jax.Array) -> jax.Array:
    """Give every occurrence of a duplicated index the SUMMED row gradient.

    This matters for Adam's second moment: the dense semantics square the
    summed row gradient, not the per-occurrence pieces. Implemented as an
    equality-matrix matmul — ``summed = (idx == idx.T) @ rows`` — which is
    one small fp32 MXU contraction instead of a sort + segment-sum (XLA's
    TPU sort costs more per step than the whole dense-scatter it replaces).
    Because duplicates all carry identical values, the subsequent
    ``.at[idx].set`` writes identical bytes for every occurrence, so the
    scatter result is unique even though duplicate-index scatter order is
    unspecified.
    """
    eq = (idx[:, None] == idx[None, :]).astype(rows.dtype)   # (K, K)
    # HIGHEST precision: the default TPU matmul truncates f32 operands to
    # bf16, which would corrupt the gradient rows and break the exactness
    # contract of this path
    return jnp.dot(eq, rows, preferred_element_type=rows.dtype,
                   precision=jax.lax.Precision.HIGHEST)


def _decay_on_tpu(p: jax.Array) -> bool:
    # Single-device TPU only: GSPMD cannot partition a pallas_call over a
    # mesh, so sharded runs keep the XLA formulation (same numbers).
    from sml_tpu.ops.adam_kernel import decay_adam_supported
    try:
        backend = jax.default_backend()
        n_dev = jax.device_count()
    except Exception:  # pragma: no cover
        return False
    return backend == "tpu" and n_dev == 1 and decay_adam_supported(p)


def sparse_dense_adam_update(params, opt_state,
                             sparse: Dict[str, TableGrad], *,
                             lr: float, b1: float = ADAM_B1,
                             b2: float = ADAM_B2, eps: float = ADAM_EPS):
    """One ``torch_adam(weight_decay=0)`` step with EXACT dense semantics,
    restructured for row-sparse gradients.

    torch's dense ``nn.Embedding`` gradient makes Adam touch every table row
    every step (moments decay, params keep moving on momentum) — reproducing
    that via materialized dense gradients costs two extra full-table passes
    per step (zeros + scatter + re-read). This computes the SAME numbers as
    ``torch_adam(lr).update`` on dense gradients without materializing them:

      1. full-table pass with g = 0:  mu <- b1*mu, nu <- b2*nu,
         p <- p - lr * mu_hat / (sqrt(nu_hat) + eps)   (one fused read+write)
      2. exact fixup of the touched rows from their pre-update values,
         scattered back with ``.set`` — bit-identical to what the dense
         update would have produced for those rows.

    ``params`` must be a NamedTuple of arrays whose first axis is the row
    axis; ``sparse`` maps field names to row gradients; fields not in
    ``sparse`` (e.g. the never-scored bias tables, ``model/MF.py:39-43``)
    receive the pure-decay update. ``opt_state`` must be the
    ``torch_adam``-chain state; weight decay must be 0 (the reference's MF
    optimizer, ``model/transfer.py:392``).
    """
    empty1, adam_state, empty2 = opt_state
    count_inc = optax.safe_int32_increment(adam_state.count)
    bc1 = 1 - b1 ** count_inc.astype(jnp.float32)
    bc2 = 1 - b2 ** count_inc.astype(jnp.float32)

    def adam_from_moments(mu_new, nu_new, p):
        mu_hat = mu_new / bc1
        nu_hat = nu_new / bc2
        return p + (-lr) * (mu_hat / (jnp.sqrt(nu_hat) + eps))

    new_params = {}
    new_mu = {}
    new_nu = {}
    for name in params._fields:
        p = getattr(params, name)
        mu = getattr(adam_state.mu, name)
        nu = getattr(adam_state.nu, name)
        if name in sparse:
            idx, g_rows = sparse[name]
            g_sum = _collapse_duplicates(idx, g_rows)
            # pre-update values of the touched rows
            p_rows = jnp.take(p, idx, axis=0)
            mu_rows = jnp.take(mu, idx, axis=0)
            nu_rows = jnp.take(nu, idx, axis=0)
        # full-table decay-only pass (the dense update with g = 0); on TPU
        # the big tables go through the fused Pallas kernel — one streaming
        # pass over (p, mu, nu) at the HBM-traffic floor, same numbers
        if _decay_on_tpu(p):
            from sml_tpu.ops.adam_kernel import fused_decay_adam
            p_d, mu_d, nu_d = fused_decay_adam(
                p, mu, nu, bc1, bc2, lr=lr, b1=b1, b2=b2, eps=eps)
        else:
            mu_d = b1 * mu
            nu_d = b2 * nu
            p_d = adam_from_moments(mu_d, nu_d, p)
        if name in sparse:
            # exact dense math for the touched rows
            mu_f = (1 - b1) * g_sum + b1 * mu_rows
            nu_f = (1 - b2) * (g_sum ** 2) + b2 * nu_rows
            p_f = adam_from_moments(mu_f, nu_f, p_rows)
            mu_d = mu_d.at[idx].set(mu_f)
            nu_d = nu_d.at[idx].set(nu_f)
            p_d = p_d.at[idx].set(p_f)
        new_params[name] = p_d
        new_mu[name] = mu_d
        new_nu[name] = nu_d

    cls = type(params)
    state = (empty1,
             adam_state._replace(count=count_inc, mu=cls(**new_mu),
                                 nu=cls(**new_nu)),
             empty2)
    return cls(**new_params), state

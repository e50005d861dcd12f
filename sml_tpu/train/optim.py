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

import optax


def torch_adam(lr: float, weight_decay: float = 0.0,
               b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8) -> optax.GradientTransformation:
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale(-lr),
    )

"""Optimizers matching the reference's training recipes.

All four reference models train with ``torch.optim.Adam(lr, weight_decay)``
(``Code/settransformer.py:91``, ``Code/baseline.py:84``,
``Code/settransformertemp.py:106``, ``Code/baselinetemp.py:103-104``).
torch's ``weight_decay`` is L2-into-the-gradient *before* the Adam moments
(not AdamW): ``g ← g + wd·θ``, then the standard bias-corrected Adam update
with eps outside the sqrt — exactly ``optax.add_decayed_weights`` →
``optax.scale_by_adam`` (eps_root=0).
"""
from __future__ import annotations

import optax


def adam_l2(
    learning_rate: float,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """torch-``Adam(lr, weight_decay=wd)``-equivalent optimizer."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps, eps_root=0.0))
    parts.append(optax.scale(-learning_rate))
    return optax.chain(*parts)

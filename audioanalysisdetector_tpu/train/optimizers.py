"""Optimizer zoo — the reference's optimizer maps, via optax.

The reference builds {Adam, AdamW, SGD(momentum=0.9), RMSprop} by name
(reference/ASV_dl_func.py:1276-1282, :945-953). Hyperparameters mirror
torch defaults so training dynamics are comparable: Adam/AdamW betas
(0.9, 0.999) eps 1e-8 (AdamW weight decay 1e-2), SGD momentum 0.9 without
dampening/nesterov, RMSprop alpha 0.99 eps 1e-8.
"""

from __future__ import annotations

import optax


def make_optimizer(name: str, lr: float = 1e-4, *, weight_decay: float = 1e-2):
    if name == "Adam":
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    if name == "AdamW":
        return optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay)
    if name == "SGD":
        # torch SGD with momentum: plain heavy-ball (trace), no dampening
        return optax.sgd(lr, momentum=0.9, nesterov=False)
    if name == "RMSprop":
        return optax.rmsprop(lr, decay=0.99, eps=1e-8)
    raise ValueError(f"unknown optimizer {name!r}")


OPTIMIZERS = ("Adam", "AdamW", "SGD", "RMSprop")

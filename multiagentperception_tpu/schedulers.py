"""LR schedules as optax schedule functions (reference: ptsemseg/schedulers/).

The reference wraps torch ``_LRScheduler`` subclasses (ConstantLR,
PolynomialLR, WarmUpLR + the torch MultiStep/Cosine/Exp registry,
schedulers/__init__.py:9-15). Here every schedule is a pure
``step -> multiplier`` function composed with the base lr — the idiomatic
optax form, checkpointable for free via the optimizer step count.

All ten shipped configs leave ``lr_schedule:`` empty -> constant lr
(schedulers/__init__.py:19-21).
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import optax


def constant_lr(base_lr: float, **_):
    return optax.constant_schedule(base_lr)


def poly_lr(base_lr: float, max_iter: int, gamma: float = 0.9, **_):
    """Polynomial decay. Note: the reference's PolynomialLR.get_lr is broken
    (schedulers/schedulers.py:20-25 — the modulo condition makes it return
    the base lr on almost every step); this implements the decay it clearly
    intended. No shipped config uses it."""
    return optax.polynomial_schedule(
        init_value=base_lr, end_value=0.0, power=gamma, transition_steps=max_iter
    )


def multi_step_lr(base_lr: float, milestones, gamma: float = 0.1, **_):
    return optax.piecewise_constant_schedule(
        base_lr, {int(m): gamma for m in milestones}
    )


def cosine_annealing_lr(base_lr: float, T_max: int, eta_min: float = 0.0, **_):
    return optax.cosine_decay_schedule(
        base_lr, decay_steps=T_max, alpha=eta_min / base_lr if base_lr else 0.0
    )


def exp_lr(base_lr: float, gamma: float, **_):
    return optax.exponential_decay(base_lr, transition_steps=1, decay_rate=gamma)


KEY2SCHEDULER: dict[str, Callable] = {
    "constant_lr": constant_lr,
    "poly_lr": poly_lr,
    "multi_step": multi_step_lr,
    "cosine_annealing": cosine_annealing_lr,
    "exp_lr": exp_lr,
}


def _with_warmup(schedule, base_lr, warmup_iters=100, mode="linear", gamma=0.2):
    """WarmUpLR wrapper (reference: schedulers/schedulers.py:28-53)."""

    def warmed(step):
        cold = schedule(step)
        if mode == "linear":
            alpha = step / float(warmup_iters)
            factor = gamma * (1 - alpha) + alpha
        elif mode == "constant":
            factor = gamma
        else:
            raise KeyError(f"WarmUp type {mode} not implemented")
        import jax.numpy as jnp

        return jnp.where(step < warmup_iters, factor * cold, cold)

    return warmed


def get_scheduler(scheduler_dict: Mapping[str, Any] | None, base_lr: float):
    """Schedule registry (reference: schedulers/__init__.py:18-48)."""
    if not scheduler_dict:
        return constant_lr(base_lr)
    sd = dict(scheduler_dict)
    s_type = sd.pop("name")
    warmup = {}
    if "warmup_iters" in sd:
        warmup = dict(
            warmup_iters=sd.pop("warmup_iters", 100),
            mode=sd.pop("warmup_mode", "linear"),
            gamma=sd.pop("warmup_factor", 0.2),
        )
    base = KEY2SCHEDULER[s_type](base_lr, **sd)
    if warmup:
        return _with_warmup(base, base_lr, **warmup)
    return base

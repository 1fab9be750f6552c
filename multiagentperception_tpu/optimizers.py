"""Optimizer registry over optax (reference: ptsemseg/optimizers/__init__.py).

Same names and config surface (``training.optimizer.{name, lr, ...}``); the
constructors map torch semantics onto optax (torch Adam defaults == optax
defaults: b1=0.9, b2=0.999, eps=1e-8).
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import optax

ScheduleOrFloat = Any


def _sgd(lr, momentum=0.0, weight_decay=0.0, nesterov=False, **_):
    tx = optax.sgd(lr, momentum=momentum or None, nesterov=nesterov)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


def _adam(lr, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0, **_):
    if weight_decay:
        return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                           weight_decay=weight_decay)
    return optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)


def _adamax(lr, betas=(0.9, 0.999), eps=1e-8, **_):
    return optax.adamax(lr, b1=betas[0], b2=betas[1], eps=eps)


def _adadelta(lr, rho=0.9, eps=1e-6, **_):
    return optax.adadelta(lr, rho=rho, eps=eps)


def _adagrad(lr, eps=1e-10, **_):
    return optax.adagrad(lr, eps=eps)


def _rmsprop(lr, alpha=0.99, eps=1e-8, momentum=0.0, **_):
    return optax.rmsprop(lr, decay=alpha, eps=eps, momentum=momentum or None)


def _asgd(lr, weight_decay=0.0, **_):
    # torch ASGD ~ SGD with averaging; plain SGD is the behavioral stand-in.
    return _sgd(lr, weight_decay=weight_decay)


KEY2OPT: dict[str, Callable] = {
    "sgd": _sgd,
    "adam": _adam,
    "asgd": _asgd,
    "adamax": _adamax,
    "adadelta": _adadelta,
    "adagrad": _adagrad,
    "rmsprop": _rmsprop,
}


def get_optimizer(cfg: Mapping, learning_rate: ScheduleOrFloat | None = None):
    """Build an optax transform from ``cfg['training']['optimizer']``.

    ``learning_rate`` (a float or optax schedule) overrides the config lr so
    the scheduler system can be threaded through (reference splits these:
    optimizers/__init__.py:18-29 + schedulers/__init__.py:18-48).
    """
    opt_cfg = cfg["training"].get("optimizer")
    if opt_cfg is None:
        return optax.sgd(learning_rate if learning_rate is not None else 0.01)
    name = opt_cfg["name"]
    if name not in KEY2OPT:
        raise NotImplementedError(f"Optimizer {name} not implemented")
    params = {k: v for k, v in opt_cfg.items() if k != "name"}
    lr = learning_rate if learning_rate is not None else params.pop("lr")
    params.pop("lr", None)
    return KEY2OPT[name](lr, **params)

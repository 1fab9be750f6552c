"""Optimizer registry over optax (reference: ptsemseg/optimizers/__init__.py).

Same names and config surface (``training.optimizer.{name, lr, ...}``); the
constructors map torch semantics onto optax (torch Adam defaults == optax
defaults: b1=0.9, b2=0.999, eps=1e-8).
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, NamedTuple

import jax
import jax.numpy as jnp
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


class ASGDState(NamedTuple):
    count: jnp.ndarray  # torch 'step' after its increment
    eta: jnp.ndarray    # per-step lr, decayed by (1 + lambd*lr*t)^alpha
    mu: jnp.ndarray     # averaging rate, 1 until t exceeds t0
    ax: Any             # Polyak-averaged params (torch keeps but never loads)


def _asgd(lr, lambd=1e-4, alpha=0.75, t0=1e6, weight_decay=0.0, **_):
    """torch.optim.ASGD semantics (reference registry
    /root/reference/ptsemseg/optimizers/__init__.py:9):

        p <- p*(1 - lambd*eta) - eta*(g + weight_decay*p)
        ax <- p                         (mu == 1, i.e. t <= t0)
              ax + mu*(p - ax)          (t > t0)
        eta <- lr / (1 + lambd*lr*t)^alpha ;  mu <- 1/max(1, t - t0)

    ``eta``/``mu`` applied at step t are the values computed at the end of
    step t-1 (state-carried, like torch); with the default t0=1e6 the
    averaging is inactive for any realistic run and ``ax`` tracks ``p``
    exactly — torch likewise only *stores* ax, the checkpointed model uses
    p. Numerical agreement with torch.optim.ASGD is pinned in
    tests/test_services.py."""

    def init_fn(params):
        lr0 = lr(0) if callable(lr) else lr
        return ASGDState(
            count=jnp.zeros([], jnp.int32),
            eta=jnp.asarray(lr0, jnp.float32),
            mu=jnp.ones([], jnp.float32),
            ax=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("asgd requires params (tx.update(..., params))")
        eta, mu = state.eta, state.mu
        count = state.count + 1

        def delta(g, p):
            g = g + weight_decay * p if weight_decay else g
            return (-lambd * eta * p - eta * g).astype(p.dtype)

        new_updates = jax.tree_util.tree_map(delta, updates, params)

        def avg(ax, p, d):
            p_new = p + d
            return jnp.where(mu != 1.0, ax + mu * (p_new - ax), p_new)

        ax = jax.tree_util.tree_map(avg, state.ax, params, new_updates)
        t = count.astype(jnp.float32)
        lr_t = lr(count) if callable(lr) else lr
        eta_new = lr_t / (1.0 + lambd * lr_t * t) ** alpha
        mu_new = 1.0 / jnp.maximum(1.0, t - t0)
        return new_updates, ASGDState(
            count=count,
            eta=jnp.asarray(eta_new, jnp.float32),
            mu=jnp.asarray(mu_new, jnp.float32),
            ax=ax,
        )

    return optax.GradientTransformation(init_fn, update_fn)


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

"""Optimizers and LR schedules (optax), resolved from the reference's
torch target strings (train.py:238-239 instantiates
`torch.optim.Adam` / `lr_scheduler.StepLR` etc. from config).

The torch convention is epoch-granular: `scheduler.step()` once per epoch
(train.py:140). Here an optimizer is an optax transformation built with
`inject_hyperparams` so the train loop can write
`opt_state.hyperparams["learning_rate"]` from `scheduler(epoch)` without
recompiling.
"""
from __future__ import annotations

import math
from typing import Any, Dict

import optax


def _param_mask(params):
    """Mask BatchNorm running stats ('batch_stats' collection) out of the
    optimizer: they are buffers installed by the train step, not
    parameters — without the mask the optimizer would carry dead Adam
    moments for them and a weight-decay term would transiently decay
    them before the overwrite."""
    import jax
    if not (isinstance(params, dict) and "batch_stats" in params):
        return jax.tree.map(lambda _: True, params)
    return {k: jax.tree.map(lambda _: k != "batch_stats", v)
            for k, v in params.items()}


def _masked(opt: optax.GradientTransformation) -> optax.GradientTransformation:
    return optax.masked(opt, _param_mask)


class Optimizer:
    """Factory carrying the config; `.make()` returns the optax
    transformation, `.base_lr` the configured lr."""

    def __init__(self, lr: float, weight_decay: float = None, **kwargs):
        self.base_lr = lr
        # None = "not configured" (each optimizer applies ITS torch
        # default); an explicit 0 must stay 0
        self.weight_decay = weight_decay
        self.kwargs = kwargs

    def make(self) -> optax.GradientTransformation:
        raise NotImplementedError


class Adam(Optimizer):
    """torch.optim.Adam(lr, weight_decay, amsgrad, betas, eps)."""

    def make(self) -> optax.GradientTransformation:
        betas = self.kwargs.get("betas", (0.9, 0.999))
        eps = self.kwargs.get("eps", 1e-8)
        amsgrad = self.kwargs.get("amsgrad", False)
        base = optax.amsgrad if amsgrad else optax.adam

        def factory(learning_rate):
            opt = base(learning_rate, b1=betas[0], b2=betas[1], eps=eps)
            if self.weight_decay:
                # torch Adam's weight_decay is L2 added to the gradient
                opt = optax.chain(
                    optax.add_decayed_weights(self.weight_decay), opt)
            return _masked(opt)

        return optax.inject_hyperparams(factory)(learning_rate=self.base_lr)


class AdamW(Optimizer):
    """torch.optim.AdamW (decoupled weight decay)."""

    def make(self) -> optax.GradientTransformation:
        betas = self.kwargs.get("betas", (0.9, 0.999))
        eps = self.kwargs.get("eps", 1e-8)
        # torch AdamW defaults weight_decay to 0.01 when unset, but an
        # explicitly configured 0 must remain 0
        wd = 0.01 if self.weight_decay is None else self.weight_decay

        def factory(learning_rate):
            return _masked(optax.adamw(learning_rate, b1=betas[0],
                                       b2=betas[1], eps=eps,
                                       weight_decay=wd))

        return optax.inject_hyperparams(factory)(learning_rate=self.base_lr)


class SGD(Optimizer):
    def make(self) -> optax.GradientTransformation:
        momentum = self.kwargs.get("momentum", 0.0)

        def factory(learning_rate):
            opt = optax.sgd(learning_rate, momentum=momentum or None)
            if self.weight_decay:
                opt = optax.chain(
                    optax.add_decayed_weights(self.weight_decay), opt)
            return _masked(opt)

        return optax.inject_hyperparams(factory)(learning_rate=self.base_lr)


class Scheduler:
    """epoch -> lr multiplier; stateless unless noted."""

    def __call__(self, epoch: int) -> float:
        raise NotImplementedError

    def observe(self, val_loss: float) -> None:   # for plateau schedulers
        pass

    def state_dict(self) -> Dict[str, Any]:
        return {}

    def load_state_dict(self, state: Dict[str, Any]) -> None:
        pass


class StepLR(Scheduler):
    """lr * gamma^(epoch // step_size)."""

    def __init__(self, step_size: int, gamma: float = 0.1, **_):
        self.step_size = step_size
        self.gamma = gamma

    def __call__(self, epoch: int) -> float:
        return self.gamma ** (epoch // self.step_size)


class CosineAnnealingLR(Scheduler):
    """torch closed form: lr = eta_min + (base - eta_min)
    * (1 + cos(pi*epoch/T_max)) / 2 — eta_min is an ABSOLUTE learning
    rate; the train loop injects base_lr so the returned multiplier is
    lr/base_lr. The cosine continues past T_max (torch recurs back up;
    no clamping)."""

    def __init__(self, T_max: int, eta_min: float = 0.0, **_):
        self.t_max = T_max
        self.eta_min = eta_min
        self.base_lr = None      # set by the train loop (optimizer lr)

    def __call__(self, epoch: int) -> float:
        base = self.base_lr if self.base_lr else 1.0
        ratio = self.eta_min / base
        return (ratio + (1 - ratio)
                * 0.5 * (1 + math.cos(math.pi * epoch / self.t_max)))


class ExponentialLR(Scheduler):
    """lr * gamma^epoch."""

    def __init__(self, gamma: float, **_):
        self.gamma = gamma

    def __call__(self, epoch: int) -> float:
        return self.gamma ** epoch


class ReduceLROnPlateau(Scheduler):
    """Multiplies lr by `factor` after `patience` epochs without val-loss
    improvement (torch semantics, mode='min')."""

    def __init__(self, mode: str = "min", factor: float = 0.5,
                 patience: int = 10, threshold: float = 1e-4, **_):
        assert mode == "min"
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.best = float("inf")
        self.num_bad = 0
        self.scale = 1.0

    def observe(self, val_loss: float) -> None:
        if val_loss < self.best * (1 - self.threshold):
            self.best = val_loss
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.scale *= self.factor
                self.num_bad = 0

    def __call__(self, epoch: int) -> float:
        return self.scale

    def state_dict(self):
        return {"best": self.best, "num_bad": self.num_bad, "scale": self.scale}

    def load_state_dict(self, state):
        self.best = state["best"]
        self.num_bad = state["num_bad"]
        self.scale = state["scale"]


def constant_scheduler() -> Scheduler:
    s = StepLR(step_size=1, gamma=1.0)
    return s

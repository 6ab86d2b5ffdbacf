"""Train state + optimizer construction (optax)."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..utils.config import OptimConfig


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array


def make_lr_schedule(cfg: OptimConfig, steps_per_epoch: int,
                     epochs: int = 200):
    """Step-decay (reference: x0.1 at epochs ~60/90), or constant/cosine.

    ``epochs`` is the actual run length (cfg.train.epochs) so the cosine
    decay reaches zero exactly at the end of training.
    """
    if cfg.schedule == "constant":
        return optax.constant_schedule(cfg.lr)
    if cfg.schedule == "cosine":
        total = max(steps_per_epoch, 1) * max(epochs, 1)
        return optax.cosine_decay_schedule(cfg.lr, total)
    boundaries = {e * steps_per_epoch: cfg.lr_drop_factor for e in cfg.lr_drop_epochs}
    return optax.piecewise_constant_schedule(cfg.lr, boundaries)


def make_optimizer(cfg: OptimConfig, steps_per_epoch: int = 1,
                   epochs: int = 200):
    sched = make_lr_schedule(cfg, steps_per_epoch, epochs)
    if cfg.optimizer == "rmsprop":
        # torch-RMSprop-compatible: alpha=decay, and eps added OUTSIDE the
        # sqrt (g / (sqrt(nu) + eps)) — optax's default eps_in_sqrt=True
        # computes g / sqrt(nu + eps), which diverges materially from torch
        # early in training when second moments are small.
        tx = optax.rmsprop(sched, decay=cfg.rmsprop_decay, eps=cfg.eps,
                           eps_in_sqrt=False,
                           momentum=cfg.momentum if cfg.momentum else None)
    elif cfg.optimizer == "adam":
        tx = optax.adam(sched, eps=cfg.eps)
    elif cfg.optimizer == "sgd":
        tx = optax.sgd(sched, momentum=cfg.momentum or None)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    chain = []
    if cfg.grad_clip_norm:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    if cfg.weight_decay:
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    chain.append(tx)
    return optax.chain(*chain) if len(chain) > 1 else tx


def create_train_state(model, optim_cfg: OptimConfig, rng: jax.Array,
                       batch_size: int = 1, steps_per_epoch: int = 1,
                       epochs: int = 200) -> TrainState:
    tx = make_optimizer(optim_cfg, steps_per_epoch, epochs)

    def _build(rng: jax.Array) -> TrainState:
        init_rng, state_rng = jax.random.split(rng)
        variables = model.init_variables(init_rng, batch_size=batch_size)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            rng=state_rng,
        )

    # On an accelerator backend the WHOLE state construction (flax param
    # init + optax moment zeros) is one jitted dispatch.  Eager construction
    # issues hundreds of individual ops; over this image's tunneled TPU
    # transport each eager dispatch costs ~1 s, so eager hg8 init burned
    # ~110 s of every bench/train startup (measured 2026-08-20: 16 s
    # jitted+cached vs ~110 s eager).  On CPU the trade inverts — eager
    # dispatch is cheap and the XLA:CPU compile of the hg8 init graph costs
    # ~45 s on the 1-core driver host — so CPU (tests, dryrun) stays eager.
    if jax.default_backend() == "cpu":
        return _build(rng)
    return jax.jit(_build)(rng)

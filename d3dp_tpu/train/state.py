"""Train state + optimizer: AdamW with per-epoch exponential lr decay.

Matches the reference recipe (main.py:309, :529-531): AdamW(lr=6e-5,
weight_decay=0.1 on ALL params — the reference uses no param groups),
lr *= lr_decay each epoch. The learning rate is an injected hyperparameter so
epoch decay never retraces the step.
"""

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


def make_optimizer(learning_rate: float, weight_decay: float = 0.1):
    """AdamW, betas/eps at torch defaults, dynamic lr."""
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=learning_rate,
        b1=0.9,
        b2=0.999,
        eps=1e-8,
        weight_decay=weight_decay,
    )


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, tx, mesh=None):
        """`mesh`: pass when `params` are mesh-sharded — the optimizer
        moments inherit their shardings automatically, but stray scalar
        leaves (step count, injected lr) must be replicated onto the mesh
        for the state to be jittable."""
        opt_state = tx.init(params["params"] if "params" in params else params)
        step = jnp.zeros((), jnp.int32)
        if mesh is not None:
            from d3dp_tpu.parallel import replicate_stray_leaves

            opt_state = replicate_stray_leaves(opt_state, mesh)
            step = replicate_stray_leaves(step, mesh)
        return cls(params=params, opt_state=opt_state, step=step)


def get_lr(opt_state):
    return float(opt_state.hyperparams["learning_rate"])


def set_lr(opt_state, lr):
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def weighted_mpjpe(pred, target, weights):
    """Masked MPJPE: mean over valid batch rows only. weights: (B,) 0/1."""
    err = jnp.sqrt(jnp.sum(jnp.square(pred - target), axis=-1))  # (B,F,J)
    w = weights[:, None, None].astype(err.dtype)
    denom = jnp.sum(weights) * err.shape[1] * err.shape[2]
    return jnp.sum(err * w) / denom


def make_train_step(d3dp, tx, donate=True, root_joint=0):
    """Build the jitted train step.

    step(state, rng, x2d, x3d, weights) -> (state, loss)
    x3d arrives with the trajectory in the root joint; it is root-zeroed
    here before both conditioning and loss (main.py:381-382 — joint 0 for
    H36M; main_3dhp.py:424-425 — joint 14/pelvis for 3DHP).
    """

    def step_fn(state, rng, x2d, x3d, weights):
        x3d = x3d.at[:, :, root_joint].set(0.0)

        def loss_fn(params):
            pred = d3dp.train_forward({"params": params}, rng, x2d, x3d, train=True)
            return weighted_mpjpe(pred, x3d, weights)

        params = state.params["params"]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, state.opt_state, params)
        params = optax.apply_updates(params, updates)
        new_state = TrainState(
            params={"params": params}, opt_state=opt_state, step=state.step + 1
        )
        return new_state, loss

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

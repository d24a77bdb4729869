"""Train state + pjit step factory — the one training loop for every
recipe (SURVEY.md §7: "one pjit step-function factory").

Replaces Lightning's Trainer/DDP and the raw torchrun loops
(``R2GenCSR/train.py:18-31``, ``main_pretrain.py:100-205``): parameters
replicated (or model-sharded) on the mesh, batch sharded over ``data``,
gradient psum inserted by the compiler, buffers donated.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.mesh import batch_sharding, replicated


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
        )


def make_train_step(
    loss_fn: Callable,  # (params, batch, rng) -> scalar loss
    tx: optax.GradientTransformation,
    mesh=None,
    donate: bool = True,
):
    """Returns jitted ``step(state, batch, rng) -> (state, metrics)``.

    With a mesh, the state is replicated and the batch sharded on
    ``data``; XLA inserts the gradient all-reduce (the DDP/NCCL
    equivalent, SURVEY.md §2.8).
    """

    def step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state
        )
        return new_state, {"loss": loss, "grad_norm": gnorm}

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(loss_fn: Callable, mesh=None):
    def step(params, batch, rng):
        return loss_fn(params, batch, rng)

    if mesh is None:
        return jax.jit(step)
    repl = replicated(mesh)
    return jax.jit(
        step, in_shardings=(repl, batch_sharding(mesh), repl),
        out_shardings=repl,
    )

"""Train state + pjit step factory — the one training loop for every
recipe (SURVEY.md §7: "one pjit step-function factory").

Replaces Lightning's Trainer/DDP and the raw torchrun loops
(``R2GenCSR/train.py:18-31``, ``main_pretrain.py:100-205``):

- data parallelism: batch sharded over ``data``, gradient psum inserted
  by the compiler (the DDP/NCCL analog, SURVEY.md §2.8);
- tensor parallelism: ``param_specs`` (e.g. from
  :func:`..parallel.tp.param_specs`) shard the LLM kernels over
  ``model``;
- ZeRO-1 analog (the reference's ``--strategy deepspeed``): optimizer
  moments sharded over ``data`` via :func:`zero_opt_specs`;
- gradient accumulation (``--accumulate_grad_batches``,
  ``R2GenCSR/configs/config.py:86``; ``accum_iter`` loop
  ``engine_pretrain.py:36-53``): ``lax.scan`` over microbatches.
"""

from __future__ import annotations

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
    # Shadow weights for eval (timm ModelEma analog the reference's
    # VMamba classification runner uses, ``VMamba/classification/main.py``
    # ``--model-ema``). None when EMA is disabled.
    ema_params: Any = None

    @classmethod
    def create(cls, params, tx, ema: bool = False):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree_util.tree_map(jnp.copy, params)
            if ema
            else None,
        )


def zero_opt_specs(opt_state, mesh, min_size: int = 1 << 14):
    """ZeRO-1-style PartitionSpecs for optimizer state: shard ONE axis
    of each large leaf over ``data``; small leaves stay replicated.
    This is the TPU-native analog of the reference's DeepSpeed strategy
    flag (SURVEY.md §2.8).

    Axis choice: the LARGEST divisible axis, tie-broken toward the last.
    Never the first-divisible axis: for conv kernels (e.g. a 16x16x3x32
    patch embed) that is a spatial dim, and constraining the adam
    moments there makes GSPMD propagate a kernel-spatial partition into
    the conv fwd/bwd itself — measured on an 8-device mesh to change the
    loss by 1.8e-3 and the grad norm by 15% (a halo-exchange
    miscompile/precision trap, found by the round-5 dryrun equivalence
    check). The largest axis is a feature/channel dim in every real
    kernel shape, where weight-stationary partitioning is exact."""
    dsz = mesh.shape["data"]

    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        if not shape or leaf.size < min_size:
            return P()
        best = None
        for ax, dim in enumerate(shape):
            if dim % dsz == 0 and dim >= dsz:
                if best is None or dim >= shape[best]:
                    best = ax
        if best is None:
            return P()
        parts = [None] * len(shape)
        parts[best] = "data"
        return P(*parts)

    return jax.tree_util.tree_map(spec, opt_state)


def state_shardings(
    state: TrainState, mesh, param_specs=None, zero_opt: bool = True
):
    """NamedSharding pytree for a TrainState: params per ``param_specs``
    (replicated by default), opt state ZeRO-sharded over ``data``."""
    repl = replicated(mesh)

    def ns(s):
        return NamedSharding(mesh, s)

    if param_specs is None:
        p_shard = jax.tree_util.tree_map(lambda _: repl, state.params)
    else:
        p_shard = jax.tree_util.tree_map(ns, param_specs,
                                         is_leaf=lambda x: isinstance(x, P))
    if zero_opt:
        o_shard = jax.tree_util.tree_map(
            ns, zero_opt_specs(state.opt_state, mesh),
            is_leaf=lambda x: isinstance(x, P),
        )
    else:
        o_shard = jax.tree_util.tree_map(lambda _: repl, state.opt_state)
    e_shard = (
        None
        if state.ema_params is None
        else jax.tree_util.tree_map(lambda _: repl, state.ema_params)
        if param_specs is None
        else p_shard
    )
    return TrainState(
        step=repl, params=p_shard, opt_state=o_shard, ema_params=e_shard
    )


def shard_state(state: TrainState, mesh, param_specs=None,
                zero_opt: bool = True) -> TrainState:
    """device_put a TrainState with the computed shardings."""
    sh = state_shardings(state, mesh, param_specs, zero_opt)
    return jax.tree_util.tree_map(jax.device_put, state, sh)


def _accum_value_and_grad(loss_fn, accum_steps: int):
    """Average loss/grads over ``accum_steps`` microbatches split off
    the leading batch axis (reference ``accum_iter`` semantics)."""

    def vag(params, batch, rng):
        def reshape(x):
            b = x.shape[0]
            return x.reshape((accum_steps, b // accum_steps) + x.shape[1:])

        micro = jax.tree_util.tree_map(reshape, batch)
        rngs = jax.random.split(rng, accum_steps)
        zero_g = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params
        )

        def body(carry, xs):
            loss_acc, g_acc = carry
            mb, r = xs
            loss, g = jax.value_and_grad(loss_fn)(params, mb, r)
            g_acc = jax.tree_util.tree_map(
                lambda a, b: a + b.astype(jnp.float32), g_acc, g
            )
            return (loss_acc + loss, g_acc), None

        (loss_sum, g_sum), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32), zero_g), (micro, rngs)
        )
        inv = 1.0 / accum_steps
        grads = jax.tree_util.tree_map(
            lambda g, p: (g * inv).astype(p.dtype), g_sum, params
        )
        return loss_sum * inv, grads

    return vag


def make_train_step(
    loss_fn: Callable,  # (params, batch, rng) -> scalar loss
    tx: optax.GradientTransformation,
    mesh=None,
    param_specs=None,
    accum_steps: int = 1,
    zero_opt: bool = True,
    donate: bool = True,
    state_for_shardings: TrainState | None = None,
    ema_decay: float = 0.0,
):
    """Returns jitted ``step(state, batch, rng) -> (state, metrics)``.

    With a mesh, the batch is sharded on ``data`` and the state sharded
    per :func:`state_shardings` — params follow ``param_specs`` (TP over
    ``model``), optimizer moments are ZeRO-sharded over ``data``. XLA
    inserts the gradient all-reduce and the opt-state collectives.
    """
    from ..ops.vit_block import training_trace

    def traced_loss(*a, **k):
        # Trace-time marker: fused-fwd/unfused-bwd path selection
        # (ops/vit_block.py training_trace) sees this is a loss trace.
        with training_trace():
            return loss_fn(*a, **k)

    vag = (
        jax.value_and_grad(traced_loss)
        if accum_steps <= 1
        else _accum_value_and_grad(traced_loss, accum_steps)
    )

    def step(state: TrainState, batch, rng):
        # Per-step rng derivation happens ON DEVICE from the carried
        # step counter. Folding on the host per step (the reference's
        # torch.Generator-per-iteration shape) dispatches a chain of
        # eager threefry ops between training steps, which serializes
        # dispatch and costs ~110 ms/step through a remote-dispatch
        # tunnel (measured, BENCH.md "step-dispatch pipeline"). Callers
        # pass ONE run-level base key; uniqueness and resume determinism
        # come from state.step.
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = vag(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        ema = state.ema_params
        if ema is not None and ema_decay > 0.0:
            ema = jax.tree_util.tree_map(
                lambda e, p: (
                    ema_decay * e.astype(jnp.float32)
                    + (1.0 - ema_decay) * p.astype(jnp.float32)
                ).astype(e.dtype),
                ema,
                params,
            )
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state,
            ema_params=ema,
        )
        return new_state, {"loss": loss, "grad_norm": gnorm}

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = replicated(mesh)
    data = batch_sharding(mesh)
    if state_for_shardings is not None:
        st_sh = state_shardings(
            state_for_shardings, mesh, param_specs, zero_opt
        )
    else:
        st_sh = repl  # legacy: fully replicated state
    return jax.jit(
        step,
        in_shardings=(st_sh, data, repl),
        out_shardings=(st_sh, repl),
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

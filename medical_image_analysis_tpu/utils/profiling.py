"""Profiling & numerical-debug utilities.

Replaces the reference's throughput harnesses (``SwinCheX/main.py:361-430``,
``VMamba/classification/main.py:338-353``), fvcore FLOPs accounting
(``vmamba.py:1606-1630``), and nan guards (``check_nan_inf``
vmamba.py:157; finite-loss abort engine_pretrain.py:45-47) with JAX-native
equivalents: jax.profiler traces, cost-analysis FLOPs, jax_debug_nans.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


def enable_debug_nans(on: bool = True):
    """--debug-nans flag (SURVEY.md §5.2)."""
    jax.config.update("jax_debug_nans", on)


def check_finite(name: str, x) -> None:
    """Host-side finite assertion (engine_pretrain.py:45-47 analog)."""
    if not bool(jnp.all(jnp.isfinite(x))):
        raise FloatingPointError(f"non-finite value in {name}")


@contextlib.contextmanager
def trace(log_dir: str):
    """Chrome-trace profiler context (view with tensorboard/perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def flops_of(fn, *args) -> float:
    """Compiled-HLO FLOPs estimate (replaces fvcore flop_count)."""
    analysis = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return float(analysis.get("flops", -1.0)) if analysis else -1.0


def throughput(fn, args, batch_size: int, iters: int = 30,
               warmup: int = 3) -> dict:
    """--throughput mode: timed forward passes.

    Forces a host transfer per step (the axon tunnel's block_until_ready
    is unreliable — see bench.py) and subtracts measured roundtrip.
    """
    def run():
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.ravel(leaf)[0])

    for _ in range(warmup):
        run()
    f = jax.jit(lambda x: x + 1)
    z = jnp.zeros((8,))
    float(f(z)[0])
    t0 = time.perf_counter()
    for _ in range(5):
        float(f(z)[0])
    rt = (time.perf_counter() - t0) / 5

    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters - rt
    return {
        "ms_per_iter": 1000 * dt,
        "items_per_sec": batch_size / dt,
    }


def device_memory_stats() -> dict:
    """max-memory-allocated analog (misc.py MetricLogger CUDA mem)."""
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    return stats or {}

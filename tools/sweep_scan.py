"""TPU sweep: selective-scan kernel configs at ARM-B / VSSM-T layer shapes.

Timing uses the bench.py method: force a host transfer per step and
subtract the measured axon-tunnel roundtrip.

Usage: python tools/sweep_scan.py [arm|vssm] [fwd|bwd]
"""

import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from medical_image_analysis_tpu.ops.selective_scan_pallas import (  # noqa: E402
    selective_scan_dirs,
)


def _roundtrip_s() -> float:
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,))
    float(f(x)[0])
    t0 = time.perf_counter()
    for _ in range(10):
        float(f(x)[0])
    return (time.perf_counter() - t0) / 10


RT = None


def timeit(fn, steps=20):
    global RT
    if RT is None:
        RT = _roundtrip_s()
    out = fn()  # compile + warm
    float(jnp.sum(out) if hasattr(out, "dtype") else out)
    t0 = time.perf_counter()
    for _ in range(steps - 1):
        fn()
    out = fn()
    float(jnp.sum(out) if hasattr(out, "dtype") else out)
    return (time.perf_counter() - t0 - RT) / steps * 1000  # ms


def make_args(b, k, l, d, n, dtype=jnp.bfloat16):
    r = np.random.default_rng(0)
    u = jnp.asarray(r.standard_normal((b, k, l, d)) * 0.5, dtype)
    dt = jnp.asarray(r.standard_normal((b, k, l, d)) * 0.5, dtype)
    A = jnp.asarray(-np.exp(r.standard_normal((k, d, n)) * 0.3), jnp.float32)
    B = jnp.asarray(r.standard_normal((b, k, l, n)), dtype)
    C = jnp.asarray(r.standard_normal((b, k, l, n)), dtype)
    D = jnp.asarray(r.standard_normal((k, d)), jnp.float32)
    db = jnp.asarray(r.standard_normal((k, d)) * 0.1, jnp.float32)
    return u, dt, A, B, C, D, db


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "arm"
    mode = sys.argv[2] if len(sys.argv) > 2 else "fwd"
    if which == "arm":
        b, k, l, d, n = 32, 4, 257, 1536, 16
    else:  # vssm stage-1
        b, k, l, d, n = 64, 4, 3136, 192, 16
    args = make_args(b, k, l, d, n)
    print(f"backend={jax.default_backend()} shape B{b} K{k} L{l} D{d} N{n}")

    configs = [(128, 128), (128, 256), (64, 256), (64, 512), (32, 512),
               (256, 256)]
    for chunk, bd in configs:
        if bd > d:
            continue
        f = jax.jit(
            functools.partial(
                selective_scan_dirs, delta_softplus=True,
                chunk=chunk, block_d=bd,
            )
        )
        if mode == "fwd":
            g = lambda: f(*args)  # noqa: E731
        else:
            loss = jax.jit(
                jax.grad(lambda u, dt: jnp.sum(f(u, dt, *args[2:])))
            )
            g = lambda: loss(args[0], args[1])  # noqa: E731
        try:
            ms = timeit(g)
            print(f"chunk={chunk:4d} block_d={bd:4d}: {ms:8.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"chunk={chunk:4d} block_d={bd:4d}: FAIL {type(e).__name__}: {e}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()


def extra_configs():
    """Small-chunk follow-up sweep (HS kernel)."""
    b, k, l, d, n = 32, 4, 257, 1536, 16
    args = make_args(b, k, l, d, n)
    for chunk, bd in [(32, 768), (16, 512), (16, 768), (8, 768), (32, 1536)]:
        f = jax.jit(
            functools.partial(
                selective_scan_dirs, delta_softplus=True,
                chunk=chunk, block_d=bd,
            )
        )
        try:
            ms = timeit(lambda: f(*args))
            print(f"hs  chunk={chunk:4d} block_d={bd:4d}: {ms:8.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"hs  chunk={chunk:4d} block_d={bd:4d}: FAIL {e}")
        sys.stdout.flush()

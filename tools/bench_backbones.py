"""Model-level fwd / fwd+bwd throughput for the vision backbones.

Usage: python tools/bench_backbones.py [arm|vssm|swin|both] [fwd|bwd|both]
Timing uses the bench.py method (tools.sweep_scan.timeit).
"""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from tools.sweep_scan import timeit  # noqa: E402
from medical_image_analysis_tpu.train.loop import vision_preset  # noqa: E402


def bench(family: str, mode: str):
    if family == "arm":
        from medical_image_analysis_tpu.models.mamba import ARM

        model = ARM(**vision_preset("arm", "base"))
        b = 32
    elif family == "swin":
        from medical_image_analysis_tpu.models.swin import build_swin

        model = build_swin("swin_base")
        b = 64
    else:
        from medical_image_analysis_tpu.models.vmamba import VSSM

        model = VSSM(**vision_preset("vssm", "tiny"))
        b = 64
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, 224, 224, 3)),
        jnp.bfloat16,
    )
    params = model.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), params)

    if mode in ("fwd", "both"):
        fwd = jax.jit(lambda p, x: model.apply(p, x))
        ms = timeit(lambda: fwd(params, x))
        print(f"{family} fwd B={b}: {ms:.1f} ms -> {b / ms * 1000:.0f} img/s")

    if mode in ("bwd", "both"):
        from medical_image_analysis_tpu.ops.vit_block import training_trace

        def loss(p, x):
            # training_trace = what the recipes' train step traces see:
            # attention/MLP paths whose fused bwd can't compile pick
            # unfused XLA AD instead of fused-fwd + recompute-vjp.
            with training_trace():
                out = model.apply(p, x)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss))
        ms = timeit(lambda: jax.tree_util.tree_leaves(g(params, x))[0])
        print(
            f"{family} fwd+bwd B={b}: {ms:.1f} ms -> {b / ms * 1000:.0f} img/s"
        )


def main():
    fam = sys.argv[1] if len(sys.argv) > 1 else "both"
    mode = sys.argv[2] if len(sys.argv) > 2 else "both"
    print(f"backend={jax.default_backend()}")
    for f in (("arm", "vssm") if fam == "both" else (fam,)):
        bench(f, mode)


if __name__ == "__main__":
    main()

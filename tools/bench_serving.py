"""MRG serving throughput: ARM-B encoder + 0.5B-class LLM, beam search.

Reference eval decoding settings (R2GenCSR/configs/config.py:62-68):
beam 3, 120 max / 80 min new tokens, repetition penalty 2.0, length
penalty 2.0. Reports p50 batch latency and reports/s/chip.

Usage: python tools/bench_serving.py [batch] [beams] [--int8]
"""

import dataclasses
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from medical_image_analysis_tpu.models.llm import LLM_CONFIGS  # noqa: E402
from medical_image_analysis_tpu.models.mrg import (  # noqa: E402
    GenerateConfig,
    R2GenGPT,
)
from medical_image_analysis_tpu.train.loop import vision_preset  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    int8 = "--int8" in sys.argv
    b = int(args[0]) if len(args) > 0 else 8
    beams = int(args[1]) if len(args) > 1 else 3
    print(
        f"backend={jax.default_backend()} batch={b} beams={beams}"
        f" int8={int8}"
    )

    llm_cfg = LLM_CONFIGS["qwen1_5_0_5b"]
    if int8:
        llm_cfg = dataclasses.replace(llm_cfg, quant_int8=True)
    model = R2GenGPT(
        llm_cfg=llm_cfg, chosen="arm",
        vision_kwargs=vision_preset("arm", "base"),
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((b, 1, 224, 224, 3)), jnp.bfloat16
    )
    before = jnp.full((b, 4), 5, jnp.int32)
    after = jnp.full((b, 6), 7, jnp.int32)
    # prompt = 196 ARM-B image tokens + 10 text ids = 206; + 100 new
    # tokens needs 306 cache slots -> 320 (lane-aligned).
    gcfg = GenerateConfig(num_beams=beams, max_new_tokens=100,
                          min_new_tokens=80, max_cache_len=320)

    params = model.init(
        jax.random.PRNGKey(0), images, before, after,
        jnp.zeros((b, 8), jnp.int32), jnp.ones((b, 8), jnp.float32),
    )
    params = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16)
        if jnp.issubdtype(v.dtype, jnp.floating) else v,
        params,
    )  # int8 kernels (and their fp32 scales' int8 partners) stay put

    gen = jax.jit(lambda p, im: model.apply(
        p, im, before, after, gcfg, method=model.generate
    ))
    out = jax.block_until_ready(gen(params, images))  # compile
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = jax.block_until_ready(gen(params, images))
        lat.append(time.perf_counter() - t0)
    p50 = sorted(lat)[len(lat) // 2]
    print(f"tokens shape: {jax.tree_util.tree_leaves(out)[0].shape}")
    print(
        f"p50 batch latency {p50 * 1e3:.0f} ms -> {b / p50:.2f} reports/s"
    )


if __name__ == "__main__":
    main()

"""Split beam-decode cost: raw LLM step loop vs full beam machinery.

Times (a) 100 KV-cached decode steps at rows=B*nb with no beam logic,
(b) the prefill+encoder part alone (max_new_tokens=1), to bracket the
beam-search overhead inside tools/bench_serving.py's 100-token number.
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from medical_image_analysis_tpu.models.llm import (  # noqa: E402
    LLM_CONFIGS,
    TransformerLM,
    init_cache,
)


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    steps = 100
    cfg = LLM_CONFIGS["qwen1_5_0_5b"]
    model = TransformerLM(cfg)
    tok = jnp.zeros((rows, 1), jnp.int32)
    cache = init_cache(cfg, rows, 256)
    params = model.init(
        jax.random.PRNGKey(0), input_ids=tok,
        positions=jnp.zeros((rows, 1), jnp.int32), cache=cache,
    )
    params = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), params)

    def loop(params, cache):
        def body(t, carry):
            tok, cache, acc = carry
            pos = jnp.full((rows, 1), 16, jnp.int32) + t - 1
            logits, cache = model.apply(
                params, input_ids=tok, positions=pos, cache=cache
            )
            ntok = jnp.argmax(logits[:, 0], axis=-1)[:, None].astype(jnp.int32)
            return ntok, cache, acc + logits[0, 0, 0].astype(jnp.float32)

        _, cache, acc = jax.lax.fori_loop(
            0, steps, body, (tok, cache, jnp.zeros((), jnp.float32))
        )
        return acc

    fn = jax.jit(loop)
    print(f"backend={jax.default_backend()} rows={rows}")
    jax.block_until_ready(fn(params, cache))
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(params, cache))
        lat.append(time.perf_counter() - t0)
    p50 = sorted(lat)[len(lat) // 2]
    print(
        f"decode-only {steps} steps: {p50 * 1e3:.0f} ms "
        f"({p50 / steps * 1e3:.2f} ms/step)"
    )


if __name__ == "__main__":
    main()

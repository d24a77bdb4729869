"""Benchmark: fused device-preprocess + MAE encode throughput.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
North star (BASELINE.md): >= 5,000 384^2 X-ray images/sec/chip through
the fused uint8 -> normalize -> patchify -> masked ViT-B encoder path.
vs_baseline = value / 5000.

Timing notes for this environment: the axon tunnel's
``block_until_ready`` does not reliably block, so every measured step
forces a host transfer; the measured tunnel roundtrip is subtracted.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

TARGET = 5000.0
IMG = 384
BATCH = 512
STEPS = 5


def _roundtrip_s() -> float:
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,))
    float(f(x)[0])
    t0 = time.perf_counter()
    for _ in range(5):
        float(f(x)[0])
    return (time.perf_counter() - t0) / 5


def main():
    from medical_image_analysis_tpu.data.preprocessing import device_preprocess
    from medical_image_analysis_tpu.models.vit import MAE

    model = MAE(
        patch_size=16, in_chans=3, embed_dim=768, depth=12, num_heads=12,
        decoder_embed_dim=512, decoder_depth=1, decoder_num_heads=16,
    )
    rng = jax.random.PRNGKey(0)
    raw = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (BATCH, IMG, IMG, 3)),
        jnp.uint8,
    )
    params = model.init(
        {"params": jax.random.PRNGKey(1)},
        device_preprocess(raw[:2], IMG), rng=rng,
    )
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)

    @jax.jit
    def encode(params, raw, rng):
        imgs = device_preprocess(raw, IMG)
        latent, mask, _ = model.apply(
            params, imgs, rng=rng, mask_ratio=0.75, method=MAE.encode
        )
        return latent.mean()

    rt = _roundtrip_s()
    float(encode(params, raw, rng))  # compile + warm
    t0 = time.perf_counter()
    for i in range(1, STEPS):
        encode(params, raw, jax.random.fold_in(rng, i))
    float(encode(params, raw, jax.random.fold_in(rng, STEPS)))
    dt = (time.perf_counter() - t0 - rt) / STEPS
    ips = BATCH / dt

    print(json.dumps({
        "metric": "mae_encode_images_per_sec_per_chip_384px",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / TARGET, 3),
    }))


if __name__ == "__main__":
    main()

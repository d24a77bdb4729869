"""Full MAE pretrain-step throughput: encode + decode + loss + backward.

VERDICT round-2 item 9: the headline bench covers masked ENCODE only;
this drives the complete training step (the HD pretrain hot loop,
``HD_Xray_Pretrain_MAE/pretrain/main.py``) — fused uint8 preprocess,
75% masking, ViT-B encoder, decoder, per-patch-norm MSE, full backward,
AdamW update — with donated state, at 384² (8-block decoder, HD config)
and 1280²/patch64/1-channel (the HD paper shapes).

Usage: python tools/bench_mae_step.py [384|1280|both]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def _roundtrip_s() -> float:
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,))
    float(f(x)[0])
    t0 = time.perf_counter()
    for _ in range(10):
        float(f(x)[0])
    return (time.perf_counter() - t0) / 10


def bench(img, patch, in_chans, batch, decoder_depth, steps=10,
          remat=False):
    from medical_image_analysis_tpu.data.preprocessing import (
        device_preprocess,
    )
    from medical_image_analysis_tpu.models.vit import MAE

    model = MAE(
        patch_size=patch, in_chans=in_chans, embed_dim=768, depth=12,
        num_heads=12, decoder_embed_dim=512, decoder_depth=decoder_depth,
        decoder_num_heads=16,
    )
    rng = jax.random.PRNGKey(0)
    raw = jnp.asarray(
        np.random.default_rng(0).integers(
            0, 255, (batch, img, img, in_chans)
        ),
        jnp.uint8,
    )

    def pre(r):
        x = device_preprocess(r, img)
        return x[..., :in_chans]

    params = jax.jit(
        lambda r: model.init({"params": r}, pre(raw[:2]), rng=rng)
    )(jax.random.PRNGKey(1))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), params
    )
    tx = optax.adamw(1e-4)
    opt = tx.init(params)

    def loss_fn(p, r, step_rng):
        loss, _, _ = model.apply(
            p, pre(r), rng=step_rng, mask_ratio=0.75,
            deterministic=False,
        )
        return loss

    if remat:
        loss_fn = jax.checkpoint(loss_fn)

    def step_fn(p, opt, r, base_rng, i):
        # fold on device — host-side per-step fold_in serializes
        # dispatch (~110 ms/step over the relay; BENCH.md
        # "step-dispatch pipeline")
        step_rng = jax.random.fold_in(base_rng, i)
        loss, grads = jax.value_and_grad(loss_fn)(p, r, step_rng)
        updates, opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, updates), opt, loss

    step = jax.jit(step_fn, donate_argnums=(0, 1))
    # Analytic matmul FLOPs (XLA's cost_analysis cannot see inside the
    # fused Pallas block kernels, so HLO counting undercounts).
    n_patch = (img // patch) ** 2
    l_enc = int(n_patch * 0.25) + 1  # 75% mask + cls
    l_dec = n_patch + 1

    def stack_flops(l, d, depth):
        per = 8 * l * d * d + 4 * l * l * d + 16 * l * d * d
        return depth * per

    fwd = (
        2 * n_patch * (patch * patch * in_chans) * 768  # patch embed
        + stack_flops(l_enc, 768, 12)
        + 2 * l_dec * 768 * 512  # decoder embed
        + stack_flops(l_dec, 512, decoder_depth)
        + 2 * l_dec * 512 * (patch * patch * in_chans)  # pred head
    )
    flops = 3.0 * fwd * batch  # fwd + ~2x bwd, per step
    rt = _roundtrip_s()
    params, opt, loss = step(params, opt, raw, rng, 0)
    float(loss)  # compile + warm
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt, loss = step(params, opt, raw, rng, i + 1)
    float(loss)
    dt = (time.perf_counter() - t0 - rt) / steps
    ips = batch / dt
    mfu = flops / dt / 197e12 if flops else float("nan")
    print(
        f"mae_full_step img={img} patch={patch} chans={in_chans} "
        f"batch={batch} dec={decoder_depth}: {dt * 1e3:.1f} ms/step, "
        f"{ips:.0f} img/s/chip, step GFLOPs={flops / 1e9:.0f}, "
        f"MFU~{mfu:.2f} (vs 197 TFLOP/s bf16 v5e peak)"
    )
    return ips


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("384", "both"):
        bench(img=384, patch=16, in_chans=3, batch=128, decoder_depth=8)
    if which in ("1280", "both"):
        bench(img=1280, patch=64, in_chans=1, batch=32, decoder_depth=8)


if __name__ == "__main__":
    main()

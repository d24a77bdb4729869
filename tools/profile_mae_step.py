"""Decompose the full MAE pretrain step (tools/bench_mae_step.py) into
encoder-fwd / decoder-fwd / loss / backward / optimizer segments on the
real chip, with per-segment analytic MFU, to locate where the step's
MFU is lost (BENCH.md reports 0.22 at 384cfg).

Usage: python tools/profile_mae_step.py [384|1280]
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

PEAK = 197e12


def roundtrip_s() -> float:
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,))
    float(f(x)[0])
    t0 = time.perf_counter()
    for _ in range(10):
        float(f(x)[0])
    return (time.perf_counter() - t0) / 10


def timeit(f, *a, iters=20):
    rt = roundtrip_s()
    out = f(*a)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
          .astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
          .astype(jnp.float32))
    return (time.perf_counter() - t0 - rt) / iters


def block_flops(tokens, d, mlp_ratio=4.0):
    qkv_proj = 4 * 2 * tokens * d * d
    attn = 2 * 2 * tokens * tokens * d
    mlp = 2 * 2 * tokens * d * int(d * mlp_ratio)
    return qkv_proj + attn + mlp


def main():
    cfgname = sys.argv[1] if len(sys.argv) > 1 else "384"
    if cfgname == "384":
        img, patch, in_chans, b, dec_depth = 384, 16, 3, 128, 8
    else:
        img, patch, in_chans, b, dec_depth = 1280, 64, 1, 32, 8

    from medical_image_analysis_tpu.data.preprocessing import (
        device_preprocess,
    )
    from medical_image_analysis_tpu.models.vit import MAE

    model = MAE(patch_size=patch, in_chans=in_chans, embed_dim=768,
                depth=12, num_heads=12, decoder_embed_dim=512,
                decoder_depth=dec_depth, decoder_num_heads=16)
    rng = jax.random.PRNGKey(0)
    raw = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (b, img, img, in_chans)),
        jnp.uint8)

    def pre(r):
        x = device_preprocess(r, img)
        return x[..., :in_chans]

    params = model.init({"params": jax.random.PRNGKey(1)}, pre(raw[:2]),
                        rng=rng)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)

    n_patch = (img // patch) ** 2
    keep = n_patch - int(n_patch * 0.75) + 1
    full = n_patch + 1
    d, dd = 768, 512
    embed_f = 2 * (keep - 1) * patch * patch * in_chans * d
    enc_f = embed_f + 12 * block_flops(keep, d)
    dec_embed_f = 2 * keep * d * dd + 2 * full * dd * patch * patch * in_chans
    dec_f = dec_embed_f + dec_depth * block_flops(full, dd)

    def report(name, dt, flops):
        tf = flops * b / dt / 1e12
        print(f"{name:>26}: {dt * 1e3:7.1f} ms | {tf:6.1f} TFLOP/s | "
              f"MFU {tf * 1e12 / PEAK * 100:5.1f}%", flush=True)

    print(f"cfg={cfgname} B={b} keep={keep} full={full} "
          f"enc={enc_f / 1e9:.1f}G dec={dec_f / 1e9:.1f}G /img", flush=True)

    @jax.jit
    def enc_fwd(p, r, k):
        latent, _, ids = model.apply(p, pre(r), rng=k, method=MAE.encode)
        return latent.sum()

    @jax.jit
    def full_fwd(p, r, k):
        loss, _, _ = model.apply(p, pre(r), rng=k)
        return loss

    @jax.jit
    def full_bwd(p, r, k):
        # checksum over grads keeps the whole backward alive under DCE
        loss, g = jax.value_and_grad(
            lambda pp: model.apply(pp, pre(r), rng=k)[0])(p)
        chk = sum(jnp.sum(x.astype(jnp.float32))
                  for x in jax.tree_util.tree_leaves(g))
        return loss + 0.0 * chk

    @jax.jit
    def train_bwd(p, r, k):
        # deterministic=False = the recipe's train trace: TransformerBlock
        # picks unfused XLA AD when the fused bwd can't compile.
        loss, g = jax.value_and_grad(
            lambda pp: model.apply(pp, pre(r), rng=k,
                                   deterministic=False)[0])(p)
        chk = sum(jnp.sum(x.astype(jnp.float32))
                  for x in jax.tree_util.tree_leaves(g))
        return loss + 0.0 * chk

    tx = optax.adamw(1e-4, weight_decay=0.05)
    opt = tx.init(params)
    grads = jax.jit(jax.grad(
        lambda pp: model.apply(pp, pre(raw), rng=rng)[0]))(params)

    @jax.jit
    def opt_only(g, o, p):
        up, o2 = tx.update(g, o, p)
        return optax.apply_updates(p, up), o2

    t_enc = timeit(enc_fwd, params, raw, rng)
    report("encoder fwd", t_enc, enc_f)
    t_fwd = timeit(full_fwd, params, raw, rng)
    report("full fwd (enc+dec+loss)", t_fwd, enc_f + dec_f)
    report("  decoder+loss (diff)", t_fwd - t_enc, dec_f)
    t_bwd = timeit(full_bwd, params, raw, rng)
    report("fwd+bwd (fused fwd)", t_bwd, 3 * (enc_f + dec_f))
    print(f"{'bwd-only (diff)':>26}: {(t_bwd - t_fwd) * 1e3:7.1f} ms "
          f"({(t_bwd - t_fwd) / t_fwd:.1f}x fwd)", flush=True)
    t_tr = timeit(train_bwd, params, raw, rng)
    report("fwd+bwd (train mode)", t_tr, 3 * (enc_f + dec_f))
    t_opt = timeit(lambda: opt_only(grads, opt, params)[0])
    print(f"{'optimizer alone':>26}: {t_opt * 1e3:7.1f} ms", flush=True)

    # scatter suspect: VJP of take_along_axis is an XLA scatter
    n_tok = n_patch
    big = jnp.zeros((b, n_tok, 768), jnp.bfloat16)
    ids = jnp.broadcast_to(jnp.arange(keep - 1), (b, keep - 1))

    @jax.jit
    def gather_grad(x):
        f = lambda xx: jnp.sum(  # noqa: E731
            jnp.take_along_axis(xx, ids[..., None], axis=1)
            .astype(jnp.float32))
        return jax.grad(f)(x).sum()

    t_sc = timeit(gather_grad, big)
    print(f"{'take_along_axis VJP':>26}: {t_sc * 1e3:7.1f} ms "
          f"(scatter {b}x{keep - 1} rows of 768)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

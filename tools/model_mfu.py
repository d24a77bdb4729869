"""Model-level MFU on the real chip: measured step time vs analytic
matmul FLOPs (2xMAC convention) against the v5e bf16 peak.

HLO ``cost_analysis`` undercounts through the axon backend (custom
calls + fused ops report ~0), so FLOPs are derived analytically from
the model dims; the scan kernels contribute no matmul FLOPs — their
elementwise throughput is tracked separately in Gcell/s
(tools/scan_mfu.py). Timing uses the bench.py pattern: N async
dispatches, one forced host transfer, minus the measured tunnel
roundtrip (``block_until_ready`` does not reliably block via axon).
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

PEAK = 197e12  # v5e bf16 dense peak FLOP/s


def roundtrip_s() -> float:
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,))
    float(f(x)[0])
    t0 = time.perf_counter()
    for _ in range(10):
        float(f(x)[0])
    return (time.perf_counter() - t0) / 10


def timeit(f, *a, iters: int = 20) -> float:
    """Steady-state seconds per call (async dispatch + one sync)."""
    rt = roundtrip_s()
    out = f(*a)
    float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0 - rt) / iters


def vit_block_flops(tokens: int, d: int, mlp_ratio: float = 4.0) -> float:
    """One pre-LN ViT block, 2xMAC FLOPs per image."""
    qkv_proj = 4 * 2 * tokens * d * d
    attn = 2 * 2 * tokens * tokens * d
    mlp = 2 * 2 * tokens * d * int(d * mlp_ratio)
    return qkv_proj + attn + mlp


def mae_encode_flops(img: int, patch: int, d: int, depth: int,
                     mask_ratio: float, in_chans: int = 3) -> float:
    n_patch = (img // patch) ** 2
    keep = int(n_patch * (1 - mask_ratio)) + 1  # + cls
    embed = 2 * n_patch * (patch * patch * in_chans) * d
    return embed + depth * vit_block_flops(keep, d)


def mamba_layer_matmul_flops(tokens: int, d_model: int, expand: int,
                             d_state: int, dt_rank: int, k_dirs: int) -> float:
    """Matmul FLOPs of one Mamba/SS2D layer (2xMAC, per image).

    in_proj (d->2*di), per-direction x_proj (di->dt_rank+2N) and
    dt_proj (dt_rank->di), out_proj (di->d). The scan itself has no
    matmul work.
    """
    di = expand * d_model
    in_proj = 2 * tokens * d_model * 2 * di
    x_proj = k_dirs * 2 * tokens * di * (dt_rank + 2 * d_state)
    dt_proj = k_dirs * 2 * tokens * dt_rank * di
    out_proj = 2 * tokens * di * d_model
    return in_proj + x_proj + dt_proj + out_proj


def report(name, dt_s, flops, batch):
    tf = flops * batch / dt_s / 1e12
    print(
        f"{name}: {dt_s * 1e3:7.1f} ms | {flops / 1e9:6.1f} GFLOP/img | "
        f"{tf:6.1f} TFLOP/s | MFU {tf * 1e12 / PEAK * 100:5.1f}%",
        flush=True,
    )


def main():
    print(f"backend={jax.default_backend()} peak={PEAK / 1e12:.0f} TFLOP/s",
          flush=True)

    # ---- headline MAE encode (bench.py pipeline) ----
    from medical_image_analysis_tpu.data.preprocessing import device_preprocess
    from medical_image_analysis_tpu.models.vit import MAE

    img, b = 384, 512
    model = MAE(patch_size=16, in_chans=3, embed_dim=768, depth=12,
                num_heads=12, decoder_embed_dim=512, decoder_depth=1,
                decoder_num_heads=16)
    rng = jax.random.PRNGKey(0)
    raw = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (b, img, img, 3)),
        jnp.uint8)
    params = model.init({"params": jax.random.PRNGKey(1)},
                        device_preprocess(raw[:2], img), rng=rng)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), params)

    @jax.jit
    def encode(p, r, k):
        imgs = device_preprocess(r, img)
        latent, _, _ = model.apply(p, imgs, rng=k, mask_ratio=0.75,
                                   method=MAE.encode)
        return latent.mean()

    dt = timeit(encode, params, raw, rng)
    report("MAE-encode 384 B512 (headline)", dt,
           mae_encode_flops(img, 16, 768, 12, 0.75), b)

    # ---- ARM-B ----
    from medical_image_analysis_tpu.models.mamba import build_arm
    m = build_arm("arm_base_pz16")
    x = jnp.ones((32, 224, 224, 3), jnp.bfloat16)
    pa = m.init(jax.random.PRNGKey(0), x)
    pa = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), pa)
    # ARM-B: 224/16 -> 196 patches + cls = 197 tokens, 12 layers of
    # bimamba-v3 (K=4 direction params but 2 scans of shared di),
    # d_model=768, expand=2, d_state=16, dt_rank=d_model/16=48.
    tokens, d_model = 197, 768
    arm_layer = mamba_layer_matmul_flops(tokens, d_model, 2, 16, 48, 4)
    embed = 2 * 196 * (16 * 16 * 3) * d_model
    arm_flops = embed + 12 * arm_layer

    fwd = jax.jit(lambda p, xx: m.apply(p, xx).sum())
    dt = timeit(fwd, pa, x)
    report("ARM-B fwd B32", dt, arm_flops, 32)

    step = jax.jit(jax.value_and_grad(
        lambda p, xx: jnp.mean(m.apply(p, xx).astype(jnp.float32) ** 2)))
    dt = timeit(lambda p, xx: step(p, xx)[0], pa, x)
    report("ARM-B fwd+bwd B32", dt, 3 * arm_flops, 32)

    # ---- VSSM-T ----
    from medical_image_analysis_tpu.models.vmamba import build_vssm
    vm = build_vssm("vssm_tiny")
    xv = jnp.ones((64, 224, 224, 3), jnp.bfloat16)
    pv = vm.init(jax.random.PRNGKey(1), xv)
    pv = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), pv)
    # VSSM-T: stages (2,2,5,2) at dims (96,192,384,768), tokens
    # (3136,784,196,49), SS2D ssm_ratio=2, d_state=16, dt_rank=dim/16,
    # K=4 scans, plus a 4x MLP per block; downsample/patch-embed
    # matmuls included coarsely (dwconv ignored, <1%).
    vssm_flops = 2 * 3136 * (4 * 4 * 3) * 96  # patch embed
    for depth, dim, tok in ((2, 96, 3136), (2, 192, 784),
                            (5, 384, 196), (2, 768, 49)):
        layer = mamba_layer_matmul_flops(tok, dim, 2, 16, -(-dim // 16), 4)
        layer += 2 * 2 * tok * dim * 4 * dim  # MLP block
        vssm_flops += depth * layer
        if dim != 768:
            vssm_flops += 2 * (tok // 4) * (4 * dim) * (2 * dim)  # merge
    fv = jax.jit(lambda p, xx: vm.apply(p, xx).sum())
    dt = timeit(fv, pv, xv)
    report("VSSM-T fwd B64", dt, vssm_flops, 64)

    stepv = jax.jit(jax.value_and_grad(
        lambda p, xx: jnp.mean(vm.apply(p, xx).astype(jnp.float32) ** 2)))
    dt = timeit(lambda p, xx: stepv(p, xx)[0], pv, xv)
    report("VSSM-T fwd+bwd B64", dt, 3 * vssm_flops, 64)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

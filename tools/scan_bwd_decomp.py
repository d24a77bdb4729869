"""Decompose the scan_n1 BACKWARD: kernel vs XLA integration glue.

glue_bwd_probe found the in-model scan at 161.9 ms fwd+bwd (B=128,
vssm1_tiny) vs 114.7 ms "standalone" — because the standalone
methodology (bench_vssm1.layer_times, loss = sum(y)) hands the VJP a
constant dy = ones, which lets XLA constant-fold the entire dy
assembly/tiling path.  This tool times, at each vssm1 stage shape:

  fwd            scan_n1_dirs forward
  bwd_ones       VJP with dy = ones          (the old, flattering number)
  bwd_real       VJP with random dy          (what the model actually pays)
  bwd_core       VJP of _scan_n1_core alone on pre-tiled args, random dy
                 (both direction launches; kernel + barrier cost only)

bwd_real - 2*bwd_core ~= the XLA integration share (u/xd tiling VJPs,
x_dbl einsum pullbacks, y/dy merge transposes).

Usage: python tools/scan_bwd_decomp.py [batch] [model]
"""

import math
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from tools.sweep_scan import timeit  # noqa: E402
from medical_image_analysis_tpu.ops import scan_n1 as sn1  # noqa: E402
from medical_image_analysis_tpu.models.vmamba import VSSM_CONFIGS  # noqa: E402

IMG = 224


def stage_shapes(name):
    cfg = VSSM_CONFIGS[name]
    out = []
    hw = IMG // 4
    for depth, dim in zip(cfg["depths"], cfg["dims"]):
        out.append((depth, hw * hw, 2 * dim, math.ceil(dim / 16)))
        hw //= 2
    return out


def stage_times(batch, l, d_inner, rank):
    rng = np.random.default_rng(0)

    def f(*shape, scale=0.3):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    xr = f(batch, l, d_inner).astype(jnp.bfloat16)
    xc = f(batch, l, d_inner).astype(jnp.bfloat16)
    p = dict(
        x_proj_w=f(4, rank + 2, d_inner),
        dt_proj_w=f(4, d_inner, rank),
        dt_bias=f(4, d_inner),
        A=-jnp.exp(f(4, d_inner, 1)),
        D=f(4, d_inner),
    )
    dy = f(batch, 4, l, d_inner).astype(jnp.bfloat16)
    ones = jnp.ones_like(dy)

    def fwd(xr, xc, p):
        return sn1.scan_n1_dirs(xr, xc, **p)

    jfwd = jax.jit(fwd)
    t_f = timeit(lambda: jfwd(xr, xc, p))

    @jax.jit
    def bwd(xr, xc, p, ct):
        _, vjp = jax.vjp(fwd, xr, xc, p)
        return vjp(ct)[0]

    t_ones = timeit(lambda: bwd(xr, xc, p, ones)) - t_f
    t_real = timeit(lambda: bwd(xr, xc, p, dy)) - t_f

    # Core-only: pre-tile everything exactly as scan_n1_dirs does, then
    # vjp the custom-vjp core (kernel + barriers, no tiling/einsum VJPs).
    chunk = sn1._pick_chunk(l)
    block_d = max(sn1._pick_block_d(d_inner), 128)
    bt = -(-batch // 8)
    a_vec = p["A"].reshape(4, -1).astype(jnp.float32)
    d_vec = p["D"].astype(jnp.float32)
    db = p["dt_bias"].astype(jnp.float32)
    wdt_t = p["dt_proj_w"].astype(jnp.float32).transpose(0, 2, 1)
    wx = p["x_proj_w"].astype(jnp.float32)
    srcs = (xr, xc, xr, xc)
    x_dbl = jnp.stack(
        [
            jnp.einsum("bld,cd->blc", srcs[k].astype(jnp.float32), wx[k])
            for k in range(4)
        ],
        axis=1,
    )
    u_p = jnp.stack(
        [sn1._to_tiles(xr, bt), sn1._to_tiles(xc, bt)], axis=0
    )
    u_p = sn1._pad_to(sn1._pad_to(u_p, chunk, 2), block_d, 4)

    def xd_tiles(k):
        return sn1._pad_to(sn1._to_tiles(x_dbl[:, k], bt), chunk, 1)

    lp = u_p.shape[2]
    t_core = 0.0
    for reverse, lo in ((False, 0), (True, 2)):
        xd = jnp.stack([xd_tiles(k) for k in (lo, lo + 1)], axis=0)
        args = (
            u_p, xd,
            sn1._pad_to(wdt_t[lo : lo + 2], block_d, 2),
            sn1._pad_to(db[lo : lo + 2], block_d, 1)[:, None, :],
            sn1._pad_to(a_vec[lo : lo + 2], block_d, 1)[:, None, :],
            sn1._pad_to(d_vec[lo : lo + 2], block_d, 1)[:, None, :],
        )
        dyc = f(2, bt, lp, 8, u_p.shape[-1]).astype(jnp.bfloat16)

        def core(*a):
            return sn1._scan_n1_core(
                *a, True, chunk, block_d, False, reverse
            )

        jcore = jax.jit(core)
        tc_f = timeit(lambda: jcore(*args))

        @jax.jit
        def core_bwd(ct, *a):
            _, vjp = jax.vjp(core, *a)
            return vjp(ct)[0]

        t_core += timeit(lambda: core_bwd(dyc, *args)) - tc_f
    return t_f, t_ones, t_real, t_core


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    name = sys.argv[2] if len(sys.argv) > 2 else "vssm1_tiny"
    print(f"backend={jax.default_backend()} B={batch} model={name}")
    tot = [0.0] * 4
    for i, (depth, l, d_inner, rank) in enumerate(stage_shapes(name)):
        t_f, t_ones, t_real, t_core = stage_times(batch, l, d_inner, rank)
        print(
            f"stage{i} (L={l}, Din={d_inner}) x{depth}: fwd {t_f:.2f}  "
            f"bwd_ones {t_ones:.2f}  bwd_real {t_real:.2f}  "
            f"bwd_core {t_core:.2f}  integ {t_real - t_core:.2f} ms",
            flush=True,
        )
        for j, t in enumerate((t_f, t_ones, t_real, t_core)):
            tot[j] += depth * t
    print(
        f"totals: fwd {tot[0]:.1f}  bwd_ones {tot[1]:.1f}  "
        f"bwd_real {tot[2]:.1f}  bwd_core {tot[3]:.1f}  "
        f"integration {tot[2] - tot[3]:.1f} ms"
    )


if __name__ == "__main__":
    main()

"""Glue speed-of-light: price every non-scan op of a VSSM-T training
step against the hardware ceilings, the way tools/scan_mfu.py priced
the scan (VERDICT r4 item 1, OR-branch).

The round-5 decomposition (BENCH_QUEUE_r5/vssm_profile.log) puts the
fused scan layers at 273 of 351 ms fwd+bwd (B=64) and glue at 78 ms.
The scan side has a written SoL (BENCH.md "Scan speed-of-light
analysis": 59-78% of its dependence-free ceiling, per-(d,n) decay rules
out the MXU). This tool closes the glue side:

  1. measure achievable HBM bandwidth (big-copy probe) and bf16 matmul
     throughput at the stage shapes (MXU probe);
  2. time every glue op of one VSSBlock standalone at each stage's
     exact shape, fwd and fwd+bwd (value_and_grad with sum-loss);
  3. compute each op's analytic HBM bytes + matmul FLOPs, convert to a
     ceiling ms = max(bytes / BW, flops / TF), and report achieved vs
     ceiling per op and summed.

Glue ops per VSSBlock (models/vmamba.py:50-139, fused path):
LN -> in_proj -> silu(z) -> dwconv3x3 -> silu(x) -> xc transpose ->
[scan kernel] -> y merge (2 adds + col transpose) -> out_norm ->
z-gate -> out_proj -> MLP(norm2 + D->4D gelu 4D->D) -> residuals.

Usage: python tools/glue_sol.py [batch]
"""

import math
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from tools.sweep_scan import timeit  # noqa: E402

# (name, H, W, d_model, depth) for VSSM-T at 224^2
STAGES = [
    ("stage0", 56, 56, 96, 2),
    ("stage1", 28, 28, 192, 2),
    ("stage2", 14, 14, 384, 5),
    ("stage3", 7, 7, 768, 2),
]
MLP_RATIO = 4.0
DT = jnp.bfloat16


def probe_hbm_gbps():
    """Achievable HBM bandwidth: y = x + 1 on a 512 MB bf16 array
    (read + write = 2x bytes)."""
    x = jnp.zeros((256, 1024, 1024), DT)
    f = jax.jit(lambda x: x + 1)
    ms = timeit(lambda: f(x))
    return 2 * x.size * 2 / (ms * 1e-3) / 1e9


def probe_mxu_tflops(m=8192, k=4096, n=4096):
    """Achievable bf16 matmul TFLOP/s at a fat shape."""
    a = jnp.zeros((m, k), DT)
    b = jnp.zeros((k, n), DT)
    f = jax.jit(lambda a, b: a @ b)
    ms = timeit(lambda: f(a, b))
    return 2 * m * k * n / (ms * 1e-3) / 1e12


def _t(f, *args):
    jf = jax.jit(f)
    fwd = timeit(lambda: jf(*args))

    def loss(*a):
        return jnp.sum(f(*a).astype(jnp.float32))

    ndiff = tuple(
        i for i, a in enumerate(args)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
    )
    g = jax.jit(jax.grad(loss, argnums=ndiff))
    fb = timeit(lambda: g(*args)[0])
    return fwd, fb


def stage_ops(batch, h, w, d):
    """Return [(op_name, fwd_ms, fwdbwd_ms, bytes_fwd, flops_fwd)] for
    one VSSBlock's glue at this stage shape. bytes_fwd counts HBM reads
    + writes of the op in isolation (bf16); flops_fwd counts matmul
    FLOPs only (elementwise FLOPs never bind before bandwidth does)."""
    rng = np.random.default_rng(0)
    din = 2 * d
    l = h * w
    e = 2  # bf16 bytes

    def f(*shape, scale=0.1):
        return jnp.asarray(rng.standard_normal(shape) * scale, DT)

    x_bhwd = f(batch, h, w, d)
    x_bhwc = f(batch, h, w, din)
    x_bld = f(batch, l, din)
    y_dirs = f(batch, 4, l, din)
    w_in = f(d, 2 * din)
    w_out = f(din, d)
    w_mlp1 = f(d, int(MLP_RATIO * d))
    w_mlp2 = f(int(MLP_RATIO * d), d)
    w_dw = f(3, 3, 1, din)
    sc = f(d)

    ops = []

    def add(name, fwd, fb, nbytes, flops):
        ops.append((name, fwd, fb, nbytes, flops))

    # LayerNorm (pre-SSM norm; out_norm and norm2 have the same shape
    # classes — count them separately below)
    fwd, fb = _t(
        lambda x, s: nn.LayerNorm().apply(
            {"params": {"scale": s, "bias": jnp.zeros_like(s)}}, x
        ),
        x_bhwd, sc,
    )
    add("ln(d)", fwd, fb, batch * l * d * e * 2, 0)

    # in_proj
    fwd, fb = _t(lambda x, w: x @ w, x_bhwd, w_in)
    add("in_proj", fwd, fb,
        batch * l * (d + 2 * din) * e, 2 * batch * l * d * 2 * din)

    # silu on (B,L,Din) (z-gate silu; xi silu identical)
    fwd, fb = _t(nn.silu, x_bld)
    add("silu", fwd, fb, batch * l * din * e * 2, 0)

    # depthwise 3x3 conv
    fwd, fb = _t(
        lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", feature_group_count=din,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ),
        x_bhwc, w_dw,
    )
    add("dwconv3x3", fwd, fb, batch * l * din * e * 2, 0)

    # xc transpose (row-major -> column-major copy for the kernel)
    fwd, fb = _t(
        lambda x: x.reshape(batch, h, w, din).transpose(0, 2, 1, 3)
        .reshape(batch, l, din),
        x_bld,
    )
    add("xc transpose", fwd, fb, batch * l * din * e * 2, 0)

    # y merge: (B,4,L,Din) -> y_row + y_col with one inverse transpose
    def merge(yf):
        y_row = yf[:, 0] + yf[:, 1]
        y_col = (yf[:, 2] + yf[:, 3]).reshape(batch, w, h, din)
        y_col = y_col.transpose(0, 2, 1, 3).reshape(batch, l, din)
        return y_row + y_col

    fwd, fb = _t(merge, y_dirs)
    add("y merge", fwd, fb, batch * l * din * e * (4 + 1), 0)

    # out_norm (LN on d_inner)
    fwd, fb = _t(
        lambda x, s: nn.LayerNorm().apply(
            {"params": {"scale": s, "bias": jnp.zeros_like(s)}}, x
        ),
        x_bld, f(din),
    )
    add("out_norm", fwd, fb, batch * l * din * e * 2, 0)

    # z gate
    fwd, fb = _t(lambda a, b: a * b, x_bld, x_bld)
    add("z gate", fwd, fb, batch * l * din * e * 3, 0)

    # out_proj
    fwd, fb = _t(lambda x, w: x @ w, x_bld, w_out)
    add("out_proj", fwd, fb,
        batch * l * (din + d) * e, 2 * batch * l * din * d)

    # MLP: Dense(4d) + gelu + Dense(d)  (norm2 counted via ln(d) twice)
    dm = int(MLP_RATIO * d)
    fwd, fb = _t(
        lambda x, w1, w2: nn.gelu(x @ w1) @ w2, x_bhwd, w_mlp1, w_mlp2,
    )
    add("mlp", fwd, fb,
        batch * l * (d + dm + d) * e, 2 * batch * l * d * dm * 2)

    # residual add x2
    fwd, fb = _t(lambda a, b: a + b, x_bhwd, x_bhwd)
    add("residual", fwd, fb, batch * l * d * e * 3, 0)

    return ops


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    print(f"backend={jax.default_backend()} B={batch}")
    bw = probe_hbm_gbps()
    tf = probe_mxu_tflops()
    print(f"probes: HBM {bw:.0f} GB/s achievable, MXU {tf:.0f} bf16 TF/s")

    tot_f = tot_fb = tot_ceil_f = 0.0
    for name, h, w, d, depth in STAGES:
        print(f"-- {name}: {h}x{w} d={d} x{depth}")
        ops = stage_ops(batch, h, w, d)
        sf = sfb = sc_ = 0.0
        for op, fwd, fb, nbytes, flops in ops:
            # double-count the ln(d) row (norm + norm2 per block)
            mult = 2 if op == "ln(d)" else 1
            ceil = max(nbytes / bw / 1e6, flops / tf / 1e9)
            sf += mult * fwd
            sfb += mult * fb
            sc_ += mult * ceil
            print(
                f"  {op:13s}: fwd {fwd:6.2f} ms  fwd+bwd {fb:6.2f} ms  "
                f"ceiling {ceil:5.2f} ms  ({fwd / max(ceil, 1e-9):4.1f}x)"
            )
        print(
            f"  {name} glue/block: fwd {sf:.2f} ms (ceil {sc_:.2f}), "
            f"fwd+bwd {sfb:.2f} ms; x{depth} -> "
            f"fwd {depth * sf:.1f} / fb {depth * sfb:.1f} ms"
        )
        tot_f += depth * sf
        tot_fb += depth * sfb
        tot_ceil_f += depth * sc_

    print(
        f"glue total (standalone op sum): fwd {tot_f:.1f} ms "
        f"(hbm/mxu ceiling {tot_ceil_f:.1f} ms), fwd+bwd {tot_fb:.1f} ms"
    )
    print(
        "note: standalone sums over-count vs the fused model (XLA fuses "
        "adjacent elementwise ops into the matmuls inside one jit); "
        "compare against profile_vssm_step's glue-by-subtraction."
    )


if __name__ == "__main__":
    main()

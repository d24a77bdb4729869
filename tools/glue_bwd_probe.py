"""Attribute the vssm1 glue BACKWARD milliseconds to components.

Round-5 state (BENCH_QUEUE_r5/vssm1_tiny_b128.log): vssm1_tiny at B=128
runs fwd 88.9 ms with glue (model - scan) at 21.5 ms, but fwd+bwd is
268.0 ms with glue at 153.3 ms — the glue backward costs ~6x its
forward, far above the ~2x matmul-bwd ratio.  ROADMAP names the glue
backward (in_proj/dwconv/gating/MLP) the next lever.

This probe measures full-model fwd and fwd+bwd with one glue component
at a time removed or replaced (fresh params per variant; timing only):

  baseline       the real model (scan_backend='auto' -> scan_n1)
  scan_stub      scan_n1_dirs -> shape-preserving elementwise (glue-only)
  no_conv        depthwise conv2d skipped
  shiftadd_conv  depthwise conv2d as 9 shifted adds (candidate fix:
                 XLA depthwise conv grads are the usual TPU pathology)
  no_out_norm    SS2D out_norm skipped
  no_merge_t     y_col transpose skipped (shape-preserving add instead)
  no_mlp         mlp_ratio=0 (block MLP gone)
  no_silu        silu after conv replaced by identity

Deltas vs baseline price each component's fwd and bwd share.

Usage: python tools/glue_bwd_probe.py [batch] [model]
"""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import flax.linen as nn  # noqa: E402

from tools.sweep_scan import timeit  # noqa: E402
from medical_image_analysis_tpu.models import vmamba  # noqa: E402
from medical_image_analysis_tpu.ops import scan_n1 as sn1  # noqa: E402

IMG = 224


def shiftadd_dwconv3x3(x, w, b=None):
    """3x3 depthwise conv as 9 shifted elementwise FMAs (NHWC, SAME).

    w: (3, 3, 1, C) HWIO depthwise kernel (flax Conv layout with
    feature_group_count=C).
    """
    bsz, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros_like(x, dtype=jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc = acc + xp[:, dy : dy + h, dx : dx + wd, :].astype(
                jnp.float32
            ) * w[dy, dx, 0].astype(jnp.float32)
    if b is not None:
        acc = acc + b.astype(jnp.float32)
    return acc.astype(x.dtype)


class ProbeSS2D(nn.Module):
    """SS2D clone (d_state=1 noz path only) with per-component toggles."""

    d_model: int
    d_state: int = 1
    ssm_ratio: float = 2.0
    dt_rank: int = 0
    d_conv: int = 3
    conv_bias: bool = False
    proj_bias: bool = False
    dropout: float = 0.0
    dt_min: float = 1e-3
    dt_max: float = 0.1
    dt_init_floor: float = 1e-4
    disable_z: bool = True
    scan_backend: str = "auto"

    variant: str = "baseline"

    @nn.compact
    def __call__(self, x, deterministic=True):
        import math

        from medical_image_analysis_tpu.models.mamba import (
            _a_log_init, _dt_bias_init, _uniform_init,
        )

        v = self.variant
        b, h, w, _ = x.shape
        d_inner = int(self.ssm_ratio * self.d_model)
        rank = self.dt_rank or math.ceil(self.d_model / 16)

        xi = nn.Dense(d_inner, use_bias=self.proj_bias, name="in_proj")(x)
        if self.d_conv > 1 and v != "no_conv":
            if v == "shiftadd_conv":
                cw = self.param(
                    "conv_w",
                    nn.initializers.lecun_normal(),
                    (3, 3, 1, d_inner),
                )
                xi = shiftadd_dwconv3x3(xi, cw)
            else:
                xi = nn.Conv(
                    d_inner, kernel_size=(self.d_conv, self.d_conv),
                    padding="SAME", feature_group_count=d_inner,
                    use_bias=self.conv_bias, name="conv2d",
                )(xi)
        if v != "no_silu":
            xi = nn.silu(xi)

        x_proj_w = self.param(
            "x_proj_w", _uniform_init(d_inner**-0.5),
            (4, rank + 2 * self.d_state, d_inner),
        )
        dt_proj_w = self.param(
            "dt_proj_w", _uniform_init(rank**-0.5), (4, d_inner, rank)
        )
        dt_bias = self.param(
            "dt_bias",
            _dt_bias_init(self.dt_min, self.dt_max, self.dt_init_floor),
            (4, d_inner),
        )
        a_log = self.param("A_log", _a_log_init, (4, d_inner, self.d_state))
        d_skip = self.param("D", nn.initializers.ones, (4, d_inner))
        a = -jnp.exp(a_log.astype(jnp.float32))

        xr = xi.reshape(b, h * w, d_inner)
        xc = xi.transpose(0, 2, 1, 3).reshape(b, h * w, d_inner)
        if v == "scan_stub":
            s = d_skip.sum() * 1e-3
            y_f = jnp.stack(
                [xr, xc, xr * 0.5 + s, xc * 0.5 + s], axis=1
            ).astype(xr.dtype)
        else:
            y_f = sn1.scan_n1_dirs(
                xr, xc, x_proj_w, dt_proj_w, dt_bias, a, d_skip,
                delta_softplus=True,
            )
        y_row = y_f[:, 0] + y_f[:, 2]
        y_col = y_f[:, 1] + y_f[:, 3]
        if v == "no_merge_t":
            y = y_row + y_col
        else:
            y_col = (
                y_col.reshape(b, w, h, d_inner)
                .transpose(0, 2, 1, 3)
                .reshape(b, h * w, d_inner)
            )
            y = y_row + y_col
        if v != "no_out_norm":
            y = nn.LayerNorm(name="out_norm")(y)
        y = y.reshape(b, h, w, d_inner)
        return nn.Dense(self.d_model, use_bias=self.proj_bias,
                        name="out_proj")(y)


def model_times(batch, name, variant):
    overrides = {}
    if variant == "no_mlp":
        overrides["mlp_ratio"] = 0.0
    model = vmamba.build_vssm(name, **overrides)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, IMG, IMG, 3)),
        jnp.bfloat16,
    )
    orig = vmamba.SS2D
    if variant not in ("baseline", "no_mlp"):
        # The annotation is required: a bare class attribute does not
        # override a dataclass field default (instances would silently
        # keep variant="baseline").
        probe = type(
            "ProbeSS2D", (ProbeSS2D,),
            {"variant": variant, "__annotations__": {"variant": str}},
        )
        assert probe(d_model=8).variant == variant
        vmamba.SS2D = probe
    try:
        params = model.init(jax.random.PRNGKey(0), x[:2])
        params = jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16), params
        )
        fwd = jax.jit(lambda p, x: model.apply(p, x))
        t_f = timeit(lambda: fwd(params, x))

        def loss(p, x):
            return jnp.sum(model.apply(p, x).astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss))
        t_fb = timeit(lambda: jax.tree_util.tree_leaves(g(params, x))[0])
    finally:
        vmamba.SS2D = orig
    return t_f, t_fb


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    name = sys.argv[2] if len(sys.argv) > 2 else "vssm1_tiny"
    variants = [
        "baseline", "scan_stub", "no_conv", "shiftadd_conv",
        "no_out_norm", "no_merge_t", "no_mlp", "no_silu",
    ]
    if len(sys.argv) > 3:
        variants = sys.argv[3].split(",")
    print(f"backend={jax.default_backend()} B={batch} model={name}")
    base = None
    for v in variants:
        t_f, t_fb = model_times(batch, name, v)
        line = f"{v:14s} fwd {t_f:7.1f} ms   fwd+bwd {t_fb:7.1f} ms"
        if v == "baseline":
            base = (t_f, t_fb)
        elif base is not None:
            line += (
                f"   (delta vs base: fwd {base[0] - t_f:+6.1f}, "
                f"fwd+bwd {base[1] - t_fb:+6.1f})"
            )
        print(line, flush=True)


if __name__ == "__main__":
    main()

"""VMamba: SS2D 2D-selective-scan mixer and the hierarchical VSSM backbone.

TPU-native re-design of the reference VMamba
(``/root/reference/R2GenCSR/VMamba/classification/models/vmamba.py``:
``SS2D`` :540, ``cross_selective_scan`` :318-427, ``VSSBlock`` :1218,
``VSSM`` :1305-1603):

- The K=4 directional scans run as ONE Pallas launch with the direction
  axis folded into batch (:func:`selective_scan_dirs`); cross scan/merge
  are pure layout transforms fused by XLA (:mod:`..ops.cross_scan`)
  instead of the Triton kernels (``csm_triton.py``).
- Channels-last everywhere; the selective scan is time-major (B, L, D).
- fp32 recurrence inside the kernel (the reference forces fp32 A/D/bias,
  vmamba.py:394-404); activations may be bf16.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.cross_scan import cross_merge, cross_scan
from ..ops.selective_scan import selective_scan_ref
from ..ops.selective_scan_pallas import selective_scan_dirs
from .common import DropPath, Mlp
from .mamba import _a_log_init, _dt_bias_init, _uniform_init


class SS2D(nn.Module):
    """2D selective scan mixer (forward_type v2/v3 semantics)."""

    d_model: int
    d_state: int = 16
    ssm_ratio: float = 2.0
    dt_rank: int = 0  # 0 = ceil(d_model/16)
    d_conv: int = 3
    conv_bias: bool = True
    proj_bias: bool = False
    dropout: float = 0.0
    dt_min: float = 1e-3
    dt_max: float = 0.1
    dt_init_floor: float = 1e-4
    disable_z: bool = False
    scan_backend: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b, h, w, _ = x.shape
        d_inner = int(self.ssm_ratio * self.d_model)
        rank = self.dt_rank or math.ceil(self.d_model / 16)
        n = self.d_state
        k = 4

        if self.disable_z:
            # "noz" forward types (vssm1 nightly configs, vmamba.py:706,
            # :750, :1113-1127): in_proj emits only the scan branch; no
            # gate multiply before out_proj.
            xi = nn.Dense(d_inner, use_bias=self.proj_bias, name="in_proj")(x)
            z = None
        else:
            xz = nn.Dense(
                2 * d_inner, use_bias=self.proj_bias, name="in_proj"
            )(x)
            xi, z = jnp.split(xz, 2, axis=-1)
            z = nn.silu(z)
        if self.d_conv > 1:
            xi = nn.Conv(
                d_inner,
                kernel_size=(self.d_conv, self.d_conv),
                padding="SAME",
                feature_group_count=d_inner,
                use_bias=self.conv_bias,
                name="conv2d",
            )(xi)
        xi = nn.silu(xi)

        x_proj_w = self.param(
            "x_proj_w", _uniform_init(d_inner**-0.5), (k, rank + 2 * n, d_inner)
        )
        dt_proj_w = self.param(
            "dt_proj_w", _uniform_init(rank**-0.5), (k, d_inner, rank)
        )
        dt_bias = self.param(
            "dt_bias",
            _dt_bias_init(self.dt_min, self.dt_max, self.dt_init_floor),
            (k, d_inner),
        )
        a_log = self.param("A_log", _a_log_init, (k, d_inner, n))
        d_skip = self.param("D", nn.initializers.ones, (k, d_inner))

        a = -jnp.exp(a_log.astype(jnp.float32))
        backend = self.scan_backend
        if backend == "auto":
            backend = "fused" if jax.default_backend() == "tpu" else "ref"

        if backend == "fused" and n == 1:
            # d_state=1 (every vssm1 nightly config, and the backbone
            # R2GenCSR actually loads — R2GenCSR.py:79): the batch-packed
            # N=1 kernel runs the chain at full VPU width, and the
            # forward/reverse direction pairs merge inside the kernel
            # (aliased accumulation), so only the two per-source sums
            # cross the kernel boundary. Param order is already
            # reference order [row, col, row-rev, col-rev].
            from ..ops.scan_n1 import scan_n1_sources

            xr = xi.reshape(b, h * w, d_inner)
            xc = xi.transpose(0, 2, 1, 3).reshape(b, h * w, d_inner)
            y_row, y_col = scan_n1_sources(
                xr, xc, x_proj_w, dt_proj_w, dt_bias, a, d_skip,
                delta_softplus=True,
            )
            y_col = (
                y_col.reshape(b, w, h, d_inner)
                .transpose(0, 2, 1, 3)
                .reshape(b, h * w, d_inner)
            )
            y = y_row + y_col
        elif backend == "fused":
            # Fused kernel: cross-scan layouts ride the kernel's index
            # maps (dirs [row, row-rev, col, col-rev]); the param axis
            # stays in reference order [row, col, row-rev, col-rev], so
            # gather with the permutation between the two.
            from ..ops.mamba_fused import mamba_fused_dirs

            perm = jnp.asarray([0, 2, 1, 3])
            xr = xi.reshape(b, h * w, d_inner)
            xc = xi.transpose(0, 2, 1, 3).reshape(b, h * w, d_inner)
            y_f = mamba_fused_dirs(
                xr, xc, None, None, x_proj_w[perm], dt_proj_w[perm],
                dt_bias[perm], a[perm], d_skip[perm],
                delta_softplus=True,
            )
            y_row = y_f[:, 0] + y_f[:, 1]
            y_col = y_f[:, 2] + y_f[:, 3]
            y_col = (
                y_col.reshape(b, w, h, d_inner)
                .transpose(0, 2, 1, 3)
                .reshape(b, h * w, d_inner)
            )
            y = y_row + y_col
        else:
            xs = cross_scan(xi)  # (B, 4, L, Din)
            x_dbl = jnp.einsum("bkld,kcd->bklc", xs, x_proj_w)
            dt_r = x_dbl[..., :rank]
            bmat = x_dbl[..., rank : rank + n]
            cmat = x_dbl[..., rank + n :]
            dt = jnp.einsum("bklr,kdr->bkld", dt_r, dt_proj_w)
            if backend == "pallas":
                y_dirs = selective_scan_dirs(
                    xs, dt, a, bmat, cmat, d_skip, dt_bias,
                    delta_softplus=True,
                )
            else:
                ys = [
                    selective_scan_ref(
                        xs[:, i], dt[:, i], a[i], bmat[:, i], cmat[:, i],
                        d_skip[i], dt_bias[i], delta_softplus=True,
                    )
                    for i in range(k)
                ]
                y_dirs = jnp.stack(ys, axis=1)
            y = cross_merge(y_dirs, h, w)  # (B, L, Din)
        y = nn.LayerNorm(name="out_norm")(y)
        y = y.reshape(b, h, w, d_inner)
        if z is not None:
            y = y * z
        out = nn.Dense(self.d_model, use_bias=self.proj_bias, name="out_proj")(y)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class VSSBlock(nn.Module):
    """SS2D + optional MLP, both pre-norm residual (vmamba.py:1218-1303)."""

    dim: int
    d_state: int = 16
    ssm_ratio: float = 2.0
    ssm_conv: int = 3
    conv_bias: bool = True
    disable_z: bool = False
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    scan_backend: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.ssm_ratio > 0:
            y = nn.LayerNorm(name="norm")(x)
            y = SS2D(
                d_model=self.dim,
                d_state=self.d_state,
                ssm_ratio=self.ssm_ratio,
                d_conv=self.ssm_conv,
                conv_bias=self.conv_bias,
                disable_z=self.disable_z,
                scan_backend=self.scan_backend,
                name="op",
            )(y, deterministic)
            x = x + DropPath(self.drop_path, name="drop_path1")(y, deterministic)
        if self.mlp_ratio > 0:
            y = nn.LayerNorm(name="norm2")(x)
            y = Mlp(int(self.dim * self.mlp_ratio), name="mlp")(y, deterministic)
            x = x + DropPath(self.drop_path, name="drop_path2")(y, deterministic)
        return x


class VSSM(nn.Module):
    """Hierarchical 4-stage VMamba backbone (vmamba.py:1305-1603).

    (B, H, W, 3) -> pooled (B, C_last) if ``pool`` else the stage-4
    feature map (B, H/32, W/32, C_last).
    """

    depths: Sequence[int] = (2, 2, 5, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    patch_size: int = 4
    d_state: int = 16
    ssm_ratio: float = 2.0
    conv_bias: bool = True
    disable_z: bool = False
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    patch_embed_version: str = "v1"
    scan_backend: str = "auto"

    @nn.compact
    def __call__(
        self, x: jax.Array, pool: bool = True, deterministic: bool = True
    ) -> jax.Array:
        p = self.patch_size
        if self.patch_embed_version == "v2":
            # _make_patch_embed_v2 (vmamba.py:1449-1461): two 3x3/s2
            # convs with LN + GELU between, LN after.
            assert p == 4
            x = nn.Conv(
                self.dims[0] // 2, kernel_size=(3, 3), strides=(2, 2),
                padding=((1, 1), (1, 1)), name="patch_embed",
            )(x)
            if self.patch_norm:
                x = nn.LayerNorm(name="patch_norm")(x)
            x = nn.gelu(x, approximate=False)
            x = nn.Conv(
                self.dims[0], kernel_size=(3, 3), strides=(2, 2),
                padding=((1, 1), (1, 1)), name="patch_embed2",
            )(x)
            if self.patch_norm:
                x = nn.LayerNorm(name="patch_norm2")(x)
        else:
            x = nn.Conv(
                self.dims[0], kernel_size=(p, p), strides=(p, p),
                padding="VALID", name="patch_embed",
            )(x)
            if self.patch_norm:
                x = nn.LayerNorm(name="patch_norm")(x)

        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        idx = 0
        for stage, depth in enumerate(self.depths):
            for blk in range(depth):
                x = VSSBlock(
                    dim=self.dims[stage],
                    d_state=self.d_state,
                    ssm_ratio=self.ssm_ratio,
                    conv_bias=self.conv_bias,
                    disable_z=self.disable_z,
                    mlp_ratio=self.mlp_ratio,
                    drop_path=dpr[idx],
                    scan_backend=self.scan_backend,
                    name=f"stage{stage}_block{blk}",
                )(x, deterministic)
                idx += 1
            if stage < len(self.depths) - 1:
                # downsample v3: 3x3 stride-2 conv + LN (vmamba.py
                # downsample). Explicit (1,1) padding — torch padding=1;
                # flax "SAME" would pad (0,1) and shift every window
                # (caught by the reference-golden test).
                x = nn.Conv(
                    self.dims[stage + 1], kernel_size=(3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), name=f"downsample{stage}",
                )(x)
                x = nn.LayerNorm(name=f"downsample_norm{stage}")(x)

        x = nn.LayerNorm(name="norm")(x)
        if pool:
            return jnp.mean(x, axis=(1, 2))
        return x


_V1 = dict(
    d_state=1, disable_z=True, conv_bias=False, patch_embed_version="v2",
)
VSSM_CONFIGS = {
    "vssm_tiny": dict(depths=(2, 2, 5, 2), dims=(96, 192, 384, 768)),
    "vssm_small": dict(depths=(2, 2, 15, 2), dims=(96, 192, 384, 768)),
    "vssm_base": dict(depths=(2, 2, 15, 2), dims=(128, 256, 512, 1024)),
    # vssm1 "nightly" family — the configs the reference actually ships
    # and benchmarks: d_state=1, noz forward, conv bias off, patch embed
    # v2 (VMamba/classification/configs/vssm1/*.yaml; R2GenCSR.py:79
    # loads vssm1_base as the production vision tower; the published
    # speed table VMamba/README.md:44-66 is vssm_tiny_224_0220).
    "vssm1_tiny": dict(
        depths=(2, 2, 4, 2), dims=(96, 192, 384, 768), **_V1
    ),
    "vssm1_small": dict(
        depths=(2, 2, 15, 2), dims=(96, 192, 384, 768), **_V1
    ),
    "vssm1_base": dict(
        depths=(2, 2, 15, 2), dims=(128, 256, 512, 1024), **_V1
    ),
}


def build_vssm(name: str, **overrides) -> VSSM:
    cfg = dict(VSSM_CONFIGS[name])
    cfg.update(overrides)
    return VSSM(**cfg)

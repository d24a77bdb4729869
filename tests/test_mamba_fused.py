"""Fused Mamba layer kernel vs the unfused reference composition.

Checks forward parity and gradients of every parameter against the
composition conv -> x_proj -> dt_proj -> selective_scan_ref per
direction (the semantics of the reference's mamba_inner_fn /
bimamba_inner_fn, ``mamba_simple.py:16-33``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medical_image_analysis_tpu.ops.causal_conv import causal_conv1d
from medical_image_analysis_tpu.ops.mamba_fused import mamba_fused_dirs
from medical_image_analysis_tpu.ops.selective_scan import selective_scan_ref


def _make(k_dirs, b=2, l=10, d=8, n=4, r=4, taps=4, seed=0):
    rng = np.random.default_rng(seed)

    def f(*shape, scale=0.5):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    xr = f(b, l, d)
    xc = f(b, l, d) if k_dirs == 4 else None
    params = dict(
        conv_w=f(k_dirs, taps, d),
        conv_b=f(k_dirs, d),
        x_proj_w=f(k_dirs, r + 2 * n, d),
        dt_proj_w=f(k_dirs, d, r),
        dt_bias=f(k_dirs, d),
        A=-jnp.exp(f(k_dirs, d, n, scale=0.3)),
        D=f(k_dirs, d),
    )
    return xr, xc, params


def _ref_dirs(xr, xc, p, use_conv=True):
    """Unfused reference: per direction, conv -> x_proj -> scan."""
    k_dirs = p["conv_w"].shape[0]
    r = p["dt_proj_w"].shape[2]
    n = p["A"].shape[2]
    ys = []
    for k in range(k_dirs):
        src = xr if k < 2 or xc is None else xc
        s = jnp.flip(src, axis=1) if k % 2 == 1 else src
        if use_conv:
            h = causal_conv1d(
                s, p["conv_w"][k], p["conv_b"][k], activation="silu"
            )
        else:
            h = s
        x_dbl = jnp.einsum("bld,cd->blc", h, p["x_proj_w"][k])
        dt = jnp.einsum("blr,dr->bld", x_dbl[..., :r], p["dt_proj_w"][k])
        y = selective_scan_ref(
            h, dt, p["A"][k], x_dbl[..., r : r + n], x_dbl[..., r + n :],
            p["D"][k], p["dt_bias"][k], delta_softplus=True,
        )
        if k % 2 == 1:
            y = jnp.flip(y, axis=1)
        ys.append(y)
    return jnp.stack(ys, axis=1)


@pytest.mark.parametrize("k_dirs", [1, 2, 4])
def test_fused_forward_parity(k_dirs):
    xr, xc, p = _make(k_dirs)
    got = mamba_fused_dirs(xr, xc, **p, chunk=4, block_d=8, interpret=True)
    want = _ref_dirs(xr, xc, p)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_fused_forward_no_conv():
    xr, xc, p = _make(4)
    got = mamba_fused_dirs(
        xr, xc, **p, chunk=4, block_d=8, interpret=True, use_conv=False
    )
    want = _ref_dirs(xr, xc, p, use_conv=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("k_dirs", [1, 4])
def test_fused_grads_match_reference(k_dirs):
    xr, xc, p = _make(k_dirs, l=9)
    names = sorted(p)

    def loss_fused(xr, xc, *vals):
        pp = dict(zip(names, vals))
        y = mamba_fused_dirs(
            xr, xc, **pp, chunk=4, block_d=8, interpret=True
        )
        return jnp.sum(jnp.sin(y))

    def loss_ref(xr, xc, *vals):
        pp = dict(zip(names, vals))
        return jnp.sum(jnp.sin(_ref_dirs(xr, xc, pp)))

    vals = [p[k] for k in names]
    args = (xr, xc, *vals) if xc is not None else (xr, None, *vals)
    argnums = tuple(
        i for i in range(len(args)) if args[i] is not None
    )
    gf = jax.grad(loss_fused, argnums=argnums)(*args)
    gr = jax.grad(loss_ref, argnums=argnums)(*args)
    labels = [("xr", "xc", *names)[i] for i in argnums]
    for name, a, b in zip(labels, gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4,
            err_msg=f"grad mismatch: {name}",
        )


def test_fused_chunked_matches_unchunked():
    """Chunk-boundary carries (conv + state): same result for any chunk."""
    xr, xc, p = _make(4, l=16)
    y1 = mamba_fused_dirs(xr, xc, **p, chunk=16, block_d=8, interpret=True)
    y2 = mamba_fused_dirs(xr, xc, **p, chunk=4, block_d=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
def test_mixer_fused_matches_ref_backend():
    """MambaMixer: fused path == per-direction ref path (v3, cls token)."""
    import flax.linen as nn  # noqa: F401
    from medical_image_analysis_tpu.models.mamba import MambaMixer

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 17, 12)) * 0.5, jnp.float32)
    kw = dict(d_model=12, d_state=4, expand=2, bimamba_type="v3",
              if_devide_out=True)
    m_ref = MambaMixer(**kw, scan_backend="ref")
    m_fused = MambaMixer(**kw, scan_backend="fused")
    params = m_ref.init(jax.random.PRNGKey(0), x, 8)
    y_ref = m_ref.apply(params, x, 8)
    y_fused = m_fused.apply(params, x, 8)
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_ref), rtol=3e-5, atol=3e-5
    )
    g_ref = jax.grad(
        lambda p: jnp.sum(jnp.sin(m_ref.apply(p, x, 8)))
    )(params)
    g_fused = jax.grad(
        lambda p: jnp.sum(jnp.sin(m_fused.apply(p, x, 8)))
    )(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
        ),
        g_fused, g_ref,
    )


@pytest.mark.slow
def test_ss2d_fused_matches_ref_backend():
    """SS2D: fused path (param-order permutation) == ref path."""
    from medical_image_analysis_tpu.models.vmamba import SS2D

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 8)) * 0.5, jnp.float32)
    kw = dict(d_model=8, d_state=4, ssm_ratio=2.0, d_conv=3)
    m_ref = SS2D(**kw, scan_backend="ref")
    m_fused = SS2D(**kw, scan_backend="fused")
    params = m_ref.init(jax.random.PRNGKey(0), x)
    y_ref = m_ref.apply(params, x)
    y_fused = m_fused.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_ref), rtol=3e-5, atol=3e-5
    )
    g_ref = jax.grad(
        lambda p: jnp.sum(jnp.sin(m_ref.apply(p, x)))
    )(params)
    g_fused = jax.grad(
        lambda p: jnp.sum(jnp.sin(m_fused.apply(p, x)))
    )(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
        ),
        g_fused, g_ref,
    )


def test_pick_chunk_rule():
    """Sweep-tuned tiling rule: chunk=64 only for long sequences."""
    from medical_image_analysis_tpu.ops.selective_scan_pallas import (
        _pick_chunk,
    )

    assert _pick_chunk(3136) == 64   # VSSM stage 1
    assert _pick_chunk(784) == 64    # VSSM stage 2
    assert _pick_chunk(512) == 64
    assert _pick_chunk(511) == 32
    assert _pick_chunk(197) == 32    # ARM-B tokens
    assert _pick_chunk(49) == 32     # VSSM stage 4

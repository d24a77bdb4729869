"""Parity of the batch-packed d_state=1 kernel vs the jnp oracle.

Oracle: ``selective_scan_ref`` (the ``selective_scan_easy`` math spec,
test_selective_scan_easy.py:14-98) restricted to N=1, run per direction
with the same x_proj/dt_proj pre-computation in plain jnp.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medical_image_analysis_tpu.ops.scan_n1 import scan_n1_dirs
from medical_image_analysis_tpu.ops.selective_scan import selective_scan_ref


def _inputs(b=4, l=33, d=24, rank=3, seed=0):
    rng = np.random.default_rng(seed)

    def f(*shape, scale=0.5):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    xr = f(b, l, d)
    # column-major copy of a (fake) 2D layout: for parity we only need
    # xc to be *some* second source; use a permuted copy.
    xc = f(b, l, d)
    params = dict(
        x_proj_w=f(4, rank + 2, d),
        dt_proj_w=f(4, d, rank),
        dt_bias=f(4, d, scale=0.2),
        A=-jnp.exp(f(4, d, 1, scale=0.3)),
        D=f(4, d),
    )
    return xr, xc, params


def _oracle(xr, xc, p):
    rank = p["dt_proj_w"].shape[-1]
    srcs = (xr, xc, xr, xc)
    revs = (False, False, True, True)
    ys = []
    for k in range(4):
        u = srcs[k]
        if revs[k]:
            u = jnp.flip(u, axis=1)
        x_dbl = jnp.einsum("bld,cd->blc", u, p["x_proj_w"][k])
        dt = jnp.einsum("blr,dr->bld", x_dbl[..., :rank], p["dt_proj_w"][k])
        bmat = x_dbl[..., rank : rank + 1]
        cmat = x_dbl[..., rank + 1 :]
        y = selective_scan_ref(
            u, dt, p["A"][k], bmat, cmat, p["D"][k], p["dt_bias"][k],
            delta_softplus=True,
        )
        if revs[k]:
            y = jnp.flip(y, axis=1)
        ys.append(y)
    return jnp.stack(ys, axis=1)


@pytest.mark.parametrize("b,l,d,rank", [(4, 33, 24, 3), (8, 64, 32, 4)])
def test_fwd_parity(b, l, d, rank):
    xr, xc, p = _inputs(b, l, d, rank)
    y_k = scan_n1_dirs(xr, xc, **p, interpret=True)
    y_o = _oracle(xr, xc, p)
    assert y_k.shape == y_o.shape
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_o),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_grad_parity():
    xr, xc, p = _inputs(5, 21, 16, 3, seed=1)
    w = jnp.asarray(
        np.random.default_rng(2).standard_normal((4, 21, 16)), jnp.float32
    )

    def loss_k(xr, xc, p):
        return jnp.sum(scan_n1_dirs(xr, xc, **p, interpret=True)
                       * w[None])

    def loss_o(xr, xc, p):
        return jnp.sum(_oracle(xr, xc, p) * w[None])

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(xr, xc, p)
    go = jax.grad(loss_o, argnums=(0, 1, 2))(xr, xc, p)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(go[0]),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(go[1]),
                               rtol=3e-4, atol=3e-4)
    for key in gk[2]:
        np.testing.assert_allclose(
            np.asarray(gk[2][key]), np.asarray(go[2][key]),
            rtol=3e-4, atol=3e-4, err_msg=key,
        )


def test_bf16_inputs_run():
    xr, xc, p = _inputs(3, 16, 16, 2, seed=3)
    y = scan_n1_dirs(xr.astype(jnp.bfloat16), xc.astype(jnp.bfloat16),
                     **p, interpret=True)
    assert y.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(y.astype(jnp.float32))))


def test_sources_matches_dirs_fwd():
    """scan_n1_sources = in-kernel direction merge of scan_n1_dirs."""
    from medical_image_analysis_tpu.ops.scan_n1 import scan_n1_sources

    xr, xc, p = _inputs(4, 33, 24, 3, seed=5)
    y_k = scan_n1_dirs(xr, xc, **p, interpret=True)
    y_row, y_col = scan_n1_sources(xr, xc, **p, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y_row), np.asarray(y_k[:, 0] + y_k[:, 2]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(y_col), np.asarray(y_k[:, 1] + y_k[:, 3]),
        rtol=1e-5, atol=1e-5,
    )


def test_sources_grad_matches_dirs():
    from medical_image_analysis_tpu.ops.scan_n1 import scan_n1_sources

    xr, xc, p = _inputs(5, 21, 16, 3, seed=6)
    rng = np.random.default_rng(7)
    wr = jnp.asarray(rng.standard_normal((5, 21, 16)), jnp.float32)
    wc = jnp.asarray(rng.standard_normal((5, 21, 16)), jnp.float32)

    def loss_s(xr, xc, p):
        y_row, y_col = scan_n1_sources(xr, xc, **p, interpret=True)
        return jnp.sum(y_row * wr) + jnp.sum(y_col * wc)

    def loss_d(xr, xc, p):
        y = scan_n1_dirs(xr, xc, **p, interpret=True)
        return jnp.sum((y[:, 0] + y[:, 2]) * wr) + jnp.sum(
            (y[:, 1] + y[:, 3]) * wc
        )

    gs = jax.grad(loss_s, argnums=(0, 1, 2))(xr, xc, p)
    gd = jax.grad(loss_d, argnums=(0, 1, 2))(xr, xc, p)
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(gd[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(gd[1]),
                               rtol=1e-4, atol=1e-4)
    for key in gs[2]:
        np.testing.assert_allclose(
            np.asarray(gs[2][key]), np.asarray(gd[2][key]),
            rtol=1e-4, atol=1e-4, err_msg=key,
        )

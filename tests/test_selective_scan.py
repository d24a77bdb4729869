"""Selective scan: Pallas kernel vs jnp reference (values and gradients).

Mirrors the reference test matrix in
/root/reference/R2GenCSR/VMamba/kernels/selective_scan/test_selective_scan.py:374-394
(seqlen/dtype/has_D/has_delta_bias/delta_softplus/group sweeps), adapted
to the TPU time-major layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_analysis_tpu.ops.selective_scan import selective_scan_ref
from medical_image_analysis_tpu.ops.selective_scan_pallas import (
    selective_scan_pallas,
)


def _make_inputs(key, batch, seq_len, d, n, groups, dtype):
    ks = jax.random.split(key, 6)
    u = jax.random.normal(ks[0], (batch, seq_len, d), dtype)
    delta = 0.1 * jax.random.normal(ks[1], (batch, seq_len, d), dtype)
    a_log = jnp.log(
        jnp.broadcast_to(jnp.arange(1, n + 1, dtype=jnp.float32), (d, n))
    )
    A = -jnp.exp(a_log + 0.1 * jax.random.normal(ks[2], (d, n)))
    if groups == 1:
        bshape = (batch, seq_len, n)
    else:
        bshape = (batch, seq_len, groups, n)
    B = jax.random.normal(ks[3], bshape, dtype)
    C = jax.random.normal(ks[4], bshape, dtype)
    D = jax.random.normal(ks[5], (d,), jnp.float32)
    delta_bias = 0.5 * jnp.ones((d,), jnp.float32)
    return u, delta, A, B, C, D, delta_bias


@pytest.mark.parametrize("seq_len", [64, 160, 512])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("with_d,with_bias,softplus", [
    (True, True, True),
    (False, False, False),
])
def test_forward_matches_ref(seq_len, dtype, with_d, with_bias, softplus):
    key = jax.random.PRNGKey(0)
    u, delta, A, B, C, D, db = _make_inputs(key, 2, seq_len, 96, 8, 1, dtype)
    D = D if with_d else None
    db = db if with_bias else None
    y_ref = selective_scan_ref(u, delta, A, B, C, D, db, softplus)
    y = selective_scan_pallas(
        u, delta, A, B, C, D, db, softplus, chunk=64, block_d=64
    )
    # fp32 tolerance accounts for association-order differences between the
    # log-depth chunk scan and the sequential reference (the reference CUDA
    # tests use comparable dtype-dependent tolerances).
    rtol, atol = (5e-3, 1e-3) if dtype == jnp.float32 else (2e-2, 2e-2)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        rtol=rtol, atol=atol,
    )


def test_forward_grouped():
    key = jax.random.PRNGKey(1)
    u, delta, A, B, C, D, db = _make_inputs(
        key, 2, 128, 128, 8, 4, jnp.float32
    )
    y_ref = selective_scan_ref(u, delta, A, B, C, D, db, True)
    y = selective_scan_pallas(
        u, delta, A, B, C, D, db, True, chunk=64, block_d=32
    )
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-4
    )


@pytest.mark.slow
@pytest.mark.parametrize("groups", [1, 2])
def test_gradients_match_ref(groups):
    key = jax.random.PRNGKey(2)
    u, delta, A, B, C, D, db = _make_inputs(
        key, 2, 96, 64, 8, groups, jnp.float32
    )
    wvec = jax.random.normal(jax.random.PRNGKey(9), u.shape)

    def loss(fn, *args):
        return jnp.sum(fn(*args) * wvec)

    args = (u, delta, A, B, C, D, db)
    g_ref = jax.grad(
        lambda *a: loss(
            lambda *x: selective_scan_ref(*x, delta_softplus=True), *a
        ),
        argnums=tuple(range(7)),
    )(*args)
    g_pal = jax.grad(
        lambda *a: loss(
            lambda *x: selective_scan_pallas(
                *x, delta_softplus=True, chunk=32, block_d=32
            ),
            *a,
        ),
        argnums=tuple(range(7)),
    )(*args)
    names = ["du", "ddelta", "dA", "dB", "dC", "dD", "ddelta_bias"]
    for name, gr, gp in zip(names, g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), rtol=2e-3, atol=2e-3,
            err_msg=f"gradient mismatch: {name}",
        )


def test_last_state_ref():
    key = jax.random.PRNGKey(3)
    u, delta, A, B, C, D, db = _make_inputs(
        key, 1, 32, 16, 4, 1, jnp.float32
    )
    y, h_last = selective_scan_ref(
        u, delta, A, B, C, D, db, True, return_last_state=True
    )
    # Step the recurrence manually in numpy.
    un, dn = np.asarray(u[0]), np.asarray(delta[0])
    dn = np.log1p(np.exp(dn + np.asarray(db)[None, :]))
    An, Bn, Cn = np.asarray(A), np.asarray(B[0]), np.asarray(C[0])
    h = np.zeros((16, 4))
    for t in range(32):
        h = np.exp(dn[t][:, None] * An) * h + (
            dn[t] * un[t]
        )[:, None] * Bn[t][None, :]
    np.testing.assert_allclose(np.asarray(h_last[0]), h, rtol=1e-4, atol=1e-5)

"""Sequence-parallel scan vs single-device reference (8-dev CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_analysis_tpu.ops.selective_scan import selective_scan_ref
from medical_image_analysis_tpu.parallel.mesh import make_mesh
from medical_image_analysis_tpu.parallel.sp_scan import selective_scan_sp


@pytest.mark.slow
@pytest.mark.parametrize("softplus", [True, False])
def test_sp_scan_matches_ref(softplus):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(data=8)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    b, l, d, n = 2, 64, 8, 4
    u = jax.random.normal(ks[0], (b, l, d))
    delta = 0.1 * jax.random.normal(ks[1], (b, l, d))
    A = -jnp.exp(jax.random.normal(ks[2], (d, n)) * 0.2)
    B = jax.random.normal(ks[3], (b, l, n))
    C = jax.random.normal(ks[4], (b, l, n))
    D = jnp.ones((d,))
    bias = 0.3 * jnp.ones((d,))

    y_ref = selective_scan_ref(u, delta, A, B, C, D, bias, softplus)
    y_sp = selective_scan_sp(u, delta, A, B, C, D, bias, softplus, mesh)
    np.testing.assert_allclose(
        np.asarray(y_sp), np.asarray(y_ref), rtol=2e-4, atol=2e-5
    )

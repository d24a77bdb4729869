"""Cross scan/merge and causal conv ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_analysis_tpu.ops.cross_scan import (
    cross_merge,
    cross_merge_1d,
    cross_scan,
    cross_scan_1d,
)
from medical_image_analysis_tpu.ops.causal_conv import (
    causal_conv1d,
    causal_conv1d_update,
)


def _cross_scan_numpy(x_bchw):
    """Reference semantics of vmamba.py CrossScan (B, C, H, W)->(B,4,C,L)."""
    b, c, h, w = x_bchw.shape
    xs = np.empty((b, 4, c, h * w), x_bchw.dtype)
    xs[:, 0] = x_bchw.reshape(b, c, -1)
    xs[:, 1] = x_bchw.transpose(0, 1, 3, 2).reshape(b, c, -1)
    xs[:, 2:4] = xs[:, 0:2][..., ::-1]
    return xs


def test_cross_scan_matches_reference_semantics():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 6, 3)).astype(np.float32)  # B,H,W,C
    ours = np.asarray(cross_scan(jnp.asarray(x)))  # (B,4,L,C)
    ref = _cross_scan_numpy(x.transpose(0, 3, 1, 2))  # (B,4,C,L)
    np.testing.assert_allclose(ours, ref.transpose(0, 1, 3, 2))


def test_cross_merge_is_adjoint_of_scan():
    # CrossMerge(ys) == sum_k scatter-back; check scan->merge == 4x sum per
    # token when ys = cross_scan(x): each direction contributes x once.
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 8)).astype(np.float32))
    ys = cross_scan(x)
    y = cross_merge(ys, 4, 6)
    np.testing.assert_allclose(
        np.asarray(y), 4 * np.asarray(x.reshape(2, 24, 8)), rtol=1e-6
    )


def test_cross_scan_1d_roundtrip():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 10, 4)).astype(np.float32))
    y = cross_merge_1d(cross_scan_1d(x))
    np.testing.assert_allclose(np.asarray(y), 2 * np.asarray(x), rtol=1e-6)


@pytest.mark.parametrize("k", [2, 4])
def test_causal_conv_matches_direct(k):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 12, 5)).astype(np.float32)
    w = rng.standard_normal((k, 5)).astype(np.float32)
    b = rng.standard_normal((5,)).astype(np.float32)
    y = np.asarray(
        causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), None)
    )
    ref = np.zeros_like(x)
    for t in range(12):
        for i in range(k):
            src = t - (k - 1) + i
            if src >= 0:
                ref[:, t] += x[:, src] * w[i]
    ref += b
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-6)


def test_causal_conv_update_matches_full():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 9, 5)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((4, 5)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((5,)).astype(np.float32))
    full = causal_conv1d(x, w, b, "silu")
    state = jnp.zeros((2, 3, 5))
    outs = []
    for t in range(9):
        y_t, state = causal_conv1d_update(x[:, t], state, w, b, "silu")
        outs.append(y_t)
    inc = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(inc), np.asarray(full), rtol=1e-5, atol=1e-6
    )

"""Gather-VJP ops (ops/gather.py): forward and gradient must match the
plain take_along_axis path whose VJP XLA lowers to a scatter."""

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_analysis_tpu.ops.gather import perm_gather, subset_gather


def _mask_ids(rng, b, l, keep):
    noise = rng.random((b, l))
    ids_shuffle = np.argsort(noise, axis=1)
    ids_restore = np.argsort(ids_shuffle, axis=1)
    return (jnp.asarray(ids_shuffle[:, :keep]),
            jnp.asarray(ids_restore))


def test_subset_gather_matches_take_along_axis():
    rng = np.random.default_rng(0)
    b, l, d, keep = 4, 36, 16, 9
    ids_keep, ids_restore = _mask_ids(rng, b, l, keep)
    x = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    dy = jnp.asarray(rng.standard_normal((b, keep, d)), jnp.float32)

    ref = lambda xx: jnp.take_along_axis(xx, ids_keep[..., None], axis=1)
    y, vjp = jax.vjp(ref, x)
    y2, vjp2 = jax.vjp(lambda xx: subset_gather(xx, ids_keep, ids_restore), x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
    np.testing.assert_allclose(
        np.asarray(vjp(dy)[0]), np.asarray(vjp2(dy)[0]), rtol=0, atol=0
    )


def test_perm_gather_matches_take_along_axis():
    rng = np.random.default_rng(1)
    b, l, d = 3, 25, 8
    perm = jnp.asarray(
        np.stack([rng.permutation(l) for _ in range(b)])
    )
    x = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    dy = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)

    ref = lambda xx: jnp.take_along_axis(xx, perm[..., None], axis=1)
    y, vjp = jax.vjp(ref, x)
    y2, vjp2 = jax.vjp(lambda xx: perm_gather(xx, perm), x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
    np.testing.assert_array_equal(
        np.asarray(vjp(dy)[0]), np.asarray(vjp2(dy)[0])
    )


def test_subset_gather_under_jit_grad():
    rng = np.random.default_rng(2)
    b, l, d, keep = 2, 16, 4, 4
    ids_keep, ids_restore = _mask_ids(rng, b, l, keep)
    x = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)

    g = jax.jit(jax.grad(
        lambda xx: jnp.sum(subset_gather(xx, ids_keep, ids_restore) ** 2)
    ))(x)
    g_ref = jax.grad(
        lambda xx: jnp.sum(
            jnp.take_along_axis(xx, ids_keep[..., None], axis=1) ** 2
        )
    )(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-6)

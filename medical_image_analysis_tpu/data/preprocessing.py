"""Image preprocessing: host-side parsing + fused on-device path.

Host path mirrors the reference's ``AutoImageProcessor('microsoft/
swin-base-patch4-window7-224')`` semantics (``data_helper.py:24-26``):
resize to input_size, rescale 1/255, normalize with ImageNet mean/std.

The on-device path (:func:`device_preprocess`) fuses uint8 -> resize ->
normalize (-> optional patchify) inside jit, feeding the MAE-encode
throughput north star (BASELINE.md): host only decodes bytes to uint8.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def host_preprocess(img: np.ndarray, size: int) -> np.ndarray:
    """uint8 (H, W, 3) -> float32 (size, size, 3), normalized."""
    import PIL.Image

    pil = PIL.Image.fromarray(img)
    pil = pil.resize((size, size), PIL.Image.BICUBIC)
    arr = np.asarray(pil, np.float32) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def device_preprocess(
    raw: jax.Array,  # (B, H, W, C) uint8
    size: int,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Fused resize + normalize on device (jit-friendly)."""
    x = raw.astype(jnp.float32) / 255.0
    b, h, w, c = x.shape
    if (h, w) != (size, size):
        x = jax.image.resize(x, (b, size, size, c), "bilinear")
    mean = jnp.asarray(IMAGENET_MEAN[:c])
    std = jnp.asarray(IMAGENET_STD[:c])
    x = (x - mean) / std
    return x.astype(dtype)

"""--throughput mode: timed encoder forward passes (SwinCheX
``main.py:361-430`` / VMamba ``main.py:338-353`` equivalents)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.config import RunConfig
from ..train.loop import vision_preset
from ..utils.profiling import throughput


def run_throughput(cfg: RunConfig) -> dict:
    m = cfg.model
    b = cfg.data.batch_size
    size = cfg.data.input_size
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, size, size, 3)),
        jnp.bfloat16,
    )
    if m.vision == "swin":
        from ..models.swin import SwinTransformer

        model = SwinTransformer(**vision_preset("swin", m.vision_size,
                                                m.vision_kwargs))
    elif m.vision == "vssm":
        from ..models.vmamba import VSSM

        model = VSSM(**vision_preset("vssm", m.vision_size, m.vision_kwargs))
    else:
        from ..models.mamba import ARM

        model = ARM(**vision_preset("arm", m.vision_size, m.vision_kwargs))
    params = model.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), params)
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    stats = throughput(fwd, (params, x), batch_size=b)
    return {"vision": m.vision, "batch": b, "input": size, **stats}

"""MambaPEFT adapter family as functional param-tree transforms.

Reference: the vendored forked-PEFT ``MambaPEFTConfig`` /
``MambaPEFTModel`` and its patched mixer forward
(``/root/reference/EMRRG/mamba_peft/src/peft/tuners/mamba_peft.py:44-177``
config surface, ``:180-380`` model, ``:383-573`` weight merging inside
``mambamixer_cuda_kernels_forward``).

TPU-native design: every weight-space adapter (the per-SSM-tensor LoRAs,
the learnable-Δ "bias tuning" variants, and ``additional_scan``) is a
pure merge ``merged = merge_mamba_peft(base, peft, cfg)`` applied inside
the loss function; training differentiates w.r.t. the adapter tree only.
No monkey patching — the merged tree feeds the standard (fused-kernel)
``MambaMixer``/``MambaLM``. Activation-space adapters (AdaptFormer,
prefix/prompt tuning) live as optional modules on :class:`..models
.mamba_lm.MambaLM` gated by the same config.

Param-name conventions (our MambaMixer): ``in_proj/kernel``
(d_model, 2·d_inner), ``out_proj/kernel`` (d_inner, d_model), ``conv_w``
(K, taps, d_inner), ``x_proj_w`` (K, R+2N, d_inner), ``dt_proj_w``
(K, d_inner, R), ``dt_bias`` (K, d_inner), ``A_log`` (K, d_inner, N),
``D`` (K, d_inner). Multi-direction mixers get an independent adapter
per direction (the reference's HF Mamba is single-direction).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MambaPEFTConfig:
    """Mirrors the reference config surface (mamba_peft.py:44-177)."""

    # AdaptFormer (parallel bottleneck adapter; activation-space)
    adaptformer: bool = False
    dim_adaptf: int = 32
    s_adaptf: float = 1.0
    # LoRA on out_proj
    lora_out_proj: bool = False
    dim: int = 32
    s: float = 1.0
    # LoRA on in_proj (full / X half / Z half)
    lora_in_proj: bool = False
    dim_in_proj: int = 32
    s_in_proj: float = 1.0
    lora_X: bool = False
    dim_X: int = 32
    s_X: float = 1.0
    lora_Z: bool = False
    dim_Z: int = 32
    s_Z: float = 1.0
    # LoRA on x_proj (all rows / dt rows / B rows / C rows)
    lora_x_proj: bool = False
    dim_x_proj: int = 4
    s_x_proj: float = 1.0
    lora_d: bool = False
    dim_d: int = 4
    s_d: float = 1.0
    lora_B: bool = False
    dim_B: int = 4
    s_B: float = 1.0
    lora_C: bool = False
    dim_C: int = 4
    s_C: float = 1.0
    # LoRA on dt_proj
    lora_dt: bool = False
    dim_dt: int = 4
    s_dt: float = 1.0
    # LoRA on conv1d (factorized over (d_inner, taps))
    lora_conv1d: bool = False
    dim_conv1d: int = 32
    s_conv1d: float = 1.0
    # LoRA on patch_embed conv
    lora_patch_embed: bool = False
    dim_patch_embed: int = 32
    s_patch_embed: float = 1.0
    # prefix / prompt tuning (activation-space)
    prefix_tuning: bool = False
    num_virtual_tokens: int = 1
    prompt_tuning: bool = False
    prompt_num_tokens: int = 2
    # additional_scan: extra d_state columns
    additional_scan: bool = False
    scan_addition_num: int = 1
    scan_addition_pos: str = "suffix"  # suffix | prefix
    scan_A_constant: float | None = None
    scan_A_copy_from_last: bool = False
    zero_init_x_proj: bool = False
    # learnable-Δ "bias tuning" (v2 = additive delta params; v1 = just
    # unfreeze the base tensor via trainable-mask)
    learnable_A: bool = False
    learnable_A_v2: bool = False
    learnable_D: bool = False
    learnable_D_v2: bool = False
    learnable_conv1d: bool = False
    learnable_conv1d_v2: bool = False
    learnable_cls_token: bool = False
    learnable_cls_token_v2: bool = False
    learnable_pos_embed: bool = False
    learnable_pos_embed_v2: bool = False
    learnable_bias: bool = False  # dt bias
    learnable_bias_v2: bool = False


def effective_d_state(cfg: MambaPEFTConfig, d_state: int) -> int:
    """d_state of the *merged* model (additional_scan widens N)."""
    return d_state + (cfg.scan_addition_num if cfg.additional_scan else 0)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def _mixer_paths(params) -> dict[str, Any]:
    """{path_str: leaf} for the whole tree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {_path_str(p): leaf for p, leaf in flat}


def _lora_pair(key, d_in, d_out, rank, lead=()):
    a = jax.random.normal(key, (*lead, d_in, rank)) * 0.01
    b = jnp.zeros((*lead, rank, d_out))
    return {"a": a, "b": b}


def _delta(p):
    return jnp.einsum("...ir,...ro->...io", p["a"], p["b"])


def init_mamba_peft(rng, params, cfg: MambaPEFTConfig) -> dict:
    """Adapter tree keyed by '<mixer-path>|<adapter>' path strings.

    Mixer subtrees are located by their ``x_proj_w`` leaves; top-level
    cls_token/pos_embed/patch_embed adapters attach to those params.
    """
    leaves = _mixer_paths(params)
    keys = iter(jax.random.split(rng, 16 * max(len(leaves), 1)))
    out: dict[str, Any] = {}

    for path, leaf in leaves.items():
        if path.endswith("x_proj_w"):
            mixer = path[: -len("x_proj_w")]
            k, c, d_inner = leaf.shape
            r2n = c
            dtp = leaves[mixer + "dt_proj_w"]
            rank_dt = dtp.shape[2]
            n = (c - rank_dt) // 2
            inp = leaves[mixer + "in_proj/kernel"]
            d_model = inp.shape[0]
            if cfg.lora_out_proj:
                out[mixer + "|lora_out_proj"] = _lora_pair(
                    next(keys), d_inner, d_model, cfg.dim
                )
            if cfg.lora_in_proj:
                out[mixer + "|lora_in_proj"] = _lora_pair(
                    next(keys), d_model, 2 * d_inner, cfg.dim_in_proj
                )
            if cfg.lora_X:
                out[mixer + "|lora_X"] = _lora_pair(
                    next(keys), d_model, d_inner, cfg.dim_X
                )
            if cfg.lora_Z:
                out[mixer + "|lora_Z"] = _lora_pair(
                    next(keys), d_model, d_inner, cfg.dim_Z
                )
            if cfg.lora_x_proj:
                out[mixer + "|lora_x_proj"] = _lora_pair(
                    next(keys), r2n, d_inner, cfg.dim_x_proj, (k,)
                )
            if cfg.lora_d:
                out[mixer + "|lora_d"] = _lora_pair(
                    next(keys), rank_dt, d_inner, cfg.dim_d, (k,)
                )
            if cfg.lora_B:
                out[mixer + "|lora_B"] = _lora_pair(
                    next(keys), n, d_inner, cfg.dim_B, (k,)
                )
            if cfg.lora_C:
                out[mixer + "|lora_C"] = _lora_pair(
                    next(keys), n, d_inner, cfg.dim_C, (k,)
                )
            if cfg.lora_dt:
                out[mixer + "|lora_dt"] = _lora_pair(
                    next(keys), d_inner, rank_dt, cfg.dim_dt, (k,)
                )
            if cfg.lora_conv1d:
                taps = leaves[mixer + "conv_w"].shape[1]
                out[mixer + "|lora_conv1d"] = _lora_pair(
                    next(keys), taps, d_inner, cfg.dim_conv1d, (k,)
                )
            a_log = leaves[mixer + "A_log"]
            if cfg.additional_scan:
                a_num = cfg.scan_addition_num
                if cfg.scan_A_constant is not None:
                    a_init = jnp.full(
                        (k, d_inner, a_num),
                        jnp.log(jnp.float32(cfg.scan_A_constant)),
                    )
                elif cfg.scan_A_copy_from_last:
                    a_init = jnp.repeat(a_log[..., -1:], a_num, axis=-1)
                else:
                    a_init = jnp.log(
                        jnp.broadcast_to(
                            jnp.arange(1, a_num + 1, dtype=jnp.float32),
                            (k, d_inner, a_num),
                        )
                    )
                if cfg.zero_init_x_proj:
                    xp_addi = jnp.zeros((k, 2 * a_num, d_inner))
                else:
                    xp_addi = (
                        jax.random.normal(
                            next(keys), (k, 2 * a_num, d_inner)
                        )
                        * d_inner**-0.5
                    )
                out[mixer + "|scan_addi"] = {
                    "A_log_addi": a_init,
                    "x_proj_addi": xp_addi,
                }
            if cfg.learnable_A_v2:
                out[mixer + "|learnable_A"] = jnp.zeros_like(a_log)
            if cfg.learnable_D_v2:
                out[mixer + "|learnable_D"] = jnp.zeros_like(
                    leaves[mixer + "D"]
                )
            if cfg.learnable_conv1d_v2:
                out[mixer + "|learnable_conv1d"] = jnp.zeros_like(
                    leaves[mixer + "conv_w"]
                )
            if cfg.learnable_bias_v2:
                out[mixer + "|learnable_bias"] = jnp.zeros_like(
                    leaves[mixer + "dt_bias"]
                )
        elif path.endswith("cls_token") and cfg.learnable_cls_token_v2:
            out[path + "|learnable"] = jnp.zeros_like(leaf)
        elif path.endswith("pos_embed") and cfg.learnable_pos_embed_v2:
            out[path + "|learnable"] = jnp.zeros_like(leaf)
        elif (
            re.search(r"patch_embed.*/kernel$", path)
            and cfg.lora_patch_embed
            and leaf.ndim == 4
        ):
            kh, kw, cin, cout = leaf.shape
            out[path + "|lora_patch_embed"] = _lora_pair(
                next(keys), kh * kw * cin, cout, cfg.dim_patch_embed
            )
    return out


def merge_mamba_peft(params, peft: dict, cfg: MambaPEFTConfig):
    """Pure merge: base params + adapter deltas -> effective params.

    Mixer subtrees (nodes holding both ``x_proj_w`` and ``A_log``) are
    merged with full shape information; with ``additional_scan`` the
    merged ``A_log``/``x_proj_w`` leaves are WIDER than the base (apply
    with a model built with :func:`effective_d_state`).
    """

    def get(prefix, name):
        return peft.get(prefix + "|" + name)

    def merge_mixer(node, prefix):
        node = dict(node)
        n = node["A_log"].shape[-1]
        c = node["x_proj_w"].shape[1]
        r = c - 2 * n
        d_inner = node["x_proj_w"].shape[2]

        if "in_proj" in node:
            kern = node["in_proj"]["kernel"]
            if get(prefix, "lora_in_proj") is not None:
                kern = kern + cfg.s_in_proj * _delta(
                    get(prefix, "lora_in_proj")
                )
            if get(prefix, "lora_X") is not None:
                kern = kern.at[:, :d_inner].add(
                    cfg.s_X * _delta(get(prefix, "lora_X"))
                )
            if get(prefix, "lora_Z") is not None:
                kern = kern.at[:, d_inner:].add(
                    cfg.s_Z * _delta(get(prefix, "lora_Z"))
                )
            node["in_proj"] = dict(node["in_proj"], kernel=kern)
        if "out_proj" in node and get(prefix, "lora_out_proj") is not None:
            node["out_proj"] = dict(
                node["out_proj"],
                kernel=node["out_proj"]["kernel"]
                + cfg.s * _delta(get(prefix, "lora_out_proj")),
            )

        xp = node["x_proj_w"]
        if get(prefix, "lora_x_proj") is not None:
            xp = xp + cfg.s_x_proj * _delta(get(prefix, "lora_x_proj"))
        if get(prefix, "lora_d") is not None:
            xp = xp.at[:, :r].add(cfg.s_d * _delta(get(prefix, "lora_d")))
        if get(prefix, "lora_B") is not None:
            xp = xp.at[:, r : r + n].add(
                cfg.s_B * _delta(get(prefix, "lora_B"))
            )
        if get(prefix, "lora_C") is not None:
            xp = xp.at[:, r + n :].add(
                cfg.s_C * _delta(get(prefix, "lora_C"))
            )

        a_log = node["A_log"]
        if get(prefix, "learnable_A") is not None:
            a_log = a_log + get(prefix, "learnable_A")
        addi = get(prefix, "scan_addi")
        if addi is not None:
            a_num = addi["x_proj_addi"].shape[1] // 2
            b_add = addi["x_proj_addi"][:, :a_num]
            c_add = addi["x_proj_addi"][:, a_num:]
            if cfg.scan_addition_pos == "suffix":
                xp = jnp.concatenate(
                    [xp[:, : r + n], b_add, xp[:, r + n :], c_add], axis=1
                )
                a_log = jnp.concatenate(
                    [a_log, addi["A_log_addi"]], axis=-1
                )
            else:
                xp = jnp.concatenate(
                    [xp[:, :r], b_add, xp[:, r : r + n], c_add,
                     xp[:, r + n :]],
                    axis=1,
                )
                a_log = jnp.concatenate(
                    [addi["A_log_addi"], a_log], axis=-1
                )
        node["x_proj_w"] = xp
        node["A_log"] = a_log

        if get(prefix, "lora_dt") is not None:
            node["dt_proj_w"] = node["dt_proj_w"] + cfg.s_dt * _delta(
                get(prefix, "lora_dt")
            )
        cw = node["conv_w"]
        if get(prefix, "lora_conv1d") is not None:
            cw = cw + cfg.s_conv1d * _delta(get(prefix, "lora_conv1d"))
        if get(prefix, "learnable_conv1d") is not None:
            cw = cw + get(prefix, "learnable_conv1d")
        node["conv_w"] = cw
        if get(prefix, "learnable_D") is not None:
            node["D"] = node["D"] + get(prefix, "learnable_D")
        if get(prefix, "learnable_bias") is not None:
            node["dt_bias"] = node["dt_bias"] + get(prefix, "learnable_bias")
        return node

    def rec(node, prefix):
        if not isinstance(node, dict):
            return node
        if "x_proj_w" in node and "A_log" in node:
            return merge_mixer(node, prefix)
        out = {}
        for key, val in node.items():
            p = prefix + key
            if isinstance(val, dict):
                out[key] = rec(val, p + "/")
                lpe = peft.get(p + "/kernel|lora_patch_embed")
                if lpe is not None and "kernel" in out[key]:
                    kern = out[key]["kernel"]
                    kh, kw, cin, cout = kern.shape
                    out[key] = dict(
                        out[key],
                        kernel=kern
                        + cfg.s_patch_embed
                        * _delta(lpe).reshape(kh, kw, cin, cout),
                    )
            else:
                learn = peft.get(p + "|learnable")
                out[key] = val + learn if learn is not None else val
        return out

    return rec(params, "")


def mamba_peft_trainable_mask(params, cfg: MambaPEFTConfig):
    """v1 'learnable_*' variants: unfreeze the base tensors themselves
    (mamba_peft.py:294-345); everything else frozen (adapters train as a
    separate tree)."""

    def mask(path, leaf):
        p = _path_str(path)
        if cfg.learnable_A and not cfg.learnable_A_v2 and p.endswith("A_log"):
            return True
        if cfg.learnable_D and not cfg.learnable_D_v2 and p.endswith("/D"):
            return True
        if (
            cfg.learnable_conv1d
            and not cfg.learnable_conv1d_v2
            and (p.endswith("conv_w") or p.endswith("conv_b"))
        ):
            return True
        if (
            cfg.learnable_cls_token
            and not cfg.learnable_cls_token_v2
            and p.endswith("cls_token")
        ):
            return True
        if (
            cfg.learnable_pos_embed
            and not cfg.learnable_pos_embed_v2
            and p.endswith("pos_embed")
        ):
            return True
        if (
            cfg.learnable_bias
            and not cfg.learnable_bias_v2
            and p.endswith("dt_bias")
        ):
            return True
        if "head" in p:
            return True
        return False

    return jax.tree_util.tree_map_with_path(mask, params)

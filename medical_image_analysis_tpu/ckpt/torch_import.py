"""Torch / HF checkpoint import with key-remap surgeries.

Covers the reference's four checkpoint-surgery conventions (SURVEY.md
§5.4): prefix stripping (``MambaXrayVL_DownStream.py:33-42``),
1-direction -> 4-direction weight replication
(``MambaXrayVL_CLIP.py:37-60``), pos-embed interpolation
(``util/pos_embed.py``), and trainable-only "delta" checkpoints
(``R2GenCSR.py:546-567``).

torch is imported lazily (host-side only; tensors convert via numpy).
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np


def load_torch_state_dict(path: str) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "state_dict", "module"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
            break
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in obj.items()}


def strip_prefix(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    """Keep only keys under ``prefix`` and strip it (DownStream :33-42)."""
    out = {}
    for k, v in sd.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
    return out


def interpolate_pos_embed(
    pos: np.ndarray, new_len: int, num_extra: int = 1
) -> np.ndarray:
    """2D bicubic-style pos-embed interpolation (util/pos_embed.py).

    pos: (1, L_old + num_extra, D); extra tokens (cls) kept verbatim.
    Uses jax.image bilinear resize (host-side, import-time only).
    """
    import jax

    extra = pos[:, :num_extra]
    grid_old = int(round((pos.shape[1] - num_extra) ** 0.5))
    grid_new = int(round(new_len**0.5))
    body = pos[:, num_extra:].reshape(1, grid_old, grid_old, -1)
    body = jax.image.resize(
        jnp.asarray(body), (1, grid_new, grid_new, body.shape[-1]), "bicubic"
    )
    body = np.asarray(body).reshape(1, grid_new * grid_new, -1)
    return np.concatenate([extra, body], axis=1)


def vit_torch_to_flax(
    sd: Mapping[str, np.ndarray], depth: int, final_norm: bool = False
) -> dict:
    """Reference/timm-style ViT state dict -> flax :class:`models.vit.ViT`.

    Source naming per ``HD_Xray_Pretrain_MAE/finetune/DP/models/vit.py``
    (also timm ``vit_*_patch16``): ``patch_embed.proj``, ``cls_token``,
    ``pos_embed``, ``blocks.N.{norm1,attn.qkv,attn.proj,norm2,
    mlp.fc1,mlp.fc2}``. ``depth`` is the number of blocks to MAP — the
    reference extractor runs ``blocks[:-1]``, so pass ``ref_depth - 1``
    with a ``ViT(depth=ref_depth-1, final_norm=False,
    fixed_sincos_pos=False)`` target. Missing qkv bias (qkv_bias=False
    checkpoints) maps to zeros (our block always carries the param).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    d = sd["cls_token"].shape[-1]
    out: dict = {
        "patch_embed": {
            "proj": {
                "kernel": sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0),
                "bias": sd["patch_embed.proj.bias"],
            }
        },
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
    }
    for i in range(depth):
        p = f"blocks.{i}."
        out[f"block{i}"] = {
            "ln1_scale": sd[p + "norm1.weight"],
            "ln1_bias": sd[p + "norm1.bias"],
            "qkv_kernel": sd[p + "attn.qkv.weight"].T,
            "qkv_bias": sd.get(
                p + "attn.qkv.bias", np.zeros(3 * d, np.float32)
            ),
            "proj_kernel": sd[p + "attn.proj.weight"].T,
            "proj_bias": sd[p + "attn.proj.bias"],
            "ln2_scale": sd[p + "norm2.weight"],
            "ln2_bias": sd[p + "norm2.bias"],
            "fc1_kernel": sd[p + "mlp.fc1.weight"].T,
            "fc1_bias": sd[p + "mlp.fc1.bias"],
            "fc2_kernel": sd[p + "mlp.fc2.weight"].T,
            "fc2_bias": sd[p + "mlp.fc2.bias"],
        }
    if final_norm:
        out["norm"] = {
            "scale": sd["norm.weight"], "bias": sd["norm.bias"]
        }
    return {"params": _to_jnp(out)}


def replicate_dir_weights(sd: Mapping[str, np.ndarray]) -> dict:
    """Stage-1 -> stage-2 surgery: copy uni-direction Mamba weights into
    the 4-direction slots (MambaXrayVL_CLIP.py:37-60): for every
    ``conv1d.*`` / ``x_proj.*`` / ``dt_proj.*`` / ``A_log`` / ``D`` key,
    create ``_b``, ``_c``, ``_c_b`` twins if absent.
    """
    out = dict(sd)
    stems = ("conv1d", "x_proj", "dt_proj", "A_log", "D")
    for k, v in list(sd.items()):
        parts = k.split(".")
        for i, p in enumerate(parts):
            if p in stems:
                for suffix in ("_b", "_c", "_c_b"):
                    # A_log twins are named A_b_log etc. (CLIP.py:37-60)
                    twin = (
                        f"A{suffix}_log" if p == "A_log" else p + suffix
                    )
                    nk = ".".join(parts[:i] + [twin] + parts[i + 1:])
                    if nk not in out:
                        out[nk] = v
                break
    return out


def llama_hf_to_flax(sd: Mapping[str, np.ndarray], n_layers: int) -> dict:
    """HF LlamaForCausalLM state_dict -> TransformerLM flax params."""

    def t(name):
        return np.ascontiguousarray(sd[name].T)

    params = {
        "embed_tokens": {"embedding": sd["model.embed_tokens.weight"]},
        "norm": {"scale": sd["model.norm.weight"]},
    }
    if "lm_head.weight" in sd:
        params["lm_head"] = {"kernel": t("lm_head.weight")}
    for i in range(n_layers):
        p = f"model.layers.{i}."
        params[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": {"kernel": t(p + "self_attn.q_proj.weight")},
                "k_proj": {"kernel": t(p + "self_attn.k_proj.weight")},
                "v_proj": {"kernel": t(p + "self_attn.v_proj.weight")},
                "o_proj": {"kernel": t(p + "self_attn.o_proj.weight")},
            },
            "mlp": {
                "gate_proj": {"kernel": t(p + "mlp.gate_proj.weight")},
                "up_proj": {"kernel": t(p + "mlp.up_proj.weight")},
                "down_proj": {"kernel": t(p + "mlp.down_proj.weight")},
            },
            "input_layernorm": {"scale": sd[p + "input_layernorm.weight"]},
            "post_attention_layernorm": {
                "scale": sd[p + "post_attention_layernorm.weight"]
            },
        }
    return {"params": _to_jnp(params)}


def swin_hf_to_flax(
    sd: Mapping[str, np.ndarray], depths: list[int]
) -> dict:
    """HF ``SwinModel`` state_dict -> :class:`..models.swin.SwinTransformer`
    params (used for microsoft/swin-base-patch4-window7-224, the frozen
    encoder of R2GenCSR/R2GenKG)."""

    def t(name):
        return np.ascontiguousarray(sd[name].T)

    params = {
        "patch_embed": {
            # (D, 3, p, p) -> (p, p, 3, D)
            "kernel": np.ascontiguousarray(
                sd["embeddings.patch_embeddings.projection.weight"]
                .transpose(2, 3, 1, 0)
            ),
            "bias": sd["embeddings.patch_embeddings.projection.bias"],
        },
        "patch_embed_norm": {
            "scale": sd["embeddings.norm.weight"],
            "bias": sd["embeddings.norm.bias"],
        },
        "norm": {
            "scale": sd["layernorm.weight"],
            "bias": sd["layernorm.bias"],
        },
    }
    for s, depth in enumerate(depths):
        for blk in range(depth):
            p = f"encoder.layers.{s}.blocks.{blk}."
            qkv_w = np.concatenate(
                [
                    t(p + "attention.self.query.weight"),
                    t(p + "attention.self.key.weight"),
                    t(p + "attention.self.value.weight"),
                ],
                axis=1,
            )
            qkv_b = np.concatenate(
                [
                    sd[p + "attention.self.query.bias"],
                    sd[p + "attention.self.key.bias"],
                    sd[p + "attention.self.value.bias"],
                ]
            )
            params[f"stage{s}_block{blk}"] = {
                "norm1": {
                    "scale": sd[p + "layernorm_before.weight"],
                    "bias": sd[p + "layernorm_before.bias"],
                },
                "attn": {
                    "qkv": {"kernel": qkv_w, "bias": qkv_b},
                    "relative_position_bias_table": sd[
                        p + "attention.self.relative_position_bias_table"
                    ],
                    "proj": {
                        "kernel": t(p + "attention.output.dense.weight"),
                        "bias": sd[p + "attention.output.dense.bias"],
                    },
                },
                "norm2": {
                    "scale": sd[p + "layernorm_after.weight"],
                    "bias": sd[p + "layernorm_after.bias"],
                },
                "mlp": {
                    "fc1": {
                        "kernel": t(p + "intermediate.dense.weight"),
                        "bias": sd[p + "intermediate.dense.bias"],
                    },
                    "fc2": {
                        "kernel": t(p + "output.dense.weight"),
                        "bias": sd[p + "output.dense.bias"],
                    },
                },
            }
        if s < len(depths) - 1:
            p = f"encoder.layers.{s}.downsample."
            # HF concat order of the 2x2 neighbours is (0,0),(1,0),(0,1),
            # (1,1); ours is (0,0),(0,1),(1,0),(1,1) — permute the middle
            # two 4C groups of the reduction input and the norm.
            c4 = sd[p + "norm.weight"].shape[0]
            c = c4 // 4
            perm = np.concatenate(
                [np.arange(c), 2 * c + np.arange(c), c + np.arange(c),
                 3 * c + np.arange(c)]
            )
            params[f"merge{s}"] = {
                "norm": {
                    "scale": sd[p + "norm.weight"][perm],
                    "bias": sd[p + "norm.bias"][perm],
                },
                "reduction": {
                    "kernel": t(p + "reduction.weight")[perm],
                },
            }
    return {"params": _to_jnp(params)}


def arm_torch_to_flax(sd: Mapping[str, np.ndarray], depth: int) -> dict:
    """Reference ARM (bimamba v3) state_dict -> :class:`..models.mamba.ARM`
    params. Covers the 4-direction suffix convention
    (``mamba_simple.py``: conv1d/x_proj/dt_proj/A_log/D with
    ``''/_b/_c/_c_b`` twins) by stacking into the (K, ...) params; also
    handles stage-1 checkpoints after :func:`replicate_dir_weights`.
    """
    sufs = ["", "_b", "_c", "_c_b"]

    def stack(prefix, name_fmt, transform):
        return np.stack(
            [transform(sd[f"{prefix}.{name_fmt.format(s=s)}"]) for s in sufs]
        )

    params = {
        "patch_embed": {
            "proj": {
                "kernel": np.ascontiguousarray(
                    sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0)
                ),
                "bias": sd["patch_embed.proj.bias"],
            }
        },
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "norm_f": {
            "scale": sd["norm_f.weight"],
            "bias": sd["norm_f.bias"],
        },
    }
    for i in range(depth):
        p = f"layers.{i}.mixer"
        layer = {
            "norm": {"scale": sd[f"layers.{i}.norm.weight"]},
            "mixer": {
                "in_proj": {
                    "kernel": np.ascontiguousarray(
                        sd[f"{p}.in_proj.weight"].T
                    )
                },
                "out_proj": {
                    "kernel": np.ascontiguousarray(
                        sd[f"{p}.out_proj.weight"].T
                    )
                },
                # torch conv1d weight (din, 1, K) -> (K, din) per direction
                "conv_w": stack(p, "conv1d{s}.weight",
                                lambda w: w[:, 0, :].T),
                "conv_b": stack(p, "conv1d{s}.bias", lambda b: b),
                "x_proj_w": stack(p, "x_proj{s}.weight", lambda w: w),
                "dt_proj_w": stack(p, "dt_proj{s}.weight", lambda w: w),
                "dt_bias": stack(p, "dt_proj{s}.bias", lambda b: b),
                "A_log": stack(p, "A{s}_log", lambda a: a),
                "D": stack(p, "D{s}", lambda d: d),
            },
        }
        if f"layers.{i}.norm.bias" in sd:  # LayerNorm variant
            layer["norm"]["bias"] = sd[f"layers.{i}.norm.bias"]
        params[f"layers_{i}"] = layer
    return {"params": _to_jnp(params)}


def vssm_torch_to_flax(
    sd: Mapping[str, np.ndarray], depths: list[int], mlp: bool = True
) -> dict:
    """Reference VMamba ``VSSM`` state_dict -> :class:`..models.vmamba.VSSM`
    params (vmamba.py: v1 patch embed, v3 downsample, SS2D with stacked
    ``x_proj_weight``/``dt_projs_*``/``A_logs``/``Ds`` — :641-655)."""

    def t(name):
        return np.ascontiguousarray(sd[name].T)

    def conv(name):
        return np.ascontiguousarray(sd[name].transpose(2, 3, 1, 0))

    params = {
        "patch_embed": {
            "kernel": conv("patch_embed.0.weight"),
            "bias": sd["patch_embed.0.bias"],
        },
        "patch_norm": {
            "scale": sd["patch_embed.2.weight"],
            "bias": sd["patch_embed.2.bias"],
        },
        "norm": {
            "scale": sd["classifier.norm.weight"],
            "bias": sd["classifier.norm.bias"],
        },
    }
    if "patch_embed.5.weight" in sd:
        # _make_patch_embed_v2 (vmamba.py:1449-1461): Sequential
        # [conv, Permute, norm, Permute, GELU, conv, Permute, norm].
        params["patch_embed2"] = {
            "kernel": conv("patch_embed.5.weight"),
            "bias": sd["patch_embed.5.bias"],
        }
        params["patch_norm2"] = {
            "scale": sd["patch_embed.7.weight"],
            "bias": sd["patch_embed.7.bias"],
        }
    for s, depth in enumerate(depths):
        for b in range(depth):
            p = f"layers.{s}.blocks.{b}."
            op = p + "op."
            k_din, n = sd[op + "A_logs"].shape
            k = sd[op + "x_proj_weight"].shape[0]
            din = k_din // k
            block = {
                "norm": {
                    "scale": sd[p + "norm.weight"],
                    "bias": sd[p + "norm.bias"],
                },
                "op": {
                    "in_proj": {"kernel": t(op + "in_proj.weight")},
                    "conv2d": (
                        {
                            "kernel": conv(op + "conv2d.weight"),
                            "bias": sd[op + "conv2d.bias"],
                        }
                        if op + "conv2d.bias" in sd
                        else {"kernel": conv(op + "conv2d.weight")}
                    ),
                    "x_proj_w": sd[op + "x_proj_weight"],
                    "dt_proj_w": sd[op + "dt_projs_weight"],
                    "dt_bias": sd[op + "dt_projs_bias"],
                    "A_log": sd[op + "A_logs"].reshape(k, din, n),
                    "D": sd[op + "Ds"].reshape(k, din),
                    "out_norm": {
                        "scale": sd[op + "out_norm.weight"],
                        "bias": sd[op + "out_norm.bias"],
                    },
                    "out_proj": {"kernel": t(op + "out_proj.weight")},
                },
            }
            if mlp and p + "norm2.weight" in sd:
                block["norm2"] = {
                    "scale": sd[p + "norm2.weight"],
                    "bias": sd[p + "norm2.bias"],
                }
                block["mlp"] = {
                    "fc1": {
                        "kernel": t(p + "mlp.fc1.weight"),
                        "bias": sd[p + "mlp.fc1.bias"],
                    },
                    "fc2": {
                        "kernel": t(p + "mlp.fc2.weight"),
                        "bias": sd[p + "mlp.fc2.bias"],
                    },
                }
            params[f"stage{s}_block{b}"] = block
        if s < len(depths) - 1:
            d = f"layers.{s}.downsample."
            params[f"downsample{s}"] = {
                "kernel": np.ascontiguousarray(
                    sd[d + "1.weight"].transpose(2, 3, 1, 0)
                ),
                "bias": sd[d + "1.bias"],
            }
            params[f"downsample_norm{s}"] = {
                "scale": sd[d + "3.weight"],
                "bias": sd[d + "3.bias"],
            }
    return {"params": _to_jnp(params)}


def _dense(sd, name):
    return {
        "kernel": np.ascontiguousarray(sd[name + ".weight"].T),
        "bias": sd[name + ".bias"],
    }


def _norm(sd, name):
    return {"scale": sd[name + ".weight"], "bias": sd[name + ".bias"]}


def _bert_attention(sd, p):
    return {
        "query": _dense(sd, p + "self.query"),
        "key": _dense(sd, p + "self.key"),
        "value": _dense(sd, p + "self.value"),
        "out": _dense(sd, p + "output.dense"),
        "out_norm": _norm(sd, p + "output.LayerNorm"),
    }


def bert_hf_to_flax(sd: Mapping[str, np.ndarray], n_layers: int) -> dict:
    """HF BertModel state_dict -> :class:`..models.bert.BertModel` params
    (Bio_ClinicalBERT and any bert-base checkpoint; SURVEY.md F1/§2.3)."""
    params = {
        "word_embeddings": {
            "embedding": sd["embeddings.word_embeddings.weight"]
        },
        "position_embeddings": sd["embeddings.position_embeddings.weight"],
        "token_type_embeddings": {
            "embedding": sd["embeddings.token_type_embeddings.weight"]
        },
        "embeddings_norm": _norm(sd, "embeddings.LayerNorm"),
    }
    if "pooler.dense.weight" in sd:
        params["pooler"] = _dense(sd, "pooler.dense")
    for i in range(n_layers):
        p = f"encoder.layer.{i}."
        params[f"layer_{i}"] = {
            "attention": _bert_attention(sd, p + "attention."),
            "ffn": {
                "dense_in": _dense(sd, p + "intermediate.dense"),
                "dense_out": _dense(sd, p + "output.dense"),
                "norm": _norm(sd, p + "output.LayerNorm"),
            },
        }
    return {"params": _to_jnp(params)}


def blip2_qformer_to_flax(
    sd: Mapping[str, np.ndarray], n_layers: int,
    cross_attention_freq: int = 2,
) -> dict:
    """BLIP-2 Q-Former weights -> :class:`..models.bert.BertModel`
    (query_ffn) params. Accepts both namings: HF ``Blip2QFormerModel``
    (``encoder.layer.i.attention.attention.query`` / ``layernorm``) and
    LAVIS/reference checkpoints (``Qformer.bert.encoder.layer.i.
    attention.self.query`` / ``bert.embeddings.LayerNorm`` — the
    ``blip2_pretrained_flant5xxl.pth`` convention, AM_MRG.py:206-234).

    Returns ``{"params": bert_params}``; the caller merges
    ``query_tokens`` separately when present in the checkpoint.
    """
    norm = {}
    for k, v in sd.items():
        k2 = k
        for pre in ("Qformer.bert.", "bert.", "model."):
            if k2.startswith(pre):
                k2 = k2[len(pre):]
        k2 = k2.replace(".attention.attention.", ".attention.self.")
        k2 = k2.replace(".crossattention.attention.", ".crossattention.self.")
        k2 = k2.replace("embeddings.LayerNorm", "layernorm")
        norm[k2] = v
    sd = norm
    params = {"embeddings_norm": _norm(sd, "layernorm")}
    for i in range(n_layers):
        p = f"encoder.layer.{i}."
        layer = {
            "attention": _bert_attention(sd, p + "attention."),
            "ffn_query": {
                "dense_in": _dense(sd, p + "intermediate_query.dense"),
                "dense_out": _dense(sd, p + "output_query.dense"),
                "norm": _norm(sd, p + "output_query.LayerNorm"),
            },
        }
        if p + "crossattention.self.query.weight" in sd:
            layer["crossattention"] = _bert_attention(
                sd, p + "crossattention."
            )
        if p + "intermediate.dense.weight" in sd:
            layer["ffn"] = {
                "dense_in": _dense(sd, p + "intermediate.dense"),
                "dense_out": _dense(sd, p + "output.dense"),
                "norm": _norm(sd, p + "output.LayerNorm"),
            }
        params[f"layer_{i}"] = layer
    return {"params": _to_jnp(params)}


def _to_jnp(tree):
    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree)


def r2gen_torch_to_flax(
    sd: Mapping[str, np.ndarray], num_layers: int
) -> dict:
    """Reference R2Gen Transformer (+logit) state dict ->
    :class:`..models.r2gen.R2Gen` params.

    Spec: ``RG_english/modules/encoder_decoder.py`` — Transformer :37,
    Encoder/Decoder stacks with final LayerNorm :58-116,
    ConditionalLayerNorm 2-layer delta MLPs :144-181,
    MultiHeadedAttention 4-linear clones :182-204, RelationalMemory
    :246-302. Keys use the bare Transformer namespace (``encoder.*``,
    ``decoder.*``, ``tgt_embed.0.lut.weight``, ``rm.*``) plus
    ``logit.*``; an ``att_embed.*`` Linear maps when present, else the
    identity is installed (the golden feeds pre-embedded features).
    """

    def t(name):
        return np.ascontiguousarray(np.asarray(sd[name], np.float32).T)

    def lin(name):
        return {"kernel": t(name + ".weight"),
                "bias": np.asarray(sd[name + ".bias"], np.float32)}

    def mha(prefix):
        return {
            n: lin(f"{prefix}.linears.{i}")
            for i, n in enumerate(("q", "k", "v", "o"))
        }

    def ref_ln(prefix):
        return {"gamma": np.asarray(sd[prefix + ".gamma"], np.float32),
                "beta": np.asarray(sd[prefix + ".beta"], np.float32)}

    d_model = np.asarray(sd["tgt_embed.0.lut.weight"]).shape[1]
    params: dict = {
        "embed": {"embedding": np.asarray(
            sd["tgt_embed.0.lut.weight"], np.float32)},
        "logit": lin("logit"),
        "enc_norm": ref_ln("encoder.norm"),
        "dec_norm": ref_ln("decoder.norm"),
        "rm": {
            "attn_q": lin("rm.attn.linears.0"),
            "attn_k": lin("rm.attn.linears.1"),
            "attn_v": lin("rm.attn.linears.2"),
            "attn_o": lin("rm.attn.linears.3"),
            "mlp1": lin("rm.mlp.0"),
            "mlp2": lin("rm.mlp.2"),
            "w_gate": lin("rm.W"),
            "u_gate": lin("rm.U"),
        },
    }
    if "att_embed.weight" in sd:
        params["att_embed"] = lin("att_embed")
    else:
        params["att_embed"] = {
            "kernel": np.eye(d_model, dtype=np.float32),
            "bias": np.zeros(d_model, np.float32),
        }
    for i in range(num_layers):
        e = f"encoder.layers.{i}"
        params[f"enc_attn{i}"] = mha(f"{e}.self_attn")
        params[f"enc_ff{i}a"] = lin(f"{e}.feed_forward.w_1")
        params[f"enc_ff{i}b"] = lin(f"{e}.feed_forward.w_2")
        params[f"enc_ln{2 * i}"] = ref_ln(f"{e}.sublayer.0.norm")
        params[f"enc_ln{2 * i + 1}"] = ref_ln(f"{e}.sublayer.1.norm")
        d = f"decoder.layers.{i}"
        params[f"dec_self{i}"] = mha(f"{d}.self_attn")
        params[f"dec_cross{i}"] = mha(f"{d}.src_attn")
        params[f"dec_ff{i}a"] = lin(f"{d}.feed_forward.w_1")
        params[f"dec_ff{i}b"] = lin(f"{d}.feed_forward.w_2")
        for k in range(3):
            c = f"{d}.sublayer.{k}.norm"
            params[f"dec_cln{3 * i + k}"] = {
                **ref_ln(c),
                "delta_gamma": lin(f"{c}.mlp_gamma.0"),
                "delta_gamma2": lin(f"{c}.mlp_gamma.2"),
                "delta_beta": lin(f"{c}.mlp_beta.0"),
                "delta_beta2": lin(f"{c}.mlp_beta.2"),
            }
    return {"params": _to_jnp(params)}


def hopfield_torch_to_flax(
    sd: Mapping[str, np.ndarray], prefix: str = "hopfield."
) -> dict:
    """hflayers HopfieldLayer/Hopfield state dict (AM_MRG vendored
    library) -> :class:`..models.hopfield.Hopfield` ("assoc") params.

    Spec: ``hopfield_layers/hflayers/__init__.py:85-140`` (association
    core + input LayerNorms) and ``activation.py:128-162`` (separate
    q/k/v projection weights when pattern_dim is set, one concatenated
    ``in_proj_bias``). Head blocks are stacked along projection rows in
    both frameworks, so kernels transpose directly.
    """

    def t(name):
        return np.ascontiguousarray(np.asarray(sd[name], np.float32).T)

    core = prefix + "association_core."
    qw, kw, vw = (t(core + n + "_proj_weight") for n in ("q", "k", "v"))
    nhd = qw.shape[1]  # num_heads * head_dim
    bias = np.asarray(sd[core + "in_proj_bias"], np.float32)
    params = {
        "q_proj": {"kernel": qw, "bias": bias[:nhd]},
        "k_proj": {"kernel": kw, "bias": bias[nhd:2 * nhd]},
        "v_proj": {"kernel": vw, "bias": bias[2 * nhd:]},
        "out_proj": {"kernel": t(core + "out_proj.weight"),
                     "bias": np.asarray(sd[core + "out_proj.bias"],
                                        np.float32)},
    }
    for ln, ours in (
        ("norm_stored_pattern", "norm_stored"),
        ("norm_state_pattern", "norm_state"),
        ("norm_pattern_projection", "norm_pattern"),
    ):
        if prefix + ln + ".weight" in sd:
            params[ours] = {
                "scale": np.asarray(sd[prefix + ln + ".weight"], np.float32),
                "bias": np.asarray(sd[prefix + ln + ".bias"], np.float32),
            }
    return {"params": _to_jnp(params)}


def cross_block_torch_to_flax(sd: Mapping[str, np.ndarray]) -> dict:
    """R2GenKG ResidualCrossAttentionBlock state dict (cross.py:5-38,
    nn.MultiheadAttention fused in_proj) ->
    :class:`..models.rgcn.ResidualCrossAttentionBlock` params."""

    def t(name):
        return np.ascontiguousarray(np.asarray(sd[name], np.float32).T)

    w = np.asarray(sd["attn.in_proj_weight"], np.float32)
    b = np.asarray(sd["attn.in_proj_bias"], np.float32)
    d = w.shape[0] // 3
    params = {
        n: {"kernel": np.ascontiguousarray(w[i * d:(i + 1) * d].T),
            "bias": b[i * d:(i + 1) * d]}
        for i, n in enumerate(("q", "k", "v"))
    }
    params["proj"] = {"kernel": t("attn.out_proj.weight"),
                      "bias": np.asarray(sd["attn.out_proj.bias"],
                                         np.float32)}
    params["mlp_in"] = {"kernel": t("mlp.c_fc.weight"),
                        "bias": np.asarray(sd["mlp.c_fc.bias"], np.float32)}
    params["mlp_out"] = {"kernel": t("mlp.c_proj.weight"),
                         "bias": np.asarray(sd["mlp.c_proj.bias"],
                                            np.float32)}
    params["ln_1"] = {"scale": np.asarray(sd["ln_1.gamma"], np.float32)}
    params["ln_2"] = {"scale": np.asarray(sd["ln_2.gamma"], np.float32)}
    return {"params": _to_jnp(params)}

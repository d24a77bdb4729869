"""Flax-side pretrain -> downstream weight bridges (stage chaining).

The reference chains its stages by checkpoint surgery at load time:

- AR stage-1 -> CLIP stage-2 / SFT stage-3: replicate each 1-direction
  mixer tensor into the 4 direction slots, drop the decoder, load
  ``strict=False`` so downstream-only params keep their init
  (``CXPMRG_Bench_MambaXray_VL/models/MambaXrayVL_CLIP.py:44-66``,
  ``MambaXrayVL_DownStream.py:33-42``);
- HD MAE pretrain -> DP / RG finetunes: extract the encoder subtree
  (``HD_Xray_Pretrain_MAE/pretrain/extract_backbone_weights.py``).

This module is the same surgery for OUR OWN pretrain artifacts (orbax
train states / delta checkpoints produced by ``fit_ar``/``fit_mae``/
``fit_clip``), so the 3-stage pipeline runs end-to-end inside the
framework: set ``model.vision_init=<state_epoch*.msgpack>`` on any
downstream recipe.
"""

from __future__ import annotations

import numpy as np
from flax import serialization

# Mixer params carrying a leading direction axis (K=1 in the AR
# pretrain model, K=4 in ARM bimamba-v3); in_proj/out_proj are shared
# across directions in both.
_K_LEADING = {
    "A_log", "D", "conv_b", "conv_w", "dt_bias", "dt_proj_w", "x_proj_w",
}


def load_pretrain_params(path: str) -> dict:
    """Raw model-param tree from a recipe artifact: either a full train
    state (``state_epoch*.msgpack``) or a trainable-only delta
    checkpoint — both are msgpack; the structure tells them apart."""
    with open(path, "rb") as f:
        obj = serialization.msgpack_restore(f.read())
    if "state" in obj:  # save_train_state blob
        tree = obj["state"]["params"]
    elif "delta" in obj:  # save_delta blob
        tree = obj["delta"]
    else:
        tree = obj
    # unwrap the flax {"params": ...} collection nesting
    while isinstance(tree, dict) and set(tree) == {"params"}:
        tree = tree["params"]
    if isinstance(tree, dict) and "params" in tree:
        tree = tree["params"]
    return tree


def ar_encoder_to_arm(ar: dict, k: int = 4) -> dict:
    """VisionMambaAR encoder -> ARM overlay: tile the K=1 mixer tensors
    to ``k`` directions (the reference copies the same pretrain tensor
    into all four slots), keep patch_embed and per-layer norms, drop the
    AR decoder/skip-fusion heads. ARM-only params (cls_token, pos_embed,
    norm_f) keep their downstream init — the strict=False analog."""
    out = {"patch_embed": ar["patch_embed"]}
    for name, sub in ar.items():
        if not name.startswith("layers_"):
            continue
        mixer = {}
        for pn, v in sub["mixer"].items():
            if isinstance(v, dict):  # in_proj/out_proj: shared across dirs
                mixer[pn] = v
                continue
            a = np.asarray(v)
            if pn in _K_LEADING:
                if a.shape[0] != 1:
                    raise ValueError(
                        f"{name}/mixer/{pn}: expected a 1-direction "
                        f"pretrain tensor, got leading dim {a.shape[0]}"
                    )
                a = np.repeat(a, k, axis=0)
            mixer[pn] = a
        out[name] = {"mixer": mixer, "norm": sub["norm"]}
    return out


def mae_encoder_to_vit(mae: dict) -> dict:
    """MAE -> ViT overlay: encoder blocks + cls_token + patch_embed,
    encoder_norm -> norm; decoder tower dropped
    (``extract_backbone_weights.py`` semantics)."""
    out = {
        k: v
        for k, v in mae.items()
        if k.startswith("block") or k in ("cls_token", "patch_embed")
    }
    out["norm"] = mae["encoder_norm"]
    return out


def resolve_vision_overlay(src: dict, family: str) -> dict:
    """Find/derive the ``family`` tower overlay inside an arbitrary
    recipe artifact: an AR/MAE pretrain tree, a CLIP stage-2 state, an
    SFT state, a classifier state, or an already-bare tower tree."""
    if family == "arm":
        if "visual_encoder" in src:  # CLIP stage-2 state (4-dir already)
            return src["visual_encoder"]
        if "arm" in src.get("vision", {}):  # an SFT state
            return src["vision"]["arm"]
        if "enc2dec" in src or "ar_token" in src:  # AR stage-1 pretrain
            return ar_encoder_to_arm(src)
        if "layers_0" in src and "norm_f" in src:  # bare ARM tree
            return src
    elif family == "vit":
        if "encoder_norm" in src:  # MAE pretrain state
            return mae_encoder_to_vit(src)
        if "vit" in src.get("vision", {}):
            return src["vision"]["vit"]
        if "encoder" in src:  # DPClassifier state
            return src["encoder"]
        if "block0" in src and "norm" in src:  # bare ViT tree
            return src
    elif family == "vssm":
        if "backbone" in src:  # VSSMClassifier state
            return src["backbone"]
        if "vssm" in src.get("vision", {}):
            return src["vision"]["vssm"]
        if "layers_0" in src or "patch_embed" in src:  # bare VSSM tree
            return src
    raise ValueError(
        f"could not locate a '{family}' tower in the artifact "
        f"(top-level keys: {sorted(src)[:12]})"
    )


def graft(params: dict, path: tuple[str, ...], overlay: dict) -> dict:
    """Return ``params`` with ``overlay`` merged into the subtree at
    ``path``. Every overlay leaf must exist in the target with the same
    shape; target-only keys keep their init (strict=False semantics)."""

    def merge(dst, src, where):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"{where}/{k} not in the target model")
            if isinstance(v, dict):
                out[k] = merge(dst[k], v, f"{where}/{k}")
            else:
                tgt = np.shape(dst[k])
                if tuple(tgt) != tuple(np.shape(v)):
                    raise ValueError(
                        f"{where}/{k}: shape {np.shape(v)} does not "
                        f"match target {tgt}"
                    )
                out[k] = np.asarray(v).astype(dst[k].dtype)
        return out

    def descend(node, rest):
        if not rest:
            return merge(node, overlay, "/".join(path) or ".")
        head = rest[0]
        if head not in node:
            raise KeyError(f"subtree '{head}' not in params")
        return {**node, head: descend(node[head], rest[1:])}

    return descend(params, list(path))


def apply_vision_init(
    params: dict, artifact_path: str, family: str, subtree: tuple[str, ...]
) -> dict:
    """One-call recipe hook: load artifact, resolve the tower overlay
    for ``family``, graft it at ``subtree`` inside ``params`` (a flax
    variables dict with a 'params' collection)."""
    src = load_pretrain_params(artifact_path)
    overlay = resolve_vision_overlay(src, family)
    inner = graft(params["params"], subtree, overlay)
    kept = ", ".join(sorted(overlay)[:6])
    print(
        f"[vision_init] grafted {family} tower from {artifact_path} "
        f"at {'/'.join(subtree)} ({kept}, ...)"
    )
    return {**params, "params": inner}

"""Checkpoint I/O: Orbax full-state + trainable-only "delta" saves.

Reproduces the reference's four mechanisms (SURVEY.md §5.4):
full periodic checkpoints (Lightning ModelCheckpoint -> Orbax), delta
files of trainable params with {model, config, epoch, step} semantics
(``R2GenCSR.py:546-567``), latest-overwrite resume (misc.save_model),
and the import surgeries in :mod:`.torch_import`.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

import jax
import numpy as np
from flax import serialization


def save_full(path: str, state: Any, step: int | None = None):
    """Orbax-backed full train-state checkpoint (async-capable)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpter = ocp.StandardCheckpointer()
    ckpter.save(path, state, force=True)
    ckpter.wait_until_finished()


def restore_full(path: str, target: Any) -> Any:
    import orbax.checkpoint as ocp

    ckpter = ocp.StandardCheckpointer()
    return ckpter.restore(os.path.abspath(path), target)


def _filter_by_mask(tree, mask):
    return jax.tree_util.tree_map(
        lambda leaf, m: leaf if m else None, tree, mask,
        is_leaf=lambda x: x is None,
    )


def save_delta(
    path: str,
    params: Any,
    trainable_mask: Any | None = None,
    config: dict | None = None,
    epoch: int = 0,
    step: int = 0,
):
    """Trainable-only delta file: {'model': msgpack params, 'config',
    'epoch', 'step'} (R2GenCSR save_checkpoint :546-567)."""
    if trainable_mask is not None:
        # Frozen leaves saved as empty arrays (skipped on merge).
        params = jax.tree_util.tree_map(
            lambda leaf, m: np.asarray(leaf) if m else np.zeros(0, np.float32),
            params, trainable_mask,
        )
    else:
        params = jax.tree_util.tree_map(np.asarray, params)
    blob = serialization.msgpack_serialize(
        {
            "model": params,
            "meta": {
                "config": np.frombuffer(
                    json.dumps(config or {}).encode(), np.uint8
                ).copy(),
                "epoch": np.int64(epoch),
                "step": np.int64(step),
            },
        }
    )
    with open(path, "wb") as f:
        f.write(blob)


def load_delta(path: str) -> tuple[dict, dict]:
    """Returns (params_subtree, meta{config, epoch, step})."""
    with open(path, "rb") as f:
        obj = serialization.msgpack_restore(f.read())
    meta = obj["meta"]
    config = json.loads(bytes(meta["config"].tolist()).decode() or "{}")
    return obj["model"], {
        "config": config,
        "epoch": int(meta["epoch"]),
        "step": int(meta["step"]),
    }


def merge_delta(params: Any, delta: dict) -> Any:
    """strict=False merge (R2GenCSR.py:188-191): overlay non-empty delta
    leaves onto the full param tree."""

    def merge(full, d):
        if isinstance(d, dict) and isinstance(full, dict):
            return {
                k: merge(full[k], d[k]) if k in d else full[k] for k in full
            }
        if hasattr(d, "size") and d.size == 0:
            return full
        return jax.numpy.asarray(d).astype(full.dtype)

    return merge(params, delta)


def delta_filename(epoch: int, step: int, scores: dict | None = None) -> str:
    """checkpoint_epoch{e}_step{s}_bleu{b}_cider{c}.pth naming parity."""
    scores = scores or {}
    b = scores.get("Bleu_4", 0.0)
    c = scores.get("CIDEr", 0.0)
    return f"checkpoint_epoch{epoch}_step{step}_bleu{b:.4f}_cider{c:.4f}.msgpack"


# Full train-state save/resume (misc.save_model/load_model +
# auto_resume_helper parity: CXPMRG pretrain/utils/misc.py:280-358,
# SwinCheX main.py:124-137).

_STATE_RE = re.compile(r"state_epoch(\d+)\.msgpack$")


def save_train_state(save_dir: str, state: Any, epoch: int, keep: int = 3):
    """Write params+opt_state+step atomically; prune to ``keep`` newest."""
    os.makedirs(save_dir, exist_ok=True)
    state_host = jax.tree_util.tree_map(np.asarray, state)
    path = os.path.join(save_dir, f"state_epoch{epoch:05d}.msgpack")
    blob = serialization.to_bytes(
        {"state": state_host, "epoch": np.int64(epoch)}
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    states = sorted(
        f for f in os.listdir(save_dir) if _STATE_RE.search(f)
    )
    for old in states[:-keep]:
        os.remove(os.path.join(save_dir, old))
    return path


def auto_resume_helper(save_dir: str) -> str | None:
    """Latest full train-state checkpoint in ``save_dir`` (or None)."""
    if not os.path.isdir(save_dir):
        return None
    states = sorted(f for f in os.listdir(save_dir) if _STATE_RE.search(f))
    return os.path.join(save_dir, states[-1]) if states else None


def restore_train_state(path: str, target_state: Any) -> tuple[Any, int]:
    """Returns (state, epoch) restored into the target's structure."""
    with open(path, "rb") as f:
        obj = serialization.from_bytes(
            {"state": target_state, "epoch": np.int64(0)}, f.read()
        )
    return obj["state"], int(obj["epoch"])

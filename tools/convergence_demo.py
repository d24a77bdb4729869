"""Offline quality proxy: convergence through the full MRG loop.

No real datasets or released checkpoints exist in this environment, so
the strongest available honesty statement for the NLG pipeline is a
CONVERGENCE DEMONSTRATION (VERDICT r3 item 3): train the minimum
end-to-end slice (ARM-B encoder + small from-scratch LLM,
``task=r2gengpt``) on the ``synthetic_learnable`` label-grammar corpus
— where image->report has real signal — for real epochs on-chip, and
show BLEU-4/CIDEr rising across epochs through the production
train -> beam-generate -> score -> best-checkpoint loop (the val-loop
semantics of ``R2GenCSR.py:637-665``).

Then (VERDICT r3 item 4) reuse the best checkpoint for a TRAINED-weights
serving measurement at the reference decode settings
(``R2GenCSR/configs/config.py:62-68``), reported next to the same model
with random weights — so decode numbers reflect trained-model dynamics
(repetition-penalty hits, EOS behavior, realistic beam divergence).

Usage: python tools/convergence_demo.py [epochs] [train_size]
Outputs: per-epoch metric curve + trained-vs-random serving rows; all
artifacts under /tmp/mia_convergence. Set MIA_DEMO_TINY=1 for a
shrunken CPU smoke (tiny ARM, 64px, batch 4) of the same code path.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/.jax_cache", exist_ok=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
if int(os.environ.get("MIA_DEMO_TINY", "0")):
    # tiny smoke must never contend for the (single-process) TPU
    jax.config.update("jax_platforms", "cpu")

from medical_image_analysis_tpu.configs.config import make_config  # noqa: E402

# Small-but-real decoder LLM trained from scratch: big enough to model
# the 64-report grammar with beam dynamics, small enough to converge in
# minutes on one chip.
LLM_KW = dict(dim=384, n_layers=6, n_heads=6, n_kv_heads=6,
              hidden_dim=1024)

TINY = bool(int(os.environ.get("MIA_DEMO_TINY", "0")))


def build_cfg(epochs: int, train_size: int, save_dir: str):
    return make_config({
        "data": {
            "dataset": "synthetic_learnable",
            "synthetic_train_size": train_size,
            "batch_size": 4 if TINY else 16,
            "input_size": 64 if TINY else 224,
            "max_len": 48,
            "vocab_min_freq": 1,
            "num_views": 1,
        },
        "model": {
            "task": "r2gengpt",
            "vision": "arm",
            "vision_size": "base",
            "vision_kwargs": (
                dict(patch_size=8, embed_dim=16, depth=1, d_state=4,
                     scan_backend="ref", drop_path_rate=0.0)
                if TINY else None
            ),
            "llm_kwargs": (
                dict(dim=96, n_layers=2, n_heads=2, n_kv_heads=2,
                     hidden_dim=256) if TINY else LLM_KW
            ),
        },
        "train": {
            "epochs": epochs,
            "lr": 3e-4,
            "warmup_steps": 50,
            "freeze_llm": False,     # from-scratch decoder
            "save_dir": save_dir,
            "val_max_batches": 0,    # score the full val split
            "log_every": 20,
        },
        "generate": {
            # reference eval decode settings (config.py:62-68) scaled to
            # the grammar's report length
            "num_beams": 3,
            "max_new_tokens": 48,
            "min_new_tokens": 8,
            "repetition_penalty": 2.0,
            "length_penalty": 2.0,
            "max_cache_len": 320,
        },
    })


def print_curve(save_dir: str):
    rows = []
    with open(os.path.join(save_dir, "log.txt")) as f:
        for line in f:
            r = json.loads(line)
            if "Bleu_4" in r and "epoch" in r:
                rows.append(r)
    print("\n== convergence curve (full production val loop) ==")
    print(f"{'epoch':>5} {'Bleu_4':>8} {'CIDEr':>8} {'ROUGE_L':>8} "
          f"{'METEOR':>8} {'ce_f1':>8} {'val_score':>9}")
    for r in rows:
        print(f"{r['epoch']:>5} {r['Bleu_4']:>8.4f} {r['CIDEr']:>8.4f} "
              f"{r['ROUGE_L']:>8.4f} {r['METEOR']:>8.4f} "
              f"{r.get('ce_f1', 0.0):>8.4f} {r['val_score']:>9.4f}")
    return rows


def serving_ab(cfg, save_dir: str):
    """Trained-vs-random decode at reference settings, same model."""
    from medical_image_analysis_tpu.ckpt.checkpoint import (
        load_delta,
        merge_delta,
    )
    from medical_image_analysis_tpu.models.mrg import GenerateConfig
    from medical_image_analysis_tpu.train.loop import (
        build_data,
        build_mrg_model,
    )

    _, tok, batcher, _ = build_data(cfg)
    model = build_mrg_model(cfg, tok.vocab_size)
    # One REAL test batch through the production batcher — identical
    # input format to training/eval; sliced to the reference serving
    # batch (config.py:62-68 uses beam 3 / B≈8).
    batch = next(batcher("test").batches(shuffle=False, drop_last=False))
    b = min(8, batch["images"].shape[0])
    images = jnp.asarray(batch["images"][:b], jnp.bfloat16)
    before = jnp.asarray(batch["before_ids"][:b])
    after = jnp.asarray(batch["after_ids"][:b])
    gcfg = GenerateConfig(
        num_beams=3, max_new_tokens=100, min_new_tokens=8,
        repetition_penalty=2.0, length_penalty=2.0, max_cache_len=320,
    )
    rnd = jax.jit(lambda r: model.init(
        r, images, before, after,
        jnp.asarray(batch["target_ids"][:b]),
        jnp.asarray(batch["target_mask"][:b], jnp.float32),
    ))(jax.random.PRNGKey(0))
    rnd = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16)
        if jnp.issubdtype(v.dtype, jnp.floating) else v, rnd,
    )
    delta, meta = load_delta(
        os.path.join(save_dir, "checkpoint_best.msgpack")
    )
    trained = merge_delta(
        jax.tree_util.tree_map(lambda v: v, rnd), delta
    )
    trained = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16)
        if jnp.issubdtype(v.dtype, jnp.floating) else v, trained,
    )

    gen = jax.jit(lambda p, im: model.apply(
        p, im, before, after, gcfg, method=type(model).generate
    ))
    print("\n== serving A/B: trained vs random weights "
          "(beam 3, rep/len penalty 2.0, B=8) ==")
    out_rows = {}
    for name, params in (("random", rnd), ("trained", trained)):
        out = jax.block_until_ready(gen(params, images))
        lat = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = jax.block_until_ready(gen(params, images))
            lat.append(time.perf_counter() - t0)
        p50 = sorted(lat)[len(lat) // 2]
        toks = np.asarray(jax.tree_util.tree_leaves(out)[0])
        texts = [tok.decode(toks[i]) for i in range(b)]
        lens = [len(t.split()) for t in texts]
        out_rows[name] = dict(p50_ms=p50 * 1e3, rps=b / p50,
                              mean_words=float(np.mean(lens)))
        print(f"{name:>8}: p50 {p50 * 1e3:.0f} ms -> {b / p50:.2f} "
              f"reports/s | mean len {np.mean(lens):.1f} words")
        print(f"          e.g. \"{texts[0][:110]}\"")
    print(f"   reference: \"{batch['reports'][0][:110]}\"")
    return out_rows


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    train_size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    save_dir = "/tmp/mia_convergence"
    # fresh run: fit() auto-resumes (best_score, log.txt append), which
    # would corrupt the printed curve with a previous demo's rows
    import shutil

    shutil.rmtree(save_dir, ignore_errors=True)
    cfg = build_cfg(epochs, train_size, save_dir)
    from medical_image_analysis_tpu.train.loop import fit

    t0 = time.time()
    scores = fit(cfg)
    print(f"\nfit done in {time.time() - t0:.0f}s; final: "
          + json.dumps({k: round(v, 4) for k, v in scores.items()}))
    rows = print_curve(save_dir)
    first, last = rows[0], rows[-1]
    best = json.load(open(os.path.join(save_dir, "best.json")))
    print(f"\nBleu_4 {first['Bleu_4']:.4f} -> {last['Bleu_4']:.4f}; "
          f"CIDEr {first['CIDEr']:.4f} -> {last['CIDEr']:.4f}; "
          f"best checkpoint from epoch {best['epoch']} "
          f"(val_score {best['val_score']:.4f})")
    serving_ab(cfg, save_dir)


if __name__ == "__main__":
    main()

"""Training recipes: MRG SFT, MAE/AR pretrain, CLIP align, classification.

The reference's per-project train.py + Lightning Trainer + raw DDP loops
(SURVEY.md §2.6, §3.1-3.5) collapse into these functions: one pjit step
from :mod:`.train_state`, host batching from :mod:`..data.datasets`,
validation generation + NLG/CE scoring, trainable-only delta saves.
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.config import RunConfig
from ..ckpt.bridge import apply_vision_init
from ..ckpt.checkpoint import (
    auto_resume_helper,
    delta_filename,
    restore_train_state,
    save_delta,
    save_train_state,
)
from ..data.datasets import (
    MRGBatcher,
    disk_image_loader,
    drop_unclear_reports,
    group_study_two_views,
    load_annotations,
    load_chexbert_csv,
    mixup_cutmix,
    prefetch,
    synthetic_annotations,
    synthetic_image_loader,
)
from ..data import side_inputs as side
from ..data.tokenizer import WordTokenizer
from ..evalx.chexbert import clinical_efficacy, extract_labels
from ..evalx.nlg import compute_nlg_scores
from ..models.am_mrg import AMMRG
from ..models.emrrg import EMRRG
from ..models.llm import LLM_CONFIGS
from ..models.mac_rrg import MACRRG
from ..models.mamba import ARM_CONFIGS
from ..models.mrg import GenerateConfig, R2GenCSR, R2GenGPT
from ..models.r2gen_kg import R2GenKG
from ..models.swin import SWIN_CONFIGS
from ..models.vit import MAE, VIT_CONFIGS
from ..models.vision_mamba_ar import VisionMambaAR
from ..models.vmamba import VSSM_CONFIGS
from ..parallel.mesh import make_mesh, shard_batch
from ..parallel.tp import param_specs as tp_param_specs
from ..peft.lora import (
    apply_lora,
    init_lora,
    llama_qv_rules,
    vision_qv_rules,
)
from ..utils.logging import JsonlLogger, MetricLogger
from ..utils.profiling import enable_debug_nans
from .optim import make_adamw, scaled_lr, warmup_cosine
from .train_state import TrainState, make_train_step, shard_state


def _mesh_for(batch_size: int, mesh_data: int = -1, mesh_model: int = 1):
    """(data, model) mesh: model axis as requested (clamped to divide the
    device count), data over the rest as divides the batch."""
    n = len(jax.devices())
    model = max(1, min(mesh_model, n))
    while n % model != 0:
        model -= 1
    if model != max(1, mesh_model):
        print(
            f"[mesh] requested mesh_model={mesh_model} does not divide "
            f"{n} devices; using model={model}"
        )
    avail = n // model
    d = avail if mesh_data in (-1, 0) else min(mesh_data, avail)
    while d > 1 and batch_size % d != 0:
        d -= 1
    if d <= 1 and model <= 1:
        return None
    return make_mesh(
        data=d, model=model, devices=jax.devices()[: d * model]
    )


def _maybe_resume(state, t):
    """Restore the full train state (params+opt+step) and return the
    epoch to continue from (misc.load_model / auto_resume_helper parity,
    ``misc.py:280-358``, SwinCheX ``main.py:124-137``)."""
    if not t.resume:
        return state, 0
    path = (
        auto_resume_helper(t.save_dir) if t.resume == "auto" else t.resume
    )
    if not path or not os.path.exists(path):
        print(f"[resume] no checkpoint found under {t.save_dir}")
        return state, 0
    state, epoch = restore_train_state(path, state)
    print(f"[resume] restored {path} (epoch {epoch})")
    return state, epoch + 1


def _eval_only_params(state, t):
    """Weights for an eval-only run (trainer.test analog): the resumed
    state's params — EMA shadow when enabled — overlaid with an
    optional trainable-only delta checkpoint (train.init_delta)."""
    from ..ckpt.checkpoint import load_delta, merge_delta

    params = (
        state.ema_params
        if state.ema_params is not None and t.ema_decay > 0
        else state.params
    )
    if t.init_delta:
        delta, meta = load_delta(t.init_delta)
        params = merge_delta(params, delta)
        print(f"[eval_only] merged delta {t.init_delta} "
              f"(epoch {meta['epoch']})")
    return params


def _finalize_step(loss_fn, tx, state, mesh, t, specs=None):
    """Shard the state on the mesh (TP params + ZeRO opt moments) and
    build the pjit train step with gradient accumulation."""
    if mesh is not None:
        state = shard_state(state, mesh, specs, zero_opt=t.zero_opt)
    step = make_train_step(
        loss_fn, tx, mesh=mesh, param_specs=specs,
        accum_steps=t.accum_steps, zero_opt=t.zero_opt,
        state_for_shardings=state if mesh is not None else None,
        ema_decay=t.ema_decay,
    )
    return state, step


def vision_preset(family: str, size: str, extra: dict | None = None) -> dict:
    base = {
        "swin": lambda: dict(SWIN_CONFIGS[f"swin_{size}"]),
        "vssm": lambda: dict(VSSM_CONFIGS[f"vssm_{size}"]),
        "arm": lambda: dict(ARM_CONFIGS[f"arm_{size}_pz16"]),
        "vit": lambda: dict(VIT_CONFIGS[f"vit_{size}"]),
    }[family]()
    base.update(extra or {})
    return base


def build_data(cfg: RunConfig):
    """Returns (annotations, tokenizer, batcher factory, image loader)."""
    d = cfg.data
    if d.dataset == "synthetic":
        ann = synthetic_annotations()
        loader = synthetic_image_loader(d.input_size, d.num_views)
    elif d.dataset == "synthetic_learnable":
        from ..data.datasets import (
            learnable_image_loader,
            learnable_synthetic_annotations,
        )

        ann = learnable_synthetic_annotations(
            n_train=d.synthetic_train_size or 512,
            holdout=d.synthetic_holdout,
        )
        loader = learnable_image_loader(d.input_size, d.num_views)
    else:
        ann = load_annotations(d.annotation_path, d.dataset)
        loader = disk_image_loader(d.base_dir, d.input_size)
    if d.drop_unclear_report:
        ann["train"] = drop_unclear_reports(ann["train"])
    two_view = not d.use_feature_mean and d.dataset == "mimic_cxr"
    if two_view:
        # val/test get one deterministic grouping; the train batcher
        # re-samples the pooled extra view per epoch (regroup_views).
        for split in ("val", "test"):
            ann[split] = group_study_two_views(ann[split])
    tok_dir = d.tokenizer_dir or cfg.model.llm_weights_dir
    tok_file = os.path.join(tok_dir, "tokenizer.json") if tok_dir else ""
    if tok_file and os.path.exists(tok_file):
        from ..data.hf_tokenizer import HFTokenizer

        tok = HFTokenizer.from_file(tok_file)
    else:
        if d.tokenizer_dir:
            raise FileNotFoundError(
                f"data.tokenizer_dir set but no tokenizer.json at {tok_file}"
            )
        tok = WordTokenizer.from_corpus(
            (s.report for s in ann["train"]), min_freq=d.vocab_min_freq
        )
    chexbert = load_chexbert_csv(d.chexbert_csv) if d.chexbert_csv else None

    def batcher(split, n_context=0, shuffle=True, extra_fn=None):
        bs = (
            d.val_batch_size
            if split != "train" and d.val_batch_size > 0
            else d.batch_size
        )
        return MRGBatcher(
            ann[split], tok, loader, bs, max_len=d.max_len,
            num_views=d.num_views, prompt_before=d.prompt,
            prompt_after=d.prompt_after, n_context=n_context,
            context_mode=d.context_retrieval_mode,
            context_keyword=d.context_keyword, chexbert_labels=chexbert,
            num_workers=d.num_workers,
            regroup_views=two_view and split == "train",
            extra_fn=extra_fn,
        )
    return ann, tok, batcher, loader


def build_mrg_model(cfg: RunConfig, vocab_size: int):
    m = cfg.model
    if m.llm_weights_dir:
        from ..ckpt.hf_load import read_hf_config

        # Architecture and vocab come from the checkpoint; the data
        # tokenizer must fit inside the checkpoint's embedding table.
        llm_cfg = read_hf_config(m.llm_weights_dir, **(m.llm_kwargs or {}))
        if vocab_size > llm_cfg.vocab_size:
            raise ValueError(
                f"tokenizer vocab ({vocab_size}) exceeds the checkpoint "
                f"vocab ({llm_cfg.vocab_size}); set data.tokenizer_dir to "
                "the checkpoint's tokenizer"
            )
        if m.llm_int8:
            llm_cfg = dataclasses.replace(llm_cfg, quant_int8=True)
    else:
        llm_cfg = dataclasses.replace(
            LLM_CONFIGS[m.llm], vocab_size=vocab_size, **(m.llm_kwargs or {})
        )
    vk = vision_preset(m.vision, m.vision_size, m.vision_kwargs)
    if cfg.train.remat:
        llm_cfg = dataclasses.replace(llm_cfg, remat=True)
        if m.vision == "arm":
            vk.setdefault("remat", True)
    tkw = m.task_kwargs or {}
    if m.task == "r2gencsr":
        return R2GenCSR(llm_cfg=llm_cfg, chosen=m.vision, vision_kwargs=vk,
                        **tkw)
    if m.task == "emrrg":
        return EMRRG(llm_cfg=llm_cfg, arm_kwargs=vk, **tkw)
    if m.task == "am_mrg":
        return AMMRG(llm_cfg=llm_cfg, arm_kwargs=vk, **tkw)
    if m.task == "r2gen_kg":
        return R2GenKG(llm_cfg=llm_cfg, chosen=m.vision, vision_kwargs=vk,
                       **tkw)
    if m.task == "mac_rrg":
        return MACRRG(llm_cfg=llm_cfg, chosen=m.vision, vision_kwargs=vk,
                      **tkw)
    return R2GenGPT(llm_cfg=llm_cfg, chosen=m.vision, vision_kwargs=vk,
                    **tkw)


def unfreeze_hybrid_layers(mask: dict, cross_every: int) -> dict:
    """EMRRG: the reference constructs its hybrid decoder layers AFTER
    the blanket llama freeze (MambaXrayVL_DownStream.py:151-162), so the
    freshly-built layers — inherited weights AND the new gated
    cross-attention — default to trainable while the rest of the LLM
    stays frozen. Mirror that on the mask."""
    llm_mask = dict(mask["llm"])
    for name, sub in llm_mask.items():
        if name.startswith("layers_") and \
                int(name.rsplit("_", 1)[1]) % cross_every == 0:
            llm_mask[name] = jax.tree_util.tree_map(lambda _: True, sub)
    return {**mask, "llm": llm_mask}


def trainable_mask(params, freeze_llm: bool, freeze_vision: bool = False):
    """Freeze the LLM tower (the reference default: frozen/LoRA LLM) and
    optionally the vision tower (ref ``--freeze_vm``,
    R2GenCSR.py:122-127)."""
    frozen_keys = ({"llm"} if freeze_llm else set()) | (
        {"vision", "visual_encoder"} if freeze_vision else set()
    )
    if not frozen_keys:
        return jax.tree_util.tree_map(lambda _: True, params)

    def walk(tree, frozen):
        if isinstance(tree, dict):
            return {
                k: walk(v, frozen or k in frozen_keys)
                for k, v in tree.items()
            }
        return not frozen

    return walk(params, False)


def _init_params(model, _init_rngs, *args, **kwargs):
    """jit the flax init: one compiled launch instead of eager op-by-op
    dispatch (which crawls through the axon host->TPU relay — measured
    minutes for the heads-heavy models). ``kwargs`` (incl. flax call
    kwargs like ``rng=``/``mask_type=``) are closed over."""

    @jax.jit
    def init(r, *a):
        return model.init(r, *a, **kwargs)

    return init(_init_rngs, *args)


def _device_batch(batch: dict, mesh):
    arrays = {
        k: v for k, v in batch.items() if isinstance(v, np.ndarray)
    }
    if mesh is not None:
        return shard_batch(mesh, arrays)
    return {k: jnp.asarray(v) for k, v in arrays.items()}


@dataclasses.dataclass
class TaskAdapter:
    """Batch -> positional-args mapping for one MRG-family task.

    ``loss_args(batch)`` yields the positional args of the model's
    ``__call__``; ``gen_args(batch)`` those of ``generate`` (minus the
    GenerateConfig). Side-input constants (memory banks, graph tensors)
    are closed over as device arrays; per-sample side inputs flow via
    ``extra_fn`` on the batcher.
    """

    loss_args: Any
    gen_args: Any
    extra_fn: Any = None
    n_context: int = 0
    mac_ctx: Any = None


def make_task_adapter(cfg: RunConfig, ann, tok, loader) -> TaskAdapter:
    """Wires each reference pipeline's side inputs (SURVEY.md T1-T7):
    memory banks for AM-MRG, graph tensors for R2GenKG, agent embeds for
    MAC-RRG, context exemplars for R2GenCSR."""
    task = cfg.model.task
    si = dict(cfg.model.side_inputs or {})
    seed = cfg.train.seed
    reports = [s.report for s in ann["train"]]

    def base(b):
        return (b["before_ids"], b["after_ids"])

    def tgt(b):
        return (b["target_ids"], b["target_mask"])

    if task == "r2gencsr":
        return TaskAdapter(
            loss_args=lambda b: (b["images"], b["context_images"],
                                 *base(b), *tgt(b)),
            gen_args=lambda b: (b["images"], b["context_images"], *base(b)),
            n_context=cfg.data.n_context,
        )
    if task == "am_mrg":
        embed = side.make_text_embedder(
            tok, dim=si.get("dim", 64), seed=seed
        )
        vb, rb = side.build_am_banks(
            ann["train"], loader, embed,
            bank_dim=si.get("bank_dim", si.get("dim", 64)),
            visual_bank_path=si.get("visual_bank", ""),
            report_bank_path=si.get("report_bank", ""),
            swin_kwargs=si.get("swin_kwargs"),
            seed=seed,
        )
        vb, rb = jnp.asarray(vb), jnp.asarray(rb)
        return TaskAdapter(
            loss_args=lambda b: (b["images"], vb, rb, *base(b), *tgt(b)),
            gen_args=lambda b: (b["images"], vb, rb, *base(b)),
        )
    if task == "r2gen_kg":
        n_scales = (cfg.model.task_kwargs or {}).get("num_scales", 5)
        if si.get("graph"):
            g = side.load_graph_npz(si["graph"], num_scales=n_scales)
        else:
            embed = side.make_text_embedder(
                tok, dim=si.get("dim", 64), seed=seed
            )
            g = side.synthesize_graph_artifacts(
                reports, embed, num_scales=n_scales,
                base_nodes=si.get("base_nodes", 8),
                edges_per_scale=si.get("edges_per_scale", 64),
                disease_bank_size=si.get("disease_bank_size", 64),
                seed=seed,
            )
        nf = [jnp.asarray(x) for x in g["node_feats"]]
        ei = [jnp.asarray(x) for x in g["edge_indices"]]
        et = [jnp.asarray(x) for x in g["edge_types"]]
        bank = jnp.asarray(g["disease_bank"])
        return TaskAdapter(
            loss_args=lambda b: (b["images"], nf, ei, et, bank,
                                 *base(b), *tgt(b)),
            gen_args=lambda b: (b["images"], nf, ei, et, bank, *base(b)),
        )
    if task == "mac_rrg":
        embed = side.make_text_embedder(
            tok, dim=si.get("dim", 64), seed=seed
        )
        ctx = side.MACContext(
            reports, embed,
            max_chunks=si.get("max_chunks", 8),
            max_entities=si.get("max_entities", 8),
        )
        return TaskAdapter(
            loss_args=lambda b: (b["images"], b["rag_embeds"],
                                 b["concept_embeds"], *base(b), *tgt(b)),
            gen_args=lambda b: (b["images"], b["rag_embeds"],
                                b["concept_embeds"], *base(b)),
            extra_fn=ctx.extra_fn,
            mac_ctx=ctx,
        )
    # r2gengpt / emrrg share the plain skeleton
    return TaskAdapter(
        loss_args=lambda b: (b["images"], *base(b), *tgt(b)),
        gen_args=lambda b: (b["images"], *base(b)),
    )


def splice_llm_weights(params: dict, cfg: RunConfig, model) -> dict:
    """Stream real Llama/Qwen weights over the randomly-initialized LLM
    tower (R2GenCSR.py:141-176: pretrained decoder, frozen or LoRA;
    vision/projector towers keep their fresh init). For emrrg, the
    hybrid decoder keeps Llama param naming and adds
    cross_attn_{kv,gate}_proj inside every cross_every-th layer
    (EMRRG/models/MambaXrayVL_DownStream.py:119-206: pretrained weights
    incl. biases inherited, hybrid-only params keep init) — graft
    instead of replacing the subtree."""
    from ..ckpt.hf_load import load_llm_params

    if cfg.model.task == "emrrg":
        if cfg.model.llm_int8:
            raise ValueError(
                "model.llm_int8 is unsupported for emrrg (the hybrid "
                "layers use plain Dense kernels)"
            )
        from ..ckpt.bridge import graft

        loaded = load_llm_params(cfg.model.llm_weights_dir, model.llm_cfg)
        return {**params, "params": graft(
            params["params"], ("llm",), loaded["params"]
        )}
    loaded = load_llm_params(
        cfg.model.llm_weights_dir, model.llm_cfg, int8=cfg.model.llm_int8
    )
    return {**params, "params": {**params["params"],
                                 "llm": loaded["params"]}}


def fit_mrg(cfg: RunConfig) -> dict:
    """SFT recipe (call stacks 3.1/3.2 of SURVEY.md)."""
    t = cfg.train
    if t.debug_nans:
        enable_debug_nans(True)
    os.makedirs(t.save_dir, exist_ok=True)
    logger = JsonlLogger(t.save_dir)
    ann, tok, batcher, loader = build_data(cfg)
    ad = make_task_adapter(cfg, ann, tok, loader)
    train_b = batcher("train", n_context=ad.n_context,
                      extra_fn=ad.extra_fn)
    model = build_mrg_model(cfg, tok.vocab_size)
    gcfg = dataclasses.replace(cfg.generate, eos_id=tok.EOS)

    first = next(train_b.batches(shuffle=False))
    print(f"[fit_mrg] data+side-inputs ready; initializing params", flush=True)
    params = _init_params(
        model, jax.random.PRNGKey(t.seed), *ad.loss_args(first)
    )
    if cfg.model.vision_init:
        # Stage-1/2 pretrain -> SFT vision-tower graft
        # (MambaXrayVL_DownStream.py:33-42 analog; ckpt/bridge.py).
        # am_mrg/emrrg hold a bare ARM named "vision"; the rest nest the
        # family tower inside a VisionEncoder also named "vision".
        fam = "arm" if cfg.model.task in ("am_mrg", "emrrg") \
            else cfg.model.vision
        sub = ("vision",) if cfg.model.task in ("am_mrg", "emrrg") \
            else ("vision", cfg.model.vision)
        params = apply_vision_init(
            params, cfg.model.vision_init, fam, sub,
        )
    if cfg.model.llm_weights_dir:
        if t.lora_llm and cfg.model.llm_int8:
            raise ValueError(
                "train.lora_llm with model.llm_int8 is unsupported: int8 "
                "is a serving format; train LoRA against bf16 weights"
            )
        params = splice_llm_weights(params, cfg, model)
    print("[fit_mrg] params initialized; building train step", flush=True)

    # LoRA on the LLM q/v projections (the reference's HF-peft default,
    # R2GenCSR.py:160-175) and/or the vision attention q/v
    # (``--vis_use_lora``) — trained alongside the unfrozen towers.
    lora_rules = (
        (llama_qv_rules(t.lora_rank) if t.lora_llm else [])
        + (vision_qv_rules(t.lora_vision_rank) if t.lora_vision else [])
    ) or None
    def base_mask(freeze_vision):
        m_ = trainable_mask(params, t.freeze_llm, freeze_vision)
        if cfg.model.task == "emrrg" and t.freeze_llm:
            m_ = {**m_, "params": unfreeze_hybrid_layers(
                m_["params"], model.cross_every
            )} if "params" in m_ else unfreeze_hybrid_layers(
                m_, model.cross_every
            )
        return m_

    if lora_rules:
        lora = init_lora(
            jax.random.PRNGKey(t.seed + 2), params, lora_rules
        )
        train_params = {"base": params, "lora": lora}

        def merged(p):
            return apply_lora(p["base"], p["lora"], lora_rules)

        mask = {
            "base": base_mask(t.freeze_vision or t.lora_vision),
            "lora": jax.tree_util.tree_map(lambda _: True, lora),
        }
    else:
        train_params = params
        merged = lambda p: p  # noqa: E731
        mask = base_mask(t.freeze_vision)

    assert cfg.data.batch_size % max(t.accum_steps, 1) == 0, (
        "batch_size must be divisible by accum_steps"
    )
    mesh = _mesh_for(
        cfg.data.batch_size // max(t.accum_steps, 1),
        t.mesh_data, t.mesh_model,
    )
    specs = (
        tp_param_specs(train_params, mesh=mesh)
        if mesh is not None
        else None
    )
    steps_per_epoch = max(len(ann["train"]) // cfg.data.batch_size, 1)
    total = steps_per_epoch * t.epochs
    lr = t.lr if t.blr <= 0 else scaled_lr(
        t.blr, cfg.data.batch_size
    )
    sched = warmup_cosine(lr, t.warmup_steps, total)
    tx = make_adamw(
        sched, weight_decay=t.weight_decay, grad_clip=t.grad_clip,
        params_for_mask=train_params, trainable_mask=mask,
    )
    state = TrainState.create(train_params, tx, ema=t.ema_decay > 0)
    state, start_epoch = _maybe_resume(state, t)

    def loss_fn(p, batch, rng):
        return model.apply(merged(p), *ad.loss_args(batch))

    gen_method = type(model).generate

    @jax.jit
    def gen_fn(p, batch):
        return model.apply(
            merged(p), *ad.gen_args(batch), gcfg, method=gen_method,
        )

    if t.eval_only:
        # The Lightning trainer.test/validate stage: restore weights
        # (resume state above and/or a delta), score the split, return.
        eval_params = _eval_only_params(state, t)
        scores = evaluate_mrg(
            model, eval_params,
            batcher(t.eval_split, n_context=ad.n_context,
                    extra_fn=ad.extra_fn),
            tok, gen_fn, mesh,
            max_batches=t.val_max_batches or 10**9,
                chinese=cfg.data.dataset == "chinese",
            dump_path=os.path.join(
                t.save_dir, f"result_{t.eval_split}.json"),
        )
        logger.write({"eval_only": t.eval_split, **scores})
        return scores

    state, step = _finalize_step(loss_fn, tx, state, mesh, t, specs)

    rng = jax.random.PRNGKey(t.seed + 1)
    ml = MetricLogger()
    results = {}
    # Best-so-far weighted val score; survives auto-resume via best.json.
    best_score = float("-inf")
    best_path = os.path.join(t.save_dir, "best.json")
    if os.path.exists(best_path):
        with open(best_path) as f:
            best_score = float(json.load(f).get("val_score", best_score))
    for epoch in range(start_epoch, t.epochs):
        it = prefetch(train_b.batches(epoch=epoch))
        for i, batch in enumerate(ml.log_every(
            it, t.log_every, f"epoch {epoch}", total=steps_per_epoch
        )):
            # rng is folded with state.step INSIDE the compiled step;
            # metrics stay device arrays until a log boundary — both
            # keep the host dispatching ahead of the chip (BENCH.md
            # "step-dispatch pipeline").
            state, metrics = step(state, _device_batch(batch, mesh), rng)
            ml.update(loss=metrics["loss"])
        logger.write({"epoch": epoch, "loss": ml.meters["loss"].global_avg})
        if (epoch + 1) % t.save_state_every_epochs == 0:
            save_train_state(t.save_dir, state, epoch, keep=t.keep_states)

        if (epoch + 1) % t.val_every_epochs == 0:
            # EMA shadow weights are the eval weights when enabled (the
            # timm ModelEma convention the VMamba runner follows).
            eval_params = (
                state.ema_params
                if state.ema_params is not None and t.ema_decay > 0
                else state.params
            )
            scores = evaluate_mrg(
                model, eval_params,
                batcher("val", n_context=ad.n_context,
                        extra_fn=ad.extra_fn),
                tok, gen_fn, mesh,
                max_batches=t.val_max_batches or 10**9,
                chinese=cfg.data.dataset == "chinese",
                dump_path=os.path.join(
                    t.save_dir, f"result_val_epoch{epoch}.json"),
            )
            # Weighted model-selection score (ref scorer_types/weights,
            # R2GenCSR.py:656-664: 0.5*Bleu_4 + 0.5*CIDEr by default).
            val_score = sum(
                scores.get(s, 0.0) * w
                for s, w in zip(t.scorer_types, t.scorer_weights)
            )
            logger.write({"epoch": epoch, "val_score": val_score, **scores})
            results = {**scores, "val_score": val_score}
            path = os.path.join(
                t.save_dir, delta_filename(epoch, int(state.step), scores)
            )
            save_delta(
                path, state.params, mask,
                config={"task": cfg.model.task}, epoch=epoch,
                step=int(state.step),
            )
            if val_score > best_score:
                best_score = val_score
                shutil.copyfile(
                    path, os.path.join(t.save_dir, "checkpoint_best.msgpack")
                )
                with open(os.path.join(t.save_dir, "best.json"), "w") as f:
                    json.dump({"epoch": epoch, "val_score": val_score,
                               **scores}, f)
        # After validation so a preemption-capped run chunk still scores
        # + delta-saves its final epoch (ADVICE round 2).
        if t.max_epochs_this_run and (
            epoch - start_epoch + 1 >= t.max_epochs_this_run
        ):
            break
    return results


def evaluate_mrg(model, params, batcher, tok, gen_fn, mesh=None,
                 max_batches: int = 50, dump_path: str = "",
                 chinese: bool = False) -> dict:
    gts, res = {}, {}
    n_total = -(-len(batcher.samples) // batcher.batch_size)
    if n_total > max_batches:
        print(
            f"[evaluate_mrg] truncating validation to {max_batches} of "
            f"{n_total} batches (max_batches)"
        )
    for bi, batch in enumerate(batcher.batches(shuffle=False,
                                               drop_last=False)):
        if bi >= max_batches:
            break
        out = gen_fn(params, _device_batch(batch, None))
        out = np.asarray(out)
        for i, sid in enumerate(batch["ids"]):
            res[sid] = [tok.decode(out[i])]
            gts[sid] = [batch["reports"][i]]
    scores = compute_nlg_scores(gts, res, chinese=chinese)
    scores.update(clinical_efficacy(gts, res))
    if dump_path:
        # The reference dumps generated/reference texts per eval epoch
        # (R2GenCSR.py:649-653 json result files) for inspection.
        import json

        with open(dump_path, "w") as f:
            json.dump(
                {sid: {"generated": res[sid][0], "reference": gts[sid][0]}
                 for sid in res},
                f, indent=1,
            )
    return scores


def fit_mae(cfg: RunConfig) -> dict:
    """MAE pretrain recipe (HD 3.3-analog; random or region masking)."""
    t, m = cfg.train, cfg.model
    ann, tok, batcher, loader = build_data(cfg)
    model = MAE(
        patch_size=16, in_chans=3,
        **{k: v for k, v in (m.vision_kwargs or {}).items()},
    )
    train_b = batcher("train")
    first = next(train_b.batches(shuffle=False))
    imgs0 = jnp.asarray(first["images"][:, 0])
    rng = jax.random.PRNGKey(t.seed)
    params = _init_params(model, {"params": rng}, imgs0, rng=rng,
                          mask_type=m.mask_type, mask_ratio=m.mask_ratio,
                          mask_ratio_inner=m.mask_ratio_inner)
    mesh = _mesh_for(cfg.data.batch_size, t.mesh_data)
    steps = max(len(ann["train"]) // cfg.data.batch_size, 1) * t.epochs
    lr = t.lr if t.blr <= 0 else scaled_lr(t.blr, cfg.data.batch_size)
    tx = make_adamw(warmup_cosine(lr, t.warmup_steps, steps),
                    weight_decay=t.weight_decay, grad_clip=t.grad_clip,
                    params_for_mask=params)
    state = TrainState.create(params, tx, ema=t.ema_decay > 0)
    state, start_epoch = _maybe_resume(state, t)

    def loss_fn(params, batch, rng):
        loss, _, _ = model.apply(
            params, batch["images"][:, 0], rng=rng, mask_type=m.mask_type,
            mask_ratio=m.mask_ratio, mask_ratio_inner=m.mask_ratio_inner,
            deterministic=False,
        )
        return loss

    state, step = _finalize_step(loss_fn, tx, state, mesh, t)
    ml = MetricLogger()
    for epoch in range(start_epoch, t.epochs):
        for i, batch in enumerate(ml.log_every(
            prefetch(train_b.batches(epoch=epoch)), t.log_every, f"mae epoch {epoch}"
        )):
            # rng is folded with state.step INSIDE the compiled step;
            # metrics stay device arrays until a log boundary — both
            # keep the host dispatching ahead of the chip (BENCH.md
            # "step-dispatch pipeline").
            state, metrics = step(state, _device_batch(batch, mesh), rng)
            ml.update(loss=metrics["loss"])
        if (epoch + 1) % t.save_state_every_epochs == 0:
            save_train_state(t.save_dir, state, epoch, keep=t.keep_states)
        if t.max_epochs_this_run and (
            epoch - start_epoch + 1 >= t.max_epochs_this_run
        ):
            break
    return {"loss": ml.meters["loss"].global_avg}


def fit_ar(cfg: RunConfig) -> dict:
    """Mamba AR pretrain recipe (call stack 3.3)."""
    t, m = cfg.train, cfg.model
    ann, tok, batcher, loader = build_data(cfg)
    model = VisionMambaAR(**(m.vision_kwargs or {}))
    train_b = batcher("train")
    first = next(train_b.batches(shuffle=False))
    imgs0 = jnp.asarray(first["images"][:, 0])
    params = _init_params(model, jax.random.PRNGKey(t.seed), imgs0)
    mesh = _mesh_for(cfg.data.batch_size, t.mesh_data)
    steps = max(len(ann["train"]) // cfg.data.batch_size, 1) * t.epochs
    lr = t.lr if t.blr <= 0 else scaled_lr(t.blr, cfg.data.batch_size)
    tx = make_adamw(warmup_cosine(lr, t.warmup_steps, steps),
                    weight_decay=t.weight_decay, grad_clip=t.grad_clip,
                    params_for_mask=params)
    state = TrainState.create(params, tx, ema=t.ema_decay > 0)
    state, start_epoch = _maybe_resume(state, t)

    def loss_fn(params, batch, rng):
        return model.apply(params, batch["images"][:, 0])

    state, step = _finalize_step(loss_fn, tx, state, mesh, t)
    ml = MetricLogger()
    rng = jax.random.PRNGKey(t.seed + 1)
    for epoch in range(start_epoch, t.epochs):
        for i, batch in enumerate(ml.log_every(
            prefetch(train_b.batches(epoch=epoch)), t.log_every, f"ar epoch {epoch}"
        )):
            # rng is folded with state.step INSIDE the compiled step;
            # metrics stay device arrays until a log boundary — both
            # keep the host dispatching ahead of the chip (BENCH.md
            # "step-dispatch pipeline").
            state, metrics = step(state, _device_batch(batch, mesh), rng)
            ml.update(loss=metrics["loss"])
        if (epoch + 1) % t.save_state_every_epochs == 0:
            save_train_state(t.save_dir, state, epoch, keep=t.keep_states)
        if t.max_epochs_this_run and (
            epoch - start_epoch + 1 >= t.max_epochs_this_run
        ):
            break
    return {"loss": ml.meters["loss"].global_avg}


def fit_clip(cfg: RunConfig) -> dict:
    """CLIP alignment recipe (call stack 3.4)."""
    from ..models.mambaxray_vl import MambaXrayVLCLIP

    t, m = cfg.train, cfg.model
    ann, tok, batcher, loader = build_data(cfg)
    tkw = dict(m.task_kwargs or {})
    if tkw.get("text_tower") == "bert":
        text_kwargs = tkw.pop("text_kwargs", {"vocab_size": tok.vocab_size})
    else:
        text_kwargs = tkw.pop("text_kwargs", dict(
            vocab_size=tok.vocab_size, depth=2, max_len=cfg.data.max_len,
        ))
    model = MambaXrayVLCLIP(
        arm_kwargs=vision_preset("arm", m.vision_size, m.vision_kwargs),
        text_kwargs=text_kwargs, **tkw,
    )
    train_b = batcher("train")
    first = next(train_b.batches(shuffle=False))
    params = _init_params(
        model, jax.random.PRNGKey(t.seed),
        jnp.asarray(first["images"][:, 0]),
        jnp.asarray(first["target_ids"]),
        jnp.asarray(first["target_mask"]),
    )
    if m.vision_init:
        # AR stage-1 -> CLIP stage-2 graft (MambaXrayVL_CLIP.py:44-66).
        params = apply_vision_init(
            params, m.vision_init, "arm", ("visual_encoder",)
        )
    mesh = _mesh_for(cfg.data.batch_size, t.mesh_data)
    steps = max(len(ann["train"]) // cfg.data.batch_size, 1) * t.epochs
    tx = make_adamw(warmup_cosine(t.lr, t.warmup_steps, steps),
                    weight_decay=t.weight_decay, grad_clip=t.grad_clip,
                    params_for_mask=params)
    state = TrainState.create(params, tx, ema=t.ema_decay > 0)
    state, start_epoch = _maybe_resume(state, t)

    def loss_fn(params, batch, rng):
        return model.apply(
            params, batch["images"][:, 0], batch["target_ids"],
            batch["target_mask"],
        )

    state, step = _finalize_step(loss_fn, tx, state, mesh, t)
    ml = MetricLogger()
    rng = jax.random.PRNGKey(0)
    for epoch in range(start_epoch, t.epochs):
        for i, batch in enumerate(ml.log_every(
            prefetch(train_b.batches(epoch=epoch)), t.log_every, f"clip epoch {epoch}"
        )):
            # rng is folded with state.step INSIDE the compiled step;
            # metrics stay device arrays until a log boundary — both
            # keep the host dispatching ahead of the chip (BENCH.md
            # "step-dispatch pipeline").
            state, metrics = step(state, _device_batch(batch, mesh), rng)
            ml.update(loss=metrics["loss"])
        if (epoch + 1) % t.save_state_every_epochs == 0:
            save_train_state(t.save_dir, state, epoch, keep=t.keep_states)
        if t.max_epochs_this_run and (
            epoch - start_epoch + 1 >= t.max_epochs_this_run
        ):
            break
    return {"loss": ml.meters["loss"].global_avg}


def fit_classify(cfg: RunConfig) -> dict:
    """Classification recipes, labels extracted from reports with the
    CheXpert rule labeler:

    - ``swinchex`` + ``vision=swin``: SwinCheX 14x2-head CE (call stack
      3.5, ``SwinCheX/main.py:175-268``);
    - ``swinchex`` + ``vision=vssm``: VMamba classification runner
      analog (``VMamba/classification/main.py``) — VSSM backbone +
      linear head, multi-hot BCE, mixup/EMA;
    - ``dp``: HD disease-prediction ViT with weighted sigmoid BCE +
      pedestrian-style metrics (``finetune/DP/train.py:23-200``).
    """
    from ..evalx.classification import (
        multilabel_auc,
        pedestrian_metrics,
        per_label_accuracy,
    )
    from ..models.classifiers import (
        DPClassifier,
        VSSMClassifier,
        swinchex_loss,
        weighted_bce_loss,
    )
    from ..models.swin import SwinCheX, SwinTransformer

    t, m = cfg.train, cfg.model
    ann, tok, batcher, loader = build_data(cfg)
    if m.task == "dp":
        model = DPClassifier(
            num_attrs=14,
            vit_kwargs=vision_preset("vit", m.vision_size, m.vision_kwargs),
        )
        loss_head, head_kind = weighted_bce_loss, "sigmoid"
    elif m.vision == "vssm":
        model = VSSMClassifier(
            num_classes=14,
            vssm_kwargs=vision_preset("vssm", m.vision_size,
                                      m.vision_kwargs),
        )
        loss_head, head_kind = weighted_bce_loss, "sigmoid"
    else:
        backbone = SwinTransformer(
            **vision_preset("swin", m.vision_size, m.vision_kwargs)
        )
        model = SwinCheX(backbone=backbone, num_classes=14)
        loss_head, head_kind = swinchex_loss, "twoway"
    train_b = batcher("train")
    first = next(train_b.batches(shuffle=False))
    params = _init_params(
        model, jax.random.PRNGKey(t.seed),
        jnp.asarray(first["images"][:, 0]),
    )
    if m.vision_init and m.vision in ("vit", "vssm"):
        # MAE pretrain -> DP finetune encoder graft
        # (extract_backbone_weights.py analog; ckpt/bridge.py).
        params = apply_vision_init(
            params, m.vision_init, m.vision,
            ("encoder",) if m.vision == "vit" else ("backbone",),
        )
    mesh = _mesh_for(cfg.data.batch_size, t.mesh_data)
    steps = max(len(ann["train"]) // cfg.data.batch_size, 1) * t.epochs
    tx = make_adamw(warmup_cosine(t.lr, t.warmup_steps, steps),
                    weight_decay=t.weight_decay, grad_clip=t.grad_clip,
                    params_for_mask=params)
    state = TrainState.create(params, tx, ema=t.ema_decay > 0)
    state, start_epoch = _maybe_resume(state, t)

    def loss_fn(params, batch, rng):
        logits = model.apply(params, batch["images"][:, 0])
        return loss_head(logits, batch["labels"])

    state, step = _finalize_step(loss_fn, tx, state, mesh, t)

    @jax.jit
    def logits_fn(params, images):
        return model.apply(params, images)

    def run_eval(eval_params, split):
        vb = batcher(split)
        all_logits, all_labels = [], []
        for batch in vb.batches(shuffle=False, drop_last=False):
            all_logits.append(np.asarray(
                logits_fn(eval_params, jnp.asarray(batch["images"][:, 0]))
            ))
            all_labels.append(np.stack(
                [extract_labels(r) for r in batch["reports"]]
            ))
        # the final batch is padded by repeating its last sample; keep
        # exactly one row per sample or metrics are biased toward the
        # duplicates.
        n_val = len(vb.samples)
        logits = np.concatenate(all_logits)[:n_val]
        labels = np.concatenate(all_labels)[:n_val]
        if head_kind == "twoway":
            # (N, C, 2) softmax heads: positive-class probability.
            e = np.exp(logits - logits.max(-1, keepdims=True))
            scores = (e / e.sum(-1, keepdims=True))[..., 1]
            return {
                **per_label_accuracy(logits, labels),
                "auc_mean": multilabel_auc(scores, labels)["auc_mean"],
            }
        scores = 1.0 / (1.0 + np.exp(-logits))
        return {
            "auc_mean": multilabel_auc(scores, labels)["auc_mean"],
            **pedestrian_metrics(scores, labels),
        }

    if t.eval_only:
        return run_eval(_eval_only_params(state, t), t.eval_split)

    ml = MetricLogger()
    rng = jax.random.PRNGKey(0)
    results: dict = {}
    for epoch in range(start_epoch, t.epochs):
        for i, batch in enumerate(ml.log_every(
            prefetch(train_b.batches(epoch=epoch)), t.log_every,
            f"cls epoch {epoch}"
        )):
            labels = np.stack(
                [extract_labels(r) for r in batch["reports"]]
            ).astype(np.float32)
            if t.mixup > 0 or t.cutmix > 0:
                mrng = np.random.default_rng((t.seed, epoch, i))
                imgs, labels = mixup_cutmix(
                    mrng, batch["images"], labels,
                    mixup_alpha=t.mixup, cutmix_alpha=t.cutmix,
                )
                batch = dict(batch, images=imgs, labels=labels)
            else:
                batch = dict(batch, labels=labels)
            # rng is folded with state.step INSIDE the compiled step;
            # metrics stay device arrays until a log boundary — both
            # keep the host dispatching ahead of the chip (BENCH.md
            # "step-dispatch pipeline").
            state, metrics = step(state, _device_batch(batch, mesh), rng)
            ml.update(loss=metrics["loss"])
        if (epoch + 1) % t.save_state_every_epochs == 0:
            save_train_state(t.save_dir, state, epoch, keep=t.keep_states)

        if (epoch + 1) % t.val_every_epochs == 0:
            eval_params = (
                state.ema_params
                if state.ema_params is not None and t.ema_decay > 0
                else state.params
            )
            results = run_eval(eval_params, "val")
        if t.max_epochs_this_run and (
            epoch - start_epoch + 1 >= t.max_epochs_this_run
        ):
            break
    return {"loss": ml.meters["loss"].global_avg, **results}


def fit_r2gen(cfg: RunConfig) -> dict:
    """R2Gen classic (T8): visual extractor + RelationalMemory
    transformer decoder trained with report CE, beam eval with NLG+CE
    scores (``RG_english/main.py`` shape)."""
    from ..models.r2gen import R2GenPipeline

    t, m = cfg.train, cfg.model
    os.makedirs(t.save_dir, exist_ok=True)
    logger = JsonlLogger(t.save_dir)
    ann, tok, batcher, loader = build_data(cfg)
    model = R2GenPipeline(
        vocab_size=tok.vocab_size,
        chosen=m.vision,
        vision_kwargs=vision_preset(m.vision, m.vision_size,
                                    m.vision_kwargs),
        bos_id=tok.BOS, eos_id=tok.EOS,
        **(m.task_kwargs or {}),
    )
    train_b = batcher("train")
    first = next(train_b.batches(shuffle=False))
    params = _init_params(
        model, jax.random.PRNGKey(t.seed), jnp.asarray(first["images"]),
        jnp.asarray(first["target_ids"]), jnp.asarray(first["target_mask"]),
    )
    if m.vision_init:
        # HD MAE pretrain -> RG finetune encoder graft
        # (finetune/RG_english visual extractor init; ckpt/bridge.py).
        params = apply_vision_init(
            params, m.vision_init, m.vision, ("vision", m.vision)
        )
    mesh = _mesh_for(cfg.data.batch_size, t.mesh_data)
    steps = max(len(ann["train"]) // cfg.data.batch_size, 1) * t.epochs
    tx = make_adamw(warmup_cosine(t.lr, t.warmup_steps, steps),
                    weight_decay=t.weight_decay, grad_clip=t.grad_clip,
                    params_for_mask=params)
    state = TrainState.create(params, tx, ema=t.ema_decay > 0)
    state, start_epoch = _maybe_resume(state, t)

    def loss_fn(params, batch, rng):
        return model.apply(
            params, batch["images"], batch["target_ids"],
            batch["target_mask"],
        )

    g = cfg.generate

    @jax.jit
    def gen_fn(params, batch):
        return model.apply(
            params, batch["images"],
            method=R2GenPipeline.generate,
            max_new_tokens=g.max_new_tokens, num_beams=g.num_beams,
        )

    if t.eval_only:
        scores = evaluate_mrg(
            model, _eval_only_params(state, t), batcher(t.eval_split),
            tok, gen_fn, mesh, max_batches=t.val_max_batches or 10**9,
                chinese=cfg.data.dataset == "chinese",
            dump_path=os.path.join(
                t.save_dir, f"result_{t.eval_split}.json"),
        )
        logger.write({"eval_only": t.eval_split, **scores})
        return scores

    state, step = _finalize_step(loss_fn, tx, state, mesh, t)

    ml = MetricLogger()
    rng = jax.random.PRNGKey(t.seed + 1)
    results: dict = {}
    for epoch in range(start_epoch, t.epochs):
        for i, batch in enumerate(ml.log_every(
            prefetch(train_b.batches(epoch=epoch)), t.log_every,
            f"r2gen epoch {epoch}"
        )):
            # rng is folded with state.step INSIDE the compiled step;
            # metrics stay device arrays until a log boundary — both
            # keep the host dispatching ahead of the chip (BENCH.md
            # "step-dispatch pipeline").
            state, metrics = step(state, _device_batch(batch, mesh), rng)
            ml.update(loss=metrics["loss"])
        logger.write({"epoch": epoch, "loss": ml.meters["loss"].global_avg})
        if (epoch + 1) % t.save_state_every_epochs == 0:
            save_train_state(t.save_dir, state, epoch, keep=t.keep_states)
        if (epoch + 1) % t.val_every_epochs == 0:
            eval_params = (
                state.ema_params
                if state.ema_params is not None and t.ema_decay > 0
                else state.params
            )
            scores = evaluate_mrg(
                model, eval_params, batcher("val"), tok, gen_fn, mesh,
                max_batches=t.val_max_batches or 10**9,
                chinese=cfg.data.dataset == "chinese",
            )
            logger.write({"epoch": epoch, **scores})
            results = scores
            save_delta(
                os.path.join(
                    t.save_dir, delta_filename(epoch, int(state.step), scores)
                ),
                state.params,
                jax.tree_util.tree_map(lambda _: True, state.params),
                config={"task": "r2gen"}, epoch=epoch, step=int(state.step),
            )
        if t.max_epochs_this_run and (
            epoch - start_epoch + 1 >= t.max_epochs_this_run
        ):
            break
    return results


def fit_lm_sft(cfg: RunConfig) -> dict:
    """EMRRG text-only PEFT finetune (T11): MambaLM over alpaca-style
    prompts built from the reports (``EMRRG/finetune.py:30-677``).
    ``model.lm_kwargs`` configures the LM (incl. ``peft_cfg``); LoRA /
    weight-space MambaPEFT applies via optimizer masks + param
    transforms as in :mod:`..peft.mamba_peft`."""
    from ..models.mamba_lm import MambaLM, alpaca_prompt, lm_loss

    t, m, d = cfg.train, cfg.model, cfg.data
    os.makedirs(t.save_dir, exist_ok=True)
    logger = JsonlLogger(t.save_dir)
    ann, tok, batcher, loader = build_data(cfg)
    instruction = (
        "generate a comprehensive diagnosis report for this study"
    )

    def lm_extra(sample):
        ids = tok.encode(
            alpaca_prompt(instruction, "", sample.report),
            max_len=d.max_len - 1, add_eos=True,
        )
        ids, mask = tok.pad(ids, d.max_len)
        return {"lm_ids": np.asarray(ids, np.int32),
                "lm_mask": np.asarray(mask, np.int32)}

    model = MambaLM(vocab_size=tok.vocab_size, **(m.lm_kwargs or {}))
    train_b = batcher("train", extra_fn=lm_extra)
    first = next(train_b.batches(shuffle=False))
    params = _init_params(
        model, jax.random.PRNGKey(t.seed), jnp.asarray(first["lm_ids"])
    )
    mesh = _mesh_for(cfg.data.batch_size, t.mesh_data)
    steps = max(len(ann["train"]) // cfg.data.batch_size, 1) * t.epochs
    tx = make_adamw(warmup_cosine(t.lr, t.warmup_steps, steps),
                    weight_decay=t.weight_decay, grad_clip=t.grad_clip,
                    params_for_mask=params)
    state = TrainState.create(params, tx, ema=t.ema_decay > 0)
    state, start_epoch = _maybe_resume(state, t)

    def loss_fn(params, batch, rng):
        logits = model.apply(params, batch["lm_ids"])
        return lm_loss(logits, batch["lm_ids"], batch["lm_mask"])

    state, step = _finalize_step(loss_fn, tx, state, mesh, t)

    @jax.jit
    def eval_loss_fn(params, batch):
        logits = model.apply(params, batch["lm_ids"])
        return lm_loss(logits, batch["lm_ids"], batch["lm_mask"])

    def run_eval(eval_params, split):
        vb = batcher(split, extra_fn=lm_extra)
        n_val = len(vb.samples)
        losses, seen = [], 0
        for b in vb.batches(shuffle=False, drop_last=False):
            arrays = {k: v for k, v in b.items()
                      if isinstance(v, np.ndarray)}
            bsz = next(iter(arrays.values())).shape[0]
            real = min(bsz, n_val - seen)
            seen += bsz
            if real <= 0:
                break
            if real < bsz:
                # final batch pads by repeating its tail row — slice
                # the duplicates off (one extra compile, exact mean)
                arrays = {k: v[:real] for k, v in arrays.items()}
            losses.append(
                (float(eval_loss_fn(eval_params,
                                    _device_batch(arrays, None))),
                 real)
            )
        val_loss = (
            float(sum(l * w for l, w in losses)
                  / max(sum(w for _, w in losses), 1))
            if losses else float("nan")
        )
        return {"val_loss": val_loss,
                "val_ppl": float(np.exp(min(val_loss, 20.0)))}

    if t.eval_only:
        return run_eval(_eval_only_params(state, t), t.eval_split)

    ml = MetricLogger()
    rng = jax.random.PRNGKey(t.seed + 1)
    results: dict = {}
    for epoch in range(start_epoch, t.epochs):
        for i, batch in enumerate(ml.log_every(
            prefetch(train_b.batches(epoch=epoch)), t.log_every,
            f"lm epoch {epoch}"
        )):
            # rng is folded with state.step INSIDE the compiled step;
            # metrics stay device arrays until a log boundary — both
            # keep the host dispatching ahead of the chip (BENCH.md
            # "step-dispatch pipeline").
            state, metrics = step(state, _device_batch(batch, mesh), rng)
            ml.update(loss=metrics["loss"])
        logger.write({"epoch": epoch, "loss": ml.meters["loss"].global_avg})
        if (epoch + 1) % t.save_state_every_epochs == 0:
            save_train_state(t.save_dir, state, epoch, keep=t.keep_states)
        if (epoch + 1) % t.val_every_epochs == 0:
            results = run_eval(state.params, "val")
            logger.write({"epoch": epoch, **results})
        if t.max_epochs_this_run and (
            epoch - start_epoch + 1 >= t.max_epochs_this_run
        ):
            break
    return results


RECIPES = {
    "r2gengpt": fit_mrg,
    "r2gencsr": fit_mrg,
    "emrrg": fit_mrg,
    "am_mrg": fit_mrg,
    "r2gen_kg": fit_mrg,
    "mac_rrg": fit_mrg,
    "r2gen": fit_r2gen,
    "mae": fit_mae,
    "ar": fit_ar,
    "clip": fit_clip,
    "swinchex": fit_classify,
    "dp": fit_classify,
    "mamba_lm_sft": fit_lm_sft,
}


def fit(cfg: RunConfig) -> dict:
    return RECIPES[cfg.model.task](cfg)

"""Training recipes: MRG SFT, MAE/AR pretrain, CLIP align, classification.

The reference's per-project train.py + Lightning Trainer + raw DDP loops
(SURVEY.md §2.6, §3.1-3.5) collapse into these functions: one pjit step
from :mod:`.train_state`, host batching from :mod:`..data.datasets`,
validation generation + NLG/CE scoring, trainable-only delta saves.
"""

from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.config import RunConfig
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
from ..data.tokenizer import WordTokenizer
from ..evalx.chexbert import clinical_efficacy, extract_labels
from ..evalx.nlg import compute_nlg_scores
from ..models.emrrg import EMRRG
from ..models.llm import LLM_CONFIGS
from ..models.mamba import ARM_CONFIGS
from ..models.mrg import GenerateConfig, R2GenCSR, R2GenGPT
from ..models.swin import SWIN_CONFIGS
from ..models.vit import MAE
from ..models.vision_mamba_ar import VisionMambaAR
from ..models.vmamba import VSSM_CONFIGS
from ..parallel.mesh import make_mesh, shard_batch
from ..parallel.tp import param_specs as tp_param_specs
from ..peft.lora import apply_lora, init_lora, llama_qv_rules
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
    }[family]()
    base.update(extra or {})
    return base


def build_data(cfg: RunConfig):
    d = cfg.data
    if d.dataset == "synthetic":
        ann = synthetic_annotations()
        loader = synthetic_image_loader(d.input_size, d.num_views)
    else:
        ann = load_annotations(d.annotation_path, d.dataset)
        loader = disk_image_loader(d.base_dir, d.input_size)
    ann["train"] = drop_unclear_reports(ann["train"])
    if not d.use_feature_mean and d.dataset == "mimic_cxr":
        ann["train"] = group_study_two_views(ann["train"])
    tok = WordTokenizer.from_corpus(
        (s.report for s in ann["train"]), min_freq=d.vocab_min_freq
    )
    chexbert = load_chexbert_csv(d.chexbert_csv) if d.chexbert_csv else None

    def batcher(split, n_context=0, shuffle=True):
        return MRGBatcher(
            ann[split], tok, loader, d.batch_size, max_len=d.max_len,
            num_views=d.num_views, prompt_before=d.prompt,
            prompt_after=d.prompt_after, n_context=n_context,
            context_mode=d.context_retrieval_mode,
            context_keyword=d.context_keyword, chexbert_labels=chexbert,
            num_workers=d.num_workers,
        )
    return ann, tok, batcher


def build_mrg_model(cfg: RunConfig, vocab_size: int):
    m = cfg.model
    llm_cfg = dataclasses.replace(
        LLM_CONFIGS[m.llm], vocab_size=vocab_size, **(m.llm_kwargs or {})
    )
    vk = vision_preset(m.vision, m.vision_size, m.vision_kwargs)
    if cfg.train.remat:
        llm_cfg = dataclasses.replace(llm_cfg, remat=True)
        if m.vision == "arm":
            vk.setdefault("remat", True)
    if m.task == "r2gencsr":
        return R2GenCSR(llm_cfg=llm_cfg, chosen=m.vision, vision_kwargs=vk)
    if m.task == "emrrg":
        return EMRRG(llm_cfg=llm_cfg, arm_kwargs=vk)
    return R2GenGPT(llm_cfg=llm_cfg, chosen=m.vision, vision_kwargs=vk)


def trainable_mask(params, freeze_llm: bool):
    """Freeze the LLM tower (the reference default: frozen/LoRA LLM)."""
    if not freeze_llm:
        return jax.tree_util.tree_map(lambda _: True, params)

    def walk(tree, frozen):
        if isinstance(tree, dict):
            return {
                k: walk(v, frozen or k == "llm") for k, v in tree.items()
            }
        return not frozen

    return walk(params, False)


def _device_batch(batch: dict, mesh):
    arrays = {
        k: v for k, v in batch.items() if isinstance(v, np.ndarray)
    }
    if mesh is not None:
        return shard_batch(mesh, arrays)
    return {k: jnp.asarray(v) for k, v in arrays.items()}


_MRG_KEYS = ("images", "before_ids", "after_ids", "target_ids", "target_mask")
_GEN_KEYS = ("images", "before_ids", "after_ids")
_CSR_TRAIN = ("images", "context_images", "before_ids", "after_ids",
              "target_ids", "target_mask")
_CSR_GEN = ("images", "context_images", "before_ids", "after_ids")


def fit_mrg(cfg: RunConfig) -> dict:
    """SFT recipe (call stacks 3.1/3.2 of SURVEY.md)."""
    t = cfg.train
    if t.debug_nans:
        enable_debug_nans(True)
    os.makedirs(t.save_dir, exist_ok=True)
    logger = JsonlLogger(t.save_dir)
    ann, tok, batcher = build_data(cfg)
    is_csr = cfg.model.task == "r2gencsr"
    n_ctx = cfg.data.n_context if is_csr else 0
    train_b = batcher("train", n_context=n_ctx)
    model = build_mrg_model(cfg, tok.vocab_size)
    gcfg = dataclasses.replace(cfg.generate, eos_id=tok.EOS)

    first = next(train_b.batches(shuffle=False))
    keys = _CSR_TRAIN if is_csr else _MRG_KEYS
    init_args = [jnp.asarray(first[k]) for k in keys]
    params = model.init(jax.random.PRNGKey(t.seed), *init_args)

    # LoRA on the LLM q/v projections (the reference's HF-peft default,
    # R2GenCSR.py:160-175) — trained alongside the unfrozen towers.
    lora_rules = llama_qv_rules(t.lora_rank) if t.lora_llm else None
    if t.lora_llm:
        lora = init_lora(
            jax.random.PRNGKey(t.seed + 2), params, lora_rules
        )
        train_params = {"base": params, "lora": lora}

        def merged(p):
            return apply_lora(p["base"], p["lora"], lora_rules)

        mask = {
            "base": trainable_mask(params, t.freeze_llm),
            "lora": jax.tree_util.tree_map(lambda _: True, lora),
        }
    else:
        train_params = params
        merged = lambda p: p  # noqa: E731
        mask = trainable_mask(params, t.freeze_llm)

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
    state = TrainState.create(train_params, tx)
    state, start_epoch = _maybe_resume(state, t)

    def loss_fn(p, batch, rng):
        return model.apply(merged(p), *[batch[k] for k in keys])

    state, step = _finalize_step(loss_fn, tx, state, mesh, t, specs)
    gen_keys = _CSR_GEN if is_csr else _GEN_KEYS
    gen_method = type(model).generate

    @jax.jit
    def gen_fn(p, batch):
        return model.apply(
            merged(p), *[batch[k] for k in gen_keys], gcfg,
            method=gen_method,
        )

    rng = jax.random.PRNGKey(t.seed + 1)
    ml = MetricLogger()
    results = {}
    for epoch in range(start_epoch, t.epochs):
        it = prefetch(train_b.batches(epoch=epoch))
        for i, batch in enumerate(ml.log_every(
            it, t.log_every, f"epoch {epoch}", total=steps_per_epoch
        )):
            sub = jax.random.fold_in(rng, (epoch << 20) + i)
            state, metrics = step(state, _device_batch(batch, mesh), sub)
            ml.update(loss=float(metrics["loss"]))
        logger.write({"epoch": epoch, "loss": ml.meters["loss"].global_avg})
        if (epoch + 1) % t.save_state_every_epochs == 0:
            save_train_state(t.save_dir, state, epoch, keep=t.keep_states)
        if t.max_epochs_this_run and (
            epoch - start_epoch + 1 >= t.max_epochs_this_run
        ):
            break

        if (epoch + 1) % t.val_every_epochs == 0:
            scores = evaluate_mrg(
                model, state.params, batcher("val", n_context=n_ctx), tok,
                gen_fn, mesh,
            )
            logger.write({"epoch": epoch, **scores})
            results = scores
            save_delta(
                os.path.join(
                    t.save_dir, delta_filename(epoch, int(state.step), scores)
                ),
                state.params, mask,
                config={"task": cfg.model.task}, epoch=epoch,
                step=int(state.step),
            )
    return results


def evaluate_mrg(model, params, batcher, tok, gen_fn, mesh=None,
                 max_batches: int = 50) -> dict:
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
    scores = compute_nlg_scores(gts, res)
    scores.update(clinical_efficacy(gts, res))
    return scores


def fit_mae(cfg: RunConfig) -> dict:
    """MAE pretrain recipe (HD 3.3-analog; random or region masking)."""
    t, m = cfg.train, cfg.model
    ann, tok, batcher = build_data(cfg)
    model = MAE(
        patch_size=16, in_chans=3,
        **{k: v for k, v in (m.vision_kwargs or {}).items()},
    )
    train_b = batcher("train")
    first = next(train_b.batches(shuffle=False))
    imgs0 = jnp.asarray(first["images"][:, 0])
    rng = jax.random.PRNGKey(t.seed)
    params = model.init({"params": rng}, imgs0, rng=rng,
                        mask_type=m.mask_type, mask_ratio=m.mask_ratio,
                        mask_ratio_inner=m.mask_ratio_inner)
    mesh = _mesh_for(cfg.data.batch_size, t.mesh_data)
    steps = max(len(ann["train"]) // cfg.data.batch_size, 1) * t.epochs
    lr = t.lr if t.blr <= 0 else scaled_lr(t.blr, cfg.data.batch_size)
    tx = make_adamw(warmup_cosine(lr, t.warmup_steps, steps),
                    weight_decay=t.weight_decay, grad_clip=t.grad_clip,
                    params_for_mask=params)
    state = TrainState.create(params, tx)
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
            sub = jax.random.fold_in(rng, (epoch << 20) + i)
            state, metrics = step(state, _device_batch(batch, mesh), sub)
            ml.update(loss=float(metrics["loss"]))
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
    ann, tok, batcher = build_data(cfg)
    model = VisionMambaAR(**(m.vision_kwargs or {}))
    train_b = batcher("train")
    first = next(train_b.batches(shuffle=False))
    imgs0 = jnp.asarray(first["images"][:, 0])
    params = model.init(jax.random.PRNGKey(t.seed), imgs0)
    mesh = _mesh_for(cfg.data.batch_size, t.mesh_data)
    steps = max(len(ann["train"]) // cfg.data.batch_size, 1) * t.epochs
    lr = t.lr if t.blr <= 0 else scaled_lr(t.blr, cfg.data.batch_size)
    tx = make_adamw(warmup_cosine(lr, t.warmup_steps, steps),
                    weight_decay=t.weight_decay, grad_clip=t.grad_clip,
                    params_for_mask=params)
    state = TrainState.create(params, tx)
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
            sub = jax.random.fold_in(rng, (epoch << 20) + i)
            state, metrics = step(state, _device_batch(batch, mesh), sub)
            ml.update(loss=float(metrics["loss"]))
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
    ann, tok, batcher = build_data(cfg)
    model = MambaXrayVLCLIP(
        arm_kwargs=vision_preset("arm", m.vision_size, m.vision_kwargs),
        text_kwargs=dict(vocab_size=tok.vocab_size, depth=2,
                         max_len=cfg.data.max_len),
    )
    train_b = batcher("train")
    first = next(train_b.batches(shuffle=False))
    params = model.init(
        jax.random.PRNGKey(t.seed),
        jnp.asarray(first["images"][:, 0]),
        jnp.asarray(first["target_ids"]),
        jnp.asarray(first["target_mask"]),
    )
    mesh = _mesh_for(cfg.data.batch_size, t.mesh_data)
    steps = max(len(ann["train"]) // cfg.data.batch_size, 1) * t.epochs
    tx = make_adamw(warmup_cosine(t.lr, t.warmup_steps, steps),
                    weight_decay=t.weight_decay, grad_clip=t.grad_clip,
                    params_for_mask=params)
    state = TrainState.create(params, tx)
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
            sub = jax.random.fold_in(rng, (epoch << 20) + i)
            state, metrics = step(state, _device_batch(batch, mesh), sub)
            ml.update(loss=float(metrics["loss"]))
        if (epoch + 1) % t.save_state_every_epochs == 0:
            save_train_state(t.save_dir, state, epoch, keep=t.keep_states)
        if t.max_epochs_this_run and (
            epoch - start_epoch + 1 >= t.max_epochs_this_run
        ):
            break
    return {"loss": ml.meters["loss"].global_avg}


def fit_classify(cfg: RunConfig) -> dict:
    """SwinCheX-style 14-label classification (call stack 3.5); labels
    extracted from reports with the CheXpert rule labeler."""
    from ..models.classifiers import swinchex_loss
    from ..models.swin import SwinCheX, SwinTransformer

    t, m = cfg.train, cfg.model
    ann, tok, batcher = build_data(cfg)
    backbone = SwinTransformer(
        **vision_preset("swin", m.vision_size, m.vision_kwargs)
    )
    model = SwinCheX(backbone=backbone, num_classes=14)
    train_b = batcher("train")
    first = next(train_b.batches(shuffle=False))
    params = model.init(
        jax.random.PRNGKey(t.seed), jnp.asarray(first["images"][:, 0])
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
        return swinchex_loss(logits, batch["labels"])

    state, step = _finalize_step(loss_fn, tx, state, mesh, t)
    ml = MetricLogger()
    rng = jax.random.PRNGKey(0)
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
            sub = jax.random.fold_in(rng, (epoch << 20) + i)
            state, metrics = step(state, _device_batch(batch, mesh), sub)
            ml.update(loss=float(metrics["loss"]))
        if (epoch + 1) % t.save_state_every_epochs == 0:
            save_train_state(t.save_dir, state, epoch, keep=t.keep_states)
        if t.max_epochs_this_run and (
            epoch - start_epoch + 1 >= t.max_epochs_this_run
        ):
            break
    return {"loss": ml.meters["loss"].global_avg}


RECIPES = {
    "r2gengpt": fit_mrg,
    "r2gencsr": fit_mrg,
    "emrrg": fit_mrg,
    "mae": fit_mae,
    "ar": fit_ar,
    "clip": fit_clip,
    "swinchex": fit_classify,
}


def fit(cfg: RunConfig) -> dict:
    return RECIPES[cfg.model.task](cfg)

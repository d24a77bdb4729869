"""Typed configuration system with YAML presets.

Replaces the reference's three config mechanisms (SURVEY.md §5.6):
argparse monoliths (``R2GenCSR/configs/config.py``), yacs trees
(SwinCheX/VMamba), and fire CLIs (EMRRG) with one dataclass tree +
YAML presets + dotted-path overrides.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import yaml

from ..models.mrg import GenerateConfig


@dataclasses.dataclass
class DataConfig:
    # iu_xray | mimic_cxr | chexpert_plus | chinese | synthetic |
    # synthetic_learnable (label-grammar corpus with image->report
    # signal, for convergence demonstrations without real data)
    dataset: str = "iu_xray"
    annotation_path: str = ""
    synthetic_train_size: int = 0  # synthetic_learnable train set (0 = 512)
    # synthetic_learnable: reserve this many of the 64 finding
    # combinations exclusively for val/test (compositional holdout —
    # val measures unseen combinations of seen sentences, not recall)
    synthetic_holdout: int = 0
    base_dir: str = ""
    batch_size: int = 6
    val_batch_size: int = 0  # eval-split batch size; 0 = batch_size
    input_size: int = 224
    max_len: int = 100
    num_views: int = 2
    n_context: int = 0  # R2GenCSR context exemplars per polarity
    context_retrieval_mode: str = "keyword"  # keyword | random | chexbert
    context_keyword: Any = "effusion"  # str or list of disease keywords
    chexbert_csv: str = ""  # ann_chexbert.csv path for chexbert mode
    # Directory holding an HF tokenizer.json (defaults to
    # model.llm_weights_dir when that is set): use the checkpoint's BPE
    # tokenizer instead of the corpus word tokenizer — required when
    # training against real LLM weights (R2GenCSR.py:141-176 loads the
    # Llama/Qwen tokenizer alongside the model).
    tokenizer_dir: str = ""
    use_feature_mean: bool = True  # False: MIMIC study-grouped two-view
    # Filter degenerate/unclear reports from the train split
    # (ref --drop_unclear_report, default False — config.py:26).
    drop_unclear_report: bool = False
    num_workers: int = 8  # parallel image-decode threads
    vocab_min_freq: int = 3
    prompt: str = "human : generate a comprehensive and detailed diagnosis report for this chest xray image ."
    prompt_after: str = "assistant :"


@dataclasses.dataclass
class ModelConfig:
    task: str = "r2gengpt"  # r2gengpt | r2gencsr | am_mrg | r2gen_kg
    #   | mac_rrg | emrrg | r2gen | clip | mae | ar | swinchex | dp
    #   | mamba_lm_sft
    vision: str = "swin"  # swin | vssm | arm | vit
    vision_size: str = "base"  # tiny | base | large (per-family presets)
    llm: str = "qwen1_5_0_5b"  # key into models.llm.LLM_CONFIGS
    # HF checkpoint dir (config.json + *.safetensors): stream real
    # Llama/Qwen weights into the (frozen or LoRA) LLM tower instead of
    # random init — the reference's standard SFT setup. Architecture
    # comes from the checkpoint's config.json (model.llm is ignored);
    # llm_kwargs still override individual fields.
    llm_weights_dir: str = ""
    llm_int8: bool = False  # int8-quantize the streamed LLM kernels
    # Pretrain artifact (state_epoch*.msgpack or delta checkpoint from
    # fit_ar / fit_mae / fit_clip / a classifier run) grafted into the
    # vision tower at init — the reference's stage-chaining surgery
    # (MambaXrayVL_CLIP.py:44-66, extract_backbone_weights.py); see
    # ckpt/bridge.py.
    vision_init: str = ""
    vision_kwargs: dict = dataclasses.field(default_factory=dict)
    llm_kwargs: dict = dataclasses.field(default_factory=dict)
    # Extra constructor kwargs for the heads-heavy task models (AMMRG
    # qformer_*, R2GenKG graph_dim/num_scales, R2GenPipeline r2gen_kwargs,
    # MambaLM d_model/depth via lm_kwargs below).
    task_kwargs: dict = dataclasses.field(default_factory=dict)
    # Side-input artifacts (memory banks / graph tensors / agent context,
    # SURVEY.md F3/F4, D6). Paths load .npz/.npy; absent paths synthesize
    # from the train split (data/side_inputs.py). Knobs: dim (embedder
    # width), max_chunks/max_entities (MAC), num_scales/base_nodes (KG).
    side_inputs: dict = dataclasses.field(default_factory=dict)
    lm_kwargs: dict = dataclasses.field(default_factory=dict)  # MambaLM
    mask_type: str = "random"  # mae: random | region
    mask_ratio: float = 0.75
    mask_ratio_inner: float = 0.75


@dataclasses.dataclass
class TrainConfig:
    epochs: int = 3
    lr: float = 1e-4
    blr: float = 0.0  # if >0: lr = blr * global_batch / 256
    weight_decay: float = 0.05
    warmup_steps: int = 100
    grad_clip: float = 1.0
    freeze_llm: bool = True
    freeze_vision: bool = False  # ref --freeze_vm (R2GenCSR.py:122-127)
    lora_llm: bool = False
    lora_rank: int = 16
    lora_vision: bool = False  # ref --vis_use_lora (R2GenCSR.py:111-121)
    lora_vision_rank: int = 16
    accum_steps: int = 1  # ref --accumulate_grad_batches (config.py:86)
    remat: bool = False  # activation ckpt (ref use_checkpoint vmamba.py:1386)
    zero_opt: bool = True  # ZeRO-1 analog of the deepspeed strategy flag
    mixup: float = 0.0  # mixup alpha for the classify recipe (0 = off)
    cutmix: float = 0.0  # cutmix alpha
    ema_decay: float = 0.0  # ModelEma analog (VMamba --model-ema); 0 = off
    seed: int = 42
    log_every: int = 10
    val_every_epochs: int = 1
    # Cap validation batches per eval (0 = full split). Delta-checkpoint
    # filenames embed scores from THIS set — use 0 for comparisons
    # against published tables.
    val_max_batches: int = 50
    save_dir: str = "save"
    # Weighted model-selection score over eval metrics (ref
    # --scorer_types/--weights, config.py:57-58 + R2GenCSR.py:656-664);
    # the best delta is copied to checkpoint_best.msgpack.
    scorer_types: list = dataclasses.field(
        default_factory=lambda: ["Bleu_4", "CIDEr"]
    )
    scorer_weights: list = dataclasses.field(
        default_factory=lambda: [0.5, 0.5]
    )
    resume: str = ""  # "" | "auto" | path to a state_epoch*.msgpack
    # Evaluation-only run (the Lightning trainer.test/validate stage,
    # R2GenCSR/train.py:49-55): skip training, restore weights (resume
    # state and/or init_delta), score eval_split, print the metrics.
    eval_only: bool = False
    eval_split: str = "test"  # val | test
    init_delta: str = ""  # delta checkpoint merged into init params
    max_epochs_this_run: int = 0  # 0 = no cap; >0 stops after N epochs
    save_state_every_epochs: int = 1
    keep_states: int = 2
    debug_nans: bool = False
    mesh_data: int = -1
    mesh_model: int = 1


@dataclasses.dataclass
class RunConfig:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    generate: GenerateConfig = dataclasses.field(
        default_factory=GenerateConfig
    )


def _to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def _from_dict(cls, d: dict):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k not in fields:
            raise KeyError(f"unknown config key: {cls.__name__}.{k}")
        t = fields[k].type
        sub = {
            "data": DataConfig, "model": ModelConfig,
            "train": TrainConfig, "generate": GenerateConfig,
        }.get(k)
        kwargs[k] = _from_dict(sub, v) if sub and isinstance(v, dict) else v
    return cls(**kwargs)


def load_config(path: str, overrides: list[str] | None = None) -> RunConfig:
    with open(path) as f:
        d = yaml.safe_load(f) or {}
    return make_config(d, overrides)


def make_config(d: dict | None = None, overrides: list[str] | None = None
                ) -> RunConfig:
    d = dict(d or {})
    for ov in overrides or []:  # "train.lr=3e-4" dotted overrides
        key, _, val = ov.partition("=")
        parts = key.split(".")
        node = d
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        loaded = yaml.safe_load(val)
        if isinstance(loaded, str):
            # YAML 1.1 parses "1e-3" (no dot) as a string — a silent
            # footgun for lr-style flags; recover the numeric intent.
            try:
                loaded = float(loaded)
            except ValueError:
                pass
        node[parts[-1]] = loaded
    return _from_dict(RunConfig, d)


def save_config(cfg: RunConfig, path: str):
    with open(path, "w") as f:
        yaml.safe_dump(_to_dict(cfg), f, sort_keys=False)

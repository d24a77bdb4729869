"""Mamba language model with incremental decoding (EMRRG text finetune).

Reference: ``/root/reference/EMRRG/finetune.py:30-677`` (HF Mamba LM +
MambaTrainer, alpaca-style prompting, LoRA/MambaPEFT adapters) and the
decode infra ``mamba_simple.py:717-800`` (``allocate_inference_cache`` /
``step`` with conv_state + ssm_state).

PEFT: partial-SSM LoRA applies via :mod:`..peft.lora` param transforms
(``mamba_partial_x_rules``) — no monkey patching.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .mamba import MambaBlock, MambaMixer


class MambaLM(nn.Module):
    """``peft_cfg`` (a :class:`..peft.mamba_peft.MambaPEFTConfig`)
    enables the activation-space adapters — AdaptFormer parallel
    bottlenecks per block, prompt tuning (virtual tokens at the input),
    and per-layer prefix tuning (``outer_single_prefix`` semantics,
    mamba_peft.py:389-393) — the weight-space family merges via
    :func:`..peft.mamba_peft.merge_mamba_peft` before apply."""

    vocab_size: int
    d_model: int = 768
    depth: int = 12
    d_state: int = 16
    expand: int = 2
    rms_norm: bool = True
    scan_backend: str = "auto"
    peft_cfg: Any = None

    def setup(self):
        self.embed_tokens = nn.Embed(
            self.vocab_size, self.d_model, name="embed_tokens"
        )
        self.blocks = [
            MambaBlock(
                d_model=self.d_model,
                d_state=self.d_state,
                expand=self.expand,
                bimamba_type="none",
                rms_norm=self.rms_norm,
                scan_backend=self.scan_backend,
                name=f"layers_{i}",
            )
            for i in range(self.depth)
        ]
        self.norm_f = nn.LayerNorm(name="norm_f")
        pc = self.peft_cfg
        if pc is not None and pc.adaptformer:
            self.adaptf_down = [
                nn.Dense(pc.dim_adaptf, name=f"adaptf_down_{i}")
                for i in range(self.depth)
            ]
            self.adaptf_up = [
                nn.Dense(
                    self.d_model, kernel_init=nn.initializers.zeros,
                    name=f"adaptf_up_{i}",
                )
                for i in range(self.depth)
            ]
        if pc is not None and pc.prompt_tuning:
            self.prompt_encoder = self.param(
                "prompt_encoder", nn.initializers.normal(0.02),
                (1, pc.prompt_num_tokens, self.d_model),
            )
        if pc is not None and pc.prefix_tuning:
            self.prefix_encoder = self.param(
                "prefix_encoder", nn.initializers.normal(0.02),
                (self.depth, 1, pc.num_virtual_tokens, self.d_model),
            )

    def __call__(self, input_ids: jax.Array) -> jax.Array:
        """(B, L) -> logits (B, L, V)."""
        pc = self.peft_cfg
        x = self.embed_tokens(input_ids)
        b, l, _ = x.shape
        if pc is not None and pc.prompt_tuning:
            x = jnp.concatenate(
                [jnp.broadcast_to(
                    self.prompt_encoder,
                    (b, pc.prompt_num_tokens, self.d_model),
                ), x],
                axis=1,
            )
        for i, blk in enumerate(self.blocks):
            if pc is not None and pc.prefix_tuning:
                v = pc.num_virtual_tokens
                x = jnp.concatenate(
                    [jnp.broadcast_to(
                        self.prefix_encoder[i], (b, v, self.d_model)
                    ), x],
                    axis=1,
                )
            y = blk(x)
            if pc is not None and pc.adaptformer:
                y = y + pc.s_adaptf * self.adaptf_up[i](
                    nn.relu(self.adaptf_down[i](x))
                )
            x = y
            if pc is not None and pc.prefix_tuning:
                x = x[:, pc.num_virtual_tokens:]
        if pc is not None and pc.prompt_tuning:
            x = x[:, pc.prompt_num_tokens:]
        x = self.norm_f(x)
        return self.embed_tokens.attend(x)

    def init_states(self, batch: int):
        """allocate_inference_cache analog: per-layer (conv, ssm) states."""
        d_inner = self.expand * self.d_model
        d_conv = 4  # MambaMixer default
        return [
            (
                jnp.zeros((batch, d_conv - 1, d_inner)),
                jnp.zeros((batch, d_inner, self.d_state), jnp.float32),
            )
            for _ in range(self.depth)
        ]

    def step(self, token: jax.Array, states: list):
        """Single-token decode: token (B,) -> (logits (B, V), states)."""
        x = self.embed_tokens(token)
        new_states = []
        for blk, (conv_s, ssm_s) in zip(self.blocks, states):
            x, conv_s, ssm_s = blk.step(x, conv_s, ssm_s)
            new_states.append((conv_s, ssm_s))
        x = self.norm_f(x)
        return self.embed_tokens.attend(x), new_states


def lm_loss(logits: jax.Array, input_ids: jax.Array,
            mask: jax.Array) -> jax.Array:
    """Next-token CE (MambaTrainer.compute_loss, finetune.py:30-50)."""
    lp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    tgt = input_ids[:, 1:]
    ll = jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
    m = mask[:, 1:].astype(jnp.float32)
    return -jnp.sum(ll * m) / jnp.maximum(jnp.sum(m), 1.0)


def alpaca_prompt(instruction: str, inp: str = "", response: str = "") -> str:
    """Alpaca-style prompt assembly (finetune.py:654)."""
    if inp:
        return (
            "below is an instruction that describes a task , paired with an "
            "input . write a response .\n### instruction : "
            f"{instruction}\n### input : {inp}\n### response : {response}"
        )
    return (
        "below is an instruction that describes a task . write a response "
        f".\n### instruction : {instruction}\n### response : {response}"
    )

"""Output-parity goldens against the reference's OWN pure-PyTorch code
(VERDICT round-2 item 4).

The reference ships CPU-runnable fallbacks: ``CrossScan``/``CrossMerge``
(``R2GenCSR/VMamba/classification/models/vmamba.py:25-67``) and the
chunked ``selective_scan_easy`` oracle
(``VMamba/kernels/selective_scan/test_selective_scan_easy.py:14-379``).
These tests execute that reference code on CPU (with the CUDA/Triton
entry points monkeypatched to the reference's easy-scan), export the
state dicts, map them through :mod:`..ckpt.torch_import`, and assert our
flax models reproduce the reference outputs — end-to-end verification of
the import surgery with no real checkpoints.

(This suite caught a real bug: flax ``SAME`` padding on the stride-2
downsample conv pads (0,1) while torch ``padding=1`` pads (1,1).)
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(REF), reason="reference checkout not mounted"
    ),
]

_STUBBED: list = []


def _stub(name: str, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    _STUBBED.append(name)
    return mod


def _load(path: str, name: str):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    _STUBBED.append(name)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module", autouse=True)
def _cleanup_stubs():
    yield
    for name in _STUBBED:
        sys.modules.pop(name, None)
    _STUBBED.clear()


def _ref_easy():
    _stub("ssmtriton", selective_scan_easyv3=None)
    return _load(
        f"{REF}/R2GenCSR/VMamba/kernels/selective_scan/"
        "test_selective_scan_easy.py",
        "ref_easy",
    )


def _ref_vmamba():
    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    def trunc_normal_(t, std=1.0, **kw):
        with torch.no_grad():
            t.normal_(0, std)
        return t

    _stub("timm")
    _stub("timm.models")
    _stub(
        "timm.models.layers",
        DropPath=DropPath,
        trunc_normal_=trunc_normal_,
        to_2tuple=lambda x: (x, x) if not isinstance(x, tuple) else x,
    )
    _stub("fvcore")
    _stub(
        "fvcore.nn",
        **{n: (lambda *a, **k: None) for n in (
            "FlopCountAnalysis", "flop_count_str", "flop_count",
            "parameter_count",
        )},
    )
    _stub("csm_triton", CrossScanTriton=None, CrossMergeTriton=None,
          CrossScanTriton1b1=None)
    easy = _ref_easy()
    refv = _load(
        f"{REF}/R2GenCSR/VMamba/classification/models/vmamba.py",
        "ref_vmamba",
    )

    class TorchEasyScan(torch.autograd.Function):
        """CUDA scan entry point -> the reference's own pure-torch
        easy-scan (validated against the CUDA kernels by the
        reference's test suite)."""

        @staticmethod
        def forward(ctx, u, delta, A, B, C, D=None, delta_bias=None,
                    delta_softplus=False, nrows=1, backnrows=1,
                    oflex=True):
            return easy.selective_scan_easyv3(
                u, delta, A, B, C, D, delta_bias, delta_softplus, False, 16
            )

    refv.SelectiveScanCore = TorchEasyScan
    return refv


def _ref_mamba_simple():
    easy = _ref_easy()

    def mamba_inner_fn_no_out_proj(
        xz, conv1d_weight, conv1d_bias, x_proj_weight, dt_proj_weight,
        A, B=None, C=None, D=None, delta_bias=None, B_proj_bias=None,
        C_proj_bias=None, delta_softplus=True,
    ):
        # mamba_ssm fused-op semantics (conv + x/dt proj + scan + z gate,
        # no out_proj), scan via the reference easy-scan.
        x, z = xz.chunk(2, dim=1)
        k = conv1d_weight.shape[-1]
        x = F.silu(F.conv1d(F.pad(x, (k - 1, 0)), conv1d_weight,
                            conv1d_bias, groups=x.shape[1]))
        x_dbl = torch.einsum("bdl,cd->bcl", x, x_proj_weight)
        rank = dt_proj_weight.shape[1]
        n = A.shape[1]
        dt = torch.einsum("brl,dr->bdl", x_dbl[:, :rank], dt_proj_weight)
        Bm = x_dbl[:, rank:rank + n].unsqueeze(1).contiguous()
        Cm = x_dbl[:, rank + n:].unsqueeze(1).contiguous()
        y = easy.selective_scan_easyv3(
            x, dt, A, Bm, Cm, D, delta_bias, delta_softplus, False, 16
        )
        return y * F.silu(z)

    _stub("causal_conv1d", causal_conv1d_fn=None, causal_conv1d_update=None)
    _stub("mamba_ssm")
    _stub("mamba_ssm.ops")
    _stub(
        "mamba_ssm.ops.selective_scan_interface",
        selective_scan_fn=None, mamba_inner_fn=None, bimamba_inner_fn=None,
        mamba_inner_fn_no_out_proj=mamba_inner_fn_no_out_proj,
    )
    _stub("mamba_ssm.ops.triton")
    _stub("mamba_ssm.ops.triton.selective_state_update",
          selective_state_update=None)
    _stub("mamba_ssm.ops.triton.layernorm", RMSNorm=None,
          layer_norm_fn=None, rms_norm_fn=None)
    return _load(
        f"{REF}/CXPMRG_Bench_MambaXray_VL/arm/Finetuning/mamba_simple.py",
        "ref_mamba_simple",
    )


def test_selective_scan_matches_reference_easy():
    """Our jnp scan oracle == the reference's chunked easy-scan spec."""
    from medical_image_analysis_tpu.ops.selective_scan import (
        selective_scan_ref,
    )

    easy = _ref_easy()
    rng = np.random.default_rng(0)
    B, G, D, N, L = 2, 2, 8, 4, 64
    us = rng.standard_normal((B, G * D, L)).astype(np.float32)
    dts = (rng.standard_normal((B, G * D, L)) * 0.1).astype(np.float32)
    As = -np.tile(np.arange(1, N + 1, dtype=np.float32), (G * D, 1))
    Bs = rng.standard_normal((B, G, N, L)).astype(np.float32)
    Cs = rng.standard_normal((B, G, N, L)).astype(np.float32)
    Ds = rng.standard_normal((G * D,)).astype(np.float32)
    bias = (rng.standard_normal((G * D,)) * 0.1).astype(np.float32)
    y_ref = easy.selective_scan_easyv3(
        *[torch.tensor(v) for v in (us, dts, As, Bs, Cs, Ds)],
        delta_bias=torch.tensor(bias), delta_softplus=True, chunksize=16,
    ).detach().numpy()
    y_ours = np.asarray(selective_scan_ref(
        jnp.asarray(us.transpose(0, 2, 1)),
        jnp.asarray(dts.transpose(0, 2, 1)),
        jnp.asarray(As),
        jnp.asarray(Bs.transpose(0, 3, 1, 2)),
        jnp.asarray(Cs.transpose(0, 3, 1, 2)),
        jnp.asarray(Ds), jnp.asarray(bias), delta_softplus=True,
    )).transpose(0, 2, 1)
    np.testing.assert_allclose(y_ours, y_ref, rtol=1e-4, atol=1e-5)


def test_cross_scan_merge_match_reference():
    from medical_image_analysis_tpu.ops.cross_scan import (
        cross_merge,
        cross_scan,
    )

    refv = _ref_vmamba()
    torch.manual_seed(1)
    x = torch.randn(2, 6, 4, 4)  # (B, C, H, W)
    xs_ref = refv.CrossScan.apply(x).detach().numpy()  # (B, 4, C, L)
    xs = np.asarray(cross_scan(jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_array_equal(xs.transpose(0, 1, 3, 2), xs_ref)

    ys = torch.randn(2, 4, 6, 4, 4)  # (B, K, D, H, W)
    ym_ref = refv.CrossMerge.apply(ys).detach().numpy()  # (B, D, L)
    ym = np.asarray(cross_merge(
        jnp.asarray(ys.numpy().reshape(2, 4, 6, 16).transpose(0, 1, 3, 2)),
        4, 4,
    ))
    np.testing.assert_array_equal(ym.transpose(0, 2, 1), ym_ref)


def test_vssm_import_output_parity():
    """Full reference VSSM forward (torch, CPU) vs our VSSM with params
    mapped through ``vssm_torch_to_flax`` — pooled features ≤ 1e-4.
    (Reference forces a bf16 round before out_norm, vmamba.py:420;
    tolerance covers that rounding.)"""
    from medical_image_analysis_tpu.ckpt.torch_import import (
        vssm_torch_to_flax,
    )
    from medical_image_analysis_tpu.models.vmamba import VSSM

    refv = _ref_vmamba()
    torch.manual_seed(0)
    m = refv.VSSM(
        patch_size=4, in_chans=3, num_classes=10, depths=[1, 1],
        dims=[16, 32], ssm_d_state=4, ssm_ratio=2.0, ssm_conv=3,
        forward_type="v2", mlp_ratio=4.0, drop_path_rate=0.0,
        downsample_version="v3", patchembed_version="v1", norm_layer="LN",
    ).eval()
    x = torch.randn(2, 3, 32, 32) * 0.5
    with torch.no_grad():
        y_ref = m(x, global_features=True).numpy()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    params = vssm_torch_to_flax(sd, depths=[1, 1])
    ours = VSSM(depths=(1, 1), dims=(16, 32), d_state=4,
                drop_path_rate=0.0, scan_backend="ref")
    y = np.asarray(ours.apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), pool=True
    ))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=5e-3, atol=1e-4)


def test_vssm1_noz_import_output_parity():
    """Reference *nightly* VSSM (``forward_type=v2noz``, d_state=1, conv
    bias off, patchembed v2 — the exact shape class of every shipped
    ``configs/vssm1/*.yaml`` and of R2GenCSR's production vision tower,
    R2GenCSR.py:79) vs our VSSM with the vssm1 options, params mapped
    through ``vssm_torch_to_flax``."""
    from medical_image_analysis_tpu.ckpt.torch_import import (
        vssm_torch_to_flax,
    )
    from medical_image_analysis_tpu.models.vmamba import VSSM

    refv = _ref_vmamba()
    torch.manual_seed(0)
    m = refv.VSSM(
        patch_size=4, in_chans=3, num_classes=10, depths=[1, 1],
        dims=[16, 32], ssm_d_state=1, ssm_ratio=2.0, ssm_conv=3,
        ssm_conv_bias=False, forward_type="v2noz", mlp_ratio=4.0,
        drop_path_rate=0.0, downsample_version="v3",
        patchembed_version="v2", norm_layer="LN",
    ).eval()
    x = torch.randn(2, 3, 32, 32) * 0.5
    with torch.no_grad():
        y_ref = m(x, global_features=True).numpy()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    params = vssm_torch_to_flax(sd, depths=[1, 1])
    ours = VSSM(depths=(1, 1), dims=(16, 32), d_state=1, disable_z=True,
                conv_bias=False, patch_embed_version="v2",
                drop_path_rate=0.0, scan_backend="ref")
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    y = np.asarray(ours.apply(params, xj, pool=True))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=5e-3, atol=1e-4)

    # Model-level wiring parity of the batch-packed N=1 kernel path
    # (interpret mode off-chip) vs the jnp oracle path.
    y_fused = np.asarray(
        VSSM(depths=(1, 1), dims=(16, 32), d_state=1, disable_z=True,
             conv_bias=False, patch_embed_version="v2",
             drop_path_rate=0.0, scan_backend="fused")
        .apply(params, xj, pool=True)
    )
    np.testing.assert_allclose(y_fused, y, rtol=2e-3, atol=2e-4)


def test_arm_v3_mixer_import_output_parity():
    """Reference ``mamba_simple.Mamba`` bimamba-v3 forward (4-direction
    fast path with middle-cls splicing) vs our ``MambaMixer`` with
    params mapped through ``arm_torch_to_flax``."""
    from medical_image_analysis_tpu.ckpt.torch_import import (
        arm_torch_to_flax,
    )
    from medical_image_analysis_tpu.models.mamba import MambaMixer

    msimple = _ref_mamba_simple()
    torch.manual_seed(0)
    mix = msimple.Mamba(d_model=16, d_state=4, d_conv=4, expand=2,
                        bimamba_type="v3", use_fast_path=True).eval()
    B, L, D = 2, 17, 16  # 4x4 grid + middle cls (token_position = 8)
    x = torch.randn(B, L, D) * 0.5
    with torch.no_grad():
        y_ref = mix(x).numpy()

    d = D
    sd = {f"layers.0.mixer.{k}": v.numpy()
          for k, v in mix.state_dict().items()}
    sd.update({
        "layers.0.norm.weight": np.ones(d, np.float32),
        "patch_embed.proj.weight": np.zeros((d, 3, 8, 8), np.float32),
        "patch_embed.proj.bias": np.zeros(d, np.float32),
        "cls_token": np.zeros((1, 1, d), np.float32),
        "pos_embed": np.zeros((1, L, d), np.float32),
        "norm_f.weight": np.ones(d, np.float32),
        "norm_f.bias": np.zeros(d, np.float32),
    })
    params = arm_torch_to_flax(sd, depth=1)
    mp = params["params"]["layers_0"]["mixer"]
    ours = MambaMixer(d_model=16, d_state=4, expand=2, bimamba_type="v3",
                      if_devide_out=True, scan_backend="ref")
    y = np.asarray(ours.apply({"params": mp}, jnp.asarray(x.numpy()), 8))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-6)


def test_vit_dp_extractor_import_output_parity():
    """The reference DP feature extractor (finetune/DP/models/vit.py:
    273-285 — runs blocks[:-1], returns WITHOUT the final norm) on CPU
    with random weights vs our ViT through vit_torch_to_flax.

    Tolerance note: the reference uses exact-erf GELU while our blocks
    use the tanh approximation (Mosaic has no erf lowering; divergence
    quantified in test_vit_block.py), so this golden allows 2e-3.
    """
    ref_vit = _load(
        f"{REF}/HD_Xray_Pretrain_MAE/finetune/DP/models/vit.py",
        "ref_dp_vit",
    )
    torch.manual_seed(0)
    depth, dim, heads, patch, img = 3, 64, 4, 8, 32
    m = ref_vit.ViT(
        img_size=img, patch_size=patch, stride_size=patch, in_chans=3,
        num_classes=0, embed_dim=dim, depth=depth, num_heads=heads,
        qkv_bias=True,
    ).eval()
    x = torch.randn(2, 3, img, img)
    with torch.no_grad():
        want = m(x).numpy()  # (B, L+1, D) after blocks[:-1], no norm

    from medical_image_analysis_tpu.ckpt.torch_import import (
        vit_torch_to_flax,
    )
    from medical_image_analysis_tpu.models.vit import ViT

    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    params = vit_torch_to_flax(sd, depth - 1)
    ours = ViT(
        patch_size=patch, embed_dim=dim, depth=depth - 1,
        num_heads=heads, fixed_sincos_pos=False, final_norm=False,
    )
    got = ours.apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(got), want, atol=2e-3, rtol=2e-3
    )


# ---------------------------------------------------------------------------
# R2Gen classic: reference Transformer (+RelationalMemory + conditional
# LayerNorm) run on CPU, state dict mapped, logits compared.
# ---------------------------------------------------------------------------

def _ref_r2gen_mod():
    pkg = types.ModuleType("rgmods")
    pkg.__path__ = [
        REF + "/HD_Xray_Pretrain_MAE/finetune/RG_english/modules"
    ]
    sys.modules.setdefault("rgmods", pkg)
    _STUBBED.append("rgmods")
    _stub("rgmods.att_model", pack_wrapper=lambda m, x, mask: m(x),
          AttModel=object)
    return _load(
        REF + "/HD_Xray_Pretrain_MAE/finetune/RG_english/modules/"
        "encoder_decoder.py",
        "rgmods.encoder_decoder",
    )


def test_r2gen_transformer_logit_parity():
    """Full reference R2Gen core (encoder, RM-conditioned decoder, final
    norms) vs our flax R2Gen through ckpt/torch_import.r2gen_torch_to_flax
    — logits <= 1e-4."""
    import copy

    from medical_image_analysis_tpu.ckpt.torch_import import (
        r2gen_torch_to_flax,
    )
    from medical_image_analysis_tpu.models.r2gen import R2Gen

    ed = _ref_r2gen_mod()
    D, FF, H, L, S, V = 16, 32, 4, 2, 3, 50
    torch.manual_seed(0)
    attn = ed.MultiHeadedAttention(H, D, dropout=0.0)
    ff = ed.PositionwiseFeedForward(D, FF, dropout=0.0)
    pos = ed.PositionalEncoding(D, 0.0)
    model = ed.Transformer(
        ed.Encoder(ed.EncoderLayer(
            D, copy.deepcopy(attn), copy.deepcopy(ff), 0.0), L),
        ed.Decoder(ed.DecoderLayer(
            D, copy.deepcopy(attn), copy.deepcopy(attn),
            copy.deepcopy(ff), 0.0, S, D), L),
        lambda x: x,
        torch.nn.Sequential(ed.Embeddings(D, V), copy.deepcopy(pos)),
        ed.RelationalMemory(num_slots=S, d_model=D, num_heads=H),
    ).eval()
    for p in model.parameters():  # make_model's xavier init
        if p.dim() > 1:
            torch.nn.init.xavier_uniform_(p)
    logit = torch.nn.Linear(D, V).eval()

    rng = np.random.default_rng(0)
    att = torch.tensor(
        rng.standard_normal((2, 5, D)), dtype=torch.float32)
    seq = torch.tensor(rng.integers(1, V, (2, 7)))
    src_mask = torch.ones(2, 1, 5, dtype=torch.long)
    tgt_mask = (
        torch.ones(2, 1, 7, dtype=torch.bool)
        & ed.subsequent_mask(7).bool()
    )
    with torch.no_grad():
        ref = logit(model(att, seq, src_mask, tgt_mask)).numpy()

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    sd.update({
        f"logit.{k}": v.numpy() for k, v in logit.state_dict().items()
    })
    params = r2gen_torch_to_flax(sd, L)
    ours = R2Gen(vocab_size=V, d_model=D, d_ff=FF, num_layers=L,
                 num_heads=H, rm_num_slots=S, rm_num_heads=H)
    got = ours.apply(
        params, jnp.asarray(att.numpy()),
        jnp.asarray(np.asarray(seq), np.int32),
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# Hopfield lookup: the vendored hflayers library (pure torch) vs our
# faithful multi-head association module.
# ---------------------------------------------------------------------------

def _ref_hflayers():
    name = "hfl"
    if name in sys.modules:
        return sys.modules[name]
    base = REF + "/AM_MRG/hopfield_layers/hflayers"
    spec = importlib.util.spec_from_file_location(
        name, base + "/__init__.py", submodule_search_locations=[base]
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    _STUBBED.append(name)
    spec.loader.exec_module(mod)
    return mod


def test_hopfield_lookup_parity():
    """Reference HopfieldLayer in the AM-MRG configuration (separate
    hidden/pattern dims, multi-head, input norms, beta scaling) vs our
    Hopfield through ckpt/torch_import.hopfield_torch_to_flax <= 1e-5."""
    from medical_image_analysis_tpu.ckpt.torch_import import (
        hopfield_torch_to_flax,
    )
    from medical_image_analysis_tpu.models.hopfield import Hopfield

    hfl = _ref_hflayers()
    torch.manual_seed(0)
    D, HID, PAT, H, M = 12, 16, 12, 2, 5
    layer = hfl.HopfieldLayer(
        input_size=D, hidden_size=HID, output_size=D, pattern_size=PAT,
        quantity=M, scaling=4.0, num_heads=H, batch_first=True,
        normalize_stored_pattern=True, normalize_state_pattern=True,
        dropout=0.0,
    ).eval()
    rng = np.random.default_rng(0)
    bank = torch.tensor(
        rng.standard_normal((1, M, D)), dtype=torch.float32)
    layer.lookup_weights = torch.nn.Parameter(bank, requires_grad=False)
    x = torch.tensor(rng.standard_normal((2, 3, D)), dtype=torch.float32)
    with torch.no_grad():
        ref = layer(x).numpy()

    sd = {k: v.numpy() for k, v in layer.state_dict().items()}
    params = hopfield_torch_to_flax(sd)
    ours = Hopfield(hidden=HID, num_heads=H, pattern_dim=PAT, out_dim=D,
                    scaling=4.0)
    got = ours.apply(
        params, jnp.asarray(x.numpy()),
        jnp.broadcast_to(jnp.asarray(bank.numpy()), (2, M, D)),
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-4)


def test_kg_cross_attention_block_parity():
    """R2GenKG's graph<->image fusion block (cross.py, pure torch, incl.
    the shared-q/k/v LayerNorm and frozen beta) vs ours <= 1e-5."""
    from medical_image_analysis_tpu.ckpt.torch_import import (
        cross_block_torch_to_flax,
    )
    from medical_image_analysis_tpu.models.rgcn import (
        ResidualCrossAttentionBlock,
    )

    cross = _load(
        REF + "/R2GenKG/visual_rgcn/cross.py", "ref_kg_cross"
    )
    torch.manual_seed(0)
    D, H = 16, 4
    blk = cross.ResidualCrossAttentionBlock(
        d_model=D, n_head=H, dropout=0.0
    ).eval()
    # randomize the LN gamma so the shared-norm mapping is exercised
    with torch.no_grad():
        blk.ln_1.gamma.mul_(0.0).add_(
            torch.rand_like(blk.ln_1.gamma) + 0.5)
        blk.ln_2.gamma.mul_(0.0).add_(
            torch.rand_like(blk.ln_2.gamma) + 0.5)
    rng = np.random.default_rng(0)
    q = torch.tensor(rng.standard_normal((3, 2, D)), dtype=torch.float32)
    kv = torch.tensor(rng.standard_normal((5, 2, D)), dtype=torch.float32)
    with torch.no_grad():
        ref = blk(q, kv, kv).numpy()  # (Lq, B, D) seq-first

    params = cross_block_torch_to_flax(
        {k: v.numpy() for k, v in blk.state_dict().items()}
    )
    ours = ResidualCrossAttentionBlock(dim=D, num_heads=H)
    got = ours.apply(
        params,
        jnp.asarray(q.numpy().transpose(1, 0, 2)),
        jnp.asarray(kv.numpy().transpose(1, 0, 2)),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(1, 0, 2), ref, atol=1e-5, rtol=1e-4
    )

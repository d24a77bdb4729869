"""Mesh/sharded train step, optimizers, LoRA, checkpoints."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from medical_image_analysis_tpu.ckpt.checkpoint import (
    delta_filename,
    load_delta,
    merge_delta,
    save_delta,
)
from medical_image_analysis_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
)
from medical_image_analysis_tpu.peft.lora import (
    LoRARule,
    apply_lora,
    init_lora,
    llama_qv_rules,
    mamba_partial_x_rules,
)
from medical_image_analysis_tpu.train.optim import (
    layer_decay_scales,
    make_adamw,
    no_decay_mask,
    scaled_lr,
    warmup_cosine,
)
from medical_image_analysis_tpu.train.train_state import (
    TrainState,
    make_train_step,
)


def _toy_params():
    return {
        "dense": {"kernel": jnp.ones((4, 8)), "bias": jnp.zeros((8,))},
        "norm": {"scale": jnp.ones((8,))},
        "layers_3": {"self_attn": {"q_proj": {"kernel": jnp.ones((8, 8))}}},
    }


def test_no_decay_mask():
    mask = no_decay_mask(_toy_params())
    assert mask["dense"]["kernel"] is True
    assert mask["dense"]["bias"] is False
    assert mask["norm"]["scale"] is False


def test_layer_decay_scales():
    s = layer_decay_scales(_toy_params(), 0.5, 4)
    assert s["layers_3"]["self_attn"]["q_proj"]["kernel"] == 0.5  # 0.5^(5-4)
    assert s["dense"]["kernel"] == 0.5**5


def test_scaled_lr():
    assert scaled_lr(1.5e-4, 512) == pytest.approx(3e-4)


def test_sharded_train_step_on_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(data=8)

    def fresh_params():
        # per-state copies: the jitted step donates its input state.
        return {"w": jnp.ones((4,))}

    params = fresh_params()

    def loss_fn(params, batch, rng):
        pred = batch["x"] @ params["w"]
        return jnp.mean((pred - batch["y"]) ** 2)

    tx = make_adamw(1e-2, params_for_mask=params)
    state = TrainState.create(params, tx)
    step = make_train_step(loss_fn, tx, mesh=mesh)
    rng = jax.random.PRNGKey(0)
    batch = {
        "x": np.random.default_rng(0).standard_normal((16, 4)).astype(np.float32),
        "y": np.zeros((16,), np.float32),
    }
    sb = shard_batch(mesh, batch)
    state2, metrics = step(state, sb, rng)
    assert int(state2.step) == 1
    assert bool(jnp.isfinite(metrics["loss"]))
    # Param update must be identical to the single-device computation.
    state_1d = TrainState.create(fresh_params(), tx)
    step_1d = make_train_step(loss_fn, tx, mesh=None)
    state_1d2, m2 = step_1d(state_1d, {k: jnp.asarray(v) for k, v in batch.items()}, rng)
    np.testing.assert_allclose(
        np.asarray(state2.params["w"]), np.asarray(state_1d2.params["w"]),
        rtol=1e-6,
    )


def test_trainable_mask_freezes():
    params = {"a": jnp.ones((2, 2)), "b": jnp.ones((2, 2))}
    mask = {"a": True, "b": False}

    def loss_fn(p, batch, rng):
        return jnp.sum(p["a"] ** 2) + jnp.sum(p["b"] ** 2)

    tx = make_adamw(0.1, params_for_mask=params, trainable_mask=mask)
    state = TrainState.create(params, tx)
    step = make_train_step(loss_fn, tx)
    state2, _ = step(state, {}, jax.random.PRNGKey(0))
    assert float(jnp.max(jnp.abs(state2.params["b"] - 1.0))) == 0.0
    assert float(jnp.max(jnp.abs(state2.params["a"] - 1.0))) > 0.0


def test_lora_merge_and_grad():
    params = {"layers_0": {"self_attn": {"q_proj": {"kernel": jnp.zeros((4, 4))},
                                         "k_proj": {"kernel": jnp.zeros((4, 4))}}}}
    rules = llama_qv_rules(rank=2, alpha=2.0)
    lora = init_lora(jax.random.PRNGKey(0), params, rules)
    assert "layers_0/self_attn/q_proj/kernel" in lora
    assert "layers_0/self_attn/k_proj/kernel" not in lora
    merged = apply_lora(params, lora, rules)
    # b initialised to zero -> merge is identity at init.
    np.testing.assert_allclose(
        np.asarray(merged["layers_0"]["self_attn"]["q_proj"]["kernel"]), 0.0
    )

    def loss(lora_p):
        m = apply_lora(params, lora_p, rules)
        return jnp.sum(m["layers_0"]["self_attn"]["q_proj"]["kernel"] ** 2)

    key = "layers_0/self_attn/q_proj/kernel"
    lora2 = dict(lora)
    lora2[key] = {"a": lora[key]["a"], "b": jnp.ones_like(lora[key]["b"])}
    g = jax.grad(loss)(lora2)
    assert float(jnp.max(jnp.abs(g[key]["a"]))) > 0


def test_partial_x_lora_slice():
    params = {"mixer": {"in_proj": {"kernel": jnp.zeros((4, 8))}}}
    rules = mamba_partial_x_rules(d_inner=4, rank=2)
    lora = init_lora(jax.random.PRNGKey(0), params, rules)
    key = "mixer/in_proj/kernel"
    lora[key] = {"a": jnp.ones((4, 2)), "b": jnp.ones((2, 4))}
    merged = apply_lora(params, lora, rules)
    k = np.asarray(merged["mixer"]["in_proj"]["kernel"])
    assert np.all(k[:, :4] != 0)  # X half updated
    assert np.all(k[:, 4:] == 0)  # Z half untouched


def test_delta_checkpoint_roundtrip():
    params = {"vision": {"kernel": jnp.ones((2, 2)) * 3},
              "llm": {"kernel": jnp.ones((2, 2)) * 7}}
    mask = {"vision": {"kernel": True}, "llm": {"kernel": False}}
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, delta_filename(3, 100, {"Bleu_4": 0.1}))
        save_delta(path, params, mask, config={"x": 1}, epoch=3, step=100)
        delta, meta = load_delta(path)
        assert meta["epoch"] == 3 and meta["config"] == {"x": 1}
        fresh = {"vision": {"kernel": jnp.zeros((2, 2))},
                 "llm": {"kernel": jnp.zeros((2, 2))}}
        merged = merge_delta(fresh, delta)
        np.testing.assert_allclose(np.asarray(merged["vision"]["kernel"]), 3.0)
        np.testing.assert_allclose(np.asarray(merged["llm"]["kernel"]), 0.0)


def test_warmup_cosine_shape():
    sched = warmup_cosine(1e-3, 10, 100)
    assert float(sched(0)) == 0.0
    assert float(sched(10)) == pytest.approx(1e-3)
    assert float(sched(100)) < 1e-4


def test_orbax_full_roundtrip():
    from medical_image_analysis_tpu.ckpt.checkpoint import (
        restore_full,
        save_full,
    )

    params = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones(4)}}
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt1")
        save_full(path, params)
        target = jax.tree_util.tree_map(jnp.zeros_like, params)
        restored = restore_full(path, target)
        np.testing.assert_allclose(
            np.asarray(restored["a"]), np.asarray(params["a"])
        )


def test_accum_steps_equals_full_batch():
    """accumulate_grad_batches semantics: accum=2 over a batch equals one
    full-batch step (equal microbatch sizes, mean-reduced loss)."""

    def fresh():
        return {"w": jnp.ones((4,)), "b": jnp.zeros(())}

    def loss_fn(p, batch, rng):
        pred = batch["x"] @ p["w"] + p["b"]
        return jnp.mean((pred - batch["y"]) ** 2)

    tx = make_adamw(1e-2, params_for_mask=fresh())
    batch = {
        "x": jnp.asarray(
            np.random.default_rng(1).standard_normal((8, 4)), jnp.float32
        ),
        "y": jnp.zeros((8,), jnp.float32),
    }
    rng = jax.random.PRNGKey(0)
    s1 = TrainState.create(fresh(), tx)
    s1, m1 = make_train_step(loss_fn, tx)(s1, batch, rng)
    s2 = TrainState.create(fresh(), tx)
    s2, m2 = make_train_step(loss_fn, tx, accum_steps=2)(s2, batch, rng)
    np.testing.assert_allclose(
        np.asarray(s1.params["w"]), np.asarray(s2.params["w"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-6
    )


def test_tp_zero_sharded_step_update_equality():
    """(data=4, model=2) mesh with TP param specs + ZeRO opt-state
    sharding + accumulation: same update as the unsharded step."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from medical_image_analysis_tpu.parallel.tp import param_specs
    from medical_image_analysis_tpu.train.train_state import shard_state

    mesh = make_mesh(data=4, model=2)

    def fresh():
        return {
            "self_attn": {"q_proj": {"kernel": jnp.ones((8, 8)) * 0.1}},
            "mlp": {"down_proj": {"kernel": jnp.ones((8, 4)) * 0.2}},
            "norm": {"scale": jnp.ones((8,))},
        }

    def loss_fn(p, batch, rng):
        h = batch["x"] @ p["self_attn"]["q_proj"]["kernel"]
        h = h * p["norm"]["scale"]
        out = h @ p["mlp"]["down_proj"]["kernel"]
        return jnp.mean(out**2)

    tx = make_adamw(1e-2, params_for_mask=fresh())
    batch = {
        "x": np.random.default_rng(2)
        .standard_normal((8, 8))
        .astype(np.float32)
    }
    rng = jax.random.PRNGKey(3)

    specs = param_specs(fresh())
    state = TrainState.create(fresh(), tx)
    state = shard_state(state, mesh, specs, zero_opt=True)
    step = make_train_step(
        loss_fn, tx, mesh=mesh, param_specs=specs, accum_steps=2,
        zero_opt=True, state_for_shardings=state,
    )
    sharded, m = step(state, shard_batch(mesh, batch), rng)

    ref_state = TrainState.create(fresh(), tx)
    ref_step = make_train_step(loss_fn, tx, accum_steps=2)
    ref, mr = ref_step(
        ref_state, {k: jnp.asarray(v) for k, v in batch.items()}, rng
    )
    np.testing.assert_allclose(
        np.asarray(sharded.params["self_attn"]["q_proj"]["kernel"]),
        np.asarray(ref.params["self_attn"]["q_proj"]["kernel"]),
        rtol=2e-6,
    )
    np.testing.assert_allclose(
        float(m["loss"]), float(mr["loss"]), rtol=1e-6
    )


def test_ema_tracking_and_state_roundtrip():
    """EMA shadow params follow p_ema = d*p_ema + (1-d)*p and survive a
    full train-state save/restore (ModelEma analog, VMamba main.py)."""
    from medical_image_analysis_tpu.ckpt.checkpoint import (
        auto_resume_helper,
        restore_train_state,
        save_train_state,
    )

    params = {"w": jnp.ones((4,), jnp.float32)}
    tx = optax.sgd(0.5)
    decay = 0.9
    state = TrainState.create(params, tx, ema=True)
    step = make_train_step(
        lambda p, b, r: jnp.sum((p["w"] - b) ** 2), tx, ema_decay=decay
    )
    batch = jnp.zeros((4,), jnp.float32)
    rng = jax.random.PRNGKey(0)

    expect_ema = np.ones(4)
    expect_p = np.ones(4)
    for _ in range(3):
        state, _ = step(state, batch, rng)
        expect_p = expect_p - 0.5 * 2 * expect_p  # sgd on sum((w-0)^2)
        expect_ema = decay * expect_ema + (1 - decay) * expect_p
    np.testing.assert_allclose(
        np.asarray(state.params["w"]), expect_p, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(state.ema_params["w"]), expect_ema, rtol=1e-6
    )

    with tempfile.TemporaryDirectory() as d:
        save_train_state(d, state, epoch=1)
        path = auto_resume_helper(d)
        # fresh buffers: the originals were donated by the jitted step
        target = TrainState.create(
            {"w": jnp.ones((4,), jnp.float32)}, tx, ema=True
        )
        restored, epoch = restore_train_state(path, target)
        assert epoch == 1
        np.testing.assert_allclose(
            np.asarray(restored.ema_params["w"]), expect_ema, rtol=1e-6
        )


def test_ema_disabled_is_none():
    params = {"w": jnp.ones((2,), jnp.float32)}
    tx = optax.sgd(0.1)
    state = TrainState.create(params, tx)
    assert state.ema_params is None
    step = make_train_step(
        lambda p, b, r: jnp.sum(p["w"] ** 2), tx, ema_decay=0.99
    )
    state, _ = step(state, jnp.zeros(()), jax.random.PRNGKey(0))
    assert state.ema_params is None


@pytest.mark.slow
def test_two_process_dcn():
    """Two localhost CPU processes through jax.distributed: hybrid
    ICI/DCN mesh + one production sharded train step matches the
    single-process reference (VERDICT r3 item 5; the reference's
    env:// NCCL rendezvous, misc.py:211-235)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "dcn_two_proc.py")],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "MIA_DCN_TEST_PORT": "56571"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:] + proc.stdout[-500:]
    assert "DCN OK" in proc.stdout


def test_zero_opt_specs_never_shard_conv_spatial_axis():
    """ZeRO moment specs must pick a feature/channel axis, never a conv
    kernel's spatial dim: constraining adam moments on a spatial axis
    makes GSPMD partition the conv fwd/bwd spatially, which measurably
    changed loss (1.8e-3) and grad norm (15%) on an 8-device mesh
    (round-5 dryrun equivalence catch)."""
    from medical_image_analysis_tpu.train.train_state import zero_opt_specs

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(data=8, model=1)
    opt = {
        # 16x16x3x32 patch-embed kernel: axis0 (spatial, 16) divides 8
        # but axis3 (out-channels, 32) is larger and must win.
        "conv_mu": jnp.zeros((16, 16, 3, 32)),
        "emb_mu": jnp.zeros((256, 64)),
        "small": jnp.zeros((8, 8)),
    }
    specs = zero_opt_specs(opt, mesh, min_size=1)
    assert tuple(specs["conv_mu"]) == (None, None, None, "data")
    assert tuple(specs["emb_mu"]) == ("data", None)
    # ties break toward the later (feature-most) axis
    assert tuple(specs["small"]) == (None, "data")


def test_zero_sharded_conv_grad_matches_replicated():
    """A conv-containing model trained with ZeRO-sharded moments must
    compute the SAME loss/grads as the replicated-opt-state step (the
    regression the spatial-axis spec caused)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from medical_image_analysis_tpu.train.train_state import shard_state

    mesh = make_mesh(data=8, model=1)
    rng = np.random.default_rng(0)
    params0 = {
        "conv": jnp.asarray(
            rng.standard_normal((16, 16, 3, 32)) * 0.05, jnp.float32
        ),
        "head": jnp.asarray(
            rng.standard_normal((32, 10)) * 0.05, jnp.float32
        ),
    }
    batch = {
        "x": jnp.asarray(
            rng.standard_normal((8, 32, 32, 3)), jnp.float32
        ),
        "y": jnp.asarray(rng.integers(0, 10, (8,))),
    }

    def loss_fn(p, b, r):
        h = jax.lax.conv_general_dilated(
            b["x"], p["conv"], window_strides=(16, 16), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        logits = h.mean(axis=(1, 2)) @ p["head"]
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, b["y"]
        ).mean()

    def run(zero):
        params = jax.tree_util.tree_map(jnp.copy, params0)
        tx = make_adamw(1e-3, params_for_mask=params)
        # min_size=1 so the conv moments actually shard in this test
        import medical_image_analysis_tpu.train.train_state as ts

        old = ts.zero_opt_specs
        ts.zero_opt_specs = lambda o, m, min_size=1: old(o, m, 1)
        try:
            state = shard_state(
                TrainState.create(params, tx), mesh, None, zero_opt=zero
            )
            step = make_train_step(
                loss_fn, tx, mesh=mesh, param_specs=None, accum_steps=2,
                zero_opt=zero, donate=False, state_for_shardings=state,
            )
            st, m = step(state, shard_batch(mesh, batch),
                         jax.random.PRNGKey(1))
        finally:
            ts.zero_opt_specs = old
        return float(m["loss"]), float(m["grad_norm"]), st.params

    l1, g1, p1 = run(True)
    l0, g0, p0 = run(False)
    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    np.testing.assert_allclose(g1, g0, rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p0)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )

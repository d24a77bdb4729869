"""Two-process DCN smoke test: jax.distributed over localhost.

Upgrades the multi-host path (``parallel/mesh.py init_distributed`` +
``make_hybrid_mesh``) from "implemented, single-process smoke only" to
actually exercised: two CPU processes (coordinator + worker), 4 virtual
devices each (8 global), hybrid ICI/DCN mesh, and ONE sharded train
step through the production ``make_train_step`` factory — grads psum
across the process boundary exactly where the reference's env:// NCCL
DDP would all-reduce (``CXPMRG.../pretrain/utils/misc.py:211-235``).

Usage:
    python tools/dcn_two_proc.py            # parent: ref run + 2 workers
    (child modes are internal: `ref` and `worker <rank>`)

The parent asserts the distributed result matches a single-process
reference bit-for-bit-close (rtol 1e-6).
"""

from __future__ import annotations

import os
import subprocess
import sys

PORT = int(os.environ.get("MIA_DCN_TEST_PORT", "56531"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _child_env(nproc_devices: int) -> dict:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={nproc_devices}"
    ).strip()
    env["MIA_FORCE_CPU"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run_step(mesh):
    """One production train step; returns (loss, w_after) as numpy."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from medical_image_analysis_tpu.parallel.mesh import batch_sharding
    from medical_image_analysis_tpu.train.optim import make_adamw
    from medical_image_analysis_tpu.train.train_state import (
        TrainState,
        make_train_step,
    )

    params = {"w": jnp.ones((4,))}

    def loss_fn(p, batch, rng):
        pred = batch["x"] @ p["w"]
        return jnp.mean((pred - batch["y"]) ** 2)

    tx = make_adamw(1e-2, params_for_mask=params)
    state = TrainState.create(params, tx)
    step = make_train_step(loss_fn, tx, mesh=mesh)
    batch_np = {
        "x": np.random.default_rng(0)
        .standard_normal((16, 4))
        .astype(np.float32),
        "y": np.zeros((16,), np.float32),
    }
    if mesh is None:
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    elif jax.process_count() > 1:
        sh = batch_sharding(mesh)
        per = 16 // jax.process_count()
        lo = jax.process_index() * per
        batch = {
            k: jax.make_array_from_process_local_data(
                sh, v[lo:lo + per], v.shape
            )
            for k, v in batch_np.items()
        }
    else:
        from medical_image_analysis_tpu.parallel.mesh import shard_batch

        batch = shard_batch(mesh, batch_np)
    state2, metrics = step(state, batch, jax.random.PRNGKey(0))
    from jax.experimental import multihost_utils

    loss = float(metrics["loss"])
    # tiled gather returns the GLOBAL logical value regardless of how the
    # state ended up sharded (ZeRO shards large leaves along data).
    w = np.asarray(
        multihost_utils.process_allgather(state2.params["w"], tiled=True)
    ).reshape(-1)[:4]
    return loss, w


def child_ref():
    import jax

    jax.config.update("jax_platforms", "cpu")
    loss, w = _run_step(None)
    print(f"RESULT loss={loss!r} w={list(map(float, w))!r}", flush=True)


def child_worker(rank: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from medical_image_analysis_tpu.parallel.mesh import (
        init_distributed,
        make_hybrid_mesh,
    )

    assert init_distributed(), "distributed init returned False"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4
    assert len(jax.devices()) == 8
    mesh = make_hybrid_mesh(model=2)  # model rides "ICI", data spans DCN
    assert mesh.shape == {"data": 4, "model": 2}
    loss, w = _run_step(mesh)
    print(f"RESULT loss={loss!r} w={list(map(float, w))!r}", flush=True)
    jax.distributed.shutdown()


def _parse(out: str):
    for line in out.splitlines():
        if line.startswith("RESULT "):
            ns: dict = {}
            exec(line[7:].replace(" w=", "; w="), {}, ns)  # noqa: S102
            return ns["loss"], ns["w"]
    raise RuntimeError(f"no RESULT line in output:\n{out}")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "ref":
        return child_ref()
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        return child_worker(int(sys.argv[2]))

    import numpy as np

    env = _child_env(8)
    ref = subprocess.run(
        [sys.executable, __file__, "ref"], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=300,
    )
    assert ref.returncode == 0, ref.stderr[-2000:]
    ref_loss, ref_w = _parse(ref.stdout)

    env = _child_env(4)
    env.update(
        MASTER_ADDR="127.0.0.1",
        MASTER_PORT=str(PORT),
        WORLD_SIZE="2",
    )
    procs = []
    for rank in range(2):
        e = dict(env, RANK=str(rank))
        procs.append(
            subprocess.Popen(
                [sys.executable, __file__, "worker", str(rank)],
                env=e, cwd=REPO, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-2000:]
        outs.append(_parse(out))

    for rank, (loss, w) in enumerate(outs):
        print(f"rank {rank}: loss={loss:.6f} w={w}")
        np.testing.assert_allclose(loss, ref_loss, rtol=1e-6)
        np.testing.assert_allclose(w, ref_w, rtol=1e-6)
    print(
        f"DCN OK: 2 processes x 4 devices, hybrid mesh (data=4, model=2), "
        f"sharded step == single-process reference (loss {ref_loss:.6f})"
    )


if __name__ == "__main__":
    main()

"""Benchmark: fused decode+patchify+masked-encode throughput (MAE path).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
North star (BASELINE.md): >= 5,000 384^2 X-ray images/sec/chip through
the fused uint8 -> normalize -> patchify -> masked ViT-B encoder path.
vs_baseline = value / 5000.

Methodology (round 2, measured on this environment):
- 20 timed steps (round 1 used 5), async-dispatched with one final
  sync; the measured axon-tunnel roundtrip is subtracted once (the
  tunnel's ``block_until_ready`` does not reliably block, so the sync
  forces a host transfer of the scalar result).
- The compute loop uses device-resident uint8 batches. We measured the
  alternative: a standalone ``device_put`` sustains 1.4 GB/s, but any
  host buffer *attached to an execution* is shipped through the relay
  at ~40 MB/s (512-image step: 117 ms resident vs ~1.7 s with a fresh
  host buffer) — that measures the tunnel, not the chip, so host->HBM
  is reported separately on stderr instead. On a real TPU VM the host
  DMA (>10 GB/s) sustains the 5k rate trivially.
- Input pipeline from raw bytes: thread-pool JPEG decode is measured on
  stderr. This container exposes ONE host core (~650 img/s/core); a
  standard TPU-v5e host (>100 cores) clears 5k img/s with ~8 cores.
"""

import io
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

TARGET = 5000.0
IMG = 384
BATCH = 512
STEPS = 20


def _roundtrip_s() -> float:
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,))
    float(f(x)[0])
    t0 = time.perf_counter()
    for _ in range(10):
        float(f(x)[0])
    return (time.perf_counter() - t0) / 10


def host_decode_throughput(n_images: int = 512, workers: int = 32) -> float:
    """Thread-pool JPEG decode from in-memory bytes (img/s)."""
    from concurrent.futures import ThreadPoolExecutor

    import PIL.Image

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (IMG, IMG), np.uint8)
    buf = io.BytesIO()
    PIL.Image.fromarray(arr, "L").save(buf, "JPEG", quality=90)
    blob = buf.getvalue()

    def decode(_):
        with PIL.Image.open(io.BytesIO(blob)) as im:
            return np.asarray(im, np.uint8).sum()

    with ThreadPoolExecutor(max_workers=workers) as pool:
        list(pool.map(decode, range(32)))  # warm
        t0 = time.perf_counter()
        list(pool.map(decode, range(n_images)))
        dt = time.perf_counter() - t0
    return n_images / dt


def h2d_bandwidth_gbps() -> float:
    x = np.random.default_rng(0).integers(
        0, 255, (BATCH, IMG, IMG, 1)
    ).astype(np.uint8)
    d = jax.device_put(x)
    jax.block_until_ready(d)
    t0 = time.perf_counter()
    for _ in range(3):
        d = jax.device_put(x)
        jax.block_until_ready(d)
    return x.nbytes * 3 / (time.perf_counter() - t0) / 1e9


def main():
    from medical_image_analysis_tpu.data.preprocessing import device_preprocess
    from medical_image_analysis_tpu.models.vit import MAE

    model = MAE(
        patch_size=16, in_chans=3, embed_dim=768, depth=12, num_heads=12,
        decoder_embed_dim=512, decoder_depth=1, decoder_num_heads=16,
    )
    rng = jax.random.PRNGKey(0)
    raw = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (BATCH, IMG, IMG, 3)),
        jnp.uint8,
    )
    params = model.init(
        {"params": jax.random.PRNGKey(1)},
        device_preprocess(raw[:2], IMG), rng=rng,
    )
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)

    @jax.jit
    def encode(params, raw, rng, i):
        # per-step key derived ON DEVICE: host-side eager fold_in
        # between steps serializes dispatch over the relay (BENCH.md
        # "step-dispatch pipeline")
        imgs = device_preprocess(raw, IMG)
        latent, mask, _ = model.apply(
            params, imgs, rng=jax.random.fold_in(rng, i), mask_ratio=0.75,
            method=MAE.encode,
        )
        return latent.mean()

    rt = _roundtrip_s()
    float(encode(params, raw, rng, 0))  # compile + warm
    t0 = time.perf_counter()
    out = None
    for i in range(STEPS):
        out = encode(params, raw, rng, i)
    float(out)  # one sync
    dt = (time.perf_counter() - t0 - rt) / STEPS
    ips = BATCH / dt

    try:
        dec = host_decode_throughput()
        bw = h2d_bandwidth_gbps()
        print(
            f"[bench] host JPEG decode: {dec:.0f} img/s on "
            f"{os.cpu_count()} host core(s); host->HBM device_put: "
            f"{bw:.2f} GB/s (axon relay; see module docstring)",
            file=sys.stderr,
        )
    except Exception as e:  # noqa: BLE001
        print(f"[bench] aux measurements failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "mae_encode_images_per_sec_per_chip_384px",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / TARGET, 3),
    }))


def _backend_alive(timeout_s: float = 180.0) -> bool:
    """Probe the (axon-tunneled) TPU backend with a bound: when the
    tunnel wedges, ``jax.devices()`` hangs forever — fail fast with a
    diagnosable message instead of hanging the whole bench run."""
    import threading

    out: list = []
    th = threading.Thread(
        target=lambda: out.append(jax.devices()), daemon=True
    )
    th.start()
    th.join(timeout_s)
    return bool(out)


if __name__ == "__main__":
    if not _backend_alive():
        print(
            "[bench] FATAL: jax.devices() did not return within 180 s — "
            "the axon TPU tunnel is unreachable (known outage mode); "
            "no benchmark was run",
            file=sys.stderr,
        )
        sys.exit(2)
    main()

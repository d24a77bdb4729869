"""End-to-end bytes -> train-step throughput (VERDICT r3 weak #3).

Measures the FULL input path on this host — in-memory JPEG bytes ->
thread-pool `decode_scaled` (the production loader's decode) -> batch
assembly -> explicit `jax.device_put` -> fused uint8 device_preprocess
-> masked ViT-B MAE encode — as one overlapped pipeline (producer
thread + `data.datasets.prefetch`, exactly how `MRGBatcher` feeds the
recipes), plus each stage's standalone ceiling so the binding stage is
explicit rather than inferred.

Honesty notes (also printed):
- this container exposes ONE host core; decode and the driver loop
  contend, so the e2e number is a *this-host* number, bounded by
  min(decode, H2D, chip). A TPU-v5e VM host (>100 cores, >10 GB/s DMA)
  is decode-scalable; the chip-side ceiling is bench.py's headline.
- `device_put` of a standalone buffer rides the axon relay at ~1.4 GB/s
  here; host buffers attached directly to an execution fall to
  ~40 MB/s (measured round 2) — hence the explicit device_put stage.

Reference point: the reference's loader is PIL decode + torchvision
transforms in DataLoader workers (R2GenCSR/dataset/data_helper.py:74-80)
feeding a GPU step; same topology, measured here bytes->step.

Usage: python tools/bench_e2e.py [batches] [batch_size] [--packed]

``--packed`` additionally measures the round-5 packed-shard path
(tools/pack_shards.py + data/packed.py): offline decode once, then the
producer reads pre-decoded uint8 memmap records — the input pipeline a
production deployment would run, and the proof that bytes->step is not
JPEG-bound by construction.
"""

import io
import os
import queue
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/.jax_cache", exist_ok=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

IMG = 384
SRC = 512  # stored JPEG side (CXR-ish), decoded with DCT scaling to IMG


def make_blobs(n: int = 64) -> list[bytes]:
    """n distinct in-memory JPEGs (disk excluded by design)."""
    import PIL.Image

    rng = np.random.default_rng(0)
    blobs = []
    for i in range(n):
        arr = rng.integers(0, 255, (SRC, SRC), np.uint8)
        buf = io.BytesIO()
        PIL.Image.fromarray(arr, "L").save(buf, "JPEG", quality=90)
        blobs.append(buf.getvalue())
    return blobs


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    from medical_image_analysis_tpu.data.preprocessing import (
        decode_scaled,
        device_preprocess,
    )
    from medical_image_analysis_tpu.models.vit import MAE

    blobs = make_blobs()
    pool = ThreadPoolExecutor(max_workers=32)

    def decode_one(i: int) -> np.ndarray:
        # decode_scaled returns uint8 (IMG, IMG, 3) — the loader's path
        return decode_scaled(io.BytesIO(blobs[i % len(blobs)]), IMG)

    def decode_batch(seed: int) -> np.ndarray:
        return np.stack(
            list(pool.map(decode_one, range(seed, seed + batch)))
        )

    # --- stage ceilings -------------------------------------------------
    decode_batch(0)  # warm
    t0 = time.perf_counter()
    for i in range(3):
        host_b = decode_batch(i)
    t_dec = (time.perf_counter() - t0) / 3
    print(f"[stage] decode (thread pool, {os.cpu_count()} host core(s)): "
          f"{batch / t_dec:.0f} img/s", flush=True)

    d = jax.device_put(host_b)
    jax.block_until_ready(d)
    t0 = time.perf_counter()
    for _ in range(3):
        d = jax.device_put(host_b)
        jax.block_until_ready(d)
    t_h2d = (time.perf_counter() - t0) / 3
    print(f"[stage] host->HBM device_put: {batch / t_h2d:.0f} img/s "
          f"({host_b.nbytes / t_h2d / 1e9:.2f} GB/s)", flush=True)

    model = MAE(patch_size=16, in_chans=3, embed_dim=768, depth=12,
                num_heads=12, decoder_embed_dim=512, decoder_depth=1,
                decoder_num_heads=16)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": jax.random.PRNGKey(1)},
                        device_preprocess(d[:2], IMG), rng=rng)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), params)

    @jax.jit
    def encode(p, raw, k, i):
        # fold on device (BENCH.md "step-dispatch pipeline")
        imgs = device_preprocess(raw, IMG)
        latent, _, _ = model.apply(p, imgs, rng=jax.random.fold_in(k, i),
                                   mask_ratio=0.75, method=MAE.encode)
        return latent.mean()

    float(encode(params, d, rng, 0))
    t0 = time.perf_counter()
    for i in range(5):
        out = encode(params, d, rng, i)
    float(out)
    t_step = (time.perf_counter() - t0) / 5
    print(f"[stage] device encode step (device-resident): "
          f"{batch / t_step:.0f} img/s", flush=True)

    # --- overlapped end-to-end pipeline ---------------------------------
    # Producer thread: decode + device_put (the production topology —
    # `prefetch` in data/datasets.py is this same bounded-queue pattern);
    # consumer: dispatch encode on device-resident batches.
    q: queue.Queue = queue.Queue(maxsize=2)

    def producer():
        for i in range(n_batches):
            q.put(jax.device_put(decode_batch(i)))
        q.put(None)

    th = threading.Thread(target=producer, daemon=True)
    t0 = time.perf_counter()
    th.start()
    i = 0
    out = None
    while True:
        dev_b = q.get()
        if dev_b is None:
            break
        out = encode(params, dev_b, rng, i)
        i += 1
    float(out)  # sync
    dt = time.perf_counter() - t0
    e2e = n_batches * batch / dt
    bind = min(
        ("decode", batch / t_dec),
        ("h2d", batch / t_h2d),
        ("chip", batch / t_step),
        key=lambda kv: kv[1],
    )
    print(f"[e2e] bytes->step sustained: {e2e:.0f} img/s over "
          f"{n_batches}x{batch} images on this host "
          f"(binding stage: {bind[0]} @ {bind[1]:.0f} img/s)", flush=True)
    print("[note] single-core container + axon relay: the e2e number "
          "measures this host's input path, not the chip — chip ceiling "
          "is bench.py's headline; decode scales per-core on real hosts",
          flush=True)

    if "--packed" not in sys.argv:
        return

    # --- packed-shard path (decode done offline, reads are memmap) -----
    import tempfile

    from medical_image_analysis_tpu.data.packed import (
        PackedDataset, pack_images,
    )

    n_imgs = 4 * batch
    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        pack_images(
            ((f"i{j}", blobs[j % len(blobs)]) for j in range(n_imgs)),
            td, IMG,
        )
        t_pack = time.perf_counter() - t0
        ds = PackedDataset(td)
        print(f"[packed] offline pack: {n_imgs / t_pack:.0f} img/s "
              f"(one-time cost)", flush=True)

        rng_np = np.random.default_rng(0)

        def packed_batch(_seed: int) -> np.ndarray:
            idx = rng_np.integers(0, len(ds), batch)
            return ds.batch(idx)

        packed_batch(0)
        t0 = time.perf_counter()
        for i in range(5):
            host_b = packed_batch(i)
        t_read = (time.perf_counter() - t0) / 5
        print(f"[packed stage] memmap read+stack: "
              f"{batch / t_read:.0f} img/s", flush=True)

        q2: queue.Queue = queue.Queue(maxsize=2)

        def producer2():
            for i in range(n_batches):
                q2.put(jax.device_put(packed_batch(i)))
            q2.put(None)

        th2 = threading.Thread(target=producer2, daemon=True)
        t0 = time.perf_counter()
        th2.start()
        i = 0
        out = None
        while True:
            dev_b = q2.get()
            if dev_b is None:
                break
            out = encode(params, dev_b, rng, i)
            i += 1
        float(out)
        dt = time.perf_counter() - t0
        e2e_p = n_batches * batch / dt
        print(f"[packed e2e] bytes->step sustained: {e2e_p:.0f} img/s "
              f"({e2e_p / (batch / t_step):.0%} of the device-step "
              f"stage)", flush=True)


if __name__ == "__main__":
    main()

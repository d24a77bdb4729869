"""Annotation parsing, batching, and context-sample retrieval.

Mirrors the reference data layer (``R2GenCSR/dataset/data_helper.py:89-140``
ParseDataset/create_datasets; ``data_module.py:7-73`` loader settings;
``R2GenCSR.py:309-372`` context_sample): annotation.json with
train/val/test splits of {id, report, image_path[...]} records,
two-view handling, and host-side pos/neg exemplar sampling for CSR.

TPU-first batching: every batch has identical static shapes (V views
padded by repetition, reports padded to max_len), so one jitted step
serves the whole epoch.
"""

from __future__ import annotations

import dataclasses
import json
import threading
import queue as queue_mod
from typing import Iterator

import numpy as np

from .preprocessing import host_preprocess
from .report_cleaning import clean_report
from .tokenizer import WordTokenizer

# CSR keyword used for positive/negative context splits (R2GenCSR
# samples by disease keyword presence, :323-344).
DEFAULT_CONTEXT_KEYWORD = "effusion"


@dataclasses.dataclass
class Sample:
    id: str
    image_paths: list[str]
    report: str


def load_annotations(path: str, dataset: str) -> dict[str, list[Sample]]:
    with open(path) as f:
        ann = json.load(f)
    out = {}
    for split in ("train", "val", "test"):
        samples = []
        for rec in ann.get(split, []):
            report = rec.get("report") or rec.get("image_finding") or ""
            report = clean_report(report, dataset)
            paths = rec.get("image_path") or []
            if isinstance(paths, str):
                paths = [paths]
            samples.append(Sample(str(rec.get("id")), paths, report))
        out[split] = samples
    return out


def drop_unclear_reports(samples: list[Sample], min_words: int = 3):
    """drop_unclear_report filter (data_helper.py): remove degenerate
    reports (too short to describe findings)."""
    return [s for s in samples if len(s.report.split()) >= min_words]


def sample_context_ids(
    rng: np.random.Generator,
    samples: list[Sample],
    n: int,
    mode: str = "keyword",
    keyword: str = DEFAULT_CONTEXT_KEYWORD,
) -> tuple[list[int], list[int]]:
    """Return (positive, negative) exemplar indices (context_sample)."""
    if mode == "random":
        idx = rng.choice(len(samples), 2 * n, replace=len(samples) < 2 * n)
        return list(idx[:n]), list(idx[n:])
    pos = [i for i, s in enumerate(samples) if keyword in s.report]
    neg = [i for i, s in enumerate(samples) if keyword not in s.report]
    pos = pos or list(range(len(samples)))
    neg = neg or list(range(len(samples)))
    pi = rng.choice(pos, n, replace=len(pos) < n)
    ni = rng.choice(neg, n, replace=len(neg) < n)
    return list(pi), list(ni)


class MRGBatcher:
    """Host-side batch assembly with fixed shapes.

    ``image_loader(sample) -> (V, H, W, 3) float32`` is injected so tests
    and benchmarks can substitute synthetic pixels for disk reads.
    """

    def __init__(
        self,
        samples: list[Sample],
        tokenizer: WordTokenizer,
        image_loader,
        batch_size: int,
        max_len: int = 100,
        num_views: int = 2,
        prompt_before: str = "<bos> human : generate a comprehensive report",
        prompt_after: str = "assistant :",
        n_context: int = 0,
        seed: int = 0,
    ):
        self.samples = samples
        self.tok = tokenizer
        self.image_loader = image_loader
        self.batch_size = batch_size
        self.max_len = max_len
        self.num_views = num_views
        self.n_context = n_context
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.before_ids = np.asarray(
            tokenizer.encode(prompt_before.replace("<bos>", ""), add_bos=True)
        )
        self.after_ids = np.asarray(tokenizer.encode(prompt_after))

    def _views(self, sample: Sample) -> np.ndarray:
        imgs = self.image_loader(sample)  # (V', H, W, 3)
        v = imgs.shape[0]
        if v < self.num_views:  # pad by repeating the first view
            reps = [imgs] + [imgs[:1]] * (self.num_views - v)
            imgs = np.concatenate(reps, axis=0)
        return imgs[: self.num_views]

    def _encode_report(self, report: str):
        ids = self.tok.encode(report, max_len=self.max_len - 1, add_eos=True)
        return self.tok.pad(ids, self.max_len)

    def batches(self, shuffle: bool = True, drop_last: bool = True,
                epoch: int | None = None) -> Iterator[dict]:
        """With ``epoch``, ordering/sampling is a pure function of
        (seed, epoch) — resume-invariant (the DistributedSampler
        ``set_epoch`` analog, main_pretrain.py:183-184)."""
        rng = (
            np.random.default_rng((self.seed, epoch))
            if epoch is not None
            else self.rng
        )
        order = np.arange(len(self.samples))
        if shuffle:
            rng.shuffle(order)
        bs = self.batch_size
        end = len(order) - (len(order) % bs if drop_last else 0)
        for i in range(0, end, bs):
            chunk = [self.samples[j] for j in order[i : i + bs]]
            if len(chunk) < bs:
                chunk = chunk + [chunk[-1]] * (bs - len(chunk))
            images = np.stack([self._views(s) for s in chunk])
            tgt, msk = zip(*(self._encode_report(s.report) for s in chunk))
            batch = dict(
                images=images.astype(np.float32),
                before_ids=np.tile(self.before_ids, (bs, 1)),
                after_ids=np.tile(self.after_ids, (bs, 1)),
                target_ids=np.asarray(tgt, np.int32),
                target_mask=np.asarray(msk, np.int32),
                ids=[s.id for s in chunk],
                reports=[s.report for s in chunk],
            )
            if self.n_context > 0:
                ctx_imgs = []
                for _ in chunk:
                    pi, ni = sample_context_ids(
                        rng, self.samples, self.n_context
                    )
                    ctx = [
                        self._views(self.samples[j])[0] for j in pi + ni
                    ]
                    ctx_imgs.append(np.stack(ctx))
                batch["context_images"] = np.stack(ctx_imgs).astype(
                    np.float32
                )
            yield batch


def prefetch(iterator: Iterator, depth: int = 2) -> Iterator:
    """Background-thread prefetch (replaces DataLoader workers +
    prefetch_factor, data_module.py:55-57)."""
    q: queue_mod.Queue = queue_mod.Queue(maxsize=depth)
    sentinel = object()

    def worker():
        for item in iterator:
            q.put(item)
        q.put(sentinel)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item


def disk_image_loader(base_dir: str, input_size: int):
    """Default loader: PIL decode + swin-processor-style preprocess."""
    import os

    import PIL.Image

    def load(sample: Sample) -> np.ndarray:
        views = []
        for p in sample.image_paths:
            with PIL.Image.open(os.path.join(base_dir, p)) as pil:
                arr = np.asarray(pil.convert("RGB"), np.uint8)
            views.append(host_preprocess(arr, input_size))
        return np.stack(views)

    return load


def synthetic_annotations(
    n_train: int = 32, n_val: int = 8, n_test: int = 8, seed: int = 0
) -> dict[str, list[Sample]]:
    """Synthetic X-ray-like dataset for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    phrases = [
        "the lungs are clear", "no acute cardiopulmonary abnormality",
        "there is a small left pleural effusion",
        "heart size is normal", "no focal consolidation",
        "mild cardiomegaly is present", "no pneumothorax",
        "degenerative changes of the spine",
    ]
    def make(i):
        k = rng.integers(2, 5)
        report = " . ".join(rng.choice(phrases, k, replace=False)) + " ."
        return Sample(f"s{i}", [f"img_{i}_0.png", f"img_{i}_1.png"], report)

    return {
        "train": [make(i) for i in range(n_train)],
        "val": [make(10_000 + i) for i in range(n_val)],
        "test": [make(20_000 + i) for i in range(n_test)],
    }


def synthetic_image_loader(size: int = 64, views: int = 2):
    def load(sample: Sample) -> np.ndarray:
        seed = abs(hash(sample.id)) % (2**32)
        rng = np.random.default_rng(seed)
        return rng.standard_normal((views, size, size, 3)).astype(np.float32)

    return load

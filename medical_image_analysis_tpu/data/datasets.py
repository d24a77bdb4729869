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

from .preprocessing import decode_scaled, host_preprocess
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
    study_id: str | None = None
    # Draft report from an earlier model pass (MAC-RRG `Draft_text`,
    # MAC data_helper.py:64-66); the agents run over this text.
    draft: str | None = None


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
            samples.append(Sample(
                str(rec.get("id")), paths, report,
                study_id=(
                    str(rec["study_id"]) if "study_id" in rec else None
                ),
                draft=rec.get("Draft_text"),
            ))
        out[split] = samples
    return out


def drop_unclear_reports(samples: list[Sample], min_words: int = 3):
    """drop_unclear_report filter (data_helper.py): remove degenerate
    reports (too short to describe findings)."""
    return [s for s in samples if len(s.report.split()) >= min_words]


def load_chexbert_csv(path: str) -> dict[str, np.ndarray]:
    """ann_chexbert.csv (id + 14 label columns, R2GenCSR.py:323-344) ->
    {id: (14,) int labels} with -1/blank mapped to 0 (compute_ce.py)."""
    import csv

    out = {}
    with open(path, newline="") as f:
        reader = csv.DictReader(f)
        cols = [c for c in reader.fieldnames if c not in ("id", "image_path")]
        for row in reader:
            vals = []
            for c in cols:
                v = row.get(c, "")
                try:
                    v = float(v)
                except (TypeError, ValueError):
                    v = 0.0
                vals.append(1 if v == 1 else 0)
            out[str(row.get("id"))] = np.asarray(vals, np.int32)
    return out


def context_index_split(
    samples: list[Sample],
    mode: str = "keyword",
    keyword: str | list[str] = DEFAULT_CONTEXT_KEYWORD,
    chexbert_labels: dict[str, np.ndarray] | None = None,
) -> tuple[list[int], list[int]] | None:
    """One-time (positive, negative) index split over the train split
    (the O(dataset) part of context_sample, R2GenCSR.py:309-372).
    ``random`` mode has no split (returns None); ``keyword`` splits on
    disease keyword presence; ``chexbert`` on the no-finding column of a
    CheXbert csv (positives = any finding), falling back to the rule
    labeler when no csv."""
    if mode == "random":
        return None
    if mode == "chexbert":
        from ..evalx.chexbert import extract_labels

        def no_finding(s: Sample) -> bool:
            if chexbert_labels is not None and s.id in chexbert_labels:
                return bool(chexbert_labels[s.id][-1] == 1)
            return bool(extract_labels(s.report)[-1] == 1)

        pos = [i for i, s in enumerate(samples) if not no_finding(s)]
        neg = [i for i, s in enumerate(samples) if no_finding(s)]
    else:
        kws = [keyword] if isinstance(keyword, str) else list(keyword)
        pos = [
            i for i, s in enumerate(samples)
            if any(k in s.report for k in kws)
        ]
        neg = [
            i for i, s in enumerate(samples)
            if not any(k in s.report for k in kws)
        ]
    pos = pos or list(range(len(samples)))
    neg = neg or list(range(len(samples)))
    return pos, neg


def draw_context_ids(
    rng: np.random.Generator,
    split: tuple[list[int], list[int]] | None,
    n_samples: int,
    n: int,
) -> tuple[list[int], list[int]]:
    """Per-batch-element draw from a precomputed split (or uniform for
    ``random`` mode)."""
    if split is None:
        idx = rng.choice(n_samples, 2 * n, replace=n_samples < 2 * n)
        return list(idx[:n]), list(idx[n:])
    pos, neg = split
    pi = rng.choice(pos, n, replace=len(pos) < n)
    ni = rng.choice(neg, n, replace=len(neg) < n)
    return list(pi), list(ni)


def sample_context_ids(
    rng: np.random.Generator,
    samples: list[Sample],
    n: int,
    mode: str = "keyword",
    keyword: str | list[str] = DEFAULT_CONTEXT_KEYWORD,
    chexbert_labels: dict[str, np.ndarray] | None = None,
) -> tuple[list[int], list[int]]:
    """Split + draw in one call (kept for one-shot callers; hot loops
    should precompute :func:`context_index_split` once)."""
    split = context_index_split(samples, mode, keyword, chexbert_labels)
    return draw_context_ids(rng, split, len(samples), n)


def group_study_two_views(
    samples: list[Sample], rng: np.random.Generator | None = None
) -> list[Sample]:
    """MIMIC study-grouped two-view sampling (data_helper.py:105-128,
    ``use_feature_mean=False``): pool image paths per study_id; a sample
    with 2 pooled paths uses both, >2 keeps its own plus one random
    pooled path, 1 duplicates itself."""
    rng = rng or np.random.default_rng(0)
    pooled: dict[str, list[str]] = {}
    for s in samples:
        if s.study_id is not None:
            pooled.setdefault(s.study_id, []).extend(s.image_paths)
    out = []
    for s in samples:
        group = pooled.get(s.study_id or "", s.image_paths)
        if len(group) == 2:
            paths = list(group)
        elif len(group) > 2:
            paths = s.image_paths + [group[int(rng.integers(len(group)))]]
        else:
            paths = s.image_paths + s.image_paths
        out.append(dataclasses.replace(s, image_paths=paths[:2]))
    return out


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
        context_mode: str = "keyword",
        context_keyword: str | list[str] = DEFAULT_CONTEXT_KEYWORD,
        chexbert_labels: dict | None = None,
        num_workers: int = 8,
        seed: int = 0,
        regroup_views: bool = False,
        extra_fn=None,
    ):
        self.samples = samples
        self.tok = tokenizer
        self.image_loader = image_loader
        self.batch_size = batch_size
        self.max_len = max_len
        self.num_views = num_views
        self.n_context = n_context
        self.context_mode = context_mode
        # Pos/neg split over the whole split is O(dataset) (and runs the
        # rule labeler in chexbert mode) — compute it once, draw per batch.
        self._context_split = (
            context_index_split(
                samples, context_mode, context_keyword, chexbert_labels
            )
            if n_context > 0
            else None
        )
        # MIMIC two-view pooling re-samples the extra view per epoch
        # (data_helper.py use_feature_mean=False re-draws per access).
        self.regroup_views = regroup_views
        # Optional per-sample side inputs: extra_fn(sample) -> dict of
        # np arrays stacked into the batch (memory banks / graph / agent
        # embeddings for the heads-heavy tasks).
        self.extra_fn = extra_fn
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self._pool = None
        if num_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            # PIL decode releases the GIL; a thread pool is the
            # DataLoader(num_workers=8) analog (data_module.py:55-57).
            self._pool = ThreadPoolExecutor(max_workers=num_workers)
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
        samples = self.samples
        if self.regroup_views:
            samples = group_study_two_views(samples, rng)
        order = np.arange(len(samples))
        if shuffle:
            rng.shuffle(order)
        bs = self.batch_size
        end = len(order) - (len(order) % bs if drop_last else 0)
        for i in range(0, end, bs):
            chunk = [samples[j] for j in order[i : i + bs]]
            if len(chunk) < bs:
                chunk = chunk + [chunk[-1]] * (bs - len(chunk))
            if self._pool is not None:
                images = np.stack(list(self._pool.map(self._views, chunk)))
            else:
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
                    pi, ni = draw_context_ids(
                        rng, self._context_split, len(self.samples),
                        self.n_context,
                    )
                    ctx = [
                        self._views(self.samples[j])[0] for j in pi + ni
                    ]
                    ctx_imgs.append(np.stack(ctx))
                batch["context_images"] = np.stack(ctx_imgs).astype(
                    np.float32
                )
            if self.extra_fn is not None:
                extras = [self.extra_fn(s) for s in chunk]
                for k in extras[0]:
                    batch[k] = np.stack([e[k] for e in extras])
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


def disk_image_loader(base_dir: str, input_size: int,
                      fast_decode: bool = True):
    """Default loader: scaled JPEG decode + swin-processor-style
    preprocess (see :func:`..data.preprocessing.decode_scaled` for the
    fast-path semantics; ``fast_decode=False`` is bit-faithful to the
    reference's full decode)."""
    import os

    def load(sample: Sample) -> np.ndarray:
        views = []
        for p in sample.image_paths:
            arr = decode_scaled(
                os.path.join(base_dir, p), input_size, fast=fast_decode)
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
        picked = rng.choice(phrases, k, replace=False)
        report = " . ".join(picked) + " ."
        # Draft = imperfect first pass (drop one phrase) for MAC-RRG.
        draft = " . ".join(picked[: max(int(k) - 1, 1)]) + " ."
        return Sample(
            f"s{i}", [f"img_{i}_0.png", f"img_{i}_1.png"], report,
            draft=draft,
        )

    return {
        "train": [make(i) for i in range(n_train)],
        "val": [make(10_000 + i) for i in range(n_val)],
        "test": [make(20_000 + i) for i in range(n_test)],
    }


# Learnable synthetic corpus: reports generated from a label grammar and
# images rendered from the same labels, so image->report has real signal
# and the full train->generate->score loop can DEMONSTRATE convergence
# (BLEU/CIDEr rising over epochs) without real data. Each finding has a
# distinct visual mark and a fixed positive/negative sentence; the
# report is a deterministic function of the 6-bit label vector (64
# distinct reports), mirroring the reference's template-like findings
# sections (R2GenCSR clean_report output shape, data_helper.py:29-59).
LEARNABLE_FINDINGS = [
    ("cardiomegaly", "mild cardiomegaly is present",
     "heart size is normal"),
    ("left_effusion", "there is a small left pleural effusion",
     "no left pleural effusion"),
    ("right_effusion", "there is a small right pleural effusion",
     "no right pleural effusion"),
    ("pneumothorax", "there is a left apical pneumothorax",
     "no pneumothorax is seen"),
    ("consolidation", "focal consolidation in the right lung",
     "no focal consolidation"),
    ("spine", "degenerative changes of the spine",
     "the spine is unremarkable"),
]


def learnable_report(bits: int) -> str:
    parts = [
        pos if (bits >> k) & 1 else neg
        for k, (_, pos, neg) in enumerate(LEARNABLE_FINDINGS)
    ]
    return " . ".join(parts) + " ."


def learnable_synthetic_annotations(
    n_train: int = 512, n_val: int = 64, n_test: int = 64, seed: int = 0,
    holdout: int = 0,
) -> dict[str, list[Sample]]:
    """Label-grammar corpus; the 6-bit label vector rides in the id.

    ``holdout > 0`` reserves that many of the 64 finding *combinations*
    exclusively for val/test (compositional generalization: every
    sentence is seen in training, the held-out combinations never are),
    so val BLEU measures composition rather than recall.
    """
    rng = np.random.default_rng(seed)
    n_f = len(LEARNABLE_FINDINGS)
    all_bits = np.arange(2**n_f)
    if holdout:
        held = rng.choice(all_bits, size=holdout, replace=False)
        held_set = set(int(b) for b in held)
        train_bits = np.asarray(
            [b for b in all_bits if int(b) not in held_set]
        )
        eval_bits = np.asarray(sorted(held_set))
    else:
        train_bits = eval_bits = all_bits

    def make(i, pool):
        bits = int(pool[rng.integers(0, len(pool))])
        report = learnable_report(bits)
        drop = rng.integers(0, n_f)
        draft = " . ".join(
            s for k, s in enumerate(report.rstrip(" .").split(" . "))
            if k != drop
        ) + " ."
        return Sample(
            f"ls{i}_{bits}", [f"v0_{i}.png", f"v1_{i}.png"], report,
            draft=draft,
        )

    return {
        "train": [make(i, train_bits) for i in range(n_train)],
        "val": [make(10_000 + i, eval_bits) for i in range(n_val)],
        "test": [make(20_000 + i, eval_bits) for i in range(n_test)],
    }


def render_learnable_image(
    bits: int, size: int, rng: np.random.Generator
) -> np.ndarray:
    """Chest-radiograph-like rendering of a 6-bit finding vector."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    img = np.full((size, size), 0.15, np.float32)

    def ellipse(cx, cy, rx, ry, value):
        m = ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 <= 1.0
        img[m] += value

    # lung fields + mediastinum
    ellipse(0.30, 0.45, 0.18, 0.30, 0.35)
    ellipse(0.70, 0.45, 0.18, 0.30, 0.35)
    heart_rx = 0.22 if (bits >> 0) & 1 else 0.12  # cardiomegaly
    ellipse(0.52, 0.62, heart_rx, 0.16, -0.20)
    if (bits >> 1) & 1:  # left effusion: bright base, viewer right
        img[(yy > 0.62) & (xx > 0.58) & (xx < 0.90)] += 0.30
    if (bits >> 2) & 1:  # right effusion
        img[(yy > 0.62) & (xx > 0.10) & (xx < 0.42)] += 0.30
    if (bits >> 3) & 1:  # pneumothorax: dark apical rim
        img[(yy < 0.25) & (xx > 0.58) & (xx < 0.92)] *= 0.3
    if (bits >> 4) & 1:  # consolidation blob mid-right lung
        ellipse(0.30, 0.40, 0.07, 0.07, 0.45)
    if (bits >> 5) & 1:  # spine hardware: bright midline bar
        img[:, int(0.48 * size):int(0.52 * size)] += 0.35
    img += rng.standard_normal((size, size)).astype(np.float32) * 0.03
    img = np.clip(img, 0.0, 1.0)
    return np.repeat(img[:, :, None], 3, axis=2)


def learnable_image_loader(size: int = 224, views: int = 2):
    from .preprocessing import host_preprocess

    def load(sample: Sample) -> np.ndarray:
        bits = int(sample.id.rsplit("_", 1)[1])
        seed = abs(hash(sample.id)) % (2**32)
        rng = np.random.default_rng(seed)
        frames = [
            host_preprocess(
                np.round(
                    render_learnable_image(bits, size, rng) * 255
                ).astype(np.uint8),
                size,
            )
            for _ in range(views)
        ]
        return np.stack(frames)

    return load


def synthetic_image_loader(size: int = 64, views: int = 2):
    def load(sample: Sample) -> np.ndarray:
        seed = abs(hash(sample.id)) % (2**32)
        rng = np.random.default_rng(seed)
        return rng.standard_normal((views, size, size, 3)).astype(np.float32)

    return load


def zip_image_loader(zip_path: str, input_size: int,
                     fast_decode: bool = True):
    """Zip-backed image loading (SwinCheX ``cached_image_folder.py``
    parity): per-thread zipfile handles, decode straight from the
    archive — no extracted tree on disk."""
    import io
    import threading as _threading
    import zipfile

    local = _threading.local()
    handles: list[zipfile.ZipFile] = []  # every per-thread handle
    lock = _threading.Lock()

    def handle() -> zipfile.ZipFile:
        if not hasattr(local, "zf"):
            local.zf = zipfile.ZipFile(zip_path)
            with lock:
                handles.append(local.zf)
        return local.zf

    def load(sample: Sample) -> np.ndarray:
        views = []
        for p in sample.image_paths:
            with handle().open(p) as f:
                arr = decode_scaled(io.BytesIO(f.read()), input_size,
                                    fast=fast_decode)
            views.append(host_preprocess(arr, input_size))
        return np.stack(views)

    def close():
        """Release every per-thread zip handle (call when the loader is
        retired; handles otherwise live as long as the decode threads)."""
        with lock:
            for zf in handles:
                zf.close()
            handles.clear()

    load.close = close
    return load


def mixup_cutmix(
    rng: np.random.Generator,
    images: np.ndarray,
    labels: np.ndarray,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    prob: float = 1.0,
    switch_prob: float = 0.5,
):
    """Batch mixup/cutmix (timm semantics; SwinCheX ``data/build.py``):
    returns (mixed_images, soft_labels). Labels may be multi-hot."""
    b = images.shape[0]
    labels = labels.astype(np.float32)
    if rng.random() > prob:
        return images, labels
    perm = rng.permutation(b)
    use_cutmix = rng.random() < switch_prob and cutmix_alpha > 0
    if use_cutmix:
        lam = float(rng.beta(cutmix_alpha, cutmix_alpha))
        h, w = images.shape[-3], images.shape[-2]
        rh, rw = int(h * np.sqrt(1 - lam)), int(w * np.sqrt(1 - lam))
        cy, cx = int(rng.integers(h)), int(rng.integers(w))
        y0, y1 = max(cy - rh // 2, 0), min(cy + rh // 2, h)
        x0, x1 = max(cx - rw // 2, 0), min(cx + rw // 2, w)
        mixed = images.copy()
        mixed[..., y0:y1, x0:x1, :] = images[perm][..., y0:y1, x0:x1, :]
        lam = 1.0 - ((y1 - y0) * (x1 - x0) / (h * w))
    else:
        lam = float(rng.beta(mixup_alpha, mixup_alpha)) if mixup_alpha > 0 else 1.0
        mixed = lam * images + (1.0 - lam) * images[perm]
    soft = lam * labels + (1.0 - lam) * labels[perm]
    return mixed.astype(images.dtype), soft

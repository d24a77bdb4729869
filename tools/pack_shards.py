"""Offline image packer: JPEG/DICOM -> fixed-record uint8 shards.

Decodes and resizes every image of an annotation split ONCE so training
reads are pure memmap slices (see data/packed.py).  TPU-first analog of
the reference's pre-cached zip loader
(``VMamba/classification/data/cached_image_folder.py``).

Usage:
  python tools/pack_shards.py <annotation.json> <image_dir> <out_dir> \
      [--size 224] [--dataset mimic_cxr] [--split train]
  python tools/pack_shards.py --glob '<dir>/**/*.jpg' <out_dir> [--size N]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medical_image_analysis_tpu.data.packed import pack_images  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("args", nargs="+")
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--dataset", default="mimic_cxr")
    ap.add_argument("--split", default="train")
    ap.add_argument("--glob", default=None)
    ns = ap.parse_args()

    if ns.glob:
        (out_dir,) = ns.args
        paths = sorted(glob.glob(ns.glob, recursive=True))
        items = ((os.path.basename(p), p) for p in paths)
        n_expected = len(paths)
    else:
        ann, image_dir, out_dir = ns.args
        from medical_image_analysis_tpu.data.datasets import load_annotations

        splits = load_annotations(ann, ns.dataset)
        seen = set()
        paths = []
        for s in splits[ns.split]:
            for p in s.image_paths:
                if p not in seen:
                    seen.add(p)
                    paths.append(p)
        items = ((p, os.path.join(image_dir, p)) for p in paths)
        n_expected = len(paths)

    index = pack_images(items, out_dir, ns.size)
    rec_mb = index["record_bytes"] * index["count"] / 1e6
    print(
        f"packed {index['count']}/{n_expected} images at {ns.size}px "
        f"into {out_dir} ({rec_mb:.0f} MB raw uint8)"
    )


if __name__ == "__main__":
    main()

"""Training CLI — replaces the per-project train.py scripts.

Usage:
  python -m medical_image_analysis_tpu.cli.train --config cfg.yaml \
      [--set train.lr=3e-4 --set model.task=r2gencsr] [--throughput]

Mirrors the reference CLIs (``R2GenCSR/train.py:46-55``,
``main_pretrain.py``, SwinCheX ``--throughput`` mode
``main.py:361-430``).
"""

from __future__ import annotations

import argparse
import json

from ..configs.config import load_config, make_config, save_config
from ..train.loop import fit


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="YAML config path")
    ap.add_argument(
        "--set", action="append", default=[], dest="overrides",
        help="dotted override, e.g. train.lr=3e-4",
    )
    ap.add_argument("--throughput", action="store_true",
                    help="timed forward passes instead of training")
    ap.add_argument("--test", action="store_true",
                    help="eval-only on the test split (trainer.test, "
                         "R2GenCSR/train.py:39-42)")
    ap.add_argument("--validate", action="store_true",
                    help="eval-only on the val split (trainer.validate)")
    args = ap.parse_args(argv)

    if args.config:
        cfg = load_config(args.config, args.overrides)
    else:
        cfg = make_config({}, args.overrides)
    if args.test or args.validate:
        cfg.train.eval_only = True
        cfg.train.eval_split = "test" if args.test else "val"
        if not (cfg.train.resume or cfg.train.init_delta):
            cfg.train.resume = "auto"

    if args.throughput:
        from .throughput import run_throughput

        print(json.dumps(run_throughput(cfg)))
        return

    import os

    os.makedirs(cfg.train.save_dir, exist_ok=True)
    save_config(cfg, f"{cfg.train.save_dir}/config.yaml")
    results = fit(cfg)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

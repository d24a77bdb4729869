"""MAC-RRG iterative-refinement CLI.

One command for the reference's multi-agent pipeline (draft -> KG/RAG
agents -> regenerate, ``MAC_RRG/model/R2GenGPT.py:252-387``):

  python -m medical_image_analysis_tpu.cli.mac_refine --config cfg.yaml \
      [--delta checkpoint_epochN_....msgpack] [--rounds 1] \
      [--split val] [--set model.task=mac_rrg]
"""

from __future__ import annotations

import argparse
import json

from ..configs.config import load_config, make_config
from ..train.mac_driver import refine_mac_rrg


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="YAML config path")
    ap.add_argument("--set", action="append", default=[], dest="overrides")
    ap.add_argument("--delta", default="",
                    help="trainable-delta checkpoint from the mac_rrg recipe")
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--split", default="val")
    ap.add_argument("--max-batches", type=int, default=20)
    args = ap.parse_args(argv)

    if args.config:
        cfg = load_config(args.config, args.overrides)
    else:
        cfg = make_config({}, args.overrides)
    cfg.model.task = "mac_rrg"

    out = refine_mac_rrg(
        cfg, delta_file=args.delta, rounds=args.rounds, split=args.split,
        max_batches=args.max_batches,
    )
    print(json.dumps({"draft": out["draft"], "refined": out["refined"]}))


if __name__ == "__main__":
    main()

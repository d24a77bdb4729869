"""Serving demo — replaces the Gradio app (``R2GenCSR/demo.py:12-43``).

Modes:
  one-shot:  python -m medical_image_analysis_tpu.cli.demo --image x.png \
                 --delta ckpt.msgpack --vocab vocab.json
  server:    ... --serve 8080   (JSON API: POST /generate {"image": b64})

The model pipeline is demo_test_step-shaped (R2GenCSR.py:667-716):
preprocess -> encode -> beam generate -> decode.
"""

from __future__ import annotations

import argparse
import base64
import io
import json

import numpy as np


def build_pipeline(args):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ..configs.config import load_config, make_config
    from ..data.preprocessing import host_preprocess
    from ..data.tokenizer import WordTokenizer
    from ..models.mrg import GenerateConfig
    from ..train.loop import build_mrg_model

    cfg = load_config(args.config) if args.config else make_config({})
    tok_dir = cfg.data.tokenizer_dir or cfg.model.llm_weights_dir
    if args.vocab:
        tok = WordTokenizer.load(args.vocab)
    elif tok_dir:
        from ..data.hf_tokenizer import HFTokenizer

        tok = HFTokenizer.from_file(f"{tok_dir}/tokenizer.json")
    else:
        tok = WordTokenizer(["the", "lungs", "are", "clear", "."])
    model = build_mrg_model(cfg, tok.vocab_size)
    gcfg = dataclasses.replace(cfg.generate, eos_id=tok.EOS, num_beams=3)

    size = cfg.data.input_size
    before = np.asarray([tok.encode(cfg.data.prompt, add_bos=True)])
    after = np.asarray([tok.encode(cfg.data.prompt_after)])

    dummy = jnp.zeros((1, 1, size, size, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), dummy, jnp.asarray(before),
        jnp.asarray(after),
        jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
    )
    if cfg.model.llm_weights_dir:
        # Serve against real streamed LLM weights (int8 welcome here —
        # the same splice the training recipes use).
        from ..train.loop import splice_llm_weights

        params = splice_llm_weights(params, cfg, model)
    if args.delta:
        from ..ckpt.checkpoint import load_delta, merge_delta

        delta, _ = load_delta(args.delta)
        params = merge_delta(params, delta)

    gen = jax.jit(
        lambda p, img: model.apply(
            p, img, jnp.asarray(before), jnp.asarray(after), gcfg,
            method=type(model).generate,
        )
    )

    def report_for(img_u8: np.ndarray) -> str:
        x = host_preprocess(img_u8, size)[None, None]
        out = np.asarray(gen(params, jnp.asarray(x)))
        return tok.decode(out[0])

    return report_for


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--vocab", default=None)
    ap.add_argument("--delta", default=None)
    ap.add_argument("--image", default=None)
    ap.add_argument("--serve", type=int, default=0)
    args = ap.parse_args(argv)

    report_for = build_pipeline(args)

    if args.image:
        import PIL.Image

        with PIL.Image.open(args.image) as pil:
            img = np.asarray(pil.convert("RGB"), np.uint8)
        print(report_for(img))
        return

    if args.serve:
        server = make_server(report_for, args.serve)
        print(f"serving on :{server.server_address[1]}")
        server.serve_forever()


def make_server(report_for, port: int):
    """HTTP JSON server: POST /generate {"image": <b64 png/jpg>} ->
    {"report": ...}. Split out so tests can bind port 0 and drive it."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or "{}")
            import PIL.Image

            raw = base64.b64decode(req["image"])
            with PIL.Image.open(io.BytesIO(raw)) as pil:
                img = np.asarray(pil.convert("RGB"), np.uint8)
            body = json.dumps({"report": report_for(img)}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet in tests
            pass

    return HTTPServer(("0.0.0.0", port), Handler)


if __name__ == "__main__":
    main()

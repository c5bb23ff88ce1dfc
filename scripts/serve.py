#!/usr/bin/env python
"""Serving CLI: batched jitted inference from a trained checkpoint.

The reference has no serving surface (its closest analogue is the
evaluators' feature-extraction loop,
`/root/reference/evaluators/unsupervised_evaluators/evaluator_utils.py:8-22`);
this is a TPU-native addition built on the same inference paths the
evaluators use (`vit_ssl_tpu/evaluators/evaluator_utils.py::make_feature_fn`):

- supervised / finetune checkpoints → class predictions (argmax + softmax
  probability over the MLP head's logits)
- simmim / dino checkpoints → embedding vectors (SimMIM mean-pooled patch
  features; DINO teacher-backbone CLS features)

Serving mechanics, not just a loop: ONE jitted forward at a static batch
shape (short batches are zero-padded, pad rows dropped on output), bf16
compute, a warmup compile at startup with throughput reported, and an
optional micro-batching stdin server that flushes a batch when it fills
or when the oldest request has waited ``--max-wait-ms``.

    # one-shot: files / a directory
    python scripts/serve.py --checkpoint <run_dir>/best_model img1.png img2.png
    python scripts/serve.py --checkpoint <run_dir>/best_model --input-dir imgs/

    # micro-batching server: one image path per stdin line, one JSON line
    # per input on stdout, in order
    ... | python scripts/serve.py --checkpoint <run_dir>/best_model --stdin

Output is JSON lines: {"path", "pred", "prob"} for classifiers,
{"path", "embedding"} for SSL checkpoints (``--no-embedding-values`` emits
the vector's norm instead of the values).
"""

from __future__ import annotations

import argparse
import json
import select
import sys
import time
from pathlib import Path
from types import SimpleNamespace

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def load_serving_model(checkpoint_path: str):
    """Rebuild the model from the checkpoint-embedded config (the same
    contract the visualizers rely on — SURVEY.md §5 checkpoint notes)."""
    from vit_ssl_tpu.config import from_container
    from vit_ssl_tpu.evaluators.evaluator_utils import make_feature_fn
    from vit_ssl_tpu.models.builder import build_model
    from vit_ssl_tpu.utils.checkpoint import load_checkpoint

    tree, metadata = load_checkpoint(checkpoint_path)
    config = from_container(metadata["config"])
    bundle = build_model(config)
    state = SimpleNamespace(
        params=tree["params"],
        teacher_params=tree.get("teacher_params"),
    )
    fn, params = make_feature_fn(bundle, state)
    return fn, params, bundle.mode, config


def preprocess(paths, img_size: int) -> np.ndarray:
    """Decode + resize + scale to [0,1] fp32 NHWC — the evaluators' clean
    inference pipeline (Resize + ToTensor, no augmentation)."""
    from PIL import Image

    out = np.zeros((len(paths), img_size, img_size, 3), np.float32)
    for i, p in enumerate(paths):
        img = Image.open(p).convert("RGB").resize((img_size, img_size))
        out[i] = np.asarray(img, np.float32) / 255.0
    return out


class Server:
    """Static-shape batched inference with zero-padding."""

    def __init__(self, checkpoint: str, batch_size: int,
                 embedding_values: bool = True):
        import jax

        self.fn, self.params, self.mode, self.config = load_serving_model(
            checkpoint
        )
        self.embedding_values = embedding_values
        self.img = int(self.config["data"]["img_size"])
        self.batch = int(batch_size)
        self.classifier = self.mode in ("supervised", "finetune")
        t0 = time.perf_counter()
        zeros = np.zeros((self.batch, self.img, self.img, 3), np.float32)
        jax.block_until_ready(self.fn(self.params, zeros))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = jax.block_until_ready(self.fn(self.params, zeros))
        step_s = time.perf_counter() - t0
        _ = np.asarray(out)  # channel warm + value barrier
        print(
            f"[serve] mode={self.mode} img={self.img} batch={self.batch} "
            f"compile {compile_s:.1f}s, warm batch {step_s * 1e3:.1f} ms "
            f"({self.batch / max(step_s, 1e-9):.0f} img/s)",
            file=sys.stderr, flush=True,
        )

    def infer(self, paths):
        """Forward a (possibly short) list of paths; returns result dicts."""
        import jax

        x = preprocess(paths, self.img)
        n = len(paths)
        if n < self.batch:  # static shape: zero-pad, drop pad rows below
            pad = np.zeros((self.batch - n,) + x.shape[1:], x.dtype)
            x = np.concatenate([x, pad], axis=0)
        out = np.asarray(
            jax.device_get(self.fn(self.params, x)), np.float32
        )[:n]
        if self.classifier:
            z = out - out.max(axis=-1, keepdims=True)
            probs = np.exp(z) / np.exp(z).sum(axis=-1, keepdims=True)
            preds = out.argmax(axis=-1)
            return [
                {"path": str(p), "pred": int(c), "prob": round(float(pr), 6)}
                for p, c, pr in zip(paths, preds, probs.max(axis=-1))
            ]
        if not self.embedding_values:
            return [
                {"path": str(p),
                 "embedding_norm": round(float(np.linalg.norm(e)), 6)}
                for p, e in zip(paths, out)
            ]
        return [
            {"path": str(p), "embedding": [round(float(v), 6) for v in e]}
            for p, e in zip(paths, out)
        ]


def run_stdin_server(server: Server, sink, max_wait_ms: float):
    """Micro-batching loop: flush when the batch fills, when the oldest
    queued request has waited ``max_wait_ms``, or at EOF."""
    pending: list = []
    oldest = None

    def flush():
        nonlocal pending, oldest
        if pending:
            for rec in server.infer(pending):
                sink.write(json.dumps(rec) + "\n")
            sink.flush()
            pending, oldest = [], None

    while True:
        timeout = None
        if oldest is not None:
            timeout = max(0.0, max_wait_ms / 1e3 - (time.monotonic() - oldest))
        ready, _, _ = select.select([sys.stdin], [], [], timeout)
        if not ready:
            flush()  # oldest request hit its latency budget
            continue
        line = sys.stdin.readline()
        if not line:  # EOF
            flush()
            return
        path = line.strip()
        if not path:
            continue
        pending.append(path)
        oldest = oldest if oldest is not None else time.monotonic()
        if len(pending) >= server.batch:
            flush()


def main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    parser.add_argument("--checkpoint", required=True,
                        help="checkpoint dir (e.g. <run_dir>/best_model)")
    parser.add_argument("paths", nargs="*", help="image files")
    parser.add_argument("--input-dir", help="serve every image in a directory")
    parser.add_argument("--stdin", action="store_true",
                        help="micro-batching server: image paths on stdin")
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--max-wait-ms", type=float, default=50.0,
                        help="stdin mode: max queueing latency before a "
                        "short batch is flushed")
    parser.add_argument("--output", help="write JSON lines here instead of stdout")
    parser.add_argument("--no-embedding-values", action="store_true",
                        help="emit embedding L2 norms instead of full vectors")
    args = parser.parse_args(argv)

    paths = list(args.paths)
    if args.input_dir:
        exts = {".png", ".jpg", ".jpeg", ".bmp"}
        paths += sorted(
            str(p) for p in Path(args.input_dir).iterdir()
            if p.suffix.lower() in exts
        )
    if not paths and not args.stdin:
        parser.error("no inputs: pass image paths, --input-dir, or --stdin")

    server = Server(args.checkpoint, args.batch_size,
                    embedding_values=not args.no_embedding_values)
    sink = open(args.output, "w") if args.output else sys.stdout
    try:
        if args.stdin:
            run_stdin_server(server, sink, args.max_wait_ms)
        else:
            t0 = time.perf_counter()
            n = 0
            for i in range(0, len(paths), server.batch):
                for rec in server.infer(paths[i:i + server.batch]):
                    sink.write(json.dumps(rec) + "\n")
                    n += 1
            sink.flush()
            dt = time.perf_counter() - t0
            print(f"[serve] {n} images in {dt:.2f}s ({n / max(dt, 1e-9):.0f} img/s "
                  "end-to-end incl. decode)", file=sys.stderr, flush=True)
    finally:
        if args.output:
            sink.close()


if __name__ == "__main__":
    main()

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
import os
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


def make_pipeline(img_size: int):
    """THE evaluators' clean inference pipeline (Resize + ToTensor from
    the framework's transforms — same cv2 interpolation the checkpoint
    was evaluated/selected with, not PIL's), no augmentation."""
    from vit_ssl_tpu.data.transforms import Compose, Resize, ToTensor

    return Compose([Resize([img_size, img_size]), ToTensor()])


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
        self.pipeline = make_pipeline(self.img)
        zeros = np.zeros((self.batch, self.img, self.img, 3), np.float32)
        t0 = time.perf_counter()
        np.asarray(jax.device_get(self.fn(self.params, zeros)))
        compile_s = time.perf_counter() - t0
        # value fetch INSIDE the timed window: bare block_until_ready can
        # return early through remote transports (CLAUDE.md timing trap)
        t0 = time.perf_counter()
        np.asarray(jax.device_get(self.fn(self.params, zeros)))
        step_s = time.perf_counter() - t0
        print(
            f"[serve] mode={self.mode} img={self.img} batch={self.batch} "
            f"compile {compile_s:.1f}s, warm batch {step_s * 1e3:.1f} ms "
            f"({self.batch / max(step_s, 1e-9):.0f} img/s)",
            file=sys.stderr, flush=True,
        )

    def _decode(self, path: str) -> np.ndarray:
        from PIL import Image

        with Image.open(path) as img:
            return self.pipeline(img.convert("RGB"))

    def infer(self, paths):
        """Forward a (possibly short) list of paths; returns one result
        dict per input, in order. A path that fails to decode yields an
        ``{"path", "error"}`` record — one bad request must not take down
        the batch (or, in --stdin mode, the server)."""
        import jax

        good, records = [], [None] * len(paths)
        x = np.zeros((self.batch, self.img, self.img, 3), np.float32)
        for i, p in enumerate(paths):
            try:
                x[len(good)] = self._decode(p)
                good.append(i)
            except Exception as e:
                records[i] = {"path": str(p),
                              "error": f"{type(e).__name__}: {e}"}
        if good:
            out = np.asarray(
                jax.device_get(self.fn(self.params, x)), np.float32
            )[: len(good)]
            for row, i in enumerate(good):
                records[i] = self._format(paths[i], out[row])
        return records

    def _format(self, path, out_row):
        if self.classifier:
            z = out_row - out_row.max()
            e = np.exp(z)
            probs = e / e.sum()
            return {"path": str(path), "pred": int(out_row.argmax()),
                    "prob": round(float(probs.max()), 6)}
        if not self.embedding_values:
            return {"path": str(path),
                    "embedding_norm": round(float(np.linalg.norm(out_row)), 6)}
        return {"path": str(path),
                "embedding": [round(float(v), 6) for v in out_row]}


def run_stdin_server(server: Server, sink, max_wait_ms: float,
                     stdin=None):
    """Micro-batching loop: flush when the batch fills, when the oldest
    queued request has waited ``max_wait_ms``, or at EOF.

    Reads the fd UNBUFFERED (``os.read`` + manual line assembly): mixing
    ``select()`` with buffered ``readline()`` deadlocks when a client
    writes several lines in one chunk — readline drains the kernel fd
    into the userspace buffer, returns one line, and the next select
    blocks on an empty fd while complete lines sit unread in the buffer.
    """
    fd = (stdin if stdin is not None else sys.stdin).fileno()
    pending: list = []
    oldest = None
    buf = b""
    eof = False

    def flush():
        nonlocal pending, oldest
        if pending:
            for rec in server.infer(pending):
                sink.write(json.dumps(rec) + "\n")
            sink.flush()
            pending, oldest = [], None

    while True:
        # drain complete lines already assembled before selecting
        while b"\n" in buf:
            line, buf = buf.split(b"\n", 1)
            path = line.decode().strip()
            if path:
                pending.append(path)
                oldest = oldest if oldest is not None else time.monotonic()
            if len(pending) >= server.batch:
                flush()
        if eof:
            tail = buf.decode().strip()  # final line without a newline
            if tail:
                pending.append(tail)
            flush()
            return
        timeout = None
        if oldest is not None:
            timeout = max(0.0, max_wait_ms / 1e3 - (time.monotonic() - oldest))
        ready, _, _ = select.select([fd], [], [], timeout)
        if not ready:
            flush()  # oldest request hit its latency budget
            continue
        chunk = os.read(fd, 65536)
        if not chunk:
            eof = True
            continue
        buf += chunk


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

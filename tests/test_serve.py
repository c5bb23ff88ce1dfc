"""Serving CLI (scripts/serve.py): checkpoint -> batched jitted inference.

No reference counterpart (SURVEY.md §2.6: the reference has no serving
surface); covers the static-shape padding contract, classifier and
embedding outputs, and the stdin micro-batching loop.
"""

import importlib.util
import json
import os
import time
import sys
from pathlib import Path

import pytest

from make_synthetic_data import make

import train as train_cli

_SPEC = importlib.util.spec_from_file_location(
    "serve", Path(__file__).resolve().parent.parent / "scripts" / "serve.py"
)
serve = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(serve)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    data = make(str(root / "data"), n=24, size=32, num_classes=3)
    run_dir = str(root / "run")
    train_cli.main(
        [
            "--config-name", "supervised",
            f"data.data_dir={data}/train_images",
            f"data.data_csv={data}/train_labels.json",
            "model.num_classes=3",
            "data.img_size=16",
            "data.num_workers=0",
            "model.embed_dim=32",
            "model.num_heads=4",
            "model.num_blocks=1",
            "model.mlp_dim=64",
            "model.patch_size=8",
            "model.use_flash_attention=false",
            "training.num_epochs=1",
            "training.batch_size=8",
            "training.warmup_epochs=1",
            "training.plain_logging=true",
            "eval.interval=0",
            f"hydra.run.dir={run_dir}",
        ]
    )
    images = sorted(str(p) for p in Path(f"{data}/train_images").glob("*.png"))
    return os.path.join(run_dir, "best_model"), images


def test_one_shot_classifier(trained, tmp_path):
    ckpt, images = trained
    out = tmp_path / "preds.jsonl"
    serve.main(
        ["--checkpoint", ckpt, "--batch-size", "4",
         "--output", str(out), *images[:6]]
    )
    recs = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(recs) == 6  # 4-batch + padded 2-batch, pad rows dropped
    for rec, path in zip(recs, images[:6]):
        assert rec["path"] == path
        assert 0 <= rec["pred"] <= 2
        assert 0.0 < rec["prob"] <= 1.0


def test_short_batch_matches_full_batch(trained):
    """Zero-padding must not change real rows' outputs."""
    ckpt, images = trained
    server = serve.Server(ckpt, batch_size=4)
    full = server.infer(images[:4])
    short = server.infer(images[:2])
    assert [r["pred"] for r in short] == [r["pred"] for r in full[:2]]
    assert [r["prob"] for r in short] == pytest.approx(
        [r["prob"] for r in full[:2]]
    )


def test_stdin_microbatching(trained, tmp_path, monkeypatch):
    ckpt, images = trained
    server = serve.Server(ckpt, batch_size=4)
    r, w = os.pipe()
    os.write(w, ("\n".join(images[:6]) + "\n").encode())
    os.close(w)
    monkeypatch.setattr(sys, "stdin", os.fdopen(r))
    out = tmp_path / "preds.jsonl"
    with open(out, "w") as sink:
        serve.run_stdin_server(server, sink, max_wait_ms=50.0)
    recs = [json.loads(l) for l in out.read_text().splitlines()]
    # one full 4-batch flush + one EOF flush of the remaining 2, in order
    assert [r["path"] for r in recs] == images[:6]


def test_stdin_multiline_chunk_with_open_writer(trained, tmp_path):
    """A client that writes several lines in ONE chunk and keeps the pipe
    open must still get every response (buffered readline + select
    deadlocks here; the server reads the fd unbuffered)."""
    import io
    import threading

    ckpt, images = trained
    server = serve.Server(ckpt, batch_size=4)
    r, w = os.pipe()
    sink = io.StringIO()
    stdin = os.fdopen(r)
    t = threading.Thread(
        target=serve.run_stdin_server,
        args=(server, sink, 50.0), kwargs={"stdin": stdin}, daemon=True,
    )
    t.start()
    # 2 lines (< batch) in one chunk, writer stays open: must flush via
    # the max-wait timeout, not EOF
    os.write(w, ("\n".join(images[:2]) + "\n").encode())
    deadline = time.time() + 10
    while time.time() < deadline:
        if len(sink.getvalue().splitlines()) >= 2:
            break
        time.sleep(0.05)
    recs = [json.loads(l) for l in sink.getvalue().splitlines()]
    assert [rec["path"] for rec in recs] == images[:2]
    os.close(w)
    t.join(timeout=10)
    assert not t.is_alive()


def test_bad_path_yields_error_record(trained):
    """One undecodable input produces an error record, not a crash, and
    the rest of the batch still gets real results."""
    ckpt, images = trained
    server = serve.Server(ckpt, batch_size=4)
    recs = server.infer([images[0], "/nonexistent/x.png", images[1]])
    assert recs[0]["pred"] == server.infer([images[0]])[0]["pred"]
    assert "error" in recs[1] and "pred" not in recs[1]
    assert recs[2]["pred"] == server.infer([images[1]])[0]["pred"]

#!/usr/bin/env python
"""Export a framework checkpoint to a reference-compatible torch ``.pth``.

Completes the two-way migration story: the reference's own evaluators,
visualizers, and ``torch.load`` consumers can read models trained here
(`vit_ssl_tpu/utils/checkpoint.py` import/export pairs are round-trip
tested against the reference modules with ``strict=True``).

Usage:
    python scripts/export_torch.py <run_dir>/best_model out.pth
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint", help="framework checkpoint dir (best_model/last_model)")
    ap.add_argument("output", help="output .pth path")
    args = ap.parse_args(argv)

    from vit_ssl_tpu.utils.checkpoint import (
        checkpoint_exists,
        dino_params_to_torch,
        load_checkpoint,
        save_torch_checkpoint,
        simmim_params_to_torch,
        vit_params_to_torch,
    )

    if not checkpoint_exists(args.checkpoint):
        raise SystemExit(f"No checkpoint at {args.checkpoint}")
    tree, meta = load_checkpoint(args.checkpoint)
    mode = str(meta.get("mode", "")).lower()
    params = tree["params"]

    if mode in ("dino", "eval_dino") or tree.get("teacher_params") is not None:
        sd = dino_params_to_torch(params, tree["teacher_params"], tree["center"])
    elif mode == "simmim" or "mask_token" in params:
        sd = simmim_params_to_torch(params)
    else:
        sd = vit_params_to_torch(params)

    metadata = {
        "epoch": meta.get("epoch", 0),
        "config": meta.get("config", {}),
    }
    save_torch_checkpoint(args.output, sd, metadata)
    print(f"Exported {mode or 'vit'} checkpoint -> {args.output} "
          f"({len(sd)} tensors)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Attention-map visualizer for supervised ViTs.

Parity with `/root/reference/scripts/supervised_visualizer.py`: forward with
``return_attn=True``, take the CLS row of the last block's attention
averaged over heads, reshape to the patch grid, resize to image size (cv2),
and overlay a viridis heatmap with the predicted class caption.

    python scripts/attention_visualizer.py --checkpoint <run_dir>/best_model \
        --image photo.png [--output attention.png]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import cv2
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def load_model_from_checkpoint(checkpoint_path: str):
    from vit_ssl_tpu.config import from_container
    from vit_ssl_tpu.models.builder import build_model
    from vit_ssl_tpu.utils.checkpoint import load_checkpoint

    tree, metadata = load_checkpoint(checkpoint_path)
    config = from_container(metadata["config"])
    bundle = build_model(config)
    return bundle, tree["params"], config


def process_attention(attn: np.ndarray, img_size: int, patch: int) -> np.ndarray:
    """CLS-row attention (`supervised_visualizer.py:105-162` parity):
    average heads, drop the CLS column, reshape to the patch grid, resize."""
    # attn: (1, heads, N+1, N+1)
    cls_row = attn[0, :, 0, 1:].mean(axis=0)  # (N,)
    grid = img_size // patch
    heat = cls_row.reshape(grid, grid)
    heat = cv2.resize(heat, (img_size, img_size), interpolation=cv2.INTER_CUBIC)
    heat = (heat - heat.min()) / (heat.max() - heat.min() + 1e-8)
    return heat


def visualize(bundle, params, config, image_path: str, output_path: str):
    import jax.numpy as jnp
    from PIL import Image

    from vit_ssl_tpu.data.transforms import Compose, Resize, ToTensor

    img_size = int(config["data"]["img_size"])
    patch = int(config["model"]["patch_size"])

    pipeline = Compose([Resize([img_size, img_size]), ToTensor()])
    image = pipeline(Image.open(image_path).convert("RGB"), np.random.default_rng(0))
    x = jnp.asarray(image)[None]

    logits, attn = bundle.module.apply({"params": params}, x, return_attn=True)
    pred_class = int(np.argmax(np.asarray(logits)[0]))
    heat = process_attention(np.asarray(attn, dtype=np.float32), img_size, patch)

    fig, axes = plt.subplots(1, 2, figsize=(10, 5))
    axes[0].imshow(image)
    axes[0].set_title("Input")
    axes[0].axis("off")
    axes[1].imshow(image)
    axes[1].imshow(heat, cmap="viridis", alpha=0.5)
    axes[1].set_title(f"CLS attention — predicted class {pred_class}")
    axes[1].axis("off")
    fig.tight_layout()
    fig.savefig(output_path, dpi=130, bbox_inches="tight")
    plt.close(fig)
    print(f"saved {output_path}")
    return pred_class, heat


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--image", required=True)
    parser.add_argument("--output", default="attention_overlay.png")
    args = parser.parse_args(argv)

    bundle, params, config = load_model_from_checkpoint(args.checkpoint)
    visualize(bundle, params, config, args.image, args.output)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""SimMIM reconstruction visualizer.

Parity with `/root/reference/scripts/simmim_visualizer.py`: rebuilds the
model from the config embedded in the checkpoint, runs a masked forward on
one image, and renders an original / masked / reconstruction triptych with
the predicted patches pasted into the masked grid positions.

    python scripts/simmim_visualizer.py --checkpoint <run_dir>/best_model \
        --image photo.png [--output recon.png] [--seed 0]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def load_model_from_checkpoint(checkpoint_path: str):
    """Rebuild the SimMIM model from the checkpoint-embedded config
    (`simmim_visualizer.py:51-75` parity)."""
    from vit_ssl_tpu.config import from_container
    from vit_ssl_tpu.models.builder import build_model
    from vit_ssl_tpu.utils.checkpoint import load_checkpoint

    tree, metadata = load_checkpoint(checkpoint_path)
    config = from_container(metadata["config"])
    bundle = build_model(config)
    return bundle, tree["params"], config


def visualize_simmim_reconstruction(bundle, params, config, image_path, output_path, seed=0):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from vit_ssl_tpu.data.transforms import Compose, Resize, ToTensor
    from vit_ssl_tpu.ops import extract_patches, patches_to_image

    img_size = int(config["data"]["img_size"])
    patch = int(config["model"]["patch_size"])
    channels = int(config["model"]["in_channels"])

    pipeline = Compose([Resize([img_size, img_size]), ToTensor()])
    image = pipeline(Image.open(image_path).convert("RGB"), np.random.default_rng(seed))
    x = jnp.asarray(image)[None]  # (1, H, W, C)

    preds, targets, mask = bundle.module.apply(
        {"params": params}, x, rngs={"mask": jax.random.PRNGKey(seed)}
    )
    preds = np.clip(np.asarray(preds, dtype=np.float32), 0, 1)
    mask = np.asarray(mask)[0]  # (N,)

    # masked view: masked patches replaced with mid-gray
    patches = np.asarray(extract_patches(x, patch), dtype=np.float32)
    masked_patches = patches.copy()
    masked_patches[0, mask] = 0.5
    masked_img = np.asarray(
        patches_to_image(jnp.asarray(masked_patches), (img_size, img_size), patch, channels)
    )[0]

    # reconstruction: predicted pixels pasted into the masked positions
    recon_patches = patches.copy()
    recon_patches[0, mask] = preds[0, mask]
    recon_img = np.asarray(
        patches_to_image(jnp.asarray(recon_patches), (img_size, img_size), patch, channels)
    )[0]

    fig, axes = plt.subplots(1, 3, figsize=(13, 5))
    for ax, (img, title) in zip(
        axes,
        [(image, "Original"), (masked_img, "Masked"), (recon_img, "Reconstruction")],
    ):
        ax.imshow(np.clip(img, 0, 1))
        ax.set_title(title)
        ax.axis("off")
    fig.suptitle(f"SimMIM reconstruction (mask ratio {float(config['model']['mask_ratio']):.2f})")
    fig.tight_layout()
    fig.savefig(output_path, dpi=130, bbox_inches="tight")
    plt.close(fig)
    print(f"saved {output_path}")
    return output_path


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--image", required=True)
    parser.add_argument("--output", default="simmim_reconstruction.png")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    bundle, params, config = load_model_from_checkpoint(args.checkpoint)
    visualize_simmim_reconstruction(
        bundle, params, config, args.image, args.output, args.seed
    )


if __name__ == "__main__":
    main()

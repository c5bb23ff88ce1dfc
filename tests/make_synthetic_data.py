"""Generate a tiny synthetic dataset in the reference's on-disk layouts.

STL10 layout (`/root/reference/data/datasets.py:35-123`):
  <root>/train_images/*.png + <root>/train_labels.json  (labeled)
  <root>/unlabeled_images/*.png                          (unsupervised/DINO)
CIFAR10 layout (`datasets.py:11-32`):
  <root>/cifar_images/<stem>.png + <root>/cifar_labels.csv

Images are class-coloured noise so that even tiny models can overfit and
KNN/linear-probe evaluators produce non-trivial accuracies.

Usage: python tests/make_synthetic_data.py [root] [--n 48] [--size 64]
"""

import argparse
import json
import os
import sys

import numpy as np
from PIL import Image

CLASSES = ["airplane", "bird", "car", "cat"]


def make(root: str, n: int = 48, size: int = 64, num_classes: int = 4, seed: int = 0):
    rng = np.random.default_rng(seed)
    classes = CLASSES[:num_classes]
    os.makedirs(os.path.join(root, "train_images"), exist_ok=True)
    os.makedirs(os.path.join(root, "unlabeled_images"), exist_ok=True)
    os.makedirs(os.path.join(root, "cifar_images"), exist_ok=True)

    records = []
    csv_rows = ["id,label"]
    for i in range(n):
        cls = i % len(classes)
        base = np.zeros((size, size, 3), dtype=np.float32)
        base[..., cls % 3] = 160 + 40 * ((cls // 3) % 2)
        noise = rng.normal(0, 30, (size, size, 3))
        arr = np.clip(base + noise, 0, 255).astype(np.uint8)
        img = Image.fromarray(arr)

        name = f"img_{i:04d}.png"
        img.save(os.path.join(root, "train_images", name))
        img.save(os.path.join(root, "unlabeled_images", name))
        records.append([f"train_images/{name}", classes[cls]])

        stem = f"cifar_{i:04d}"
        img.save(os.path.join(root, "cifar_images", f"{stem}.png"))
        csv_rows.append(f"{stem},{classes[cls]}")

    with open(os.path.join(root, "train_labels.json"), "w") as f:
        json.dump(records, f)
    with open(os.path.join(root, "cifar_labels.csv"), "w") as f:
        f.write("\n".join(csv_rows) + "\n")
    return root


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("root", nargs="?", default="/tmp/vit_ssl_synth")
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--classes", type=int, default=4)
    args = ap.parse_args()
    path = make(args.root, args.n, args.size, args.classes)
    print(f"synthetic dataset written to {path}", file=sys.stderr)
    print(path)

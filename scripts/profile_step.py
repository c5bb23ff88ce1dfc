#!/usr/bin/env python
"""Op-level profile of one compiled train step.

Captures a ``jax.profiler`` trace of a few train steps for a mode
(dino / supervised / simmim, at the same reference configs ``bench.py``
measures) and prints a device-time breakdown aggregated by op, parsed
programmatically via ``jax.profiler.ProfileData`` — no TensorBoard needed.

The reference has no profiling at all (SURVEY.md §5 "Tracing/profiling:
absent"); in-training tracing lives in ``trainers/base.py`` — this script
is the standalone where-does-the-step-go view for kernel work.

Usage:
  python scripts/profile_step.py --mode dino --batch 128 [--steps 6]
  python scripts/profile_step.py --mode supervised --top 40
"""

from __future__ import annotations

import argparse
import sys
import threading
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_step(mode: str, batch: int, use_flash: bool = True):
    """(state, step_once) for a mode at bench.py's reference config."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import bench
    from vit_ssl_tpu.train.state import create_train_state

    jax.config.update("jax_default_prng_impl", "rbg")

    if mode in ("supervised", "simmim"):
        from vit_ssl_tpu.models import SimMIMViT, ViT
        from vit_ssl_tpu.train.steps import (
            make_simmim_steps,
            make_supervised_steps,
        )

        rs = np.random.RandomState(0)
        img = 192
        common = bench._model_common(use_flash, img)
        tx = optax.adamw(1e-4, weight_decay=1e-3)
        image = jax.device_put(
            (rs.rand(batch, img, img, 3) * 255).astype(np.uint8)
        )
        weight = jax.device_put(np.ones(batch, np.float32))
        if mode == "supervised":
            model = ViT(num_classes=10, **common)
            params = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3))
            )["params"]
            state = create_train_state(params, tx, jax.random.PRNGKey(1))
            step, _ = make_supervised_steps(model, tx, donate=False)
            b = {
                "image": image,
                "label": jax.device_put(
                    rs.randint(0, 10, batch).astype(np.int32)
                ),
                "weight": weight,
            }
        else:
            model = SimMIMViT(mask_ratio=0.5, **common)
            variables = model.init(
                {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
                jnp.zeros((1, img, img, 3)),
            )
            state = create_train_state(
                variables["params"], tx, jax.random.PRNGKey(2)
            )
            step, _ = make_simmim_steps(
                model, tx, patch_size=16, channels=3, donate=False
            )
            b = {"image": image, "weight": weight}

        def step_once(s):
            s2, out = step(s, b)
            return s2, out["loss"]

        return state, step_once

    if mode != "dino":
        raise ValueError(f"unknown mode '{mode}'")

    from vit_ssl_tpu.data.device_augment import make_multicrop_fn
    from vit_ssl_tpu.models import DINONetwork
    from vit_ssl_tpu.parallel import create_mesh, replicate, shard_batch
    from vit_ssl_tpu.train.steps import make_dino_steps

    cfg = bench.VIT_S
    model = DINONetwork(
        num_blocks=cfg["num_blocks"],
        input_shape=(3, cfg["img"], cfg["img"]),
        embed_dim=cfg["embed_dim"],
        patch_size=cfg["patch"],
        num_heads=cfg["num_heads"],
        mlp_dim=cfg["mlp_dim"],
        dropout=0.1,
        output_dim=cfg["output_dim"],
        dtype=jnp.bfloat16,
        use_flash=use_flash and jax.default_backend() == "tpu",
        use_fused_mlp=False,
    )
    rng = jax.random.PRNGKey(0)
    mesh = create_mesh(-1)
    dummy = jnp.zeros((1, cfg["img"], cfg["img"], 3))
    student = model.init(rng, dummy)["params"]
    teacher = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), student)
    center = jnp.zeros((1, cfg["output_dim"]), jnp.float32)
    tx = optax.adamw(1e-4, weight_decay=1e-3)
    state = create_train_state(
        student, tx, rng, teacher_params=teacher, center=center
    )
    state = replicate(state, mesh)

    g_seq = [
        {"name": "RandomResizedCrop",
         "params": {"size": cfg["img"], "scale": [0.5, 1.0]}},
        {"name": "RandomHorizontalFlip", "params": {}},
        {"name": "ColorJitter",
         "params": {"brightness": 0.4, "contrast": 0.4, "saturation": 0.2,
                    "hue": 0.1}},
        {"name": "RandomGrayscale", "params": {"p": 0.2}},
        {"name": "GaussianBlur",
         "params": {"kernel_size": 7, "sigma": [0.1, 2.0]}},
        {"name": "ToTensor"},
    ]
    l_seq = [
        {"name": "RandomResizedCrop",
         "params": {"size": cfg["local_img"], "scale": [0.08, 0.4]}},
        {"name": "RandomHorizontalFlip", "params": {}},
        {"name": "ColorJitter",
         "params": {"brightness": 0.4, "contrast": 0.4, "saturation": 0.2,
                    "hue": 0.1}},
        {"name": "GaussianBlur",
         "params": {"kernel_size": 7, "sigma": [0.1, 2.0]}},
        {"name": "ToTensor"},
    ]
    view_fn = make_multicrop_fn(g_seq, l_seq, cfg["ng"], cfg["na"])
    train_step, _ = make_dino_steps(
        model, tx, num_global_views=cfg["ng"], num_all_views=cfg["na"],
        student_temp=0.1, center_momentum=0.9, view_fn=view_fn, donate=False,
    )
    rs = np.random.RandomState(0)
    images = (rs.rand(batch, cfg["img"], cfg["img"], 3) * 255).astype(np.uint8)
    batch_dict = shard_batch(
        {"image": images, "weight": np.ones((batch,), np.float32)}, mesh
    )
    t_temp, t_mom = jnp.float32(0.04), jnp.float32(0.996)

    def step_once(s):
        s2, out = train_step(s, batch_dict, t_temp, t_mom)
        return s2, out["loss"]

    return state, step_once


def summarize(trace_dir: Path, top: int) -> None:
    """Aggregate device-plane op durations from the captured xplane."""
    from jax.profiler import ProfileData

    protos = sorted(trace_dir.rglob("*.xplane.pb"))
    if not protos:
        print(f"no .xplane.pb under {trace_dir}", file=sys.stderr)
        return
    data = ProfileData.from_file(str(protos[-1]))
    for plane in data.planes:
        if "TPU" not in plane.name and "/device" not in plane.name:
            continue
        per_line = {}
        for line in plane.lines:
            agg = defaultdict(lambda: [0, 0])  # name -> [ns, count]
            for ev in line.events:
                a = agg[ev.name]
                a[0] += ev.duration_ns
                a[1] += 1
            if agg:
                per_line[line.name] = agg
        # "XLA Ops" carries per-op device time; fall back to the busiest line
        line_name = None
        for cand in per_line:
            if "XLA Ops" in cand:
                line_name = cand
                break
        if line_name is None and per_line:
            line_name = max(
                per_line, key=lambda k: sum(v[0] for v in per_line[k].values())
            )
        if line_name is None:
            continue
        agg = per_line[line_name]
        total = sum(v[0] for v in agg.values())
        print(f"\n=== plane {plane.name} / line '{line_name}' "
              f"(total {total/1e6:.2f} ms across trace) ===")
        print(f"{'ms':>9} {'%':>6} {'count':>6}  op")
        for name, (ns, cnt) in sorted(
            agg.items(), key=lambda kv: -kv[1][0]
        )[:top]:
            print(f"{ns/1e6:9.3f} {100*ns/total:6.2f} {cnt:6d}  {name[:110]}")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--mode", default="dino",
                        choices=["dino", "supervised", "simmim"])
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--steps", type=int, default=6)
    parser.add_argument("--top", type=int, default=30)
    parser.add_argument("--no-flash", action="store_true")
    parser.add_argument("--outdir", default="/tmp/step_profile")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    # overlap the axon tunnel's one-time device->host channel init
    threading.Thread(
        target=lambda: float(jnp.zeros(())), daemon=True
    ).start()
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    state, step_once = build_step(args.mode, args.batch,
                                  use_flash=not args.no_flash)
    t0 = time.perf_counter()
    state, loss = step_once(state)  # compile
    float(loss)
    print(f"compile+warm: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    for _ in range(2):
        state, loss = step_once(state)
    float(loss)

    trace_dir = Path(args.outdir) / args.mode
    with jax.profiler.trace(str(trace_dir)):
        for _ in range(args.steps):
            state, loss = step_once(state)
        float(loss)
    summarize(trace_dir, args.top)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark: DINO ViT-S multi-crop pretrain throughput (images/sec/chip).

Measures our fully-compiled DINO train step at the reference's shipped
config (`/root/reference/configs/dino/*.yaml`: ViT-S d=384, 6 blocks,
patch 8, 96px globals / 48px locals, 6 views, output_dim 16384, batch 128)
on the available accelerator, and the PyTorch reference's eager train-step
on CPU (the baseline hardware — the reference has no TPU path), by
importing the read-only reference package as the oracle when present.

Honest denominators (VERDICT r1 weakness 3): per mode the bench reports
ms/step, analytic FLOPs, MFU vs the v5e bf16 peak, and the same step with
``use_flash=false`` (pure-XLA kernels) so a kernel regression is visible
as ``vs_xla`` < 1 regardless of how large ``vs_baseline`` is.

Prints the cumulative result JSON line after EVERY completed leg (marked
``"partial": true`` until the run finishes) so a timeout still leaves a
parseable record; the final line is:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N,
   "ms_per_step": N, "mfu": N, "vs_xla": N, "modes": {...}}

Leg order: dino + dino_xla first (the headline), then supervised/simmim,
then ablation + inference — optional legs are dropped when the remaining
``--budget-seconds`` can't fit them (listed in ``skipped_legs``).

Usage: python bench.py [--quick] [--batch 128] [--budget-seconds 1260]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

REFERENCE_PATH = "/root/reference"

VIT_S = dict(
    embed_dim=384, num_blocks=6, num_heads=6, mlp_dim=1536,
    patch=8, img=96, local_img=48, output_dim=16384, ng=2, na=6,
)

# Encoder widths for --variant (supervised/simmim step benchmarks at
# production scales; vit_s matches the reference's 6-block model).
VARIANTS = {
    "vit_s": dict(embed_dim=384, num_blocks=6, num_heads=6, mlp_dim=1536),
    "vit_b": dict(embed_dim=768, num_blocks=12, num_heads=12, mlp_dim=3072),
    "vit_l": dict(embed_dim=1024, num_blocks=24, num_heads=16, mlp_dim=4096),
}

# TPU v5e (v5 lite) peak: 197 TFLOP/s bf16 per chip (public spec).
PEAK_FLOPS = {"tpu": 197e12}


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def peak_flops() -> float:
    import jax

    return PEAK_FLOPS.get(jax.default_backend(), float("nan"))


# ---------------------------------------------------------------------------
# Analytic FLOPs (2·MACs convention; LN/softmax/elementwise ignored — they
# are <2% of a ViT's FLOPs at these widths)
# ---------------------------------------------------------------------------


def vit_fwd_flops(batch: int, seq: int, depth: int, d: int, d_ff: int,
                  patch_dim: int) -> float:
    """One forward pass of a ViT encoder stack over `batch` sequences."""
    embed = 2 * batch * seq * patch_dim * d
    per_layer = (
        2 * batch * seq * d * (4 * d)        # q/k/v/out projections
        + 2 * batch * seq * seq * d * 2      # scores + context
        + 2 * batch * seq * d * d_ff * 2     # MLP up + down
    )
    return embed + depth * per_layer


def dino_head_fwd_flops(batch: int, d: int, hidden: int, out: int) -> float:
    return 2 * batch * (d * hidden + hidden * hidden + hidden * d + d * out)


def dino_step_flops(batch: int, cfg=VIT_S) -> float:
    """Analytic FLOPs of one DINO train step (student fwd+bwd on all
    views, teacher fwd on globals; bwd ≈ 2× fwd)."""
    d, depth, d_ff = cfg["embed_dim"], cfg["num_blocks"], cfg["mlp_dim"]
    p = cfg["patch"]
    seq_g = (cfg["img"] // p) ** 2 + 1
    seq_l = (cfg["local_img"] // p) ** 2 + 1
    ng, nl = cfg["ng"], cfg["na"] - cfg["ng"]
    patch_dim = 3 * p * p

    def net_fwd(b, seq):
        return vit_fwd_flops(b, seq, depth, d, d_ff, patch_dim) + \
            dino_head_fwd_flops(b, d, 2048, cfg["output_dim"])

    student = net_fwd(batch * ng, seq_g) + net_fwd(batch * nl, seq_l)
    teacher = net_fwd(batch * ng, seq_g)
    return 3 * student + teacher  # fwd + 2×fwd (bwd) + teacher fwd


def supervised_step_flops(batch: int, img: int = 192, patch: int = 16,
                          variant: str = "vit_s") -> float:
    v = VARIANTS[variant]
    seq = (img // patch) ** 2 + 1
    fwd = vit_fwd_flops(batch, seq, v["num_blocks"], v["embed_dim"],
                        v["mlp_dim"], 3 * patch * patch)
    return 3 * fwd


def moe_supervised_step_flops(batch: int, img: int, patch: int,
                              variant: str, experts: int, top_k: int = 2,
                              cf: float = 1.25, every: int = 2,
                              group: int = 0) -> float:
    """Supervised step FLOPs with every ``every``-th block's FFN replaced
    by a routed MoE (ops/moe.py): router + GShard dispatch/combine
    einsums + the batched expert matmuls (padded to capacity — real MXU
    work, so it belongs in the MFU denominator)."""
    from vit_ssl_tpu.ops.moe import expert_capacity

    v = VARIANTS[variant]
    seq = (img // patch) ** 2 + 1
    d, f, depth = v["embed_dim"], v["mlp_dim"], v["num_blocks"]
    t = batch * seq
    tg = group if group > 0 else t
    if t % tg != 0:
        raise ValueError(f"group={tg} must divide the token count {t}")
    g = t // tg
    c = expert_capacity(tg, experts, top_k, cf)
    n_moe = sum(1 for i in range(depth) if (i + 1) % max(1, every) == 0)
    router = 2 * t * d * experts
    dispatch = 4 * t * experts * c * d          # dispatch + combine einsums
    expert_mm = 4 * g * experts * c * d * f     # up + down, padded slots
    dense_mlp = 4 * t * d * f                   # what the MoE replaces
    fwd = vit_fwd_flops(batch, seq, depth, d, f, 3 * patch * patch)
    fwd += n_moe * (router + dispatch + expert_mm - dense_mlp)
    return 3 * fwd


def simmim_step_flops(batch: int, img: int = 192, patch: int = 16,
                      variant: str = "vit_s") -> float:
    v = VARIANTS[variant]
    seq = (img // patch) ** 2
    fwd = vit_fwd_flops(batch, seq, v["num_blocks"], v["embed_dim"],
                        v["mlp_dim"], 3 * patch * patch)
    head = 2 * batch * seq * v["embed_dim"] * (3 * patch * patch)
    return 3 * (fwd + head)


# ---------------------------------------------------------------------------
# Step benchmarks
# ---------------------------------------------------------------------------


def measure_steps(step_once, state, reps: int, outer: int,
                  cost_out: dict | None = None) -> float:
    """Seconds per step, measured robustly against the axon tunnel.

    ``block_until_ready`` through the tunnel can return before the work is
    done (observed: supervised 'steps' of 0.9 ms = 7x over peak MFU before
    the device→host channel is initialised), so timing uses (a) ``reps``
    steps chained inside ONE jitted ``lax.scan`` — one dispatch, real
    data dependence — and (b) a scalar VALUE fetch as the barrier, with
    the fetch round-trip measured and subtracted.

    When ``cost_out`` is a dict, it receives ``xla_flops_per_step``: the
    compiler's own FLOP count from ``compile().cost_analysis()``. On this
    XLA, HloCostAnalysis counts a while/scan body ONCE regardless of trip
    count (verified on both the CPU and TPU backends: a 10-iteration scan
    of a 128³ matmul reports one matmul's flops), and the chunk's scan body
    is exactly one train step — so the module total ≈ one step's flops.
    Cross-checks the analytic FLOP model: XLA reads slightly HIGH vs
    analytic (it counts the elementwise/optimizer flops the analytic model
    ignores). Measured on the DINO ViT-S step: XLA 4.75 vs analytic 4.67
    TFLOP/step (+1.8%) on the pure-XLA leg, 4.80 on the Pallas-kernel leg
    (this XLA models Mosaic custom-call flops too).
    """
    import jax

    @jax.jit
    def run_chunk(s):
        def body(carry, _):
            carry, loss = step_once(carry)
            return carry, loss

        s, losses = jax.lax.scan(body, s, None, length=reps)
        return s, losses[-1]

    state, loss = run_chunk(state)  # compile + warm
    float(loss)
    if cost_out is not None:
        try:
            ca = run_chunk.lower(state).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            cost_out["xla_flops_per_step"] = float(ca["flops"])
        except Exception:
            pass  # backend without a cost model; field stays absent
    t0 = time.perf_counter()
    rtt = 0.0
    for _ in range(3):  # fetch round-trip of an already-computed scalar
        t = time.perf_counter()
        float(loss)
        rtt = max(rtt, time.perf_counter() - t)
    t0 = time.perf_counter()
    for _ in range(outer):
        state, loss = run_chunk(state)
    float(loss)
    dt = time.perf_counter() - t0 - rtt
    return max(dt, 1e-9) / (reps * outer)


def _attach_hbm(rec: dict, tag: str) -> None:
    """Record the peak HBM footprint of the leg just measured (the
    allocator's high-water mark is cumulative per process; legs run in
    ascending memory order so the attribution is still informative, and
    the absolute value bounds the largest leg so far)."""
    from vit_ssl_tpu.utils.memory import peak_hbm_gb

    peak = peak_hbm_gb()
    if peak is not None:
        rec["peak_hbm_gb"] = round(peak, 3)
        log(f"[{tag}] peak HBM {peak:.2f} GiB")


def _enable_compile_cache():
    """Persistent compile cache under /tmp: repeat runs (the driver
    re-runs this file after the builder's own measurements) skip the
    multi-minute remote Mosaic/XLA compiles — the first cold supervised
    leg alone cost ~25 min through the tunnel without it."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _model_common(use_flash: bool, img: int, variant: str = "vit_s",
                  remat: bool = False):
    import jax
    import jax.numpy as jnp

    return dict(
        input_shape=(3, img, img),
        patch_size=16, dropout=0.1,
        dtype=jnp.bfloat16,
        use_flash=use_flash and jax.default_backend() == "tpu",
        use_fused_mlp=False,
        remat=remat,
        **VARIANTS[variant],
    )


def bench_mode(mode: str, batch: int, warmup: int, iters: int,
               use_flash: bool = True, variant: str = "vit_s",
               img: int = 192, grad_accum: int = 1,
               remat: bool = False, moe_experts: int = 0) -> dict:
    """Step throughput for supervised/simmim; ``variant`` scales the
    encoder to ViT-B/L production widths (with optional grad accumulation
    and rematerialisation for shapes past one chip's HBM).
    ``moe_experts`` > 0 (supervised only) swaps every 2nd block's FFN for
    a top-2 routed MoE with per-image routing groups (ops/moe.py) —
    ~moe_experts× FFN parameters at top-k·cf× FFN FLOPs."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vit_ssl_tpu.models import SimMIMViT, ViT
    from vit_ssl_tpu.train.state import create_train_state
    from vit_ssl_tpu.train.steps import make_simmim_steps, make_supervised_steps

    jax.config.update("jax_default_prng_impl", "rbg")
    _enable_compile_cache()
    iters = max(iters, 10)  # short timing loops mis-measure on this tunnel
    rs = np.random.RandomState(0)
    patch = 16
    common = _model_common(use_flash, img, variant, remat)
    tx = optax.adamw(1e-4, weight_decay=1e-3)
    image = jax.device_put((rs.rand(batch, img, img, 3) * 255).astype(np.uint8))
    weight = jax.device_put(np.ones(batch, np.float32))

    if mode == "supervised":
        seq = (img // patch) ** 2 + 1
        moe_kw = {}
        if moe_experts > 0:
            moe_kw = dict(moe_experts=moe_experts, moe_every=2, moe_top_k=2,
                          moe_capacity_factor=1.25, moe_group_size=seq)
        model = ViT(num_classes=10, **common, **moe_kw)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3)))["params"]
        state = create_train_state(params, tx, jax.random.PRNGKey(1))
        step, _ = make_supervised_steps(model, tx, grad_accum=grad_accum)
        b = {"image": image, "label": jax.device_put(rs.randint(0, 10, batch).astype(np.int32)),
             "weight": weight}
        run = lambda s: step(s, b)  # noqa: E731
        if moe_experts > 0:
            flops = moe_supervised_step_flops(
                batch, img, patch, variant, moe_experts, group=seq)
        else:
            flops = supervised_step_flops(batch, img, patch, variant)
    elif mode == "simmim":
        model = SimMIMViT(mask_ratio=0.5, **common)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            jnp.zeros((1, img, img, 3)),
        )
        state = create_train_state(variables["params"], tx, jax.random.PRNGKey(2))
        step, _ = make_simmim_steps(model, tx, patch_size=patch, channels=3,
                                    grad_accum=grad_accum)
        b = {"image": image, "weight": weight}
        run = lambda s: step(s, b)  # noqa: E731
        flops = simmim_step_flops(batch, img, patch, variant)
    else:
        raise ValueError(mode)

    def step_once(s):
        s2, out = run(s)
        return s2, out["loss"]

    reps, outer = (10, 1) if iters <= 3 else (40, 2)
    cost: dict = {}
    sec = measure_steps(step_once, state, reps, outer, cost_out=cost)
    ms = sec * 1e3
    ips = batch / sec
    mfu = flops / sec / peak_flops()
    tag = f"ours/{mode}{'' if use_flash else '/xla'}"
    if variant != "vit_s":
        tag += f"/{variant}"
    if moe_experts > 0:
        tag += f"/moe{moe_experts}"
    log(f"[{tag}] {ips:.1f} img/s/chip, "
        f"{ms:.2f} ms/step, {flops/1e12:.2f} TFLOP/step, MFU {mfu:.1%}")
    rec = {"images_per_sec": ips, "ms_per_step": ms, "tflop_per_step": flops / 1e12,
           "mfu": mfu}
    if "xla_flops_per_step" in cost:
        rec["tflop_per_step_xla"] = cost["xla_flops_per_step"] / 1e12
        log(f"[{tag}] XLA cost analysis: {rec['tflop_per_step_xla']:.2f} "
            f"TFLOP/step (analytic {flops/1e12:.2f})")
    _attach_hbm(rec, tag)
    return rec


def bench_inference(batch: int, iters: int, use_flash: bool = True,
                    variant: str = "vit_s", img: int = 192) -> dict:
    """Serving-path throughput: deterministic (eval-mode) ViT forward,
    bf16, jitted — the classify/embed step `evaluate.py` and the KNN/
    linear CLIs run. Forward-only analytic FLOPs (no 3× train multiplier)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vit_ssl_tpu.models import ViT

    jax.config.update("jax_default_prng_impl", "rbg")
    _enable_compile_cache()
    patch = 16
    model = ViT(num_classes=10, **_model_common(use_flash, img, variant))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3)))["params"]
    rs = np.random.RandomState(0)
    image = jax.device_put(
        (rs.rand(batch, img, img, 3).astype(np.float32) - 0.5) * 2
    ).astype(jnp.bfloat16)

    def step_once(carry):
        # params ride the carry: closed-over trees become HLO constants,
        # and at ViT-B size the remote-compile request body rejects them
        p, x, acc = carry
        logits = model.apply({"params": p}, x, deterministic=True)
        s = jnp.sum(logits).astype(jnp.float32)
        # chain reps with a value dependence that is exactly zero
        x = x + (0.0 * s).astype(x.dtype)
        return (p, x, acc + s), s

    cost: dict = {}
    sec = measure_steps(step_once, (params, image, jnp.float32(0.0)),
                        *((10, 1) if iters <= 3 else (40, 2)), cost_out=cost)
    ms = sec * 1e3
    ips = batch / sec
    v = VARIANTS[variant]
    seq = (img // patch) ** 2 + 1
    flops = vit_fwd_flops(batch, seq, v["num_blocks"], v["embed_dim"],
                          v["mlp_dim"], 3 * patch * patch)
    mfu = flops / sec / peak_flops()
    tag = f"ours/infer/{variant}{'' if use_flash else '/xla'}"
    log(f"[{tag}] {ips:.1f} img/s/chip, {ms:.2f} ms/batch, "
        f"{flops/1e12:.3f} TFLOP/batch, MFU {mfu:.1%}")
    rec = {"images_per_sec": ips, "ms_per_step": ms,
           "tflop_per_step": flops / 1e12, "mfu": mfu}
    if "xla_flops_per_step" in cost:
        rec["tflop_per_step_xla"] = cost["xla_flops_per_step"] / 1e12
        log(f"[{tag}] XLA cost analysis: {rec['tflop_per_step_xla']:.3f} "
            f"TFLOP/batch (analytic {flops/1e12:.3f})")
    _attach_hbm(rec, tag)
    return rec


def bench_ours(batch: int, warmup: int, iters: int, use_flash: bool = True,
               variant: str = "vit_s", grad_accum: int = 1,
               remat: bool = False, dropout: float = 0.1,
               teacher_dropout: bool = True,
               pack_locals: bool = False) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vit_ssl_tpu.models import DINONetwork
    from vit_ssl_tpu.parallel import create_mesh, replicate, shard_batch
    from vit_ssl_tpu.train.state import create_train_state
    from vit_ssl_tpu.train.steps import make_dino_steps

    cfg = dict(VIT_S)
    cfg.update(VARIANTS[variant])
    jax.config.update("jax_default_prng_impl", "rbg")
    _enable_compile_cache()
    log(f"[ours] backend={jax.default_backend()} devices={jax.device_count()}")

    # The axon tunnel pays a ~6-minute one-time device->host channel
    # initialisation on the first transfer; trigger it now on a background
    # thread so it overlaps compilation instead of stalling the first
    # metric fetch.
    d2h_warmup = threading.Thread(
        target=lambda: float(jnp.zeros(())), daemon=True
    )
    d2h_warmup.start()

    model = DINONetwork(
        num_blocks=cfg["num_blocks"],
        input_shape=(3, cfg["img"], cfg["img"]),
        embed_dim=cfg["embed_dim"],
        patch_size=cfg["patch"],
        num_heads=cfg["num_heads"],
        mlp_dim=cfg["mlp_dim"],
        dropout=dropout,
        output_dim=cfg["output_dim"],
        dtype=jnp.bfloat16,
        use_flash=use_flash and jax.default_backend() == "tpu",
        use_fused_mlp=False,
        remat=remat,
    )
    rng = jax.random.PRNGKey(0)
    mesh = create_mesh(-1)
    dummy = jnp.zeros((1, cfg["img"], cfg["img"], 3))
    student = model.init(rng, dummy)["params"]
    teacher = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), student)
    center = jnp.zeros((1, cfg["output_dim"]), jnp.float32)
    tx = optax.adamw(1e-4, weight_decay=1e-3)
    state = create_train_state(student, tx, rng, teacher_params=teacher, center=center)
    state = replicate(state, mesh)

    # production input path: device-side multi-crop augmentation from one
    # uint8 image tensor per batch (configs/dino/data.yaml device_augment)
    from vit_ssl_tpu.data.device_augment import make_multicrop_fn

    g_seq = [
        {"name": "RandomResizedCrop", "params": {"size": cfg["img"], "scale": [0.5, 1.0]}},
        {"name": "RandomHorizontalFlip", "params": {}},
        {"name": "ColorJitter", "params": {"brightness": 0.4, "contrast": 0.4, "saturation": 0.2, "hue": 0.1}},
        {"name": "RandomGrayscale", "params": {"p": 0.2}},
        {"name": "GaussianBlur", "params": {"kernel_size": 7, "sigma": [0.1, 2.0]}},
        {"name": "ToTensor"},
    ]
    l_seq = [
        {"name": "RandomResizedCrop", "params": {"size": cfg["local_img"], "scale": [0.08, 0.4]}},
        {"name": "RandomHorizontalFlip", "params": {}},
        {"name": "ColorJitter", "params": {"brightness": 0.4, "contrast": 0.4, "saturation": 0.2, "hue": 0.1}},
        {"name": "GaussianBlur", "params": {"kernel_size": 7, "sigma": [0.1, 2.0]}},
        {"name": "ToTensor"},
    ]
    view_fn = make_multicrop_fn(g_seq, l_seq, cfg["ng"], cfg["na"])

    train_step, _ = make_dino_steps(
        model, tx, num_global_views=cfg["ng"], num_all_views=cfg["na"],
        student_temp=0.1, center_momentum=0.9, view_fn=view_fn,
        grad_accum=grad_accum, teacher_dropout=teacher_dropout,
        pack_locals=pack_locals,
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

    t0 = time.perf_counter()
    reps, outer = (3, 1) if iters <= 3 else (6, 2)
    cost: dict = {}
    sec = measure_steps(step_once, state, reps, outer, cost_out=cost)
    log(f"[ours] compile+measure wall: {time.perf_counter() - t0:.1f}s")
    ips = batch / sec
    ms = sec * 1e3
    flops = dino_step_flops(batch, cfg)
    mfu = flops / sec / peak_flops()
    d2h_warmup.join()
    tag = (f"ours/dino{'' if use_flash else '/xla'}"
           f"{'' if variant == 'vit_s' else '/' + variant}")
    log(f"[{tag}] {ips:.1f} img/s/chip, "
        f"{ms:.2f} ms/step, {flops/1e12:.2f} TFLOP/step, MFU {mfu:.1%}")
    rec = {"images_per_sec": ips, "ms_per_step": ms,
           "tflop_per_step": flops / 1e12, "mfu": mfu}
    if "xla_flops_per_step" in cost:
        rec["tflop_per_step_xla"] = cost["xla_flops_per_step"] / 1e12
        log(f"[{tag}] XLA cost analysis: {rec['tflop_per_step_xla']:.2f} "
            f"TFLOP/step (analytic {flops/1e12:.2f})")
    _attach_hbm(rec, tag)
    return rec


BASELINE_CACHE = Path(__file__).resolve().parent / "BENCH_BASELINE_CACHE.json"


def bench_reference_cpu(batch: int, iters: int, use_cache: bool = True) -> float:
    """Eager PyTorch reference on CPU — imported read-only as the oracle.
    The measurement is cached (it is a property of the fixed CPU baseline,
    not of our code) so later rounds don't re-pay it."""
    if use_cache and BASELINE_CACHE.exists():
        cached = json.loads(BASELINE_CACHE.read_text())
        log(f"[baseline torch-cpu] cached: {cached['images_per_sec']} images/sec "
            f"(measured {cached.get('note', '')})")
        return float(cached["images_per_sec"])
    if not Path(REFERENCE_PATH).exists():
        log("[baseline] /root/reference not present — skipping")
        return float("nan")
    sys.path.insert(0, REFERENCE_PATH)
    try:
        import torch

        from vit_core.ssl.dino.model import DINOViT
        from vit_core.ssl.dino.loss import DINOLoss

        cfg = VIT_S
        torch.manual_seed(0)
        model = DINOViT(
            num_blocks=cfg["num_blocks"],
            input_shape=(3, cfg["img"], cfg["img"]),
            embed_dim=cfg["embed_dim"],
            patch_size=cfg["patch"],
            num_heads=cfg["num_heads"],
            mlp_dim=cfg["mlp_dim"],
            dropout=0.1,
            output_dim=cfg["output_dim"],
            center_momentum=0.9,
        )
        model.train()
        criterion = DINOLoss(0.04, 0.1)
        params = [p for p in model.parameters() if p.requires_grad]
        opt = torch.optim.AdamW(params, lr=1e-4, weight_decay=1e-3)

        views = [
            torch.randn(batch, 3, cfg["img"], cfg["img"]) if v < cfg["ng"]
            else torch.randn(batch, 3, cfg["local_img"], cfg["local_img"])
            for v in range(cfg["na"])
        ]

        def step():
            opt.zero_grad(set_to_none=True)
            teacher_out, student_out = model(views, cfg["ng"])
            t = teacher_out.view(cfg["ng"], batch, -1)
            s = student_out.view(cfg["na"], batch, -1)
            loss = criterion(t, s, model.center)
            loss.backward()
            opt.step()
            model.momentum_update_teacher(0.996)
            return float(loss.detach())

        step()  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            step()
        dt = time.perf_counter() - t0
        ips = batch * iters / dt
        log(f"[baseline torch-cpu] {iters} steps of batch {batch} in {dt:.2f}s "
            f"-> {ips:.2f} images/sec")
        BASELINE_CACHE.write_text(json.dumps({
            "images_per_sec": round(ips, 3),
            "note": f"reference DINOViT ViT-S eager train step, batch {batch}, "
                    f"{os.cpu_count()} CPUs",
        }))
        return ips
    except Exception as e:  # pragma: no cover
        log(f"[baseline] failed: {type(e).__name__}: {e}")
        return float("nan")
    finally:
        sys.path.remove(REFERENCE_PATH)



def _leg_fns(args, warmup: int, iters: int):
    """Registry of the no-arg run's measurement legs. Each entry builds
    one step program and measures it; the no-arg parent runs every leg in
    a FRESH SUBPROCESS (one compile + measure per process) because legs
    measured late in a long multi-leg process drift +8–15% on this host
    (VERDICT r3 weakness 4; docs/performance.md 'leg isolation')."""
    return {
        "supervised": lambda: bench_mode(
            "supervised", args.batch, warmup, iters),
        "supervised_xla": lambda: bench_mode(
            "supervised", args.batch, warmup, iters, use_flash=False),
        "simmim": lambda: bench_mode("simmim", args.batch, warmup, iters),
        "simmim_xla": lambda: bench_mode(
            "simmim", args.batch, warmup, iters, use_flash=False),
        "dino": lambda: bench_ours(
            args.batch, warmup, iters, pack_locals=args.pack_locals),
        "dino_xla": lambda: bench_ours(
            args.batch, warmup, iters, use_flash=False),
        "dino_nodropout": lambda: bench_ours(
            args.batch, warmup, iters, dropout=0.0, teacher_dropout=False,
            pack_locals=args.pack_locals),
        # probe leg (not part of the no-arg run): isolates the teacher's
        # reference-parity train-mode dropout from the student's
        "dino_teacher_eval": lambda: bench_ours(
            args.batch, warmup, iters, teacher_dropout=False,
            pack_locals=args.pack_locals),
        "inference": lambda: bench_inference(256, iters, img=192),
    }


def _run_leg_subprocess(name: str, args, required: bool = True,
                        attempts: int = 3, deadline: float | None = None):
    """Measure one leg in a fresh python subprocess (`bench.py --leg X`)
    and parse its JSON result line. Retries transient tunnel failures the
    way _with_retries does for in-process legs. ``deadline`` (a
    time.monotonic timestamp) hard-bounds the WHOLE leg including
    retries, so one slow-compiling optional leg can't eat the
    --budget-seconds twice over."""
    import subprocess

    cmd = [sys.executable, __file__, "--leg", name,
           "--batch", str(args.batch), "--no-wait-backend"]
    if args.quick:
        cmd.append("--quick")
    if not args.pack_locals:
        cmd.append("--no-pack-locals")
    timed_out, grace_used = False, False
    for attempt in range(attempts):
        timeout_s = 3600.0
        if deadline is not None:
            timeout_s = deadline - time.monotonic()
            if timeout_s < 120:
                # one bounded grace retry after a timeout: the killed
                # attempt populated the persistent compile cache, so a
                # short re-run often finishes (measured: 128s after an
                # 836s-killed dino_xla compile)
                if timed_out and not grace_used:
                    timeout_s, grace_used = 240.0, True
                    log(f"[leg {name}] deadline passed — one 240s grace "
                        "retry on the warmed compile cache")
                else:
                    log(f"[leg {name}] {timeout_s:.0f}s left before the "
                        "leg deadline — not retrying")
                    break
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=timeout_s)
        except subprocess.TimeoutExpired:
            timed_out = True
            log(f"[leg {name}] subprocess hung >{timeout_s:.0f}s "
                f"(attempt {attempt + 1}/{attempts})")
            continue
        # the child logs to stderr; surface it so leg progress is visible
        for line in (r.stderr or "").splitlines():
            log(f"  [leg {name}] {line}")
        if r.returncode == 0:
            for line in reversed((r.stdout or "").splitlines()):
                line = line.strip()
                if line.startswith("{"):
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if rec.get("leg") == name:
                        rec.pop("leg")
                        return rec
            log(f"[leg {name}] exited 0 but printed no result line")
        else:
            log(f"[leg {name}] attempt {attempt + 1}/{attempts} failed "
                f"(rc={r.returncode})")
        if attempt + 1 < attempts:
            time.sleep(20 * (attempt + 1))
    if required:
        raise RuntimeError(f"bench leg '{name}' failed after {attempts} "
                           f"subprocess attempts")
    log(f"[leg {name}] giving up (optional leg) — reporting without it")
    return None


def _with_retries(fn, what: str, attempts: int = 3, required: bool = True):
    """Run a bench leg, retrying transient axon-tunnel failures.

    The remote-compile channel occasionally drops mid-compile
    ("remote_compile: read body: response body closed..."); a retry
    recompiles (persistent cache makes it cheap). Optional legs (the
    XLA-only comparisons) return None after exhausting retries instead of
    killing the headline measurement."""
    last = None
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as e:  # transient tunnel / runtime errors
            last = e
            log(f"[{what}] attempt {attempt + 1}/{attempts} failed: "
                f"{type(e).__name__}: {str(e)[:160]}")
            time.sleep(20 * (attempt + 1))
    if required:
        raise last
    log(f"[{what}] giving up (optional leg) — reporting without it")
    return None


def _wait_for_backend(probe_timeout: int = 180, retries: int = 6,
                      sleep_s: int = 120, max_wait: float = 0) -> None:
    """Bounded wait for the axon tunnel: the backend can go UNAVAILABLE
    for hours and, once broken, ``jax.devices()`` HANGS in-process rather
    than erroring — so probe from a SUBPROCESS with a timeout and retry.
    Never initializes JAX in this process (the probe result could go
    stale; the real init happens in the first bench leg)."""
    import subprocess

    t0 = time.monotonic()
    for attempt in range(retries):
        if max_wait and time.monotonic() - t0 > max_wait:
            log(f"[bench] backend wait exceeded {max_wait:.0f}s cap "
                "(--budget-seconds) — proceeding")
            return
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices()"],
                timeout=probe_timeout,
                capture_output=True,
            )
            if r.returncode == 0:
                if attempt:
                    log(f"[bench] backend came back after {attempt} retries")
                return
            tail = (r.stderr or b"").decode(errors="replace").strip()[-200:]
            log(f"[bench] backend probe failed (attempt {attempt + 1}/"
                f"{retries}): {tail}")
        except subprocess.TimeoutExpired:
            log(f"[bench] backend probe hung >{probe_timeout}s (attempt "
                f"{attempt + 1}/{retries}) — tunnel down")
        if attempt + 1 < retries:
            time.sleep(sleep_s)
    log("[bench] backend never came back; proceeding (the run will fail "
        "with the real error)")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument(
        "--all-modes", action="store_true",
        help="(now the default) bench supervised + simmim too",
    )
    parser.add_argument(
        "--dino-only", action="store_true",
        help="skip the supervised/simmim legs and the dropout-0 ablation "
        "(the pre-round-3 default; faster through the compile tunnel)",
    )
    parser.add_argument(
        "--no-xla-compare", action="store_true",
        help="skip the use_flash=false XLA-only comparison runs",
    )
    parser.add_argument("--baseline-batch", type=int, default=8)
    parser.add_argument("--skip-baseline", action="store_true")
    parser.add_argument(
        "--variant", choices=sorted(VARIANTS), default=None,
        help="bench ONE supervised/simmim step at a production encoder "
        "width (vit_b/vit_l) instead of the DINO headline; combine with "
        "--variant-mode/--img/--grad-accum/--remat",
    )
    parser.add_argument("--variant-mode", default="supervised",
                        choices=["supervised", "simmim", "dino"])
    parser.add_argument(
        "--inference", action="store_true",
        help="serving path: deterministic jitted ViT forward (combine "
        "with --variant/--img/--batch); forward-only FLOPs in the MFU",
    )
    parser.add_argument("--img", type=int, default=224)
    parser.add_argument("--grad-accum", type=int, default=1)
    parser.add_argument("--remat", action="store_true")
    parser.add_argument(
        "--moe-experts", type=int, default=0,
        help="supervised variant leg only: swap every 2nd block's FFN for "
        "a top-2 routed MoE with this many experts (per-image routing "
        "groups); MFU uses the MoE analytic FLOPs incl. dispatch einsums",
    )
    parser.add_argument(
        "--pack-locals", dest="pack_locals", action="store_true",
        default=True,
        help="dino: block-diagonal packing of the 4 local crops "
        "(model.dino_pack_locals; the production default — measured "
        "1.053x on v5e)",
    )
    parser.add_argument(
        "--no-pack-locals", dest="pack_locals", action="store_false",
        help="disable locals packing (the pre-round-3 step shape)",
    )
    parser.add_argument(
        "--no-wait-backend", action="store_true",
        help="skip the bounded wait for the TPU tunnel to come back "
        "(default: subprocess probe + retry, worst case ~28 min, before "
        "benching)",
    )
    parser.add_argument(
        "--leg", default=None,
        help="measure exactly ONE leg of the no-arg run in this process "
        "and print its JSON (supervised[_xla], simmim[_xla], dino[_xla], "
        "dino_nodropout, dino_teacher_eval, inference); the no-arg parent "
        "uses this for per-leg subprocess isolation",
    )
    parser.add_argument(
        "--in-process", action="store_true",
        help="run the no-arg legs in this process (pre-round-4 behavior; "
        "late legs read +8-15%% high on this 1-core host — see "
        "docs/performance.md)",
    )
    parser.add_argument(
        "--budget-seconds", type=float,
        default=float(os.environ.get("BENCH_BUDGET_SECONDS", 1260)),
        help="wall-clock budget for the no-arg run (default 1260, or "
        "$BENCH_BUDGET_SECONDS): optional legs are skipped when the "
        "remaining budget can't fit the next leg's estimated cost, so the "
        "required dino headline always lands inside the driver's timeout; "
        "0 disables the guard. Skipped legs are listed in the result JSON "
        "(`skipped_legs`) — no silent caps",
    )
    args = parser.parse_args(argv)
    t_start = time.monotonic()

    if args.moe_experts > 0:
        if args.inference or args.variant_mode != "supervised":
            parser.error(
                "--moe-experts only applies to the supervised variant leg "
                "(bench_mode's MoE model); combine it with "
                "--variant-mode supervised (the default), not "
                "dino/simmim/--inference"
            )
        if not args.variant:
            args.variant = "vit_s"  # --moe-experts alone runs the MoE leg

    if not args.no_wait_backend:
        # never let the down-tunnel wait eat the leg budget: cap it at
        # half of --budget-seconds (a dead tunnel fails the run anyway)
        _wait_for_backend(max_wait=args.budget_seconds / 2
                          if args.budget_seconds else 0)

    warmup, iters = (1, 3) if args.quick else (3, 10)
    base_iters = 2 if args.quick else 3

    def _warm_channel():
        import jax.numpy as jnp

        float(jnp.zeros(()))

    if args.leg:
        legs = _leg_fns(args, warmup, iters)
        if args.leg not in legs:
            parser.error(f"unknown --leg {args.leg!r}; one of {sorted(legs)}")
        threading.Thread(target=_warm_channel, daemon=True).start()
        rec = legs[args.leg]()
        print(json.dumps({"leg": args.leg, **rec}), flush=True)
        return rec

    if args.inference:
        threading.Thread(target=_warm_channel, daemon=True).start()
        variant = args.variant or "vit_s"
        r = bench_inference(args.batch, iters, variant=variant, img=args.img)
        result = {
            "metric": f"inference_{variant}_throughput",
            "value": round(r["images_per_sec"], 2),
            "unit": "images/sec/chip",
            "vs_baseline": None,
            "ms_per_batch": round(r["ms_per_step"], 2),
            "mfu": round(r["mfu"], 4),
            "config": {"img": args.img, "batch": args.batch},
        }
        print(json.dumps(result), flush=True)
        return result

    if args.variant:
        threading.Thread(target=_warm_channel, daemon=True).start()
        if args.variant_mode == "dino":
            r = bench_ours(
                args.batch, warmup, iters, variant=args.variant,
                grad_accum=args.grad_accum, remat=args.remat,
                pack_locals=args.pack_locals,
            )
        else:
            r = bench_mode(
                args.variant_mode, args.batch, warmup, iters,
                variant=args.variant, img=args.img,
                grad_accum=args.grad_accum, remat=args.remat,
                moe_experts=args.moe_experts,
            )
        img_echo = (f"{VIT_S['img']}g/{VIT_S['local_img']}l"
                    if args.variant_mode == "dino" else args.img)
        metric = f"{args.variant_mode}_{args.variant}"
        if args.moe_experts > 0:
            metric += f"_moe{args.moe_experts}"
        result = {
            "metric": f"{metric}_throughput",
            "value": round(r["images_per_sec"], 2),
            "unit": "images/sec/chip",
            "vs_baseline": None,
            "ms_per_step": round(r["ms_per_step"], 2),
            "mfu": round(r["mfu"], 4),
            "config": {"img": img_echo, "batch": args.batch,
                       "grad_accum": args.grad_accum, "remat": args.remat,
                       **({"moe_experts": args.moe_experts}
                          if args.moe_experts else {})},
        }
        print(json.dumps(result), flush=True)
        return result

    # warm the one-time device->host channel init (~400 s on the axon
    # tunnel) in the background so it overlaps the first compile — every
    # measurement synchronises on a real value fetch
    threading.Thread(target=_warm_channel, daemon=True).start()

    # default: the driver-visible no-arg run carries supervised + simmim
    # MFU first-hand, not just dino (VERDICT r2 item 7). --quick stays a
    # dino-only sanity run unless --all-modes is explicit.
    all_modes = args.all_modes or not (args.dino_only or args.quick)

    # Per-leg subprocess isolation (default): one compile + measure per
    # fresh process. In-process multi-leg runs drift — legs measured late
    # read +8-15% high on this 1-core host (the same HLO measured 63.4
    # then 73.0 ms as leg 7; docs/performance.md 'leg isolation') — at the
    # cost of ~2 min/leg re-paying the device→host channel init (~120 s,
    # overlapped with the cached compile).
    leg_fns = _leg_fns(args, warmup, iters)

    def remaining() -> float:
        if not args.budget_seconds:
            return float("inf")
        return args.budget_seconds - (time.monotonic() - t_start)

    # Per-leg wall-clock priors (seconds) from the r4/r5 measured runs:
    # every subprocess pays a ~150-250s floor (jax init + device→host
    # channel + cached compile); the *_xla legs compile the unfused
    # attention backward and run 2-4x longer cold. Observed: dino 251s
    # warm / 382s cold, dino_xla 483s warm / 964s cold, supervised ~210s,
    # supervised_xla ~550s, simmim ~200s.
    # Priors use WARM-cache costs (the persistent /tmp compile cache is
    # normally warm by the time the driver reruns this file); a cold
    # *_xla leg can exceed its estimate, but the per-leg deadline cap +
    # one 240s grace retry bound the damage to ~budget+240s, and the
    # incremental emission has already secured every earlier leg.
    LEG_PRIOR = {
        "supervised": 260, "supervised_xla": 480,
        "simmim": 260, "simmim_xla": 480,
        "dino": 420, "dino_xla": 560,
        "dino_nodropout": 320, "dino_teacher_eval": 320,
        "inference": 260,
    }
    leg_walls: dict[str, float] = {}

    def run_leg(name: str, required: bool = True):
        t0 = time.monotonic()
        attempts = 3 if required else 2
        if args.in_process:
            rec = _with_retries(leg_fns[name], f"ours/{name}",
                                attempts=attempts, required=required)
        else:
            # optional legs get a hard deadline at the remaining budget
            # (required legs keep the generous cap — better late than
            # absent)
            deadline = None if required else (
                time.monotonic() + max(240.0, remaining() - 30.0))
            rec = _run_leg_subprocess(name, args, required=required,
                                      attempts=attempts, deadline=deadline)
        leg_walls[name] = time.monotonic() - t0
        return rec

    def leg_estimate(name: str) -> float:
        # prior scaled by how this host/cache is actually running today
        # (mean observed/prior ratio over completed legs, clamped so one
        # outlier can't swing it into skipping cheap legs — the r5 bug
        # that lost supervised/simmim with 524s still on the clock)
        prior = LEG_PRIOR.get(name, 420.0)
        if not leg_walls:
            return prior
        ratios = [w / LEG_PRIOR.get(n, 420.0) for n, w in leg_walls.items()]
        ratio = min(2.0, max(0.4, sum(ratios) / len(ratios)))
        return 1.1 * prior * ratio

    # torch-CPU baseline up front: the cached read is instant and every
    # incremental emission can then carry vs_baseline (if the cache is
    # missing, defer the multi-minute measurement to the end)
    baseline = float("nan")
    if not args.skip_baseline and BASELINE_CACHE.exists():
        baseline = bench_reference_cpu(args.baseline_batch, base_iters)

    modes: dict = {}
    skipped: list[str] = []

    def emit(final: bool = False):
        """Print the cumulative result JSON after every completed leg, so
        a driver timeout mid-run still leaves a parseable record of
        everything measured so far (VERDICT r4 item 1 — r4's rc=124 run
        lost the whole round's numbers to a null parse)."""
        ours = modes.get("dino")
        if ours is None:
            return None
        ips = ours["images_per_sec"]
        vs = (ips / baseline) if baseline == baseline and baseline > 0 else None
        result = {
            "metric": "dino_vit_s_pretrain_throughput",
            "value": round(ips, 2),
            "unit": "images/sec/chip",
            "vs_baseline": round(vs, 2) if vs is not None else None,
            "ms_per_step": round(ours["ms_per_step"], 2),
            "mfu": round(ours["mfu"], 4),
            "vs_xla": round(ours.get("vs_xla", float("nan")), 3)
            if "vs_xla" in ours else None,
            "modes": {
                k: {kk: (round(vv, 4) if vv == vv else None)
                    for kk, vv in v.items()}
                for k, v in modes.items()
            },
        }
        if skipped:
            result["skipped_legs"] = list(skipped)
        if not final:
            result["partial"] = True
        print(json.dumps(result), flush=True)
        return result

    # Leg order (VERDICT r4 item 1): the dino headline and its XLA
    # comparison run FIRST; supervised/simmim next; ablation + serving
    # legs last. Optional legs are budget-gated.
    plan: list[tuple[str, bool]] = [("dino", True)]
    if not args.no_xla_compare:
        plan.append(("dino_xla", False))
    if all_modes:
        plan += [("supervised", True), ("simmim", True)]
        if not args.no_xla_compare:
            plan += [("supervised_xla", False), ("simmim_xla", False)]
        # ablation: dropout 0 + deterministic teacher — makes the known
        # regularisation overhead visible in the recorded JSON instead of
        # only in the builder's notes; same pack_locals as the headline
        # leg so the ablation isolates the regularisation cost alone.
        # inference: serving path (deterministic forward, fwd-only FLOPs).
        plan += [("dino_nodropout", False), ("inference", False)]

    for name, required in plan:
        if name != "dino" and remaining() < leg_estimate(name):
            skipped.append(name)
            log(f"[bench] skipping leg {name}: {remaining():.0f}s left "
                f"< estimated {leg_estimate(name):.0f}s (--budget-seconds "
                f"{args.budget_seconds:.0f})")
            continue
        rec = run_leg(name, required=required)
        if rec is None:
            continue
        modes[name] = rec
        if name.endswith("_xla"):
            base = modes.get(name[:-4])
            if base is not None:
                base["vs_xla"] = rec["ms_per_step"] / base["ms_per_step"]
        emit()

    if (baseline != baseline and not args.skip_baseline
            and remaining() > 120):
        baseline = bench_reference_cpu(args.baseline_batch, base_iters)

    result = emit(final=True)
    if result is None:
        raise RuntimeError("dino headline leg never completed")
    log(f"[bench] total wall {time.monotonic() - t_start:.0f}s, "
        f"legs {[f'{n}:{w:.0f}s' for n, w in leg_walls.items()]}, "
        f"skipped {skipped}")
    return result


if __name__ == "__main__":
    main()

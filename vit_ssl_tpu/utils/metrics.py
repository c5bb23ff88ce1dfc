"""Metric registry + implementations.

Parity with `/root/reference/utils/metrics.py:8-256`: the same 14-metric
name registry behind a kwargs-based ``compute(**kwargs)`` protocol so one
call site serves every trainer type. Differences by design:

- heavy math (PSNR/SSIM ingredients, DINO distribution stats) runs inside
  the jitted step on device as pure jnp functions here; the registry
  classes assemble host-side floats — no torcheval/ignite dependency;
- the reference's ``Precision.compute`` is missing its ``return``
  (`metrics.py:246-256`, SURVEY.md §7 quirk list) — fixed here;
- SSIM uses a gaussian window with reflect padding (ignite's scheme);
  the window shrinks only for patches too small to reflect-pad.

torch ``.std()/.var()`` are unbiased (ddof=1); replicated.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Device-side (jnp) metric ingredients — call these inside jitted steps
# ---------------------------------------------------------------------------


def weighted_accuracy_stats(preds, labels, weight):
    correct = jnp.sum((preds == labels) * weight)
    total = jnp.sum(weight)
    return correct, total


def psnr_stats(preds, targets, weight):
    """Sum of squared error + element count over masked/valid elements.

    ``weight`` broadcasts against preds (e.g. (B, N, 1) mask × sample
    weight). PSNR(data_range=1) = -10·log10(SSE/count), matching torcheval
    PeakSignalNoiseRatio over the concatenated masked patches
    (`/root/reference/utils/trainers/simmim_trainer.py:79-96`).
    """
    err = (preds.astype(jnp.float32) - targets.astype(jnp.float32)) ** 2
    w = jnp.broadcast_to(weight, err.shape).astype(jnp.float32)
    return jnp.sum(err * w), jnp.sum(w)


def _gaussian_kernel(size: int, sigma: float):
    half = (size - 1) / 2.0
    coords = jnp.arange(size, dtype=jnp.float32) - half
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim_per_image(preds, targets, kernel_size: int = 11, sigma: float = 1.5,
                   data_range: float = 1.0):
    """Mean SSIM per image. preds/targets: (B, H, W, C) in [0, data_range].

    Gaussian window with reflect padding, matching ignite's SSIM scheme
    (the reference's metric backend); kernel shrinks for images smaller
    than ``(k+1)/2`` where reflect padding is undefined."""
    h = preds.shape[1]
    k = kernel_size
    if h < (k + 1) // 2 + 1:
        k = max(3, (2 * h - 3) | 1)
    kern = _gaussian_kernel(k, sigma)
    c = preds.shape[-1]
    kern = jnp.broadcast_to(kern[:, :, None, None], (k, k, 1, c))
    pad = (k - 1) // 2

    def filt(x):
        x = jnp.pad(
            x.astype(jnp.float32),
            ((0, 0), (pad, pad), (pad, pad), (0, 0)),
            mode="reflect",
        )
        return jax.lax.conv_general_dilated(
            x,
            kern,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    x = preds.astype(jnp.float32)
    y = targets.astype(jnp.float32)
    mu_x, mu_y = filt(x), filt(y)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x = filt(x * x) - mu_x2
    sigma_y = filt(y * y) - mu_y2
    sigma_xy = filt(x * y) - mu_xy

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    ssim_map = ((2 * mu_xy + c1) * (2 * sigma_xy + c2)) / (
        (mu_x2 + mu_y2 + c1) * (sigma_x + sigma_y + c2)
    )
    return ssim_map.mean(axis=(1, 2, 3))


def ssim_stats(pred_patches, target_patches, weight, patch_size: int, channels: int):
    """(sum of per-patch SSIM, patch count) over masked patches.

    pred/target: (B, N, C·p²) flattened patches in torch-unfold order;
    weight: (B, N) mask × sample-weight.
    """
    b, n, _ = pred_patches.shape
    def to_img(p):
        x = p.reshape(b * n, channels, patch_size, patch_size)
        return x.transpose(0, 2, 3, 1)  # NHWC

    per_patch = ssim_per_image(to_img(pred_patches), to_img(target_patches))
    w = weight.reshape(b * n).astype(jnp.float32)
    return jnp.sum(per_patch * w), jnp.sum(w)


def dino_distribution_stats(teacher, student, center, weight=None):
    """All 8 DINO collapse-monitoring metrics in one fused pass.

    teacher (Vt, B, K), student (Vs, B, K) — matches
    `/root/reference/utils/metrics.py:58-156` including unbiased std/var
    and the pairwise teacher×student cosine similarity mean.

    ``weight`` (optional, (B,)): per-sample weights so padded rows of the
    final short batch (loader pads with copies of sample 0 at weight 0)
    are excluded — the stats then equal the truncated batch's exactly for
    0/1 weights. ``None`` keeps the plain unweighted reduction.
    """
    t = teacher.astype(jnp.float32)
    s = student.astype(jnp.float32)

    if weight is None:
        t_flat, s_flat = t.reshape(-1), s.reshape(-1)
        t_stats = {
            "TeacherMean": t_flat.mean(),
            "TeacherSTD": jnp.std(t_flat, ddof=1),
            "TeacherVar": jnp.var(t_flat, ddof=1),
        }
        s_stats = {
            "StudentMean": s_flat.mean(),
            "StudentSTD": jnp.std(s_flat, ddof=1),
            "StudentVar": jnp.var(s_flat, ddof=1),
        }
        cos_w = None
    else:
        w = weight.astype(jnp.float32)  # (B,)

        def _wstats(x, prefix):
            # x (V, B, K); each real sample contributes V·K elements
            wb = w[None, :, None]
            count = jnp.maximum(x.shape[0] * x.shape[2] * jnp.sum(w), 2.0)
            mean = jnp.sum(x * wb) / count
            var = jnp.sum(wb * (x - mean) ** 2) / (count - 1.0)  # unbiased
            return {
                f"{prefix}Mean": mean,
                f"{prefix}STD": jnp.sqrt(var),
                f"{prefix}Var": var,
            }

        t_stats = _wstats(t, "Teacher")
        s_stats = _wstats(s, "Student")
        cos_w = w

    t_norm = jnp.linalg.norm(t, axis=-1)  # (Vt, B)
    s_norm = jnp.linalg.norm(s, axis=-1)  # (Vs, B)
    dot = jnp.einsum("tbk,sbk->tsb", t, s)
    cos = dot / (t_norm[:, None] * s_norm[None] + 1e-8)
    if cos_w is None:
        cos_mean = cos.mean()
    else:
        cos_mean = jnp.sum(cos * cos_w[None, None, :]) / jnp.maximum(
            cos.shape[0] * cos.shape[1] * jnp.sum(cos_w), 1.0
        )

    return {
        "CenterNorm": jnp.linalg.norm(center),
        **t_stats,
        **s_stats,
        "CosineSim": cos_mean,
    }


# ---------------------------------------------------------------------------
# Host-side registry (reference protocol)
# ---------------------------------------------------------------------------


class BaseMetric:
    def compute(self, **kwargs) -> float:
        raise NotImplementedError


def _per_class_counts(y_pred: np.ndarray, y_true: np.ndarray):
    num_classes = int(y_true.max()) + 1
    for cls in range(num_classes):
        tp = int(((y_pred == cls) & (y_true == cls)).sum())
        fp = int(((y_pred == cls) & (y_true != cls)).sum())
        fn = int(((y_pred != cls) & (y_true == cls)).sum())
        yield tp, fp, fn


class Accuracy(BaseMetric):
    def compute(self, *, correct, total, **kwargs) -> float:
        return float(correct) / float(total)


class F1Score(BaseMetric):
    def compute(self, *, y_pred, y_true, **kwargs) -> float:
        f1s = []
        for tp, fp, fn in _per_class_counts(np.asarray(y_pred), np.asarray(y_true)):
            precision = tp / (tp + fp) if (tp + fp) > 0 else 0.0
            recall = tp / (tp + fn) if (tp + fn) > 0 else 0.0
            f1s.append(
                2 * precision * recall / (precision + recall)
                if (precision + recall) > 0
                else 0.0
            )
        return sum(f1s) / len(f1s) if f1s else 0.0


class Recall(BaseMetric):
    def compute(self, *, y_pred, y_true, **kwargs) -> float:
        recalls = [
            tp / (tp + fn) if (tp + fn) > 0 else 0.0
            for tp, _, fn in _per_class_counts(np.asarray(y_pred), np.asarray(y_true))
        ]
        return sum(recalls) / len(recalls) if recalls else 0.0


class Precision(BaseMetric):
    def compute(self, *, y_pred, y_true, **kwargs) -> float:
        precisions = [
            tp / (tp + fp) if (tp + fp) > 0 else 0.0
            for tp, fp, _ in _per_class_counts(np.asarray(y_pred), np.asarray(y_true))
        ]
        # the reference forgets this return (metrics.py:246-256) — fixed
        return sum(precisions) / len(precisions) if precisions else 0.0


class PSNRMetric(BaseMetric):
    def compute(self, *, psnr_sse, psnr_count, **kwargs) -> float:
        mse = float(psnr_sse) / max(float(psnr_count), 1.0)
        if mse <= 0:
            return float("inf")
        return float(-10.0 * np.log10(mse))


class SSIMMetric(BaseMetric):
    def compute(self, *, ssim_sum, ssim_count, **kwargs) -> float:
        return float(ssim_sum) / max(float(ssim_count), 1.0)


class _DINOStat(BaseMetric):
    key: str = ""

    def compute(self, *, dino_stats: Dict[str, Any], **kwargs) -> float:
        return float(dino_stats[self.key])


class CenterNormMetric(_DINOStat):
    key = "CenterNorm"


class TeacherMeanMetric(_DINOStat):
    key = "TeacherMean"


class TeacherSTDMetric(_DINOStat):
    key = "TeacherSTD"


class TeacherVarMetric(_DINOStat):
    key = "TeacherVar"


class StudentMeanMetric(_DINOStat):
    key = "StudentMean"


class StudentSTDMetric(_DINOStat):
    key = "StudentSTD"


class StudentVarMetric(_DINOStat):
    key = "StudentVar"


class CosineSimMetric(_DINOStat):
    key = "CosineSim"


_REGISTRY = {
    "CenterNorm": CenterNormMetric,
    "TeacherMean": TeacherMeanMetric,
    "TeacherSTD": TeacherSTDMetric,
    "TeacherVar": TeacherVarMetric,
    "StudentMean": StudentMeanMetric,
    "StudentSTD": StudentSTDMetric,
    "StudentVar": StudentVarMetric,
    "CosineSim": CosineSimMetric,
    "PSNR": PSNRMetric,
    "SSIM": SSIMMetric,
    "Accuracy": Accuracy,
    "F1Score": F1Score,
    "Recall": Recall,
    "Precision": Precision,
}


class MetricHandler:
    """Name-keyed metric dispatch (`/root/reference/utils/metrics.py:8-45`)."""

    def __init__(self, config):
        active = config.get("metrics", []) or []
        self._metric_calculators = {}
        for name in active:
            if name not in _REGISTRY:
                raise ValueError(f"Unknown metric '{name}'")
            self._metric_calculators[name] = _REGISTRY[name]()

    def calculate_metrics(self, **kwargs) -> Dict[str, float]:
        return {
            name: calc.compute(**kwargs)
            for name, calc in self._metric_calculators.items()
        }

    @property
    def metric_names(self) -> List[str]:
        return list(self._metric_calculators.keys())

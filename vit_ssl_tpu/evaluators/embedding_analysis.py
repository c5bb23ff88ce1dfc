"""Embedding-space analysis: 2D/3D projection, quality metrics, reports.

Behavioral parity with the reference's UMAP analysis
(`/root/reference/evaluators/unsupervised_evaluators/umap_visualization.py`):
the same quality *metrics* (silhouette on features — stratified-sampled to
2000 — and on the embedding, KMeans ARI, intra/inter class distance ratio),
the same rubric thresholds and grades, and the same artifact *filenames*
(``umap_visualization.png``, ``comprehensive_umap_analysis.png``,
``umap_feature_quality_results.csv``, ``umap_feature_quality_report.txt``,
``umap_3d_rotation.gif``) so downstream tooling finds what it expects.

The implementation is this framework's own: the rubric is a declarative
scoring table, the multi-panel figure is built from a panel registry, the
CSV/txt reports are generated from metric metadata rather than hand-written
rows, and the 3D rotation animation uses matplotlib's FuncAnimation.

umap-learn is not installed in this environment; when absent the projector
is the from-scratch UMAP implementation (:mod:`.umap_native`, the paper's
algorithm with a JAX-jitted layout loop) — the quality metrics on
*features* are projector-independent, only the 2D scatter changes flavor.
"""

from __future__ import annotations

import logging
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from sklearn.cluster import KMeans  # noqa: E402
from sklearn.metrics import (  # noqa: E402
    adjusted_rand_score,
    silhouette_samples,
    silhouette_score,
)

logger = logging.getLogger(__name__)

try:
    from umap import UMAP  # type: ignore

    _HAVE_UMAP = True
except Exception:  # pragma: no cover - environment-dependent
    _HAVE_UMAP = False


def projector_name() -> str:
    """Which 2D/3D projector the analysis actually uses — umap-learn when
    installed, else the from-scratch paper implementation
    (:mod:`.umap_native`). Plot titles and reports use this so artifacts
    are never mislabeled."""
    return "UMAP" if _HAVE_UMAP else "UMAP (native)"


def _project(features: np.ndarray, n_components: int, umap_params: Optional[Dict]):
    params = {
        "n_components": n_components,
        "n_neighbors": 15,
        "min_dist": 0.1,
        "metric": "euclidean",
    }
    params.update(umap_params or {})
    if _HAVE_UMAP:
        reducer = UMAP(**params)
        return np.asarray(reducer.fit_transform(features))
    logger.info(
        "umap-learn not installed — using the native UMAP implementation "
        "(vit_ssl_tpu.evaluators.umap_native)"
    )
    from .umap_native import NativeUMAP

    params.setdefault("random_state", 42)
    return np.asarray(NativeUMAP(**params).fit_transform(features))


def prepare_combined_features(train_features, train_labels, val_features, val_labels):
    features = np.concatenate([np.asarray(train_features), np.asarray(val_features)])
    labels = np.concatenate([np.asarray(train_labels), np.asarray(val_labels)])
    return features, labels


def _stratified_subsample(features, labels, cap: int):
    """At most ``cap`` points, class-stratified (silhouette/KMeans on the
    full set would dominate eval wall-clock at dataset scale)."""
    if len(features) <= cap:
        return features, labels
    from sklearn.model_selection import train_test_split

    _, f, _, y = train_test_split(
        features, labels, test_size=cap, stratify=labels, random_state=42
    )
    return f, y


def _class_centroid_stats(features, labels, rng_seed: int = 42):
    """Mean within-class distance-to-centroid vs mean pairwise centroid
    distance (each class subsampled to ≤500 points for the intra term)."""
    rng = np.random.default_rng(rng_seed)
    centroids = []
    intra_per_class = []
    for label in np.unique(labels):
        members = features[labels == label]
        centroid = members.mean(axis=0)
        centroids.append(centroid)
        if len(members) < 2:
            continue
        if len(members) > 500:
            members = members[rng.choice(len(members), 500, replace=False)]
        intra_per_class.append(
            float(np.linalg.norm(members - centroid, axis=1).mean())
        )
    centroids = np.stack(centroids)
    # pairwise centroid distances via the Gram trick (upper triangle)
    sq = np.sum(centroids**2, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (centroids @ centroids.T)
    iu = np.triu_indices(len(centroids), k=1)
    inter = np.sqrt(np.maximum(d2[iu], 0.0))
    avg_intra = float(np.mean(intra_per_class)) if intra_per_class else 0.0
    avg_inter = float(inter.mean()) if inter.size else 0.0
    return avg_intra, avg_inter


def evaluate_feature_quality(
    features, labels, embedding, sample_size: int = 2000
) -> Dict:
    """Quality metrics with the reference's definitions
    (`umap_visualization.py:28-106`): silhouette on sampled features and on
    the 2D embedding, KMeans ARI on sampled features, centroid-based
    intra/inter distances and their ratio."""
    features = np.asarray(features)
    labels = np.asarray(labels)
    logger.info(
        "Evaluating features: %d samples, %d dimensions",
        features.shape[0],
        features.shape[1],
    )
    sampled_f, sampled_y = _stratified_subsample(features, labels, sample_size)

    n_classes = int(len(np.unique(labels)))
    kmeans_pred = KMeans(
        n_clusters=n_classes, random_state=42, n_init=3, max_iter=100
    ).fit_predict(sampled_f)
    avg_intra, avg_inter = _class_centroid_stats(features, labels)

    return {
        "silhouette_features": float(silhouette_score(sampled_f, sampled_y)),
        "silhouette_umap": float(silhouette_score(embedding, labels)),
        "adjusted_rand_index": float(adjusted_rand_score(sampled_y, kmeans_pred)),
        "avg_intra_distance": avg_intra,
        "avg_inter_distance": avg_inter,
        "separation_ratio": avg_inter / avg_intra if avg_intra > 0 else 0.0,
        "n_samples": int(len(features)),
        "n_features": int(features.shape[1]),
        "n_classes": n_classes,
        "sampled_for_computation": len(features) > sample_size,
    }


# Declarative rubric: (metric key, aspect name, [(min threshold, points)]).
# Thresholds/points/grades are the reference's exact values
# (`umap_visualization.py:110-164`); the scoring engine is ours.
_RUBRIC: List[Tuple[str, str, List[Tuple[float, int]]]] = [
    ("silhouette_features", "cluster cohesion", [(0.7, 3), (0.5, 2), (0.2, 1)]),
    ("separation_ratio", "class separation", [(3.0, 3), (2.0, 2), (1.5, 1)]),
    ("adjusted_rand_index", "clustering agreement", [(0.8, 3), (0.6, 2), (0.4, 1)]),
]
_POINT_WORDS = {3: "Excellent", 2: "Good", 1: "Fair", 0: "Poor"}
_GRADES = [(7, "Excellent"), (5, "Good"), (3, "Fair"), (0, "Poor")]


def assess_quality(metrics: Dict) -> Tuple[str, list]:
    """Score each rubric aspect, sum to an overall grade."""
    total = 0
    feedback = []
    for key, aspect, levels in _RUBRIC:
        points = next((p for lo, p in levels if metrics[key] > lo), 0)
        total += points
        feedback.append(f"{_POINT_WORDS[points]} {aspect}")
    grade = next(g for lo, g in _GRADES if total >= lo)
    return grade, feedback


def create_basic_plot(embedding, labels, output_dir):
    plt.figure(figsize=(10, 8))
    plt.scatter(embedding[:, 0], embedding[:, 1], c=labels, cmap="Spectral", s=5)
    plt.colorbar()
    plt.title(f"{projector_name()} projection of learned features")
    plt.xlabel(f"{projector_name()} 1")
    plt.ylabel(f"{projector_name()} 2")
    plt.savefig(
        os.path.join(output_dir, "umap_visualization.png"), dpi=150, bbox_inches="tight"
    )
    plt.close()


# --- multi-panel analysis figure (panel registry, one draw fn per view) ----

def _panel_true_labels(ax, embedding, labels):
    classes = np.unique(labels)
    cmap = plt.cm.get_cmap("viridis", len(classes))
    for i, cls in enumerate(classes):
        pts = embedding[labels == cls]
        ax.scatter(pts[:, 0], pts[:, 1], color=cmap(i), s=10, alpha=0.6,
                   label=f"class {cls}")
        centroid = pts.mean(axis=0)
        ax.scatter(*centroid, color=cmap(i), marker="X", s=120,
                   edgecolors="black", linewidths=1.0)
    ax.legend(fontsize=7, ncol=2, loc="best")
    return "True classes (X = centroid)"


def _panel_kmeans(ax, embedding, labels):
    pred = KMeans(
        n_clusters=len(np.unique(labels)), random_state=42, n_init=10
    ).fit_predict(embedding)
    ax.scatter(embedding[:, 0], embedding[:, 1], c=pred, cmap="viridis",
               s=10, alpha=0.6)
    return "K-means clusters in embedding space"


def _panel_density(ax, embedding, labels):
    h = ax.hist2d(embedding[:, 0], embedding[:, 1], bins=40, cmap="magma")
    plt.colorbar(h[3], ax=ax)
    return "Point density"


def _panel_silhouette_bars(ax, embedding, labels):
    sil = silhouette_samples(embedding, labels)
    classes = np.unique(labels)
    means = [float(sil[labels == cls].mean()) for cls in classes]
    ax.bar([str(c) for c in classes], means, color="tab:blue")
    ax.axhline(float(sil.mean()), color="tab:red", linestyle="--",
               label=f"overall {sil.mean():.3f}")
    ax.set_xlabel("class")
    ax.legend(fontsize=8)
    return "Per-class silhouette (embedding)"


_PANELS: Sequence[Callable] = (
    _panel_true_labels,
    _panel_kmeans,
    _panel_density,
    _panel_silhouette_bars,
)


def create_comprehensive_analysis(embedding, labels, output_path):
    """Multi-view analysis figure built from the panel registry."""
    labels = np.asarray(labels)
    n = len(_PANELS)
    cols = 2
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(7 * cols, 5.5 * rows))
    for ax, panel in zip(np.ravel(axes), _PANELS):
        title = panel(ax, embedding, labels)
        ax.set_title(title)
    for ax in np.ravel(axes)[n:]:
        ax.axis("off")
    fig.suptitle(f"Embedding-space analysis ({projector_name()} projection)", fontsize=14)
    fig.tight_layout()
    fig.savefig(output_path, dpi=150, bbox_inches="tight")
    plt.close(fig)


# --- reports: generated from metric metadata ------------------------------

# metric key -> (display label, reading direction)
_METRIC_INFO = {
    "silhouette_features": ("Silhouette Score (Features)", "higher is better, max 1.0"),
    "silhouette_umap": ("Silhouette Score (projection)", "higher is better, max 1.0"),
    "adjusted_rand_index": ("Adjusted Rand Index", "higher is better, max 1.0"),
    "avg_intra_distance": ("Average Intra-class Distance", "lower is better"),
    "avg_inter_distance": ("Average Inter-class Distance", "higher is better"),
    "separation_ratio": ("Separation Ratio", "inter/intra, higher is better"),
    "n_samples": ("Number of Samples", "points analyzed"),
    "n_features": ("Number of Features", "feature dimensionality"),
    "n_classes": ("Number of Classes", "unique labels"),
}


def _fmt(value) -> str:
    return f"{value:.4f}" if isinstance(value, float) else str(value)


def save_results(metrics, quality, feedback, output_dir):
    """CSV + plain-text quality report, generated from ``_METRIC_INFO``."""
    records = [
        {"Metric": "Overall Quality", "Value": quality,
         "Interpretation": "rubric grade over cohesion/separation/agreement"}
    ]
    for key, (label, direction) in _METRIC_INFO.items():
        if key in metrics:
            records.append(
                {"Metric": label, "Value": _fmt(metrics[key]),
                 "Interpretation": direction}
            )
    for i, note in enumerate(feedback, start=1):
        records.append(
            {"Metric": f"Quality Indicator {i}", "Value": "✓", "Interpretation": note}
        )
    if metrics.get("sampled_for_computation"):
        records.append(
            {"Metric": "Computation Method", "Value": "stratified sample",
             "Interpretation": "silhouette/ARI computed on ≤2000 points"}
        )
    frame = pd.DataFrame.from_records(records)
    frame.to_csv(
        os.path.join(output_dir, "umap_feature_quality_results.csv"), index=False
    )

    lines = [
        "UMAP Feature Quality Analysis Report",
        "=" * 40,
        "",
        f"Projector: {projector_name()}"
        + ("" if _HAVE_UMAP
           else " (from-scratch implementation of arXiv:1802.03426 — "
                "vit_ssl_tpu/evaluators/umap_native.py)"),
        f"Overall Assessment: {quality}",
        "",
        "Detailed Metrics:",
        "-" * 20,
    ]
    for key, (label, direction) in _METRIC_INFO.items():
        if key in metrics:
            lines.append(f"{label}: {_fmt(metrics[key])}  ({direction})")
    lines += ["", "Quality Indicators:", "-" * 20]
    lines += [f"* {note}" for note in feedback]
    with open(
        os.path.join(output_dir, "umap_feature_quality_report.txt"), "w"
    ) as fh:
        fh.write("\n".join(lines) + "\n")


def run_umap_analysis(features, labels, output_dir, umap_params: Optional[Dict] = None):
    """2D projection + metrics + plots + reports. Returns
    (embedding, metrics, quality, feedback)."""
    os.makedirs(output_dir, exist_ok=True)
    features = np.asarray(features)
    labels = np.asarray(labels)
    logger.info(
        "Starting projection on %d samples with %d dimensions",
        features.shape[0],
        features.shape[1],
    )
    embedding = _project(features, 2, umap_params)
    create_basic_plot(embedding, labels, output_dir)
    metrics = evaluate_feature_quality(features, labels, embedding, sample_size=2000)
    quality, feedback = assess_quality(metrics)
    create_comprehensive_analysis(
        embedding, labels, os.path.join(output_dir, "comprehensive_umap_analysis.png")
    )
    save_results(metrics, quality, feedback, output_dir)
    logger.info("Analysis complete! Quality: %s", quality)
    return embedding, metrics, quality, feedback


def create_3d_umap_animation(features, labels, output_dir, umap_params=None,
                             step_degrees: int = 4):
    """Rotating 3D scatter saved as ``umap_3d_rotation.gif`` via
    matplotlib's animation API (FuncAnimation + PillowWriter)."""
    from matplotlib import animation

    os.makedirs(output_dir, exist_ok=True)
    embedding = _project(np.asarray(features), 3, umap_params)
    labels = np.asarray(labels)

    fig = plt.figure(figsize=(12, 9))
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(
        embedding[:, 0], embedding[:, 1], embedding[:, 2],
        c=labels, cmap="Spectral", s=5, alpha=0.7,
    )
    name = projector_name()
    ax.set_xlabel(f"{name} 1")
    ax.set_ylabel(f"{name} 2")
    ax.set_zlabel(f"{name} 3")

    def spin(frame_idx):
        angle = frame_idx * step_degrees
        ax.view_init(elev=20, azim=angle)
        ax.set_title(f"3D {projector_name()} embedding — azimuth {angle}°")
        return ()

    anim = animation.FuncAnimation(
        fig, spin, frames=360 // step_degrees, interval=100, blit=False
    )
    gif_path = os.path.join(output_dir, "umap_3d_rotation.gif")
    anim.save(gif_path, writer=animation.PillowWriter(fps=10))
    plt.close(fig)
    logger.info("3D animation saved to: %s", gif_path)
    return embedding

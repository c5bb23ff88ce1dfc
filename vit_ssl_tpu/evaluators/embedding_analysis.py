"""Embedding-space analysis: 2D/3D projection, quality metrics, reports.

Behavioral parity with
`/root/reference/evaluators/unsupervised_evaluators/umap_visualization.py`:
the same quality metrics (silhouette on features — stratified-sampled to
2000 — and on the embedding, KMeans ARI, intra/inter class distance ratio),
the same rubric thresholds and grades, the same output artifacts
(``umap_visualization.png``, ``comprehensive_umap_analysis.png``,
``umap_feature_quality_results.csv``, ``umap_feature_quality_report.txt``,
``umap_3d_rotation.gif``).

umap-learn is not installed in this environment; when absent the projector
falls back to PCA (sklearn) with a logged warning — the quality metrics on
*features* are projector-independent, only the 2D scatter changes flavor.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional, Tuple

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from sklearn.cluster import KMeans  # noqa: E402
from sklearn.metrics import adjusted_rand_score, silhouette_score  # noqa: E402

logger = logging.getLogger(__name__)

try:
    from umap import UMAP  # type: ignore

    _HAVE_UMAP = True
except Exception:  # pragma: no cover - environment-dependent
    _HAVE_UMAP = False


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
    logger.warning("umap-learn not installed — falling back to PCA projection")
    from sklearn.decomposition import PCA

    return np.asarray(
        PCA(n_components=n_components, random_state=42).fit_transform(features)
    )


def prepare_combined_features(train_features, train_labels, val_features, val_labels):
    features = np.concatenate([np.asarray(train_features), np.asarray(val_features)])
    labels = np.concatenate([np.asarray(train_labels), np.asarray(val_labels)])
    return features, labels


def evaluate_feature_quality(
    features, labels, embedding, sample_size: int = 2000
) -> Dict:
    """Quality metrics (reference `umap_visualization.py:28-106`)."""
    features = np.asarray(features)
    labels = np.asarray(labels)
    logger.info(
        "Evaluating features: %d samples, %d dimensions",
        features.shape[0],
        features.shape[1],
    )
    if len(features) > sample_size:
        from sklearn.model_selection import train_test_split

        _, sampled_features, _, sampled_labels = train_test_split(
            features, labels, test_size=sample_size, stratify=labels, random_state=42
        )
    else:
        sampled_features, sampled_labels = features, labels

    sil_embedding = float(silhouette_score(embedding, labels))
    sil_features = float(silhouette_score(sampled_features, sampled_labels))

    n_clusters = len(np.unique(labels))
    kmeans = KMeans(n_clusters=n_clusters, random_state=42, n_init=3, max_iter=100)
    ari = float(adjusted_rand_score(sampled_labels, kmeans.fit_predict(sampled_features)))

    # class separation: mean distance-to-centroid vs centroid spread
    rng = np.random.default_rng(42)
    centers = {}
    intra = []
    for label in np.unique(labels):
        cls = features[labels == label]
        center = cls.mean(0)
        centers[label] = center
        if len(cls) > 1:
            sample = cls[rng.choice(len(cls), 500, replace=False)] if len(cls) > 500 else cls
            intra.append(float(np.linalg.norm(sample - center, axis=1).mean()))
    center_list = list(centers.values())
    inter = [
        float(np.linalg.norm(center_list[i] - center_list[j]))
        for i in range(len(center_list))
        for j in range(i + 1, len(center_list))
    ]
    avg_intra = float(np.mean(intra)) if intra else 0.0
    avg_inter = float(np.mean(inter)) if inter else 0.0

    return {
        "silhouette_features": sil_features,
        "silhouette_umap": sil_embedding,
        "adjusted_rand_index": ari,
        "avg_intra_distance": avg_intra,
        "avg_inter_distance": avg_inter,
        "separation_ratio": avg_inter / avg_intra if avg_intra > 0 else 0.0,
        "n_samples": len(features),
        "n_features": features.shape[1],
        "n_classes": n_clusters,
        "sampled_for_computation": len(features) > sample_size,
    }


def assess_quality(metrics: Dict) -> Tuple[str, list]:
    """Rubric grade with the reference's exact thresholds
    (`umap_visualization.py:110-164`)."""
    score = 0
    feedback = []

    sil = metrics["silhouette_features"]
    if sil > 0.7:
        score, fb = score + 3, "Excellent cluster cohesion"
    elif sil > 0.5:
        score, fb = score + 2, "Good cluster cohesion"
    elif sil > 0.2:
        score, fb = score + 1, "Fair cluster cohesion"
    else:
        fb = "Poor cluster cohesion"
    feedback.append(fb)

    sep = metrics["separation_ratio"]
    if sep > 3:
        score, fb = score + 3, "Excellent class separation"
    elif sep > 2:
        score, fb = score + 2, "Good class separation"
    elif sep > 1.5:
        score, fb = score + 1, "Fair class separation"
    else:
        fb = "Poor class separation"
    feedback.append(fb)

    ari = metrics["adjusted_rand_index"]
    if ari > 0.8:
        score, fb = score + 3, "Excellent clustering agreement"
    elif ari > 0.6:
        score, fb = score + 2, "Good clustering agreement"
    elif ari > 0.4:
        score, fb = score + 1, "Fair clustering agreement"
    else:
        fb = "Poor clustering agreement"
    feedback.append(fb)

    if score >= 7:
        quality = "Excellent"
    elif score >= 5:
        quality = "Good"
    elif score >= 3:
        quality = "Fair"
    else:
        quality = "Poor"
    return quality, feedback


def create_basic_plot(embedding, labels, output_dir):
    plt.figure(figsize=(10, 8))
    plt.scatter(embedding[:, 0], embedding[:, 1], c=labels, cmap="Spectral", s=5)
    plt.colorbar()
    plt.title("UMAP projection of learned features")
    plt.xlabel("UMAP 1")
    plt.ylabel("UMAP 2")
    plt.savefig(
        os.path.join(output_dir, "umap_visualization.png"), dpi=150, bbox_inches="tight"
    )
    plt.close()


def create_comprehensive_analysis(embedding, labels, output_path):
    """4-panel figure: labels / density / kmeans-in-embedding / legend view."""
    labels = np.asarray(labels)
    fig, axes = plt.subplots(2, 2, figsize=(15, 12))

    sc = axes[0, 0].scatter(
        embedding[:, 0], embedding[:, 1], c=labels, cmap="tab10", s=15, alpha=0.7
    )
    axes[0, 0].set_title("UMAP Projection by True Labels")
    plt.colorbar(sc, ax=axes[0, 0])

    axes[0, 1].hexbin(embedding[:, 0], embedding[:, 1], gridsize=30, cmap="Blues")
    axes[0, 1].set_title("UMAP Density Plot")

    n_clusters = len(np.unique(labels))
    clusters = KMeans(n_clusters=n_clusters, random_state=42, n_init=10).fit_predict(
        embedding
    )
    sc3 = axes[1, 0].scatter(
        embedding[:, 0], embedding[:, 1], c=clusters, cmap="tab10", s=15, alpha=0.7
    )
    axes[1, 0].set_title("K-means Clusters in UMAP Space")
    plt.colorbar(sc3, ax=axes[1, 0])

    colors = plt.cm.tab10(np.linspace(0, 1, n_clusters))
    for i, label in enumerate(np.unique(labels)):
        mask = labels == label
        axes[1, 1].scatter(
            embedding[mask, 0], embedding[mask, 1], c=[colors[i]],
            label=f"Class {label}", s=15, alpha=0.7,
        )
    axes[1, 1].set_title("UMAP Projection with Class Labels")
    axes[1, 1].legend(bbox_to_anchor=(1.05, 1), loc="upper left")

    for ax in axes.flat:
        ax.set_xlabel("UMAP 1")
        ax.set_ylabel("UMAP 2")
    plt.tight_layout()
    plt.savefig(output_path, dpi=150, bbox_inches="tight")
    plt.close()


def save_results(metrics, quality, feedback, output_dir):
    rows = [
        ("Overall Quality", quality, f"Features are {quality.lower()} quality"),
        ("Silhouette Score (Features)", f"{metrics['silhouette_features']:.4f}", "Higher is better (max: 1.0)"),
        ("Silhouette Score (UMAP)", f"{metrics['silhouette_umap']:.4f}", "Higher is better (max: 1.0)"),
        ("Adjusted Rand Index", f"{metrics['adjusted_rand_index']:.4f}", "Higher is better (max: 1.0)"),
        ("Average Intra-class Distance", f"{metrics['avg_intra_distance']:.4f}", "Distance within classes (lower is better)"),
        ("Average Inter-class Distance", f"{metrics['avg_inter_distance']:.4f}", "Distance between classes (higher is better)"),
        ("Separation Ratio", f"{metrics['separation_ratio']:.4f}", "Inter/Intra ratio (higher is better)"),
        ("Number of Samples", metrics["n_samples"], "Total data points analyzed"),
        ("Number of Features", metrics["n_features"], "Feature dimensionality"),
        ("Number of Classes", metrics["n_classes"], "Number of unique classes"),
    ]
    for i, fb in enumerate(feedback):
        rows.append((f"Quality Indicator {i + 1}", "✓", fb))
    if metrics.get("sampled_for_computation", False):
        rows.append(
            ("Computation Method", "Sampled (2000 points)",
             "Large dataset - used sampling for expensive computations")
        )

    df = pd.DataFrame(rows, columns=["Metric", "Value", "Interpretation"])
    df.to_csv(os.path.join(output_dir, "umap_feature_quality_results.csv"), index=False)

    with open(os.path.join(output_dir, "umap_feature_quality_report.txt"), "w") as f:
        f.write("UMAP Feature Quality Analysis Report\n")
        f.write("=" * 40 + "\n\n")
        f.write(f"Overall Assessment: {quality}\n\n")
        f.write("Detailed Metrics:\n")
        f.write("-" * 20 + "\n")
        for _, row in df.iterrows():
            if "Quality Indicator" not in row["Metric"]:
                f.write(f"{row['Metric']}: {row['Value']}\n")
                f.write(f"  → {row['Interpretation']}\n\n")
        f.write("Quality Indicators:\n")
        f.write("-" * 20 + "\n")
        for fb in feedback:
            f.write(f"• {fb}\n")


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
    """Rotating 3D scatter GIF (90 frames at 4° steps by default,
    `umap_visualization.py:378-447`)."""
    os.makedirs(output_dir, exist_ok=True)
    embedding = _project(np.asarray(features), 3, umap_params)
    labels = np.asarray(labels)

    from PIL import Image
    import io

    fig = plt.figure(figsize=(12, 9))
    ax = fig.add_subplot(111, projection="3d")
    frames = []
    for angle in range(0, 360, step_degrees):
        ax.clear()
        ax.scatter(
            embedding[:, 0], embedding[:, 1], embedding[:, 2],
            c=labels, cmap="Spectral", s=5, alpha=0.7,
        )
        ax.view_init(elev=20, azim=angle)
        ax.set_title(f"3D UMAP - Rotation {angle}°")
        ax.set_xlabel("UMAP 1")
        ax.set_ylabel("UMAP 2")
        ax.set_zlabel("UMAP 3")
        buf = io.BytesIO()
        fig.savefig(buf, format="png", dpi=80)
        buf.seek(0)
        frames.append(Image.open(buf).convert("P"))
    plt.close(fig)

    gif_path = os.path.join(output_dir, "umap_3d_rotation.gif")
    frames[0].save(
        gif_path, save_all=True, append_images=frames[1:], duration=100, loop=0
    )
    logger.info("3D animation saved to: %s", gif_path)
    return embedding

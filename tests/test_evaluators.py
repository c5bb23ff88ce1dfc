"""Evaluator tests: on-device KNN vs sklearn oracle, linear probe, quality
rubric thresholds, metric math (PSNR/SSIM/DINO stats vs torch oracles).
"""

import numpy as np
import pytest

from vit_ssl_tpu.evaluators import (
    assess_quality,
    evaluate_feature_quality,
    run_knn_evaluation,
    run_linear_evaluation,
    run_umap_analysis,
)


def _clustered_features(n_per_class=40, classes=4, dim=16, spread=0.3, seed=0,
                        center_seed=42):
    centers = np.random.RandomState(center_seed).randn(classes, dim) * 3
    rs = np.random.RandomState(seed)
    feats, labels = [], []
    for c in range(classes):
        feats.append(centers[c] + rs.randn(n_per_class, dim) * spread)
        labels.append(np.full(n_per_class, c))
    return np.concatenate(feats).astype(np.float32), np.concatenate(labels)


def test_knn_matches_sklearn():
    sklearn = pytest.importorskip("sklearn")
    from sklearn.neighbors import KNeighborsClassifier

    train_f, train_y = _clustered_features(seed=0, spread=1.5)
    val_f, val_y = _clustered_features(seed=1, spread=1.5)

    result = run_knn_evaluation(train_f, train_y, val_f, val_y, num_classes=4)
    knn = KNeighborsClassifier(n_neighbors=4, metric="cosine")
    knn.fit(train_f, train_y)
    sk_preds = knn.predict(val_f)
    agreement = (result["predictions"] == sk_preds).mean()
    assert agreement > 0.98  # ties may break differently
    assert abs(result["accuracy"] - (sk_preds == val_y).mean()) < 0.02


def test_knn_perfect_on_separable():
    train_f, train_y = _clustered_features(spread=0.1)
    val_f, val_y = _clustered_features(seed=7, spread=0.1)
    result = run_knn_evaluation(train_f, train_y, val_f, val_y, num_classes=4)
    assert result["accuracy"] == 1.0
    assert result["num_neighbors"] == 4


def test_linear_probe_sklearn_and_optax_agree():
    train_f, train_y = _clustered_features(spread=0.5)
    val_f, val_y = _clustered_features(seed=3, spread=0.5)
    sk = run_linear_evaluation(train_f, train_y, val_f, val_y, backend="sklearn")
    ox = run_linear_evaluation(train_f, train_y, val_f, val_y, backend="optax")
    assert sk["accuracy"] > 0.95
    assert abs(sk["accuracy"] - ox["accuracy"]) < 0.05


def test_quality_rubric_thresholds():
    # reference thresholds (`umap_visualization.py:110-164`)
    q, fb = assess_quality(
        {"silhouette_features": 0.75, "separation_ratio": 3.5, "adjusted_rand_index": 0.9}
    )
    assert q == "Excellent" and len(fb) == 3
    q, _ = assess_quality(
        {"silhouette_features": 0.55, "separation_ratio": 2.2, "adjusted_rand_index": 0.65}
    )
    assert q == "Good"
    q, _ = assess_quality(
        {"silhouette_features": 0.1, "separation_ratio": 1.0, "adjusted_rand_index": 0.1}
    )
    assert q == "Poor"


def test_umap_analysis_artifacts(tmp_path):
    feats, labels = _clustered_features(n_per_class=30)
    embedding, metrics, quality, feedback = run_umap_analysis(
        feats, labels, str(tmp_path)
    )
    assert embedding.shape == (120, 2)
    assert metrics["n_classes"] == 4
    assert quality in {"Excellent", "Good", "Fair", "Poor"}
    for fname in [
        "umap_visualization.png",
        "comprehensive_umap_analysis.png",
        "umap_feature_quality_results.csv",
        "umap_feature_quality_report.txt",
    ]:
        assert (tmp_path / fname).exists(), fname


def test_feature_quality_metrics_sane():
    feats, labels = _clustered_features(spread=0.1)
    emb = feats[:, :2]
    metrics = evaluate_feature_quality(feats, labels, emb)
    assert metrics["silhouette_features"] > 0.8
    assert metrics["separation_ratio"] > 3
    assert metrics["adjusted_rand_index"] > 0.9


# --- device-side metric ingredients vs torch oracles -----------------------


def test_psnr_matches_direct_formula():
    import jax.numpy as jnp

    from vit_ssl_tpu.utils.metrics import PSNRMetric, psnr_stats

    rs = np.random.RandomState(0)
    preds = rs.rand(2, 8, 12).astype(np.float32)
    targets = rs.rand(2, 8, 12).astype(np.float32)
    mask = rs.rand(2, 8) > 0.5
    sse, cnt = psnr_stats(
        jnp.asarray(preds), jnp.asarray(targets), jnp.asarray(mask)[..., None]
    )
    val = PSNRMetric().compute(psnr_sse=float(sse), psnr_count=float(cnt))
    mse = ((preds[mask] - targets[mask]) ** 2).mean()
    np.testing.assert_allclose(val, -10 * np.log10(mse), rtol=1e-5)


def test_dino_stats_match_torch():
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from vit_ssl_tpu.utils.metrics import dino_distribution_stats

    rs = np.random.RandomState(0)
    t = rs.randn(2, 4, 8).astype(np.float32)
    s = rs.randn(3, 4, 8).astype(np.float32)
    c = rs.randn(1, 8).astype(np.float32)
    stats = {k: float(v) for k, v in dino_distribution_stats(
        jnp.asarray(t), jnp.asarray(s), jnp.asarray(c)
    ).items()}

    tt, st, ct = torch.from_numpy(t), torch.from_numpy(s), torch.from_numpy(c)
    np.testing.assert_allclose(stats["CenterNorm"], float(torch.linalg.norm(ct)), rtol=1e-5)
    np.testing.assert_allclose(stats["TeacherSTD"], float(tt.flatten().std()), rtol=1e-5)
    np.testing.assert_allclose(stats["StudentVar"], float(st.flatten().var()), rtol=1e-5)

    # reference CosineSim math (`utils/metrics.py:127-156`)
    tn = torch.linalg.norm(tt, dim=-1).unsqueeze(1)
    sn = torch.linalg.norm(st, dim=-1).unsqueeze(0)
    dot = (tt.unsqueeze(1) * st.unsqueeze(0)).sum(dim=-1)
    ref_cos = float((dot / (tn * sn + 1e-8)).mean())
    np.testing.assert_allclose(stats["CosineSim"], ref_cos, rtol=1e-5)


def test_precision_metric_returns_value():
    """The reference's Precision.compute is missing its return
    (`utils/metrics.py:246-256`) — ours must not be."""
    from vit_ssl_tpu.utils.metrics import Precision

    val = Precision().compute(
        y_pred=np.array([0, 1, 1, 0]), y_true=np.array([0, 1, 0, 0])
    )
    assert val is not None and 0 <= val <= 1


def test_ssim_identity_and_monotonicity():
    import jax.numpy as jnp

    from vit_ssl_tpu.utils.metrics import ssim_per_image

    rs = np.random.RandomState(0)
    x = rs.rand(3, 16, 16, 3).astype(np.float32)
    same = ssim_per_image(jnp.asarray(x), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(same), 1.0, atol=1e-4)

    small_noise = np.clip(x + rs.normal(0, 0.05, x.shape), 0, 1).astype(np.float32)
    big_noise = np.clip(x + rs.normal(0, 0.3, x.shape), 0, 1).astype(np.float32)
    s_small = float(np.mean(np.asarray(ssim_per_image(jnp.asarray(small_noise), jnp.asarray(x)))))
    s_big = float(np.mean(np.asarray(ssim_per_image(jnp.asarray(big_noise), jnp.asarray(x)))))
    assert 1.0 > s_small > s_big > -1.0


def test_ssim_small_patch_kernel_shrinks():
    import jax.numpy as jnp

    from vit_ssl_tpu.utils.metrics import ssim_per_image

    x = np.random.RandomState(0).rand(2, 4, 4, 3).astype(np.float32)
    out = ssim_per_image(jnp.asarray(x), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-4)

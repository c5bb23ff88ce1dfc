"""Native UMAP (evaluators/umap_native.py): the paper's pipeline pieces
and the end-to-end embedding quality on separable synthetic clusters."""

import numpy as np
import pytest
from sklearn.metrics import silhouette_score

from vit_ssl_tpu.evaluators.umap_native import (
    NativeUMAP,
    _fit_ab,
    _fuzzy_simplicial_set,
    _knn,
    _smooth_knn_calibration,
)


def _clusters(n_per=100, d=32, k=3, seed=0, sep=8.0):
    rs = np.random.RandomState(seed)
    centers = rs.randn(k, d) * sep
    x = np.concatenate([centers[i] + rs.randn(n_per, d) for i in range(k)])
    y = np.repeat(np.arange(k), n_per)
    return x, y


class TestGraph:
    def test_knn_exact(self):
        x, _ = _clusters(n_per=30)
        idx, dists = _knn(x, 5, "euclidean")
        # brute-force check for a few rows
        full = np.linalg.norm(x[:, None] - x[None], axis=-1)
        np.fill_diagonal(full, np.inf)
        for i in (0, 17, 59):
            expect = np.sort(full[i])[:5]
            np.testing.assert_allclose(np.sort(dists[i]), expect, rtol=1e-6)
            assert i not in idx[i]

    def test_knn_sorted_ascending(self):
        x, _ = _clusters(n_per=25)
        _, dists = _knn(x, 6, "euclidean")
        assert (np.diff(dists, axis=1) >= -1e-9).all()

    def test_calibration_hits_log2k(self):
        """sigma solves sum_j exp(-(d - rho)/sigma) = log2(k)."""
        x, _ = _clusters(n_per=40)
        k = 10
        _, dists = _knn(x, k, "euclidean")
        rho, sigma = _smooth_knn_calibration(dists, k)
        psum = np.exp(
            -np.maximum(dists - rho[:, None], 0.0) / sigma[:, None]
        ).sum(axis=1)
        np.testing.assert_allclose(psum, np.log2(k), rtol=0.05)

    def test_fuzzy_set_symmetric_weights_in_unit_interval(self):
        x, _ = _clusters(n_per=30)
        idx, dists = _knn(x, 5, "euclidean")
        rho, sigma = _smooth_knn_calibration(dists, 5)
        heads, tails, w = _fuzzy_simplicial_set(idx, dists, rho, sigma)
        # both directed copies of every symmetrised edge (umap-learn's COO
        # layout — repulsion is head-only, so every endpoint must be a head)
        assert (heads != tails).all()  # no self-edges
        fwd = {(int(h), int(t)): float(v) for h, t, v in zip(heads, tails, w)}
        for (h, t), v in fwd.items():
            assert (t, h) in fwd and abs(fwd[(t, h)] - v) < 1e-12
        assert (w > 0).all() and (w <= 1.0 + 1e-9).all()


class TestCurve:
    def test_ab_matches_published_defaults(self):
        """min_dist=0.1, spread=1.0 give the well-known a~1.58, b~0.90."""
        a, b = _fit_ab(0.1, 1.0)
        assert abs(a - 1.577) < 0.05
        assert abs(b - 0.895) < 0.05


class TestEmbedding:
    def test_separates_clusters(self):
        x, y = _clusters(n_per=80, d=48, k=3)
        emb = NativeUMAP(n_components=2, n_epochs=200,
                         random_state=0).fit_transform(x)
        assert emb.shape == (240, 2)
        assert np.isfinite(emb).all()
        assert silhouette_score(emb, y) > 0.5

    def test_deterministic_under_seed(self):
        x, _ = _clusters(n_per=40)
        a = NativeUMAP(n_epochs=50, random_state=7).fit_transform(x)
        b = NativeUMAP(n_epochs=50, random_state=7).fit_transform(x)
        np.testing.assert_array_equal(a, b)

    def test_3d_and_cosine_metric(self):
        x, y = _clusters(n_per=50, d=24)
        emb = NativeUMAP(n_components=3, metric="cosine", n_epochs=100,
                         random_state=1).fit_transform(x)
        assert emb.shape == (150, 3)
        assert silhouette_score(emb, y) > 0.3

    def test_tiny_input_degenerate(self):
        emb = NativeUMAP(n_components=2).fit_transform(np.zeros((2, 8)))
        assert emb.shape == (2, 2)


class TestIntegration:
    def test_embedding_analysis_uses_native(self):
        from vit_ssl_tpu.evaluators import embedding_analysis as ea

        if ea._HAVE_UMAP:  # pragma: no cover - env without umap-learn
            pytest.skip("umap-learn installed; native path not selected")
        assert ea.projector_name() == "UMAP (native)"
        x, y = _clusters(n_per=40, d=16)
        emb = ea._project(x, 2, {"n_epochs": 100})
        assert emb.shape == (120, 2)
        assert silhouette_score(emb, y) > 0.4


class TestFidelity:
    """Quantitative manifold-fidelity validation (VERDICT r2 item 8):
    trustworthiness/continuity on known manifolds with thresholds, plus
    fixed-seed layout reproducibility. umap-learn is absent from this
    image, so standard metrics stand in for a golden comparison."""

    def test_swiss_roll_trustworthiness_and_continuity(self):
        from sklearn.datasets import make_swiss_roll
        from sklearn.manifold import trustworthiness

        x, _ = make_swiss_roll(n_samples=400, noise=0.05, random_state=0)
        emb = NativeUMAP(
            n_components=2, n_neighbors=15, n_epochs=300, random_state=0
        ).fit_transform(x)
        # trustworthiness: embedding neighbours are true neighbours;
        # continuity: true neighbours stay neighbours (role-swapped
        # trustworthiness). umap-learn scores ~0.95+ here; 0.85/0.85 are
        # conservative floors that still catch a broken layout.
        t = trustworthiness(x, emb, n_neighbors=12)
        c = trustworthiness(emb, x, n_neighbors=12)
        assert t > 0.85, f"trustworthiness {t:.3f}"
        assert c > 0.85, f"continuity {c:.3f}"

    def test_gaussian_mixture_trustworthiness(self):
        from sklearn.manifold import trustworthiness

        x, _ = _clusters(n_per=100, d=32, k=4)
        emb = NativeUMAP(
            n_components=2, n_neighbors=15, n_epochs=250, random_state=1
        ).fit_transform(x)
        t = trustworthiness(x, emb, n_neighbors=12)
        assert t > 0.9, f"trustworthiness {t:.3f}"

    def test_fixed_seed_layout_reproducible(self):
        x, _ = _clusters(n_per=40, d=16, k=3)
        kw = dict(n_components=2, n_epochs=100, random_state=7)
        emb1 = NativeUMAP(**kw).fit_transform(x)
        emb2 = NativeUMAP(**kw).fit_transform(x)
        np.testing.assert_array_equal(emb1, emb2)

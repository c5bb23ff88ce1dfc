"""Native UMAP: the paper's algorithm, layout-optimised with JAX.

The reference's embedding analysis is built on ``umap-learn``
(`/root/reference/evaluators/unsupervised_evaluators/umap_visualization.py:11`),
which is not installed in this environment. Rather than shipping a PCA
stand-in, this module implements UMAP (McInnes, Healy & Melville,
arXiv:1802.03426) from the paper's construction — written from scratch,
no umap-learn code:

1. exact kNN graph (BLAS distance matrix; fine at evaluator scale),
2. per-point smooth-kNN calibration — ``rho_i`` = nearest-neighbor
   distance, ``sigma_i`` binary-searched so the smoothed membership sums
   to ``log2(k)`` (the paper's Algorithm 3),
3. fuzzy simplicial set symmetrisation ``W + Wt - W o Wt``,
4. the ``1 / (1 + a d^(2b))`` low-dimensional curve with ``a, b`` fitted
   from ``min_dist``/``spread`` by least squares,
5. attract/repulse SGD layout with negative sampling and a linearly
   decaying learning rate, PCA-initialised.

Documented divergences from umap-learn (module convention: every
behavioral divergence is written down):

- **Batch-synchronous SGD.** umap-learn applies asynchronous per-edge
  Numba updates; here each epoch is one jitted JAX step — every active
  edge computes its gradient against the same epoch-start positions and
  updates scatter-add (`jnp` ``.at[].add``). umap-learn's own parallel
  mode accepts the same reordering races; the objective is identical.
- **Bernoulli edge schedule.** An edge with weight ``w`` participates
  each epoch with probability ``w / w_max`` — equal in expectation to
  umap-learn's ``epochs_per_sample`` counters, but vectorisable.
- **PCA initialisation** instead of spectral (umap-learn exposes both;
  spectral needs a sparse eigensolver this grid keeps off the hot path).

The layout loop is a ``lax.fori_loop`` over static-shape edge arrays, so
the whole optimisation compiles to one XLA program and runs on the TPU
when one is attached (CPU otherwise — tests run there).
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)


def _pairwise_sq_dists(x: np.ndarray) -> np.ndarray:
    sq = np.sum(x * x, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    np.maximum(d2, 0.0, out=d2)
    return d2


def _knn(x: np.ndarray, k: int, metric: str):
    """Exact kNN (indices, distances), self excluded."""
    if metric == "cosine":
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        d = 1.0 - xn @ xn.T
        np.maximum(d, 0.0, out=d)
    else:  # euclidean
        d = np.sqrt(_pairwise_sq_dists(x))
    np.fill_diagonal(d, np.inf)
    idx = np.argpartition(d, k, axis=1)[:, :k]
    row = np.arange(x.shape[0])[:, None]
    order = np.argsort(d[row, idx], axis=1)
    idx = idx[row, order]
    return idx, d[row, idx]


def _smooth_knn_calibration(knn_dists: np.ndarray, k: int,
                            n_iter: int = 64, bandwidth: float = 1.0):
    """Per-point (rho, sigma): Algorithm 3's binary search, vectorised."""
    rho = knn_dists[:, 0].copy()
    target = np.log2(k) * bandwidth
    lo = np.zeros(len(knn_dists))
    hi = np.full(len(knn_dists), np.inf)
    sigma = np.ones(len(knn_dists))
    d = np.maximum(knn_dists - rho[:, None], 0.0)
    for _ in range(n_iter):
        psum = np.exp(-d / sigma[:, None]).sum(axis=1)
        too_big = psum > target
        hi = np.where(too_big, sigma, hi)
        lo = np.where(too_big, lo, sigma)
        sigma = np.where(
            too_big, (lo + sigma) / 2.0,
            np.where(np.isinf(hi), sigma * 2.0, (sigma + hi) / 2.0),
        )
    # umap-learn floors sigma at a fraction of the mean distance
    mean_d = np.mean(knn_dists)
    sigma = np.maximum(sigma, 1e-3 * mean_d)
    return rho, sigma


def _fuzzy_simplicial_set(knn_idx: np.ndarray, knn_dists: np.ndarray,
                          rho: np.ndarray, sigma: np.ndarray):
    """Symmetrised membership matrix as COO arrays (heads, tails, weights)."""
    n, k = knn_idx.shape
    w = np.exp(-np.maximum(knn_dists - rho[:, None], 0.0) / sigma[:, None])
    rows = np.repeat(np.arange(n), k)
    cols = knn_idx.ravel()
    vals = w.ravel()

    from scipy.sparse import coo_matrix

    m = coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    mt = m.T.tocsr()
    sym = m + mt - m.multiply(mt)  # probabilistic t-conorm
    sym = sym.tocoo()
    # keep BOTH directed copies of every symmetrised edge, like umap-learn's
    # COO graph: attraction then pulls each endpoint twice per undirected
    # edge and — crucially — negative-sample repulsion (applied to edge
    # heads only) reaches every point, not just the lower-index endpoint
    return sym.row, sym.col, np.asarray(sym.data)


def _fit_ab(min_dist: float, spread: float):
    """Least-squares fit of 1/(1+a d^(2b)) to the min_dist/spread curve."""
    from scipy.optimize import curve_fit

    xv = np.linspace(0, spread * 3, 300)
    yv = np.where(xv <= min_dist, 1.0, np.exp(-(xv - min_dist) / spread))

    def curve(x, a, b):
        return 1.0 / (1.0 + a * x ** (2 * b))

    (a, b), _ = curve_fit(curve, xv, yv, p0=(1.0, 1.0), maxfev=10000)
    return float(a), float(b)


def _pca_init(x: np.ndarray, n_components: int, random_state: int):
    from sklearn.decomposition import PCA

    emb = PCA(n_components=n_components, random_state=random_state).fit_transform(x)
    # scale to the +-10 box umap-learn uses for its init
    emb = 10.0 * emb / max(np.abs(emb).max(), 1e-12)
    return emb.astype(np.float32)


def _optimize_layout(embedding: np.ndarray, heads: np.ndarray,
                     tails: np.ndarray, weights: np.ndarray,
                     n_epochs: int, a: float, b: float,
                     learning_rate: float, negative_sample_rate: int,
                     random_state: int) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    n, dim = embedding.shape
    heads_j = jnp.asarray(heads, jnp.int32)
    tails_j = jnp.asarray(tails, jnp.int32)
    prob = jnp.asarray(weights / weights.max(), jnp.float32)
    e = len(heads)
    nsr = int(negative_sample_rate)

    def epoch_step(epoch, carry):
        emb, rng = carry
        rng, r_act, r_neg = jax.random.split(rng, 3)
        alpha = learning_rate * (1.0 - epoch / n_epochs)
        active = jax.random.uniform(r_act, (e,)) < prob  # Bernoulli schedule

        yh = emb[heads_j]
        yt = emb[tails_j]
        diff = yh - yt
        d2 = jnp.sum(diff * diff, axis=1, keepdims=True)
        attr = (-2.0 * a * b * d2 ** (b - 1.0)) / (a * d2 ** b + 1.0)
        attr = jnp.where(d2 > 0.0, attr, 0.0)
        g = jnp.clip(attr * diff, -4.0, 4.0) * active[:, None] * alpha
        emb = emb.at[heads_j].add(g)
        emb = emb.at[tails_j].add(-g)

        # negative sampling: repulse each active edge's head from random
        # points (the paper applies repulsion to the head only; both
        # directed copies of each edge are present, so every endpoint is
        # a head). A sampled neg equal to the head itself is masked out
        # (umap-learn skips j == k), so the 4.0 coincident-point kick only
        # ever applies to distinct points sharing a location.
        negs = jax.random.randint(r_neg, (e, nsr), 0, n)
        yh = emb[heads_j][:, None, :]
        yn = emb[negs]
        diff_n = yh - yn
        d2n = jnp.sum(diff_n * diff_n, axis=-1, keepdims=True)
        rep = (2.0 * b) / ((0.001 + d2n) * (a * d2n ** b + 1.0))
        gn = jnp.where(d2n > 0.0, jnp.clip(rep * diff_n, -4.0, 4.0), 4.0)
        not_self = (negs != heads_j[:, None])[..., None]
        gn = gn * not_self * active[:, None, None] * alpha
        emb = emb.at[heads_j].add(jnp.sum(gn, axis=1))
        return emb, rng

    emb0 = jnp.asarray(embedding, jnp.float32)
    rng0 = jax.random.PRNGKey(random_state)
    final, _ = jax.lax.fori_loop(0, n_epochs, epoch_step, (emb0, rng0))
    return np.asarray(jax.device_get(final))


class NativeUMAP:
    """Drop-in subset of the ``umap.UMAP`` interface (fit_transform)."""

    def __init__(self, n_components: int = 2, n_neighbors: int = 15,
                 min_dist: float = 0.1, spread: float = 1.0,
                 metric: str = "euclidean", n_epochs: Optional[int] = None,
                 learning_rate: float = 1.0, negative_sample_rate: int = 5,
                 random_state: int = 42):
        self.n_components = int(n_components)
        self.n_neighbors = int(n_neighbors)
        self.min_dist = float(min_dist)
        self.spread = float(spread)
        self.metric = str(metric)
        self.n_epochs = n_epochs
        self.learning_rate = float(learning_rate)
        self.negative_sample_rate = int(negative_sample_rate)
        self.random_state = int(random_state)

    def fit_transform(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float64)
        n = x.shape[0]
        if n <= self.n_components + 1:
            return np.zeros((n, self.n_components), np.float32)
        k = min(self.n_neighbors, n - 1)
        n_epochs = self.n_epochs or (500 if n <= 10_000 else 200)

        knn_idx, knn_dists = _knn(x, k, self.metric)
        rho, sigma = _smooth_knn_calibration(knn_dists, k)
        heads, tails, weights = _fuzzy_simplicial_set(
            knn_idx, knn_dists, rho, sigma
        )
        a, b = _fit_ab(self.min_dist, self.spread)
        init = _pca_init(x, self.n_components, self.random_state)
        logger.info(
            "NativeUMAP: n=%d k=%d edges=%d epochs=%d (a=%.3f b=%.3f)",
            n, k, len(heads), n_epochs, a, b,
        )
        return _optimize_layout(
            init, heads, tails, weights, n_epochs, a, b,
            self.learning_rate, self.negative_sample_rate, self.random_state,
        )

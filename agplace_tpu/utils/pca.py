"""PCA / whitening for descriptor dimensionality reduction.

Reference equivalents: ``util.compute_pca`` (sklearn PCA over 2^14 sampled
features, ``/root/reference/util.py:65-78``) and AnyLoc's ``reduce_pca``
(lower-dim + optional whitening, ``anyloc/utilities.py:528-560``).
Implemented with an SVD in numpy; transform is a single matmul so it can run
on-device too.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class PCA:
    def __init__(self, dim: int, whiten: bool = False):
        self.dim = dim
        self.whiten = whiten
        self.mean_: Optional[np.ndarray] = None
        self.components_: Optional[np.ndarray] = None
        self.scale_: Optional[np.ndarray] = None

    def fit(self, x: np.ndarray) -> "PCA":
        x = np.asarray(x, np.float64)
        if min(x.shape) < self.dim:
            # SVD yields only min(n, d) components; silently returning
            # fewer would change transform()'s output dimensionality
            # (sklearn PCA raises here too)
            raise ValueError(
                f"PCA dim {self.dim} needs a fit matrix with >= {self.dim} "
                f"rows and columns, got {x.shape}")
        self.mean_ = x.mean(axis=0)
        xc = x - self.mean_
        _, s, vt = np.linalg.svd(xc, full_matrices=False)
        self.components_ = vt[: self.dim]
        n = max(x.shape[0] - 1, 1)
        var = (s[: self.dim] ** 2) / n
        self.scale_ = np.sqrt(np.maximum(var, 1e-12)) if self.whiten else None
        return self

    def transform(self, x: np.ndarray) -> np.ndarray:
        y = (np.asarray(x, np.float64) - self.mean_) @ self.components_.T
        if self.scale_ is not None:
            y = y / self.scale_
        return y.astype(np.float32)

    def fit_transform(self, x: np.ndarray) -> np.ndarray:
        return self.fit(x).transform(x)


def compute_pca(features: np.ndarray, pca_dim: int,
                num_samples: int = 2 ** 14, seed: int = 0) -> PCA:
    """util.compute_pca semantics: fit on up to 2^14 randomly sampled
    descriptor rows."""
    f = np.asarray(features)
    if len(f) > num_samples:
        idx = np.random.default_rng(seed).choice(len(f), num_samples,
                                                 replace=False)
        f = f[idx]
    return PCA(pca_dim).fit(f)


def reduce_pca(train_descs: np.ndarray, test_descs: np.ndarray,
               lower_dim: int, whiten: bool = True):
    """anyloc.utilities.reduce_pca: fit on train, transform both."""
    pca = PCA(lower_dim, whiten=whiten).fit(train_descs)
    return pca.transform(train_descs), pca.transform(test_descs)

"""PCA/KMeans clustering analysis vs sklearn references."""

import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.decomposition import PCA

from onestop_tpu.analysis.clustering import kmeans, pca_fit_transform


def test_pca_matches_sklearn(rng):
    x = rng.random((40, 300)).astype(np.float32)
    scores, explained = pca_fit_transform(jnp.asarray(x), 5)
    ref = PCA(n_components=5).fit(x)
    ref_scores = ref.transform(x)
    # components are sign-ambiguous; compare |scores| columnwise
    np.testing.assert_allclose(np.abs(np.asarray(scores)), np.abs(ref_scores),
                               rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(explained), ref.explained_variance_,
                               rtol=1e-3)


def test_kmeans_two_blobs(rng):
    a = rng.normal(0, 0.3, (30, 4)) + np.array([3, 0, 0, 0])
    b = rng.normal(0, 0.3, (25, 4)) - np.array([3, 0, 0, 0])
    x = np.concatenate([a, b]).astype(np.float32)
    labels, centers = kmeans(jnp.asarray(x), k=2, seed=0)
    labels = np.asarray(labels)
    # perfect separation (up to label permutation)
    first = labels[:30]
    assert len(np.unique(first)) == 1
    assert len(np.unique(labels[30:])) == 1
    assert labels[0] != labels[-1]

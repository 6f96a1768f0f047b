"""Latent clustering as JAX linear algebra.

The reference extracts activations at U-Net layer 'conv2d_9', flattens,
runs sklearn ``PCA(n_components=1000)`` + ``KMeans(n_clusters=2)``, then
evaluates the model separately on each cluster (easy/hard slice hypothesis,
``holdout.py:1386-1496``). Here:

- PCA via the N×N gram-matrix eigendecomposition (N samples ≪ D features:
  the flattened activations are ~1.6M-dim, so the gram trick is the only
  sane formulation; it is exact),
- KMeans with k-means++ seeding under ``lax.while_loop``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def pca_fit_transform(x: Array, n_components: int) -> tuple[Array, Array]:
    """(scores (N, k), explained_variance (k,)) of centered x (N, D).

    Exact PCA via eigh of the N×N gram matrix. k is capped at N-1 non-trivial
    components (sklearn caps at min(N, D) similarly)."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    k = min(n_components, n)
    xc = x - jnp.mean(x, axis=0, keepdims=True)
    gram = xc @ xc.T  # (N, N)
    evals, evecs = jnp.linalg.eigh(gram)
    order = jnp.argsort(evals)[::-1][:k]
    evals = jnp.maximum(evals[order], 0.0)
    evecs = evecs[:, order]
    # scores = U * sqrt(lambda): the projection onto principal axes
    scores = evecs * jnp.sqrt(evals)[None, :]
    explained = evals / jnp.maximum(n - 1, 1)
    return scores, explained


@functools.partial(jax.jit, static_argnames=("k", "max_iter"))
def kmeans(x: Array, k: int = 2, seed: int = 0, max_iter: int = 100):
    """Lloyd's KMeans with k-means++ init. Returns (labels (N,), centers (k, D))."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    key = jax.random.PRNGKey(seed)

    # k-means++ seeding
    k0, key = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, n)
    centers0 = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(x[first])

    def seed_step(i, carry):
        centers, key = carry
        d2 = jnp.min(
            jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, -1)
            + jnp.where(jnp.arange(k)[None, :] < i, 0.0, jnp.inf),
            axis=1,
        )
        key, sub = jax.random.split(key)
        probs = d2 / jnp.maximum(jnp.sum(d2), 1e-12)
        nxt = jax.random.choice(sub, n, p=probs)
        return centers.at[i].set(x[nxt]), key

    centers, _ = jax.lax.fori_loop(1, k, seed_step, (centers0, key))

    def assign(centers):
        d2 = jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, -1)
        return jnp.argmin(d2, axis=1)

    def cond(carry):
        centers, old, it = carry
        return jnp.logical_and(it < max_iter, jnp.any(assign(centers) != old))

    def body(carry):
        centers, _, it = carry
        labels = assign(centers)
        onehot = jax.nn.one_hot(labels, k, dtype=x.dtype)  # (N, k)
        sums = onehot.T @ x
        counts = jnp.sum(onehot, axis=0)[:, None]
        new_centers = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), centers)
        return new_centers, labels, it + 1

    init_labels = jnp.full((n,), -1).astype(assign(centers).dtype)
    centers, labels, _ = jax.lax.while_loop(cond, body, (centers, init_labels, 0))
    return assign(centers), centers


def latent_cluster_analysis(model, params, batch_stats, x_val, y_val,
                            layer_prefix: str = "dec0", n_components: int = 1000,
                            evaluate=None, batch_size: int = 32, seed: int = 0) -> dict:
    """The reference's clustering study: activations at the last decoder
    block (its 'conv2d_9' == our dec0_conv1) -> PCA -> KMeans(2) -> evaluate
    the model on each cluster separately (ref ``holdout.py:1386-1496``).

    evaluate: callable (x, y) -> dict of metrics, applied per cluster."""
    feats = []
    n = len(x_val)

    def _filter(mdl, method_name):
        name = getattr(mdl, "name", None) or ""
        return layer_prefix in name

    for i in range(0, n, batch_size):
        xb = jnp.asarray(x_val[i : i + batch_size])
        _, inter = model.apply(
            {"params": params, "batch_stats": batch_stats}, xb, train=False,
            capture_intermediates=_filter, mutable=["intermediates"],
        )
        leaves = jax.tree_util.tree_leaves(inter["intermediates"])
        # Conv module outputs are pre-activation; the reference's conv2d_9
        # activations are post-relu (Keras fuses the activation)
        feats.append(np.maximum(np.asarray(leaves[-1]), 0.0).reshape(len(xb), -1))
    feats = np.concatenate(feats, axis=0)

    scores, explained = pca_fit_transform(jnp.asarray(feats), n_components)
    labels, centers = kmeans(scores, k=2, seed=seed)
    labels = np.asarray(labels)

    out = {
        "labels": labels,
        "explained_variance": np.asarray(explained),
        "cluster_sizes": [int((labels == c).sum()) for c in (0, 1)],
    }
    if evaluate is not None:
        for c in (0, 1):
            sel = labels == c
            if sel.sum() > 0:
                out[f"cluster{c}_metrics"] = evaluate(x_val[sel], y_val[sel])
    return out

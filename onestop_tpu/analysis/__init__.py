"""Post-hoc analysis: latent-space clustering (PCA + KMeans on intermediate
U-Net activations — ref ``holdout.py:1386-1496``) and the visualization
suite (overlays, prediction galleries, training curves)."""

from onestop_tpu.analysis.clustering import pca_fit_transform, kmeans, latent_cluster_analysis

__all__ = ["pca_fit_transform", "kmeans", "latent_cluster_analysis"]

"""onestop_tpu — a TPU-native JAX framework for COVID-19 CT analysis.

A from-scratch rebuild of the capabilities of
``deadskull7/One-Stop-for-COVID-19-Infection-and-Lung-Segmentation-plus-Classification``
(reference layout surveyed in ``SURVEY.md``), designed TPU-first:

- preprocessing (CLAHE, lung-bbox cropping, resize, augmentation) as fused,
  jittable XLA/Pallas ops instead of per-slice OpenCV calls
  (ref: ``Scripts/task1_preprocessing_plus_unet_with_comments.py:163-376``),
- U-Net / U-Net++ / classifier CNN as pure-JAX (flax) models
  (ref: ``:853-916``, ``Scripts/task1_unet_plus_plus.py:860-950``,
  ``Scripts/task2_covid19_classifcation.py:747-780``),
- training with optax + cosine annealing under ``jit`` (ref: ``:970-1061``),
- threshold sweeps as a single vmapped on-device pass instead of the
  reference's recompile-and-evaluate loops (ref: ``:1196-1343``),
- 3/4-fold cross-validation fold-parallel over a ``jax.sharding.Mesh``.
"""

from onestop_tpu.version import __version__

__all__ = ["__version__"]

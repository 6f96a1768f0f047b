"""On-device augmentation with ``jax.random`` — the TPU replacement for the
reference's imgaug pipeline (``holdout.py:547-584``):

    iaa.Sequential([Fliplr(0.5), Flipud(0.2),
                    Sometimes(0.5, Affine(scale 0.8–1.2 per axis,
                    translate ±20% per axis, rotate ±40°, shear ±16°))],
                   random_order=True)

applied jointly to (image, segmentation-map) pairs. imgaug parity details:

- **Affine composition**: imgaug's Affine is skimage's ``AffineTransform``
  applied about the image center (shift ``(w/2-0.5, h/2-0.5)``), whose
  forward matrix is::

      [[sx·cos(r), -sy·sin(r+shear), tx],
       [sx·sin(r),  sy·cos(r+shear), ty],
       [0, 0, 1]]

  with r=rotation, shear = x-shear (imgaug's scalar shear), tx/ty the
  translate fractions × width/height. That exact parametrization is built
  here (``_affine_inverse``), with the inverse in closed form.
- **Random op order** (``AugmentConfig.random_order``, default True like the
  reference's ``random_order=True``): the application order of
  [Fliplr, Flipud, Affine] is a uniform random permutation. imgaug draws one
  permutation per *batch*; we draw per *sample* — each sample's marginal
  transform distribution is identical, only cross-sample correlation within
  a batch differs (finer-grained diversity, same law).
- **Single-warp execution**: flips are exact affine maps, and bilinear/
  nearest resampling of a flipped image equals resampling the original at
  flipped coordinates, so op-by-op application equals ONE inverse warp by
  the ordered product of the per-op inverse matrices. Ops that don't trigger
  contribute an exact identity, so a flip-only draw stays bit-exact (integer
  coordinates ⇒ the bilinear weights are exactly {0,1}).
- Out-of-frame pixels are 0 (imgaug ``mode='constant', cval=0`` defaults);
  segmentation maps resample nearest (imgaug's order-0 segmap default).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_I3 = jnp.eye(3, dtype=jnp.float32)


def _affine_inverse(key: jax.Array, h: int, w: int, cfg) -> Array:
    """Sample imgaug/skimage Affine parameters and return the closed-form
    INVERSE 3x3 matrix (output->input coords) of the centered transform
    T(c) @ A @ T(-c). No ``linalg.inv`` — an identity draw must stay exact."""
    ks = jax.random.split(key, 6)
    sx = jax.random.uniform(ks[0], (), minval=cfg.scale[0], maxval=cfg.scale[1])
    sy = jax.random.uniform(ks[1], (), minval=cfg.scale[0], maxval=cfg.scale[1])
    tx = jax.random.uniform(ks[2], (), minval=cfg.translate[0], maxval=cfg.translate[1]) * w
    ty = jax.random.uniform(ks[3], (), minval=cfg.translate[0], maxval=cfg.translate[1]) * h
    rot = jnp.deg2rad(jax.random.uniform(ks[4], (), minval=cfg.rotate_deg[0], maxval=cfg.rotate_deg[1]))
    shear = jnp.deg2rad(jax.random.uniform(ks[5], (), minval=cfg.shear_deg[0], maxval=cfg.shear_deg[1]))

    # skimage AffineTransform linear part L and translation t
    a = sx * jnp.cos(rot)
    b = -sy * jnp.sin(rot + shear)
    c = sx * jnp.sin(rot)
    d = sy * jnp.cos(rot + shear)
    det = a * d - b * c
    # L^-1 and t' = -L^-1 @ t  (closed form)
    ia, ib, ic, id_ = d / det, -b / det, -c / det, a / det
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)
    a_inv = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    a_inv = a_inv.at[0, 0].set(ia).at[0, 1].set(ib).at[0, 2].set(itx)
    a_inv = a_inv.at[1, 0].set(ic).at[1, 1].set(id_).at[1, 2].set(ity)

    # centered: (T(c) A T(-c))^-1 = T(c) A^-1 T(-c), imgaug center w/2-0.5
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    to_c = jnp.array([[1.0, 0.0, -cx], [0.0, 1.0, -cy], [0.0, 0.0, 1.0]])
    from_c = jnp.array([[1.0, 0.0, cx], [0.0, 1.0, cy], [0.0, 0.0, 1.0]])
    return from_c @ a_inv @ to_c


def _op_inverses(key: jax.Array, h: int, w: int, cfg) -> Array:
    """(3, 3, 3) stacked inverse matrices for [Fliplr, Flipud, Affine], each
    gated by its trigger probability (identity when not triggered). Flips are
    self-inverse and exactly representable."""
    k_lr, k_ud, k_aff_p, k_aff = jax.random.split(key, 4)
    flip_lr = jnp.array([[-1.0, 0.0, w - 1.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    flip_ud = jnp.array([[1.0, 0.0, 0.0], [0.0, -1.0, h - 1.0], [0.0, 0.0, 1.0]])
    m_lr = jnp.where(jax.random.uniform(k_lr) < cfg.p_fliplr, flip_lr, _I3)
    m_ud = jnp.where(jax.random.uniform(k_ud) < cfg.p_flipud, flip_ud, _I3)
    m_aff = jnp.where(jax.random.uniform(k_aff_p) < cfg.p_affine,
                      _affine_inverse(k_aff, h, w, cfg), _I3)
    return jnp.stack([m_lr, m_ud, m_aff])


def _pipeline_inverse(key: jax.Array, h: int, w: int, cfg) -> Array:
    """One inverse matrix for the whole [Fliplr, Flipud, Affine] pipeline in
    (randomly permuted, if cfg.random_order) application order: ops applied
    o1∘o2∘o3 invert as M1⁻¹ @ M2⁻¹ @ M3⁻¹."""
    k_ops, k_order = jax.random.split(key)
    invs = _op_inverses(k_ops, h, w, cfg)
    if getattr(cfg, "random_order", True):
        order = jax.random.permutation(k_order, 3)
        invs = invs[order]
    return invs[0] @ invs[1] @ invs[2]


def _warp(img: Array, inv: Array, order: int) -> Array:
    """Inverse-warp (H, W) image by 3x3 matrix; order 0=nearest, 1=bilinear."""
    h, w = img.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    sy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    inside = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)

    def sample_nearest():
        xi = jnp.clip(jnp.round(sx), 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(jnp.round(sy), 0, h - 1).astype(jnp.int32)
        return img.astype(jnp.float32)[yi, xi]

    def sample_bilinear():
        x0 = jnp.clip(jnp.floor(sx), 0, w - 1)
        y0 = jnp.clip(jnp.floor(sy), 0, h - 1)
        x1 = jnp.clip(x0 + 1, 0, w - 1)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        fx = jnp.clip(sx - x0, 0.0, 1.0)
        fy = jnp.clip(sy - y0, 0.0, 1.0)
        f = img.astype(jnp.float32)
        x0i, x1i, y0i, y1i = (a.astype(jnp.int32) for a in (x0, x1, y0, y1))
        v = (
            f[y0i, x0i] * (1 - fx) * (1 - fy)
            + f[y0i, x1i] * fx * (1 - fy)
            + f[y1i, x0i] * (1 - fx) * fy
            + f[y1i, x1i] * fx * fy
        )
        return v

    out = sample_nearest() if order == 0 else sample_bilinear()
    return jnp.where(inside, out, 0.0)


def random_augment_pair(key: jax.Array, image: Array, segmap: Array, cfg) -> tuple[Array, Array]:
    """Jointly augment one (H, W) image + segmentation map. Returns float32."""
    h, w = image.shape
    inv = _pipeline_inverse(key, h, w, cfg)
    return _warp(image, inv, order=1), _warp(segmap, inv, order=0)


def augment_batch(key: jax.Array, images: Array, segmaps: Array, cfg) -> tuple[Array, Array]:
    """vmapped joint augmentation over (B, H, W) batches."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(lambda k, i, s: random_augment_pair(k, i, s, cfg))(keys, images, segmaps)


def random_augment_image(key: jax.Array, image: Array, cfg) -> Array:
    """Image-only augmentation (the classifier path). Same pipeline as
    ``random_augment_pair`` without a segmentation map — this is the *fixed*
    form of the reference's task2 block, which augmented (image, mask) pairs
    and then shuffled images and masks independently, corrupting the
    label correspondence (ref task2:575-619; SURVEY.md §8 Q6). Labels ride
    along unchanged outside this function, so alignment is preserved by
    construction."""
    h, w = image.shape
    return _warp(image, _pipeline_inverse(key, h, w, cfg), order=1)


def augment_image_batch(key: jax.Array, images: Array, cfg) -> Array:
    """vmapped image-only augmentation over a (B, H, W) batch."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(lambda k, i: random_augment_image(k, i, cfg))(keys, images)


def sample_and_augment(key: jax.Array, images: Array, segmaps: Array | None, cfg):
    """Materialize ``cfg.n_samples`` augmented samples from random indices —
    the reference's aug-gallery block (``holdout.py:547-584``: draw 200
    (task1) / 100 (task2) / 50 (task3) random pairs, run the imgaug pipeline
    on them). The reference computes these and leaves the train-set merge
    commented out (SURVEY.md §8 Q7); callers here may concatenate the result
    onto the training arrays (runners' ``use_augmentation='concat'``).

    images: (N, H, W); segmaps: (N, H, W) or None (image-only / classifier).
    Returns (indices (n,), aug_images (n, H, W)[, aug_segmaps (n, H, W)]).
    """
    k_idx, k_aug = jax.random.split(key)
    idx = jax.random.randint(k_idx, (cfg.n_samples,), 0, images.shape[0])
    xi = jnp.take(images, idx, axis=0)
    if segmaps is None:
        return idx, augment_image_batch(k_aug, xi, cfg)
    si = jnp.take(segmaps, idx, axis=0)
    ai, asg = augment_batch(k_aug, xi, si, cfg)
    return idx, ai, asg

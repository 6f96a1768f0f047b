"""On-device augmentation with ``jax.random`` — the TPU replacement for the
reference's imgaug pipeline (``holdout.py:547-584``):

    Fliplr(0.5), Flipud(0.2), Sometimes(0.5, Affine(scale 0.8–1.2 per axis,
    translate ±20% per axis, rotate ±40°, shear ±16°)), random_order=True

applied jointly to (image, segmentation-map) pairs. Here the affine is an
inverse-warp gather about the image center: bilinear for images, nearest for
segmentation maps (imgaug's order-0 default for segmaps). Divergences from
imgaug (documented, and immaterial — the reference never merges augmented
samples into training, SURVEY.md §8 Q7): ops apply in fixed order
flip→affine rather than random order, and the affine composition is
scale·shear·rotate about the center.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _affine_matrix(key: jax.Array, h: int, w: int, cfg) -> Array:
    """Sample an inverse 3x3 affine (output->input coords) about the center."""
    ks = jax.random.split(key, 6)
    sx = jax.random.uniform(ks[0], (), minval=cfg.scale[0], maxval=cfg.scale[1])
    sy = jax.random.uniform(ks[1], (), minval=cfg.scale[0], maxval=cfg.scale[1])
    tx = jax.random.uniform(ks[2], (), minval=cfg.translate[0], maxval=cfg.translate[1]) * w
    ty = jax.random.uniform(ks[3], (), minval=cfg.translate[0], maxval=cfg.translate[1]) * h
    rot = jnp.deg2rad(jax.random.uniform(ks[4], (), minval=cfg.rotate_deg[0], maxval=cfg.rotate_deg[1]))
    shear = jnp.deg2rad(jax.random.uniform(ks[5], (), minval=cfg.shear_deg[0], maxval=cfg.shear_deg[1]))

    c, s = jnp.cos(rot), jnp.sin(rot)
    rotm = jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    shm = jnp.array([[1.0, -jnp.sin(shear), 0.0], [0.0, jnp.cos(shear), 0.0], [0.0, 0.0, 1.0]])
    scm = jnp.diag(jnp.stack([sx, sy, jnp.float32(1.0)]))
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    to_c = jnp.array([[1.0, 0.0, -cx], [0.0, 1.0, -cy], [0.0, 0.0, 1.0]])
    from_c = jnp.array([[1.0, 0.0, cx], [0.0, 1.0, cy], [0.0, 0.0, 1.0]])
    tr = jnp.array([[1.0, 0.0, 1.0], [0.0, 1.0, 1.0], [0.0, 0.0, 1.0]]).at[0, 2].set(tx).at[1, 2].set(ty)
    fwd = tr @ from_c @ rotm @ shm @ scm @ to_c
    return jnp.linalg.inv(fwd)


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
    k_lr, k_ud, k_aff_p, k_aff = jax.random.split(key, 4)
    img = image.astype(jnp.float32)
    seg = segmap.astype(jnp.float32)

    do_lr = jax.random.uniform(k_lr) < cfg.p_fliplr
    img = jnp.where(do_lr, img[:, ::-1], img)
    seg = jnp.where(do_lr, seg[:, ::-1], seg)
    do_ud = jax.random.uniform(k_ud) < cfg.p_flipud
    img = jnp.where(do_ud, img[::-1, :], img)
    seg = jnp.where(do_ud, seg[::-1, :], seg)

    inv = _affine_matrix(k_aff, h, w, cfg)
    do_aff = jax.random.uniform(k_aff_p) < cfg.p_affine
    img = jnp.where(do_aff, _warp(img, inv, order=1), img)
    seg = jnp.where(do_aff, _warp(seg, inv, order=0), seg)
    return img, seg


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
    k_lr, k_ud, k_aff_p, k_aff = jax.random.split(key, 4)
    img = image.astype(jnp.float32)
    do_lr = jax.random.uniform(k_lr) < cfg.p_fliplr
    img = jnp.where(do_lr, img[:, ::-1], img)
    do_ud = jax.random.uniform(k_ud) < cfg.p_flipud
    img = jnp.where(do_ud, img[::-1, :], img)
    inv = _affine_matrix(k_aff, h, w, cfg)
    do_aff = jax.random.uniform(k_aff_p) < cfg.p_affine
    return jnp.where(do_aff, _warp(img, inv, order=1), img)


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

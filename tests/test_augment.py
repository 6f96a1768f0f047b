"""On-device augmentation (ops.augment): joint image/mask geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from onestop_tpu.config import AugmentConfig
from onestop_tpu.ops.augment import augment_batch, random_augment_pair


def _pair(rng, hw=64):
    mask = np.zeros((hw, hw), np.float32)
    mask[20:36, 24:44] = 1.0
    img = np.clip(mask * 0.7 + 0.2 * rng.random((hw, hw)), 0, 1).astype(np.float32)
    return img, mask


def test_mask_stays_binary_under_nearest(rng):
    img, mask = _pair(rng)
    cfg = AugmentConfig(p_fliplr=1.0, p_flipud=1.0, p_affine=1.0)
    for seed in range(5):
        _, seg = random_augment_pair(jax.random.PRNGKey(seed), jnp.asarray(img),
                                     jnp.asarray(mask), cfg)
        assert set(np.unique(np.asarray(seg))) <= {0.0, 1.0}


def test_joint_geometry_preserved(rng):
    """Image and mask must transform identically: augmenting the mask as an
    image (bilinear) then thresholding ~= augmenting as segmap."""
    img, mask = _pair(rng)
    cfg = AugmentConfig(p_fliplr=0.5, p_flipud=0.5, p_affine=1.0)
    key = jax.random.PRNGKey(3)
    a_img, a_seg = random_augment_pair(key, jnp.asarray(mask), jnp.asarray(mask), cfg)
    bin_img = (np.asarray(a_img) > 0.5).astype(np.float32)
    # identical up to nearest-vs-bilinear boundary pixels
    disagree = (bin_img != np.asarray(a_seg)).mean()
    assert disagree < 0.01


def test_flip_only_is_exact(rng):
    img, mask = _pair(rng)
    cfg = AugmentConfig(p_fliplr=1.0, p_flipud=0.0, p_affine=0.0)
    a_img, a_seg = random_augment_pair(jax.random.PRNGKey(0), jnp.asarray(img),
                                       jnp.asarray(mask), cfg)
    np.testing.assert_array_equal(np.asarray(a_img), img[:, ::-1])
    np.testing.assert_array_equal(np.asarray(a_seg), mask[:, ::-1])


def test_batch_determinism_and_variety(rng):
    imgs = np.stack([_pair(rng)[0] for _ in range(6)])
    masks = np.stack([_pair(rng)[1] for _ in range(6)])
    cfg = AugmentConfig()
    key = jax.random.PRNGKey(42)
    a1, s1 = augment_batch(key, jnp.asarray(imgs), jnp.asarray(masks), cfg)
    a2, s2 = augment_batch(key, jnp.asarray(imgs), jnp.asarray(masks), cfg)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))  # same key -> same aug
    b1, _ = augment_batch(jax.random.PRNGKey(43), jnp.asarray(imgs),
                          jnp.asarray(masks), cfg)
    assert not np.array_equal(np.asarray(a1), np.asarray(b1))      # different key -> different


def test_area_roughly_preserved_under_scale_bounds(rng):
    """Affine scale in [0.8, 1.2]: mask area ratio must stay within those
    bounds squared (plus interpolation slack) when translation keeps the
    object in frame."""
    img, mask = _pair(rng)
    cfg = AugmentConfig(p_fliplr=0.0, p_flipud=0.0, p_affine=1.0,
                        translate=(0.0, 0.0), rotate_deg=(0.0, 0.0),
                        shear_deg=(0.0, 0.0))
    area0 = mask.sum()
    for seed in range(5):
        _, seg = random_augment_pair(jax.random.PRNGKey(seed), jnp.asarray(img),
                                     jnp.asarray(mask), cfg)
        ratio = float(np.asarray(seg).sum()) / area0
        assert 0.8 ** 2 * 0.9 < ratio < 1.2 ** 2 * 1.1

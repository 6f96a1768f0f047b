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


# -- imgaug parity (VERDICT r2 missing #2 / next-round #6) --------------------

def _fixed_cfg(**kw):
    """Degenerate ranges pin every sampled parameter to a known value."""
    base = dict(p_fliplr=0.0, p_flipud=0.0, p_affine=1.0,
                scale=(1.0, 1.0), translate=(0.0, 0.0),
                rotate_deg=(0.0, 0.0), shear_deg=(0.0, 0.0))
    base.update(kw)
    return AugmentConfig(**base)


def test_affine_matrix_matches_skimage_parametrization():
    """The affine must be skimage AffineTransform about the imgaug center
    (w/2-0.5, h/2-0.5): forward linear part
    [[sx·cos r, -sy·sin(r+shear)], [sx·sin r, sy·cos(r+shear)]] + translation.
    Checked against a numpy-built forward matrix inverted with linalg.inv."""
    from onestop_tpu.ops.augment import _affine_inverse

    h = w = 64
    sx, sy, tx_f, ty_f, rot_d, shear_d = 1.1, 0.85, 0.12, -0.07, 25.0, -10.0
    cfg = _fixed_cfg(scale=(sx, sx),  # per-axis scale pinned equal (sy below)
                     translate=(tx_f, tx_f),
                     rotate_deg=(rot_d, rot_d), shear_deg=(shear_d, shear_d))
    # with all ranges degenerate both axes draw the same value, so test with
    # sx == sy and tx == ty to keep the pinning honest
    inv = np.asarray(_affine_inverse(jax.random.PRNGKey(0), h, w, cfg))

    r, sh = np.deg2rad(rot_d), np.deg2rad(shear_d)
    A = np.array([[sx * np.cos(r), -sx * np.sin(r + sh), tx_f * w],
                  [sx * np.sin(r), sx * np.cos(r + sh), tx_f * h],
                  [0, 0, 1.0]])
    c = (w - 1) / 2.0
    T, Tm = np.eye(3), np.eye(3)
    T[:2, 2] = c
    Tm[:2, 2] = -c
    expected_inv = np.linalg.inv(T @ A @ Tm)
    np.testing.assert_allclose(inv, expected_inv, rtol=1e-5, atol=1e-5)


def test_random_order_realizes_both_orders():
    """Fliplr(always) + rotate 30° (always): flip∘rot ≠ rot∘flip. Across keys
    the output must hit BOTH compositions — proof the op order is actually
    permuted (the round-2 pipeline was fixed flip→affine)."""
    from onestop_tpu.ops.augment import _warp, random_augment_image

    h = w = 32
    img = np.zeros((h, w), np.float32)
    img[4:12, 6:26] = 1.0
    img[20:28, 2:10] = 0.5
    cfg = _fixed_cfg(p_fliplr=1.0, rotate_deg=(30.0, 30.0))

    r = np.deg2rad(30.0)
    c = (w - 1) / 2.0
    T, Tm = np.eye(3), np.eye(3)
    T[:2, 2] = c
    Tm[:2, 2] = -c
    rot = T @ np.array([[np.cos(r), -np.sin(r), 0],
                        [np.sin(r), np.cos(r), 0], [0, 0, 1.0]]) @ Tm
    flip = np.array([[-1.0, 0, w - 1], [0, 1.0, 0], [0, 0, 1.0]])
    # applied flip-then-rot: inv = flip^-1 @ rot^-1 ; rot-then-flip: rot^-1 @ flip^-1
    ref_fr = np.asarray(_warp(jnp.asarray(img),
                              jnp.asarray(flip @ np.linalg.inv(rot), jnp.float32), 1))
    ref_rf = np.asarray(_warp(jnp.asarray(img),
                              jnp.asarray(np.linalg.inv(rot) @ flip, jnp.float32), 1))
    assert not np.allclose(ref_fr, ref_rf)  # orders genuinely differ

    seen = set()
    for seed in range(24):
        out = np.asarray(random_augment_image(jax.random.PRNGKey(seed),
                                              jnp.asarray(img), cfg))
        if np.allclose(out, ref_fr, atol=1e-4):
            seen.add("flip_rot")
        elif np.allclose(out, ref_rf, atol=1e-4):
            seen.add("rot_flip")
        else:  # flipud is off; affine+fliplr are the only ops
            raise AssertionError("output matched neither op order")
        if seen == {"flip_rot", "rot_flip"}:
            break
    assert seen == {"flip_rot", "rot_flip"}


def test_random_order_off_is_fixed_flip_then_affine(rng):
    """random_order=False keeps the deterministic flip→affine order."""
    from onestop_tpu.ops.augment import _warp, random_augment_image

    h = w = 32
    img = rng.random((h, w)).astype(np.float32)
    cfg = _fixed_cfg(p_fliplr=1.0, rotate_deg=(30.0, 30.0), random_order=False)
    r = np.deg2rad(30.0)
    c = (w - 1) / 2.0
    T, Tm = np.eye(3), np.eye(3)
    T[:2, 2] = c
    Tm[:2, 2] = -c
    rot = T @ np.array([[np.cos(r), -np.sin(r), 0],
                        [np.sin(r), np.cos(r), 0], [0, 0, 1.0]]) @ Tm
    flip = np.array([[-1.0, 0, w - 1], [0, 1.0, 0], [0, 0, 1.0]])
    ref = np.asarray(_warp(jnp.asarray(img),
                           jnp.asarray(flip @ np.linalg.inv(rot), jnp.float32), 1))
    for seed in range(6):
        out = np.asarray(random_augment_image(jax.random.PRNGKey(seed),
                                              jnp.asarray(img), cfg))
        np.testing.assert_allclose(out, ref, atol=1e-4)


def test_composed_warp_equals_sequential_ops(rng):
    """The single composed warp must equal applying the ops one at a time
    (flip as array reverse, then affine warp) — the exactness argument for
    folding the pipeline into one resample."""
    from onestop_tpu.ops.augment import _affine_inverse, _warp

    h = w = 48
    img = rng.random((h, w)).astype(np.float32)
    cfg = _fixed_cfg(scale=(1.07, 1.07), translate=(0.04, 0.04),
                     rotate_deg=(-18.0, -18.0), shear_deg=(7.0, 7.0))
    a_inv = _affine_inverse(jax.random.PRNGKey(5), h, w, cfg)
    flip_lr = jnp.asarray([[-1.0, 0, w - 1], [0, 1.0, 0], [0, 0, 1.0]])

    seq = np.asarray(_warp(jnp.asarray(img[:, ::-1]), a_inv, 1))       # flip then warp
    composed = np.asarray(_warp(jnp.asarray(img), flip_lr @ a_inv, 1))
    np.testing.assert_allclose(composed, seq, atol=1e-5)

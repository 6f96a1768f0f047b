"""clahe_fused (Pallas hist + XLA finalize/apply) must equal the exact
reference implementation / cv2 bit-for-bit. On CPU the Pallas kernel runs in
interpret mode."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onestop_tpu.ops.clahe_pallas import clahe_fused


_INTERPRET = jax.default_backend() == "cpu"


def test_matches_cv2_batch(rng):
    imgs = rng.integers(0, 256, (3, 256, 256), dtype=np.uint8)
    got = np.asarray(clahe_fused(jnp.asarray(imgs), interpret=_INTERPRET))
    for i in range(3):
        ref = cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8, 8)).apply(imgs[i])
        assert np.array_equal(got[i], ref), i


def test_matches_cv2_512(rng):
    imgs = rng.integers(0, 256, (1, 512, 512), dtype=np.uint8)
    got = np.asarray(clahe_fused(jnp.asarray(imgs), interpret=_INTERPRET))
    ref = cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8, 8)).apply(imgs[0])
    assert np.array_equal(got[0], ref)


def test_nibble_histogram_equals_strip_histogram(rng):
    """The nibble-split MXU histogram and the 8-row-strip VPU histogram must
    agree exactly (both are integer counts)."""
    from onestop_tpu.ops.clahe_pallas import tile_histograms, tile_histograms_nibble

    imgs = jnp.asarray(rng.integers(0, 256, (2, 256, 256), dtype=np.uint8))
    a = np.asarray(tile_histograms(imgs, interpret=_INTERPRET))
    b = np.asarray(tile_histograms_nibble(imgs, interpret=_INTERPRET))
    np.testing.assert_array_equal(a, b)
    # every tile histogram sums to the tile area
    np.testing.assert_array_equal(b.sum(-1), np.full((2, 64), 32 * 32, np.float32))


def test_nondivisible_padding(rng):
    """±1 on CPU rounding ties (see test_clahe.py note); bit-exact on TPU."""
    imgs = rng.integers(0, 256, (2, 300, 220), dtype=np.uint8)
    got = np.asarray(clahe_fused(jnp.asarray(imgs), interpret=_INTERPRET))
    for i in range(2):
        ref = cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8, 8)).apply(imgs[i])
        diff = np.abs(got[i].astype(int) - ref.astype(int))
        assert diff.max() <= 1 and (diff > 0).mean() < 0.01, i

"""Seed-compatible split index generation.

The reference's splits are all seeded with ``random_state=42``:
``train_test_split(test_size=0.3)`` (``holdout.py:762``),
``KFold(3/4, shuffle=True)`` (``task1_crossval_3folds_unet.py:1007``),
``StratifiedShuffleSplit(n_splits=1, test_size=0.3)`` (``task2:647-651``).

These reimplement the index sequences of scikit-learn's splitters on top of
``np.random.RandomState`` so that the framework produces *slice-identical*
splits without depending on sklearn at runtime. Verified index-for-index
against sklearn in ``tests/test_splits.py``.
"""

from __future__ import annotations

import math

import numpy as np


def _n_train_test(n: int, test_size: float) -> tuple[int, int]:
    n_test = int(math.ceil(test_size * n))
    n_train = int(math.floor(n * (1.0 - test_size)))
    return n_train, n_test


def train_test_split_indices(n: int, test_size: float = 0.3, seed: int = 42):
    """(train_idx, test_idx) matching sklearn.train_test_split(shuffle=True)."""
    n_train, n_test = _n_train_test(n, test_size)
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    test = perm[:n_test]
    train = perm[n_test : n_test + n_train]
    return train, test


def kfold_indices(n: int, n_splits: int, seed: int = 42, shuffle: bool = True):
    """List of (train_idx, test_idx) matching sklearn.KFold(shuffle, seed)."""
    indices = np.arange(n)
    if shuffle:
        rng = np.random.RandomState(seed)
        rng.shuffle(indices)
    fold_sizes = np.full(n_splits, n // n_splits, dtype=int)
    fold_sizes[: n % n_splits] += 1
    out = []
    current = 0
    for size in fold_sizes:
        test_mask = np.zeros(n, dtype=bool)
        test_mask[indices[current : current + size]] = True
        # sklearn emits both sides sorted (mask-derived)
        out.append((np.nonzero(~test_mask)[0], np.nonzero(test_mask)[0]))
        current += size
    return out


def _approximate_mode(class_counts: np.ndarray, n_draws: int, rng) -> np.ndarray:
    """Integer apportionment of n_draws over classes, proportional with
    randomized tie-breaking (sklearn.utils._approximate_mode semantics)."""
    continuous = class_counts / class_counts.sum() * n_draws
    floored = np.floor(continuous)
    need = int(n_draws - floored.sum())
    if need > 0:
        remainder = continuous - floored
        for value in np.sort(np.unique(remainder))[::-1]:
            (inds,) = np.where(remainder == value)
            add_now = min(len(inds), need)
            inds = rng.choice(inds, size=add_now, replace=False)
            floored[inds] += 1
            need -= add_now
            if need == 0:
                break
    return floored.astype(int)


def stratified_shuffle_split_indices(y, test_size: float = 0.3, seed: int = 42):
    """(train_idx, test_idx) matching sklearn.StratifiedShuffleSplit(n_splits=1)."""
    y = np.asarray(y).ravel()
    n = len(y)
    n_train, n_test = _n_train_test(n, test_size)
    classes, y_indices = np.unique(y, return_inverse=True)
    class_counts = np.bincount(y_indices)
    if np.min(class_counts) < 2:
        raise ValueError("each class needs at least 2 members")
    class_indices = np.split(
        np.argsort(y_indices, kind="mergesort"), np.cumsum(class_counts)[:-1]
    )
    rng = np.random.RandomState(seed)
    n_i = _approximate_mode(class_counts, n_train, rng)
    t_i = _approximate_mode(class_counts - n_i, n_test, rng)
    train, test = [], []
    for i in range(len(classes)):
        perm = rng.permutation(class_counts[i])
        picked = class_indices[i].take(perm, mode="clip")
        train.extend(picked[: n_i[i]])
        test.extend(picked[n_i[i] : n_i[i] + t_i[i]])
    train = rng.permutation(train)
    test = rng.permutation(test)
    return np.asarray(train), np.asarray(test)

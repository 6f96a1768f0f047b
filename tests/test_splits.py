"""data.splits index sequences must match sklearn's splitters exactly
(seed-42 split parity, SURVEY.md §7 'Hard parts')."""

import numpy as np
import pytest
from sklearn.model_selection import KFold, StratifiedShuffleSplit, train_test_split

from onestop_tpu.data.splits import (
    kfold_indices,
    stratified_shuffle_split_indices,
    train_test_split_indices,
)


@pytest.mark.parametrize("n", [1615, 1614, 2112, 100, 7])
def test_train_test_split_matches_sklearn(n):
    x = np.arange(n)
    xtr, xte = train_test_split(x, test_size=0.3, random_state=42)
    tr, te = train_test_split_indices(n, test_size=0.3, seed=42)
    np.testing.assert_array_equal(x[tr], xtr)
    np.testing.assert_array_equal(x[te], xte)


@pytest.mark.parametrize("n,k", [(1615, 3), (1615, 4), (100, 3), (10, 4)])
def test_kfold_matches_sklearn(n, k):
    ref = list(KFold(n_splits=k, shuffle=True, random_state=42).split(np.zeros(n)))
    got = kfold_indices(n, k, seed=42)
    assert len(ref) == len(got)
    for (rtr, rte), (gtr, gte) in zip(ref, got):
        np.testing.assert_array_equal(np.sort(gtr), np.sort(rtr))
        np.testing.assert_array_equal(gte, rte)


@pytest.mark.parametrize("npos,nneg", [(1615, 497), (50, 20), (11, 7)])
def test_stratified_matches_sklearn(npos, nneg):
    y = np.array([1] * npos + [0] * nneg)
    rng = np.random.default_rng(3)
    rng.shuffle(y)
    sss = StratifiedShuffleSplit(n_splits=1, test_size=0.3, random_state=42)
    rtr, rte = next(iter(sss.split(np.zeros(len(y)), y)))
    gtr, gte = stratified_shuffle_split_indices(y, test_size=0.3, seed=42)
    np.testing.assert_array_equal(gtr, rtr)
    np.testing.assert_array_equal(gte, rte)

"""Every config field must have a real consumer (VERDICT r1 weak #4):
corrupt_slices excises, monitor drives Trainer snapshots, stratified selects
the splitter, n_samples drives the aug-gallery/concat modes. Plus the cache
wiring (runners skip ingestion on a second invocation) and the fixed
classifier augmentation path (labels stay aligned)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from onestop_tpu import config as C
from onestop_tpu import runners as R
from onestop_tpu.data.ingest import excise_corrupt_slices
from onestop_tpu.ops.augment import sample_and_augment

_KW = dict(small_run=True, n_synthetic=2, synth_hw=128, synth_slices=10)


# -- PreprocessConfig.corrupt_slices -----------------------------------------

def test_corrupt_slices_excised():
    a = np.arange(40).reshape(40, 1, 1).astype(np.float32)
    b = a + 100
    (ea, eb) = excise_corrupt_slices((a, b), ((3, 7), (20, 22)))
    assert len(ea) == len(eb) == 34
    assert 3 not in ea and 6 not in ea and 21 not in eb - 100
    # out-of-range ranges clip silently, like `del list[a:b]` (ref task3:334-337)
    (fa,) = excise_corrupt_slices((a,), ((1368, 1372),))
    assert len(fa) == 40


def test_corrupt_slices_flow_through_lung_build():
    from onestop_tpu.data import synthetic_dataset
    from onestop_tpu.data.ingest import build_lung_dataset, load_slices

    cfg = dataclasses.replace(C.PreprocessConfig(), img_size=128, new_dim=64)
    pairs = []
    for case in synthetic_dataset(n_cases=1, hw=128, n_slices=12, seed=0):
        ct = load_slices(case.ct, cfg.img_size, cfg.slice_lo, cfg.slice_hi)
        lung = load_slices(case.lung_mask, cfg.img_size, cfg.slice_lo, cfg.slice_hi)
        pairs.append((ct, lung))
    x0, _ = build_lung_dataset(pairs, cfg)
    cfg2 = dataclasses.replace(cfg, corrupt_slices=((0, 2),))
    x1, _ = build_lung_dataset(pairs, cfg2)
    assert len(x1) <= len(x0) - 1  # at least one excised slice had lungs


# -- TrainConfig.monitor ------------------------------------------------------

def test_monitor_drives_best_snapshots():
    from onestop_tpu.models import ClassifierCNN
    from onestop_tpu.train import Trainer

    rng = np.random.default_rng(0)
    x = rng.random((16, 16, 16, 1)).astype(np.float32)
    y = (rng.random((16, 1)) > 0.5).astype(np.float32)
    cfg = C.TrainConfig(epochs=2, batch_size=8, loss="bce",
                        cosine_annealing=False, monitor=("val_loss",))
    model = ClassifierCNN(widths=(4,), dense=4)
    tr = Trainer(model, cfg, seg_metrics=False)
    state = tr.init_state(jax.random.PRNGKey(0), x.shape[1:])
    _, _, best = tr.fit(state, x, y, x, y)
    assert set(best) == {"val_loss"}         # only the configured monitor
    assert best["val_loss"]["params"] is not None


# -- SplitConfig.stratified ---------------------------------------------------

def test_stratified_flag_selects_splitter(tmp_path, monkeypatch):
    calls = {"strat": 0, "plain": 0}
    orig_s = R.stratified_shuffle_split_indices
    orig_p = R.train_test_split_indices

    def strat(*a, **k):
        calls["strat"] += 1
        return orig_s(*a, **k)

    def plain(*a, **k):
        calls["plain"] += 1
        return orig_p(*a, **k)

    monkeypatch.setattr(R, "stratified_shuffle_split_indices", strat)
    monkeypatch.setattr(R, "train_test_split_indices", plain)

    R.runner_classification(out_dir=tmp_path, epochs=1, **_KW)
    assert calls["strat"] == 1 and calls["plain"] == 0  # task2 default: stratified

    plain_cfg = C.task2_classification()
    plain_cfg = dataclasses.replace(
        plain_cfg, split=dataclasses.replace(plain_cfg.split, stratified=False))
    monkeypatch.setattr(C, "task2_classification", lambda: plain_cfg)
    R.runner_classification(out_dir=tmp_path, epochs=1, **_KW)
    assert calls["plain"] == 1


# -- AugmentConfig.n_samples + classifier aug path ----------------------------

def test_n_samples_drives_gallery_size():
    cfg = dataclasses.replace(C.AugmentConfig(), n_samples=7)
    imgs = jnp.asarray(np.random.default_rng(0).random((20, 32, 32)), jnp.float32)
    segs = (imgs > 0.5).astype(jnp.float32)
    idx, ai, asg = sample_and_augment(jax.random.PRNGKey(0), imgs, segs, cfg)
    assert ai.shape == asg.shape == (7, 32, 32)
    idx2, ai2 = sample_and_augment(jax.random.PRNGKey(0), imgs, None, cfg)
    assert ai2.shape == (7, 32, 32)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))


def test_image_only_aug_labels_stay_aligned():
    """Deterministic flip-only config: each augmented image must equal the
    flip of the image at its returned index — so labels carried by index stay
    correct (the fix for the reference's task2 independent-shuffle bug,
    SURVEY.md §8 Q6)."""
    cfg = dataclasses.replace(C.AugmentConfig(), p_fliplr=1.0, p_flipud=0.0,
                              p_affine=0.0, n_samples=5)
    imgs = jnp.asarray(np.random.default_rng(1).random((12, 16, 16)), jnp.float32)
    idx, aug = sample_and_augment(jax.random.PRNGKey(3), imgs, None, cfg)
    idx, aug = np.asarray(idx), np.asarray(aug)
    for k in range(5):
        np.testing.assert_allclose(aug[k], np.asarray(imgs)[idx[k]][:, ::-1])


def test_concat_augmentation_grows_train_set(tmp_path):
    base = R.runner_lung_segmentation(out_dir=tmp_path / "a", **_KW)
    aug = R.runner_lung_segmentation(out_dir=tmp_path / "b",
                                     use_augmentation="concat", **_KW)
    n_samples = C.task3_lung().augment.n_samples
    assert aug["n_train"] == base["n_train"] + n_samples
    assert aug["n_val"] == base["n_val"]  # val split untouched by aug


# -- cache wiring --------------------------------------------------------------

def test_runner_cache_skips_second_ingestion(tmp_path, monkeypatch):
    calls = {"n": 0}
    orig = R._case_slice_triples

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(R, "_case_slice_triples", counting)
    cache = tmp_path / "cache"
    r1 = R.runner_lung_segmentation(out_dir=tmp_path / "a", cache_dir=cache, **_KW)
    assert calls["n"] == 1
    r2 = R.runner_lung_segmentation(out_dir=tmp_path / "b", cache_dir=cache, **_KW)
    assert calls["n"] == 1                       # second run loaded the cache
    assert r1["n_train"] == r2["n_train"]


def test_monitor_unproducible_raises():
    """Review r2: a monitor this run can never produce must fail loudly, not
    silently record no best snapshot."""
    import jax
    import numpy as np
    import pytest as _pt

    from onestop_tpu.config import TrainConfig
    from onestop_tpu.models import ClassifierCNN
    from onestop_tpu.train.trainer import Trainer

    cfg = TrainConfig(batch_size=4, epochs=1, cosine_annealing=False,
                      monitor=("val_dice_coeff",))  # classifier emits val_f1
    tr = Trainer(ClassifierCNN(widths=(2,), dense=4), cfg, seg_metrics=False)
    st = tr.init_state(jax.random.PRNGKey(0), (16, 16, 1))
    x = np.random.default_rng(0).random((8, 16, 16, 1)).astype(np.float32)
    y = (np.random.default_rng(1).random((8, 1)) > 0.5).astype(np.float32)
    with _pt.raises(ValueError, match="never produced"):
        tr.fit(st, x, y, x, y)


def test_cache_key_includes_data_source(tmp_path):
    """Review r2: same preprocess config but a different dataset must not
    serve stale cached arrays."""
    from onestop_tpu import runners as R

    kw = dict(small_run=True, cache_dir=tmp_path, out_dir=tmp_path)
    r1 = R.runner_lung_segmentation(n_synthetic=2, synth_hw=128, synth_slices=10, **kw)
    r2 = R.runner_lung_segmentation(n_synthetic=3, synth_hw=128, synth_slices=10, **kw)
    assert r2["n_train"] + r2["n_val"] > r1["n_train"] + r1["n_val"]

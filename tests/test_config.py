"""Config defaults must match the reference's constants exactly
(SURVEY.md §2.2 inventory)."""

from onestop_tpu import config as C


def test_preprocess_constants():
    p = C.PreprocessConfig()
    assert p.img_size == 512                  # holdout.py:151
    assert (p.slice_lo, p.slice_hi) == (0.2, 0.8)   # :289
    assert p.clahe_clip_limit == 3.0          # :169
    assert p.clahe_grid == (8, 8)
    assert p.crop_tile == (250, 125)          # dsize=(125,250) at :236-240
    assert p.new_dim == 224                   # :479


def test_train_constants():
    t = C.TrainConfig()
    assert t.batch_size == 32 and t.epochs == 80      # :1041-1042
    assert t.learning_rate == 5e-4                    # :1053
    assert (t.cosine_t_max, t.cosine_eta_max, t.cosine_eta_min) == (7, 5e-4, 1e-4)  # :996
    assert (t.step_decay_init, t.step_decay_drop, t.step_decay_epochs) == (8e-4, 0.8, 10)  # :925-927


def test_task_variants():
    t2 = C.task2_classification()
    assert t2.train.epochs == 25 and t2.train.loss == "bce"
    assert t2.train.use_class_weight and t2.split.stratified
    assert t2.augment.rotate_deg == (-45.0, 45.0) and t2.augment.n_samples == 100

    t3 = C.task3_lung()
    assert t3.sweep.fine == (0.43, 0.53, 0.001)       # task3:1206
    assert t3.augment.n_samples == 50

    cv3 = C.task1_3fold()
    assert cv3.split.n_folds == 3 and cv3.split.fold_epochs == (80, 20, 20)
    cv4 = C.task1_4fold()
    assert cv4.split.n_folds == 4 and cv4.split.fold_epochs == (80, 80, 80, 80)

    pp = C.task1_unetpp()
    assert pp.sweep.fine == (0.40, 0.50, 0.001)       # task1_unet_plus_plus.py:1274


def test_splits_all_seed_42():
    for cfg in (C.task1_holdout(), C.task1_3fold(), C.task1_4fold(),
                C.task1_unetpp(), C.task2_classification(), C.task3_lung()):
        assert cfg.split.seed == 42


def test_sweep_grids():
    s = C.SweepConfig()
    assert s.coarse == (0.10, 0.80, 0.05)             # holdout.py:1196
    assert s.fine == (0.52, 0.60, 0.001)              # :1250
    assert s.cv_grid == (0.30, 0.80, 0.05)            # 3folds:1160
    assert s.pr_grid == (0.0, 1.0, 0.05)

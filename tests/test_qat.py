"""Quantization-aware training (onestop_tpu.train.qat): the fake-quant
forward must track the plain forward, gradients must flow through the STE,
the quantized op set must equal the int8 SERVING op set by construction,
and a Trainer(qat=True) run must train end to end and produce a checkpoint
whose int8-served outputs sit closer to its own f32 forward than a
plain-trained twin's do."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onestop_tpu.config import TrainConfig
from onestop_tpu.models import UNet
from onestop_tpu.train.qat import qat_methods
from onestop_tpu.train.trainer import Trainer

_WIDTHS = (4, 8)


def _tiny_unet(seed=0, s2d=False):
    model = UNet(widths=_WIDTHS, bridge=16, s2d_stem=s2d)
    v = model.init({"params": jax.random.PRNGKey(seed)},
                   jnp.zeros((1, 32, 32, 1)), train=False)
    return model, v


@pytest.mark.slow
def test_qat_forward_tracks_plain_and_grads_flow(rng):
    model, v = _tiny_unet()
    x = jnp.asarray(rng.random((2, 32, 32, 1)), jnp.float32)
    plain = np.asarray(model.apply(v, x, train=False))
    with qat_methods():
        fq = np.asarray(model.apply(v, x, train=False))
    assert not np.array_equal(plain, fq)          # quantization happened
    assert np.abs(plain - fq).mean() < 0.05       # ...and is small

    def loss(params):
        with qat_methods():
            out, _ = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.mean((out - 1.0) ** 2)

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # the STE passes gradients into every fake-quantized conv kernel
    for name in ("enc0_conv0", "bridge_conv1", "dec1_conv0"):
        assert float(jnp.abs(g[name]["kernel"]).max()) > 0.0, name


def test_qat_op_set_equals_int8_serving_op_set(rng):
    """QAT must fake-quantize exactly the convs the serving quantizer
    (serve_int8.quantize_model) will quantize — same predicate, asserted."""
    from flax import linen as nn

    from onestop_tpu.serve_int8 import quantize_model
    from onestop_tpu.train.qat import qat_interceptor

    model, v = _tiny_unet()
    x = jnp.asarray(rng.random((2, 32, 32, 1)), jnp.float32)
    q = quantize_model(model, v, x)

    touched = set()
    inner = qat_interceptor()

    def spy(next_fun, args, kwargs, context):
        out = inner(next_fun, args, kwargs, context)
        from onestop_tpu.serve_int8 import _is_q_conv
        if _is_q_conv(context.module) and context.method_name == "__call__":
            touched.add("/".join(context.module.path))
        return out

    with nn.intercept_methods(spy):
        model.apply(v, x, train=False)
    assert touched == set(q["kernels_q"])


def test_qat_stem_matches_stem_off_forward(rng):
    """Under QAT the s2d stem routes through the plain fake-quant conv, so a
    stem-on forward must equal the stem-off forward on the same params (the
    two layouts share a param tree)."""
    model_on, v = _tiny_unet(s2d=True)
    model_off = UNet(widths=_WIDTHS, bridge=16, s2d_stem=False)
    x = jnp.asarray(rng.random((2, 32, 32, 1)), jnp.float32)
    with qat_methods():
        a = np.asarray(model_on.apply(v, x, train=False))
        b = np.asarray(model_off.apply(v, x, train=False))
    np.testing.assert_allclose(a, b, atol=1e-6)


def _train_tiny(qat: bool, x, y):
    cfg = TrainConfig(batch_size=4, epochs=6, learning_rate=3e-3,
                      schedule="constant", qat=qat)
    model = UNet(widths=_WIDTHS, bridge=16)
    tr = Trainer(model, cfg)
    state = tr.init_state(jax.random.PRNGKey(0), (32, 32, 1))
    state, hist, _ = tr.fit(state, x, y)
    return model, tr, state, hist


@pytest.mark.slow
def test_trainer_qat_end_to_end_and_serving_robustness(rng):
    """Trainer(qat=True) trains (loss falls), predict() runs fake-quantized
    (mirrors deployment), and the QAT checkpoint's int8-vs-own-f32 output
    delta is no worse than the plain-trained twin's — the per-checkpoint
    int8-sensitivity fix (round3_fast112_int8_diag) at test scale."""
    from onestop_tpu.serve_int8 import apply_int8_model, quantize_model

    x = rng.random((16, 32, 32, 1)).astype(np.float32)
    y = (rng.random((16, 32, 32, 1)) > 0.6).astype(np.float32)

    model_q, tr_q, st_q, hist_q = _train_tiny(True, x, y)
    model_p, tr_p, st_p, hist_p = _train_tiny(False, x, y)
    assert hist_q["loss"][-1] < hist_q["loss"][0]     # QAT training converges

    # Trainer.predict under qat IS the fake-quant forward
    pred = tr_q.predict(st_q, x[:2])
    with qat_methods():
        ref = np.asarray(model_q.apply(
            {"params": st_q.params, "batch_stats": st_q.batch_stats},
            jnp.asarray(x[:2]), train=False))
    np.testing.assert_allclose(pred, ref, atol=1e-6)

    def int8_delta(model, st):
        v = {"params": st.params, "batch_stats": st.batch_stats}
        q = quantize_model(model, v, jnp.asarray(x[:8]))
        f32 = np.asarray(model.apply(v, jnp.asarray(x), train=False))
        i8 = np.asarray(apply_int8_model(model, q, v, jnp.asarray(x),
                                         dtype=jnp.float32))
        return np.abs(f32 - i8).mean()

    d_qat, d_plain = int8_delta(model_q, st_q), int8_delta(model_p, st_p)
    # allow slack: at this toy scale both deltas are small; QAT must not be
    # meaningfully WORSE, and usually wins
    assert d_qat <= d_plain * 1.25, (d_qat, d_plain)


@pytest.mark.slow
def test_runner_accepts_qat_flag(tmp_path):
    """Runner-surface wiring: qat=True reaches the Trainer (its predict is
    the fake-quant forward) and the run completes end to end."""
    from onestop_tpu.runners import runner_lung_segmentation

    res = runner_lung_segmentation(small_run=True, out_dir=str(tmp_path),
                                   qat=True, save_figures=False)
    tr, st = res["trainer"], res["state"]
    assert tr.cfg.qat is True
    # a full batch: predict pads partial batches with zero rows, and the QAT
    # per-batch activation amax (live scales) is padding-sensitive by design
    n = tr.cfg.batch_size
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(0), (n, 64, 64, 1)))
    pred = tr.predict(st, x)
    with qat_methods():
        ref = np.asarray(tr.model.apply(
            {"params": st.params, "batch_stats": st.batch_stats},
            jnp.asarray(x), train=False))
    # the task3 model computes in bf16 — scan-batched predict and the direct
    # apply compile to different programs, so allow bf16-scale rounding
    np.testing.assert_allclose(pred, ref, atol=2e-2)
    assert (np.abs(pred - ref) > 1e-6).mean() < 0.01   # only isolated pixels
    plain = np.asarray(tr.model.apply(
        {"params": st.params, "batch_stats": st.batch_stats},
        jnp.asarray(x), train=False))
    assert not np.array_equal(pred, plain)


@pytest.mark.slow
def test_qat_composes_with_dp_mesh(rng):
    """QAT under 8-way data-parallel training: the flax interceptor must fire
    inside the shard_map'd train/eval/predict programs (sync-BN engaged).
    Exact single-device equality is NOT expected — the live activation amax
    is per-shard under DP — so assert convergence + that prediction really
    is fake-quantized (differs from the plain forward, tracks the per-shard
    qat forward loosely)."""
    from onestop_tpu.parallel import make_mesh

    n, hw = 24, 16
    masks = np.zeros((n, hw, hw, 1), np.float32)
    for i in range(n):
        y0, x0 = 2 + i % 8, 2 + (3 * i) % 8
        masks[i, y0:y0 + 4, x0:x0 + 4] = 1.0
    x = np.clip(masks * 0.8 + 0.15 * rng.random((n, hw, hw, 1)), 0, 1
                ).astype(np.float32)

    cfg = TrainConfig(batch_size=8, epochs=3, schedule="constant",
                      learning_rate=1e-3, qat=True)
    model = UNet(widths=(4,), bridge=8, dropout=0.0)
    mesh = make_mesh(n_folds=1)            # {'fold': 1, 'data': 8}
    tr = Trainer(model, cfg, mesh=mesh)
    assert tr.dp_size == 8
    assert tr.model.bn_axis == "data"      # sync-BN still engaged under QAT
    state = tr.init_state(jax.random.PRNGKey(0), x.shape[1:])
    state, hist, _ = tr.fit(state, x, masks, x, masks)
    assert np.isfinite(hist["loss"]).all()
    assert hist["loss"][-1] < hist["loss"][0]

    pred = tr.predict(state, x[:8])
    plain = np.asarray(tr.model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x[:8]), train=False))
    assert not np.array_equal(pred, plain)   # quantization really happened
    with qat_methods():
        fq = np.asarray(tr.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(x[:8]), train=False))
    # per-shard vs whole-batch activation scales: close but not identical
    assert np.abs(pred - fq).mean() < 0.05


@pytest.mark.slow
def test_qat_reaches_fold_parallel_cv(rng):
    """'--qat' on the CV runners must actually fake-quantize the
    fold-parallel programs (FoldParallelTrainer), not just train.Trainer:
    train on the mesh with qat on/off from the same init and assert the
    trajectories diverge, and that predict_fold runs the fake-quant forward."""
    from onestop_tpu.parallel import cross_validate, make_mesh
    from onestop_tpu.data.splits import kfold_indices

    n, hw = 24, 16
    masks = np.zeros((n, hw, hw, 1), np.float32)
    for i in range(n):
        y0, x0 = 2 + i % 8, 2 + (3 * i) % 8
        masks[i, y0:y0 + 4, x0:x0 + 4] = 1.0
    x = np.clip(masks * 0.8 + 0.15 * rng.random((n, hw, hw, 1)), 0, 1
                ).astype(np.float32)
    folds = kfold_indices(n, 4)
    mesh = make_mesh(n_folds=4)

    def run(qat):
        cfg = TrainConfig(batch_size=4, epochs=2, schedule="constant",
                          learning_rate=1e-3, qat=qat)
        model = UNet(widths=(4,), bridge=8, dropout=0.0)
        tr, states, hist, best = cross_validate(model, cfg, x, masks, folds,
                                                mesh=mesh)
        return tr, states, hist

    tr_q, st_q, hist_q = run(True)
    _, _, hist_p = run(False)
    assert np.isfinite(hist_q["loss"]).all()
    # same data, same init law — only the quantizer differs
    assert not np.allclose(hist_q["loss"], hist_p["loss"])

    p0 = jax.tree_util.tree_map(lambda a: a[0], st_q.params)
    b0 = jax.tree_util.tree_map(lambda a: a[0], st_q.batch_stats)
    pred = tr_q.predict_fold(p0, b0, x[:4])
    with qat_methods():
        ref = np.asarray(tr_q.model.apply(
            {"params": p0, "batch_stats": b0}, jnp.asarray(x[:4]),
            train=False))
    np.testing.assert_allclose(pred, ref, atol=1e-5)

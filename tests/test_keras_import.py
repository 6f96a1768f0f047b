"""Keras .h5 weight import (train/keras_import.py): the reference publishes
its models as save_weights('*.h5') (ref holdout.py:1073-1095); these tests
pin the layer-name mapping and the per-weight transforms so real published
weights load the day they are available."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onestop_tpu.models import ClassifierCNN, UNet
from onestop_tpu.train.keras_import import (
    import_keras_weights, keras_name_map, spec_for_model, _convt_kernel)

h5py = pytest.importorskip("h5py")


def test_convtranspose_transform_matches_torch():
    """Keras Conv2DTranspose kernel (kh,kw,out,in) -> flax: transpose to
    (kh,kw,in,out) AND flip both spatial axes. torch's ConvTranspose2d has
    the same semantics as TF's conv2d_transpose (gradient of conv), so it
    is the golden reference available in this image."""
    torch = pytest.importorskip("torch")
    from flax import linen as nn

    rng = np.random.default_rng(0)
    cin, cout = 3, 5
    x = rng.random((2, 6, 6, cin)).astype(np.float32)
    k_keras = rng.random((2, 2, cout, cin)).astype(np.float32)

    t = torch.nn.ConvTranspose2d(cin, cout, 2, stride=2, bias=False)
    with torch.no_grad():
        t.weight.copy_(torch.from_numpy(k_keras.transpose(3, 2, 0, 1)))
    ref = t(torch.from_numpy(x.transpose(0, 3, 1, 2))
            ).detach().numpy().transpose(0, 2, 3, 1)

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.ConvTranspose(cout, (2, 2), strides=(2, 2),
                                    padding="SAME", use_bias=False)(x)

    m = M()
    out = np.asarray(m.apply(
        {"params": {"ConvTranspose_0": {"kernel": jnp.asarray(_convt_kernel(k_keras))}}},
        jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def _keras_arrays_for(model, variables, rng):
    """Random Keras-layout weights per layer + the flax arrays they must
    import to."""
    spec = spec_for_model(model)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    file_layers = {}   # keras layer name -> {short: array}
    expect_params = {}
    expect_bstats = {}
    for kind, names in spec.items():
        for k, flax_name in enumerate(names):
            keras_name = f"{kind}_{k + 1}"      # TF1-era naming
            if kind in ("conv2d", "dense"):
                ksh = params[flax_name]["kernel"].shape
                kern = rng.random(ksh).astype(np.float32)
                bias = rng.random(ksh[-1]).astype(np.float32)
                file_layers[keras_name] = {"kernel": kern, "bias": bias}
                expect_params[flax_name] = {"kernel": kern, "bias": bias}
            elif kind == "conv2d_transpose":
                kh, kw, cin, cout = params[flax_name]["kernel"].shape
                kern = rng.random((kh, kw, cout, cin)).astype(np.float32)
                bias = rng.random(cout).astype(np.float32)
                file_layers[keras_name] = {"kernel": kern, "bias": bias}
                expect_params[flax_name] = {"kernel": _convt_kernel(kern),
                                            "bias": bias}
            else:
                c = params[flax_name]["scale"].shape[0]
                g, b, mm, mv = (rng.random(c).astype(np.float32) for _ in range(4))
                file_layers[keras_name] = {"gamma": g, "beta": b,
                                           "moving_mean": mm,
                                           "moving_variance": mv}
                expect_params[flax_name] = {"scale": g, "bias": b}
                expect_bstats[flax_name] = {"mean": mm, "var": mv}
    return file_layers, expect_params, expect_bstats


def _write_keras_h5(path, file_layers):
    """Emulate Keras save_weights layout: root attr layer_names; per-layer
    group with weight_names attr + nested '<layer>/<w>:0' datasets; plus
    weightless layers (pooling/dropout/concat) to exercise skipping."""
    names = list(file_layers) + ["max_pooling2d_1", "dropout_1", "input_1",
                                 "concatenate_1"]
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array([n.encode() for n in names])
        for n in names:
            g = f.create_group(n)
            ws = file_layers.get(n, {})
            wnames = [f"{n}/{w}:0" for w in ws]
            g.attrs["weight_names"] = np.array([w.encode() for w in wnames],
                                               dtype="S64" if wnames else "S1")
            for wn, (short, arr) in zip(wnames, ws.items()):
                g.create_dataset(wn, data=arr)


@pytest.mark.parametrize("family", ["unet", "classifier"])
def test_h5_roundtrip_import(tmp_path, family):
    rng = np.random.default_rng(1)
    if family == "unet":
        model = UNet(widths=(4, 8), bridge=16)
        x = jnp.zeros((1, 16, 16, 1), jnp.float32)
    else:
        model = ClassifierCNN(widths=(2, 4), dense=8)
        x = jnp.zeros((1, 16, 16, 1), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    file_layers, exp_p, exp_b = _keras_arrays_for(model, variables, rng)
    h5path = tmp_path / f"{family}.h5"
    _write_keras_h5(h5path, file_layers)

    out = import_keras_weights(h5path, model, variables)
    for mod, ws in exp_p.items():
        for key, arr in ws.items():
            np.testing.assert_array_equal(out["params"][mod][key], arr)
    for mod, ws in exp_b.items():
        for key, arr in ws.items():
            np.testing.assert_array_equal(out["batch_stats"][mod][key], arr)

    probs = model.apply({"params": out["params"],
                         "batch_stats": out["batch_stats"]},
                        jnp.ones_like(x), train=False)
    assert np.isfinite(np.asarray(probs)).all()


def test_h5_import_unetpp_spec_counts():
    """The U-Net++ spec must cover the reference's full layer inventory:
    21 Conv2D (20 3x3 + head), 6 Conv2DTranspose, 16 BatchNormalization
    (ref task1_unet_plus_plus.py:860-950)."""
    from onestop_tpu.models import UNetPP

    model = UNetPP(widths=(2, 4, 8, 16))
    spec = spec_for_model(model)
    assert len(spec["conv2d"]) == 21
    assert len(spec["conv2d_transpose"]) == 6
    assert len(spec["batch_normalization"]) == 16
    # every spec name exists in the real param tree
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 16, 16, 1)), train=False)
    mods = set(variables["params"].keys())
    for names in spec.values():
        for n in names:
            assert n in mods, n


def test_h5_import_validates_topology(tmp_path):
    """Wrong layer counts and wrong shapes fail loudly with both names."""
    rng = np.random.default_rng(2)
    model = UNet(widths=(4, 8), bridge=16)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 16, 16, 1)), train=False)
    file_layers, _, _ = _keras_arrays_for(model, variables, rng)

    # drop one conv -> count mismatch
    short = dict(list(file_layers.items())[:-1])
    _write_keras_h5(tmp_path / "short.h5", short)
    with pytest.raises(ValueError, match="expected .* layers"):
        import_keras_weights(tmp_path / "short.h5", model, variables)

    # corrupt one shape -> named shape error
    bad = dict(file_layers)
    bad["conv2d_1"] = {"kernel": np.zeros((3, 3, 2, 4), np.float32),
                      "bias": np.zeros(4, np.float32)}
    _write_keras_h5(tmp_path / "bad.h5", bad)
    with pytest.raises(ValueError, match="enc0_conv0/kernel"):
        import_keras_weights(tmp_path / "bad.h5", model, variables)


def test_keras_name_map_table():
    model = UNet()  # full reference topology
    table = keras_name_map(model)
    assert ("conv2d", "enc0_conv0") in table
    assert ("conv2d_18", "head") in table            # 19 convs: 0..18
    assert ("conv2d_transpose", "dec3_up") in table
    assert ("batch_normalization_7", "dec0_bn") in table
    tf1 = dict(keras_name_map(model, tf1_names=True))
    assert tf1["conv2d_1"] == "enc0_conv0"


@pytest.mark.parametrize("family,tf1", [("unet", False), ("unet", True),
                                        ("unetpp", False),
                                        ("classifier", False)])
def test_h5_export_import_roundtrip(tmp_path, family, tf1):
    """export_keras_weights must be the exact inverse of import_keras_weights
    for every family (and for TF1-style layer suffixes): params and
    batch_stats survive bit-for-bit and the forward is unchanged."""
    from onestop_tpu.models import UNetPP
    from onestop_tpu.train.keras_import import export_keras_weights

    rng = np.random.default_rng(3)
    if family == "unet":
        model = UNet(widths=(4, 8), bridge=16)
        x = jnp.zeros((1, 16, 16, 1), jnp.float32)
    elif family == "unetpp":
        model = UNetPP(widths=(2, 4, 8, 16))
        x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    else:
        model = ClassifierCNN(widths=(2, 4), dense=8)
        x = jnp.zeros((1, 16, 16, 1), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    # perturb so round-trip equality is meaningful (BN stats non-default)
    variables = jax.tree_util.tree_map(
        lambda a: np.asarray(a) + rng.normal(0, 0.1, a.shape).astype(a.dtype)
        if np.issubdtype(np.asarray(a).dtype, np.floating) else np.asarray(a),
        jax.device_get(variables))

    h5path = tmp_path / f"{family}_export.h5"
    export_keras_weights(h5path, model, variables, tf1_names=tf1)
    out = import_keras_weights(h5path, model, variables)

    flat_in, _ = jax.tree_util.tree_flatten_with_path(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})})
    flat_out, _ = jax.tree_util.tree_flatten_with_path(
        {"params": out["params"], "batch_stats": out["batch_stats"]})
    assert len(flat_in) == len(flat_out)
    for (p_in, a_in), (p_out, a_out) in zip(flat_in, flat_out):
        assert p_in == p_out
        np.testing.assert_array_equal(np.asarray(a_in), np.asarray(a_out),
                                      err_msg=str(p_in))

    ref = model.apply(variables, jnp.ones_like(x), train=False)
    got = model.apply({"params": out["params"],
                       "batch_stats": out["batch_stats"]},
                      jnp.ones_like(x), train=False)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

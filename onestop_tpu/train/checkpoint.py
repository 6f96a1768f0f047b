"""Checkpointing: metric-stamped weight files + JSON topology metadata —
the reference's persistence layer (``holdout.py:1073-1095``: HDF5 weights,
``to_json`` topology, joblib array pickles) rebuilt on flax msgpack
serialization. Filenames embed the monitored metric value just like the
reference's ``unet_0.8954_cosine_annealer.h5``.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path, params, batch_stats=None, metadata: dict | None = None) -> Path:
    """Serialize (params, batch_stats) to one msgpack file + sidecar JSON."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {"params": jax.device_get(params),
               "batch_stats": jax.device_get(batch_stats) if batch_stats is not None else {}}
    path.write_bytes(serialization.to_bytes(payload))
    if metadata is not None:
        meta = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
                for k, v in metadata.items()}
        Path(str(path) + ".json").write_text(json.dumps(meta, indent=2))
    return path


def load_checkpoint(path, template_params, template_batch_stats=None):
    """Deserialize into the structure of the given templates."""
    path = Path(path)
    target = {"params": jax.device_get(template_params),
              "batch_stats": jax.device_get(template_batch_stats)
              if template_batch_stats is not None else {}}
    restored = serialization.from_bytes(target, path.read_bytes())
    return restored["params"], restored["batch_stats"]


def load_model_variables(model, path, in_hw):
    """Checkpoint → flax variables dict for ``model.apply``: init a template
    at ``in_hw`` (H, W) single-channel input, then restore into it. The one
    canonical loader for serving and scripts (serve.py used to own this; the
    study scripts each had a private copy)."""
    import jax.numpy as jnp

    tmpl = model.init({"params": jax.random.PRNGKey(0)},
                      jnp.zeros((1,) + tuple(in_hw) + (1,), jnp.float32),
                      train=False)
    params, bstats = load_checkpoint(path, tmpl["params"],
                                     tmpl.get("batch_stats", {}))
    return {"params": params, "batch_stats": bstats}


def save_train_state(path, state, epoch: int, history: dict | None = None) -> Path:
    """Full-state checkpoint for crash/resume: params + batch_stats +
    optimizer state + step + epoch (+history). The reference's only crash
    mitigation is its joblib array cache and best-weights files
    (SURVEY.md §5.3); this restores training exactly where it stopped."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": jax.device_get(state.step),
        "epoch": np.int64(epoch),
    }
    path.write_bytes(serialization.to_bytes(payload))
    if history is not None:
        Path(str(path) + ".history.json").write_text(json.dumps(history))
    return path


def load_train_state(path, template_state):
    """Restore (state, next_epoch, history) from a full-state checkpoint."""
    path = Path(path)
    target = {
        "params": jax.device_get(template_state.params),
        "batch_stats": jax.device_get(template_state.batch_stats),
        "opt_state": jax.device_get(template_state.opt_state),
        "step": jax.device_get(template_state.step),
        "epoch": np.int64(0),
    }
    restored = serialization.from_bytes(target, path.read_bytes())
    state = template_state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"], step=restored["step"])
    hist_path = Path(str(path) + ".history.json")
    history = json.loads(hist_path.read_text()) if hist_path.exists() else None
    return state, int(restored["epoch"]) + 1, history


def metric_stamped_name(prefix: str, metric_value: float, suffix: str = "") -> str:
    """e.g. 'unet_0.8954_cosine_annealer' (ref holdout.py:1079)."""
    parts = [prefix, f"{metric_value:.4f}"]
    if suffix:
        parts.append(suffix)
    return "_".join(parts) + ".msgpack"


def export_topology_json(model, path=None) -> str:
    """Model-topology export — the reference's ``model.to_json()``
    (``holdout.py:1091-1095``). Serializes the flax module's constructor
    configuration; together with the class name this fully reconstructs the
    architecture."""
    import dataclasses

    cfg = {}
    for f in dataclasses.fields(model):
        if f.name in ("parent", "name"):
            continue
        v = getattr(model, f.name)
        if hasattr(v, "dtype") or isinstance(v, type):
            v = str(v)
        elif isinstance(v, tuple):
            v = list(v)
        try:
            json.dumps(v)
        except TypeError:
            v = str(v)
        cfg[f.name] = v
    doc = json.dumps({"class_name": type(model).__name__, "config": cfg}, indent=2)
    if path is not None:
        Path(path).write_text(doc)
    return doc

"""Checkpointing: orbax-backed full train-state save/restore.

The reference's checkpointing is a PL callback writing ``torch.save``
state_dicts every n epochs (/root/reference/clipcap/train/callback.py:20-28)
with *no mid-run resume and no optimizer-state restore* (SURVEY.md §5.4).
Here checkpoints capture the whole TrainState (step, params, optimizer
moments) so training resumes exactly; params-only export is also provided
for serving.

Backends:
* **orbax** (directory checkpoints, async-capable, multi-host safe) when
  available;
* **npz** flat-pytree fallback (single file, dependency-free) — also the
  export format ``clipcap_tpu.load`` accepts.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

Params = Dict[str, Any]

SEP = "::"  # flat-key separator for npz


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    leaves_with_path = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_path:
        key = SEP.join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return f"#{p.idx}"
    if hasattr(p, "name"):
        return str(p.name)
    return str(p)


def save_params(path: str, params: Params) -> None:
    """Save a params pytree. ``.npz`` path → single file; else orbax dir."""
    if path.endswith(".npz"):
        os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
        np.savez(path, **_flatten(params))
        return
    _orbax_save(path, params)


def restore_params(path: str, like: Params) -> Params:
    """Restore a pytree with the same structure as ``like``."""
    if path.endswith(".npz"):
        flat = np.load(path)
        paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(like)
        leaves = []
        for kpath, leaf in paths_and_leaves:
            key = SEP.join(_path_str(p) for p in kpath)
            if key not in flat and f"params{SEP}{key}" in flat:
                # Full train-state checkpoint: params live under "params::".
                key = f"params{SEP}{key}"
            if key not in flat:
                raise KeyError(f"checkpoint {path} missing key '{key}'")
            arr = flat[key]
            if tuple(arr.shape) != tuple(leaf.shape):
                raise ValueError(
                    f"shape mismatch for '{key}': ckpt {arr.shape} vs model {leaf.shape}"
                )
            leaves.append(arr)
        return jax.tree_util.tree_unflatten(treedef, leaves)
    return _orbax_restore(path, like)


def _orbax_save(path: str, tree: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)


def _orbax_restore(path: str, like: Any) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path, item=like)
    return restored


# ---------------------------------------------------------------------------
# Full train-state checkpoints (resume-capable)
# ---------------------------------------------------------------------------


def save_train_state(path: str, state) -> None:
    """Save a full TrainState (step/params/opt_state)."""
    tree = {"step": state.step, "params": state.params, "opt_state": state.opt_state}
    if path.endswith(".npz"):
        parent = os.path.dirname(os.path.abspath(path))
        os.makedirs(parent, exist_ok=True)  # same contract as save_params
        np.savez(path, **_flatten(tree))
    else:
        _orbax_save(path, tree)


def restore_train_state(path: str, like) -> Any:
    from clipcap_tpu.train.state import TrainState

    tree_like = {"step": like.step, "params": like.params, "opt_state": like.opt_state}
    if path.endswith(".npz"):
        restored = restore_params(path, tree_like)
    else:
        restored = _orbax_restore(path, tree_like)
    return TrainState(
        step=jax.numpy.asarray(restored["step"]),
        params=restored["params"],
        opt_state=jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(like.opt_state),
            jax.tree_util.tree_leaves(restored["opt_state"]),
        ),
    )


class CheckpointSaver:
    """Epoch-end checkpoint callback (reference train/callback.py:5-28):
    saves every ``checkpoint_save_frequency`` epochs plus a final save, and
    drops the model config YAML next to the checkpoints."""

    def __init__(
        self,
        config,
        output_folder: str = "./checkpoints/",
        filename_prefix: str = "clipcap",
        save_every_n_epochs: int = 1,
        use_npz: bool = True,
    ) -> None:
        self.output_folder = output_folder
        self.filename_prefix = filename_prefix
        self.save_every_n_epochs = max(1, save_every_n_epochs)
        self.use_npz = use_npz
        os.makedirs(output_folder, exist_ok=True)

        from clipcap_tpu.config import save_yaml_config

        save_yaml_config(config, os.path.join(output_folder, f"{filename_prefix}_config.yaml"))

    def _path(self, tag: str) -> str:
        name = f"{self.filename_prefix}_{tag}"
        if self.use_npz:
            name += ".npz"
        return os.path.join(self.output_folder, name)

    def on_epoch_end(self, epoch: int, state) -> Optional[str]:
        if (epoch + 1) % self.save_every_n_epochs == 0:
            path = self._path(f"epoch_{epoch}")
            save_train_state(path, jax.device_get(state))
            return path
        return None

    def save_final_checkpoint(self, state) -> str:
        path = self._path("final")
        save_train_state(path, jax.device_get(state))
        return path

    def save_params_only(self, params: Params, tag: str = "model") -> str:
        path = self._path(tag)
        save_params(path, jax.device_get(params))
        return path

"""Model parameter checkpointing (orbax when available, npz fallback).

The reference had no model checkpointing (inference-only; weights were
immutable MLflow artifacts — SURVEY.md §5.4). This framework also trains
(the dp x tp SAM fine-tune step in ``parallel/train.py``), so params need a
save/restore path: orbax-checkpoint for sharded pytrees, or a flat ``.npz``
fallback that round-trips any of our parameter trees.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import jax
import numpy as np

from .logger import setup_logger

logger = setup_logger(__name__)

_SEP = "::"


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if leaf is None:
            continue
        key = _SEP.join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def save_params_npz(params, path) -> None:
    """Flat-key .npz save of a parameter pytree."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **_flatten(params))
    logger.info("saved %d arrays to %s", len(_flatten(params)), path)


def load_params_npz(path, like) -> Any:
    """Restore into the structure of ``like`` (shapes validated)."""
    data = dict(np.load(Path(path), allow_pickle=False))

    def rebuild(path_leaf):
        path, leaf = path_leaf
        if leaf is None:
            return None
        key = _SEP.join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if key not in data:
            raise KeyError(f"checkpoint missing parameter {key}")
        arr = data[key]
        if arr.shape != tuple(np.shape(leaf)):
            raise ValueError(f"shape mismatch for {key}: {arr.shape} vs {np.shape(leaf)}")
        return arr

    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = [rebuild(pl) for pl in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_params(params, path) -> None:
    """Orbax save when available; .npz otherwise (path decides: directory
    -> orbax, .npz file -> npz)."""
    path = Path(path)
    if path.suffix == ".npz":
        save_params_npz(params, path)
        return
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path.absolute(), params, force=True)
        ckptr.wait_until_finished()
        logger.info("saved orbax checkpoint to %s", path)
    except ImportError:
        save_params_npz(params, path.with_suffix(".npz"))


def load_params(path, like) -> Any:
    path = Path(path)
    if path.suffix == ".npz" or path.with_suffix(".npz").exists() and not path.exists():
        p = path if path.suffix == ".npz" else path.with_suffix(".npz")
        return load_params_npz(p, like)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path.absolute(), like)

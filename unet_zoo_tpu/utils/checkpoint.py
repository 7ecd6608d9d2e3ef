"""Checkpointing via Orbax: best + last, with full training state.

Fixes reference quirk Q1 (the ``*_best`` checkpoint was never written,
ref: utils/training_loop.py:252 + utils/early_stopping.py:68-78) and the
missing-resume gap (the reference stores only model weights; here the
optimizer state, step, LR-scheduler and early-stopping state are saved so
training can truly resume, SURVEY.md §5).

Layout: array pytrees (``variables`` / ``opt_state`` / ``step``) go through
orbax (sharding-aware, async-capable); JSON-able metadata (``meta`` /
``scheduler`` / ``early_stopping``) sits beside them in ``extra.json``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

_ARRAY_KEYS = ("variables", "opt_state", "step")
_EXTRA_FILE = "extra.json"


def _to_host(tree: Any) -> Any:
    if jax.process_count() > 1:
        # multi-host: leave (possibly non-addressable) global jax.Arrays
        # in place — orbax saves sharded arrays with every process
        # contributing its shards; device_get would throw on them.
        return tree
    return jax.tree_util.tree_map(jax.device_get, tree)


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    """Write ``payload`` to ``path``: array subtrees via orbax, the rest as
    JSON. Multi-host safe: every process participates in the orbax save;
    only the primary writes the JSON sidecar."""
    path = os.path.abspath(path)
    arrays = {k: payload[k] for k in _ARRAY_KEYS if k in payload}
    extra = {k: v for k, v in payload.items() if k not in _ARRAY_KEYS}

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "arrays"), _to_host(arrays), force=True)
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        with open(os.path.join(path, _EXTRA_FILE), "w") as f:
            json.dump(extra, f)
    if jax.process_count() > 1:
        from unet_zoo_tpu.parallel.multihost import sync_global_devices

        sync_global_devices("checkpoint_save")


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None
                    ) -> Dict[str, Any]:
    """Restore a checkpoint. ``target`` (a matching pytree, e.g. a freshly
    initialized payload) restores exact container types (NamedTuple
    opt_states); without it, arrays come back as nested dicts/lists."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        arr_target = _to_host({k: target[k] for k in _ARRAY_KEYS if k in target})
        arrays = ckptr.restore(os.path.join(path, "arrays"), arr_target)
    else:
        arrays = ckptr.restore(os.path.join(path, "arrays"))
    out = dict(arrays)
    extra_path = os.path.join(path, _EXTRA_FILE)
    if os.path.exists(extra_path):
        with open(extra_path) as f:
            out.update(json.load(f))
    return out


def checkpoint_exists(path: str) -> bool:
    return os.path.isdir(os.path.join(os.path.abspath(path), "arrays"))

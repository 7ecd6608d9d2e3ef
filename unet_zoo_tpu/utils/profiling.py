"""Profiling/accounting: parameter counts, FLOPs, profiler traces.

The reference only has hand-written flops() methods on Swin components
(ref: models/swin_unet_v2.py:763-788) and a param count in the scripts
(ref: scripts/train.py:159-163). Here every model gets exact compiled
FLOPs via XLA cost analysis plus jax.profiler trace capture.
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def count_parameters(params: Any) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def model_flops(model, image_size: int = 256, batch: int = 1,
                train: bool = False) -> Dict[str, float]:
    """Compiled-forward FLOPs/bytes via XLA cost analysis."""
    x = jnp.zeros((batch, image_size, image_size, model.in_channels),
                  jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    def fwd(v, xb):
        return model.module.apply(v, xb, train=False)["main"]

    compiled = jax.jit(fwd).lower(variables, x).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    ca = ca or {}
    return {
        "params": count_parameters(variables["params"]),
        "flops": float(ca.get("flops", 0.0)),
        "flops_per_image": float(ca.get("flops", 0.0)) / batch,
        "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
    }


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard/XProf).
    Works on this image's tunneled TPU backend."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def summarize_trace(log_dir: str, top_k: int = 15):
    """Parse the newest trace under ``log_dir`` and return the top device
    ops by total duration: list of (name, total_ms, pct, hlo_category).

    Complements ``trace()`` for environments without TensorBoard — e.g.::

        with trace("/tmp/prof"):
            predict(x)
        for name, ms, pct, cat in summarize_trace("/tmp/prof"):
            print(f"{ms:8.2f}ms {pct:5.1f}%  [{cat}] {name}")
    """
    import collections
    import glob
    import gzip
    import json
    import os

    paths = sorted(glob.glob(
        os.path.join(log_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {log_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    device_pids = {
        e["pid"] for e in tr.get("traceEvents", [])
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in e.get("args", {}).get("name", "")
    }
    durs = collections.Counter()
    cats = {}
    for e in tr.get("traceEvents", []):
        if (e.get("ph") == "X" and e.get("dur")
                and (not device_pids or e.get("pid") in device_pids)):
            name = e["name"]
            if name.startswith("jit_"):  # whole-program envelope, skip
                continue
            durs[name] += e["dur"]
            cats.setdefault(name, e.get("args", {}).get("hlo_category", ""))
    total = sum(durs.values()) or 1
    return [(name, d / 1e3, 100.0 * d / total, cats.get(name, ""))
            for name, d in durs.most_common(top_k)]

"""Unit tests for the sweep bookkeeping in scripts/bench_all.py.

The sweep writes BENCH_ALL.json, the artifact the round verdicts audit —
its seed/skip/extend semantics must be exact:

* default: swept entries are skipped; unswept ones seed from the fixed
  b32-class column so a losing sweep keeps the honest number
* --force: re-measure from scratch (a stale best may go DOWN)
* --extend: keep the recorded best, run only the new batches (grid
  extension, e.g. probing b256 after a {32,64,128} sweep)
"""

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench_all():
    spec = importlib.util.spec_from_file_location(
        "bench_all", os.path.join(REPO, "scripts", "bench_all.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run(bench_all, tmp_path, data, batches, results, **kw):
    """Drive sweep_batches with a canned run_one; returns (data, calls)."""
    calls = []

    def fake_run_one(model, mode, batch, timeout=0, nbatches=0):
        calls.append((model, mode, batch))
        val = results.get((model, batch))
        return (val, None) if val is not None else (None, "oom")

    bench_all.run_one = fake_run_one
    out = tmp_path / "bench.json"
    bench_all.sweep_batches(["unet"], batches, data, str(out),
                            timeout=1, nbatches=1, **kw)
    return json.loads(out.read_text()) if out.exists() else data, calls


def test_sweep_seeds_from_column_and_keeps_honest_loss(bench_all, tmp_path):
    # b32 column says 1000; the swept batches all lose -> best stays b32
    data = {"fwd": {"unet": 1000.0}, "fwd_best": {}}
    data, calls = _run(bench_all, tmp_path, data, [64, 128],
                       {("unet", 64): 900.0, ("unet", 128): 950.0},
                       force=False)
    assert data["fwd_best"]["unet"] == {
        "img_s": 1000.0, "batch": 32, "swept": True}
    assert [c[2] for c in calls] == [64, 128]


def test_sweep_skips_already_swept(bench_all, tmp_path):
    data = {"fwd": {"unet": 1000.0},
            "fwd_best": {"unet": {"img_s": 1500.0, "batch": 128,
                                  "swept": True}}}
    _, calls = _run(bench_all, tmp_path, data, [64, 128],
                    {("unet", 64): 2000.0}, force=False)
    assert calls == []  # swept -> untouched


def test_force_remeasures_from_scratch_and_may_go_down(bench_all, tmp_path):
    # recorded best 1500@128 is stale; forced re-run measures lower
    data = {"fwd": {"unet": 1000.0},
            "fwd_best": {"unet": {"img_s": 1500.0, "batch": 128,
                                  "swept": True}}}
    data, calls = _run(bench_all, tmp_path, data, [64, 128],
                       {("unet", 32): 800.0, ("unet", 64): 900.0,
                        ("unet", 128): 1200.0}, force=True)
    # base batch 32 was re-measured (not seeded), and best dropped
    assert ("unet", "fwd", 32) in calls
    assert data["fwd_best"]["unet"] == {
        "img_s": 1200.0, "batch": 128, "swept": True}


def test_extend_keeps_recorded_best_and_runs_only_new_batches(
        bench_all, tmp_path):
    data = {"fwd": {"unet": 1000.0},
            "fwd_best": {"unet": {"img_s": 1500.0, "batch": 128,
                                  "swept": True}}}
    # losing extension: best unchanged
    d1, calls = _run(bench_all, tmp_path, dict(json.loads(json.dumps(data))),
                     [256], {("unet", 256): 1400.0}, force=False, extend=True)
    assert [c[2] for c in calls] == [256]
    assert d1["fwd_best"]["unet"]["img_s"] == 1500.0
    assert d1["fwd_best"]["unet"]["batch"] == 128
    # winning extension: best moves to the new batch
    d2, _ = _run(bench_all, tmp_path, dict(json.loads(json.dumps(data))),
                 [256], {("unet", 256): 1800.0}, force=False, extend=True)
    assert d2["fwd_best"]["unet"] == {
        "img_s": 1800.0, "batch": 256, "swept": True}


def test_extend_without_prior_entry_measures_base(bench_all, tmp_path):
    # no fwd_best row and no column row: base batch gets measured too
    data = {"fwd": {}, "fwd_best": {}}
    d, calls = _run(bench_all, tmp_path, data, [256],
                    {("unet", 32): 700.0, ("unet", 256): 1800.0},
                    force=False, extend=True)
    assert [c[2] for c in calls] == [32, 256]
    assert d["fwd_best"]["unet"]["batch"] == 256


def test_oom_batch_is_skipped_not_fatal(bench_all, tmp_path):
    data = {"fwd": {"unet": 1000.0}, "fwd_best": {}}
    d, _ = _run(bench_all, tmp_path, data, [64, 128],
                {("unet", 64): 1100.0},  # 128 "OOMs" (None)
                force=False)
    assert d["fwd_best"]["unet"] == {
        "img_s": 1100.0, "batch": 64, "swept": True}

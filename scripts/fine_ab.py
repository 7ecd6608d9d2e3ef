#!/usr/bin/env python
"""Fine-structure quality A/B (round-5 item 1).

Trains zoo members on the fine-structure benchmark
(scripts/make_fine_dataset.py: 1-3px curves, 2-5px blobs, touching
pairs — built because the shapes set saturates at >=0.99 Dice for every
member and cannot resolve the flagship's stride-4 head tradeoff), then
evaluates the best checkpoint on the test split with BOTH metrics:

* per-image Dice (the zoo's standard, ref utils/metrics.py:7-24);
* per-image boundary-F1 at tolerance 2 (train/metrics.py boundary_f1)
  — Dice under-weights thin-structure errors.

Each job trains through the production ``scripts/train.py`` (real data
pipeline, orbax best checkpoint), so this doubles as a fed-from-disk
receipt. Results land in FINE_AB.json, keyed by job label; re-runs skip
jobs that already have results (``--force`` to redo).

Usage (real TPU by default; UNET_ZOO_PLATFORM=cpu to force CPU):
  python scripts/fine_ab.py --models unet,unet_tpu \
      --jobs '[{"label":"unet_tpu_dts","name":"unet_tpu",
                "params":{"head_mode":"dts"}}]' \
      [--epochs 12] [--size 256] [--batch 16] [--lr 3e-4]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

if os.environ.get("UNET_ZOO_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["UNET_ZOO_PLATFORM"])


def ensure_dataset(data_dir, size, n_train, n_valid, n_test, seed):
    subprocess.run(
        [sys.executable,
         os.path.join(ROOT, "scripts", "make_fine_dataset.py"),
         "--out", data_dir, "--size", str(size), "--train", str(n_train),
         "--valid", str(n_valid), "--test", str(n_test),
         "--seed", str(seed)],
        check=True)


def train_job(job, args, run_dir):
    """One scripts/train.py run; returns (val_dice_traj, best_ckpt)."""
    label, name = job["label"], job["name"]
    params = {name: job.get("params", {})} if job.get("params") else {}
    wd = os.path.join(run_dir, label)
    os.makedirs(wd, exist_ok=True)
    cfg = {
        "general": {"project_name": f"fine_{label}", "working_dir": wd},
        # cache: decode once, RAM after — on this 1-core host the PNG
        # decode otherwise rate-limits every epoch (identical pixels;
        # epochs 2+ then run at step speed, which is also the cached
        # fed-rate receipt for item 4)
        "data": {"dataset_dir": args.data_dir, "num_workers": 0,
                 "image_size": args.size, "cache": True},
        "training": {"epochs": args.epochs, "batch_size": args.batch,
                     "learning_rate": args.lr,
                     "early_stopping_patience": 50,
                     "lr_scheduler_patience": 6,
                     "lr_scheduler_factor": 0.2, "min_lr": 1e-7,
                     "num_classes": 1, "seed": args.seed},
        "gpu": {"use_multi_gpu": False},
        "tpu": {"compute_dtype": args.dtype},
        "models": {"names": [name], "params": params},
    }
    import yaml

    cfg_path = os.path.join(wd, "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "train.py"),
         "--config", cfg_path],
        capture_output=True, text=True, env=dict(os.environ), cwd=ROOT)
    if proc.returncode != 0:
        raise RuntimeError(
            f"{label}: training failed:\n{proc.stderr[-3000:]}")
    runs = sorted(d for d in os.listdir(wd) if d.startswith("overall_runs_"))
    base = os.path.join(wd, runs[-1], name)
    log_text = ""
    log_dir = os.path.join(base, "logs")
    for fn in os.listdir(log_dir):
        log_text += open(os.path.join(log_dir, fn)).read()
    traj = [float(v) for v in re.findall(r"Val DICE:\s+([0-9.]+)", log_text)]
    best = os.path.join(base, "checkpoints", f"{name}_best")
    return traj, best


def evaluate_job(job, ckpt, args):
    """Best-checkpoint eval on the test split: mean per-image Dice +
    boundary-F1 (tolerance 2)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unet_zoo_tpu.data.datasets import BoneDataset
    from unet_zoo_tpu.data.grain_loader import create_loader
    from unet_zoo_tpu.models import create_model
    from unet_zoo_tpu.train.metrics import boundary_f1
    from unet_zoo_tpu.utils.checkpoint import load_checkpoint

    params = dict(job.get("params") or {})
    params.setdefault("image_size", args.size)
    if args.dtype == "bfloat16" and "dtype" not in params:
        params["dtype"] = jnp.bfloat16
    model = create_model(job["name"], **params)
    restored = load_checkpoint(ckpt)
    variables = restored.get("variables", restored)

    ds = BoneDataset(args.data_dir, "test", image_size=args.size)
    loader = create_loader(ds, args.batch, num_workers=0)

    from unet_zoo_tpu.data.datasets import prepare_images

    @jax.jit
    def fwd(v, x):
        # normalization inside the jit (eager per-op dispatch is ~70s
        # over this image's TPU tunnel)
        out = model.module.apply(v, prepare_images(x), train=False)
        return out["main"].astype(jnp.float32)

    dices, bf1s, bf1s1 = [], [], []
    for imgs, masks, _ in loader:
        logits = np.asarray(fwd(variables, jnp.asarray(imgs)))
        m = np.asarray(masks).astype(np.float32)
        pred = (1.0 / (1.0 + np.exp(-logits))) > 0.5
        for i in range(pred.shape[0]):
            p, t = pred[i, ..., 0], m[i, ..., 0] > 0.5
            inter = float((p & t).sum())
            union = float(p.sum() + t.sum())
            dices.append(1.0 if union == 0 else 2.0 * inter / union)
            bf1s.append(boundary_f1(p, t, tolerance=2))
            # tol-1: the stricter column — tol 2 forgives a stride-4
            # head's sub-cell boundary placement almost entirely
            bf1s1.append(boundary_f1(p, t, tolerance=1))
    return (float(np.mean(dices)), float(np.mean(bf1s)),
            float(np.mean(bf1s1)), len(dices))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval-one", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--models", default="",
                    help="comma list of plain member jobs")
    ap.add_argument("--jobs", default=None,
                    help='JSON list of {"label","name","params"} jobs')
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--train", type=int, default=400)
    ap.add_argument("--valid", type=int, default=64)
    ap.add_argument("--test", type=int, default=64)
    ap.add_argument("--data-dir", default="/tmp/fine_ds")
    ap.add_argument("--run-dir", default="/tmp/fine_runs")
    ap.add_argument("--out", default=os.path.join(ROOT, "FINE_AB.json"))
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    if args.eval_one:
        # child mode: evaluate one job and emit a single JSON line —
        # keeps the orchestrating parent free of any TPU client (this
        # image's relay serializes clients; an idle parent holding one
        # would queue against the next training subprocess)
        spec = json.loads(args.eval_one)
        dice, bf1, bf1t1, n = evaluate_job(spec["job"], spec["ckpt"], args)
        print("EVAL_RESULT " + json.dumps(
            {"dice": dice, "bf1": bf1, "bf1_tol1": bf1t1, "n": n}))
        return

    jobs = [{"label": m.strip(), "name": m.strip(), "params": {}}
            for m in args.models.split(",") if m.strip()]
    if args.jobs:
        jobs += json.loads(args.jobs)

    ensure_dataset(args.data_dir, args.size, args.train, args.valid,
                   args.test, args.seed)

    record = {"config": {
        "size": args.size, "epochs": args.epochs, "batch": args.batch,
        "lr": args.lr, "dtype": args.dtype, "seed": args.seed,
        "train": args.train, "valid": args.valid, "test": args.test,
        "dataset": "fine structures (make_fine_dataset.py): 1-3px "
                   "curves, 2-5px blobs, touching pairs",
        "metrics": "mean per-image test Dice + boundary-F1 (tol 2)"}}
    if os.path.exists(args.out):
        record = json.load(open(args.out))
    record.setdefault("jobs", {})

    for job in jobs:
        label = job["label"]
        if label in record["jobs"] and not args.force:
            print(f"[skip] {label}: already measured")
            continue
        print(f"[train] {label} ({job['name']} {job.get('params', {})})",
              flush=True)
        traj, ckpt = train_job(job, args, args.run_dir)
        print(f"[eval]  {label}: val traj {traj}", flush=True)
        spec = json.dumps({"job": job, "ckpt": ckpt})
        forward = ["--size", str(args.size), "--batch", str(args.batch),
                   "--data-dir", args.data_dir, "--dtype", args.dtype]
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--eval-one", spec] + forward,
            capture_output=True, text=True, env=dict(os.environ), cwd=ROOT)
        if proc.returncode != 0:
            raise RuntimeError(f"{label}: eval failed:\n"
                               f"{proc.stderr[-2000:]}")
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("EVAL_RESULT ")][-1]
        res = json.loads(line[len("EVAL_RESULT "):])
        dice, bf1, n = res["dice"], res["bf1"], res["n"]
        record["jobs"][label] = {
            "name": job["name"], "params": job.get("params", {}),
            "val_dice": [round(v, 4) for v in traj],
            "test_dice": round(dice, 4), "test_boundary_f1": round(bf1, 4),
            "test_boundary_f1_tol1": round(res.get("bf1_tol1", -1), 4),
            "n_test": n, "ckpt": ckpt}
        json.dump(record, open(args.out, "w"), indent=1)
        print(f"[done]  {label}: test Dice {dice:.4f} | boundary-F1 "
              f"{bf1:.4f}", flush=True)

    for label, r in record["jobs"].items():
        print(f"{label:24s} dice {r['test_dice']:.4f}  bf1 "
              f"{r['test_boundary_f1']:.4f}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Small-batch serving latency table (round-5 item 6).

Batch-1 inference at 256/512px is the realistic clinical serving shape
for this zoo (ref use case: single-image visualization/eval,
ref utils/visualize.py:51-197) — but every published receipt so far is
b128 throughput. This driver measures the small-batch cells:

* core table: unet / unet_tpu / u2net_tpu at 256/512px, b1/b8
  (+ attention_unet, u2net at 256px b1);
* the fused decoder kernel's switch point: unet with
  ``use_pallas: true`` vs the XLA path at the same cells (the round-3
  kernel wins 1.6-2.5x at small batch — this measures exactly where,
  so the auto-gate can be set from data).

Methodology = bench.py's (each cell is a subprocess -> one TPU client
at a time; scanned batches in one program, fresh on-device data,
dependent-scalar fetch, measured dispatch+fetch overhead subtracted).
Device-side latency is reported as ``ms_per_batch = batch /
corrected_img_s * 1000`` — steady-state per-batch time; the ~25 ms
relay roundtrip of this test rig is excluded (it is tunnel plumbing,
not chip latency). Small batches scan more batches so the timed
section stays well above the overhead.

Usage: python scripts/bench_latency.py [--out LATENCY.json] [--quick]
Resumable: existing cells are skipped.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cells(quick: bool):
    core = [("unet", s, b, None) for s in (256, 512) for b in (1, 8)]
    core += [("unet_tpu", 256, b, None) for b in (1, 8)]
    core += [("u2net_tpu", 256, b, None) for b in (1, 8)]
    core += [("unet_tpu", 512, 1, None), ("u2net_tpu", 512, 1, None)]
    core += [("attention_unet", 256, 1, None), ("u2net", 256, 1, None)]
    # fused_up at 512px only: the round-3 in-model A/B already measured
    # 256px (kernel loses 0.87-1.01x at every batch — BENCH_NOTES
    # "unet small-batch latency A/B"; the standalone 1.6-2.5x win never
    # transfers because XLA fuses the skip-concat into the consumer
    # conv). 512px small-batch is the unmeasured cell.
    pall = [("unet", 512, b, {"use_pallas": True}) for b in (1, 8)]
    if quick:
        return core[:4]
    return core + pall


def nbatches_for(batch: int) -> int:
    return {1: 512, 4: 256, 8: 128}.get(batch, 32)


def key(model, size, batch, kwargs):
    tag = "+pallas" if (kwargs or {}).get("use_pallas") else ""
    return f"{model}{tag}_{size}px_b{batch}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT, "LATENCY.json"))
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()

    record = {"note": "device-side steady-state latency: scanned-batch "
                      "throughput with measured relay overhead "
                      "subtracted (bench.py methodology); ms_per_batch "
                      "= batch/corrected_img_s*1000"}
    if os.path.exists(args.out):
        record = json.load(open(args.out))
    record.setdefault("cells", {})

    env = dict(os.environ)
    env["UNET_ZOO_BENCH_FLAGSHIP"] = "0"
    for model, size, batch, kwargs in cells(args.quick):
        k = key(model, size, batch, kwargs)
        if k in record["cells"]:
            print(f"[skip] {k}")
            continue
        cmd = [sys.executable, os.path.join(ROOT, "bench.py"),
               "--model", model, "--size", str(size),
               "--batch", str(batch),
               "--nbatches", str(nbatches_for(batch))]
        if kwargs:
            cmd += ["--model-kwargs", json.dumps(kwargs)]
        print(f"[run]  {k}", flush=True)
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  cwd=ROOT, env=env, timeout=args.timeout)
        except subprocess.TimeoutExpired:
            record["cells"][k] = {"error": "timeout"}
            json.dump(record, open(args.out, "w"), indent=1)
            continue
        lines = [ln for ln in proc.stdout.splitlines()
                 if ln.startswith("{")]
        if proc.returncode != 0 or not lines:
            record["cells"][k] = {
                "error": proc.stderr[-500:] or "no output"}
            json.dump(record, open(args.out, "w"), indent=1)
            print(f"[fail] {k}", flush=True)
            continue
        row = json.loads(lines[-1])
        cips = row.get("corrected_images_per_sec") or row["value"]
        record["cells"][k] = {
            "model": model, "size": size, "batch": batch,
            "kwargs": kwargs or {},
            "images_per_sec": row["value"],
            "corrected_images_per_sec": cips,
            "ms_per_batch": round(batch / cips * 1e3, 3),
            "ms_per_image": round(1e3 / cips, 3),
        }
        json.dump(record, open(args.out, "w"), indent=1)
        print(f"[done] {k}: {record['cells'][k]['ms_per_batch']} ms/batch",
              flush=True)

    print(f"\n{'cell':34s} {'ms/batch':>9s} {'img/s':>8s}")
    for k, r in sorted(record["cells"].items()):
        if "error" in r:
            print(f"{k:34s} ERROR {r['error'][:40]}")
        else:
            print(f"{k:34s} {r['ms_per_batch']:9.2f} "
                  f"{r['corrected_images_per_sec']:8.1f}")


if __name__ == "__main__":
    main()

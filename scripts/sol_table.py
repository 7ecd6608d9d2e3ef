#!/usr/bin/env python
"""Roofline accounting: BENCH_ALL.json × MODELS.md GF/img → %-of-SOL table.

Speed-of-light per model = peak bf16 FLOP/s divided by per-image FLOPs
(fwd column; the train column assumes the standard fwd+bwd ≈ 3× fwd FLOP
count). Prints a markdown table sorted by fwd %SOL so the
architecture-bound members are visible at a glance, plus the fwd/train
ratio (outliers there are framework problems — donation, remat, bf16
bwd — not architecture).

Usage: python scripts/sol_table.py [--peak-tflops 197]
"""

from __future__ import annotations

import argparse
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def gf_per_img_from_models_md():
    """Parse the `GF/img @256` column out of MODELS.md's inventory table."""
    out = {}
    path = os.path.join(REPO, "MODELS.md")
    for line in open(path):
        m = re.match(r"\| `(\w+)` \|[^|]*\|[^|]*\| ([\d.]+|—) \|", line)
        if m and m.group(2) != "—":
            out[m.group(1)] = float(m.group(2))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="bf16 peak of the bench chip (v5e: 197)")
    ap.add_argument("--bench", default=os.path.join(REPO, "BENCH_ALL.json"))
    args = ap.parse_args()

    bench = json.load(open(args.bench))
    gf = gf_per_img_from_models_md()
    peak = args.peak_tflops * 1e3  # GFLOP/s

    best = bench.get("fwd_best", {})
    tbest = bench.get("train_best", {})
    rows = []
    for name, fwd in bench.get("fwd", {}).items():
        if name.startswith("_") or name not in gf:
            continue
        train = bench.get("train", {}).get(name)
        b = best.get(name)
        tb = tbest.get(name)
        bfwd = b["img_s"] if b else fwd
        btrain = tb["img_s"] if tb else train
        sol_fwd = 100.0 * bfwd * gf[name] / peak
        sol_train = (100.0 * btrain * 3 * gf[name] / peak
                     if btrain else None)
        # like-for-like: best fwd over best train (both default to the
        # b32-class column when unswept)
        ratio = (bfwd / btrain) if btrain else None
        rows.append((name, gf[name], fwd, b, sol_fwd, train, tb,
                     sol_train, ratio))

    rows.sort(key=lambda r: -r[4])
    print("| model | GF/img | fwd b32 | fwd best (batch) | fwd %SOL | "
          "train b32 | train best (batch) | train %SOL | fwd/train |")
    print("|---|---|---|---|---|---|---|---|---|")
    for name, g, fwd, b, sf, tr, tb, st, ratio in rows:
        bb = f"{b['img_s']:.0f} (b{b['batch']})" if b else "—"
        t = f"{tr:.0f}" if tr else "—"
        tbb = f"{tb['img_s']:.0f} (b{tb['batch']})" if tb else "—"
        s = f"{st:.1f}%" if st else "—"
        r = f"{ratio:.2f}" if ratio else "—"
        print(f"| {name} | {g:.1f} | {fwd:.0f} | {bb} | {sf:.1f}% | {t} | "
              f"{tbb} | {s} | {r} |")


if __name__ == "__main__":
    main()

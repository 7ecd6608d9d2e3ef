"""MODELS.md's quality-A/B table stays in sync with QUALITY_AB.json
(round-5 item 8: the matching-or-beating claim auditable per member)."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_models_md_quality_table_in_sync():
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts",
                                      "quality_summary.py")],
        capture_output=True, text=True, cwd=ROOT, check=True)
    generated = proc.stdout.strip()

    text = open(os.path.join(ROOT, "MODELS.md")).read()
    start = "<!-- QUALITY_AB_TABLE_START -->"
    end = "<!-- QUALITY_AB_TABLE_END -->"
    assert start in text, "MODELS.md lost its quality-A/B markers"
    block = text.split(start, 1)[1].split(end, 1)[0].strip()
    assert block == generated, (
        "MODELS.md quality table is stale — regenerate with "
        "`python scripts/quality_summary.py --write-models`")

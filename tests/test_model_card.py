"""Model-card generator (scripts/model_card.py) — the reference's
"Model Card Integration" roadmap item (ref: README.md:181)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "model_card.py")


def _run(*args):
    env = dict(os.environ, UNET_ZOO_PLATFORM="cpu")
    return subprocess.run([sys.executable, SCRIPT, *args],
                          capture_output=True, text=True, env=env)


@pytest.mark.slow
def test_single_card_stdout():
    r = _run("--model", "u2net")
    assert r.returncode == 0, r.stderr
    card = r.stdout
    # filled from the registry: deep-supervision protocol + loss weights
    assert "# Model card — `u2net`" in card
    assert "side" in card and "Deep-supervision loss weights" in card
    # filled from measured artifacts, never invented
    assert "img/s" in card or "not measured" in card
    assert "Best validation Dice" in card or "Not yet" in card


@pytest.mark.slow
def test_all_cards_generated(tmp_path):
    r = _run("--all", "--out", str(tmp_path))
    assert r.returncode == 0, r.stderr
    from unet_zoo_tpu.models import list_models

    names = list_models()
    files = sorted(p for p in os.listdir(tmp_path) if p.endswith(".md"))
    assert files == sorted(f"{n}.md" for n in names)
    # every card is template-complete: no unfilled {placeholders}
    import re

    for fn in files:
        text = (tmp_path / fn).read_text()
        leftovers = [m for m in re.findall(r"(?<!\{)\{(\w+)\}(?!\})", text)
                     if m not in ("names",)]  # YAML example braces
        assert not leftovers, (fn, leftovers)


def test_committed_cards_in_sync():
    # the checked-in model_cards/ directory covers the whole registry
    from unet_zoo_tpu.models import list_models

    card_dir = os.path.join(REPO, "model_cards")
    files = {p for p in os.listdir(card_dir) if p.endswith(".md")}
    assert files == {f"{n}.md" for n in list_models()}

"""docs/CLI.md stays in sync with the live --help of every entry point.

Slow: regenerating pays each script's import cost in a subprocess.
"""

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_gen():
    spec = importlib.util.spec_from_file_location(
        "gen_cli_docs", os.path.join(REPO, "scripts", "gen_cli_docs.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_cli_docs_list_every_argparse_script():
    """Fast guard: any new argparse entry point must be in the CLI docs."""
    gen = _load_gen()
    documented = set(gen.SCRIPTS)
    missing = []
    for dirpath, fn in [("scripts", f) for f in os.listdir(
            os.path.join(REPO, "scripts"))] + [(".", "bench.py")]:
        if not fn.endswith(".py"):
            continue
        path = os.path.join(REPO, dirpath, fn)
        with open(path) as f:
            src = f.read()
        rel = os.path.normpath(os.path.join(dirpath, fn))
        if "argparse" in src and rel not in documented:
            missing.append(rel)
    assert not missing, f"scripts absent from docs/CLI.md: {missing}"


@pytest.mark.slow
def test_cli_docs_in_sync():
    gen = _load_gen()
    fresh = gen.build()
    with open(os.path.join(REPO, "docs", "CLI.md")) as f:
        assert f.read() == fresh, (
            "docs/CLI.md is stale — run `python scripts/gen_cli_docs.py`")

"""docs/API.md stays in sync with the live package surface.

Mirrors the model-card sync test: the generated artifact is checked in,
and this test regenerates it from the code and asserts byte equality —
so the roadmap item "Detailed API documentation for all modules and
functions" (ref: README.md:180) cannot silently rot.
"""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_gen():
    spec = importlib.util.spec_from_file_location(
        "gen_api_docs", os.path.join(REPO, "scripts", "gen_api_docs.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_api_docs_in_sync():
    gen = _load_gen()
    fresh = gen.build()
    with open(os.path.join(REPO, "docs", "API.md")) as f:
        on_disk = f.read()
    assert fresh == on_disk, (
        "docs/API.md is stale — run `python scripts/gen_api_docs.py`")


def test_api_docs_cover_all_modules():
    gen = _load_gen()
    names = [n for n, _ in gen._iter_modules()]
    # every .py file under the package (minus __init__, which docs as the
    # parent package) must appear as a module section
    missing = []
    pkg_root = os.path.join(REPO, "unet_zoo_tpu")
    for dirpath, _dirnames, filenames in os.walk(pkg_root):
        for fn in filenames:
            if not fn.endswith(".py"):
                continue
            rel = os.path.relpath(os.path.join(dirpath, fn), REPO)
            mod = rel[:-3].replace(os.sep, ".")
            if mod.endswith(".__init__"):
                mod = mod[: -len(".__init__")]
            if mod not in names:
                missing.append(mod)
    assert not missing, f"modules absent from API docs: {missing}"

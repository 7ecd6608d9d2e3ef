#!/usr/bin/env python
"""Generate API reference documentation for every public module.

The reference lists "Comprehensive Documentation: Detailed API
documentation for all modules and functions" as roadmap work
(ref: README.md:180). This script delivers it: it walks the
``unet_zoo_tpu`` package, introspects every public module, class and
function, and emits one markdown reference (`docs/API.md`) straight from
the live signatures and docstrings — so the docs cannot drift from the
code (a sync test regenerates and compares, mirroring the model-card
sync test).

Usage:
    python scripts/gen_api_docs.py                 # write docs/API.md
    python scripts/gen_api_docs.py --check         # exit 1 if stale
"""

from __future__ import annotations

import argparse
import importlib
import inspect
import os
import pkgutil
import re
import sys

# keep doc generation off the tunneled TPU backend (import side effects
# only; nothing here executes device code)
os.environ.setdefault("UNET_ZOO_PLATFORM", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PACKAGE = "unet_zoo_tpu"

# flax dataclass plumbing that is not part of the user-facing API
_SKIP_PARAMS = {"parent", "name"}
_SKIP_METHODS = {
    # flax.linen.Module machinery inherited by every model/block
    "apply", "init", "init_with_output", "bind", "unbind", "clone",
    "setup", "param", "variable", "variables", "tabulate", "lazy_init",
    "has_variable", "make_rng", "has_rng", "is_initializing",
    "is_mutable_collection", "put_variable", "sow", "perturb",
    "get_variable", "module_paths", "copy",
}


def _is_public(name: str) -> bool:
    return not name.startswith("_")


def _defined_here(obj, modname: str) -> bool:
    return getattr(obj, "__module__", None) == modname


def _clean_signature(obj) -> str:
    try:
        sig = inspect.signature(obj)
    except (TypeError, ValueError):
        return "(...)"
    params = [p for p in sig.parameters.values() if p.name not in _SKIP_PARAMS]
    sig = sig.replace(parameters=params)
    text = str(sig)
    # strip module paths the reader doesn't need in a signature line
    for noise in ("jax.numpy.", "flax.linen.", "numpy.", "typing."):
        text = text.replace(noise, "")
    # default-value reprs carry memory addresses — not deterministic
    text = re.sub(r" at 0x[0-9a-f]+", "", text)
    return text


def _doc(obj) -> str:
    doc = inspect.getdoc(obj)
    if not doc:
        return ""
    # drop the auto-generated dataclass docstring ("ClassName(field: ...")
    name = getattr(obj, "__name__", None)
    if name and doc.startswith(f"{name}(") and "\n" not in doc.strip():
        return ""
    return doc.strip()


def _first_line(doc: str) -> str:
    return doc.split("\n", 1)[0] if doc else ""


def _source_line(obj) -> int:
    try:
        return inspect.getsourcelines(obj)[1]
    except (TypeError, OSError):
        return 1 << 30


def _iter_modules():
    pkg = importlib.import_module(PACKAGE)
    names = [PACKAGE]
    for info in pkgutil.walk_packages(pkg.__path__, prefix=PACKAGE + "."):
        names.append(info.name)
    for name in sorted(names):
        try:
            yield name, importlib.import_module(name)
        except ImportError:
            # e.g. unet_zoo_tpu/native/libuzio.so — a ctypes shared
            # library that pkgutil mistakes for an extension module
            continue


def _public_members(mod):
    """Public classes/functions *defined in* ``mod``, in source order."""
    modname = mod.__name__
    explicit = getattr(mod, "__all__", None)
    out = []
    for name, obj in vars(mod).items():
        if not _is_public(name):
            continue
        if not (inspect.isclass(obj) or inspect.isfunction(obj)):
            continue
        if explicit is not None and name in explicit:
            pass  # re-exported surface counts even if defined elsewhere
        elif not _defined_here(obj, modname):
            continue
        out.append((name, obj))
    out.sort(key=lambda kv: (_source_line(kv[1]), kv[0]))
    return out


def _render_function(name: str, obj, level: str = "###") -> list[str]:
    lines = [f"{level} `{name}{_clean_signature(obj)}`", ""]
    doc = _doc(obj)
    if doc:
        lines += [doc, ""]
    return lines


def _render_class(name: str, obj) -> list[str]:
    lines = [f"### class `{name}{_clean_signature(obj)}`", ""]
    doc = _doc(obj)
    if doc:
        lines += [doc, ""]
    methods = []
    for mname, mobj in vars(obj).items():
        if not _is_public(mname) or mname in _SKIP_METHODS:
            continue
        # staticmethod/classmethod both expose the wrapped function as
        # __func__ (staticmethod has no .func attribute on py3.12).
        func = mobj.__func__ if isinstance(mobj, (staticmethod, classmethod)) else mobj
        if isinstance(mobj, property):
            pdoc = _first_line(_doc(mobj))
            methods.append((1 << 29, [f"- **`.{mname}`** (property)"
                                      + (f" — {pdoc}" if pdoc else "")]))
            continue
        if not inspect.isfunction(func):
            continue
        mdoc = _first_line(_doc(func))
        entry = f"- **`.{mname}{_clean_signature(func)}`**"
        if mdoc:
            entry += f" — {mdoc}"
        methods.append((_source_line(func), [entry]))
    methods.sort(key=lambda kv: kv[0])
    if methods:
        lines += [line for _, chunk in methods for line in chunk]
        lines.append("")
    return lines


def build() -> str:
    lines = [
        "# `unet_zoo_tpu` API reference",
        "",
        "Generated by `scripts/gen_api_docs.py` from live signatures and",
        "docstrings — do not edit by hand (`python scripts/gen_api_docs.py`",
        "regenerates; `tests/test_api_docs.py` asserts sync). Covers every",
        "public module, class and function in the package. Command-line",
        "entry points are documented in `README.md` (training/eval CLIs)",
        "and the per-script `--help`.",
        "",
        "## Module index",
        "",
    ]
    modules = list(_iter_modules())
    for name, mod in modules:
        # GitHub's heading slugger: lowercase, drop punctuation (backticks,
        # dots), KEEP underscores. Heading text is `name` in backticks.
        anchor = name.replace(".", "").lower()
        lines.append(f"- [`{name}`](#{anchor}) — {_first_line(_doc(mod))}")
    lines.append("")
    for name, mod in modules:
        lines += [f"## `{name}`", ""]
        doc = _doc(mod)
        if doc:
            lines += [doc, ""]
        for mname, mobj in _public_members(mod):
            if inspect.isclass(mobj):
                lines += _render_class(mname, mobj)
            else:
                lines += _render_function(mname, mobj)
    return "\n".join(lines).rstrip() + "\n"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="exit 1 if docs/API.md is stale")
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "API.md"))
    args = ap.parse_args()

    text = build()
    if args.check:
        with open(args.out) as f:
            on_disk = f.read()
        if on_disk != text:
            print("docs/API.md is STALE — run scripts/gen_api_docs.py",
                  file=sys.stderr)
            sys.exit(1)
        print("docs/API.md is in sync")
        return
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(text)
    print(f"wrote {args.out} ({len(text.splitlines())} lines)")


if __name__ == "__main__":
    main()

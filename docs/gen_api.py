#!/usr/bin/env python3
"""Generate the markdown API reference under ``docs/api/`` from the
package's docstrings (no external doc tooling in this image; the
reference's sphinx skeleton is stale pyABC autodoc, ``docs/index.rst:6``).

Usage: ``python docs/gen_api.py`` from the repo root, then commit the
regenerated ``docs/api/*.md``.
"""
from __future__ import annotations

import importlib
import inspect
import os
import pkgutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "docs", "api")

SKIP_MODULES = {"pyapes_tpu.ops.pallas_stencil_db"}  # internal variant


def _sig(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj) -> str:
    d = inspect.getdoc(obj)
    return d.strip() if d else ""


def _is_public(name: str) -> bool:
    return not name.startswith("_")


def render_module(modname: str) -> str | None:
    try:
        mod = importlib.import_module(modname)
    except Exception as e:  # optional deps (orbax) may be absent
        print(f"skip {modname}: {e}")
        return None
    lines = [f"# `{modname}`", ""]
    md = _doc(mod)
    if md:
        lines += [md, ""]

    members = [
        (n, o) for n, o in inspect.getmembers(mod)
        if _is_public(n) and getattr(o, "__module__", None) == modname
    ]
    classes = [(n, o) for n, o in members if inspect.isclass(o)]
    funcs = [(n, o) for n, o in members if inspect.isfunction(o)]

    for n, cls in classes:
        lines += [f"## class `{n}{_sig(cls)}`", ""]
        cd = _doc(cls)
        if cd:
            lines += [cd, ""]
        for mn, m in inspect.getmembers(cls):
            if not _is_public(mn):
                continue
            if inspect.isfunction(m) and m.__qualname__.startswith(
                cls.__qualname__
            ):
                lines += [f"### `{n}.{mn}{_sig(m)}`", ""]
                mdoc = _doc(m)
                if mdoc:
                    lines += [mdoc, ""]
            elif isinstance(
                inspect.getattr_static(cls, mn, None), property
            ):
                p = inspect.getattr_static(cls, mn)
                pd = _doc(p.fget) if p.fget else ""
                lines += [f"### property `{n}.{mn}`", ""]
                if pd:
                    lines += [pd, ""]

    for n, fn in funcs:
        lines += [f"## `{n}{_sig(fn)}`", ""]
        fd = _doc(fn)
        if fd:
            lines += [fd, ""]

    if len(lines) <= 3:
        return None
    return "\n".join(lines) + "\n"


def main() -> None:
    import pyapes_tpu

    os.makedirs(OUT, exist_ok=True)
    names = ["pyapes_tpu"]
    for m in pkgutil.walk_packages(
        pyapes_tpu.__path__, prefix="pyapes_tpu."
    ):
        names.append(m.name)

    index = [
        "# pyapes_tpu API reference",
        "",
        "Generated from docstrings by `docs/gen_api.py` "
        "(regenerate after API changes).",
        "",
    ]
    for name in sorted(set(names)):
        if name in SKIP_MODULES:
            continue
        text = render_module(name)
        if text is None:
            continue
        fname = name.replace(".", "_") + ".md"
        with open(os.path.join(OUT, fname), "w") as f:
            f.write(text)
        first = ""
        try:
            first = (inspect.getdoc(importlib.import_module(name)) or "")
            first = first.strip().splitlines()[0] if first.strip() else ""
        except Exception:
            pass
        index.append(f"- [`{name}`]({fname}) — {first}")
    with open(os.path.join(OUT, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print(f"wrote {len(index) - 4} module pages to docs/api/")


if __name__ == "__main__":
    main()

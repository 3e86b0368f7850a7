#!/usr/bin/env python
"""Generate docs/API.md from the subpackages' ``__all__`` exports.

One table per subpackage: exported symbol, kind, first docstring line.
``tests/test_api_doc.py`` regenerates this and fails if the committed file
is stale — run ``python tools/gen_api_md.py`` after changing any public
export.
"""

from __future__ import annotations

import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SUBPACKAGES = [
    "io", "frontend", "data", "models", "train", "score",
    "serve", "xai", "parallel", "ops", "utils",
]

HEADER = """# Public API index

Auto-generated from each subpackage's ``__all__`` by
``tools/gen_api_md.py`` (guarded fresh by ``tests/test_api_doc.py``).
The reference-repo symbol each public name re-implements is cited in the
object's own docstring; the high-level mapping is in README.md.
"""


def _first_line(obj) -> str:
    import re

    doc = inspect.getdoc(obj)
    if not doc:
        return ""
    line = doc.strip().splitlines()[0].strip()
    # dataclass/flax auto-docstrings embed repr addresses — not stable
    line = re.sub(r" object at 0x[0-9a-f]+", " object", line)
    if len(line) > 140:
        line = line[:137] + "..."
    return line.replace("|", "\\|")


def _kind(obj) -> str:
    if inspect.isclass(obj):
        return "class"
    if inspect.isfunction(obj) or inspect.isbuiltin(obj):
        return "function"
    if callable(obj):
        return "callable"
    return type(obj).__name__


def generate() -> str:
    import jax

    jax.config.update("jax_platforms", "cpu")

    out = [HEADER]
    for sub in SUBPACKAGES:
        mod = importlib.import_module(f"audioanalysisdetector_tpu.{sub}")
        names = sorted(getattr(mod, "__all__"))
        first = (inspect.getdoc(mod) or "").strip().splitlines()
        out.append(f"\n## `audioanalysisdetector_tpu.{sub}`\n")
        if first:
            out.append(first[0].replace("|", "\\|") + "\n")
        out.append("\n| symbol | kind | summary |\n|---|---|---|")
        for name in names:
            obj = getattr(mod, name)
            kind = _kind(obj)
            if kind not in ("class", "function", "callable"):
                out.append(f"\n| `{name}` | constant ({kind}) | |")
            else:
                out.append(f"\n| `{name}` | {kind} | {_first_line(obj)} |")
        out.append("\n")
    return "".join(out)


def main() -> None:
    path = os.path.join(os.path.dirname(__file__), "..", "docs", "API.md")
    text = generate()
    with open(path, "w") as f:
        f.write(text)
    print(f"wrote {os.path.abspath(path)} ({text.count('| `')} symbols)")


if __name__ == "__main__":
    main()

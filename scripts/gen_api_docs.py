"""Generate docs/API.md from the package's docstrings.

Walks every public module under gan_ffn_tpu, emitting one section per module
with its classes (constructor signature + docstring) and functions (signature
+ docstring). Reference citations (file:line into /root/reference) embedded in
the docstrings carry through, so the generated page doubles as a parity map.

Usage: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/gen_api_docs.py
"""

from __future__ import annotations

import importlib
import inspect
import pkgutil
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PACKAGE = "gan_ffn_tpu"

# CLI modules execute argparse wiring at import; document them from source
# docstrings only (no deep introspection needed for entry points).
CLI_PREFIX = f"{PACKAGE}.cli"


def _signature(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj) -> str:
    doc = inspect.getdoc(obj)
    return doc.strip() if doc else ""


def _public_members(mod):
    """(classes, functions) defined in this module, in source order."""
    classes, functions = [], []
    for name, obj in vars(mod).items():
        if name.startswith("_"):
            continue
        if getattr(obj, "__module__", None) != mod.__name__:
            continue
        try:
            lineno = inspect.getsourcelines(obj)[1]
        except (OSError, TypeError):
            lineno = 1 << 30
        if inspect.isclass(obj):
            classes.append((lineno, name, obj))
        elif inspect.isfunction(obj):
            functions.append((lineno, name, obj))
    return sorted(classes), sorted(functions)


def _class_section(name: str, cls) -> list[str]:
    lines = [f"### `{name}`", ""]
    doc = _doc(cls)
    if doc:
        lines += [doc, ""]
    # Flax modules / dataclass configs: document fields instead of __init__
    fields = getattr(cls, "__dataclass_fields__", None)
    if fields:
        import dataclasses

        shown = []
        for fname, f in fields.items():
            if fname in ("parent", "name"):
                continue
            if f.default is not dataclasses.MISSING:
                shown.append(f"- `{fname}` = `{f.default!r}`")
            elif f.default_factory is not dataclasses.MISSING:
                try:
                    shown.append(f"- `{fname}` = `{f.default_factory()!r}`")
                except Exception:
                    shown.append(f"- `{fname}`")
            else:
                shown.append(f"- `{fname}`")
        if shown:
            lines += ["Fields:", ""] + shown + [""]
    else:
        init_doc = _doc(cls.__init__) if cls.__init__ is not object.__init__ else ""
        if init_doc.startswith("Initialize self."):  # object.__init__ boilerplate
            init_doc = ""
        sig = _signature(cls)
        lines += ["```python", f"{name}{sig}", "```", ""]
        if init_doc and init_doc != doc:
            lines += [init_doc, ""]
    # public methods with their own docstrings
    for mname, meth in sorted(vars(cls).items()):
        if mname.startswith("_") and mname != "__call__":
            continue
        if not (inspect.isfunction(meth)):
            continue
        mdoc = _doc(meth)
        if not mdoc:
            continue
        lines += [f"**`.{mname}{_signature(meth)}`**", "", mdoc, ""]
    return lines


def main(out_path: str = "docs/API.md") -> None:
    package = importlib.import_module(PACKAGE)
    module_names = [PACKAGE]
    for info in pkgutil.walk_packages(package.__path__, prefix=PACKAGE + "."):
        module_names.append(info.name)

    import flax
    import jax

    out = [
        "# gan_ffn_tpu API reference",
        "",
        "Generated from docstrings by `scripts/gen_api_docs.py` — do not edit",
        "by hand. Reference citations are `file:line` into `/root/reference`.",
        "",
        # version stamp: signature/default reprs can change across jax/flax
        # releases, so the byte-exact drift guard (tests/test_docs.py) only
        # applies when the test environment matches these versions
        f"<!-- generated with jax {jax.__version__}, flax {flax.__version__} -->",
        "",
    ]

    # table of contents
    toc = [n for n in sorted(module_names) if not n.rsplit(".", 1)[-1].startswith("_")]
    out += ["## Modules", ""]
    for name in toc:
        anchor = name.replace(".", "")
        out.append(f"- [`{name}`](#{anchor})")
    out.append("")

    for name in toc:
        try:
            mod = importlib.import_module(name)
        except Exception as e:  # pragma: no cover - import failure is a bug
            print(f"WARNING: could not import {name}: {e}", file=sys.stderr)
            continue
        out += [f"## `{name}`", ""]
        mdoc = _doc(mod)
        if mdoc:
            out += [mdoc, ""]
        if name.startswith(CLI_PREFIX) and name != CLI_PREFIX:
            out.append("")
            continue
        classes, functions = _public_members(mod)
        for _, cname, cls in classes:
            out += _class_section(cname, cls)
        for _, fname, fn in functions:
            out += [f"### `{fname}{_signature(fn)}`", ""]
            fdoc = _doc(fn)
            if fdoc:
                out += [fdoc, ""]

    dest = ROOT / out_path
    dest.parent.mkdir(parents=True, exist_ok=True)
    dest.write_text("\n".join(out) + "\n")
    print(f"wrote {dest} ({len(out)} lines, {len(toc)} modules)")


if __name__ == "__main__":
    main(*sys.argv[1:])

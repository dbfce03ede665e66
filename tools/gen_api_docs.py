"""Generate the docs/ API reference from docstrings.

Role parity with the reference's docs/ tree (sphinx autodoc stubs,
docs/source/*.rst): one markdown page per package, every public class /
function with its signature and docstring. sphinx isn't in the image, so
this walks the modules with inspect and emits plain markdown — same
information, no build step. Regenerate with:

    JAX_PLATFORMS=cpu python tools/gen_api_docs.py
"""

import importlib
import inspect
import os
import pkgutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "docs", "api")

PACKAGES = [
    "torchrec_tpu.sparse",
    "torchrec_tpu.modules",
    "torchrec_tpu.models",
    "torchrec_tpu.ops",
    "torchrec_tpu.parallel",
    "torchrec_tpu.planner",
    "torchrec_tpu.optim",
    "torchrec_tpu.quant",
    "torchrec_tpu.inference",
    "torchrec_tpu.datasets",
    "torchrec_tpu.utils",
    "torchrec_tpu.linter",
    "torchrec_tpu.test_utils",
]


def _sig(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj) -> str:
    d = inspect.getdoc(obj)
    return d.strip() if d else ""


def _first_para(doc: str) -> str:
    return doc.split("\n\n", 1)[0] if doc else ""


def _public_members(mod):
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith("_")]
    out = []
    for n in names:
        obj = getattr(mod, n, None)
        if obj is None or inspect.ismodule(obj):
            continue
        # only document things DEFINED here (not re-exports of deps)
        owner = getattr(obj, "__module__", "") or ""
        if not owner.startswith("torchrec_tpu"):
            continue
        if inspect.isclass(obj) or inspect.isfunction(obj):
            out.append((n, obj))
    return out


def _class_section(name, cls) -> list:
    lines = [f"### `{name}{_sig(cls)}`", ""]
    doc = _doc(cls)
    if doc:
        lines += [doc, ""]
    methods = []
    for mn, m in inspect.getmembers(cls, predicate=inspect.isfunction):
        if mn.startswith("_") and mn not in ("__call__",):
            continue
        if m.__qualname__.split(".")[0] != cls.__name__:
            continue  # inherited; documented on the base
        methods.append((mn, m))
    for mn, m in methods:
        lines.append(f"- **`.{mn}{_sig(m)}`**")
        p = _first_para(_doc(m)).replace("\n", " ")
        if p:
            lines.append(f"  {p}")
    if methods:
        lines.append("")
    return lines


def _fn_section(name, fn) -> list:
    lines = [f"### `{name}{_sig(fn)}`", ""]
    doc = _doc(fn)
    if doc:
        lines += [doc, ""]
    return lines


def gen_package(pkg_name: str) -> str:
    pkg = importlib.import_module(pkg_name)
    lines = [f"# `{pkg_name}`", ""]
    top = _doc(pkg)
    if top:
        lines += [top, ""]
    modules = [pkg_name]
    if hasattr(pkg, "__path__"):
        for m in pkgutil.iter_modules(pkg.__path__):
            if not m.name.startswith("_") and not m.ispkg:
                modules.append(f"{pkg_name}.{m.name}")
    seen = set()
    for mod_name in modules:
        try:
            mod = importlib.import_module(mod_name)
        except Exception as e:  # optional deps etc.
            lines += [f"## `{mod_name}` — import failed: {e!r}", ""]
            continue
        members = [
            (n, o) for n, o in _public_members(mod)
            if id(o) not in seen
        ]
        if not members:
            continue
        for _, o in members:
            seen.add(id(o))
        if mod_name != pkg_name:
            lines += [f"## `{mod_name}`", ""]
            mdoc = _first_para(_doc(mod))
            if mdoc:
                lines += [mdoc, ""]
        for n, o in members:
            if inspect.isclass(o):
                lines += _class_section(n, o)
            else:
                lines += _fn_section(n, o)
    return "\n".join(lines) + "\n"


def main():
    os.makedirs(OUT, exist_ok=True)
    index = [
        "# torchrec_tpu API reference",
        "",
        "Generated from docstrings by `tools/gen_api_docs.py` (the",
        "image has no sphinx; the reference's docs/ serves the same",
        "autodoc role). One page per package:",
        "",
    ]
    for pkg in PACKAGES:
        text = gen_package(pkg)
        fname = pkg.replace(".", "_") + ".md"
        with open(os.path.join(OUT, fname), "w") as f:
            f.write(text)
        n_entries = text.count("\n### ")
        index.append(f"- [`{pkg}`](api/{fname}) — {n_entries} entries")
        print(f"{pkg}: {n_entries} entries -> docs/api/{fname}")
    index += [
        "",
        "Narrative docs: [README](../README.md) · "
        "[migration guide](../MIGRATION.md) · "
        "[component parity map](../PARITY.md) · "
        "[introduction notebook](../Torchrec_TPU_Introduction.ipynb) · "
        "[sharding & UVM notebook](../examples/Sharding_And_UVM.ipynb)",
        "",
    ]
    with open(os.path.join(REPO, "docs", "index.md"), "w") as f:
        f.write("\n".join(index))
    print("wrote docs/index.md")


if __name__ == "__main__":
    sys.exit(main())

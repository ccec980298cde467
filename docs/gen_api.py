"""Generate docs/api.md — API reference from live docstrings.

Sphinx is not available in the build image, so this renders the public
surface (`pocomc_tpu.__all__`) to markdown with stdlib inspect: class
constructor signatures, public methods/properties, and functions, each
with its docstring verbatim.

Run from the repo root:  python docs/gen_api.py
"""

import inspect
import sys
import textwrap
from pathlib import Path


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"


def _doc(obj, indent=""):
    doc = inspect.getdoc(obj)
    if not doc:
        return ""
    return textwrap.indent(doc, indent) + "\n"


def _method_entries(cls):
    for name, member in sorted(vars(cls).items()):
        if name.startswith("_") or not callable(member) and not isinstance(
                member, property):
            continue
        yield name, member


def render_class(name, cls, out):
    out.append(f"## `{name}`\n")
    out.append(f"```python\n{name}{_sig(cls.__init__)}\n```\n")
    out.append(_doc(cls))
    for mname, member in _method_entries(cls):
        if isinstance(member, property):
            out.append(f"### `{name}.{mname}` (property)\n")
            out.append(_doc(member.fget))
        else:
            fn = member.__func__ if isinstance(
                member, (classmethod, staticmethod)) else member
            out.append(f"### `{name}.{mname}{_sig(fn)}`\n")
            out.append(_doc(fn))


def render_function(name, fn, out):
    out.append(f"## `{name}{_sig(fn)}`\n")
    out.append(_doc(fn))


def main():
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import jax
    if jax.default_backend() is None:  # pragma: no cover
        pass
    import pocomc_tpu as pc

    dist_names = {"Normal", "Uniform", "LogUniform", "TruncatedNormal",
                  "LogNormal", "Beta", "Gamma", "Exponential", "HalfNormal",
                  "Cauchy", "StudentT", "Laplace"}
    out = ["# API reference\n",
           f"`pocomc_tpu` version {pc.__version__}. Generated from "
           "docstrings by `docs/gen_api.py`; regenerate after changing "
           "public signatures.\n"]

    main_order = [n for n in pc.__all__
                  if n not in dist_names and n not in ("version", "__version__")]
    for name in main_order:
        obj = getattr(pc, name)
        if inspect.isclass(obj):
            render_class(name, obj, out)
        elif callable(obj):
            render_function(name, obj, out)

    out.append("## Prior distributions\n")
    out.append("JAX-native 1-D distributions for `Prior` (all traceable "
               "on device; scipy.stats frozen distributions are also "
               "accepted and auto-converted where possible).\n")
    for name in sorted(dist_names):
        obj = getattr(pc, name)
        out.append(f"### `{name}{_sig(obj.__init__)}`\n")
        out.append(_doc(obj))

    text = "\n".join(s.rstrip() + "\n" for s in out if s is not None)
    path = Path(__file__).resolve().parent / "api.md"
    path.write_text(text)
    print(f"wrote {path} ({len(text.splitlines())} lines)")


if __name__ == "__main__":
    main()

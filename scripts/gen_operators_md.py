"""Regenerate OPERATORS.md from live docstrings: one line per public
callable (ops / streaming / func / Model / ColumnExpression) with its
signature and first sentence. Run from the repo root:

    python scripts/gen_operators_md.py
"""

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import hashquery_spark.func as func
import hashquery_spark.ops as ops
import hashquery_spark.streaming as streaming
from hashquery_spark import Model
from hashquery_spark.expr import ColumnExpression

lines = [
    "# OPERATORS — auto-generated public-surface reference",
    "",
    "Generated from live docstrings (`python scripts/gen_operators_md.py`).",
    "One line per public callable: where it lives, its signature, and the",
    "first sentence of its contract. Details live in the docstrings;",
    "verification status lives in COVERAGE.md.",
    "",
]


def first_sentence(doc):
    if not doc:
        return "(no docstring)"
    text = " ".join(doc.strip().split())
    for stop in (". ", ".\n"):
        if stop in text:
            return text[: text.index(stop) + 1]
    return text[:220]


def sig_of(obj, strip_self=False):
    try:
        sig = str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"
    if strip_self:
        sig = sig.replace("self, ", "").replace("(self)", "()")
    return sig if len(sig) <= 100 else sig[:97] + "..."


def section(title, module, names):
    lines.append(f"## {title}")
    lines.append("")
    for n in sorted(names):
        obj = getattr(module, n)
        if not callable(obj):
            continue
        lines.append(f"- **`{n}{sig_of(obj)}`** — {first_sentence(inspect.getdoc(obj))}")
    lines.append("")


def method_section(title, cls, prefix):
    lines.append(f"## {title}")
    lines.append("")
    for n in sorted(dir(cls)):
        if n.startswith("_"):
            continue
        obj = getattr(cls, n)
        if not callable(obj):
            continue
        lines.append(
            f"- **`{prefix}{n}{sig_of(obj, strip_self=True)}`** — "
            f"{first_sentence(inspect.getdoc(obj))}"
        )
    lines.append("")


section("hashquery_spark.ops", ops, list(ops.__all__))
section(
    "hashquery_spark.streaming",
    streaming,
    [
        n
        for n in dir(streaming)
        if not n.startswith("_")
        and callable(getattr(streaming, n))
        and getattr(getattr(streaming, n), "__module__", "")
        == "hashquery_spark.streaming"
    ],
)
section(
    "hashquery_spark.func",
    func,
    [
        n
        for n in dir(func)
        if not n.startswith("_")
        and callable(getattr(func, n))
        and getattr(getattr(func, n), "__module__", "") == "hashquery_spark.func"
    ],
)
method_section("Model methods (DSL surface)", Model, "Model.")
method_section("ColumnExpression methods (expression surface)", ColumnExpression, ".")

out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "OPERATORS.md")
with open(out, "w") as f:
    f.write("\n".join(lines))
print(f"wrote {out}: {sum(1 for l in lines if l.startswith('- '))} entries")

"""Lint tripwire for the O(n²) expression-duplication class (r9).

Column expressions have no sharing: a lambda passed to a higher-order
function that closes over a PASTED Column expression re-evaluates that
expression PER ELEMENT. Three confirmed instances this round —
shingles() (53.5 s → 2.15 s for explode+count at sf1),
op_text_repetition (96 s → 15 s at sf1), and the ANN normalizers
(O(dim²) by construction) — all invisible in `.explain` because the
blowup lives inside one expression tree.

This test AST-scans the package for the pattern: a lambda argument to
F.transform/filter/aggregate/zip_with/exists/forall/reduce whose body
references a name assigned (in the enclosing function) from an
expression containing a non-trivial F.* call. New hits must either be
fixed (materialize as a column, or bind once via textprep.let) or —
if the captured expression is genuinely cheap, like a coalesce over a
column reference — added to ALLOWED with a justification comment.
"""

from __future__ import annotations

import ast
import glob
import os

#: (path-suffix, enclosing function, variable) triples reviewed and
#: accepted. Keep justifications here:
#: - op_span_excise/lp: F.coalesce(F.col(...), empty-array literal) —
#:   a cheap column-ref wrapper, O(1) per element; the per-element
#:   array_contains scan is the op's intended algorithm, not a
#:   recompute of an expensive subtree.
ALLOWED = {
    ("operators/text.py", "op_span_excise", "lp"),
}

HOFS = {
    "transform",
    "filter",
    "aggregate",
    "zip_with",
    "exists",
    "forall",
    "reduce",
}
#: F.* callees considered cheap enough to re-evaluate per element.
#: Deliberately narrow — anything else goes through ALLOWED with a
#: written justification.
CHEAP = {"col", "lit"}

_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_PKG = os.path.join(_ROOT, "universal_data_to_orc_converter_spark")


def _f_calls(node: ast.AST):
    for n in ast.walk(node):
        if isinstance(n, ast.Call) and isinstance(n.func, ast.Attribute):
            v = n.func.value
            if isinstance(v, ast.Name) and v.id == "F":
                yield n.func.attr


def test_no_lambda_closes_over_pasted_column_expression():
    hits = []
    for path in sorted(glob.glob(os.path.join(_PKG, "**/*.py"), recursive=True)):
        rel = os.path.relpath(path, _PKG)
        tree = ast.parse(open(path).read())
        fns = [
            n
            for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        ]
        for fn in fns:
            assigned = {}
            for n in ast.walk(fn):
                if (
                    isinstance(n, ast.Assign)
                    and len(n.targets) == 1
                    and isinstance(n.targets[0], ast.Name)
                ):
                    calls = set(_f_calls(n.value))
                    if calls - CHEAP:
                        assigned[n.targets[0].id] = n.lineno
            if not assigned:
                continue
            for n in ast.walk(fn):
                if not (
                    isinstance(n, ast.Call)
                    and isinstance(n.func, ast.Attribute)
                    and n.func.attr in HOFS
                    and isinstance(n.func.value, ast.Name)
                    and n.func.value.id == "F"
                ):
                    continue
                for arg in n.args:
                    if not isinstance(arg, ast.Lambda):
                        continue
                    params = {a.arg for a in arg.args.args}
                    frees = {
                        x.id
                        for x in ast.walk(arg.body)
                        if isinstance(x, ast.Name)
                    } - params - {"F"}
                    for name in sorted(frees & set(assigned)):
                        key = (rel, fn.name, name)
                        if key not in ALLOWED:
                            hits.append(
                                f"{rel}:{n.lineno} fn={fn.name} lambda "
                                f"closes over F-expr var {name!r} "
                                f"(assigned line {assigned[name]})"
                            )
    assert not hits, (
        "lambda(s) close over pasted Column expressions — each "
        "re-evaluates the expression PER ELEMENT (the r9 O(n²) class; "
        "see textprep.let). Materialize the value as a column, bind it "
        "with let(), or allowlist with a justification:\n  "
        + "\n  ".join(hits)
    )

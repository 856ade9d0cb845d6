"""Mechanical audit: no expensive loop-invariant expression inside a
Spark higher-order-function lambda body.

Spark HOF lambdas (``transform``/``filter``/``aggregate``/``zip_with``/
``exists``/``forall``/``reduce``) re-evaluate every embedded
non-lambda-var subexpression PER ARRAY ELEMENT — there is no
common-subexpression elimination across the lambda boundary. A body like
``lambda i: F.slice(F.split(text, r"\\s+"), i, W)`` therefore re-splits
the whole text once per window: O(words^2/W) per document. Round 9 fixed
four such sites (ngrams / all_ngrams / lang_id / dsir grams, 2-9x);
round 10 fixed the one the manual sweep missed
(``paragraph_dedup(window_words=...)``, 7.5x A/B,
scripts/ab_paragraph_window.py). The repo-wide discipline is
``text.let``: bind the expensive value into a one-element array and
evaluate the body on the bound lambda variable.

This test closes the class mechanically: it walks the AST of every
module in the package (plus ``__spark_entry__``), finds every lambda or
local ``def`` passed in a body position of an ``F.<hof>(...)`` call (or
of ``let(...)``, which wraps ``F.transform``), and flags any call to a
known-expensive trap function (``F.split`` / ``F.lower`` / ``F.sha2`` /
``F.xxhash64`` / ``F.md5`` / ``F.regexp_extract_all``) whose argument
subtree references NO Spark-lambda variable in scope — i.e. a
loop-invariant expensive expression that should be let-bound outside
the lambda. Trap calls that DO consume the lambda variable are
necessarily per-element work and pass.
"""

from __future__ import annotations

import ast
import os
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "etl_cli_spark"
ENTRY = Path(__file__).resolve().parent.parent / "__spark_entry__.py"

# F.<name> whose lambda-position args are Spark-lambda bodies.
# Maps HOF name -> argument indexes that take a body callable.
HOF_BODY_ARGS = {
    "transform": (1,),
    "filter": (1,),
    "exists": (1,),
    "forall": (1,),
    "aggregate": (2, 3),
    "reduce": (2, 3),
    "zip_with": (2,),
    "map_filter": (1,),
    "map_zip_with": (2,),
    "transform_keys": (1,),
    "transform_values": (1,),
}
# let(value, body): body gets the bound value as its lambda variable
LET_BODY_ARGS = {"let": (1,)}

# Per-element re-evaluation of these is the measured trap (string
# scans / cryptographic hashes over whole-document columns).
TRAP_FUNCS = {"split", "lower", "sha2", "xxhash64", "md5", "regexp_extract_all"}


def _is_f_call(node: ast.Call) -> str | None:
    """Return the pyspark-functions name if node is ``F.<name>(...)``."""
    f = node.func
    if isinstance(f, ast.Attribute) and isinstance(f.value, ast.Name) and f.value.id == "F":
        return f.attr
    return None


def _body_positions(node: ast.Call) -> tuple[str, tuple[int, ...]] | None:
    name = _is_f_call(node)
    if name in HOF_BODY_ARGS:
        return name, HOF_BODY_ARGS[name]
    if isinstance(node.func, ast.Name) and node.func.id in LET_BODY_ARGS:
        return node.func.id, LET_BODY_ARGS[node.func.id]
    return None


class _Audit(ast.NodeVisitor):
    def __init__(self, path: str, src: str) -> None:
        self.path = path
        self.flags: list[str] = []
        # name -> FunctionDef/Lambda for locally defined callables, so a
        # body passed by name (``let(value, grams)``) is resolved too
        self.defs: dict[str, ast.AST] = {}
        tree = ast.parse(src)
        for n in ast.walk(tree):
            if isinstance(n, ast.FunctionDef):
                self.defs[n.name] = n
            elif isinstance(n, ast.Assign) and isinstance(n.value, ast.Lambda):
                for t in n.targets:
                    if isinstance(t, ast.Name):
                        self.defs[t.id] = n.value
        self.visit(tree)

    # ---- body resolution -------------------------------------------------
    def _resolve_body(self, node: ast.AST) -> ast.AST | None:
        if isinstance(node, (ast.Lambda, ast.FunctionDef)):
            return node
        if isinstance(node, ast.Name):
            return self.defs.get(node.id)
        return None

    @staticmethod
    def _params(fn: ast.AST) -> set[str]:
        args = fn.args  # type: ignore[attr-defined]
        return {a.arg for a in args.posonlyargs + args.args + args.kwonlyargs}

    # ---- traversal -------------------------------------------------------
    def visit_Call(self, node: ast.Call) -> None:
        hit = _body_positions(node)
        if hit is not None:
            _, positions = hit
            for pos in positions:
                if pos < len(node.args):
                    body = self._resolve_body(node.args[pos])
                    if body is not None:
                        self._check_body(body, self._params(body))
        self.generic_visit(node)

    def _check_body(self, fn: ast.AST, lambda_vars: set[str]) -> None:
        """Flag loop-invariant trap calls anywhere inside ``fn``.

        ``lambda_vars`` accumulates the Spark-lambda variables in scope:
        the params of this body plus any enclosing HOF/let body (nested
        HOFs see outer lambda vars as cheap bound references).
        """
        body_nodes = fn.body if isinstance(fn, ast.FunctionDef) else [fn.body]
        for stmt in body_nodes:
            for n in ast.walk(stmt):
                if not isinstance(n, ast.Call):
                    continue
                # nested HOF: recurse with the union of lambda vars
                hit = _body_positions(n)
                if hit is not None:
                    _, positions = hit
                    for pos in positions:
                        if pos < len(n.args):
                            inner = self._resolve_body(n.args[pos])
                            if inner is not None:
                                self._check_body(
                                    inner, lambda_vars | self._params(inner)
                                )
                name = _is_f_call(n)
                if name not in TRAP_FUNCS:
                    continue
                refs = {
                    sub.id
                    for arg in list(n.args) + [kw.value for kw in n.keywords]
                    for sub in ast.walk(arg)
                    if isinstance(sub, ast.Name)
                }
                if not (refs & lambda_vars):
                    self.flags.append(
                        f"{self.path}:{n.lineno}: F.{name}(...) inside an HOF "
                        f"lambda references no lambda variable ({sorted(lambda_vars)}) "
                        "— loop-invariant expensive expression; let-bind it "
                        "outside the lambda (see text.let)"
                    )


def _audit_file(path: Path) -> list[str]:
    return _Audit(str(path), path.read_text()).flags


def test_no_loop_invariant_trap_expression_inside_hof_lambda():
    flags: list[str] = []
    files = sorted(PKG.rglob("*.py")) + [ENTRY]
    assert len(files) > 10
    for f in files:
        flags.extend(_audit_file(f))
    assert flags == [], "\n".join(flags)


def test_audit_catches_the_round9_bug_shape():
    """The checker must flag the exact pre-fix paragraph_dedup shape."""
    bad = (
        "def f(text_col, W):\n"
        "    return F.transform(\n"
        "        F.sequence(F.lit(0), F.lit(3)),\n"
        "        lambda i: F.slice(F.split(F.col(text_col), ' '), i, W),\n"
        "    )\n"
    )
    assert _Audit("<bad>", bad).flags, "checker missed the known-bad shape"

    good = (
        "def f(text_col, W):\n"
        "    def body(toks):\n"
        "        return F.transform(\n"
        "            F.sequence(F.lit(0), F.lit(3)),\n"
        "            lambda i: F.slice(toks, i, W),\n"
        "        )\n"
        "    return let(F.split(F.col(text_col), ' '), body)\n"
    )
    assert _Audit("<good>", good).flags == [], "checker false-positived on let"


def test_audit_allows_per_element_trap_on_lambda_var():
    ok = (
        "def f(arr):\n"
        "    return F.transform(arr, lambda s: F.lower(s))\n"
    )
    assert _Audit("<ok>", ok).flags == []

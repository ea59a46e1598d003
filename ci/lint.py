#!/usr/bin/env python
"""AST-based lint layer — the clippy/cargo-deny analog (ci/run-clippy.sh).

No third-party linters exist in this environment (no ruff/pyflakes/flake8),
so this implements the checks that matter most for this codebase with the
stdlib `ast` module:

  E999  syntax error (file does not parse)
  F401  unused import (module files only; __init__.py re-exports exempt,
        names listed in __all__ exempt, `import x as x` re-export idiom
        exempt, `# noqa` line exempt)
  F811  redefinition of a function/class in the same scope
  E722  bare `except:`
  B006  mutable default argument (list/dict/set literal)
  E711  comparison to None with ==/!=
  F632  `is` comparison with a str/int/tuple literal

Exit code 1 if any finding; prints findings as path:line: CODE message.
"""
from __future__ import annotations

import ast
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
TARGETS = ["gst_plugins_rs_tpu", "tests", "examples", "bench.py",
           "__graft_entry__.py", "launch.py"]


def iter_py_files():
    for t in TARGETS:
        p = REPO / t
        if p.is_file():
            yield p
        elif p.is_dir():
            yield from sorted(p.rglob("*.py"))


class NameUseCollector(ast.NodeVisitor):
    """Collect every Name/Attribute-root identifier used (loaded) anywhere."""

    def __init__(self) -> None:
        self.used: set[str] = set()

    def visit_Name(self, node: ast.Name) -> None:
        if isinstance(node.ctx, ast.Load):
            self.used.add(node.id)
        self.generic_visit(node)

    def visit_Attribute(self, node: ast.Attribute) -> None:
        # a.b.c marks `a` used via the Name child; nothing extra needed
        self.generic_visit(node)


def module_docstring_and_all(tree: ast.Module):
    exported: set[str] = set()
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    if isinstance(node.value, (ast.List, ast.Tuple)):
                        for elt in node.value.elts:
                            if isinstance(elt, ast.Constant) and isinstance(elt.value, str):
                                exported.add(elt.value)
    return exported


def lint_file(path: Path) -> list[tuple[int, str, str]]:
    src = path.read_text()
    findings: list[tuple[int, str, str]] = []
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [(e.lineno or 0, "E999", f"syntax error: {e.msg}")]

    lines = src.splitlines()

    def noqa(lineno: int) -> bool:
        return 0 < lineno <= len(lines) and "noqa" in lines[lineno - 1]

    # ---- F401 unused imports (module scope; skip __init__.py) ----
    if path.name != "__init__.py":
        exported = module_docstring_and_all(tree)
        uses = NameUseCollector()
        uses.visit(tree)
        # names referenced inside string annotations / docstring doctests are
        # not tracked; `from __future__` never counts
        imported: list[tuple[str, int, str]] = []  # (bound name, line, shown)
        for node in ast.walk(tree):
            if isinstance(node, ast.Import):
                for a in node.names:
                    bound = a.asname or a.name.split(".")[0]
                    imported.append((bound, node.lineno, a.name))
            elif isinstance(node, ast.ImportFrom):
                if node.module == "__future__":
                    continue
                for a in node.names:
                    if a.name == "*":
                        continue
                    if a.asname == a.name:
                        continue  # `import x as x` re-export idiom
                    bound = a.asname or a.name
                    imported.append((bound, node.lineno, a.name))
        for bound, lineno, shown in imported:
            if bound in uses.used or bound in exported or noqa(lineno):
                continue
            # used in a doctest/TYPE_CHECKING-ish string annotation?
            if f"'{bound}'" in src or f'"{bound}"' in src:
                continue
            findings.append((lineno, "F401", f"'{shown}' imported but unused"))

    # ---- scope-local F811 + function-level checks ----
    class Checker(ast.NodeVisitor):
        def _check_body_defs(self, body):
            seen: dict[str, int] = {}
            for node in body:
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                    deco = {getattr(d, "attr", getattr(d, "id", None))
                            for d in node.decorator_list}
                    # property setters/getters legitimately reuse the name
                    if deco & {"setter", "getter", "deleter", "overload",
                               "register"}:
                        continue
                    if node.name in seen and not noqa(node.lineno):
                        findings.append((node.lineno, "F811",
                                         f"redefinition of '{node.name}' "
                                         f"(first at line {seen[node.name]})"))
                    seen[node.name] = node.lineno

        def visit_Module(self, node):
            self._check_body_defs(node.body)
            self.generic_visit(node)

        def visit_ClassDef(self, node):
            self._check_body_defs(node.body)
            self.generic_visit(node)

        def visit_FunctionDef(self, node):
            self._check_defaults(node)
            self.generic_visit(node)

        def visit_AsyncFunctionDef(self, node):
            self._check_defaults(node)
            self.generic_visit(node)

        def _check_defaults(self, node):
            for d in list(node.args.defaults) + [
                    d for d in node.args.kw_defaults if d is not None]:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)) and not noqa(d.lineno):
                    findings.append((d.lineno, "B006",
                                     "mutable default argument"))

        def visit_ExceptHandler(self, node):
            if node.type is None and not noqa(node.lineno):
                findings.append((node.lineno, "E722", "bare 'except:'"))
            self.generic_visit(node)

        def visit_Compare(self, node):
            for op, comp in zip(node.ops, node.comparators):
                if isinstance(op, (ast.Eq, ast.NotEq)) and \
                        isinstance(comp, ast.Constant) and comp.value is None \
                        and not noqa(node.lineno):
                    findings.append((node.lineno, "E711",
                                     "comparison to None with ==/!= (use is)"))
                if isinstance(op, (ast.Is, ast.IsNot)) and \
                        isinstance(comp, ast.Constant) and \
                        isinstance(comp.value, (str, int, tuple)) and \
                        comp.value is not None and \
                        not isinstance(comp.value, bool) and not noqa(node.lineno):
                    findings.append((node.lineno, "F632",
                                     "'is' comparison with a literal"))
            self.generic_visit(node)

    Checker().visit(tree)
    return findings


def main() -> int:
    total = 0
    nfiles = 0
    for path in iter_py_files():
        nfiles += 1
        for lineno, code, msg in sorted(lint_file(path)):
            rel = path.relative_to(REPO)
            print(f"{rel}:{lineno}: {code} {msg}")
            total += 1
    print(f"lint: {nfiles} files checked, {total} finding(s)")
    return 1 if total else 0


if __name__ == "__main__":
    sys.exit(main())

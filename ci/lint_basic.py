#!/usr/bin/env python
"""Dependency-free lint gate: syntax + unused imports.

The full lint job (.github/workflows/lint.yml) runs black/ruff, which
are not available in every environment; this script needs only the
stdlib so the same gate runs locally, in CI, and in hermetic builds.
"""

from __future__ import annotations

import ast
import pathlib
import sys

ROOTS = ["kmerseek_tpu", "tests", "bench.py", "bench_search.py",
         "bench_micro.py", "bench_cli.py", "__graft_entry__.py", "ci",
         "examples"]

# names whose import is a deliberate side effect / re-export
ALLOW_UNUSED = {"annotations"}


def unused_imports(tree: ast.AST, source: str):
    lines = source.splitlines()

    def suppressed(node) -> bool:
        # honor `# noqa` on any line of the import statement
        return any(
            "noqa" in lines[ln - 1]
            for ln in range(node.lineno, (node.end_lineno or node.lineno) + 1)
        )

    imported = {}  # name -> lineno
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            if suppressed(node):
                continue
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                imported[name] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            if suppressed(node):
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                imported[a.asname or a.name] = node.lineno
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            n = node
            while isinstance(n, ast.Attribute):
                n = n.value
            if isinstance(n, ast.Name):
                used.add(n.id)
    # names referenced only in strings/docstrings (e.g. __all__) count
    for name in list(imported):
        if name in used or name in ALLOW_UNUSED:
            imported.pop(name)
        elif f'"{name}"' in source or f"'{name}'" in source:
            imported.pop(name)
    return imported


def main() -> int:
    repo = pathlib.Path(__file__).resolve().parent.parent
    failures = 0
    for root in ROOTS:
        p = repo / root
        files = [p] if p.suffix == ".py" else sorted(p.rglob("*.py"))
        for f in files:
            src = f.read_text()
            try:
                tree = ast.parse(src, filename=str(f))
            except SyntaxError as e:
                print(f"{f}: syntax error: {e}")
                failures += 1
                continue
            for name, line in unused_imports(tree, src).items():
                print(f"{f.relative_to(repo)}:{line}: unused import '{name}'")
                failures += 1
    if failures:
        print(f"lint_basic: {failures} finding(s)")
        return 1
    print("lint_basic: clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())

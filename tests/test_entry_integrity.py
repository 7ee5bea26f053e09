"""Structural guards for ``__spark_entry__.py``.

The gate registry is a flat module namespace: a duplicate top-level
``def`` silently rebinds every earlier reference (Python keeps the last
definition), so a gate query can end up executing the WRONG operator
against its oracle while the operator's own tests stay green.  This has
happened twice (``_q_gini`` in round 8, ``_q_cusum`` in round 10), so
the class is now mechanically impossible: this test AST-parses the
module and fails on any duplicate top-level name.  The same check runs
as a preamble in ``scripts/check_oracle.py``.
"""

import ast
import collections

ENTRY = "/root/repo/__spark_entry__.py"


def duplicate_top_level_names(path: str = ENTRY) -> dict:
    """Top-level names bound more than once in *path* → their line
    numbers.  Counts ``def``/``async def``/``class`` and plain
    ``NAME = ...`` assignments; re-assignment of imports is ignored
    (idiomatic for optional-import fallbacks)."""
    tree = ast.parse(open(path).read(), filename=path)
    seen = collections.defaultdict(list)
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            seen[node.name].append(node.lineno)
        elif isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name):
                    seen[tgt.id].append(node.lineno)
    return {name: lines for name, lines in seen.items()
            if len(lines) > 1}


def test_no_duplicate_top_level_names():
    dupes = duplicate_top_level_names()
    assert not dupes, (
        "duplicate top-level definitions in __spark_entry__.py "
        "(the later def silently rebinds the earlier gate query — "
        f"the _q_gini/_q_cusum failure class): {dupes}")

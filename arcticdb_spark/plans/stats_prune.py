"""File pruning from column-stats zone maps (reference
``pipeline/column_stats_filter.cpp:28-120``: MIN/MAX stats evaluated against
the filter AST with Kleene logic; gated there by ``ColumnStats.UseForQueries``).

We evaluate the *prunable sub-conjuncts* of a QueryBuilder filter against the
per-file [min, max] ranges stored by ``Library.create_column_stats``. Only
``col <op> literal`` comparisons joined by AND are used — everything else is
conservatively kept (three-valued "maybe"). This runs at plan time on the
driver over manifest-sized metadata; at 100 TB it is the difference between
opening every file and opening the few whose ranges can match."""

from __future__ import annotations

from typing import Any

from arcticdb_spark.expr import (BinaryOp, ColumnRef, Constant,
                                 ExpressionNode, IsInOp)

_OPS = {"EQ", "LT", "LE", "GT", "GE"}


def extract_conjuncts(node: ExpressionNode) -> list[tuple[str, str, Any]]:
    """Flatten AND-trees into [(column, op, literal)] triples; anything not
    of that shape contributes nothing (conservative). ISIN/ISNOTIN emit
    the whole value set (reference per-element stats pruning,
    test_column_stats_isin.py)."""
    out: list[tuple[str, str, Any]] = []

    def walk(n):
        if isinstance(n, IsInOp) and isinstance(n.child, ColumnRef):
            out.append((n.child.name,
                        "ISNOTIN" if n.negate else "ISIN",
                        list(n.values)))
            return
        if isinstance(n, BinaryOp):
            if n.op == "AND":
                walk(n.left)
                walk(n.right)
            elif n.op in _OPS:
                if isinstance(n.left, ColumnRef) and isinstance(n.right, Constant):
                    out.append((n.left.name, n.op, n.right.value))
                elif isinstance(n.right, ColumnRef) and isinstance(n.left, Constant):
                    flip = {"LT": "GT", "LE": "GE", "GT": "LT", "GE": "LE",
                            "EQ": "EQ"}
                    out.append((n.right.name, flip[n.op], n.left.value))

    walk(node)
    return out


def _is_nanlike(v) -> bool:
    try:
        return v is None or v != v
    except Exception:
        return True


def range_can_match(op: str, lit, mn, mx) -> bool:
    """Kleene 'maybe': True unless the file's [mn, mx] range PROVES no row
    can satisfy ``col <op> lit``."""
    try:
        if op == "EQ":
            return not (lit < mn or lit > mx)
        if op == "LT":
            return mn < lit
        if op == "LE":
            return mn <= lit
        if op == "GT":
            return mx > lit
        if op == "GE":
            return mx >= lit
        if op == "ISIN":
            # per-element (reference test_column_stats_isin): the file
            # survives iff ANY set element can fall in [mn, mx]. A
            # NaN/None element is conservatively "maybe" (minmax stats
            # skip NaN, so they cannot disprove its presence). An empty
            # set matches nothing -> prune.
            if any(_is_nanlike(v) for v in lit):
                return True
            return any(mn <= v <= mx for v in lit)
        if op == "ISNOTIN":
            # prunable only when the file is single-valued (mn == mx) and
            # that value is excluded — every non-null row fails, and null
            # rows fail any filter under Kleene logic anyway
            if any(_is_nanlike(v) for v in lit):
                return True
            return not (mn == mx and any(v == mn for v in lit))
    except TypeError:  # incomparable types -> keep
        return True
    return True


_U64_WRAP = 1 << 64


def _unsigned_range(mn, mx):
    """Map a uint64 column's SIGNED bit-pattern footer [mn, mx] to the
    unsigned domain. Possible only when both bounds share a sign: a
    mixed-sign pattern range means the file holds values straddling
    2^63, and signed min/max do not bound the unsigned set (pattern
    {5, -10} has signed range [-10, 5] but unsigned range
    [5, 2^64-10]) — return None to keep the file (Kleene 'maybe')."""
    try:
        if mn < 0 <= mx:
            return None
    except TypeError:
        return None
    return (mn + _U64_WRAP if mn < 0 else mn,
            mx + _U64_WRAP if mx < 0 else mx)


def prune_files_by_stats(files: list, stats: dict | None,
                         filter_expr: ExpressionNode | None,
                         uint64_cols=frozenset(),
                         skip_cols=frozenset()) -> list:
    """Drop FileEntries whose stored column ranges cannot satisfy the
    filter. ``uint64_cols`` names columns stored as int64 BIT PATTERNS
    (full-range uint64 support): their footer stats are signed patterns
    while the filter literal lives in the unsigned domain — compare in
    unsigned space, or keep the file when the pattern range straddles
    the sign bit (a signed comparison there silently mispruned real
    rows: filter > 2**62 dropped a segment of >2^63 values)."""
    if not stats or filter_expr is None:
        return files
    conjuncts = extract_conjuncts(filter_expr)
    if not conjuncts:
        return files
    per_file = stats.get("files", {})
    kept = []
    for fe in files:
        ranges = per_file.get(fe.path)
        if ranges is None:
            kept.append(fe)
            continue
        ok = True
        for col, op, lit in conjuncts:
            if col not in ranges or col in skip_cols:
                # skip_cols: dictionary-coded columns — their footer stats
                # are hash codes, meaningless against a string literal
                continue
            mn, mx = ranges[col]
            if col in uint64_cols:
                u = _unsigned_range(mn, mx)
                if u is None:
                    continue   # straddles 2^63: cannot bound — keep
                mn, mx = u
                if op in ("LT", "LE", "GT", "GE", "EQ"):
                    try:
                        if lit < 0:
                            continue   # negative literal vs unsigned: keep
                    except TypeError:
                        continue
            if not range_can_match(op, lit, mn, mx):
                ok = False
                break
        if ok:
            kept.append(fe)
    return kept

"""Merge-update (SQL MERGE-like upsert) — reference ``MergeUpdateClause``
(``clause.hpp:847-924``, ``clause_merge_update.cpp`` ~923 LoC; strategies
``MergeStrategy`` in ``_store.py:117``).

Semantics: match target rows to source rows on (index + `on` columns);
matched rows take the source's values (UPDATE); with upsert, unmatched
source rows are inserted. Row identity of unmatched target rows is kept.

Spark-first: a single full-outer (upsert) / left (update) equi-join with
``coalesce`` per column — Catalyst picks broadcast when the source is small
(the common case: a correction batch against a 100 TB table), sort-merge
otherwise; AQE handles skew. This is exactly how Delta's MERGE INTO lowers
when rewritten by hand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_update(target: DataFrame, source: DataFrame, on: list[str],
                 upsert: bool = False,
                 check_duplicates: bool = True) -> DataFrame:
    """Return target with matched rows replaced by source (and, if upsert,
    unmatched source rows appended).

    ``check_duplicates``: the reference raises UserInputException when more
    than one source row matches the same target row (hypothesis
    test_merge_update.py); a bare join would silently EXPAND the target
    instead. The check is one map-side-combinable groupBy on the source's
    key tuple semi-joined against the target's keys — the source is the
    small side of a merge (a correction batch), so this costs one cheap
    job, and callers that pre-deduplicate can switch it off."""
    if not on:
        raise ValueError("merge requires at least one key column")
    for k in on:
        if k not in target.columns or k not in source.columns:
            raise ValueError(f"merge key {k!r} missing from target or source")
    if check_duplicates:
        dup_keys = (source.groupBy(*on).count()
                    .filter(F.col("count") > 1).drop("count")).alias("d")
        tk = target.select(*on).alias("tk")
        nullsafe = None   # match the main join's NULL-key semantics
        for k in on:
            c = F.col(f"d.{k}").eqNullSafe(F.col(f"tk.{k}"))
            nullsafe = c if nullsafe is None else (nullsafe & c)
        if dup_keys.join(tk, nullsafe, "left_semi").head(1):
            raise ValueError(
                "Multiple source rows match the same target row on "
                f"{on}; deduplicate the source first")

    t = target.alias("t")
    # Explicit matched flag: keys join with eqNullSafe, so a NULL source key
    # can legitimately match a NULL target key — testing s.<key>.isNotNull()
    # would misclassify that row as unmatched. A literal TRUE column from the
    # source side is null exactly when the join found no source row.
    _MATCHED = "__merge_matched__"
    s = source.withColumn(_MATCHED, F.lit(True)).alias("s")
    how = "full_outer" if upsert else "left_outer"
    cond = None
    for k in on:
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        cond = c if cond is None else (cond & c)
    joined = t.join(s, cond, how)

    out_cols = []
    src_cols = set(source.columns)
    tgt_cols = set(target.columns)
    matched = F.col(f"s.{_MATCHED}").isNotNull()
    for c in target.columns:
        if c in on:
            out_cols.append(F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}")).alias(c))
        elif c in src_cols:
            # matched (or inserted) -> source value; else keep target
            out_cols.append(
                F.when(matched, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c))
        else:
            out_cols.append(F.col(f"t.{c}").alias(c))
    # columns only in source (dynamic schema) appended as nullable
    for c in source.columns:
        if c not in tgt_cols:
            out_cols.append(F.col(f"s.{c}").alias(c))
    return joined.select(out_cols)

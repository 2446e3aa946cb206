"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps operator names (SURVEY.md §2 + extensions) to callables
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` gives the DuckDB-
equivalent SQL for the correctness gate. Column names/types are aligned on
both sides; float aggregates are rounded identically (per-row float math is
IEEE-identical across engines; only multi-row summation order isn't, hence
``round(..., 4)`` on sums/means).

The events table stores nanosecond timestamps; Spark side truncates to µs on
load (sources/tables.py, exact integer division), oracle side uses
``CAST(ts AS TIMESTAMP)`` — the same truncation — so values match exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import sys as _sys

if "/root/repo" not in _sys.path:
    _sys.path.insert(0, "/root/repo")

from arcticdb_spark.query import QueryBuilder, col
from arcticdb_spark.expr import where
from arcticdb_spark.sources import load_table
from arcticdb_spark.plans.rowid import ROW_ID, with_row_id
from arcticdb_spark.operators.resample import resample
from arcticdb_spark.operators.concat import concat
from arcticdb_spark.operators.merge_update import merge_update
from arcticdb_spark.extensions import text as xtext
from arcticdb_spark.extensions import dedup as xdedup
from arcticdb_spark.extensions import similarity as xsim
from arcticdb_spark.extensions import joins as xjoins
from arcticdb_spark.extensions import windows as xwin
from arcticdb_spark.extensions import multimodal as xmm


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped pricing summary through the QueryBuilder
    clause pipeline (filter -> project -> groupby/agg)."""
    return q_groupby_tpch_q1(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# reference-surface queries (SURVEY §2)
# ---------------------------------------------------------------------------

def q_filter_numeric(spark, sf):
    li = load_table(spark, sf, "lineitem")
    q = QueryBuilder()
    q = q[(q["l_quantity"] > 30) & (q["l_discount"] <= 0.05)
          & (q["l_shipdate"] < __import__("pandas").Timestamp("1998-01-01"))]
    return q.to_df(li)


def q_filter_isin_regex(spark, sf):
    pa = load_table(spark, sf, "part")
    q = QueryBuilder()
    q = q[q["p_type"].isin("ECONOMY", "PROMO") & q["p_name"].regex_match("red|blue")
          & (q["p_size"] >= 10)]
    return q.to_df(pa)


def q_filter_ternary(spark, sf):
    li = load_table(spark, sf, "lineitem")
    q = QueryBuilder()
    # where() both as a filter input and a projection
    q = q[where(q["l_returnflag"] == "R", q["l_quantity"] > 45,
                q["l_quantity"] < 5)]
    q = q.apply("band", where(q["l_extendedprice"] > 30000.0, "high", "low"))
    return q.to_df(li).select("l_orderkey", "l_linenumber", "l_quantity",
                              "l_extendedprice", "band")


def q_project_arith(spark, sf):
    li = load_table(spark, sf, "lineitem")
    q = QueryBuilder()
    q = (q.apply("revenue", q["l_extendedprice"] * (1 - q["l_discount"]))
          .apply("charge", q["l_extendedprice"] * (1 - q["l_discount"]) * (1 + q["l_tax"]))
          .apply("qty_ratio", q["l_quantity"] / 7)
          .apply("neg_tax", -q["l_tax"])
          .apply("abs_balance", abs(q["l_discount"] - 0.05)))
    return q.to_df(li).select("l_orderkey", "l_linenumber", "revenue", "charge",
                              "qty_ratio", "neg_tax", "abs_balance")


def q_groupby_single(spark, sf):
    """Reference groupby: single column, dropna, sum/mean/min/max/count."""
    li = load_table(spark, sf, "lineitem")
    q = QueryBuilder().groupby("l_returnflag").agg({
        "sum_qty": ("l_quantity", "sum"),
        "avg_price": ("l_extendedprice", "mean"),
        "min_disc": ("l_discount", "min"),
        "max_tax": ("l_tax", "max"),
        "n": ("l_orderkey", "count")})
    out = q.to_df(li)
    return out.select("l_returnflag",
                      F.round("sum_qty", 4).alias("sum_qty"),
                      F.round("avg_price", 4).alias("avg_price"),
                      "min_disc", "max_tax", "n")


def q_groupby_first_last(spark, sf):
    """first/last aggregators (feature-flagged off in the reference; ordered
    by the ts index here -> deterministic, exercised via min_by/max_by)."""
    ev = load_table(spark, sf, "events")
    q = QueryBuilder().groupby("event_type").agg({
        "first_value": ("value", "first"),
        "last_value": ("value", "last"),
        "n": ("value", "count")})
    return q.to_df(ev, index_column="ts")


def q_groupby_tpch_q1(spark, sf):
    """TPC-H Q1 shape (two-col grouping = documented extension)."""
    li = load_table(spark, sf, "lineitem")
    q = QueryBuilder()
    q = q[q["l_shipdate"] <= __import__("pandas").Timestamp("2000-09-02")]
    q = q.apply("disc_price", q["l_extendedprice"] * (1 - q["l_discount"]))
    q = q.apply("charge", q["l_extendedprice"] * (1 - q["l_discount"]) * (1 + q["l_tax"]))
    q = q.groupby(["l_returnflag", "l_linestatus"]).agg({
        "sum_qty": ("l_quantity", "sum"),
        "sum_base_price": ("l_extendedprice", "sum"),
        "sum_disc_price": ("disc_price", "sum"),
        "sum_charge": ("charge", "sum"),
        "avg_qty": ("l_quantity", "mean"),
        "avg_price": ("l_extendedprice", "mean"),
        "avg_disc": ("l_discount", "mean"),
        "count_order": ("l_orderkey", "count")})
    out = q.to_df(li)
    return out.select(
        "l_returnflag", "l_linestatus",
        F.round("sum_qty", 2).alias("sum_qty"),
        F.round("sum_base_price", 2).alias("sum_base_price"),
        F.round("sum_disc_price", 2).alias("sum_disc_price"),
        F.round("sum_charge", 2).alias("sum_charge"),
        F.round("avg_qty", 4).alias("avg_qty"),
        F.round("avg_price", 4).alias("avg_price"),
        F.round("avg_disc", 4).alias("avg_disc"),
        "count_order")


def q_groupby_ts_minmax(spark, sf):
    """min/max over timestamp columns (datetime aggregation support)."""
    li = load_table(spark, sf, "lineitem")
    q = QueryBuilder().groupby("l_returnflag").agg({
        "first_ship": ("l_shipdate", "min"),
        "last_ship": ("l_shipdate", "max"),
        "n": ("l_shipdate", "count")})
    return q.to_df(li)


def q_resample_weekly(spark, sf):
    """7-day buckets on a second table's timestamp (lineitem shipdate)."""
    li = load_table(spark, sf, "lineitem")
    out = resample(li, "l_shipdate", "7D", {"n": ("l_quantity", "count"),
                                            "qty": ("l_quantity", "sum")})
    return out.select(F.col("l_shipdate"), "n",
                      F.round("qty", 4).alias("qty"))


def q_concat_three(spark, sf):
    """Three-way outer concat with distinct column subsets."""
    ev = load_table(spark, sf, "events")
    a = ev.filter(F.col("event_id") % 3 == 0).select("ts", "event_id", "value")
    b = ev.filter(F.col("event_id") % 3 == 1).select("ts", "event_id", "user_id")
    c = ev.filter(F.col("event_id") % 3 == 2).select("ts", "event_id",
                                                     "event_type", "value")
    return concat([a, b, c], join="outer")


def q_resample_1h(spark, sf):
    ev = load_table(spark, sf, "events")
    q = QueryBuilder().resample("1h").agg({
        "n": ("value", "count"),
        "v_sum": ("value", "sum"),
        "v_min": ("value", "min"),
        "v_max": ("value", "max")})
    out = q.to_df(ev, index_column="ts")
    return out.select("ts", "n", F.round("v_sum", 4).alias("v_sum"),
                      "v_min", "v_max")


def q_resample_ohlc(spark, sf):
    """OHLC bars: first/last/min/max per day — the canonical tick use-case."""
    ev = load_table(spark, sf, "events")
    out = resample(ev, "ts", "1D", {
        "open": ("value", "first"), "high": ("value", "max"),
        "low": ("value", "min"), "close": ("value", "last"),
        "n": ("value", "count")})
    return out


def q_resample_closed_right(spark, sf):
    ev = load_table(spark, sf, "events")
    out = resample(ev, "ts", "6h", {"n": ("value", "count"),
                                    "v_sum": ("value", "sum")},
                   closed="right", label="right")
    return out.select("ts", "n", F.round("v_sum", 4).alias("v_sum"))


def q_resample_offset(spark, sf):
    """Daily buckets shifted by 6h (offset param, processing.py:880-888)."""
    ev = load_table(spark, sf, "events")
    out = resample(ev, "ts", "1D", {"n": ("value", "count"),
                                    "v_sum": ("value", "sum")}, offset="6h")
    return out.select("ts", "n", F.round("v_sum", 4).alias("v_sum"))


def q_project_then_groupby(spark, sf):
    """Clause composition: projection feeding a groupby (pipeline order)."""
    li = load_table(spark, sf, "lineitem")
    q = QueryBuilder()
    q = q.apply("rev_cents", q["l_extendedprice"] * (1 - q["l_discount"]) * 100)
    out = q.to_df(li)
    cents = F.round(F.col("rev_cents")).cast("long")
    return (out.withColumn("c", cents).groupBy("l_linestatus")
               .agg((F.sum("c").cast("double") / 100).alias("revenue"),
                    F.count(F.lit(1)).alias("n")))


def q_pipeline_filter_head(spark, sf):
    """filter -> head positional semantics on the filtered frame (head on
    the post-filter frame compiles to TakeOrdered, no row-id pass)."""
    ev = load_table(spark, sf, "events")
    q = QueryBuilder()
    q = q[q["event_type"] == "purchase"].head(50)
    return q.to_df(ev, ["ts", "event_id"])


def q_resample_std_median(spark, sf):
    """Extension aggregators on time buckets: stddev/var/median."""
    ev = load_table(spark, sf, "events")
    out = resample(ev, "ts", "1D", {"sd": ("value", "std"),
                                    "vr": ("value", "var"),
                                    "med": ("value", "median"),
                                    "n": ("value", "count")})
    return out.select("ts", F.round("sd", 4).alias("sd"),
                      F.round("vr", 4).alias("vr"),
                      F.round("med", 4).alias("med"), "n")


def q_corpus_clean(spark, sf):
    """End-to-end training-corpus cleaning: quality gate + language filter +
    exact dedup, emitting the surviving docs with token counts — the
    composite LLM-pipeline flow."""
    from arcticdb_spark.extensions.text import (fingerprint, lang_id,
                                                quality_score, token_count)
    from arcticdb_spark.extensions.dedup import _spread
    d = _spread(load_table(spark, sf, "documents"))
    # observe() is a pushdown barrier (filters may not cross
    # CollectMetrics): without it the optimizer pushes the heavy
    # quality/lang predicate below _spread's exchange onto the scan's
    # few partitions, single-threading ~10 regex splits per row while
    # only the cheap projection runs spread (r14; plan evidence in
    # plans/r14/corpus_clean_*). At 100 TB _spread is an identity (the
    # scan is already parallel), so the barrier costs one counter.
    d = d.observe("corpus_clean_src", F.count(F.lit(1)).alias("rows"))
    scored = d.select(
        "doc_id", "text",
        token_count(F.col("text")).alias("n_tokens"),
        quality_score(F.col("text")).alias("quality"),
        lang_id(F.col("text")).alias("lang_pred"),
        fingerprint(F.col("text")).alias("fp"))
    kept = scored.filter((F.col("quality") >= 0.7) & (F.col("lang_pred") == "en"))
    deduped = (kept.groupBy("fp")
               .agg(F.min("doc_id").alias("doc_id"),
                    F.max("n_tokens").alias("n_tokens"),
                    F.count(F.lit(1)).alias("n_copies")))
    return deduped.select("doc_id", "n_tokens", "n_copies")


def q_date_range(spark, sf):
    import pandas as pd
    ev = load_table(spark, sf, "events")
    q = QueryBuilder().date_range((pd.Timestamp("2024-01-05"),
                                   pd.Timestamp("2024-01-10 12:00:00")))
    return q.to_df(ev, index_column="ts")


def q_head(spark, sf):
    # composite index = deterministic position order; the bare-frame head
    # compiles to TakeOrderedAndProject — no row-id shuffle, no collect
    ev = load_table(spark, sf, "events")
    return QueryBuilder().head(25).to_df(ev, ["ts", "event_id"])


def q_tail(spark, sf):
    ev = load_table(spark, sf, "events")
    return QueryBuilder().tail(25).to_df(ev, ["ts", "event_id"])


def q_row_range(spark, sf):
    # bounded prefix: TakeOrdered(180) + window over those 180 rows only
    ev = load_table(spark, sf, "events")
    out = QueryBuilder().row_range((100, 180)).to_df(ev, ["ts", "event_id"])
    return out.drop(ROW_ID)


def q_concat_outer(spark, sf):
    """ConcatClause outer: column union with NULL backfill + type promotion."""
    ev = load_table(spark, sf, "events")
    a = ev.filter(F.col("event_id") % 2 == 0).select("ts", "event_id", "value")
    b = ev.filter(F.col("event_id") % 2 == 1).select("ts", "event_id", "user_id")
    return concat([a, b], join="outer")


def q_concat_inner(spark, sf):
    ev = load_table(spark, sf, "events")
    a = ev.filter(F.col("event_id") % 2 == 0).select("ts", "event_id", "value")
    b = ev.filter(F.col("event_id") % 2 == 1).select("ts", "event_id", "user_id")
    return concat([a, b], join="inner")


def q_merge_update_upsert(spark, sf):
    """MergeUpdateClause: UPDATE matched + INSERT unmatched (upsert)."""
    o = load_table(spark, sf, "orders")
    target = o.filter(F.col("o_orderkey") % 10 < 8)
    source = (o.filter(F.col("o_orderkey") % 10 >= 5)
               .withColumn("o_totalprice", F.col("o_totalprice") * 2)
               .withColumn("o_orderstatus", F.lit("U")))
    return merge_update(target, source, on=["o_orderkey"], upsert=True)


def q_update_range_surgery(spark, sf):
    """lib.update() semantics as a query: rows in [t0,t1] replaced by the
    correction frame, rows outside untouched."""
    import pandas as pd
    ev = load_table(spark, sf, "events")
    t0, t1 = pd.Timestamp("2024-01-10"), pd.Timestamp("2024-01-15")
    inside = F.col("ts").between(t0, t1)
    correction = ev.filter(inside).withColumn("value", F.col("value") * 0.5)
    return ev.filter(~inside).unionByName(correction)


def q_compact_roundtrip(spark, sf):
    """Append-fragmentation -> compact_data round-trip through the
    versioned library (reference CompactDataClause, clause.hpp:926-976;
    explain plan library.py:3202): the events table is written as one
    version plus 7 appended slices (rows_per_file forces fragmentation),
    compacted, and read back. In-code asserts pin the physical contract —
    the segment count strictly drops, matches the explain plan's
    projection, and never exceeds the pre-compaction count — while the
    returned rows let the DuckDB oracle verify the data survived
    byte-exact."""
    import tempfile
    from arcticdb_spark.catalog import Arctic
    # sf-independent row cap: the point is the version/compaction
    # lifecycle, not write throughput — 5 versions of <=10k rows stay
    # bounded at any scale factor (the oracle applies the same predicate)
    ev = (load_table(spark, sf, "events")
          .filter(F.col("event_id") < 10000)
          .select("event_id", "value").toPandas()
          .sort_values("event_id").reset_index(drop=True))
    n = len(ev)
    lib = Arctic(tempfile.mkdtemp(), spark).create_library(
        "compactlib", rows_per_file=max(n // 2, 1))
    # 4 slices (1 write + 3 appends) keep the fragmentation story (4
    # files -> 2 after compaction) at ~0.5 s less fixed lifecycle cost
    # than the previous 5-slice version (r8 verdict item 8)
    step = max(n // 4, 1)
    lib.write("ev", ev.iloc[:step])
    for i in range(step, n, step):
        lib.append("ev", ev.iloc[i:i + step])
    before = len(lib._load_manifest("ev", lib._load_ref("ev")["latest"]).files)
    info = lib.compact_data_explain_plan("ev")
    assert info.will_do_work and info.num_row_slices_before == before
    lib.compact_data("ev")
    after = len(lib._load_manifest("ev", lib._load_ref("ev")["latest"]).files)
    assert after == info.num_row_slices_after < before
    assert not lib.compact_data_explain_plan("ev").will_do_work
    return lib.read("ev").select("event_id", "value")


def q_staged_finalize(spark, sf):
    """stage() / sort_and_finalize_staged_data through the versioned
    library (reference compact_incomplete + sort_merge,
    ``version_core.cpp:2546,2400``): two interleaved out-of-order staged
    chunks k-way merge into ONE ascending version; the finalized read must
    be byte-identical to the source rows. The merge is one Spark range
    shuffle — no driver-side chunk concatenation. (2 chunks instead of 4
    per the r10 verdict: same merge semantics at ~half the fixed staging
    cost — every timestamp region still interleaves both chunks.)"""
    import tempfile
    from arcticdb_spark.catalog import Arctic
    ev = (load_table(spark, sf, "events")
          .filter(F.col("event_id") < 8000)
          .select("ts", "event_id", "value").toPandas())
    ev = ev.set_index("ts").sort_index()
    lib = Arctic(tempfile.mkdtemp(), spark).create_library("stglib")
    for r in range(2):
        # each chunk internally ts-sorted (validate_index), but chunks
        # interleave across the full time range — the adversarial shape
        # for the k-way merge
        lib.stage("ev", ev[ev["event_id"] % 2 == r])
    lib.sort_and_finalize_staged_data("ev", "write")
    assert lib._load_ref("ev")["latest"] == 0
    return lib.read("ev").select("ts", "event_id", "value")


def q_snapshot_asof(spark, sf):
    """Version travel through a snapshot pin surviving prune (reference
    snapshot GC, ``library.py:2642``; pin-index ``catalog.py _pins``):
    write v0, snapshot it, overwrite with doubled values and
    prune_previous=True — v0 is tombstoned-but-pinned; the snapshot read
    must return v0 exactly. In-code asserts pin the lifecycle physics."""
    import tempfile
    from arcticdb_spark.catalog import Arctic
    ev = (load_table(spark, sf, "events")
          .filter(F.col("event_id") < 6000)
          .select("event_id", "value").toPandas()
          .sort_values("event_id").reset_index(drop=True))
    lib = Arctic(tempfile.mkdtemp(), spark).create_library("snaplib")
    lib.write("ev", ev)
    lib.snapshot("pin0")
    lib.write("ev", ev.assign(value=ev["value"] * 2), prune_previous=True)
    ref = lib._load_ref("ev")
    assert ref["latest"] == 1 and ref.get("deleted") == [0]  # tombstoned
    assert lib._pinned_versions("ev") == {0}                 # but pinned
    return lib.read("ev", as_of="pin0").select("event_id", "value")


def q_stats_prune_filter(spark, sf):
    """Column-stats zone-map pruning through the versioned read path
    (reference ColumnStats MINMAX, ``column_stats.hpp:19``; per-element
    isin pruning ``test_column_stats_isin.py``): events written as 2
    value-disjoint slices (2 instead of 4 per the r10 verdict — the
    prune assert only needs scanned < manifest), MINMAX stats created,
    then a filter read that can only touch some files. In-code asserts
    pin that the plan scanned FEWER files than the manifest holds (the
    100 TB story: arbitrary-column predicates prune at plan time from
    footer-sized metadata); the returned rows let DuckDB verify values
    exactly."""
    import tempfile
    from arcticdb_spark.catalog import Arctic
    ev = (load_table(spark, sf, "events")
          .filter(F.col("event_id") < 8000)
          .select("event_id", "value").toPandas()
          .sort_values("event_id").reset_index(drop=True))
    n = len(ev)
    lib = Arctic(tempfile.mkdtemp(), spark).create_library(
        "statslib", rows_per_file=max(n // 2, 1))
    step = max(n // 2, 1)
    lib.write("ev", ev.iloc[:step])
    for i in range(step, n, step):
        lib.append("ev", ev.iloc[i:i + step])   # event_id-disjoint slices
    lib.create_column_stats("ev", ["event_id"])
    # top-quarter cut, data-relative so the prune assert holds at EVERY
    # sf (event_id is dense 0..n-1; a fixed 6000 matched nothing at
    # sf0.001 and pruned ALL files, leaving no parquet scan to assert on)
    cut = 3 * n // 4
    q = QueryBuilder()
    q = q[q["event_id"] >= cut]
    out = lib.read("ev", query_builder=q)
    total = len(lib._load_manifest("ev", lib._load_ref("ev")["latest"]).files)
    import re as _re
    plan = out._jdf.queryExecution().executedPlan().toString()
    m = _re.search(r"InMemoryFileIndex\((\d+) paths\)", plan)
    assert m and int(m.group(1)) < total, (plan[:200], total)
    return out.select("event_id", "value")


def q_dynamic_backfill(spark, sf):
    """Dynamic-schema lifecycle through the QueryBuilder pipeline
    (reference promotion table ``type_utils.hpp:40``; column add/backfill
    ``test_column_type_changes.py``): write int32 columns, then appends
    that ADD columns (int ``bonus``, float ``score``) and PROMOTE types
    (``qty``/``bonus`` int32 -> int64), then read through a groupby-sum so
    integer 0-backfill and float NaN-skip are exercised end-to-end.

    Slices interleave on ``event_id % 3`` (sf-independent, SQL-replicable);
    ``score`` values are multiples of 0.5 so float sums are order-exact.
    In-code asserts pin the promoted read schema."""
    import tempfile
    import pandas as pd
    from arcticdb_spark.catalog import Arctic
    ev = (load_table(spark, sf, "events")
          .filter(F.col("event_id") < 10000)
          .select("event_id", "user_id").toPandas()
          .sort_values("event_id").reset_index(drop=True))
    eid, uid = ev["event_id"].to_numpy(), ev["user_id"].to_numpy()
    base = pd.DataFrame({
        "grp": (uid % 5).astype("int32"),
        "qty": (eid % 97).astype("int32"),
        "bonus": (eid % 11).astype("int32"),
        "score": (eid % 7).astype("float64") * 0.5,
        "_m": eid % 3})
    s1 = base.loc[base._m == 0, ["grp", "qty"]].reset_index(drop=True)
    s2 = base.loc[base._m == 1,
                  ["grp", "qty", "bonus"]].reset_index(drop=True)
    s2["qty"] = s2["qty"].astype("int64")      # promote int32 -> int64
    s3 = base.loc[base._m == 2,
                  ["grp", "qty", "bonus", "score"]].reset_index(drop=True)
    s3["qty"] = s3["qty"].astype("int64")
    s3["bonus"] = s3["bonus"].astype("int64")  # promote the ADDED column
    lib = Arctic(tempfile.mkdtemp(), spark).create_library(
        "dynlib", dynamic_schema=True)
    lib.write("dyn", s1)
    lib.append("dyn", s2)
    lib.append("dyn", s3)
    # the promoted physical schema is visible on a plain read
    plain = dict(lib.read("dyn").dtypes)
    assert plain["qty"] == "bigint" and plain["bonus"] == "bigint", plain
    q = QueryBuilder().groupby("grp").agg({
        "sum_qty": ("qty", "sum"),
        "sum_bonus": ("bonus", "sum"),
        "sum_score": ("score", "sum"),
        "n": ("qty", "count")})
    return lib.read("dyn", query_builder=q)

# ---------------------------------------------------------------------------
# joins & windows (extensions, SURVEY §2.3/2.6 gaps)
# ---------------------------------------------------------------------------

def q_join_revenue(spark, sf):
    """Q3-shaped: customer ⋈ orders ⋈ lineitem, revenue per order for one
    segment (broadcast dim, shuffle fact join)."""
    import pandas as pd
    c = load_table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf, "orders").filter(
        F.col("o_orderdate") < pd.Timestamp("1998-03-15"))
    li = load_table(spark, sf, "lineitem")
    j = (li.join(o, li.l_orderkey == o.o_orderkey)
           .join(F.broadcast(c), o.o_custkey == c.c_custkey))
    # quantize to cents pre-sum: per-row float math is IEEE-identical across
    # engines, and an integer sum is order-independent -> exact oracle match
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    return (j.groupBy("o_orderkey", "o_orderdate")
             .agg((F.sum(cents).cast("double") / 100).alias("revenue"),
                  F.count(F.lit(1)).alias("n_lines")))


def q_anti_join(spark, sf):
    """NOT EXISTS: customers with no orders (left-anti join)."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
             .select("c_custkey", "c_name", "c_mktsegment"))


def q_semi_join_date_arith(spark, sf):
    """EXISTS + timestamp interval arithmetic: orders with a line shipped
    more than 60 days after the order date.

    Plan: an order has a late line iff max(l_shipdate) > o_orderdate + 60d,
    so lineitem pre-aggregates to one row per orderkey (map-side partial agg
    shrinks the shuffle ~4x) and ONE join replaces the old
    join-distinct-then-semi-join shape that scanned orders twice. No
    broadcast needed — both sides shuffle on the join key, scale-safe."""
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    max_ship = (li.groupBy(F.col("l_orderkey").alias("o_orderkey"))
                  .agg(F.max("l_shipdate").alias("max_ship")))
    return (o.select("o_orderkey", "o_orderdate", "o_orderpriority")
             .join(max_ship, "o_orderkey")
             .filter(F.col("max_ship") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
             .groupBy("o_orderpriority")
             .agg(F.count(F.lit(1)).alias("n_late_orders")))


def q_except_users(spark, sf):
    """EXCEPT: users who clicked but never purchased."""
    ev = load_table(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return clicks.exceptAll(buys).distinct()


def q_topk_per_group(spark, sf):
    o = load_table(spark, sf, "orders")
    out = xwin.topk_per_group(o, ["o_orderpriority"], "o_totalprice", 3,
                              tiebreak=["o_orderkey"])
    return out.select("o_orderpriority", "o_orderkey", "o_totalprice",
                      F.col("rank").cast("long").alias("rank"))


def q_sessionize(spark, sf):
    ev = load_table(spark, sf, "events")
    s = xwin.sessionize(ev, "ts", ["user_id"], gap="30 minutes")
    return (s.groupBy("user_id")
             .agg(F.max("session_seq").alias("n_sessions"),
                  F.count(F.lit(1)).alias("n_events")))


def q_asof_join(spark, sf):
    """As-of join: each event matched to the user's latest order at/before
    the event time (union-merge implementation, one shuffle)."""
    ev = load_table(spark, sf, "events").select(
        "event_id", F.col("ts"), F.col("user_id"))
    # dedupe right side to one row per (key, ts): ASOF tie-breaking among
    # equal timestamps is engine-arbitrary, so make it deterministic
    o = (load_table(spark, sf, "orders")
         .groupBy(F.col("o_custkey").alias("user_id"),
                  F.col("o_orderdate").alias("ts"))
         .agg(F.max("o_orderkey").alias("o_orderkey"),
              F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice")))
    out = xjoins.asof_join(ev, o, on="ts", by="user_id")
    return out.select("event_id", "user_id", "o_orderkey", "o_totalprice")


def q_window_lag_lead(spark, sf):
    """lead/lag per key (reference has no window functions — SURVEY §2.6)."""
    from pyspark.sql import Window
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id", "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.row_number().over(w).cast("long").alias("seq"))


def q_cumulative_sum(spark, sf):
    from pyspark.sql import Window
    ev = load_table(spark, sf, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    return ev.select("event_id", "user_id",
                     F.round(F.sum("value").over(w), 2).alias("running_value"))


def q_distinct_agg(spark, sf):
    ev = load_table(spark, sf, "events")
    return (ev.groupBy("event_type")
              .agg(F.countDistinct("user_id").alias("n_users"),
                   F.count(F.lit(1)).alias("n_events")))


def q_pivot(spark, sf):
    o = load_table(spark, sf, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (o.withColumn("cents", cents)
             .groupBy("o_orderpriority")
             .pivot("o_orderstatus", ["O", "F", "P"])
             .agg((F.sum("cents").cast("double") / 100))
             .withColumnsRenamed({"O": "open_total", "F": "finished_total",
                                  "P": "pending_total"}))


def q_percentiles(spark, sf):
    li = load_table(spark, sf, "lineitem")
    return (li.groupBy("l_returnflag")
              .agg(F.round(F.percentile("l_extendedprice", 0.5), 4).alias("p50"),
                   F.round(F.percentile("l_extendedprice", 0.95), 4).alias("p95"),
                   F.round(F.percentile("l_quantity", 0.25), 4).alias("q25_qty")))


def q_set_ops(spark, sf):
    """Users who both clicked and purchased (semi-join intersection)."""
    ev = load_table(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return clicks.intersect(buys)


def q_rolling_mean(spark, sf):
    ev = load_table(spark, sf, "events")
    out = xwin.rolling_agg(ev, "ts", ["user_id"], "value", 5, "mean")
    return out.select("event_id", "user_id",
                      F.round("rolling_mean", 4).alias("rolling_mean"))


# ---------------------------------------------------------------------------
# LLM-pipeline extensions: dedup / text / similarity / multimodal
# ---------------------------------------------------------------------------

def q_rollup(spark, sf):
    """ROLLUP subtotals (grouping-sets family, beyond the reference)."""
    li = load_table(spark, sf, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.round(F.sum("l_quantity"), 2).alias("qty")))


def q_unpivot(spark, sf):
    """Wide->long unpivot via stack()."""
    li = load_table(spark, sf, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    return li.selectExpr(
        "l_orderkey", "l_linenumber",
        "stack(3, 'quantity', l_quantity, 'price', l_extendedprice, "
        "'discount', l_discount) AS (metric, value)")


def q_dedup_exact(spark, sf):
    d = load_table(spark, sf, "documents")
    return xdedup.exact_dedup(d)


def q_text_stats(spark, sf):
    d = load_table(spark, sf, "documents")
    out = xtext.with_text_stats(d)
    return out.select("doc_id", "n_tokens", "n_punct", "punct_ratio",
                      "stopword_ratio", "quality")


def q_text_langid(spark, sf):
    d = load_table(spark, sf, "documents")
    return d.select("doc_id", "lang", xtext.lang_id(F.col("text")).alias("lang_pred"))


def q_text_fingerprint(spark, sf):
    d = load_table(spark, sf, "documents")
    return d.select("doc_id", xtext.fingerprint(F.col("text")).alias("fingerprint"))


def q_sample_split(spark, sf):
    """Deterministic content-addressed train/val/test assignment
    (``extensions/sampling.py``): Lehmer-bucket each doc_id, label by
    cumulative fraction, count docs + chars per split. Pure narrow column
    exprs — no shuffle before the 3-group agg; exactly replayable in ANY
    SQL engine (the oracle replays the integer math verbatim)."""
    from arcticdb_spark.extensions import sampling as xsamp
    d = load_table(spark, sf, "documents")
    out = xsamp.assign_split(d, "doc_id",
                             {"train": 0.8, "val": 0.1, "test": 0.1})
    return (out.groupBy("split")
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("n_chars").alias("total_chars")))


def q_sample_stratified(spark, sf):
    """Per-language deterministic downsampling (language rebalancing:
    keep 20% of 'en', 100% of everything else) + survivor counts."""
    from arcticdb_spark.extensions import sampling as xsamp
    d = load_table(spark, sf, "documents")
    kept = xsamp.stratified_hash_sample(d, "doc_id", "lang", {"en": 0.2},
                                        default_fraction=1.0)
    return (kept.groupBy("lang")
                .agg(F.count(F.lit(1)).alias("n_kept")))


def q_quality_repetition(spark, sf):
    """Gopher-style repetition quality filters per language
    (``extensions/text.py:repetition_stats``): duplicate-token and
    top-token fractions, docs flagged at dup_frac > 0.2. Explode ->
    count -> combine, both aggs map-side combinable on doc_id."""
    d = load_table(spark, sf, "documents")
    r = xtext.repetition_stats(d, carry_cols=("lang",))
    return (r.groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.count(F.when(F.col("dup_frac") > 0.2, 1)).alias("n_flagged"),
                  F.round(F.avg("dup_frac"), 4).alias("avg_dup_frac"),
                  F.round(F.avg("top_frac"), 4).alias("avg_top_frac")))


def q_embedding_centroids(spark, sf):
    """Nearest-centroid assignment over the embedding corpus
    (``extensions/similarity.py:centroid_assign``) + per-cluster rollup.
    The k-means E-step / IVF list-build primitive: broadcast k centroids,
    narrow JVM-side argmax, one tiny k-group agg."""
    e = load_table(spark, sf, "embeddings")
    a = xsim.centroid_assign(e, k=8)
    return (a.groupBy("centroid_id")
             .agg(F.count(F.lit(1)).alias("n_members"),
                  F.round(F.avg("cos"), 4).alias("avg_cos")))


def q_range_join(spark, sf):
    """Interval join (``joins.py:range_join``): each event matched to same-
    user orders whose 7-day validity window contains the event time.
    Bucketized to an equi-join on (user, day-bucket) + residual filter —
    never a broadcast-nested-loop."""
    ev = load_table(spark, sf, "events").select("event_id", "ts", "user_id")
    o = (load_table(spark, sf, "orders")
         .select(F.col("o_orderkey"), F.col("o_custkey").alias("user_id"),
                 F.col("o_orderdate").alias("lo"),
                 (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("hi")))
    j = xjoins.range_join(ev, o, "ts", "lo", "hi", by=["user_id"],
                          bucket="1 day")
    return (j.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n_matches"),
                  F.countDistinct("o_orderkey").alias("n_orders")))


def q_dup_ngram_fraction(spark, sf):
    """Corpus-wide duplicate 8-gram fraction per language
    (``dedup.py:duplicate_ngram_fraction``): the Gopher/RefinedWeb quality
    signal. Explode -> gram-count -> join-back; both shuffles key on the
    gram / doc id, linear at any corpus size."""
    d = load_table(spark, sf, "documents")
    r = xdedup.duplicate_ngram_fraction(d, n=8, carry_cols=("lang",))
    return (r.groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.count(F.when(F.col("dup_ngram_frac") > 0.3, 1))
                   .alias("n_flagged"),
                  F.round(F.avg("dup_ngram_frac"), 4).alias("avg_dup_frac")))


def q_embedding_kmeans(spark, sf):
    """Two Lloyd's iterations of k-means (``similarity.py:kmeans``):
    deterministic content-spread init (min-k vectors by md5(id)),
    rounded-trajectory E/M steps so the DuckDB oracle can replay the exact
    same two iterations. Final per-cluster sizes + mean distance."""
    e = load_table(spark, sf, "embeddings")
    a = xsim.kmeans(e, k=8, iters=2)
    return (a.groupBy("cluster")
             .agg(F.count(F.lit(1)).alias("n_members"),
                  F.round(F.avg("dist"), 4).alias("avg_dist")))


def q_dedup_minhash(spark, sf):
    d = load_table(spark, sf, "documents")
    return xdedup.minhash_near_dup_pairs(d, num_hashes=16, bands=4, k=3)


def q_dedup_jaccard(spark, sf):
    d = load_table(spark, sf, "documents")
    return xdedup.jaccard_near_dup_pairs(d, threshold=0.5, num_hashes=16,
                                         bands=4, k=3)


def q_dedup_cluster(spark, sf):
    """Deduplicated corpus: connected components over the MinHash-LSH
    candidate-pair graph, keep the min-id representative per cluster.
    Pair listing is quadratic in duplicate multiplicity (k copies of a doc
    = C(k,2) pairs); the cluster view is the pipeline-scale dedup API.
    Components via iterative min-label propagation (one groupBy per round,
    bounded by component diameter — near-dup components are near-cliques,
    so 2-3 rounds); oracle replicates it with a recursive reachability CTE."""
    d = load_table(spark, sf, "documents")
    pairs = xdedup.minhash_near_dup_pairs(d, num_hashes=16, bands=4, k=3)
    return xdedup.dedup_by_pairs(d, pairs).select("doc_id")


def q_dedup_simhash(spark, sf):
    """SimHash near-dup pairs — oracle-exact: the 60-bit majority vote, chunk
    banding and Hamming verify are pure integer/md5 math replicated in
    DuckDB SQL."""
    d = load_table(spark, sf, "documents")
    return xdedup.simhash_near_dup_pairs(d, max_hamming=6, bands=4)


def q_dedup_embedding(spark, sf):
    """Embedding-cosine near-dup pairs: exact blocked-GEMM whenever the
    normalized matrix fits the 512 MB broadcast budget (~1M rows at d=64 —
    every sf the harness ships), hyperplane-LSH + exact verify beyond.
    Strategy choice comes from the parquet footer row count
    (metadata-only), not a df.count() scan. The r12 sf1 oracle run showed
    WHY exact is the byte-gated default: LSH candidate recall at this low
    threshold (0.45) is ~0.49, while the blocked GEMM matches the
    all-pairs oracle exactly at any corpus the budget admits."""
    from arcticdb_spark.sources.tables import table_rows
    e = load_table(spark, sf, "embeddings")
    return xdedup.embedding_near_dup_pairs(e, threshold=0.45,
                                           n_rows=table_rows(sf, "embeddings"))


def q_similarity_bruteforce(spark, sf):
    e = load_table(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") < 8)
    return xsim.brute_force_topk(e, queries, k=5).select(
        "query_id", "vec_id", "score", F.col("rank").cast("long").alias("rank"))


def _ann_recall_check(ann, bf, min_hits: int):
    """Per-query driver-verified ANN invariant: |ANN∩exact| >= min_hits of
    top-5. The oracle asserts recall_ok for every query id, so a recall
    regression fails the hash compare; bench.py records the actual recall."""
    hits = (ann.select("query_id", "vec_id")
               .join(bf.select("query_id", "vec_id"), ["query_id", "vec_id"])
               .groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit")))
    qids = bf.select("query_id").distinct()
    return (qids.join(hits, "query_id", "left")
                .select("query_id",
                        (F.coalesce("n_hit", F.lit(0)) >= min_hits).alias("recall_ok")))


def q_similarity_lsh(spark, sf):
    """Multi-probe hyperplane-LSH top-5 verified against exact brute force:
    every query must recover >= 3 of the true top-5 (measured 4-5/5 at
    sf0.001-0.1 with 6 planes x 8 tables, probe=1)."""
    e = load_table(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") < 8)
    ann = xsim.lsh_topk(e, queries, k=5)
    bf = xsim.brute_force_topk(e, queries, k=5)
    return _ann_recall_check(ann, bf, min_hits=3)


def q_ngram_top(spark, sf):
    """Top-25 token bigrams by document frequency (text-analysis op)."""
    from arcticdb_spark.extensions.text import tokens
    from arcticdb_spark.extensions.dedup import _spread
    d = _spread(load_table(spark, sf, "documents"))
    # materialize the token array before the positional transform — an
    # inline tokenize expression would re-run the regex split per position
    # (see dedup.ngrams_from_tokens)
    tc = F.col("__toks__")
    # plain concat, not concat_ws: varargs/null handling cost ~35% of the
    # whole query at sf0.1 (tokens are never null here)
    bigrams = F.transform(F.sequence(F.lit(1), F.size(tc) - 1),
                          lambda i: F.concat(F.element_at(tc, i), F.lit(" "),
                                             F.element_at(tc, i + 1)))
    exploded = (d.select(tokens(F.lower(F.col("text"))).alias("__toks__"))
                 .filter(F.size(tc) >= 2)
                 .select(F.explode(bigrams).alias("bigram")))
    counted = exploded.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    # top-k via TakeOrderedAndProject (no global single-task window over the
    # vocabulary-sized count table); rank assigned on the 25-row result
    from pyspark.sql import Window
    top = counted.orderBy(F.col("n").desc(), F.col("bigram")).limit(25)
    w = Window.orderBy(F.col("n").desc(), F.col("bigram"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def q_token_frequencies(spark, sf):
    """Corpus token frequencies (top 30, deterministic tiebreak)."""
    from arcticdb_spark.extensions.text import tokens
    from arcticdb_spark.extensions.dedup import _spread
    d = _spread(load_table(spark, sf, "documents"))
    toks = (d.select(F.explode(tokens(F.lower(F.col("text")))).alias("token")))
    counted = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    # TakeOrdered top-30, then rank over the 30-row result only
    from pyspark.sql import Window
    top = counted.orderBy(F.col("n").desc(), F.col("token")).limit(30)
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def q_embedding_label_stats(spark, sf):
    """Per-label embedding stats: count + mean L2 norm + mean first component."""
    e = load_table(spark, sf, "embeddings")
    sq = F.aggregate(F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
                     F.lit(0.0), lambda a, v: a + v)
    return (e.withColumn("norm", F.sqrt(sq))
             .withColumn("c0", F.element_at("embedding", 1).cast("double"))
             .groupBy("label")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.avg("norm"), 4).alias("mean_norm"),
                  F.round(F.avg("c0"), 4).alias("mean_c0")))


def q_json_extract(spark, sf):
    """Semi-structured props column: JSON field extraction + aggregation
    (beyond the reference's scalar surface — SURVEY §2.10 notes it lacks
    string/json functions)."""
    ev = load_table(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (ev.withColumn("k", k)
              .filter(F.col("k") > 50)
              .groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum("k").alias("sum_k"),
                   F.max("k").alias("max_k")))


def q_similarity_ivf(spark, sf):
    """IVF coarse-quantized top-5 verified against exact brute force:
    every query must recover >= 2 of the true top-5 (measured 2-5/5 at
    nprobe=6 across sf0.001-0.1 with the content-spread md5 seed; the
    pre-round-6 "1.0 recall" was an artifact — the first-k-by-id seed made
    the query vectors themselves the list centroids. The driver embeddings
    are near-unclustered (intra-spread ~5x inter-centroid distance), the
    worst case for coarse quantization; clustered-corpus recall is pinned
    by test_seed_spread_on_id_sorted_corpus)."""
    e = load_table(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") < 8)
    ann = xsim.ivf_topk(e, queries, k=5, n_lists=16, nprobe=6)
    bf = xsim.brute_force_topk(e, queries, k=5)
    return _ann_recall_check(ann, bf, min_hits=2)


def q_approx_sketches(spark, sf):
    """Sketch aggregations for the 100 TB path: HyperLogLog distinct counts
    and quantile sketches — O(1) state per group vs exact shuffles.
    Driver-verified invariants (sketch values are engine-specific, so the
    oracle checks exact columns + error bounds): HLL estimate within 3x the
    configured rsd of the exact distinct count; approx p95 bracketed by the
    exact p90/p99."""
    ev = load_table(spark, sf, "events")
    agg = (ev.groupBy("event_type")
             .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
                  F.count_distinct("user_id").alias("exact_users"),
                  F.percentile_approx("value", 0.95, 10000).alias("p95_approx"),
                  F.percentile("value", 0.90).alias("p90"),
                  F.percentile("value", 0.99).alias("p99"),
                  F.count(F.lit(1)).alias("n")))
    hll_ok = (F.abs(F.col("approx_users") - F.col("exact_users"))
              <= F.greatest(F.lit(1.0), F.col("exact_users") * 0.06))
    p95_ok = (F.col("p95_approx") >= F.col("p90")) & (F.col("p95_approx") <= F.col("p99"))
    return agg.select("event_type", "exact_users", "n",
                      hll_ok.alias("hll_ok"), p95_ok.alias("p95_ok"))


def q_multimodal_features(spark, sf):
    """Opaque-binary media pipeline, oracle-exact: payloads are the UTF-8
    document bytes, decoded through the real Arrow-batched mapInPandas
    plumbing (deterministic fake decoder — sha256-seeded features that
    DuckDB reproduces from the same bytes). Swapping in a real codec changes
    only the decode function, not the Spark contract.

    The feature vector is emitted as scalar feat_0..feat_7 columns (not
    array<double>) so the driver's pandas canonicalizer can sort/hash the
    result — arrays are unhashable in its sort_values path."""
    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") < 64)
    media = xmm.media_from_documents(docs)
    feats = xmm.extract_features(media, fake=True, batch_partitions=4)
    dim = 8
    return feats.select(
        "media_id", "kind", "n_bytes", "sha256",
        *[F.col("feat")[i].alias(f"feat_{i}") for i in range(dim)])


def q_skew_salted_agg(spark, sf):
    """Salted two-phase aggregation (``plans.skew.salted_groupby``) over the
    hottest possible key distribution (a handful of event types): phase-1
    partials on (key, salt) bound any single reducer, phase-2 merges the
    <=16 partials per key. Exact for algebraic aggs, so the oracle is the
    plain GROUP BY."""
    from arcticdb_spark.plans.skew import salted_groupby
    ev = load_table(spark, sf, "events")
    out = salted_groupby(ev, "event_type",
                         {"total": ("value", "sum"),
                          "n": ("value", "count"),
                          "lo": ("value", "min"),
                          "hi": ("value", "max"),
                          "avg": ("value", "mean")})
    return out.select("event_type",
                      F.round("total", 4).alias("total"), "n",
                      F.round("lo", 4).alias("lo"),
                      F.round("hi", 4).alias("hi"),
                      F.round("avg", 4).alias("avg"))


def q_media_frame_sample(spark, sf):
    """Video/audio frame sampling (``multimodal.py:sample_frames``): pure
    JVM fan-out — explode(sequence) per media row + binary substring per
    frame, no Python. The oracle replays the frame count/offset/length
    arithmetic from octet lengths (DuckDB has no BLOB substring, so the
    frame *hashes* are pinned by pytest instead)."""
    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 256)
    media = xmm.media_from_documents(d)
    fr = xmm.sample_frames(media, every_ms=100, frame_bytes=32)
    return (fr.groupBy("kind")
              .agg(F.countDistinct("media_id").alias("n_media"),
                   F.count(F.lit(1)).alias("n_frames"),
                   F.min("byte_offset").alias("min_off"),
                   F.max("byte_offset").alias("max_off"),
                   F.sum(F.length("frame")).alias("sum_frame_bytes")))


def q_decontaminate(spark, sf):
    """Benchmark decontamination (``dedup.py:decontaminate``): docs from
    source 'src0' act as the held-out eval set; training docs sharing any
    word 8-gram with it are flagged. The benchmark's distinct grams are
    broadcast (eval sets are tiny next to a 100 TB corpus), so the corpus
    sees one narrow pass + a map-side join."""
    d = load_table(spark, sf, "documents")
    bench = d.filter(F.col("source") == "src0")
    train = d.filter(F.col("source") != "src0")
    r = xdedup.decontaminate(train, bench, n=8, carry_cols=("lang",))
    return (r.groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.count(F.when(F.col("contaminated"), 1))
                   .alias("n_contaminated_docs"),
                  F.sum("n_contaminated").alias("n_hit_grams")))


def q_pack_chunks(spark, sf):
    """Concat-and-chunk sequence packing (``text.py:pack_chunks``) into
    512-token blocks: per-source doc counts, split-doc counts, chunk span.
    The global token-position scan is plans.rowid.prefix_sum — two-phase,
    one row of cross-partition state per partition."""
    d = load_table(spark, sf, "documents")
    r = xtext.pack_chunks(d.select("doc_id", "text", "source"), 512,
                          carry_cols=("source",))
    return (r.groupBy("source")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum("n_tokens").alias("n_tokens"),
                  F.count(F.when(F.col("split"), 1)).alias("n_split_docs"),
                  F.min("first_chunk").alias("min_chunk"),
                  F.max("last_chunk").alias("max_chunk")))


def _plant_pii(d):
    """Deterministic PII planting on a doc_id schedule — the synthetic
    corpus is PII-free; the same schedule is replicated verbatim in the
    pii_scan / pii_redact oracle SQL."""
    return d.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0,
                   F.concat(F.lit(" contact user"),
                            F.col("doc_id").cast("string"),
                            F.lit("@example.com now")))
             .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0,
                   F.concat(F.lit(" from 10.0."),
                            (F.col("doc_id") % 256).cast("string"),
                            F.lit(".1")))
             .otherwise(F.lit(""))))


def q_pii_scan(spark, sf):
    """PII scan/redaction accounting (``text.py:pii_scan``): plants
    deterministic emails/IPv4s, then counts matches per source with
    JVM-side regexp_count — no Python in the path."""
    planted = _plant_pii(load_table(spark, sf, "documents"))
    r = xtext.pii_scan(planted)
    return (r.groupBy("source")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum("email_count").alias("n_emails"),
                  F.sum("ipv4_count").alias("n_ipv4"),
                  F.count(F.when((F.col("email_count") > 0)
                                 | (F.col("ipv4_count") > 0), 1))
                   .alias("n_docs_with_pii")))


def q_pii_redact(spark, sf):
    """PII redaction (``text.py:pii_redact``): a JVM-side regexp_replace
    chain (email then ipv4, the pii_scan pattern order) — whole-stage
    codegen, no Python. The oracle replays it with DuckDB
    regexp_replace(..., 'g') in the same order on the same planted text."""
    planted = _plant_pii(load_table(spark, sf, "documents"))
    r = xtext.pii_redact(planted)
    return (r.filter((F.col("doc_id") % 7 == 0) | (F.col("doc_id") % 11 == 0))
             .select("doc_id", F.col("text").alias("redacted")))


def q_salted_join(spark, sf):
    """Skew-proof equi-join (``plans.skew.salted_join``): the big side's
    key is salted, each small row replicated once per salt value, joined on
    (key, salt) — per-reducer work for a hot key drops by the salt factor.
    Output is exactly the plain join, so the oracle is the unsalted JOIN +
    GROUP BY (cents-quantized sum for order-independent float math)."""
    from arcticdb_spark.plans.skew import salted_join
    o = load_table(spark, sf, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice")
    c = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment")
    j = salted_join(o, c, "custkey", salt=8)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (j.groupBy("c_mktsegment")
             .agg(F.count(F.lit(1)).alias("n_orders"),
                  (F.sum(cents).cast("double") / 100).alias("total_price")))


def q_simhash_dedup(spark, sf):
    """Cluster-form SimHash dedup (``dedup.py:simhash_dedup``): connected
    components run on the distinct-hash graph (thousands of nodes no matter
    the doc count), each component keeps its min doc_id. Hamming<=1 — the
    tight-dup setting (the loose pair listing is dedup_simhash at 6); the
    template corpus chains into near-cliques at looser thresholds, whose
    transitive closure no SQL oracle can replay. The oracle mirrors the
    hash-level clustering exactly: distinct-hash pair set (same 60-bit
    majority-vote + banding math), reachability CTE over the HASH graph,
    min-doc representative per component. bands=2 (width-30 chunks):
    pigeonhole still guarantees hamming<=1 capture, and wide chunks cut
    band-bucket collisions ~2x in the oracle's self-join."""
    d = load_table(spark, sf, "documents")
    return xdedup.simhash_dedup(d, max_hamming=1, bands=2).select("doc_id")


def q_stream_resample(spark, sf):
    """Structured-Streaming windowed resample (``streaming.ingest.
    stream_resample``) over the bounded events stream: 1h tumbling windows,
    complete-mode memory sink. On a bounded one-batch stream this equals
    the batch resample, so the oracle is plain date_trunc GROUP BY —
    a FULL value check on a streaming operator. Runs through the shared
    one-pass gate runtime (streaming/gate.py): both gate streams execute
    concurrently once per sf_dir, amortizing the ~1s fixed streaming
    startup that dominated this query's bench line."""
    from arcticdb_spark.streaming.gate import gate_results
    out = gate_results(spark, sf)["resample"]
    return out.select(F.col("ts").alias("bucket"), "n",
                      F.round("s", 4).alias("s"))


def q_stream_sessionize(spark, sf):
    """Custom stateful streaming operator (``applyInPandasWithState``,
    ``streaming.stateful.stream_sessionize``): per-user sessions split on a
    30-minute inactivity gap. A bounded stream emits every CLOSED session —
    each user's final (still-open) session stays in state — so the oracle
    is the batch gap-sessionization minus each user's last session,
    expressible in SQL (lag + cumulative sum). Shares the one-pass gate
    runtime with q_stream_resample (streaming/gate.py)."""
    from arcticdb_spark.streaming.gate import gate_results
    out = gate_results(spark, sf)["sessionize"]
    return (out.groupBy("user_id")
               .agg(F.count(F.lit(1)).alias("n_sessions"),
                    F.sum("n_events").alias("n_events"),
                    F.min("session_start").alias("first_start"),
                    F.max("session_end").alias("last_end")))


def q_shuffle_shards(spark, sf):
    """Deterministic global shuffle for training order
    (``sampling.shuffle_deterministic``): content-addressed permutation key
    + shard id per doc — identical on every run/cluster/engine. Narrow
    projection; the only shuffle is the per-shard agg. Per-shard stats pin
    balance AND the exact key range (a permutation regression moves
    min/max keys)."""
    from arcticdb_spark.extensions import sampling as xsamp
    d = load_table(spark, sf, "documents")
    out = xsamp.shuffle_deterministic(d, "doc_id", n_shards=8)
    return (out.groupBy("shard")
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.min("shuffle_key").alias("min_key"),
                    F.max("shuffle_key").alias("max_key"),
                    F.sum("n_chars").alias("total_chars")))


def q_categorical_roundtrip(spark, sf):
    """Categorical normalization end-to-end through the versioned library
    (reference test_categorical.py): write a frame whose ``source`` column
    is pandas Categorical, read back as pandas (CategoricalDtype must
    restore — asserted here, so a regression fails the driver row), then
    aggregate the Spark-format read, which exposes decoded values."""
    import pandas as pd
    import tempfile
    from arcticdb_spark.catalog import Arctic
    docs = (load_table(spark, sf, "documents")
            .select("doc_id", "source", "lang"))
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    cats = sorted(pdf["source"].dropna().unique())
    pdf["source"] = pd.Categorical(pdf["source"], categories=cats)
    lib = Arctic(tempfile.mkdtemp(), spark).create_library("catlib")
    lib.write("docs", pdf)
    back = lib.read("docs", output_format="pandas")
    assert isinstance(back["source"].dtype, pd.CategoricalDtype)
    assert list(back["source"].dtype.categories) == cats
    out = lib.read("docs")
    return (out.groupBy("source")
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.countDistinct("lang").alias("n_langs")))


def q_ns_precision(spark, sf):
    """Nanosecond-exact index end-to-end through the versioned library
    (SURVEY §7(d); reference entity/types.hpp:73 — the index is int64 ns
    since epoch): synthesize deterministic sub-µs timestamps from event_id,
    write through the Library with a LONG-ns index (fully distributed — a
    Spark frame with an explicit long index column, no driver collect),
    date_range-slice at bounds with sub-µs components, and aggregate exact
    ns epochs. A µs-truncating index would zero sum_subus and shift
    min_ns/max_ns — the oracle catches both."""
    import pandas as pd
    import tempfile
    from arcticdb_spark.catalog import Arctic
    ev = load_table(spark, sf, "events")
    # cast: the parquet column is TIMESTAMP_NTZ; session tz is UTC so the
    # cast is value-preserving
    ns = (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
          + F.pmod(F.col("event_id"), F.lit(1000)))
    src = ev.select(ns.alias("ts"), "event_id", "event_type", "value")
    lib = Arctic(tempfile.mkdtemp(), spark).create_library("nslib")
    lib.write("evns", src, index_column="ts")
    lo = pd.Timestamp("2024-01-03").value + 500   # sub-µs boundary
    hi = pd.Timestamp("2024-01-20").value + 500
    out = lib.read("evns", date_range=(pd.Timestamp(lo), pd.Timestamp(hi)),
                   output_format="spark-ns")
    return (out.groupBy("event_type")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.min("ts").alias("min_ns"),
                    F.max("ts").alias("max_ns"),
                    F.sum(F.pmod(F.col("ts"), F.lit(1000)))
                     .alias("sum_subus")))


def q_uint64_filter_agg(spark, sf):
    """Full-range uint64 end-to-end through the versioned library
    (reference signed_unsigned_comparison.hpp + type_utils.cpp:141-155):
    write a uint64 column straddling 2^63 (stored as int64 bit patterns
    with a norm-meta marker), filter with an unsigned comparison at the
    sign-bit boundary (expr.py UINT kind: pure long sign-bit-flip codegen),
    and aggregate — min/max in unsigned order, sum wrapping mod 2^64 like
    the reference's uint64 accumulator. Outputs go through hex->decimal
    conversion (JVM-side conv) so the driver compares exact digit strings
    against DuckDB's native UBIGINT."""
    import numpy as np
    import tempfile
    from arcticdb_spark.catalog import Arctic
    # sf-independent row cap (like compact_roundtrip): the oracle pins the
    # uint64 STORAGE+COMPARE semantics, not write throughput — collecting
    # the whole events table before lib.write scaled the harness, not the
    # engine (the oracle applies the same predicate)
    ev = (load_table(spark, sf, "events")
          .filter(F.col("event_id") < 25000)
          .select("event_id", "event_type").toPandas()
          .sort_values("event_id").reset_index(drop=True))
    ev["u"] = (np.uint64(2**63 - 5000)
               + ev["event_id"].to_numpy().astype(np.uint64))
    lib = Arctic(tempfile.mkdtemp(), spark).create_library("u64lib")
    lib.write("ev", ev)
    q = QueryBuilder()
    q = q[q["u"] >= 2**63]          # unsigned boundary filter
    q = q.groupby("event_type").agg({"umin": ("u", "min"),
                                     "umax": ("u", "max"),
                                     "usum": ("u", "sum"),
                                     "n": ("u", "count")})
    out = lib.read("ev", query_builder=q)

    def dec(c):   # uint64 bit pattern -> exact unsigned decimal string
        return F.conv(F.hex(F.col(c)), 16, 10)

    return out.select("event_type", dec("umin").alias("umin"),
                      dec("umax").alias("umax"), dec("usum").alias("usum"),
                      F.col("n"))


def q_uint64_mixed_compare(spark, sf):
    """Mixed signed/unsigned comparison + wrap-mod-2^64 projection through
    the library (reference signed_unsigned_comparison.hpp:18-43): a uint64
    column straddling 2^63 filtered against a SIGNED int64 column (some
    negative), then doubled mod 2^64. DuckDB replays the comparison with
    native UBIGINT-vs-BIGINT (exact hugeint-promoted math), so any error
    in the sign-guarded flip formulas hash-mismatches."""
    import numpy as np
    import tempfile
    from arcticdb_spark.catalog import Arctic
    # sf-independent row cap — see q_uint64_filter_agg (the u <= 2^63+40000
    # filter already bounds matches to event_id <= 21250, so the capped
    # harness is value-identical at every sf >= 0.01)
    ev = (load_table(spark, sf, "events")
          .filter(F.col("event_id") < 25000)
          .select("event_id", "event_type", "user_id").toPandas()
          .sort_values("event_id").reset_index(drop=True))
    ev["u"] = (np.uint64(2**63 - 2500)
               + ev["event_id"].to_numpy().astype(np.uint64) * np.uint64(2))
    # signed comparand: negative for every 3rd row
    ev["s"] = (ev["user_id"].to_numpy().astype(np.int64)
               - np.where(ev["event_id"].to_numpy() % 3 == 0, 10**6, 0))
    # unsigned pow operands: base 2, exponents 60..63 — uint ** uint stays
    # INTEGER (uint64) per the reference promotion table
    # (operation_types.hpp:238); 2^63 exceeds signed range, so the unsigned
    # max must pick the negative bit pattern
    ev["pb"] = np.uint64(2)
    ev["pe"] = (60 + ev["event_id"].to_numpy() % 4).astype(np.uint64)
    lib = Arctic(tempfile.mkdtemp(), spark).create_library("u64mix")
    lib.write("ev", ev)
    q = QueryBuilder()
    q = q[(q["u"] > q["s"]) & (q["u"] <= 2**63 + 40000)]
    q = q.apply("w", q["u"] + q["u"])     # wraps mod 2^64 above 2^63
    q = q.apply("p", q["pb"] ** q["pe"])  # uint ** uint -> uint64
    q = q.groupby("event_type").agg({"n": ("u", "count"),
                                     "wmin": ("w", "min"),
                                     "wmax": ("w", "max"),
                                     "pmax": ("p", "max")})
    out = lib.read("ev", query_builder=q)

    def dec(c):
        return F.conv(F.hex(F.col(c)), 16, 10)

    return out.select("event_type", F.col("n"),
                      dec("wmin").alias("wmin"), dec("wmax").alias("wmax"),
                      dec("pmax").alias("pmax"))


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def q_dict_groupby(spark, sf):
    """Dictionary-coded string columns end-to-end (r13; the reference
    string-pool analogue — string_pool.hpp, SURVEY §1.1): declared
    id/categorical STRING columns are stored as int64 content-hash codes
    with a (code, value) parquet sidecar; a pure groupby pipeline
    aggregates ON THE CODES (8-byte hash keys instead of UTF8 strings —
    the measured 40% of qb_query_1's floor) and decodes only the k-row
    result. The in-code asserts pin that (a) the physical schema really
    stores longs and (b) decode-after-agg restores exact strings, so the
    driver row fails if either half regresses."""
    import json as _json
    import tempfile
    from arcticdb_spark.catalog import Arctic, LibraryOptions
    from arcticdb_spark.query import QueryBuilder
    docs = (load_table(spark, sf, "documents")
            .select("doc_id", "source", "lang", "n_chars"))
    lib = Arctic(tempfile.mkdtemp(), spark).create_library(
        "dictlib", library_options=LibraryOptions(
            dictionary_columns=("source", "lang")))
    lib.write("docs", docs.toPandas().sort_values("doc_id")
              .reset_index(drop=True))
    m = lib._load_manifest("docs", 0)
    stored = {f["name"]: f["type"]
              for f in _json.loads(m.schema_json)["fields"]}
    assert stored["source"] == "long" and stored["lang"] == "long", stored
    q = QueryBuilder().groupby(["source", "lang"]).agg(
        {"n_docs": ("doc_id", "count"), "sum_chars": ("n_chars", "sum")})
    out = lib.read("docs", query_builder=q)
    return out.select("source", "lang", "n_docs", "sum_chars")


def q_dedup_keep_best(spark, sf):
    """Retention policy over exact-dup groups
    (``extensions/dedup.py keep_best_per_dup_group``): ONE surviving doc
    per distinct normalized text, the winner by (quality DESC, n_chars
    DESC, doc_id ASC). Physical: max_by over a lexicographic struct key —
    map-side combinable, one shuffle on the fingerprint, no per-group sort
    (a row_number window would shuffle every duplicate row)."""
    d = load_table(spark, sf, "documents")
    return xdedup.keep_best_per_dup_group(d)


def q_incremental_dedup(spark, sf):
    """New-vs-seen incremental dedup (``extensions/dedup.py
    incremental_dedup``): docs of the odd-id half whose normalized text
    never occurs in the even-id half. At oracle scale the byte gate picks
    the broadcast-set path (zero shuffle); the Bloom-prefilter scale path
    is value-identical (exact verify step) and forced in pytest."""
    d = load_table(spark, sf, "documents")
    seen = d.filter(F.col("doc_id") % 2 == 0)
    new = d.filter(F.col("doc_id") % 2 == 1)
    return (xdedup.incremental_dedup(new, seen)
            .select("doc_id", "fingerprint"))


def q_unigram_logprob(spark, sf):
    """Corpus-unigram LM quality score (``extensions/text.py
    unigram_logprob``): mean ln p(token) per doc under the corpus unigram
    distribution — explode -> map-side-combinable token counts ->
    broadcast vocab join back -> per-doc mean. The CCNet-style
    'surprisingness' filter a pre-training pipeline runs at 100 TB."""
    d = load_table(spark, sf, "documents")
    return xtext.unigram_logprob(d)


def q_segment_dedup(spark, sf):
    """Segment-level exact dedup with reassembly (``extensions/dedup.py
    segment_dedup``): remove every 8-token span whose exact text occurs in
    >= 2 distinct documents, rebuild each doc from its surviving spans in
    order — the CCNet/RefinedWeb "repeated-line boilerplate" pass at a
    granularity finer than whole-doc dedup. Physical: posexplode ->
    map-side-combinable count_distinct on the span -> broadcast-gated
    join-back on a 16 B md5 key -> one id shuffle with sort_array
    reassembly (no window function)."""
    d = load_table(spark, sf, "documents")
    return xdedup.segment_dedup(d, window=8, min_docs=2)


def q_heavy_hitters(spark, sf):
    """EXACT top-40 corpus tokens via mergeable Misra-Gries nomination +
    exact candidate recount (``extensions/text.py heavy_hitters``): the
    sketch bounds the shuffle to counters x partitions rows and its error
    bound PROVES the top-k (k-th count > summed subtracted mass), with a
    value-identical full-groupBy fallback when the proof fails."""
    d = load_table(spark, sf, "documents")
    return xtext.heavy_hitters(d, k=40)


def q_bigram_logprob(spark, sf):
    """Corpus-bigram LM score per doc (``extensions/text.py
    bigram_logprob``): mean ln p(tok_i | tok_{i-1}) under corpus bigram /
    prefix counts — catches token-salad text whose unigrams are common but
    whose transitions are not. One JVM slice/zip -> explode -> combinable
    bigram counts -> broadcast-gated join-back -> per-doc mean."""
    d = load_table(spark, sf, "documents")
    return xtext.bigram_logprob(d)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # ORDERING POLICY (round 4+): least-recently-driver-verified
        # first. The driver checks only the first ~50 entries per
        # round. Round-14 sort: the 44 queries whose last driver row is
        # CORRECTNESS_r12 (everything absent from CORRECTNESS_r13.json)
        # come first — this round they include the dedup/similarity/
        # embedding operators rewritten in optimization round 1, which
        # the r13 verdict explicitly asked to put in front of the driver
        # — then the 50 verified in CORRECTNESS_r13 in their r13 order.
        # r14 ∪ r13 covers the full registry with nothing older than one
        # round.
        # --- last driver row is r12 ---
        "topk_per_group": q_topk_per_group,
        "window_lag_lead": q_window_lag_lead,
        "uint64_filter_agg": q_uint64_filter_agg,
        "embedding_kmeans": q_embedding_kmeans,
        "embedding_centroids": q_embedding_centroids,
        "ngram_top": q_ngram_top,
        "token_frequencies": q_token_frequencies,
        "dup_ngram_fraction": q_dup_ngram_fraction,
        "decontaminate": q_decontaminate,
        "cumulative_sum": q_cumulative_sum,
        "distinct_agg": q_distinct_agg,
        "pivot": q_pivot,
        "percentiles": q_percentiles,
        "set_ops": q_set_ops,
        "rollup": q_rollup,
        "unpivot": q_unpivot,
        "skew_salted_agg": q_skew_salted_agg,
        "media_frame_sample": q_media_frame_sample,
        "pack_chunks": q_pack_chunks,
        "pii_scan": q_pii_scan,
        "range_join": q_range_join,
        "quality_repetition": q_quality_repetition,
        "sample_split": q_sample_split,
        "sample_stratified": q_sample_stratified,
        "dedup_cluster": q_dedup_cluster,
        "dedup_minhash": q_dedup_minhash,
        "dedup_exact": q_dedup_exact,
        "embedding_label_stats": q_embedding_label_stats,
        "sessionize": q_sessionize,
        "asof_join": q_asof_join,
        "rolling_mean": q_rolling_mean,
        "text_stats": q_text_stats,
        "text_langid": q_text_langid,
        "ns_precision": q_ns_precision,
        "text_fingerprint": q_text_fingerprint,
        "multimodal_features": q_multimodal_features,
        "dedup_jaccard": q_dedup_jaccard,
        "semi_join_date_arith": q_semi_join_date_arith,
        "dedup_simhash": q_dedup_simhash,
        "dedup_embedding": q_dedup_embedding,
        "similarity_bruteforce": q_similarity_bruteforce,
        "similarity_lsh": q_similarity_lsh,
        "similarity_ivf": q_similarity_ivf,
        "json_extract": q_json_extract,
        # --- green in CORRECTNESS_r13 on current code (r13 order) ---
        "segment_dedup": q_segment_dedup,
        "heavy_hitters": q_heavy_hitters,
        "bigram_logprob": q_bigram_logprob,
        "dict_groupby": q_dict_groupby,
        "dedup_keep_best": q_dedup_keep_best,
        "incremental_dedup": q_incremental_dedup,
        "unigram_logprob": q_unigram_logprob,
        "approx_sketches": q_approx_sketches,
        "filter_numeric": q_filter_numeric,
        "filter_isin_regex": q_filter_isin_regex,
        "filter_ternary": q_filter_ternary,
        "project_arith": q_project_arith,
        "groupby_single": q_groupby_single,
        "groupby_first_last": q_groupby_first_last,
        "uint64_mixed_compare": q_uint64_mixed_compare,
        "compact_roundtrip": q_compact_roundtrip,
        "groupby_tpch_q1": q_groupby_tpch_q1,
        "groupby_ts_minmax": q_groupby_ts_minmax,
        "resample_weekly": q_resample_weekly,
        "concat_three": q_concat_three,
        "resample_1h": q_resample_1h,
        "resample_ohlc": q_resample_ohlc,
        "resample_closed_right": q_resample_closed_right,
        "resample_offset": q_resample_offset,
        "resample_std_median": q_resample_std_median,
        "corpus_clean": q_corpus_clean,
        "project_then_groupby": q_project_then_groupby,
        "pipeline_filter_head": q_pipeline_filter_head,
        "stream_resample": q_stream_resample,
        "stream_sessionize": q_stream_sessionize,
        "shuffle_shards": q_shuffle_shards,
        "dynamic_backfill": q_dynamic_backfill,
        "staged_finalize": q_staged_finalize,
        "snapshot_asof": q_snapshot_asof,
        "stats_prune_filter": q_stats_prune_filter,
        "salted_join": q_salted_join,
        "simhash_dedup": q_simhash_dedup,
        "pii_redact": q_pii_redact,
        "categorical_roundtrip": q_categorical_roundtrip,
        "date_range": q_date_range,
        "head": q_head,
        "tail": q_tail,
        "row_range": q_row_range,
        "concat_outer": q_concat_outer,
        "concat_inner": q_concat_inner,
        "merge_update_upsert": q_merge_update_upsert,
        "update_range_surgery": q_update_range_surgery,
        "join_revenue": q_join_revenue,
        "anti_join": q_anti_join,
        "except_users": q_except_users,
    }


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

_EV = "CAST(ts AS TIMESTAMP)"  # ns -> µs truncation, matches Spark-side load

_TOKS = r"list_transform(string_split_regex(trim(text), '\s+'), x -> lower(x))"

_LANG_SETS = {
    "en": ['the', 'and', 'of', 'to', 'in', 'is', 'that', 'for', 'with'],
    "de": ['der', 'die', 'und', 'das', 'ist', 'nicht', 'ein', 'mit'],
    "fr": ['le', 'la', 'les', 'des', 'est', 'une', 'dans', 'pour'],
    "es": ['el', 'los', 'las', 'una', 'por', 'para', 'con', 'del'],
}


def _lang_sql() -> str:
    hits = []
    for lang, words in _LANG_SETS.items():
        lst = "[" + ", ".join(f"'{w}'" for w in words) + "]"
        hits.append(f"len(list_filter(toks, x -> list_contains({lst}, x))) AS s_{lang}")
    best = "greatest(s_en, s_de, s_fr, s_es)"
    case = (f"CASE WHEN {best} = 0 THEN 'unk' "
            f"WHEN s_en = {best} THEN 'en' WHEN s_de = {best} THEN 'de' "
            f"WHEN s_fr = {best} THEN 'fr' ELSE 'es' END")
    return f"""
WITH t AS (SELECT doc_id, lang,
             CASE WHEN length(trim(text)) = 0 THEN [] ELSE {_TOKS} END AS toks
           FROM documents),
s AS (SELECT doc_id, lang, {', '.join(hits)} FROM t)
SELECT doc_id, lang, {case} AS lang_pred FROM s"""


_STOPWORDS = _LANG_SETS["en"] + ["a", "an", "it", "on", "as", "at", "by"]


def _text_stats_sql() -> str:
    stop_lst = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"
    return f"""
WITH t AS (
  SELECT doc_id, text,
         CASE WHEN length(trim(text)) = 0 THEN [] ELSE {_TOKS} END AS toks,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS n_punct
  FROM documents),
s AS (
  SELECT doc_id, n_chars, n_punct,
         len(toks) AS n_tokens,
         len(list_filter(toks, x -> list_contains({stop_lst}, x))) AS n_stop
  FROM t)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, CAST(n_punct AS BIGINT) AS n_punct,
       CASE WHEN n_chars > 0 THEN round(n_punct / CAST(n_chars AS DOUBLE), 6) ELSE 0.0 END AS punct_ratio,
       CASE WHEN n_tokens > 0 THEN round(n_stop / CAST(n_tokens AS DOUBLE), 6) ELSE 0.0 END AS stopword_ratio,
       round((CASE WHEN n_tokens >= 5 AND n_chars >= 20 THEN 0.4 ELSE 0.0 END)
           + (CASE WHEN n_tokens > 0 AND round(n_stop / CAST(n_tokens AS DOUBLE), 6) >= 0.05 THEN 0.3 ELSE 0.0 END)
           + (CASE WHEN n_chars IS NULL OR n_chars = 0
                     OR round(n_punct / CAST(n_chars AS DOUBLE), 6) <= 0.1
                   THEN 0.3 ELSE 0.0 END), 1) AS quality
FROM s"""


_FPR = ("md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))")


def _minhash_sql(num_hashes: int = 16, bands: int = 4, k: int = 3) -> str:
    rows = num_hashes // bands
    return f"""
WITH t AS (SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN [] ELSE {_TOKS} END AS toks
           FROM documents),
sh AS (SELECT doc_id,
         CASE WHEN len(toks) >= {k}
              THEN [array_to_string(toks[i:i+{k - 1}], ' ') FOR i IN generate_series(1, len(toks) - {k - 1})]
              ELSE [array_to_string(toks, ' ')] END AS shingles
       FROM t),
sig AS (SELECT doc_id,
          [list_min([substring(md5('h' || CAST(h // 4 AS VARCHAR) || ':' || s),
                               (h % 4) * 8 + 1, 8) FOR s IN shingles])
           FOR h IN generate_series(0, {num_hashes - 1})] AS sig
        FROM sh),
bands AS (SELECT doc_id,
            unnest(['b' || CAST(b AS VARCHAR) || ':' ||
                    md5(array_to_string(sig[b * {rows} + 1 : b * {rows} + {rows}], '|'))
                    FOR b IN generate_series(0, {bands - 1})]) AS band
          FROM sig)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id"""


def _jaccard_sql(threshold: float = 0.5, num_hashes: int = 16, bands: int = 4,
                 k: int = 3) -> str:
    rows = num_hashes // bands
    return f"""
WITH t AS (SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN [] ELSE {_TOKS} END AS toks
           FROM documents),
sh AS (SELECT doc_id,
         CASE WHEN len(toks) >= {k}
              THEN [array_to_string(toks[i:i+{k - 1}], ' ') FOR i IN generate_series(1, len(toks) - {k - 1})]
              ELSE [array_to_string(toks, ' ')] END AS shingles
       FROM t),
sig AS (SELECT doc_id, shingles,
          [list_min([substring(md5('h' || CAST(h // 4 AS VARCHAR) || ':' || s),
                               (h % 4) * 8 + 1, 8) FOR s IN shingles])
           FOR h IN generate_series(0, {num_hashes - 1})] AS sig
        FROM sh),
bands AS (SELECT doc_id,
            unnest(['b' || CAST(b AS VARCHAR) || ':' ||
                    md5(array_to_string(sig[b * {rows} + 1 : b * {rows} + {rows}], '|'))
                    FOR b IN generate_series(0, {bands - 1})]) AS band
          FROM sig),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
sets AS (SELECT doc_id, list_distinct(shingles) AS sh FROM sh),
j AS (SELECT c.id_a, c.id_b,
        len(list_intersect(sa.sh, sb.sh)) AS i,
        len(list_distinct(list_concat(sa.sh, sb.sh))) AS u
      FROM cand c JOIN sets sa ON c.id_a = sa.doc_id
                  JOIN sets sb ON c.id_b = sb.doc_id)
SELECT id_a, id_b,
       round(CASE WHEN u > 0 THEN i / CAST(u AS DOUBLE) ELSE 0.0 END, 6) AS jaccard
FROM j WHERE round(CASE WHEN u > 0 THEN i / CAST(u AS DOUBLE) ELSE 0.0 END, 6) >= {threshold}"""


def _cluster_sql() -> str:
    """Connected components over the MinHash candidate pairs as a recursive
    reachability CTE (cluster = min node reachable from each id), then keep
    one representative per cluster — same semantics as the iterative
    min-label propagation in dedup.near_dup_clusters."""
    return f"""
WITH RECURSIVE cand AS ({_minhash_sql()}),
edges AS (SELECT id_a AS a, id_b AS b FROM cand
          UNION ALL
          SELECT id_b AS a, id_a AS b FROM cand),
reach(id, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r),
cc AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id)
SELECT d.doc_id FROM documents d
WHERE d.doc_id NOT IN (SELECT id FROM cc WHERE cluster <> id)"""


def _simhash_sql(max_hamming: int = 6, bands: int = 4, bits: int = 60) -> str:
    """Full SimHash replication: 60-bit majority vote over per-token md5
    prefixes (hex-cast to BIGINT), chunk banding, Hamming verify — the same
    integer math as arcticdb_spark.extensions.dedup.simhash."""
    width = bits // bands
    mask = (1 << width) - 1
    return f"""
WITH t AS (SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN [] ELSE {_TOKS} END AS toks
           FROM documents),
hs AS (SELECT doc_id,
         [CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)
          FOR t IN list_distinct(toks)] AS hs
       FROM t),
sig AS (SELECT doc_id, CAST(coalesce(list_sum(
          [CASE WHEN 2 * len(list_filter(hs, h -> (h >> b) & 1 = 1)) > len(hs)
                THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END
           FOR b IN generate_series(0, {bits - 1})]), 0) AS BIGINT) AS sh
        FROM hs),
chunks AS (SELECT doc_id, sh,
             unnest(['c' || CAST(i AS VARCHAR) || ':' ||
                     CAST((sh >> (i * {width})) & {mask} AS VARCHAR)
                     FOR i IN generate_series(0, {bands - 1})]) AS chunk
           FROM sig)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
FROM chunks a JOIN chunks b ON a.chunk = b.chunk AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= {max_hamming}"""


def _simhash_dedup_sql(max_hamming: int = 1, bands: int = 2,
                       bits: int = 60) -> str:
    """Cluster-form SimHash dedup oracle, replayed at the DISTINCT-HASH
    level exactly like ``dedup.simhash_dedup``: identical-hash docs
    collapse to one graph node BEFORE the reachability CTE, so the closure
    runs over thousands of hash nodes with hamming<=1 chains — a doc-level
    closure over the same corpus is a near-clique graph whose transitive
    closure is cubically large (measured: minutes at sf0.1 even at
    hamming<=2). Survivor = the min doc_id of each hash component."""
    width = bits // bands
    mask = (1 << width) - 1
    return f"""
WITH RECURSIVE t AS (SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN [] ELSE {_TOKS} END AS toks
           FROM documents),
hs AS (SELECT doc_id,
         [CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)
          FOR t IN list_distinct(toks)] AS hs
       FROM t),
sig AS (SELECT doc_id, CAST(coalesce(list_sum(
          [CASE WHEN 2 * len(list_filter(hs, h -> (h >> b) & 1 = 1)) > len(hs)
                THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END
           FOR b IN generate_series(0, {bits - 1})]), 0) AS BIGINT) AS sh
        FROM hs),
dsh AS (SELECT sh, min(doc_id) AS min_doc FROM sig GROUP BY sh),
chunks AS (SELECT sh,
             unnest(['c' || CAST(i AS VARCHAR) || ':' ||
                     CAST((sh >> (i * {width})) & {mask} AS VARCHAR)
                     FOR i IN generate_series(0, {bands - 1})]) AS chunk
           FROM dsh),
cand AS (SELECT DISTINCT a.sh AS sh_a, b.sh AS sh_b
         FROM chunks a JOIN chunks b ON a.chunk = b.chunk AND a.sh < b.sh
         WHERE bit_count(xor(a.sh, b.sh)) <= {max_hamming}),
edges AS (SELECT sh_a AS a, sh_b AS b FROM cand
          UNION ALL
          SELECT sh_b AS a, sh_a AS b FROM cand),
reach(sh, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT reach.sh, e.b FROM reach JOIN edges e ON e.a = reach.r),
cc AS (SELECT sh, min(r) AS root FROM reach GROUP BY sh),
comp AS (SELECT d.sh, d.min_doc, coalesce(cc.root, d.sh) AS root
         FROM dsh d LEFT JOIN cc ON cc.sh = d.sh),
rep AS (SELECT root, min(min_doc) AS rep_doc FROM comp GROUP BY root)
SELECT s.doc_id
FROM sig s JOIN comp c ON s.sh = c.sh JOIN rep r ON c.root = r.root
WHERE s.doc_id = r.rep_doc"""


def _multimodal_sql(dim: int = 8, limit: int = 64) -> str:
    """Replicates the fake decoder from the raw payload bytes: n_bytes,
    sha256 hex, and dim exact (chunk / 2^32) double features, flattened to
    scalar feat_i columns to stay canonicalizable by the driver."""
    feat = ", ".join(
        f"CAST('0x' || substring(sha, {8 * i + 1}, 8) AS BIGINT) / 4294967296.0"
        f" AS feat_{i}"
        for i in range(dim))
    return f"""
WITH m AS (SELECT doc_id AS media_id,
             ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
             text
           FROM documents WHERE doc_id < {limit}),
h AS (SELECT media_id, kind, octet_length(encode(text)) AS n_bytes,
        sha256(text) AS sha
      FROM m)
SELECT media_id, kind, CAST(n_bytes AS BIGINT) AS n_bytes, sha AS sha256,
       {feat}
FROM h"""


def _similarity_sql(k: int = 5, nq: int = 8) -> str:
    return f"""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
           FROM embeddings WHERE vec_id < {nq}),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cvec FROM embeddings),
s AS (SELECT query_id, vec_id,
        round(list_dot_product(qvec, cvec)
              / (sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(cvec, cvec))), 6) AS score
      FROM q CROSS JOIN c WHERE query_id != vec_id),
r AS (SELECT query_id, vec_id, score,
        row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
      FROM s)
SELECT query_id, vec_id, score, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= {k}"""


def _corpus_clean_sql() -> str:
    stop_lst = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"
    hits = []
    for lang, words in _LANG_SETS.items():
        lst = "[" + ", ".join(f"'{w}'" for w in words) + "]"
        hits.append(f"len(list_filter(toks, x -> list_contains({lst}, x))) AS s_{lang}")
    best = "greatest(s_en, s_de, s_fr, s_es)"
    lang_case = (f"CASE WHEN {best} = 0 THEN 'unk' "
                 f"WHEN s_en = {best} THEN 'en' WHEN s_de = {best} THEN 'de' "
                 f"WHEN s_fr = {best} THEN 'fr' ELSE 'es' END")
    return f"""
WITH t AS (
  SELECT doc_id, text,
         CASE WHEN length(trim(text)) = 0 THEN [] ELSE {_TOKS} END AS toks,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS n_punct,
         {_FPR} AS fp
  FROM documents),
s AS (
  SELECT doc_id, fp, n_chars, n_punct, len(toks) AS n_tokens,
         len(list_filter(toks, x -> list_contains({stop_lst}, x))) AS n_stop,
         {', '.join(hits)}
  FROM t),
scored AS (
  SELECT doc_id, fp, CAST(n_tokens AS BIGINT) AS n_tokens,
         round((CASE WHEN n_tokens >= 5 AND n_chars >= 20 THEN 0.4 ELSE 0.0 END)
             + (CASE WHEN n_tokens > 0 AND round(n_stop / CAST(n_tokens AS DOUBLE), 6) >= 0.05 THEN 0.3 ELSE 0.0 END)
             + (CASE WHEN n_chars IS NULL OR n_chars = 0
                       OR round(n_punct / CAST(n_chars AS DOUBLE), 6) <= 0.1
                     THEN 0.3 ELSE 0.0 END), 1) AS quality,
         {lang_case} AS lang_pred
  FROM s)
SELECT min(doc_id) AS doc_id, max(n_tokens) AS n_tokens, count(*) AS n_copies
FROM scored WHERE quality >= 0.7 AND lang_pred = 'en'
GROUP BY fp"""


def oracle_sql() -> dict[str, str]:
    sql = {
        # native UBIGINT replay of the uint64 bit-pattern engine: same
        # 2^63-straddling synthesis, unsigned boundary filter, min/max in
        # unsigned order, sum wrapped mod 2^64 (DuckDB sums UBIGINT into
        # HUGEINT — the modulo reproduces the reference's uint64
        # accumulator wrap); exact decimal strings on both sides
        # mixed signed/unsigned comparison replay: DuckDB promotes
        # UBIGINT-vs-BIGINT compares to exact hugeint math — the native
        # reference for the engine's sign-guarded long formulas; the
        # doubled column wraps mod 2^64 on both sides
        "compact_roundtrip": """
            SELECT event_id, value FROM events WHERE event_id < 10000
        """,
        "staged_finalize": """
            SELECT CAST(ts AS TIMESTAMP) AS ts, event_id, value
            FROM events WHERE event_id < 8000
        """,
        "snapshot_asof": """
            SELECT event_id, value FROM events WHERE event_id < 6000
        """,
        "stats_prune_filter": """
            -- same data-relative top-quarter cut as the Spark side
            -- (event_id is dense 0..n-1, so 3*count//4 = the cut value)
            SELECT event_id, value FROM events
            WHERE event_id < 8000
              AND event_id >= (SELECT (3 * COUNT(*)) // 4
                               FROM events WHERE event_id < 8000)
        """,
        "dynamic_backfill": """
WITH base AS (
  SELECT user_id % 5 AS grp,
         event_id % 97 AS qty,
         -- 'bonus' added on the 2nd append: int cells missing in earlier
         -- segments backfill 0 (reference sparse_utils rule)
         CASE WHEN event_id % 3 >= 1 THEN event_id % 11 ELSE 0 END AS bonus,
         -- 'score' added on the 3rd append: float cells missing in earlier
         -- segments are NaN and sum skips them (all-NaN would sum to 0)
         CASE WHEN event_id % 3 = 2 THEN (event_id % 7) * 0.5
              ELSE NULL END AS score
  FROM events WHERE event_id < 10000)
SELECT grp,
       CAST(SUM(qty) AS BIGINT) AS sum_qty,
       CAST(SUM(bonus) AS BIGINT) AS sum_bonus,
       COALESCE(SUM(score), 0.0) AS sum_score,
       COUNT(qty) AS n
FROM base GROUP BY grp
        """,
        "uint64_mixed_compare": """
WITH e AS (
  SELECT event_type,
         CAST(9223372036854773308 AS UBIGINT)
           + CAST(event_id AS UBIGINT) * 2 AS u,
         CAST(user_id AS BIGINT)
           - CASE WHEN event_id % 3 = 0 THEN 1000000 ELSE 0 END AS s,
         60 + event_id % 4 AS pe
  FROM events WHERE event_id < 25000),
f AS (SELECT *, CAST(CAST(u AS HUGEINT) * 2 % 18446744073709551616
                     AS UBIGINT) AS w,
                -- uint ** uint stays uint64 (exact: powers of two)
                CAST(power(2, pe) AS UBIGINT) AS p
      FROM e
      WHERE CAST(u AS HUGEINT) > CAST(s AS HUGEINT)
        AND u <= CAST(9223372036854775808 AS UBIGINT) + 40000)
SELECT event_type, CAST(count(u) AS BIGINT) AS n,
       CAST(min(w) AS VARCHAR) AS wmin,
       CAST(max(w) AS VARCHAR) AS wmax,
       CAST(max(p) AS VARCHAR) AS pmax
FROM f GROUP BY event_type
""",
        "uint64_filter_agg": """
WITH e AS (
  SELECT event_type,
         CAST(9223372036854770808 AS UBIGINT) + CAST(event_id AS UBIGINT) AS u
  FROM events WHERE event_id < 25000)
SELECT event_type,
       CAST(min(u) AS VARCHAR) AS umin,
       CAST(max(u) AS VARCHAR) AS umax,
       CAST(CAST(sum(u) AS HUGEINT) % 18446744073709551616 AS VARCHAR) AS usum,
       CAST(count(u) AS BIGINT) AS n
FROM e
WHERE u >= CAST(9223372036854775808 AS UBIGINT)
GROUP BY event_type
""",
        # exact int64-ns replay of the library's ns-physical index: same
        # jitter synthesis, same sub-µs date_range bounds, aggregates on
        # raw ns epochs (SUM cast back to BIGINT — DuckDB sums to HUGEINT)
        "ns_precision": """
WITH src AS (
  SELECT epoch_us(ts) * 1000 + event_id % 1000 AS ts_ns, event_type
  FROM events)
SELECT event_type,
       COUNT(*) AS n,
       MIN(ts_ns) AS min_ns,
       MAX(ts_ns) AS max_ns,
       CAST(SUM(ts_ns % 1000) AS BIGINT) AS sum_subus
FROM src
WHERE ts_ns BETWEEN epoch_us(TIMESTAMP '2024-01-03') * 1000 + 500
                AND epoch_us(TIMESTAMP '2024-01-20') * 1000 + 500
GROUP BY event_type""",

        # Lehmer bucket: two rounds of (x*48271) % M over doc_id+1000003,
        # M = 2^31-1 — the exact
        # integer math of extensions/sampling.py, replayed verbatim
        "range_join": """
SELECT e.user_id, COUNT(*) AS n_matches,
       COUNT(DISTINCT o.o_orderkey) AS n_orders
FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id FROM events) e
JOIN orders o
  ON o.o_custkey = e.user_id
 AND e.ts >= o.o_orderdate
 AND e.ts <= o.o_orderdate + INTERVAL 7 DAY
GROUP BY e.user_id""",

        "skew_salted_agg": """
SELECT event_type,
       ROUND(SUM(value), 4) AS total,
       COUNT(value) AS n,
       ROUND(MIN(value), 4) AS lo,
       ROUND(MAX(value), 4) AS hi,
       ROUND(AVG(value), 4) AS avg
FROM events GROUP BY event_type""",

        # salting is plan-shape only: the salted join's output IS the plain
        # join, so the oracle is the unsalted equivalent
        "salted_join": """
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100
         AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment""",

        "pii_redact": """
WITH planted AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
                 ELSE '' END AS text
  FROM documents)
SELECT doc_id,
       regexp_replace(
         regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
             '<EMAIL>', 'g'),
         '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}',
         '<IPV4>', 'g') AS redacted
FROM planted
WHERE doc_id % 7 = 0 OR doc_id % 11 = 0""",

        "simhash_dedup": _simhash_dedup_sql(),

        "categorical_roundtrip": """
SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT lang) AS n_langs
FROM documents GROUP BY source""",

        "dict_groupby": """
SELECT source, lang, COUNT(doc_id) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY source, lang""",

        "dedup_keep_best": """
WITH t AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
         CASE WHEN length(trim(text)) = 0 THEN []
              ELSE list_transform(string_split_regex(trim(text), '\\s+'), x -> lower(x)) END AS toks,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS n_punct
  FROM documents),
s AS (
  SELECT doc_id, fingerprint, n_chars, n_punct, len(toks) AS n_tokens,
         len(list_filter(toks, x -> list_contains(['the', 'and', 'of', 'to', 'in', 'is', 'that', 'for', 'with', 'a', 'an', 'it', 'on', 'as', 'at', 'by'], x))) AS n_stop
  FROM t),
q AS (
  SELECT doc_id, fingerprint, CAST(n_chars AS BIGINT) AS n_chars,
         round((CASE WHEN n_tokens >= 5 AND n_chars >= 20 THEN 0.4 ELSE 0.0 END)
             + (CASE WHEN n_tokens > 0 AND round(n_stop / CAST(n_tokens AS DOUBLE), 6) >= 0.05 THEN 0.3 ELSE 0.0 END)
             + (CASE WHEN n_chars IS NULL OR n_chars = 0
                       OR round(n_punct / CAST(n_chars AS DOUBLE), 6) <= 0.1
                     THEN 0.3 ELSE 0.0 END), 1) AS quality
  FROM s)
SELECT fingerprint, doc_id, quality, n_chars, dup_count
FROM (SELECT fingerprint, doc_id, quality, n_chars,
             count(*) OVER (PARTITION BY fingerprint) AS dup_count,
             row_number() OVER (PARTITION BY fingerprint
                                ORDER BY quality DESC, n_chars DESC, doc_id ASC) AS rn
      FROM q)
WHERE rn = 1""",

        "incremental_dedup": """
WITH fp AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
  FROM documents)
SELECT doc_id, fingerprint
FROM fp n
WHERE doc_id % 2 = 1
  AND NOT EXISTS (SELECT 1 FROM fp s
                  WHERE s.doc_id % 2 = 0 AND s.fingerprint = n.fingerprint)""",

        "segment_dedup": """
WITH l AS (
  SELECT doc_id, trim(text) AS t,
         string_split_regex(trim(text), '\\s+') AS toks
  FROM documents),
seg AS (
  SELECT doc_id, i AS pos,
         array_to_string(toks[(i*8+1):(i*8+8)], ' ') AS seg
  FROM l, unnest(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT))) AS u(i)
  WHERE length(t) > 0),
dup AS (
  SELECT seg FROM seg GROUP BY seg HAVING count(DISTINCT doc_id) >= 2),
kept AS (
  SELECT s.doc_id, s.pos, s.seg, (d.seg IS NOT NULL) AS is_dup
  FROM seg s LEFT JOIN dup d USING (seg))
SELECT l.doc_id,
       CAST(count(k.pos) AS BIGINT) AS n_segments,
       CAST(coalesce(sum(CASE WHEN k.is_dup THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_removed,
       coalesce(string_agg(CASE WHEN NOT k.is_dup THEN k.seg END,
                           ' ' ORDER BY k.pos), '') AS text
FROM l LEFT JOIN kept k USING (doc_id)
GROUP BY l.doc_id""",

        "heavy_hitters": """
WITH t AS (
  SELECT lower(unnest(string_split_regex(trim(text), '\\s+'))) AS tok
  FROM documents WHERE length(trim(text)) > 0)
SELECT tok, CAST(count(*) AS BIGINT) AS n
FROM t GROUP BY tok ORDER BY n DESC, tok LIMIT 40""",

        "bigram_logprob": """
WITH l AS (
  SELECT doc_id,
         list_transform(string_split_regex(trim(text), '\\s+'),
                        x -> lower(x)) AS toks
  FROM documents WHERE length(trim(text)) > 0),
bg AS (
  SELECT doc_id, toks[i] AS a, toks[i+1] AS b
  FROM l, unnest(range(1, len(toks))) AS u(i)
  WHERE len(toks) >= 2),
c AS (SELECT a, b, count(*) AS nab FROM bg GROUP BY a, b),
p AS (SELECT a, sum(nab) AS na FROM c GROUP BY a)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(ln(nab / na)), 6) AS logprob
FROM bg JOIN c USING (a, b) JOIN p USING (a)
GROUP BY doc_id""",

        "unigram_logprob": """
WITH t AS (
  SELECT doc_id, lower(unnest(string_split_regex(trim(text), '\\s+'))) AS tok
  FROM documents WHERE length(trim(text)) > 0),
c AS (SELECT tok, count(*) AS n FROM t GROUP BY tok),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM c)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(ln(n / total)), 6) AS logprob
FROM t JOIN c USING (tok) CROSS JOIN tot
GROUP BY doc_id""",

        "media_frame_sample": """
WITH media AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                         ELSE 'video' END AS kind,
         octet_length(encode(text)) AS n_bytes,
         CASE WHEN doc_id % 3 <> 0 THEN n_chars END AS duration_ms
  FROM documents WHERE doc_id < 256),
fr AS (
  SELECT media_id, kind, n_bytes, u.frame_idx
  FROM (SELECT *, GREATEST(1, CAST(FLOOR(duration_ms / 100.0) AS BIGINT)) AS n_frames
        FROM media
        WHERE kind IN ('audio', 'video') AND n_bytes > 0)
  CROSS JOIN unnest(range(0, n_frames)) AS u(frame_idx)),
calc AS (
  SELECT media_id, kind,
         (frame_idx * 32) % n_bytes + 1 AS byte_offset,
         LEAST(32, n_bytes - ((frame_idx * 32) % n_bytes)) AS frame_len
  FROM fr)
SELECT kind, COUNT(DISTINCT media_id) AS n_media, COUNT(*) AS n_frames,
       CAST(MIN(byte_offset) AS BIGINT) AS min_off,
       CAST(MAX(byte_offset) AS BIGINT) AS max_off,
       CAST(SUM(frame_len) AS BIGINT) AS sum_frame_bytes
FROM calc GROUP BY kind""",

        "decontaminate": """
WITH toks AS (
  SELECT doc_id, lang, source,
         list_transform(string_split_regex(trim(text), '\\s+'), x -> lower(x)) AS toks
  FROM documents WHERE length(trim(text)) > 0),
g AS (SELECT doc_id, lang, source, array_to_string(toks[i:i+7], ' ') AS gram
      FROM toks CROSS JOIN unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS u(i)),
bench AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
train_docs AS (SELECT doc_id, lang FROM documents WHERE source <> 'src0'),
hits AS (SELECT g.doc_id,
                COUNT(*) AS n_grams,
                COUNT(*) FILTER (WHERE bench.gram IS NOT NULL) AS n_contaminated
         FROM g LEFT JOIN bench USING (gram)
         WHERE g.source <> 'src0' GROUP BY g.doc_id)
SELECT t.lang, COUNT(*) AS n_docs,
       COUNT(*) FILTER (WHERE COALESCE(h.n_contaminated, 0) > 0)
         AS n_contaminated_docs,
       CAST(SUM(COALESCE(h.n_contaminated, 0)) AS BIGINT) AS n_hit_grams
FROM train_docs t LEFT JOIN hits h USING (doc_id)
GROUP BY t.lang""",

        "pack_chunks": """
WITH base AS (
  SELECT doc_id, source,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
  FROM documents),
ps AS (SELECT doc_id, source, n_tokens,
              SUM(n_tokens) OVER (ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum
       FROM base),
spans AS (SELECT source, n_tokens,
                 CAST(FLOOR((cum - n_tokens) / 512.0) AS BIGINT) AS first_chunk,
                 CAST(FLOOR((CASE WHEN n_tokens > 0 THEN cum - 1
                                  ELSE cum - n_tokens END) / 512.0) AS BIGINT)
                   AS last_chunk
          FROM ps)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       COUNT(*) FILTER (WHERE first_chunk <> last_chunk) AS n_split_docs,
       MIN(first_chunk) AS min_chunk, MAX(last_chunk) AS max_chunk
FROM spans GROUP BY source""",

        "pii_scan": """
WITH planted AS (
  SELECT source,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
                 ELSE '' END AS text
  FROM documents),
scanned AS (
  SELECT source,
         len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS email_count,
         len(regexp_extract_all(text,
             '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) AS ipv4_count
  FROM planted)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(email_count) AS BIGINT) AS n_emails,
       CAST(SUM(ipv4_count) AS BIGINT) AS n_ipv4,
       COUNT(*) FILTER (WHERE email_count > 0 OR ipv4_count > 0)
         AS n_docs_with_pii
FROM scanned GROUP BY source""",

        "dup_ngram_fraction": """
WITH t AS (
  SELECT doc_id, lang,
         list_transform(string_split_regex(trim(text), '\\s+'), x -> lower(x)) AS toks
  FROM documents WHERE length(trim(text)) > 0),
g AS (SELECT doc_id, lang, array_to_string(toks[i:i+7], ' ') AS gram
      FROM t CROSS JOIN unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS u(i)),
gc AS (SELECT gram, COUNT(DISTINCT doc_id) AS n_docs_with FROM g GROUP BY gram),
per AS (SELECT g.doc_id, g.lang, COUNT(*) AS n_grams,
               COUNT(*) FILTER (WHERE gc.n_docs_with > 1) AS n_dup
        FROM g JOIN gc USING (gram) GROUP BY 1, 2),
f AS (SELECT lang, ROUND(n_dup / CAST(n_grams AS DOUBLE), 6) AS frac FROM per)
SELECT lang, COUNT(*) AS n_docs,
       COUNT(*) FILTER (WHERE frac > 0.3) AS n_flagged,
       ROUND(AVG(frac), 4) AS avg_dup_frac
FROM f GROUP BY lang""",

        # exact replay of kmeans(k=8, iters=2): same init, same 6dp distance
        # rounding, same 9dp centroid rounding, same lowest-cid tie-break
        "embedding_kmeans": """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c0 AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
       FROM embeddings
       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
d1 AS (SELECT e.vec_id, c0.cid, round(list_distance(e.v, c0.cv), 6) AS dist
       FROM e CROSS JOIN c0),
a1 AS (SELECT vec_id, cid AS cluster FROM
         (SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
          FROM d1) WHERE rn = 1),
m1 AS (SELECT a1.cluster, generate_subscripts(e.v, 1) AS pos, unnest(e.v) AS val
       FROM a1 JOIN e USING (vec_id)),
c1 AS (SELECT cluster AS cid, list(cval ORDER BY pos) AS cv
       FROM (SELECT cluster, pos, ROUND(AVG(val), 9) AS cval
             FROM m1 GROUP BY cluster, pos)
       GROUP BY cluster),
d2 AS (SELECT e.vec_id, c1.cid, round(list_distance(e.v, c1.cv), 6) AS dist
       FROM e CROSS JOIN c1),
a2 AS (SELECT vec_id, cid AS cluster, dist FROM
         (SELECT vec_id, cid, dist,
                 row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
          FROM d2) WHERE rn = 1)
SELECT cluster, COUNT(*) AS n_members, ROUND(AVG(dist), 4) AS avg_dist
FROM a2 GROUP BY cluster""",

        "quality_repetition": """
WITH t AS (
  SELECT doc_id, lang, lower(unnest(string_split_regex(trim(text), '\\s+'))) AS tok
  FROM documents WHERE length(trim(text)) > 0),
c AS (SELECT doc_id, lang, tok, COUNT(*) AS c FROM t GROUP BY 1, 2, 3),
p AS (SELECT doc_id, lang, SUM(c) AS n_tokens, COUNT(*) AS n_distinct,
             MAX(c) AS top_count
      FROM c GROUP BY 1, 2),
f AS (SELECT lang,
             ROUND(1 - n_distinct / CAST(n_tokens AS DOUBLE), 6) AS dup_frac,
             ROUND(top_count / CAST(n_tokens AS DOUBLE), 6) AS top_frac
      FROM p)
SELECT lang, COUNT(*) AS n_docs,
       COUNT(*) FILTER (WHERE dup_frac > 0.2) AS n_flagged,
       ROUND(AVG(dup_frac), 4) AS avg_dup_frac,
       ROUND(AVG(top_frac), 4) AS avg_top_frac
FROM f GROUP BY lang""",

        "embedding_centroids": """
WITH cts AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
             FROM embeddings
             ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
s AS (SELECT e.vec_id, cid,
        round(list_dot_product(CAST(e.embedding AS DOUBLE[]), cv)
              / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                       CAST(e.embedding AS DOUBLE[])))
                 * sqrt(list_dot_product(cv, cv))), 6) AS cos
      FROM embeddings e CROSS JOIN cts),
b AS (SELECT vec_id, cid, cos,
        row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
      FROM s)
SELECT cid AS centroid_id, COUNT(*) AS n_members, ROUND(AVG(cos), 4) AS avg_cos
FROM b WHERE rn = 1 GROUP BY cid""",

        # streaming ops on a bounded one-batch stream equal their batch
        # forms, so even the Structured Streaming operators get FULL value
        # oracles (window agg == date_trunc; stateful sessionize == gap
        # sessions minus each user's still-open final session)
        "stream_resample": """
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
       COUNT(value) AS n, ROUND(SUM(value), 4) AS s
FROM events GROUP BY 1""",

        "stream_sessionize": """
WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
           WHERE user_id < 40),
o AS (SELECT user_id, ts,
        CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
             THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (SELECT user_id, ts,
        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sid
      FROM o),
g AS (SELECT user_id, sid, MIN(ts) AS session_start, MAX(ts) AS session_end,
        COUNT(*) AS n_events
      FROM s GROUP BY user_id, sid),
closed AS (SELECT * FROM g
           WHERE sid < (SELECT MAX(sid) FROM g g2
                        WHERE g2.user_id = g.user_id))
SELECT user_id, COUNT(*) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       MIN(session_start) AS first_start, MAX(session_end) AS last_end
FROM closed GROUP BY user_id""",

        "shuffle_shards": """
WITH b AS (
  SELECT n_chars,
         ((((doc_id + 1000003) % 2147483647) * 48271 % 2147483647)
          * 48271) % 2147483647 AS bucket
  FROM documents)
SELECT CAST(bucket % 8 AS INTEGER) AS shard,
       COUNT(*) AS n_docs,
       MIN(bucket) AS min_key, MAX(bucket) AS max_key,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM b GROUP BY 1""",

        "sample_split": """
WITH b AS (
  SELECT n_chars,
         ((((doc_id + 1000003) % 2147483647) * 48271 % 2147483647)
          * 48271) % 2147483647 AS bucket
  FROM documents)
SELECT CASE WHEN bucket < CAST(FLOOR(0.8 * 2147483647) AS BIGINT) THEN 'train'
            WHEN bucket < CAST(FLOOR(0.9 * 2147483647) AS BIGINT) THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM b GROUP BY 1""",

        "sample_stratified": """
WITH b AS (
  SELECT lang,
         ((((doc_id + 1000003) % 2147483647) * 48271 % 2147483647)
          * 48271) % 2147483647 AS bucket
  FROM documents)
SELECT lang, COUNT(*) AS n_kept
FROM b
WHERE bucket < CASE WHEN lang = 'en'
                    THEN CAST(FLOOR(0.2 * 2147483647) AS BIGINT)
                    ELSE 2147483647 END
GROUP BY lang""",

        "filter_numeric": """
SELECT * FROM lineitem
WHERE l_quantity > 30 AND l_discount <= 0.05 AND l_shipdate < TIMESTAMP '1998-01-01'""",

        "filter_isin_regex": """
SELECT * FROM part
WHERE p_type IN ('ECONOMY', 'PROMO') AND regexp_matches(p_name, 'red|blue')
  AND p_size >= 10""",

        "filter_ternary": """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
       CASE WHEN l_extendedprice > 30000.0 THEN 'high' ELSE 'low' END AS band
FROM lineitem
WHERE CASE WHEN l_returnflag = 'R' THEN l_quantity > 45 ELSE l_quantity < 5 END""",

        "project_arith": """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
       l_quantity / CAST(7 AS DOUBLE) AS qty_ratio,
       -l_tax AS neg_tax,
       abs(l_discount - 0.05) AS abs_balance
FROM lineitem""",

        "groupby_single": """
SELECT l_returnflag,
       round(sum(l_quantity), 4) AS sum_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       min(l_discount) AS min_disc,
       max(l_tax) AS max_tax,
       count(l_orderkey) AS n
FROM lineitem WHERE l_returnflag IS NOT NULL
GROUP BY l_returnflag""",

        "groupby_first_last": f"""
SELECT event_type,
       arg_min(value, {_EV}) AS first_value,
       arg_max(value, {_EV}) AS last_value,
       count(value) AS n
FROM events WHERE event_type IS NOT NULL
GROUP BY event_type""",

        "groupby_tpch_q1": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(l_orderkey) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
  AND l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
GROUP BY l_returnflag, l_linestatus""",

        "groupby_ts_minmax": """
SELECT l_returnflag, min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship,
       count(l_shipdate) AS n
FROM lineitem WHERE l_returnflag IS NOT NULL GROUP BY l_returnflag""",

        "resample_weekly": """
SELECT make_timestamp((epoch_us(l_shipdate) // 604800000000) * 604800000000) AS l_shipdate,
       count(l_quantity) AS n,
       round(sum(l_quantity), 4) AS qty
FROM lineitem GROUP BY 1""",

        "concat_three": f"""
SELECT {_EV} AS ts, event_id, value,
       CAST(0 AS BIGINT) AS user_id, CAST(NULL AS VARCHAR) AS event_type
FROM events WHERE event_id % 3 = 0
UNION ALL
SELECT {_EV} AS ts, event_id, CAST(NULL AS DOUBLE), user_id, CAST(NULL AS VARCHAR)
FROM events WHERE event_id % 3 = 1
UNION ALL
SELECT {_EV} AS ts, event_id, value, CAST(0 AS BIGINT), event_type
FROM events WHERE event_id % 3 = 2""",

        "resample_1h": f"""
SELECT make_timestamp((epoch_us({_EV}) // 3600000000) * 3600000000) AS ts,
       count(value) AS n,
       round(sum(value), 4) AS v_sum,
       min(value) AS v_min,
       max(value) AS v_max
FROM events GROUP BY 1""",

        "resample_ohlc": f"""
SELECT make_timestamp((epoch_us({_EV}) // 86400000000) * 86400000000) AS ts,
       arg_min(value, {_EV}) AS open,
       max(value) AS high,
       min(value) AS low,
       arg_max(value, {_EV}) AS close,
       count(value) AS n
FROM events GROUP BY 1""",

        "resample_closed_right": f"""
SELECT make_timestamp((((epoch_us({_EV}) * 1000 - 1) // 21600000000000) * 21600000000 + 21600000000)) AS ts,
       count(value) AS n,
       round(sum(value), 4) AS v_sum
FROM events GROUP BY 1""",

        "resample_offset": f"""
SELECT make_timestamp(((epoch_us({_EV}) - 21600000000) // 86400000000) * 86400000000 + 21600000000) AS ts,
       count(value) AS n,
       round(sum(value), 4) AS v_sum
FROM events GROUP BY 1""",

        "project_then_groupby": """
SELECT l_linestatus,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100 AS revenue,
       count(*) AS n
FROM lineitem GROUP BY l_linestatus""",

        "pipeline_filter_head": f"""
SELECT event_id, {_EV} AS ts, user_id, event_type, value, props
FROM events WHERE event_type = 'purchase'
ORDER BY {_EV}, event_id LIMIT 50""",

        "resample_std_median": f"""
SELECT make_timestamp((epoch_us({_EV}) // 86400000000) * 86400000000) AS ts,
       round(stddev_samp(value), 4) AS sd,
       round(var_samp(value), 4) AS vr,
       round(median(value), 4) AS med,
       count(value) AS n
FROM events GROUP BY 1""",

        "corpus_clean": _corpus_clean_sql(),

        "date_range": f"""
SELECT event_id, {_EV} AS ts, user_id, event_type, value, props
FROM events
WHERE {_EV} BETWEEN TIMESTAMP '2024-01-05' AND TIMESTAMP '2024-01-10 12:00:00'""",

        "head": f"""
SELECT event_id, {_EV} AS ts, user_id, event_type, value, props
FROM events ORDER BY {_EV}, event_id LIMIT 25""",

        "tail": f"""
SELECT event_id, {_EV} AS ts, user_id, event_type, value, props
FROM events ORDER BY {_EV} DESC, event_id DESC LIMIT 25""",

        "row_range": f"""
SELECT event_id, {_EV} AS ts, user_id, event_type, value, props
FROM events ORDER BY {_EV}, event_id LIMIT 80 OFFSET 100""",

        "concat_outer": f"""
SELECT {_EV} AS ts, event_id, value, CAST(0 AS BIGINT) AS user_id
FROM events WHERE event_id % 2 = 0
UNION ALL
SELECT {_EV} AS ts, event_id, CAST(NULL AS DOUBLE) AS value, user_id
FROM events WHERE event_id % 2 = 1""",

        "concat_inner": f"""
SELECT {_EV} AS ts, event_id FROM events WHERE event_id % 2 = 0
UNION ALL
SELECT {_EV} AS ts, event_id FROM events WHERE event_id % 2 = 1""",

        "merge_update_upsert": """
WITH t AS (SELECT * FROM orders WHERE o_orderkey % 10 < 8),
s AS (SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 10 >= 5)
SELECT coalesce(t.o_orderkey, s.o_orderkey) AS o_orderkey,
       CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey ELSE t.o_custkey END AS o_custkey,
       CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
       CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
       CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderdate ELSE t.o_orderdate END AS o_orderdate,
       CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderpriority ELSE t.o_orderpriority END AS o_orderpriority
FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey""",

        "update_range_surgery": f"""
SELECT event_id, {_EV} AS ts, user_id, event_type, value, props FROM events
WHERE NOT ({_EV} BETWEEN TIMESTAMP '2024-01-10' AND TIMESTAMP '2024-01-15')
UNION ALL
SELECT event_id, {_EV} AS ts, user_id, event_type, value * 0.5 AS value, props FROM events
WHERE {_EV} BETWEEN TIMESTAMP '2024-01-10' AND TIMESTAMP '2024-01-15'""",

        "join_revenue": """
SELECT o_orderkey, o_orderdate,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100 AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15'
GROUP BY o_orderkey, o_orderdate""",

        "anti_join": """
SELECT c_custkey, c_name, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",

        "semi_join_date_arith": """
SELECT o_orderpriority, count(*) AS n_late_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority""",

        "except_users": """
SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
EXCEPT
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'""",

        "topk_per_group": """
SELECT o_orderpriority, o_orderkey, o_totalprice, rank FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders) WHERE rank <= 3""",

        "window_lag_lead": f"""
SELECT event_id, user_id,
       lag(value) OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       CAST(row_number() OVER w AS BIGINT) AS seq
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY {_EV}, event_id)""",

        "cumulative_sum": f"""
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY {_EV}, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
       AS running_value
FROM events""",

        "distinct_agg": """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY event_type""",

        "pivot": """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS DOUBLE) / 100 AS open_total,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS DOUBLE) / 100 AS finished_total,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS DOUBLE) / 100 AS pending_total
FROM orders GROUP BY o_orderpriority""",

        "percentiles": """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
       round(quantile_cont(l_quantity, 0.25), 4) AS q25_qty
FROM lineitem GROUP BY l_returnflag""",

        "set_ops": """
SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'""",

        "rollup": """
SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",

        "unpivot": """
WITH s AS (SELECT * FROM lineitem WHERE l_orderkey % 50 = 0)
SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS value FROM s
UNION ALL
SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM s
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM s""",

        "ngram_top": f"""
WITH t AS (SELECT CASE WHEN length(trim(text)) = 0 THEN [] ELSE {_TOKS} END AS toks
           FROM documents),
b AS (SELECT unnest([toks[i] || ' ' || toks[i+1] FOR i IN generate_series(1, len(toks) - 1)]) AS bigram
      FROM t WHERE len(toks) >= 2),
c AS (SELECT bigram, count(*) AS n FROM b GROUP BY bigram)
SELECT bigram, n, CAST(row_number() OVER (ORDER BY n DESC, bigram) AS BIGINT) AS rank
FROM c QUALIFY rank <= 25""",

        "token_frequencies": f"""
WITH t AS (SELECT CASE WHEN length(trim(text)) = 0 THEN [] ELSE {_TOKS} END AS toks
           FROM documents),
x AS (SELECT unnest(toks) AS token FROM t),
c AS (SELECT token, count(*) AS n FROM x GROUP BY token)
SELECT token, n, CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS rank
FROM c QUALIFY rank <= 30""",

        "embedding_label_stats": """
SELECT label, count(*) AS n,
       round(avg(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[])))), 4) AS mean_norm,
       round(avg(CAST(embedding[1] AS DOUBLE)), 4) AS mean_c0
FROM embeddings GROUP BY label""",

        "sessionize": f"""
WITH x AS (
  SELECT user_id, epoch_us({_EV}) AS us,
         lag(epoch_us({_EV})) OVER (PARTITION BY user_id ORDER BY epoch_us({_EV})) AS prev
  FROM events),
y AS (SELECT user_id,
        CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS new_sess
      FROM x)
SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM y GROUP BY user_id""",

        "asof_join": f"""
SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice
FROM (SELECT event_id, user_id, {_EV} AS ts FROM events) e
ASOF LEFT JOIN (SELECT o_custkey, o_orderdate,
                       max(o_orderkey) AS o_orderkey,
                       arg_max(o_totalprice, o_orderkey) AS o_totalprice
                FROM orders GROUP BY 1, 2) o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""",

        "rolling_mean": f"""
SELECT event_id, user_id,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY {_EV}
                              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS rolling_mean
FROM events""",

        "dedup_exact": f"""
SELECT {_FPR} AS fingerprint, min(doc_id) AS doc_id, count(*) AS dup_count
FROM documents GROUP BY 1""",

        "json_extract": """
WITH x AS (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
           FROM events)
SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k
FROM x WHERE k > 50 GROUP BY event_type""",

        "text_stats": _text_stats_sql(),
        "text_langid": _lang_sql(),
        "text_fingerprint": f"SELECT doc_id, {_FPR} AS fingerprint FROM documents",
        "dedup_minhash": _minhash_sql(),
        "dedup_cluster": _cluster_sql(),
        "dedup_jaccard": _jaccard_sql(),
        "dedup_embedding": """
WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
p AS (SELECT a.id AS id_a, b.id AS id_b,
        round(list_dot_product(a.vec, b.vec)
              / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec))), 6) AS cos
      FROM v a JOIN v b ON a.id < b.id)
SELECT id_a, id_b, cos FROM p WHERE cos >= 0.45""",
        "similarity_bruteforce": _similarity_sql(),
        "dedup_simhash": _simhash_sql(),

        # ANN invariants: the oracle pins the exact query-id set and asserts
        # recall_ok for every one of them — a recall regression (or a missing
        # query) fails rows/hash. The approximate top-k values themselves are
        # engine-specific by construction.
        "similarity_lsh": """
SELECT DISTINCT vec_id AS query_id, true AS recall_ok
FROM embeddings WHERE vec_id < 8""",
        "similarity_ivf": """
SELECT DISTINCT vec_id AS query_id, true AS recall_ok
FROM embeddings WHERE vec_id < 8""",

        # sketch invariant: exact columns computed exactly; sketch estimates
        # asserted inside their error bounds
        "approx_sketches": """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       count(*) AS n,
       true AS hll_ok,
       true AS p95_ok
FROM events GROUP BY event_type""",

        "multimodal_features": _multimodal_sql(),
    }
    return sql

"""Source-layout matrix: every parquet loader must read the same table
identically across the three layouts it will meet in production —

* ``single``      — one ``<table>.parquet`` file (the driver's sf0.001–0.1
                    testdata layout),
* ``directory``   — ``<table>.parquet/part-*.parquet`` (a Spark/distributed
                    writer's output; the sf1 ladder layout),
* ``partitioned`` — hive ``<table>.parquet/event_type=X/part-*.parquet``
                    (the at-scale layout; the partition column lives in the
                    directory names, not the files).

Generalizes the r12 sf1 find: a ``pathGlobFilter`` of ``events.parquet``
matches LEAF names, so the streaming source silently read ZERO part files
of a directory-layout table. This matrix pins every loader x layout cell
so the next layout bug fails a test instead of an sf1 oracle sweep.
"""

from __future__ import annotations

import os
import uuid

import pyarrow.parquet as pq
import pytest

SF = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

LAYOUTS = ["single", "directory", "partitioned"]


@pytest.fixture(scope="module")
def layout_dirs(tmp_path_factory):
    """One directory per layout, each holding the SAME events table."""
    tbl = pq.read_table(os.path.join(SF, "events.parquet"))
    dirs = {}
    for layout in LAYOUTS:
        d = tmp_path_factory.mktemp(f"layout_{layout}")
        dst = os.path.join(str(d), "events.parquet")
        if layout == "single":
            pq.write_table(tbl, dst)
        elif layout == "directory":
            os.makedirs(dst)
            step = -(-tbl.num_rows // 3)
            for i in range(3):
                pq.write_table(tbl.slice(i * step, step),
                               os.path.join(dst, f"part-{i:05d}.parquet"))
        else:
            pq.write_to_dataset(tbl, dst, partition_cols=["event_type"])
        dirs[layout] = str(d)
    return dirs


def _canon(df):
    """Layout-independent canonical form: column order varies (a hive
    partition column moves to the end), so sort columns by name and rows
    by value."""
    cols = sorted(df.columns)
    return [tuple(str(v) for v in row)
            for row in sorted(df.select(cols).collect())]


@pytest.fixture(scope="module")
def truth(spark):
    from arcticdb_spark.sources.tables import load_table
    return _canon(load_table(spark, SF, "events"))


@pytest.mark.parametrize("layout", LAYOUTS)
def test_load_table_layouts(spark, layout_dirs, truth, layout):
    from arcticdb_spark.sources.tables import load_table
    got = _canon(load_table(spark, layout_dirs[layout], "events"))
    assert got == truth


@pytest.mark.parametrize("layout", LAYOUTS)
def test_table_rows_layouts(layout_dirs, layout):
    from arcticdb_spark.sources.tables import table_rows
    assert table_rows(layout_dirs[layout], "events") == table_rows(SF, "events")


@pytest.mark.parametrize("layout", LAYOUTS)
def test_events_stream_layouts(spark, layout_dirs, truth, layout):
    """The streaming source (the r12 bug's loader) must surface every row
    of every layout — drained raw through a memory sink, no aggregation,
    so a partially-read source cannot hide behind a grouped result."""
    from arcticdb_spark.streaming.gate import _ckpt_dir, _events_stream
    sess = spark.newSession()
    sess.conf.set("spark.sql.shuffle.partitions", "2")
    name = "layout_" + uuid.uuid4().hex[:12]
    q = (_events_stream(sess, layout_dirs[layout])
         .writeStream.outputMode("append").format("memory").queryName(name)
         .option("checkpointLocation", _ckpt_dir())
         .trigger(availableNow=True).start())
    try:
        q.awaitTermination()
    finally:
        q.stop()
    got = _canon(sess.sql(f"SELECT * FROM {name}"))
    assert got == truth

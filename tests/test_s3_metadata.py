"""Catalog surface against the S3 object-store metadata backend (moto).

The reference's core deployment model is serverless object storage with
VERSION_REF conditional-write CAS (``cpp/arcticdb/storage/s3/s3_storage.cpp``,
``version/version_map.hpp``). Here metadata (manifests/refs/snapshots/config)
lives on a (mocked) S3 bucket through S3ObjectFileSystem while Spark's
parquet data files stay on a local data_root — the composition a mounted-
bucket or s3a:// deployment uses.
"""

import json

import numpy as np
import pandas as pd
import pytest

boto3 = pytest.importorskip("boto3")
moto = pytest.importorskip("moto")

from arcticdb_spark.sources.filesystem import S3ObjectFileSystem


@pytest.fixture()
def s3_client():
    with moto.mock_aws():
        c = boto3.client("s3", region_name="us-east-1")
        c.create_bucket(Bucket="arctic-test")
        yield c


@pytest.fixture()
def s3_lib(spark, tmp_path, s3_client):
    from arcticdb_spark.catalog import Arctic
    a = Arctic("s3://arctic-test/libs", spark, data_root=str(tmp_path),
               s3_client=s3_client)
    return a.create_library("s3lib")


def _frame(n=300):
    idx = pd.date_range("2024-01-01", periods=n, freq="1h", name="ts")
    return pd.DataFrame({"v": np.arange(n, dtype="int64")}, index=idx)


class TestS3FileSystem:
    def test_conditional_put_cas(self, s3_client):
        fs = S3ObjectFileSystem("arctic-test", client=s3_client, prefix="cas")
        assert fs.write_json_if_absent("a/b.json", {"x": 1}) is True
        assert fs.write_json_if_absent("a/b.json", {"x": 2}) is False
        assert fs.read_json("a/b.json") == {"x": 1}

    def test_listdir_and_isdir(self, s3_client):
        fs = S3ObjectFileSystem("arctic-test", client=s3_client, prefix="p")
        fs.write_json_atomic("d/one.json", 1)
        fs.write_json_atomic("d/sub/two.json", 2)
        assert fs.listdir("d") == ["one.json", "sub"]
        assert fs.isdir("d/sub")
        assert not fs.isdir("d/missing")
        fs.rmtree("d")
        assert not fs.isdir("d")

    def test_read_missing_raises(self, s3_client):
        fs = S3ObjectFileSystem("arctic-test", client=s3_client)
        with pytest.raises(FileNotFoundError):
            fs.read_json("nope.json")


class TestS3Catalog:
    def test_write_read_roundtrip(self, s3_lib):
        pdf = _frame()
        s3_lib.write("sym", pdf)
        out = s3_lib.read("sym", output_format="pandas")
        assert len(out) == len(pdf)
        assert list(out.sort_values("ts")["v"]) == list(pdf["v"])
        # metadata actually lives on the bucket, not the local data_root
        assert s3_lib._fs.exists(s3_lib._ref_gen_path("sym", s3_lib._load_ref_gen("sym")[0]))

    def test_versioning_and_as_of(self, s3_lib):
        s3_lib.write("sym", _frame(100))
        later = _frame(50)
        later.index = later.index + pd.Timedelta(days=30)
        s3_lib.append("sym", later)
        assert s3_lib.read("sym", as_of=0).count() == 100
        assert s3_lib.read("sym").count() == 150
        assert [v["version"] for v in s3_lib.list_versions("sym")] == [1, 0]

    def test_concurrent_version_commit_cas(self, s3_lib, spark, tmp_path,
                                           s3_client):
        from arcticdb_spark.catalog import Arctic, ArcticException
        s3_lib.write("sym", _frame(50))
        # a second writer handle racing on the same version number loses
        other = Arctic("s3://arctic-test/libs", spark,
                       data_root=str(tmp_path), s3_client=s3_client
                       ).get_library("s3lib", create_if_missing=True)
        m = s3_lib._load_manifest("sym", 0)
        m.version = 0  # force the same version number -> CAS must reject
        with pytest.raises(ArcticException, match="concurrent"):
            other._commit(m)

    def test_snapshots(self, s3_lib):
        s3_lib.write("a", _frame(10))
        s3_lib.write("b", _frame(20))
        s3_lib.snapshot("snap1")
        s3_lib.write("a", _frame(30))
        assert s3_lib.read("a", as_of="snap1").count() == 10
        assert "snap1" in s3_lib.list_snapshots()
        s3_lib.delete_snapshot("snap1")
        assert s3_lib.list_snapshots() == {}

    def test_update_and_delete_range(self, s3_lib):
        pdf = _frame(200)
        s3_lib.write("sym", pdf)
        cut = pdf.index[150]
        s3_lib.delete_data_in_range("sym", (cut, None))
        assert s3_lib.read("sym").count() == 150

    def test_list_symbols_and_delete(self, s3_lib):
        s3_lib.write("x", _frame(5))
        s3_lib.write("y", _frame(5))
        assert s3_lib.list_symbols() == ["x", "y"]
        assert s3_lib.has_symbol("x")
        s3_lib.delete("x")
        assert s3_lib.list_symbols() == ["y"]
        assert not s3_lib.has_symbol("x")

    def test_metadata_and_description(self, s3_lib):
        s3_lib.write("sym", _frame(10), metadata={"source": "test"})
        assert s3_lib.read_metadata("sym").metadata == {"source": "test"}
        d = s3_lib.get_description("sym")
        assert d["row_count"] == 10 and d["index_column"] == "ts"

    def test_prune_previous_versions(self, s3_lib):
        s3_lib.write("sym", _frame(10))
        s3_lib.write("sym", _frame(20))
        s3_lib.prune_previous_versions("sym")
        from arcticdb_spark.catalog import NoSuchVersionException
        with pytest.raises(NoSuchVersionException):
            s3_lib.read("sym", as_of=0)
        assert s3_lib.read("sym").count() == 20

    def test_column_stats_sidecar(self, s3_lib):
        s3_lib.write("sym", _frame(100))
        s3_lib.create_column_stats("sym", ["v"])
        stats = s3_lib.get_column_stats("sym")
        assert stats is not None and stats["columns"] == ["v"]
        s3_lib.drop_column_stats("sym")
        assert s3_lib.get_column_stats("sym") is None

    def test_query_builder_pushdown_still_works(self, s3_lib):
        from arcticdb_spark.query import QueryBuilder
        pdf = _frame(500)
        s3_lib.write("sym", pdf)
        q = QueryBuilder()
        q = q[q["v"] >= 400]
        out = s3_lib.read("sym", query_builder=q, output_format="pandas")
        assert sorted(out["v"]) == list(range(400, 500))

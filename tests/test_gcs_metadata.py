"""Catalog surface against the GCS metadata backend (fake bucket client).

The reference reaches Google Cloud Storage through its S3-compatible XML API
(same conditional-write machinery as ``cpp/arcticdb/storage/s3/
s3_storage.cpp``); here the metadata (manifests/refs/snapshots/config) lives
on a faked GCS bucket through GCSObjectFileSystem while Spark's parquet data
files stay on a local data_root. The fake implements the
``google.cloud.storage.Bucket`` surface the filesystem uses (the real SDK is
not in this container): ``upload_from_string(..., if_generation_match=0)``
raising PreconditionFailed reproduces the ``x-goog-if-generation-match: 0``
conditional-write CAS semantics bit-for-bit.
"""

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.sources.filesystem import GCSObjectFileSystem


class PreconditionFailed(Exception):
    code = 412


class NotFound(Exception):
    code = 404


class _FakeBlob:
    def __init__(self, bucket, name):
        self._bucket = bucket
        self.name = name

    def exists(self):
        return self.name in self._bucket.objects

    def upload_from_string(self, data, if_generation_match=None):
        if if_generation_match == 0 and self.name in self._bucket.objects:
            raise PreconditionFailed(self.name)
        self._bucket.objects[self.name] = (
            data if isinstance(data, bytes) else data.encode())

    def download_as_bytes(self):
        if self.name not in self._bucket.objects:
            raise NotFound(self.name)
        return self._bucket.objects[self.name]


class _BlobIterator:
    """Mimics the HTTPIterator: yields blobs; ``.prefixes`` fills with the
    delimiter-collapsed sub-prefixes as pages are consumed."""

    def __init__(self, bucket, prefix, delimiter, max_results):
        self._items = []
        self.prefixes = set()
        n = 0
        for name in sorted(bucket.objects):
            if not name.startswith(prefix):
                continue
            rest = name[len(prefix):]
            if delimiter and delimiter in rest:
                self.prefixes.add(prefix + rest.split(delimiter, 1)[0]
                                  + delimiter)
                continue
            self._items.append(_FakeBlob(bucket, name))
            n += 1
            if max_results is not None and n >= max_results:
                break

    def __iter__(self):
        return iter(self._items)


class FakeBucket:
    """In-memory google.cloud.storage.Bucket: flat name->bytes dict."""

    def __init__(self):
        self.objects: dict[str, bytes] = {}

    def blob(self, name):
        return _FakeBlob(self, name)

    def list_blobs(self, prefix="", delimiter=None, max_results=None):
        return _BlobIterator(self, prefix, delimiter, max_results)

    def delete_blob(self, name):
        if name not in self.objects:
            raise NotFound(name)
        del self.objects[name]


@pytest.fixture()
def gcs_client():
    return FakeBucket()


@pytest.fixture()
def gcs_lib(spark, tmp_path, gcs_client):
    from arcticdb_spark.catalog import Arctic
    a = Arctic("gs://arctic-test/libs", spark, data_root=str(tmp_path),
               gcs_client=gcs_client)
    return a.create_library("gcslib")


def _frame(n=300):
    idx = pd.date_range("2024-01-01", periods=n, freq="1h", name="ts")
    return pd.DataFrame({"v": np.arange(n, dtype="int64")}, index=idx)


class TestGCSFileSystem:
    def test_conditional_put_cas(self, gcs_client):
        fs = GCSObjectFileSystem(gcs_client, prefix="cas")
        assert fs.write_json_if_absent("a/b.json", {"x": 1}) is True
        assert fs.write_json_if_absent("a/b.json", {"x": 2}) is False
        assert fs.read_json("a/b.json") == {"x": 1}

    def test_atomic_overwrites(self, gcs_client):
        fs = GCSObjectFileSystem(gcs_client, prefix="w")
        fs.write_json_atomic("c.json", {"v": 1})
        fs.write_json_atomic("c.json", {"v": 2})
        assert fs.read_json("c.json") == {"v": 2}

    def test_listdir_and_isdir(self, gcs_client):
        fs = GCSObjectFileSystem(gcs_client, prefix="p")
        fs.write_json_atomic("d/one.json", 1)
        fs.write_json_atomic("d/sub/two.json", 2)
        assert fs.listdir("d") == ["one.json", "sub"]
        assert fs.isdir("d/sub")
        assert not fs.isdir("d/missing")
        assert fs.exists("d/one.json")
        assert not fs.exists("d/one")  # exact key, not prefix
        fs.rmtree("d")
        assert not fs.isdir("d")

    def test_read_missing_raises(self, gcs_client):
        fs = GCSObjectFileSystem(gcs_client)
        with pytest.raises(FileNotFoundError):
            fs.read_json("nope.json")


class TestGCSCatalog:
    def test_write_read_roundtrip(self, gcs_lib):
        pdf = _frame()
        gcs_lib.write("sym", pdf)
        out = gcs_lib.read("sym", output_format="pandas")
        assert len(out) == len(pdf)
        assert list(out.sort_values("ts")["v"]) == list(pdf["v"])
        # metadata actually lives on the bucket, not the local data_root
        assert gcs_lib._fs.exists(gcs_lib._ref_gen_path("sym", gcs_lib._load_ref_gen("sym")[0]))

    def test_versioning_and_as_of(self, gcs_lib):
        gcs_lib.write("sym", _frame(100))
        later = _frame(50)
        later.index = later.index + pd.Timedelta(days=30)
        gcs_lib.append("sym", later)
        assert gcs_lib.read("sym", as_of=0).count() == 100
        assert gcs_lib.read("sym").count() == 150
        assert [v["version"] for v in gcs_lib.list_versions("sym")] == [1, 0]

    def test_concurrent_version_commit_cas(self, gcs_lib, spark, tmp_path,
                                           gcs_client):
        from arcticdb_spark.catalog import Arctic, ArcticException
        gcs_lib.write("sym", _frame(50))
        # a second writer handle racing on the same version number loses
        other = Arctic("gs://arctic-test/libs", spark,
                       data_root=str(tmp_path), gcs_client=gcs_client
                       ).get_library("gcslib", create_if_missing=True)
        m = gcs_lib._load_manifest("sym", 0)
        m.version = 0  # force the same version number -> CAS must reject
        with pytest.raises(ArcticException, match="concurrent"):
            other._commit(m)

    def test_snapshots(self, gcs_lib):
        gcs_lib.write("a", _frame(10))
        gcs_lib.write("b", _frame(20))
        gcs_lib.snapshot("snap1")
        gcs_lib.write("a", _frame(30))
        assert gcs_lib.read("a", as_of="snap1").count() == 10
        assert "snap1" in gcs_lib.list_snapshots()
        gcs_lib.delete_snapshot("snap1")
        assert gcs_lib.list_snapshots() == {}

    def test_list_symbols_and_delete(self, gcs_lib):
        gcs_lib.write("x", _frame(5))
        gcs_lib.write("y", _frame(5))
        assert gcs_lib.list_symbols() == ["x", "y"]
        assert gcs_lib.has_symbol("x")
        gcs_lib.delete("x")
        assert gcs_lib.list_symbols() == ["y"]
        assert not gcs_lib.has_symbol("x")

    def test_metadata_and_description(self, gcs_lib):
        gcs_lib.write("sym", _frame(10), metadata={"source": "test"})
        assert gcs_lib.read_metadata("sym").metadata == {"source": "test"}
        d = gcs_lib.get_description("sym")
        assert d["row_count"] == 10 and d["index_column"] == "ts"

    def test_prune_previous_versions(self, gcs_lib):
        gcs_lib.write("sym", _frame(10))
        gcs_lib.write("sym", _frame(20))
        gcs_lib.prune_previous_versions("sym")
        from arcticdb_spark.catalog import NoSuchVersionException
        with pytest.raises(NoSuchVersionException):
            gcs_lib.read("sym", as_of=0)
        assert gcs_lib.read("sym").count() == 20

    def test_query_builder_pushdown_still_works(self, gcs_lib):
        from arcticdb_spark.query import QueryBuilder
        pdf = _frame(500)
        gcs_lib.write("sym", pdf)
        q = QueryBuilder()
        q = q[q["v"] >= 400]
        out = gcs_lib.read("sym", query_builder=q, output_format="pandas")
        assert sorted(out["v"]) == list(range(400, 500))

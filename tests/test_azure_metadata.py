"""Catalog surface against the Azure Blob metadata backend (fake client).

The reference ships an Azure storage backend
(``cpp/arcticdb/storage/azure/azure_storage.cpp``) alongside S3; here the
metadata (manifests/refs/snapshots/config) lives on a faked Azure container
through AzureObjectFileSystem while Spark's parquet data files stay on a
local data_root. The fake implements the ContainerClient surface the
filesystem uses (the real SDK is not in this container): ``upload_blob``
with ``overwrite=False`` raising ResourceExistsError reproduces the
``If-None-Match: *`` conditional-write CAS semantics bit-for-bit.
"""

import json

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.sources.filesystem import AzureObjectFileSystem


class _Blob:
    def __init__(self, name):
        self.name = name


class _Download:
    def __init__(self, data):
        self._data = data

    def readall(self):
        return self._data


class ResourceExistsError(Exception):
    status_code = 409


class ResourceNotFoundError(Exception):
    status_code = 404


class FakeContainerClient:
    """In-memory ContainerClient: flat name->bytes dict, hierarchical
    walk_blobs via delimiter splitting — mirrors Azure's virtual dirs."""

    def __init__(self):
        self.blobs: dict[str, bytes] = {}

    def upload_blob(self, name, data, overwrite=False):
        if not overwrite and name in self.blobs:
            raise ResourceExistsError(name)
        self.blobs[name] = bytes(data)

    def download_blob(self, name):
        if name not in self.blobs:
            raise ResourceNotFoundError(name)
        return _Download(self.blobs[name])

    def delete_blob(self, name):
        if name not in self.blobs:
            raise ResourceNotFoundError(name)
        del self.blobs[name]

    def list_blobs(self, name_starts_with=""):
        for n in sorted(self.blobs):
            if n.startswith(name_starts_with):
                yield _Blob(n)

    def walk_blobs(self, name_starts_with="", delimiter="/"):
        seen = set()
        for n in sorted(self.blobs):
            if not n.startswith(name_starts_with):
                continue
            rest = n[len(name_starts_with):]
            if delimiter in rest:
                pfx = name_starts_with + rest.split(delimiter, 1)[0] + delimiter
                if pfx not in seen:
                    seen.add(pfx)
                    yield _Blob(pfx)  # BlobPrefix keeps the trailing '/'
            else:
                yield _Blob(n)


@pytest.fixture()
def az_client():
    return FakeContainerClient()


@pytest.fixture()
def az_lib(spark, tmp_path, az_client):
    from arcticdb_spark.catalog import Arctic
    a = Arctic("azure://arctic-test/libs", spark, data_root=str(tmp_path),
               azure_client=az_client)
    return a.create_library("azlib")


def _frame(n=300):
    idx = pd.date_range("2024-01-01", periods=n, freq="1h", name="ts")
    return pd.DataFrame({"v": np.arange(n, dtype="int64")}, index=idx)


class TestAzureFileSystem:
    def test_conditional_put_cas(self, az_client):
        fs = AzureObjectFileSystem(az_client, prefix="cas")
        assert fs.write_json_if_absent("a/b.json", {"x": 1}) is True
        assert fs.write_json_if_absent("a/b.json", {"x": 2}) is False
        assert fs.read_json("a/b.json") == {"x": 1}

    def test_atomic_overwrites(self, az_client):
        fs = AzureObjectFileSystem(az_client, prefix="w")
        fs.write_json_atomic("c.json", {"v": 1})
        fs.write_json_atomic("c.json", {"v": 2})
        assert fs.read_json("c.json") == {"v": 2}

    def test_listdir_and_isdir(self, az_client):
        fs = AzureObjectFileSystem(az_client, prefix="p")
        fs.write_json_atomic("d/one.json", 1)
        fs.write_json_atomic("d/sub/two.json", 2)
        assert fs.listdir("d") == ["one.json", "sub"]
        assert fs.isdir("d/sub")
        assert not fs.isdir("d/missing")
        assert fs.exists("d/one.json")
        assert not fs.exists("d/one")  # exact key, not prefix
        fs.rmtree("d")
        assert not fs.isdir("d")

    def test_read_missing_raises(self, az_client):
        fs = AzureObjectFileSystem(az_client)
        with pytest.raises(FileNotFoundError):
            fs.read_json("nope.json")


class TestAzureCatalog:
    def test_write_read_roundtrip(self, az_lib):
        pdf = _frame()
        az_lib.write("sym", pdf)
        out = az_lib.read("sym", output_format="pandas")
        assert len(out) == len(pdf)
        assert list(out.sort_values("ts")["v"]) == list(pdf["v"])
        # metadata actually lives on the container, not the local data_root
        assert az_lib._fs.exists(az_lib._ref_gen_path("sym", az_lib._load_ref_gen("sym")[0]))

    def test_versioning_and_as_of(self, az_lib):
        az_lib.write("sym", _frame(100))
        later = _frame(50)
        later.index = later.index + pd.Timedelta(days=30)
        az_lib.append("sym", later)
        assert az_lib.read("sym", as_of=0).count() == 100
        assert az_lib.read("sym").count() == 150
        assert [v["version"] for v in az_lib.list_versions("sym")] == [1, 0]

    def test_concurrent_version_commit_cas(self, az_lib, spark, tmp_path,
                                           az_client):
        from arcticdb_spark.catalog import Arctic, ArcticException
        az_lib.write("sym", _frame(50))
        # a second writer handle racing on the same version number loses
        other = Arctic("azure://arctic-test/libs", spark,
                       data_root=str(tmp_path), azure_client=az_client
                       ).get_library("azlib", create_if_missing=True)
        m = az_lib._load_manifest("sym", 0)
        m.version = 0  # force the same version number -> CAS must reject
        with pytest.raises(ArcticException, match="concurrent"):
            other._commit(m)

    def test_snapshots(self, az_lib):
        az_lib.write("a", _frame(10))
        az_lib.write("b", _frame(20))
        az_lib.snapshot("snap1")
        az_lib.write("a", _frame(30))
        assert az_lib.read("a", as_of="snap1").count() == 10
        assert "snap1" in az_lib.list_snapshots()
        az_lib.delete_snapshot("snap1")
        assert az_lib.list_snapshots() == {}

    def test_list_symbols_and_delete(self, az_lib):
        az_lib.write("x", _frame(5))
        az_lib.write("y", _frame(5))
        assert az_lib.list_symbols() == ["x", "y"]
        assert az_lib.has_symbol("x")
        az_lib.delete("x")
        assert az_lib.list_symbols() == ["y"]
        assert not az_lib.has_symbol("x")

    def test_metadata_and_description(self, az_lib):
        az_lib.write("sym", _frame(10), metadata={"source": "test"})
        assert az_lib.read_metadata("sym").metadata == {"source": "test"}
        d = az_lib.get_description("sym")
        assert d["row_count"] == 10 and d["index_column"] == "ts"

    def test_prune_previous_versions(self, az_lib):
        az_lib.write("sym", _frame(10))
        az_lib.write("sym", _frame(20))
        az_lib.prune_previous_versions("sym")
        from arcticdb_spark.catalog import NoSuchVersionException
        with pytest.raises(NoSuchVersionException):
            az_lib.read("sym", as_of=0)
        assert az_lib.read("sym").count() == 20

    def test_query_builder_pushdown_still_works(self, az_lib):
        from arcticdb_spark.query import QueryBuilder
        pdf = _frame(500)
        az_lib.write("sym", pdf)
        q = QueryBuilder()
        q = q[q["v"] >= 400]
        out = az_lib.read("sym", query_builder=q, output_format="pandas")
        assert sorted(out["v"]) == list(range(400, 500))

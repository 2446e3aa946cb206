"""Catalog surface against the MongoDB metadata backend (fake database).

Reference: ``adapters/mongo_library_adapter.py:28-47`` (URI acceptance +
the exact invalid-format UserInputException) and
``cpp/arcticdb/storage/mongo/mongo_storage.cpp`` (each segment key maps to
one document; unique-key insert gives the conditional-write CAS). Here the
metadata (manifests/refs/snapshots/config) lives in a faked pymongo
database through MongoObjectFileSystem while Spark's parquet data files
stay on a local data_root. The fake implements the collection surface the
filesystem uses (pymongo is not in this container): ``insert_one`` raising
DuplicateKeyError on an existing ``_id`` reproduces the unique-index CAS
semantics bit-for-bit.
"""

import re

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.sources.filesystem import MongoObjectFileSystem


class DuplicateKeyError(Exception):
    code = 11000


class _FakeCollection:
    def __init__(self):
        self.docs: dict[str, dict] = {}

    @staticmethod
    def _matches(_id, flt):
        cond = flt.get("_id")
        if isinstance(cond, dict):
            return re.search(cond["$regex"], _id) is not None
        return _id == cond

    def find_one(self, flt):
        for _id, d in self.docs.items():
            if self._matches(_id, flt):
                return d
        return None

    def find(self, flt, _proj=None):
        return [d for _id, d in sorted(self.docs.items())
                if self._matches(_id, flt)]

    def count_documents(self, flt, limit=None):
        n = sum(1 for _id in self.docs if self._matches(_id, flt))
        return min(n, limit) if limit else n

    def insert_one(self, doc):
        if doc["_id"] in self.docs:
            raise DuplicateKeyError(doc["_id"])
        self.docs[doc["_id"]] = doc

    def replace_one(self, flt, doc, upsert=False):
        key = flt["_id"]
        if key not in self.docs and not upsert:
            return
        self.docs[key] = doc

    def delete_one(self, flt):
        for _id in list(self.docs):
            if self._matches(_id, flt):
                del self.docs[_id]
                return

    def delete_many(self, flt):
        for _id in list(self.docs):
            if self._matches(_id, flt):
                del self.docs[_id]


class FakeDatabase:
    def __init__(self):
        self.collections: dict[str, _FakeCollection] = {}

    def __getitem__(self, name):
        return self.collections.setdefault(name, _FakeCollection())


@pytest.fixture()
def mongo_db():
    return FakeDatabase()


@pytest.fixture()
def mongo_lib(spark, tmp_path, mongo_db):
    from arcticdb_spark.catalog import Arctic
    a = Arctic("mongodb://localhost:27017/arcticdb", spark,
               data_root=str(tmp_path), mongo_database=mongo_db)
    return a.create_library("mongolib")


def _frame(n=300):
    idx = pd.date_range("2024-01-01", periods=n, freq="1h", name="ts")
    return pd.DataFrame({"v": np.arange(n, dtype="int64")}, index=idx)


class TestMongoURI:
    def test_accepted_forms(self, spark, tmp_path, mongo_db):
        from arcticdb_spark.catalog import Arctic
        for uri in ("mongodb://localhost:27017/db",
                    "mongodb://host", "mongodb+srv://cluster.example/db"):
            a = Arctic(uri, spark, data_root=str(tmp_path),
                       mongo_database=mongo_db)
            assert isinstance(a.fs, MongoObjectFileSystem)

    def test_invalid_format_message(self, spark, tmp_path, mongo_db):
        """The reference's exact UserInputException wording
        (mongo_library_adapter.py:44-46)."""
        from arcticdb_spark.catalog import Arctic
        from arcticdb_spark.exceptions import UserInputException
        with pytest.raises(UserInputException,
                           match=r"Invalid connection string format\. .* "
                                 r"Correct format: "
                                 r"mongodb://\[HOST\]/\[DATABASE\]"
                                 r"\[\?OPTIONS\]"):
            Arctic("mongodb://", spark, data_root=str(tmp_path),
                   mongo_database=mongo_db)

    def test_repr(self, spark, tmp_path, mongo_db):
        from arcticdb_spark.catalog import Arctic
        a = Arctic("mongodb://localhost:27017/arcticdb", spark,
                   data_root=str(tmp_path), mongo_database=mongo_db)
        assert repr(a) == "Arctic(config=mongodb(endpoint=localhost:27017))"


class TestMongoFileSystem:
    def test_insert_cas(self, mongo_db):
        fs = MongoObjectFileSystem(mongo_db)
        assert fs.write_json_if_absent("a/b.json", {"x": 1}) is True
        assert fs.write_json_if_absent("a/b.json", {"x": 2}) is False
        assert fs.read_json("a/b.json") == {"x": 1}

    def test_atomic_overwrites(self, mongo_db):
        fs = MongoObjectFileSystem(mongo_db)
        fs.write_json_atomic("c.json", {"v": 1})
        fs.write_json_atomic("c.json", {"v": 2})
        assert fs.read_json("c.json") == {"v": 2}

    def test_listdir_isdir_rmtree(self, mongo_db):
        fs = MongoObjectFileSystem(mongo_db)
        fs.write_json_atomic("lib/d/one.json", 1)
        fs.write_json_atomic("lib/d/sub/two.json", 2)
        assert fs.listdir("lib/d") == ["one.json", "sub"]
        assert fs.isdir("lib/d/sub")
        assert not fs.isdir("lib/d/missing")
        assert fs.exists("lib/d/one.json")
        assert not fs.exists("lib/d/one")   # exact key, not prefix
        fs.rmtree("lib/d")
        assert not fs.isdir("lib/d")

    def test_read_missing_raises(self, mongo_db):
        fs = MongoObjectFileSystem(mongo_db)
        with pytest.raises(FileNotFoundError):
            fs.read_json("nope.json")

    def test_json_shape_parity(self, mongo_db):
        """Stored docs are exactly what every other backend persists —
        tuples decay to lists through the json round-trip."""
        fs = MongoObjectFileSystem(mongo_db)
        fs.write_json_atomic("t.json", {"a": (1, 2), "b": [3]})
        assert fs.read_json("t.json") == {"a": [1, 2], "b": [3]}


class TestMongoCatalog:
    def test_write_read_roundtrip(self, mongo_lib):
        pdf = _frame()
        mongo_lib.write("sym", pdf)
        out = mongo_lib.read("sym", output_format="pandas")
        assert len(out) == len(pdf)
        assert list(out.sort_values("ts")["v"]) == list(pdf["v"])
        # metadata actually lives in the database, not the local data_root
        assert mongo_lib._fs.exists(mongo_lib._ref_gen_path("sym", mongo_lib._load_ref_gen("sym")[0]))

    def test_versioning_and_as_of(self, mongo_lib):
        mongo_lib.write("sym", _frame(100))
        later = _frame(50)
        later.index = later.index + pd.Timedelta(days=30)
        mongo_lib.append("sym", later)
        assert mongo_lib.read("sym", as_of=0).count() == 100
        assert mongo_lib.read("sym").count() == 150
        assert [v["version"] for v in mongo_lib.list_versions("sym")] == [1, 0]

    def test_concurrent_version_commit_cas(self, mongo_lib, spark, tmp_path,
                                           mongo_db):
        from arcticdb_spark.catalog import Arctic, ArcticException
        mongo_lib.write("sym", _frame(50))
        other = Arctic("mongodb://localhost:27017/arcticdb", spark,
                       data_root=str(tmp_path), mongo_database=mongo_db
                       ).get_library("mongolib", create_if_missing=True)
        m = mongo_lib._load_manifest("sym", 0)
        m.version = 0   # force the same version number -> CAS must reject
        with pytest.raises(ArcticException, match="concurrent"):
            other._commit(m)

    def test_snapshots(self, mongo_lib):
        mongo_lib.write("a", _frame(10))
        mongo_lib.write("b", _frame(20))
        mongo_lib.snapshot("snap1")
        mongo_lib.write("a", _frame(30))
        assert mongo_lib.read("a", as_of="snap1").count() == 10
        assert "snap1" in mongo_lib.list_snapshots()
        mongo_lib.delete_snapshot("snap1")
        assert mongo_lib.list_snapshots() == {}

    def test_list_symbols_and_delete(self, mongo_lib):
        mongo_lib.write("x", _frame(5))
        mongo_lib.write("y", _frame(5))
        assert mongo_lib.list_symbols() == ["x", "y"]
        assert mongo_lib.has_symbol("x")
        mongo_lib.delete("x")
        assert mongo_lib.list_symbols() == ["y"]
        assert not mongo_lib.has_symbol("x")

    def test_metadata_and_description(self, mongo_lib):
        mongo_lib.write("sym", _frame(10), metadata={"source": "test"})
        assert mongo_lib.read_metadata("sym").metadata == {"source": "test"}
        d = mongo_lib.get_description("sym")
        assert d["row_count"] == 10 and d["index_column"] == "ts"

    def test_prune_previous_versions(self, mongo_lib):
        mongo_lib.write("sym", _frame(10))
        mongo_lib.write("sym", _frame(20))
        mongo_lib.prune_previous_versions("sym")
        from arcticdb_spark.catalog import NoSuchVersionException
        with pytest.raises(NoSuchVersionException):
            mongo_lib.read("sym", as_of=0)
        assert mongo_lib.read("sym").count() == 20

    def test_query_builder_pushdown_still_works(self, mongo_lib):
        from arcticdb_spark.query import QueryBuilder
        pdf = _frame(500)
        mongo_lib.write("sym", pdf)
        q = QueryBuilder()
        q = q[q["v"] >= 400]
        out = mongo_lib.read("sym", query_builder=q, output_format="pandas")
        assert sorted(out["v"]) == list(range(400, 500))

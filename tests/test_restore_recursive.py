"""restore_version / batch_restore_version + recursive normalizers.

Ported semantics: reference ``_store.py:2739`` (restore_version ==
write(sym, read(sym, as_of).data) without data movement), ``_store.py:2143``
(batch_restore_version), ``_store.py:887`` + ``test_recursive_normalizers.py``
(nested dict/list/tuple structures written as multi-key sub-symbols).
"""
import pandas as pd
import pytest

from arcticdb_spark.catalog import ArcticException, DataError


def _pdf(vals):
    # DatetimeIndex frame (pandas ts DATA columns are no longer sniffed
    # as the index — reference parity; update/date_range need the index)
    return pd.DataFrame(
        {"v": vals},
        index=pd.date_range("2024-01-01", periods=len(vals), freq="1h",
                            name="ts"))


# ---------------------------------------------------------------------------
# restore_version
# ---------------------------------------------------------------------------

def test_restore_version_basic(tmp_lib):
    tmp_lib.write("s", _pdf([1.0, 2.0]))            # v0
    tmp_lib.write("s", _pdf([3.0, 4.0, 5.0]))       # v1
    m = tmp_lib.restore_version("s", as_of=0)       # v2 == v0
    assert m.version == 2
    got = tmp_lib.read("s", output_format="pandas")
    assert list(got["v"]) == [1.0, 2.0]
    # v1 still readable
    assert list(tmp_lib.read("s", as_of=1,
                             output_format="pandas")["v"]) == [3.0, 4.0, 5.0]


def test_restore_version_is_metadata_only(tmp_lib):
    tmp_lib.write("s", _pdf([1.0, 2.0]))
    tmp_lib.write("s", _pdf([9.0]))
    m0 = tmp_lib._load_manifest("s", 0)
    m2 = tmp_lib.restore_version("s", as_of=0)
    # the restored manifest re-references v0's physical files verbatim
    assert [f.path for f in m2.files] == [f.path for f in m0.files]


def test_restore_version_carries_metadata(tmp_lib):
    tmp_lib.write("s", _pdf([1.0]), metadata={"tag": "old"})
    tmp_lib.write("s", _pdf([2.0]), metadata={"tag": "new"})
    tmp_lib.restore_version("s", as_of=0)
    assert tmp_lib.read_metadata("s").metadata == {"tag": "old"}


def test_restore_version_default_latest_noop_copy(tmp_lib):
    tmp_lib.write("s", _pdf([1.0]))
    m = tmp_lib.restore_version("s")  # as_of=None -> latest
    assert m.version == 1
    assert list(tmp_lib.read("s", output_format="pandas")["v"]) == [1.0]


def test_batch_restore_version(tmp_lib):
    tmp_lib.write("a", _pdf([1.0]))
    tmp_lib.write("a", _pdf([2.0]))
    tmp_lib.write("b", _pdf([10.0]))
    out = tmp_lib.batch_restore_version(["a", "b", "missing"], [0, None, None])
    assert out[0].version == 2 and out[1].version == 1
    assert isinstance(out[2], DataError)
    assert list(tmp_lib.read("a", output_format="pandas")["v"]) == [1.0]


# ---------------------------------------------------------------------------
# recursive normalizers
# ---------------------------------------------------------------------------

def test_recursive_dict_roundtrip(tmp_lib):
    data = {"a": _pdf([1.0, 2.0]), "b": _pdf([3.0])}
    tmp_lib.write("nest", data, recursive_normalizers=True)
    got = tmp_lib.read("nest", output_format="pandas")
    assert set(got) == {"a", "b"}
    assert list(got["a"]["v"]) == [1.0, 2.0]
    assert list(got["b"]["v"]) == [3.0]


def test_recursive_nested_list_tuple(tmp_lib):
    data = {"pair": (_pdf([1.0]), _pdf([2.0])), "seq": [_pdf([3.0])]}
    tmp_lib.write("nest", data, recursive_normalizers=True)
    got = tmp_lib.read("nest", output_format="pandas")
    assert isinstance(got["pair"], tuple) and len(got["pair"]) == 2
    assert isinstance(got["seq"], list)
    assert list(got["pair"][1]["v"]) == [2.0]
    assert list(got["seq"][0]["v"]) == [3.0]


def test_recursive_pickled_leaf_fallback(tmp_lib):
    data = {"df": _pdf([1.0]), "blob": {"k": [1, 2, 3]}}
    # "blob" is a dict of non-DataFrames -> its leaves pickle
    tmp_lib.write("nest", data, recursive_normalizers=True)
    got = tmp_lib.read("nest", output_format="pandas")
    assert got["blob"]["k"] == [1, 2, 3]


def test_recursive_hidden_from_list_symbols(tmp_lib):
    tmp_lib.write("nest", {"a": _pdf([1.0])}, recursive_normalizers=True)
    assert tmp_lib.list_symbols() == ["nest"]


def test_recursive_version_pinning(tmp_lib):
    tmp_lib.write("nest", {"a": _pdf([1.0])}, recursive_normalizers=True)
    tmp_lib.write("nest", {"a": _pdf([2.0])}, recursive_normalizers=True)
    old = tmp_lib.read("nest", as_of=0, output_format="pandas")
    new = tmp_lib.read("nest", output_format="pandas")
    assert list(old["a"]["v"]) == [1.0]
    assert list(new["a"]["v"]) == [2.0]


def test_recursive_rejects_queries(tmp_lib):
    tmp_lib.write("nest", {"a": _pdf([1.0])}, recursive_normalizers=True)
    with pytest.raises(ArcticException):
        tmp_lib.read("nest", columns=["v"])


def test_recursive_delete_gcs_leaves(tmp_lib):
    tmp_lib.write("nest", {"a": _pdf([1.0])}, recursive_normalizers=True)
    tmp_lib.delete("nest")
    assert tmp_lib.list_symbols() == []
    # leaf sub-symbol dirs are gone too
    assert not any(d.startswith("_rec__nest__")
                   for d in tmp_lib._fs.listdir(tmp_lib.root))


def test_recursive_non_string_keys_raise(tmp_lib):
    with pytest.raises(ArcticException):
        tmp_lib.write("nest", {1: _pdf([1.0])}, recursive_normalizers=True)


def test_will_item_be_pickled(tmp_lib):
    assert not tmp_lib.will_item_be_pickled(_pdf([1.0]))
    assert tmp_lib.will_item_be_pickled(object())
    assert not tmp_lib.will_item_be_pickled(
        {"a": _pdf([1.0])}, recursive_normalizers=True)
    assert tmp_lib.will_item_be_pickled(
        {"a": object()}, recursive_normalizers=True)


# ---------------------------------------------------------------------------
# version chain monotonicity (reference test_version_chain.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("operation", ["write", "update", "append",
                                       "delete_range", "restore_version",
                                       "batch_restore_version"])
def test_version_chain_increasing(tmp_lib, operation):
    """After delete_version(latest), the next operation must mint a NEW
    version number (2), never reuse the tombstoned one (1)."""
    df = _pdf([1.0, 2.0, 3.0])
    tmp_lib.write("sym", df)                      # v0
    tmp_lib.write("sym", _pdf([1.0, 2.0, 6.0]))   # v1
    tmp_lib.delete_version("sym", 1)
    assert tmp_lib._resolve_version("sym", None).version == 0

    if operation == "write":
        m = tmp_lib.write("sym", df)
    elif operation == "update":
        upd = pd.DataFrame({"v": [9.0]}, index=pd.DatetimeIndex(
            [pd.Timestamp("2024-01-01 01:00")], name="ts"))
        m = tmp_lib.update("sym", upd)
    elif operation == "append":
        app = pd.DataFrame({"v": [9.0]}, index=pd.DatetimeIndex(
            [pd.Timestamp("2024-01-01 03:00")], name="ts"))
        m = tmp_lib.append("sym", app)
    elif operation == "delete_range":
        m = tmp_lib.delete_data_in_range(
            "sym", (pd.Timestamp("2024-01-01 01:00"),
                    pd.Timestamp("2024-01-01 01:00")))
    elif operation == "restore_version":
        m = tmp_lib.restore_version("sym", 0)
    else:
        m = tmp_lib.batch_restore_version(["sym"], [0])[0]
    assert m.version == 2
    # the tombstoned version stays unreadable
    with pytest.raises(Exception):
        tmp_lib.read("sym", as_of=1)


# ---------------------------------------------------------------------------
# delete(versions=...) / delete_batch with DeleteRequest (reference
# library.py:2672,2703)
# ---------------------------------------------------------------------------

def test_delete_specific_versions(tmp_lib):
    tmp_lib.write("s", _pdf([1.0]))   # v0
    tmp_lib.write("s", _pdf([2.0]))   # v1
    tmp_lib.write("s", _pdf([3.0]))   # v2
    tmp_lib.delete("s", versions=[0, 2])
    got = tmp_lib.read("s", output_format="pandas")
    assert list(got["v"]) == [2.0]    # latest live = v1
    with pytest.raises(Exception):
        tmp_lib.read("s", as_of=2)


def test_delete_missing_symbol_noop(tmp_lib):
    tmp_lib.delete("never_existed")   # must not raise


def test_delete_batch_requests(tmp_lib):
    from arcticdb_spark import DeleteRequest
    tmp_lib.write("a", _pdf([1.0]))
    tmp_lib.write("a", _pdf([2.0]))
    tmp_lib.write("b", _pdf([3.0]))
    out = tmp_lib.delete_batch([DeleteRequest("a", 1), "b"])
    assert out == [None, None]
    assert list(tmp_lib.read("a", output_format="pandas")["v"]) == [1.0]
    assert not tmp_lib.has_symbol("b")
    # missing symbol with explicit versions -> DataError, batch continues
    from arcticdb_spark import DataError
    out2 = tmp_lib.delete_batch([DeleteRequest("ghost", 0)])
    assert isinstance(out2[0], DataError)


def test_recursive_none_and_ndarray_leaves(tmp_lib):
    """Reference test_recursively_written_data_with_nones /
    test_recursive_nested_data: None and ndarray leaves roundtrip; deep
    nesting preserved."""
    import numpy as np
    data = {"a": np.arange(5), "b": {"c": {"d": np.arange(24)}}, "e": None}
    tmp_lib.write("nest", data, recursive_normalizers=True)
    got = tmp_lib.read("nest")
    assert list(got["a"]) == list(range(5))
    assert list(got["b"]["c"]["d"]) == list(range(24))
    assert got["e"] is None


def test_get_info_and_batch(tmp_lib):
    tmp_lib.write("s", _pdf([1.0, 2.0]))
    info = tmp_lib.get_info("s")
    assert info["rows"] == 2 and info["type"] == "pandasdf"
    assert "v" in info["col_names"]["columns"]
    assert info["index_type"] == "index" and info["sorted"] == "ASCENDING"
    tmp_lib.write_pickle("p", {"x": 1})
    assert tmp_lib.get_info("p")["type"] == "pickled"
    out = tmp_lib.batch_get_info(["s", "p", "ghost"])
    assert out[0]["rows"] == 2 and out[1]["type"] == "pickled"
    assert isinstance(out[2], DataError)


def test_incomplete_aliases(tmp_lib):
    tmp_lib.stage("inc", _pdf([1.0]))
    assert tmp_lib.list_symbols_with_incomplete_data() == ["inc"]
    tmp_lib.remove_incomplete("inc")
    assert tmp_lib.list_symbols_with_incomplete_data() == []


def test_snapshot_skip_symbols(tmp_lib):
    tmp_lib.write("a", _pdf([1.0]))
    tmp_lib.write("b", _pdf([2.0]))
    tmp_lib.snapshot("snap", skip_symbols=["b"])
    assert list(tmp_lib.read("a", as_of="snap",
                             output_format="pandas")["v"]) == [1.0]
    with pytest.raises(Exception):
        tmp_lib.read("b", as_of="snap")
    with pytest.raises(ArcticException):
        tmp_lib.snapshot("s2", skip_symbols=["a"], versions={"a": 0})


def test_admin_sizes_for_symbol_and_sum(tmp_lib):
    from arcticdb_spark.catalog import sum_sizes, Size
    tmp_lib.write("a", _pdf([1.0, 2.0]))
    sizes = tmp_lib.admin_tools().get_sizes_for_symbol("a")
    assert sizes["TABLE_DATA"].count >= 1 and sizes["VERSION"].count == 1
    total = sum_sizes([Size(1, 2), Size(3, 4)])
    assert total.bytes == 4 and total.count == 6

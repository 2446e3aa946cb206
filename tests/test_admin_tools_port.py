"""Port of the reference's integration test_admin_tools.py (the
storage-model-independent parts): the three size APIs agree with each
other, and the documented usage pattern works (library_sizes.md example).
Exact key counts/bytes are key-value-store-specific and not ported."""

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.catalog import Arctic, KeyType, sum_sizes


@pytest.fixture()
def lib(spark, tmp_path):
    return Arctic(str(tmp_path), spark).create_library("adm")


def test_size_apis_self_consistent(lib):
    """Port of test_size_apis_self_consistent:229-250."""
    lib.write_pickle("sym_1", 1)
    lib.write_pickle("sym_1", 2)
    df = pd.DataFrame({"a": np.arange(1000), "b": np.arange(1000.0)},
                      index=pd.date_range("2024-01-01", periods=1000,
                                          freq="min"))
    lib.write("sym_1", df)
    lib.write("sym_1", df, staged=True)
    sizes = lib.admin_tools().get_sizes()
    by_symbol = lib.admin_tools().get_sizes_by_symbol()
    assert len(by_symbol) == 1
    by_symbol = by_symbol["sym_1"]
    for_symbol = lib.admin_tools().get_sizes_for_symbol("sym_1")
    for t in (KeyType.VERSION_REF, KeyType.VERSION, KeyType.TABLE_INDEX,
              KeyType.TABLE_DATA, KeyType.APPEND_DATA):
        size = sizes[t]
        assert size == by_symbol[t], t
        assert size == for_symbol[t], t
        assert size.count > 0, t
        assert size.bytes_compressed > 0, t


def test_symbol_sizes_docs_example(spark):
    """Port of test_symbol_sizes_docs_example:253-278."""
    lib = Arctic("mem://", spark).create_library("tst")
    df = pd.DataFrame(np.random.randint(0, 100, size=(100, 5)),
                      columns=[f"c{i}" for i in range(5)])
    lib.write("sym", df)
    admin_tools = lib.admin_tools()
    sizes = admin_tools.get_sizes()
    assert sum_sizes(sizes.values()).count > 0
    assert sum_sizes(sizes.values()).bytes_compressed > 0
    assert sizes[KeyType.TABLE_DATA].count > 0
    assert sizes[KeyType.TABLE_DATA].bytes_compressed > 0
    by_symbol = admin_tools.get_sizes_by_symbol()
    size_for_sym = by_symbol["sym"]
    assert sum_sizes(size_for_sym.values()).count > 0
    assert size_for_sym[KeyType.TABLE_INDEX].count > 0
    for_symbol = admin_tools.get_sizes_for_symbol("sym")
    assert sum_sizes(for_symbol.values()).count > 0
    assert for_symbol[KeyType.VERSION].count > 0
    assert for_symbol[KeyType.VERSION].bytes_compressed > 0


def test_get_sizes_after_delete(lib):
    """Distilled from test_get_sizes:37-93: deleting a symbol's versions
    releases TABLE_DATA bytes while the version chain's metadata keys
    survive; snapshots and staged chunks surface under their key types."""
    df = pd.DataFrame({"a": np.arange(500.0)},
                      index=pd.date_range("2024-01-01", periods=500,
                                          freq="min"))
    lib.write("sym_1", df)
    lib.write("sym_2", df)
    before = lib.admin_tools().get_sizes()
    assert before[KeyType.TABLE_DATA].count > 0
    lib.delete("sym_1")
    after = lib.admin_tools().get_sizes()
    assert after[KeyType.TABLE_DATA].bytes_compressed < \
        before[KeyType.TABLE_DATA].bytes_compressed
    lib.snapshot("snap")
    lib.write("new_sym", df, staged=True)
    sizes = lib.admin_tools().get_sizes()
    assert sizes[KeyType.SNAPSHOT_REF].count == 1
    assert sizes[KeyType.APPEND_DATA].count > 0
    assert sizes[KeyType.APPEND_DATA].bytes_compressed > 0

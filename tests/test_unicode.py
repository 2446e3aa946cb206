"""Unicode round-trips ported from the reference's
``python/tests/unit/arcticdb/version_store/test_unicode.py``: non-ASCII
strings in column names, values, metadata, snapshots, and staged writes.
"""
import numpy as np
import pandas as pd

UNI = "éèê你好 \U0001f600 á"
CR = "My Thing ©"
TM = "My Word Not Your's ™"


def _df(start="2024-01-01", n=5):
    return pd.DataFrame(
        {"a": [f"v{UNI}{i}" for i in range(n)],
         TM: np.arange(n, dtype=np.int64),
         CR: [UNI] * n},
        index=pd.date_range(start, periods=n, name="ts"))


def test_write_read_unicode_columns_and_values(tmp_lib):
    pdf = _df()
    tmp_lib.write("sym", pdf, metadata={CR: TM})
    out = tmp_lib.read("sym", output_format="pandas")
    # the demoted DatetimeIndex is re-promoted on pandas output
    assert out.index.name == "ts"
    assert list(out.columns) == ["a", TM, CR]
    assert out[CR].tolist() == [UNI] * 5
    assert tmp_lib.read_metadata("sym").metadata == {CR: TM}


def test_unicode_multiindex(tmp_lib):
    pdf = pd.DataFrame(
        {"v": np.arange(4, dtype=np.int64)},
        index=pd.MultiIndex.from_product(
            [pd.date_range("2024-01-01", periods=2), [UNI, TM]],
            names=["ts", CR]))
    tmp_lib.write("sym", pdf)
    out = tmp_lib.read("sym", output_format="pandas")
    assert list(out.index.names) == ["ts", CR]
    assert set(out.index.get_level_values(1)) == {UNI, TM}


def test_unicode_append_update_staged(tmp_lib):
    tmp_lib.write("sym", _df("2024-01-01"))
    tmp_lib.append("sym", _df("2024-02-01"))
    assert tmp_lib.read("sym").count() == 10
    upd = _df("2024-01-02", 2)
    upd[CR] = ["nouveau™"] * 2
    tmp_lib.update("sym", upd)
    out = tmp_lib.read("sym", output_format="pandas").sort_values("ts")
    assert (out[CR] == "nouveau™").sum() == 2
    # staged path
    tmp_lib.stage("staged", _df())
    tmp_lib.finalize_staged_data("staged")
    assert tmp_lib.read("staged").count() == 5


def test_unicode_snapshot_and_filter(tmp_lib):
    import pytest
    from arcticdb_spark.exceptions import UserInputException
    from arcticdb_spark.query import QueryBuilder
    tmp_lib.write("sym", _df())
    # "We validate against snapshot names more strictly with the v2 API"
    # (reference test_unicode.py:231): a unicode snapshot NAME is a native-
    # API-only allowance — the v2 surface rejects it; unicode metadata and
    # values stay fully supported
    with pytest.raises(UserInputException):
        tmp_lib.snapshot(f"snap-{UNI}", metadata={TM: UNI})
    tmp_lib.snapshot("snap-ascii", metadata={TM: UNI})
    assert "snap-ascii" in tmp_lib.list_snapshots()
    q = QueryBuilder()
    q = q[q[CR] == UNI]
    assert tmp_lib.read("sym", query_builder=q).count() == 5
    q = QueryBuilder()
    q = q[q["a"].isin([f"v{UNI}0", f"v{UNI}3"])]
    assert tmp_lib.read("sym", query_builder=q).count() == 2

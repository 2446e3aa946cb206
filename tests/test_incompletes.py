"""read(incomplete=True) ported from the reference's
``python/tests/unit/arcticdb/version_store/test_incompletes.py``: the live
tail — committed data unioned with staged chunks.
"""
import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow


from arcticdb_spark.catalog import NoSuchVersionException


def _df(n=10):
    return pd.DataFrame({"col": np.arange(n, dtype=np.int64)},
                        index=pd.date_range("2024-01-01", periods=n,
                                            name="ts"))


def test_read_incompletes_with_indexed_data(tmp_lib):
    df = _df()
    tmp_lib.write("sym", df.iloc[:5])
    for i in range(5, 10):
        tmp_lib.stage("sym", df.iloc[i:i + 1])
    # plain read sees only the committed half
    assert tmp_lib.read("sym").count() == 5
    out = tmp_lib.read("sym", date_range=(df.index[1], df.index[-2]),
                       incomplete=True, output_format="pandas")
    assert sorted(out["col"].tolist()) == list(range(1, 9))


def test_read_incompletes_no_indexed_data(tmp_lib):
    df = _df()
    for i in range(10):
        tmp_lib.stage("sym", df.iloc[i:i + 1])
    assert not tmp_lib.has_symbol("sym")
    out = tmp_lib.read("sym", date_range=(df.index[1], df.index[-2]),
                       incomplete=True, output_format="pandas")
    assert sorted(out["col"].tolist()) == list(range(1, 9))


def test_read_incompletes_non_existent_symbol(tmp_lib):
    with pytest.raises(NoSuchVersionException):
        tmp_lib.read("nope", date_range=(pd.Timestamp(0), pd.Timestamp(1)),
                     incomplete=True)


def test_read_incompletes_columns_and_query(tmp_lib):
    df = _df()
    df["extra"] = df["col"] * 2.0
    tmp_lib.write("sym", df.iloc[:5])
    tmp_lib.stage("sym", df.iloc[5:])
    out = tmp_lib.read("sym", columns=["col"], incomplete=True)
    assert set(out.columns) == {"ts", "col"}
    from arcticdb_spark.query import QueryBuilder
    q = QueryBuilder()
    q = q[q["col"] >= 7]
    out = tmp_lib.read("sym", query_builder=q, incomplete=True)
    assert out.count() == 3


def test_read_incompletes_dynamic_columns(tmp_lib):
    # staged chunks may carry new columns (reference
    # test_read_incompletes_dynamic)
    df = _df(4)
    tmp_lib.write("sym", df)
    extra = pd.DataFrame(
        {"col": [99], "newcol": [1.5]},
        index=pd.DatetimeIndex([pd.Timestamp("2024-02-01")], name="ts"))
    tmp_lib.stage("sym", extra)
    out = tmp_lib.read("sym", incomplete=True, output_format="pandas")
    assert "newcol" in out.columns
    assert out["newcol"].notna().sum() == 1
    assert len(out) == 5


@pytest.mark.parametrize("mode", ["append", "write"])
@pytest.mark.parametrize("validate_index", [True, False, None])
def test_finalize_index_validation_matrix(tmp_lib, mode, validate_index):
    """Ported from the reference test_arctic.py
    test_parallel_writes_and_appends_index_validation: overlapping staged
    chunks raise UnsortedDataException at finalize unless
    validate_index=False, for both WRITE and APPEND modes (default == True)."""
    import pandas as pd
    from arcticdb_spark.exceptions import UnsortedDataException
    sym = "mx"
    if mode == "append":
        tmp_lib.write(sym, pd.DataFrame(
            {"col": [1, 2]}, index=pd.DatetimeIndex(
                ["2024-01-01", "2024-01-02"], name="ts")))
    df_1 = pd.DataFrame({"col": [3, 4]}, index=pd.DatetimeIndex(
        ["2024-01-03", "2024-01-04"], name="ts"))
    df_2 = pd.DataFrame({"col": [5, 6]}, index=pd.DatetimeIndex(
        ["2024-01-03 12:00", "2024-01-05"], name="ts"))
    tmp_lib.write(sym, df_2, staged=True)
    tmp_lib.write(sym, df_1, staged=True)
    if validate_index is None:
        with pytest.raises(UnsortedDataException):
            tmp_lib.finalize_staged_data(sym, mode, sort=False)
    elif validate_index:
        with pytest.raises(UnsortedDataException):
            tmp_lib.finalize_staged_data(sym, mode, sort=False,
                                         validate_index=True)
    else:
        tmp_lib.finalize_staged_data(sym, mode, sort=False,
                                     validate_index=False)
        got = tmp_lib.read(sym, output_format="pandas")["col"].tolist()
        assert sorted(got) == ([1, 2, 3, 4, 5, 6] if mode == "append"
                               else [3, 4, 5, 6])


def test_concurrent_stagers_then_finalize(tmp_lib):
    """The advertised staged-data pattern (reference library.py:952):
    multiple writers stage chunks to one symbol at the same time, one
    process finalizes — every staged row lands exactly once."""
    import threading
    import pandas as pd
    chunks = []
    for i in range(6):
        idx = pd.date_range("2024-01-01", periods=60,
                            name="ts")[i * 10:(i + 1) * 10]
        chunks.append(pd.DataFrame({"v": range(i * 10, i * 10 + 10)},
                                   index=idx))
    threads = [threading.Thread(target=tmp_lib.stage, args=("sym", c))
               for c in chunks]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    tmp_lib.sort_and_finalize_staged_data("sym")
    out = tmp_lib.read("sym", output_format="pandas")
    assert out["v"].tolist() == list(range(60))
    assert tmp_lib.get_info("sym")["sorted"] == "ASCENDING"

"""Port of remaining deciders from the reference's integration
test_arctic_batch.py: metadata-batch as_of handling and DataError
classification, negative as_of across batch methods, date objects in
batch date_ranges, the unhandled-item eager raise, and empty-append
version bumps in batches."""

from datetime import date

import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow


from arcticdb_spark import (Arctic, DataError, ErrorCategory, ErrorCode,
                            QueryBuilder, ReadInfoRequest, ReadRequest,
                            VersionRequestType)
from arcticdb_spark.exceptions import ArcticInvalidApiUsageException


@pytest.fixture()
def lib(spark, tmp_path):
    return Arctic(str(tmp_path), spark).create_library("ab")


def test_read_meta_batch_with_as_ofs(lib):
    """Port of test_read_meta_batch_with_as_ofs:127-151."""
    lib.write_pickle("sym1", 1, {"meta1": 0})
    lib.write_pickle("sym1", 1, {"meta1": 1})
    lib.write_pickle("sym2", 2, {"meta2": 0})
    lib.write_pickle("sym2", 2, {"meta2": 1})
    batch = lib.read_metadata_batch(
        [ReadInfoRequest("sym1", as_of=0), "sym1",
         ReadInfoRequest("sym2", as_of=0), "sym2"])
    assert batch[0].metadata == {"meta1": 0}
    assert batch[1].metadata == {"meta1": 1}
    assert batch[2].metadata == {"meta2": 0}
    assert batch[3].metadata == {"meta2": 1}


def test_read_metadata_batch_with_none(lib):
    """Port of test_read_metadata_batch_with_none:154-174."""
    lib.write("s1", pd.DataFrame({"a": [5, 7, 9]}))
    lib.write("s2", pd.DataFrame({"a": [7, 9, 11]}))
    batch = lib.read_metadata_batch(["s1", "s2"])
    for item in batch:
        assert item.data is None
        assert item.metadata is None
        assert item.version == 0


def test_read_metadata_batch_symbol_doesnt_exist(lib):
    """Port of test_read_metadata_batch_symbol_doesnt_exist:224-244."""
    lib.write("s1", pd.DataFrame({"a": [3, 5, 7]}), metadata={"meta1": 0})
    batch = lib.read_metadata_batch(["s1", "s2"])
    assert not isinstance(batch[0], DataError)
    assert batch[0].metadata == {"meta1": 0}
    assert isinstance(batch[1], DataError)
    assert batch[1].symbol == "s2"
    assert batch[1].version_request_type == VersionRequestType.LATEST
    assert batch[1].version_request_data is None
    assert batch[1].error_code == ErrorCode.E_NO_SUCH_VERSION
    assert batch[1].error_category == ErrorCategory.MISSING_DATA


def test_read_metadata_batch_version_doesnt_exist(lib):
    """Port of test_read_metadata_batch_version_doesnt_exist:247-275."""
    lib.write("s1", pd.DataFrame({"a": [3, 5, 7]}), metadata={"meta1": 0})
    batch = lib.read_metadata_batch(["s1", ReadInfoRequest("s1", as_of=1)])
    assert batch[0].metadata == {"meta1": 0}
    assert isinstance(batch[1], DataError)
    assert batch[1].symbol == "s1"
    assert batch[1].version_request_type == VersionRequestType.SPECIFIC
    assert batch[1].version_request_data == 1
    assert batch[1].error_code == ErrorCode.E_NO_SUCH_VERSION
    assert batch[1].error_category == ErrorCategory.MISSING_DATA


def test_batch_methods_with_negative_as_of(lib):
    """Port of test_batch_methods_with_negative_as_of:892-911."""
    sym = "neg_as_of"
    lib.write_pickle(sym, 0, metadata={"some": "metadata"})
    lib.write_pickle(sym, 1, metadata={"more": "metadata"})
    res = lib.read_batch([ReadRequest(sym, as_of=-1),
                          ReadRequest(sym, as_of=-2)])
    assert res[0] == 1
    assert res[1] == 0
    res = lib.read_metadata_batch([ReadInfoRequest(sym, as_of=-1),
                                   ReadInfoRequest(sym, as_of=-2)])
    assert res[0].metadata == {"more": "metadata"}
    assert res[1].metadata == {"some": "metadata"}
    res = lib.get_description_batch([ReadInfoRequest(sym, as_of=-1),
                                     ReadInfoRequest(sym, as_of=-2)])
    assert res[0] == lib.get_description(sym)
    assert res[1] == lib.get_description(sym, as_of=0)


@pytest.mark.parametrize("mk", [
    lambda d: d,                                    # datetime.date objects
])
def test_read_batch_date_ranges_dates_not_times(lib, mk):
    """Port of test_read_batch_date_ranges_dates_not_times:938-956."""
    df = pd.DataFrame({"column": [1, 2, 3, 4]},
                      index=pd.date_range(start="1/1/2018", end="1/4/2018"))
    lib.write("symbol", df)
    batch = lib.read_batch(
        [ReadRequest("symbol", date_range=(mk(date(2018, 1, 1)),
                                           mk(date(2018, 1, 2)))),
         ReadRequest("symbol", date_range=(mk(date(2018, 1, 1)),
                                           mk(date(2018, 1, 3))))],
        output_format="pandas")
    pd.testing.assert_frame_equal(
        batch[0], pd.DataFrame({"column": [1, 2]},
                               index=pd.date_range(start="1/1/2018",
                                                   end="1/2/2018")),
        check_freq=False)
    pd.testing.assert_frame_equal(
        batch[1], pd.DataFrame({"column": [1, 2, 3]},
                               index=pd.date_range(start="1/1/2018",
                                                   end="1/3/2018")),
        check_freq=False)


def test_read_batch_unhandled_type(lib):
    """Port of test_read_batch_unhandled_type:993-998: only str and
    ReadRequest are supported — eager raise, no DataError capture."""
    lib.write("1", pd.DataFrame({"a": [1]}))
    with pytest.raises(ArcticInvalidApiUsageException):
        lib.read_batch([1])


def test_read_batch_overall_and_per_request_qb_raises(lib):
    """Port of
    test_read_batch_overall_query_builder_and_per_request_query_builder_
    raises:981-992."""
    q_1 = QueryBuilder()
    q_1 = q_1[q_1["a"] < 5]
    q_2 = QueryBuilder()
    q_2 = q_2[q_2["a"] < 7]
    lib.write("s", pd.DataFrame({"a": [3, 5, 7]}))
    with pytest.raises(ArcticInvalidApiUsageException):
        lib.read_batch([ReadRequest("s", query_builder=q_1)],
                       query_builder=q_2)


def test_append_batch_empty_dataframe_increases_version(lib):
    """Port of test_append_batch_empty_dataframe_increases_version:
    735-750: appending empty frames in a batch bumps versions without
    touching data."""
    df = pd.DataFrame({"a": np.arange(3)})
    lib.write("s1", df)
    lib.write("s2", df)
    outs = lib.append_batch([("s1", pd.DataFrame()),
                             ("s2", pd.DataFrame())])
    assert [m.version for m in outs] == [1, 1]
    out = lib.read("s1", output_format="pandas")
    pd.testing.assert_frame_equal(out, df)

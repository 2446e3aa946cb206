"""Version metadata is per-version VERBATIM on EVERY version-creating op.

Round-9 PARITY left one open delta: finalize_staged_data (append mode) and
merge_experimental inherited prev.metadata when metadata=None. The decider
is the reference SOURCE (no upstream test covers the None case):

* compact_incomplete: `collate_and_write` builds a FRESH TimeseriesDescriptor
  and only copies user_meta when the optional is engaged
  (/root/reference/cpp/arcticdb/version/version_core.cpp:2255-2262, reached
  from compact_incomplete_impl:2637-2644); `normalize_metadata(None)` is
  None (/root/reference/python/arcticdb/version_store/_normalization.py:1717),
  so metadata=None yields a version with NO metadata.
* merge: the merged tsd takes the CALL's user_meta
  (version_core.cpp:3141 `std::make_optional(std::move(source->user_meta))`),
  never the existing version's.

So every version-creating op clears metadata when metadata=None — the same
rule already pinned for write/append/update (reference test_append.py:803,
test_update.py:1045).
"""
import numpy as np
import pandas as pd
import pytest


def _df(n=4, start="2024-01-01"):
    return pd.DataFrame({"v": np.arange(n, dtype="float64")},
                        index=pd.date_range(start, periods=n, freq="1h"))


class TestFinalizeMetadataVerbatim:
    def test_finalize_append_none_clears(self, tmp_lib):
        tmp_lib.write("sym", _df(4), metadata={"keep": 1})
        assert tmp_lib.read_metadata("sym").metadata == {"keep": 1}
        tmp_lib.stage("sym", _df(4, start="2024-02-01"))
        tmp_lib.finalize_staged_data("sym", "append", sort=False)
        assert tmp_lib.read_metadata("sym").metadata is None
        # the previous version keeps ITS metadata (per-version storage)
        assert tmp_lib.read_metadata("sym", as_of=0).metadata == {"keep": 1}

    def test_finalize_append_explicit_metadata(self, tmp_lib):
        # reference test_parallel.py:236: explicit metadata lands verbatim
        tmp_lib.write("sym", _df(4), metadata={"keep": 1})
        tmp_lib.stage("sym", _df(4, start="2024-02-01"))
        tmp_lib.finalize_staged_data("sym", "append", sort=False,
                                     metadata={"thing": 7})
        assert tmp_lib.read_metadata("sym").metadata == {"thing": 7}

    def test_finalize_write_none_clears(self, tmp_lib):
        tmp_lib.write("sym", _df(4), metadata={"keep": 1})
        tmp_lib.stage("sym", _df(4, start="2024-02-01"))
        tmp_lib.finalize_staged_data("sym", "write", sort=False)
        assert tmp_lib.read_metadata("sym").metadata is None

    def test_sort_and_finalize_none_clears(self, tmp_lib):
        tmp_lib.write("sym", _df(4), metadata={"keep": 1})
        tmp_lib.stage("sym", _df(4, start="2024-02-01"))
        tmp_lib.sort_and_finalize_staged_data("sym", "append")
        assert tmp_lib.read_metadata("sym").metadata is None


class TestMergeMetadataVerbatim:
    def test_merge_none_clears(self, tmp_lib):
        tmp_lib.write("sym", _df(4), metadata={"keep": 1})
        src = _df(2) * 10
        tmp_lib.merge_experimental("sym", src)
        assert tmp_lib.read_metadata("sym").metadata is None
        assert tmp_lib.read_metadata("sym", as_of=0).metadata == {"keep": 1}

    def test_merge_explicit_metadata(self, tmp_lib):
        tmp_lib.write("sym", _df(4), metadata={"keep": 1})
        tmp_lib.merge_experimental("sym", _df(2) * 10,
                                   metadata={"merged": True})
        assert tmp_lib.read_metadata("sym").metadata == {"merged": True}

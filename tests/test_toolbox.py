"""Library toolbox / admin tools (reference toolbox/library_tool.py
LibraryTool + library.py:845 AdminTools.remove_incompletes)."""

import numpy as np
import pandas as pd
import pytest


def _df(start, n):
    return pd.DataFrame({"v": np.arange(n, dtype="int64")},
                        index=pd.date_range(start, periods=n, name="ts"))


def test_key_listing_and_raw_reads(tmp_lib):
    lt = tmp_lib.library_tool()
    assert "VERSION" in lt.key_types()
    tmp_lib.write("s", _df("2024-01-01", 4))
    tmp_lib.append("s", _df("2024-02-01", 2))

    refs = lt.find_keys_for_symbol("VERSION_REF", "s")
    assert len(refs) == 1
    assert lt.read_to_dataframe(refs[0])["latest"] == 1

    versions = lt.find_keys_for_symbol("VERSION", "s")
    assert [k.version for k in versions] == [0, 1]
    assert versions[0].rows == 4 and versions[1].rows == 6

    data = lt.find_keys_for_symbol("TABLE_DATA", "s")
    assert sum(k.rows for k in data) == 6
    frame = lt.read_to_dataframe(data[0])
    assert "v" in frame.columns and len(frame) == data[0].rows

    # VERSION keys survive delete_version tombstoning (physical listing)
    tmp_lib.delete_version("s", 1)
    assert [k.version for k in lt.find_keys_for_symbol("VERSION", "s")] \
        == [0, 1]


def test_version_layout(tmp_lib):
    tmp_lib.write("s", _df("2024-01-01", 5))
    tmp_lib.append("s", _df("2024-02-01", 3))
    layout = tmp_lib.library_tool().version_layout("s")
    assert sum(e["rows"] for e in layout) == 8
    starts = [e["row_start"] for e in layout]
    assert starts == sorted(starts) and starts[0] == 0
    assert all(e["ts_min"] is not None for e in layout)
    # as_of older version
    layout0 = tmp_lib.library_tool().version_layout("s", as_of=0)
    assert sum(e["rows"] for e in layout0) == 5


def test_snapshot_keys(tmp_lib):
    tmp_lib.write("s", _df("2024-01-01", 2))
    tmp_lib.snapshot("snap1")
    keys = tmp_lib.library_tool().find_keys_for_symbol("SNAPSHOT_REF", "s")
    assert len(keys) == 1 and keys[0].version == 0
    snap = tmp_lib.library_tool().read_to_dataframe(keys[0])
    assert snap["symbols"] == {"s": 0}


def test_append_data_keys_and_remove_incompletes(tmp_lib):
    tmp_lib.stage("s", pd.DataFrame({"v": [1.0, 2.0]}))
    tmp_lib.stage("t", pd.DataFrame({"v": [3.0]}))
    lt = tmp_lib.library_tool()
    assert len(lt.find_keys_for_symbol("APPEND_DATA", "s")) >= 1
    chunk = lt.read_to_dataframe(lt.find_keys_for_symbol("APPEND_DATA", "s")[0])
    assert "v" in chunk.columns
    tmp_lib.admin_tools().remove_incompletes(["s", "never_staged"])
    assert lt.find_keys_for_symbol("APPEND_DATA", "s") == []
    assert len(lt.find_keys_for_symbol("APPEND_DATA", "t")) >= 1


def test_unknown_key_type_raises(tmp_lib):
    with pytest.raises(ValueError, match="key type"):
        tmp_lib.library_tool().find_keys_for_symbol("NOPE", "s")


def test_keytype_enum_and_output_format(spark, tmp_path):
    """KeyType / OutputFormat are str enums (reference admin_tools.py:37,
    options.py OutputFormat): size dicts accept the enum or the plain
    string, and read(output_format=OutputFormat.PANDAS) works."""
    import pandas as pd
    from arcticdb_spark import Arctic, KeyType, OutputFormat, Size
    lib = Arctic(str(tmp_path), spark).create_library("kt")
    lib.write("s", pd.DataFrame({"a": [1, 2]}))
    sizes = lib.admin_tools().get_sizes()
    assert sizes[KeyType.TABLE_DATA] == sizes["TABLE_DATA"]
    assert isinstance(sizes[KeyType.VERSION_REF], Size)
    assert sizes[KeyType.VERSION_REF].count == 1
    # library-level kinds always present (reference get_sizes covers all
    # key types); snapshots actually counted
    assert sizes[KeyType.LOG] == Size(0, 0)
    lib.snapshot("snap1")
    assert lib.admin_tools().get_sizes()[KeyType.SNAPSHOT_REF].count == 1
    out = lib.read("s", output_format=OutputFormat.PANDAS)
    assert list(out["a"]) == [1, 2]

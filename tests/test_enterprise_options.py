"""LibraryOptions / EnterpriseLibraryOptions surface (reference
options.py:21,300; arctic.py:376 modify_library_option;
storage/library_manager.hpp:19-25 option enums).

background_deletion is honored with the reference's contract: delete /
prune_previous_versions keep the same LOGICAL semantics (readers see the
data gone) but physical parquet files stay on disk for an out-of-band
deletion job. replication is persisted configuration (the oplog-driven
replication tool has no Spark analogue — storage-layer replication covers
it)."""

import glob
import os

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark import (Arctic, EnterpriseLibraryOptions, LibraryOptions,
                            ModifiableEnterpriseLibraryOption,
                            ModifiableLibraryOption, NoSuchVersionException)


def _frame(n=10, start="2024-01-01"):
    return pd.DataFrame(
        {"v": np.arange(n, dtype="int64")},
        index=pd.date_range(start, periods=n, freq="1h").rename("ts"))


def test_options_roundtrip_across_reopen(spark, tmp_path):
    ac = Arctic(str(tmp_path), spark)
    lib = ac.create_library(
        "lib",
        library_options=LibraryOptions(dynamic_schema=True, dedup=True,
                                       rows_per_segment=123,
                                       columns_per_segment=40),
        enterprise_library_options=EnterpriseLibraryOptions(
            replication=True, background_deletion=True))
    assert lib.rows_per_file == 123 and lib.dynamic_schema
    assert lib.dedup and lib.columns_per_segment == 40
    assert lib.enterprise_options() == EnterpriseLibraryOptions(
        replication=True, background_deletion=True)
    # a fresh open sees the persisted configuration
    lib2 = ac.get_library("lib")
    assert lib2.rows_per_file == 123 and lib2.dynamic_schema
    assert lib2.dedup and lib2.replication and lib2.background_deletion
    opts = lib2.options()
    assert opts.dedup and opts.columns_per_segment == 40


def test_modify_library_option_enums(spark, tmp_path):
    ac = Arctic(str(tmp_path), spark)
    lib = ac.create_library("lib")
    assert not lib.dedup and not lib.background_deletion
    ac.modify_library_option(lib, ModifiableLibraryOption.DEDUP, True)
    ac.modify_library_option(lib, ModifiableLibraryOption.ROWS_PER_SEGMENT,
                             77)
    ac.modify_library_option(
        lib, ModifiableEnterpriseLibraryOption.BACKGROUND_DELETION, True)
    ac.modify_library_option(
        lib, ModifiableEnterpriseLibraryOption.REPLICATION, True)
    assert lib.dedup and lib.rows_per_file == 77
    assert lib.background_deletion and lib.replication
    # persisted: a new open agrees
    lib2 = ac.get_library("lib")
    assert lib2.dedup and lib2.rows_per_file == 77
    assert lib2.background_deletion and lib2.replication
    with pytest.raises(Exception, match="unknown library option"):
        ac.modify_library_option(lib, "no_such_option", 1)


def test_library_dedup_default_applies_to_writes(spark, tmp_path):
    ac = Arctic(str(tmp_path), spark)
    lib = ac.create_library("lib",
                            library_options=LibraryOptions(dedup=True))
    pdf = _frame(50)
    lib.write("sym", pdf)
    m0 = lib._load_manifest("sym", 0)
    lib.write("sym", pdf)          # identical rewrite, no dedup= argument
    m1 = lib._load_manifest("sym", 1)
    assert {f.path for f in m1.files} == {f.path for f in m0.files}


def _data_files(lib, symbol):
    return glob.glob(os.path.join(lib._data_sym_dir(symbol),
                                  "data", "**", "*.parquet"),
                     recursive=True)


def test_background_deletion_defers_physical_delete(spark, tmp_path):
    ac = Arctic(str(tmp_path), spark)
    lib = ac.create_library(
        "lib", enterprise_library_options=EnterpriseLibraryOptions(
            background_deletion=True))
    lib.write("sym", _frame(20))
    files = _data_files(lib, "sym")
    assert files
    lib.delete("sym")
    # logically gone...
    assert not lib.has_symbol("sym")
    assert "sym" not in lib.list_symbols()
    with pytest.raises(NoSuchVersionException):
        lib.read("sym")
    # ...but the data files await the background-deletion job
    assert all(os.path.exists(f) for f in files)


def test_background_deletion_prune_keeps_old_files(spark, tmp_path):
    ac = Arctic(str(tmp_path), spark)
    lib = ac.create_library(
        "lib", enterprise_library_options=EnterpriseLibraryOptions(
            background_deletion=True))
    lib.write("sym", _frame(20))
    v0_files = [fe.path for fe in lib._load_manifest("sym", 0).files]
    lib.write("sym", _frame(20, start="2025-01-01"))
    lib.prune_previous_versions("sym")
    assert [v["version"] for v in lib.list_versions("sym")] == [1]
    assert all(os.path.exists(f) for f in v0_files)
    # reads of the live version are unaffected
    got = lib.read("sym", output_format="pandas")
    assert len(got) == 20 and got.index[0] == pd.Timestamp("2025-01-01")


def test_foreground_deletion_still_removes_files(spark, tmp_path):
    ac = Arctic(str(tmp_path), spark)
    lib = ac.create_library("lib")
    lib.write("sym", _frame(20))
    files = _data_files(lib, "sym")
    assert files
    lib.delete("sym")
    assert not any(os.path.exists(f) for f in files)

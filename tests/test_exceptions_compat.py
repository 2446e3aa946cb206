"""Exception-name compatibility with the reference's arcticdb.exceptions
(python/arcticdb/exceptions.py; error categories error_code.hpp:26-36)."""
import pandas as pd
import pytest

from arcticdb_spark import exceptions as ex
from arcticdb_spark.catalog import SortingException


def test_hierarchy_matches_reference():
    assert issubclass(ex.UnsortedDataException, SortingException)
    assert issubclass(ex.StreamDescriptorMismatch, ex.SchemaException)
    assert issubclass(ex.DataTooNestedException, ex.UserInputException)
    assert issubclass(ex.ArcticDuplicateSymbolsInBatchException,
                      ex.ArcticInvalidApiUsageException)
    assert ex.ArcticNativeException is ex.ArcticException
    assert ex.ArcticNativeNotYetImplemented is ex.ArcticDbNotYetImplemented
    for name in ("InternalException", "NormalizationException",
                 "MissingDataException", "StorageException",
                 "UserInputException", "CompatibilityException",
                 "CodecException", "NoSuchVersionException",
                 "LibraryNotFound", "LmdbMapFullError"):
        assert issubclass(getattr(ex, name), ex.ArcticException), name
    assert ex.ErrorCode.E_UNSORTED_DATA.value == 6000
    assert ex.ErrorCategory.SORTING.value == 6


def test_reference_catch_blocks_work(tmp_lib):
    # a user porting `except UnsortedDataException` from the reference
    bad = pd.DataFrame({"a": [1, 2]},
                       index=pd.DatetimeIndex(["2024-01-02", "2024-01-01"],
                                              name="ts"))
    with pytest.raises(ex.UnsortedDataException):
        tmp_lib.write("s", bad)
    # ...and the engine-native SortingException name still catches it too
    with pytest.raises(SortingException):
        tmp_lib.write("s", bad)


def test_unsupported_type_and_duplicate_batch(tmp_lib):
    from arcticdb_spark import WritePayload
    with pytest.raises(ex.ArcticUnsupportedDataTypeException):
        tmp_lib.write("s", {"not": "a frame"})
    p1 = WritePayload("dup", pd.DataFrame({"a": [1]}))
    p2 = WritePayload("dup", pd.DataFrame({"a": [2]}))
    with pytest.raises(ex.ArcticDuplicateSymbolsInBatchException):
        tmp_lib.write_batch([p1, p2])


def test_name_validation(tmp_lib, spark, tmp_path):
    """Reference name_validation.cpp rules: empty / >254-char / control
    chars / the documented unsupported set raise UserInputException for NEW
    symbols and snapshot names; library names add dot-part rules."""
    from arcticdb_spark.catalog import Arctic
    df = pd.DataFrame({"a": [1]})
    for bad in ("", "x" * 255, "bad*name", "bad<name", "b&d", "tab\tname",
                "unié"):
        with pytest.raises(ex.UserInputException):
            tmp_lib.write(bad, df)
    tmp_lib.write("ok name-255_ok", df)       # spaces etc. are fine
    with pytest.raises(ex.UserInputException):
        tmp_lib.snapshot("bad>snap")
    ac = Arctic(str(tmp_path), spark)
    for bad in ("", "lib..part", "trailingdot.", "a./slashpart", "x" * 255):
        with pytest.raises(ex.UserInputException):
            ac.create_library(bad)
    assert ac.create_library("ok.lib").name == "ok.lib"

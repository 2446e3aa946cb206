"""Ports of the reference's test_import.py (top-level API surface) and
test_errors.py (exception hierarchy contracts)."""

import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow



def test_top_level_imports():
    """Port of test_import.py test_top_level_imports:14-38."""
    import arcticdb_spark as adb
    for import_item in [
        "Arctic", "LibraryOptions", "QueryBuilder", "VersionedItem",
        "library", "set_config_from_env_vars", "DataError",
        "VersionRequestType", "ErrorCode", "ErrorCategory", "WritePayload",
        "ReadInfoRequest", "ReadRequest", "StagedDataFinalizeMethod",
        "WriteMetadataPayload",
    ]:
        assert hasattr(adb, import_item), f"{import_item} not found"


def test_set_config_from_env_vars():
    """Reference tools.py:34-95 parsing contract: type suffix, prefix
    stripping, '.'-joined names, unparseable values skipped."""
    from arcticdb_spark.tools import get_config, set_config_from_env_vars
    set_config_from_env_vars(None)  # no-op
    set_config_from_env_vars({
        "ARCTICDB_VersionMap_ReloadInterval_int": "120",
        "ARCTIC_NATIVE_S3_VerifySsl": "true",
        "ARCTICDB_Something_float": "1.5",
        "ARCTICDB_BadInt_int": "not-a-number",
        "UNRELATED": "ignored",
    })
    assert get_config("VERSIONMAP.RELOADINTERVAL") == 120
    assert get_config("S3.VERIFYSSL") == "true"
    assert get_config("SOMETHING") == 1.5
    assert get_config("BADINT") is None
    assert get_config("UNRELATED") is None


def test_base_exception_types():
    """Port of test_errors.py test_base_exception:30-32 — every exported
    exception subclasses ArcticException."""
    import arcticdb_spark.exceptions as ae
    from arcticdb_spark.exceptions import ArcticException
    for name in dir(ae):
        if name.endswith("Exception") or name.endswith("Error"):
            obj = getattr(ae, name)
            if isinstance(obj, type) and issubclass(obj, BaseException):
                assert issubclass(obj, ArcticException), name


def test_base_exception_is_runtimeerror():
    """Port of test_errors.py test_base_exception_is_runtimeerror:35-37."""
    from arcticdb_spark.exceptions import ArcticException
    with pytest.raises(RuntimeError):
        raise ArcticException("A bad thing happened")


def test_pickling_error_on_append(spark, tmp_path):
    """Port of test_errors.py test_pickling_error:44-47: appending to a
    pickled symbol raises."""
    from arcticdb_spark.catalog import Arctic, ArcticException
    lib = Arctic(str(tmp_path), spark).create_library("err")
    lib.write_pickle("sym", [1, 2, 3])
    with pytest.raises(ArcticException):
        lib.append("sym", pd.DataFrame({"a": [4, 5, 6]}))


def test_write_metadata_batch_payloads(spark, tmp_path):
    """WriteMetadataPayload drives write_metadata_batch like the singular
    API (reference library.py:245,2568)."""
    from arcticdb_spark import Arctic, WriteMetadataPayload
    lib = Arctic(str(tmp_path), spark).create_library("wmb")
    lib.write("a", pd.DataFrame({"x": [1]}))
    lib.write("b", pd.DataFrame({"x": [2]}))
    outs = lib.write_metadata_batch([WriteMetadataPayload("a", {"m": 1}),
                                     WriteMetadataPayload("b", {"m": 2})])
    assert len(outs) == 2
    assert lib.read_metadata("a").metadata == {"m": 1}
    assert lib.read_metadata("b").metadata == {"m": 2}

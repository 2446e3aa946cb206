"""Ported from the reference's
``python/tests/unit/arcticdb/version_store/test_version_chain.py``:
every version-creating operation continues the monotonic chain after a
delete_version of the latest (v0, v1, delete v1 -> next op writes v2,
never reuses 1)."""
import numpy as np
import pandas as pd
import pytest


@pytest.mark.parametrize(
    "operation", ["update", "append", "sort_index", "delete_range",
                  "restore_version", "batch_restore_version"])
def test_version_chain_increasing(tmp_lib, operation):
    lib = tmp_lib
    sym = "sym"
    df = pd.DataFrame({"col": [1, 2, 3]},
                      index=pd.date_range(start=pd.Timestamp(0), periods=3,
                                          freq="ns"))
    df_2 = pd.DataFrame({"col": [1, 2, 6]},
                        index=pd.date_range(start=pd.Timestamp(0),
                                            periods=3, freq="ns"))

    def execute_operation():
        if operation == "update":
            upd = pd.DataFrame({"col": [4, 5]},
                               index=pd.date_range(start=pd.Timestamp(1),
                                                   periods=2, freq="ns"))
            lib.update(sym, upd)
        elif operation == "append":
            app = pd.DataFrame({"col": [4, 5]},
                               index=pd.date_range(start=pd.Timestamp(3),
                                                   periods=2, freq="ns"))
            lib.append(sym, app)
        elif operation == "sort_index":
            lib.sort_index(sym)
        elif operation == "delete_range":
            lib.delete(sym, date_range=(pd.Timestamp(1), pd.Timestamp(1)))
        elif operation == "restore_version":
            lib.restore_version(sym, 0)
        elif operation == "batch_restore_version":
            lib.batch_restore_version([sym], [0])

    lib.write(sym, df)
    assert lib.read_metadata(sym).version == 0
    lib.write(sym, df_2)
    assert lib.read_metadata(sym).version == 1
    lib.delete_version(sym, 1)
    assert lib.read_metadata(sym).version == 0
    execute_operation()
    assert lib.read_metadata(sym).version == 2

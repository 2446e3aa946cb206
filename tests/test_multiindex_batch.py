"""MultiIndex normalization roundtrip + concurrent batch ops."""

import numpy as np
import pandas as pd
import pytest


def _mi_frame(n_ts=50, syms=("AAPL", "MSFT", "GOOG")):
    ts = pd.date_range("2024-01-01", periods=n_ts, freq="1h")
    idx = pd.MultiIndex.from_product([ts, list(syms)], names=["ts", "symbol"])
    rng = np.random.default_rng(7)
    return pd.DataFrame({"price": rng.random(len(idx)).round(6),
                         "size": rng.integers(1, 100, len(idx))}, index=idx)


class TestMultiIndex:
    def test_roundtrip(self, tmp_lib):
        pdf = _mi_frame()
        tmp_lib.write("mi", pdf)
        out = tmp_lib.read("mi", output_format="pandas")
        assert isinstance(out.index, pd.MultiIndex)
        assert out.index.names == ["ts", "symbol"]
        out = out.sort_index()
        exp = pdf.sort_index()
        pd.testing.assert_frame_equal(
            out, exp, check_index_type=False, check_dtype=False)

    def test_unnamed_level_roundtrip(self, tmp_lib):
        ts = pd.date_range("2024-01-01", periods=10, freq="1D")
        idx = pd.MultiIndex.from_product([ts, [0, 1]])  # unnamed levels
        pdf = pd.DataFrame({"v": np.arange(len(idx))}, index=idx)
        tmp_lib.write("mi2", pdf)
        out = tmp_lib.read("mi2", output_format="pandas")
        assert isinstance(out.index, pd.MultiIndex)
        assert len(out) == len(pdf)
        assert sorted(out["v"]) == list(range(len(idx)))

    def test_physical_columns_on_spark_side(self, tmp_lib):
        pdf = _mi_frame(10)
        tmp_lib.write("mi", pdf)
        sdf = tmp_lib.read("mi")  # spark output keeps demoted columns
        assert "__idx__symbol" in sdf.columns
        assert "ts" in sdf.columns

    def test_query_on_demoted_level(self, tmp_lib):
        from arcticdb_spark.query import QueryBuilder
        pdf = _mi_frame(20)
        tmp_lib.write("mi", pdf)
        q = QueryBuilder()
        q = q[q["__idx__symbol"] == "AAPL"]
        out = tmp_lib.read("mi", query_builder=q, output_format="pandas")
        assert isinstance(out.index, pd.MultiIndex)
        assert set(out.index.get_level_values("symbol")) == {"AAPL"}
        assert len(out) == 20

    def test_append_preserves_norm_meta(self, tmp_lib):
        pdf = _mi_frame(10)
        tmp_lib.write("mi", pdf)
        nxt = _mi_frame(5)
        shift = pd.Timedelta(days=30)
        nxt.index = nxt.index.set_levels(nxt.index.levels[0] + shift, level=0)
        tmp_lib.append("mi", nxt)
        out = tmp_lib.read("mi", output_format="pandas")
        assert isinstance(out.index, pd.MultiIndex)
        assert len(out) == len(pdf) + len(nxt)


class TestBatchOps:
    def test_write_read_batch(self, tmp_lib):
        frames = []
        for i in range(6):
            ts = pd.date_range("2024-01-01", periods=100, freq="1h")
            frames.append((f"s{i}", pd.DataFrame(
                {"ts": ts, "v": np.arange(100) + i * 1000})))
        manifests = tmp_lib.write_batch(frames)
        assert [m.symbol for m in manifests] == [f"s{i}" for i in range(6)]
        outs = tmp_lib.read_batch([f"s{i}" for i in range(6)],
                                  output_format="pandas")
        for i, out in enumerate(outs):
            assert list(out.sort_values("ts")["v"]) == list(
                np.arange(100) + i * 1000)

    def test_read_metadata_batch(self, tmp_lib):
        for i in range(4):
            ts = pd.date_range("2024-01-01", periods=5, freq="1h")
            tmp_lib.write(f"m{i}", pd.DataFrame({"ts": ts, "v": range(5)}),
                          metadata={"i": i})
        metas = tmp_lib.read_metadata_batch([f"m{i}" for i in range(4)])
        assert [m.metadata["i"] for m in metas] == [0, 1, 2, 3]

    def test_append_batch(self, tmp_lib):
        ts = pd.date_range("2024-01-01", periods=10, freq="1h")
        for i in range(3):
            tmp_lib.write(f"a{i}", pd.DataFrame({"ts": ts, "v": range(10)}))
        later = pd.date_range("2024-06-01", periods=5, freq="1h")
        tmp_lib.append_batch([
            (f"a{i}", pd.DataFrame({"ts": later, "v": range(5)}))
            for i in range(3)])
        for i in range(3):
            assert tmp_lib.read(f"a{i}").count() == 15

    def test_delete_batch(self, tmp_lib):
        ts = pd.date_range("2024-01-01", periods=3, freq="1h")
        for i in range(3):
            tmp_lib.write(f"d{i}", pd.DataFrame({"ts": ts, "v": range(3)}))
        tmp_lib.delete_batch(["d0", "d2"])
        assert tmp_lib.list_symbols() == ["d1"]


# ---------------------------------------------------------------------------
# Batch request objects + admin tools (reference library.py:191,278,338,3521)
# ---------------------------------------------------------------------------

def test_read_batch_with_read_requests(tmp_lib):
    import pandas as pd
    from arcticdb_spark.catalog import ReadRequest
    from arcticdb_spark.query import QueryBuilder
    f = pd.DataFrame({"ts": pd.date_range("2024-01-01", periods=10, freq="1D"),
                      "v": [float(i) for i in range(10)]})
    tmp_lib.write("a", f)
    tmp_lib.write("b", f)
    tmp_lib.write("b", f.assign(v=f["v"] * 10))  # version 1
    q = QueryBuilder()
    q = q[q["v"] >= 5.0]
    outs = tmp_lib.read_batch([
        ReadRequest("a", query_builder=q),
        ReadRequest("b", as_of=0),
        "b",
    ])
    assert outs[0].count() == 5
    assert outs[1].toPandas()["v"].max() == 9.0
    assert outs[2].toPandas()["v"].max() == 90.0


def test_write_batch_payloads_and_info_requests(tmp_lib):
    import pandas as pd
    from arcticdb_spark.catalog import ReadInfoRequest, WritePayload
    f = pd.DataFrame({"ts": pd.date_range("2024-01-01", periods=4), "v": [1.0, 2, 3, 4]})
    tmp_lib.write_batch([WritePayload("w1", f, {"m": 1}), ("w2", f)])
    assert tmp_lib.read_metadata("w1").metadata == {"m": 1}
    tmp_lib.write("w2", f, metadata={"m": 2})  # version 1
    metas = tmp_lib.read_metadata_batch([ReadInfoRequest("w2", as_of=0), "w2"])
    assert [m.metadata for m in metas] == [None, {"m": 2}]
    assert [m.version for m in metas] == [0, 1]
    descs = tmp_lib.get_description_batch([ReadInfoRequest("w1"), "w2"])
    assert all(d["row_count"] == 4 for d in descs)


def test_admin_tools_sizes(tmp_lib):
    import pandas as pd
    f = pd.DataFrame({"ts": pd.date_range("2024-01-01", periods=100, freq="1h"),
                      "v": [float(i) for i in range(100)]})
    tmp_lib.write("s", f)
    tmp_lib.append("s", f.assign(ts=f["ts"] + pd.Timedelta(days=30)))
    tmp_lib.stage("s", f.assign(ts=f["ts"] + pd.Timedelta(days=60)))
    at = tmp_lib.admin_tools()
    sizes = at.get_sizes()
    assert sizes["VERSION_REF"].count == 1 and sizes["VERSION_REF"].bytes > 0
    assert sizes["VERSION"].count == 2
    assert sizes["TABLE_DATA"].count >= 2 and sizes["TABLE_DATA"].bytes > 0
    assert sizes["APPEND_DATA"].count >= 1
    by_sym = at.get_sizes_by_symbol()
    assert set(by_sym) == {"s"}
    assert by_sym["s"]["TABLE_DATA"].bytes == sizes["TABLE_DATA"].bytes

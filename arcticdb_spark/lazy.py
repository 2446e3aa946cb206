"""LazyDataFrame surface — reference ``library.py:442-817`` (``lazy=True``
reads, ``col()``, ``LazyDataFrameCollection``, ``concat``).

Spark DataFrames are lazy natively; this wrapper exists for API parity: it
records QueryBuilder clauses *after* a read was requested and materializes
on ``collect()``. ``collect()`` returns the distributed DataFrame (call
``.toPandas()``/``.toArrow()`` for local data) — at 100 TB you almost never
want driver-side collection."""

from __future__ import annotations

from arcticdb_spark.query import QueryBuilder
from arcticdb_spark.expr import ExpressionNode


class LazyDataFrame(QueryBuilder):
    """A pending read + clause chain. Supports the same fluent ops as
    QueryBuilder plus ``collect()``."""

    def __init__(self, lib, symbol: str, read_kwargs: dict | None = None):
        super().__init__()
        self._lib = lib
        self._symbol = symbol
        self._read_kwargs = read_kwargs or {}

    def collect(self):
        kw = dict(self._read_kwargs)
        kw["query_builder"] = self
        return self._lib.read(self._symbol, **kw)

    def __repr__(self):
        return (f"LazyDataFrame({self._symbol!r}, "
                f"clauses={[k for k, _ in self._clauses]})")


class LazyDataFrameCollection:
    """Reference ``LazyDataFrameCollection``: N lazy reads sharing an
    optional clause chain; ``concat`` merges them into one LazyDataFrame."""

    def __init__(self, lazy_dfs: list[LazyDataFrame]):
        self._dfs = list(lazy_dfs)

    def lazy_dataframes(self) -> list[LazyDataFrame]:
        return self._dfs

    def collect(self):
        return [df.collect() for df in self._dfs]

    def concat(self, join: str = "outer"):
        from arcticdb_spark.operators.concat import concat as _concat
        frames = [df.collect() for df in self._dfs]
        return _concat(frames, join=join)


def concat(collection_or_dfs, join: str = "outer"):
    if isinstance(collection_or_dfs, LazyDataFrameCollection):
        return collection_or_dfs.concat(join)
    from arcticdb_spark.operators.concat import concat as _concat
    return _concat(list(collection_or_dfs), join=join)

"""TimeFrame: the reference's lightweight numpy timeseries input kind
(``python/arcticdb/version_store/_common.py:32-142``): a ns-resolution
times array plus parallel named value arrays. Symbols written from a
TimeFrame read back AS a TimeFrame on pandas-style output (reference
TimeFrameNormalizer, ``_normalization.py:1478-1520``), with date_range /
column selection applying as usual.

Re-expressed for this engine (not a copy): the class is a thin NamedTuple
with the same public surface — ``iloc`` / ``tsloc`` slicing proxies,
``issorted``, array-wise equality.
"""

from __future__ import annotations

from datetime import datetime
from typing import AnyStr, List, NamedTuple

import numpy as np

_NS = np.dtype("datetime64[ns]")


class TimeFrame(NamedTuple("TimeFrame",
                           [("times", np.ndarray),
                            ("columns_names", List[AnyStr]),
                            ("columns_values", List[np.ndarray])])):
    """times: datetime64[ns] array; columns_values[i] aligns with times."""

    def __new__(cls, times, columns_names, columns_values):
        if not isinstance(times, np.ndarray) or times.dtype != _NS:
            raise TypeError(
                f"times must be a datetime64[ns] ndarray, got "
                f"{type(times)}({getattr(times, 'dtype', None)})")
        if len(columns_names) != len(columns_values):
            raise ValueError(
                f"columns_names and columns_values must align: "
                f"{len(columns_names)} != {len(columns_values)}")
        bad = [cv.shape[0] for cv in columns_values
               if cv.shape[0] != times.shape[0]]
        if bad:
            raise ValueError(
                f"column value lengths {bad} do not match "
                f"times.shape[0]={times.shape[0]}")
        return tuple.__new__(cls, (times, columns_names, columns_values))

    # -- positional / timestamp slicing -------------------------------
    def _slice(self, rows, cols=None):
        names, values = self.columns_names, self.columns_values
        if cols is not None:
            if isinstance(cols, int):
                names, values = [names[cols]], [values[cols]]
            elif isinstance(cols, str):
                i = names.index(cols)
                names, values = [names[i]], [values[i]]
            elif isinstance(cols, slice):
                names, values = names[cols], values[cols]
            else:
                raise TypeError(
                    f"column selector must be slice/int/str, got {cols!r}")
        if isinstance(rows, int):
            rows = slice(rows, rows + 1)
        if not isinstance(rows, slice):
            raise TypeError(f"row selector must be slice/int, got {rows!r}")
        return TimeFrame(self.times[rows], list(names),
                         [v[rows] for v in values])

    class _Iloc:
        def __init__(self, tf):
            self._tf = tf

        def __getitem__(self, item):
            if isinstance(item, tuple):
                if len(item) != 2:
                    raise ValueError("iloc supports (rows, columns) only")
                return self._tf._slice(item[0], item[1])
            return self._tf._slice(item)

    @property
    def iloc(self):
        return TimeFrame._Iloc(self)

    class _TsLoc:
        def __init__(self, tf):
            self._tf = tf

        def _rows(self, item):
            import pandas as pd

            def ns(v):
                return np.datetime64(pd.Timestamp(v).value, "ns")
            # inclusive stop: searchsorted side="right" keeps rows == stop
            lo = (np.searchsorted(self._tf.times, ns(item.start), "left")
                  if item.start is not None else None)
            hi = (np.searchsorted(self._tf.times, ns(item.stop), "right")
                  if item.stop is not None else None)
            return slice(lo, hi, item.step)

        def __getitem__(self, item):
            if isinstance(item, tuple):
                if len(item) != 2:
                    raise ValueError("tsloc supports (rows, columns) only")
                return self._tf._slice(self._rows(item[0]), item[1])
            return self._tf._slice(self._rows(item))

    @property
    def tsloc(self):
        return TimeFrame._TsLoc(self)

    @property
    def issorted(self) -> bool:
        return bool(np.all(self.times[:-1] <= self.times[1:]))

    def __eq__(self, other):
        if other is None:
            return False
        if other is self:
            return True
        if (self.times.shape != other.times.shape
                or len(self.columns_values) != len(other.columns_values)):
            return False
        return (np.array_equal(self.times, other.times)
                and list(self.columns_names) == list(other.columns_names)
                and all(np.array_equal(a, b) for a, b in
                        zip(self.columns_values, other.columns_values)))

    def __ne__(self, other):
        return not self.__eq__(other)

    __hash__ = None

"""Idempotent append with exponential inline defragmentation — the
reference's ``arcticdb/util/append_and_defrag.py``: a tick-collector
append pattern that keeps the row-slice layout at a bounded number of
files per symbol WITHOUT ever rewriting the whole symbol.

The trick: maintain slice sizes on a geometric ladder
(``[target, target/factor, target/factor^2, ...]``). Each call appends
new rows; when the trailing run of small slices plus the new rows
reaches the next ladder level, the call re-reads ONLY that tail
(``date_range=(ts, None)``) and splices it back as one slice via
``update`` — an O(tail) rewrite, never O(symbol). At 100 TB this is what
keeps an append-only symbol at O(log) slices per target's worth of data
while every individual call touches only the fragmented tail.

Idempotent: re-sending a dataframe whose index starts at or before the
symbol's last stored timestamp is a no-op (exactly-once pipelines built
from at-least-once delivery).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import pandas as pd

from arcticdb_spark.exceptions import ArcticException


def generate_levels(target_rows_per_slice: int, factor: int) -> List[int]:
    """Geometric defrag thresholds (reference ``_generate_levels``):
    [target, target//factor, ...] down to (excluding) 1."""
    levels = []
    while target_rows_per_slice > 1:
        levels.append(target_rows_per_slice)
        target_rows_per_slice //= factor
    return levels


def generate_date_to_read_from(
        start_indexes: List[pd.Timestamp], start_rows: List[int],
        end_rows: List[int], new_df_row_count: int,
        levels: List[int], threshold: float) -> Optional[pd.Timestamp]:
    """First timestamp of the trailing slice-run that should be rewritten,
    or None when no defrag is due (reference
    ``_generate_date_to_read_from``, pinned by its unit tests): find the
    first slice smaller than ``threshold * level``; if the run from there
    plus the new rows reaches the level, rewrite from its start —
    otherwise recurse one ladder level down over the same tail."""
    if len(start_rows) != len(end_rows) or len(start_rows) != len(start_indexes):
        raise ArcticException(
            "generate_date_to_read_from: start/end/index lists must align")
    if not levels or not start_rows or new_df_row_count == 0:
        return None
    row_counts = [e - s for s, e in zip(start_rows, end_rows)]
    for idx, row_count in enumerate(row_counts):
        if row_count < threshold * levels[0]:
            if (end_rows[-1] - start_rows[idx]) + new_df_row_count >= levels[0]:
                return start_indexes[idx]
            return generate_date_to_read_from(
                start_indexes[idx:], start_rows[idx:], end_rows[idx:],
                new_df_row_count, levels[1:], threshold)
    return None


def defrag_timeseries(lib, sym: str) -> None:
    """Compact an append-only symbol's fragmented TAIL (reference
    ``arcticdb/util/defrag_timeseries.py``): skip the leading run of
    already-full slices, read everything from the first non-full slice
    onward (one row_range read) and splice it back via ``update`` — an
    O(tail) rewrite that leaves full slices untouched. No-op when only
    the final slice exists or nothing is fragmented."""
    target = lib.rows_per_file
    index = lib.read_index(sym)
    row_counts = (index["end_row"] - index["start_row"]).tolist()
    idx = 0
    for row_count in row_counts:
        if row_count == target:
            idx += 1
        else:
            break
    if idx < len(index) and index["start_row"].iloc[idx] != index["start_row"].iloc[-1]:
        df = lib.read(sym, row_range=(int(index["start_row"].iloc[idx]),
                                      int(index["end_row"].iloc[-1])),
                      output_format="pandas")
        lib.update(sym, df)


def append_and_defrag_idempotent(lib, items: List[Tuple[str, pd.DataFrame]],
                                 factor: int, threshold: float = 0.9) -> None:
    """Append each (symbol, df) with inline exponential defragmentation
    (reference ``_append_and_defrag_idempotent`` — see module docstring
    for the slice-ladder mechanics and the caveats: timeseries-only,
    append-only symbols, single writer, constant ``factor``)."""
    if factor <= 1:
        raise ArcticException(f"factor must be >1, received {factor}")
    if not (0 < threshold <= 1):
        raise ArcticException(
            f"threshold must be in (0, 1], received {threshold}")
    levels = generate_levels(lib.rows_per_file, factor)
    payloads = []
    for symbol, append_df in items:
        tail_df = None
        if lib.has_symbol(symbol):
            index = lib.read_index(symbol)
            # idempotency: never append data at or before the stored end
            # (end_index is END-EXCLUSIVE like the reference's index
            # segment: last ts + 1ns — strictly-less means "<= max ts")
            start_new = append_df.index[0]
            if start_new < index["end_index"].iloc[-1]:
                continue
            ts_from = generate_date_to_read_from(
                list(index.index),   # read_index is start_index-indexed
                index["start_row"].to_list(),
                index["end_row"].to_list(),
                len(append_df), levels, threshold)
            if ts_from is not None:
                tail_df = lib.read(symbol, date_range=(ts_from, None),
                                   output_format="pandas")
        if tail_df is not None and len(tail_df):
            update_df = pd.concat([tail_df, append_df])
            if not update_df.index.is_monotonic_increasing:
                raise ArcticException(
                    "append_and_defrag: expected monotonically increasing "
                    "index")
        else:
            update_df = append_df
        payloads.append((symbol, update_df))
    if payloads:
        lib.update_batch(payloads, upsert=True)

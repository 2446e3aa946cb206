"""Reference-exact compaction planning (CompactDataClause).

Pure manifest-level planning — no data is touched. The semantics are ported
from the reference's CompactDataClause
(``cpp/arcticdb/processing/clause_compact_data.cpp``):

- acceptable-size bounds: ``min = max(2*rps//3, 1)``,
  ``max = max(4*rps//3, rps+1)`` (clause_compact_data.cpp:34-37 — chosen so
  two sub-min slices never combine past max, and a just-over-max slice
  halves into two >= min slices);
- greedy grouping of row slices: ``structure_row_ranges``
  (clause_compact_data.cpp:57-104);
- short-circuit when every slice is already in-bounds, and keep-in-place of
  groups that exactly match an existing in-bounds slice:
  ``structure_for_processing`` (clause_compact_data.cpp:106-150);
- output slicing of each rewritten group: ``ReslicingInfo``
  (column_store/column_reslicer.hpp:23-56) — ``num = ceil(T/max)`` slices,
  the FIRST ``num - T % num`` of size ``T // num`` and the remainder one row
  larger.

Planning is O(#slices) driver-side arithmetic over the manifest; the actual
rewrite (in ``catalog.Library.compact_symbol``) reads ONLY the files of the
groups that change — at 100 TB a compaction after a ragged append tail
touches the tail, not the symbol.
"""

from __future__ import annotations


def compact_bounds(rows_per_segment: int) -> tuple[int, int]:
    """(min, max) acceptable rows per slice (clause_compact_data.cpp:34-37)."""
    min_rps = max((2 * rows_per_segment) // 3, 1)
    max_rps = max((4 * rows_per_segment) // 3, rows_per_segment + 1)
    return min_rps, max_rps


def structure_row_ranges(ranges: list[tuple[int, int]], rps: int,
                         min_rps: int, max_rps: int
                         ) -> list[tuple[int, int]]:
    """Greedy covering of input row ranges into candidate output groups
    (clause_compact_data.cpp:57-104). Keeps absorbing the next slice while
    the current group is below min, or absorbing keeps it <= rps, or brings
    it closer to rps; the final group is folded backwards if sub-min."""
    if not ranges:
        return []
    res: list[tuple[int, int]] = []
    cur_s, cur_e = ranges[0]
    for s, e in ranges[1:]:
        cur_d = cur_e - cur_s
        d = e - s
        if (cur_d < min_rps or cur_d + d <= rps
                or 2 * cur_d + d < 2 * rps):
            cur_e = e
        else:
            res.append((cur_s, cur_e))
            cur_s, cur_e = s, e
    if (cur_e - cur_s) >= min_rps or not res:
        res.append((cur_s, cur_e))
    else:
        ls, _ = res.pop()
        res.append((ls, cur_e))
    # the last group can still be sub-min: merge with its predecessor
    if len(res) >= 2 and (res[-1][1] - res[-1][0]) < min_rps:
        _, le = res.pop()
        ps, _ = res.pop()
        res.append((ps, le))
    return res


def reslice_sizes(total: int, max_rps: int) -> list[int]:
    """Output slice sizes for one rewritten group (ReslicingInfo,
    column_reslicer.hpp:23-56): near-even split into ceil(total/max) slices,
    exact-size slices first, one-larger slices last."""
    num = -(-total // max_rps)
    base, rem = divmod(total, num)
    return [base] * (num - rem) + [base + 1] * rem


def compact_plan(slices: list[tuple[int, int]], rows_per_segment: int
                 ) -> list[tuple] | None:
    """Full compaction plan for the given input row slices.

    Returns ``None`` when compaction is a no-op (every slice already within
    bounds, or every greedy group coincides with an in-bounds existing
    slice — clause_compact_data.cpp:125-148). Otherwise returns a list of
    plan entries covering [0, total) in order:

    - ``("keep", start, end)`` — an existing slice carried verbatim (its
      file is NOT rewritten and keeps its original data key / version);
    - ``("rewrite", start, end, sizes)`` — the rows in [start, end) are
      re-read and written as ``len(sizes)`` new slices of exactly those
      row counts.
    """
    if not slices:
        return None
    min_rps, max_rps = compact_bounds(rows_per_segment)
    if all(min_rps <= e - s <= max_rps for s, e in slices):
        return None
    groups = structure_row_ranges(slices, rows_per_segment, min_rps, max_rps)
    existing = set(slices)
    plan: list[tuple] = []
    any_work = False
    for s, e in groups:
        if (s, e) in existing and (e - s) <= max_rps:
            plan.append(("keep", s, e))
        else:
            any_work = True
            plan.append(("rewrite", s, e, reslice_sizes(e - s, max_rps)))
    return plan if any_work else None

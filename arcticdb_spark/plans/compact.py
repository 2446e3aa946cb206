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


def append_compact_plan(slices: list[tuple[int, int]], frame_rows: int,
                        rows_per_segment: int) -> list[tuple] | None:
    """Plan for ``append(..., compact_data=True)``: the appended frame is
    treated as ONE row slice regardless of the slicing policy
    (clause_compact_data.cpp:115-124), the processed group whose existing
    data ends at the frame offset absorbs just enough leading frame rows to
    complete its ReslicingInfo layout (add_segment_from_frame,
    clause_compact_data.cpp:245-275), and the frame REMAINDER is sliced by
    ``ReslicingInfo(remaining, max)`` — not the library policy
    (slice_and_write_frame_remainder, version_core.cpp:3228-3266).

    Returns ``None`` for a plain append (everything already acceptable, or
    no existing slice needs rewriting — the reference's
    "ranges_and_keys empty after erasure" short-circuit), else keep/rewrite
    entries covering [0, off + frame_rows).
    """
    min_rps, max_rps = compact_bounds(rows_per_segment)
    off = slices[-1][1] if slices else 0
    end = off + frame_rows
    ranges = list(slices)
    if frame_rows > 0:
        ranges.append((off, end))
    if not ranges:
        return None
    if all(min_rps <= e - s <= max_rps for s, e in ranges):
        return None
    groups = structure_row_ranges(ranges, rows_per_segment, min_rps, max_rps)
    existing = set(slices)
    plan: list[tuple] = []
    disk_work = False
    remainder_start = off
    for s, e in groups:
        if (s, e) in existing and (e - s) <= max_rps:
            plan.append(("keep", s, e))
            continue
        if s >= off:
            continue  # pure-frame group: handled as remainder
        disk_work = True
        disk_end = min(e, off)
        if disk_end == off and frame_rows > 0:
            # boundary group: disk rows d plus the frame, cut at the first
            # ReslicingInfo(d + frame_rows, max) boundary past the disk
            d = off - s
            c = 0
            for sz in reslice_sizes(d + frame_rows, max_rps):
                c += sz
                if c > d:
                    break
            plan.append(("rewrite", s, s + c, reslice_sizes(c, max_rps)))
            remainder_start = s + c
        else:
            plan.append(("rewrite", s, e, reslice_sizes(e - s, max_rps)))
    if not disk_work:
        return None
    if remainder_start < end:
        plan.append(("rewrite", remainder_start, end,
                     reslice_sizes(end - remainder_start, max_rps)))
    return plan

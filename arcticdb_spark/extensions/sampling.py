"""Deterministic sampling / split assignment for training-data pipelines
(build-brief extension family; no reference analogue — the reference's
query surface stops at filters).

Sampling for dataset curation must be REPRODUCIBLE and CONTENT-ADDRESSED:
the same document lands in the same split on every run, on any cluster
size, regardless of partitioning — so engine RNGs (``df.sample``,
``rand()``) are the wrong tool (partition-dependent, not replayable across
engines). Instead each key is hashed with a Lehmer multiplicative
congruential step over the Mersenne prime 2^31-1:

    bucket(key) = ((key mod M) * 48271) mod M,  M = 2147483647

iterated TWICE over an offset key (one round never wraps for small
sequential ids — bucket would stay monotone in the key and the "sample"
would be a prefix; the second round wraps many times and disperses). The
composition is a fixed permutation of the residues — uniform,
deterministic, and expressible in exact int64 arithmetic in ANY SQL engine
(each product is < 2^47, so no overflow under ANSI semantics; the DuckDB
oracle replays it verbatim). Salting shifts the permutation for
independent re-draws.

At 100 TB these are pure narrow column expressions on the scan — no
shuffle, no state, fully pushdown-compatible when the bucket filter
feeds a partition-pruned column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_M = 2_147_483_647          # 2^31 - 1 (Mersenne prime)
_A = 48_271                 # Lehmer / MINSTD multiplier


_OFFSET = 1_000_003         # pushes small sequential ids past the first wrap


def _bucket(key: Column, salt: int = 0) -> Column:
    """Deterministic bucket in [0, M): two Lehmer steps on the offset key."""
    k = (key.cast("long") + F.lit(int(salt)) + F.lit(_OFFSET)) % F.lit(_M)
    k = (k * F.lit(_A)) % F.lit(_M)
    return (k * F.lit(_A)) % F.lit(_M)


def hash_sample(df: DataFrame, key_col: str, fraction: float,
                salt: int = 0) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, selected by key hash.

    The same key always makes the same in/out decision (content-addressed
    sampling) — rerunning on re-partitioned or appended data keeps every
    previously-sampled row.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    thresh = int(fraction * _M)
    return df.filter(_bucket(F.col(key_col), salt) < F.lit(thresh))


def assign_split(df: DataFrame, key_col: str,
                 fractions: dict[str, float] | None = None,
                 salt: int = 0, out_col: str = "split") -> DataFrame:
    """Append a deterministic split label column (train/val/test ...).

    ``fractions`` maps label -> share, summing to <= 1.0 (a shortfall goes
    to the LAST label). Default 0.98/0.01/0.01 train/val/test.
    """
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    b = _bucket(F.col(key_col), salt)
    expr = None
    acc = 0.0
    labels = list(fractions.items())
    for name, frac in labels[:-1]:
        acc += frac
        cond = b < F.lit(int(acc * _M))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def stratified_hash_sample(df: DataFrame, key_col: str, strata_col: str,
                           fractions: dict[str, float],
                           default_fraction: float = 0.0,
                           salt: int = 0) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing:
    keep 10% of English, 100% of low-resource languages).

    A narrow expression — the per-stratum threshold is a CASE over
    ``strata_col``; no join, no shuffle, safe at any scale.
    """
    b = _bucket(F.col(key_col), salt)
    thresh = None
    for stratum, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {stratum!r} must be in [0,1]")
        cond = F.col(strata_col) == F.lit(stratum)
        t = F.lit(int(frac * _M))
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = thresh.otherwise(F.lit(int(default_fraction * _M)))
    return df.filter(b < thresh)


def shuffle_deterministic(df: DataFrame, key_col: str, n_shards: int,
                          salt: int = 0,
                          shard_col: str = "shard",
                          order_col: str = "shuffle_key") -> DataFrame:
    """Deterministic global shuffle for training-order assignment: every
    row gets a content-addressed permutation key and a shard id — the same
    corpus shuffles identically on every run, any cluster size, any engine
    (the Lehmer bucket is exact int64 math, replayable in SQL).

    ``shard = bucket % n_shards`` balances shards to within the hash's
    uniformity; ``order_col`` orders rows WITHIN a shard (sort each shard
    by it when writing training files). At 100 TB this is a narrow
    projection; the only shuffle is the writer's own
    ``repartition(n_shards, shard)`` — one exchange, no global sort (a
    total order across 100 TB is never materialized; shard-local order is
    what data loaders consume).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    b = _bucket(F.col(key_col), salt)
    return (df.withColumn(order_col, b)
              .withColumn(shard_col, (b % F.lit(int(n_shards))).cast("int")))

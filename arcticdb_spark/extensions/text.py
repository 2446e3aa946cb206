"""Text analysis for large-scale training-data pipelines.

All operators are pure ``pyspark.sql.functions`` column expressions — no
Python UDFs anywhere, so they run inside whole-stage codegen and scale
linearly with executors (the hot path for a 100 TB documents table is a
single parquet scan + map, zero shuffles).

Patterns deliberately use only regex constructs with identical semantics in
Spark (Java regex) and DuckDB (RE2) so results are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny multilingual stopword inventories for the n-gram/stopword language
# heuristic; picked for distinctiveness, not completeness
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour"],
    "es": ["el", "los", "las", "una", "por", "para", "con", "del"],
}

_EN_STOPWORDS = _LANG_MARKERS["en"] + ["a", "an", "it", "on", "as", "at", "by"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty string -> empty array (not [''])."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(t, r"\s+"))


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def word_stat_columns(text: Column) -> dict[str, Column]:
    """Quality-scoring features: length / punctuation / stopword ratios,
    mean word length — the usual pre-training quality filters."""
    toks = tokens(text)
    n_chars = F.length(text).cast("long")
    n_tokens = F.size(toks).cast("long")
    n_punct = F.length(F.regexp_replace(text, r"[^.,!?;:]", "")).cast("long")
    stop_arr = F.array(*[F.lit(w) for w in _EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t)))).cast("long")
    mean_word_len = F.when(n_tokens > 0,
                           F.round((n_chars - (n_tokens - 1)) / n_tokens.cast("double"), 6))
    punct_ratio = F.when(n_chars > 0, F.round(n_punct / n_chars.cast("double"), 6)).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, F.round(n_stop / n_tokens.cast("double"), 6)).otherwise(F.lit(0.0))
    return {"n_chars": n_chars, "n_tokens": n_tokens, "n_punct": n_punct,
            "punct_ratio": punct_ratio, "stopword_ratio": stop_ratio,
            "mean_word_len": mean_word_len}


def quality_score(text: Column) -> Column:
    """Composite 0-1 quality heuristic (length + stopword presence - punct
    excess), deterministic and SQL-expressible."""
    s = word_stat_columns(text)
    len_ok = F.when((s["n_tokens"] >= 5) & (s["n_chars"] >= 20), F.lit(0.4)).otherwise(F.lit(0.0))
    stop_ok = F.when(s["stopword_ratio"] >= 0.05, F.lit(0.3)).otherwise(F.lit(0.0))
    punct_ok = F.when(s["punct_ratio"] <= 0.1, F.lit(0.3)).otherwise(F.lit(0.0))
    return F.round(len_ok + stop_ok + punct_ok, 1)


def lang_id(text: Column) -> Column:
    """Stopword-vote language heuristic: count marker-word hits per language,
    pick the argmax (ties -> precedence en>de>fr>es; 'unk' if zero hits)."""
    toks_l = F.transform(tokens(text), F.lower)
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in markers])
        scores.append((lang, F.size(F.filter(toks_l, lambda t: F.array_contains(arr, t)))))
    best = F.greatest(*[s for _, s in scores])
    out = F.lit("unk")
    for lang, s in reversed(scores):
        out = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(out)
    return out


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text. Identical in Spark and DuckDB -> exact-dup detection key."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    stats = word_stat_columns(c)
    out = df
    for name, expr in stats.items():
        out = out.withColumn(name, expr)
    return (out.withColumn("quality", quality_score(c))
               .withColumn("lang_pred", lang_id(c))
               .withColumn("fingerprint", fingerprint(c)))


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     carry_cols: tuple = ()) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-token
    fraction (1 - distinct/total) and top-token fraction (most frequent
    token count / total). High values flag boilerplate / spam for
    pre-training corpus filtering (Rae et al. 2021 "Scaling Language
    Models", §A1.1 repetition filters).

    Distributed shape: explode -> per-(doc, token) count -> per-doc combine.
    Both aggregations are map-side combinable and key on doc_id, so the
    second groupBy reuses the first's hash partitioning (one effective
    shuffle of (doc_id, tok, c) triples — never the raw text). Empty docs
    (no tokens) drop out, matching the SQL ``length(trim(text)) > 0``.
    """
    keep = [id_col, *carry_cols]
    toks = df.select(*keep,
                     F.explode(F.transform(tokens(F.col(text_col)), F.lower))
                      .alias("tok"))
    cnt = toks.groupBy(*keep, "tok").agg(F.count(F.lit(1)).alias("c"))
    per = (cnt.groupBy(*keep)
              .agg(F.sum("c").alias("n_tokens"),
                   F.count(F.lit(1)).alias("n_distinct"),
                   F.max("c").alias("top_count")))
    nt = F.col("n_tokens").cast("double")
    return (per.withColumn("dup_frac",
                           F.round(1 - F.col("n_distinct") / nt, 6))
               .withColumn("top_frac",
                           F.round(F.col("top_count") / nt, 6)))

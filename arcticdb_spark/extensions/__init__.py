"""Beyond-reference operators, Spark-first (SURVEY §7.11 + build brief):

    text.py        language-ID, quality scoring, token counts, fingerprints
    dedup.py       exact, MinHash+LSH, SimHash, n-gram Jaccard near-dup
    similarity.py  embedding ANN: brute-force cosine top-k + LSH-bucketed
    joins.py       as-of / range joins (Spark lacks a native one)
    multimodal.py  binary media columns: schema + batch plumbing (decode stubbed)
    windows.py     sessionization, top-k per group, rolling stats
"""

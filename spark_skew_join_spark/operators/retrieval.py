"""BM25 full-text retrieval over a document corpus.

A training-data engine needs lexical retrieval alongside embedding ANN
(operators/similarity.py): targeted corpus audits ("show me the
documents about X"), hard-negative mining for retrievers, and
quality-slicing by topic all start with a BM25 top-k.  This is the
Robertson/Okapi BM25 in its Lucene form, expressed entirely in
relational algebra — no index structure, no Python:

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d, q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

Scale design (100 TB corpus, q query terms):
- tokenize → posexplode → **filter to the q query terms BEFORE any
  aggregation** — only matching postings ever shuffle, everything else
  dies at the scan projection;
- doc lengths aggregate from the same single scan (map-side combined);
- N / avgdl are one-row aggregates crossJoin-broadcast (plan-asserted
  BroadcastNestedLoopJoin over 1 row — the registry's scalar idiom);
- per-term df is a q-row aggregate, broadcast-joined back to postings;
- final top-k is orderBy+limit → TakeOrderedAndProject (per-partition
  heap + k-row driver merge, never a global sort).

The whole plan is a DuckDB-replayable SQL expression — the registry
query pins it EXACT against the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 20,
              k1: float = 1.2, b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Top-``k`` documents by BM25 score for a bag of ``query_terms``.

    Returns (id_col, dl, matched, score): document token length, the
    number of distinct query terms present, and the BM25 score (ties
    broken by ascending id for engine-reproducible output).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    # doc length + corpus scalars from one scan shape
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    corpus = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    # postings: query terms only — the selectivity lever at scale
    tf = (
        toks.where(F.col("term").isin(query_terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (
        F.col("tf") * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    return (
        tf.join(F.broadcast(df_t), on="term")
        .join(dl, on=id_col)
        .crossJoin(F.broadcast(corpus))
        .groupBy(id_col, "dl")
        .agg(
            F.count("*").alias("matched"),
            F.sum(idf * tf_norm).alias("__score"),
        )
        .select(
            id_col,
            F.col("dl").cast("int").alias("dl"),
            F.col("matched").cast("int").alias("matched"),
            F.round("__score", 6).alias("score"),
        )
        # order by the ROUNDED score: the oracle rounds identically, so
        # the top-k cut can never straddle a sub-1e-6 float divergence
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def bm25_topk_multi(docs: DataFrame, queries: dict[int, list[str]],
                    k: int = 20, k1: float = 1.2, b: float = 0.75,
                    id_col: str = "doc_id", text_col: str = "text"
                    ) -> DataFrame:
    """Per-query BM25 top-``k`` for MANY queries in ONE corpus pass.

    ``queries`` maps query_id → term bag. A loop of ``bm25_topk`` calls
    tokenizes and length-aggregates the corpus once PER QUERY; at 100 TB
    that multiplier is the whole cost, so the batched form is the one a
    pipeline should run: one tokenize, one dl/corpus aggregate, one
    posting filter over the UNION of all query terms, then a broadcast
    (query_id, term) attach fans postings out to the queries that asked
    for each term. Scores are identical to the single-query operator
    (same arithmetic, same rounded-score top-k cut); ranks come from a
    per-query window over the ≤ |terms|·df shortlist, never the corpus.

    Returns (query_id, id_col, dl, matched, score, rank), rank <= k.
    """
    if not queries or any(not ts for ts in queries.values()):
        raise ValueError("queries must be non-empty term bags")
    spark = docs.sparkSession
    qt = spark.createDataFrame(
        [(int(qid), t) for qid, ts in queries.items() for t in set(ts)],
        "query_id int, term string",
    )
    all_terms = sorted({t for ts in queries.values() for t in ts})
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    corpus = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        toks.where(F.col("term").isin(all_terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (
        F.col("tf") * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), id_col)
    return (
        tf.join(F.broadcast(qt), on="term")
        .join(F.broadcast(df_t), on="term")
        .join(dl, on=id_col)
        .crossJoin(F.broadcast(corpus))
        .groupBy("query_id", id_col, "dl")
        .agg(
            F.count("*").alias("matched"),
            F.sum(idf * tf_norm).alias("__score"),
        )
        .select(
            "query_id",
            id_col,
            F.col("dl").cast("int").alias("dl"),
            F.col("matched").cast("int").alias("matched"),
            F.round("__score", 6).alias("score"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "dl", "matched", "score",
                F.col("rank").cast("int").alias("rank"))
    )


def rrf_fuse(
    rankings: dict[str, DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) of any
    number of rankers: ``score(q, d) = Σ_r 1 / (rrf_k + rank_r(q, d))``
    over the rankers that returned d — the standard way to combine a
    lexical (BM25) and a vector (ANN) shortlist without score
    calibration, since only RANKS enter the sum.

    ``rankings`` maps ranker name → (query_id, doc_id, rank).  Each
    candidate's contributions are folded in SORTED ranker-name order
    (collect → array_sort → aggregate), so the double summation is
    deterministic for any ranker count; the cut is on the ROUNDED
    score with doc-id tiebreak.  Cost: one union + one grouped
    aggregation over the shortlists (k·|queries|·|rankers| rows — the
    corpus is never touched)."""
    tagged = None
    for name in sorted(rankings):
        df = rankings[name].select(
            F.col(query_col).alias("query_id"),
            F.col(doc_col).alias("doc_id"),
            F.lit(name).alias("ranker"),
            F.col(rank_col).cast("int").alias("rank"),
        )
        tagged = df if tagged is None else tagged.unionByName(df)
    grouped = tagged.groupBy("query_id", "doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("ranker"), F.col("rank")))
        ).alias("rs")
    )
    score = F.aggregate(
        F.col("rs"),
        F.lit(0.0),
        lambda acc, x: acc + F.lit(1.0) / (F.lit(float(rrf_k)) + x["rank"]),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id")
    )
    return (
        grouped.select(
            "query_id", "doc_id",
            F.size("rs").alias("n_rankers"),
            F.round(score, 6).alias("rrf_score"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "n_rankers", "rrf_score",
                F.col("rank").cast("int").alias("rank"))
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    ngram: int = 3,
    max_df: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache_weights: bool = True,
) -> DataFrame:
    """All document pairs with TF-IDF-weighted cosine >= ``threshold``
    over word-``ngram`` phrase vectors — the cosine sibling of the
    Jaccard set-similarity join (operators/setsim.py): Jaccard sees
    only membership, TF-IDF cosine weights repeated rare phrases up
    and boilerplate down, the classic text-reuse detector.

    Vector space: terms are sliding word n-grams (whitespace split,
    the BM25 tokenizer); weight = tf · ln(N/df); terms with df >
    ``max_df`` are dropped from the vectors entirely (stop-phrase cap
    — both the weights AND the norms exclude them, so the semantics
    stay exact and scale-bounded).

    Scale shape: one tokenize scan → (doc, term-hash) tf — terms are
    xxhash64-hashed before any shuffle, the setsim trick (weights
    depend only on term equality, so only 8-byte ints move); df and
    the N scalar aggregate from it; the pair enumeration is the
    inverted-index self-join on term-hash, whose fan-out per term is
    capped at ``max_df``² — never an all-pairs product. Per-pair dot
    is one map-side-combinable sum; norms join back per doc.

    Output: (id_a, id_b, cosine) with id_a < id_b, cosine rounded to
    6 (the threshold compares the ROUNDED value so an oracle replay
    can never straddle a float-summation-order divergence).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if ngram < 1 or max_df < 1:
        raise ValueError("ngram and max_df must be >= 1")
    # explode POSITIONS then slice/array_join, not a transform() HOF:
    # the lambda falls out of whole-stage codegen — measured 2.9 s →
    # 1.7 s at sf0.1 (BASELINE.md round 9); short docs are filtered
    # rather than guarded (sequence(1, 0) would run DESCENDING)
    w = F.split(F.col(text_col), " ")
    terms = (
        docs.where(F.size(w) >= ngram)
        .select(F.col(id_col).alias("__id"), w.alias("__w"))
        .select(
            "__id",
            F.explode(
                F.sequence(F.lit(1), F.size("__w") - (ngram - 1))
            ).alias("__i"),
            "__w",
        )
        .select(
            "__id",
            F.xxhash64(
                F.array_join(F.slice(F.col("__w"), F.col("__i"), ngram), " ")
            ).alias("__t"),
        )
    )
    tf = terms.groupBy("__id", "__t").agg(F.count(F.lit(1)).alias("__tf"))
    dfq = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    weights = (
        tf.join(dfq.where(F.col("__df") <= max_df), "__t")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "__id", "__t",
            (F.col("__tf") * F.log(F.col("__n") / F.col("__df"))).alias("__w"),
        )
    )
    if cache_weights:
        # the weight table feeds THREE subtrees (norms + both join
        # sides) — without a cache each one re-runs tokenize + tf + df
        # from the scan; lazy persist, released by
        # operators.dedup.clear_band_cache (the setsim cache_ordered
        # pattern)
        from .dedup import _session_cache

        weights = _session_cache(weights)
    norms = weights.groupBy("__id").agg(
        F.sqrt(F.sum(F.col("__w") * F.col("__w"))).alias("__nm")
    )
    wa = weights.select(
        F.col("__id").alias("id_a"), "__t", F.col("__w").alias("__wa")
    )
    wb = weights.select(
        F.col("__id").alias("id_b"), "__t", F.col("__w").alias("__wb")
    )
    dots = (
        wa.join(wb, "__t")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("__wa") * F.col("__wb")).alias("__dot"))
    )
    return (
        dots.join(norms.withColumnsRenamed({"__id": "id_a", "__nm": "__na"}),
                  "id_a")
        .join(norms.withColumnsRenamed({"__id": "id_b", "__nm": "__nb"}),
              "id_b")
        # a doc whose kept terms all have zero IDF (df == N <= max_df,
        # e.g. tiny corpora of shared boilerplate) has an all-zero
        # vector: cosine is undefined, and the unguarded division
        # raises DIVIDE_BY_ZERO under ANSI mode (NaN rows that pass the
        # threshold filter with ANSI off) — drop zero-norm sides
        .where((F.col("__na") > 0) & (F.col("__nb") > 0))
        .select(
            "id_a", "id_b",
            F.round(F.col("__dot") / (F.col("__na") * F.col("__nb")), 6)
            .alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def ndcg_at_k(
    run: DataFrame,
    judgments: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """NDCG@k of a ranked retrieval ``run`` against graded relevance
    ``judgments`` — the evaluation half of the retrieval family: a
    pipeline that mines hard negatives or fuses rankers needs to SCORE
    those rankers against labels, at corpus scale, inside the engine.

    Standard burst-gain form: gain(rel) = 2^rel − 1, discount
    log2(rank+1); DCG over the run's top-``k``; IDCG over the ideal
    ordering of that query's judged-relevant docs (rel desc — tie
    order cannot change the value, the doc-id tiebreak just keeps the
    plan deterministic); NDCG = DCG/IDCG, 0 when a query has no
    relevant doc. A query with judged-relevant docs but NO run rows
    still gets an output row (dcg=0, ndcg=0) — dropping it would
    overstate a mean over the output. DCG/IDCG round to 6 and NDCG
    divides the ROUNDED values, so an oracle replay never straddles a
    float-summation divergence.

    ``judgments`` is deduped internally to one row per (query, doc)
    keeping the MAX grade (ADVICE r9 #3 — duplicate judgment rows
    would otherwise fan out the run join and double-count DCG gains);
    callers passing an already-unique table pay one map-side-combined
    aggregation.

    Scale shape: the run side is ≤ k rows per query by contract; the
    judgments side takes one per-query window for the ideal top-k —
    partitioned by query id, bounded by judgments per query (human or
    derived labels, both far under corpus size). Two map-side-combined
    sums; no driver participation.

    Output: (query_col, dcg, idcg, ndcg).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    j = (
        judgments.select(
            query_col, doc_col, F.col(rel_col).cast("double").alias("__rel")
        )
        .groupBy(query_col, doc_col)
        .agg(F.max("__rel").alias("__rel"))
    )
    gain = lambda rel: F.pow(F.lit(2.0), rel) - F.lit(1.0)  # noqa: E731
    dcg = (
        run.where(F.col(rank_col) <= k)
        .select(query_col, doc_col, rank_col)
        .join(j, [query_col, doc_col], "left")
        .select(
            query_col,
            (
                gain(F.coalesce(F.col("__rel"), F.lit(0.0)))
                / F.log2(F.col(rank_col) + F.lit(1.0))
            ).alias("__g"),
        )
        .groupBy(query_col)
        .agg(F.round(F.sum("__g"), 6).alias("dcg"))
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("__rel").desc(), F.col(doc_col)
    )
    ideal = (
        j.where(F.col("__rel") > 0)
        .withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
        .groupBy(query_col)
        .agg(
            F.round(
                F.sum(gain(F.col("__rel")) / F.log2(F.col("__r") + F.lit(1.0))),
                6,
            ).alias("idcg")
        )
    )
    # FULL outer: a query with judged-relevant docs but zero run rows
    # (the retriever returned nothing) must surface as ndcg=0 — a mean
    # over the output would otherwise silently overstate the system
    # (review r9 finding)
    return (
        dcg.join(ideal, query_col, "full")
        .select(
            query_col,
            F.coalesce(F.col("dcg"), F.lit(0.0)).alias("dcg"),
            F.coalesce(F.col("idcg"), F.lit(0.0)).alias("idcg"),
            F.round(
                F.when(
                    F.coalesce(F.col("idcg"), F.lit(0.0)) > 0,
                    F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("ndcg"),
        )
    )


def retrieval_metrics(
    run: DataFrame,
    judgments: DataFrame,
    k: int = 10,
    rel_threshold: int = 1,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Set-based companions to ``ndcg_at_k``: recall@k, precision@k,
    and MRR of a ranked ``run`` against ``judgments``, with a doc
    counted relevant when ``rel_col >= rel_threshold``.

    recall@k = |top-k ∩ relevant| / |relevant|; precision@k =
    |top-k ∩ relevant| / k (the fixed-denominator form — a query with
    fewer than k retrievable docs is penalized, which is what a
    system-level mean wants); MRR = 1 / rank of the first relevant
    doc in the run (not capped at k — the standard definition), 0 if
    none. Like ndcg_at_k, a query with relevant judgments but no run
    rows surfaces with zeros instead of vanishing, and ``judgments``
    is deduped internally to one (query, doc) row keeping the MAX
    grade before the threshold (ADVICE r9 #3 — duplicates would
    double-count hits and n_rel).

    Scale shape: one broadcast-size-agnostic equi-join of the (≤ k +
    tail)-row run side against the relevant-judgment side, two
    map-side-combined aggregates, one full-outer stitch. Output:
    (query_col, n_rel, hits, recall_at_k, precision_at_k, mrr).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    relevant = (
        judgments.where(F.col(rel_col) >= rel_threshold)
        .select(query_col, doc_col)
        .distinct()
    )
    n_rel = relevant.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("n_rel")
    )
    matched = run.select(query_col, doc_col, rank_col).join(
        relevant, [query_col, doc_col]
    )
    per_run = matched.groupBy(query_col).agg(
        F.sum(F.when(F.col(rank_col) <= k, 1).otherwise(0)).alias("hits"),
        F.min(rank_col).alias("__first"),
    )
    return (
        n_rel.join(per_run, query_col, "full")
        .select(
            query_col,
            F.coalesce(F.col("n_rel"), F.lit(0)).alias("n_rel"),
            F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
            F.round(
                F.when(
                    F.coalesce(F.col("n_rel"), F.lit(0)) > 0,
                    F.coalesce(F.col("hits"), F.lit(0))
                    / F.col("n_rel").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("recall_at_k"),
            F.round(
                F.coalesce(F.col("hits"), F.lit(0)) / F.lit(float(k)), 6
            ).alias("precision_at_k"),
            F.round(
                F.when(
                    F.col("__first").isNotNull(),
                    F.lit(1.0) / F.col("__first"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("mrr"),
        )
    )

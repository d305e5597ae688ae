"""Generation-quality text-overlap metrics and readability scoring.

Corpus BLEU (Papineni et al. 2002) and ROUGE-N recall (Lin 2004) are the
standard n-gram-overlap evaluations for generated text; Flesch reading
ease / Flesch-Kincaid grade (Kincaid et al. 1975) is the classic
readability screen used by curation pipelines as a cheap quality signal.
All three are pure count arithmetic — exactly SQL-expressible — so each
query here carries a full DuckDB oracle.

Reference parity: the reference library (dfimplicits.scala) has no eval
metrics; these extend the LLM-pipeline surface next to the retrieval
evals (operators/retrieval.py::ndcg / retrieval_metrics).

Determinism posture (the repo-wide EXACT contract):
- every per-group aggregate that feeds a metric is an INTEGER sum
  (token / n-gram / clipped-match counts), so association order cannot
  perturb it;
- the floating-point formula is applied ONCE per output row to the
  pooled integer ratios and rounded to 6 decimals (ln/exp-ulp posture).

Scale design: n-grams travel as xxhash64 int64 keys (8/16-byte
shuffles, never text); the per-doc clip join runs on per-doc-distinct
tf rows (the tfidf/bigram-LM pattern — a Zipf-hot gram crosses the join
once per document, not once per occurrence); the final per-group joins
are 20-row source tables that auto-broadcast.  No scalar broadcasts, no
HOF lambdas in the hot path (explode positions + element_at stays in
whole-stage codegen — the contamination module's 5x lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["corpus_bleu_rouge", "readability"]


def _cand_pos(p):
    """Original 1-based index of the p-th token of the degraded
    candidate (every 7th token dropped): blocks of 6 kept per 7
    original, so q = p + floor((p-1)/6)."""
    return p + F.floor((p - F.lit(1)) / F.lit(6)).cast("int")


def corpus_bleu_rouge(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Corpus-level BLEU-2 + ROUGE-1/2 recall per group.

    Reference = the document text; candidate = the same token sequence
    with every 7th token (1-based) dropped — a deterministic degraded
    "generation" so the metric machinery is exercised end-to-end with a
    replayable oracle (the hash-rank idiom temperature_mix uses for its
    sampled set, applied to eval pairs).

    Per n in {1,2}: clipped matches = Σ_doc Σ_gram min(c_cand, c_ref);
    modified precision p_n = clipped_n / cand_total_n; ROUGE-N recall =
    clipped_n / ref_total_n.  BLEU-2 = BP · exp(½ ln p1 + ½ ln p2) with
    brevity penalty BP = exp(min(0, 1 − ref_len/cand_len)).  All counts
    are exact integer sums; the float formula runs once per group row.

    Unigram-clip identity (halves the join cost): a deletion-built
    candidate's per-doc token multiset is a sub-multiset of the
    reference's, so min(c_cand, c_ref) = c_cand for every unigram and
    clipped_1 = Σ cand length — computed analytically here, with NO n=1
    join.  The oracle keeps the explicit SUM(LEAST(nc, nr)) join
    formulation, so the identity itself is hash-verified by the
    correctness gate (novel n-grams only ever form at n ≥ 2, across
    deletion boundaries — exactly what the bigram clip join measures).

    Output: (group, n_docs, cand_tokens, ref_tokens, bleu2,
    rouge1_recall, rouge2_recall), metrics rounded to 6.
    """
    arr = F.split(F.col(text_col), " ")
    base = docs.select(
        F.col(id_col).alias("__id"),
        F.col(group_col).alias("__g"),
        arr.alias("__tk"),
        F.size(arr).alias("__len"),
    )
    # candidate length after dropping every 7th token
    cand_len = (F.col("__len") - F.floor(F.col("__len") / F.lit(7))).cast("int")
    base = base.withColumn("__clen", cand_len)

    def _tf(df: DataFrame, which: str, n: int) -> DataFrame:
        """Per-doc-distinct n-gram counts keyed by xxhash64."""
        if which == "ref":
            top = F.col("__len") - F.lit(n - 1)
            pos = F.explode(F.sequence(F.lit(1), top)).alias("__p")
            rows = df.where(F.col("__len") >= n).select(
                "__id", "__g", "__tk", pos
            )
            toks = [
                F.element_at(F.col("__tk"), F.col("__p") + F.lit(k))
                for k in range(n)
            ]
        else:
            top = F.col("__clen") - F.lit(n - 1)
            pos = F.explode(F.sequence(F.lit(1), top)).alias("__p")
            rows = df.where(F.col("__clen") >= n).select(
                "__id", "__g", "__tk", pos
            )
            toks = [
                F.element_at(F.col("__tk"), _cand_pos(F.col("__p") + F.lit(k)))
                for k in range(n)
            ]
        return (
            rows.select("__id", "__g", F.xxhash64(*toks).alias("__h"))
            .groupBy("__id", "__g", "__h")
            .agg(F.count(F.lit(1)).alias("__n"))
        )

    def _clipped(n: int) -> DataFrame:
        c = _tf(base, "cand", n).withColumnRenamed("__n", "__nc")
        r = _tf(base, "ref", n).select("__id", "__h", F.col("__n").alias("__nr"))
        return (
            c.join(r, ["__id", "__h"])
            .groupBy("__g")
            .agg(F.sum(F.least("__nc", "__nr")).alias(f"__clip{n}"))
        )

    totals = base.groupBy("__g").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__clen").alias("cand_tokens"),
        F.sum("__len").alias("ref_tokens"),
        F.sum(F.greatest(F.col("__clen") - F.lit(1), F.lit(0))).alias("__c2t"),
        F.sum(F.greatest(F.col("__len") - F.lit(1), F.lit(0))).alias("__r2t"),
    )
    # unigram-clip identity: clipped_1 ≡ Σ cand length for deletion
    # candidates (see docstring) — the oracle's explicit n=1 join
    # hash-verifies this shortcut every round
    j = totals.withColumn("__clip1", F.col("cand_tokens")).join(
        _clipped(2), "__g"
    )
    p1 = F.col("__clip1") / F.col("cand_tokens")
    p2 = F.col("__clip2") / F.col("__c2t")
    bp = F.exp(
        F.least(
            F.lit(0.0),
            F.lit(1.0) - F.col("ref_tokens") / F.col("cand_tokens"),
        )
    )
    bleu2 = F.when(
        (F.col("__clip1") > 0) & (F.col("__clip2") > 0),
        bp * F.exp(F.lit(0.5) * F.log(p1) + F.lit(0.5) * F.log(p2)),
    ).otherwise(F.lit(0.0))
    return (
        j.select(
            F.col("__g").alias(group_col),
            "n_docs",
            "cand_tokens",
            "ref_tokens",
            F.round(bleu2, 6).alias("bleu2"),
            F.round(F.col("__clip1") / F.col("ref_tokens"), 6).alias(
                "rouge1_recall"
            ),
            F.round(F.col("__clip2") / F.col("__r2t"), 6).alias(
                "rouge2_recall"
            ),
        )
        .orderBy(group_col)
    )


def readability(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    sentence_words: int = 15,
) -> DataFrame:
    """Pooled Flesch reading ease + Flesch-Kincaid grade per group.

    Syllables ≈ max(1, #maximal-[aeiouy]-runs) per word — the standard
    dictionary-free approximation; the synthetic corpus carries no
    sentence punctuation, so pseudo-sentences are fixed windows of
    ``sentence_words`` tokens (ceil(words/15) per doc, documented
    convention).  The formulas run on POOLED per-group integer counts
    (micro-average), never on averaged per-doc doubles, so the result
    is association-order-free:

        flesch   = 206.835 − 1.015·W/S − 84.6·Y/W
        fk_grade = 0.39·W/S + 11.8·Y/W − 15.59

    with W words, S sentences, Y syllables.  Output: (group, n_docs,
    words, syllables, sentences, flesch, fk_grade) rounded to 6.
    """
    tok = docs.select(
        F.col(group_col).alias("__g"),
        F.explode(F.split(F.col(text_col), " ")).alias("__t"),
    )
    syll = F.greatest(
        F.lit(1),
        F.size(F.expr("regexp_extract_all(__t, '[aeiouy]+', 0)")),
    )
    wt = tok.groupBy("__g").agg(
        F.count(F.lit(1)).alias("words"),
        F.sum(syll).alias("syllables"),
    )
    nw = F.size(F.split(F.col(text_col), " "))
    sent = docs.select(
        F.col(group_col).alias("__g"),
        F.floor((nw + F.lit(sentence_words - 1)) / F.lit(sentence_words))
        .alias("__s"),
    ).groupBy("__g").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("__s").alias("sentences")
    )
    wps = F.col("words") / F.col("sentences")
    spw = F.col("syllables") / F.col("words")
    return (
        wt.join(sent, "__g")
        .select(
            F.col("__g").alias(group_col),
            "n_docs",
            "words",
            "syllables",
            "sentences",
            F.round(
                F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 6
            ).alias("flesch"),
            F.round(
                F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 6
            ).alias("fk_grade"),
        )
        .orderBy(group_col)
    )

"""Exact-substring deduplication: seed-and-extend on a token grid.

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better") remove *exact* duplicated substrings of >= 50 tokens with a
suffix array — a single-node construction that does not distribute.
This module is the distributed approximation the paper's family implies
(and VERDICT r4 #4 mandates): an anchor-grid seed join plus a
run-length extend-and-merge, all expressed as DataFrame ops so Catalyst
plans it like any other join/aggregate.

Scheme (anchor width ``k`` tokens):

1. every document emits ALL overlapping k-token windows (the "window"
   side, n rows/doc) and its grid-aligned windows at positions
   0, k, 2k, ... (the "seed" side, n/k rows/doc);
2. seeds of the smaller-id document equi-join windows of the larger-id
   document on the window hash — a common substring of length t covers
   t-k+1 window start positions in the seed document, so t >= 2k-1
   guarantees one of them is grid-aligned and the join finds it;
3. matched seeds with the same alignment ``diag = pos_b - pos_a`` whose
   grid positions are <= k apart provably belong to one contiguous
   common run (two k-windows matching at offsets d <= k apart cover
   their whole union), so a per-(pair, diag) gaps-and-islands merge
   yields maximal detected runs with NO text re-verification;
4. runs shorter than ``min_tokens`` are dropped.  A single hash
   collision can only fabricate an isolated k-token run, so any
   ``min_tokens > k`` filters collision noise structurally.

Detection guarantee: every common substring of >= 3k-1 tokens contains
two consecutive grid chunks and is always reported (k=16 -> 47 tokens,
the paper's ~50-token regime); the reported span is grid-aligned in the
smaller-id document and may undershoot the true maximal run by up to
k-1 tokens on each end.  Character offsets are derived from the token
grid arithmetically, so the whole output is deterministic and
oracle-checkable in ANSI SQL.

Scale design (100 TB):
* the window side is O(total tokens) rows of (int64 id, int pos, int64
  xxhash64) — 20 bytes/token shuffled, never the text; the seed side is
  k times smaller.  This matches the suffix-array alternative's O(n)
  footprint without its global sort.
* a boilerplate window shared by millions of docs fans the seed join
  out quadratically — ``max_window_df`` drops windows seen in more than
  that many documents (the max_shingle_df idiom; such spans are
  boilerplate and better handled by operators/boilerplate.py), keeping
  every join key's fan-in bounded.
* the islands merge is one window function over (pair, diag) — keys are
  pair-specific, no global hot key; the final char-offset join touches
  only the surviving runs (tiny) against the docs table.
* zero Python UDFs: windows come from posexplode(transform(sequence)),
  hashing is JVM xxhash64, the merge is lag/sum window codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def token_windows(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", k: int = 16) -> DataFrame:
    """(id, pos, wkey): xxhash64 of every overlapping k-token window of
    the whitespace-tokenized document (0-based token position)."""
    from ..sources.tables import fan_out_narrow

    toks = F.split(F.col(text_col), " ")
    return (
        # fan out a narrow scan before the per-window hashing (no-op at
        # production partition counts)
        fan_out_narrow(
            docs.select(F.col(id_col), toks.alias("__tk")).where(
                F.size("__tk") >= k
            )
        )
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size("__tk") - k),
                    lambda i: F.xxhash64(
                        F.array_join(F.slice(F.col("__tk"), i + 1, k), " ")
                    ),
                )
            ).alias("pos", "wkey"),
        )
    )


def exact_substring_runs(
    docs: DataFrame,
    k: int = 16,
    min_tokens: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_window_df: int | None = None,
) -> DataFrame:
    """Detected exact-duplicate token runs between document pairs.

    Output, one row per maximal detected run:
    (doc_a, doc_b, a_start_tok, b_start_tok, n_tokens,
     a_start_char, b_start_char, n_chars) with doc_a < doc_b; token
    positions 0-based, char offsets 0-based into the raw text, and
    n_chars the exact length of the duplicated span's text.
    """
    if min_tokens <= k:
        raise ValueError("min_tokens must exceed k (collision filter)")
    w = token_windows(docs, id_col, text_col, k)
    if max_window_df is not None:
        hot = (
            w.groupBy("wkey")
            .agg(F.countDistinct(id_col).alias("__nd"))
            .where(F.col("__nd") > max_window_df)
            .select("wkey")
        )
        w = w.join(hot, on="wkey", how="left_anti")
    seeds = w.where(F.col("pos") % k == 0)
    a = seeds.select(
        F.col(id_col).alias("doc_a"), F.col("pos").alias("pa"), "wkey"
    )
    b = w.select(
        F.col(id_col).alias("doc_b"), F.col("pos").alias("pb"), "wkey"
    )
    matches = (
        a.join(b, on="wkey")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pa", (F.col("pb") - F.col("pa")).alias("diag"))
    )
    # gaps-and-islands per (pair, diagonal): seeds <= k apart extend one
    # contiguous exactly-matching span (their windows overlap or abut)
    wd = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    grouped = (
        matches.withColumn(
            "__brk",
            F.when(F.col("pa") - F.lag("pa").over(wd) <= k, F.lit(0)).otherwise(
                F.lit(1)
            ),
        )
        .withColumn(
            "__rid",
            F.sum("__brk").over(wd.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("doc_a", "doc_b", "diag", "__rid")
        .agg(
            F.min("pa").alias("a_start_tok"),
            (F.max("pa") + k - F.min("pa")).alias("n_tokens"),
        )
        .where(F.col("n_tokens") >= min_tokens)
        .select(
            "doc_a",
            "doc_b",
            "a_start_tok",
            (F.col("a_start_tok") + F.col("diag")).alias("b_start_tok"),
            "n_tokens",
        )
    )
    # char offsets: rejoin the (few) surviving runs to the token arrays;
    # offset of token s = chars of the first s tokens + s separators
    return _attach_char_offsets(grouped, docs, id_col, text_col)


def _attach_char_offsets(grouped: DataFrame, docs: DataFrame,
                         id_col: str, text_col: str) -> DataFrame:
    toks = F.split(F.col(text_col), " ")
    ta = docs.select(F.col(id_col).alias("doc_a"), toks.alias("__ta"))
    tb = docs.select(F.col(id_col).alias("doc_b"), toks.alias("__tb"))

    def char_off(arr: str, start: str):
        joined = F.array_join(F.slice(F.col(arr), 1, F.col(start)), " ")
        return (
            F.length(joined)
            + F.when(F.col(start) > 0, F.lit(1)).otherwise(F.lit(0))
        ).cast("long")

    return (
        grouped.join(ta, on="doc_a")
        .join(tb, on="doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("a_start_tok").cast("int").alias("a_start_tok"),
            F.col("b_start_tok").cast("int").alias("b_start_tok"),
            F.col("n_tokens").cast("int").alias("n_tokens"),
            char_off("__ta", "a_start_tok").alias("a_start_char"),
            char_off("__tb", "b_start_tok").alias("b_start_char"),
            F.length(
                F.array_join(
                    F.slice(F.col("__ta"), F.col("a_start_tok") + 1, F.col("n_tokens")),
                    " ",
                )
            ).cast("long").alias("n_chars"),
        )
    )


def remove_duplicate_spans(
    docs: DataFrame,
    runs: DataFrame | None = None,
    k: int = 16,
    min_tokens: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_window_df: int | None = None,
) -> DataFrame:
    """The removal half of the ExactSubstr pass: cut every detected
    duplicated span out of the LARGER-id document (the smaller id keeps
    its copy — one surviving copy per run, the paper's policy), and
    reassemble the cleaned text.

    Output, one row per input document:
    (id_col, n_tokens, n_removed, clean_text) — clean_text is the
    surviving tokens rejoined in order ('' when the whole document was
    duplicated).  Overlapping spans from different runs union cleanly
    (removal works on the distinct token-position set).

    Scale: span positions explode to O(duplicated tokens) rows — the
    data actually being deleted — and the anti-join is keyed by
    (doc, pos) against the exploded corpus; the reassembly aggregation
    is keyed by the unique doc id (same shape as
    boilerplate.chunk_dedup_stats, which stresses 4M docs).  Documents
    without any span skip the rebuild entirely via a semi-join-derived
    flag.  Zero Python UDFs.
    """
    if runs is None:
        runs = exact_substring_runs(
            docs, k=k, min_tokens=min_tokens, id_col=id_col,
            text_col=text_col, max_window_df=max_window_df,
        )
    drop_pos = (
        runs.select(
            F.col("doc_b").alias(id_col),
            F.explode(
                F.sequence(
                    F.col("b_start_tok"),
                    F.col("b_start_tok") + F.col("n_tokens") - 1,
                )
            ).alias("pos"),
        )
        .distinct()
    )
    toks = docs.select(
        id_col, F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok")
    )
    affected = drop_pos.select(id_col).distinct()
    kept = (
        toks.join(affected, on=id_col, how="left_semi")
        .join(drop_pos, on=[id_col, "pos"], how="left_anti")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("__clean"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    n_tokens = F.size(F.split(F.col(text_col), " "))
    return (
        docs.join(affected.withColumn("__hit", F.lit(True)), on=id_col, how="left")
        .join(rebuilt, on=id_col, how="left")
        .select(
            id_col,
            n_tokens.cast("int").alias("n_tokens"),
            F.when(
                F.col("__hit").isNotNull(),
                n_tokens - F.coalesce(F.col("__n_kept"), F.lit(0)),
            )
            .otherwise(F.lit(0))
            .cast("int")
            .alias("n_removed"),
            F.when(F.col("__hit").isNotNull(), F.coalesce(F.col("__clean"), F.lit("")))
            .otherwise(F.col(text_col))
            .alias("clean_text"),
        )
    )

"""BPE tokenizer training and application, Spark-first.

Sennrich, Haddow & Birch 2016 (Neural Machine Translation of Rare Words
with Subword Units): start from characters (plus an end-of-word marker),
repeatedly merge the most frequent adjacent symbol pair.  The key scale
observation — the same one production trainers build on — is that after
ONE corpus-scale aggregation the algorithm never touches the corpus
again: pair counts are fully determined by the DISTINCT-WORD frequency
table, which is bounded by vocabulary (≈10⁶–10⁸ rows), not corpus size
(100 TB).  So:

* ``word_frequencies`` — the only corpus-scale pass: tokenize → explode
  → map-side-combined groupBy(word).  Shuffles (word, count) pairs.
* ``train_bpe(mode="distributed")`` — each merge round is one bounded
  aggregation over the cached word table (explode adjacent pairs
  weighted by word freq → top-1 by (count DESC, pair ASC)) followed by
  an in-plan rewrite of the symbol arrays via the ``aggregate``
  higher-order function (greedy non-overlapping left-to-right merge —
  pure codegen, no Python).  One 1-row collect per round; lineage is
  cut every ``checkpoint_every`` rounds.
* ``train_bpe(mode="driver")`` — for moderate vocabularies: collect the
  word table once (guarded by ``max_vocab_words``) and run the classic
  fast loop driver-side.  Identical merges to the distributed mode by
  construction (same deterministic tie-break); a parity test pins it.
* ``apply_bpe`` — tokenize a corpus with a learned merge list via
  Arrow-batched ``mapInPandas`` using the standard lowest-rank-first
  pair replacement, with a per-batch word→tokens memo (natural-language
  words repeat heavily, so the memo hit rate is enormous).

Tie-break everywhere: highest count, then lexicographically smallest
(left, right) — fully deterministic merges.

Registry: ``bpe_train_docs`` / ``bpe_tokenize_docs`` (queries.py) are
rows-only entries — k merge iterations are not expressible in one SQL
oracle — with driver-vs-distributed and hand-computed parity pinned in
tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EOW = "</w>"


def word_frequencies(
    docs: DataFrame, text_col: str = "text", min_freq: int = 1
) -> DataFrame:
    """(word, freq): the corpus-scale aggregation.  Lowercased,
    whitespace-split, empty tokens dropped."""
    out = (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if min_freq > 1:
        out = out.where(F.col("freq") >= min_freq)
    return out


def _initial_symbols(words: DataFrame) -> DataFrame:
    """(word, freq, syms): characters plus the end-of-word marker."""
    return words.select(
        "word",
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(EOW))
        ).alias("syms"),
    )


def _pair_counts(syms_df: DataFrame) -> DataFrame:
    """(left, right, n): adjacent-pair counts weighted by word freq."""
    pairs = syms_df.where(F.size("syms") >= 2).select(
        "freq",
        F.explode(
            F.arrays_zip(
                F.slice("syms", 1, F.size("syms") - 1).alias("left"),
                F.slice("syms", 2, F.size("syms") - 1).alias("right"),
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.left").alias("left"), F.col("p.right").alias("right")
    ).agg(F.sum("freq").alias("n"))


def _merge_expr(left: str, right: str):
    """aggregate() HOF folding one greedy non-overlapping merge pass of
    (left, right) over the symbol array — codegen, no Python."""
    a, b = F.lit(left), F.lit(right)
    return F.aggregate(
        F.col("syms"),
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == a)
            & (x == b),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(a, b)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_freq: int = 1,
    mode: str = "driver",
    max_vocab_words: int = 2_000_000,
    checkpoint_every: int = 8,
    words_rows: list | None = None,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns
    ``[(rank, left, right, pair_count), ...]`` (rank from 0).

    mode="driver": one corpus aggregation, then the loop runs on the
    collected word table (refused above ``max_vocab_words`` — switch to
    distributed).  mode="distributed": the word table never leaves the
    cluster; each round collects exactly one row.

    ``words_rows`` (r15): an already-collected word table — the rows of
    ``word_frequencies(docs, text_col, min_freq).collect()`` — so a
    caller training several tokenizers shares ONE corpus aggregation
    (queries._tok_family). The trainer is order-independent (integer
    pair counts, full (count DESC, pair ASC) tie-break), so injected
    rows produce bit-identical merges (tests/test_tok_family.py)."""
    if mode == "driver":
        if words_rows is not None:
            rows = list(words_rows)
        else:
            # collect once with a +1 cap — len() is the guard, saving
            # the second full aggregation the old count()-then-collect
            # shape paid (r15; the unigram trainer's idiom)
            rows = word_frequencies(docs, text_col, min_freq).limit(
                max_vocab_words + 1
            ).collect()
        if len(rows) > max_vocab_words:
            raise ValueError(
                f"word table exceeds max_vocab_words={max_vocab_words}; "
                "use mode='distributed'"
            )
        vocab = {
            tuple(list(r["word"]) + [EOW]): int(r["freq"]) for r in rows
        }
        return _train_driver(vocab, n_merges)
    words = word_frequencies(docs, text_col, min_freq)
    if mode != "distributed":
        raise ValueError(f"mode must be driver|distributed, got {mode!r}")

    syms_df = _initial_symbols(words).persist()
    syms_df.count()  # materialize before iterating
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            _pair_counts(syms_df)
            .orderBy(F.desc("n"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] <= 0:
            break
        left, right, n = top[0]["left"], top[0]["right"], int(top[0]["n"])
        merges.append((rank, left, right, n))
        nxt = syms_df.withColumn("syms", _merge_expr(left, right))
        if (rank + 1) % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
        else:
            nxt = nxt.persist()
            nxt.count()
        syms_df.unpersist()
        syms_df = nxt
    syms_df.unpersist()
    return merges


def _train_driver(
    vocab: dict[tuple[str, ...], int], n_merges: int
) -> list[tuple[int, str, str, int]]:
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, n))
        merged = left + right
        out: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            acc: list[str] = []
            for x in syms:
                if acc and acc[-1] == left and x == right:
                    acc[-1] = merged
                else:
                    acc.append(x)
            key = tuple(acc)
            out[key] = out.get(key, 0) + f
        vocab = out
    return merges


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Standard BPE encoding: repeatedly apply the LOWEST-RANK merge
    present until none applies (equivalent to replaying training
    order)."""
    syms = list(word) + [EOW]
    while len(syms) >= 2:
        best, best_rank = None, None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = p, r
        if best is None:
            break
        left, right = best
        merged = left + right
        acc: list[str] = []
        for x in syms:
            if acc and acc[-1] == left and x == right:
                acc[-1] = merged
            else:
                acc.append(x)
        syms = acc
    return syms


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]] | list[tuple[int, str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """(id, bpe_tokens array<string>): tokenize with a learned merge
    list.  Arrow-batched; a per-batch word→tokens memo exploits word
    repetition, so the per-row cost is a dict hit for all but first
    occurrences.  The merge list is closure-captured (it is small —
    ≤ vocab-size rows — the broadcast-variable equivalent)."""
    ranks = {(m[1], m[2]): m[0] for m in merges}
    schema = f"{id_col} long, {out_col} array<string>"

    def batches(it):
        import pandas as pd

        memo: dict[str, list[str]] = {}

        def encode(text: str) -> list[str]:
            out: list[str] = []
            for w in text.lower().split():
                toks = memo.get(w)
                if toks is None:
                    toks = _encode_word(w, ranks)
                    memo[w] = toks
                out.extend(toks)
            return out

        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    out_col: pdf[text_col].map(encode),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(batches, schema)

"""Unigram-LM (SentencePiece-style) tokenizer trainer, Spark-first.

Kudo 2018 (Subword Regularization, ACL) / Kudo & Richardson 2018
(SentencePiece, EMNLP demo): seed a large candidate-piece vocabulary
from substrings, then alternate (E) segment the corpus with the current
piece probabilities and (M) re-estimate probabilities from the chosen
pieces, pruning pieces the segmentations stop using, and finally keep
the top ``vocab_size`` pieces. This is the OTHER half of the
tokenizer-training surface next to BPE (operators/bpe.py) — the two
algorithms used by essentially every modern LLM tokenizer.

Design choices that make training deterministic and SQL-certifiable
(the BPE / holt_winters unrolled-recurrence precedent):

* **Hard EM (Viterbi counts).** The E-step takes each word's single
  best segmentation instead of lattice expectations — SentencePiece's
  own final segmenter is Viterbi; hard EM keeps every intermediate an
  INTEGER (piece counts), so there is no cross-engine float-sum drift.
* **Integer log-probs.** Piece scores are
  ``floor(ln(count / total) * 1e9 + 0.5)`` as int64; path scores are
  exact integer sums, so the argmax is engine-independent (the only
  residual risk is libm's ln differing in the last ulp exactly at a
  0.5e-9 rounding boundary — vanishingly rare and LOUD when it happens:
  the driver row would flag a mismatch, never silently pass).
* **Total tie-break order.** Best segmentation = max score, then
  FEWEST pieces, then lexicographically smallest chr(31)-joined piece
  path — a total order (distinct segmentations have distinct paths),
  replayed verbatim by the oracle's ROW_NUMBER.

Like the BPE trainer, the corpus is touched ONCE (the distinct-word
frequency aggregation — bounded by vocabulary, not corpus size); every
EM round runs on the bounded word table. ``mode="driver"`` collects
that table (guarded) and trains in pure Python; ``mode="distributed"``
keeps the word table in Spark and runs each E-step as one Arrow
``mapInPandas`` pass with the (tiny, ≤ seed_size + alphabet) vocab in
the task closure, collecting only per-piece counts. A parity test pins
the two modes identical.

No reference-repo counterpart (anish749/spark-skew-join is a join
utility); this belongs to the mandated LLM-pipeline extension surface.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .bpe import word_frequencies

SEP = "\x1f"  # unit separator — asserted absent from the corpus


def _ilogp(counts: dict[str, int]) -> dict[str, int]:
    """Integer log-probs: floor(ln(c/total)*1e9 + 0.5) per piece."""
    total = float(sum(counts.values()))
    return {
        p: int(math.floor(math.log(c / total) * 1e9 + 0.5))
        for p, c in counts.items()
    }


def _viterbi(
    word: str, ilp: dict[str, int], max_piece_len: int
) -> tuple[int, int, str] | None:
    """Best segmentation of ``word``: maximize integer score, then
    fewest pieces, then lexicographically smallest SEP-joined path.
    Returns (score, n_pieces, path) or None if uncoverable.

    Storing the full path per DP state is sound for the lexicographic
    tie-break: candidates compared at the same position with equal
    score and equal piece count have equal path LENGTH (same covered
    chars + same separator count), so no candidate is a proper prefix
    of another and prefix order survives suffix extension."""
    n = len(word)
    best: list[tuple[int, int, str] | None] = [None] * (n + 1)
    best[0] = (0, 0, "")
    for i in range(1, n + 1):
        cand: tuple[int, int, str] | None = None
        for j in range(max(0, i - max_piece_len), i):
            prev = best[j]
            if prev is None:
                continue
            lp = ilp.get(word[j:i])
            if lp is None:
                continue
            path = prev[2] + (SEP if j else "") + word[j:i]
            c = (prev[0] + lp, prev[1] + 1, path)
            if cand is None or (
                c[0] > cand[0]
                or (
                    c[0] == cand[0]
                    and (
                        c[1] < cand[1]
                        or (c[1] == cand[1] and c[2] < cand[2])
                    )
                )
            ):
                cand = c
        best[i] = cand
    return best[n]


def _seed_counts_py(
    words: list[tuple[str, int]], max_piece_len: int
) -> dict[str, int]:
    cnt: dict[str, int] = {}
    for w, f in words:
        for i in range(len(w)):
            for L in range(1, min(max_piece_len, len(w) - i) + 1):
                p = w[i : i + L]
                cnt[p] = cnt.get(p, 0) + f
    return cnt


def _select_seed(
    cnt: dict[str, int], seed_size: int
) -> dict[str, int]:
    """All single chars + top ``seed_size`` multi-char substrings by
    (count DESC, piece ASC)."""
    chars = {p: c for p, c in cnt.items() if len(p) == 1}
    multis = sorted(
        ((p, c) for p, c in cnt.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )[:seed_size]
    return {**chars, **dict(multis)}


def _em_rounds(
    words: list[tuple[str, int]],
    vocab: dict[str, int],
    em_iters: int,
    max_piece_len: int,
    viterbi_counts,
) -> dict[str, int]:
    """Shared EM loop: ``viterbi_counts(words, ilp) -> {piece: count}``
    is the E-step (pure Python here, an Arrow pass in distributed
    mode); zero-count pieces are pruned each round."""
    for _ in range(em_iters):
        counts = viterbi_counts(words, _ilogp(vocab))
        vocab = {p: c for p, c in counts.items() if c > 0}
        if not vocab:
            raise ValueError("EM pruned the whole vocabulary")
    return vocab


def train_unigram(
    docs: DataFrame,
    vocab_size: int = 40,
    text_col: str = "text",
    seed_size: int = 48,
    max_piece_len: int = 6,
    em_iters: int = 3,
    max_word_len: int = 16,
    mode: str = "driver",
    max_vocab_words: int = 2_000_000,
    words_rows: list | None = None,
) -> list[tuple[str, int, float]]:
    """Learn a unigram-LM piece vocabulary; returns
    ``[(piece, count, logprob), ...]`` — the top ``vocab_size``
    survivors by (count DESC, piece ASC), with logprob re-normalized
    over the kept set and rounded to 6 dp.

    Words longer than ``max_word_len`` are excluded from training
    (the SentencePiece max-sentencepiece-length idiom) so the oracle's
    segmentation enumeration stays bounded."""
    if mode not in ("driver", "distributed"):
        raise ValueError(f"mode must be driver|distributed, got {mode!r}")
    if vocab_size < 1 or seed_size < 1 or em_iters < 1:
        raise ValueError("vocab_size, seed_size, em_iters must be >= 1")
    if mode == "driver":
        if words_rows is not None:
            # pre-collected FULL word table (the train_bpe contract);
            # the max_word_len filter applies here — Python len() and
            # Spark LENGTH both count codepoints, and the trainer
            # sorts the words itself, so the result is bit-identical
            # (tests/test_tok_family.py)
            rows = [
                r for r in words_rows if len(r["word"]) <= max_word_len
            ]
        else:
            rows = (
                word_frequencies(docs, text_col)
                .where(F.length("word") <= max_word_len)
                .limit(max_vocab_words + 1)
                .collect()
            )
        if len(rows) > max_vocab_words:
            raise ValueError(
                f"word table exceeds max_vocab_words={max_vocab_words}; "
                "use mode='distributed'"
            )
        words = sorted((r["word"], r["freq"]) for r in rows)
        vocab = _select_seed(
            _seed_counts_py(words, max_piece_len), seed_size
        )

        def viterbi_counts(ws, ilp):
            cnt: dict[str, int] = {}
            for w, f in ws:
                seg = _viterbi(w, ilp, max_piece_len)
                if seg is None:  # unreachable for trained-on words
                    continue
                for p in seg[2].split(SEP):
                    cnt[p] = cnt.get(p, 0) + f
            return cnt

        final = _em_rounds(
            words, vocab, em_iters, max_piece_len, viterbi_counts
        )
    else:
        wf = word_frequencies(docs, text_col).where(
            F.length("word") <= max_word_len
        )
        final = _train_distributed(
            wf, seed_size, max_piece_len, em_iters
        )

    kept = sorted(final.items(), key=lambda x: (-x[1], x[0]))[:vocab_size]
    total = float(sum(c for _, c in kept))
    return [
        (p, c, round(math.log(c / total), 6)) for p, c in kept
    ]


def _train_distributed(
    wf: DataFrame, seed_size: int, max_piece_len: int, em_iters: int
) -> dict[str, int]:
    """Word table stays in Spark; per round ONE Arrow pass emits
    (piece, weighted count) partials that a groupBy reduces to at most
    |vocab| rows — collect size is vocab-bounded regardless of corpus.
    Seed construction is relational: positions × lengths explode, one
    map-side-combined count, chars + top-K multis."""
    from ..sources.tables import fan_out_narrow

    wfp = fan_out_narrow(wf).persist()
    try:
        sub = (
            wfp.select(
                "freq",
                F.explode(
                    F.sequence(F.lit(1), F.length("word"))
                ).alias("i"),
                "word",
            )
            .select(
                "freq",
                "i",
                "word",
                F.explode(
                    F.sequence(
                        F.lit(1),
                        F.least(
                            F.lit(max_piece_len),
                            F.length("word") - F.col("i") + 1,
                        ),
                    )
                ).alias("len"),
            )
            .select(
                F.substring(
                    F.col("word"), F.col("i"), F.col("len")
                ).alias("piece"),
                "freq",
            )
            .groupBy("piece")
            .agg(F.sum("freq").alias("c"))
        )
        chars = sub.where(F.length("piece") == 1)
        multis = (
            sub.where(F.length("piece") > 1)
            .orderBy(F.col("c").desc(), "piece")
            .limit(seed_size)
        )
        vocab = {
            r["piece"]: r["c"]
            for r in chars.unionAll(multis).collect()
        }

        def viterbi_counts(_ws, ilp):
            import pandas as pd

            def seg_batches(it):
                for pdf in it:
                    out: dict[str, int] = {}
                    for w, f in zip(pdf["word"], pdf["freq"]):
                        seg = _viterbi(w, ilp, max_piece_len)
                        if seg is None:
                            continue
                        for p in seg[2].split(SEP):
                            out[p] = out.get(p, 0) + int(f)
                    yield pd.DataFrame(
                        {"piece": list(out), "c": list(out.values())}
                    )

            rows = (
                wfp.mapInPandas(seg_batches, "piece string, c long")
                .groupBy("piece")
                .agg(F.sum("c").alias("c"))
                .collect()
            )
            return {r["piece"]: r["c"] for r in rows}

        return _em_rounds(
            None, vocab, em_iters, max_piece_len, viterbi_counts
        )
    finally:
        wfp.unpersist()


def apply_unigram(
    docs: DataFrame,
    vocab: list[tuple[str, int, float]],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 6,
) -> DataFrame:
    """Tokenize with a learned vocabulary: per word, the same Viterbi
    (integer scores from the vocab's counts, identical tie-break);
    out-of-vocabulary characters pass through as single-char pieces
    (lossless, the byte-fallback idiom). Arrow ``mapInPandas`` with a
    per-batch word→pieces memo — natural-language words repeat heavily,
    so the memo's hit rate makes the per-word DP amortize to ~zero.

    Output: (id_col, pieces array<string>, n_pieces int)."""
    import pandas as pd  # noqa: F401 — driver-side availability check

    counts = {p: c for p, c, _ in vocab}
    ilp = _ilogp(counts)

    def tok_batches(it):
        import pandas as pd

        memo: dict[str, list[str]] = {}
        for pdf in it:
            pieces_col, n_col, ids = [], [], []
            for did, tx in zip(pdf[id_col], pdf[text_col]):
                out: list[str] = []
                for w in (tx or "").lower().split():
                    got = memo.get(w)
                    if got is None:
                        got = _segment_oov(w, ilp, max_piece_len)
                        if len(memo) < 1_000_000:
                            memo[w] = got
                    out.extend(got)
                ids.append(did)
                pieces_col.append(out)
                n_col.append(len(out))
            yield pd.DataFrame(
                {id_col: ids, "pieces": pieces_col, "n_pieces": n_col}
            )

    from ..sources.tables import fan_out_narrow

    return fan_out_narrow(docs.select(id_col, text_col)).mapInPandas(
        tok_batches,
        f"{id_col} long, pieces array<string>, n_pieces int",
    )


def _segment_oov(
    word: str, ilp: dict[str, int], max_piece_len: int
) -> list[str]:
    """Viterbi with single-char OOV fallback: chars absent from the
    vocabulary segment as themselves (scored one below the vocabulary
    minimum so known pieces always win)."""
    seg = _viterbi(word, ilp, max_piece_len)
    if seg is not None:
        return seg[2].split(SEP)
    floor_lp = min(ilp.values()) - 1 if ilp else -1
    patched = dict(ilp)
    for ch in set(word):
        patched.setdefault(ch, floor_lp)
    seg = _viterbi(word, patched, max_piece_len)
    return seg[2].split(SEP)


def _trainer_ctes(
    vocab_size: int,
    seed_size: int,
    max_piece_len: int,
    em_iters: int,
    max_word_len: int,
    table: str,
    text_col: str,
) -> str:
    """The shared DuckDB CTE chain replaying the whole trainer, EM
    rounds unrolled, ending at ``kept`` (the pruned final vocabulary).

    Each round enumerates EVERY segmentation of every distinct word via
    a recursive CTE restricted to the round's live vocabulary (bounded:
    word length ≤ max_word_len and the fixture vocabulary is small),
    picks the best by the trainer's exact tie-break with ROW_NUMBER,
    and re-estimates integer log-probs. Non-recursive members are
    MATERIALIZED — inlining them into the recursion re-evaluates the
    whole upstream chain per fixpoint step (measured 63 s → 0.3 s)."""
    parts = [f"""
WITH RECURSIVE w AS MATERIALIZED (
  SELECT w AS word, COUNT(*) AS freq FROM (
    SELECT unnest(list_filter(regexp_split_to_array(lower({text_col}),
                                                    '\\s+'),
                  x -> x <> '')) AS w
    FROM {table})
  WHERE LENGTH(w) <= {max_word_len} GROUP BY w
),
sub AS MATERIALIZED (
  SELECT piece, SUM(freq) AS c FROM (
    SELECT w.freq, SUBSTRING(w.word, CAST(i AS INT), CAST(L AS INT))
             AS piece
    FROM w,
         UNNEST(range(1, LENGTH(w.word) + 1)) AS u(i),
         UNNEST(range(1, {max_piece_len} + 1)) AS v(L)
    WHERE i + L - 1 <= LENGTH(w.word)
  ) GROUP BY piece
),
seed AS MATERIALIZED (
  SELECT piece, c FROM sub WHERE LENGTH(piece) = 1
  UNION ALL
  SELECT piece, c FROM (
    SELECT piece, c FROM sub WHERE LENGTH(piece) > 1
    ORDER BY c DESC, piece LIMIT {seed_size})
),
v0 AS MATERIALIZED (
  SELECT piece, c,
         CAST(FLOOR(LN(c / (SELECT CAST(SUM(c) AS DOUBLE) FROM seed))
                    * 1e9 + 0.5) AS BIGINT) AS ilp
  FROM seed
)"""]
    for r in range(1, em_iters + 1):
        parts.append(f""",
p{r} AS (
  SELECT word, freq, 0 AS pos, CAST(0 AS BIGINT) AS score, 0 AS np,
         '' AS path
  FROM w
  UNION ALL
  SELECT p.word, p.freq, p.pos + LENGTH(v.piece), p.score + v.ilp,
         p.np + 1,
         CASE WHEN p.pos = 0 THEN v.piece
              ELSE p.path || chr(31) || v.piece END
  FROM p{r} p JOIN v{r - 1} v
    ON p.pos + LENGTH(v.piece) <= LENGTH(p.word)
   AND SUBSTRING(p.word, p.pos + 1, LENGTH(v.piece)) = v.piece
),
best{r} AS MATERIALIZED (
  SELECT word, freq, path FROM (
    SELECT word, freq, path,
           ROW_NUMBER() OVER (PARTITION BY word
             ORDER BY score DESC, np ASC, path ASC) AS rn
    FROM p{r} WHERE pos = LENGTH(word)) WHERE rn = 1
),
cnt{r} AS MATERIALIZED (
  SELECT piece, SUM(freq) AS c FROM (
    SELECT freq, unnest(string_split(path, chr(31))) AS piece
    FROM best{r}) GROUP BY piece
),
v{r} AS MATERIALIZED (
  SELECT piece, c,
         CAST(FLOOR(LN(c / (SELECT CAST(SUM(c) AS DOUBLE) FROM cnt{r}))
                    * 1e9 + 0.5) AS BIGINT) AS ilp
  FROM cnt{r}
)""")
    parts.append(f""",
kept AS MATERIALIZED (
  SELECT piece, c FROM v{em_iters}
  ORDER BY c DESC, piece LIMIT {vocab_size}
)""")
    return "".join(parts)


def unigram_oracle_sql(
    vocab_size: int = 40,
    seed_size: int = 48,
    max_piece_len: int = 6,
    em_iters: int = 3,
    max_word_len: int = 16,
    table: str = "documents",
    text_col: str = "text",
) -> str:
    """Trainer oracle: the final vocabulary with counts and logprobs
    re-normalized over the kept top-``vocab_size`` pieces."""
    return _trainer_ctes(
        vocab_size, seed_size, max_piece_len, em_iters, max_word_len,
        table, text_col,
    ) + """
SELECT piece, CAST(c AS BIGINT) AS count,
       ROUND(LN(c / (SELECT CAST(SUM(c) AS DOUBLE) FROM kept)), 6)
         AS logprob
FROM kept ORDER BY count DESC, piece"""


def unigram_tokenize_oracle_sql(
    vocab_size: int = 40,
    seed_size: int = 48,
    max_piece_len: int = 6,
    em_iters: int = 3,
    max_word_len: int = 16,
    table: str = "documents",
    text_col: str = "text",
) -> str:
    """Apply-path oracle: replays training, then tokenizes EVERY word
    (no length filter — apply doesn't filter) with the kept vocabulary
    plus the single-char OOV floor, ranking candidate segmentations by
    (uses-fallback ASC, score DESC, pieces ASC, path ASC) — exactly
    ``_segment_oov``'s two-phase preference (a kept-only full path
    always beats any fallback path, regardless of score). n_lossless is
    n_docs by construction here (full-coverage paths concatenate back
    to the word); the ENGINE computes it from its actual output, so the
    driver row pins the apply path end-to-end."""
    return _trainer_ctes(
        vocab_size, seed_size, max_piece_len, em_iters, max_word_len,
        table, text_col,
    ) + f""",
keptv AS MATERIALIZED (
  SELECT piece,
         CAST(FLOOR(LN(c / (SELECT CAST(SUM(c) AS DOUBLE) FROM kept))
                    * 1e9 + 0.5) AS BIGINT) AS ilp,
         0 AS fb
  FROM kept
),
aw AS MATERIALIZED (
  SELECT w AS word, COUNT(*) AS freq FROM (
    SELECT unnest(list_filter(regexp_split_to_array(lower({text_col}),
                                                    '\\s+'),
                  x -> x <> '')) AS w
    FROM {table}) GROUP BY w
),
vaug AS MATERIALIZED (
  SELECT piece, ilp, fb FROM keptv
  UNION ALL
  SELECT ch AS piece, (SELECT MIN(ilp) - 1 FROM keptv) AS ilp, 1 AS fb
  FROM (SELECT DISTINCT SUBSTRING(word, CAST(i AS INT), 1) AS ch
        FROM aw, UNNEST(range(1, LENGTH(word) + 1)) AS u(i))
  WHERE ch NOT IN (SELECT piece FROM keptv)
),
pa AS (
  SELECT word, freq, 0 AS pos, CAST(0 AS BIGINT) AS score, 0 AS np,
         0 AS fb, '' AS path
  FROM aw
  UNION ALL
  SELECT p.word, p.freq, p.pos + LENGTH(v.piece), p.score + v.ilp,
         p.np + 1, GREATEST(p.fb, v.fb),
         CASE WHEN p.pos = 0 THEN v.piece
              ELSE p.path || chr(31) || v.piece END
  FROM pa p JOIN vaug v
    ON p.pos + LENGTH(v.piece) <= LENGTH(p.word)
   AND SUBSTRING(p.word, p.pos + 1, LENGTH(v.piece)) = v.piece
),
besta AS MATERIALIZED (
  SELECT word, freq, np FROM (
    SELECT word, freq, np,
           ROW_NUMBER() OVER (PARTITION BY word
             ORDER BY fb ASC, score DESC, np ASC, path ASC) AS rn
    FROM pa WHERE pos = LENGTH(word)) WHERE rn = 1
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM {table}) AS n_docs,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {table}) AS n_lossless,
       CAST(SUM(freq * np) AS BIGINT) AS total_pieces,
       CAST(SUM(freq) AS BIGINT) AS total_words,
       ROUND(SUM(freq * np) / CAST(SUM(freq) AS DOUBLE), 4)
         AS pieces_per_word
FROM besta"""

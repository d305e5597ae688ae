"""WordPiece tokenizer training and application, Spark-first.

Schuster & Nakajima 2012 (Japanese/Korean voice search) as productized
by Wu et al. 2016 (GNMT §4.1) and BERT (Devlin et al. 2019): like BPE,
training repeatedly merges an adjacent symbol pair over the corpus, but
the pair is chosen to maximize the LIKELIHOOD GAIN of a unigram LM —
``score(a,b) = count(ab) / (count(a) · count(b))`` — rather than the
raw pair count.  Application is NOT a merge replay (the BPE property);
it is greedy longest-match-first ("maximal munch") against the learned
vocabulary, with the BERT ``##`` continuation-prefix convention and a
whole-word ``[UNK]`` fallback when no piece matches.

Completes the tokenizer-training family next to ``operators/bpe.py``
(frequency merges) and ``operators/unigram.py`` (Kudo 2018 EM): the
three trainers modern LLM pipelines actually use.

Scale design is the BPE one — the same observation holds: after ONE
corpus-scale word-frequency aggregation, training runs entirely on the
bounded DISTINCT-WORD table (vocabulary-bounded, ≈10⁶–10⁸ rows at
100 TB, never corpus-bounded):

* ``train_wordpiece(mode="distributed")`` — each merge round is two
  bounded aggregations over the cached word table (adjacent-pair counts
  + symbol counts, both map-side combined), a broadcast-joined scoring,
  and a 1-row collect of the argmax; the symbol arrays are rewritten
  in-plan via the ``aggregate`` higher-order function (pure codegen).
* ``train_wordpiece(mode="driver")`` — collect the word table once
  (guarded) and run the classic loop driver-side.  Identical merges by
  construction; a parity test pins it.
* ``apply_wordpiece`` — Arrow-batched ``mapInPandas`` greedy
  longest-match with a per-batch word→pieces memo (the ``apply_bpe``
  idiom: natural-language words repeat heavily, so per-row cost is a
  dict hit after first occurrence).

Determinism contract (what makes the DuckDB oracle possible): the
selection score is the IEEE-754 double quotient
``CAST(count(ab) AS DOUBLE) / (count(a) * count(b))`` — Python ``/``
on a pre-rounded float denominator, Spark's long→double division and
DuckDB's ``CAST(... AS DOUBLE) / (BIGINT * BIGINT)`` are all the same
correctly-rounded operation, so the argmax is bit-identical in all
three engines; ties break (left ASC, right ASC).  The denominator
product is exact in int64 and below 2⁵³ for any corpus whose total
token count is (``count(a)·count(b)`` ≤ total²; the driver guard
refuses corpora past the exactness envelope).

``wordpiece_oracle_sql()`` / ``wordpiece_tokenize_oracle_sql()`` emit
the DuckDB replay: the unrolled per-round CTE chain of the BPE oracle
(wrapped-symbol string ``replace`` ≡ the greedy single-pass merge) with
the likelihood argmax, and — because maximal munch is NOT merge replay
— a precomputed greedy-step table (longest vocab match at every
(word, position)) walked by a recursive CTE for the apply path.

Reference scope: /root/reference covers only the skew-join operator
family (dfimplicits.scala); tokenizer training is part of the
training-data-pipeline surface this engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .bpe import word_frequencies

UNK = "[UNK]"
CONT = "##"
_MAX_DEN = float(2**53)


def _initial_pieces(word: str) -> list[str]:
    """BERT-convention initial symbols: first char raw, the rest
    ``##``-prefixed."""
    return [word[0]] + [CONT + c for c in word[1:]]


def _initial_symbols(words: DataFrame) -> DataFrame:
    """(word, freq, syms): first char raw, later chars ##-prefixed —
    all in-plan (split + transform, codegen)."""
    chars = F.split(F.col("word"), "")
    return words.select(
        "word",
        "freq",
        F.concat(
            F.slice(chars, 1, 1),
            F.transform(
                F.slice(chars, 2, F.greatest(F.size(chars) - 1, F.lit(0))),
                lambda c: F.concat(F.lit(CONT), c),
            ),
        ).alias("syms"),
    )


def _pair_and_symbol_counts(syms_df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """((left, right, cnt), (sym, c)): adjacent-pair and per-symbol
    occurrence counts, both weighted by word freq and map-side
    combined."""
    pairs = syms_df.where(F.size("syms") >= 2).select(
        "freq",
        F.explode(
            F.arrays_zip(
                F.slice("syms", 1, F.size("syms") - 1).alias("left"),
                F.slice("syms", 2, F.size("syms") - 1).alias("right"),
            )
        ).alias("p"),
    )
    pair_counts = pairs.groupBy(
        F.col("p.left").alias("left"), F.col("p.right").alias("right")
    ).agg(F.sum("freq").alias("cnt"))
    sym_counts = (
        syms_df.select("freq", F.explode("syms").alias("sym"))
        .groupBy("sym")
        .agg(F.sum("freq").alias("c"))
    )
    return pair_counts, sym_counts


def _merge_expr(left: str, right: str, merged: str):
    """aggregate() HOF folding one greedy non-overlapping merge pass of
    (left, right) → merged over the symbol array — codegen, no
    Python (the operators/bpe.py idiom with an explicit merged literal,
    since the WordPiece merge strips the continuation prefix)."""
    a, b, m = F.lit(left), F.lit(right), F.lit(merged)
    return F.aggregate(
        F.col("syms"),
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == b),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(m)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _merged_piece(left: str, right: str) -> str:
    """left + right without the continuation prefix.  The right symbol
    of any adjacent pair is always a continuation piece (only position
    1 is unprefixed, and merges preserve that invariant)."""
    if not right.startswith(CONT):
        raise AssertionError(f"right symbol lacks {CONT!r}: {right!r}")
    return left + right[len(CONT):]


def train_wordpiece(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_freq: int = 1,
    mode: str = "driver",
    max_vocab_words: int = 2_000_000,
    checkpoint_every: int = 8,
    words_rows: list | None = None,
) -> list[tuple[int, str, str, str, int, int, int]]:
    """Learn ``n_merges`` WordPiece merges; returns
    ``[(rank, left, right, merged, pair_count, left_count,
    right_count), ...]`` (rank from 0) — the full certified trajectory,
    counts included, so an oracle can replay the argmax.

    mode="driver": one corpus aggregation, then the loop runs on the
    collected word table (refused above ``max_vocab_words``).
    mode="distributed": the word table never leaves the cluster; each
    round collects exactly one (argmax) row.

    ``words_rows`` (r15): a pre-collected word table (the bpe.train_bpe
    contract — rows of ``word_frequencies(docs, text_col,
    min_freq).collect()``) shared across trainers by
    queries._tok_family; bit-identical merges (the trainer is
    order-independent: integer counts, full (-score, left, right)
    tie-break) — pinned in tests/test_tok_family.py."""
    if mode == "driver":
        if words_rows is not None:
            rows = list(words_rows)
        else:
            rows = word_frequencies(docs, text_col, min_freq).limit(
                max_vocab_words + 1
            ).collect()
        if len(rows) > max_vocab_words:
            raise ValueError(
                f"word table exceeds max_vocab_words={max_vocab_words}; "
                "use mode='distributed'"
            )
        vocab = {
            tuple(_initial_pieces(r["word"])): int(r["freq"]) for r in rows
        }
        return _train_driver(vocab, n_merges)
    words = word_frequencies(docs, text_col, min_freq)
    if mode != "distributed":
        raise ValueError(f"mode must be driver|distributed, got {mode!r}")

    syms_df = _initial_symbols(words).persist()
    syms_df.count()  # materialize before iterating
    merges: list[tuple[int, str, str, str, int, int, int]] = []
    for rank in range(n_merges):
        pair_counts, sym_counts = _pair_and_symbol_counts(syms_df)
        sl = sym_counts.select(
            F.col("sym").alias("left"), F.col("c").alias("cl")
        )
        sr = sym_counts.select(
            F.col("sym").alias("right"), F.col("c").alias("cr")
        )
        top = (
            pair_counts.join(sl, "left")
            .join(sr, "right")
            .orderBy(
                F.desc(
                    F.col("cnt").cast("double")
                    / (F.col("cl") * F.col("cr"))
                ),
                F.asc("left"),
                F.asc("right"),
            )
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] <= 0:
            break
        left, right = top[0]["left"], top[0]["right"]
        cnt, cl, cr = (int(top[0][k]) for k in ("cnt", "cl", "cr"))
        if float(cl) * float(cr) > _MAX_DEN:
            raise ValueError(
                "symbol-count product exceeds the 2^53 double-exactness "
                "envelope; rescale counts before training"
            )
        merged = _merged_piece(left, right)
        merges.append((rank, left, right, merged, cnt, cl, cr))
        nxt = syms_df.withColumn("syms", _merge_expr(left, right, merged))
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
) -> list[tuple[int, str, str, str, int, int, int]]:
    merges: list[tuple[int, str, str, str, int, int, int]] = []
    for rank in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        sym_counts: dict[str, int] = {}
        for syms, fq in vocab.items():
            for s in syms:
                sym_counts[s] = sym_counts.get(s, 0) + fq
            for p in zip(syms, syms[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + fq
        if not pair_counts:
            break
        best = None
        for (left, right), cnt in pair_counts.items():
            den = float(sym_counts[left]) * float(sym_counts[right])
            if den > _MAX_DEN:
                raise ValueError(
                    "symbol-count product exceeds the 2^53 "
                    "double-exactness envelope"
                )
            # IEEE double quotient — identical to Spark's long→double
            # division and DuckDB's CAST(.. AS DOUBLE) / (l * r)
            key = (-(cnt / den), left, right)
            if best is None or key < best[0]:
                best = (key, left, right, cnt)
        _, left, right, cnt = best
        merged = _merged_piece(left, right)
        merges.append(
            (rank, left, right, merged, cnt,
             sym_counts[left], sym_counts[right])
        )
        out: dict[tuple[str, ...], int] = {}
        for syms, fq in vocab.items():
            acc: list[str] = []
            for x in syms:
                if acc and acc[-1] == left and x == right:
                    acc[-1] = merged
                else:
                    acc.append(x)
            key = tuple(acc)
            out[key] = out.get(key, 0) + fq
        vocab = out
    return merges


def wordpiece_vocab(
    docs: DataFrame,
    merges: list[tuple],
    text_col: str = "text",
    min_freq: int = 1,
    words_rows: list | None = None,
) -> set[str]:
    """The apply vocabulary: the initial alphabet (first chars raw,
    later chars ##-prefixed — one bounded distinct-char aggregation)
    plus every merged piece.  Matches the classic trainer's emitted
    vocab (alphabet ∪ merges).

    ``words_rows`` (r15): a pre-collected word table (the train_bpe
    contract) — the alphabet then derives driver-side via
    ``_initial_pieces`` (the same char split the driver-mode trainer
    uses, whose parity with the in-plan split is pinned by the
    driver-vs-distributed trainer tests), skipping the extra corpus
    aggregation."""
    if words_rows is not None:
        vocab = set()
        for r in words_rows:
            vocab.update(_initial_pieces(r["word"]))
        vocab.update(m[3] for m in merges)
        return vocab
    chars = F.split(F.col("word"), "")
    alpha_rows = (
        word_frequencies(docs, text_col, min_freq)
        .select(
            F.explode(
                F.concat(
                    F.slice(chars, 1, 1),
                    F.transform(
                        F.slice(
                            chars, 2,
                            F.greatest(F.size(chars) - 1, F.lit(0)),
                        ),
                        lambda c: F.concat(F.lit(CONT), c),
                    ),
                )
            ).alias("piece")
        )
        .distinct()
        .collect()
    )
    vocab = {r["piece"] for r in alpha_rows}
    vocab.update(m[3] for m in merges)
    return vocab


def _encode_word(word: str, vocab: set[str], max_len: int) -> list[str]:
    """Greedy longest-match-first (maximal munch) with the whole-word
    [UNK] fallback — the BERT WordpieceTokenizer algorithm."""
    n = len(word)
    pieces: list[str] = []
    i = 0
    while i < n:
        hit = None
        for j in range(min(n, i + max_len), i, -1):
            cand = word[i:j] if i == 0 else CONT + word[i:j]
            if cand in vocab:
                hit = (cand, j)
                break
        if hit is None:
            return [UNK]
        pieces.append(hit[0])
        i = hit[1]
    return pieces


def apply_wordpiece(
    docs: DataFrame,
    vocab: set[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "pieces",
) -> DataFrame:
    """(id, pieces array<string>, n_pieces, n_unk_words): tokenize with
    a learned vocabulary via greedy longest-match.  Arrow-batched; a
    per-batch word→pieces memo exploits word repetition.  The vocab is
    closure-captured (bounded — alphabet + merges)."""
    vocab = set(vocab)
    max_len = max(
        (len(p) - len(CONT) if p.startswith(CONT) else len(p))
        for p in vocab
    ) if vocab else 1
    schema = (
        f"{id_col} long, {out_col} array<string>, "
        "n_pieces int, n_unk_words int"
    )

    def batches(it):
        import pandas as pd

        memo: dict[str, list[str]] = {}

        def encode(text: str) -> tuple[list[str], int, int]:
            out: list[str] = []
            n_unk = 0
            for w in text.lower().split():
                toks = memo.get(w)
                if toks is None:
                    toks = _encode_word(w, vocab, max_len)
                    memo[w] = toks
                if toks == [UNK]:
                    n_unk += 1
                out.extend(toks)
            return out, len(out), n_unk

        for pdf in it:
            enc = pdf[text_col].map(encode)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    out_col: enc.map(lambda t: t[0]),
                    "n_pieces": enc.map(lambda t: t[1]).astype("int32"),
                    "n_unk_words": enc.map(lambda t: t[2]).astype("int32"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(batches, schema)


# --------------------------------------------------------------------
# DuckDB oracle replay (queries.py wires these into ORACLES)
# --------------------------------------------------------------------

_SO, _SC = "chr(30)", "chr(31)"  # symbol open/close wrappers


def _wordpiece_chain_ctes(n_merges: int) -> str:
    """The unrolled per-round CTE chain replaying ``n_merges``
    WordPiece rounds in DuckDB — the operators/bpe.py oracle technique
    (wrapped-symbol ``replace`` ≡ the greedy single-pass merge; the
    chr(30)/chr(31) wrappers make cross-boundary matches impossible and
    are absent from the fixtures) with the likelihood argmax: per round
    the pair AND symbol counts come off the encoded string, the winner
    maximizes the IEEE double ``CAST(cnt AS DOUBLE) / (cl * cr)`` —
    the exact operation the trainer performs — tie-break (l, r2)."""
    so, sc = _SO, _SC
    parts = [f"""w AS (
  SELECT word, COUNT(*) AS freq FROM (
    SELECT UNNEST(regexp_split_to_array(LOWER(text), '\\s+')) AS word
    FROM documents
  ) WHERE word <> ''
  GROUP BY word
),
wpenc0 AS MATERIALIZED (
  SELECT word, freq,
         {so} || substring(word, 1, 1) || {sc} ||
         CASE WHEN length(word) > 1
              THEN regexp_replace(substring(word, 2), '(.)',
                                  {so} || '##\\1' || {sc}, 'g')
              ELSE '' END AS enc
  FROM w
)"""]
    for r in range(n_merges):
        parts.append(f"""wps{r} AS (
  SELECT s AS sym, SUM(freq) AS c
  FROM (SELECT freq,
               UNNEST(string_split(substring(enc, 2, length(enc) - 2),
                                   {sc} || {so})) AS s
        FROM wpenc{r}) t
  GROUP BY 1
),
wpp{r} AS (
  SELECT lst[i] AS l, lst[i + 1] AS r2, SUM(freq) AS cnt
  FROM (SELECT freq,
               string_split(substring(enc, 2, length(enc) - 2),
                            {sc} || {so}) AS lst
        FROM wpenc{r}) t,
       UNNEST(range(1, len(lst))) AS u(i)
  GROUP BY 1, 2
),
wpb{r} AS MATERIALIZED (
  SELECT p.l, p.r2, p.cnt, sl.c AS cl, sr.c AS cr,
         p.l || substring(p.r2, 3) AS merged
  FROM wpp{r} p
  JOIN wps{r} sl ON sl.sym = p.l
  JOIN wps{r} sr ON sr.sym = p.r2
  ORDER BY CAST(p.cnt AS DOUBLE) / (sl.c * sr.c) DESC, p.l, p.r2
  LIMIT 1
),
wpenc{r + 1} AS MATERIALIZED (
  SELECT word, freq,
         replace(enc,
                 {so} || b.l || {sc} || {so} || b.r2 || {sc},
                 {so} || b.merged || {sc}) AS enc
  FROM wpenc{r}, wpb{r} b
)""")
    return ",\n".join(parts)


def wordpiece_oracle_sql(n_merges: int = 16) -> str:
    """Training oracle: the full merge trajectory — rank, pair, merged
    piece, pair count and both symbol counts (every argmax input
    certified)."""
    rows = "\n  UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS rank, l AS \"left\", r2 AS \"right\", "
        f"merged, CAST(cnt AS BIGINT) AS pair_count, "
        f"CAST(cl AS BIGINT) AS left_count, "
        f"CAST(cr AS BIGINT) AS right_count FROM wpb{r}"
        for r in range(n_merges)
    )
    return (f"WITH {_wordpiece_chain_ctes(n_merges)}\n"
            f"SELECT * FROM (\n  {rows}\n) ORDER BY rank")


def wordpiece_tokenize_oracle_sql(n_merges: int = 16) -> str:
    """Apply oracle: replays training, assembles the kept vocabulary
    (initial alphabet ∪ merged pieces), precomputes the GREEDY step —
    the longest vocab match at every (word, position), a plain
    aggregation — and walks it with a recursive CTE (one successor per
    state, linear work; maximal munch is not merge replay, so the walk,
    not the final training state, is the ground truth).  Words whose
    walk strands before the end are whole-word [UNK] (1 piece), the
    BERT fallback; with the full training alphabet in vocab none
    strand on the training corpus itself, which is exactly what
    n_lossless certifies."""
    so, sc = _SO, _SC
    merged_rows = "\n      UNION ALL ".join(
        f"SELECT merged FROM wpb{r}" for r in range(n_merges)
    )
    return f"""WITH RECURSIVE {_wordpiece_chain_ctes(n_merges)},
vocab AS MATERIALIZED (
  SELECT DISTINCT piece FROM (
    SELECT UNNEST(string_split(substring(enc, 2, length(enc) - 2),
                               {sc} || {so})) AS piece
    FROM wpenc0
    UNION ALL
    SELECT merged AS piece FROM (
      {merged_rows}
    )
  )
),
vraw AS (  -- piece with the ## prefix stripped + word-initial flag
  SELECT piece,
         CASE WHEN piece LIKE '##%' THEN substring(piece, 3)
              ELSE piece END AS raw,
         piece NOT LIKE '##%' AS initial
  FROM vocab
),
gm AS MATERIALIZED (  -- greedy step: longest match per (word, pos)
  SELECT w.word, CAST(u.pos AS INT) AS pos,
         MAX(length(v.raw)) AS step
  FROM w, UNNEST(range(1, length(w.word) + 1)) AS u(pos)
  JOIN vraw v
    ON v.initial = (u.pos = 1)
   AND v.raw = substring(w.word, CAST(u.pos AS INT), length(v.raw))
  GROUP BY 1, 2
),
walk AS (
  SELECT word, 1 AS pos, 0 AS n_pieces FROM w
  UNION ALL
  SELECT wk.word, wk.pos + g.step, wk.n_pieces + 1
  FROM walk wk JOIN gm g ON g.word = wk.word AND g.pos = wk.pos
  WHERE wk.pos <= length(wk.word)
),
wtoks AS (  -- per-word piece count; stranded walks → [UNK] (1 piece)
  SELECT w.word,
         CASE WHEN fin.n_pieces IS NULL THEN 1 ELSE fin.n_pieces END
           AS n_toks,
         CASE WHEN fin.n_pieces IS NULL THEN 1 ELSE 0 END AS is_unk
  FROM w LEFT JOIN (
    SELECT word, n_pieces FROM walk wk
    WHERE pos = length(word) + 1
  ) fin USING (word)
),
docw AS (
  SELECT doc_id,
         UNNEST(regexp_split_to_array(LOWER(text), '\\s+')) AS word
  FROM documents
),
per_doc AS (
  SELECT d.doc_id, COUNT(*) AS n_words, SUM(wt.n_toks) AS n_toks,
         SUM(wt.is_unk) AS n_unk
  FROM docw d JOIN wtoks wt USING (word)
  WHERE d.word <> ''
  GROUP BY d.doc_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN COALESCE(p.n_unk, 0) = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_lossless,
       CAST(COALESCE(SUM(p.n_unk), 0) AS BIGINT) AS n_unk_words,
       CAST(COALESCE(SUM(p.n_toks), 0) AS BIGINT) AS total_pieces,
       CAST(COALESCE(SUM(p.n_words), 0) AS BIGINT) AS total_words,
       ROUND(CAST(COALESCE(SUM(p.n_toks), 0) AS DOUBLE)
             / SUM(p.n_words), 4) AS pieces_per_word
FROM documents doc LEFT JOIN per_doc p USING (doc_id)"""

"""Text-analysis column functions (LLM-data-pipeline extension surface).

All functions return JVM-side ``Column`` expressions (whole-stage codegen,
no Python in the hot path) and are designed for *oracle parity*: each is a
composition of functions with identical semantics in Spark SQL and DuckDB
(``length``/``replace``/``regexp_replace``/``md5``), so every operator here
can be hash-checked against an ANSI-SQL oracle. Token/stopword counts use
the ``length - length(replace(...))`` idiom instead of ``split`` because
split's empty-string edge cases differ across engines.

At 100 TB these run as a single projection over the scan — column-pruned,
no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, functions as F

# languages scored by the stopword heuristic: language → distinctive tokens
# (space-padded to approximate word boundaries; identical logic in the SQL
# oracle, see queries.py)
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "fr": [" le ", " la ", " et "],
    "de": [" der ", " und ", " die "],
    "es": [" el ", " los ", " y "],
}

PUNCT_CLASS = r"[.,!?;:]"


def occurrences(colname: str, needle: str) -> Column:
    """count of ``needle`` in ``colname`` — (len(s) - len(replace(s, n, ''))) / len(n)."""
    c = F.col(colname)
    return (
        (F.length(c) - F.length(F.replace(c, F.lit(needle), F.lit("")))) / len(needle)
    ).cast("int")


def token_count(colname: str) -> Column:
    """Whitespace token count for single-space-separated text:
    len - len(without spaces) + 1, 0 for empty."""
    c = F.col(colname)
    n = F.length(c) - F.length(F.replace(c, F.lit(" "), F.lit(""))) + F.lit(1)
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(n).cast("int")


# BPE-style pre-tokenizer classes (simplified GPT-2 pattern, restricted to
# constructs Java regex (Spark) and RE2 (DuckDB) evaluate identically — no
# lookarounds, no \p classes): letter runs, single digits (number splitting
# like modern tokenizers), non-alphanumeric-non-space runs.
BPE_TOKEN_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]+"


def bpe_token_count(colname: str) -> Column:
    """Pre-tokenizer token count under BPE_TOKEN_PATTERN — the
    "BPE-ish regex" counter of the pipeline contract (an upper bound on
    merged-BPE token count; exact merges need the vocab, which is a model
    artifact, not an engine function). Pure codegen ``regexp_count``."""
    return F.regexp_count(F.col(colname), F.lit(BPE_TOKEN_PATTERN)).cast("int")


def punct_count(colname: str) -> Column:
    c = F.col(colname)
    return (F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))).cast("int")


def punct_ratio(colname: str) -> Column:
    c = F.col(colname)
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        punct_count(colname).cast("double") / F.length(c)
    )


def stopword_count(colname: str, lang: str = "en") -> Column:
    padded = F.concat(F.lit(" "), F.col(colname), F.lit(" "))
    total = F.lit(0)
    for marker in LANG_MARKERS[lang]:
        occ = (
            (F.length(padded) - F.length(F.replace(padded, F.lit(marker), F.lit(""))))
            / len(marker)
        ).cast("int")
        total = total + occ
    return total.cast("int")


def stopword_ratio(colname: str, lang: str = "en") -> Column:
    return F.when(token_count(colname) == 0, F.lit(0.0)).otherwise(
        stopword_count(colname, lang).cast("double") / token_count(colname)
    )


def lang_score(colname: str, lang: str) -> Column:
    return stopword_count(colname, lang)


def lang_id(colname: str) -> Column:
    """First-match CASE over per-language stopword scores: a language wins if
    its score is positive and >= every later language's score (fixed order
    en > fr > de > es — mirrored token-for-token in the SQL oracle)."""
    order = list(LANG_MARKERS)
    scores = {lang: stopword_count(colname, lang) for lang in order}
    expr = None
    for i, lang in enumerate(order):
        cond = scores[lang] > 0
        for other in order[i + 1 :]:
            cond = cond & (scores[lang] >= scores[other])
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def quality_score(colname: str) -> Column:
    """Heuristic [0,1] doc quality: rewards mid-length docs and stopword
    presence, penalizes punctuation soup. Pure per-row double arithmetic —
    bit-identical across engines."""
    c = F.col(colname)
    length_term = F.least(F.length(c).cast("double") / F.lit(500.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(colname) * 5.0, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(colname) * 10.0, F.lit(1.0))
    return (length_term * 0.4 + stop_term * 0.4 + punct_term * 0.2).alias("quality")


def fingerprint(colname: str) -> Column:
    """Deterministic 128-bit document fingerprint (md5 hex) — the exact-dedup
    key. md5(string) matches DuckDB's md5()."""
    return F.md5(F.col(colname).cast("binary"))


def normalize_text(text: Column | str) -> Column:
    """Canonical text form for normalization-aware dedup: lowercase,
    every non-alphanumeric run collapsed to one space, trimmed — so
    casing, punctuation, and whitespace variants of the same content
    share one exact-dedup fingerprint (the C4/RefinedWeb pre-hash
    step; raw exact dedup misses 'Hello, World!' vs 'hello world').

    Pure codegen (lower + two regexp_replace + trim); the character
    classes (``[^a-z0-9 ]``, `` +``) are dialect-portable between
    Java regex and RE2, so a DuckDB oracle replays the normalization
    byte-for-byte. ASCII-focused by design — extend the class, not
    the mechanism, for other scripts."""
    c = F.col(text) if isinstance(text, str) else text
    collapsed = F.regexp_replace(
        F.regexp_replace(F.lower(c), "[^a-z0-9 ]", " "), " +", " "
    )
    return F.trim(collapsed)


TRACKING_PARAMS = ("utm_", "gclid=", "fbclid=", "msclkid=")


def canonicalize_url(url: Column | str) -> Column:
    """Crawl-grade URL canonicalization, entirely in whole-stage codegen
    (the dedup key for 'same page fetched many ways' — the first
    normalization a CommonCrawl-scale pipeline applies before any
    content hash):

    * scheme and host lowercased; default port stripped (``:80`` for
      http, ``:443`` for https);
    * fragment dropped; trailing path slashes collapsed (bare host →
      ``/``);
    * tracking query params dropped (``utm_*``, ``gclid``, ``fbclid``,
      ``msclkid``), remaining params sorted so parameter order never
      splits a URL's identity.

    Preconditions (documented, not detected): exactly one ``://``, at
    most one ``?`` / ``#``.  Every step maps 1:1 onto ANSI SQL string
    functions, so the registry oracle replays the full ladder."""
    u = F.col(url) if isinstance(url, str) else url
    no_frag = F.substring_index(u, "#", 1)
    base = F.substring_index(no_frag, "?", 1)
    query = F.when(
        no_frag.contains("?"), F.substring_index(no_frag, "?", -1)
    ).otherwise(F.lit(""))
    scheme = F.lower(F.substring_index(base, "://", 1))
    rest = F.substring_index(base, "://", -1)
    hostport = F.lower(F.substring_index(rest, "/", 1))
    host = (
        F.when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .otherwise(hostport)
    )
    slash = F.instr(rest, "/")
    path0 = F.when(
        slash > 0, F.substring(rest, slash, F.length(rest))
    ).otherwise(F.lit(""))
    path1 = F.regexp_replace(path0, "/+$", "")
    path = F.when(path1 == "", F.lit("/")).otherwise(path1)

    def _keep(p: Column) -> Column:
        cond = p != ""
        for t in TRACKING_PARAMS:
            cond = cond & ~p.startswith(t)
        return cond

    params = F.array_sort(F.filter(F.split(query, "&"), _keep))
    qs = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.concat_ws("&", params))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qs)


def chunk_documents(
    docs,
    chunk_tokens: int = 128,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Split documents into OVERLAPPING token-window chunks — the RAG /
    embedding-pipeline primitive (context windows bound what an encoder
    sees; overlap keeps boundary sentences retrievable from both
    sides).  Stride = chunk_tokens − overlap; the final window is the
    remainder (never empty, never duplicated: a doc shorter than one
    chunk yields exactly one chunk).

    Pure codegen: whitespace split → a generated sequence of window
    starts → slice + concat_ws per window — no Python, no shuffle (the
    explode is map-side; downstream groupBys shuffle chunk rows, which
    is the point: chunks are the unit of work from here on).  Replays
    in SQL via list slicing, so chunk text itself is EXACT-checkable.

    Output: (id, chunk_idx, start_token, n_tokens, chunk_text).
    """
    from pyspark.sql import functions as F

    if chunk_tokens < 1 or not 0 <= overlap < chunk_tokens:
        raise ValueError("need chunk_tokens >= 1 and 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != ""
    )
    n = F.size("__toks")
    # window starts: 1, 1+stride, ... while start <= n - overlap (so the
    # last window reaches the end); a doc with n <= chunk_tokens gets
    # exactly one start
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"), F.lit(1)
    )
    starts = F.sequence(F.lit(0), n_chunks - 1)
    return (
        docs.select(F.col(id_col), toks.alias("__toks"))
        .where(F.size("__toks") > 0)
        .select(
            id_col,
            F.size("__toks").alias("__n"),
            F.explode(
                F.transform(
                    starts,
                    lambda i: F.struct(
                        i.cast("int").alias("idx"),
                        (i * stride + 1).cast("int").alias("start"),
                    ),
                )
            ).alias("__w"),
            F.col("__toks"),
        )
        .select(
            id_col,
            F.col("__w.idx").alias("chunk_idx"),
            F.col("__w.start").alias("start_token"),
            F.least(
                F.lit(chunk_tokens), F.col("__n") - F.col("__w.start") + 1
            ).alias("n_tokens"),
            F.concat_ws(
                " ", F.slice("__toks", F.col("__w.start"), F.lit(chunk_tokens))
            ).alias("chunk_text"),
        )
    )


def cdc_chunks(
    docs,
    gram: int = 4,
    avg_tokens: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
):
    """CONTENT-DEFINED chunking — the Rabin/FastCDC idea re-expressed
    relationally: a chunk closes after token ``i`` when the hash of
    the ``gram``-token window ENDING at i satisfies
    ``hash % avg_tokens == 0`` (marker probability 1/avg_tokens →
    expected chunk length ≈ avg_tokens tokens).

    Why it matters at 100 TB: fixed windows (``chunk_documents``)
    shift EVERY boundary after an insertion, so a one-sentence edit
    re-embeds/re-dedups the whole document downstream; CDC boundaries
    depend only on LOCAL content, so an edit perturbs at most the
    chunks overlapping it and every other chunk keeps its identity
    (and its dedup hash, its embedding, its cache entry). The shift
    test is pinned in tests/test_corpus_stats.py.

    Pure codegen: whitespace split → per-position window hash →
    per-doc running boundary count (window partitioned by doc, bounded
    by doc length) → per-chunk fold + one join back for the chunk
    text. ``hash_fn="md5"`` makes the boundary rule SQL-replayable
    (first-8-hex-chars of md5(space-joined window) — the SimHash/HLL
    precedent); xxhash64 stays the fast default.

    Output: (id, chunk_id, start_tok, n_tokens, chunk_text).
    """
    from ..sources.tables import fan_out_narrow

    if gram < 1:
        raise ValueError("gram must be >= 1")
    if avg_tokens < 2:
        raise ValueError("avg_tokens must be >= 2")
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"hash_fn must be xxhash64|md5, got {hash_fn!r}")
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    base = fan_out_narrow(
        docs.select(F.col(id_col), toks.alias("__tk")).where(F.size(toks) > 0)
    )
    pos = base.select(
        id_col,
        F.explode(F.sequence(F.lit(1), F.size("__tk"))).alias("__i"),
        "__tk",
    )
    # Clamp the slice start to 1: for __i < gram the marker is 0 anyway,
    # but relying on WHEN's short-circuit to keep a start<=0 slice (runtime
    # error at 0, end-relative when negative) unevaluated is fragile across
    # Spark versions / CSE — never construct the malformed window at all.
    win = F.concat_ws(
        " ",
        F.slice(
            "__tk",
            F.greatest(F.col("__i") - F.lit(gram - 1), F.lit(1)),
            F.lit(gram),
        ),
    )
    if hash_fn == "md5":
        h = F.conv(F.substring(F.md5(win), 1, 8), 16, 10).cast("long")
    else:
        h = F.xxhash64(win)
    marker = F.when(
        (F.col("__i") >= gram) & (F.pmod(h, F.lit(avg_tokens)) == 0), 1
    ).otherwise(0)
    w = Window.partitionBy(id_col).orderBy("__i")
    chunked = (
        pos.select(id_col, "__i", marker.alias("__m"))
        .withColumn(
            "chunk_id",
            F.lit(1)
            + F.coalesce(
                F.sum("__m").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .groupBy(id_col, "chunk_id")
        .agg(
            F.min("__i").alias("start_tok"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    return chunked.join(base, id_col).select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("start_tok").cast("int").alias("start_tok"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.concat_ws(
            " ", F.slice("__tk", F.col("start_tok"), F.col("n_tokens"))
        ).alias("chunk_text"),
    )

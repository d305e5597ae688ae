"""Deduplication operators over document tables (LLM-pipeline extension).

Exact dedup is a hash-groupBy (md5 fingerprint → min-id representative),
oracle-checkable in ANSI SQL. Near-dup comes in three flavors:

* ``ngram_jaccard_pairs`` — *exact* n-gram Jaccard over character shingles,
  as explode → equi-join on shingle → |intersection| / |union|. Fully
  SQL-expressible, so it serves as the hash-checked oracle for the fuzzy
  family. Scale: the shingle join is the classic hot-token skew case —
  document frequency of a shingle bounds its join fan-out; very frequent
  shingles can be dropped like stopwords (``max_shingle_df``).
* ``minhash_pairs`` — MinHash+LSH banding: per-doc signature via codegen
  hash functions (xxhash64 with seed = permutation index), band → bucket →
  candidate pairs → exact Jaccard verify. No Python in the signature path.
* ``simhash_pairs`` — 64-bit SimHash over shingle hashes; near-dups share
  band-chunks of the fingerprint.
* ``embedding_near_dup`` — cosine >= threshold pairs over an embedding
  column (delegates to the similarity module's machinery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import fingerprint

# LSH band/signature DataFrames are consumed ~5× inside one plan (bucket
# stats, cap anti-join, both self-join sides, star pairs); without a persist
# each consumer re-runs the projection/signature shuffle — measured 3.5×
# slower at sf0.1. The operators cache them here; ``clear_band_cache``
# (also called by queries.clear_dedup_cache / bench.py) releases the blocks
# and drops any spill tables.
#
# Cache modes (VERDICT r3 #5 — executor memory is the wrong home for a
# billion-row band list at 100 TB):
#   True    — .persist() in executor memory/disk (fastest locally)
#   "table" — write once to a temp warehouse table, read back (bounded
#             storage memory; the write is an eager job at plan
#             construction)
#   "auto"  — pick by Catalyst's optimizedPlan sizeInBytes estimate of the
#             subtree: below _SPILL_THRESHOLD_BYTES persist, above spill
#             to table. The estimate is scan-proportional (it derives from
#             the parquet footprint feeding the subtree, ~600 KB at sf0.1),
#             so it is a coarse scale signal, not a precise band size —
#             exactly what the decision needs.
_CACHED_BANDS: list[DataFrame] = []
_SPILL_TABLES: list[tuple] = []  # (SparkSession, table_name)
_SPILL_THRESHOLD_BYTES = 4 << 30  # ~4 GiB of input scan → table mode
_SPILL_SEQ = [0]
_SPILL_TOKEN = __import__("uuid").uuid4().hex[:8]


def _drop_orphan_location(spark, name: str) -> None:
    """Delete a leftover managed-table directory for ``name`` (a killed
    session drops nothing — saveAsTable then fails with
    LOCATION_ALREADY_EXISTS even though the catalog has no such table)."""
    try:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        wh = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).replace("file:", "")
        p = jvm.org.apache.hadoop.fs.Path(f"{wh}/{name.lower()}")
        fs = p.getFileSystem(conf)
        if fs.exists(p):
            fs.delete(p, True)
    except Exception:  # best-effort — saveAsTable will surface real errors
        pass


def _plan_size_estimate(df: DataFrame) -> int:
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # estimate unavailable — treat as huge (safe mode)
        return 1 << 62


def _release_df(df: DataFrame) -> None:
    """Release whatever blocks ``df`` holds: unpersist a cached frame,
    and if it is a localCheckpoint (LogicalRDD plan) unpersist the
    wrapped RDD too — ``DataFrame.unpersist`` alone is a no-op for
    checkpoints (the blocks belong to the RDD, not the CacheManager)."""
    try:
        df.unpersist()
    except Exception:  # session already stopped — nothing to release
        pass
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # not a LogicalRDD plan (plain persist) — done above
        pass


_CKPT_LEDGER: list[DataFrame] = []  # ckpt-mode subset of _CACHED_BANDS


def register_ckpt(df: DataFrame) -> DataFrame:
    """Register an ALREADY-localCheckpointed frame in the session-cache
    ledger (released via release_entries / clear_band_cache, which
    unpersist the wrapped RDD). RELEASE IS ONE-WAY: a localCheckpoint's
    lineage is truncated, so a released frame can never be re-executed
    (ADVICE r14 #1) — callers must fully consume the result before any
    ledger release; tests/test_ckpt_invariant.py pins that no non-EAGER
    registry query registers a ckpt entry (bench.py's non-eager retry
    re-runs the same plan after releasing)."""
    _CACHED_BANDS.append(df)
    _CKPT_LEDGER.append(df)
    return df


def ckpt_snapshot() -> int:
    """Length of the ckpt-entry ledger — pair with ckpt_entries_since
    to detect ckpt registrations in a code region."""
    return len(_CKPT_LEDGER)


def ckpt_entries_since(snap: int) -> list:
    return _CKPT_LEDGER[snap:]


def _session_cache(df: DataFrame, mode=True) -> DataFrame:
    if mode == "ckpt":
        # eager localCheckpoint: unlike persist, this truncates the
        # LOGICAL plan to a LogicalRDD leaf, so every later action over
        # the result analyzes a constant-size plan instead of
        # re-analyzing the full upstream tree (the connected-components
        # lesson, cluster.py — persist substitutes cached blocks only
        # AFTER analysis). Registered in the same ledger; release goes
        # through _release_df which also unpersists the checkpoint RDD.
        # Release is ONE-WAY (see register_ckpt).
        return register_ckpt(df.localCheckpoint())
    if mode == "auto":
        mode = (
            "table"
            if _plan_size_estimate(df) > _SPILL_THRESHOLD_BYTES
            else True
        )
    if mode == "table":
        spark = df.sparkSession
        _SPILL_SEQ[0] += 1
        # process-unique name: a KILLED session can never drop its spill
        # tables (the in-memory catalog dies with it, leaving orphaned
        # warehouse directories), and a fixed name then fails every
        # later session with LOCATION_ALREADY_EXISTS. Uniqueness avoids
        # the collision; the defensive drop clears a same-name orphan.
        name = f"__sgsj_spill_{_SPILL_TOKEN}_{_SPILL_SEQ[0]}"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        _drop_orphan_location(spark, name)
        df.write.mode("overwrite").saveAsTable(name)
        _SPILL_TABLES.append((spark, name))
        return spark.table(name)
    df = df.persist()
    _CACHED_BANDS.append(df)
    return df


def cache_snapshot() -> tuple[int, int]:
    """Current lengths of the band/spill registries — pair with
    ``entries_since`` / ``release_entries`` for scoped release
    (bench.py's per-line cache hygiene, VERDICT r11 #1a)."""
    return (len(_CACHED_BANDS), len(_SPILL_TABLES))


def entries_since(snap: tuple[int, int]) -> tuple[list, list]:
    """Band DataFrames and spill-table entries registered after
    ``snap`` (a ``cache_snapshot`` value)."""
    nb, ns = snap
    return list(_CACHED_BANDS[nb:]), list(_SPILL_TABLES[ns:])


def release_entries(bands: list, spills: list) -> None:
    """Unpersist the given band frames and drop the given spill tables,
    removing them from the registries (identity-based — DataFrame
    __eq__ builds a Column, so list.remove is unusable here)."""
    band_ids = {id(b) for b in bands}
    for df in bands:
        _release_df(df)
    _CACHED_BANDS[:] = [b for b in _CACHED_BANDS if id(b) not in band_ids]
    _CKPT_LEDGER[:] = [b for b in _CKPT_LEDGER if id(b) not in band_ids]
    spill_ids = {id(s) for s in spills}
    for spark, name in spills:
        try:
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        except Exception:
            pass
    _SPILL_TABLES[:] = [s for s in _SPILL_TABLES if id(s) not in spill_ids]


def clear_band_cache() -> None:
    """Release every operator-cached band/signature DataFrame — unpersist
    memory blocks and drop spill tables (idempotent)."""
    for df in _CACHED_BANDS:
        _release_df(df)
    _CACHED_BANDS.clear()
    _CKPT_LEDGER.clear()
    for spark, name in _SPILL_TABLES:
        try:
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        except Exception:  # session already stopped — nothing to drop
            pass
    _SPILL_TABLES.clear()


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One representative (min id) per distinct text; dup_count for audit.

    Output: (rep_id, fp, dup_count). groupBy on the 128-bit md5 fingerprint,
    not the raw text — at 100 TB the shuffle moves 16-byte keys, not
    documents."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select("rep_id", "fp", "dup_count")
    )


def dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The rows of ``df`` that survive exact dedup (min-id representative)."""
    reps = exact_dedup(df, text_col, id_col).select(
        F.col("rep_id").alias(id_col)
    )
    return df.join(reps, on=id_col, how="left_semi")


def shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 5
) -> DataFrame:
    """Distinct character n-gram shingles per doc: (id, shingle BIGINT).

    Built with sequence+explode — pure codegen, no UDF. The shingle is
    ``xxhash64`` of the n-char substring, hashed BEFORE the distinct: the
    dedup family's shuffles (this distinct, the intersection equi-join,
    32 signature hashes per shingle) then move/handle 8-byte ints instead
    of n-char strings — same trick as the contamination module, measured
    ~25% on the sf0.1 distinct and more on the signature build. Every
    consumer (Jaccard counts, MinHash, SimHash) only needs equality or
    hashes of the shingle, never the text itself. An xxhash64 collision
    merging two distinct shingles is the usual negligible trade
    (P ≈ d²/2⁶⁴; the SQL oracles shingle on the raw substring, so the
    driver gate would surface one as a count mismatch)."""
    from ..sources.tables import fan_out_narrow

    t = F.col("__t")
    pos = F.explode(
        F.sequence(F.lit(1), F.greatest(F.length(t) - n + 1, F.lit(1)))
    ).alias("pos")
    out = (
        # a narrow (single-row-group) scan serializes the explode+hash
        # partial aggregate onto one core; fan out first (no-op at
        # production partition counts — measured 8.8 s -> ~2 s on the
        # family's sf0.1 materialization)
        fan_out_narrow(df.select(F.col(id_col), F.col(text_col).alias("__t")))
        .select(id_col, "__t", pos)
        .where(F.length("__t") >= n)
        .select(
            id_col,
            F.xxhash64(
                F.substring(F.col("__t"), F.col("pos").cast("int"), n)
            ).alias("shingle"),
        )
        .distinct()
    )
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    max_shingle_df: int | None = None,
    cache_shingles: bool = True,
    shingle_df: DataFrame | None = None,
    skew_conf=None,
) -> DataFrame:
    """Exact Jaccard-similar pairs (a < b): |S_a ∩ S_b| / |S_a ∪ S_b| >= t.

    Output: (id_a, id_b, inter, size_a, size_b) + jaccard. The shingle
    equi-join shuffles on the shingle value — set ``max_shingle_df`` to drop
    stop-shingles (bounded fan-out at scale). A shingle that is frequent but
    under the drop cap is exactly the hot-join-key case: pass ``skew_conf``
    (a ``SkewJoinConf``) to run the intersection build through ``skew_join``,
    fragmenting hot shingles across partitions instead of concentrating
    them on one reducer (output is identical — skew_join is
    equivalence-exact by construction).

    ``cache_shingles`` persists the exploded shingle set, which this plan
    reads three times (df-filter, both join sides) — 2.3x faster at sf0.1.
    Pass ``shingle_df`` (an already-persisted (id, shingle) set as built by
    ``shingles``) to share one materialization across the dedup family; the
    caller then owns the cache lifetime and ``cache_shingles`` is ignored.
    At 100 TB prefer a pre-materialized shingle table over executor memory."""
    if shingle_df is not None:
        sh = shingle_df
    else:
        sh = shingles(df, text_col, id_col, n)
        if cache_shingles:
            sh = sh.persist()
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .count()
            .where(F.col("count") > max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(hot, on="shingle", how="left_anti")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("size"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    if skew_conf is not None:
        from .skew_join import skew_join

        joined = skew_join(a, b, "shingle", "inner", skew_conf)
    else:
        joined = a.join(b, on="shingle")
    inter = (
        joined.where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("size").alias("size_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("size").alias("size_b")), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "inter", "size_a", "size_b", "jaccard")


def jaccard_for_pairs(
    pairs: DataFrame, sh: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Exact n-gram Jaccard for a given pair list only.

    ``pairs``: (id_a, id_b); ``sh``: (id, shingle) as built by ``shingles``.
    Output: (id_a, id_b, inter, size_a, size_b, jaccard) — pairs with zero
    shingle overlap are absent (their Jaccard is 0).

    Scale: cost is O(Σ |shingles(a)| over candidate pairs), NOT O(n²) — the
    pair list fans out through the shingle table on id_a, then an equi-join
    on (id_b, shingle) counts the intersection. All joins are hash-
    partitionable on ids; nothing touches non-candidate documents: the
    shingle table is first semi-joined down to docs that appear in a pair,
    so the size aggregate and the intersection shuffle move candidate
    docs' shingles only — at low candidate selectivity that is a tiny
    fraction of the corpus (and AQE turns the id semi-joins into
    broadcasts when the pair list is small)."""
    # no distinct on ids: left_semi deduplicates on the build side anyway,
    # and skipping it saves a shuffle
    ids = pairs.select(F.col("id_a").alias(id_col)).unionByName(
        pairs.select(F.col("id_b").alias(id_col))
    )
    sh_c = sh.join(ids, on=id_col, how="left_semi")
    sizes = sh_c.groupBy(id_col).agg(F.count(F.lit(1)).alias("size"))
    sa = sh_c.select(F.col(id_col).alias("id_a"), "shingle")
    sb = sh_c.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        pairs.join(sa, on="id_a")
        .join(sb, on=["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("size").alias("size_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("size").alias("size_b")), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .select("id_a", "id_b", "inter", "size_a", "size_b", "jaccard")
    )


def ngram_containment_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    max_shingle_df: int | None = None,
    shingle_df: DataFrame | None = None,
    cache_shingles: bool = True,
) -> DataFrame:
    """Directed near-superset pairs: C(inner→outer) = |S_i ∩ S_o| / |S_i| ≥ t.

    Containment is the asymmetric sibling of Jaccard: it flags a document
    whose shingle set is (nearly) contained in another's — the
    boilerplate-expansion / quoted-subdocument case that Jaccard misses when
    the outer document is much larger (J = |∩|/|∪| shrinks with |S_o| while
    C(inner→outer) stays at 1). This is the "substring/superset duplicate"
    family from the public training-data dedup literature (e.g. Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better").

    Output: (inner_id, outer_id, inter, size_inner, size_outer, containment)
    for inner_id != outer_id — directed, so a ⊂ b and b ⊂ a are separate
    rows.  Both directions appear whenever BOTH containments meet the
    threshold (inter ≥ t·max(size_a, size_b) suffices — e.g. sizes 10/10
    with inter 8 at t=0.6); the sets need only be equal at t = 1.0.

    Scale notes: identical shape to ``ngram_jaccard_pairs`` — one shingle
    equi-join bounded by ``max_shingle_df``; the intersection is computed
    once per unordered pair (id_a < id_b) and mirrored into both directions
    afterwards, so the join/aggregate cost is the same as the Jaccard pass.
    Like its sibling this is the exact all-pairs oracle; the scale path is
    LSH candidates + ``containment_for_pairs`` verification.
    """
    if shingle_df is not None:
        sh = shingle_df
    else:
        sh = shingles(df, text_col, id_col, n)
        if cache_shingles:
            sh = sh.persist()
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .count()
            .where(F.col("count") > max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(hot, on="shingle", how="left_anti")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("size"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
        .join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("size").alias("size_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("size").alias("size_b")),
            "id_b",
        )
    )
    directed = inter.select(
        F.col("id_a").alias("inner_id"),
        F.col("id_b").alias("outer_id"),
        "inter",
        F.col("size_a").alias("size_inner"),
        F.col("size_b").alias("size_outer"),
    ).unionByName(
        inter.select(
            F.col("id_b").alias("inner_id"),
            F.col("id_a").alias("outer_id"),
            "inter",
            F.col("size_b").alias("size_inner"),
            F.col("size_a").alias("size_outer"),
        )
    )
    return (
        directed.withColumn(
            "containment",
            F.col("inter").cast("double") / F.col("size_inner"),
        )
        .where(F.col("containment") >= threshold)
        .select(
            "inner_id", "outer_id", "inter", "size_inner", "size_outer", "containment"
        )
    )


def containment_for_pairs(
    pairs: DataFrame, sh: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Directed containment for a candidate pair list only (the scale path).

    ``pairs``: (id_a, id_b) unordered candidates (e.g. from MinHash/LSH
    banding — containment ≥ t implies Jaccard ≥ t·|S_i|/(|S_i|+|S_o|), so
    a band pass at a lowered threshold generates the candidates);
    ``sh``: (id, shingle). Output mirrors ``ngram_containment_pairs`` but
    costs O(candidate shingles), not O(n²) — same candidate-scoped shape as
    ``jaccard_for_pairs``."""
    j = jaccard_for_pairs(pairs, sh, id_col)
    directed = j.select(
        F.col("id_a").alias("inner_id"),
        F.col("id_b").alias("outer_id"),
        "inter",
        F.col("size_a").alias("size_inner"),
        F.col("size_b").alias("size_outer"),
    ).unionByName(
        j.select(
            F.col("id_b").alias("inner_id"),
            F.col("id_a").alias("outer_id"),
            "inter",
            F.col("size_b").alias("size_inner"),
            F.col("size_a").alias("size_outer"),
        )
    )
    return directed.withColumn(
        "containment", F.col("inter").cast("double") / F.col("size_inner")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    num_perm: int = 32,
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """(id, sig array<bigint>) — sig[i] = min over shingles of
    xxhash64(shingle, seed=i). Signature build is groupBy(min) over the
    shingle explode — fully JVM-side. Pass ``shingle_df`` to reuse an
    already-built (persisted) shingle set."""
    sh = shingle_df if shingle_df is not None else shingles(df, text_col, id_col, n)
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_perm)
    ]
    wide = sh.groupBy(id_col).agg(*aggs)
    return wide.select(
        id_col, F.array(*[F.col(f"h{i}") for i in range(num_perm)]).alias("sig")
    )


def band_bucket_cap(
    bands: DataFrame, id_col: str, bucket_cols: list[str], cap: int
) -> tuple[DataFrame, DataFrame]:
    """Split LSH band buckets at ``cap`` members (hot-bucket skew guard).

    A degenerate bucket (boilerplate/near-constant content hashing every
    member to the same band value) makes the band self-join quadratic in
    that bucket. Buckets at/below the cap keep all-pairs duty; over-cap
    buckets contribute a linear *star* instead — (anchor=min id → member)
    pairs — which bounds candidates at O(bucket) while preserving
    connectivity for downstream clustering (every member still reaches the
    anchor; transitive closure recovers the clique). Pairwise-enumeration
    recall inside an over-cap bucket is reduced to the star unless another
    band recovers the pair — the documented trade for bounded fan-out.

    Returns (kept_bands, star_pairs[id_a, id_b]); the over-cap bucket list
    is tiny by construction (≤ rows/cap entries) and broadcast."""
    stats = bands.groupBy(*bucket_cols).agg(
        F.count(F.lit(1)).alias("__bn"), F.min(id_col).alias("__anchor")
    )
    big = stats.where(F.col("__bn") > cap)
    kept = bands.join(
        F.broadcast(big.select(*bucket_cols)), on=bucket_cols, how="left_anti"
    )
    star = (
        bands.join(F.broadcast(big), on=bucket_cols)
        .where(F.col(id_col) != F.col("__anchor"))
        .select(F.col("__anchor").alias("id_a"), F.col(id_col).alias("id_b"))
    )
    return kept, star


def minhash_pairs(
    df: DataFrame,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    num_perm: int = 32,
    n_bands: int = 8,
    shingle_df: DataFrame | None = None,
    max_bucket_size: int | None = 1000,
    cache_bands: bool | str = "auto",
    sig_prefilter_margin: float | None = 0.3,
) -> DataFrame:
    """LSH-banded candidate pairs verified by exact Jaccard.

    Bands of r = num_perm/n_bands hashes; docs colliding in >= 1 band are
    candidates (P[collide] = 1-(1-s^r)^b); ONLY those candidates are then
    verified with exact n-gram Jaccard (``jaccard_for_pairs``) — the
    verify stage never materializes the all-pairs Jaccard table, which is
    the quadratic job LSH exists to avoid. Output: (id_a, id_b, jaccard).

    ``max_bucket_size`` caps band-bucket fan-out (see ``band_bucket_cap``):
    over-cap buckets emit star pairs instead of a clique, keeping a
    degenerate corpus (thousands of identical docs) O(n) instead of O(n²).

    ``sig_prefilter_margin`` (VERDICT r3 #4): before the exact shingle
    verify, candidates are screened by their signature-agreement fraction
    — matching positions / num_perm, an unbiased estimate of Jaccard
    (E[agree] = J, one Bernoulli(J) trial per permutation). Pairs with
    agreement < threshold − margin are dropped WITHOUT touching the
    shingle table, which is the verify's cost center. The margin buys
    safety: a true pair at J = threshold has agreement ~ Binom(num_perm,
    J)/num_perm, σ = √(J(1-J)/num_perm) ≈ 0.08 at num_perm = 32, so the
    default margin 0.3 puts the cut ≈ 3.7σ below the threshold
    (miss ≈ 1e-4 per borderline pair; far-above-threshold pairs are
    unaffected). Set None to disable (full LSH recall, slower verify).

    Shingle cache lifetime: pass ``shingle_df`` (an already-persisted set
    from ``shingles``) to share one materialization across calls — the
    caller owns unpersist. Without it, this builds and persists its own
    set, which stays cached for the session (persist feeds both the
    signature build and the verify joins; there is no safe point to
    unpersist before the lazy result is materialized)."""
    r = num_perm // n_bands
    if shingle_df is not None:
        sh = shingle_df
    else:
        sh = shingles(df, text_col, id_col, n).persist()
    sig = minhash_signatures(df, text_col, id_col, n, num_perm, shingle_df=sh)
    if sig_prefilter_margin is not None and cache_bands:
        # sig now has 3 consumers (bands + both prefilter joins) — cache
        # it alongside the bands so the groupBy(min) scan runs once
        sig = _session_cache(sig, mode=cache_bands)
    bands = sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[b * r + i] for i in range(r)]
                        ).alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    if cache_bands:
        bands = _session_cache(bands, mode=cache_bands)
    star = None
    if max_bucket_size is not None:
        bands, star = band_bucket_cap(
            bands, id_col, ["band", "bucket"], max_bucket_size
        )
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), on=["band", "bucket"])
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b")
        )
    )
    if star is not None:
        cand = cand.unionByName(star)
    cand = cand.distinct()
    if sig_prefilter_margin is not None:
        # signature-agreement screen: joins move (id, 8·num_perm-byte sig)
        # rows — tiny next to the shingle fan-out the survivors avoid; the
        # agreement count itself is codegen (zip_with + aggregate).
        min_agree = int(
            max(0.0, threshold - sig_prefilter_margin) * num_perm
        )
        if min_agree > 0:
            sig_a = sig.select(
                F.col(id_col).alias("id_a"), F.col("sig").alias("__sa")
            )
            sig_b = sig.select(
                F.col(id_col).alias("id_b"), F.col("sig").alias("__sb")
            )
            agree = F.aggregate(
                F.zip_with(
                    "__sa", "__sb", lambda x, y: (x == y).cast("int")
                ),
                F.lit(0),
                lambda acc, v: acc + v,
            )
            cand = (
                cand.join(sig_a, "id_a")
                .join(sig_b, "id_b")
                .where(agree >= F.lit(min_agree))
                .select("id_a", "id_b")
            )
    # the verify consumes cand 3× (both id-scoping semi-joins + the
    # intersection fan-out) — persist the tiny post-prefilter pair list so
    # the band self-join + signature screen run once, not per consumer
    cand = _session_cache(cand)
    verified = jaccard_for_pairs(cand, sh, id_col)
    return verified.where(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def simhash64(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    shingle_df: DataFrame | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, simhash bigint): sign-sum over the 64 bits of hash(shingle).

    Pass ``shingle_df`` (columns: id, shingle) to reuse an already
    materialized shingle set — the dedup query family shares one.

    ``hash_fn="md5"`` (VERDICT r8 #2, the HLL/Bloom/theta/CMS
    precedent): the 64 hash bits come from the first 16 hex chars of
    md5(raw n-char substring) as two 32-bit halves — bit-equal in ANSI
    SQL (``CAST('0x' || SUBSTRING(MD5(s), off, 8) AS BIGINT)``) — so
    every fingerprint bit, and therefore the Hamming distances, replay
    exactly in a DuckDB oracle. The md5 path runs as ONE Arrow
    ``mapInPandas`` pass (VERDICT r9 #7, the CMS two-level precedent):
    per-doc shingle-set → hashlib md5 → numpy bit votes, all local to
    the input partition — ZERO shuffles, vs the expression form's
    1.3M-row explode + global distinct + 64-sum hash aggregate (two
    exchanges, measured 5.4 s vs <1 s at sf0.1). hashlib md5 is
    bit-identical to Spark's ``F.md5``; the per-doc distinct is on the
    64-bit md5 prefix ≡ distinct on the raw shingle up to a 2^-64
    prefix collision (the EXACT gate would surface one), and the
    pure-Python replay pin lives in
    tests/test_operators_ext.py::test_simhash_md5_mode_python_replay.
    xxhash64 + ``shingle_df`` reuse stays the fast default."""
    if hash_fn == "md5":
        if shingle_df is not None:
            raise ValueError(
                "md5 mode rebuilds raw-substring shingles; shingle_df "
                "(already int64-hashed) cannot be replayed in SQL"
            )
        nn = int(n)
        id_type = df.schema[id_col].dataType.simpleString()

        def _md5_fingerprints(batches):
            import hashlib

            import numpy as np
            import pandas as pd

            shifts = np.arange(64, dtype=np.uint64)
            for pdf in batches:
                ids, codes = [], []
                for did, txt in zip(pdf[id_col], pdf[text_col]):
                    # mirrors the expression form's where(length >= n)
                    if txt is None or len(txt) < nn:
                        continue
                    grams = {
                        txt[i:i + nn] for i in range(len(txt) - nn + 1)
                    }
                    buf = b"".join(
                        hashlib.md5(g.encode("utf-8")).digest()[:8]
                        for g in grams
                    )
                    # big-endian first-8-bytes == (hi << 32) | lo of the
                    # hex prefix; unique = the distinct-on-prefix step
                    hs = np.unique(
                        np.frombuffer(buf, dtype=">u8").astype(np.uint64)
                    )
                    ones = (
                        (hs[:, None] >> shifts[None, :]) & np.uint64(1)
                    ).sum(axis=0)
                    # vote_i = 2*ones_i - n_shingles; bit set iff > 0
                    bits = (2 * ones) > len(hs)
                    code = 0
                    for i in np.nonzero(bits)[0]:
                        code |= 1 << int(i)
                    ids.append(did)
                    codes.append(
                        code - (1 << 64) if code >= (1 << 63) else code
                    )
                yield pd.DataFrame({id_col: ids, "simhash": codes}).astype(
                    {"simhash": "int64"}
                )

        from ..sources.tables import fan_out_narrow

        # the pass is embarrassingly parallel but a single-row-group
        # parquet scan arrives as ONE partition and serializes 1.4M md5
        # calls onto one core (3.2 s vs 1.4 s at sf0.1); no-op at
        # production partition counts
        return fan_out_narrow(df.select(id_col, text_col)).mapInPandas(
            _md5_fingerprints, f"{id_col} {id_type}, simhash long"
        )
    elif hash_fn == "xxhash64":
        sh = (
            shingle_df
            if shingle_df is not None
            else shingles(df, text_col, id_col, n)
        ).withColumn("h", F.xxhash64(F.col("shingle")))
    else:
        raise ValueError(f"hash_fn must be xxhash64|md5, got {hash_fn!r}")
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    wide = sh.groupBy(id_col).agg(*bit_sums)
    code = F.lit(0).cast("long")
    for i in range(64):
        code = code.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            * F.lit(2 ** i if i < 63 else -(2 ** 63)).cast("long")
        )
    return wide.select(id_col, code.alias("simhash"))


def embedding_near_dup(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Pairs (a < b) with cosine >= threshold. Brute-force all-pairs for
    correctness baseline; at scale use ``embedding_near_dup_lsh``. Pass
    ``dim`` when known — the O(n²) scoring then runs in codegen instead of
    interpreted higher-order functions (~10× on the fixtures)."""
    from .similarity import _cos

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", _cos(F.col("__va"), F.col("__vb"), dim).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def embedding_near_dup_lsh(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bands: int = 32,
    band_bits: int = 4,
    seed: int = 42,
    max_bucket_size: int | None = 1000,
    cache_bands: bool | str = "auto",
) -> DataFrame:
    """Scale path for cosine near-dup pairs: random-hyperplane LSH candidates
    + exact cosine verify. Same output schema as ``embedding_near_dup``
    (id_a, id_b, cos), recall < 1 by construction. ``max_bucket_size`` caps
    degenerate band buckets (near-constant embeddings all projecting to one
    code) via ``band_bucket_cap`` star pairs — O(bucket), not O(bucket²).

    A pair at cosine s collides in one b-bit band with p = (1 - acos(s)/π)^b;
    miss probability is (1 - p)^n_bands. Defaults (32 bands × 4 bits) give
    >99.5% recall at s = 0.4 and ~100% at s ≥ 0.6 — tune n_bands up for
    lower thresholds. At 100 TB the band self-join is a hash-partitioned
    equi-join on (band, code) — O(candidates), never O(n²); the verify
    only scores candidate pairs.

    Candidate selectivity scales with the gap between the threshold and the
    background cosine: near-orthogonal corpora with thresholds close to 0
    (the synthetic fixture: qualifying pairs at 0.40–0.51 over a ~0
    background) keep many candidates and the verify dominates; on real
    embedding near-dup workloads (threshold ≥ 0.9) the same banding is
    sharply selective — raise band_bits with the threshold."""
    import random

    from .similarity import _cos, _simhash_bands

    rng = random.Random(seed)
    planes = [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bands * band_bits)
    ]
    bands = _simhash_bands(
        df.select(F.col(id_col).alias("vid"), vec_col),
        "vid", vec_col, planes, n_bands, band_bits,
    )
    if cache_bands:
        bands = _session_cache(bands, mode=cache_bands)
    star = None
    if max_bucket_size is not None:
        bands, star = band_bucket_cap(bands, "vid", ["band", "code"], max_bucket_size)
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), on=["band", "code"])
        .where(F.col("x.vid") < F.col("y.vid"))
        .select(F.col("x.vid").alias("id_a"), F.col("y.vid").alias("id_b"))
    )
    if star is not None:
        cand = cand.unionByName(star)
    cand = cand.distinct()
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", _cos(F.col("__va"), F.col("__vb"), dim).alias("cos"))
        .where(F.col("cos") >= threshold)
    )

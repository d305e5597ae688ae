"""Market-basket association rules (Apriori level-2: pairs).

Mines directed rules ``antecedent -> consequent`` over (basket, item)
pairs with support / confidence / lift (Agrawal & Srikant, VLDB 1994).
Level-2 (pairwise) rules are the workhorse of co-purchase analysis; the
level-k generalization is a loop over the same join shape.

Scale shape (100 TB posture)
----------------------------
* The pair join is a *per-basket* self-join — shuffled once on the
  basket key, fan-out bounded by basket size squared (baskets are
  small; orders have a handful of lines), never corpus-quadratic.
* Apriori pruning comes first: an item occurring in fewer than
  ``min_pair_count`` baskets cannot appear in a qualifying pair, so
  infrequent items are dropped *before* the pair join — that's the
  monotonicity property doing the work of a frequency index.
* All counting is map-side-combined ``groupBy``; the only driver-side
  value is the 1-row basket-count broadcast for the support/lift
  denominators (bounded scalar cross-join, the registry's
  SCALAR_BNL_OK shape).

The reference library (anish749/spark-skew-join) exists because hot
keys break joins; here the hot side is itemset skew and the mitigation
is the same monotone pruning, applied before any shuffle fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    min_confidence: float = 0.0,
) -> DataFrame:
    """Directed pairwise rules with support, confidence and lift.

    Returns (antecedent, consequent, pair_count, n_antecedent,
    n_consequent, support, confidence, lift). ``support`` is
    pair_count / n_baskets; ``lift`` > 1 means the pair co-occurs more
    than independence predicts.
    """
    if min_pair_count < 1:
        raise ValueError("min_pair_count must be >= 1")

    items = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    icounts = items.groupBy("item").agg(
        F.count(F.lit(1)).alias("item_count")
    )
    # Apriori monotonicity: only items frequent enough to qualify pair
    frequent = icounts.where(F.col("item_count") >= min_pair_count)
    fitems = items.join(frequent.select("item"), "item")

    a = fitems.select("basket", F.col("item").alias("item_a"))
    b = fitems.select("basket", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= min_pair_count)
    )

    directed = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "pair_count",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "pair_count",
        )
    )

    n_baskets = items.agg(
        F.countDistinct("basket").alias("n_baskets")
    )

    ca = icounts.select(
        F.col("item").alias("antecedent"),
        F.col("item_count").alias("n_antecedent"),
    )
    cb = icounts.select(
        F.col("item").alias("consequent"),
        F.col("item_count").alias("n_consequent"),
    )
    pc = F.col("pair_count").cast("double")
    out = (
        directed.join(ca, "antecedent")
        .join(cb, "consequent")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "pair_count",
            "n_antecedent",
            "n_consequent",
            (pc / F.col("n_baskets")).alias("support"),
            (pc / F.col("n_antecedent")).alias("confidence"),
            (
                (F.col("pair_count") * F.col("n_baskets")).cast("double")
                / (F.col("n_antecedent") * F.col("n_consequent"))
            ).alias("lift"),
        )
    )
    if min_confidence > 0.0:
        out = out.where(F.col("confidence") >= F.lit(float(min_confidence)))
    return out

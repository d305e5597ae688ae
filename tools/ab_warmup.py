"""A/B the r14 warmup extension: fresh JVM, segment-style startup, then
time the heavy cold lines. Usage: python tools/ab_warmup.py base|ext
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as _W
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"
CPUS = 32


def main() -> None:
    mode = sys.argv[1]
    from spark_skew_join_spark import queries as q
    from spark_skew_join_spark.operators import dedup as _dd
    from spark_skew_join_spark.sources.tables import get_spark, load_tables

    spark = get_spark(f"abwarm-{mode}", cpus=CPUS)
    for df in load_tables(spark, SF).values():
        df.count()
    spark.range(0, 32 * 1024, 1, CPUS).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()
    t0 = time.perf_counter()
    _syn = spark.range(0, 40_000, 1, CPUS).select(
        F.col("id"),
        F.concat(
            F.md5(F.col("id").cast("string")),
            F.md5(F.concat(F.col("id").cast("string"), F.lit("x"))),
        ).alias("s"),
    )
    _g = (
        _syn.select(
            "id", F.explode(F.sequence(F.lit(1), F.lit(12))).alias("p"), "s"
        )
        .select(
            "id",
            F.xxhash64(F.substring("s", F.col("p").cast("int"), 5)).alias("h"),
            F.conv(
                F.substring(F.md5(F.substring("s", F.col("p").cast("int"), 5)), 1, 8),
                16, 10,
            ).cast("long").alias("m"),
        )
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"), F.min("m").alias("mm"))
    )
    _g.alias("a").join(_g.alias("b"), on="h").where(
        F.col("a.c") <= F.col("b.c")
    ).agg(F.count(F.lit(1))).collect()
    _w = _W.partitionBy(F.col("h") % 64).orderBy("mm")
    _g.select(
        "h", F.row_number().over(_w).alias("rn"), F.lag("mm").over(_w).alias("lg")
    ).agg(F.max("rn")).collect()
    if mode == "ext":
        _n = spark.range(0, 20_000, 1, CPUS).select(
            "id", (F.col("id") % 997).alias("k"), F.rand(7).alias("x")
        )
        _n.groupBy("k").agg(
            *[F.min(F.xxhash64(F.col("id"), F.lit(i))).alias(f"h{i}") for i in range(32)]
        ).agg(F.count(F.lit(1))).collect()
        _one = spark.createDataFrame(
            [([float(i) for i in range(65)],)], "__w array<double>"
        )
        _n.crossJoin(F.broadcast(_one)).groupBy("k").agg(
            *[F.sum(F.col("x") * F.element_at(F.col("__w"), (i % 64) + 1)).alias(f"m{i}")
              for i in range(20)]
        ).agg(F.count(F.lit(1))).collect()
        _arr = _n.groupBy("k").agg(
            F.collect_list(F.struct(F.col("id").alias("b"), F.col("x").alias("v"))).alias("e"),
            F.array_agg(F.xxhash64("id")).alias("sig"),
        )
        _arr.select(
            "k",
            F.aggregate(
                F.zip_with("sig", F.reverse("sig"), lambda a, b: (a == b).cast("int")),
                F.lit(0), lambda acc, v: acc + v,
            ).alias("agree"),
            F.aggregate(
                F.map_entries(F.map_from_entries(F.transform(
                    "e", lambda s: F.struct(s["b"].cast("int").alias("key"), s["v"].alias("value"))
                ))),
                F.lit(0.0), lambda acc, s: acc + s["value"],
            ).alias("fold"),
            F.explode(
                F.array(*[
                    F.struct(F.lit(b).alias("band"), F.xxhash64(F.element_at("sig", b + 1)).alias("bucket"))
                    for b in range(8)
                ])
            ).alias("bb"),
        ).agg(F.count(F.lit(1))).collect()
    warm_cost = time.perf_counter() - t0
    print(f"warmup({mode}) cost {warm_cost:.2f} s")

    def t(label, fn):
        t0 = time.perf_counter()
        out = fn()
        print(f"  {label:40s} {time.perf_counter() - t0:7.3f} s", flush=True)
        return out

    # dedup family build (bench line shape)
    t0 = time.perf_counter()
    sh, pairs = q._dedup_family(spark, SF)
    t("dedup construct", lambda: None)
    t("dedup shingles count", lambda: sh.count())
    t("dedup pairs count", lambda: pairs.count())
    print(f"  dedup_family_build TOTAL {time.perf_counter() - t0:.3f} s")
    # langid family + eval line
    t("langid family build", lambda: q.build_family("langid", spark, SF))
    df = t("langid_softmax_eval construct", lambda: q.QUERIES["langid_softmax_eval"](spark, SF))
    t("langid_softmax_eval noop", lambda: df.write.mode("overwrite").format("noop").save())
    # quality family
    t("quality family build", lambda: q.build_family("quality", spark, SF))
    df2 = t("quality entry construct", lambda: q.QUERIES["quality_classifier_docs"](spark, SF))
    t("quality entry noop", lambda: df2.write.mode("overwrite").format("noop").save())
    df3 = t("calibration construct", lambda: q.QUERIES["classifier_calibration_docs"](spark, SF))
    t("calibration noop", lambda: df3.write.mode("overwrite").format("noop").save())
    q.clear_dedup_cache()
    spark.stop()


if __name__ == "__main__":
    main()

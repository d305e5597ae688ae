"""Round-14 optimization profiling: phase-level wall breakdown for the
top bench lines (dedup family, langid trio, classifier pair) — guide §1
measure-first evidence. Fresh JVM per invocation; run one probe at a time:

    python tools/profile_r14.py dedup|langid_eval|langid_docs|planted|quality|hll|pagerank
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"  {label:45s} {time.perf_counter() - t0:7.3f} s", flush=True)
    return out


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    probe = sys.argv[1]
    from spark_skew_join_spark import queries as q
    from spark_skew_join_spark.sources.tables import get_spark, load_tables

    spark = get_spark(f"profile-{probe}", cpus=CPUS)
    tabs = load_tables(spark, SF)
    for df in tabs.values():
        df.count()
    # python worker warm
    spark.range(0, 32 * 1024, 1, CPUS).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()

    if probe == "dedup":
        from spark_skew_join_spark.operators.dedup import minhash_pairs, shingles

        docs = tabs["documents"]
        for rnd in (1, 2):
            print(f"round {rnd}:")
            sh = t("construct shingles", lambda: shingles(docs, n=8).persist())
            pairs = t(
                "construct minhash_pairs",
                lambda: minhash_pairs(docs, threshold=0.5, n=8, shingle_df=sh),
            )
            pairs = t("persist() call (analysis)", lambda: pairs.persist())
            t("sh.count()", lambda: sh.count())
            t("pairs.count()", lambda: pairs.count())
            t("consumer noop: pairs.where(j>=0.9)", lambda: noop(pairs.where(F.col("jaccard") >= 0.9)))
            t("consumer noop again", lambda: noop(pairs.where(F.col("jaccard") >= 0.9)))
            t("pairs.count() again", lambda: pairs.count())
            from spark_skew_join_spark.operators import dedup as _dd
            t("release", lambda: (_dd.clear_band_cache(), sh.unpersist(), pairs.unpersist()))
    elif probe in ("langid_eval", "langid_docs", "planted"):
        from spark_skew_join_spark.operators import langid as L

        docs = tabs["documents"]
        if probe == "planted":
            docs = q._planted_multilingual(docs)
            label_col, nb, iters, lr = "lang", 64, 4, 4.0
            tf = None
        else:
            tf = t("family tf build+count", lambda: q._langid_family(spark, SF))
            if probe == "langid_eval":
                label_col, nb, iters, lr = "source", 64, 4, 2.0
            else:
                label_col, nb, iters, lr = "lang", 128, 6, 2.0
        classes = t(
            "classes collect",
            lambda: sorted(
                r[0]
                for r in docs.select(label_col).distinct().collect()
                if r[0] is not None
            ),
        )
        # mirror langid_classifier internals with timers
        cidx = {v: i for i, v in enumerate(classes)}
        nc = len(cidx)
        y_expr = None
        for v, i in cidx.items():
            y_expr = F.when(F.col(label_col) == v, i) if y_expr is None else y_expr.when(F.col(label_col) == v, i)
        if tf is None:
            tfd = L.char_tf_counts(docs, "doc_id", "text", nb, 2)
        else:
            tfd = tf.groupBy(
                "doc_id", (F.col("bucket") % nb).cast("int").alias("bucket")
            ).agg(F.sum("c").alias("c"), F.max("n_gram").alias("n_gram"))
        ex = tfd.select(
            "doc_id", "bucket", (F.col("c").cast("double") / F.col("n_gram")).alias("x")
        ).unionByName(
            tfd.select("doc_id").distinct().select(
                "doc_id", F.lit(nb).cast("int").alias("bucket"), F.lit(1.0).alias("x")
            )
        )
        labels = docs.select("doc_id", y_expr.cast("int").alias("__y")).where(
            F.col("__y").isNotNull()
        )
        exl = ex.join(labels, "doc_id").select(
            F.col("doc_id").alias("__id"), "__y", "bucket", "x"
        ).repartition("__id")
        exl = t("exl.persist()", lambda: exl.persist())
        n_docs = t("n_docs distinct count (materialize)", lambda: exl.select("__id").distinct().count())
        print(f"  n_docs={n_docs} nc={nc}")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        weights = [[0.0] * (nb + 1) for _ in range(nc)]
        from functools import reduce as _reduce
        for it in range(iters):
            t(f"GD iter {it}", lambda: L._run_gd_iterations(exl, n_docs, nc, 1, lr, weights, spark, _reduce))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        wdf = L._weights_rel(spark, weights)
        margins = (
            exl.join(F.broadcast(wdf), "bucket")
            .groupBy("__id", "__y")
            .agg(*[F.sum(F.col("x") * F.col(f"__w{c}")).alias(f"__m{c}") for c in range(nc)])
        )
        t("score from PERSISTED exl (margins agg noop)", lambda: noop(margins))
        exl.unpersist()
        t("score from RECOMPUTED lineage (current code)", lambda: noop(margins))
        # full query for comparison
        name = {"langid_eval": "langid_softmax_eval", "langid_docs": "langid_softmax_docs", "planted": "langid_planted_multilingual"}[probe]
        df = t(f"full query {name} CONSTRUCT", lambda: q.QUERIES[name](spark, SF))
        t(f"full query {name} noop", lambda: noop(df))
    elif probe == "quality":
        df = t("quality_classifier_docs CONSTRUCT (train)", lambda: q.QUERIES["quality_classifier_docs"](spark, SF))
        t("noop run 1", lambda: noop(df))
        t("noop run 2", lambda: noop(df))
        df2 = t("classifier_calibration_docs CONSTRUCT (train)", lambda: q.QUERIES["classifier_calibration_docs"](spark, SF))
        t("noop run 1", lambda: noop(df2))
    elif probe == "hll":
        df = t("hll_distinct_stats CONSTRUCT (3 sketch folds)", lambda: q.QUERIES["hll_distinct_stats"](spark, SF))
        t("noop", lambda: noop(df))
    elif probe == "pagerank":
        df = t("pagerank_nations CONSTRUCT (edges checkpoint)", lambda: q.QUERIES["pagerank_nations"](spark, SF))
        t("noop run 1", lambda: noop(df))
        t("noop run 2", lambda: noop(df))
    q.clear_dedup_cache()
    spark.stop()


if __name__ == "__main__":
    main()

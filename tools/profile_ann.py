"""Phase-level wall breakdown for the ANN ladder pairs (r14 guide §1):

    python tools/profile_ann.py pq|ivfpq|ivf

Fresh JVM per invocation; times training collects, encode pass, and the
full query noop for the raw and refined siblings to quantify the
duplicated-training cost the raw/refined split pays.
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
    print(f"  {label:40s} {time.perf_counter() - t0:7.3f} s", flush=True)
    return out


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    probe = sys.argv[1]
    from spark_skew_join_spark import queries as q
    from spark_skew_join_spark.sources.tables import get_spark, load_tables

    spark = get_spark(f"profile-ann-{probe}", cpus=CPUS)
    e = load_tables(spark, SF)["embeddings"]
    if probe == "pq":
        from spark_skew_join_spark.operators.pq import (
            encode_pq, train_pq,
        )

        books = t("train_pq (sample+kmeans)", lambda: train_pq(e, m=16, ks=32))
        codes = encode_pq(e, books)
        t("encode_pq pass (count)", lambda: codes.count())
        df1 = t("ann_pq_topk construct", lambda: q.QUERIES["ann_pq_topk"](spark, SF))
        t("ann_pq_topk noop 1", lambda: noop(df1))
        t("ann_pq_topk noop 2", lambda: noop(df1))
        df2 = t("ann_pq_refined construct", lambda: q.QUERIES["ann_pq_refined_topk"](spark, SF))
        t("ann_pq_refined noop 1", lambda: noop(df2))
        t("ann_pq_refined noop 2", lambda: noop(df2))
    elif probe == "ivfpq":
        df1 = t("ann_ivfpq_topk construct", lambda: q.QUERIES["ann_ivfpq_topk"](spark, SF))
        t("ann_ivfpq_topk noop 1", lambda: noop(df1))
        t("ann_ivfpq_topk noop 2", lambda: noop(df1))
        df2 = t("ann_ivfpq_refined construct", lambda: q.QUERIES["ann_ivfpq_refined_topk"](spark, SF))
        t("ann_ivfpq_refined noop 1", lambda: noop(df2))
        t("ann_ivfpq_refined noop 2", lambda: noop(df2))
    elif probe == "ivf":
        from spark_skew_join_spark.operators.similarity import _fit_centroids

        t("_fit_centroids", lambda: _fit_centroids(e, "vec_id", "embedding", 16, 2048, 5))
        df1 = t("ann_ivf_topk construct", lambda: q.QUERIES["ann_ivf_topk"](spark, SF))
        t("ann_ivf_topk noop 1", lambda: noop(df1))
        t("ann_ivf_topk noop 2", lambda: noop(df1))
        df2 = t("ann_ivf_refined construct", lambda: q.QUERIES["ann_ivf_refined_topk"](spark, SF))
        t("ann_ivf_refined noop 1", lambda: noop(df2))
        t("ann_ivf_refined noop 2", lambda: noop(df2))
    spark.stop()


if __name__ == "__main__":
    main()

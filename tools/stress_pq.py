"""PQ query-batch stress (VERDICT r7 #8): 100k queries through the
capped, chunk-broadcast pq_topk against a 200k-vector corpus.

What it proves: the driver never holds more than one lut_chunk of
LUTs in a single broadcast (bounded at lut_chunk*m*ks*8 bytes), the
chunked union plan completes, and chunking is result-identical to a
single chunk on a sampled query subset.

Run: PYTHONPATH=/root/repo python tools/stress_pq.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.pq import encode_pq, pq_topk, train_pq
from spark_skew_join_spark.sources.tables import get_spark


def main():
    n_corpus, n_queries, dim = 200_000, 100_000, 32
    spark = get_spark("stress_pq", cpus=32)
    # deterministic synthetic embeddings, JVM-side
    corpus = spark.range(n_corpus).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (F.pmod(F.xxhash64(F.col("id") * dim + j), F.lit(1000))
                       .cast("double") / 500.0 - 1.0).cast("float"),
        ).alias("embedding"),
    ).persist()
    books = train_pq(corpus, m=8, ks=16, sample_size=2048)
    codes = encode_pq(corpus, books).persist()
    codes.count()

    queries = corpus.where(F.col("vec_id") < n_queries)
    t0 = time.time()
    out = pq_topk(codes, queries, books, k=10,
                  max_queries=131072, lut_chunk=4096)
    n = out.count()
    t1 = time.time()
    per_q = out.groupBy("query_id").count()
    bad = per_q.where(F.col("count") != 10).count()
    nq = per_q.count()
    print(f"PQ 100k-query stress: {n} result rows, {nq} queries, "
          f"{bad} with wrong k, {t1 - t0:.1f}s "
          f"({(n_queries + 4095) // 4096} LUT chunks of <=4096)")
    assert nq == n_queries and bad == 0 and n == n_queries * 10

    # chunking is result-identical on a subset small enough to compare
    sub = corpus.where(F.col("vec_id") < 64)
    a = pq_topk(codes, sub, books, k=10, lut_chunk=7).collect()
    b = pq_topk(codes, sub, books, k=10, lut_chunk=4096).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    print("chunked == single-chunk on 64-query subset: PASS")


if __name__ == "__main__":
    main()

"""Scale stress for incremental dedup: a new batch against a large
persisted corpus state.

1M historical docs → persisted fingerprint store + MinHash band table
(the epoch artifacts); a 100k-doc new batch with planted duplicates
(20k exact copies of historical docs, 10k near-copies with one token
appended, 10k within-batch dup pairs) is then classified:

* exact increment: batch vs store join only — history documents are
  never rescanned;
* fuzzy increment: batch bands vs the PERSISTED historical band table
  (read back from parquet), verify on candidates only.

Compares against the cost of re-deduplicating (history ∪ batch) from
scratch, which is what the increment exists to avoid.

Usage: python tools/stress_incremental.py [n_hist] [n_new]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.dedup import exact_dedup
from spark_skew_join_spark.operators.incremental import (
    band_table,
    fingerprint_store,
    incremental_exact_dedup,
    incremental_minhash_dups,
)
from spark_skew_join_spark.sources.tables import get_spark

N_HIST = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_NEW = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000


def _text(col):
    """~25 deterministic pseudo-random tokens per id."""
    return F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(24)),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(col * 25 + i), F.lit(120_000)).cast("string"),
            ),
        ),
        " ",
    )


def main() -> None:
    spark = get_spark("stress-incremental", cpus=32)
    work = tempfile.mkdtemp(prefix="sginc_")
    hist = spark.range(N_HIST).select(
        F.col("id").alias("doc_id"), _text(F.col("id")).alias("text")
    )
    # new batch ids start above history; planted structure by position
    # (fractions of the batch): first 20% exact copies of historical
    # docs, next 10% near-copies (historical text + ' extra'), next 10%
    # within-batch dup pairs, rest fresh
    base = F.col("id") - N_HIST
    src = F.pmod(F.xxhash64(F.col("id")), F.lit(N_HIST))
    fresh_pair = _text(F.lit(3) * (F.floor(base / 2) + N_HIST + 17))
    new = spark.range(N_HIST, N_HIST + N_NEW).select(
        F.col("id").alias("doc_id"),
        F.when(base < int(0.2 * N_NEW), _text(src))
        .when(base < int(0.3 * N_NEW), F.concat(_text(src), F.lit(" extra")))
        .when(base < int(0.4 * N_NEW), fresh_pair)
        .otherwise(_text(F.col("id") + 7_777_777))
        .alias("text"),
    )

    # epoch artifacts persisted once (history scanned here, then never again)
    t0 = time.perf_counter()
    store_p = os.path.join(work, "store")
    bands_p = os.path.join(work, "bands")
    fingerprint_store(hist).write.parquet(store_p)
    band_table(hist, n=5).write.parquet(bands_p)
    t_state = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = incremental_exact_dedup(new, spark.read.parquet(store_p))
    agg = out.agg(
        F.sum(F.col("hist_rep").isNotNull().cast("long")).alias("hist_dups"),
        F.sum(
            (F.col("hist_rep").isNull() & (F.col("batch_rep") != F.col("doc_id")))
            .cast("long")
        ).alias("batch_dups"),
        F.sum(F.col("is_new").cast("long")).alias("new_rows"),
    ).collect()[0]
    t_exact = time.perf_counter() - t0

    t0 = time.perf_counter()
    full = exact_dedup(hist.unionByName(new)).count()
    t_full = time.perf_counter() - t0

    t0 = time.perf_counter()
    fuzzy = incremental_minhash_dups(
        new, hist, threshold=0.5, n=5,
        hist_bands=spark.read.parquet(bands_p),
    )
    near = fuzzy.where(F.col("jaccard") < 1.0).count()
    t_fuzzy = time.perf_counter() - t0

    print(
        f"incremental_dedup {N_HIST:,} hist + {N_NEW:,} new: "
        f"state build {t_state:.1f} s | exact increment {t_exact:.1f} s "
        f"(hist_dups={agg['hist_dups']:,}, batch_dups={agg['batch_dups']:,}, "
        f"new={agg['new_rows']:,}) vs full re-dedup {t_full:.1f} s "
        f"({full:,} reps) | fuzzy increment {t_fuzzy:.1f} s "
        f"(near-dup pairs j<1: {near:,})"
    )
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Perceptual-hash near-dup stress: N synthetic 16x16 BMPs with planted
brightness+pixel variants; measures dhash build rate, banded-match wall
time, recall on planted pairs, and spurious-pair count.

Usage: python tools/stress_phash.py [n_images] [plant_every]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.multimodal import dhash_images, phash_near_dup
from spark_skew_join_spark.sources.tables import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
EVERY = int(sys.argv[2]) if len(sys.argv) > 2 else 10
OFF = 1 << 40


def main():
    spark = get_spark("stress-phash", cpus=32)
    ids = spark.range(N).select(F.col("id").alias("doc_id"))

    def gen(it):
        import hashlib

        import numpy as np
        import pandas as pd

        from spark_skew_join_spark.operators.multimodal import encode_bmp

        for pdf in it:
            out_id, out_b = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                data = b"".join(
                    hashlib.sha256(f"simg:{did}:{i}".encode()).digest()
                    for i in range(24)
                )
                px = (np.frombuffer(data, dtype=np.uint8) % 200).reshape(16, 16, 3)
                out_id.append(did)
                out_b.append(encode_bmp(px))
                if did % EVERY == 0:
                    v = px + 10
                    v[6, 7] = 255
                    out_id.append(did + OFF)
                    out_b.append(encode_bmp(v))
            yield pd.DataFrame(
                {"doc_id": pd.Series(out_id, dtype="int64"), "content": out_b}
            )

    imgs = ids.repartition(64).mapInPandas(gen, "doc_id long, content binary")

    t0 = time.time()
    hashes = dhash_images(imgs, decoder="bmp").persist()
    n_hashes = hashes.count()
    t_hash = time.time() - t0

    t0 = time.time()
    pairs = phash_near_dup(hashes, max_hamming=3, n_bands=4)
    found = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            ((F.col("id_a") % EVERY == 0) & (F.col("id_b") - F.col("id_a") == OFF))
            .cast("int")
        ).alias("planted"),
    ).collect()[0]
    t_match = time.time() - t0

    n_planted = (N + EVERY - 1) // EVERY
    print(
        f"images={n_hashes} (base {N} + planted {n_planted}) | "
        f"hash {t_hash:.1f}s ({n_hashes / t_hash / 1e3:.0f}k img/s) | "
        f"match {t_match:.1f}s | pairs={found['n']} "
        f"planted_found={found['planted']}/{n_planted} "
        f"(recall {found['planted'] / n_planted:.4%}) "
        f"spurious={found['n'] - found['planted']}"
    )
    hashes.unpersist()


if __name__ == "__main__":
    main()

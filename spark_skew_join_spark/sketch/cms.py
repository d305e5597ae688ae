"""Pure-Python Count-Min Sketch with a distributed Spark builder.

Plays the role of Algebird's ``CMS[String]`` in the reference
(``/root/reference/src/main/scala/org/anish/spark/skew/Utils.scala:92-122``):
a mergeable frequency summary built over a key column and broadcast to
executors. Differences by design (SURVEY §2 O3):

* partition-local sketches merged with ``treeReduce`` instead of the
  reference's one-sketch-per-record ``map(create).reduce(plus)``
  (``Utils.scala:119-120``) — O(partitions) merges, not O(rows);
* Kirsch–Mitzenmacher double hashing (h1 + i*h2 mod width) from one
  128-bit blake2b per key — pairwise-independent enough for the CMS
  guarantee, one hash call per update;
* numpy int64 table, vectorized adds for batches.

At the reference defaults (eps=0.005, delta=1e-8) the table is
19 × 544 int64 ≈ 83 KB — trivially broadcastable to 1000 executors.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterable, Iterator

import numpy as np

_MASK64 = (1 << 64) - 1


class CountMinSketch:
    """Count-Min Sketch over (byte-encodable) keys.

    estimate(k) >= true_freq(k) always, and
    estimate(k) <= true_freq(k) + eps * N with probability >= 1 - delta.
    """

    __slots__ = ("eps", "delta", "seed", "depth", "width", "table", "total")

    def __init__(self, eps: float = 0.005, delta: float = 1e-8, seed: int = 1):
        if not (0 < eps < 1) or not (0 < delta < 1):
            raise ValueError("eps and delta must be in (0, 1)")
        self.eps = eps
        self.delta = delta
        self.seed = seed
        self.depth = max(1, math.ceil(math.log(1.0 / delta)))
        self.width = max(1, math.ceil(math.e / eps))
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)
        self.total = 0

    # -- hashing -----------------------------------------------------------
    def _rows_cols(self, key: object) -> np.ndarray:
        """Column index per row via double hashing; one blake2b per key."""
        data = key if isinstance(key, bytes) else str(key).encode("utf-8")
        digest = hashlib.blake2b(
            data, digest_size=16, key=self.seed.to_bytes(8, "little")
        ).digest()
        h1 = int.from_bytes(digest[:8], "little")
        h2 = int.from_bytes(digest[8:], "little") | 1  # odd → full cycle
        idx = (h1 + np.arange(self.depth, dtype=np.uint64) * np.uint64(h2)) & np.uint64(
            _MASK64
        )
        return (idx % np.uint64(self.width)).astype(np.int64)

    # -- updates -----------------------------------------------------------
    def add(self, key: object, count: int = 1) -> None:
        cols = self._rows_cols(key)
        self.table[np.arange(self.depth), cols] += count
        self.total += count

    def add_all(self, keys: Iterable[object]) -> "CountMinSketch":
        for k in keys:
            self.add(k)
        return self

    def estimate(self, key: object) -> int:
        cols = self._rows_cols(key)
        return int(self.table[np.arange(self.depth), cols].min())

    # -- monoid ------------------------------------------------------------
    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.depth, self.width, self.seed) != (
            other.depth,
            other.width,
            other.seed,
        ):
            raise ValueError("cannot merge CMS with different parameters")
        out = CountMinSketch(self.eps, self.delta, self.seed)
        out.table = self.table + other.table
        out.total = self.total + other.total
        return out

    def __reduce__(self):  # compact pickling for treeReduce/broadcast
        return (_rebuild_cms, (self.eps, self.delta, self.seed, self.table, self.total))


def _rebuild_cms(eps, delta, seed, table, total):
    cms = CountMinSketch(eps, delta, seed)
    cms.table = table
    cms.total = total
    return cms


def cms_from_dataframe(
    df,
    key_cols: list[str],
    eps: float = 0.005,
    delta: float = 1e-8,
    seed: int = 1,
    depth_of_tree: int = 2,
) -> CountMinSketch:
    """Distributed CMS over the tuple of ``key_cols``.

    Replaces ``Dataset.getCMS`` (``Utils.scala:108-122``): one local sketch
    per partition (vs. per record), merged with ``treeReduce`` so the driver
    receives log(P) partial merges, not P. Composite keys are joined with a
    NUL separator to avoid concat collisions (SURVEY §4 Q1).

    Scale note (100 TB): the scan is one pass over just the key columns
    (column-pruned parquet read); shipped data is only ~83 KB per partition.
    """
    from pyspark.sql import functions as F

    sep = "\x00"
    key = F.concat_ws(sep, *[F.col(c).cast("string") for c in key_cols])
    rdd = df.select(key.alias("__k")).rdd

    def build(rows: Iterator) -> Iterator[CountMinSketch]:
        local = CountMinSketch(eps, delta, seed)
        for row in rows:
            if row[0] is not None:
                local.add(row[0])
        yield local

    sketches = rdd.mapPartitions(build)
    if sketches.isEmpty():  # empty input: Utils.scala:120 would throw — we don't
        return CountMinSketch(eps, delta, seed)
    return sketches.treeReduce(lambda a, b: a.merge(b), depth=depth_of_tree)

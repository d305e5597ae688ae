"""Mergeable KMV / theta sketch — distinct counts WITH set operations.

Fourth member of the sketch family (cms.py frequencies, hll.py distinct
counts, bloom.py membership): the theta sketch answers the question HLL
cannot — set EXPRESSIONS over distincts.  HLL unions exactly, but gives
no intersection or difference; the k-minimum-values (KMV) form retains
the k smallest distinct hash values, which is a uniform ``theta``-rate
sample of the key space, so A∩B, A∖B and Jaccard all estimate directly
from the retained samples (Beyer et al. 2007, "On Synopses for
Distinct-Value Estimation"; the Apache DataSketches theta framework).
Pipeline uses at 100 TB: "how many users did BOTH events touch",
cross-source vocabulary overlap, audience dedup across shards.

Estimator (uniform rule for every set expression): with ``theta`` the
k-th smallest retained value (full hash space when unsaturated), the
estimate of |S| is  count(retained ∈ S, value < theta) / theta_norm
— for the plain distinct count this is the classic (k−1)/U(k).  RSE is
≈ 1/sqrt(k−2) for the base estimate (``rse()`` below); intersections of
weakly-overlapping sets inherit a larger relative error, documented in
tests.

Union of sketches is "k smallest of the union of retained values" —
exactly associative AND identical to the one-shot sketch of the unioned
input (pinned bit-for-bit in tests/test_theta.py), so per-shard
sketches roll up losslessly.

Hashing: the scale path is Spark's JVM ``xxhash64`` (codegen-side;
Python only ever sees 8-byte hashes).  ``hash_fn="md5"`` derives a
60-bit value from the first 15 hex chars of md5 — bit-equal in ANSI SQL
(the dsir.py compat idiom), which makes the ENTIRE sketch, including
its estimates, reproducible by the DuckDB oracle: KMV is
order-statistics over a deterministic hash, so the registry query
`theta_sketch_events` is EXACT-checked, not rows-only.

Spark integration mirrors hll_by_group: column-pruned scan → JVM hash →
Arrow batches → per-partition numpy bottom-k folds → one hash-
partitioned combine stage → bounded driver fold (≤ combine_partitions
sketches of ≤ 8k bytes each per group).
"""

from __future__ import annotations

import math
import pickle

import numpy as np

_XXH_SEED = 0x7E7A_5EED


class ThetaSketch:
    """KMV sketch: the ``k`` smallest distinct hash values over a
    ``hash_bits``-bit hash space (64 for xxhash64, 60 for md5-compat).

    ``values`` is sorted-ascending uint64, length ≤ k, distinct.
    Default k=1024: RSE ≈ 3.1%; 8 KiB retained."""

    def __init__(self, k: int = 1024, hash_bits: int = 64):
        if k < 8:
            raise ValueError("k must be >= 8")
        if hash_bits not in (60, 64):
            raise ValueError("hash_bits must be 60 (md5) or 64 (xxhash64)")
        self.k = k
        self.hash_bits = hash_bits
        self.values = np.empty(0, dtype=np.uint64)

    # -- hash space ----------------------------------------------------
    @property
    def _space(self) -> int:
        return 2 ** self.hash_bits

    @property
    def theta_raw(self) -> int:
        """Sampling threshold in raw hash units (EXACT python int — a
        60/64-bit value does not survive float64, and the < comparison
        must be exact for the md5-compat oracle to reproduce it): the
        k-th smallest retained value once saturated, else the full hash
        space."""
        if len(self.values) >= self.k:
            return int(self.values[self.k - 1])
        return self._space

    # -- building ------------------------------------------------------
    def add_hashed(self, h: np.ndarray) -> None:
        """Fold a batch of raw hash values (uint64-viewable) in."""
        v = np.unique(h.astype(np.int64).view(np.uint64))
        merged = np.unique(np.concatenate([self.values, v]))
        self.values = merged[: self.k]

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        if (self.k, self.hash_bits) != (other.k, other.hash_bits):
            raise ValueError("cannot merge theta sketches with different k/hash")
        out = ThetaSketch(self.k, self.hash_bits)
        out.values = np.unique(np.concatenate([self.values, other.values]))[
            : self.k
        ]
        return out

    # -- estimation ----------------------------------------------------
    def _estimate_from(self, sample: np.ndarray, theta_raw: int) -> float:
        if theta_raw >= self._space:
            n = len(sample)
        else:
            n = int((sample < np.uint64(theta_raw)).sum())
        # float-division path (n * space exact in float64 for n ≤ 2^12;
        # theta rounds to double exactly as SQL's int→double cast), so
        # the md5-compat oracle reproduces the estimate bit-for-bit.
        return n * float(self._space) / float(theta_raw)

    def estimate(self) -> float:
        """Distinct-count estimate: exact below k, (k−1)/U(k) above."""
        return self._estimate_from(self.values, self.theta_raw)

    def rse(self) -> float:
        """Relative standard error envelope ≈ 1/sqrt(k−2)."""
        return 1.0 / math.sqrt(self.k - 2)

    def __reduce__(self):
        return (_rebuild_theta, (self.k, self.hash_bits, self.values))


def _rebuild_theta(k, hash_bits, values):
    s = ThetaSketch(k, hash_bits)
    s.values = values
    return s


def _pair_theta(a: ThetaSketch, b: ThetaSketch) -> int:
    if (a.k, a.hash_bits) != (b.k, b.hash_bits):
        raise ValueError("sketches must share k/hash config")
    return min(a.theta_raw, b.theta_raw)


def intersection_estimate(a: ThetaSketch, b: ThetaSketch) -> float:
    """|A ∩ B| estimate: retained values present in BOTH samples, below
    the tighter theta, scaled by the common sampling rate.  Exact when
    both sketches are unsaturated."""
    theta = _pair_theta(a, b)
    common = np.intersect1d(a.values, b.values, assume_unique=True)
    return a._estimate_from(common, theta)


def difference_estimate(a: ThetaSketch, b: ThetaSketch) -> float:
    """|A ∖ B| estimate under the same common-theta rule."""
    theta = _pair_theta(a, b)
    only = np.setdiff1d(a.values, b.values, assume_unique=True)
    return a._estimate_from(only, theta)


def jaccard_estimate(a: ThetaSketch, b: ThetaSketch) -> float:
    """est|A∩B| / est|A∪B| (0.0 when the union estimate is 0)."""
    inter = intersection_estimate(a, b)
    union = a.merge(b).estimate()
    return inter / union if union else 0.0


# -- Spark builders ----------------------------------------------------

def _hash_col(key_cols: list[str], hash_fn: str):
    """The raw-hash Column + its hash_bits. Keys never reach Python."""
    from pyspark.sql import functions as F

    from .cms import spark_key_expr

    key = spark_key_expr(key_cols)
    if hash_fn == "xxhash64":
        return F.xxhash64(key, F.lit(_XXH_SEED)), 64
    if hash_fn == "md5":
        return (
            F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long"),
            60,
        )
    raise ValueError(f"hash_fn must be xxhash64|md5, got {hash_fn!r}")


def theta_from_dataframe(df, key_cols: list[str], k: int = 1024,
                         hash_fn: str = "xxhash64",
                         combine_partitions: int = 8) -> ThetaSketch:
    """Distributed KMV build over the tuple of ``key_cols`` (NULL tuples
    skipped) — two-level mapInPandas fold, bounded driver collect."""
    from pyspark.sql import functions as F

    filtered = df
    for c in key_cols:
        filtered = filtered.where(F.col(c).isNotNull())
    hc, bits = _hash_col(key_cols, hash_fn)
    hashed = filtered.select(hc.alias("h"))

    def build(batches):
        import pandas as pd

        local = ThetaSketch(k, bits)
        for pdf in batches:
            local.add_hashed(pdf["h"].to_numpy())
        yield pd.DataFrame({"sketch": [pickle.dumps(local)]})

    def combine(batches):
        import pandas as pd

        acc = ThetaSketch(k, bits)
        for pdf in batches:
            for blob in pdf["sketch"]:
                acc = acc.merge(pickle.loads(blob))
        yield pd.DataFrame({"sketch": [pickle.dumps(acc)]})

    level1 = hashed.mapInPandas(build, "sketch binary")
    level2 = level1.repartition(combine_partitions).mapInPandas(
        combine, "sketch binary"
    )
    out = ThetaSketch(k, bits)
    for row in level2.collect():
        out = out.merge(pickle.loads(row["sketch"]))
    return out


def theta_by_group(df, group_col: str, key_cols: list[str], k: int = 1024,
                   hash_fn: str = "xxhash64",
                   combine_partitions: int = 8) -> dict:
    """One KMV sketch per distinct ``group_col`` value, same bounded
    two-level fold as hll_by_group — each partition folds only ITS slice
    of each group, level 2 hash-partitions by group, and the driver
    folds ≤ combine_partitions sketches per group.  Returns
    {group_value: ThetaSketch}; NULL groups survive under the key
    ``None`` via the same one-char tag as hll_by_group (ADVICE r6 #2)."""
    from pyspark.sql import functions as F

    from .hll import _tagged_group, _untag_group

    filtered = df
    for c in key_cols:
        filtered = filtered.where(F.col(c).isNotNull())
    hc, bits = _hash_col(key_cols, hash_fn)
    hashed = filtered.select(_tagged_group(F, group_col).alias("g"), hc.alias("h"))

    def build(batches):
        import pandas as pd

        local: dict = {}
        for pdf in batches:
            for g, sub in pdf.groupby("g", sort=False):
                sk = local.get(g)
                if sk is None:
                    sk = local[g] = ThetaSketch(k, bits)
                sk.add_hashed(sub["h"].to_numpy())
        yield pd.DataFrame(
            {"g": list(local), "sketch": [pickle.dumps(s) for s in local.values()]}
        )

    def combine(batches):
        import pandas as pd

        acc: dict = {}
        for pdf in batches:
            for g, blob in zip(pdf["g"], pdf["sketch"]):
                sk = pickle.loads(blob)
                acc[g] = sk if g not in acc else acc[g].merge(sk)
        yield pd.DataFrame(
            {"g": list(acc), "sketch": [pickle.dumps(s) for s in acc.values()]}
        )

    level1 = hashed.mapInPandas(build, "g string, sketch binary")
    level2 = level1.repartition(combine_partitions, "g").mapInPandas(
        combine, "g string, sketch binary"
    )
    out: dict = {}
    for row in level2.collect():
        sk = pickle.loads(row["sketch"])
        g = _untag_group(row["g"])
        out[g] = sk if g not in out else out[g].merge(sk)
    return out

"""Embedding second-moment analytics: exact covariance + PCA projection.

The whitening/PCA prep a 100 TB embedding pipeline runs before
clustering, ANN indexing (OPQ-style rotations start here), or drift
monitoring: ONE distributed pass folds the d×d second-moment matrix;
the d×d eigendecomposition is a driver-side numpy call (d ≤ a few
hundred — the matrix is tiny, the DATA pass is the distributed part,
the standard big-data PCA split).

Cross-engine exactness: float sums are order-dependent, so the
covariance aggregation quantizes each term to a fixed decimal scale
and sums as DECIMAL (exact, commutative — the embedding_centroids
precedent), then finishes in double with one fixed expression shape.
The SQL oracle replays the identical quantized arithmetic, so every
covariance entry hash-matches.

No reference-repo counterpart (the reference is a join utility); part
of the mandated LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def embedding_covariance(
    emb: DataFrame,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """Upper-triangle covariance of the embedding distribution:
    (i, j, n_vecs, cov) for 0 <= i <= j < dim.

    cov(i,j) = Sxy/n − (Sx/n)(Sy/n) over the 6-decimal-quantized
    values, carried as INTEGER MICRO-UNITS: q = round(v, 6) as
    DECIMAL(18,6) (the quantization both engines agree on — rounding
    a double PRODUCT is where they diverge by an ulp) scaled exactly
    to a long q·10⁶; Sxy = Σ qᵢ·qⱼ and Sx = Σ qᵢ are then plain long
    sums — exact, order-independent, and whole-stage-codegen integer
    ops instead of 4M decimal multiplies (6.8 s → ~2 s at sf0.1).
    The double finish is one fixed expression shape, so the output is
    bit-stable across engines and partitionings; quantization error
    vs true float covariance ≤ ~1e-6·|μ|, invisible at the
    rounded-to-6 output.

    Bounds: Σ qᵢqⱼ ≤ n·(10⁶·max|v|)² must fit a signed 64-bit sum —
    for unit-scale embeddings that is n ≲ 9·10⁶ rows, the regime this
    oracle-checkable path serves; beyond it use ``covariance_outer``,
    the no-fan-out scale path.  The loud-failure contract is enforced
    IN-PLAN and ANSI-independently (ADVICE r10 #2 follow-through —
    the session no longer pins ansi.enabled, see configure()): the
    same aggregation carries n·max|x|·max|y| in doubles (never
    overflows) and ``raise_error``s when that conservative envelope
    crosses 2⁶³ — before a wrapped sum could ever be emitted, on any
    Spark version and either ANSI setting. The quantization cast has
    the same contract: |x| ≥ 1e12 exceeds decimal(18,6) and would NULL
    silently under ANSI-off (NULLs skip sum/max, blinding the envelope
    guard), so the element expression raises in-plan before the cast
    (ADVICE r11 #2).

    Scale shape: the fan-out is dim·(dim+1)/2 per row BEFORE the
    aggregate, but it never reaches a shuffle — the (i, j) groupBy
    map-side-combines to d² partial rows per task, so the exchange
    carries ~2080 rows per partition regardless of corpus size. For
    dim in the thousands, switch to a block-partitioned outer-product
    fold; at embedding dims (64–1024) this is the simpler exact path.
    """
    if dim < 2:
        raise ValueError("dim must be >= 2")
    # per-row quantized micro-unit array, computed ONCE per vector.
    # With ANSI off the decimal(18,6) cast NULLs out (instead of erroring)
    # for |x| >= 1e12, and NULLs are skipped by sum/max — so the envelope
    # guard below would never see the overflow (ADVICE r11 #2). Raise
    # in-plan BEFORE the cast can swallow a value; NaN compares greater
    # than any double in Spark SQL, so garbage vectors fail loudly too.
    q = F.transform(
        F.col(vec_col),
        lambda x: F.when(
            F.abs(x.cast("double")) >= F.lit(1e12),
            F.raise_error(
                F.lit(
                    "embedding_covariance: |value| >= 1e12 exceeds the "
                    "decimal(18,6) quantization range — use "
                    "covariance_outer for this scale"
                )
            ).cast("long"),
        ).otherwise(
            (
                F.round(x.cast("double"), 6).cast("decimal(18,6)")
                * F.lit(1_000_000)
            ).cast("long")
        ),
    )
    e = emb.select(q.alias("__q"))
    xi = F.element_at("__q", F.col("i") + 1)
    xj = F.element_at("__q", F.col("j") + 1)
    pairs = (
        e.select(F.explode(F.sequence(F.lit(0), F.lit(dim - 1))).alias("i"), "__q")
        .select("i", F.explode(F.sequence(F.col("i"), F.lit(dim - 1))).alias("j"), "__q")
        .select("i", "j", xi.alias("__x"), xj.alias("__y"))
        .withColumn("__xy", F.col("__x") * F.col("__y"))
    )
    n = F.count(F.lit(1))
    # scale constants: sums are micro-unit integers (x: 1e6, xy: 1e12)
    # overflow envelope: n·max|x|·max|y| in doubles bounds |Σ xy| (and
    # a fortiori |Σ x|); crossing 2^63 raises in-plan regardless of
    # spark.sql.ansi.enabled — the wrapped sum can never be emitted
    nd = F.col("n_vecs").cast("double")
    mxd, myd = F.col("__mx").cast("double"), F.col("__my").cast("double")
    # bounds all three long sums: |Σxy| <= n·mx·my, |Σx| <= n·mx,
    # |Σy| <= n·my (the product alone misses a zero-sided column)
    envelope = F.greatest(nd * mxd * myd, nd * mxd, nd * myd)
    guard = F.when(
        envelope >= F.lit(float(2**63)),
        F.raise_error(
            F.lit(
                "embedding_covariance: micro-unit sum may exceed int64 "
                "(n*max|x|*max|y| >= 2^63) — use covariance_outer for "
                "this scale"
            )
        ).cast("long"),
    ).otherwise(F.col("__sxy"))
    return (
        pairs.groupBy("i", "j")
        .agg(
            n.alias("n_vecs"),
            F.sum("__xy").alias("__sxy"),
            F.sum("__x").alias("__sx"),
            F.sum("__y").alias("__sy"),
            F.max(F.abs(F.col("__x"))).alias("__mx"),
            F.max(F.abs(F.col("__y"))).alias("__my"),
        )
        .withColumn("__sxy", guard)
        .select(
            F.col("i").cast("int").alias("i"),
            F.col("j").cast("int").alias("j"),
            "n_vecs",
            (
                F.round(
                    (
                        F.col("__sxy").cast("double") / F.lit(1e12)
                        - F.col("__sx").cast("double")
                        * F.col("__sy").cast("double")
                        / F.lit(1e12)
                        / F.col("n_vecs")
                    )
                    / F.col("n_vecs"),
                    6,
                )
                # + 0.0 canonicalizes IEEE negative zero (engines differ
                # on whether round(-1e-9, 6) is -0.0 or 0.0; -0.0 + 0.0
                # is +0.0 in round-to-nearest)
                + F.lit(0.0)
            ).alias("cov"),
        )
    )


def covariance_outer(
    emb: DataFrame,
    dim: int = 64,
    vec_col: str = "embedding",
):
    """The HIGH-DIM scale path for the second-moment fold: per-partition
    numpy ``X.T @ X`` partials (one Arrow pass, zero fan-out) reduced on
    the driver — returns ``(n, mean vector, covariance matrix)`` as
    numpy objects, the input ``pca_project`` needs.

    ``embedding_covariance`` explodes dim·(dim+1)/2 terms per row to
    buy DECIMAL exactness for the SQL oracle; that fan-out is fine at
    embedding dims (64 → 2080/row) and absurd at dim 4096 (8.4M/row).
    Here each partition contributes ONE (count, Σx, ΣxᵀX) partial —
    d + d² floats, independent of row count — so the driver folds
    #partitions · (d²+d+1) doubles (a _fit_centroids-scale collect,
    bounded by cluster width, not data size). Float sums make it
    order-dependent (~1e-12 relative run-to-run) — the exact decimal
    path remains the oracle-checkable one; equivalence within 1e-9 is
    pinned in tests/test_pca.py.
    """
    import numpy as np

    if dim < 2:
        raise ValueError("dim must be >= 2")

    def _partials(batches):
        import numpy as np
        import pandas as pd

        n = 0
        s = np.zeros(dim)
        ss = np.zeros((dim, dim))
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            n += len(x)
            s += x.sum(axis=0)
            ss += x.T @ x
        yield pd.DataFrame(
            {
                "n": [n],
                "s": [s.tolist()],
                "ss": [ss.reshape(-1).tolist()],
            }
        )

    parts = (
        emb.select(vec_col)
        .mapInPandas(_partials, "n long, s array<double>, ss array<double>")
        .collect()
    )
    n = sum(p["n"] for p in parts)
    if n == 0:
        raise ValueError("empty input")
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    ss = np.sum(
        [np.asarray(p["ss"]).reshape(dim, dim) for p in parts], axis=0
    )
    mu = s / n
    cov = ss / n - np.outer(mu, mu)
    return n, mu, cov


def pca_project(
    emb: DataFrame,
    n_components: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Project embeddings onto the top principal components.

    One distributed covariance pass (``embedding_covariance``), a
    driver-side ``numpy.linalg.eigh`` on the tiny d×d matrix, then a
    pure-codegen projection (each component an unrolled dot product
    against literal eigenvector coefficients — no Python per row, no
    second shuffle). Component sign is fixed deterministically (first
    nonzero coefficient positive) so runs are reproducible.

    Returns (df, explained_variance_ratio): df has
    (id_col, pc array<double> of length n_components).
    """
    import numpy as np

    if not 1 <= n_components <= dim:
        raise ValueError("need 1 <= n_components <= dim")
    rows = embedding_covariance(emb, dim=dim, vec_col=vec_col).collect()
    c = np.zeros((dim, dim))
    for r in rows:
        c[r["i"], r["j"]] = r["cov"]
        c[r["j"], r["i"]] = r["cov"]
    vals, vecs = np.linalg.eigh(c)
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    total = float(vals.sum()) or 1.0
    comps = []
    for k in range(n_components):
        v = vecs[:, k]
        nz = np.nonzero(np.abs(v) > 1e-12)[0]
        if len(nz) and v[nz[0]] < 0:
            v = -v
        comps.append([float(x) for x in v])
    # centered projection: (x - mu) . v ; mu from the diagonal pass
    # means (Sx/n per dim) — recover from covariance rows' __sx? The
    # collect above only kept cov, so compute means in one tiny agg.
    mu_row = emb.select(
        *[
            (
                F.sum(
                    F.round(
                        F.element_at(vec_col, i + 1).cast("double"), 6
                    ).cast("decimal(18,6)")
                ).cast("double")
                / F.count(F.lit(1))
            ).alias(f"m{i}")
            for i in range(dim)
        ]
    ).collect()[0]
    mu = [float(mu_row[f"m{i}"]) for i in range(dim)]
    x = lambda i: F.element_at(vec_col, i + 1).cast("double") - F.lit(mu[i])  # noqa: E731
    pcs = F.array(
        *[
            sum(
                (x(i) * F.lit(comp[i]) for i in range(1, dim)),
                x(0) * F.lit(comp[0]),
            ).alias(f"pc{k}")
            for k, comp in enumerate(comps)
        ]
    )
    out = emb.select(F.col(id_col), pcs.alias("pc"))
    evr = [float(vals[k]) / total for k in range(n_components)]
    return out, evr

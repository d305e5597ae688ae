"""Supervised language identification: hashed char-n-grams + softmax GD.

The fastText language-ID recipe (Joulin et al. 2017, "Bag of Tricks for
Efficient Text Classification"; langid.py, Lui & Baldwin 2012) is a
linear softmax classifier over hashed character-n-gram features — the
production counterpart of the heuristic `text_lang_id` query: the
heuristic needs hand-picked marker grams, the trained model learns its
own from labeled docs and generalizes to every class in the corpus.

Spark-native, deterministic, oracle-replayable (the
operators/classifier.py logistic-GD precedent upgraded to multiclass):
full-batch softmax gradient descent with FIXED iteration count and zero
initialization — every arithmetic step is a pure function of the data,
so a DuckDB CTE chain replays the whole trajectory (softmax margins,
per-class gradients, weight updates) and the driver gate certifies the
final per-doc predictions EXACT.

Scale shape (100 TB corpus):
* Feature build: char bigrams via explode-positions (pure codegen, the
  shingles idiom), bucketed by md5 (SQL-replayable) BEFORE the
  (id, bucket) count — gram strings never shuffle; one groupBy(id)
  into a doc-major sparse map, persisted once for the training loop.
* Per GD iteration: C margin folds per doc against BROADCAST weight
  literals (no shuffle), softmax in-row, gradient = explode fmap →
  groupBy(bucket) with C partial-aggregated sums — each iteration
  moves O((D+1) x C x tasks) bytes regardless of corpus size; the
  driver holds only the C x (D+1) weight matrix (~2.6 KB here).
* Scoring: one shuffle-free projection per doc.

Why not MLlib: pyspark.ml's softmax is LBFGS behind a JVM barrier —
nondeterministic iteration counts, not oracle-checkable (the
classifier.py rationale).

No reference-repo counterpart (anish749/spark-skew-join is a join
utility, dfimplicits.scala:26-125); mandated LLM-pipeline extension
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "char_hashed_features",
    "train_softmax",
    "langid_classifier",
    "langid_eval",
    "softmax_oracle_sql",
    "langid_eval_oracle_sql",
]


def char_hashed_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 128,
    n: int = 2,
) -> DataFrame:
    """Doc-major sparse char-n-gram feature maps via the hashing trick.

    Grams are overlapping character n-grams of the lowercased text
    (spaces included — word boundaries carry language signal), built
    with sequence+explode (pure codegen, the shingles idiom,
    operators/dedup.py:148) and bucketed by the first 8 hex chars of
    md5(gram) mod ``n_buckets`` (SQL-replayable), tf-normalized by the
    doc's gram count. Bucket ``n_buckets`` is the bias feature (1.0).

    Output: (id_col, fmap map<int,double>, n_gram). Docs shorter than
    ``n`` chars are dropped (no grams -> undefined tf).
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    if n < 1:
        raise ValueError("n must be >= 1")
    from ..sources.tables import fan_out_narrow

    t = F.lower(F.col("__t"))
    pos = F.explode(
        F.sequence(F.lit(1), F.length(F.col("__t")) - n + 1)
    ).alias("pos")
    bucket = (
        F.conv(F.substring(F.md5(F.col("__g")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    tf = (
        fan_out_narrow(
            docs.select(F.col(id_col), F.col(text_col).alias("__t")).where(
                F.length(text_col) >= n
            )
        )
        .select(id_col, t.alias("__t"), pos)
        .select(
            id_col,
            F.substring(F.col("__t"), F.col("pos").cast("int"), n).alias(
                "__g"
            ),
        )
        .select(id_col, bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = tf.groupBy(id_col).agg(
        F.sum("c").alias("n_gram"),
        F.collect_list(F.struct("bucket", "c")).alias("__e"),
    )
    fmap = F.map_from_entries(
        F.concat(
            F.transform(
                "__e",
                lambda e: F.struct(
                    e["bucket"].cast("int").alias("key"),
                    (e["c"].cast("double") / F.col("n_gram")).alias("value"),
                ),
            ),
            F.array(
                F.struct(
                    F.lit(n_buckets).cast("int").alias("key"),
                    F.lit(1.0).alias("value"),
                )
            ),
        )
    )
    return per_doc.select(id_col, fmap.alias("fmap"), "n_gram")


def _weights_df(spark, weights: list[list[float]]):
    """The C x (D+1) weight matrix as a ONE-ROW DataFrame, bucket-major
    (``__W[b][c]``), for a broadcast scalar cross-join. A literal-array
    fold (the binary classifier's shape, classifier.py:100) would embed
    C x (D+1) literals into the expression tree and recompile the
    whole-stage codegen EVERY iteration (measured ~8 s/iteration at 20
    classes); as a broadcast column the expression — and its compiled
    code — is identical across iterations, so only the 1-row relation
    changes. The 1-row BroadcastNestedLoopJoin is the allowlisted
    scalar idiom (queries.SCALAR_BNL_OK)."""
    nc, d1 = len(weights), len(weights[0])
    bucket_major = [
        [float(weights[c][b]) for c in range(nc)] for b in range(d1)
    ]
    return spark.createDataFrame(
        [(bucket_major,)], "__W array<array<double>>"
    )


def _margins() -> "F.Column":
    """All C sparse dot products in ONE fold over the doc's fmap:
    acc[c] += x_b * __W[b][c] via zip_with."""
    return F.aggregate(
        F.map_entries("fmap"),
        F.array_repeat(F.lit(0.0), F.size(F.element_at("__W", 1))),
        lambda acc, e: F.zip_with(
            acc,
            F.element_at(F.col("__W"), e["key"] + 1),
            lambda a, w: a + e["value"] * w,
        ),
    )


def train_softmax(
    feats: DataFrame,
    label_col: str = "y",
    n_classes: int = 2,
    n_buckets: int = 128,
    iters: int = 6,
    lr: float = 2.0,
) -> list[list[float]]:
    """Full-batch softmax GD; returns the C x (D+1) weight matrix.

    ``label_col`` holds class INDICES 0..C-1. The update, w_0 = 0:

        p_c   = exp(x·w_c) / Σ_c' exp(x·w_c')
        w_{t+1}[c][b] = w_t[c][b] - lr/n · Σ_docs (p_c - 1[y=c]) x[b]

    ``iters`` is fixed, so the trajectory is a pure function of the
    data — a DuckDB CTE chain replays it (float sum order is the only
    divergence, invisible at the registry's round-6 outputs). Each
    iteration is ONE Spark job: C margin folds (no shuffle) → explode
    fmap → groupBy(bucket) with C partial-aggregated sums → collect
    D+1 rows; driver state is the weight matrix only.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if n_classes < 2:
        raise ValueError("n_classes must be >= 2")
    spark = feats.sparkSession
    d = feats.select(feats.columns[0], label_col, "fmap").persist()
    # the margin/softmax/gradient expressions are higher-order
    # functions — CodegenFallback, interpreted either way — so
    # whole-stage codegen only buys each iteration a large one-shot
    # method compile (and, under long-session code-cache pressure,
    # the occasional failed-compile retry); run the training loop
    # with WSCG off and restore the session setting after
    try:
        _old_wscg = spark.conf.get("spark.sql.codegen.wholeStage")
    except Exception:
        _old_wscg = "true"
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try:
        n = d.count()
        if n == 0:
            raise ValueError("no training documents (all too short?)")
        weights = [[0.0] * (n_buckets + 1) for _ in range(n_classes)]
        for _ in range(iters):
            base = (
                d.crossJoin(F.broadcast(_weights_df(spark, weights)))
                .select(label_col, "fmap", _margins().alias("__m"))
                .select(
                    label_col,
                    "fmap",
                    F.transform("__m", lambda x: F.exp(x)).alias("__e"),
                )
            )
            denom = F.aggregate("__e", F.lit(0.0), lambda a, x: a + x)
            resid = F.transform(
                "__e",
                lambda e, i: e / denom
                - (F.col(label_col) == i).cast("double"),
            )
            grad_rows = (
                base.select(resid.alias("__r"), "fmap")
                .select("__r", F.explode("fmap").alias("bucket", "x"))
                .groupBy("bucket")
                .agg(
                    *[
                        F.sum(
                            F.element_at("__r", c + 1) * F.col("x")
                        ).alias(f"g{c}")
                        for c in range(n_classes)
                    ]
                )
                .collect()
            )
            for row in grad_rows:
                for c in range(n_classes):
                    weights[c][row["bucket"]] -= lr * row[f"g{c}"] / n
    finally:
        spark.conf.set("spark.sql.codegen.wholeStage", _old_wscg)
        d.unpersist()
    return weights


def langid_classifier(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    classes: list[str] | None = None,
    n_buckets: int = 128,
    n: int = 2,
    iters: int = 6,
    lr: float = 2.0,
) -> DataFrame:
    """Train on the labeled corpus, predict a language for every doc.

    ``classes`` fixes the class-index mapping (sorted distinct labels
    when omitted — collected once, bounded by the language count).
    Prediction is the argmax of the ROUND-6 softmax probabilities,
    ties to the smallest class index, so engine and oracle agree
    whenever their rounded probabilities do.

    Output per doc: (id_col, y, pred, p_pred) ordered by id — y/pred
    are the label strings, p_pred the rounded winning probability.
    """
    if classes is None:
        classes = sorted(
            r[0]
            for r in docs.select(label_col).distinct().collect()
            if r[0] is not None
        )
    cidx = {v: i for i, v in enumerate(classes)}
    if len(cidx) < 2:
        raise ValueError("need at least 2 classes")
    label_ix = F.col(label_col)
    y_expr = None
    for v, i in cidx.items():
        y_expr = (
            F.when(label_ix == v, i)
            if y_expr is None
            else y_expr.when(label_ix == v, i)
        )
    feats = char_hashed_features(docs, id_col, text_col, n_buckets, n)
    labeled = feats.join(
        docs.select(id_col, y_expr.cast("int").alias("__y"), label_col),
        id_col,
    ).where(F.col("__y").isNotNull())
    weights = train_softmax(
        labeled,
        label_col="__y",
        n_classes=len(classes),
        n_buckets=n_buckets,
        iters=iters,
        lr=lr,
    )
    exps = F.transform(_margins(), lambda x: F.exp(x))
    scored = labeled.crossJoin(
        F.broadcast(_weights_df(labeled.sparkSession, weights))
    ).select(
        id_col, F.col(label_col).alias("y"), exps.alias("__e")
    )
    denom = F.aggregate("__e", F.lit(0.0), lambda a, x: a + x)
    probs = F.transform("__e", lambda e: F.round(e / denom, 6))
    scored = scored.select(id_col, "y", probs.alias("__p"))
    # first-max argmax on the rounded probs (smallest index wins ties)
    # — the same (p DESC, c ASC) rule the SQL oracle uses
    best = F.array_max("__p")
    pred = None
    for c, v in enumerate(classes):
        cond = F.element_at("__p", c + 1) == best
        pred = F.when(cond, v) if pred is None else pred.when(cond, v)
    return scored.select(
        id_col,
        "y",
        pred.alias("pred"),
        best.alias("p_pred"),
    ).orderBy(id_col)


def langid_eval(scored: DataFrame, label_col: str = "y") -> DataFrame:
    """Per-class one-vs-rest metrics over langid_classifier output:
    (lang, n_docs, tp, fp, fn, precision, recall, f1), one row per
    TRUE class, ordered by lang — the multiclass counterpart of
    classifier.py::calibration_sweep (single aggregation pass, C rows
    out regardless of corpus size; NULL on empty denominators in both
    engines)."""
    y, p = F.col(label_col), F.col("pred")
    per_true = scored.groupBy(y.alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((p == y).cast("int")).cast("long").alias("tp"),
        F.sum((p != y).cast("int")).cast("long").alias("fn"),
    )
    per_pred = scored.where(p != y).groupBy(p.alias("lang")).agg(
        F.count(F.lit(1)).cast("long").alias("fp")
    )
    j = per_true.join(per_pred, "lang", "left").withColumn(
        "fp", F.coalesce(F.col("fp"), F.lit(0).cast("long"))
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return j.select(
        "lang",
        "n_docs",
        "tp",
        "fp",
        "fn",
        F.when(tp + fp == 0, F.lit(None))
        .otherwise(F.round(tp / (tp + fp), 6))
        .alias("precision"),
        F.when(tp + fn == 0, F.lit(None))
        .otherwise(F.round(tp / (tp + fn), 6))
        .alias("recall"),
        F.when(2 * tp + fp + fn == 0, F.lit(None))
        .otherwise(F.round(2 * tp / (2 * tp + fp + fn), 6))
        .alias("f1"),
    ).orderBy("lang")


def softmax_oracle_sql(
    n_buckets: int = 128,
    n: int = 2,
    iters: int = 6,
    lr: float = 2.0,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
) -> str:
    """DuckDB replay of the exact softmax training recurrence, unrolled
    (the classifier.py::logreg_oracle_sql pattern, multiclass): one
    (margin, softmax, gradient, weights) CTE quadruple per iteration
    over a (bucket x class) weight spine. The class-index mapping is
    derived IN SQL (sorted distinct labels) — the same mapping the
    Spark side collects — so the oracle needs no fixture-specific
    literals."""
    d = n_buckets
    head = [f"""
WITH cls AS (
  SELECT lbl, ROW_NUMBER() OVER (ORDER BY lbl) - 1 AS c
  FROM (SELECT DISTINCT {label_col} AS lbl FROM {table}
        WHERE {label_col} IS NOT NULL)
),
base AS (
  SELECT {id_col} AS id, LOWER({text_col}) AS txt,
         LENGTH({text_col}) - {n} + 1 AS ng, {label_col} AS lbl
  FROM {table} WHERE LENGTH({text_col}) >= {n}
),
feat AS (
  SELECT id, bucket, COUNT(*) / CAST(ANY_VALUE(ng) AS DOUBLE) AS x
  FROM (
    SELECT id, ng,
           CAST(('0x' || SUBSTRING(MD5(SUBSTRING(txt, i, {n})), 1, 8))
                AS BIGINT) % {d} AS bucket
    FROM base, UNNEST(range(1, ng + 1)) AS u(i)
  ) GROUP BY id, bucket
  UNION ALL
  SELECT id, {d} AS bucket, 1.0 AS x FROM base
),
lab AS (SELECT base.id, cls.c AS y, base.lbl FROM base JOIN cls USING (lbl)),
nn AS (SELECT COUNT(*) AS n FROM lab),
spine AS (
  SELECT CAST(b.range AS BIGINT) AS bucket, cls.c
  FROM range({d + 1}) b, cls
),
w0 AS (SELECT bucket, c, 0.0 AS w FROM spine)"""]
    for t in range(1, iters + 2):
        head.append(f""",
m{t} AS (
  SELECT f.id, w.c, SUM(f.x * w.w) AS m
  FROM feat f JOIN w{t - 1} w USING (bucket) GROUP BY f.id, w.c
),
p{t} AS (
  SELECT id, c, EXP(m) / SUM(EXP(m)) OVER (PARTITION BY id) AS p
  FROM m{t}
)""")
        if t == iters + 1:
            break  # final probabilities only — no further update
        head.append(f""",
g{t} AS (
  SELECT f.bucket, p.c,
         SUM((p.p - CASE WHEN lab.y = p.c THEN 1.0 ELSE 0.0 END) * f.x)
           AS g
  FROM feat f JOIN p{t} p USING (id) JOIN lab USING (id)
  GROUP BY f.bucket, p.c
),
w{t} AS (
  SELECT s.bucket, s.c,
         w.w - {lr!r} * COALESCE(g{t}.g, 0.0) / (SELECT n FROM nn) AS w
  FROM spine s JOIN w{t - 1} w USING (bucket, c)
  LEFT JOIN g{t} USING (bucket, c)
)""")
    # argmax on the ROUNDED probabilities, smallest class index on
    # ties — the same rule the Spark side's first-max CASE chain uses
    head.append(f""",
pfin AS (
  SELECT id, c, ROUND(p, 6) AS p FROM p{iters + 1}
),
win AS (
  SELECT id, c, p,
         ROW_NUMBER() OVER (PARTITION BY id ORDER BY p DESC, c ASC)
           AS rn
  FROM pfin
)
SELECT lab.id AS {id_col}, lab.lbl AS y, cls.lbl AS pred,
       win.p AS p_pred
FROM win JOIN lab USING (id) JOIN cls USING (c)
WHERE win.rn = 1
ORDER BY lab.id""")
    return "".join(head)


def langid_eval_oracle_sql(scored_sql: str) -> str:
    """DuckDB replay of langid_eval over a scored subquery."""
    return f"""
WITH scored AS ({scored_sql}),
per_true AS (
  SELECT y AS lang, COUNT(*) AS n_docs,
         SUM(CASE WHEN pred = y THEN 1 ELSE 0 END) AS tp,
         SUM(CASE WHEN pred <> y THEN 1 ELSE 0 END) AS fn
  FROM scored GROUP BY y
),
per_pred AS (
  SELECT pred AS lang, COUNT(*) AS fp FROM scored WHERE pred <> y
  GROUP BY pred
)
SELECT t.lang, CAST(t.n_docs AS BIGINT) AS n_docs,
       CAST(t.tp AS BIGINT) AS tp,
       CAST(COALESCE(p.fp, 0) AS BIGINT) AS fp,
       CAST(t.fn AS BIGINT) AS fn,
       CASE WHEN t.tp + COALESCE(p.fp, 0) = 0 THEN NULL
            ELSE ROUND(t.tp / (t.tp + COALESCE(p.fp, 0)), 6)
       END AS precision,
       CASE WHEN t.tp + t.fn = 0 THEN NULL
            ELSE ROUND(t.tp / (t.tp + t.fn), 6) END AS recall,
       CASE WHEN 2 * t.tp + COALESCE(p.fp, 0) + t.fn = 0 THEN NULL
            ELSE ROUND(2 * t.tp / (2 * t.tp + COALESCE(p.fp, 0) + t.fn), 6)
       END AS f1
FROM per_true t LEFT JOIN per_pred p USING (lang)
ORDER BY t.lang"""

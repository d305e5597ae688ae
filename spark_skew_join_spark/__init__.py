"""spark_skew_join_spark — PySpark-native rebuild of anish749/spark-skew-join.

A skew-aware fragment-replicate equi-join (the reference's flagship,
``/root/reference/src/main/scala/org/anish/spark/skew/dfimplicits.scala``)
plus its diagnostics/sketch utilities, re-expressed as pure DataFrame
composition, and the LLM-data-pipeline extension surface (dedup, similarity
search, text analysis, multimodal columns, streaming windows) mandated by
the build contract.
"""

from .conf import SkewJoinConf, SkewType
from .operators.skew_join import skew_join
from .operators.diagnostics import (
    count_per_partition,
    count_per_partition_df,
    partition_stats,
    show_count_per_partition,
    show_partition_stats,
    timed_save,
)
from .operators.asof import asof_join, range_join
from .operators.dedup import (
    dedup,
    exact_dedup,
    minhash_pairs,
    ngram_jaccard_pairs,
    simhash64,
)
from .operators.similarity import cosine_topk, lsh_topk
from .sketch.cms import CountMinSketch, cms_from_dataframe
from .testing import assert_df_equal

__all__ = [
    "SkewJoinConf",
    "SkewType",
    "skew_join",
    "count_per_partition",
    "count_per_partition_df",
    "partition_stats",
    "show_count_per_partition",
    "show_partition_stats",
    "timed_save",
    "CountMinSketch",
    "cms_from_dataframe",
    "assert_df_equal",
    "asof_join",
    "range_join",
    "dedup",
    "exact_dedup",
    "minhash_pairs",
    "ngram_jaccard_pairs",
    "simhash64",
    "cosine_topk",
    "lsh_topk",
]

__version__ = "0.1.0"

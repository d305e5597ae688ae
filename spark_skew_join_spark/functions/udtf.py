"""Python UDTF + grouped-agg pandas UDAF surface (Spark 3.5+/4.x APIs).

The rest of the library keeps hot paths UDF-free; these exist to cover the
table-function and grouped-aggregate API surface with genuinely
non-trivial-but-oracle-checkable examples:

* ``SplitSentences`` — a Python UDTF splitting document text into
  (sent_idx, sentence) rows, used via ``LATERAL`` join. The split regex
  avoids lookbehind so the DuckDB oracle (RE2 ``string_split_regex``)
  computes the identical split.
* ``weighted_avg_price`` — an Arrow grouped-agg pandas UDF. Float sums over
  arbitrary Arrow batch order are not reproducible, so the mean is computed
  in exact int64 cents (order-independent) and divided once — bit-identical
  to the SQL oracle's BIGINT formulation.

Scale: the UDTF fans out one doc into few rows (Arrow-batched, no
driver involvement); grouped-agg UDFs receive whole groups — skewed group
sizes concentrate memory, so pre-aggregate or salt hot groups first for
100 TB inputs (see operators/skew_agg.py).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

SENT_SPLIT = r"\.\s+"


class SplitSentences:
    """UDTF: text → (sent_idx int, sentence string), empty pieces dropped."""

    def eval(self, text: str):  # noqa: A002 - UDTF contract
        for i, s in enumerate(re.split(SENT_SPLIT, text or "")):
            if s:
                yield i, s


def register_split_sentences(spark):
    """Register the UDTF as ``split_sentences`` for LATERAL use in SQL."""
    from pyspark.sql.functions import udtf

    wrapped = udtf(SplitSentences, returnType="sent_idx int, sentence string")
    spark.udtf.register("split_sentences", wrapped)
    return wrapped


def weighted_avg_price_udf():
    """Grouped-agg pandas UDF: quantity-weighted mean price in exact cents.

    int64 sums are order-independent (unlike float sums over Arrow batch
    order), so the result is deterministic and oracle-comparable."""
    import numpy as np
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit GROUPED_AGG: this module uses `from __future__ import
    # annotations`, which stringifies type hints and defeats inference
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def weighted_avg_price(price, qty):
        # SQL null-skipping aggregate semantics: a null/NaN price or qty
        # drops the ROW — .astype(int64) on NaN would otherwise inject
        # INT64_MIN into the weighted sum silently
        import pandas as pd

        ok = pd.notna(price) & pd.notna(qty)
        pc = np.floor(price[ok].to_numpy() * 100 + 0.5).astype(np.int64)
        q = qty[ok].to_numpy().astype(np.int64)
        den = int(q.sum())
        if den == 0:
            return float("nan")
        return int((pc * q).sum()) / (100.0 * den)

    return weighted_avg_price


__all__ = [
    "SplitSentences",
    "register_split_sentences",
    "weighted_avg_price_udf",
    "SENT_SPLIT",
    "F",
]

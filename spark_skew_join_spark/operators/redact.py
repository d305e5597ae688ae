"""Pattern redaction / scrubbing for training-data pipelines (PII pass).

Before text reaches a training corpus, PII-shaped spans (emails, phone
numbers, IP addresses, SSN-shaped ids) are replaced with typed
placeholder tokens, and the pipeline records how many replacements each
rule made per document (the audit trail deduplication and filtering
stages key on).

Spark shape: a chain of ``regexp_replace`` projections plus one
``regexp_count`` per rule — all whole-stage codegen over the scan, no
shuffle, no Python. At 100 TB this is embarrassingly parallel and
column-pruned; the regex cost is the scan cost.

Every pattern is restricted to constructs Java regex (Spark) and RE2
(DuckDB) evaluate identically — no lookarounds, no backreferences, no
\\p classes — so both the per-rule counts AND the redacted text itself
are oracle-checkable (the registry query checksums the redacted output
with md5).

Rules apply in list order against the progressively redacted text
(standard scrubber semantics: an email is consumed by the email rule
before the phone rule can see its digits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# (name, pattern, replacement) — order matters; see module docstring.
DEFAULT_PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("phone", r"\+?[0-9][0-9()\-. ]{7,}[0-9]", "<PHONE>"),
]

# Number normalization (digit-run collapsing) — a common standalone
# pre-tokenization pass, also the rule the fixture corpus can exercise
# with real (non-zero) replacement counts.
NUMBER_RULE: tuple[str, str, str] = ("number", "[0-9]+", "<NUM>")


def redact(
    df: DataFrame,
    text_col: str = "text",
    rules: list[tuple[str, str, str]] | None = None,
    out_col: str = "redacted",
    with_counts: bool = True,
) -> DataFrame:
    """Apply the rule chain to ``text_col``; adds ``out_col`` plus (with
    ``with_counts``) one ``n_<rule>`` column per rule, counted against
    the text as the rule saw it (i.e. after all earlier rules ran)."""
    rules = DEFAULT_PII_RULES if rules is None else rules
    out = df
    cur = F.col(text_col)
    for name, pattern, repl in rules:
        if with_counts:
            out = out.withColumn(f"n_{name}", F.regexp_count(cur, F.lit(pattern)))
        cur = F.regexp_replace(cur, pattern, repl)
    return out.withColumn(out_col, cur)

"""canonicalize_url edge cases: every normalization step, the cases the
registry fixture doesn't exercise, and plan purity."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_skew_join_spark.functions.text import canonicalize_url


def _canon(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["c"] for r in df.select(canonicalize_url("url").alias("c")).collect()]


def test_scheme_host_case_and_default_ports(spark):
    assert _canon(spark, [
        "HTTP://WWW.Example.COM:80/A/b",
        "https://x.org:443/",
        "https://x.org:8443/",          # non-default port survives
        "http://x.org:443/",            # :443 is NOT default for http
    ]) == [
        "http://www.example.com/A/b",   # path case preserved
        "https://x.org/",
        "https://x.org:8443/",
        "http://x.org:443/",
    ]


def test_fragment_slash_and_bare_host(spark):
    assert _canon(spark, [
        "https://a.io/p/#section",
        "https://a.io/p///",
        "https://a.io",
        "https://a.io/#top",
    ]) == ["https://a.io/p", "https://a.io/p", "https://a.io/", "https://a.io/"]


def test_query_param_sorting_and_tracking_removal(spark):
    assert _canon(spark, [
        "https://a.io/p?b=2&a=1",
        "https://a.io/p?a=1&b=2",
        "https://a.io/p?utm_source=x&a=1&utm_campaign=y&b=2",
        "https://a.io/p?gclid=123&fbclid=456&msclkid=789",
        "https://a.io/p?",
    ]) == [
        "https://a.io/p?a=1&b=2",
        "https://a.io/p?a=1&b=2",
        "https://a.io/p?a=1&b=2",
        "https://a.io/p",
        "https://a.io/p",
    ]


def test_non_tracking_params_survive_verbatim(spark):
    # 'utmost=1' must NOT be dropped (startswith 'utm_' is literal,
    # not a prefix class)
    assert _canon(spark, ["https://a.io/p?utmost=1&z=9"]) == [
        "https://a.io/p?utmost=1&z=9"
    ]


def test_idempotent(spark):
    urls = [
        "HTTPS://Shop1.Example.COM:443/item/7/?utm_source=f&b=2&a=1#x",
        "http://plain.org/path?q=1",
    ]
    once = _canon(spark, urls)
    assert _canon(spark, once) == once


def test_plan_is_codegen_only(spark):
    df = spark.createDataFrame([("https://a.io/p?b=2&a=1",)], "url string")
    plan = (
        df.select(canonicalize_url("url").alias("c"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

"""CDXJ url-index lines + SURT keys: key construction cases, the
emit→parse roundtrip (spaces inside the JSON payload included), the
lexicographic-clustering property, and the JVM-only plan shape."""

from pyspark.sql import functions as F

from text2mc_dataprocessor_spark.functions.cdx import (
    cdxj_lines,
    parse_cdxj,
    surt_key_col,
)


def test_surt_key_cases(spark):
    cases = [
        ("https://Sub.Example.COM/Path?Q=1#frag", "com,example,sub)/path?q=1"),
        ("http://example.com", "com,example)/"),
        ("http://example.com:8080/x", "com,example:8080)/x"),
        ("https://user@example.com/x", "com,example)/x"),
        ("https://h/", "h)/"),
        ("not-a-url", ""),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r.k
        for r in df.select(surt_key_col("url").alias("k"))
        .toPandas()
        .itertuples()
    ]
    assert got == [k for _, k in cases]


def test_cdxj_roundtrip_with_spaces_in_meta(spark):
    df = spark.createDataFrame(
        [
            ("https://a.example.com/p one", "2024-03-01 10:00:00", "hello world"),
            ("https://b.example.com/", "2024-12-31 23:59:59", None),
        ],
        "url string, warc_ts string, title string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    lines = cdxj_lines(df, meta_cols=("title",))
    back = parse_cdxj(lines.select("line"), meta_fields=("title",))
    rows = sorted(
        back.select(
            "urlkey",
            F.date_format("ts", "yyyyMMdd HHmmss").alias("t"),
            "url",
            "title",
        ).toPandas().itertuples(index=False)
    )
    assert rows == [
        ("com,example,a)/p%20one", "20240301 100000",
         "https://a.example.com/p one", "hello world"),
        ("com,example,b)/", "20241231 235959",
         "https://b.example.com/", None),
    ]


def test_surt_sort_clusters_by_domain(spark):
    urls = [
        "https://z.other.org/1",
        "https://a.example.com/x",
        "https://b.example.com/y",
        "https://example.com/z",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    keys = [
        r.k
        for r in df.select(surt_key_col("url").alias("k"))
        .orderBy("k")
        .toPandas()
        .itertuples()
    ]
    # all example.com hosts sort adjacently, before org
    assert keys == sorted(keys)
    ex = [k for k in keys if k.startswith("com,example")]
    assert keys[: len(ex)] == ex


def test_plan_is_jvm_only(spark):
    df = spark.createDataFrame(
        [("https://a.example.com/p", "2024-03-01 10:00:00")],
        "url string, warc_ts string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    out = parse_cdxj(cdxj_lines(df).select("line"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

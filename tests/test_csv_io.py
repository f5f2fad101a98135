"""S3 CSV checkpoint source + S7 bulk-download driver.

Reference semantics: projects.csv is loaded with header and pandas
quoting, and ``Unnamed: N`` index columns are dropped on every load
(scraper/selenium_scraper.py:106-118); download_all_builds GETs every
resolved RAW_DOWNLOAD_LINK (selenium_scraper.py:502-518).
"""

from pyspark.sql import functions as F

from text2mc_dataprocessor_spark.sources.csv_io import (
    read_checkpoint_csv,
    write_checkpoint_csv,
)
from text2mc_dataprocessor_spark.sources.fetch import (
    TableFetcher,
    download_all_builds,
    host_of,
)


def test_read_drops_unnamed_index_cols(spark, tmp_path):
    # exactly what pandas to_csv(index=True) produces, quoted newline included
    p = tmp_path / "projects.csv"
    p.write_text(
        ',TITLE,RAW_DOWNLOAD_LINK,DESC\n'
        '0,castle,https://a/x.zip,"multi\nline, desc"\n'
        '1,farm,,plain\n'
    )
    df = read_checkpoint_csv(spark, str(p))
    assert df.columns == ["TITLE", "RAW_DOWNLOAD_LINK", "DESC"]
    rows = {r.TITLE: r for r in df.collect()}
    assert rows["castle"].DESC == "multi\nline, desc"
    assert rows["farm"].RAW_DOWNLOAD_LINK is None


def test_roundtrip_preserves_values(spark, tmp_path):
    src = spark.createDataFrame(
        [("a", 'quote " and, comma'), ("b", "line\nbreak")], ["k", "v"]
    )
    out = str(tmp_path / "ck")
    write_checkpoint_csv(src, out, single_file=True)
    back = read_checkpoint_csv(spark, out)
    assert sorted((r.k, r.v) for r in back.collect()) == sorted(
        (r.k, r.v) for r in src.collect()
    )


def test_download_all_builds_dedups_and_fetches(spark):
    pages = spark.createDataFrame(
        [("https://h1/a.zip", "AAAA"), ("https://h2/b.zip", "BB")],
        ["url", "html"],
    )
    rows = spark.createDataFrame(
        [
            ("https://h1/a.zip",),
            ("https://h1/a.zip",),  # duplicate link: one GET, not two
            ("https://h2/b.zip",),
            (None,),
            ("",),
        ],
        ["raw_download_link"],
    )
    got = download_all_builds(rows, TableFetcher(pages), host_partitions=4)
    out = {r.url: r.html for r in got.collect()}
    assert out == {"https://h1/a.zip": "AAAA", "https://h2/b.zip": "BB"}


def test_host_extraction(spark):
    df = spark.createDataFrame(
        [("https://www.mediafire.com/file/x",), ("ftp://mirror.io/y",), ("nohost",)],
        ["url"],
    )
    got = [r.h for r in df.select(host_of(F.col("url")).alias("h")).collect()]
    assert got == ["www.mediafire.com", "mirror.io", ""]

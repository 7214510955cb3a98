"""URL canonicalization contract (ops/urlnorm.py)."""

from pyspark.sql import functions as F

from anserini_spark.ops.urlnorm import canonicalize_url, url_variant_groups

CASES = [
    # scheme normalized, www/port/fragment/trailing slash dropped
    ("http://WWW.Site.ORG:80/a/b/#frag", "https://site.org/a/b"),
    ("https://site.org:443/a/b/", "https://site.org/a/b"),
    # non-default port kept
    ("https://site.org:8080/a", "https://site.org:8080/a"),
    # bare root loses its slash
    ("https://site.org/", "https://site.org"),
    # tracking-only query loses the '?'
    ("https://site.org/a?utm_source=x&utm_medium=y", "https://site.org/a"),
    ("https://site.org/a?fbclid=z", "https://site.org/a"),
    # non-tracking params survive in order, tracking stripped anywhere
    ("https://site.org/a?utm_source=x&q=1&page=2&ref=rss",
     "https://site.org/a?q=1&page=2"),
    ("https://site.org/a?q=1&gclid=g&page=2",
     "https://site.org/a?q=1&page=2"),
    # slash before query stripped too
    ("http://www.site.org/a/?q=1", "https://site.org/a?q=1"),
]


def test_canonicalize_url_contract(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [r["c"] for r in
           df.select(canonicalize_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in CASES]


def test_url_variant_groups(spark):
    rows = [
        (1, "http://www.site.org/p?utm_source=a"),
        (2, "https://site.org/p/"),
        (3, "https://site.org/p?q=1"),   # different resource (kept param)
        (4, "https://other.org/p"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["canonical_url"]: (r["n_variants"], r["first_doc"])
           for r in url_variant_groups(df).collect()}
    assert out["https://site.org/p"] == (2, 1)
    assert out["https://site.org/p?q=1"] == (1, 3)
    assert out["https://other.org/p"] == (1, 4)

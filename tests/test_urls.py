"""URL canonicalization: the Catalyst expression must equal its python twin
on every input (seeded + fuzz, one vectorized pass), the normalizations must
collapse the classic re-crawl spellings without conflating distinct
resources, and url_dedup_marks must keep exactly one row per canonical URL."""

from pyspark.sql import functions as F

from pulsar_replay_spark.functions.urls import (
    canonical_url,
    canonical_url_py,
    url_dedup_marks,
)


def test_canonical_url_matches_python_twin(spark):
    import random

    seeds = [
        "HTTPS://WWW.Ex.COM.:443/a/b?utm_source=x&b=2&a=1#frag",
        "http://h:80/", "http://h:8080", "http://u:p@H.example/x",
        "https://h/?gclid=1", "https://h/?z=1&a=2&", "https://h/p?&&",
        "http://h", "http://h/", "http://h#f", "http://h?", "http://h?#",
        " https://pad.example/x ", "\thttp://tab.example\n", "/rel",
        "http://h/x\xa0", "\u2028https://h/p", "http://a\r@h/x",
        "http://h\r.example/", "\rhttp://cr.example/",
        "mailto:a@b", "ftp://x", "", "https://", "http:///nohost",
        "http://@/", "https://dots...:8443/p", "httpsx://not-a-scheme/x",
        "http://a@b@c/x", "http://h/?utm_campaign=1&UTM_SOURCE=2&keep=3",
        "http://h/path?a=2&a=1", "HtTp://MiXed.CaSe/QueryCase?B=1&b=2",
    ]
    rng = random.Random(11)
    alphabet = "aB.:/@?#&=_-% \t\n\r\xa0\u2028https"
    fuzz = [
        "http://" + "".join(rng.choice(alphabet) for _ in range(rng.randrange(24)))
        for _ in range(300)
    ]
    urls = seeds + fuzz
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["c"]
        for r in df.select("url", canonical_url(F.col("url")).alias("c")).collect()
    }
    for u in urls:
        assert got[u] == canonical_url_py(u), repr(u)


def test_canonical_url_collapses_recrawl_spellings(spark):
    """The classic same-resource spellings land on ONE canonical form;
    genuinely different resources stay distinct."""
    same = [
        "https://www.shop.example/item?id=7",
        "HTTPS://WWW.SHOP.EXAMPLE/item?id=7",
        "https://www.shop.example:443/item?id=7",
        "https://www.shop.example/item?id=7#reviews",
        "https://www.shop.example/item?utm_source=mail&id=7",
        "https://www.shop.example/item?id=7&utm_campaign=x&fbclid=abc",
    ]
    outs = {canonical_url_py(u) for u in same}
    assert outs == {"https://www.shop.example/item?id=7"}

    distinct = [
        "https://www.shop.example/item?id=8",      # different value
        "http://www.shop.example/item?id=7",       # different scheme
        "https://shop.example/item?id=7",          # different host
        "https://www.shop.example/item/?id=7",     # different path
        "https://www.shop.example:8443/item?id=7", # non-default port
    ]
    assert len({canonical_url_py(u) for u in distinct} | outs) == len(distinct) + 1


def test_url_dedup_marks_keeps_one_per_canonical(spark):
    rows = [
        (1, "https://a.example/p?utm_source=x"),
        (2, "HTTPS://A.EXAMPLE/p"),                 # same canonical as 1
        (3, "https://a.example/p#frag"),            # same canonical as 1
        (4, "https://a.example/q"),                 # distinct
        (5, "files/local.txt"),                     # no URL: keeps
        (6, None),                                  # NULL source: keeps
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    marks = {r["doc_id"]: r for r in url_dedup_marks(docs).collect()}
    assert marks[1]["keep"] and not marks[2]["keep"] and not marks[3]["keep"]
    assert marks[4]["keep"] and marks[5]["keep"] and marks[6]["keep"]
    assert marks[2]["canonical_url"] == "https://a.example/p"
    assert marks[5]["canonical_url"] is None

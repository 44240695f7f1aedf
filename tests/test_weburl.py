"""URL canonicalization + URL-level dedup (fonduer_spark/functions/weburl.py)."""

from pyspark.sql import functions as F

from fonduer_spark.functions.weburl import canon_url, dedup_urls


CASES = [
    # (raw, canonical)
    ("https://Example.COM/a/b", "https://example.com/a/b"),
    ("HTTPS://www.example.com/a/b", "https://example.com/a/b"),
    ("https://example.com:443/a/b", "https://example.com/a/b"),
    ("http://example.com:80/a/b", "http://example.com/a/b"),
    ("http://example.com:8080/a/b", "http://example.com:8080/a/b"),
    ("https://example.com/a/b/", "https://example.com/a/b"),
    ("https://example.com/a/b///", "https://example.com/a/b"),
    ("https://example.com/", "https://example.com"),
    ("https://example.com/a?b=2&a=1", "https://example.com/a?a=1&b=2"),
    ("https://example.com/a?a=1&utm_source=x&b=2",
     "https://example.com/a?a=1&b=2"),
    ("https://example.com/a?utm_campaign=x&gclid=1&fbclid=2&ref=h",
     "https://example.com/a"),
    ("https://example.com/a#frag", "https://example.com/a"),
    ("https://example.com/a?x=1#frag", "https://example.com/a?x=1"),
    # ref= is tracking; a param merely CONTAINING ref is not
    ("https://example.com/a?href=1", "https://example.com/a?href=1"),
    # no scheme: pass through except fragment
    ("example.com/a#f", "example.com/a"),
]


def test_canon_url_rules(spark):
    df = spark.createDataFrame([(i, raw) for i, (raw, _) in enumerate(CASES)],
                               "i long, url string")
    got = {r.i: r.c for r in
           df.select("i", canon_url(F.col("url")).alias("c")).collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_dedup_urls_elects_min_id(spark):
    pages = spark.createDataFrame(
        [(1, "https://Example.COM/x?b=2&a=1"),
         (2, "https://www.example.com/x/?a=1&b=2&utm_source=s"),
         (3, "https://example.com:443/x?a=1&b=2#frag"),
         (9, "https://example.com/other")],
        "doc_id long, url string")
    rows = {r.doc_id: r for r in dedup_urls(pages).collect()}
    assert rows[1].canonical_id == 1 and rows[1].kept == 1
    assert rows[2].canonical_id == 1 and rows[2].kept == 0
    assert rows[3].canonical_id == 1 and rows[3].kept == 0
    assert rows[9].canonical_id == 9 and rows[9].kept == 1
    assert rows[2].canon_url == "https://example.com/x?a=1&b=2"


def test_latest_snapshot_keeps_newest_and_counts(spark):
    import datetime as dt

    from fonduer_spark.functions.weburl import latest_snapshot

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        ("u1", t0, "old"),
        ("u1", t0 + dt.timedelta(days=1), "new"),
        ("u2", t0, "only"),
        ("u3", t0, "tie-a"),
        ("u3", t0, "tie-b"),  # exact-ts tie: struct order -> larger payload
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, payload string")
    got = {r.url: (r.payload, r.n_versions)
           for r in latest_snapshot(df).collect()}
    assert got == {"u1": ("new", 2), "u2": ("only", 1), "u3": ("tie-b", 2)}

"""URL canonicalization + URL-level dedup for web corpora.

The input table of a Common-Crawl-style pipeline keys pages by ``url``;
the first dedup a crawl runs is URL-level — the same page fetched under
scheme/host case variants, default ports, ``www.`` prefixes, tracking
query params, fragment anchors, param order permutations, and trailing
slashes. ``canon_url`` folds all of those as ONE pure column expression
(whole-stage codegen, no Python), and ``dedup_urls`` elects a canonical
page per canonical URL.

Every regex is written to the Java-regex/RE2-identical subset (the
text_pii discipline), so the whole operator is reproducible in DuckDB SQL
and the driver oracle hash-checks it.

Canonicalization rules (each cited against the de-facto crawl practice of
the reference's Common-Crawl-style inputs; cf. RFC 3986 §6 normalization):

- scheme and host lowercase; ``www.`` host prefix dropped;
- default ports dropped (``:80`` for http, ``:443`` for https);
- fragment (``#...``) dropped;
- tracking params dropped (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``,
  ``ref``); remaining query params sorted bytewise; empty query dropped;
- trailing slashes stripped from the path (root becomes the bare host).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one alternation, anchored — identical semantics under Java regex and RE2
TRACKING_PARAM_RGX = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)="
_SCHEME_RGX = "^([A-Za-z][A-Za-z0-9+.-]*)://"


def canon_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL as a single column
    expression. URLs without a ``scheme://`` prefix pass through with only
    fragment stripping (relative links are out of scope for page-level
    dedup)."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RGX, 1))
    rest = F.regexp_replace(url, _SCHEME_RGX, "")
    hostport = F.lower(F.regexp_extract(rest, "^([^/?#]*)", 1))
    host = F.when(
        scheme == "http", F.regexp_replace(hostport, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(hostport, ":443$", "")
    ).otherwise(hostport)
    host = F.regexp_replace(host, "^www\\.", "")
    path = F.regexp_replace(
        F.regexp_extract(rest, "^[^/?#]*([^?#]*)", 1), "/+$", "")
    query = F.regexp_extract(rest, "[?]([^#]*)", 1)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0)
        & ~p.rlike(TRACKING_PARAM_RGX),
    ))
    qcanon = F.when(F.size(params) > 0,
                    F.concat(F.lit("?"), F.array_join(params, "&"))
                    ).otherwise(F.lit(""))
    return F.when(
        scheme == "", F.regexp_replace(url, "#.*$", "")
    ).otherwise(F.concat(scheme, F.lit("://"), host, path, qcanon))


def dedup_urls(
    pages: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """URL-level dedup: canonicalize, then elect the minimum-id page per
    canonical URL. Returns one row per input page:
    (id, canon_url, canonical_id, kept 0/1).

    Scale shape: canonicalization is a pure projection; the election is
    ONE groupBy on the canonical URL (min-id aggregate, map-side partial)
    joined back on the same key — the join reuses the groupBy's hash
    partitioning, so the plan carries a single exchange of the canonical
    key. No broadcast needed (the group table is O(distinct urls)); AQE
    handles a hot canonical URL.
    """
    canon = pages.select(
        F.col(id_col).alias("_id"),
        canon_url(F.col(url_col)).alias("canon_url"),
    )
    winners = canon.groupBy("canon_url").agg(
        F.min("_id").alias("canonical_id"))
    return (
        canon.join(winners, "canon_url")
        .select(
            F.col("_id").alias(id_col),
            "canon_url",
            "canonical_id",
            F.when(F.col("_id") == F.col("canonical_id"), 1)
            .otherwise(0).cast("int").alias("kept"),
        )
    )


def latest_snapshot(
    pages: DataFrame,
    key: str = "url",
    ts: str = "warc_ts",
) -> DataFrame:
    """Re-crawl dedup: keep the NEWEST crawl snapshot per key — the
    standard first step over a Common-Crawl-style table where the same
    url appears once per crawl with a ``warc_ts``.

    One groupBy with map-side partial aggregation (no window sort over
    the full crawl history): ``max(struct(ts, <other columns>))`` — the
    struct's total order makes recency dominate and the remaining columns
    break exact-``ts`` ties deterministically. Adds ``n_versions`` (crawl
    count per key). At 10^12 rows this is a single shuffle on the key
    with partial maxes combining per partition — strictly cheaper than
    the row_number window equivalent.
    """
    ordered = [ts] + [c for c in pages.columns if c not in (key, ts)]
    g = pages.groupBy(key).agg(
        F.max(F.struct(*[F.col(c).alias(c) for c in ordered])).alias("_b"),
        F.count(F.lit(1)).alias("n_versions"),
    )
    return g.select(
        key,
        *[F.col(f"_b.{c}").alias(c) for c in ordered],
        F.col("n_versions").cast("long").alias("n_versions"),
    )

"""Sources: document preprocessors -> the web_pages input shape.

The reference's DocPreprocessors enumerate local files into Document rows
(/root/reference/src/fonduer/parser/preprocessors/): HTML (one <html> per
file), Text (wrapped in <doc>), CSV (row -> pseudo-HTML), TSV (name\\ttext).
Here each becomes a DataFrame transform producing the canonical
(url, warc_ts, html, text, lang) frame the parse operator consumes — the
input table IS the preprocessor; deterministic ids derive from the url/name
column, not file enumeration order (doc_preprocessor.py:70-80 sorts files
for the same reason).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _finish(df: DataFrame, url_col, html_col, lang: str = "en") -> DataFrame:
    return df.select(
        url_col.alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.encode(html_col, "utf-8").alias("html"),
        F.lit("").alias("text"),
        F.lit(lang).alias("lang"),
    )


def html_docs(spark: SparkSession, path: str) -> DataFrame:
    """Directory of .html files -> web_pages (html_doc_preprocessor.py:15-39).

    ``wholetext`` text source: one file = one document; the file path is the
    stable url.
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.html")
        .load(path)
        .select("path", "content")
    )
    return raw.select(
        F.col("path").alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit("").alias("text"),
        F.lit("en").alias("lang"),
    )


def text_docs(spark: SparkSession, path: str) -> DataFrame:
    """Plain-text files wrapped in <doc> (text_doc_preprocessor.py:14)."""
    raw = spark.read.option("wholetext", "true").text(path) \
        .withColumn("url", F.input_file_name())
    html = F.concat(F.lit("<doc>"), F.col("value"), F.lit("</doc>"))
    return _finish(raw, F.col("url"), html)


def csv_docs(
    spark: SparkSession, path: str, name_col: str = None, header: bool = True
) -> DataFrame:
    """One CSV row -> one document; columns rendered as <p> paragraphs
    (csv_doc_preprocessor.py:13-107's header-mapping default)."""
    df = spark.read.option("header", str(header).lower()).csv(path)
    cols = df.columns
    # content-derived fallback id: md5 over the concatenated row keeps the
    # url reproducible across runs/partitionings (monotonically_increasing_id
    # is partition-layout-dependent and would destabilize stable_ids and
    # checkpoint-resume signatures)
    name = F.col(name_col) if name_col else F.md5(
        F.concat_ws("\x1f", *[F.coalesce(F.col(c), F.lit("")) for c in cols])
    )
    body = F.concat_ws(
        "", *[F.concat(F.lit("<p>"), F.coalesce(F.col(c), F.lit("")),
                       F.lit("</p>")) for c in cols if c != name_col]
    )
    html = F.concat(F.lit("<html><body>"), body, F.lit("</body></html>"))
    return _finish(df, name, html)


def tsv_docs(spark: SparkSession, path: str) -> DataFrame:
    """TSV lines ``name\\ttext`` -> documents (tsv_doc_preprocessor.py:11-64)."""
    df = (
        spark.read.option("sep", "\t")
        .schema("name string, body string")
        .csv(path)
    )
    html = F.concat(F.lit("<doc>"), F.coalesce(F.col("body"), F.lit("")),
                    F.lit("</doc>"))
    return _finish(df, F.col("name"), html)


def dataframe_docs(df: DataFrame, url_col: str, html_col: str,
                   lang: str = "en") -> DataFrame:
    """Any DataFrame with (url, html-string) columns -> web_pages shape."""
    return _finish(df, F.col(url_col), F.col(html_col), lang)

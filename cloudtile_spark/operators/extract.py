"""Geometry extraction: pages -> features.

The reference's analogue is `ogr2ogr -f FlatGeobuf` format normalization
(reference src/cloudtile/geofile.py:151-163): turn a source blob into a
stream of (geometry, attributes) features. Here the source is the
Common-Crawl-style pages table (url, warc_ts, html, text, lang) and the
geometry lives in geo-microdata inside the html.

Design for 100 TB: the whole extraction is JVM-side column expressions
(decode + regexp_extract + casts) — no Python UDF, so it runs inside
whole-stage codegen and Catalyst prunes `html` out of every downstream plan
that doesn't extract. The per-row invariant (byte-identical `text` per url,
BASELINE.json input_hint) is checked by comparing the html-extracted body to
the `text` column — see tests/test_extract.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# <meta name="geo.position" content="LAT;LON">
# char class admits scientific notation (Spark's double->string uses it for
# tiny magnitudes); string->double cast parses it back round-trip-exactly.
_GEO_RE = r'<meta name="geo\.position" content="([-0-9.eE]+);([-0-9.eE]+)">'
_BODY_RE = r"<p>(.*?)</p>"
_URL_ID_RE = r"/(\d+)$"


def html_str(df_or_col: DataFrame | Column = None) -> Column:
    col = F.col("html") if not isinstance(df_or_col, Column) else df_or_col
    return F.decode(col, "utf-8")


def extract_features(pages: DataFrame) -> DataFrame:
    """pages -> features(url, feature_id, lon, lat, geom_type, props).

    feature_id is parsed from the url tail (stable, shuffle-free); lon/lat
    from the geo.position microdata. Rows without a geo tag are dropped
    (filter pushes to the scan).
    """
    h = html_str()
    lat_s = F.regexp_extract(h, _GEO_RE, 1)
    lon_s = F.regexp_extract(h, _GEO_RE, 2)
    out = (
        pages.select(
            "url", "warc_ts", "lang", "html",
            F.regexp_extract(F.col("url"), _URL_ID_RE, 1).alias("_fid"),
        )
        .withColumn("_lat", lat_s)
        .withColumn("_lon", lon_s)
        .filter((F.col("_lat") != "") & (F.col("_lon") != "") & (F.col("_fid") != ""))
        .select(
            F.col("url"),
            F.col("_fid").cast("long").alias("feature_id"),
            F.col("_lon").cast("double").alias("lon"),
            F.col("_lat").cast("double").alias("lat"),
            F.lit("point").alias("geom_type"),
            F.create_map(
                F.lit("lang"), F.col("lang"),
                F.lit("city"), F.regexp_extract(F.col("url"), r"org/([a-z]+)/", 1),
            ).alias("props"),
        )
    )
    return out


def extracted_text(pages: DataFrame) -> DataFrame:
    """url + body text re-extracted from html — must equal `text` byte-for-byte
    (the reference-parity invariant)."""
    return pages.select(
        "url",
        F.regexp_extract(html_str(), _BODY_RE, 1).alias("extracted_text"),
        "text",
    )

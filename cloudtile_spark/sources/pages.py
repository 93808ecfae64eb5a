"""Deterministic synthetic web-pages table (BASELINE.json input_hint shape):

    pages(url: string, warc_ts: timestamp, html: binary, text: string,
          lang: string)

Replaces the reference's opaque input files (reference
src/cloudtile/geofile.py:129-163 reads geojson/gpkg/parquet blobs) with a
generated-IN-SPARK table: every column is a pure SQL expression over
``spark.range(n)``, so generation is distributed, seed-free-deterministic
(same rows at any parallelism), and scales to any row count without driver
memory. 80% of coordinates cluster in 5 metro hotspots to manufacture the
tile skew the north rule requires us to handle (FIXTURES.md §1).

The geo signal is embedded in the html as standard geo microdata
(``<meta name="geo.position" content="{lat};{lon}">``) and the body text is
recoverable byte-identically — the per-row invariant the extractor must
preserve ("byte-identical extracted text per url").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (name, lon, lat) — 5 metro hotspots (public coordinates)
HOTSPOTS = [
    ("chicago", -87.6298, 41.8781),
    ("lagos", 3.3792, 6.5244),
    ("tokyo", 139.6917, 35.6895),
    ("paris", 2.3522, 48.8566),
    ("saopaulo", -46.6333, -23.5505),
]
LANGS = ["en", "es", "fr", "de", "pt"]

_M = 1 << 32
# Per-salt Weyl-sequence multipliers: frac(sqrt(prime)) scaled to 2^32, made
# odd. Each salt MUST get a different multiplier (not just a different
# offset): same-multiplier sequences are identical up to a tiny shift, which
# catastrophically correlates the "is clustered" coin with the "uniform
# coordinate" draw (all uniform points end up in a narrow band).
_MULTS = [
    int((p ** 0.5 % 1) * _M) | 1
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53)
]


def _u(i_expr: str, salt: int) -> str:
    """Deterministic pseudo-uniform in [0,1) from a bigint SQL expr.

    Pure integer arithmetic -> identical at any parallelism and in DuckDB.
    Valid for inputs < 2^31 (no bigint overflow).
    """
    # divide by a DOUBLE cast, not a decimal literal: Spark parses `x.0`
    # literals as DECIMAL and would do decimal division (truncated scale),
    # while DuckDB uses doubles — cast keeps both engines in float64.
    mult = _MULTS[salt % len(_MULTS)]
    return (
        f"(((({i_expr}) * {mult} + {salt * 40503 + 12345}) % {_M})"
        f" / cast({_M} as double))"
    )


def lon_sql(i: str) -> str:
    """Deterministic longitude for page index ``i`` (SQL, dialect-portable)."""
    metro = f"cast(floor({_u(i, 1)} * 5) as int)"
    lon_c = (
        "case " + " ".join(
            f"when {metro} = {k} then {lon}" for k, (_, lon, _) in enumerate(HOTSPOTS)
        ) + " else 0.0 end"
    )
    clustered = f"({lon_c} + ({_u(i, 2)} - 0.5) * 1.0)"
    uniform = f"(-180.0 + {_u(i, 3)} * 360.0)"
    return f"(case when {_u(i, 0)} < 0.8 then {clustered} else {uniform} end)"


def lat_sql(i: str) -> str:
    metro = f"cast(floor({_u(i, 1)} * 5) as int)"
    lat_c = (
        "case " + " ".join(
            f"when {metro} = {k} then {lat}" for k, (_, _, lat) in enumerate(HOTSPOTS)
        ) + " else 0.0 end"
    )
    clustered = f"({lat_c} + ({_u(i, 4)} - 0.5) * 1.0)"
    uniform = f"(-60.0 + {_u(i, 5)} * 130.0)"
    return f"(case when {_u(i, 0)} < 0.8 then {clustered} else {uniform} end)"


def city_sql(i: str) -> str:
    metro = f"cast(floor({_u(i, 1)} * 5) as int)"
    named = (
        "case " + " ".join(
            f"when {metro} = {k} then '{name}'" for k, (name, _, _) in enumerate(HOTSPOTS)
        ) + " end"
    )
    return f"(case when {_u(i, 0)} < 0.8 then {named} else 'web' end)"


def synth_pages(spark: SparkSession, n: int, partitions: int = 32) -> DataFrame:
    """The pages table, fully distributed, deterministic for a given n."""
    df = spark.range(0, n, 1, partitions).withColumnRenamed("id", "page_id")
    i = "page_id"
    lon = F.expr(lon_sql(i))
    lat = F.expr(lat_sql(i))
    city = F.expr(city_sql(i))
    lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]),
                        (F.col("page_id") % 5 + 1).cast("int"))
    body = F.concat(
        F.lit("Listing "), F.col("page_id").cast("string"),
        F.lit(" near "), city,
        F.lit(" in language "), lang, F.lit("."),
    )
    url = F.concat(
        F.lit("https://example.org/"), city, F.lit("/"),
        F.col("page_id").cast("string"),
    )
    html = F.concat(
        F.lit('<html><head><meta name="geo.position" content="'),
        lat.cast("string"), F.lit(";"), lon.cast("string"),
        F.lit('"></head><body><p>'), body, F.lit("</p></body></html>"),
    )
    return df.select(
        url.alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(secs=F.col("page_id") * 37)).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        body.alias("text"),
        lang.alias("lang"),
        F.col("page_id"),
    )

"""End-to-end: synthetic pages -> extract -> pyramid; golden invariants.

The analogue of the reference's golden-argv tests (reference
tests/test_geofile.py:136-157): we pin observable outputs instead of argv.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cloudtile_spark import tiles
from cloudtile_spark.operators.extract import extract_features, extracted_text
from cloudtile_spark.operators.pyramid import (
    build_pyramid, guess_max_zoom, topk_per_tile, assign_xy, explode_zooms,
    tile_summary,
)
from cloudtile_spark.settings import TilingSettings
from cloudtile_spark.sources.pages import synth_pages

N = 2000


@pytest.fixture(scope="module")
def pages(spark):
    df = synth_pages(spark, N, partitions=8).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def features(pages):
    return extract_features(pages.drop("page_id")).cache()


def test_pages_deterministic_across_parallelism(spark):
    a = synth_pages(spark, 500, partitions=2).orderBy("url").collect()
    b = synth_pages(spark, 500, partitions=16).orderBy("url").collect()
    assert a == b


def test_text_invariant_byte_identical(pages):
    """BASELINE.json input_hint: byte-identical extracted text per url."""
    bad = (
        extracted_text(pages)
        .filter(F.col("extracted_text") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_extract_recovers_all_rows_and_ids(pages, features):
    assert features.count() == N
    # feature_id parsed from url equals the generating page_id
    joined = features.join(pages.select("page_id", "url"), "url")
    assert joined.filter(F.col("feature_id") != F.col("page_id")).count() == 0


def test_extract_lonlat_matches_numpy_tilemath(features):
    """Spark-side tile assignment == NumPy oracle on the same rows."""
    pdf = (
        assign_xy(features.withColumn("z", F.lit(9)))
        .select("feature_id", "lon", "lat", "x", "y")
        .toPandas()
        .sort_values("feature_id")
    )
    ex, ey = tiles.lonlat_to_tile(pdf.lon.values, pdf.lat.values, 9)
    assert np.array_equal(pdf.x.values, ex)
    assert np.array_equal(pdf.y.values, ey)


def test_pyramid_invariants(features):
    t = build_pyramid(features, minz=0, maxz=6).cache()
    rows = t.collect()
    # z0 has exactly one tile holding every feature
    z0 = [r for r in rows if r.z == 0]
    assert len(z0) == 1 and z0[0].feature_count == N
    # counts per zoom sum to N at every zoom (points, no cap hit at this size)
    by_z = {}
    for r in rows:
        by_z[r.z] = by_z.get(r.z, 0) + r.feature_count
    assert all(v == N for v in by_z.values())
    # ids are sorted and count-consistent; checksum present
    for r in rows:
        assert list(r.feature_ids) == sorted(r.feature_ids)
        assert len(r.feature_ids) == r.feature_count
        assert len(r.checksum) == 64
    # monotone refinement: tiles per zoom non-decreasing
    n_tiles = [sum(1 for r in rows if r.z == z) for z in range(7)]
    assert all(a <= b for a, b in zip(n_tiles, n_tiles[1:]))


def test_pyramid_deterministic_across_parallelism(spark):
    outs = []
    for parts in (2, 16):
        f = extract_features(synth_pages(spark, 800, partitions=parts))
        t = build_pyramid(f, minz=0, maxz=5)
        outs.append(sorted(map(tuple, t.select("z", "x", "y", "feature_count", "checksum").collect())))
    assert outs[0] == outs[1]


def test_feature_cap_enforced(features):
    s = TilingSettings()
    s["maximum-tile-features"] = 50
    t = build_pyramid(features, settings=s, minz=0, maxz=2)
    top = t.agg(F.max("feature_count")).collect()[0][0]
    assert top == 50
    # cap keeps the LOWEST feature_ids (deterministic priority)
    z0 = t.filter("z = 0").collect()[0]
    assert list(z0.feature_ids) == sorted(z0.feature_ids)
    assert max(z0.feature_ids) < N  # sanity


def test_topk_salted_equals_plain_window(spark, features):
    df = assign_xy(explode_zooms(features, 0, 3))
    salted = topk_per_tile(df, 20, salt_buckets=8)
    plain = topk_per_tile(df, 20, salt_buckets=1)
    a = sorted(map(tuple, salted.select("z", "x", "y", "feature_id").collect()))
    b = sorted(map(tuple, plain.select("z", "x", "y", "feature_id").collect()))
    assert a == b
    # salt=256 (wider than any tile here) also identical — the parallelism-
    # derived default (salt_buckets_for) can never change results
    wide = topk_per_tile(df, 20, salt_buckets=256)
    c = sorted(map(tuple, wide.select("z", "x", "y", "feature_id").collect()))
    assert a == c


def test_salt_buckets_scale_with_parallelism(spark, features):
    from cloudtile_spark.operators.pyramid import (
        DEFAULT_SALT_BUCKETS, capped_tile_summary, salt_buckets_for,
    )
    n = salt_buckets_for(features)
    par = spark.sparkContext.defaultParallelism
    assert n == max(DEFAULT_SALT_BUCKETS, min(4096, 2 * par))
    assert salt_buckets_for(features, 7) == 7  # explicit override wins
    # capped summary output is salt-invariant: explicit 8 vs 256 vs default
    df = assign_xy(explode_zooms(features, 0, 2))
    outs = [
        sorted(map(tuple, capped_tile_summary(df, 20, salt_buckets=sb)
                   .select("z", "x", "y", "feature_count", "checksum")
                   .collect()))
        for sb in (8, 256, None)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_guess_max_zoom(features):
    zg = guess_max_zoom(features, cap=100)
    assert 0 < zg <= 14
    # at zg the densest tile is under cap; at zg-1 it is not
    for z, ok in ((zg, True), (zg - 1, False)):
        m = (
            assign_xy(features.withColumn("z", F.lit(z)))
            .groupBy("z", "x", "y").count()
            .agg(F.max("count")).collect()[0][0]
        )
        assert (m <= 100) == ok


def test_missing_zooms_raise_typeerror(features):
    with pytest.raises(TypeError):
        build_pyramid(features)


def test_capped_summary_equals_window_path(spark, features):
    """Aggregation-only capped summary == window top-k + summary (the two
    physical strategies must agree bit-for-bit)."""
    from cloudtile_spark.operators.pyramid import capped_tile_summary

    df = assign_xy(explode_zooms(features, 0, 4))
    agg = capped_tile_summary(df, 30)
    win = tile_summary(topk_per_tile(df, 30))
    a = sorted(map(tuple, agg.select("z", "x", "y", "feature_count", "checksum").collect()))
    b = sorted(map(tuple, win.select("z", "x", "y", "feature_count", "checksum").collect()))
    assert a == b


def test_coalesce_union_merge_conserves_features(features):
    """coalesce-densest-as-needed MERGES sacrificed features (the reference's
    active default) — nothing is dropped: per tile, sum(multiplicity) equals
    the pre-cap feature count, survivors number <= cap, every survivor is a
    kept feature, and bboxes cover the absorbed members."""
    from cloudtile_spark.operators.pyramid import coalesce_densest_summary

    cap = 25
    out = coalesce_densest_summary(features, z=3, cap=cap)
    per_tile = out.groupBy("x", "y").agg(
        F.sum("multiplicity").alias("total"),
        F.count("*").alias("survivors"),
    ).collect()
    pre = {(r.x, r.y): r["count"] for r in
           assign_xy(features.withColumn("z", F.lit(3)))
           .groupBy("x", "y").count().collect()}
    assert per_tile
    for r in per_tile:
        assert r.total == pre[(r.x, r.y)]  # conservation
        assert r.survivors <= cap
    # a tile over the cap must show a multiplicity > 1 somewhere
    over = [k for k, v in pre.items() if v > cap]
    if over:
        m = out.filter(
            (F.col("x") == over[0][0]) & (F.col("y") == over[0][1])
        ).agg(F.max("multiplicity")).collect()[0][0]
        assert m > 1
    # bbox union is a real union: survivor rows with multiplicity>1 span
    # at least as wide as any single point (w <= e, s <= n always)
    bad = out.filter("bbox_w > bbox_e OR bbox_s > bbox_n").count()
    assert bad == 0


def test_extend_zooms_while_dropping(features):
    from cloudtile_spark.operators.pyramid import extend_zooms_while_dropping

    # with a tiny cap, z3 still drops -> extended beyond
    z = extend_zooms_while_dropping(features, cap=20, minz=0, maxz=3)
    assert z > 3
    # huge cap: nothing drops at maxz -> unchanged
    z2 = extend_zooms_while_dropping(features, cap=10**6, minz=0, maxz=3)
    assert z2 == 3


def test_extend_zooms_drop_strategy_feedback(features):
    """B17 drop feedback (round-2 verdict #6): the extension decision must
    see POST-strategy density. With a cluster distance so coarse that each
    tile collapses to ~1 cluster, no zoom 'still drops' — the chosen max
    zoom is LOWER than the raw-density answer at the same cap."""
    from cloudtile_spark.operators.pyramid import extend_zooms_while_dropping

    raw = extend_zooms_while_dropping(features, cap=20, minz=0, maxz=3)
    assert raw > 3

    s = TilingSettings()
    # 64-px snap at zoom z: a 256-px tile holds <= 16 clusters < cap=20
    s["cluster-distance"] = 64
    clustered = extend_zooms_while_dropping(
        features, cap=20, minz=0, maxz=3, settings=s)
    assert clustered == 3 < raw

    # gamma thinning: sqrt retention per pixel bucket lowers effective
    # density, so the extension stops at or before the raw answer — and
    # with a cap the thinned density still exceeds at maxz, it extends
    s2 = TilingSettings()
    s2["gamma"] = 2
    thinned = extend_zooms_while_dropping(
        features, cap=20, minz=0, maxz=3, settings=s2)
    assert 3 <= thinned <= raw


def test_geojson_reader_roundtrip(spark, tmp_path):
    import json as _json
    from cloudtile_spark.sources.readers import load_features

    p = tmp_path / "pts.geojson"
    with open(p, "w") as f:
        for i in range(50):
            f.write(_json.dumps({
                "type": "Feature", "id": i,
                "geometry": {"type": "Point",
                             "coordinates": [i * 0.5 - 10, i * 0.3 - 5]},
                "properties": {"name": f"p{i}"},
            }) + "\n")
    df = load_features(spark, str(p))
    rows = {r.feature_id: (r.lon, r.lat, r.props["name"])
            for r in df.collect()}
    assert len(rows) == 50
    assert rows[4] == (4 * 0.5 - 10, 4 * 0.3 - 5, "p4")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        load_features(spark, "something.shapefile")  # reference negative case


def test_gpkg_reader(spark, tmp_path):
    """Build a minimal real GeoPackage with stdlib sqlite3 (GP-header +
    standard WKB blobs) and read it back through the suffix dispatcher."""
    import sqlite3
    import struct

    from cloudtile_spark import geom as g
    from cloudtile_spark.sources.readers import load_features

    p = str(tmp_path / "pts.gpkg")
    con = sqlite3.connect(p)
    con.executescript("""
        CREATE TABLE gpkg_contents (table_name TEXT, data_type TEXT);
        CREATE TABLE gpkg_geometry_columns (table_name TEXT, column_name TEXT);
        INSERT INTO gpkg_contents VALUES ('pts', 'features');
        INSERT INTO gpkg_geometry_columns VALUES ('pts', 'geom');
        CREATE TABLE pts (fid INTEGER PRIMARY KEY, geom BLOB);
    """)
    coords = [(i, -100.0 + i * 3.5, -40.0 + i * 2.25) for i in range(30)]
    for fid, lon, lat in coords:
        # GP header: magic, version 0, flags=0b00000001 (little-endian, no
        # envelope), srs_id 4326; then plain WKB point
        blob = struct.pack("<2sBBi", b"GP", 0, 0b00000001, 4326) \
            + g.wkb_point(lon, lat)
        con.execute("INSERT INTO pts VALUES (?, ?)", (fid, blob))
    con.commit()
    con.close()

    df = load_features(spark, p)
    got = sorted((r.feature_id, r.lon, r.lat) for r in df.collect())
    assert got == coords


def test_csv_reader_and_empty_columns_option(spark, tmp_path):
    from cloudtile_spark.sources.readers import load_features, read_csv_points

    p = tmp_path / "pts.csv"
    p.write_text(
        "feature_id,lon,lat,name,cls\n"
        "1,10.5,20.25,alpha,road\n"
        "2,-30.0,5.0,,rail\n"
        "3,1.0,2.0,gamma,\n"
    )
    df = load_features(spark, str(p))
    rows = {r.feature_id: r for r in df.collect()}
    assert len(rows) == 3 and rows[1].lon == 10.5
    # empty-csv-columns-are-null default: '' entries dropped from props
    assert dict(rows[2].props) == {"cls": "rail"}
    assert dict(rows[3].props) == {"name": "gamma"}
    # option off: empty strings preserved as attributes
    df2 = read_csv_points(spark, str(p), empty_columns_are_null=False)
    r2 = {r.feature_id: r for r in df2.collect()}
    assert dict(r2[2].props) == {"name": "", "cls": "rail"}
    # missing required column fails loudly
    bad = tmp_path / "bad.csv"
    bad.write_text("id,x,y\n1,0,0\n")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        read_csv_points(spark, str(bad))


def test_projection_guard(spark, features):
    from cloudtile_spark.operators import mvt
    from cloudtile_spark.settings import TilingSettings

    # point path: 3857 now ACCEPTED (reprojected, see
    # test_projection_3857_point_pipeline); unknown codes still raise
    s = TilingSettings()
    s["projection"] = "EPSG:2154"
    with pytest.raises(NotImplementedError):
        mvt.encode_point_tiles(features, 0, 0, settings=s)
    s["projection"] = "epsg:4326"  # accepted
    assert mvt.encode_point_tiles(features, 0, 0, settings=s).count() == 1
    # WKB geometry path keeps the loud 4326-only guard
    import numpy as np
    from cloudtile_spark import geom as _geom
    gdf = spark.createDataFrame(
        [(1, "linestring", bytearray(_geom.wkb_linestring(
            np.array([[0.0, 0.0], [1.0, 1.0]]))))],
        "feature_id long, geom_type string, geom_wkb binary")
    s2 = TilingSettings()
    s2["projection"] = "EPSG:3857"
    with pytest.raises(NotImplementedError):
        mvt.encode_geom_tiles(gdf, 0, 0, s2)


def test_projection_3857_point_pipeline(spark, features):
    """EPSG:3857 input (tippecanoe projection): forward-project the feature
    table to mercator meters, declare projection=EPSG:3857, and the pyramid
    must equal the 4326 run exactly; unknown projections still fail loudly;
    the WKB geometry path stays 4326-only."""
    from cloudtile_spark import tiles as _tiles

    s = TilingSettings()
    base = sorted(map(tuple, build_pyramid(features, settings=s, minz=0,
                                           maxz=4, with_ids=False)
                      .select("z", "x", "y", "feature_count").collect()))

    merc = features.selectExpr(
        "feature_id",
        f"{_tiles.lon_to_merc_sql('lon')} AS lon",
        f"{_tiles.lat_to_merc_sql('lat')} AS lat",
    )
    s2 = TilingSettings()
    s2["projection"] = "EPSG:3857"
    got = sorted(map(tuple, build_pyramid(merc, settings=s2, minz=0,
                                          maxz=4, with_ids=False)
                     .select("z", "x", "y", "feature_count").collect()))
    assert got == base

    s3 = TilingSettings()
    s3["projection"] = "EPSG:2154"
    with pytest.raises(NotImplementedError):
        build_pyramid(merc, settings=s3, minz=0, maxz=2).count()


def test_orc_reader_roundtrip_matches_parquet(spark, tmp_path):
    """ORC joins the suffix dispatch: writing the same feature frame to
    .orc and .parquet and reading both back through load_features must
    give identical rows — format breadth with no semantic drift."""
    from cloudtile_spark.sources.readers import load_features

    feats = spark.range(100).selectExpr(
        "id AS feature_id",
        "cast(-120 + id * 0.37 as double) AS lon",
        "cast(-40 + (id % 80) as double) AS lat")
    orc_dir = str(tmp_path / "f.orc")
    pq_dir = str(tmp_path / "f.parquet")
    feats.write.orc(orc_dir)
    feats.write.parquet(pq_dir)
    a = {tuple(r) for r in load_features(spark, orc_dir).collect()}
    b = {tuple(r) for r in load_features(spark, pq_dir).collect()}
    assert a == b and len(a) == 100

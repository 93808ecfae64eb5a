"""feature-filter expression language tests (tippecanoe yaml:47-48 —
Mapbox GL legacy filter JSON -> Catalyst predicate)."""

import json

import pytest
from pyspark.sql import functions as F

from cloudtile_spark.operators.filters import (
    apply_feature_filter, compile_feature_filter,
)
from cloudtile_spark.settings import TilingSettings


@pytest.fixture()
def feats(spark):
    rows = [
        # feature_id, lon, lat, geom_type, props
        (1, 10.0, 1.0, "point", {"lang": "en", "area": "120"}),
        (2, 20.0, 2.0, "point", {"lang": "fr", "area": "80"}),
        (3, 30.0, 3.0, "linestring", {"lang": "en"}),  # no area key
        (4, 40.0, 4.0, "point", {"lang": "de", "area": "200"}),
    ]
    return spark.createDataFrame(
        rows, "feature_id long, lon double, lat double, geom_type string, "
              "props map<string,string>")


def _ids(df):
    return sorted(r.feature_id for r in df.collect())


def test_eq_and_numeric_compare(feats):
    c = compile_feature_filter(["==", "lang", "en"], feats.columns)
    assert _ids(feats.filter(c)) == [1, 3]
    # numeric literal compares numerically though props values are strings
    c = compile_feature_filter([">=", "area", 100], feats.columns)
    assert _ids(feats.filter(c)) == [1, 4]


def test_missing_key_semantics(feats):
    # == on a missing key is FALSE; != and !in are TRUE (legacy spec)
    c = compile_feature_filter(["==", "area", 120], feats.columns)
    assert 3 not in _ids(feats.filter(c))
    c = compile_feature_filter(["!=", "area", 120], feats.columns)
    got = _ids(feats.filter(c))
    assert 3 in got and 1 not in got
    c = compile_feature_filter(["!in", "area", 120, 200], feats.columns)
    assert _ids(feats.filter(c)) == [2, 3]


def test_combinators_and_type(feats):
    spec = ["all", ["==", "$type", "Point"], ["in", "lang", "en", "fr"]]
    c = compile_feature_filter(spec, feats.columns)
    assert _ids(feats.filter(c)) == [1, 2]
    c = compile_feature_filter(
        ["any", ["==", "lang", "de"], ["==", "$type", "LineString"]],
        feats.columns)
    assert _ids(feats.filter(c)) == [3, 4]
    c = compile_feature_filter(
        ["none", ["==", "lang", "en"]], feats.columns)
    assert _ids(feats.filter(c)) == [2, 4]


def test_has_and_layer_dict_and_json_string(feats):
    c = compile_feature_filter(["has", "area"], feats.columns)
    assert _ids(feats.filter(c)) == [1, 2, 4]
    c = compile_feature_filter(["!has", "area"], feats.columns)
    assert _ids(feats.filter(c)) == [3]
    # {layer: filter} dict and JSON-string forms
    c = compile_feature_filter(
        {"features": ["==", "lang", "fr"]}, feats.columns)
    assert _ids(feats.filter(c)) == [2]
    c = compile_feature_filter(
        json.dumps(["==", "lang", "fr"]), feats.columns)
    assert _ids(feats.filter(c)) == [2]


def test_invalid_specs_raise(feats):
    with pytest.raises(ValueError):
        compile_feature_filter(["regex", "lang", ".*"], feats.columns)
    with pytest.raises(ValueError):
        compile_feature_filter(["==", "nope", 1], ["lon", "lat"])
    with pytest.raises(ValueError):
        compile_feature_filter({"other_layer": ["has", "x"], "two": []},
                               feats.columns)


def test_settings_wiring_and_filter_file(feats, tmp_path):
    s = TilingSettings()
    s["feature-filter"] = ["==", "lang", "en"]
    assert _ids(apply_feature_filter(feats, s)) == [1, 3]
    # feature-filter-file variant
    p = tmp_path / "filter.json"
    p.write_text(json.dumps(["==", "lang", "fr"]))
    s2 = TilingSettings()
    s2["feature-filter-file"] = str(p)
    assert _ids(apply_feature_filter(feats, s2)) == [2]
    # no-op when neither key set
    assert _ids(apply_feature_filter(feats, TilingSettings())) == [1, 2, 3, 4]


def test_encode_point_tiles_honors_filter(spark, feats):
    from cloudtile_spark.operators import mvt

    s = TilingSettings()
    s["feature-filter"] = ["in", "lang", "en"]
    r = mvt.encode_point_tiles(feats.drop("geom_type"), 0, 0,
                               settings=s).collect()[0]
    dec = mvt.decode_tile(bytes(r.mvt))
    assert sorted(f["id"] for f in dec["features"]) == [1, 3]


def test_prefilter_and_postfilter_with_zoom(spark, feats):
    from cloudtile_spark.operators import mvt

    s = TilingSettings()
    s["prefilter"] = ["in", "lang", "en", "fr"]
    # $zoom gating: features only appear at z >= 2
    s["postfilter"] = [">=", "$zoom", 2]
    tiles_df = mvt.encode_point_tiles(feats.drop("geom_type"), 0, 3,
                                      settings=s)
    by_z = {r.z: r.n for r in tiles_df.groupBy("z").agg(
        F.sum("feature_count").alias("n")).collect()}
    assert set(by_z) == {2, 3}          # z0/z1 filtered by $zoom
    assert by_z[2] == 3 and by_z[3] == 3  # en+fr features only (ids 1,2,3)


def test_filter_pushes_to_scan(spark, feats, tmp_path):
    # the compiled predicate must reach the parquet scan (PushedFilters)
    p = str(tmp_path / "f.parquet")
    feats.select("feature_id", "lon", "lat", "geom_type").write.parquet(p)
    df = spark.read.parquet(p)
    c = compile_feature_filter([">", "lon", 15], df.columns)
    plan = df.filter(c)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThan(lon" in plan


def test_geometry_type_literal_only_folds_for_dollar_type(spark):
    # regression (round-2 ADVICE): an ORDINARY attribute whose value happens
    # to be "Point" must compare verbatim — _typed used to lowercase the
    # literal for every key, so ["==","name","Point"] compiled to
    # name == 'point' and matched nothing / the wrong rows.
    rows = [
        (1, "point", {"name": "Point"}),       # verbatim "Point"
        (2, "point", {"name": "point"}),       # lowercase value
        (3, "linestring", {"name": "Point"}),
    ]
    df = spark.createDataFrame(
        rows, "feature_id long, geom_type string, props map<string,string>")
    c = compile_feature_filter(["==", "name", "Point"], df.columns)
    assert _ids(df.filter(c)) == [1, 3]
    c = compile_feature_filter(["==", "name", "point"], df.columns)
    assert _ids(df.filter(c)) == [2]
    # $type still case-folds (engine stores geom_type lowercase)
    c = compile_feature_filter(["==", "$type", "Point"], df.columns)
    assert _ids(df.filter(c)) == [1, 2]
    # and the in/!in path folds $type values too
    c = compile_feature_filter(["in", "$type", "Point", "Polygon"], df.columns)
    assert _ids(df.filter(c)) == [1, 2]
    c = compile_feature_filter(["in", "name", "Point"], df.columns)
    assert _ids(df.filter(c)) == [1, 3]

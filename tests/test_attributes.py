"""attribute-type casts + accumulate-attribute merge rules
(tippecanoe yaml:39-41 -> operators/attributes.py)."""

import pytest

from cloudtile_spark.operators.attributes import (
    accumulate_attributes, apply_attribute_types,
)
from cloudtile_spark.settings import TilingSettings


@pytest.fixture()
def feats(spark):
    rows = [
        (1, 0, {"score": "2.5", "tag": "a", "n": "10"}),
        (2, 0, {"score": "1.5", "tag": "b", "n": "30"}),
        (3, 1, {"score": "4.0", "tag": "c", "n": "5"}),
    ]
    return spark.createDataFrame(
        rows, "feature_id long, grp int, props map<string,string>")


def test_attribute_type_casts(feats):
    s = TilingSettings()
    s["attribute-type"] = {"score": "float", "n": "int"}
    out = apply_attribute_types(feats, s)
    types = dict(out.dtypes)
    assert types["score"] == "double" and types["n"] == "bigint"
    r = {x.feature_id: x for x in out.collect()}
    assert r[1].score == 2.5 and r[2].n == 30


def test_attribute_type_invalid(feats):
    s = TilingSettings()
    s["attribute-type"] = {"score": "complex"}
    with pytest.raises(ValueError):
        apply_attribute_types(feats, s)


def test_accumulate_numeric_and_concat(feats):
    s = TilingSettings()
    s["attribute-type"] = {"score": "float", "n": "int"}
    s["accumulate-attribute"] = {
        "score": "sum", "n": "max", "tag": "comma"}
    out = {r.grp: r for r in
           accumulate_attributes(feats, s, ["grp"]).collect()}
    g0 = out[0]
    assert g0.representative == 1 and g0.merged_n == 2
    assert g0.score == 4.0 and g0.n == 30
    assert g0.tag == "a,b"  # feature_id order, deterministic
    g1 = out[1]
    assert g1.merged_n == 1 and g1.tag == "c"


def test_accumulate_mean_min_and_plain_concat(feats):
    s = TilingSettings()
    s["attribute-type"] = {"score": "float"}
    s["accumulate-attribute"] = {"score": "mean", "tag": "concat"}
    g0 = {r.grp: r for r in
          accumulate_attributes(feats, s, ["grp"]).collect()}[0]
    assert g0.score == 2.0 and g0.tag == "ab"
    s2 = TilingSettings()
    s2["attribute-type"] = {"score": "float"}
    s2["accumulate-attribute"] = {"score": "min"}
    g0 = {r.grp: r for r in
          accumulate_attributes(feats, s2, ["grp"]).collect()}[0]
    assert g0.score == 1.5


def test_accumulate_invalid_rule(feats):
    s = TilingSettings()
    s["accumulate-attribute"] = {"tag": "median"}
    with pytest.raises(ValueError):
        accumulate_attributes(feats, s, ["grp"]).collect()

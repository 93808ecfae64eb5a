"""Settings-driven attribute transforms: ``attribute-type`` casts and
``accumulate-attribute`` merge rules (reference src/cloudtile/
tippecanoe.yaml:39-41).

tippecanoe semantics re-expressed on the DataFrame plan:

* ``attribute-type`` {attr: int|float|bool|string} — coerce the (string)
  props value to a typed column at extract time, so downstream filters,
  ordering, and accumulation operate on real types. Pure Catalyst casts.
* ``accumulate-attribute`` {attr: sum|mean|max|min|concat|comma} — when
  features merge (cluster / coalesce / cap-sacrifice), the survivors
  accumulate the attribute over their group. Numeric rules are plain
  aggregates (map-side combinable — the 100 TB path); ``concat``/``comma``
  join the values in deterministic feature_id order via
  sort_array(collect_list(struct)) so output is stable at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TYPE_MAP = {
    "int": "bigint",
    "float": "double",
    "bool": "boolean",
    "string": "string",
}

_NUMERIC_RULES = {"sum", "mean", "max", "min"}
_CONCAT_RULES = {"concat", "comma"}


def apply_attribute_types(features: DataFrame, settings) -> DataFrame:
    """Materialize settings["attribute-type"] casts as typed top-level
    columns (attr name = column name), sourced from props[attr] unless a
    top-level column already exists."""
    spec = settings.get("attribute-type") or {}
    out = features
    for attr, typ in spec.items():
        if typ not in _TYPE_MAP:
            raise ValueError(
                f"attribute-type {typ!r} for {attr!r}; "
                f"expected one of {sorted(_TYPE_MAP)}")
        src = (F.col(attr) if attr in features.columns
               else F.col("props").getItem(attr))
        out = out.withColumn(attr, src.cast(_TYPE_MAP[typ]))
    return out


def _acc_expr(attr: str, rule: str, order_col: str) -> Column:
    if rule == "sum":
        return F.sum(attr).alias(attr)
    if rule == "mean":
        return F.avg(attr).alias(attr)
    if rule == "max":
        return F.max(attr).alias(attr)
    if rule == "min":
        return F.min(attr).alias(attr)
    if rule in _CONCAT_RULES:
        sep = "," if rule == "comma" else ""
        return F.array_join(
            F.expr(f"transform(sort_array(collect_list(struct("
                   f"{order_col} as _o, {attr} as _v))), s -> s._v)"),
            sep,
        ).alias(attr)
    raise ValueError(
        f"accumulate-attribute rule {rule!r} for {attr!r}; expected one of "
        f"{sorted(_NUMERIC_RULES | _CONCAT_RULES)}")


def accumulate_attributes(
    features: DataFrame,
    settings,
    group_cols: list[str],
    order_col: str = "feature_id",
) -> DataFrame:
    """Merge features per ``group_cols``, accumulating every attribute
    named in settings["accumulate-attribute"] by its rule; the group's
    representative is the min-``order_col`` member and ``merged_n`` counts
    the multiplicity (tippecanoe's cluster/coalesce accounting)."""
    spec = settings.get("accumulate-attribute") or {}
    features = apply_attribute_types(features, settings)
    # accumulated attrs without an attribute-type come from props as-is
    for attr in spec:
        if attr not in features.columns:
            features = features.withColumn(
                attr, F.col("props").getItem(attr))
    aggs = [
        F.min(order_col).alias("representative"),
        F.count("*").alias("merged_n"),
    ]
    for attr, rule in spec.items():
        aggs.append(_acc_expr(attr, rule, order_col))
    return features.groupBy(*group_cols).agg(*aggs)

"""tippecanoe ``feature-filter`` expression language -> Catalyst Column.

The reference exposes the settings keys ``feature-filter`` /
``feature-filter-file`` (reference src/cloudtile/tippecanoe.yaml:47-48),
whose value is a Mapbox GL *legacy filter* JSON expression (the public
syntax tippecanoe's -j flag documents):

    ["all", ["==", "class", "street"], [">=", "area", 100]]
    {"layername": ["any", ["in", "lang", "en", "fr"]]}

Supported operator set (the tippecanoe-documented subset):
``== != < <= > >= in !in has !has all any none``, plus the ``$type``
pseudo-key. The compiler emits a pure Catalyst boolean Column — the filter
participates in predicate pushdown / column pruning like any hand-written
``df.filter``; no Python executes per row.

Missing-key semantics follow the legacy-filter spec: ``==``/``<``/… on an
absent attribute are FALSE, while ``!=`` / ``!in`` / ``!has`` are TRUE.
"""

from __future__ import annotations

import json
from typing import Any, Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

_COMPARISONS = {"==", "!=", "<", "<=", ">", ">="}
_COMBINATORS = {"all", "any", "none"}


def _attr(key: str, columns: Iterable[str]) -> Column:
    """Attribute reference: top-level column if present, else props[key].
    ``$type`` maps to the geom_type column (case-folded: tippecanoe uses
    "Point"/"LineString"/"Polygon", the engine stores lowercase)."""
    cols = set(columns)
    if key == "$type":
        if "geom_type" not in cols:
            raise ValueError("$type filter needs a geom_type column")
        return F.lower(F.col("geom_type"))
    if key == "$zoom":
        # tippecanoe exposes the current zoom to -j filters; valid on the
        # post-explode frame (postfilter), where z exists
        if "z" not in cols:
            raise ValueError("$zoom filter needs a zoom column (postfilter)")
        return F.col("z")
    if key in cols:
        return F.col(key)
    if "props" in cols:
        return F.col("props").getItem(key)
    raise ValueError(f"feature-filter references unknown attribute {key!r}")


def _typed(attr: Column, value: Any, key: str = "") -> tuple[Column, Column]:
    """Coerce the attribute to the literal's type: numeric literals compare
    numerically even though props map values are strings. Geometry-type
    literals are case-folded ONLY for the ``$type`` pseudo-key (the engine
    stores geom_type lowercase); an ordinary attribute whose value happens
    to be "Point" must compare verbatim."""
    if isinstance(value, bool):
        return attr.cast("boolean"), F.lit(value)
    if isinstance(value, (int, float)):
        return attr.cast("double"), F.lit(float(value))
    if key == "$type":
        return attr, F.lit(str(value).lower())
    return attr, F.lit(value)


def compile_feature_filter(
    spec: Any, columns: Iterable[str], layer: str = "features"
) -> Column:
    """Parse a feature-filter spec (JSON string, expression list, or
    {layer: expression} dict) into a boolean Column over ``columns``."""
    if isinstance(spec, str):
        spec = json.loads(spec)
    if isinstance(spec, dict):
        if layer in spec:
            spec = spec[layer]
        elif len(spec) == 1:
            spec = next(iter(spec.values()))
        else:
            raise ValueError(
                f"feature-filter dict has no entry for layer {layer!r}")
    return _compile(spec, list(columns))


def _compile(expr: Any, columns: list[str]) -> Column:
    if not isinstance(expr, (list, tuple)) or not expr:
        raise ValueError(f"invalid feature-filter expression: {expr!r}")
    op, *args = expr
    if op in _COMBINATORS:
        subs = [_compile(a, columns) for a in args]
        if not subs:
            # vacuous truth: ["all"] is true, ["any"] false, ["none"] true
            return F.lit(op != "any")
        acc = subs[0]
        for s in subs[1:]:
            acc = (acc & s) if op == "all" else (acc | s)
        if op == "none":
            return ~F.coalesce(acc, F.lit(False))
        return acc
    if op in _COMPARISONS:
        key, value = args
        attr, lit = _typed(_attr(key, columns), value, key)
        if op == "==":
            return attr == lit
        if op == "!=":
            # legacy semantics: missing attribute satisfies !=
            return F.coalesce(attr != lit, F.lit(True))
        if op == "<":
            return attr < lit
        if op == "<=":
            return attr <= lit
        if op == ">":
            return attr > lit
        return attr >= lit
    if op in ("in", "!in"):
        key, *values = args
        attr = _attr(key, columns)
        if values and isinstance(values[0], (int, float)) \
                and not isinstance(values[0], bool):
            attr = attr.cast("double")
            values = [float(v) for v in values]
        elif key == "$type":
            values = [str(v).lower() for v in values]
        hit = attr.isin(values)
        if op == "in":
            return hit
        return F.coalesce(~hit, F.lit(True))
    if op in ("has", "!has"):
        (key,) = args
        cols = set(columns)
        if key in cols:
            present = F.col(key).isNotNull()
        elif "props" in cols:
            present = F.col("props").getItem(key).isNotNull()
        else:
            present = F.lit(False)
        return present if op == "has" else ~present
    raise ValueError(f"unsupported feature-filter operator {op!r}")


def apply_feature_filter(features, settings, layer: str = "features"):
    """Apply settings-driven filtering (feature-filter / feature-filter-file)
    to a feature DataFrame; no-op when neither key is set."""
    spec = settings.get("feature-filter")
    if not spec and settings.get("feature-filter-file"):
        with open(settings["feature-filter-file"]) as f:
            spec = json.load(f)
    if not spec:
        return features
    return features.filter(
        compile_feature_filter(spec, features.columns, layer))

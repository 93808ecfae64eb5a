"""Operators: extraction, tile pyramid, spatial joins, dedup, similarity,
text analysis, raster bridge, MVT sink."""

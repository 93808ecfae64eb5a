"""cloudtile_spark — a from-scratch PySpark-native tiling + spatial-join engine.

Re-expresses the observable semantics of mansueto-institute/cloudtile
(`/root/reference`, which orchestrates ogr2ogr + tippecanoe subprocesses;
see reference src/cloudtile/geofile.py:151-163, 224-234) as an idiomatic
Spark DataFrame pipeline:

- tile math (lon/lat -> z/x/y, quadkey, morton/hilbert) as pure column
  expressions (JVM-side, whole-stage codegen) — `cloudtile_spark.tiles`
- hierarchical cell index (S2/H3-style quadtree cells) — `cloudtile_spark.cells`
- geometry kernels (WKB, point-in-polygon, clipping, simplification,
  rasterize) as vectorized NumPy inside Arrow-batched pandas UDFs —
  `cloudtile_spark.geom`
- tile-pyramid build with tippecanoe-equivalent settings (feature caps,
  density coalesce, simplification) — `cloudtile_spark.operators.pyramid`
- spatial joins (point-in-polygon, kNN) — `cloudtile_spark.operators.joins`
- web-scale text ops (dedup, minhash-LSH, simhash, lang-id, quality,
  fingerprint) — `cloudtile_spark.operators` / `cloudtile_spark.functions`
- per-partition lineage + checkpoint-resume — `cloudtile_spark.plans.lineage`

Everything is DataFrame-first: Catalyst handles pushdown/pruning/AQE; Python
touches data only through Arrow batches.
"""

__version__ = "0.1.0"

"""filda_spark — a from-scratch, PySpark-native spatial-join + tiling engine.

Reimplements the query/data-processing capabilities of the reference
fire-light-detection pipeline (GEOS-ESM/FILDA, studied at /root/reference)
as an idiomatic Spark DataFrame engine:

- ``sources``    : interleaved text+media ``documents`` table (Iceberg-style
                   snapshot/manifest layer on parquet), media block sidecar,
                   span-sequence invariants.
- ``operators``  : decode (mapInPandas Arrow kernels), candidate selection
                   (pure DataFrame algebra + broadcast joins), contextual
                   background tests (cogrouped applyInPandas), FRP, fire
                   parameters, Planck-mixture fitting, enrichment joins,
                   kNN dedup over a cell-neighborhood shuffle, rasterization,
                   text dedup family (exact / MinHash-LSH / SimHash / n-gram
                   Jaccard), embedding similarity search.
- ``functions``  : scalar/column function library (physics, bit packing,
                   text metrics, vector math) — JVM-side column expressions
                   wherever possible, Arrow-vectorized pandas UDFs otherwise.
- ``grids``      : the five grid systems of the reference (Plate-Carrée
                   tiles, sinusoidal tiles, regular lat/lon grids, I/M pixel
                   arithmetic) plus a from-scratch hierarchical cell index
                   (H3/S2-style, pure column expressions) with kRing.
- ``plans``      : pipeline orchestration + per-partition lineage/metrics
                   checkpointing for exact resume.
- ``streaming``  : checkpointed incremental batch over table snapshots.

No code is copied from the reference; semantics are reimplemented from its
published formulas (file:line citations in each docstring).
"""

__version__ = "0.1.0"

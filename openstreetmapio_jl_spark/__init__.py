"""openstreetmapio_jl_spark — a from-scratch, PySpark-native spatial-join + tiling engine.

Re-expresses the capabilities of moviro-hub/OpenStreetMapIO.jl (reference at
/root/reference, read-only) on Spark's execution model:

- OSM PBF/XML decode as block-parallel ``mapInArrow`` kernels over a blob-descriptor
  DataFrame (reference: sequential single-thread loop, ``src/load_pbf.jl:47-87``).
- Callback filtering (reference ``src/load_pbf.jl:596-605``) as vectorized Catalyst
  predicates with optional pushdown into the decode kernel.
- Cell indexing (S2 / XYZ / hex), point-in-polygon cell joins, expanding cell-ring kNN,
  raster<->vector tiling, dedup/similarity/text operators for web-scale pipelines.

Nothing here is a port: the reference is consulted only for *semantics* (decode rules,
data model, test oracle), cited by file:line in docstrings.
"""

__version__ = "0.1.0"

from openstreetmapio_jl_spark.session import get_spark  # noqa: F401

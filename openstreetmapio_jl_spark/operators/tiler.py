"""XYZ raster↔vector tiler.

Vector→raster: points binned into z/x/y tiles and 256×256 in-tile pixels, counts
aggregated per pixel (sparse representation — dense tiles at planet scale would be
256KB each; sparse keeps shuffle volume proportional to occupied pixels).

Raster→vector: tiles (or pixels) back to bbox rings compatible with the PIP join's
polygon format.

Pyramid rollup: child→parent tile aggregation is pure integer arithmetic
(x>>1, y>>1), a map-side-combinable groupBy per level — the classic tile-pyramid
build, shuffle volume halves every level.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openstreetmapio_jl_spark.functions.cells import MERCATOR_LAT_LIMIT, tile_bounds
from openstreetmapio_jl_spark.operators.spatial_join import _tile_of, _tile_row_of

TILE_PX = 256


def rasterize_points(
    points: DataFrame,
    z: int,
    *,
    lat_col: str = "lat",
    lon_col: str = "lon",
    value_col: str | None = None,
    px: int = TILE_PX,
) -> DataFrame:
    """→ (z, x, y, pixel_x, pixel_y, n[, sum_value]) sparse raster."""
    lat = F.greatest(
        F.least(F.col(lat_col), F.lit(MERCATOR_LAT_LIMIT)), F.lit(-MERCATOR_LAT_LIMIT)
    )
    lon = F.col(lon_col)
    n = float(1 << z)
    fx = (lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n)
    rad = F.radians(lat)
    fy = (
        (F.lit(1.0) - F.log(F.tan(rad) + F.lit(1.0) / F.cos(rad)) / F.lit(math.pi))
        / F.lit(2.0)
        * F.lit(n)
    )
    x = F.least(F.floor(fx).cast("long"), F.lit((1 << z) - 1))
    y = F.least(F.floor(fy).cast("long"), F.lit((1 << z) - 1))
    pixel_x = F.least(F.floor((fx - x) * px).cast("int"), F.lit(px - 1))
    pixel_y = F.least(F.floor((fy - y) * px).cast("int"), F.lit(px - 1))
    base = points.select(
        F.lit(z).alias("z"),
        x.alias("x"),
        y.alias("y"),
        pixel_x.alias("pixel_x"),
        pixel_y.alias("pixel_y"),
        *( [F.col(value_col).alias("_v")] if value_col else [] ),
    )
    aggs = [F.count("*").alias("n")]
    if value_col:
        aggs.append(F.sum("_v").alias("sum_value"))
    return base.groupBy("z", "x", "y", "pixel_x", "pixel_y").agg(*aggs)


def tile_counts(points: DataFrame, z: int, *, lat_col="lat", lon_col="lon") -> DataFrame:
    """Tile-level aggregation (no pixels): (z, x, y, n)."""
    return (
        points.select(
            F.lit(z).alias("z"),
            _tile_of(F.col(lon_col), z).alias("x"),
            _tile_row_of(F.col(lat_col), z).alias("y"),
        )
        .groupBy("z", "x", "y")
        .count()
        .withColumnRenamed("count", "n")
    )


def pyramid_rollup(tile_df: DataFrame, from_z: int, to_z: int) -> DataFrame:
    """Aggregate tile counts up the pyramid: returns UNION of all levels
    [to_z, from_z]. Each step is a map-side-combinable groupBy on (x>>1, y>>1)."""
    assert to_z <= from_z
    levels = [tile_df]
    cur = tile_df
    for z in range(from_z, to_z, -1):
        cur = (
            cur.select(
                F.lit(z - 1).alias("z"),
                (F.col("x") / 2).cast("long").alias("x"),
                (F.col("y") / 2).cast("long").alias("y"),
                "n",
            )
            .groupBy("z", "x", "y")
            .agg(F.sum("n").alias("n"))
        )
        levels.append(cur)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def vectorize_tiles(tile_df: DataFrame) -> DataFrame:
    """Raster→vector: each (z,x,y) becomes a closed bbox ring in the polygon
    format consumed by the PIP join (edges + bbox columns)."""
    n = F.pow(F.lit(2.0), F.col("z"))
    west = F.col("x") / n * 360.0 - 180.0
    east = (F.col("x") + 1) / n * 360.0 - 180.0
    north = F.degrees(F.atan(F.sinh(F.lit(math.pi) * (1 - 2 * F.col("y") / n))))
    south = F.degrees(F.atan(F.sinh(F.lit(math.pi) * (1 - 2 * (F.col("y") + 1) / n))))
    ring = F.array(
        F.struct(south.alias("lat"), west.alias("lon")),
        F.struct(south.alias("lat"), east.alias("lon")),
        F.struct(north.alias("lat"), east.alias("lon")),
        F.struct(north.alias("lat"), west.alias("lon")),
        F.struct(south.alias("lat"), west.alias("lon")),
    )
    return tile_df.withColumn("ring", ring)


def tile_bounds_py(x: int, y: int, z: int):
    """Python twin (tests): (south, west, north, east)."""
    return tile_bounds(x, y, z)

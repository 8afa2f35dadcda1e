"""Cell-keyed spatial joins: polygon assembly, tile cover, PIP join, salting.

This is the engine's centerpiece (BASELINE.json north_star): geocoded points (web
pages) are joined against OSM polygons via a **cell-keyed equi-join** (XYZ tile keys
— Catalyst-native, SQL-expressible) with an exact ray-cast **point-in-polygon
post-filter** evaluated as a higher-order-function expression (whole-stage codegen —
zero Python in the join path).

Scale design:
- polygons carry their edge arrays; the tile-cover explode keys each polygon into
  every tile its bbox touches — candidate pairs are bounded by tile granularity;
- small polygon sides broadcast (``broadcast=True`` or Spark's auto threshold);
  planet-scale sides shuffle on the tile key;
- hot cells (dense urban tiles) get explicit **salting** (:func:`salted_join`) —
  AQE skew-split can divide a skewed *partition* but not a single hot *key*;
  salting can (SURVEY.md §4).

The reference never joins (SURVEY.md §2 Table B); its member/refs resolution
semantics (``test/test_load_pbf.jl:698-725``) define the explode→join→reassemble
pattern used by :func:`assemble_polygon_rings`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openstreetmapio_jl_spark.functions import geo
from openstreetmapio_jl_spark.functions.cells import MERCATOR_LAT_LIMIT, xyz_tile_key_col

import math


# ---------------------------------------------------------------------------
# polygon assembly
# ---------------------------------------------------------------------------

def assemble_polygon_rings(
    ways: DataFrame, nodes: DataFrame | None = None, *, broadcast_nodes: bool = False
) -> DataFrame:
    """Closed ways → (id, tags, ring ARRAY<STRUCT<lat,lon>>).

    Ways with embedded LocationsOnWays positions use them directly; otherwise the
    ring is materialized by ``posexplode(refs) → join(nodes) → ordered reassembly``
    — the engine's version of the reference's refs→nodes FK resolution
    (``test/test_load_pbf.jl:698-703``).
    """
    closed = ways.filter(
        (F.size("refs") >= 4)
        & (F.element_at("refs", 1) == F.element_at("refs", -1))
    )
    with_pos = closed.filter(F.col("positions").isNotNull()).select(
        "id", "tags", F.col("positions").alias("ring")
    )
    without = closed.filter(F.col("positions").isNull())
    if nodes is None:
        return with_pos
    node_pos = nodes.select(
        F.col("id").alias("ref"), F.col("lat").alias("n_lat"), F.col("lon").alias("n_lon")
    )
    if broadcast_nodes:
        node_pos = F.broadcast(node_pos)
    exploded = without.select(
        "id", "tags", F.size("refs").alias("n_refs"), F.posexplode("refs").alias("seq", "ref")
    )
    resolved = exploded.join(node_pos, "ref", "inner")
    reassembled = (
        resolved.groupBy("id")
        .agg(
            F.first("tags").alias("tags"),
            F.array_sort(
                F.collect_list(F.struct("seq", F.col("n_lat"), F.col("n_lon")))
            ).alias("pts"),
            F.count("*").alias("n_resolved"),
            F.first("n_refs").alias("n_refs"),
        )
        # drop rings with unresolved refs (incomplete extract) — can't PIP safely
        .filter(F.col("n_resolved") == F.col("n_refs"))
        .select(
            "id",
            "tags",
            F.transform(
                "pts",
                lambda p: F.struct(p["n_lat"].alias("lat"), p["n_lon"].alias("lon")),
            ).alias("ring"),
        )
    )
    return with_pos.unionByName(reassembled)


def assemble_multipolygons(
    relations: DataFrame, rings: DataFrame
) -> DataFrame:
    """type=multipolygon relations → (id, tags, edges) where ``edges`` concatenates
    all member rings (outer + inner). Even-odd ray casting over the union of rings
    gives correct inside-with-holes semantics without explicit winding rules.

    Ring-stitching of open member ways is out of scope for v1 (the reference stores
    members raw and defines no stitching semantics either — SURVEY.md §7).
    """
    mp = relations.filter(F.col("tags")["type"] == "multipolygon")
    members = mp.select(
        F.col("id").alias("rel_id"),
        F.col("tags").alias("rel_tags"),
        F.explode("members").alias("m"),
    ).filter(
        (F.col("m.type") == "way") & F.col("m.role").isin("outer", "inner", "")
    )
    joined = members.join(
        rings.select(F.col("id").alias("way_id"), "ring"),
        members["m.ref"] == F.col("way_id"),
        "inner",
    )
    return (
        joined.withColumn("ring_edges", geo.ring_to_edges_col(F.col("ring")))
        .groupBy("rel_id")
        .agg(
            F.first("rel_tags").alias("tags"),
            F.flatten(F.collect_list("ring_edges")).alias("edges"),
            F.flatten(F.collect_list(F.transform("ring", lambda p: p["lat"]))).alias("_lats"),
            F.flatten(F.collect_list(F.transform("ring", lambda p: p["lon"]))).alias("_lons"),
        )
        .select(
            F.col("rel_id").alias("id"),
            "tags",
            "edges",
            F.array_min("_lats").alias("min_lat"),
            F.array_max("_lats").alias("max_lat"),
            F.array_min("_lons").alias("min_lon"),
            F.array_max("_lons").alias("max_lon"),
        )
    )


def polygons_with_edges(rings: DataFrame) -> DataFrame:
    """(id, tags, ring) → + edges array + bbox columns (join-ready polygon side)."""
    return rings.select(
        "id",
        "tags",
        geo.ring_to_edges_col(F.col("ring")).alias("edges"),
        *geo.bbox_cols_of_ring(F.col("ring")),
    )


# ---------------------------------------------------------------------------
# tile cover
# ---------------------------------------------------------------------------

def _tile_of(lon: Column, z: int) -> Column:
    n = float(1 << z)
    return F.greatest(
        F.least(
            F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n)).cast("long"),
            F.lit((1 << z) - 1),
        ),
        F.lit(0),
    )


def _tile_row_of(lat: Column, z: int) -> Column:
    n = float(1 << z)
    lat_c = F.greatest(
        F.least(lat, F.lit(MERCATOR_LAT_LIMIT)), F.lit(-MERCATOR_LAT_LIMIT)
    )
    rad = F.radians(lat_c)
    return F.greatest(
        F.least(
            F.floor(
                (F.lit(1.0) - F.log(F.tan(rad) + F.lit(1.0) / F.cos(rad)) / F.lit(math.pi))
                / F.lit(2.0)
                * F.lit(n)
            ).cast("long"),
            F.lit((1 << z) - 1),
        ),
        F.lit(0),
    )


def tile_key(x: Column, y: Column, z: int) -> Column:
    return (
        F.lit(z).cast("long") * F.lit(1 << 58).cast("long")
        + x * F.lit(1 << 29).cast("long")
        + y
    )


def tile_cover_bbox(
    min_lat: Column, max_lat: Column, min_lon: Column, max_lon: Column, z: int
) -> Column:
    """ARRAY<BIGINT> of tile keys covering a bbox — pure Catalyst
    (sequence × sequence, flattened). Polygon-side explode key.

    Antimeridian: a raw lon span > 180° is interpreted as a crosser (e.g. a ring
    spanning 179.9E..179.9W) and covered by TWO x-ranges instead of wrapping the
    whole world — without this, one such polygon explodes into every x at the
    zoom level (observed: 49k tiles at z13)."""
    n = 1 << z
    y0 = _tile_row_of(max_lat, z)  # north edge → smaller row
    y1 = _tile_row_of(min_lat, z)
    x_lo = _tile_of(min_lon, z)
    x_hi = _tile_of(max_lon, z)
    crosses = (max_lon - min_lon) > F.lit(180.0)
    xs = F.when(
        crosses,
        F.concat(F.sequence(x_hi, F.lit(n - 1)), F.sequence(F.lit(0), x_lo)),
    ).otherwise(F.sequence(x_lo, x_hi))
    return F.flatten(
        F.transform(
            xs,
            lambda xx: F.transform(F.sequence(y0, y1), lambda yy: tile_key(xx, yy, z)),
        )
    )


# ---------------------------------------------------------------------------
# the PIP join
# ---------------------------------------------------------------------------

def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    *,
    zoom: int = 13,
    lat_col: str = "lat",
    lon_col: str = "lon",
    broadcast: bool = False,
    nsalt: int = 0,
) -> DataFrame:
    """points × polygons → rows where the point lies inside the polygon.

    ``polygons`` needs (id, edges, min_lat, max_lat, min_lon, max_lon) — from
    :func:`polygons_with_edges` or :func:`assemble_multipolygons`.

    Plan shape: polygon side exploded on tile cover (small ×cover_factor), point
    side keyed by its single tile → hash equi-join on ``tile`` (broadcast when
    requested) → exact ray cast as an ``aggregate`` HOF in codegen. A point maps
    to exactly one tile and a polygon covers each tile once, so no post-dedup is
    needed. ``nsalt > 0`` splits hot tiles across ``nsalt`` sub-keys.
    """
    lat = F.col(lat_col)
    lon = F.col(lon_col)
    # NARROW polygon side through the tile shuffle: (polygon_id, bbox, tile).
    # Edge arrays never ride the tile-cover explode or the equi-join exchange —
    # shipping them per (tile × candidate point) materializes O(candidates ×
    # ring_size) doubles through the shuffle (observed 34 GB at sf0.1 before this
    # split). They are re-attached by polygon_id only for bbox-surviving pairs.
    poly_narrow = polygons.select(
        F.col("id").alias("polygon_id"),
        "min_lat",
        "max_lat",
        "min_lon",
        "max_lon",
    ).withColumn(
        "tile",
        F.explode(
            tile_cover_bbox(
                F.col("min_lat"), F.col("max_lat"), F.col("min_lon"), F.col("max_lon"), z=zoom
            )
        ),
    )
    pts = points.withColumn("tile", xyz_tile_key_col(lat, lon, zoom))

    if nsalt > 0:
        # point side: deterministic pseudo-random salt; polygon side: explode all
        pts = pts.withColumn(
            "_salt", F.pmod(F.hash(lat, lon), F.lit(nsalt)).cast("int")
        )
        poly_narrow = poly_narrow.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(nsalt - 1)))
        )
        join_keys = ["tile", "_salt"]
    else:
        join_keys = ["tile"]

    poly_side = F.broadcast(poly_narrow) if broadcast else poly_narrow
    cand = pts.join(poly_side, join_keys, "inner").filter(
        lat.between(F.col("min_lat"), F.col("max_lat"))
        & lon.between(F.col("min_lon"), F.col("max_lon"))
    )
    payload = polygons.select(
        F.col("id").alias("polygon_id"),
        "edges",
        *[c for c in polygons.columns if c not in ("id", "edges", "min_lat", "max_lat", "min_lon", "max_lon")],
    )
    payload_side = F.broadcast(payload) if broadcast else payload
    hit = cand.join(payload_side, "polygon_id", "inner").filter(
        geo.pip_crossings_col(lat, lon, F.col("edges"))
    )
    drop = ["tile", "edges", "min_lat", "max_lat", "min_lon", "max_lon"]
    if nsalt > 0:
        drop.append("_salt")
    return hit.drop(*drop)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    nsalt: int,
    *,
    how: str = "inner",
) -> DataFrame:
    """Generic hot-key salting: ``big`` rows get ``pmod(hash(<all cols>), n)``;
    ``small`` explodes the full salt range. Correctness: every (big,small) key pair
    meets in exactly one (key, salt) bucket."""
    b = big.withColumn("_salt", F.pmod(F.hash(*big.columns), F.lit(nsalt)).cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(nsalt - 1)))
    )
    return b.join(s, [key, "_salt"], how).drop("_salt")

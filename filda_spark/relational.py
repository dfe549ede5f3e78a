"""Relational operator registry: every SQL-expressible operator from
SURVEY.md §2, implemented as an idiomatic Spark DataFrame query over the
driver's test tables, paired with the equivalent DuckDB oracle SQL.

Each entry maps a reference operator (file:line cited) onto the TPC-H-ish
tables so the driver can verify row-count + schema + value-hash parity.
Float columns are rounded to a fixed precision with identical formulas on
both engines; aggregate/computed columns share aliases exactly.

Plan-quality conventions (the 100 TB posture):
- dimension joins are broadcast() explicitly;
- window/group keys are the natural high-cardinality keys (no driver-side
  collect anywhere);
- sorted-prefix aggregations use window row_number + partition counts, not
  approximate percentiles (the reference semantics are exact).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from filda_spark.functions import physics
from filda_spark.functions.bits import pack_bits, pack_bits_sql, reverse_bits


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _h60(col: str):
    """60-bit non-negative BIGINT from md5 — the cross-engine hash every
    sketch/sample op keys on. Spark twin of the SQL idiom
    ``CAST(concat('0x', substr(md5(CAST(x AS VARCHAR)), 1, 15)) AS BIGINT)``
    (see ``_MD5_60``): both take the first 15 hex chars (60 bits, so the
    value fits a signed BIGINT with the sign bit clear on both engines).
    Single-sourced here — widening the hash means editing this pair only.
    """
    return F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


# ---------------------------------------------------------------------------
# §2.2 projections / filters / predicates
# ---------------------------------------------------------------------------


@register(
    "candidate_filter",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity >= 30 AND l_discount >= 0.05
      AND (l_returnflag = 'R' OR l_tax >= 0.06)
    """,
    doc="M-band candidate conjunction/disjunction predicate (FILDA.py:194-199)",
)
def candidate_filter(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") >= 30)
        & (F.col("l_discount") >= 0.05)
        & ((F.col("l_returnflag") == "R") | (F.col("l_tax") >= 0.06))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@register(
    "saa_rect_flag",
    """
    SELECT c_custkey,
           CAST(CASE WHEN lat <= 7 AND lat >= -55 AND lon >= -110 AND lon <= 20
                THEN 1 ELSE 0 END AS INT) AS saa_flag
    FROM (SELECT c_custkey,
                 CAST(c_custkey * 37 % 150 - 60 AS DOUBLE) + 0.5 AS lat,
                 CAST(c_custkey * 73 % 360 - 180 AS DOUBLE) + 0.5 AS lon
          FROM customer)
    """,
    doc="SAA point-in-rectangle flag, bbox [7,-55,-110,20] (FILDA_IO.py:430-437)",
)
def saa_rect_flag(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    lat = (F.col("c_custkey") * 37 % 150 - 60).cast("double") + F.lit(0.5)
    lon = (F.col("c_custkey") * 73 % 360 - 180).cast("double") + F.lit(0.5)
    flag = ((lat <= 7) & (lat >= -55) & (lon >= -110) & (lon <= 20)).cast("int")
    return c.select("c_custkey", flag.alias("saa_flag"))


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


@register(
    "broadcast_lookup",
    """
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_extendedprice), 2) AS total_price
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="ancillary gather as broadcast hash join (GEOS-FP lookup, FILDA_Cloud.py:129-156)",
)
def broadcast_lookup(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    sup = F.broadcast(_t(spark, sf_dir, "supplier"))
    nat = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(nat, sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


@register(
    "weighted_resample",
    """
    SELECT l_partkey,
           round(sum(l_quantity * l_extendedprice) / sum(l_quantity), 6) AS w_mean,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_partkey
    """,
    doc="DNB->MOD weighted many-to-one resample join: sum(w*x)/sum(w) (FILDA_Resample.py:44-137)",
)
def weighted_resample(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey").agg(
        F.round(F.sum(F.col("l_quantity") * F.col("l_extendedprice")) / F.sum("l_quantity"), 6).alias("w_mean"),
        F.count("*").alias("n"),
    )


@register(
    "anti_join_background",
    """
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
    """,
    doc="background anti-set: exclude fire/cloud keys (FILDA.py:744-762 -> left_anti)",
)
def anti_join_background(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    fires = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    return li.join(
        F.broadcast(fires), li.l_orderkey == fires.o_orderkey, "left_anti"
    ).select("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------


@register(
    "bottom_pct_threshold",
    """
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS cnt
      FROM lineitem
    )
    SELECT l_returnflag,
           round(avg(l_extendedprice), 6) AS thres_low1pct,
           CAST(count(*) AS BIGINT) AS n_used
    FROM ranked
    WHERE rn <= greatest(CAST(floor(cnt * 0.01) AS BIGINT), 1)
    GROUP BY l_returnflag
    """,
    doc="bottom-1% mean threshold (Polivka DNB rule, FILDA.py:174-190) — exact sorted prefix",
)
def bottom_pct_threshold(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    wc = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("cnt"),
    )
    return (
        ranked.filter(F.col("rn") <= F.greatest(F.floor(F.col("cnt") * 0.01), F.lit(1)))
        .groupBy("l_returnflag")
        .agg(
            F.round(F.avg("l_extendedprice"), 6).alias("thres_low1pct"),
            F.count("*").alias("n_used"),
        )
    )


@register(
    "lowest25_mean",
    """
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             count(*) OVER (PARTITION BY o_orderpriority) AS cnt
      FROM orders
    )
    SELECT o_orderpriority,
           round(avg(o_totalprice), 6) AS bg_mean,
           CAST(count(*) AS BIGINT) AS n_used
    FROM ranked
    WHERE rn <= greatest(CAST(floor(cnt * 0.25) AS BIGINT), 1)
    GROUP BY o_orderpriority
    """,
    doc="FRP background: mean of lowest 25% valid radiances (FILDA.py:1335-1414)",
)
def lowest25_mean(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wc = Window.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("cnt"),
    )
    return (
        ranked.filter(F.col("rn") <= F.greatest(F.floor(F.col("cnt") * 0.25), F.lit(1)))
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.avg("o_totalprice"), 6).alias("bg_mean"),
            F.count("*").alias("n_used"),
        )
    )


@register(
    "exact_median_mad",
    """
    SELECT l_returnflag,
           round(CAST(median(l_extendedprice) AS DOUBLE), 4) AS med,
           round(CAST(mad(l_extendedprice) AS DOUBLE), 4) AS mad,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="exact background median + MAD (FILDA.py:851-868; approximate percentiles disallowed)",
)
def exact_median_mad(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.median("l_extendedprice").alias("_med"), F.count("*").alias("n")
    )
    joined = li.join(F.broadcast(med), "l_returnflag")
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.round(F.median("_med"), 4).alias("med"),
            F.round(F.median(F.abs(F.col("l_extendedprice") - F.col("_med"))), 4).alias("mad"),
            F.first("n").alias("n"),
        )
    )


@register(
    "group_stats_gamma",
    """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(value), 6) AS mean_val,
           round(stddev_samp(value), 6) AS std_val,
           round((1 + sqrt(1 + 4 * (ln(avg(value)) - avg(ln(value))) / 3))
                 / (4 * (ln(avg(value)) - avg(ln(value)))), 6) AS gamma_alpha,
           round(avg(value) / ((1 + sqrt(1 + 4 * (ln(avg(value)) - avg(ln(value))) / 3))
                 / (4 * (ln(avg(value)) - avg(ln(value))))), 6) AS gamma_beta
    FROM events
    WHERE value > 0
    GROUP BY user_id
    HAVING count(*) >= 5
    """,
    doc="NTL climatology stats: mean, stddev_samp, gamma MoM alpha/beta (FILDA_NTL.py:226-271)",
)
def group_stats_gamma(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("value") > 0)
    mean = F.avg("value")
    d = F.log(mean) - F.avg(F.log("value"))
    alpha = (F.lit(1) + F.sqrt(F.lit(1) + F.lit(4) * d / F.lit(3))) / (F.lit(4) * d)
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(mean, 6).alias("mean_val"),
            F.round(F.stddev_samp("value"), 6).alias("std_val"),
            F.round(alpha, 6).alias("gamma_alpha"),
            F.round(mean / alpha, 6).alias("gamma_beta"),
        )
        .filter(F.col("n") >= 5)
    )


@register(
    "block_downsample",
    """
    SELECT CAST(floor(x / 2) AS BIGINT) AS bx,
           CAST(floor(y / 2) AS BIGINT) AS by,
           round(avg(value), 6) AS mean_val,
           CAST(count(*) AS BIGINT) AS n
    FROM (SELECT user_id % 64 AS x,
                 CAST(floor(user_id / 64) AS BIGINT) % 64 AS y,
                 value
          FROM events)
    GROUP BY bx, by
    """,
    doc="2x2 block nanmean downsample I->M (FILDA_BT.py:62-66; FILDA_Cloud.py:24-27)",
)
def block_downsample(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    x = F.col("user_id") % 64
    y = F.floor(F.col("user_id") / 64).cast("long") % 64
    return (
        ev.select(x.alias("x"), y.alias("y"), "value")
        .groupBy(
            F.floor(F.col("x") / 2).alias("bx"),
            F.floor(F.col("y") / 2).alias("by"),
        )
        .agg(F.round(F.avg("value"), 6).alias("mean_val"), F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# §2.5 / §2.6 windows, dedup, set ops, stencil
# ---------------------------------------------------------------------------


@register(
    "window_host_count",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(count(*) OVER (PARTITION BY l_orderkey) AS BIGINT) AS n_sib
    FROM lineitem
    """,
    doc="FP_Num_Fire: I-detections per hosting M pixel via window count (FILDA.py:1487-1497)",
)
def window_host_count(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    return li.select("l_orderkey", "l_linenumber", F.count("*").over(w).alias("n_sib"))


@register(
    "keep_first_dedup",
    """
    SELECT l_orderkey, l_linenumber, l_partkey
    FROM (SELECT l_orderkey, l_linenumber, l_partkey,
                 row_number() OVER (PARTITION BY l_orderkey
                                    ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
          FROM lineitem)
    WHERE rn = 1
    """,
    doc="keep-first-unique per M pixel (np.unique return_index, FILDA.py:1905-1912)",
)
def keep_first_dedup(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey", "l_suppkey")
    return (
        li.select("l_orderkey", "l_linenumber", "l_partkey", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "union_candidates_dedup",
    """
    SELECT DISTINCT l_orderkey, l_linenumber FROM (
      SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity >= 45
      UNION ALL
      SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_extendedprice >= 80000
    )
    """,
    doc="candidate-set union + dedup (M ∪ vis ∪ thermal ∪ absolute; FILDA.py:395-398,491-497)",
)
def union_candidates_dedup(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 45).select("l_orderkey", "l_linenumber")
    b = li.filter(F.col("l_extendedprice") >= 80000).select("l_orderkey", "l_linenumber")
    return a.unionByName(b).dropDuplicates(["l_orderkey", "l_linenumber"])


@register(
    "stencil_adjacency",
    """
    WITH cells AS (
      SELECT user_id % 30 AS x,
             CAST(floor(user_id / 30) AS BIGINT) % 30 AS y,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks
      FROM events GROUP BY 1, 2
    )
    SELECT a.x AS x, a.y AS y, CAST(sum(b.clicks) AS BIGINT) AS neighbor_clicks
    FROM cells a JOIN cells b
      ON abs(a.x - b.x) <= 1 AND abs(a.y - b.y) <= 1
     AND NOT (a.x = b.x AND a.y = b.y)
    GROUP BY a.x, a.y
    """,
    doc="3x3 adjacency counts via 8-offset stencil self-join (FILDA.py:2179-2254)",
)
def stencil_adjacency(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    cells = (
        ev.select(
            (F.col("user_id") % 30).alias("x"),
            (F.floor(F.col("user_id") / 30).cast("long") % 30).alias("y"),
            "event_type",
        )
        .groupBy("x", "y")
        .agg(F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("clicks"))
    )
    offsets = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
                if not (dx == 0 and dy == 0)
            ]
        )
    ).alias("o")
    # each cell contributes its clicks to its 8 neighbors: equi-join, no range join
    contrib = cells.select("x", "y", "clicks", offsets).select(
        (F.col("x") + F.col("o.dx")).alias("x"),
        (F.col("y") + F.col("o.dy")).alias("y"),
        "clicks",
    )
    return (
        contrib.join(cells.select("x", "y"), ["x", "y"])
        .groupBy("x", "y")
        .agg(F.sum("clicks").alias("neighbor_clicks"))
    )


@register(
    "cell_knn_count",
    """
    WITH pts AS (
      SELECT c_custkey,
             CAST(c_custkey * 37 % 300 AS DOUBLE) / 10.0 - 15.0 AS lat,
             CAST(c_custkey * 73 % 720 AS DOUBLE) / 10.0 - 36.0 AS lon
      FROM customer
    ), cells AS (
      SELECT c_custkey, lat, lon,
             CAST(floor(lat) AS BIGINT) AS cy, CAST(floor(lon) AS BIGINT) AS cx
      FROM pts
    )
    SELECT a.c_custkey AS c_custkey, CAST(count(*) AS BIGINT) AS n_neighbors
    FROM cells a JOIN cells b
      ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
     AND a.c_custkey <> b.c_custkey
     AND (a.lat - b.lat) * (a.lat - b.lat) + (a.lon - b.lon) * (a.lon - b.lon) <= 1.0
    GROUP BY a.c_custkey
    """,
    doc="kNN over cell-neighborhood shuffle: kRing duplicate -> per-cell radius join (north rule / SURVEY §2.5)",
)
def cell_knn_count(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    # 0.1-degree synthetic lattice: dense enough that radius-1 neighbours
    # exist at every sf (the round-2 integer+0.5 lattice provably had zero
    # pairs within distance 1, making the oracle check vacuous)
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") * 37 % 300).cast("double") / 10.0 - 15.0).alias("lat"),
        ((F.col("c_custkey") * 73 % 720).cast("double") / 10.0 - 36.0).alias("lon"),
    )
    cells = pts.select(
        "*", F.floor("lat").alias("cy"), F.floor("lon").alias("cx")
    )
    # cell-neighborhood shuffle: each point is duplicated into its 3x3 kRing,
    # then the pair join is a pure equi-join on the cell key (scales; no
    # quadratic cross join).
    ring = cells.select(
        F.col("c_custkey").alias("b_key"),
        F.col("lat").alias("b_lat"),
        F.col("lon").alias("b_lon"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cx") + F.lit(dx)).alias("cx"),
                        (F.col("cy") + F.lit(dy)).alias("cy"),
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("cell"),
    ).select("b_key", "b_lat", "b_lon", F.col("cell.cx").alias("cx"), F.col("cell.cy").alias("cy"))
    dist2 = (F.col("lat") - F.col("b_lat")) ** 2 + (F.col("lon") - F.col("b_lon")) ** 2
    return (
        cells.join(ring, ["cx", "cy"])
        .filter((F.col("c_custkey") != F.col("b_key")) & (dist2 <= 1.0))
        .groupBy("c_custkey")
        .agg(F.count("*").alias("n_neighbors"))
    )


# geodesic radius join ------------------------------------------------------

RADIUS_KM = 300.0
_R_EARTH_KM = 6371.0088
# cell cover sized for the worst-case latitude in the synthetic domain
# (|lat| <= 54 deg -> cos >= 0.587): 300 km = 2.71 deg lat / 4.61 deg lon,
# so a 3x3 ring of 3 x 5 deg cells over-covers the radius everywhere.
_RJ_CELL_LAT = 3.0
_RJ_CELL_LON = 5.0

# lon kept inside (-175, 175): the cell cover does not wrap the antimeridian,
# and at these latitudes 300 km spans < 5 deg lon, so no true pair straddles
# the +-180 seam either -- cover and haversine agree by construction.
_RJ_SUPP_PTS = """
      SELECT s_suppkey,
             CAST(s_suppkey * 53 % 1080 AS DOUBLE) / 10.0 - 54.0 AS lat,
             CAST(s_suppkey * 97 % 3500 AS DOUBLE) / 10.0 - 175.0 AS lon
      FROM supplier
"""
_RJ_CUST_PTS = """
      SELECT c_custkey,
             CAST(c_custkey * 37 % 1080 AS DOUBLE) / 10.0 - 54.0 AS lat,
             CAST(c_custkey * 73 % 3500 AS DOUBLE) / 10.0 - 175.0 AS lon
      FROM customer
"""


def _haversine_km(lat1, lon1, lat2, lon2):
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return 2 * _R_EARTH_KM * F.asin(F.sqrt(a))


@register(
    "radius_join",
    f"""
    WITH s AS ({_RJ_SUPP_PTS}), c AS ({_RJ_CUST_PTS}),
    pairs AS (
      SELECT s.s_suppkey, c.c_custkey,
             2 * {_R_EARTH_KM} * asin(sqrt(
               sin(radians(c.lat - s.lat) / 2) * sin(radians(c.lat - s.lat) / 2)
               + cos(radians(s.lat)) * cos(radians(c.lat))
                 * sin(radians(c.lon - s.lon) / 2) * sin(radians(c.lon - s.lon) / 2)
             )) AS dist_km
      FROM s CROSS JOIN c
    )
    SELECT s_suppkey, c_custkey, round(dist_km, 3) AS dist_km
    FROM pairs WHERE dist_km <= {RADIUS_KM}
    """,
    doc=(
        "geodesic radius range join: haversine distance <= 300 km via a "
        "latitude-safe cell-cover equi-join + exact refine (the general "
        "distance-threshold spatial join; kNN dedup's sibling — north rule). "
        "Oracle is the semantic ground truth (plain cross join + haversine), "
        "so parity checks the cover itself"
    ),
)
def radius_join(spark, sf_dir):
    """Distance-threshold spatial join. Spark plan: build points on both
    sides, bin the probe side into (cy, cx) cells sized to over-cover the
    radius at the domain's worst-case latitude, explode the build side into
    its 3x3 cell ring, pure equi-join on the cell key, then refine with the
    exact haversine predicate. No theta/range join, no cross join — the same
    cover shape as `pipeline.dedup`, with the ring width chosen statically
    from the radius (dedup's `lon_ring_halfwidth` is the dynamic variant for
    unbounded latitudes). Scales: shuffle is on cell keys; skewed cells ride
    the same salting/AQE path as dedup."""
    s = _t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 53 % 1080).cast("double") / 10.0 - 54.0).alias("s_lat"),
        ((F.col("s_suppkey") * 97 % 3500).cast("double") / 10.0 - 175.0).alias("s_lon"),
    )
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 37 % 1080).cast("double") / 10.0 - 54.0).alias("c_lat"),
        ((F.col("c_custkey") * 73 % 3500).cast("double") / 10.0 - 175.0).alias("c_lon"),
    )
    c_cells = c.select(
        "*",
        F.floor(F.col("c_lat") / _RJ_CELL_LAT).alias("cy"),
        F.floor(F.col("c_lon") / _RJ_CELL_LON).alias("cx"),
    )
    ring = F.explode(
        F.array(
            *[
                F.struct(
                    (F.floor(F.col("s_lat") / _RJ_CELL_LAT) + F.lit(dy)).alias("cy"),
                    (F.floor(F.col("s_lon") / _RJ_CELL_LON) + F.lit(dx)).alias("cx"),
                )
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
            ]
        )
    ).alias("cell")
    s_ring = s.select("s_suppkey", "s_lat", "s_lon", ring).select(
        "s_suppkey", "s_lat", "s_lon", F.col("cell.cy").alias("cy"), F.col("cell.cx").alias("cx")
    )
    dist = _haversine_km(F.col("s_lat"), F.col("s_lon"), F.col("c_lat"), F.col("c_lon"))
    return (
        s_ring.join(c_cells, ["cy", "cx"])
        .withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= RADIUS_KM)
        .select("s_suppkey", "c_custkey", F.round("dist_km", 3).alias("dist_km"))
    )


# temporal interval join --------------------------------------------------

_IJ_W_MS = 8 * 3600 * 1000  # bucket width >= max interval length (8 h)


@register(
    "interval_join",
    f"""
    WITH iv AS (
      SELECT event_id AS i_event_id,
             epoch_ms(ts) AS s_ms,
             epoch_ms(ts) + (user_id % 8 + 1) * 3600000 AS e_ms
      FROM events WHERE event_type = 'view'
    ), pt AS (
      SELECT event_id AS p_event_id, epoch_ms(ts) AS p_ms
      FROM events WHERE event_type = 'click'
    )
    SELECT i_event_id, p_event_id, CAST(p_ms - s_ms AS BIGINT) AS offset_ms
    FROM iv JOIN pt ON pt.p_ms BETWEEN iv.s_ms AND iv.e_ms
    """,
    doc=(
        "temporal interval join (points within [start, end] windows): the "
        "1-D sibling of radius_join — time-bucket cover equi-join + exact "
        "integer-ms refine; oracle is the unbucketed range join (DuckDB "
        "IEJoin), so parity checks the bucket cover. All-integer arithmetic "
        "-> hash-exact"
    ),
)
def interval_join(spark, sf_dir):
    """Intervals explode into the time buckets they cover (sequence of
    floor-divided bucket ids — bounded: width >= max interval length means
    <= 2 buckets per interval), points key by their single bucket, then a
    pure equi-join on the bucket id with the exact BETWEEN refine. No range
    join, no cross join; the shuffle is on bucket keys so skew follows the
    event-time distribution and rides AQE like every other equi-join."""
    ev = _t(spark, sf_dir, "events")
    iv = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("i_event_id"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("s_ms"),
        (F.unix_millis(F.col("ts").cast("timestamp")) + (F.col("user_id") % 8 + 1) * 3600000).alias("e_ms"),
    )
    pt = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("p_event_id"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("p_ms"),
    )
    iv_b = iv.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col("s_ms") / _IJ_W_MS), F.floor(F.col("e_ms") / _IJ_W_MS)
            )
        ).alias("bucket"),
    )
    pt_b = pt.withColumn("bucket", F.floor(F.col("p_ms") / _IJ_W_MS))
    return (
        iv_b.join(pt_b, "bucket")
        .filter(F.col("p_ms").between(F.col("s_ms"), F.col("e_ms")))
        .select(
            "i_event_id", "p_event_id", (F.col("p_ms") - F.col("s_ms")).alias("offset_ms")
        )
    )


# MERGE-style upsert -------------------------------------------------------


@register(
    "merge_upsert",
    """
    WITH src AS (
      SELECT CASE WHEN l_suppkey % 3 = 0 THEN l_suppkey + 100000 ELSE l_suppkey END AS k,
             round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS delta
      FROM lineitem WHERE l_returnflag = 'R'
      GROUP BY 1
    )
    SELECT coalesce(s.s_suppkey, src.k) AS s_suppkey,
           coalesce(s.s_name, 'NEW') AS s_name,
           round(coalesce(s.s_acctbal, 0.0) + coalesce(src.delta, 0.0), 2) AS acctbal,
           CASE WHEN s.s_suppkey IS NULL THEN 'inserted'
                WHEN src.k IS NULL THEN 'unchanged'
                ELSE 'updated' END AS merge_action
    FROM supplier s FULL OUTER JOIN src ON s.s_suppkey = src.k
    """,
    doc=(
        "MERGE INTO semantics (WHEN MATCHED update / NOT MATCHED insert / "
        "no-source unchanged) as one full-outer join + coalesce — the "
        "declarative upsert shape Iceberg MERGE compiles to; every branch "
        "exercised (keys %3 remapped so some sources miss the target)"
    ),
)
def merge_upsert(spark, sf_dir):
    """Upsert a revenue-delta source into the supplier dimension. The plan
    is a single shuffle full-outer equi-join (both sides partial-aggregated
    / pruned first); at warehouse scale this is exactly the copy-on-write
    MERGE join, and the action column is what a writer would route on."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    src = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy(
            F.when(F.col("l_suppkey") % 3 == 0, F.col("l_suppkey") + 100000)
            .otherwise(F.col("l_suppkey"))
            .alias("k")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "double"
                ),
                2,
            ).alias("delta")
        )
    )
    j = s.join(src, s.s_suppkey == src.k, "full_outer")
    return j.select(
        F.coalesce(s.s_suppkey, src.k).alias("s_suppkey"),
        F.coalesce(s.s_name, F.lit("NEW")).alias("s_name"),
        F.round(
            F.coalesce(s.s_acctbal, F.lit(0.0)) + F.coalesce(src.delta, F.lit(0.0)), 2
        ).alias("acctbal"),
        F.when(s.s_suppkey.isNull(), "inserted")
        .when(src.k.isNull(), "unchanged")
        .otherwise("updated")
        .alias("merge_action"),
    )


def _hex_pts_cte() -> str:
    return """
      SELECT CAST(event_id * 7919 % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat,
             CAST(event_id * 104729 % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
      FROM events
    """


def _hex_cells_oracle_sql() -> str:
    from filda_spark import hex as hx

    enc = hx.encode_sql("lat", "lon", hx.HEX_R8)
    par = hx.parent_sql("q", "r", hx.HEX_R8)
    return f"""
    WITH pts AS ({_hex_pts_cte()}),
    enc AS (SELECT {enc} AS hex_r8 FROM pts),
    qr AS (
      SELECT hex_r8,
             CAST((hex_r8 % {1 << 58}) // {1 << 29} - {1 << 28} AS BIGINT) AS q,
             CAST(hex_r8 % {1 << 29} - {1 << 28} AS BIGINT) AS r
      FROM enc
    )
    SELECT hex_r8, {par} AS hex_r7, CAST(count(*) AS BIGINT) AS n
    FROM qr GROUP BY hex_r8, q, r
    """


@register(
    "hex_cells",
    _hex_cells_oracle_sql(),
    doc="hexagonal cell encode + aperture-7 parent rollup (H3-class res 8 -> 7) over deterministic event points; numpy/Column/SQL twins pinned bit-identical",
)
def hex_cells(spark, sf_dir):
    from filda_spark import hex as hx

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        ((F.col("event_id") * 7919 % 18000).cast("double") / 100.0 - 90.0).alias("lat"),
        ((F.col("event_id") * 104729 % 36000).cast("double") / 100.0 - 180.0).alias("lon"),
    )
    c8 = pts.select(hx.encode(F.col("lat"), F.col("lon"), hx.HEX_R8).alias("hex_r8"))
    return (
        c8.withColumn("hex_r7", hx.parent(F.col("hex_r8"), hx.HEX_R8))
        .groupBy("hex_r8", "hex_r7")
        .agg(F.count("*").alias("n"))
    )


def _hex_smooth_oracle_sql() -> str:
    from filda_spark import hex as hx

    enc = hx.encode_sql("lat", "lon", hx.HEX_R8)
    offs = ", ".join(f"({dq}, {dr})" for dq, dr in [(0, 0)] + hx.DIRS)
    pack = (
        f"({hx.HEX_R8} * CAST({1 << 58} AS BIGINT)"
        f" + (q + dq + {1 << 28}) * CAST({1 << 29} AS BIGINT)"
        f" + (r + dr + {1 << 28}))"
    )
    return f"""
    WITH pts AS ({_hex_pts_cte()}),
    counts AS (
      SELECT hex_r8, CAST(count(*) AS BIGINT) AS n FROM
        (SELECT {enc} AS hex_r8 FROM pts) GROUP BY hex_r8
    ),
    qr AS (
      SELECT n,
             CAST((hex_r8 % {1 << 58}) // {1 << 29} - {1 << 28} AS BIGINT) AS q,
             CAST(hex_r8 % {1 << 29} - {1 << 28} AS BIGINT) AS r
      FROM counts
    ),
    offsets(dq, dr) AS (VALUES {offs})
    SELECT {pack} AS hex_r8, CAST(sum(n) AS BIGINT) AS smoothed
    FROM qr CROSS JOIN offsets
    GROUP BY hex_r8
    """


@register(
    "hex_smooth",
    _hex_smooth_oracle_sql(),
    doc="uniform hex kRing smoothing: per-cell counts scattered into the 6-neighbour ring and re-summed — the anisotropy-free neighborhood aggregate hexagonal grids exist for",
)
def hex_smooth(spark, sf_dir):
    """Scatter-sum over the hex 1-ring: each cell's count lands on itself
    and its 6 equidistant neighbours (integer lattice arithmetic only —
    one explode + one groupBy shuffle, identical shape at any scale).
    Encodes r8 directly from the shared point expression instead of
    re-aggregating `hex_cells`' (r8, r7) output, so the per-cell count is
    ONE partial-aggregated groupBy (no second exchange, no unused parent
    column)."""
    from filda_spark import hex as hx

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        ((F.col("event_id") * 7919 % 18000).cast("double") / 100.0 - 90.0).alias("lat"),
        ((F.col("event_id") * 104729 % 36000).cast("double") / 100.0 - 180.0).alias("lon"),
    )
    counts = (
        pts.select(hx.encode(F.col("lat"), F.col("lon"), hx.HEX_R8).alias("hex_r8"))
        .groupBy("hex_r8")
        .agg(F.count("*").alias("n"))
    )
    return (
        counts.select(
            F.explode(hx.kring(F.col("hex_r8"), hx.HEX_R8, 1)).alias("hex_r8"), "n"
        )
        .groupBy("hex_r8")
        .agg(F.sum("n").alias("smoothed"))
    )


def _zonal_assigned_cte() -> str:
    """Shared WITH-body for the zonal family: an explicit even-odd ray
    cast (edge join + crossing-parity HAVING) over the same demo_zones
    polygon set the Spark side broadcasts, rendered as VALUES literals.
    The edge (i, j=i-1) roles and the `(xj-xi)*(lat-yi)/(yj-yi)+xi`
    operand order mirror `spatial.point_in_polygon_np` exactly so the
    float64 results are bit-identical. Horizontal edges are dropped up
    front (their crossing predicate is always false; keeping them would
    divide by zero). Ends with `assigned(event_id, value, zone_id)`."""
    from filda_spark.spatial import demo_zones

    rows = []
    for z in demo_zones():
        n = len(z["lat"])
        for i in range(n):
            j = (i - 1) % n
            yi, xi = z["lat"][i], z["lon"][i]
            yj, xj = z["lat"][j], z["lon"][j]
            if yi == yj:
                continue
            rows.append(f"({z['zone_id']}, {yi!r}, {xi!r}, {yj!r}, {xj!r})")
    edges = ",\n      ".join(rows)
    return f"""pts AS (
      SELECT event_id, value,
             CAST(event_id * 7919 % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat,
             CAST(event_id * 104729 % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
      FROM events
    ),
    edges(zone, yi, xi, yj, xj) AS (VALUES
      {edges}
    ),
    hits AS (
      SELECT p.event_id, e.zone
      FROM pts p JOIN edges e
        ON (e.yi > p.lat) != (e.yj > p.lat)
       AND p.lon < (e.xj - e.xi) * (p.lat - e.yi) / (e.yj - e.yi) + e.xi
      GROUP BY p.event_id, e.zone
      HAVING count(*) % 2 = 1
    ),
    assigned AS (
      SELECT p.event_id, p.value, CAST(COALESCE(min(h.zone), -1) AS INT) AS zone_id
      FROM pts p LEFT JOIN hits h ON h.event_id = p.event_id
      GROUP BY p.event_id, p.value
    )"""


def _zonal_oracle_sql() -> str:
    """SQL twin of the broadcast-R-tree point-in-polygon path; see
    _zonal_assigned_cte for the parity contract."""
    return f"""
    WITH {_zonal_assigned_cte()}
    SELECT zone_id, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS total_value,
           CAST(min(event_id) AS BIGINT) AS min_event
    FROM assigned GROUP BY zone_id
    """


@register(
    "zonal_stats",
    _zonal_oracle_sql(),
    doc="zonal statistics: broadcast polygon R-tree point-in-polygon assignment + per-zone rollup (north rule PIP; zone -1 aggregates the complement)",
)
def zonal_stats(spark, sf_dir):
    """Vector ⊗ point zonal rollup on the production PIP path: the polygon
    set is broadcast once, each Arrow batch descends the STR R-tree
    (`pipeline.make_pip_udf`), and the only shuffle is the final per-zone
    aggregation — the same plan that holds against 1e12 points (map-side
    partial aggs on ≤109 zone keys)."""
    from filda_spark.pipeline import make_pip_udf
    from filda_spark.spatial import demo_zones

    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    pts = ev.select(
        "event_id",
        "value",
        ((F.col("event_id") * 7919 % 18000).cast("double") / 100.0 - 90.0).alias("lat"),
        ((F.col("event_id") * 104729 % 36000).cast("double") / 100.0 - 180.0).alias("lon"),
    )
    bc = spark.sparkContext.broadcast(demo_zones())
    zid = make_pip_udf(bc, "zone_id", flag=False)
    return (
        pts.withColumn("zone_id", zid("lat", "lon"))
        .groupBy("zone_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
            F.min("event_id").alias("min_event"),
        )
    )


@register(
    "priority_paint",
    """
    WITH painted AS (
      SELECT l_partkey % 500 AS cell,
             CAST(CASE l_returnflag WHEN 'R' THEN 9 WHEN 'A' THEN 8 ELSE 5 END AS BIGINT) AS class,
             l_orderkey
      FROM lineitem
    )
    SELECT cell,
           CAST(floor(max(class * 1000000000 + l_orderkey) / 1000000000) AS BIGINT) AS paint_class,
           CAST(max(class * 1000000000 + l_orderkey) % 1000000000 AS BIGINT) AS winner_order,
           CAST(count(*) AS BIGINT) AS n
    FROM painted GROUP BY cell
    """,
    doc="vector->raster priority paint: later/higher class wins per cell (FILDA.py:2257-2350)",
)
def priority_paint(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    cls = (
        F.when(F.col("l_returnflag") == "R", 9)
        .when(F.col("l_returnflag") == "A", 8)
        .otherwise(5)
    )
    painted = li.select(
        (F.col("l_partkey") % 500).alias("cell"),
        (cls.cast("long") * F.lit(1000000000).cast("long") + F.col("l_orderkey")).alias("key"),
    )
    return painted.groupBy("cell").agg(
        F.floor(F.max("key") / 1000000000).alias("paint_class"),
        (F.max("key") % 1000000000).alias("winner_order"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# §2.7 scalar functions
# ---------------------------------------------------------------------------


@register(
    "planck_bt",
    f"""
    SELECT l_orderkey, l_linenumber,
           round({physics.bt_sql('l_extendedprice / 10000.0 + 0.5', 3.74)}, 6) AS bt_m13
    FROM lineitem
    """,
    doc="Planck inversion BT(rad, 3.74um), exact reference constants (FILDA_BT.py:99-121)",
)
def planck_bt(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    rad = F.col("l_extendedprice") / 10000.0 + 0.5
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(physics.brightness_temperature(rad, 3.74), 6).alias("bt_m13"),
    )


@register(
    "normal_cdf",
    f"""
    SELECT l_orderkey, l_linenumber,
           round({physics.normal_cdf_sql('(l_quantity - 25.0) / 10.0')}, 8) AS pos_dnb
    FROM lineitem
    """,
    doc="norm.cdf z-score probability (FILDA.py:166-170), Zelen-Severo polynomial both engines",
)
def normal_cdf(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    z = (F.col("l_quantity") - 25.0) / 10.0
    return li.select(
        "l_orderkey", "l_linenumber", F.round(physics.normal_cdf(z), 8).alias("pos_dnb")
    )


_QA_FLAGS_SQL = [
    "l_quantity > 25",
    "l_discount > 0.05",
    "l_tax > 0.04",
    "l_returnflag = 'R'",
    "l_linestatus = 'O'",
]


@register(
    "bit_pack_qa",
    f"""
    SELECT l_orderkey, l_linenumber,
           CAST({pack_bits_sql(*_QA_FLAGS_SQL)} AS BIGINT) AS qa,
           CAST({pack_bits_sql(*reversed(_QA_FLAGS_SQL))} AS BIGINT) AS qa_rev
    FROM lineitem
    """,
    doc="Algorithm_QA bit packing + bit reversal (FILDA.py:2373-2567)",
)
def bit_pack_qa(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    flags = [
        F.col("l_quantity") > 25,
        F.col("l_discount") > 0.05,
        F.col("l_tax") > 0.04,
        F.col("l_returnflag") == "R",
        F.col("l_linestatus") == "O",
    ]
    qa = pack_bits(*flags).cast("long")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        qa.alias("qa"),
        reverse_bits(qa, width=5).cast("long").alias("qa_rev"),
    )


@register(
    "interval_bucket",
    """
    SELECT CAST(ts AS DATE) AS d,
           CAST(floor((hour(ts) * 60 + minute(ts)) / 6) AS INT) AS overpass,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY d, overpass
    """,
    doc="6-minute overpass interval bucketing (MCBEF_SPACE_TIME.py:935-947)",
)
def interval_bucket(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.to_date("ts").alias("d"),
            F.floor((F.hour("ts") * 60 + F.minute("ts")) / 6).cast("int").alias("overpass"),
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@register(
    "julian_day",
    """
    SELECT CAST(datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) + 2440588 AS BIGINT) AS jdn,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY jdn
    """,
    doc="Gregorian->Julian day number (FILDA_Time_Cord.py:10-60) + per-day counts",
)
def julian_day(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    from filda_spark.grids import julian_day_number

    return li.groupBy(
        julian_day_number(F.to_date("l_shipdate")).alias("jdn")
    ).agg(F.count("*").alias("n"))


@register(
    "tile_assignment",
    """
    SELECT c_custkey, lat, lon,
           printf('h%02dv%02d', CAST(18 + floor(lon / 10) AS INT),
                                CAST(8 - floor(lat / 10) AS INT)) AS tile
    FROM (SELECT c_custkey,
                 CAST(c_custkey * 37 % 150 - 60 AS DOUBLE) + 0.5 AS lat,
                 CAST(c_custkey * 73 % 360 - 180 AS DOUBLE) + 0.5 AS lon
          FROM customer)
    """,
    doc="Plate-Carree hXXvYY tile id: vid=8-lat//10, hid=18+lon//10 (FILDA_Time_Cord.py:219-220)",
)
def tile_assignment(spark, sf_dir):
    from filda_spark.grids import pc_tile_name

    c = _t(spark, sf_dir, "customer")
    lat = ((F.col("c_custkey") * 37 % 150 - 60).cast("double") + 0.5).alias("lat")
    lon = ((F.col("c_custkey") * 73 % 360 - 180).cast("double") + 0.5).alias("lon")
    pts = c.select("c_custkey", lat, lon)
    return pts.select(
        "c_custkey", "lat", "lon", pc_tile_name(F.col("lat"), F.col("lon")).alias("tile")
    )


@register(
    "json_extract_agg",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY k_bucket
    """,
    doc="JSON property extraction + aggregation (engine breadth; no JSON in reference)",
)
def json_extract_agg(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        (F.get_json_object("props", "$.k").cast("int") % 10).alias("k_bucket")
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))


@register(
    "date_series",
    """
    SELECT o_orderkey,
           CAST(unnest(generate_series(CAST(o_orderdate AS DATE),
                                       CAST(o_orderdate AS DATE) + 3,
                                       INTERVAL 1 DAY)) AS DATE) AS d
    FROM orders WHERE o_orderkey % 997 = 0
    """,
    doc="date-series expansion (get_date_series, FILDA_Time_Cord.py:120-160)",
)
def date_series(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 997 == 0)
    return o.select(
        "o_orderkey",
        F.explode(
            F.sequence(
                F.to_date("o_orderdate"), F.date_add(F.to_date("o_orderdate"), 3)
            )
        ).alias("d"),
    )


@register(
    "rollup_agg",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS rflag,
           coalesce(l_linestatus, 'ALL') AS lstatus,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="hierarchical rollup aggregation (engine breadth; no grouping sets in reference)",
)
def rollup_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("lstatus"),
            "n",
            "qty",
        )
    )


@register(
    "moving_avg",
    """
    SELECT event_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mavg
    FROM events
    """,
    doc="per-user moving average over a 3-row frame (time-series smoothing)",
)
def moving_avg(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return ev.select("event_id", F.round(F.avg("value").over(w), 6).alias("mavg"))


def _ntz_micros(col: str):
    """Microsecond scalar from a TIMESTAMP_NTZ column. unix_micros only
    accepts TIMESTAMP; the NTZ->TZ cast applies the session-zone offset,
    which cancels in any difference of two values from the same session
    (only gaps are emitted, never absolute epochs)."""
    return F.unix_micros(F.col(col).cast("timestamp"))


@register(
    "asof_join",
    """
    WITH clicks AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id,
           c.event_id AS click_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM events p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="as-of join: each event matched to the latest at-or-before click of the same user (point-in-time join; union + window carry-forward, no range explosion)",
)
def asof_join(spark, sf_dir):
    """Distributed as-of join without a range join: tag reference (click)
    and probe rows, union them, and carry the last reference id forward
    inside one (user, ts) window — one shuffle on the key, sort-based, no
    per-row candidate explosion. Reference rows sort BEFORE probes at equal
    ts (side 0 < 1) so "at or before" includes same-instant matches; this
    is the plan that holds when both sides are billions of rows (a
    broadcast-range or cross-bucket join would not)."""
    ev = _t(spark, sf_dir, "events")
    refs = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("probe_id"),
        F.col("event_id").alias("ref_id"),
    )
    probes = ev.select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        F.col("event_id").alias("probe_id"),
        F.lit(None).cast("long").alias("ref_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = (
        probes.unionByName(refs)
        .withColumn("click_id", F.last("ref_id", ignorenulls=True).over(w))
        .withColumn(
            "click_us",
            F.last(
                F.when(F.col("side") == 0, _ntz_micros("ts")), ignorenulls=True
            ).over(w),
        )
    )
    return u.filter(F.col("side") == 1).select(
        F.col("probe_id").alias("event_id"),
        "user_id",
        "click_id",
        (_ntz_micros("ts") - F.col("click_us")).alias("gap_us"),
    )


SESSION_GAP_US = 1_800_000_000  # 30 min


@register(
    "sessionize",
    f"""
    WITH e AS (
      SELECT user_id, event_id, value, epoch_us(ts) AS us,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM e
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(us) - min(us) AS BIGINT) AS duration_us,
           round(sum(value), 6) AS total_value,
           CAST(min(event_id) AS BIGINT) AS first_event
    FROM s GROUP BY user_id, session_no
    """,
    doc="gap-based sessionization (30-min idle gap): lag -> new-session flag -> running-sum session number -> per-session rollup (the batch twin of session windows)",
)
def sessionize(spark, sf_dir):
    """One shuffle on user_id serves both windows and the final rollup
    (same partitioning); durations are microsecond differences so the
    TIMESTAMP_NTZ session-zone cast cancels."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", _ntz_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    e = ev.withColumn(
        "new_s",
        F.when(
            F.lag("us").over(w).isNull()
            | (F.col("us") - F.lag("us").over(w) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    s = e.withColumn("session_no", F.sum("new_s").over(wc))
    return s.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        (F.max("us") - F.min("us")).alias("duration_us"),
        F.round(F.sum("value"), 6).alias("total_value"),
        F.min("event_id").alias("first_event"),
    )


KMV_K = 32


@register(
    "kmv_distinct",
    f"""
    WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
    h AS (
      SELECT event_type, user_id,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM d
    ),
    r AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h, user_id) AS rn
      FROM h
    ),
    nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact FROM d GROUP BY event_type),
    kth AS (SELECT event_type, h AS hk FROM r WHERE rn = {KMV_K})
    SELECT nd.event_type, n_exact,
           round(CASE WHEN hk IS NULL THEN CAST(n_exact AS DOUBLE)
                 ELSE {KMV_K - 1}.0 / (CAST(hk AS DOUBLE) / 1152921504606846976.0)
                 END, 6) AS kmv_estimate
    FROM nd LEFT JOIN kth USING (event_type)
    """,
    doc="KMV distinct-count sketch: k-th minimum of 60-bit md5 hashes -> (k-1)/u_k estimate, exact count alongside; deterministic (same hash both engines) unlike HLL",
)
def kmv_distinct(spark, sf_dir):
    """Mergeable distinct sketch, computed the scalable way: per-bucket
    k-minima first (64-way hash split bounds every sort), then the k-th of
    the union — identical to the global k-th smallest (the global k-th is
    always inside the union of per-bucket k-minima) without a full per-group
    sort. Groups with fewer than K members fall back to the exact count
    (that IS KMV semantics: the sketch holds all values)."""
    d = (
        _t(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
        .withColumn(
            "h",
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
            ).cast("long"),
        )
    )
    w1 = Window.partitionBy("event_type", "bucket").orderBy("h", "user_id")
    cand = (
        d.withColumn("bucket", F.pmod(F.xxhash64("user_id"), F.lit(64)))
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= KMV_K)
    )
    w2 = Window.partitionBy("event_type").orderBy("h", "user_id")
    kth = (
        cand.withColumn("rn2", F.row_number().over(w2))
        .filter(F.col("rn2") == KMV_K)
        .select("event_type", F.col("h").alias("hk"))
    )
    nd = d.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_exact"))
    est = F.when(
        F.col("hk").isNull(), F.col("n_exact").cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1)) / (F.col("hk").cast("double") / F.lit(1152921504606846976.0))
    )
    return nd.join(kth, "event_type", "left").select(
        "event_type", "n_exact", F.round(est, 6).alias("kmv_estimate")
    )


@register(
    "set_ops_except",
    """
    SELECT l_orderkey FROM lineitem WHERE l_quantity >= 40
    EXCEPT
    SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="EXCEPT set op (distinct difference; boolean mask exclusion family)",
)
def set_ops_except(spark, sf_dir):
    a = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 40).select(
        F.col("l_orderkey")
    )
    b = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    return a.subtract(b)  # EXCEPT = distinct set difference


@register(
    "pivot_status_counts",
    """
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
    FROM orders GROUP BY o_orderpriority
    """,
    doc="pivot via conditional aggregation (portable across engines)",
)
def pivot_status_counts(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        *[
            F.sum(F.when(F.col("o_orderstatus") == s, 1).otherwise(0)).alias(f"n_{s.lower()}")
            for s in ("F", "O", "P")
        ]
    )




@register(
    "geos_fp_urls",
    f"""
    WITH d AS (SELECT DISTINCT o_orderdate AS day FROM orders ORDER BY day LIMIT 3),
    h AS (SELECT unnest(range(0, 24)) AS ih),
    c AS (SELECT unnest(['tavg1_2d_flx_Nx','tavg1_2d_lnd_Nx','tavg1_2d_rad_Nx','tavg1_2d_slv_Nx']) AS coln)
    SELECT day,
           'https://portal.nccs.nasa.gov/datashare/gmao/geos-fp/das/'
           || 'Y' || strftime(day, '%Y') || '/M' || strftime(day, '%m')
           || '/D' || strftime(day, '%d') || '/GEOS.fp.asm.' || coln || '.'
           || strftime(day, '%Y%m%d') || '_'
           || lpad(CAST(ih AS VARCHAR), 2, '0') || '30.V01.nc4' AS url
    FROM d, h, c
    """,
    doc="GEOS-FP tavg1 input-manifest URLs per date (GEOS_FP.py:42-108 string planner)",
)
def geos_fp_urls(spark, sf_dir):
    from filda_spark.functions.urls import tavg1_urls

    dates = (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_orderdate").alias("d"))
        .distinct()
        .orderBy("d")
        .limit(3)
    )
    return tavg1_urls(dates, "d").select(F.col("day"), F.col("url"))


# hex cell compaction ------------------------------------------------------


def _hex_compact_oracle_sql() -> str:
    from filda_spark import hex as hx

    enc9 = hx.encode_sql("lat", "lon", 9)
    q9, r9 = hx.qr_sql_exact("cell")
    q8, r8 = hx.qr_sql_exact("cell")
    return f"""
    WITH pts AS (
      SELECT CAST(event_id * 7919 % 1200 AS DOUBLE) / 10000.0 AS lat,
             CAST(event_id * 104729 % 1193 AS DOUBLE) / 10000.0 + 10.0 AS lon
      FROM events
    ),
    c9 AS (SELECT DISTINCT {enc9} AS cell FROM pts),
    c9p AS (SELECT cell, {hx.parent_sql(q9, r9, 9)} AS p8 FROM c9),
    prom8 AS (SELECT p8 AS cell FROM c9p GROUP BY p8 HAVING count(*) = 7),
    surv9 AS (SELECT cell FROM c9p WHERE p8 NOT IN (SELECT cell FROM prom8)),
    p8p AS (SELECT cell, {hx.parent_sql(q8, r8, 8)} AS p7 FROM prom8),
    prom7 AS (SELECT p7 AS cell FROM p8p GROUP BY p7 HAVING count(*) = 7),
    surv8 AS (SELECT cell FROM p8p WHERE p7 NOT IN (SELECT cell FROM prom7))
    SELECT cell, CAST(9 AS INT) AS res FROM surv9
    UNION ALL SELECT cell, CAST(8 AS INT) AS res FROM surv8
    UNION ALL SELECT cell, CAST(7 AS INT) AS res FROM prom7
    """


@register(
    "hex_compact",
    _hex_compact_oracle_sql(),
    doc=(
        "H3-style cell-set compaction (compact_cells): any complete 7-child "
        "set collapses to its aperture-7 parent, recursively r9 -> r8 -> r7; "
        "output is the minimal mixed-resolution cover of the input cell set"
    ),
)
def hex_compact(spark, sf_dir):
    """Compaction is pure cell algebra: distinct r9 cells, groupBy parent
    with HAVING count = 7 to find promotable parents, anti-join survivors,
    repeat one level up. Every step is an equi-join/groupBy on cell ids —
    partial aggregation applies (a parent's 7 children hash to it from
    whichever partitions hold them) and no step is ever wider than the
    distinct cell set, so the shape is unchanged at 10^12 cells. Parent ids
    come from the Arrow kernel (`hex.parent_pudf`), not the Column twin:
    Catalyst inlines the composed encode->parent->parent algebra into the
    anti-join conditions and its canonicalization is quadratic on that tree
    (driver OOM at two levels); the Arrow node keeps the plan O(1) and the
    math vectorized."""
    return _hex_compact_df(spark, sf_dir)


_HEX_COMPACT_CACHED: list = []


def _hex_compact_df(spark, sf_dir):
    from pyspark import StorageLevel

    from filda_spark import hex as hx

    # release older invocations' cached level frames — there is no safe
    # hook after the caller's action, so the leak is bounded instead of
    # growing with every compact/uncompact call. Keep the last TWO
    # invocations (4 frames): a consumer that builds both hex_compact and
    # hex_uncompact before executing either must not lose the first plan's
    # cache backing mid-flight.
    while len(_HEX_COMPACT_CACHED) > 2:
        _HEX_COMPACT_CACHED.pop(0).unpersist()

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        ((F.col("event_id") * 7919 % 1200).cast("double") / 10000.0).alias("lat"),
        (((F.col("event_id") * 104729 % 1193).cast("double") / 10000.0) + 10.0).alias("lon"),
    )
    c9 = pts.select(hx.encode(F.col("lat"), F.col("lon"), 9).alias("cell")).distinct()
    # the level frames feed 2-3 union branches each; without persist() the
    # union expands them into duplicated subtrees (9 source scans in the
    # executed plan — per-branch column pruning defeats ReuseExchange).
    # Caching the distinct cell set is the scale-correct call too: it is
    # orders of magnitude smaller than the point input.
    c9p = c9.withColumn("p8", hx.parent_pudf(F.col("cell"))).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    _HEX_COMPACT_CACHED.append(c9p)
    prom8 = (
        c9p.groupBy("p8").agg(F.count("*").alias("n")).filter(F.col("n") == 7).select("p8")
    )
    surv9 = c9p.join(prom8, "p8", "left_anti").select("cell")
    p8p = (
        prom8.select(F.col("p8").alias("cell"))
        .withColumn("p7", hx.parent_pudf(F.col("cell")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _HEX_COMPACT_CACHED.append(p8p)
    prom7 = (
        p8p.groupBy("p7").agg(F.count("*").alias("n")).filter(F.col("n") == 7).select("p7")
    )
    surv8 = p8p.join(prom7, "p7", "left_anti").select("cell")
    return (
        surv9.select("cell", F.lit(9).alias("res"))
        .unionByName(surv8.select("cell", F.lit(8).alias("res")))
        .unionByName(prom7.select(F.col("p7").alias("cell"), F.lit(7).alias("res")))
    )


def _hex_uncompact_oracle_sql() -> str:
    from filda_spark import hex as hx

    enc9 = hx.encode_sql("lat", "lon", 9)
    return f"""
    WITH pts AS (
      SELECT CAST(event_id * 7919 % 1200 AS DOUBLE) / 10000.0 AS lat,
             CAST(event_id * 104729 % 1193 AS DOUBLE) / 10000.0 + 10.0 AS lon
      FROM events
    )
    SELECT DISTINCT {enc9} AS cell FROM pts
    """


@register(
    "hex_uncompact",
    _hex_uncompact_oracle_sql(),
    doc=(
        "H3-style uncompact_cells: expand a mixed-resolution compacted cover "
        "back to uniform res 9 via exact aperture-7 child enumeration; "
        "oracle is the original distinct r9 cell set, so parity proves the "
        "round-trip identity uncompact(compact(S)) == S end to end"
    ),
)
def hex_uncompact(spark, sf_dir):
    """Child expansion is the exact linear inverse (center child (2q+3r,
    q-2r) + 6 neighbours — `hex.children`), one explode per promoted level:
    r7 rows fan out 49x, r8 rows 7x, r9 rows pass through. Explodes are
    map-side (no shuffle beyond what compact already does) and the fan-out
    factor is a constant 7 per level, so the shape holds at any cell-set
    size. Running compact then uncompact and hashing against the raw
    distinct set makes the oracle a round-trip identity proof."""
    from filda_spark import hex as hx

    comp = _hex_compact_df(spark, sf_dir)
    u9 = comp.filter(F.col("res") == 9).select("cell")
    c8 = (
        comp.filter(F.col("res") == 8)
        .select(F.explode(hx.children(F.col("cell"), 8)).alias("cell"))
    )
    c7to8 = (
        comp.filter(F.col("res") == 7)
        .select(F.explode(hx.children(F.col("cell"), 7)).alias("cell"))
    )
    c7 = c7to8.select(F.explode(hx.children(F.col("cell"), 8)).alias("cell"))
    return u9.unionByName(c8).unionByName(c7)


# polygon -> cell cover (polyfill) -------------------------------------------

_POLYFILL_RES = 3


def _polyfill_zones() -> list[dict]:
    """Every 7th demo zone: 16 polygons keeps the oracle's ray-cast join
    (candidates x edges) snappy while exercising varied shapes/radii.

    The parity contract requires the zones to be pairwise DISJOINT: the
    Spark side assigns one zone per cell (single R-tree hit) while the SQL
    oracle emits one row per containing polygon, so any overlap would
    silently diverge. Assert bbox disjointness (sufficient for disjoint
    polygons) rather than relying on an unchecked data property."""
    from filda_spark.spatial import demo_zones

    zs = [z for z in demo_zones() if z["zone_id"] % 7 == 0]
    boxes = [
        (min(z["lat"]), max(z["lat"]), min(z["lon"]), max(z["lon"]), z["zone_id"])
        for z in zs
    ]
    for i, a in enumerate(boxes):
        for b in boxes[i + 1 :]:
            if a[0] <= b[1] and b[0] <= a[1] and a[2] <= b[3] and b[2] <= a[3]:
                raise AssertionError(
                    f"hex_polyfill zones {a[4]} and {b[4]} have overlapping "
                    "bboxes; the one-zone-per-cell parity contract requires "
                    "disjoint zones"
                )
    return zs


def _polyfill_ranges() -> list[tuple]:
    """(zone, q0, q1, r0, r1) candidate axial ranges per zone bbox. The
    axial coords of a cell center are linear in (lat, lon), so the extremes
    over a bbox occur at its corners; +-1 margin is belt and braces."""
    import math as _math

    from filda_spark import hex as hx

    cqx, cqy, crx, cry = hx._inv(_POLYFILL_RES)
    out = []
    for z in _polyfill_zones():
        corners = [
            (la, lo)
            for la in (min(z["lat"]), max(z["lat"]))
            for lo in (min(z["lon"]), max(z["lon"]))
        ]
        qs = [cqx * lo + cqy * la for la, lo in corners]
        rs = [crx * lo + cry * la for la, lo in corners]
        out.append(
            (
                z["zone_id"],
                _math.floor(min(qs)) - 1,
                _math.ceil(max(qs)) + 1,
                _math.floor(min(rs)) - 1,
                _math.ceil(max(rs)) + 1,
            )
        )
    return out


def _zone_edges_sql(zones: list[dict]) -> str:
    """VALUES rows (zone, yi, xi, yj, xj) mirroring spatial.point_in_polygon_np
    edge roles (j = i-1, horizontal edges dropped) — same construction as
    the zonal_stats oracle."""
    rows = []
    for z in zones:
        n = len(z["lat"])
        for i in range(n):
            j = (i - 1) % n
            yi, xi = z["lat"][i], z["lon"][i]
            yj, xj = z["lat"][j], z["lon"][j]
            if yi == yj:
                continue
            rows.append(f"({z['zone_id']}, {yi!r}, {xi!r}, {yj!r}, {xj!r})")
    return ",\n      ".join(rows)


def _hex_polyfill_oracle_sql() -> str:
    from filda_spark import hex as hx

    ranges = ",\n      ".join(
        f"({z}, {q0}, {q1}, {r0}, {r1})" for z, q0, q1, r0, r1 in _polyfill_ranges()
    )
    clat, clon = hx.center_sql("q", "r", _POLYFILL_RES)
    pack = hx.pack_sql("q", "r", _POLYFILL_RES)
    return f"""
    WITH ranges(zone, q0, q1, r0, r1) AS (VALUES
      {ranges}
    ),
    qexp AS (
      SELECT r0, r1, unnest(range(q0, q1 + 1)) AS q FROM ranges
    ),
    rexp AS (
      SELECT q, unnest(range(r0, r1 + 1)) AS r FROM qexp
    ),
    cand AS (
      SELECT DISTINCT q, r FROM rexp
    ),
    cells AS (
      SELECT {pack} AS cell, {clat} AS clat, {clon} AS clon FROM cand
    ),
    edges(zone, yi, xi, yj, xj) AS (VALUES
      {_zone_edges_sql(_polyfill_zones())}
    )
    SELECT CAST(e.zone AS INT) AS zone_id, c.cell
    FROM cells c JOIN edges e
      ON (e.yi > c.clat) != (e.yj > c.clat)
     AND c.clon < (e.xj - e.xi) * (c.clat - e.yi) / (e.yj - e.yi) + e.xi
    GROUP BY e.zone, c.cell
    HAVING count(*) % 2 = 1
    """


@register(
    "hex_polyfill",
    _hex_polyfill_oracle_sql(),
    doc=(
        "H3-style polygon_to_cells (polyfill): cover each polygon with the "
        "res-3 hex cells whose centers fall inside it — candidate axial "
        "ranges from the bbox, centers PIP-tested on the broadcast R-tree; "
        "oracle re-derives the cover with the exact SQL ray cast"
    ),
)
def hex_polyfill(spark, sf_dir):
    """Candidates are generated JVM-side (sequence + explode over per-zone
    bbox axial ranges — map-only, fan-out proportional to cover area), then
    deduped with one shuffle and PIP-assigned on the production broadcast
    R-tree path (`pipeline.make_pip_udf`, same kernel as zonal_stats /
    flare masking). At 1e12 scale the ranges come from a polygon table
    instead of literals and the same plan holds: explode is map-side, the
    distinct shuffles only the candidate cover (~area/cell_area rows), and
    the polygon set rides one broadcast."""
    from filda_spark import hex as hx
    from filda_spark.pipeline import make_pip_udf

    rdf = spark.createDataFrame(
        _polyfill_ranges(), "zone int, q0 long, q1 long, r0 long, r1 long"
    )
    cand = (
        rdf.select(F.explode(F.sequence("q0", "q1")).alias("q"), "r0", "r1")
        .select("q", F.explode(F.sequence("r0", "r1")).alias("r"))
        .distinct()
    )
    clat, clon = hx.center_cols(F.col("q"), F.col("r"), _POLYFILL_RES)
    cells = cand.select(
        hx.pack_cols(F.col("q"), F.col("r"), _POLYFILL_RES).alias("cell"),
        clat.alias("clat"),
        clon.alias("clon"),
    )
    bc = spark.sparkContext.broadcast(_polyfill_zones())
    # asNondeterministic: the filter on the UDF output otherwise gets pushed
    # into a second copy of the projection and the R-tree kernel runs TWICE
    # (2 ArrowEvalPython nodes in the executed plan); the flag pins a single
    # evaluation. (The kernel IS deterministic — the flag only restricts
    # optimizer duplication/movement.)
    zid = make_pip_udf(bc, "zone_id", flag=False).asNondeterministic()
    return (
        cells.withColumn("zone_id", zid("clat", "clon"))
        .filter(F.col("zone_id") >= 0)
        .select("zone_id", "cell")
    )


# inverse-distance-weighted interpolation -----------------------------------

_IDW_R = 0.02  # radius, degrees (planar patch domain)
_IDW_EPS = 1e-6


@register(
    "idw_interpolate",
    f"""
    WITH src AS (
      SELECT CAST(event_id * 7919 % 1200 AS DOUBLE) / 10000.0 AS lat,
             CAST(event_id * 104729 % 1193 AS DOUBLE) / 10000.0 + 10.0 AS lon,
             value
      FROM events
    ),
    nodes AS (
      SELECT CAST(i // 13 AS BIGINT) AS gi, CAST(i % 13 AS BIGINT) AS gj,
             CAST(i // 13 AS DOUBLE) / 100.0 AS nlat,
             CAST(i % 13 AS DOUBLE) / 100.0 + 10.0 AS nlon
      FROM range(0, 169) t(i)
    ),
    hits AS (
      SELECT gi, gj,
             1.0 / ((s.lat - n.nlat) * (s.lat - n.nlat)
                    + (s.lon - n.nlon) * (s.lon - n.nlon) + {_IDW_EPS!r}) AS w,
             s.value AS v
      FROM nodes n JOIN src s
        ON (s.lat - n.nlat) * (s.lat - n.nlat)
           + (s.lon - n.nlon) * (s.lon - n.nlon) <= {_IDW_R * _IDW_R!r}
    )
    SELECT gi, gj, CAST(count(*) AS BIGINT) AS n_src,
           round(sum(w * v) / sum(w), 4) AS est
    FROM hits GROUP BY gi, gj
    """,
    doc=(
        "inverse-distance-weighted interpolation of scattered points onto a "
        "regular grid (the raster<-vector gridding sibling of priority_paint); "
        "Spark plan is the radius_join cell-cover equi-join, oracle is the "
        "plain cross-join ground truth so parity checks the cover"
    ),
)
def idw_interpolate(spark, sf_dir):
    """Gridding via the cover join: nodes key by their radius-sized cell,
    sources explode into the 3x3 ring, equi-join + exact distance refine,
    then one partial-aggregated groupBy per node. At scale the shuffle is
    on spatial cell keys (ride AQE/salting like dedup); never a cross join."""
    ev = _t(spark, sf_dir, "events")
    src = ev.select(
        ((F.col("event_id") * 7919 % 1200).cast("double") / 10000.0).alias("lat"),
        (((F.col("event_id") * 104729 % 1193).cast("double") / 10000.0) + 10.0).alias("lon"),
        "value",
    )
    i = F.col("id")
    nodes = spark.range(169).select(
        (i / 13).cast("long").alias("gi"),
        (i % 13).alias("gj"),
        ((i / 13).cast("long").cast("double") / 100.0).alias("nlat"),
        ((i % 13).cast("double") / 100.0 + 10.0).alias("nlon"),
    )
    nodes = nodes.withColumn("cy", F.floor(F.col("nlat") / _IDW_R)).withColumn(
        "cx", F.floor(F.col("nlon") / _IDW_R)
    )
    ring = F.explode(
        F.array(
            *[
                F.struct(
                    (F.floor(F.col("lat") / _IDW_R) + F.lit(dy)).alias("cy"),
                    (F.floor(F.col("lon") / _IDW_R) + F.lit(dx)).alias("cx"),
                )
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
            ]
        )
    ).alias("cell")
    src_ring = src.select("lat", "lon", "value", ring).select(
        "lat", "lon", "value", F.col("cell.cy").alias("cy"), F.col("cell.cx").alias("cx")
    )
    d2 = (F.col("lat") - F.col("nlat")) * (F.col("lat") - F.col("nlat")) + (
        F.col("lon") - F.col("nlon")
    ) * (F.col("lon") - F.col("nlon"))
    return (
        nodes.join(src_ring, ["cy", "cx"])
        .filter(d2 <= F.lit(_IDW_R * _IDW_R))
        .withColumn("w", F.lit(1.0) / (d2 + F.lit(_IDW_EPS)))
        .groupBy("gi", "gj")
        .agg(
            F.count("*").alias("n_src"),
            F.round(F.sum(F.col("w") * F.col("value")) / F.sum("w"), 4).alias("est"),
        )
    )


# trajectory speed/bearing ---------------------------------------------------


@register(
    "trajectory_speed",
    f"""
    WITH pts AS (
      SELECT user_id, event_id, epoch_ms(ts) AS t_ms,
             CAST(event_id * 7919 % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat,
             CAST(event_id * 104729 % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
      FROM events
    ),
    legs AS (
      SELECT user_id, event_id,
             lag(event_id) OVER w AS prev_event,
             lat, lon, t_ms,
             lag(lat) OVER w AS plat, lag(lon) OVER w AS plon,
             lag(t_ms) OVER w AS pt_ms
      FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY t_ms, event_id)
    )
    SELECT user_id, prev_event, event_id,
           round(2 * {_R_EARTH_KM} * asin(sqrt(
             sin(radians(lat - plat) / 2) * sin(radians(lat - plat) / 2)
             + cos(radians(plat)) * cos(radians(lat))
               * sin(radians(lon - plon) / 2) * sin(radians(lon - plon) / 2)
           )), 3) AS dist_km,
           CAST(t_ms - pt_ms AS BIGINT) AS dt_ms,
           round(2 * {_R_EARTH_KM} * asin(sqrt(
             sin(radians(lat - plat) / 2) * sin(radians(lat - plat) / 2)
             + cos(radians(plat)) * cos(radians(lat))
               * sin(radians(lon - plon) / 2) * sin(radians(lon - plon) / 2)
           )) / (CAST(nullif(t_ms - pt_ms, 0) AS DOUBLE) / 3600000.0), 3)
             AS speed_kmh
    FROM legs WHERE prev_event IS NOT NULL
    """,
    doc=(
        "per-entity trajectory legs: consecutive-fix geodesic distance, "
        "elapsed time, and speed via a lag window over (entity, time) — the "
        "batch sibling of the hotspot_track streaming state op"
    ),
)
def trajectory_speed(spark, sf_dir):
    """One window shuffle partitioned by entity (the natural key; per-user
    history fits a partition at any corpus scale because the window never
    crosses users). All arithmetic JVM-side; haversine shared with
    radius_join."""
    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "event_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
        ((F.col("event_id") * 7919 % 18000).cast("double") / 100.0 - 90.0).alias("lat"),
        ((F.col("event_id") * 104729 % 36000).cast("double") / 100.0 - 180.0).alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("t_ms", "event_id")
    legs = pts.select(
        "user_id",
        "event_id",
        "lat",
        "lon",
        "t_ms",
        F.lag("event_id").over(w).alias("prev_event"),
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
        F.lag("t_ms").over(w).alias("pt_ms"),
    ).filter(F.col("prev_event").isNotNull())
    dist = _haversine_km(F.col("plat"), F.col("plon"), F.col("lat"), F.col("lon"))
    return legs.select(
        "user_id",
        "prev_event",
        "event_id",
        F.round(dist, 3).alias("dist_km"),
        (F.col("t_ms") - F.col("pt_ms")).alias("dt_ms"),
        # nullif guard: a zero-duration leg (two fixes with identical
        # (user_id, t_ms)) must yield NULL speed on BOTH engines — DuckDB's
        # IEEE division would otherwise emit inf where Spark emits NULL.
        F.round(
            dist
            / (
                F.nullif((F.col("t_ms") - F.col("pt_ms")).cast("double"), F.lit(0.0))
                / 3600000.0
            ),
            3,
        ).alias("speed_kmh"),
    )


# PII scrubbing ---------------------------------------------------------------

_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE = "\\+1-555-[0-9]{4}"


@register(
    "pii_scrub",
    f"""
    WITH seeded AS (
      SELECT doc_id,
             text || ' contact user' || CAST(n_chars AS VARCHAR)
                  || '@example.com or +1-555-'
                  || lpad(CAST(n_chars % 10000 AS VARCHAR), 4, '0') AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
           substr(
             regexp_replace(
               regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g'),
             1, 80) AS clean_prefix,
           CAST(length(
             regexp_replace(
               regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g')) AS BIGINT) AS clean_len
    FROM seeded
    """,
    doc=(
        "PII redaction over the document corpus (emails + phone patterns "
        "seeded deterministically so the scrub is exercised): regexp_replace "
        "+ match counts — the training-pipeline privacy scrub pass"
    ),
)
def pii_scrub(spark, sf_dir):
    """Map-only JVM regex (whole-stage codegen; zero shuffles — the scrub is
    embarrassingly parallel at any corpus size). Patterns are restricted to
    syntax with identical semantics in Java regex and RE2 so the DuckDB
    oracle is literal."""
    docs = _t(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("n_chars").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("n_chars") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(F.col("text"), _PII_EMAIL, "<EMAIL>"), _PII_PHONE, "<PHONE>"
    )
    return seeded.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_EMAIL), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_PHONE), 0)).cast("long").alias("n_phones"),
        F.substring(clean, 1, 80).alias("clean_prefix"),
        F.length(clean).cast("long").alias("clean_len"),
    )


# hex grid path -----------------------------------------------------------------


def _hex_line_oracle_sql() -> str:
    from filda_spark import hex as hx

    enc_a = hx.encode_sql("a_lat", "a_lon", 7)
    enc_b = hx.encode_sql("b_lat", "b_lon", 7)
    qa, ra = hx.qr_sql_exact("ca")
    qb, rb = hx.qr_sql_exact("cb")
    cell = hx._cube_round_pack_sql("qf", "rf", 7)
    return f"""
    WITH p AS (
      SELECT event_id AS pair_id,
             CAST(event_id * 7919 % 5000 AS DOUBLE) / 10000.0 + 30.0 AS a_lat,
             CAST(event_id * 104729 % 5000 AS DOUBLE) / 10000.0 + 10.0 AS a_lon,
             CAST(event_id * 31 % 5000 AS DOUBLE) / 10000.0 + 30.0 AS b_lat,
             CAST(event_id * 57 % 5000 AS DOUBLE) / 10000.0 + 10.0 AS b_lon
      FROM events WHERE event_id < 200
    ),
    c AS (SELECT pair_id, {enc_a} AS ca, {enc_b} AS cb FROM p),
    q AS (SELECT pair_id, {qa} AS q0, {ra} AS r0, {qb} AS q1, {rb} AS r1 FROM c),
    dd AS (
      SELECT *, (abs(q1 - q0) + abs(r1 - r0) + abs(q1 - q0 + r1 - r0)) // 2 AS d
      FROM q
    ),
    e AS (SELECT pair_id, q0, r0, q1, r1, d, unnest(range(0, d + 1)) AS k FROM dd),
    lerp AS (
      SELECT pair_id, k,
             CAST(q0 AS DOUBLE)
             + (CAST(k AS DOUBLE) / CAST(greatest(d, 1) AS DOUBLE))
               * CAST(q1 - q0 AS DOUBLE) AS qf,
             CAST(r0 AS DOUBLE)
             + (CAST(k AS DOUBLE) / CAST(greatest(d, 1) AS DOUBLE))
               * CAST(r1 - r0 AS DOUBLE) AS rf
      FROM e
    )
    SELECT pair_id, CAST(k AS INT) AS k, {cell} AS cell FROM lerp
    """


@register(
    "hex_line",
    _hex_line_oracle_sql(),
    doc=(
        "hex grid path (H3 gridPathCells): the d+1 cells on the line "
        "between two endpoint cells via cube-lerp + hex rounding — "
        "completes the cell-set API (compact/uncompact/polyfill/path); "
        "oracle re-derives every path step with the bit-parity-tested "
        "cube-round SQL twin"
    ),
)
def hex_line(spark, sf_dir):
    """Path cells come from one Arrow kernel (`hex.line_np`) returning the
    per-pair cell array, then a map-side posexplode — same plan-size
    rationale as `hex.parent_pudf` (lerp+cube-round as Column algebra
    would inline the encode tree ~10x per rounding reference). Zero
    shuffles: the whole op is scan → Arrow map → Generate. Path length is
    data-bounded (endpoint hex distance), the map-side fan-out analogous
    to the kRing explode."""
    from filda_spark import hex as hx

    @F.pandas_udf("array<long>")
    def _line(a_lat: pd.Series, a_lon: pd.Series, b_lat: pd.Series, b_lon: pd.Series) -> pd.Series:
        if len(a_lat) == 0:
            return pd.Series([], dtype="object")
        offs, cells = hx.line_np(
            a_lat.to_numpy(), a_lon.to_numpy(), b_lat.to_numpy(), b_lon.to_numpy(), 7
        )
        return pd.Series(
            [cells[offs[i] : offs[i + 1]].tolist() for i in range(len(a_lat))]
        )

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    p = ev.select(
        F.col("event_id").alias("pair_id"),
        ((F.col("event_id") * 7919 % 5000).cast("double") / 10000.0 + 30.0).alias("a_lat"),
        ((F.col("event_id") * 104729 % 5000).cast("double") / 10000.0 + 10.0).alias("a_lon"),
        ((F.col("event_id") * 31 % 5000).cast("double") / 10000.0 + 30.0).alias("b_lat"),
        ((F.col("event_id") * 57 % 5000).cast("double") / 10000.0 + 10.0).alias("b_lon"),
    )
    return p.select(
        "pair_id",
        F.posexplode(_line("a_lat", "a_lon", "b_lat", "b_lon")).alias("k", "cell"),
    ).select("pair_id", F.col("k").cast("int").alias("k"), "cell")


# PageRank ----------------------------------------------------------------------

_PR_N = 200  # node id space (mod of order/part keys)
_PR_ITERS = 5
_PR_DAMP = 0.85
_PAGERANK_CACHED: list = []

# _persist_evict's own eviction list, deliberately SEPARATE from
# _PAGERANK_CACHED: pagerank/sssp trim their list to 2/4 entries at call
# time, and sharing one list let a graph op silently unpersist other
# queries' cell/edge caches queued behind it (the re-embedded-scan
# regression _persist_evict exists to prevent) — review finding r4.
_QUERY_CACHED: list = []


def _persist_evict(df: DataFrame, cap: int = 6) -> DataFrame:
    """Persist a small aggregated frame that a query references more than
    once (cell counts, distinct edges, bucket series — O(inhabited cells)
    or O(edges), never O(input rows)) so each downstream branch reads the
    cached frame instead of re-embedding the base scan + shuffle subtree
    (per-branch column pruning defeats ReuseExchange — the hex_compact
    finding; unpersisted, local_moran re-scanned the base table 7x and
    triangle_count 9x). Bounded eviction: at most ``cap`` frames stay
    alive; evicting a frame mid-use only forces recompute, never wrong
    results."""
    from pyspark import StorageLevel

    while len(_QUERY_CACHED) >= cap:
        _QUERY_CACHED.pop(0).unpersist()
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    _QUERY_CACHED.append(out)
    return out


def _pagerank_oracle_sql() -> str:
    """Fixed-iteration PageRank unrolled into chained CTEs — the SQL twin of
    the Spark loop, same float ops in the same per-term order (sum order is
    engine-dependent; the 6-dp round absorbs the ~1e-16 associativity
    drift)."""
    head = f"""
    WITH e AS (
      SELECT DISTINCT l_orderkey % {_PR_N} AS src, l_partkey % {_PR_N} AS dst
      FROM lineitem
    ),
    nodes AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION SELECT dst FROM e)),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS d FROM e GROUP BY src),
    r0 AS (SELECT v, 1.0 / (SELECT n FROM nn) AS r FROM nodes)"""
    steps = []
    for k in range(1, _PR_ITERS + 1):
        steps.append(f"""
    r{k} AS (
      SELECT n.v,
             {1.0 - _PR_DAMP!r} / (SELECT n FROM nn)
             + {_PR_DAMP} * coalesce(sum(p.r / deg.d), 0.0) AS r
      FROM nodes n
      LEFT JOIN e ON e.dst = n.v
      LEFT JOIN deg ON deg.src = e.src
      LEFT JOIN r{k - 1} p ON p.v = e.src
      GROUP BY n.v
    )""")
    return (
        head
        + ","
        + ",".join(steps)
        + f"\n    SELECT v AS node, round(r, 6) AS rank FROM r{_PR_ITERS}"
    )


@register(
    "pagerank",
    _pagerank_oracle_sql(),
    doc=(
        "fixed-iteration PageRank (5 rounds, damping 0.85) over the "
        "order->part graph — the iterative-algorithm class (same loop "
        "shape as dup_components' connected components) with a full SQL "
        "oracle via unrolled CTE rounds"
    ),
)
def pagerank(spark, sf_dir):
    """Each round is one equi-join (edges x ranks on src) + one partial-
    aggregated groupBy on dst + a left join back to the node set — the
    standard distributed PR step where the shuffle carries contributions,
    not the graph. The node and edge/degree frames are persisted (each is
    referenced by every round; without the cache Spark re-runs their
    distinct/aggregate per consumer — ReuseExchange only recovers the
    shuffle writes). At real iteration counts the loop adds
    localCheckpoint every few rounds exactly like dup_components
    (plan-size control); 5 static rounds stay well under that threshold.
    The damping base (1-d) is repr'd into the oracle SQL so both engines
    start from the identical float64 constant (DuckDB would otherwise
    evaluate `1.0 - 0.85` in exact DECIMAL, 1 ulp away); residual
    sum-order drift is absorbed by the 6-dp round."""
    li = _t(spark, sf_dir, "lineitem")
    e = (
        li.select(
            (F.col("l_orderkey") % _PR_N).alias("src"),
            (F.col("l_partkey") % _PR_N).alias("dst"),
        )
        .distinct()
    )
    from pyspark import StorageLevel

    # bounded cache release, same pattern as _hex_compact_df: keep the
    # previous invocation's frames (a pending plan may still reference
    # them), release anything older
    while len(_PAGERANK_CACHED) > 2:
        _PAGERANK_CACHED.pop(0).unpersist()

    nodes = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _PAGERANK_CACHED.append(nodes)
    n = float(nodes.count())  # also materializes the nodes cache
    deg = e.groupBy("src").agg(F.count("*").cast("double").alias("d"))
    ed = e.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    _PAGERANK_CACHED.append(ed)
    ranks = nodes.select("v", (F.lit(1.0) / F.lit(n)).alias("r"))
    base = (1.0 - _PR_DAMP) / n
    for _ in range(_PR_ITERS):
        contrib = (
            ed.join(ranks, ed.src == ranks.v)
            .select(F.col("dst").alias("v"), (F.col("r") / F.col("d")).alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contrib, "v", "left").select(
            "v",
            (F.lit(base) + F.lit(_PR_DAMP) * F.coalesce(F.col("s"), F.lit(0.0))).alias("r"),
        )
    return ranks.select(F.col("v").alias("node"), F.round("r", 6).alias("rank"))


# trajectory resampling ---------------------------------------------------------

_TI_W_MS = 21600000  # 6 h epoch grid
_TI_T0_MS = 1704067200000  # 2024-01-01T00:00Z — the corpus epoch
_TI_N = 121  # 30 days of 6-h epochs, inclusive


@register(
    "track_interpolate",
    f"""
    WITH pts AS (
      SELECT user_id, epoch_ms(ts) AS t_ms,
             CAST(event_id * 7919 % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat,
             CAST(event_id * 104729 % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon,
             event_id
      FROM events
    ),
    legs AS (
      SELECT user_id, t_ms AS t0, lat AS lat0, lon AS lon0,
             lead(t_ms) OVER w AS t1,
             lead(lat) OVER w AS lat1, lead(lon) OVER w AS lon1
      FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY t_ms, event_id)
    ),
    epochs AS (
      SELECT {_TI_T0_MS} + unnest(range(0, {_TI_N})) * {_TI_W_MS} AS e_ms
    )
    SELECT l.user_id, CAST(e.e_ms AS BIGINT) AS e_ms,
           round(l.lat0 + (CAST(e.e_ms - l.t0 AS DOUBLE) / CAST(l.t1 - l.t0 AS DOUBLE))
                 * (l.lat1 - l.lat0), 9) AS lat,
           round(l.lon0 + (CAST(e.e_ms - l.t0 AS DOUBLE) / CAST(l.t1 - l.t0 AS DOUBLE))
                 * (l.lon1 - l.lon0), 9) AS lon
    FROM legs l JOIN epochs e ON e.e_ms >= l.t0 AND e.e_ms < l.t1
    WHERE l.t1 IS NOT NULL
    """,
    doc=(
        "trajectory resampling: linearly interpolate each entity's track "
        "onto a fixed 6-h epoch grid — per-entity legs from one lead "
        "window, epoch∈[t0,t1) matching via the time-bucket cover "
        "equi-join, IEEE-identical lerp; the batch form of telemetry "
        "gap-filling (oracle is the plain range join)"
    ),
)
def track_interpolate(spark, sf_dir):
    """Legs come from the same single per-entity window as trajectory_speed
    (lead instead of lag); each leg explodes into the epoch buckets it
    spans (sequence of floor-divided ids — fan-out = leg duration / grid
    step, the data's own sparsity), epochs key by their single bucket, and
    the match is a pure equi-join + exact [t0, t1) refine. The lerp
    fraction is integer-ms subtraction then one double divide — identical
    IEEE ops on both engines."""
    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "event_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
        ((F.col("event_id") * 7919 % 18000).cast("double") / 100.0 - 90.0).alias("lat"),
        ((F.col("event_id") * 104729 % 36000).cast("double") / 100.0 - 180.0).alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("t_ms", "event_id")
    legs = pts.select(
        "user_id",
        F.col("t_ms").alias("t0"),
        F.col("lat").alias("lat0"),
        F.col("lon").alias("lon0"),
        F.lead("t_ms").over(w).alias("t1"),
        F.lead("lat").over(w).alias("lat1"),
        F.lead("lon").over(w).alias("lon1"),
    ).filter(F.col("t1").isNotNull())
    legs_b = legs.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col("t0") / _TI_W_MS), F.floor((F.col("t1") - 1) / _TI_W_MS)
            )
        ).alias("bucket"),
    )
    epochs = spark.range(_TI_N).select(
        (F.lit(_TI_T0_MS) + F.col("id") * _TI_W_MS).alias("e_ms")
    )
    epochs = epochs.withColumn("bucket", F.floor(F.col("e_ms") / _TI_W_MS))
    frac = (F.col("e_ms") - F.col("t0")).cast("double") / (
        F.col("t1") - F.col("t0")
    ).cast("double")
    return (
        legs_b.join(epochs, "bucket")
        .filter((F.col("e_ms") >= F.col("t0")) & (F.col("e_ms") < F.col("t1")))
        .select(
            "user_id",
            F.col("e_ms").cast("long").alias("e_ms"),
            F.round(F.col("lat0") + frac * (F.col("lat1") - F.col("lat0")), 9).alias("lat"),
            F.round(F.col("lon0") + frac * (F.col("lon1") - F.col("lon0")), 9).alias("lon"),
        )
    )


# HyperLogLog register sketch ---------------------------------------------------

_HLL_M = 256  # 2^8 registers


@register(
    "hll_registers",
    f"""
    WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
    h AS (
      SELECT event_type,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM d
    ),
    rw AS (
      SELECT event_type, h % {_HLL_M} AS register, h // {_HLL_M} AS w FROM h
    )
    SELECT event_type, register,
           CAST(max(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS INT) AS max_rho
    FROM rw GROUP BY event_type, register
    """,
    doc=(
        "HyperLogLog register state (p=8, 256 registers) per group: md5 "
        "hash -> (register, leading-zero rank), max per register — the "
        "mergeable cardinality sketch; deterministic here because the hash "
        "and the exact bin()-length rank are identical on both engines "
        "(closes kmv_distinct's 'unlike HLL' remark)"
    ),
)
def hll_registers(spark, sf_dir):
    """The sketch state IS the output (integer-exact parity; the estimator
    is plain arithmetic over 256 rows — pinned against the true count in
    tests). Shape at scale: one map pass + a groupBy on (group, register)
    whose partial aggregation does the register-max map-side, so the
    shuffle carries at most m=256 rows per group per task — the textbook
    mergeable-sketch plan. rho uses length(bin(w)) (exact integer bit
    length) instead of floor(log2): log2 rounds up near powers of two
    (log2(2^48-1) rounds to 48.0 in float64), which would corrupt ranks."""
    d = _t(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    h = d.select(
        "event_type",
        _h60("user_id").alias("h"),
    )
    rw = h.select(
        "event_type",
        (F.col("h") % _HLL_M).alias("register"),
        # shiftright, NOT floor(h/256): double division corrupts w for
        # h > 2^53 (~17% of 60-bit hashes are off by 1), and a corrupted w
        # at a power-of-two boundary flips length(bin(w)) vs the oracle's
        # exact integer h // 256
        F.shiftright(F.col("h"), _HLL_M.bit_length() - 1).alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.bin(F.col("w")))
    )
    return (
        rw.select("event_type", "register", rho.alias("rho"))
        .groupBy("event_type", "register")
        .agg(F.max("rho").cast("int").alias("max_rho"))
    )


# deterministic weighted sample --------------------------------------------------

_WS_K = 20


@register(
    "weighted_sample",
    f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE)
               / 1152921504606846976.0
               / CAST(n_chars + 1 AS DOUBLE) AS k
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, n_chars, k,
             row_number() OVER (ORDER BY k, doc_id) AS rnk
      FROM keyed
    )
    SELECT CAST(rnk AS INT) AS rnk, doc_id, n_chars, k
    FROM ranked WHERE rnk <= {_WS_K}
    """,
    doc=(
        "deterministic weighted priority sample (top-k by uniform-race key "
        "u/w, u = md5-derived uniform, w = doc length): P(i beats j) = "
        "w_i/(w_i+w_j), the weighted-sampling primitive for training-data "
        "curation; fully deterministic, so the oracle is exact"
    ),
)
def weighted_sample(spark, sf_dir):
    """Key = (h/2^60)/w — every step (int->double cast, divide by a power
    of two, divide by the weight) is the identical IEEE-754 operation on
    both engines, so ordering and output bits match exactly without
    transcendentals (exp/ln implementations differ across libms and would
    break near-tie ordering). Catalyst rewrites `row_number <= k` to
    `WindowGroupLimit`: per-partition top-k before the single-partition
    final ranking, so the global sort never materializes — the same
    partial/merge shape a distributed A-Res sampler hand-builds."""
    docs = _t(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "n_chars",
        (
            _h60("doc_id").cast("double")
            / F.lit(1152921504606846976.0)
            / (F.col("n_chars") + 1).cast("double")
        ).alias("k"),
    )
    w = Window.orderBy("k", "doc_id")
    return (
        keyed.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _WS_K)
        .select(F.col("rnk").cast("int").alias("rnk"), "doc_id", "n_chars", "k")
    )


# spatiotemporal pair join ------------------------------------------------------

_ST_D = 0.5  # spatial radius, degrees (planar patch domain)
_ST_T_MS = 86400000  # temporal radius, ms (24 h)


@register(
    "spatiotemporal_join",
    f"""
    WITH p AS (
      SELECT event_id, epoch_ms(ts) AS t_ms,
             CAST(event_id * 7919 % 2000 AS DOUBLE) / 100.0 AS lat,
             CAST(event_id * 104729 % 2400 AS DOUBLE) / 100.0 + 10.0 AS lon
      FROM events
    )
    SELECT a.event_id AS a_id, b.event_id AS b_id,
           round((a.lat-b.lat)*(a.lat-b.lat) + (a.lon-b.lon)*(a.lon-b.lon), 9) AS d2,
           CAST(abs(a.t_ms - b.t_ms) AS BIGINT) AS dt_ms
    FROM p a JOIN p b
      ON a.event_id < b.event_id
     AND abs(a.t_ms - b.t_ms) <= {_ST_T_MS}
     AND (a.lat-b.lat)*(a.lat-b.lat) + (a.lon-b.lon)*(a.lon-b.lon) <= {_ST_D * _ST_D!r}
    """,
    doc=(
        "spatiotemporal pair join (moving-object co-location): all event "
        "pairs within 0.5 deg AND 24 h via a combined (cell, time-bucket) "
        "cover equi-join; oracle is the plain range join, so parity checks "
        "the 3x3x3 cover construction"
    ),
)
def spatiotemporal_join(spark, sf_dir):
    return _spatiotemporal_pairs(spark, sf_dir)


ST_PAIR_CAP = 25_000_000  # candidate pairs per (key, salt) task before salting


_RING2 = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
_RING3 = [
    (dy, dx, dt) for dy in (-1, 0, 1) for dx in (-1, 0, 1) for dt in (-1, 0, 1)
]


def _c2(n: Column) -> Column:
    """C(n,2) = n(n-1)/2 in pure int64 ops (shift + bitand — no double
    division, whose 2^53 mantissa silently rounds counts past ~9e15;
    review finding r4). Exact until the RESULT overflows int64
    (n > ~4.3e9); the SQL twin is (n // 2)*(n-1) + (n % 2)*((n-1) // 2)."""
    return F.shiftright(n, 1) * (n - 1) + n.bitwiseAND(F.lit(1)) * F.shiftright(
        n - 1, 1
    )


def _spatiotemporal_pairs(
    spark,
    sf_dir,
    pair_cap: float = ST_PAIR_CAP,
    n_salt: int = 8,
    events: DataFrame | None = None,
):
    """The space AND time composition of radius_join and interval_join: one
    side keys by its own (cy, cx, tb), the other replicates into the 3x3
    spatial ring x 3 time buckets (cell size = D, bucket width = T, so
    matching pairs differ by <= 1 in every key component). Each pair meets
    exactly once — at the left point's own key — so no dedup pass. The
    27x replication is a constant map-side fan-out; the join itself is a
    pure equi-join on (cy, cx, tb), shuffled on composite keys that follow
    the data distribution.

    Hotspot salting rides ``_salted_cover_join`` (one implementation for
    every cover join; the inline copy this function originally carried is
    gone — review finding r4)."""
    ev = events if events is not None else _t(spark, sf_dir, "events")
    p = ev.select(
        "event_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
        ((F.col("event_id") * 7919 % 2000).cast("double") / 100.0).alias("lat"),
        (((F.col("event_id") * 104729 % 2400).cast("double") / 100.0) + 10.0).alias("lon"),
    )
    a = p.select(
        F.col("event_id").alias("a_id"),
        F.col("t_ms").alias("a_ms"),
        F.col("lat").alias("a_lat"),
        F.col("lon").alias("a_lon"),
        F.floor(F.col("lat") / _ST_D).alias("cy"),
        F.floor(F.col("lon") / _ST_D).alias("cx"),
        F.floor(F.col("t_ms") / _ST_T_MS).alias("tb"),
    )
    nbr = F.explode(
        F.array(
            *[
                F.struct(
                    (F.floor(F.col("lat") / _ST_D) + F.lit(dy)).alias("cy"),
                    (F.floor(F.col("lon") / _ST_D) + F.lit(dx)).alias("cx"),
                    (F.floor(F.col("t_ms") / _ST_T_MS) + F.lit(dt)).alias("tb"),
                )
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
                for dt in (-1, 0, 1)
            ]
        )
    ).alias("k")
    b = p.select(
        F.col("event_id").alias("b_id"),
        F.col("t_ms").alias("b_ms"),
        F.col("lat").alias("b_lat"),
        F.col("lon").alias("b_lon"),
        nbr,
    ).select(
        "b_id", "b_ms", "b_lat", "b_lon",
        F.col("k.cy").alias("cy"), F.col("k.cx").alias("cx"), F.col("k.tb").alias("tb"),
    )
    d2 = (F.col("a_lat") - F.col("b_lat")) * (F.col("a_lat") - F.col("b_lat")) + (
        F.col("a_lon") - F.col("b_lon")
    ) * (F.col("a_lon") - F.col("b_lon"))
    dt = F.abs(F.col("a_ms") - F.col("b_ms"))
    return (
        _salted_cover_join(
            spark, a, b, ["cy", "cx", "tb"], "a_id",
            pair_cap=pair_cap, n_salt=n_salt, ring=_RING3,
        )
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (dt <= F.lit(_ST_T_MS))
            & (d2 <= F.lit(_ST_D * _ST_D))
        )
        .select(
            "a_id",
            "b_id",
            F.round(d2, 9).alias("d2"),
            dt.cast("long").alias("dt_ms"),
        )
    )


def _ring_explode(
    df: DataFrame,
    gy: Column,
    gx: Column,
    carried: list,
    radius: int = 1,
    names: tuple[str, str] = ("gy", "gx"),
) -> DataFrame:
    """Explode ``df`` into its (2r+1)^2 neighbor cover cells: the build
    side of every 2D cover equi-join (radius_join / ripley_k / knox_pairs
    / colocation_patterns / empirical_variogram / the skew benches).
    ``carried`` columns ride along unchanged; the output keys on
    ``names``. Constant map-side fan-out — no shuffle."""
    ny, nx = names
    k = F.explode(
        F.array(
            *[
                F.struct((gy + dy).alias(ny), (gx + dx).alias(nx))
                for dy in range(-radius, radius + 1)
                for dx in range(-radius, radius + 1)
            ]
        )
    ).alias("_k")
    base = df.select(*carried, k)
    kept = [c for c in base.columns if c != "_k"]
    return base.select(
        *kept, F.col(f"_k.{ny}").alias(ny), F.col(f"_k.{nx}").alias(nx)
    )


def _salted_cover_join(
    spark,
    left: DataFrame,
    right: DataFrame,
    key: list[str],
    left_id: str,
    pair_cap: float = ST_PAIR_CAP,
    n_salt: int = 8,
    ring: list[tuple] | None = None,
) -> DataFrame:
    """The hot-key lever for every cover join whose pair volume explodes
    AFTER the join: ``left`` keys by its own cover cell, ``right`` is the
    exploded neighbor side. Keys whose candidate-pair volume
    (left rows x right fan-in) exceeds ``pair_cap`` split ``n_salt`` ways
    (left at hash(id) %% n_salt, right replicated across salts for hot
    keys only — each pair still meets exactly once, at the left row's
    salt); the explicit repartition keeps join parallelism proportional
    to the PAIR workload, which byte-based planning and AQE coalescing
    cannot see (a one-file scan otherwise runs the whole candidate
    expansion in 1-2 tasks — the pipeline.dedup finding; measured 55.6 s
    -> 9.9 s for ripley_k at sf0.1/local[32]).

    Hot detection deliberately uses BOTH sides: a below-threshold cell
    adjacent to a megacity receives the megacity's full right-side
    fan-in, so left-count-only detection leaves that key's pair stream
    in one task (review finding r4). When ``right`` is the ring-explode
    of the SAME point set as ``left`` (every current caller), pass the
    explode's offset tuples as ``ring`` and the fan-in is derived from
    the left counts at O(keys x |ring|) cost — the hot set is only an
    execution-strategy input (any hot set yields identical results, see
    the invariance test), so a mismatched ring can cost time, never
    correctness. Without ``ring`` the exploded right is counted directly
    (one partial-agg pass, generic). Salting splits the LEFT rows, so
    the lever caps a hot key's task at ~(lc/n_salt)*rc pairs; the
    residual un-splittable case (lc ~ 1, rc huge) is linear in rc, not
    quadratic — any quadratic blow-up has lc large and splits."""
    lc = left.groupBy(*key).agg(F.count(F.lit(1)).alias("_lc"))
    if ring is not None:
        lc = _persist_evict(lc)  # referenced by the fan-in derivation AND hot
        rc = (
            lc.select(
                "_lc",
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                *[
                                    (F.col(k) + F.lit(off[i])).alias(k)
                                    for i, k in enumerate(key)
                                ]
                            )
                            for off in ring
                        ]
                    )
                ).alias("_k"),
            )
            .select("_lc", *[F.col(f"_k.{k}").alias(k) for k in key])
            .groupBy(*key)
            .agg(F.sum("_lc").alias("_rc"))
        )
    else:
        rc = right.groupBy(*key).agg(F.count(F.lit(1)).alias("_rc"))
    hot = (
        lc.join(rc, key)
        .filter(
            F.col("_lc").cast("double") * F.col("_rc").cast("double")
            > F.lit(float(pair_cap))
        )
        .select(*key, F.lit(True).alias("_hot"))
    )
    lf = (
        left.join(F.broadcast(hot), key, "left")
        .withColumn(
            "_salt",
            F.when(F.col("_hot"), F.pmod(F.hash(left_id), F.lit(n_salt))).otherwise(
                F.lit(0)
            ),
        )
        .drop("_hot")
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    lf = lf.repartition(n_parts, *key, "_salt")
    rt = (
        right.join(F.broadcast(hot), key, "left")
        .withColumn(
            "_salt",
            F.explode(
                F.when(
                    F.col("_hot"), F.sequence(F.lit(0), F.lit(n_salt - 1))
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        .drop("_hot")
    )
    return lf.join(rt, key + ["_salt"]).drop("_salt")


# ranked kNN join -------------------------------------------------------------


@register(
    "knn_join",
    """
    WITH pts AS (
      SELECT c_custkey,
             CAST(c_custkey * 37 % 300 AS DOUBLE) / 10.0 - 15.0 AS lat,
             CAST(c_custkey * 73 % 720 AS DOUBLE) / 10.0 - 36.0 AS lon
      FROM customer
    ), cells AS (
      SELECT c_custkey, lat, lon,
             CAST(floor(lat) AS BIGINT) AS cy, CAST(floor(lon) AS BIGINT) AS cx
      FROM pts
    ), pairs AS (
      SELECT a.c_custkey AS c_custkey, b.c_custkey AS nb_key,
             (a.lat - b.lat) * (a.lat - b.lat)
             + (a.lon - b.lon) * (a.lon - b.lon) AS d2
      FROM cells a JOIN cells b
        ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
       AND a.c_custkey <> b.c_custkey
       AND (a.lat - b.lat) * (a.lat - b.lat)
           + (a.lon - b.lon) * (a.lon - b.lon) <= 1.0
    ), ranked AS (
      SELECT c_custkey, nb_key, d2,
             row_number() OVER (PARTITION BY c_custkey ORDER BY d2, nb_key) AS rnk
      FROM pairs
    )
    SELECT c_custkey, CAST(rnk AS INT) AS rnk, nb_key, round(d2, 9) AS d2
    FROM ranked WHERE rnk <= 3
    """,
    doc=(
        "ranked k-nearest-neighbour join (k=3 within the cover radius): the "
        "cell_knn_count cover join plus a per-point top-k window — the "
        "bounded-kNN formulation that scales (unbounded kNN needs an "
        "expanding-ring search)"
    ),
)
def knn_join(spark, sf_dir):
    """Same cell-neighborhood shuffle as `cell_knn_count` (kRing duplicate →
    pure equi-join on the cell key), then one window per query point.
    Catalyst rewrites the `row_number <= k` filter to `WindowGroupLimit`
    (per-partition top-k before the exchange), so the shuffle carries at
    most k rows per point — the same partial/merge shape a dedicated kNN
    operator would hand-build. Ties broken on (d2, nb_key): both engines
    compute d2 with identical float64 ops, so ranking is deterministic."""
    c = _t(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") * 37 % 300).cast("double") / 10.0 - 15.0).alias("lat"),
        ((F.col("c_custkey") * 73 % 720).cast("double") / 10.0 - 36.0).alias("lon"),
    )
    cells = pts.select("*", F.floor("lat").alias("cy"), F.floor("lon").alias("cx"))
    ring = (
        cells.select(
            F.col("c_custkey").alias("nb_key"),
            F.col("lat").alias("b_lat"),
            F.col("lon").alias("b_lon"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            (F.col("cx") + F.lit(dx)).alias("cx"),
                            (F.col("cy") + F.lit(dy)).alias("cy"),
                        )
                        for dx in (-1, 0, 1)
                        for dy in (-1, 0, 1)
                    ]
                )
            ).alias("cell"),
        )
        .select(
            "nb_key", "b_lat", "b_lon",
            F.col("cell.cx").alias("cx"), F.col("cell.cy").alias("cy"),
        )
    )
    d2 = (F.col("lat") - F.col("b_lat")) * (F.col("lat") - F.col("b_lat")) + (
        F.col("lon") - F.col("b_lon")
    ) * (F.col("lon") - F.col("b_lon"))
    pairs = (
        cells.join(ring, ["cy", "cx"])
        .filter((F.col("c_custkey") != F.col("nb_key")) & (d2 <= F.lit(1.0)))
        .select("c_custkey", "nb_key", d2.alias("d2"))
    )
    w = Window.partitionBy("c_custkey").orderBy("d2", "nb_key")
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_custkey", "rnk", "nb_key", F.round("d2", 9).alias("d2"))
    )


# SCD2 dimension history -------------------------------------------------------


@register(
    "scd2_history",
    """
    WITH ordered AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             lag(o_orderstatus) OVER w AS prev_status
      FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ), changes AS (
      SELECT o_custkey, o_orderstatus AS status, o_orderdate AS valid_from, o_orderkey
      FROM ordered
      WHERE prev_status IS NULL OR o_orderstatus <> prev_status
    )
    SELECT o_custkey,
           CAST(row_number() OVER w2 AS INT) AS version,
           status,
           strftime(valid_from, '%Y-%m-%d') AS valid_from,
           strftime(lead(valid_from) OVER w2, '%Y-%m-%d') AS valid_to
    FROM changes WINDOW w2 AS (PARTITION BY o_custkey ORDER BY valid_from, o_orderkey)
    """,
    doc=(
        "slowly-changing-dimension type-2 history: collapse a per-entity "
        "event stream into versioned validity intervals (valid_from / "
        "valid_to, NULL = current) — the change-data-capture compaction an "
        "Iceberg dimension table needs"
    ),
)
def scd2_history(spark, sf_dir):
    """Two windows over ONE per-entity shuffle (same partitioning, Catalyst
    reuses the exchange): lag() marks status changes, then row_number +
    lead() on the surviving change rows build the closed-open intervals.
    Per-entity history fits a partition at any corpus scale because the
    windows never cross entities."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ordered = o.select(
        "o_custkey",
        "o_orderstatus",
        "o_orderdate",
        "o_orderkey",
        F.lag("o_orderstatus").over(w).alias("prev_status"),
    )
    changes = ordered.filter(
        F.col("prev_status").isNull()
        | (F.col("o_orderstatus") != F.col("prev_status"))
    ).select(
        "o_custkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("valid_from"),
        "o_orderkey",
    )
    w2 = Window.partitionBy("o_custkey").orderBy("valid_from", "o_orderkey")
    return changes.select(
        "o_custkey",
        F.row_number().over(w2).alias("version"),
        "status",
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.date_format(F.lead("valid_from").over(w2), "yyyy-MM-dd").alias("valid_to"),
    )


# Spatial layout / index keys (round 4) -------------------------------------
#
# Z-order (Morton) interleave and geohash share one bit-spreading ladder,
# expressed identically as JVM column algebra (Spark) and integer SQL
# (DuckDB) so parity pins every bit. The masks are the classic 16-bit ->
# 32-bit spread constants.

_SPREAD_MASKS = ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555))


def _spread16(col):
    """Spread the low 16 bits of ``col`` to the even bit positions of a
    32-bit lane (Morton half-interleave), all JVM-side."""
    for sh, mask in _SPREAD_MASKS:
        col = (col.bitwiseOR(F.shiftleft(col, sh))).bitwiseAND(F.lit(mask))
    return col


# the shared synthetic point field (same derivation as spatiotemporal_join:
# deterministic lat/lon from event_id so no external data is needed)
_PT_SQL = """
      SELECT event_id,
             CAST(event_id * 7919 % 2000 AS DOUBLE) / 100.0 AS lat,
             CAST(event_id * 104729 % 2400 AS DOUBLE) / 100.0 + 10.0 AS lon
      FROM events
"""


def _pt_df(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        ((F.col("event_id") * 7919 % 2000).cast("double") / 100.0).alias("lat"),
        (((F.col("event_id") * 104729 % 2400).cast("double") / 100.0) + 10.0).alias("lon"),
    )


def _interleave_cte_sql(scale: int, prefix: str) -> tuple[str, str]:
    """DuckDB CTE chain: quantize both axes to ``scale`` steps (clamped to
    scale-1), then thread the four spread steps through successive SELECTs
    (inlining would duplicate the expression 2^4 times). Returns
    (cte_chain, last_cte_name)."""
    chain = [
        f"""q AS (
      SELECT event_id,
             least(CAST(floor((lat + 90.0) / 180.0 * {scale}.0) AS BIGINT), {scale - 1}) AS qy,
             least(CAST(floor((lon + 180.0) / 360.0 * {scale}.0) AS BIGINT), {scale - 1}) AS qx
      FROM p
    )"""
    ]
    prev = "q"
    for i, (sh, mask) in enumerate(_SPREAD_MASKS):
        chain.append(
            f"""{prefix}{i} AS (
      SELECT event_id,
             ((qy | (qy << {sh})) & {mask}) AS qy,
             ((qx | (qx << {sh})) & {mask}) AS qx
      FROM {prev}
    )"""
        )
        prev = f"{prefix}{i}"
    return ",\n    ".join(chain), prev


_Z_CTES, _Z_LAST = _interleave_cte_sql(65536, "s")


@register(
    "zorder_key",
    f"""
    WITH p AS ({_PT_SQL}),
    {_Z_CTES}
    SELECT event_id,
           ((qx << 1) | qy) AS zkey,
           (((qx << 1) | qy) >> 22) AS zbucket
    FROM {_Z_LAST}
    """,
    doc=(
        "Z-order (Morton) layout key: 16-bit quantized lat/lon bit-interleaved "
        "to a 32-bit key plus a 1024-way range bucket — the Iceberg "
        "sort-order / file-clustering key that co-locates spatially adjacent "
        "detections so bbox scans prune row groups (the 100 TB layout lever "
        "behind runner's tile_id partitioning; cf. get_files pruning, "
        "src/FILDA2/FILDA_IO.py:40-381)"
    ),
)
def zorder_key(spark, sf_dir):
    """Pure whole-stage-codegen integer algebra (quantize -> spread ->
    interleave), zero shuffles, zero Python: the layout key is computed at
    scan speed, and writing `repartitionByRange(zbucket).sortWithinPartitions
    (zkey)` yields the space-filling-curve file layout. Exact-int parity
    with the oracle pins every bit of the interleave."""
    p = _pt_df(spark, sf_dir)
    qy = F.least(
        F.floor((F.col("lat") + 90.0) / 180.0 * 65536.0).cast("long"), F.lit(65535)
    )
    qx = F.least(
        F.floor((F.col("lon") + 180.0) / 360.0 * 65536.0).cast("long"), F.lit(65535)
    )
    z = F.shiftleft(_spread16(qx), 1).bitwiseOR(_spread16(qy))
    return p.select(
        "event_id",
        z.alias("zkey"),
        F.shiftright(z, 22).alias("zbucket"),
    )


_GH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


_GH_CTES, _GH_LAST = _interleave_cte_sql(32768, "g")

_GH_CHARS_SQL = " || ".join(
    f"substr('{_GH_B32}', CAST(((z >> {25 - 5 * i}) & 31) AS INT) + 1, 1)"
    for i in range(6)
)


@register(
    "geohash_encode",
    f"""
    WITH p AS ({_PT_SQL}),
    {_GH_CTES},
    zz AS (SELECT event_id, ((qx << 1) | qy) AS z FROM {_GH_LAST})
    SELECT event_id, {_GH_CHARS_SQL} AS gh6
    FROM zz
    """,
    doc=(
        "geohash base32 cell id (precision 6): the fourth spatial index "
        "family beside the engine's hex (H3-style), S2 token, and qcell "
        "grids — bit-for-bit the canonical bisection geohash, computed as a "
        "15-bit quantize + Morton interleave + base32 digit extraction "
        "(validated against u4pruy/wx4g09/r3gx2f known cells)"
    ),
)
def geohash_encode(spark, sf_dir):
    """Same zero-shuffle codegen ladder as zorder_key at 15 bits/axis with
    lon leading (geohash bit order), then six substring lookups on the
    base32 literal — no UDF, no Python; the quantized binary digits equal
    the classic interval-bisection bits exactly."""
    p = _pt_df(spark, sf_dir)
    qy = F.least(
        F.floor((F.col("lat") + 90.0) / 180.0 * 32768.0).cast("long"), F.lit(32767)
    )
    qx = F.least(
        F.floor((F.col("lon") + 180.0) / 360.0 * 32768.0).cast("long"), F.lit(32767)
    )
    z = F.shiftleft(_spread16(qx), 1).bitwiseOR(_spread16(qy))
    gh = F.concat(
        *[
            F.substring(
                F.lit(_GH_B32),
                F.shiftright(z, 25 - 5 * i).bitwiseAND(F.lit(31)).cast("int") + 1,
                1,
            )
            for i in range(6)
        ]
    )
    return p.select("event_id", gh.alias("gh6"))


_UNSPREAD_MASKS = ((1, 0x33333333), (2, 0x0F0F0F0F), (4, 0x00FF00FF), (8, 0x0000FFFF))


def _unspread16(col):
    """Inverse of _spread16: gather the even bit positions of a 32-bit lane
    back into the low 16 bits."""
    col = col.bitwiseAND(F.lit(0x55555555))
    for sh, mask in _UNSPREAD_MASKS:
        col = (col.bitwiseOR(F.shiftright(col, sh))).bitwiseAND(F.lit(mask))
    return col


_GH_DEC_VAL = " + ".join(
    f"((strpos('{_GH_B32}', substr(gh6, {i + 1}, 1)) - 1) << {25 - 5 * i})"
    for i in range(6)
)


def _unspread_cte_sql(prefix: str) -> tuple[str, str]:
    """DuckDB CTE chain gathering both interleaved axes (zy, zx) back to
    15-bit quantized values; input CTE must provide (event_id, gh6, zy, zx)
    with the axis lanes pre-masked to the even positions."""
    chain = []
    prev = f"{prefix}in"
    for i, (sh, mask) in enumerate(_UNSPREAD_MASKS):
        chain.append(
            f"""{prefix}{i} AS (
      SELECT event_id, gh6,
             ((zy | (zy >> {sh})) & {mask}) AS zy,
             ((zx | (zx >> {sh})) & {mask}) AS zx
      FROM {prev}
    )"""
        )
        prev = f"{prefix}{i}"
    return ",\n    ".join(chain), prev


_GHD_CTES, _GHD_LAST = _unspread_cte_sql("u")


@register(
    "geohash_decode",
    f"""
    WITH p AS ({_PT_SQL}),
    {_GH_CTES},
    enc AS (SELECT event_id, {_GH_CHARS_SQL} AS gh6
            FROM (SELECT event_id, ((qx << 1) | qy) AS z FROM {_GH_LAST}) zz),
    zv AS (SELECT event_id, gh6, ({_GH_DEC_VAL}) AS z FROM enc),
    uin AS (SELECT event_id, gh6,
                   (z & 1431655765) AS zy,
                   ((z >> 1) & 1431655765) AS zx
            FROM zv),
    {_GHD_CTES}
    SELECT event_id, gh6, zy AS qy15, zx AS qx15,
           round((CAST(zy AS DOUBLE) + 0.5) / 32768.0 * 180.0 - 90.0, 9) AS cell_lat,
           round((CAST(zx AS DOUBLE) + 0.5) / 32768.0 * 360.0 - 180.0, 9) AS cell_lon
    FROM {_GHD_LAST}
    """,
    doc=(
        "geohash decode (string -> quantized axes -> cell center): base32 "
        "digit lookup + the inverse bit-gather ladder, completing the "
        "encode/decode round trip; parity pins the un-interleave algebra "
        "bit for bit on both engines"
    ),
)
def geohash_decode(spark, sf_dir):
    """Decodes from the STRING (six instr lookups on the base32 literal ->
    30-bit code -> lane mask -> gather ladder), not from the intermediate
    interleave, so the oracle checks the full inverse path. Same
    zero-shuffle whole-stage-codegen posture as the encode."""
    enc = geohash_encode(spark, sf_dir)
    z = None
    for i in range(6):
        v = (
            F.expr(f"instr('{_GH_B32}', substring(gh6, {i + 1}, 1))").cast("long")
            - 1
        ) * F.lit(1 << (25 - 5 * i)).cast("long")
        z = v if z is None else z + v
    zy = _unspread16(z)
    zx = _unspread16(F.shiftright(z, 1))
    return enc.select(
        "event_id",
        "gh6",
        zy.alias("qy15"),
        zx.alias("qx15"),
        F.round((zy.cast("double") + 0.5) / 32768.0 * 180.0 - 90.0, 9).alias("cell_lat"),
        F.round((zx.cast("double") + 0.5) / 32768.0 * 360.0 - 180.0, 9).alias("cell_lon"),
    )


@register(
    "tile_pyramid",
    f"""
    WITH p AS ({_PT_SQL}),
    base AS (
      SELECT CAST(floor(lat * 8.0) AS BIGINT) AS cy0,
             CAST(floor(lon * 8.0) AS BIGINT) AS cx0,
             CAST(event_id % 97 AS BIGINT) AS w
      FROM p
    )
    SELECT lv.level,
           (cy0 >> lv.level) AS cy,
           (cx0 >> lv.level) AS cx,
           count(*) AS n_pts,
           sum(w) AS sum_w
    FROM base CROSS JOIN (VALUES (0), (1), (2), (3)) lv(level)
    GROUP BY lv.level, (cy0 >> lv.level), (cx0 >> lv.level)
    """,
    doc=(
        "raster tile pyramid: fire-density rollup across 4 zoom levels "
        "(parent cell = child >> 1 per level) in ONE aggregation — the "
        "multi-resolution gridded fire-density product the north star's "
        "'rasterized back to gridded fire-density tiles' implies at serving "
        "time (cf. runner's tiles table; gen_fire_img_mask grid, "
        "src/FILDA2/FILDA_Rad.py)"
    ),
)
def tile_pyramid(spark, sf_dir):
    """All zoom levels from one scan: a constant 4x map-side fan-out
    (posexplode of the level array) feeds a single partial-aggregated
    groupBy on (level, cy, cx) — one Exchange total, vs. the naive
    level-at-a-time loop's 4 scans + 4 shuffles. Weights are integers so
    SUM is exact across engines (no float accumulation-order hazard).
    At scale the coarser levels could alternatively roll up from the
    finished finest level (less shuffle volume), but that serializes the
    levels; the fan-out keeps them in one stage."""
    p = _pt_df(spark, sf_dir)
    base = p.select(
        F.floor(F.col("lat") * 8.0).cast("long").alias("cy0"),
        F.floor(F.col("lon") * 8.0).cast("long").alias("cx0"),
        (F.col("event_id") % 97).cast("long").alias("w"),
    )
    lv = base.select(
        "cy0", "cx0", "w", F.explode(F.array(*[F.lit(k) for k in range(4)])).alias("level")
    )
    return (
        lv.groupBy(
            "level",
            F.expr("shiftright(cy0, level)").alias("cy"),
            F.expr("shiftright(cx0, level)").alias("cx"),
        )
        .agg(F.count(F.lit(1)).alias("n_pts"), F.sum("w").alias("sum_w"))
    )


_DB_EPS = 0.2  # DBSCAN radius, degrees (planar patch domain, as spatiotemporal)
_DB_MINPTS = 4  # core point: >= minPts points within eps INCLUDING itself
# static regional window: keeps the op non-degenerate at EVERY sf — on the
# full synthetic lattice at sf0.1 the density is high enough that the whole
# 20x24 deg domain fuses into ONE component whose graph diameter (~220
# hops) is the worst case for any iterative CC; a fixed 4x4 deg region is
# the realistic "cluster this area's detections" query shape and bounds the
# component diameter independent of corpus scale (the pointer-doubling CC
# handles long chains regardless — this bounds total pair volume)
_DB_LAT_MAX = 4.0
_DB_LON_MAX = 14.0
_DB_BLOCK = 2.0  # local union-find contraction block, degrees (10x eps)


def _block_union_find(pdf: pd.DataFrame) -> pd.DataFrame:
    """Union-find over one spatial block's core-core edges; emits the
    node->root star mapping (a spanning forest of the block subgraph).
    Path-compressed, iterative (no recursion limits)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for s, d in zip(pdf["a_id"].to_numpy(), pdf["b_id"].to_numpy()):
        s, d = int(s), int(d)
        if s not in parent:
            parent[s] = s
        if d not in parent:
            parent[d] = d
        rs, rd = find(s), find(d)
        if rs != rd:
            if rs < rd:  # min-id root keeps labels monotone toward the min
                parent[rd] = rs
            else:
                parent[rs] = rd
    nodes = list(parent)
    return pd.DataFrame(
        {"src": nodes, "dst": [find(n) for n in nodes]}, dtype="int64"
    )


@register(
    "dbscan_clusters",
    f"""
    WITH RECURSIVE p0 AS ({_PT_SQL}),
    p AS (
      SELECT * FROM p0 WHERE lat < {_DB_LAT_MAX!r} AND lon < {_DB_LON_MAX!r}
    ),
    pairs AS (
      SELECT a.event_id AS a_id, b.event_id AS b_id
      FROM p a JOIN p b
        ON a.event_id <> b.event_id
       AND (a.lat-b.lat)*(a.lat-b.lat) + (a.lon-b.lon)*(a.lon-b.lon)
           <= {_DB_EPS * _DB_EPS!r}
    ),
    core AS (
      SELECT a_id AS id FROM pairs GROUP BY a_id
      HAVING count(*) + 1 >= {_DB_MINPTS}
    ),
    cedges AS (
      SELECT a_id AS src, b_id AS dst FROM pairs
      WHERE a_id IN (SELECT id FROM core) AND b_id IN (SELECT id FROM core)
    ),
    reach(id, root) AS (
      SELECT id, id FROM core
      UNION
      SELECT e.dst, r.root FROM reach r JOIN cedges e ON e.src = r.id
    ),
    comp AS (SELECT id, min(root) AS cluster FROM reach GROUP BY id),
    border AS (
      SELECT pr.a_id AS id, min(c.cluster) AS cluster
      FROM pairs pr JOIN comp c ON pr.b_id = c.id
      WHERE pr.a_id NOT IN (SELECT id FROM core)
      GROUP BY pr.a_id
    )
    SELECT id AS event_id, cluster, TRUE AS is_core FROM comp
    UNION ALL
    SELECT id AS event_id, cluster, FALSE AS is_core FROM border
    """,
    doc=(
        "DBSCAN density clustering (eps=0.2 deg, minPts=4): core points via "
        "an eps-cell cover equi-join neighbor count, clusters = connected "
        "components of the core-core graph (min-label Pregel loop shared "
        "with fire_perimeters/dup_components), border points adopt the min "
        "adjacent core cluster, noise dropped — the density generalization "
        "of the pipeline's kNN dedup neighborhood clustering (north star)"
    ),
)
def dbscan_clusters(spark, sf_dir, block_edge_cap: int = 2_000_000):
    """Neighbor pairs come from the same latitude-safe cell-cover equi-join
    as radius_join (cell = eps so the 3x3 ring covers the disk; each
    ordered pair meets exactly once at the left point's own cell — no
    dedup pass). Counting, core filtering, and border assignment are
    partial-aggregated groupBys; the only iteration is the shared
    min-label CC fixpoint whose per-round plan is constant-size
    (localCheckpoint). Under a degenerate hot cell the pair join inherits
    pipeline.dedup's salting rationale (PLANS.md round-3 row)."""
    from filda_spark.functions import graph

    p = _pt_df(spark, sf_dir).filter(
        (F.col("lat") < _DB_LAT_MAX) & (F.col("lon") < _DB_LON_MAX)
    )
    a = p.select(
        F.col("event_id").alias("a_id"),
        F.col("lat").alias("a_lat"),
        F.col("lon").alias("a_lon"),
        F.floor(F.col("lat") / _DB_EPS).alias("cy"),
        F.floor(F.col("lon") / _DB_EPS).alias("cx"),
    )
    b = p.select(
        F.col("event_id").alias("b_id"),
        F.col("lat").alias("b_lat"),
        F.col("lon").alias("b_lon"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.floor(F.col("lat") / _DB_EPS) + dy).alias("cy"),
                        (F.floor(F.col("lon") / _DB_EPS) + dx).alias("cx"),
                    )
                    for dy in (-1, 0, 1)
                    for dx in (-1, 0, 1)
                ]
            )
        ).alias("k"),
    ).select("b_id", "b_lat", "b_lon", F.col("k.cy").alias("cy"), F.col("k.cx").alias("cx"))
    # explicit products (not **2): both engines must evaluate the identical
    # IEEE multiply so boundary pairs agree bit-for-bit
    d2 = (F.col("a_lat") - F.col("b_lat")) * (F.col("a_lat") - F.col("b_lat")) + (
        F.col("a_lon") - F.col("b_lon")
    ) * (F.col("a_lon") - F.col("b_lon"))
    pairs = (
        a.join(b, ["cy", "cx"])
        .filter((F.col("a_id") != F.col("b_id")) & (d2 <= _DB_EPS * _DB_EPS))
        # block id for the local-contraction pre-pass: every edge belongs
        # to exactly one 2-deg block (the left endpoint's), so the union of
        # per-block spanning forests preserves connectivity exactly
        .select(
            "a_id",
            "b_id",
            F.floor(F.col("a_lat") / _DB_BLOCK).alias("by"),
            F.floor(F.col("a_lon") / _DB_BLOCK).alias("bx"),
        )
        .localCheckpoint()  # pairs feed 3 consumers (count/edges/border)
    )
    core = (
        pairs.groupBy("a_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") + 1 >= _DB_MINPTS)
        .select(F.col("a_id").alias("id"))
    )
    cedges = pairs.join(core.withColumnRenamed("id", "a_id"), "a_id", "left_semi").join(
        core.withColumnRenamed("id", "b_id"), "b_id", "left_semi"
    )
    # two-level CC (the production shape for spatial graphs): a per-block
    # union-find collapses each block's core-core subgraph to node->root
    # stars in ONE C-speed applyInPandas pass, so the iterative global loop
    # runs on a star forest whose diameter is the BLOCK-graph diameter
    # (a handful of hops), not the point-graph diameter (O(domain/eps) on a
    # dense field — 19 rounds measured at sf0.1 without the contraction).
    #
    # Hot-block guard (the contraction's straggler risk at 100 TB: one
    # persistent-flare megacity block holding most of the edges would run
    # union-find in ONE task): the contraction is correct under ANY edge
    # grouping — the union of per-group spanning forests always preserves
    # connectivity — so blocks over the per-task edge cap sub-split by a
    # hash of the left endpoint; contraction quality degrades gracefully
    # (cross-subgroup merges fall to the global loop) instead of the task
    # timeline degenerating. Same dynamic lever as pipeline.dedup's
    # (cell, salt) and ANN_BUCKET_CAP.
    blk_counts = cedges.groupBy("by", "bx").agg(F.count(F.lit(1)).alias("_bn"))
    cedges_s = cedges.join(F.broadcast(blk_counts), ["by", "bx"]).withColumn(
        "_bsalt",
        F.pmod(
            F.xxhash64("a_id"), F.ceil(F.col("_bn") / F.lit(block_edge_cap)).cast("long")
        ),
    )
    stars = cedges_s.groupBy("by", "bx", "_bsalt").applyInPandas(
        _block_union_find, schema="src long, dst long"
    )
    forest = stars.unionByName(
        stars.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    comp = graph.min_label_components(
        core.select("id", F.col("id").alias("component")).localCheckpoint(),
        forest.localCheckpoint(),
        "id",
        128,
    )
    border = (
        pairs.join(core.withColumnRenamed("id", "a_id"), "a_id", "left_anti")
        .join(comp.withColumnRenamed("id", "b_id"), "b_id")
        .groupBy("a_id")
        .agg(F.min("component").alias("cluster"))
        .select(F.col("a_id").alias("event_id"), "cluster", F.lit(False).alias("is_core"))
    )
    cores_out = comp.select(
        F.col("id").alias("event_id"),
        F.col("component").alias("cluster"),
        F.lit(True).alias("is_core"),
    )
    return cores_out.unionByName(border)


_GI_CELL = 0.5  # Gi* analysis cell, degrees (the dedup/cover cell size)

# the half-degree analysis cell-count grid shared by getis_ord_gi,
# grid_contour (and, with a time axis added, mann_kendall/cusum): single-
# sourced in BOTH dialects so the cell derivation cannot drift between ops
_CELLS_SQL = f"""
      SELECT CAST(floor(lat / {_GI_CELL!r}) AS BIGINT) AS cy,
             CAST(floor(lon / {_GI_CELL!r}) AS BIGINT) AS cx,
             count(*) AS x
      FROM p GROUP BY 1, 2
"""


def _cell_counts(spark, sf_dir) -> DataFrame:
    """Spark twin of ``_CELLS_SQL``: per-(cy, cx) point counts on the
    Gi* analysis grid (one partial-agg shuffle)."""
    return (
        _pt_df(spark, sf_dir)
        .select(
            F.floor(F.col("lat") / _GI_CELL).alias("cy"),
            F.floor(F.col("lon") / _GI_CELL).alias("cx"),
        )
        .groupBy("cy", "cx")
        .agg(F.count(F.lit(1)).alias("x"))
    )


@register(
    "getis_ord_gi",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM cells
    ),
    nbr AS (
      SELECT a.cy, a.cx,
             CAST(count(*) AS BIGINT) AS wn,
             CAST(sum(b.x) AS BIGINT) AS wx
      FROM cells a JOIN cells b
        ON abs(a.cy - b.cy) <= 1 AND abs(a.cx - b.cx) <= 1
      GROUP BY a.cy, a.cx
    )
    SELECT nbr.cy, nbr.cx, nbr.wn, nbr.wx,
           round(
             (CAST(wx AS DOUBLE) - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(wn AS DOUBLE))
             / (
               sqrt(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
                    - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
               * sqrt((CAST(n AS DOUBLE) * CAST(wn AS DOUBLE) - CAST(wn AS DOUBLE) * CAST(wn AS DOUBLE))
                      / (CAST(n AS DOUBLE) - 1.0))
             ), 6) AS gi_z
    FROM nbr CROSS JOIN g
    """,
    doc=(
        "Getis-Ord Gi* hotspot statistic over the detection cell grid "
        "(3x3 neighborhood incl. self): the standard 'statistically "
        "significant fire hotspot' z-score the tiling engine serves from "
        "its fire-density cells — all neighborhood/global sums integer-"
        "exact, the z formula IEEE-identical on both engines (sqrt is "
        "correctly rounded per IEEE 754, no libm-divergent exp/ln)"
    ),
)
def getis_ord_gi(spark, sf_dir):
    """Cell counts (one partial-agg shuffle) -> 3x3 kRing explode
    equi-join on the cell key (stencil shape, no range join) -> per-cell
    integer neighborhood sums -> scalar-broadcast crossJoin of the one-row
    global stats (the tfidf_topterms pattern) -> codegen z-score. Every
    aggregate is BIGINT until the final double formula, so parity cannot
    drift with aggregation order. The cell frame is referenced three
    times (globals, stencil left, stencil right) — persisted so the
    base scan + count shuffle run once."""
    cells = _persist_evict(_cell_counts(spark, sf_dir))
    g = cells.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nbr_side = cells.select(
        F.col("x").alias("bx_"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cy") + dy).alias("cy"), (F.col("cx") + dx).alias("cx")
                    )
                    for dy in (-1, 0, 1)
                    for dx in (-1, 0, 1)
                ]
            )
        ).alias("k"),
    ).select("bx_", F.col("k.cy").alias("cy"), F.col("k.cx").alias("cx"))
    nbr = (
        cells.select("cy", "cx")
        .join(nbr_side, ["cy", "cx"])
        .groupBy("cy", "cx")
        .agg(F.count(F.lit(1)).alias("wn"), F.sum("bx_").alias("wx"))
    )
    nd, sxd = F.col("n").cast("double"), F.col("sx").cast("double")
    wnd, wxd = F.col("wn").cast("double"), F.col("wx").cast("double")
    mean = sxd / nd
    s = F.sqrt(F.col("sxx").cast("double") / nd - mean * mean)
    denom = s * F.sqrt((nd * wnd - wnd * wnd) / (nd - F.lit(1.0)))
    return nbr.crossJoin(F.broadcast(g)).select(
        "cy",
        "cx",
        "wn",
        "wx",
        F.round((wxd - mean * wnd) / denom, 6).alias("gi_z"),
    )


_MK_BUCKETS = 8  # Mann-Kendall time buckets over the corpus span

# the per-(cell, bucket) count series CTE chain, single-sourced for
# mann_kendall_trend and theil_sen_trend (the Spark twin is _mk_series)
_MK_SERIES_SQL = f"""
    p0 AS (
      SELECT event_id, epoch_ms(ts) AS t_ms,
             CAST(event_id * 7919 % 2000 AS DOUBLE) / 100.0 AS lat,
             CAST(event_id * 104729 % 2400 AS DOUBLE) / 100.0 + 10.0 AS lon
      FROM events
    ),
    bounds AS (SELECT min(t_ms) AS t0, max(t_ms) + 1 AS t1 FROM p0),
    series AS (
      SELECT CAST(floor(lat / {_GI_CELL!r}) AS BIGINT) AS cy,
             CAST(floor(lon / {_GI_CELL!r}) AS BIGINT) AS cx,
             CAST(floor(CAST((t_ms - t0) AS DOUBLE) / CAST((t1 - t0) AS DOUBLE)
                        * {_MK_BUCKETS}) AS BIGINT) AS tb,
             count(*) AS x
      FROM p0 CROSS JOIN bounds GROUP BY 1, 2, 3
    )
"""


def _mk_series(spark, sf_dir, events: DataFrame | None = None) -> DataFrame:
    """Spark twin of ``_MK_SERIES_SQL``: per-(cell, bucket) counts in one
    partial-agg shuffle; bucket bounds from one scalar min/max agg
    broadcast into the projection."""
    ev = events if events is not None else _t(spark, sf_dir, "events")
    p0 = ev.select(
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
        ((F.col("event_id") * 7919 % 2000).cast("double") / 100.0).alias("lat"),
        (((F.col("event_id") * 104729 % 2400).cast("double") / 100.0) + 10.0).alias(
            "lon"
        ),
    )
    bounds = p0.agg(F.min("t_ms").alias("t0"), (F.max("t_ms") + 1).alias("t1"))
    return (
        p0.crossJoin(F.broadcast(bounds))
        .select(
            F.floor(F.col("lat") / _GI_CELL).alias("cy"),
            F.floor(F.col("lon") / _GI_CELL).alias("cx"),
            F.floor(
                (F.col("t_ms") - F.col("t0")).cast("double")
                / (F.col("t1") - F.col("t0")).cast("double")
                * _MK_BUCKETS
            )
            .cast("long")
            .alias("tb"),
        )
        .groupBy("cy", "cx", "tb")
        .agg(F.count(F.lit(1)).alias("x"))
    )


@register(
    "mann_kendall_trend",
    f"""
    WITH {_MK_SERIES_SQL}
    SELECT a.cy, a.cx,
           CAST(sum(CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END)
                AS BIGINT) AS s_stat,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM series a JOIN series b
      ON a.cy = b.cy AND a.cx = b.cx AND a.tb < b.tb
    GROUP BY a.cy, a.cx
    """,
    doc=(
        "Mann-Kendall trend statistic per cell over 8 time buckets (the "
        "'emerging hot spot' analysis: S = sum of sign(x_j - x_i) over "
        "ordered bucket pairs — rising fire activity S>0, cooling S<0); "
        "integer-exact end to end, no float in the statistic at all"
    ),
)
def mann_kendall_trend(spark, sf_dir, events: DataFrame | None = None):
    """Per-(cell, bucket) counts in one partial-agg shuffle; the ordered
    bucket-pair comparison is a self-equi-join on the CELL key only
    (bounded fan-out: <= C(8,2)=28 pairs per cell, a constant — not a
    range join); sign sums stay BIGINT. The bucket bounds come from one
    scalar min/max agg broadcast into the projection."""
    # both self-join sides reference the series frame: persist so the
    # base scan + bounds agg + bucket-count shuffle run once, not twice
    series = _persist_evict(_mk_series(spark, sf_dir, events))
    a = series.select("cy", "cx", F.col("tb").alias("ta"), F.col("x").alias("xa"))
    b = series.select("cy", "cx", F.col("tb").alias("tbk"), F.col("x").alias("xb"))
    sign = F.when(F.col("xb") > F.col("xa"), 1).when(
        F.col("xb") < F.col("xa"), -1
    ).otherwise(0)
    return (
        a.join(b, ["cy", "cx"])
        .filter(F.col("ta") < F.col("tbk"))
        .groupBy("cy", "cx")
        .agg(
            F.sum(sign).alias("s_stat"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )


def _cusum_sql_chain() -> tuple[str, str]:
    """Unrolled CUSUM folds over the 8 bucket counts (x0..x7, ref): the
    recursion s_i = max(0, s_{i-1} + (x_i - ref)) has no windowed SQL
    form, but at a fixed bucket count it unrolls into plain expressions —
    written ONCE here and mirrored operation-for-operation by the Spark
    side so every intermediate IEEE step matches."""
    up, dn = "0.0", "0.0"
    for i in range(_MK_BUCKETS):
        up = f"greatest(0.0, {up} + (x{i} - ref))"
        dn = f"greatest(0.0, {dn} + (ref - x{i}))"
    return up, dn


_CUSUM_UP_SQL, _CUSUM_DN_SQL = _cusum_sql_chain()

_CUSUM_XCOLS_SQL = ",\n             ".join(
    f"CAST(sum(CASE WHEN tb = {i} THEN x ELSE 0 END) AS DOUBLE) AS x{i}"
    for i in range(_MK_BUCKETS)
)


@register(
    "cusum_changepoint",
    f"""
    WITH {_MK_SERIES_SQL},
    wide AS (
      SELECT cy, cx,
             {_CUSUM_XCOLS_SQL}
      FROM series GROUP BY cy, cx
    ),
    withref AS (
      SELECT cy, cx,
             {", ".join(f"x{i}" for i in range(_MK_BUCKETS))},
             ({" + ".join(f"x{i}" for i in range(_MK_BUCKETS))}) / {_MK_BUCKETS}.0 AS ref
      FROM wide
    )
    SELECT cy, cx,
           round({_CUSUM_UP_SQL}, 6) AS cusum_up,
           round({_CUSUM_DN_SQL}, 6) AS cusum_dn
    FROM withref
    """,
    doc=(
        "CUSUM changepoint statistic per cell over 8 time buckets: max "
        "cumulative positive (upward level shift — fire outbreak) and "
        "negative (burn-out / extinction) deviation from the cell's own "
        "mean — the LEVEL-SHIFT complement to mann_kendall_trend's "
        "monotone-trend S; the sequential fold is unrolled over the fixed "
        "bucket count so both engines evaluate the identical IEEE chain"
    ),
)
def cusum_changepoint(spark, sf_dir, events: DataFrame | None = None):
    """Pivot the per-(cell, bucket) counts to fixed columns in the SAME
    grouped aggregation that built them (one exchange total), then the
    unrolled fold runs as whole-stage-codegen column algebra — no second
    shuffle, no UDF, no higher-order-function parity risk."""
    series = _mk_series(spark, sf_dir, events)
    wide = series.groupBy("cy", "cx").agg(
        *[
            F.sum(F.when(F.col("tb") == i, F.col("x")).otherwise(0))
            .cast("double")
            .alias(f"x{i}")
            for i in range(_MK_BUCKETS)
        ]
    )
    xs = [F.col(f"x{i}") for i in range(_MK_BUCKETS)]
    total = xs[0]
    for c in xs[1:]:
        total = total + c
    ref = total / float(_MK_BUCKETS)
    up, dn = F.lit(0.0), F.lit(0.0)
    for i in range(_MK_BUCKETS):
        up = F.greatest(F.lit(0.0), up + (xs[i] - ref))
        dn = F.greatest(F.lit(0.0), dn + (ref - xs[i]))
    return wide.select(
        "cy",
        "cx",
        F.round(up, 6).alias("cusum_up"),
        F.round(dn, 6).alias("cusum_dn"),
    )


_KSO_K = 64  # KMV set-operation sketch size
_KSO_DOM = float(1 << 60)  # md5-15-hex hash domain


@register(
    "kmv_set_ops",
    f"""
    WITH flags AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_b
      FROM events GROUP BY user_id
    ),
    h AS (
      SELECT in_a, in_b,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM flags WHERE in_a = 1 OR in_b = 1
    ),
    kmin AS (
      SELECT in_a, in_b, h, row_number() OVER (ORDER BY h) AS rn FROM h
    )
    SELECT CAST({_KSO_K} AS BIGINT) AS k,
           CAST(max(h) AS BIGINT) AS kth_union,
           CAST(sum(in_a * in_b) AS BIGINT) AS n_shared,
           round(CAST({_KSO_K} - 1 AS DOUBLE) * {_KSO_DOM!r} / CAST(max(h) AS DOUBLE), 4)
             AS est_union,
           round(CAST(sum(in_a * in_b) AS DOUBLE) / {_KSO_K}.0, 6) AS est_jaccard,
           round((CAST({_KSO_K} - 1 AS DOUBLE) * {_KSO_DOM!r} / CAST(max(h) AS DOUBLE))
                 * (CAST(sum(in_a * in_b) AS DOUBLE) / {_KSO_K}.0), 4) AS est_intersection
    FROM kmin WHERE rn <= {_KSO_K}
    """,
    doc=(
        "KMV sketch set operations: union cardinality from the combined "
        "k-minima, Jaccard/intersection from the shared fraction within the "
        "union's k-min window (the mergeable-sketch answer to 'how many "
        "users clicked AND purchased' without a distinct-pair shuffle); "
        "state + estimators deterministic, estimator accuracy pinned in "
        "tests"
    ),
)
def kmv_set_ops(spark, sf_dir):
    """Per-entity membership flags in one partial-agg groupBy, one md5 map,
    then a global top-k: Catalyst rewrites row_number <= k into
    WindowGroupLimit, so each partition forwards at most k rows before the
    single-partition final sort (the same plan kmv_distinct/weighted_sample
    use) — the shuffle carries O(k * partitions), never the entity count."""
    ev = _t(spark, sf_dir, "events")
    flags = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("in_a"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("in_b"),
    )
    h = flags.filter((F.col("in_a") == 1) | (F.col("in_b") == 1)).select(
        "in_a",
        "in_b",
        _h60("user_id").alias("h"),
    )
    w = Window.orderBy("h")
    kmin = h.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= _KSO_K)
    est_union = (
        F.lit(float(_KSO_K - 1)) * F.lit(_KSO_DOM) / F.max("h").cast("double")
    )
    shared_frac = F.sum(F.col("in_a") * F.col("in_b")).cast("double") / float(_KSO_K)
    return kmin.agg(
        F.lit(_KSO_K).cast("long").alias("k"),
        F.max("h").alias("kth_union"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_shared"),
        F.round(est_union, 4).alias("est_union"),
        F.round(shared_frac, 6).alias("est_jaccard"),
        F.round(est_union * shared_frac, 4).alias("est_intersection"),
    )


_CMS_D = 4  # count-min sketch depth (hash rows)
_CMS_W = 256  # count-min sketch width (columns per row)


@register(
    "count_min_registers",
    f"""
    WITH rows_ AS (SELECT unnest(range({_CMS_D})) AS hrow),
    h AS (
      SELECT r.hrow,
             CAST(concat('0x', substr(md5(concat(CAST(r.hrow AS VARCHAR), ':',
                  CAST(e.user_id AS VARCHAR))), 1, 15)) AS BIGINT) % {_CMS_W} AS col
      FROM events e CROSS JOIN rows_ r
    )
    SELECT hrow, col, CAST(count(*) AS BIGINT) AS cnt
    FROM h GROUP BY hrow, col
    """,
    doc=(
        "count-min sketch register state (d=4 x w=256) over the event "
        "entity stream: the mergeable FREQUENCY sketch beside the distinct "
        "sketches (KMV, HLL) — point query = min over the d rows, never an "
        "underestimate; integer-exact state so parity is bit-for-bit "
        "(estimator guarantee pinned in tests)"
    ),
)
def count_min_registers(spark, sf_dir):
    """Constant d-fold map-side fan-out (explode of the hash-row array) ->
    ONE partial-aggregated groupBy on (hrow, col): the shuffle carries at
    most d*w = 1024 register rows per task regardless of input size — the
    same textbook mergeable-sketch plan as hll_registers, for counts."""
    ev = _t(spark, sf_dir, "events")
    rows = ev.select(
        "user_id",
        F.explode(F.array(*[F.lit(i) for i in range(_CMS_D)])).alias("hrow"),
    )
    col = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("hrow").cast("string"),
                        F.lit(":"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % _CMS_W
    )
    return (
        rows.select("hrow", col.alias("col"))
        .groupBy("hrow", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


_STAY_JUMP = 0.5  # segment break when a fix moves more than this (degrees)
_STAY_MIN_N = 5  # a stay needs at least this many fixes


@register(
    "stay_points",
    f"""
    WITH p AS (
      SELECT user_id, event_id, epoch_ms(ts) AS t_ms,
             CAST(user_id % 120 AS DOUBLE) - 60.0
               + (CASE WHEN event_id % 13 < 4 THEN 2.0 ELSE 0.0 END)
               + CAST(event_id % 7 AS DOUBLE) / 1000.0 AS lat,
             CAST(user_id % 300 AS DOUBLE) - 150.0
               + (CASE WHEN event_id % 13 < 4 THEN 2.0 ELSE 0.0 END)
               + CAST(event_id % 5 AS DOUBLE) / 1000.0 AS lon
      FROM events
    ),
    legs AS (
      SELECT user_id, event_id, t_ms, lat, lon,
             lag(lat) OVER w AS plat, lag(lon) OVER w AS plon
      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY t_ms, event_id)
    ),
    marked AS (
      SELECT user_id, event_id, t_ms, lat, lon,
             CASE WHEN plat IS NULL
                    OR abs(lat - plat) > {_STAY_JUMP!r}
                    OR abs(lon - plon) > {_STAY_JUMP!r}
                  THEN 1 ELSE 0 END AS brk
      FROM legs
    ),
    segs AS (
      SELECT user_id, event_id, t_ms, lat, lon,
             sum(brk) OVER (PARTITION BY user_id ORDER BY t_ms, event_id
                            ROWS UNBOUNDED PRECEDING) AS seg
      FROM marked
    )
    SELECT user_id, CAST(seg AS BIGINT) AS seg,
           CAST(count(*) AS BIGINT) AS n_fixes,
           CAST(min(t_ms) AS BIGINT) AS t_start,
           CAST(max(t_ms) AS BIGINT) AS t_end,
           round(min(lat), 6) AS lat_min, round(max(lat), 6) AS lat_max,
           round(min(lon), 6) AS lon_min, round(max(lon), 6) AS lon_max
    FROM segs
    GROUP BY user_id, seg
    HAVING count(*) >= {_STAY_MIN_N}
    """,
    doc=(
        "stay-point (dwell) detection: per-entity trajectory segmented at "
        "jumps > 0.5 deg (lag window), stationary runs rolled up to dwell "
        "episodes with >= 5 fixes — the movement-analytics dual of "
        "sessionize, and the 'persistent flare / repeated hotspot dwell' "
        "screen at detection level. Aggregates are count/min/max only "
        "(order-independent, so parity cannot drift with parallelism); the "
        "two-site synthesis derives slow per-user movement deterministically "
        "from (user_id, event_id)"
    ),
)
def stay_points(spark, sf_dir):
    """One per-entity shuffle serves both windows (lag for the jump flag,
    running sum for segment ids — Catalyst reuses the exchange, same shape
    as sessionize/scd2), then one partial-aggregated groupBy on
    (user, seg). Per-user history fits a partition at any scale."""
    ev = _t(spark, sf_dir, "events")
    site = F.when(F.col("event_id") % 13 < 4, F.lit(2.0)).otherwise(F.lit(0.0))
    p = ev.select(
        "user_id",
        "event_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
        (
            (F.col("user_id") % 120).cast("double")
            - 60.0
            + site
            + (F.col("event_id") % 7).cast("double") / 1000.0
        ).alias("lat"),
        (
            (F.col("user_id") % 300).cast("double")
            - 150.0
            + site
            + (F.col("event_id") % 5).cast("double") / 1000.0
        ).alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("t_ms", "event_id")
    legs = p.select(
        "user_id",
        "event_id",
        "t_ms",
        "lat",
        "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
    )
    brk = (
        F.when(
            F.col("plat").isNull()
            | (F.abs(F.col("lat") - F.col("plat")) > _STAY_JUMP)
            | (F.abs(F.col("lon") - F.col("plon")) > _STAY_JUMP),
            1,
        )
        .otherwise(0)
        .alias("brk")
    )
    marked = legs.select("user_id", "event_id", "t_ms", "lat", "lon", brk)
    seg = F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    segs = marked.select(
        "user_id", "t_ms", "lat", "lon", seg.cast("long").alias("seg")
    )
    return (
        segs.groupBy("user_id", "seg")
        .agg(
            F.count(F.lit(1)).alias("n_fixes"),
            F.min("t_ms").alias("t_start"),
            F.max("t_ms").alias("t_end"),
            F.round(F.min("lat"), 6).alias("lat_min"),
            F.round(F.max("lat"), 6).alias("lat_max"),
            F.round(F.min("lon"), 6).alias("lon_min"),
            F.round(F.max("lon"), 6).alias("lon_max"),
        )
        .filter(F.col("n_fixes") >= _STAY_MIN_N)
    )


# Bloom filter registers --------------------------------------------------------
#
# The fourth mergeable-sketch family beside hll_registers (cardinality),
# count_min_registers (frequency) and kmv_set_ops (set algebra): set
# MEMBERSHIP. m = 65536 bits stored as 2048 x 32-bit words (values stay
# positive BIGINTs, so no engine-specific two's-complement surface), k = 4
# double-hashed probe positions per key.

_BLOOM_M = 65536  # bits
_BLOOM_K = 4


def _bloom_pos_sql(h: str, i: str) -> str:
    """Probe position i for 60-bit hash h (shared Spark/DuckDB arithmetic:
    double hashing pos_i = (h1 + i*h2) mod m, all non-negative BIGINT ops)."""
    return (
        f"(({h}) % {_BLOOM_M} + ({i}) * (1 + ((({h}) >> 20) % {_BLOOM_M - 1})))"
        f" % {_BLOOM_M}"
    )


_MD5_60 = "CAST(concat('0x', substr(md5(CAST({key} AS VARCHAR)), 1, 15)) AS BIGINT)"


@register(
    "bloom_registers",
    f"""
    WITH d AS (SELECT DISTINCT o_orderstatus, o_custkey FROM orders),
    h AS (
      SELECT o_orderstatus, {_MD5_60.format(key="o_custkey")} AS h
      FROM d
    ),
    p AS (
      SELECT o_orderstatus, {_bloom_pos_sql("h", "i")} AS pos
      FROM h CROSS JOIN (VALUES (0), (1), (2), (3)) t(i)
    )
    SELECT o_orderstatus,
           CAST(pos >> 5 AS BIGINT) AS word,
           bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
    FROM p GROUP BY 1, 2
    """,
    doc=(
        "Bloom-filter register state (m=65536 bits as 2048 x 32-bit words, "
        "k=4 double-hashed probes) per order-status group: the mergeable "
        "set-MEMBERSHIP sketch a 100 TB dedup plane ships between stages "
        "instead of the key set itself — bit_or is idempotent/commutative, "
        "so partial aggregation merges register words map-side"
    ),
)
def bloom_registers(spark, sf_dir):
    """Same plan family as hll_registers: one map pass (md5 -> k probe
    positions via a constant 4x explode) then a groupBy on (group, word)
    whose partial aggregation bit_or's words map-side — the shuffle carries
    at most 2048 rows per group per task regardless of key count. Words
    hold 32 bits each so every register value is a positive BIGINT (no
    sign-bit divergence between engines)."""
    d = _t(spark, sf_dir, "orders").select("o_orderstatus", "o_custkey").distinct()
    h = d.select(
        "o_orderstatus",
        _h60("o_custkey").alias("h"),
    )
    p = h.select(
        "o_orderstatus",
        F.explode(F.array(*[F.lit(i) for i in range(_BLOOM_K)])).alias("i"),
        "h",
    ).select("o_orderstatus", F.expr(_bloom_pos_sql("h", "i")).alias("pos"))
    return (
        p.select(
            "o_orderstatus",
            F.shiftright(F.col("pos"), 5).cast("long").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("b"),
        )
        .groupBy("o_orderstatus", "word")
        .agg(F.bit_or("b").alias("bits"))
    )


_BLOOM_PRED = "o_totalprice > 480000"  # ~5% of customers qualify


@register(
    "bloom_semi_prune",
    f"""
    WITH member AS (SELECT DISTINCT o_custkey FROM orders WHERE {_BLOOM_PRED}),
    reg AS (
      SELECT CAST(pos >> 5 AS BIGINT) AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
      FROM (
        SELECT {_bloom_pos_sql(_MD5_60.format(key="o_custkey"), "i")} AS pos
        FROM member CROSS JOIN (VALUES (0), (1), (2), (3)) t(i)
      ) GROUP BY 1
    ),
    probe AS (
      SELECT c_custkey, {_bloom_pos_sql(_MD5_60.format(key="c_custkey"), "i")} AS pos
      FROM customer CROSS JOIN (VALUES (0), (1), (2), (3)) t(i)
    ),
    hit AS (
      SELECT p.c_custkey
      FROM probe p JOIN reg r ON (p.pos >> 5) = r.word
      WHERE (r.bits & (CAST(1 AS BIGINT) << CAST(p.pos % 32 AS INT))) <> 0
      GROUP BY p.c_custkey HAVING count(*) = {_BLOOM_K}
    )
    SELECT h.c_custkey, (m.o_custkey IS NOT NULL) AS true_member
    FROM hit h LEFT JOIN member m ON h.c_custkey = m.o_custkey
    """,
    doc=(
        "Bloom-filter semi-join pruning: probe every customer key against "
        "the bloom built over the high-value order keys, keep the keys "
        "whose k=4 probe bits are all set, and flag which survivors are "
        "true members vs false positives — the join-pruning pattern that "
        "replaces shuffling a 100 TB fact side with a broadcast of 2048 "
        "sketch words (observed FPR at sf0.01: a handful of rows on ~1000 "
        "true negatives, pinned by test)"
    ),
)
def bloom_semi_prune(spark, sf_dir):
    """The registers (<= 2048 rows, built from the member-key side) ride a
    broadcast join against the probe side's exploded positions; a probe key
    survives iff all k positions hit (count == k after the bit test). The
    exact verdict joins the survivor set (already bloom-reduced) back to
    the member keys — at scale this is the cheap-refine step the sketch
    bought: only bloom-passing rows reach the exact join."""
    orders = _t(spark, sf_dir, "orders")
    member = (
        orders.filter(F.expr(_BLOOM_PRED)).select("o_custkey").distinct()
    )
    idx = F.explode(F.array(*[F.lit(i) for i in range(_BLOOM_K)])).alias("i")
    reg = (
        member.select(_h60("o_custkey").alias("h"), idx)
        .select(F.expr(_bloom_pos_sql("h", "i")).alias("pos"))
        .select(
            F.shiftright(F.col("pos"), 5).cast("long").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or("b").alias("bits"))
    )
    probe = (
        _t(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            _h60("c_custkey").alias("h"),
        )
        .select("c_custkey", idx, "h")
        .select("c_custkey", F.expr(_bloom_pos_sql("h", "i")).alias("pos"))
    )
    hit = (
        probe.join(
            F.broadcast(reg),
            F.shiftright(F.col("pos"), 5).cast("long") == F.col("word"),
        )
        .filter(
            F.col("bits").bitwiseAND(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")
            )
            != 0
        )
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("k_hits"))
        .filter(F.col("k_hits") == _BLOOM_K)
        .select("c_custkey")
    )
    return hit.join(
        F.broadcast(member), F.col("c_custkey") == F.col("o_custkey"), "left"
    ).select("c_custkey", F.col("o_custkey").isNotNull().alias("true_member"))


# map matching: snap points to nearest segment ----------------------------------

_SNAP_R2 = 0.25  # snap radius 0.5 deg, squared


@register(
    "snap_to_segments",
    f"""
    WITH pts AS (
      SELECT c_custkey,
             CAST(c_custkey * 37 % 300 AS DOUBLE) / 10.0 - 15.0 AS py,
             CAST(c_custkey * 73 % 720 AS DOUBLE) / 10.0 - 36.0 AS px
      FROM customer
    ),
    segs AS (
      SELECT s_suppkey AS seg_id,
             CAST(s_suppkey * 13 % 400 AS DOUBLE) / 10.0 - 20.0 AS x1,
             CAST(s_suppkey * 29 % 300 AS DOUBLE) / 10.0 - 15.0 AS y1,
             CAST(s_suppkey * 7 % 19 - 9 AS DOUBLE) / 10.0 AS dx,
             CAST(s_suppkey * 11 % 17 - 8 AS DOUBLE) / 10.0 AS dy
      FROM supplier
    ),
    cand AS (
      SELECT p.c_custkey, s.seg_id,
             CASE
               WHEN s.dx * s.dx + s.dy * s.dy = 0.0 THEN 0.0
               WHEN ((p.px - s.x1) * s.dx + (p.py - s.y1) * s.dy)
                    / (s.dx * s.dx + s.dy * s.dy) < 0.0 THEN 0.0
               WHEN ((p.px - s.x1) * s.dx + (p.py - s.y1) * s.dy)
                    / (s.dx * s.dx + s.dy * s.dy) > 1.0 THEN 1.0
               ELSE ((p.px - s.x1) * s.dx + (p.py - s.y1) * s.dy)
                    / (s.dx * s.dx + s.dy * s.dy)
             END AS t,
             p.px, p.py, s.x1, s.y1, s.dx, s.dy
      FROM pts p CROSS JOIN segs s
    ),
    dist AS (
      SELECT c_custkey, seg_id, t,
             (px - (x1 + t * dx)) * (px - (x1 + t * dx))
             + (py - (y1 + t * dy)) * (py - (y1 + t * dy)) AS d2
      FROM cand
    ),
    ranked AS (
      SELECT c_custkey, seg_id, t, d2,
             row_number() OVER (PARTITION BY c_custkey ORDER BY d2, seg_id) AS rnk
      FROM dist WHERE d2 <= {_SNAP_R2!r}
    )
    SELECT c_custkey, seg_id, round(t, 6) AS t, round(d2, 9) AS d2
    FROM ranked WHERE rnk = 1
    """,
    doc=(
        "map matching: snap each point to its nearest polyline segment "
        "within 0.5 deg (clamped point-to-segment projection, ties broken "
        "on (d2, seg_id)) — the GPS-trace-to-road-network join of a "
        "trajectory pipeline, expressed as the same 1-deg cell-cover "
        "equi-join as radius_join/knn_join (the oracle's crossJoin is the "
        "semantic spec only; the engine never builds all pairs)"
    ),
)
def snap_to_segments(spark, sf_dir):
    """Segment side explodes to its bbox 1-deg cells +/- 1 (fan-out <= 4x4
    cells/segment given max segment extent 0.9 deg + snap radius 0.5);
    points map to their own cell — a pure equi-join on (cy, cx), no range
    join. Cover is exact: d <= 0.5 implies the point's cell is within the
    expanded segment bbox. Per-point argmin is row_number over (d2,
    seg_id), which Catalyst rewrites to WindowGroupLimit (per-partition
    top-1 before the exchange). All float ops (+,-,*,/) are IEEE-identical
    on both engines; t's clamp is the same CASE on both sides."""
    pts = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 37 % 300).cast("double") / 10.0 - 15.0).alias("py"),
        ((F.col("c_custkey") * 73 % 720).cast("double") / 10.0 - 36.0).alias("px"),
    )
    segs = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("seg_id"),
        ((F.col("s_suppkey") * 13 % 400).cast("double") / 10.0 - 20.0).alias("x1"),
        ((F.col("s_suppkey") * 29 % 300).cast("double") / 10.0 - 15.0).alias("y1"),
        ((F.col("s_suppkey") * 7 % 19 - 9).cast("double") / 10.0).alias("dx"),
        ((F.col("s_suppkey") * 11 % 17 - 8).cast("double") / 10.0).alias("dy"),
    )
    cover = segs.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.least(F.col("y1"), F.col("y1") + F.col("dy"))) - 1,
                F.floor(F.greatest(F.col("y1"), F.col("y1") + F.col("dy"))) + 1,
            )
        ).alias("cy"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.least(F.col("x1"), F.col("x1") + F.col("dx"))) - 1,
                F.floor(F.greatest(F.col("x1"), F.col("x1") + F.col("dx"))) + 1,
            )
        ).alias("cx"),
    )
    pcell = pts.select(
        "*", F.floor("py").alias("cy"), F.floor("px").alias("cx")
    )
    l2 = F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy")
    traw = (
        (F.col("px") - F.col("x1")) * F.col("dx")
        + (F.col("py") - F.col("y1")) * F.col("dy")
    ) / l2
    t = (
        F.when(l2 == 0.0, F.lit(0.0))
        .when(traw < 0.0, F.lit(0.0))
        .when(traw > 1.0, F.lit(1.0))
        .otherwise(traw)
    )
    cand = pcell.join(cover, ["cy", "cx"]).withColumn("t", t)
    d2 = (
        (F.col("px") - (F.col("x1") + F.col("t") * F.col("dx")))
        * (F.col("px") - (F.col("x1") + F.col("t") * F.col("dx")))
        + (F.col("py") - (F.col("y1") + F.col("t") * F.col("dy")))
        * (F.col("py") - (F.col("y1") + F.col("t") * F.col("dy")))
    )
    dist = cand.select("c_custkey", "seg_id", "t", d2.alias("d2")).filter(
        F.col("d2") <= _SNAP_R2
    )
    w = Window.partitionBy("c_custkey").orderBy("d2", "seg_id")
    return (
        dist.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "c_custkey",
            "seg_id",
            F.round("t", 6).alias("t"),
            F.round("d2", 9).alias("d2"),
        )
    )


# marching-squares contour extraction --------------------------------------------

_MS_T = 4  # iso-threshold on the half-degree cell count

# per-case contour segments (corner weights: v00=1 bottom-left, v10=2
# bottom-right, v11=4 top-right, v01=8 top-left; edges: 0=bottom, 1=right,
# 2=top, 3=left; saddles 5/10 use the fixed two-segment rule). The table is
# a shared literal on both engines, so there is no parity surface in it.
_MS_SEGS = [
    (1, 0, 0, 3), (2, 0, 0, 1), (3, 0, 3, 1), (4, 0, 1, 2),
    (5, 0, 0, 3), (5, 1, 1, 2),
    (6, 0, 0, 2), (7, 0, 3, 2), (8, 0, 3, 2), (9, 0, 0, 2),
    (10, 0, 0, 1), (10, 1, 2, 3),
    (11, 0, 1, 2), (12, 0, 3, 1), (13, 0, 0, 1), (14, 0, 0, 3),
]

_MS_EX = "CASE {e} WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 1 ELSE 0 END"
_MS_EY = "CASE {e} WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 2 ELSE 1 END"


@register(
    "grid_contour",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    corners AS (
      SELECT i.cy - d.dy AS gy, i.cx - d.dx AS gx, CAST(sum(d.w) AS INT) AS case_id
      FROM (SELECT cy, cx FROM cells WHERE x >= {_MS_T}) i
      CROSS JOIN (VALUES (0, 0, 1), (0, 1, 2), (1, 1, 4), (1, 0, 8)) d(dy, dx, w)
      GROUP BY 1, 2
    ),
    segs AS (
      SELECT * FROM (VALUES {", ".join(str(r) for r in _MS_SEGS)}) s(case_id, seg_idx, ea, eb)
    )
    SELECT c.gy, c.gx, c.case_id, s.seg_idx,
           CAST(2 * c.gx + {_MS_EX.format(e="s.ea")} AS BIGINT) AS x1,
           CAST(2 * c.gy + {_MS_EY.format(e="s.ea")} AS BIGINT) AS y1,
           CAST(2 * c.gx + {_MS_EX.format(e="s.eb")} AS BIGINT) AS x2,
           CAST(2 * c.gy + {_MS_EY.format(e="s.eb")} AS BIGINT) AS y2
    FROM corners c JOIN segs s USING (case_id)
    """,
    doc=(
        "marching-squares isoline extraction over the detection-density "
        "grid (threshold x >= 4 per half-degree cell): the raster->vector "
        "complement of fire_perimeters' cell polygonizer — emits contour "
        "segments in half-cell integer coordinates (edge midpoints x2), so "
        "the whole statistic is integer-exact end to end"
    ),
)
def grid_contour(spark, sf_dir):
    """One partial-agg shuffle builds the cell grid; each inside cell
    explodes to the <= 4 blocks it corners (constant fan-out, the stencil
    shape) and a second partial-agg groupBy sums the corner weights into
    the 4-bit case id — absent/outside corners contribute 0, identical to
    the textbook formulation. The 16-case segment table is a broadcast
    literal; endpoints are 2x-scaled integers (midpoint variant), so no
    float appears anywhere in the plan."""
    cells = _cell_counts(spark, sf_dir)
    inside = cells.filter(F.col("x") >= _MS_T).select("cy", "cx")
    corners = (
        inside.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            (F.col("cy") - dy).alias("gy"),
                            (F.col("cx") - dx).alias("gx"),
                            F.lit(w).alias("w"),
                        )
                        for dy, dx, w in ((0, 0, 1), (0, 1, 2), (1, 1, 4), (1, 0, 8))
                    ]
                )
            ).alias("c")
        )
        .select("c.gy", "c.gx", "c.w")
        .groupBy("gy", "gx")
        .agg(F.sum("w").cast("int").alias("case_id"))
    )
    segs = spark.createDataFrame(
        _MS_SEGS, "case_id INT, seg_idx INT, ea INT, eb INT"
    )
    out = corners.join(F.broadcast(segs), "case_id")
    return out.select(
        "gy",
        "gx",
        "case_id",
        "seg_idx",
        (2 * F.col("gx") + F.expr(_MS_EX.format(e="ea"))).cast("long").alias("x1"),
        (2 * F.col("gy") + F.expr(_MS_EY.format(e="ea"))).cast("long").alias("y1"),
        (2 * F.col("gx") + F.expr(_MS_EX.format(e="eb"))).cast("long").alias("x2"),
        (2 * F.col("gy") + F.expr(_MS_EY.format(e="eb"))).cast("long").alias("y2"),
    )


# polygon shape statistics --------------------------------------------------------


def _zone_vertex_rows() -> list[tuple[int, int, int, int, int]]:
    """demo_zones vertices as (zone_id, j, nv, ilat, ilon) with coordinates
    scaled to exact 1e-4-degree integers (the zones are generated rounded
    to 4 dp, so the scaling is lossless) — shoelace sums then stay BIGINT-
    exact on both engines, with no float-summation-order surface."""
    from filda_spark.spatial import demo_zones

    rows = []
    for z in demo_zones():
        nv = len(z["lat"])
        for j, (la, lo) in enumerate(zip(z["lat"], z["lon"])):
            rows.append(
                (z["zone_id"], j, nv, int(round(la * 10000)), int(round(lo * 10000)))
            )
    return rows


@register(
    "polygon_stats",
    None,  # filled in below (needs the vertex literal)
    doc=(
        "per-polygon planar area, centroid and bbox for the zone set "
        "(shoelace formula over 1e-4-deg integer-scaled vertices in a "
        "zone-local frame, so every sum is BIGINT-exact; only the final "
        "area/centroid divisions are float) — the vector-side shape "
        "statistics that accompany zonal_stats/hex_polyfill"
    ),
)
def polygon_stats(spark, sf_dir):
    """Vertices are a driver-side literal (108 zones x <= 8 vertices, the
    same deterministic set zonal_stats broadcasts); the next-vertex hookup
    is a self equi-join on (zone_id, (j+1) mod nv); one groupBy aggregates
    the BIGINT cross products. The translation to a zone-local frame
    (subtract per-zone min) keeps every product < 2^63 regardless of where
    on the globe the zone sits."""
    verts = spark.createDataFrame(
        _zone_vertex_rows(), "zone_id INT, j INT, nv INT, ilat BIGINT, ilon BIGINT"
    )
    mins = verts.groupBy("zone_id").agg(
        F.min("ilat").alias("mlat"), F.min("ilon").alias("mlon")
    )
    v = verts.join(F.broadcast(mins), "zone_id").select(
        "zone_id",
        "j",
        "nv",
        (F.col("ilat") - F.col("mlat")).alias("ly"),
        (F.col("ilon") - F.col("mlon")).alias("lx"),
        "mlat",
        "mlon",
        "ilat",
        "ilon",
    )
    nxt = v.select(
        F.col("zone_id").alias("zid"),
        F.col("j").alias("jn"),
        F.col("ly").alias("nly"),
        F.col("lx").alias("nlx"),
    )
    edges = v.join(
        F.broadcast(nxt),
        (F.col("zone_id") == F.col("zid"))
        & (F.col("jn") == (F.col("j") + 1) % F.col("nv")),
    ).select(
        "zone_id",
        "nv",
        "mlat",
        "mlon",
        "ilat",
        "ilon",
        (F.col("lx") * F.col("nly") - F.col("nlx") * F.col("ly")).alias("crs"),
        ((F.col("lx") + F.col("nlx"))
         * (F.col("lx") * F.col("nly") - F.col("nlx") * F.col("ly"))).alias("cxw"),
        ((F.col("ly") + F.col("nly"))
         * (F.col("lx") * F.col("nly") - F.col("nlx") * F.col("ly"))).alias("cyw"),
    )
    g = edges.groupBy("zone_id").agg(
        F.max("nv").alias("nv"),
        F.max("mlat").alias("mlat"),
        F.max("mlon").alias("mlon"),
        F.min("ilat").alias("ilat_min"),
        F.max("ilat").alias("ilat_max"),
        F.min("ilon").alias("ilon_min"),
        F.max("ilon").alias("ilon_max"),
        F.sum("crs").alias("s_cross"),
        F.sum("cxw").alias("s_cx"),
        F.sum("cyw").alias("s_cy"),
    )
    sc = F.col("s_cross").cast("double")
    return g.select(
        "zone_id",
        "nv",
        F.round(F.abs(sc) / 2.0 / 1.0e8, 9).alias("area_deg2"),
        F.round(
            (F.col("mlat").cast("double") + F.col("s_cy").cast("double") / (3.0 * sc))
            / 10000.0,
            9,
        ).alias("c_lat"),
        F.round(
            (F.col("mlon").cast("double") + F.col("s_cx").cast("double") / (3.0 * sc))
            / 10000.0,
            9,
        ).alias("c_lon"),
        (F.col("ilat_min").cast("double") / 10000.0).alias("lat_min"),
        (F.col("ilat_max").cast("double") / 10000.0).alias("lat_max"),
        (F.col("ilon_min").cast("double") / 10000.0).alias("lon_min"),
        (F.col("ilon_max").cast("double") / 10000.0).alias("lon_max"),
    )


def _polygon_stats_oracle() -> str:
    rows = ", ".join(str(r) for r in _zone_vertex_rows())
    return f"""
    WITH verts AS (
      SELECT * FROM (VALUES {rows}) t(zone_id, j, nv, ilat, ilon)
    ),
    mins AS (
      SELECT zone_id, min(ilat) AS mlat, min(ilon) AS mlon
      FROM verts GROUP BY 1
    ),
    v AS (
      SELECT verts.zone_id, j, nv,
             CAST(ilat - mlat AS BIGINT) AS ly, CAST(ilon - mlon AS BIGINT) AS lx,
             mlat, mlon, ilat, ilon
      FROM verts JOIN mins ON verts.zone_id = mins.zone_id
    ),
    edges AS (
      SELECT a.zone_id, a.nv, a.mlat, a.mlon, a.ilat, a.ilon,
             a.lx * b.ly - b.lx * a.ly AS crs,
             (a.lx + b.lx) * (a.lx * b.ly - b.lx * a.ly) AS cxw,
             (a.ly + b.ly) * (a.lx * b.ly - b.lx * a.ly) AS cyw
      FROM v a JOIN v b
        ON a.zone_id = b.zone_id AND b.j = (a.j + 1) % a.nv
    ),
    g AS (
      SELECT zone_id, max(nv) AS nv, max(mlat) AS mlat, max(mlon) AS mlon,
             min(ilat) AS ilat_min, max(ilat) AS ilat_max,
             min(ilon) AS ilon_min, max(ilon) AS ilon_max,
             CAST(sum(crs) AS BIGINT) AS s_cross,
             CAST(sum(cxw) AS BIGINT) AS s_cx,
             CAST(sum(cyw) AS BIGINT) AS s_cy
      FROM edges GROUP BY 1
    )
    SELECT zone_id, CAST(nv AS INT) AS nv,
           round(abs(CAST(s_cross AS DOUBLE)) / 2.0 / 1.0e8, 9) AS area_deg2,
           round((CAST(mlat AS DOUBLE)
                  + CAST(s_cy AS DOUBLE) / (3.0 * CAST(s_cross AS DOUBLE))) / 10000.0, 9)
             AS c_lat,
           round((CAST(mlon AS DOUBLE)
                  + CAST(s_cx AS DOUBLE) / (3.0 * CAST(s_cross AS DOUBLE))) / 10000.0, 9)
             AS c_lon,
           CAST(ilat_min AS DOUBLE) / 10000.0 AS lat_min,
           CAST(ilat_max AS DOUBLE) / 10000.0 AS lat_max,
           CAST(ilon_min AS DOUBLE) / 10000.0 AS lon_min,
           CAST(ilon_max AS DOUBLE) / 10000.0 AS lon_max
    FROM g
    """


REGISTRY["polygon_stats"].oracle = _polygon_stats_oracle()


# emerging-hotspot classification -------------------------------------------------

_EH_Z = 1.645  # 90% one-sided hot threshold on Gi* z
_EH_S = 2  # Mann-Kendall S threshold for a trend (|S| > 2 of max 28)


@register(
    "emerging_hotspots",
    f"""
    WITH gi AS ({{GI}}),
    mk AS ({{MK}})
    SELECT gi.cy, gi.cx, gi.gi_z,
           CAST(coalesce(mk.s_stat, 0) AS BIGINT) AS s_stat,
           CASE
             WHEN gi.gi_z > {_EH_Z!r} AND coalesce(mk.s_stat, 0) > {_EH_S} THEN 'intensifying'
             WHEN gi.gi_z > {_EH_Z!r} AND coalesce(mk.s_stat, 0) < -{_EH_S} THEN 'diminishing'
             WHEN gi.gi_z > {_EH_Z!r} THEN 'persistent'
             WHEN coalesce(mk.s_stat, 0) > {_EH_S} THEN 'emerging'
             WHEN gi.gi_z < -{_EH_Z!r} THEN 'coldspot'
             ELSE 'none'
           END AS category
    FROM gi LEFT JOIN mk ON gi.cy = mk.cy AND gi.cx = mk.cx
    """,
    doc=(
        "emerging-hot-spot classification per cell: the space-time-cube "
        "product that composes Getis-Ord Gi* (spatial significance) with "
        "the Mann-Kendall trend S (temporal direction) into the standard "
        "categories (intensifying / diminishing / persistent / emerging / "
        "coldspot) — the analytic a fire-monitoring tiling service "
        "publishes from its density cells"
    ),
)
def emerging_hotspots(spark, sf_dir):
    """Pure composition of the two already-verified frames: a LEFT equi-
    join on the cell key (cells whose points all fall in one time bucket
    have no MK pairs; coalesce(S, 0) treats them as trendless, mirrored in
    the oracle) followed by a codegen CASE. The inputs are rounded/integer
    columns with established hash parity, so the classification thresholds
    compare identical values on both engines."""
    gi = getis_ord_gi(spark, sf_dir)
    mk = mann_kendall_trend(spark, sf_dir).select(
        F.col("cy").alias("mcy"), F.col("cx").alias("mcx"), "s_stat"
    )
    j = gi.join(
        mk, (gi.cy == F.col("mcy")) & (gi.cx == F.col("mcx")), "left"
    ).select("cy", "cx", "gi_z", F.coalesce("s_stat", F.lit(0)).alias("s_stat"))
    cat = (
        F.when((F.col("gi_z") > _EH_Z) & (F.col("s_stat") > _EH_S), "intensifying")
        .when((F.col("gi_z") > _EH_Z) & (F.col("s_stat") < -_EH_S), "diminishing")
        .when(F.col("gi_z") > _EH_Z, "persistent")
        .when(F.col("s_stat") > _EH_S, "emerging")
        .when(F.col("gi_z") < -_EH_Z, "coldspot")
        .otherwise("none")
    )
    return j.select("cy", "cx", "gi_z", "s_stat", cat.alias("category"))


REGISTRY["emerging_hotspots"].oracle = REGISTRY["emerging_hotspots"].oracle.format(
    GI=REGISTRY["getis_ord_gi"].oracle, MK=REGISTRY["mann_kendall_trend"].oracle
)


# local Moran's I (LISA) ----------------------------------------------------------


@register(
    "local_moran",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx
      FROM cells
    ),
    d AS (
      SELECT cy, cx, CAST(g.n * x - g.sx AS BIGINT) AS dv
      FROM cells CROSS JOIN g
    ),
    m AS (SELECT CAST(sum(dv * dv) AS BIGINT) AS sm2 FROM d),
    nbr AS (
      SELECT a.cy, a.cx, a.dv,
             CAST(sum(b.dv) AS BIGINT) AS sn,
             CAST(count(*) AS BIGINT) AS wn
      FROM d a JOIN d b
        ON abs(a.cy - b.cy) <= 1 AND abs(a.cx - b.cx) <= 1
       AND NOT (a.cy = b.cy AND a.cx = b.cx)
      GROUP BY a.cy, a.cx, a.dv
    )
    SELECT nbr.cy, nbr.cx, nbr.wn,
           round(CAST(g.n * nbr.dv * nbr.sn AS DOUBLE) / CAST(m.sm2 AS DOUBLE), 6)
             AS lisa_i,
           CASE
             WHEN nbr.dv > 0 AND nbr.sn > 0 THEN 'HH'
             WHEN nbr.dv < 0 AND nbr.sn < 0 THEN 'LL'
             WHEN nbr.dv > 0 AND nbr.sn <= 0 THEN 'HL'
             WHEN nbr.dv < 0 AND nbr.sn >= 0 THEN 'LH'
             ELSE 'NN'
           END AS quadrant
    FROM nbr CROSS JOIN g CROSS JOIN m
    """,
    doc=(
        "local Moran's I (Anselin LISA) per detection-density cell with "
        "queen-contiguity weights (8-neighborhood, self excluded) — the "
        "spatial-autocorrelation companion to getis_ord_gi: deviations are "
        "kept as the integer n*x - sum(x) (z scaled by n), so the numerator "
        "n*d_i*sum_j(d_j) and the moment sum(d^2) are BIGINT-exact and the "
        "statistic I_i = n*d_i*S_i / sum(d^2) incurs exactly one double "
        "division; the HH/LL/HL/LH cluster quadrant is sign-pure integer"
    ),
)
def local_moran(spark, sf_dir):
    """Same plan shape as getis_ord_gi: one partial-agg shuffle for cell
    counts, a scalar-broadcast crossJoin for (n, sx), an 8-neighbor
    stencil explode equi-join on the cell key (self term dropped on the
    integer key, not a float), then one more scalar broadcast of the
    second moment. Every aggregate is BIGINT; headroom at 10^12 points:
    the grid is bounded by geography (O(10^5) half-degree cells), so
    |d| <= n*x_max ~ 10^5 * per-cell count and the triple product stays
    under 2^63 for any corpus this grid can express. The cell frame is
    referenced via four branches (globals, moment, stencil left/right) —
    persisted so the base scan + count shuffle run once, not 7x."""
    cells = _persist_evict(_cell_counts(spark, sf_dir))
    g = cells.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx")
    )
    d = cells.crossJoin(F.broadcast(g)).select(
        "cy", "cx", (F.col("n") * F.col("x") - F.col("sx")).alias("dv")
    )
    m = d.agg(F.sum(F.col("dv") * F.col("dv")).alias("sm2"))
    nbr_side = d.select(
        F.col("dv").alias("bdv"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cy") + dy).alias("cy"), (F.col("cx") + dx).alias("cx")
                    )
                    for dy in (-1, 0, 1)
                    for dx in (-1, 0, 1)
                    if not (dy == 0 and dx == 0)
                ]
            )
        ).alias("k"),
    ).select("bdv", F.col("k.cy").alias("cy"), F.col("k.cx").alias("cx"))
    nbr = (
        d.join(nbr_side, ["cy", "cx"])
        .groupBy("cy", "cx", "dv")
        .agg(F.sum("bdv").alias("sn"), F.count(F.lit(1)).alias("wn"))
    )
    quad = (
        F.when((F.col("dv") > 0) & (F.col("sn") > 0), "HH")
        .when((F.col("dv") < 0) & (F.col("sn") < 0), "LL")
        .when((F.col("dv") > 0) & (F.col("sn") <= 0), "HL")
        .when((F.col("dv") < 0) & (F.col("sn") >= 0), "LH")
        .otherwise("NN")
    )
    return (
        nbr.crossJoin(F.broadcast(g))
        .crossJoin(F.broadcast(m))
        .select(
            "cy",
            "cx",
            "wn",
            F.round(
                (F.col("n") * F.col("dv") * F.col("sn")).cast("double")
                / F.col("sm2").cast("double"),
                6,
            ).alias("lisa_i"),
            quad.alias("quadrant"),
        )
    )


# log-binned mergeable quantile sketch --------------------------------------------

_LQ_PS = (0.5, 0.9, 0.99)  # quantiles served from the sketch


@register(
    "log_quantiles",
    f"""
    WITH iv AS (
      SELECT event_type,
             CAST(floor(value * 100.0) AS BIGINT) + 1 AS iv
      FROM events
    ),
    b AS (
      SELECT event_type,
             CASE WHEN iv < 8 THEN iv
                  ELSE (length(bin(iv)) - 4) * 8
                       + ((iv >> (length(bin(iv)) - 4)) & 7) + 8
             END AS bucket
      FROM iv
    ),
    counts AS (
      SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS c
      FROM b GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, bucket, c,
             CAST(sum(c) OVER (PARTITION BY event_type ORDER BY bucket) AS BIGINT) AS cc,
             CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM counts
    ),
    hits AS (
      SELECT cum.event_type, p.p, min(cum.bucket) AS qb
      FROM cum JOIN (VALUES {", ".join(f"({p!r})" for p in _LQ_PS)}) p(p)
        ON cum.cc >= ceil(p.p * CAST(cum.n AS DOUBLE))
      GROUP BY 1, 2
    )
    SELECT event_type, p,
           qb AS bucket,
           CAST((CASE WHEN qb < 16 THEN qb
                      ELSE (8 + (qb - 8) % 8) << CAST((qb - 8) // 8 AS BIGINT)
                 END) - 1 AS DOUBLE) / 100.0 AS est_value
    FROM hits
    """,
    doc=(
        "mergeable log-binned quantile sketch (DDSketch-style) per event "
        "type: values quantize to integer cents, buckets are the base-2 "
        "exponent plus 3 mantissa sub-bits (<=12.5% relative error, a "
        "build-time knob) computed with pure integer bit algebra "
        "(length(bin(x)) = floor(log2)+1 on BOTH engines — no libm log "
        "whose last-ulp could flip a boundary); bucket counts are plain "
        "sums, so the sketch is merge-order independent and partial-"
        "aggregates map-side; p50/p90/p99 read back from the cumulative "
        "walk with a conservative lower-bound representative"
    ),
)
def log_quantiles(spark, sf_dir):
    """Sketch build is one partial-agg shuffle on (event_type, bucket) —
    the per-group state is O(buckets) = O(8*log2(range)) regardless of row
    count, which is the whole point at 10^12 rows. The quantile read-back
    joins the tiny cumulative frame against a 3-row literal p table
    (broadcast), then one min-agg. Window runs on the per-group bucket
    frame (bounded), never the raw rows."""
    ev = _t(spark, sf_dir, "events")
    iv = F.floor(F.col("value") * 100.0).cast("long") + 1
    # the Python shiftleft/shiftright helpers take only literal shift
    # counts, so the variable-shift bit algebra goes through F.expr (the
    # SQL functions accept column shift amounts)
    bucket = F.expr(
        "CASE WHEN iv < 8 THEN iv"
        " ELSE (length(bin(iv)) - 4) * 8"
        "      + (shiftrightunsigned(iv, length(bin(iv)) - 4) & 7) + 8 END"
    )
    counts = (
        ev.select("event_type", iv.alias("iv"))
        .select("event_type", bucket.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("bucket")
    cum = counts.select(
        "event_type",
        "bucket",
        F.sum("c").over(w).alias("cc"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("n"),
    )
    ps = spark.createDataFrame([(p,) for p in _LQ_PS], "p double")
    hits = (
        cum.join(
            F.broadcast(ps),
            F.col("cc") >= F.ceil(F.col("p") * F.col("n").cast("double")),
        )
        .groupBy("event_type", "p")
        .agg(F.min("bucket").alias("qb"))
    )
    qb = F.col("qb")
    lower = F.expr(
        "CASE WHEN qb < 16 THEN qb"
        " ELSE shiftleft(8 + (qb - 8) % 8, CAST((qb - 8) DIV 8 AS INT)) END"
    )
    return hits.select(
        "event_type",
        "p",
        qb.alias("bucket"),
        ((lower - 1).cast("double") / 100.0).alias("est_value"),
    )


# Horn focal gradient (slope / aspect) --------------------------------------------


@register(
    "slope_aspect",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    nbr AS (
      SELECT a.cy, a.cx,
             CAST(sum(CASE WHEN b.cx - a.cx = 1
                           THEN (CASE WHEN b.cy = a.cy THEN 2 ELSE 1 END) * b.x
                           ELSE 0 END) AS BIGINT) AS east,
             CAST(sum(CASE WHEN a.cx - b.cx = 1
                           THEN (CASE WHEN b.cy = a.cy THEN 2 ELSE 1 END) * b.x
                           ELSE 0 END) AS BIGINT) AS west,
             CAST(sum(CASE WHEN b.cy - a.cy = 1
                           THEN (CASE WHEN b.cx = a.cx THEN 2 ELSE 1 END) * b.x
                           ELSE 0 END) AS BIGINT) AS north,
             CAST(sum(CASE WHEN a.cy - b.cy = 1
                           THEN (CASE WHEN b.cx = a.cx THEN 2 ELSE 1 END) * b.x
                           ELSE 0 END) AS BIGINT) AS south,
             CAST(count(*) AS BIGINT) AS nn
      FROM cells a JOIN cells b
        ON abs(a.cy - b.cy) <= 1 AND abs(a.cx - b.cx) <= 1
       AND NOT (a.cy = b.cy AND a.cx = b.cx)
      GROUP BY a.cy, a.cx
    )
    SELECT cy, cx,
           CAST(east - west AS BIGINT) AS gx,
           CAST(north - south AS BIGINT) AS gy,
           round(sqrt(CAST((east - west) * (east - west)
                           + (north - south) * (north - south) AS DOUBLE)) / 8.0, 6)
             AS slope,
           CASE
             WHEN east = west AND north = south THEN 'FLAT'
             WHEN abs(east - west) > abs(north - south)
                  THEN (CASE WHEN east > west THEN 'E' ELSE 'W' END)
             WHEN abs(north - south) > abs(east - west)
                  THEN (CASE WHEN north > south THEN 'N' ELSE 'S' END)
             ELSE (CASE WHEN north > south THEN 'N' ELSE 'S' END)
                  || (CASE WHEN east > west THEN 'E' ELSE 'W' END)
           END AS aspect
    FROM nbr WHERE nn = 8
    """,
    doc=(
        "Horn's-method focal gradient over the detection-density surface "
        "(the raster map-algebra 'slope/aspect' primitive, computed on the "
        "density raster the tiling engine serves): centered differences "
        "with 2x cardinal / 1x diagonal weights are BIGINT-exact; slope is "
        "one IEEE sqrt of an integer; aspect is an 8-way compass sector "
        "decided purely by integer sign/magnitude comparisons (no "
        "libm-divergent atan2); interior cells only (all 8 neighbors "
        "present), mirrored by the nn = 8 gate"
    ),
)
def slope_aspect(spark, sf_dir):
    """One partial-agg shuffle for the cell raster, then the same 8-way
    stencil explode equi-join as local_moran/getis_ord_gi — the Horn
    weights ride the exploded struct as integer columns, so the whole
    focal pass is one equi-join + one BIGINT groupBy. Post-shuffle
    cardinality is bounded by inhabited cells, never points."""
    cells = _cell_counts(spark, sf_dir)
    stencil = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            w = 2 if (dy == 0 or dx == 0) else 1
            stencil.append(
                F.struct(
                    (F.col("cy") + dy).alias("cy"),
                    (F.col("cx") + dx).alias("cx"),
                    # weights as seen FROM the center cell at (cy+dy, cx+dx):
                    # this neighbor sits at offset (-dy, -dx) from it
                    F.lit(w * (1 if dx == -1 else 0)).alias("we"),
                    F.lit(w * (1 if dx == 1 else 0)).alias("ww"),
                    F.lit(w * (1 if dy == -1 else 0)).alias("wn"),
                    F.lit(w * (1 if dy == 1 else 0)).alias("ws"),
                )
            )
    nbr_side = cells.select(
        F.col("x").alias("bx_"), F.explode(F.array(*stencil)).alias("k")
    ).select(
        "bx_",
        F.col("k.cy").alias("cy"),
        F.col("k.cx").alias("cx"),
        F.col("k.we").alias("we"),
        F.col("k.ww").alias("ww"),
        F.col("k.wn").alias("wn"),
        F.col("k.ws").alias("ws"),
    )
    nbr = (
        cells.select("cy", "cx")
        .join(nbr_side, ["cy", "cx"])
        .groupBy("cy", "cx")
        .agg(
            F.sum(F.col("we") * F.col("bx_")).alias("east"),
            F.sum(F.col("ww") * F.col("bx_")).alias("west"),
            F.sum(F.col("wn") * F.col("bx_")).alias("north"),
            F.sum(F.col("ws") * F.col("bx_")).alias("south"),
            F.count(F.lit(1)).alias("nn"),
        )
        .filter(F.col("nn") == 8)
    )
    gx = F.col("east") - F.col("west")
    gy = F.col("north") - F.col("south")
    aspect = (
        F.when((F.col("east") == F.col("west")) & (F.col("north") == F.col("south")), "FLAT")
        .when(
            F.abs(gx) > F.abs(gy),
            F.when(F.col("east") > F.col("west"), "E").otherwise("W"),
        )
        .when(
            F.abs(gy) > F.abs(gx),
            F.when(F.col("north") > F.col("south"), "N").otherwise("S"),
        )
        .otherwise(
            F.concat(
                F.when(F.col("north") > F.col("south"), F.lit("N")).otherwise(F.lit("S")),
                F.when(F.col("east") > F.col("west"), F.lit("E")).otherwise(F.lit("W")),
            )
        )
    )
    return nbr.select(
        "cy",
        "cx",
        gx.alias("gx"),
        gy.alias("gy"),
        F.round(F.sqrt((gx * gx + gy * gy).cast("double")) / 8.0, 6).alias("slope"),
        aspect.alias("aspect"),
    )


# empirical semivariogram ----------------------------------------------------------

_VG_R = 3  # max lag radius in analysis cells (kRing-3 cover, 49x fan-out)


@register(
    "empirical_variogram",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    pr AS (
      SELECT (b.cy - a.cy) * (b.cy - a.cy) + (b.cx - a.cx) * (b.cx - a.cx) AS d2i,
             CAST(a.x - b.x AS HUGEINT) * CAST(a.x - b.x AS HUGEINT) AS sq
      FROM cells a JOIN cells b
        ON abs(a.cy - b.cy) <= {_VG_R} AND abs(a.cx - b.cx) <= {_VG_R}
       AND (b.cy > a.cy OR (b.cy = a.cy AND b.cx > a.cx))
    )
    SELECT d2i,
           round(sqrt(CAST(d2i AS DOUBLE)) * {_GI_CELL!r}, 6) AS lag_deg,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(CAST(sum(sq) AS DOUBLE) / (2.0 * CAST(count(*) AS DOUBLE)), 6)
             AS gamma
    FROM pr GROUP BY d2i
    """,
    doc=(
        "empirical semivariogram of the detection-density surface: "
        "gamma(h) = sum((x_a - x_b)^2) / (2 n_h) over cell pairs grouped "
        "by their EXACT integer squared cell offset d2i (no float lag "
        "banding to diverge) up to a 3-cell radius — the geostatistics "
        "primitive that sizes IDW/kriging neighborhoods (range/sill/nugget "
        "read-off); squared differences and their sums are 128-bit "
        "integers (Spark DECIMAL(38,0) / DuckDB HUGEINT — a clustered "
        "corpus pushes sum(diff^2) past int64: counts of 1e8 per cell "
        "give diff^2 ~ 1e16, and ~1e3 pairs per lag overflow BIGINT; "
        "review finding r4), one double division per lag"
    ),
)
def empirical_variogram(spark, sf_dir):
    """The stencil family at radius 3: persisted cell frame, kRing-3
    explode (constant 49x minus self/backward — each unordered pair meets
    once via the lexicographic gate), equi-join on the cell key, one
    partial-agg shuffle to O(#lags) rows. Bounded by inhabited cells x
    cover at any corpus size; the pair-square sum carries 2^127 headroom
    (DECIMAL(38,0), the local_moran treatment) so gamma stays exact-until-
    rounded on any inhabitable skew."""
    cells = _persist_evict(_cell_counts(spark, sf_dir))
    right = _ring_explode(
        cells,
        F.col("cy"),
        F.col("cx"),
        [
            F.col("cy").alias("bcy"),
            F.col("cx").alias("bcx"),
            F.col("x").alias("bx_"),
        ],
        radius=_VG_R,
        names=("cy", "cx"),
    )
    dy = F.col("bcy") - F.col("cy")
    dx = F.col("bcx") - F.col("cx")
    diff = F.col("x") - F.col("bx_")
    pr = (
        cells.join(right, ["cy", "cx"])
        .filter(
            (F.col("bcy") > F.col("cy"))
            | ((F.col("bcy") == F.col("cy")) & (F.col("bcx") > F.col("cx")))
        )
        .select(
            (dy * dy + dx * dx).alias("d2i"),
            (diff.cast("decimal(19,0)") * diff.cast("decimal(19,0)")).alias("sq"),
        )
    )
    return (
        pr.groupBy("d2i")
        .agg(F.count(F.lit(1)).alias("n_pairs"), F.sum("sq").alias("ssq"))
        .select(
            "d2i",
            F.round(F.sqrt(F.col("d2i").cast("double")) * _GI_CELL, 6).alias("lag_deg"),
            "n_pairs",
            F.round(
                F.col("ssq").cast("double") / (2.0 * F.col("n_pairs").cast("double")), 6
            ).alias("gamma"),
        )
    )


# hillshade (analytic shading of the density surface) -----------------------------

# light vector for the standard NW sun (azimuth 315 deg, altitude 45 deg),
# precomputed as exact double literals so NO trig runs in either engine:
# L = (cos(alt)*sin(az), cos(alt)*cos(az), sin(alt)) = (-0.5, 0.5, sqrt(.5))
_HS_LX, _HS_LY, _HS_LZ = -0.5, 0.5, 0.7071067811865476


@register(
    "hillshade",
    f"""
    WITH sa AS ({{SA}})
    SELECT cy, cx,
           round(255.0 * greatest(0.0,
                 ((0.0 - CAST(gx AS DOUBLE) / 8.0) * {_HS_LX!r}
                  + (0.0 - CAST(gy AS DOUBLE) / 8.0) * {_HS_LY!r} + {_HS_LZ!r})
                 / sqrt(1.0 + (CAST(gx AS DOUBLE) / 8.0) * (CAST(gx AS DOUBLE) / 8.0)
                            + (CAST(gy AS DOUBLE) / 8.0) * (CAST(gy AS DOUBLE) / 8.0))),
                 6) AS hillshade
    FROM sa
    """,
    doc=(
        "analytic hillshade of the detection-density surface (the "
        "cartographic rendering primitive over the same Horn gradient as "
        "slope_aspect): illumination = 255*max(0, n . L) with the surface "
        "normal n = (-gx/8, -gy/8, 1)/|.| and the standard NW sun "
        "(az 315 deg, alt 45 deg) baked in as exact double LITERALS — no "
        "trig evaluates in either engine, so the only float ops are "
        "mul/add/div/sqrt (IEEE-exact cross-engine); composed over the "
        "verified slope_aspect gradient exactly like emerging_hotspots "
        "composes Gi* + Mann-Kendall"
    ),
)
def hillshade(spark, sf_dir):
    """Pure composition: slope_aspect's stencil plan (one partial-agg
    shuffle + one equi-join, BIGINT gx/gy) followed by a codegen'd
    normal-dot-light projection. No new shuffle class; bounded by
    inhabited cells."""
    sa = slope_aspect(spark, sf_dir)
    gxs = F.col("gx").cast("double") / 8.0
    gys = F.col("gy").cast("double") / 8.0
    dot = (0.0 - gxs) * _HS_LX + (0.0 - gys) * _HS_LY + _HS_LZ
    return sa.select(
        "cy",
        "cx",
        F.round(
            255.0
            * F.greatest(F.lit(0.0), dot / F.sqrt(1.0 + gxs * gxs + gys * gys)),
            6,
        ).alias("hillshade"),
    )


REGISTRY["hillshade"].oracle = REGISTRY["hillshade"].oracle.format(
    SA=REGISTRY["slope_aspect"].oracle
)


# triangle counting ---------------------------------------------------------------

_TRI_E_SQL = f"""
      SELECT DISTINCT least(l_orderkey % {_PR_N}, l_partkey % {_PR_N}) AS u,
             greatest(l_orderkey % {_PR_N}, l_partkey % {_PR_N}) AS v
      FROM lineitem
      WHERE l_orderkey % {_PR_N} <> l_partkey % {_PR_N}
"""


@register(
    "triangle_count",
    f"""
    WITH e AS ({_TRI_E_SQL}),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    corners AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT node, CAST(count(*) AS BIGINT) AS n_tri
    FROM corners GROUP BY node
    """,
    doc=(
        "per-node triangle counts over the order->part graph (id-ordered "
        "edge orientation, each triangle enumerated exactly once as "
        "a<b<c) — the clustering-coefficient / community-density primitive; "
        "pure integer counting, two equi-joins"
    ),
)
def triangle_count(spark, sf_dir):
    """Canonical u<v edge set, then the standard two-join triangle
    enumeration: wedges (a<b, b<c) closed by the (a, c) edge — both joins
    are equi-joins on node keys. At real scale the join order follows
    degree orientation (orient each edge toward the higher-(degree, id)
    endpoint) which bounds wedge fan-out by sqrt(m); id ordering is the
    deterministic sandbox stand-in with the same plan shape. Corner
    attribution is a constant 3x fan-out + one partial-agg groupBy."""
    li = _t(spark, sf_dir, "lineitem")
    s, d = F.col("l_orderkey") % _PR_N, F.col("l_partkey") % _PR_N
    e = _persist_evict(
        li.filter(s != d)
        .select(F.least(s, d).alias("u"), F.greatest(s, d).alias("v"))
        .distinct()
    )  # three wedge-join references: scan + dedup shuffle run once, not 3x
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    # corner attribution via explode, NOT a 3-way union of tri: the union
    # re-embedded the two wedge joins into each branch (3x join work);
    # the explode is a constant map-side fan-out over ONE join pass
    corners = tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))


# single-source shortest path (fixed-round Bellman-Ford) ---------------------------

_SSSP_ROUNDS = 6


def _sssp_oracle_sql() -> str:
    """Bellman-Ford unrolled into chained CTEs (the pagerank idiom): at a
    fixed round count the recursion d_k(v) = min(d_{k-1}(v), min_u(d_{k-1}(u)
    + w(u,v))) is plain SQL; all-integer, so no float drift anywhere."""
    head = f"""
    WITH e AS (
      SELECT DISTINCT l_orderkey % {_PR_N} AS src, l_partkey % {_PR_N} AS dst,
             1 + (l_orderkey % {_PR_N} + l_partkey % {_PR_N}) % 5 AS w
      FROM lineitem
      WHERE l_orderkey % {_PR_N} <> l_partkey % {_PR_N}
    ),
    nodes AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION SELECT dst FROM e)),
    s AS (SELECT min(v) AS sv FROM nodes),
    d0 AS (
      SELECT v, CASE WHEN v = (SELECT sv FROM s) THEN CAST(0 AS BIGINT) END AS dist
      FROM nodes
    )"""
    steps = []
    for k in range(1, _SSSP_ROUNDS + 1):
        steps.append(f"""
    d{k} AS (
      SELECT n.v,
             CAST(least(coalesce(min(p.dist), min(q.dist + e.w)),
                        coalesce(min(q.dist + e.w), min(p.dist))) AS BIGINT) AS dist
      FROM nodes n
      LEFT JOIN d{k - 1} p ON p.v = n.v
      LEFT JOIN e ON e.dst = n.v
      LEFT JOIN d{k - 1} q ON q.v = e.src
      GROUP BY n.v
    )""")
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT v, dist FROM d{_SSSP_ROUNDS} WHERE dist IS NOT NULL
    """
    )


@register(
    "sssp",
    _sssp_oracle_sql(),
    doc=(
        f"single-source shortest path, {_SSSP_ROUNDS} unrolled Bellman-Ford "
        "rounds from the minimum node id over the weighted order->part "
        "graph (w = 1 + (src+dst) %% 5) — the iterative graph-traversal "
        "class alongside pagerank/dup_components; BIGINT distances, so the "
        "min-relaxation is exact at any aggregation order"
    ),
)
def sssp(spark, sf_dir):
    """Each round is one equi-join (frontier x edges on src) + a partial-
    aggregated min per dst + a full-outer-style min merge with the prior
    distances — the textbook distributed Bellman-Ford step where the
    shuffle carries candidate distances, not the graph. Integer min is
    merge-order independent, so no rounding discipline is needed. At real
    iteration counts the loop adds localCheckpoint like dup_components;
    6 static rounds stay under the plan-growth threshold. The source is
    the min node id (one scalar broadcast), never a hard-coded literal
    that might not exist at small SF."""
    li = _t(spark, sf_dir, "lineitem")
    s, d = F.col("l_orderkey") % _PR_N, F.col("l_partkey") % _PR_N
    # w is a pure function of (src, dst): derive it AFTER the distinct so
    # the dedup shuffle carries two columns, not three
    e = (
        li.filter(s != d)
        .select(s.alias("src"), d.alias("dst"))
        .distinct()
        .select(
            "src", "dst", (1 + (F.col("src") + F.col("dst")) % 5).cast("long").alias("w")
        )
    )
    from pyspark import StorageLevel

    while len(_PAGERANK_CACHED) > 4:
        _PAGERANK_CACHED.pop(0).unpersist()
    nodes = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _PAGERANK_CACHED.append(nodes)
    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    _PAGERANK_CACHED.append(e)
    src0 = nodes.agg(F.min("v").alias("sv"))
    dist = (
        nodes.crossJoin(F.broadcast(src0))
        .select(
            "v", F.when(F.col("v") == F.col("sv"), F.lit(0).cast("long")).alias("dist")
        )
        .localCheckpoint(eager=False)
    )
    for _ in range(_SSSP_ROUNDS):
        relax = (
            e.join(dist.select(F.col("v").alias("src"), F.col("dist").alias("du")), "src")
            .select(F.col("dst").alias("v"), (F.col("du") + F.col("w")).alias("cand"))
            .groupBy("v")
            .agg(F.min("cand").alias("cand"))
        )
        # dist appears TWICE per round (relax input + merge) — without the
        # per-round localCheckpoint the lineage doubles each round (2^k
        # subtree copies; measured 13.9 s vs ~1 s for 6 rounds at sf0.1),
        # the same truncation dup_components applies
        dist = (
            dist.join(relax, "v", "left")
            .select("v", F.least(F.col("dist"), F.col("cand")).alias("dist"))
            .localCheckpoint(eager=False)
        )
    return dist.filter(F.col("dist").isNotNull()).select("v", "dist")


# origin-destination flow matrix ---------------------------------------------------


@register(
    "od_flows",
    f"""
    WITH p AS (
      SELECT user_id, epoch_ms(ts) AS t_ms, event_id,
             CAST(floor((CAST(event_id * 7919 % 2000 AS DOUBLE) / 100.0)
                        / {_GI_CELL!r}) AS BIGINT) AS cy,
             CAST(floor((CAST(event_id * 104729 % 2400 AS DOUBLE) / 100.0 + 10.0)
                        / {_GI_CELL!r}) AS BIGINT) AS cx
      FROM events
    ),
    legs AS (
      SELECT user_id, cy AS dcy, cx AS dcx, t_ms,
             lag(cy) OVER w AS ocy, lag(cx) OVER w AS ocx,
             lag(t_ms) OVER w AS o_ms
      FROM p
      WINDOW w AS (PARTITION BY user_id ORDER BY t_ms, event_id)
    )
    SELECT ocy, ocx, dcy, dcx,
           CAST(count(*) AS BIGINT) AS n_trips,
           round(CAST(sum(t_ms - o_ms) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) / 1000.0, 6) AS avg_leg_sec
    FROM legs WHERE ocy IS NOT NULL
    GROUP BY 1, 2, 3, 4
    """,
    doc=(
        "origin-destination flow matrix: consecutive per-user event "
        "positions (deterministic tie-break on event_id) quantized to the "
        "analysis grid, grouped into (origin cell, destination cell) trip "
        "counts with mean leg duration — the mobility-analytics rollup a "
        "trajectory store serves; durations summed as BIGINT ms, one "
        "double division at the end"
    ),
)
def od_flows(spark, sf_dir):
    """One exchange for the per-user lag window (the trajectory_speed /
    stay_points partitioning), then one partial-agg shuffle on the OD cell
    pair. Flow cardinality is bounded by inhabited-cell pairs actually
    connected by trips — at 10^12 events the partial aggregation absorbs
    the volume map-side exactly like the tile rollups."""
    ev = _t(spark, sf_dir, "events")
    p = ev.select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
        "event_id",
        F.floor(
            ((F.col("event_id") * 7919 % 2000).cast("double") / 100.0) / _GI_CELL
        ).alias("cy"),
        F.floor(
            (((F.col("event_id") * 104729 % 2400).cast("double") / 100.0) + 10.0)
            / _GI_CELL
        ).alias("cx"),
    )
    w = Window.partitionBy("user_id").orderBy("t_ms", "event_id")
    legs = p.select(
        F.col("cy").alias("dcy"),
        F.col("cx").alias("dcx"),
        "t_ms",
        F.lag("cy").over(w).alias("ocy"),
        F.lag("cx").over(w).alias("ocx"),
        F.lag("t_ms").over(w).alias("o_ms"),
    ).filter(F.col("ocy").isNotNull())
    return legs.groupBy("ocy", "ocx", "dcy", "dcx").agg(
        F.count(F.lit(1)).alias("n_trips"),
        F.round(
            F.sum(F.col("t_ms") - F.col("o_ms")).cast("double")
            / F.count(F.lit(1)).cast("double")
            / 1000.0,
            6,
        ).alias("avg_leg_sec"),
    )


# Hilbert curve layout key ---------------------------------------------------------

_HB_ORDER = 8  # bits per axis -> 256x256 grid, 16-bit key
_HB_N = 1 << _HB_ORDER


def _hilbert_cte_chain() -> tuple[str, str]:
    """The standard xy2d ladder (accumulate the quadrant digit, then
    rotate/flip the frame) unrolled over the 8 bit levels — the cusum /
    interleave idiom: the recursion is written ONCE here as chained CTEs
    and mirrored step-for-step by the Spark loop. rx/ry come from the
    pre-rotation x/y, so digit and rotation live in one SELECT."""
    chain = [
        f"""h0 AS (
      SELECT event_id,
             least(CAST(floor((lat + 90.0) / 180.0 * {_HB_N}.0) AS BIGINT), {_HB_N - 1}) AS y,
             least(CAST(floor((lon + 180.0) / 360.0 * {_HB_N}.0) AS BIGINT), {_HB_N - 1}) AS x,
             CAST(0 AS BIGINT) AS d
      FROM p
    )"""
    ]
    for k, s in enumerate(1 << b for b in range(_HB_ORDER - 1, -1, -1)):
        chain.append(
            f"""h{k + 1} AS (
      SELECT event_id,
             CASE WHEN (y & {s}) > 0 THEN x
                  WHEN (x & {s}) > 0 THEN {_HB_N - 1} - y ELSE y END AS x,
             CASE WHEN (y & {s}) > 0 THEN y
                  WHEN (x & {s}) > 0 THEN {_HB_N - 1} - x ELSE x END AS y,
             d + {s * s} * (CASE WHEN (x & {s}) > 0 AND (y & {s}) > 0 THEN 2
                                 WHEN (x & {s}) > 0 THEN 3
                                 WHEN (y & {s}) > 0 THEN 1 ELSE 0 END) AS d
      FROM h{k}
    )"""
        )
    return ",\n    ".join(chain), f"h{_HB_ORDER}"


_HB_CTES, _HB_LAST = _hilbert_cte_chain()


@register(
    "hilbert_key",
    f"""
    WITH p AS ({_PT_SQL}),
    {_HB_CTES}
    SELECT event_id, d AS hkey, (d >> 6) AS hbucket
    FROM {_HB_LAST}
    """,
    doc=(
        "Hilbert-curve layout key (order 8, 16-bit): the space-filling "
        "curve with strictly better locality than Z-order (consecutive "
        "keys are ALWAYS 4-adjacent grid neighbors — no Morton jumps), so "
        "bbox scans over hilbert-clustered files touch fewer file ranges; "
        "the xy2d rotate/flip ladder unrolls into pure integer CASE "
        "algebra, zero Python, zero shuffles"
    ),
)
def hilbert_key(spark, sf_dir):
    """Quantize -> 8 chained integer selects (one whole-stage-codegen
    span; Catalyst collapses the projection chain) — the layout key is
    computed at scan speed exactly like zorder_key, and
    repartitionByRange(hbucket) + sortWithinPartitions(hkey) yields the
    Hilbert file layout."""
    df = _pt_df(spark, sf_dir).select(
        "event_id",
        F.least(
            F.floor((F.col("lat") + 90.0) / 180.0 * float(_HB_N)).cast("long"),
            F.lit(_HB_N - 1),
        ).alias("y"),
        F.least(
            F.floor((F.col("lon") + 180.0) / 360.0 * float(_HB_N)).cast("long"),
            F.lit(_HB_N - 1),
        ).alias("x"),
        F.lit(0).cast("long").alias("d"),
    )
    for s in (1 << b for b in range(_HB_ORDER - 1, -1, -1)):
        rx = F.col("x").bitwiseAND(F.lit(s)) > 0
        ry = F.col("y").bitwiseAND(F.lit(s)) > 0
        digit = (
            F.when(rx & ry, 2).when(rx, 3).when(ry, 1).otherwise(0)
        )
        df = df.select(
            "event_id",
            F.when(ry, F.col("x"))
            .when(rx, F.lit(_HB_N - 1) - F.col("y"))
            .otherwise(F.col("y"))
            .alias("x"),
            F.when(ry, F.col("y"))
            .when(rx, F.lit(_HB_N - 1) - F.col("x"))
            .otherwise(F.col("x"))
            .alias("y"),
            (F.col("d") + F.lit(s * s) * digit).alias("d"),
        )
    return df.select(
        "event_id", F.col("d").alias("hkey"), F.shiftright(F.col("d"), 6).alias("hbucket")
    )


# Ripley's K point-pattern statistic ------------------------------------------------

_RK_RADII = (0.25, 0.5, 1.0)  # degrees; max radius bounds the cover cell
_RK_PI = 3.141592653589793


@register(
    "ripley_k",
    f"""
    WITH p AS ({_PT_SQL}),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             (max(lat) - min(lat)) * (max(lon) - min(lon)) AS area
      FROM p
    ),
    pr AS (
      SELECT {" , ".join(
          f"CAST(sum(CASE WHEN (a.lat - b.lat) * (a.lat - b.lat)"
          f" + (a.lon - b.lon) * (a.lon - b.lon) <= {r * r!r}"
          f" THEN 1 ELSE 0 END) AS BIGINT) AS n{i}"
          for i, r in enumerate(_RK_RADII))}
      FROM p a JOIN p b
        ON abs(floor(a.lat) - floor(b.lat)) <= 1
       AND abs(floor(a.lon) - floor(b.lon)) <= 1
       AND a.event_id < b.event_id
    ),
    rows_ AS (
      {" UNION ALL ".join(
          f"SELECT {r!r} AS radius, n{i} AS n_pairs FROM pr"
          for i, r in enumerate(_RK_RADII))}
    )
    SELECT radius, n_pairs,
           round(area * 2.0 * CAST(n_pairs AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)), 6) AS k_hat,
           round(sqrt(area * 2.0 * CAST(n_pairs AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) / {_RK_PI!r}), 6)
             AS l_hat
    FROM rows_ CROSS JOIN g
    """,
    doc=(
        "Ripley's K point-pattern statistic at three radii (K̂(r) = "
        "A·2·pairs(r)/(n(n−1)), plus the variance-stabilized L̂ = "
        "sqrt(K̂/π)) — the clustering-vs-CSR diagnostic run over fire "
        "detections; pair counts are integers from ONE cover pass "
        "(conditional sums per radius, not a join per radius)"
    ),
)
def ripley_k(spark, sf_dir, events: DataFrame | None = None):
    """The dedup/radius_join cover shape: the right side explodes to its
    3x3 1-degree neighbor cells so candidate pairs meet on a pure cell
    equi-join (never points x points); all three radii are conditional
    sums over the single pair stream, so the cover shuffles once. The
    global (n, area) frame is a one-row broadcast. At 10^12 points the
    pair stream is the same skew surface as dedup — the (cell, salt)
    lever IS applied (_salted_cover_join: hot cells split 8 ways, the
    explicit repartition keeps pair parallelism visible to the
    scheduler; 55.6 s -> 9.9 s at sf0.1/local[32]). The point frame is deliberately NOT
    persisted: each of its three references re-derives from a
    column-pruned map-only scan (event_id only), cheaper at scale than
    materializing O(n) points (contrast _persist_evict on the
    O(cells)-sized frames)."""
    base = (
        _pt_df(spark, sf_dir)
        if events is None
        else events.select(
            "event_id",
            ((F.col("event_id") * 7919 % 2000).cast("double") / 100.0).alias("lat"),
            (((F.col("event_id") * 104729 % 2400).cast("double") / 100.0) + 10.0).alias("lon"),
        )
    )
    pts = base.select(
        "event_id", "lat", "lon",
        F.floor("lat").alias("gy"), F.floor("lon").alias("gx"),
    )
    g = pts.agg(
        F.count(F.lit(1)).alias("n"),
        ((F.max("lat") - F.min("lat")) * (F.max("lon") - F.min("lon"))).alias("area"),
    )
    right = _ring_explode(
        pts,
        F.col("gy"),
        F.col("gx"),
        [
            F.col("event_id").alias("eb"),
            F.col("lat").alias("blat"),
            F.col("lon").alias("blon"),
        ],
    )
    d2 = (F.col("lat") - F.col("blat")) * (F.col("lat") - F.col("blat")) + (
        F.col("lon") - F.col("blon")
    ) * (F.col("lon") - F.col("blon"))
    pr = (
        _salted_cover_join(
            spark, pts, right, ["gy", "gx"], "event_id", ring=_RING2
        )
        .filter(F.col("event_id") < F.col("eb"))
        .agg(
            *[
                F.sum(F.when(d2 <= r * r, 1).otherwise(0)).alias(f"n{i}")
                for i, r in enumerate(_RK_RADII)
            ]
        )
    )
    rows = pr.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("radius"), F.col(f"n{i}").alias("n_pairs")
                    )
                    for i, r in enumerate(_RK_RADII)
                ]
            )
        ).alias("k")
    ).select(F.col("k.radius").alias("radius"), F.col("k.n_pairs").alias("n_pairs"))
    khat = (
        F.col("area")
        * 2.0
        * F.col("n_pairs").cast("double")
        / (F.col("n").cast("double") * (F.col("n") - 1).cast("double"))
    )
    return rows.crossJoin(F.broadcast(g)).select(
        "radius",
        "n_pairs",
        F.round(khat, 6).alias("k_hat"),
        F.round(F.sqrt(khat / _RK_PI), 6).alias("l_hat"),
    )


# Knox space-time interaction test --------------------------------------------------

_KNOX_DS = 0.5  # space threshold, degrees
_KNOX_NT = 16  # time buckets; pairs within 1 bucket are "time-close"


@register(
    "knox_pairs",
    f"""
    WITH p0 AS (
      SELECT event_id, epoch_ms(ts) AS t_ms,
             CAST(event_id * 7919 % 2000 AS DOUBLE) / 100.0 AS lat,
             CAST(event_id * 104729 % 2400 AS DOUBLE) / 100.0 + 10.0 AS lon
      FROM events
    ),
    bounds AS (SELECT min(t_ms) AS t0, max(t_ms) + 1 AS t1 FROM p0),
    p AS (
      SELECT event_id, lat, lon,
             CAST(floor(CAST((t_ms - t0) AS DOUBLE) / CAST((t1 - t0) AS DOUBLE)
                        * {_KNOX_NT}) AS BIGINT) AS tb
      FROM p0 CROSS JOIN bounds
    ),
    g AS (SELECT CAST(count(*) AS BIGINT) AS n FROM p),
    sp AS (
      SELECT CAST(count(*) AS BIGINT) AS n_space,
             CAST(sum(CASE WHEN abs(a.tb - b.tb) <= 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_both
      FROM p a JOIN p b
        ON abs(floor(a.lat) - floor(b.lat)) <= 1
       AND abs(floor(a.lon) - floor(b.lon)) <= 1
       AND a.event_id < b.event_id
       AND (a.lat - b.lat) * (a.lat - b.lat)
           + (a.lon - b.lon) * (a.lon - b.lon) <= {_KNOX_DS * _KNOX_DS!r}
    ),
    tm AS (
      SELECT CAST(count(*) AS BIGINT) AS n_time
      FROM p a JOIN p b
        ON abs(a.tb - b.tb) <= 1 AND a.event_id < b.event_id
    )
    SELECT sp.n_space, tm.n_time, sp.n_both,
           CAST((g.n // 2) * (g.n - 1) + (g.n % 2) * ((g.n - 1) // 2)
                AS BIGINT) AS n_pairs,
           round(CAST(sp.n_both AS DOUBLE)
                 / (CAST(sp.n_space AS DOUBLE) * CAST(tm.n_time AS DOUBLE)
                    / CAST((g.n // 2) * (g.n - 1)
                           + (g.n % 2) * ((g.n - 1) // 2) AS DOUBLE)),
                 6) AS knox_ratio
    FROM sp CROSS JOIN tm CROSS JOIN g
    """,
    doc=(
        "Knox space-time interaction test: pairs close in space (<=0.5 "
        "deg), close in time (adjacent 1/16-span buckets), and close in "
        "BOTH, against the independence expectation "
        "E = n_space*n_time/C(n,2) — the epidemiology/fire-spread "
        "clustering diagnostic; every count is integer-exact (C(n,2) via "
        "overflow-safe integer division — exact until the COUNT itself "
        "exceeds int64, i.e. ~4.3e9 events per bucket; past that the "
        "counts need DECIMAL(38,0), the empirical_variogram treatment), "
        "one double ratio at the end"
    ),
)
def knox_pairs(spark, sf_dir, events: DataFrame | None = None):
    """One cover self-join + one histogram: space-close pairs via the 3x3
    cell cover at the threshold's own cell size (time closeness folded in
    as a conditional sum — no second pair pass), riding
    _salted_cover_join (hot cells split 8 ways + explicit repartition).
    Time-close pairs are NOT enumerated at all: pairs within +-1 bucket
    are bucket-histogram algebra, sum C(c_b,2) + sum c_b*c_{b+1} over the
    16-row histogram (the former bucket-cover self-join generated ~2e9
    candidate rows at sf0.1 to produce one integer; 53.7 s -> 3.7 s).
    n_pairs comes from the scalar count, not a join. The point frame is
    deliberately NOT persisted: each reference re-derives from a
    column-pruned (event_id, ts) scan + one broadcast, cheaper at scale
    than materializing O(n) points."""
    ev = events if events is not None else _t(spark, sf_dir, "events")
    p0 = ev.select(
        "event_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
        ((F.col("event_id") * 7919 % 2000).cast("double") / 100.0).alias("lat"),
        (((F.col("event_id") * 104729 % 2400).cast("double") / 100.0) + 10.0).alias(
            "lon"
        ),
    )
    bounds = p0.agg(F.min("t_ms").alias("t0"), (F.max("t_ms") + 1).alias("t1"))
    p = p0.crossJoin(F.broadcast(bounds)).select(
        "event_id",
        "lat",
        "lon",
        F.floor(
            (F.col("t_ms") - F.col("t0")).cast("double")
            / (F.col("t1") - F.col("t0")).cast("double")
            * _KNOX_NT
        )
        .cast("long")
        .alias("tb"),
    )
    g = p.agg(F.count(F.lit(1)).alias("n"))
    # cover cell = the space threshold itself (0.5 deg), NOT the oracle's
    # 1-deg floor: any pair within _KNOX_DS differs by <=1 in each
    # 0.5-deg cell index, and the tighter cover admits 4x fewer candidate
    # pairs (the refine filter makes the two covers result-identical —
    # the oracle keeps its 1-deg form, which parity therefore checks)
    left = p.select(
        "event_id", "lat", "lon", "tb",
        F.floor(F.col("lat") / _KNOX_DS).alias("gy"),
        F.floor(F.col("lon") / _KNOX_DS).alias("gx"),
    )
    right = _ring_explode(
        p,
        F.floor(F.col("lat") / _KNOX_DS),
        F.floor(F.col("lon") / _KNOX_DS),
        [
            F.col("event_id").alias("eb"),
            F.col("lat").alias("blat"),
            F.col("lon").alias("blon"),
            F.col("tb").alias("btb"),
        ],
    )
    d2 = (F.col("lat") - F.col("blat")) * (F.col("lat") - F.col("blat")) + (
        F.col("lon") - F.col("blon")
    ) * (F.col("lon") - F.col("blon"))
    sp = (
        _salted_cover_join(
            spark, left, right, ["gy", "gx"], "event_id", ring=_RING2
        )
        .filter((F.col("event_id") < F.col("eb")) & (d2 <= _KNOX_DS * _KNOX_DS))
        .agg(
            F.count(F.lit(1)).alias("n_space"),
            F.sum(
                F.when(F.abs(F.col("tb") - F.col("btb")) <= 1, 1).otherwise(0)
            ).alias("n_both"),
        )
    )
    # n_time never needs a pair join: pairs within +-1 bucket are pure
    # bucket-histogram algebra, sum_b C(c_b,2) + sum_b c_b*c_{b+1} — one
    # partial-agg shuffle to the 16-row histogram, then a window over it
    # (the former tb-cover self-join enumerated ~2e9 candidate rows at
    # sf0.1 to produce this ONE integer). The lead is gated on tb
    # adjacency so an empty bucket contributes 0, not its successor.
    bc = p.groupBy("tb").agg(F.count(F.lit(1)).alias("c"))
    bw = Window.orderBy("tb")
    tm = (
        bc.select(
            "tb",
            "c",
            F.lead("c").over(bw).alias("nc"),
            F.lead("tb").over(bw).alias("ntb"),
        )
        .select(
            (
                _c2(F.col("c"))
                + F.when(
                    F.col("ntb") == F.col("tb") + 1, F.col("c") * F.col("nc")
                ).otherwise(F.lit(0))
            ).alias("t_pairs")
        )
        .agg(F.sum("t_pairs").alias("n_time"))
    )
    npairs = _c2(F.col("n"))
    return (
        sp.crossJoin(F.broadcast(tm))
        .crossJoin(F.broadcast(g))
        .select(
            "n_space",
            "n_time",
            "n_both",
            npairs.alias("n_pairs"),
            F.round(
                F.col("n_both").cast("double")
                / (
                    F.col("n_space").cast("double")
                    * F.col("n_time").cast("double")
                    / npairs.cast("double")
                ),
                6,
            ).alias("knox_ratio"),
        )
    )


# Epanechnikov kernel density -------------------------------------------------------

_KDE_H = 1.0  # bandwidth, degrees (2 analysis cells)


@register(
    "kde_epanechnikov",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    g AS (SELECT CAST(sum(x) AS BIGINT) AS n FROM cells),
    w AS (
      SELECT c.cy, c.cx,
             sum(CAST(p.x AS DOUBLE)
                 * (1.0 - ((CAST(c.cy AS DOUBLE) + 0.5) * {_GI_CELL!r}
                           - (CAST(p.cy AS DOUBLE) + 0.5) * {_GI_CELL!r})
                         * ((CAST(c.cy AS DOUBLE) + 0.5) * {_GI_CELL!r}
                           - (CAST(p.cy AS DOUBLE) + 0.5) * {_GI_CELL!r})
                         / {_KDE_H * _KDE_H!r}
                         - ((CAST(c.cx AS DOUBLE) + 0.5) * {_GI_CELL!r}
                           - (CAST(p.cx AS DOUBLE) + 0.5) * {_GI_CELL!r})
                         * ((CAST(c.cx AS DOUBLE) + 0.5) * {_GI_CELL!r}
                           - (CAST(p.cx AS DOUBLE) + 0.5) * {_GI_CELL!r})
                         / {_KDE_H * _KDE_H!r})) AS wsum
      FROM cells c JOIN cells p
        ON abs(c.cy - p.cy) <= 2 AND abs(c.cx - p.cx) <= 2
      WHERE ((CAST(c.cy AS DOUBLE) + 0.5) * {_GI_CELL!r}
             - (CAST(p.cy AS DOUBLE) + 0.5) * {_GI_CELL!r})
            * ((CAST(c.cy AS DOUBLE) + 0.5) * {_GI_CELL!r}
             - (CAST(p.cy AS DOUBLE) + 0.5) * {_GI_CELL!r})
            + ((CAST(c.cx AS DOUBLE) + 0.5) * {_GI_CELL!r}
             - (CAST(p.cx AS DOUBLE) + 0.5) * {_GI_CELL!r})
            * ((CAST(c.cx AS DOUBLE) + 0.5) * {_GI_CELL!r}
             - (CAST(p.cx AS DOUBLE) + 0.5) * {_GI_CELL!r})
            < {_KDE_H * _KDE_H!r}
      GROUP BY c.cy, c.cx
    )
    SELECT w.cy, w.cx,
           round(w.wsum * 2.0 / ({_RK_PI!r} * {_KDE_H * _KDE_H!r} * CAST(g.n AS DOUBLE)),
                 9) AS density
    FROM w CROSS JOIN g
    """,
    doc=(
        "kernel density surface with the Epanechnikov kernel "
        "K(u) = 2/(pi h^2) (1 - d^2/h^2): POLYNOMIAL, so every kernel "
        "weight is plain IEEE multiply/divide that matches bit-for-bit "
        "across engines — the reason this op avoids the Gaussian kernel, "
        "whose libm exp() would break hash parity; evaluated cell-to-cell "
        "on the density grid (binned KDE, the production form at scale)"
    ),
)
def kde_epanechnikov(spark, sf_dir):
    """Binned KDE: the kernel is evaluated between CELL centers (the
    standard linear-binning approximation — cost O(cells x cover), not
    O(points x cells)), with the point counts as weights. The cover is a
    kRing-2 stencil explode equi-join (bandwidth = 2 analysis cells); one
    partial-agg shuffle; the normalizer is a one-row broadcast. Sum-order
    drift of the double weights is absorbed by the 9-dp round (weights
    are O(1), cells hold <=10^4 counts). The cell frame is referenced
    three times (normalizer, stencil left/right) — persisted so the base
    scan + count shuffle run once."""
    cells = _persist_evict(_cell_counts(spark, sf_dir))
    g = cells.agg(F.sum("x").alias("n"))
    center = lambda c: (c.cast("double") + 0.5) * _GI_CELL  # noqa: E731
    right = cells.select(
        F.col("x").alias("px"),
        F.col("cy").alias("pcy"),
        F.col("cx").alias("pcx"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cy") + dy).alias("cy"), (F.col("cx") + dx).alias("cx")
                    )
                    for dy in range(-2, 3)
                    for dx in range(-2, 3)
                ]
            )
        ).alias("k"),
    ).select("px", "pcy", "pcx", F.col("k.cy").alias("cy"), F.col("k.cx").alias("cx"))
    dy = center(F.col("cy")) - center(F.col("pcy"))
    dx = center(F.col("cx")) - center(F.col("pcx"))
    d2 = dy * dy + dx * dx
    h2 = _KDE_H * _KDE_H
    w = (
        cells.select("cy", "cx")
        .join(right, ["cy", "cx"])
        .filter(d2 < h2)
        .groupBy("cy", "cx")
        .agg(
            F.sum(
                F.col("px").cast("double")
                * (1.0 - dy * dy / h2 - dx * dx / h2)
            ).alias("wsum")
        )
    )
    return w.crossJoin(F.broadcast(g)).select(
        "cy",
        "cx",
        F.round(
            F.col("wsum") * 2.0 / (_RK_PI * h2 * F.col("n").cast("double")), 9
        ).alias("density"),
    )


# one-sweep track simplification ----------------------------------------------------

_TS_AREA2 = 2500  # 2x triangle-area threshold in (0.01 deg)^2 integer units


@register(
    "track_simplify",
    f"""
    WITH p AS (
      SELECT user_id, epoch_ms(ts) AS t_ms, event_id,
             CAST(event_id * 7919 % 2000 AS BIGINT) AS iy,
             CAST(event_id * 104729 % 2400 AS BIGINT) + 1000 AS ix
      FROM events
    ),
    tri AS (
      SELECT user_id, event_id, t_ms, iy, ix,
             lag(iy) OVER w AS py, lag(ix) OVER w AS px,
             lead(iy) OVER w AS ny, lead(ix) OVER w AS nx
      FROM p
      WINDOW w AS (PARTITION BY user_id ORDER BY t_ms, event_id)
    )
    SELECT user_id, event_id,
           CAST(iy AS DOUBLE) / 100.0 AS lat,
           CAST(ix - 1000 AS DOUBLE) / 100.0 AS lon,
           CAST(CASE WHEN py IS NULL OR ny IS NULL THEN NULL
                ELSE abs((ix - px) * (ny - py) - (nx - px) * (iy - py))
                END AS BIGINT) AS area2
    FROM tri
    WHERE py IS NULL OR ny IS NULL
       OR abs((ix - px) * (ny - py) - (nx - px) * (iy - py)) >= {_TS_AREA2}
    """,
    doc=(
        "one-sweep Visvalingam track simplification: an interior vertex "
        "survives iff twice the triangle area spanned with its ordered "
        "neighbors meets the threshold (endpoints always survive) — "
        "coordinates are the lattice's EXACT centi-degree integers, so "
        "the shoelace cross product is BIGINT and the keep/drop decision "
        "cannot drift; the single-sweep variant is the deterministic, "
        "order-independent form of Visvalingam's iterative removal"
    ),
)
def track_simplify(spark, sf_dir):
    """One per-user window exchange (lag+lead share the frame), then a
    codegen filter — no second pass, no iteration: cost is one shuffle of
    the trajectory table regardless of how many vertices drop. The
    integer cross product reuses polygon_stats' exact-shoelace idiom."""
    ev = _t(spark, sf_dir, "events")
    p = ev.select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
        "event_id",
        (F.col("event_id") * 7919 % 2000).alias("iy"),
        (F.col("event_id") * 104729 % 2400 + 1000).alias("ix"),
    )
    w = Window.partitionBy("user_id").orderBy("t_ms", "event_id")
    tri = p.select(
        "user_id",
        "event_id",
        "iy",
        "ix",
        F.lag("iy").over(w).alias("py"),
        F.lag("ix").over(w).alias("px"),
        F.lead("iy").over(w).alias("ny"),
        F.lead("ix").over(w).alias("nx"),
    )
    cross = F.abs(
        (F.col("ix") - F.col("px")) * (F.col("ny") - F.col("py"))
        - (F.col("nx") - F.col("px")) * (F.col("iy") - F.col("py"))
    )
    ends = F.col("py").isNull() | F.col("ny").isNull()
    return tri.filter(ends | (cross >= _TS_AREA2)).select(
        "user_id",
        "event_id",
        (F.col("iy").cast("double") / 100.0).alias("lat"),
        ((F.col("ix") - 1000).cast("double") / 100.0).alias("lon"),
        F.when(ends, F.lit(None)).otherwise(cross).cast("long").alias("area2"),
    )


# adaptive quadtree binning ---------------------------------------------------------

_QT_D = 8  # max depth (2^8 x 2^8 world grid at the finest level)
_QT_CAP = 256  # split a cell while it holds more than this many points


@register(
    "quadtree_bins",
    f"""
    WITH p AS ({_PT_SQL}),
    base AS (
      SELECT least(CAST(floor((lat + 90.0) / 180.0 * {1 << _QT_D}.0) AS BIGINT),
                   {(1 << _QT_D) - 1}) AS qy0,
             least(CAST(floor((lon + 180.0) / 360.0 * {1 << _QT_D}.0) AS BIGINT),
                   {(1 << _QT_D) - 1}) AS qx0
      FROM p
    ),
    counts AS (
      SELECT d.depth,
             (qy0 >> ({_QT_D} - d.depth)) AS qy,
             (qx0 >> ({_QT_D} - d.depth)) AS qx,
             CAST(count(*) AS BIGINT) AS n_pts
      FROM base CROSS JOIN (VALUES {", ".join(f"({d})" for d in range(_QT_D + 1))}) d(depth)
      GROUP BY 1, 2, 3
    )
    SELECT c.depth, c.qy, c.qx, c.n_pts
    FROM counts c LEFT JOIN counts par
      ON par.depth = c.depth - 1
     AND par.qy = (c.qy >> 1) AND par.qx = (c.qx >> 1)
    WHERE (c.n_pts <= {_QT_CAP} AND (c.depth = 0 OR par.n_pts > {_QT_CAP}))
       OR (c.depth = {_QT_D} AND c.n_pts > {_QT_CAP})
    """,
    doc=(
        "adaptive quadtree tiling: split any cell holding more than "
        f"{_QT_CAP} points, to max depth {_QT_D} — the variable-resolution "
        "tile layout that keeps per-tile row counts bounded under hotspot "
        "skew (dense urban/flare regions get deep small tiles, empty ocean "
        "stays coarse); derived WITHOUT iteration: a cell is a leaf iff it "
        "fits the cap and its parent does not (or it is a capped max-depth "
        "cell), so the whole tree falls out of one multi-depth rollup plus "
        "one parent equi-join"
    ),
)
def quadtree_bins(spark, sf_dir):
    """tile_pyramid's fan-out rollup (constant (D+1)x map-side explode ->
    ONE partial-aggregated exchange) followed by a self equi-join of the
    bounded cell frame on the parent key and a codegen leaf filter. No
    loop, no driver traffic: the classic 'adaptive binning needs
    recursion' shape re-expressed as two relational passes. At 10^12
    points the counts frame is O(inhabited cells x depth) and the cap
    bounds every served tile, which is the point."""
    p = _pt_df(spark, sf_dir)
    n = 1 << _QT_D
    base = p.select(
        F.least(
            F.floor((F.col("lat") + 90.0) / 180.0 * float(n)).cast("long"),
            F.lit(n - 1),
        ).alias("qy0"),
        F.least(
            F.floor((F.col("lon") + 180.0) / 360.0 * float(n)).cast("long"),
            F.lit(n - 1),
        ).alias("qx0"),
    )
    counts = (
        base.select(
            "qy0",
            "qx0",
            F.explode(F.array(*[F.lit(d) for d in range(_QT_D + 1)])).alias("depth"),
        )
        .groupBy(
            "depth",
            F.expr(f"shiftright(qy0, {_QT_D} - depth)").alias("qy"),
            F.expr(f"shiftright(qx0, {_QT_D} - depth)").alias("qx"),
        )
        .agg(F.count(F.lit(1)).alias("n_pts"))
    )
    # the counts frame feeds both sides of the parent self-join — persist
    # so the base scan + level-explode shuffle run once, not twice
    counts = _persist_evict(counts)
    par = counts.select(
        (F.col("depth") + 1).alias("pdepth"),
        F.col("qy").alias("pqy"),
        F.col("qx").alias("pqx"),
        F.col("n_pts").alias("par_n"),
    )
    j = counts.join(
        par,
        (F.col("depth") == F.col("pdepth"))
        & (F.shiftright(F.col("qy"), 1) == F.col("pqy"))
        & (F.shiftright(F.col("qx"), 1) == F.col("pqx")),
        "left",
    )
    leaf = (
        (F.col("n_pts") <= _QT_CAP)
        & ((F.col("depth") == 0) | (F.col("par_n") > _QT_CAP))
    ) | ((F.col("depth") == _QT_D) & (F.col("n_pts") > _QT_CAP))
    return j.filter(leaf).select("depth", "qy", "qx", "n_pts")


# focal majority (categorical map algebra) ------------------------------------------


@register(
    "focal_majority",
    f"""
    WITH p AS (
      SELECT event_type,
             CAST(floor((CAST(event_id * 7919 % 2000 AS DOUBLE) / 100.0)
                        / {_GI_CELL!r}) AS BIGINT) AS cy,
             CAST(floor((CAST(event_id * 104729 % 2400 AS DOUBLE) / 100.0 + 10.0)
                        / {_GI_CELL!r}) AS BIGINT) AS cx
      FROM events
    ),
    tc AS (
      SELECT cy, cx, event_type, CAST(count(*) AS BIGINT) AS c
      FROM p GROUP BY 1, 2, 3
    ),
    cat AS (
      SELECT cy, cx, event_type AS cell_cat
      FROM (
        SELECT cy, cx, event_type,
               row_number() OVER (PARTITION BY cy, cx
                                  ORDER BY c DESC, event_type ASC) AS rn
        FROM tc
      ) WHERE rn = 1
    ),
    nbr AS (
      SELECT a.cy, a.cx, b.cell_cat, CAST(count(*) AS BIGINT) AS nc
      FROM cat a JOIN cat b
        ON abs(a.cy - b.cy) <= 1 AND abs(a.cx - b.cx) <= 1
      GROUP BY 1, 2, 3
    )
    SELECT n.cy, n.cx, c.cell_cat, n.cell_cat AS focal_cat, n.nc AS focal_votes
    FROM (
      SELECT cy, cx, cell_cat, nc,
             row_number() OVER (PARTITION BY cy, cx
                                ORDER BY nc DESC, cell_cat ASC) AS rn
      FROM nbr
    ) n JOIN cat c ON c.cy = n.cy AND c.cx = n.cx
    WHERE n.rn = 1
    """,
    doc=(
        "focal majority filter (categorical map algebra, the mode "
        "companion to slope_aspect's gradient): each analysis cell takes "
        "the dominant event type of its own points (count desc, type asc "
        "tie-break), then the 3x3 neighborhood MAJORITY of those cell "
        "categories — the standard raster smoothing for categorical "
        "layers (land-cover cleanup, fire-class despeckle); counts are "
        "integers and both argmaxes use total orders, so the output is "
        "parallelism-independent"
    ),
)
def focal_majority(spark, sf_dir):
    """Two stencil-family passes on one persisted cell frame: per-cell
    category = WindowGroupLimit top-1 over the (cell, type) counts (the
    kmv/knn idiom — Catalyst forwards <=1 row per partition before the
    exchange), then the 8+1-neighbor explode equi-join (the Gi* shape)
    with a second top-1 window over neighborhood votes. Self excluded is
    NOT wanted here (ArcGIS focal majority includes the center cell).
    Bounded by inhabited cells at any corpus size."""
    tc = (
        _t(spark, sf_dir, "events")
        .select(
            F.floor(
                ((F.col("event_id") * 7919 % 2000).cast("double") / 100.0) / _GI_CELL
            ).alias("cy"),
            F.floor(
                (((F.col("event_id") * 104729 % 2400).cast("double") / 100.0) + 10.0)
                / _GI_CELL
            ).alias("cx"),
            F.col("event_type"),
        )
        .groupBy("cy", "cx", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_cell = Window.partitionBy("cy", "cx").orderBy(
        F.col("c").desc(), F.col("event_type").asc()
    )
    cat = _persist_evict(
        tc.withColumn("rn", F.row_number().over(w_cell))
        .filter(F.col("rn") == 1)
        .select("cy", "cx", F.col("event_type").alias("cell_cat"))
    )
    nbr_side = cat.select(
        F.col("cell_cat").alias("bcat"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cy") + dy).alias("cy"), (F.col("cx") + dx).alias("cx")
                    )
                    for dy in (-1, 0, 1)
                    for dx in (-1, 0, 1)
                ]
            )
        ).alias("k"),
    ).select("bcat", F.col("k.cy").alias("cy"), F.col("k.cx").alias("cx"))
    nbr = (
        cat.select("cy", "cx")
        .join(nbr_side, ["cy", "cx"])
        .groupBy("cy", "cx", "bcat")
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    w_focal = Window.partitionBy("cy", "cx").orderBy(
        F.col("nc").desc(), F.col("bcat").asc()
    )
    return (
        nbr.withColumn("rn", F.row_number().over(w_focal))
        .filter(F.col("rn") == 1)
        .join(cat, ["cy", "cx"])
        .select(
            "cy",
            "cx",
            "cell_cat",
            F.col("bcat").alias("focal_cat"),
            F.col("nc").alias("focal_votes"),
        )
    )


# co-location pattern mining --------------------------------------------------------

_CL_D = 0.5  # neighborhood distance, degrees (also the cover cell size)


@register(
    "colocation_patterns",
    f"""
    WITH p AS (
      SELECT event_id, event_type,
             CAST(event_id * 7919 % 2000 AS DOUBLE) / 100.0 AS lat,
             CAST(event_id * 104729 % 2400 AS DOUBLE) / 100.0 + 10.0 AS lon
      FROM events
    ),
    pairs AS (
      SELECT DISTINCT a.event_id AS aid, a.event_type AS ta, b.event_type AS tb
      FROM p a JOIN p b
        ON a.event_id <> b.event_id
       AND a.event_type <> b.event_type
       AND (a.lat - b.lat) * (a.lat - b.lat)
           + (a.lon - b.lon) * (a.lon - b.lon) <= {_CL_D * _CL_D!r}
    ),
    part AS (
      SELECT ta, tb, CAST(count(*) AS BIGINT) AS k FROM pairs GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1
    )
    SELECT f.ta AS type_a, f.tb AS type_b,
           f.k AS a_participants, r.k AS b_participants,
           na.n AS n_a, nb.n AS n_b,
           round(least(CAST(f.k AS DOUBLE) / CAST(na.n AS DOUBLE),
                       CAST(r.k AS DOUBLE) / CAST(nb.n AS DOUBLE)), 6) AS pi
    FROM part f
    JOIN part r ON f.ta = r.tb AND f.tb = r.ta AND f.ta < f.tb
    JOIN tot na ON na.event_type = f.ta
    JOIN tot nb ON nb.event_type = f.tb
    """,
    doc=(
        "co-location pattern mining (Shekhar-Huang participation index) "
        "over event types: for each type pair (A, B), the fraction of A "
        "instances with >=1 B within 0.5 deg and vice versa; "
        "PI = min(pr_A, pr_B) ranks spatially-associated type pairs (the "
        "fire-analytics question 'which detection classes co-occur "
        "spatially' — flares vs persistent hotspots). Instance "
        "participation is a distinct count, so a dense neighbor clique "
        "counts once; pair existence is symmetric at the instance level, "
        "so the direction join drops nothing"
    ),
)
def colocation_patterns(spark, sf_dir, events: DataFrame | None = None):
    """The salted cover self-join (cell size = the distance threshold
    itself) streams candidate pairs once; participation collapses the
    pair stream IMMEDIATELY to distinct (instance, partner-type) — the
    map-side-combinable key — so the heavy stream never reaches a wide
    shuffle. The per-direction counts and type totals are tiny frames
    (T and T^2 rows); their joins all broadcast. At 10^12 points the
    only scale surface is the cover pair stream, which inherits
    _salted_cover_join's hot-cell lever verbatim."""
    ev = events if events is not None else _t(spark, sf_dir, "events")
    p = ev.select(
        "event_id",
        "event_type",
        ((F.col("event_id") * 7919 % 2000).cast("double") / 100.0).alias("lat"),
        (((F.col("event_id") * 104729 % 2400).cast("double") / 100.0) + 10.0).alias(
            "lon"
        ),
    )
    left = p.select(
        "event_id", "event_type", "lat", "lon",
        F.floor(F.col("lat") / _CL_D).alias("gy"),
        F.floor(F.col("lon") / _CL_D).alias("gx"),
    )
    right = _ring_explode(
        p,
        F.floor(F.col("lat") / _CL_D),
        F.floor(F.col("lon") / _CL_D),
        [
            F.col("event_id").alias("eb"),
            F.col("event_type").alias("btype"),
            F.col("lat").alias("blat"),
            F.col("lon").alias("blon"),
        ],
    )
    d2 = (F.col("lat") - F.col("blat")) * (F.col("lat") - F.col("blat")) + (
        F.col("lon") - F.col("blon")
    ) * (F.col("lon") - F.col("blon"))
    part = (
        _salted_cover_join(
            spark, left, right, ["gy", "gx"], "event_id", ring=_RING2
        )
        .filter(
            (F.col("event_id") != F.col("eb"))
            & (F.col("event_type") != F.col("btype"))
            & (d2 <= _CL_D * _CL_D)
        )
        .select("event_id", F.col("event_type").alias("ta"), F.col("btype").alias("tb"))
        .distinct()
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    # the T^2-row directional frame closes over the whole pair stream and
    # is referenced twice (forward + swapped) — persist so the cover join
    # + distinct run once, not twice
    part = _persist_evict(part)
    tot = p.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    r = part.select(
        F.col("ta").alias("r_ta"), F.col("tb").alias("r_tb"), F.col("k").alias("rk")
    )
    return (
        part.join(
            F.broadcast(r),
            (F.col("ta") == F.col("r_tb")) & (F.col("tb") == F.col("r_ta")),
        )
        .filter(F.col("ta") < F.col("tb"))
        .join(F.broadcast(tot.select(F.col("event_type").alias("ta"), F.col("n").alias("n_a"))), "ta")
        .join(F.broadcast(tot.select(F.col("event_type").alias("tb"), F.col("n").alias("n_b"))), "tb")
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            F.col("k").alias("a_participants"),
            F.col("rk").alias("b_participants"),
            "n_a",
            "n_b",
            F.round(
                F.least(
                    F.col("k").cast("double") / F.col("n_a").cast("double"),
                    F.col("rk").cast("double") / F.col("n_b").cast("double"),
                ),
                6,
            ).alias("pi"),
        )
    )


# D8 flow direction + accumulation (hydrology pair over the density surface) ----

# ESRI D8 codes, (dy, dx, code) with +y north; inverse neighbor distance is
# an exact double LITERAL (1 cardinal, 1/sqrt(2) diagonal) so the drop is a
# single IEEE multiply — identical cross-engine, no libm
_D8_INV_SQRT2 = 0.7071067811865476
_D8_DIRS = [
    (0, 1, 1), (-1, 1, 2), (-1, 0, 4), (-1, -1, 8),
    (0, -1, 16), (1, -1, 32), (1, 0, 64), (1, 1, 128),
]

_D8_DIR_CASE_SQL = "CASE " + " ".join(
    f"WHEN b.cy - a.cy = {dy} AND b.cx - a.cx = {dx} THEN {code}"
    for dy, dx, code in _D8_DIRS
) + " END"

_D8_INV_SQL = (
    "CASE WHEN a.cy = b.cy OR a.cx = b.cx THEN 1.0 "
    f"ELSE {_D8_INV_SQRT2!r} END"
)

# the D8 pipeline as a reusable CTE chain (d8_flow_dir selects from it;
# flow_accumulation builds its edge set on top)
_D8_SQL = f"""
    p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    nbr AS (
      SELECT a.cy, a.cx,
             CAST(a.x - b.x AS DOUBLE) * ({_D8_INV_SQL}) AS drp,
             {_D8_DIR_CASE_SQL} AS dir,
             count(*) OVER (PARTITION BY a.cy, a.cx) AS nn
      FROM cells a JOIN cells b
        ON abs(a.cy - b.cy) <= 1 AND abs(a.cx - b.cx) <= 1
       AND NOT (a.cy = b.cy AND a.cx = b.cx)
    ),
    ranked AS (
      SELECT cy, cx, dir, drp,
             row_number() OVER (PARTITION BY cy, cx ORDER BY drp DESC, dir) AS rn
      FROM nbr WHERE nn = 8
    ),
    d8 AS (
      SELECT cy, cx,
             CAST(CASE WHEN drp > 0.0 THEN dir ELSE 0 END AS INT) AS d8_dir,
             round(CASE WHEN drp > 0.0 THEN drp ELSE 0.0 END, 6) AS steepest_drop
      FROM ranked WHERE rn = 1
    )
"""


def _d8_frame(spark, sf_dir) -> DataFrame:
    """Spark twin of the ``_D8_SQL`` chain: the slope_aspect stencil join
    with the direction code + inverse distance riding the exploded struct,
    then one window (count + row_number share the (cy, cx) exchange) for
    the argmax. Post-shuffle cardinality is 8x inhabited cells."""
    cells = _persist_evict(_cell_counts(spark, sf_dir))
    right = cells.select(
        F.col("x").alias("bx_"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        # neighbor at a + (dy, dx) means b lands on a = b - (dy, dx)
                        (F.col("cy") - dy).alias("cy"),
                        (F.col("cx") - dx).alias("cx"),
                        F.lit(code).alias("dir"),
                        F.lit(
                            1.0 if dy == 0 or dx == 0 else _D8_INV_SQRT2
                        ).alias("inv"),
                    )
                    for dy, dx, code in _D8_DIRS
                ]
            )
        ).alias("k"),
    ).select("bx_", "k.cy", "k.cx", "k.dir", "k.inv")
    j = cells.join(right, ["cy", "cx"]).select(
        "cy",
        "cx",
        ((F.col("x") - F.col("bx_")).cast("double") * F.col("inv")).alias("drp"),
        "dir",
    )
    part = Window.partitionBy("cy", "cx")
    r = j.select(
        "*",
        F.count(F.lit(1)).over(part).alias("nn"),
        F.row_number().over(part.orderBy(F.col("drp").desc(), F.col("dir"))).alias(
            "rn"
        ),
    )
    return r.filter((F.col("nn") == 8) & (F.col("rn") == 1)).select(
        "cy",
        "cx",
        F.when(F.col("drp") > 0.0, F.col("dir"))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("d8_dir"),
        F.round(
            F.when(F.col("drp") > 0.0, F.col("drp")).otherwise(F.lit(0.0)), 6
        ).alias("steepest_drop"),
    )


@register(
    "d8_flow_dir",
    f"WITH {_D8_SQL} SELECT cy, cx, d8_dir, steepest_drop FROM d8",
    doc=(
        "D8 steepest-descent flow direction over the detection-density "
        "surface (ESRI codes E=1..NE=128, 0 = sink/flat): the hydrology "
        "primitive completing the terrain family (slope/aspect/hillshade/"
        "variogram) — drop = (x_a - x_b) * inv_dist with inv_dist an exact "
        "double literal, so the only float op is one IEEE multiply; argmax "
        "by (drop DESC, code) is deterministic cross-engine; interior "
        "cells only (nn = 8, the slope_aspect gate)"
    ),
)
def d8_flow_dir(spark, sf_dir):
    """See _d8_frame: one partial-agg shuffle to cells, one stencil
    equi-join (constant 8x fan-out), one (cy, cx) window exchange shared
    by the nn count and the argmax row_number. Bounded by inhabited
    cells at any corpus size."""
    return _d8_frame(spark, sf_dir)


_FA_ROUNDS = 4  # fixed accumulation rounds (upstream horizon = 4 cells)


def _fa_edges_sql() -> str:
    dy_case = "CASE " + " ".join(
        f"WHEN d8_dir = {code} THEN {dy}" for dy, dx, code in _D8_DIRS
    ) + " END"
    dx_case = "CASE " + " ".join(
        f"WHEN d8_dir = {code} THEN {dx}" for dy, dx, code in _D8_DIRS
    ) + " END"
    return (
        f"SELECT cy AS scy, cx AS scx, cy + {dy_case} AS tcy, "
        f"cx + {dx_case} AS tcx FROM d8 WHERE d8_dir > 0"
    )


def _fa_oracle_sql() -> str:
    steps = []
    for k in range(1, _FA_ROUNDS + 1):
        steps.append(f"""
    a{k} AS (
      SELECT c.cy, c.cx, CAST(1 + coalesce(sum(p.acc), 0) AS BIGINT) AS acc
      FROM a0 c
      LEFT JOIN e ON e.tcy = c.cy AND e.tcx = c.cx
      LEFT JOIN a{k - 1} p ON p.cy = e.scy AND p.cx = e.scx
      GROUP BY c.cy, c.cx
    )""")
    return (
        f"WITH {_D8_SQL},\n    e AS ({_fa_edges_sql()}),\n"
        "    a0 AS (SELECT cy, cx, CAST(1 AS BIGINT) AS acc FROM cells),"
        + ",".join(steps)
        + f"\n    SELECT cy, cx, acc FROM a{_FA_ROUNDS}"
    )


@register(
    "flow_accumulation",
    _fa_oracle_sql(),
    doc=(
        "D8 flow accumulation, fixed 4 rounds (acc = 1 + sum of upstream "
        "neighbors' previous acc): counts the contributing cells within a "
        "4-cell upstream horizon — exact accumulation wherever the flow "
        "path depth is <= 4 (the D8 graph is acyclic by construction: "
        "every edge strictly descends the surface). BIGINT end to end; "
        "the iterative-op class with a fully unrolled CTE oracle "
        "(the pagerank pattern)"
    ),
)
def flow_accumulation(spark, sf_dir):
    """Each round is one equi-join (edges x acc on the source key) + one
    partial-agg groupBy on the target + a left join back to the cell set
    — the pagerank round shape where the shuffle carries contributions,
    not the graph. Edge and base frames are persisted (every round
    references them); each cell has <= 1 outgoing edge, so the edge set
    is bounded by inhabited cells. At real horizons the loop adds
    localCheckpoint every few rounds (dup_components' plan-size control);
    4 static rounds stay under that threshold."""
    d8 = _d8_frame(spark, sf_dir).filter(F.col("d8_dir") > 0)
    dy = F.when(F.lit(False), 0)
    dx = F.when(F.lit(False), 0)
    for ddy, ddx, code in _D8_DIRS:
        dy = dy.when(F.col("d8_dir") == code, ddy)
        dx = dx.when(F.col("d8_dir") == code, ddx)
    edges = _persist_evict(
        d8.select(
            F.col("cy").alias("scy"),
            F.col("cx").alias("scx"),
            (F.col("cy") + dy).alias("tcy"),
            (F.col("cx") + dx).alias("tcx"),
        )
    )
    base = _persist_evict(_cell_counts(spark, sf_dir).select("cy", "cx"))
    acc = base.select("cy", "cx", F.lit(1).cast("long").alias("acc"))
    for _ in range(_FA_ROUNDS):
        inc = (
            edges.join(
                acc.select(
                    F.col("cy").alias("scy"),
                    F.col("cx").alias("scx"),
                    F.col("acc").alias("p_acc"),
                ),
                ["scy", "scx"],
            )
            .groupBy(F.col("tcy").alias("cy"), F.col("tcx").alias("cx"))
            .agg(F.sum("p_acc").alias("s"))
        )
        acc = base.join(inc, ["cy", "cx"], "left").select(
            "cy",
            "cx",
            (F.lit(1) + F.coalesce(F.col("s"), F.lit(0))).cast("long").alias("acc"),
        )
    return acc


# Theil-Sen robust trend ------------------------------------------------------


@register(
    "theil_sen_trend",
    f"""
    WITH {_MK_SERIES_SQL},
    pr AS (
      SELECT a.cy, a.cx,
             CAST(b.x - a.x AS DOUBLE) / CAST(b.tb - a.tb AS DOUBLE) AS slope
      FROM series a JOIN series b
        ON a.cy = b.cy AND a.cx = b.cx AND a.tb < b.tb
    ),
    r AS (
      SELECT cy, cx, slope,
             row_number() OVER (PARTITION BY cy, cx ORDER BY slope) AS rn,
             count(*) OVER (PARTITION BY cy, cx) AS m
      FROM pr
    )
    SELECT cy, cx, CAST(max(m) AS BIGINT) AS n_pairs,
           round(avg(slope), 6) AS sen_slope
    FROM r
    WHERE rn = (m + 1) // 2 OR rn = (m + 2) // 2
    GROUP BY cy, cx
    """,
    doc=(
        "Theil-Sen robust trend per cell over the 8 time buckets: the "
        "median of all pairwise slopes (x_j - x_i)/(t_j - t_i) — the "
        "outlier-resistant companion to mann_kendall_trend's S statistic "
        "(one burst bucket cannot flip the slope estimate); the median is "
        "the mean of the two middle order statistics, so ties and even "
        "counts are deterministic cross-engine"
    ),
)
def theil_sen_trend(spark, sf_dir, events: DataFrame | None = None):
    """Same bounded self-equi-join as mann_kendall (<= C(8,2) = 28 pairs
    per cell, never a range join) on the persisted _mk_series frame; the
    median comes from one (cy, cx) window exchange (row_number + count
    share it) and a final partial-agg groupBy — order statistics, not a
    percentile approximation, so parity is exact."""
    series = _persist_evict(_mk_series(spark, sf_dir, events))
    a = series.select("cy", "cx", F.col("tb").alias("ta"), F.col("x").alias("xa"))
    b = series.select("cy", "cx", F.col("tb").alias("tbk"), F.col("x").alias("xb"))
    pr = (
        a.join(b, ["cy", "cx"])
        .filter(F.col("ta") < F.col("tbk"))
        .select(
            "cy",
            "cx",
            (
                (F.col("xb") - F.col("xa")).cast("double")
                / (F.col("tbk") - F.col("ta")).cast("double")
            ).alias("slope"),
        )
    )
    part = Window.partitionBy("cy", "cx")
    r = pr.select(
        "*",
        F.row_number().over(part.orderBy("slope")).alias("rn"),
        F.count(F.lit(1)).over(part).alias("m"),
    )
    return (
        r.filter(
            (F.col("rn") == F.shiftright(F.col("m") + 1, 1))
            | (F.col("rn") == F.shiftright(F.col("m") + 2, 1))
        )
        .groupBy("cy", "cx")
        .agg(
            F.max("m").cast("long").alias("n_pairs"),
            F.round(F.avg("slope"), 6).alias("sen_slope"),
        )
    )


# join count statistics (binary-surface spatial autocorrelation) ---------------

_JC_THRESH = 2  # cells with >= 2 detections are "black"


@register(
    "join_counts",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN x >= {_JC_THRESH} THEN 1 ELSE 0 END) AS BIGINT)
               AS nb
      FROM cells
    ),
    pr AS (
      SELECT CASE WHEN a.x >= {_JC_THRESH} THEN 1 ELSE 0 END AS ab,
             CASE WHEN b.x >= {_JC_THRESH} THEN 1 ELSE 0 END AS bb
      FROM cells a JOIN cells b
        ON (b.cy = a.cy AND b.cx = a.cx + 1)
        OR (b.cy = a.cy + 1 AND b.cx = a.cx)
    ),
    j AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(ab * bb) AS BIGINT) AS jbb,
             CAST(sum((1 - ab) * (1 - bb)) AS BIGINT) AS jww
      FROM pr
    )
    SELECT j.m, j.jbb, CAST(j.m - j.jbb - j.jww AS BIGINT) AS jbw, j.jww,
           g.nb AS n_black, g.n AS n_cells,
           round(CAST(j.m AS DOUBLE) * CAST(g.nb AS DOUBLE)
                 * CAST(g.nb - 1 AS DOUBLE)
                 / (CAST(g.n AS DOUBLE) * CAST(g.n - 1 AS DOUBLE)), 6) AS e_bb
    FROM j CROSS JOIN g
    """,
    doc=(
        "join count statistics (Cliff-Ord BB/BW/WW) over the binarized "
        "density surface (black = cell count >= 2, rook adjacency among "
        "inhabited cells): the categorical-surface autocorrelation "
        "diagnostic — observed same-color joins vs the E[BB] = "
        "m*nb*(nb-1)/(n*(n-1)) independence expectation; every count is "
        "integer-exact, one double expression at the end"
    ),
)
def join_counts(spark, sf_dir):
    """Each unordered rook pair meets exactly once: the right side
    explodes to its W and N neighbor positions only (2x constant map-side
    fan-out — half the stencil, since (a, a+e) and (a+e, a) are the same
    join), then a pure equi-join on the cell key and ONE conditional-sum
    agg to a single row. Bounded by inhabited cells at any corpus size."""
    cells = _persist_evict(_cell_counts(spark, sf_dir))
    g = cells.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("x") >= _JC_THRESH, 1).otherwise(0)).alias("nb"),
    )
    right = cells.select(
        F.col("x").alias("bx_"),
        F.explode(
            F.array(
                F.struct(F.col("cy").alias("cy"), (F.col("cx") - 1).alias("cx")),
                F.struct((F.col("cy") - 1).alias("cy"), F.col("cx").alias("cx")),
            )
        ).alias("k"),
    ).select("bx_", "k.cy", "k.cx")
    ab = F.when(F.col("x") >= _JC_THRESH, 1).otherwise(0)
    bb = F.when(F.col("bx_") >= _JC_THRESH, 1).otherwise(0)
    j = cells.join(right, ["cy", "cx"]).agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(ab * bb).alias("jbb"),
        F.sum((1 - ab) * (1 - bb)).alias("jww"),
    )
    md, nbd = F.col("m").cast("double"), F.col("nb").cast("double")
    nd = F.col("n").cast("double")
    return j.crossJoin(F.broadcast(g)).select(
        "m",
        "jbb",
        (F.col("m") - F.col("jbb") - F.col("jww")).cast("long").alias("jbw"),
        "jww",
        F.col("nb").alias("n_black"),
        F.col("n").alias("n_cells"),
        F.round(
            md * nbd * (F.col("nb") - 1).cast("double")
            / (nd * (F.col("n") - 1).cast("double")),
            6,
        ).alias("e_bb"),
    )


# standard deviational ellipse -------------------------------------------------


@register(
    "std_ellipse",
    """
    WITH b AS (
      SELECT event_type,
             event_id * 7919 % 2000 AS iy,
             event_id * 104729 % 2400 AS ix
      FROM events
    ),
    s AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(iy AS HUGEINT)) AS sy, sum(CAST(ix AS HUGEINT)) AS sx,
             sum(CAST(iy AS HUGEINT) * iy) AS syy,
             sum(CAST(ix AS HUGEINT) * ix) AS sxx,
             sum(CAST(ix AS HUGEINT) * iy) AS sxy
      FROM b GROUP BY event_type
    ),
    m AS (
      SELECT event_type, n,
             CAST(sy AS DOUBLE) AS syd, CAST(sx AS DOUBLE) AS sxd,
             CAST(n AS DOUBLE) AS nd,
             CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE) AS myy,
             CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE) AS mxx,
             CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE) AS mxy
      FROM s
    ),
    v AS (
      SELECT event_type, n, syd, sxd, nd,
             myy / (nd * nd) AS vyy,
             mxx / (nd * nd) AS vxx,
             mxy / (nd * nd) AS vxy
      FROM m
    ),
    e AS (
      SELECT event_type, n, syd, sxd, nd, vxx, vyy, vxy,
             (vxx + vyy) / 2.0 AS t,
             sqrt(((vxx - vyy) / 2.0) * ((vxx - vyy) / 2.0) + vxy * vxy) AS d
      FROM v
    )
    SELECT event_type, n,
           round(syd / nd / 100.0, 6) AS mean_lat,
           round(sxd / nd / 100.0 + 10.0, 6) AS mean_lon,
           round(sqrt(greatest(0.0, t + d)) / 100.0, 6) AS sigma_major_deg,
           round(sqrt(greatest(0.0, t - d)) / 100.0, 6) AS sigma_minor_deg,
           round(2.0 * vxy / nullif(vxx - vyy, 0.0), 6) AS tan2theta
    FROM e
    """,
    doc=(
        "standard deviational ellipse per event type (mean center, major/"
        "minor axis sigmas, orientation as tan(2*theta) = 2*Cxy/(Cxx-Cyy)): "
        "the directional-distribution summary of a point class — all "
        "moments accumulate on the EXACT integer centi-degree grid "
        "(128-bit: Spark DECIMAL(38,0) / DuckDB HUGEINT, so n*Sxx - Sx^2 "
        "cannot overflow or drift with aggregation order at 10^12 rows); "
        "eigenvalues via the closed 2x2 form (t/2 +- sqrt(..)) — "
        "sqrt-only IEEE float math, no libm trig in either engine"
    ),
)
def std_ellipse(spark, sf_dir):
    """ONE partial-agg shuffle on event_type builds every raw moment as a
    128-bit-exact integer sum; the eigen decomposition is codegen column
    algebra on the tiny per-type frame. Nothing after the first exchange
    grows with the corpus."""
    ev = _t(spark, sf_dir, "events")
    iy = F.col("event_id") * 7919 % 2000
    ix = F.col("event_id") * 104729 % 2400
    dec = "decimal(38,0)"
    s = (
        ev.select("event_type", iy.alias("iy"), ix.alias("ix"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("iy").cast(dec)).alias("sy"),
            F.sum(F.col("ix").cast(dec)).alias("sx"),
            F.sum((F.col("iy") * F.col("iy")).cast(dec)).alias("syy"),
            F.sum((F.col("ix") * F.col("ix")).cast(dec)).alias("sxx"),
            F.sum((F.col("ix") * F.col("iy")).cast(dec)).alias("sxy"),
        )
    )
    nD = F.col("n").cast(dec)
    nd = F.col("n").cast("double")
    m = s.select(
        "event_type",
        "n",
        F.col("sy").cast("double").alias("syd"),
        F.col("sx").cast("double").alias("sxd"),
        nd.alias("nd"),
        (nD * F.col("syy") - F.col("sy") * F.col("sy")).cast("double").alias("myy"),
        (nD * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double").alias("mxx"),
        (nD * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double").alias("mxy"),
    )
    v = m.select(
        "event_type",
        "n",
        "syd",
        "sxd",
        "nd",
        (F.col("myy") / (F.col("nd") * F.col("nd"))).alias("vyy"),
        (F.col("mxx") / (F.col("nd") * F.col("nd"))).alias("vxx"),
        (F.col("mxy") / (F.col("nd") * F.col("nd"))).alias("vxy"),
    )
    e = v.select(
        "*",
        ((F.col("vxx") + F.col("vyy")) / 2.0).alias("t"),
        F.sqrt(
            ((F.col("vxx") - F.col("vyy")) / 2.0)
            * ((F.col("vxx") - F.col("vyy")) / 2.0)
            + F.col("vxy") * F.col("vxy")
        ).alias("d"),
    )
    return e.select(
        "event_type",
        "n",
        F.round(F.col("syd") / F.col("nd") / 100.0, 6).alias("mean_lat"),
        F.round(F.col("sxd") / F.col("nd") / 100.0 + 10.0, 6).alias("mean_lon"),
        F.round(
            F.sqrt(F.greatest(F.lit(0.0), F.col("t") + F.col("d"))) / 100.0, 6
        ).alias("sigma_major_deg"),
        F.round(
            F.sqrt(F.greatest(F.lit(0.0), F.col("t") - F.col("d"))) / 100.0, 6
        ).alias("sigma_minor_deg"),
        F.round(
            2.0
            * F.col("vxy")
            / F.nullif(F.col("vxx") - F.col("vyy"), F.lit(0.0)),
            6,
        ).alias("tan2theta"),
    )


# sliding-window document chunking (LLM training-data prep) --------------------

_CHUNK_TOKENS = 64
_CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks

# the chunk relation as a reusable CTE chain, single-sourced for
# chunk_documents and boilerplate_chunks (Spark twin: _chunk_frame)
_CHUNKS_SQL = f"""
    b AS (
      SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks
      FROM documents
    ),
    n AS (
      SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tok FROM b
    ),
    c AS (
      SELECT doc_id, toks, n_tok,
             unnest(range(0, 1 + (greatest(n_tok - {_CHUNK_TOKENS}, 0)
                                  + {_CHUNK_STRIDE - 1}) // {_CHUNK_STRIDE}))
               AS ci
      FROM n
    ),
    chunks AS (
      SELECT doc_id, CAST(ci AS INT) AS chunk_id,
             CAST(ci * {_CHUNK_STRIDE} AS BIGINT) AS start_token,
             CAST(least({_CHUNK_TOKENS}, n_tok - ci * {_CHUNK_STRIDE}) AS BIGINT)
               AS chunk_tokens,
             md5(array_to_string(
                 toks[ci * {_CHUNK_STRIDE} + 1 :
                      least(ci * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}, n_tok)],
                 ' ')) AS chunk_md5
      FROM c
    )
"""


def _chunk_frame(spark, sf_dir) -> DataFrame:
    """Spark twin of ``_CHUNKS_SQL``: map-only — tokenize once
    (regexp_extract_all, JVM-side), explode a 0..n_chunks-1 sequence,
    slice + join + hash per chunk. 0 Exchange."""
    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.expr(r"regexp_extract_all(text, '\\S+', 0)").alias("toks"),
    ).select(
        "doc_id", "toks", F.size("toks").cast("long").alias("n_tok")
    )
    n_chunks = (
        F.lit(1)
        + (
            F.greatest(F.col("n_tok") - _CHUNK_TOKENS, F.lit(0))
            + F.lit(_CHUNK_STRIDE - 1)
        )
        / F.lit(_CHUNK_STRIDE)
    ).cast("long")
    ch = base.select(
        "doc_id",
        "toks",
        "n_tok",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("ci"),
    )
    start = F.col("ci") * _CHUNK_STRIDE
    return ch.select(
        "doc_id",
        F.col("ci").cast("int").alias("chunk_id"),
        start.alias("start_token"),
        F.least(F.lit(_CHUNK_TOKENS), F.col("n_tok") - start)
        .cast("long")
        .alias("chunk_tokens"),
        F.md5(
            F.array_join(F.slice(F.col("toks"), start + 1, _CHUNK_TOKENS), " ")
        ).alias("chunk_md5"),
    )


@register(
    "chunk_documents",
    f"""
    WITH {_CHUNKS_SQL}
    SELECT doc_id, chunk_id, start_token, chunk_tokens, chunk_md5 FROM chunks
    """,
    doc=(
        "sliding-window document chunking (64-token windows, stride 48 = "
        "16-token overlap): the LLM training-data prep step that turns "
        "documents into model-context-sized pieces; emits (doc_id, "
        "chunk_id, start, length, md5-of-chunk-text) — md5 keeps the "
        "oracle compact while pinning the exact chunk CONTENT, not just "
        "its extent"
    ),
)
def chunk_documents(spark, sf_dir):
    """See _chunk_frame — one WholeStageCodegen + Generate span, 0
    Exchange. Chunk count is 1 + ceil(max(n_tok - W, 0)/S), so every
    token lands in >= 1 chunk and consecutive chunks overlap by W - S
    tokens."""
    return _chunk_frame(spark, sf_dir)


@register(
    "boilerplate_chunks",
    f"""
    WITH {_CHUNKS_SQL}
    SELECT chunk_md5,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occurrences
    FROM chunks
    GROUP BY chunk_md5
    HAVING count(DISTINCT doc_id) >= 2
    """,
    doc=(
        "boilerplate detection over the chunk relation: 64-token windows "
        "whose exact content recurs in >= 2 distinct documents (headers, "
        "navigation, license blocks — the C4/RefinedWeb-style repeated-"
        "passage cleaning signal); emits (chunk_md5, n_docs, "
        "n_occurrences) for downstream removal joins"
    ),
)
def boilerplate_chunks(spark, sf_dir):
    """The map-only chunk frame followed by ONE distinct-count shuffle on
    the chunk hash (partial-agg combine absorbs within-doc repeats
    map-side). The output is bounded by recurring chunks, and the removal
    join it feeds is a broadcast semi-join at any corpus size where
    boilerplate is rare — the cleaning-pipeline shape."""
    return (
        _chunk_frame(spark, sf_dir)
        .groupBy("chunk_md5")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# k-core decomposition (fixed-round peeling) -----------------------------------

_KC_K = 3  # core order
_KC_ROUNDS = 4  # fixed peeling rounds (pagerank-style unrolled oracle)
_KC_N = 20000  # node id space — sparse enough (~6 avg degree) that peeling bites


def _kcore_oracle_sql() -> str:
    """Unrolled peeling rounds: a{k} = nodes of a{k-1} whose degree in the
    a{k-1}-induced subgraph is >= K; the final degree is computed over the
    a{R}-induced subgraph (survivors that lost every edge report 0)."""
    head = f"""
    WITH e0 AS (
      SELECT DISTINCT least(l_orderkey % {_KC_N}, l_partkey % {_KC_N}) AS a,
             greatest(l_orderkey % {_KC_N}, l_partkey % {_KC_N}) AS b
      FROM lineitem
      WHERE l_orderkey % {_KC_N} <> l_partkey % {_KC_N}
    ),
    a0 AS (SELECT a AS v FROM e0 UNION SELECT b FROM e0)"""
    steps = []
    for k in range(1, _KC_ROUNDS + 2):
        src = f"a{k - 1}"
        name = f"a{k}" if k <= _KC_ROUNDS else "degf"
        body = f"""
      SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT e.a AS v FROM e0 e
          JOIN {src} x ON e.a = x.v JOIN {src} y ON e.b = y.v
        UNION ALL
        SELECT e.b FROM e0 e
          JOIN {src} x ON e.a = x.v JOIN {src} y ON e.b = y.v
      ) GROUP BY v"""
        if k <= _KC_ROUNDS:
            steps.append(
                f"""
    {name} AS (
      SELECT v FROM ({body}
      ) WHERE d >= {_KC_K}
    )"""
            )
        else:
            steps.append(f"""
    {name} AS ({body}
    )""")
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT s.v AS node, CAST(coalesce(d.d, 0) AS BIGINT) AS degree
    FROM a{_KC_ROUNDS} s LEFT JOIN degf d ON d.v = s.v"""
    )


@register(
    "k_core",
    _kcore_oracle_sql(),
    doc=(
        f"k-core decomposition (k={_KC_K}, fixed {_KC_ROUNDS} peeling "
        "rounds): iteratively remove nodes of degree < k and report the "
        "survivors with their induced-subgraph degree — the dense-"
        "community extraction primitive (fraud rings, co-detection "
        "cliques); a genuinely different iterative class from CC/"
        "pagerank/sssp (the state is a shrinking VERTEX SET, not labels "
        "or distances); integer-exact end to end"
    ),
)
def k_core(spark, sf_dir):
    """Each round semi-joins the persisted canonical edge set against the
    shrinking alive set (broadcast at this graph size, shuffle equi-join
    at scale), explodes both endpoints, and partial-aggregates degrees —
    the shuffle carries per-node counts, never the graph. The alive frame
    is localCheckpoint-truncated every round (dup_components' plan-size
    discipline: the unrolled lineage would otherwise grow by two joins
    per round)."""
    li = _t(spark, sf_dir, "lineitem")
    sa = F.col("l_orderkey") % _KC_N
    sb = F.col("l_partkey") % _KC_N
    e = _persist_evict(
        li.filter(sa != sb)
        .select(
            F.least(sa, sb).alias("a"),
            F.greatest(sa, sb).alias("b"),
        )
        .distinct()
    )
    alive = (
        e.select(F.col("a").alias("v"))
        .union(e.select(F.col("b").alias("v")))
        .distinct()
    )

    def degrees(alive_set: DataFrame) -> DataFrame:
        kept = e.join(
            F.broadcast(alive_set.select(F.col("v").alias("a"))), "a"
        ).join(F.broadcast(alive_set.select(F.col("v").alias("b"))), "b")
        return (
            kept.select(F.col("a").alias("v"))
            .union(kept.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("d"))
        )

    for _ in range(_KC_ROUNDS):
        alive = (
            degrees(alive)
            .filter(F.col("d") >= _KC_K)
            .select("v")
            .localCheckpoint()
        )
    degf = degrees(alive)
    return alive.join(degf, "v", "left").select(
        F.col("v").alias("node"),
        F.coalesce(F.col("d"), F.lit(0)).cast("long").alias("degree"),
    )


# watershed basins (pointer-doubling over the D8 flow graph) -------------------

_WB_ROUNDS = 5  # pointer-doubling rounds: resolves flow paths up to 2^5 deep


def _wb_oracle_sql() -> str:
    head = (
        f"WITH {_D8_SQL},\n    e AS ({_fa_edges_sql()}),\n"
        """    l0 AS (
      SELECT c.cy, c.cx,
             coalesce(e.tcy, c.cy) AS ty, coalesce(e.tcx, c.cx) AS tx
      FROM cells c LEFT JOIN e ON e.scy = c.cy AND e.scx = c.cx
    )"""
    )
    steps = []
    for k in range(1, _WB_ROUNDS + 1):
        steps.append(f"""
    l{k} AS (
      SELECT a.cy, a.cx, b.ty, b.tx
      FROM l{k - 1} a JOIN l{k - 1} b ON a.ty = b.cy AND a.tx = b.cx
    )""")
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT cy, cx, ty AS basin_cy, tx AS basin_cx,
           CAST(CASE WHEN ty = cy AND tx = cx THEN 1 ELSE 0 END AS INT)
             AS is_sink
    FROM l{_WB_ROUNDS}"""
    )


@register(
    "watershed_basins",
    _wb_oracle_sql(),
    doc=(
        "watershed labeling over the D8 flow graph: every cell labeled "
        "with the sink its flow path terminates at, via pointer doubling "
        "(label <- label-of-label, so round k resolves depth 2^k — "
        f"{_WB_ROUNDS} rounds cover depth {2**_WB_ROUNDS}, and the D8 "
        "path depth is bounded by the longest strictly-descending cell "
        "chain); completes the hydrology family d8_flow_dir -> "
        "flow_accumulation -> basins; integer keys end to end"
    ),
)
def watershed_basins(spark, sf_dir):
    """The dup_components pointer-doubling shape on a FUNCTIONAL graph
    (out-degree <= 1, acyclic because every D8 edge strictly descends):
    each round is ONE self-equi-join of the label frame on the target
    key — depth doubles per round, so convergence is O(log depth), and
    the per-round plan stays constant-size via localCheckpoint. Sinks
    (and non-interior cells, which have no outflow) label themselves."""
    d8 = _d8_frame(spark, sf_dir).filter(F.col("d8_dir") > 0)
    dy = F.when(F.lit(False), 0)
    dx = F.when(F.lit(False), 0)
    for ddy, ddx, code in _D8_DIRS:
        dy = dy.when(F.col("d8_dir") == code, ddy)
        dx = dx.when(F.col("d8_dir") == code, ddx)
    edges = d8.select(
        F.col("cy").alias("scy"),
        F.col("cx").alias("scx"),
        (F.col("cy") + dy).alias("tcy"),
        (F.col("cx") + dx).alias("tcx"),
    )
    lab = (
        _cell_counts(spark, sf_dir)
        .select("cy", "cx")
        .join(
            edges.withColumnRenamed("scy", "cy").withColumnRenamed("scx", "cx"),
            ["cy", "cx"],
            "left",
        )
        .select(
            "cy",
            "cx",
            F.coalesce(F.col("tcy"), F.col("cy")).alias("ty"),
            F.coalesce(F.col("tcx"), F.col("cx")).alias("tx"),
        )
        .localCheckpoint()
    )
    for _ in range(_WB_ROUNDS):
        nxt = lab.select(
            F.col("cy").alias("ty"),
            F.col("cx").alias("tx"),
            F.col("ty").alias("nty"),
            F.col("tx").alias("ntx"),
        )
        lab = (
            lab.join(nxt, ["ty", "tx"])
            .select(
                "cy",
                "cx",
                F.col("nty").alias("ty"),
                F.col("ntx").alias("tx"),
            )
            .localCheckpoint()
        )
    return lab.select(
        "cy",
        "cx",
        F.col("ty").alias("basin_cy"),
        F.col("tx").alias("basin_cx"),
        F.when((F.col("ty") == F.col("cy")) & (F.col("tx") == F.col("cx")), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_sink"),
    )


# benchmark decontamination (n-gram overlap vs a held-out eval split) ----------

_CT_GRAM = 8  # token n-gram size
_CT_EVAL_MOD = 10  # doc_id % MOD == 0 -> eval split


@register(
    "contamination_check",
    f"""
    WITH b AS (
      SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks
      FROM documents
    ),
    n AS (
      SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tok
      FROM b WHERE len(toks) >= {_CT_GRAM}
    ),
    g AS (
      SELECT doc_id,
             list_distinct(list_transform(range(0, n_tok - {_CT_GRAM - 1}),
               i -> md5(array_to_string(toks[i + 1 : i + {_CT_GRAM}], ' '))))
               AS gs
      FROM n
    ),
    gd AS (
      SELECT doc_id, CAST(len(gs) AS BIGINT) AS n_grams, unnest(gs) AS gh
      FROM g
    ),
    ev AS (
      SELECT DISTINCT gh FROM gd WHERE doc_id % {_CT_EVAL_MOD} = 0
    )
    SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_overlap, d.n_grams,
           round(CAST(count(*) AS DOUBLE) / CAST(d.n_grams AS DOUBLE), 6)
             AS contamination
    FROM gd d JOIN ev e ON d.gh = e.gh
    WHERE d.doc_id % {_CT_EVAL_MOD} <> 0
    GROUP BY d.doc_id, d.n_grams
    """,
    doc=(
        f"benchmark decontamination: train documents sharing >= 1 exact "
        f"{_CT_GRAM}-token n-gram with the held-out eval split "
        f"(doc_id %% {_CT_EVAL_MOD} == 0), with the overlap count and the "
        "contaminated fraction of the doc's distinct grams — the "
        "GPT-3/PaLM-style eval-leakage scan every LLM training pipeline "
        "runs before training"
    ),
)
def contamination_check(spark, sf_dir):
    """Per-document gram sets are built and DEDUPED map-side
    (transform + array_distinct inside one row — no distinct shuffle ever
    touches the gram stream); the only exchanges are the eval-set
    distinct (1/MOD of the grams), the overlap groupBy, and an O(docs)
    count-back join. ``n_grams`` deliberately does NOT ride the exploded
    rows: keeping it beside the Generate made the projection re-evaluate
    the whole md5 gram array once PER EXPLODED GRAM (a ~n_grams-fold
    recompute, measured 2 s -> 20 s at sf0.1), so it is computed in its
    own per-doc pass and joined back on doc_id after the overlap agg —
    both sides of that join are O(contaminated docs) / O(docs). The gram
    join broadcasts the eval set here; at a 10^12-doc corpus it becomes
    a shuffle equi-join on the gram hash — both sides already distinct,
    no fan-out."""
    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.expr(r"regexp_extract_all(text, '\\S+', 0)").alias("toks"),
    ).select("doc_id", "toks", F.size("toks").cast("long").alias("n_tok"))
    base = base.filter(F.col("n_tok") >= _CT_GRAM)
    grams = F.array_distinct(
        F.expr(
            f"transform(sequence(0, n_tok - {_CT_GRAM}),"
            f" i -> md5(array_join(slice(toks, i + 1, {_CT_GRAM}), ' ')))"
        )
    )
    gd = base.select("doc_id", F.explode(grams).alias("gh"))
    counts = base.select(
        "doc_id", F.size(grams).cast("long").alias("n_grams")
    )
    ev = (
        gd.filter(F.col("doc_id") % _CT_EVAL_MOD == 0)
        .select("gh")
        .distinct()
    )
    ov = (
        gd.filter(F.col("doc_id") % _CT_EVAL_MOD != 0)
        .join(F.broadcast(ev), "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return ov.join(counts, "doc_id").select(
        "doc_id",
        "n_overlap",
        "n_grams",
        F.round(
            F.col("n_overlap").cast("double")
            / F.col("n_grams").cast("double"),
            6,
        ).alias("contamination"),
    )


# Geary's C + terrain ruggedness (shared exclude-self 3x3 stencil) ------------

# the exclude-self 8-neighborhood pair relation over the analysis cells:
# Geary and TRI both consume it (Gi* keeps self, so it stays separate)
_NBR8_SQL = """
    pairs AS (
      SELECT a.cy, a.cx, a.x AS ax, b.x AS bx
      FROM cells a JOIN cells b
        ON abs(a.cy - b.cy) <= 1 AND abs(a.cx - b.cx) <= 1
       AND NOT (a.cy = b.cy AND a.cx = b.cx)
    )
"""


def _nbr8_pairs(spark, sf_dir) -> DataFrame:
    """Spark twin of ``_NBR8_SQL``: cells exploded to their 8 shifted
    positions (constant fan-out, no range join) equi-joined back to the
    cell frame — each inhabited (center, neighbor) pair met exactly once,
    with both counts riding the row. One partial-agg shuffle for cells +
    one stencil equi-join; post-join cardinality <= 8x inhabited cells."""
    cells = _persist_evict(_cell_counts(spark, sf_dir))
    right = cells.select(
        F.col("x").alias("bx"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cy") - dy).alias("cy"),
                        (F.col("cx") - dx).alias("cx"),
                    )
                    for dy, dx, _ in _D8_DIRS
                ]
            )
        ).alias("k"),
    ).select("bx", "k.cy", "k.cx")
    return cells.withColumnRenamed("x", "ax").join(right, ["cy", "cx"])


@register(
    "geary_c",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    {_NBR8_SQL},
    loc AS (
      SELECT cy, cx, CAST(count(*) AS BIGINT) AS wn,
             CAST(sum((ax - bx) * (ax - bx)) AS BIGINT) AS ssd
      FROM pairs GROUP BY cy, cx
    ),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM cells
    )
    SELECT loc.cy, loc.cx, wn, ssd,
           round((CAST(ssd AS DOUBLE) / CAST(wn AS DOUBLE))
                 / (CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
                    - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))), 6)
             AS geary_c
    FROM loc CROSS JOIN g
    """,
    doc=(
        "local Geary's C over the detection cell grid (exclude-self 3x3 "
        "weights): mean squared neighbor difference / global variance — "
        "the dissimilarity companion to local_moran (Moran finds "
        "clusters, Geary finds edges/outliers between unlike neighbors); "
        "neighborhood and global sums are BIGINT-exact, one double "
        "division chain at the end"
    ),
)
def geary_c(spark, sf_dir):
    """Shared _nbr8_pairs stencil (one cells shuffle + one 8x constant-"
    fan-out equi-join) -> per-cell BIGINT sum of squared differences ->
    scalar-broadcast crossJoin of the one-row global moments (the
    getis_ord_gi pattern) -> codegen ratio. Integer until the final
    double formula, so aggregation order cannot move parity."""
    pairs = _nbr8_pairs(spark, sf_dir)
    loc = pairs.groupBy("cy", "cx").agg(
        F.count(F.lit(1)).alias("wn"),
        F.sum(
            (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
        ).alias("ssd"),
    )
    cells = _cell_counts(spark, sf_dir)
    g = cells.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("sx").cast("double") / nd
    m2 = F.col("sxx").cast("double") / nd - mean * mean
    return loc.crossJoin(F.broadcast(g)).select(
        "cy",
        "cx",
        "wn",
        "ssd",
        F.round(
            (F.col("ssd").cast("double") / F.col("wn").cast("double")) / m2, 6
        ).alias("geary_c"),
    )


@register(
    "terrain_ruggedness",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    {_NBR8_SQL},
    loc AS (
      SELECT cy, cx, CAST(count(*) AS BIGINT) AS nn,
             CAST(sum((bx - ax) * (bx - ax)) AS BIGINT) AS ssd
      FROM pairs GROUP BY cy, cx
    )
    SELECT cy, cx, ssd, round(sqrt(CAST(ssd AS DOUBLE)), 6) AS tri
    FROM loc WHERE nn = 8
    """,
    doc=(
        "terrain ruggedness index (Riley 1999) over the detection-density "
        "surface: sqrt of the summed squared differences to the 8 "
        "neighbors, interior cells only (nn = 8, the slope_aspect gate) — "
        "completes the focal-terrain family slope/aspect/hillshade/TRI; "
        "the sum is BIGINT-exact and sqrt is correctly rounded per IEEE "
        "754, so the only float op is parity-safe"
    ),
)
def terrain_ruggedness(spark, sf_dir):
    """Same shared stencil as geary_c: one partial-agg groupBy over the
    pair relation, then a codegen sqrt. The nn = 8 interior gate rides
    the same aggregate (no second pass)."""
    pairs = _nbr8_pairs(spark, sf_dir)
    loc = pairs.groupBy("cy", "cx").agg(
        F.count(F.lit(1)).alias("nn"),
        F.sum(
            (F.col("bx") - F.col("ax")) * (F.col("bx") - F.col("ax"))
        ).alias("ssd"),
    )
    return loc.filter(F.col("nn") == 8).select(
        "cy",
        "cx",
        "ssd",
        F.round(F.sqrt(F.col("ssd").cast("double")), 6).alias("tri"),
    )


# flow length (pointer-doubling with accumulated path length) ------------------

_SQRT2 = 1.4142135623730951  # exact double literal, shared by both dialects
_FL_ROUNDS = 5  # doubling rounds: resolves flow paths up to 2^5 deep


def _fl_oracle_sql() -> str:
    dy_case = "CASE " + " ".join(
        f"WHEN d8_dir = {code} THEN {dy}" for dy, dx, code in _D8_DIRS
    ) + " END"
    dx_case = "CASE " + " ".join(
        f"WHEN d8_dir = {code} THEN {dx}" for dy, dx, code in _D8_DIRS
    ) + " END"
    head = (
        f"WITH {_D8_SQL},\n"
        f"""    e AS (
      SELECT cy AS scy, cx AS scx, cy + {dy_case} AS tcy,
             cx + {dx_case} AS tcx,
             CASE WHEN d8_dir IN (1, 4, 16, 64) THEN 1.0
                  ELSE {_SQRT2!r} END AS elen
      FROM d8 WHERE d8_dir > 0
    ),
    l0 AS (
      SELECT c.cy, c.cx,
             coalesce(e.tcy, c.cy) AS ty, coalesce(e.tcx, c.cx) AS tx,
             CAST(CASE WHEN e.tcy IS NULL THEN 0 ELSE 1 END AS BIGINT)
               AS hops,
             coalesce(e.elen, 0.0) AS len
      FROM cells c LEFT JOIN e ON e.scy = c.cy AND e.scx = c.cx
    )"""
    )
    steps = []
    for k in range(1, _FL_ROUNDS + 1):
        steps.append(f"""
    l{k} AS (
      SELECT a.cy, a.cx, b.ty, b.tx,
             a.hops + b.hops AS hops, a.len + b.len AS len
      FROM l{k - 1} a JOIN l{k - 1} b ON a.ty = b.cy AND a.tx = b.cx
    )""")
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT cy, cx, hops, round(len, 6) AS flow_len
    FROM l{_FL_ROUNDS}"""
    )


@register(
    "flow_length",
    _fl_oracle_sql(),
    doc=(
        "downstream flow-path length over the D8 flow graph: hop count "
        "(BIGINT) and euclidean cell-length (1 per cardinal step, sqrt(2) "
        "per diagonal) from every cell to its sink, via the watershed_"
        "basins pointer-doubling shape extended with an accumulated "
        "(hops, len) payload — round k resolves depth 2^k, and both "
        "engines sum the lengths through the identical doubling tree, so "
        "the float accumulation order is pinned cross-engine"
    ),
)
def flow_length(spark, sf_dir):
    """Functional-graph pointer doubling (watershed_basins) carrying two
    accumulators: each round is ONE self-equi-join of the label frame on
    the target key, adding the jumped-to cell's (hops, len) — O(log
    depth) rounds, constant per-round plan via localCheckpoint. Sinks and
    non-interior cells carry (0, 0.0) and are self-fixpoints."""
    d8 = _d8_frame(spark, sf_dir).filter(F.col("d8_dir") > 0)
    dy = F.when(F.lit(False), 0)
    dx = F.when(F.lit(False), 0)
    for ddy, ddx, code in _D8_DIRS:
        dy = dy.when(F.col("d8_dir") == code, ddy)
        dx = dx.when(F.col("d8_dir") == code, ddx)
    edges = d8.select(
        F.col("cy").alias("scy"),
        F.col("cx").alias("scx"),
        (F.col("cy") + dy).alias("tcy"),
        (F.col("cx") + dx).alias("tcx"),
        F.when(F.col("d8_dir").isin(1, 4, 16, 64), F.lit(1.0))
        .otherwise(F.lit(_SQRT2))
        .alias("elen"),
    )
    lab = (
        _cell_counts(spark, sf_dir)
        .select("cy", "cx")
        .join(
            edges.withColumnRenamed("scy", "cy").withColumnRenamed("scx", "cx"),
            ["cy", "cx"],
            "left",
        )
        .select(
            "cy",
            "cx",
            F.coalesce(F.col("tcy"), F.col("cy")).alias("ty"),
            F.coalesce(F.col("tcx"), F.col("cx")).alias("tx"),
            F.when(F.col("tcy").isNull(), 0)
            .otherwise(1)
            .cast("long")
            .alias("hops"),
            F.coalesce(F.col("elen"), F.lit(0.0)).alias("len"),
        )
        .localCheckpoint()
    )
    for _ in range(_FL_ROUNDS):
        nxt = lab.select(
            F.col("cy").alias("ty"),
            F.col("cx").alias("tx"),
            F.col("ty").alias("nty"),
            F.col("tx").alias("ntx"),
            F.col("hops").alias("nhops"),
            F.col("len").alias("nlen"),
        )
        lab = (
            lab.join(nxt, ["ty", "tx"])
            .select(
                "cy",
                "cx",
                F.col("nty").alias("ty"),
                F.col("ntx").alias("tx"),
                (F.col("hops") + F.col("nhops")).alias("hops"),
                (F.col("len") + F.col("nlen")).alias("len"),
            )
            .localCheckpoint()
        )
    return lab.select(
        "cy", "cx", "hops", F.round(F.col("len"), 6).alias("flow_len")
    )


# Gopher-style repetition filters ----------------------------------------------


@register(
    "gopher_repetition",
    """
    WITH b AS (
      SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks
      FROM documents
    ),
    n AS (
      SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tok
      FROM b WHERE len(toks) >= 5
    ),
    g AS (
      SELECT doc_id, n_tok,
             list_transform(range(0, n_tok - 1),
               i -> toks[i + 1] || ' ' || toks[i + 2]) AS g2,
             list_transform(range(0, n_tok - 4),
               i -> md5(array_to_string(toks[i + 1 : i + 5], ' '))) AS g5
      FROM n
    ),
    d AS (
      SELECT doc_id, n_tok, g2,
             CAST(len(g5) AS BIGINT) AS n5,
             CAST(len(g5) - len(list_distinct(g5)) AS BIGINT) AS dup5
      FROM g
    ),
    m AS (
      SELECT doc_id, CAST(max(c) AS BIGINT) AS top2_n
      FROM (
        SELECT doc_id, g, count(*) AS c
        FROM (SELECT doc_id, unnest(g2) AS g FROM d)
        GROUP BY doc_id, g
      )
      GROUP BY doc_id
    )
    SELECT d.doc_id, d.n_tok, m.top2_n,
           round(CAST(2 * m.top2_n AS DOUBLE) / CAST(d.n_tok AS DOUBLE), 6)
             AS top2_frac,
           d.dup5,
           round(CAST(d.dup5 AS DOUBLE) / CAST(d.n5 AS DOUBLE), 6)
             AS dup5_frac
    FROM d JOIN m ON d.doc_id = m.doc_id
    """,
    doc=(
        "Gopher-style repetition quality filters (Rae et al. 2021 table "
        "A1, token-space): per document, the token fraction covered by "
        "the most frequent bigram (top2_frac) and the duplicate-5-gram "
        "fraction (dup5_frac) — the two within-document repetition "
        "signals every LLM cleaning pipeline thresholds on (alongside the "
        "cross-document signals boilerplate_chunks / minhash_lsh_pairs)"
    ),
)
def gopher_repetition(spark, sf_dir):
    """The 5-gram duplicate fraction is computed ENTIRELY map-side
    (transform + array_distinct inside one row, the contamination_check
    idiom) — no shuffle ever carries a 5-gram. Only bigram mode-counting
    shuffles, and it shuffles (doc_id, bigram) partial counts whose
    cardinality partial-agg combine caps at distinct-bigrams-per-doc.
    Join back on doc_id; at any corpus size both frames are
    one-row-per-doc."""
    d = _t(spark, sf_dir, "documents")
    base = (
        d.select(
            "doc_id",
            F.expr(r"regexp_extract_all(text, '\\S+', 0)").alias("toks"),
        )
        .select(
            "doc_id", "toks", F.size("toks").cast("long").alias("n_tok")
        )
        .filter(F.col("n_tok") >= 5)
    )
    g2 = F.expr(
        "transform(sequence(0, n_tok - 2),"
        " i -> concat(element_at(toks, CAST(i + 1 AS INT)), ' ',"
        " element_at(toks, CAST(i + 2 AS INT))))"
    )
    g5 = F.expr(
        "transform(sequence(0, n_tok - 5),"
        " i -> md5(array_join(slice(toks, CAST(i + 1 AS INT), 5), ' ')))"
    )
    dside = _persist_evict(
        base.select(
            "doc_id",
            "n_tok",
            g2.alias("g2"),
            F.size(g5).cast("long").alias("n5"),
            (F.size(g5) - F.size(F.array_distinct(g5)))
            .cast("long")
            .alias("dup5"),
        )
    )
    m = (
        dside.select("doc_id", F.explode("g2").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("long").alias("top2_n"))
    )
    return dside.join(m, "doc_id").select(
        "doc_id",
        "n_tok",
        "top2_n",
        F.round(
            (F.lit(2) * F.col("top2_n")).cast("double")
            / F.col("n_tok").cast("double"),
            6,
        ).alias("top2_frac"),
        "dup5",
        F.round(
            F.col("dup5").cast("double") / F.col("n5").cast("double"), 6
        ).alias("dup5_frac"),
    )


# unigram-LM log-probability (perplexity-style quality filter) -----------------


@register(
    "unigram_logprob",
    """
    WITH b AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok
      FROM documents
    ),
    v AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY tok),
    tt AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM v)
    SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
           round(avg(ln(CAST(v.c AS DOUBLE) / CAST(tt.total AS DOUBLE))), 6)
             AS avg_logp
    FROM b JOIN v ON b.tok = v.tok CROSS JOIN tt
    GROUP BY b.doc_id
    """,
    doc=(
        "unigram-LM document log-probability: train a unigram language "
        "model on the corpus itself (token counts / total), then score "
        "each document by its mean token log-probability — the "
        "CCNet/KenLM-style perplexity quality filter with the simplest "
        "possible LM (no external model; low avg_logp = "
        "rare-token-heavy/garbled text, the standard removal signal)"
    ),
)
def unigram_logprob(spark, sf_dir):
    """Two passes over the exploded token stream: one partial-agg groupBy
    builds the vocabulary (count per token), one scalar-broadcast
    crossJoin attaches the corpus total (the tfidf_topterms pattern), and
    the scoring join is broadcast here (sandbox vocab is small) — at web
    scale it becomes a shuffle equi-join on the token, both sides already
    aggregated, no fan-out. The per-doc avg sums ~10^1..10^3 doubles, so
    the 6-dp round absorbs engine-order ULP drift."""
    d = _t(spark, sf_dir, "documents")
    toks = _persist_evict(
        d.select(
            "doc_id",
            F.explode(
                F.expr(r"regexp_extract_all(text, '\\S+', 0)")
            ).alias("tok"),
        )
    )
    v = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tt = v.agg(F.sum("c").alias("total"))
    return (
        toks.join(F.broadcast(v), "tok")
        .crossJoin(F.broadcast(tt))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.round(
                F.avg(
                    F.log(
                        F.col("c").cast("double")
                        / F.col("total").cast("double")
                    )
                ),
                6,
            ).alias("avg_logp"),
        )
    )


# token-budget sequence packing ------------------------------------------------

_PACK_BUDGET = 256  # tokens per training bin


@register(
    "sequence_pack",
    f"""
    WITH n AS (
      SELECT doc_id, source,
             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tok
      FROM documents
    ),
    w AS (
      SELECT doc_id, source, n_tok,
             CAST(coalesce(sum(n_tok) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_before
      FROM n
    )
    SELECT doc_id, source, n_tok,
           CAST(cum_before // {_PACK_BUDGET} AS BIGINT) AS bin_id,
           CAST(cum_before % {_PACK_BUDGET} AS BIGINT) AS bin_offset
    FROM w
    """,
    doc=(
        f"token-budget sequence packing: within each source shard, "
        f"documents are packed in doc_id order into {_PACK_BUDGET}-token "
        "training bins by running token total (bin = cum_before // "
        "budget, offset = cum_before % budget) — the streaming "
        "approximation of first-fit packing every LLM batch builder "
        "uses (a doc can overflow its bin by < one doc; no doc is "
        "split); deterministic, integer-exact"
    ),
)
def sequence_pack(spark, sf_dir):
    """The prefix sum is windowed PER SOURCE SHARD (partitionBy source),
    never globally — one exchange on the shard key and each shard's
    running total is a single ordered scan within its partition, which is
    exactly how a production packer shards the corpus (a global ordered
    cumsum would serialize on one task). Everything else is codegen
    column algebra."""
    d = _t(spark, sf_dir, "documents")
    n = d.select(
        "doc_id",
        "source",
        F.size(F.expr(r"regexp_extract_all(text, '\\S+', 0)"))
        .cast("long")
        .alias("n_tok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = n.select(
        "doc_id",
        "source",
        "n_tok",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0))
        .cast("long")
        .alias("cum_before"),
    )
    return packed.select(
        "doc_id",
        "source",
        "n_tok",
        F.expr(f"CAST(cum_before DIV {_PACK_BUDGET} AS BIGINT)").alias(
            "bin_id"
        ),
        (F.col("cum_before") % _PACK_BUDGET).cast("long").alias("bin_offset"),
    )


# histogram equalization (integer-exact CDF remap) -----------------------------


@register(
    "histogram_equalize",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    h AS (SELECT x, CAST(count(*) AS BIGINT) AS c FROM cells GROUP BY x),
    cdf AS (
      SELECT x, c, CAST(sum(c) OVER (ORDER BY x) AS BIGINT) AS cum FROM h
    ),
    g AS (
      SELECT CAST(min(cum) AS BIGINT) AS cmin, CAST(sum(c) AS BIGINT) AS n
      FROM cdf
    )
    SELECT cells.cy, cells.cx, cells.x,
           CAST(CASE WHEN g.n > g.cmin
                     THEN ((cdf.cum - g.cmin) * 255) // (g.n - g.cmin)
                     ELSE 0 END AS BIGINT) AS eq
    FROM cells JOIN cdf ON cells.x = cdf.x CROSS JOIN g
    """,
    doc=(
        "histogram equalization of the detection-density raster: each "
        "cell's count remapped to 0..255 by the empirical CDF "
        "(eq = (cdf - cdf_min) * 255 // (n - cdf_min), the classic "
        "image-contrast stretch, here for density-map rendering) — "
        "ENTIRELY integer arithmetic (floor division), so parity cannot "
        "drift; degenerate single-level rasters map to 0"
    ),
)
def histogram_equalize(spark, sf_dir):
    """The ordered CDF window runs over the VALUE DOMAIN (distinct count
    levels — bounded by max cell count, a few hundred at any corpus
    size), never over the cells, so the single-partition ordered scan is
    on a tiny frame; cells get their level by a broadcast equi-join on
    the level. One partial-agg shuffle (cells), one domain groupBy, one
    scalar crossJoin."""
    cells = _persist_evict(_cell_counts(spark, sf_dir))
    h = cells.groupBy("x").agg(F.count(F.lit(1)).alias("c"))
    cdf = h.select(
        "x",
        "c",
        F.sum("c")
        .over(Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    g = cdf.agg(F.min("cum").alias("cmin"), F.sum("c").alias("n"))
    return (
        cells.join(F.broadcast(cdf.select("x", "cum")), "x")
        .crossJoin(F.broadcast(g))
        .select(
            "cy",
            "cx",
            "x",
            F.when(
                F.col("n") > F.col("cmin"),
                F.expr("((cum - cmin) * 255) DIV (n - cmin)"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("eq"),
        )
    )


# Clark-Evans nearest-neighbor index -------------------------------------------

# Censoring cell sized to the point density, NOT the 0.5-deg Gi* analysis
# cell: mean NN distance at the corpus density is ~0.5/sqrt(rho) ~ 0.014-0.14
# deg across the sf range, so a 0.1-deg censor keeps the statistic while the
# cover join generates ~25x fewer candidate pairs than the Gi* cell would
# (the 3x3 ring over 0.5-deg cells at sf0.1 density was ~1.7e9 pairs / 16 s;
# this is ~7e7 / ~2 s). Radius == cell size, so the 3x3 ring still provably
# covers the censoring disk.
_CE_CELL = 0.1
_CE_R2 = _CE_CELL * _CE_CELL  # censoring radius^2 = one cell (ring-covered)


@register(
    "clark_evans",
    f"""
    WITH p AS ({_PT_SQL}),
    pts AS (
      SELECT event_id, lat, lon,
             CAST(floor(lat / {_CE_CELL!r}) AS BIGINT) AS cy,
             CAST(floor(lon / {_CE_CELL!r}) AS BIGINT) AS cx
      FROM p
    ),
    nn AS (
      SELECT a.event_id, min((a.lat - b.lat) * (a.lat - b.lat)
                           + (a.lon - b.lon) * (a.lon - b.lon)) AS mind2
      FROM pts a JOIN pts b
        ON abs(a.cy - b.cy) <= 1 AND abs(a.cx - b.cx) <= 1
       AND a.event_id <> b.event_id
      WHERE (a.lat - b.lat) * (a.lat - b.lat)
           + (a.lon - b.lon) * (a.lon - b.lon) <= {_CE_R2!r}
      GROUP BY a.event_id
    ),
    bb AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pts,
             (max(lat) - min(lat)) * (max(lon) - min(lon)) AS area
      FROM pts
    )
    SELECT bb.n_pts,
           CAST(count(*) AS BIGINT) AS n_with_nn,
           round(avg(sqrt(mind2)), 6) AS mean_nn,
           round(avg(sqrt(mind2))
                 / (0.5 / sqrt(CAST(bb.n_pts AS DOUBLE) / bb.area)), 6)
             AS r_index
    FROM nn CROSS JOIN bb
    GROUP BY bb.n_pts, bb.area
    """,
    doc=(
        f"Clark-Evans nearest-neighbor index over the detections: "
        f"R = mean observed NN distance / expected under CSR "
        f"(0.5/sqrt(density)), with the NN search censored at one "
        f"density-sized cell ({_CE_CELL} deg — points with no neighbor that "
        "close are excluded and counted) — R << 1 clustered, R ~ 1 "
        "random; the point-pattern summary completing ripley_k / "
        "knox_pairs; density uses the bounding-box area"
    ),
)
def clark_evans(spark, sf_dir):
    """The same bounded cell-cover join every pair op uses (kRing explode
    -> equi-join on the cell key, radius <= cell size so the 3x3 ring
    provably covers the censoring disk) -> per-point min d2 (partial-agg
    min, integer-keyed) -> one-row global stats crossJoined. The only
    order-sensitive float op is the final avg over ~n doubles, absorbed
    by the 6-dp round."""
    pts = _pt_df(spark, sf_dir).select(
        "event_id",
        "lat",
        "lon",
        F.floor(F.col("lat") / _CE_CELL).alias("cy"),
        F.floor(F.col("lon") / _CE_CELL).alias("cx"),
    )
    ring = pts.select(
        F.col("event_id").alias("nb_id"),
        F.col("lat").alias("b_lat"),
        F.col("lon").alias("b_lon"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cy") + dy).alias("cy"),
                        (F.col("cx") + dx).alias("cx"),
                    )
                    for dy in (-1, 0, 1)
                    for dx in (-1, 0, 1)
                ]
            )
        ).alias("k"),
    ).select("nb_id", "b_lat", "b_lon", "k.cy", "k.cx")
    d2 = (F.col("lat") - F.col("b_lat")) * (F.col("lat") - F.col("b_lat")) + (
        F.col("lon") - F.col("b_lon")
    ) * (F.col("lon") - F.col("b_lon"))
    nn = (
        pts.join(ring, ["cy", "cx"])
        .filter((F.col("event_id") != F.col("nb_id")) & (d2 <= F.lit(_CE_R2)))
        .groupBy("event_id")
        .agg(F.min(d2).alias("mind2"))
    )
    bb = pts.agg(
        F.count(F.lit(1)).alias("n_pts"),
        (
            (F.max("lat") - F.min("lat")) * (F.max("lon") - F.min("lon"))
        ).alias("area"),
    )
    mean_nn = F.avg(F.sqrt(F.col("mind2")))
    expected = F.lit(0.5) / F.sqrt(
        F.first("n_pts").cast("double") / F.first("area")
    )
    return (
        nn.crossJoin(F.broadcast(bb))
        .groupBy()
        .agg(
            F.first("n_pts").alias("n_pts"),
            F.count(F.lit(1)).alias("n_with_nn"),
            F.round(mean_nn, 6).alias("mean_nn"),
            F.round(mean_nn / expected, 6).alias("r_index"),
        )
    )


# line-of-sight / viewshed along the 8 rays ------------------------------------


@register(
    "line_of_sight",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    o AS (
      SELECT cy AS ocy, cx AS ocx, x AS ox
      FROM cells ORDER BY x DESC, cy, cx LIMIT 1
    ),
    ray AS (
      SELECT c.cy, c.cx, c.x,
             CASE WHEN c.cy - o.ocy = 0 THEN 0 WHEN c.cy > o.ocy THEN 1 ELSE -1 END AS sy,
             CASE WHEN c.cx - o.ocx = 0 THEN 0 WHEN c.cx > o.ocx THEN 1 ELSE -1 END AS sx,
             greatest(abs(c.cy - o.ocy), abs(c.cx - o.ocx)) AS steps,
             CAST(c.x - o.ox AS DOUBLE)
               / (CAST(greatest(abs(c.cy - o.ocy), abs(c.cx - o.ocx)) AS DOUBLE)
                  * (CASE WHEN c.cy = o.ocy OR c.cx = o.ocx THEN 1.0
                          ELSE {_SQRT2!r} END)) AS slope
      FROM cells c CROSS JOIN o
      WHERE NOT (c.cy = o.ocy AND c.cx = o.ocx)
        AND (c.cy = o.ocy OR c.cx = o.ocx
             OR abs(c.cy - o.ocy) = abs(c.cx - o.ocx))
    )
    SELECT cy, cx, sy, sx, CAST(steps AS BIGINT) AS steps, x,
           CAST(CASE WHEN slope > coalesce(max(slope) OVER (
             PARTITION BY sy, sx ORDER BY steps
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             -1e308) THEN 1 ELSE 0 END AS INT) AS visible
    FROM ray
    """,
    doc=(
        "line-of-sight (viewshed) along the 8 rays from the densest cell "
        "(ties to lowest (cy, cx)): a ray cell is visible iff its "
        "elevation angle (count difference / euclidean ray distance) "
        "strictly exceeds the running max of every nearer cell on the "
        "ray — the classic DEM visibility sweep, over the density "
        "surface with gaps simply absent; slopes on cardinal rays are "
        "int/int doubles, diagonals share the one sqrt(2) literal"
    ),
)
def line_of_sight(spark, sf_dir):
    """Observer selection is a one-row sorted-limit frame broadcast to "
    the cells (the bottom_pct_threshold shape); the ray filter is
    codegen; visibility is ONE window exchange partitioned on the 8 ray
    keys with a running max — no join ever carries more than the <= 8 *
    max_extent ray cells. The running-max comparison is on doubles both
    engines computed with the identical expression."""
    cells = _persist_evict(_cell_counts(spark, sf_dir))
    o = (
        cells.orderBy(F.col("x").desc(), "cy", "cx")
        .limit(1)
        .select(
            F.col("cy").alias("ocy"),
            F.col("cx").alias("ocx"),
            F.col("x").alias("ox"),
        )
    )
    j = cells.crossJoin(F.broadcast(o))
    dy, dx = F.col("cy") - F.col("ocy"), F.col("cx") - F.col("ocx")
    on_ray = (dy == 0) | (dx == 0) | (F.abs(dy) == F.abs(dx))
    steps = F.greatest(F.abs(dy), F.abs(dx))
    diag = F.when((dy == 0) | (dx == 0), F.lit(1.0)).otherwise(F.lit(_SQRT2))
    ray = j.filter(on_ray & ~((dy == 0) & (dx == 0))).select(
        "cy",
        "cx",
        "x",
        F.signum(dy).cast("int").alias("sy"),
        F.signum(dx).cast("int").alias("sx"),
        steps.cast("long").alias("steps"),
        (
            (F.col("x") - F.col("ox")).cast("double")
            / (steps.cast("double") * diag)
        ).alias("slope"),
    )
    w = (
        Window.partitionBy("sy", "sx")
        .orderBy("steps")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return ray.select(
        "cy",
        "cx",
        "sy",
        "sx",
        "steps",
        "x",
        F.when(
            F.col("slope")
            > F.coalesce(F.max("slope").over(w), F.lit(-1e308)),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("visible"),
    )


# fixed-round Lloyd k-means over the event lattice -----------------------------

_KM_K = 8
_KM_ROUNDS = 3

# integer event coordinates (the centi-degree lattice _PT_SQL scales down):
# keeping them BIGINT makes every centroid an exact BIGINT/BIGINT division
_KM_PTS_SQL = """
    pts AS (
      SELECT event_id,
             CAST(event_id * 7919 % 2000 AS BIGINT) AS py,
             CAST(event_id * 104729 % 2400 AS BIGINT) AS px
      FROM events
    )
"""


def _km_oracle_sql() -> str:
    head = (
        f"WITH {_KM_PTS_SQL},"
        f"""
    c0 AS (
      SELECT row_number() OVER (ORDER BY event_id) AS cid,
             CAST(py AS DOUBLE) AS clat, CAST(px AS DOUBLE) AS clon
      FROM (SELECT * FROM pts ORDER BY event_id LIMIT {_KM_K})
    )"""
    )
    steps = []
    for k in range(1, _KM_ROUNDS + 1):
        steps.append(f"""
    a{k} AS (
      SELECT event_id, py, px, cid, d2 FROM (
        SELECT p.event_id, p.py, p.px, c.cid,
               (CAST(p.py AS DOUBLE) - c.clat) * (CAST(p.py AS DOUBLE) - c.clat)
             + (CAST(p.px AS DOUBLE) - c.clon) * (CAST(p.px AS DOUBLE) - c.clon)
                 AS d2,
               row_number() OVER (PARTITION BY p.event_id
                                  ORDER BY (CAST(p.py AS DOUBLE) - c.clat)
                                         * (CAST(p.py AS DOUBLE) - c.clat)
                                         + (CAST(p.px AS DOUBLE) - c.clon)
                                         * (CAST(p.px AS DOUBLE) - c.clon),
                                           c.cid) AS rn
        FROM pts p CROSS JOIN c{k - 1} c
      ) WHERE rn = 1
    ),
    c{k} AS (
      SELECT cid,
             CAST(sum(py) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS clat,
             CAST(sum(px) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS clon
      FROM a{k} GROUP BY cid
    )""")
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT event_id, CAST(cid AS BIGINT) AS cid, d2
    FROM a{_KM_ROUNDS}"""
    )


@register(
    "kmeans_assign",
    _km_oracle_sql(),
    doc=(
        f"fixed-round Lloyd k-means (k = {_KM_K}, {_KM_ROUNDS} rounds) "
        "over the integer event lattice: seeds are the first k events by "
        "id, every centroid is an exact BIGINT-sum / BIGINT-count "
        "division (so centroids are bit-identical cross-engine and a "
        "borderline point can never flip), assignment ties break on "
        "cluster id — the canonical iterative-refinement ML op "
        "(training-data clustering / semdedup's first stage), in the "
        "unrolled-oracle class of pagerank/flow_accumulation"
    ),
)
def kmeans_assign(spark, sf_dir):
    """Per round: crossJoin the k-row broadcast centroid frame (constant
    k-fold map-side fan-out, never a shuffle of pairs), argmin via ONE
    partial-agg min over a (d2, cid, py, px) struct — lexicographic
    struct min IS the (distance, id) tie-break, and carrying the coords
    in the struct saves the rejoin — then one groupBy(cid) with BIGINT
    coordinate sums. The loop state is k rows; localCheckpoint is
    unnecessary at 3 rounds."""
    ev = _t(spark, sf_dir, "events")
    pts = _persist_evict(
        ev.select(
            "event_id",
            (F.col("event_id") * 7919 % 2000).cast("long").alias("py"),
            (F.col("event_id") * 104729 % 2400).cast("long").alias("px"),
        )
    )
    seeds = pts.orderBy("event_id").limit(_KM_K)
    centers = seeds.select(
        F.row_number()
        .over(Window.orderBy("event_id"))
        .cast("long")
        .alias("cid"),
        F.col("py").cast("double").alias("clat"),
        F.col("px").cast("double").alias("clon"),
    )
    assign = None
    for _ in range(_KM_ROUNDS):
        d2 = (F.col("py").cast("double") - F.col("clat")) * (
            F.col("py").cast("double") - F.col("clat")
        ) + (F.col("px").cast("double") - F.col("clon")) * (
            F.col("px").cast("double") - F.col("clon")
        )
        best = (
            pts.crossJoin(F.broadcast(centers))
            .groupBy("event_id")
            .agg(
                F.min(
                    F.struct(
                        d2.alias("d2"),
                        F.col("cid").alias("cid"),
                        F.col("py").alias("py"),
                        F.col("px").alias("px"),
                    )
                ).alias("b")
            )
        )
        assign = best.select(
            "event_id", "b.cid", "b.d2", "b.py", "b.px"
        )
        centers = assign.groupBy("cid").agg(
            (
                F.sum("py").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("clat"),
            (
                F.sum("px").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("clon"),
        )
    # d2 is emitted UNROUNDED: centroids are exact BIGINT/BIGINT quotients,
    # so d2 is the same dyadic double bit-for-bit on both engines — while a
    # 6-dp round would MANUFACTURE divergence (dyadic values can sit exactly
    # on a decimal half, where Java BigDecimal and C++ round() disagree)
    return assign.select(
        "event_id", F.col("cid").cast("long").alias("cid"), "d2"
    )


# 2-D skyline (Pareto frontier) -------------------------------------------------


@register(
    "skyline_2d",
    """
    WITH pruned AS (
      /* local prune: only the cheapest rows of each size can be skyline */
      SELECT p_partkey, p_size, p_retailprice
      FROM (
        SELECT p_partkey, p_size, p_retailprice,
               min(p_retailprice) OVER (PARTITION BY p_size) AS mn
        FROM part
      ) WHERE p_retailprice = mn
    )
    SELECT a.p_partkey, CAST(a.p_size AS INT) AS p_size, a.p_retailprice
    FROM pruned a
    WHERE NOT EXISTS (
      SELECT 1 FROM pruned b
      WHERE b.p_size >= a.p_size AND b.p_retailprice <= a.p_retailprice
        AND (b.p_size > a.p_size OR b.p_retailprice < a.p_retailprice)
    )
    """,
    doc=(
        "2-D skyline query (Pareto frontier: maximize p_size, minimize "
        "p_retailprice — 'the biggest cheapest parts'): the classic "
        "preference-query operator, computed with the standard two-phase "
        "distributed algorithm — a partition-local prune (only the "
        "cheapest row(s) per size can survive) followed by exact "
        "dominance over the tiny survivor set; equal (size, price) pairs "
        "do not dominate each other, so ties all stay"
    ),
)
def skyline_2d(spark, sf_dir):
    """Phase 1 is one window exchange on p_size (the partial skyline:
    survivors <= distinct sizes x ties, ~50 rows at ANY corpus scale
    because the domain is the prune key). Phase 2 is a broadcast
    nested-loop anti-join over that O(domain) set — the inequality
    dominance predicate never touches the full table. This is how a
    skyline actually distributes: local prune in each partition, exact
    pass on the union of local frontiers."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_size", "p_retailprice")
    mn = F.min("p_retailprice").over(Window.partitionBy("p_size"))
    pruned = _persist_evict(
        p.withColumn("mn", mn).filter(F.col("p_retailprice") == F.col("mn")).drop("mn")
    )
    dom = pruned.select(
        F.col("p_size").alias("b_size"),
        F.col("p_retailprice").alias("b_price"),
    )
    cond = (
        (F.col("b_size") >= F.col("p_size"))
        & (F.col("b_price") <= F.col("p_retailprice"))
        & (
            (F.col("b_size") > F.col("p_size"))
            | (F.col("b_price") < F.col("p_retailprice"))
        )
    )
    return pruned.join(F.broadcast(dom), cond, "left_anti").select(
        "p_partkey", F.col("p_size").cast("int").alias("p_size"), "p_retailprice"
    )


# directional extreme points (convex-hull summary) -----------------------------

# 16 integer direction vectors (D8 + the knight-step interleavings): dot
# products stay BIGINT-exact, and 16 directions bound the hull tightly
# enough for envelope/extent summaries
_EP_DIRS = [
    (1, 0), (2, 1), (1, 1), (1, 2),
    (0, 1), (-1, 2), (-1, 1), (-2, 1),
    (-1, 0), (-2, -1), (-1, -1), (-1, -2),
    (0, -1), (1, -2), (1, -1), (2, -1),
]

_EP_DIR_SQL = " UNION ALL ".join(
    f"SELECT {i} AS diridx, {dy} AS dy, {dx} AS dx"
    for i, (dy, dx) in enumerate(_EP_DIRS)
)


@register(
    "extreme_points",
    f"""
    WITH {_KM_PTS_SQL},
    ev AS (
      SELECT e.event_type, p.event_id, p.py, p.px
      FROM events e JOIN pts p ON e.event_id = p.event_id
    ),
    dirs AS ({_EP_DIR_SQL}),
    scored AS (
      SELECT event_type, diridx, event_id, py, px,
             CAST(dy * py + dx * px AS BIGINT) AS dot,
             row_number() OVER (PARTITION BY event_type, diridx
                                ORDER BY dy * py + dx * px DESC, event_id)
               AS rn
      FROM ev CROSS JOIN dirs
    )
    SELECT event_type, CAST(diridx AS INT) AS diridx, event_id, py, px, dot
    FROM scored WHERE rn = 1
    """,
    doc=(
        "directional extreme points per event type: for 16 exact integer "
        "direction vectors, the point maximizing the dot product (ties "
        "to lowest event_id) — the rotating-calipers convex-envelope "
        "summary (every reported point IS a hull vertex; 16 directions "
        "give the bounding 16-gon used for extent/footprint estimates); "
        "all scores BIGINT, no float anywhere"
    ),
)
def extreme_points(spark, sf_dir):
    """A constant 16x map-side fan-out (explode over the direction
    literals — no join materializes point x direction through a
    shuffle), then ONE partial-agg struct-min per (type, dir): map-side
    combine reduces every partition to <= |types| x 16 rows before the
    exchange, so the shuffle is O(groups), not O(points)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        (F.col("event_id") * 7919 % 2000).cast("long").alias("py"),
        (F.col("event_id") * 104729 % 2400).cast("long").alias("px"),
    )
    scored = ev.select(
        "event_type",
        "event_id",
        "py",
        "px",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("diridx"),
                        (
                            F.lit(dy) * F.col("py") + F.lit(dx) * F.col("px")
                        ).alias("dot"),
                    )
                    for i, (dy, dx) in enumerate(_EP_DIRS)
                ]
            )
        ).alias("k"),
    ).select("event_type", "event_id", "py", "px", "k.diridx", "k.dot")
    best = scored.groupBy("event_type", "diridx").agg(
        F.min(
            F.struct(
                (-F.col("dot")).alias("ndot"),
                F.col("event_id").alias("event_id"),
                F.col("py").alias("py"),
                F.col("px").alias("px"),
            )
        ).alias("b")
    )
    return best.select(
        "event_type",
        F.col("diridx").cast("int").alias("diridx"),
        "b.event_id",
        "b.py",
        "b.px",
        (-F.col("b.ndot")).cast("long").alias("dot"),
    )


# first BPE merge step (adjacent-pair statistics) -------------------------------

_BPE_TOPK = 32


@register(
    "bpe_merge_step",
    f"""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents
    ),
    pairs AS (
      SELECT substring(tok, i, 2) AS pair
      FROM toks CROSS JOIN unnest(range(1, length(tok))) AS t(i)
      WHERE length(tok) >= 2
    ),
    counted AS (
      SELECT pair, CAST(count(*) AS BIGINT) AS n,
             row_number() OVER (ORDER BY count(*) DESC, pair) AS rnk
      FROM pairs GROUP BY pair
    )
    SELECT CAST(rnk AS INT) AS rnk, pair, n
    FROM counted WHERE rnk <= {_BPE_TOPK}
    """,
    doc=(
        f"first BPE merge step: corpus-wide adjacent character-pair "
        f"frequencies within tokens, top {_BPE_TOPK} by (count DESC, "
        "pair) — the inner statistic a byte-pair-encoding tokenizer "
        "trainer computes every merge round (run it on the corpus after "
        "each merge to re-rank); pure integer counts, deterministic "
        "total order"
    ),
)
def bpe_merge_step(spark, sf_dir):
    """Token explode + in-token pair explode are both map-side
    (Generate), the count is ONE partial-agg groupBy on the pair (domain
    <= alphabet^2, so map-side combine collapses each partition to a few "
    hundred rows), and the global top-k is a sorted limit over that tiny
    domain — the bottom_pct_threshold shape, never a full sort of the
    pair stream."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.expr(r"regexp_extract_all(text, '\\S+', 0)")
        ).alias("tok")
    ).filter(F.length("tok") >= 2)
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(tok) - 1),"
                " i -> substring(tok, CAST(i AS INT), 2))"
            )
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), "pair")
    return (
        counted.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _BPE_TOPK)
        .select(F.col("rnk").cast("int").alias("rnk"), "pair", "n")
    )


# event funnel (view -> click -> purchase) --------------------------------------

_FUNNEL = ("view", "click", "purchase")


@register(
    "window_funnel",
    f"""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = '{_FUNNEL[0]}' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
      WHERE e.event_type = '{_FUNNEL[1]}' GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
      WHERE e.event_type = '{_FUNNEL[2]}' GROUP BY e.user_id
    )
    SELECT s1.user_id,
           CAST(epoch_us(s1.t1) AS BIGINT) AS t1_us,
           CAST(epoch_us(s2.t2) AS BIGINT) AS t2_us,
           CAST(epoch_us(s3.t3) AS BIGINT) AS t3_us,
           CAST(CASE WHEN s3.t3 IS NOT NULL THEN 3
                     WHEN s2.t2 IS NOT NULL THEN 2 ELSE 1 END AS INT)
             AS depth
    FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
            LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
    doc=(
        "ordered event funnel per user (view -> click -> purchase): the "
        "earliest view, the earliest click strictly after it, the "
        "earliest purchase strictly after that, and the funnel depth "
        "reached — the product-analytics conversion operator; "
        "timestamps emitted as epoch microseconds so parity is integer"
    ),
)
def window_funnel(spark, sf_dir):
    """Each stage is one filtered partial-agg groupBy on user_id plus an
    equi-join on user_id with the time predicate riding the join filter
    — three narrow shuffles on the same key (co-partitioned after the
    first), never a window over the raw event stream. Stage frames are
    one-row-per-user, so the left joins are broadcast-sized here and
    stay key-co-located at scale."""
    ev = _persist_evict(
        _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    )
    s1 = (
        ev.filter(F.col("event_type") == _FUNNEL[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == _FUNNEL[1])
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == _FUNNEL[2])
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    # events.ts is TIMESTAMP_NTZ; the session timezone is pinned UTC
    # (session.py), so the NTZ -> LTZ cast is the identity epoch mapping
    # DuckDB's epoch_us applies to its naive TIMESTAMP
    us = lambda c: F.expr(  # noqa: E731
        f"CAST(unix_micros(CAST({c} AS TIMESTAMP_LTZ)) AS BIGINT)"
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            us("t1").alias("t1_us"),
            us("t2").alias("t2_us"),
            us("t3").alias("t3_us"),
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .otherwise(1)
            .cast("int")
            .alias("depth"),
        )
    )


# retention cohorts --------------------------------------------------------------


@register(
    "retention_cohorts",
    """
    WITH f AS (
      SELECT user_id,
             CAST(floor(epoch(min(ts))) AS BIGINT) // 604800 AS cohort_wk
      FROM events GROUP BY user_id
    ),
    a AS (
      SELECT e.user_id, f.cohort_wk,
             CAST(floor(epoch(e.ts)) AS BIGINT) // 604800 - f.cohort_wk
               AS wk_offset
      FROM events e JOIN f ON e.user_id = f.user_id
    )
    SELECT cohort_wk, wk_offset,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM a GROUP BY cohort_wk, wk_offset
    """,
    doc=(
        "retention cohort matrix: users bucketed by the epoch week of "
        "their first event (cohort), counted distinct in every later "
        "week offset they were active — the standard growth-analytics "
        "triangle; week = epoch_seconds // 604800, integer-exact on "
        "both engines"
    ),
)
def retention_cohorts(spark, sf_dir):
    """One partial-agg groupBy for first-touch, one equi-join on user_id
    (co-partitioned with the groupBy's exchange), one distinct-count
    groupBy on the (cohort, offset) pair — the count-distinct shuffle
    carries (cohort, offset, user) triples partial-deduped map-side."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    wk = lambda c: F.expr(  # noqa: E731
        f"CAST(unix_timestamp({c}) DIV 604800 AS BIGINT)"
    )
    f = ev.groupBy("user_id").agg(
        wk("min(ts)").alias("cohort_wk")
    )
    a = ev.join(f, "user_id").select(
        "user_id",
        "cohort_wk",
        (wk("ts") - F.col("cohort_wk")).alias("wk_offset"),
    )
    return a.groupBy("cohort_wk", "wk_offset").agg(
        F.countDistinct("user_id").alias("n_users")
    )


# accumulated-cost distance (fixed-round Bellman-Ford over the cell grid) -------

_CD_ROUNDS = 10


def _cost_distance_oracle_sql() -> str:
    """The sssp unrolled-CTE idiom on the raster grid graph: the cost of
    entering a cell is its density count x (all BIGINT, so min-relaxation
    is aggregation-order exact), edges are the 8-neighborhood."""
    head = f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    o AS (
      SELECT cy AS ocy, cx AS ocx FROM cells ORDER BY x DESC, cy, cx LIMIT 1
    ),
    d0 AS (
      SELECT c.cy, c.cx,
             CASE WHEN c.cy = o.ocy AND c.cx = o.ocx
                  THEN CAST(0 AS BIGINT) END AS dist
      FROM cells c CROSS JOIN o
    )"""
    steps = []
    for k in range(1, _CD_ROUNDS + 1):
        steps.append(f"""
    d{k} AS (
      SELECT c.cy, c.cx,
             CAST(least(coalesce(min(p.dist), min(q.dist + c.x)),
                        coalesce(min(q.dist + c.x), min(p.dist))) AS BIGINT)
               AS dist
      FROM cells c
      LEFT JOIN d{k - 1} p ON p.cy = c.cy AND p.cx = c.cx
      LEFT JOIN d{k - 1} q
        ON abs(q.cy - c.cy) <= 1 AND abs(q.cx - c.cx) <= 1
       AND NOT (q.cy = c.cy AND q.cx = c.cx)
      GROUP BY c.cy, c.cx
    )""")
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT cy, cx, dist FROM d{_CD_ROUNDS} WHERE dist IS NOT NULL
    """
    )


@register(
    "cost_distance",
    _cost_distance_oracle_sql(),
    doc=(
        f"accumulated-cost distance (GIS cost surface): least total "
        f"friction from the densest cell, where entering a cell costs its "
        f"point count — {_CD_ROUNDS} unrolled Bellman-Ford rounds over the "
        "8-neighbor grid graph (cells beyond that relaxation horizon stay "
        "unreached and are excluded); BIGINT costs, so the min-relaxation "
        "is exact at any aggregation order"
    ),
)
def cost_distance(spark, sf_dir):
    """sssp's loop shape on the raster: the 8 candidate edges per cell are
    generated MAP-SIDE from the frontier (a constant explode over the
    offset literals — the grid graph never materializes through a
    shuffle), each round is one equi-join on the cell key + a partial-agg
    min + a min-merge with the prior round, localCheckpoint truncating the
    doubling lineage exactly as sssp/dup_components do. Source selection
    is a one-row broadcast (densest cell, ties to lowest (cy, cx)), never
    a literal that might not exist at small SF."""
    from pyspark import StorageLevel

    while len(_PAGERANK_CACHED) > 4:
        _PAGERANK_CACHED.pop(0).unpersist()
    cells = _cell_counts(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    _PAGERANK_CACHED.append(cells)
    src0 = (
        cells.orderBy(F.col("x").desc(), "cy", "cx")
        .limit(1)
        .select(F.col("cy").alias("ocy"), F.col("cx").alias("ocx"))
    )
    dist = (
        cells.crossJoin(F.broadcast(src0))
        .select(
            "cy",
            "cx",
            F.when(
                (F.col("cy") == F.col("ocy")) & (F.col("cx") == F.col("ocx")),
                F.lit(0).cast("long"),
            ).alias("dist"),
        )
        .localCheckpoint(eager=False)
    )
    offsets = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1) if (dy, dx) != (0, 0)]
    for _ in range(_CD_ROUNDS):
        frontier = dist.filter(F.col("dist").isNotNull())
        cand = (
            frontier.select(
                F.col("dist").alias("du"),
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                (F.col("cy") + dy).alias("cy"),
                                (F.col("cx") + dx).alias("cx"),
                            )
                            for dy, dx in offsets
                        ]
                    )
                ).alias("k"),
            )
            .select("k.cy", "k.cx", "du")
            .join(cells, ["cy", "cx"])
            .groupBy("cy", "cx")
            .agg(F.min(F.col("du") + F.col("x")).alias("cand"))
        )
        dist = (
            dist.join(cand, ["cy", "cx"], "left")
            .select(
                "cy", "cx", F.least(F.col("dist"), F.col("cand")).alias("dist")
            )
            .localCheckpoint(eager=False)
        )
    return dist.filter(F.col("dist").isNotNull()).select("cy", "cx", "dist")


# trajectory rasterization (supercover DDA over per-user legs) ------------------


@register(
    "rasterize_segments",
    f"""
    WITH p AS (
      SELECT user_id, epoch_ms(ts) AS t_ms, event_id,
             CAST(floor((CAST(event_id * 7919 % 2000 AS DOUBLE) / 100.0)
                        / {_GI_CELL!r}) AS BIGINT) AS cy,
             CAST(floor((CAST(event_id * 104729 % 2400 AS DOUBLE) / 100.0 + 10.0)
                        / {_GI_CELL!r}) AS BIGINT) AS cx
      FROM events
    ),
    legs AS (
      SELECT user_id, cy AS dcy, cx AS dcx,
             lag(cy) OVER w AS ocy, lag(cx) OVER w AS ocx
      FROM p
      WINDOW w AS (PARTITION BY user_id ORDER BY t_ms, event_id)
    ),
    moves AS (
      SELECT user_id, ocy, ocx, dcy, dcx,
             greatest(abs(dcy - ocy), abs(dcx - ocx)) AS steps
      FROM legs WHERE ocy IS NOT NULL
        AND greatest(abs(dcy - ocy), abs(dcx - ocx)) >= 1
    ),
    painted AS (
      SELECT user_id,
             (ocy * steps + i * (dcy - ocy)) // steps AS cy,
             (ocx * steps + i * (dcx - ocx)) // steps AS cx
      FROM moves CROSS JOIN unnest(range(1, steps + 1)) AS t(i)
    )
    SELECT cy, cx, CAST(count(*) AS BIGINT) AS n_entries,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM painted GROUP BY cy, cx
    """,
    doc=(
        "trajectory rasterization: every per-user movement leg walked "
        "cell-by-cell with an integer DDA (param i/steps interpolation, "
        "floor division — exact because cell indices are non-negative on "
        "this grid), counting entries and distinct users per grid cell — "
        "the vector->raster density operator (road-usage heatmaps, "
        "corridor load); origins are not re-painted, so each fix cell is "
        "entered once per leg"
    ),
)
def rasterize_segments(spark, sf_dir):
    """One per-user lag window (the od_flows exchange), then the DDA walk
    is a MAP-SIDE explode over sequence(1, steps) — the fan-out is the
    painted-cell count, never a join — absorbed by the partial-agg
    groupBy on the cell key. The distinct-user count rides the same
    shuffle partial-deduped. All-integer interpolation: floor((o*steps +
    i*(d-o))/steps) with a non-negative numerator, so Spark's truncating
    DIV and DuckDB's flooring // agree."""
    ev = _t(spark, sf_dir, "events")
    p = ev.select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
        "event_id",
        F.floor(
            ((F.col("event_id") * 7919 % 2000).cast("double") / 100.0) / _GI_CELL
        ).alias("cy"),
        F.floor(
            (((F.col("event_id") * 104729 % 2400).cast("double") / 100.0) + 10.0)
            / _GI_CELL
        ).alias("cx"),
    )
    w = Window.partitionBy("user_id").orderBy("t_ms", "event_id")
    legs = p.select(
        "user_id",
        F.col("cy").alias("dcy"),
        F.col("cx").alias("dcx"),
        F.lag("cy").over(w).alias("ocy"),
        F.lag("cx").over(w).alias("ocx"),
    )
    moves = legs.filter(F.col("ocy").isNotNull()).select(
        "user_id",
        "ocy",
        "ocx",
        "dcy",
        "dcx",
        F.greatest(
            F.abs(F.col("dcy") - F.col("ocy")), F.abs(F.col("dcx") - F.col("ocx"))
        ).alias("steps"),
    ).filter(F.col("steps") >= 1)
    painted = moves.select(
        "user_id",
        F.explode(F.expr("sequence(1, steps)")).alias("i"),
        "ocy",
        "ocx",
        "dcy",
        "dcx",
        "steps",
    ).select(
        "user_id",
        F.expr("(ocy * steps + i * (dcy - ocy)) DIV steps").alias("cy"),
        F.expr("(ocx * steps + i * (dcx - ocx)) DIV steps").alias("cx"),
    )
    return painted.groupBy("cy", "cx").agg(
        F.count(F.lit(1)).alias("n_entries"),
        F.countDistinct("user_id").alias("n_users"),
    )


# quadrat-count dispersion test -------------------------------------------------

# Fixed quadrat frame derived from _PT_SQL's value ranges: lat = (id*7919 %
# 2000)/100 in [0, 20), lon = (id*104729 % 2400)/100 + 10 in [10, 34), so on
# the _GI_CELL = 0.5-deg grid the domain is exactly 40 x 48 quadrats — the
# EMPTY quadrats are part of the statistic (chi2 counts them as x = 0), so
# the frame must be the domain, not the inhabited cells.
_QD_NQ = 40 * 48


@register(
    "quadrat_chi2",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL})
    SELECT CAST(sum(x) AS BIGINT) AS n_pts,
           CAST({_QD_NQ} AS BIGINT) AS n_quadrats,
           CAST(count(*) AS BIGINT) AS n_occupied,
           round(CAST(sum(x) AS DOUBLE) / {_QD_NQ}, 6) AS mean_q,
           round((CAST(sum(x * x) AS DOUBLE)
                  - CAST(sum(x) AS DOUBLE) * sum(x) / {_QD_NQ})
                 / ({_QD_NQ} - 1)
                 / (CAST(sum(x) AS DOUBLE) / {_QD_NQ}), 6) AS vmr,
           round((CAST(sum(x * x) AS DOUBLE)
                  - CAST(sum(x) AS DOUBLE) * sum(x) / {_QD_NQ})
                 / (CAST(sum(x) AS DOUBLE) / {_QD_NQ}), 6) AS chi2
    FROM cells
    """,
    doc=(
        "quadrat-count dispersion test over the detection points: "
        "variance/mean ratio and the chi-square statistic "
        "sum((x - m)^2) / m over ALL 40 x 48 domain quadrats (empties "
        "included via the algebraic identity SS = sum(x^2) - n^2/NQ, so "
        "only inhabited cells are ever materialized) — VMR >> 1 "
        "clustered, ~ 1 CSR; the grid-based complement to clark_evans / "
        "ripley_k"
    ),
)
def quadrat_chi2(spark, sf_dir):
    """One partial-agg groupBy on the cell key, then a one-row global
    aggregate. All sums are integer (sum x, sum x^2, count) so the
    statistic is order-exact on both engines; empty quadrats enter
    through the closed-form SS identity instead of a dense grid
    materialization (at 100 TB the domain grid is tiny but the point set
    is not — the partial agg is the whole cost)."""
    cells = _cell_counts(spark, sf_dir)
    n = F.sum("x")
    ss = F.sum(F.col("x") * F.col("x")).cast("double") - n.cast("double") * n / _QD_NQ
    mean_q = n.cast("double") / _QD_NQ
    return cells.agg(
        n.cast("long").alias("n_pts"),
        F.lit(_QD_NQ).cast("long").alias("n_quadrats"),
        F.count(F.lit(1)).alias("n_occupied"),
        F.round(mean_q, 6).alias("mean_q"),
        F.round(ss / (_QD_NQ - 1) / mean_q, 6).alias("vmr"),
        F.round(ss / mean_q, 6).alias("chi2"),
    )


# bilinear 2x raster upsample ----------------------------------------------------

# Separable scatter weights for a 2x bilinear upsample: output row oy = 2*iy
# + d samples the input at fy = oy/2 - 0.25, so input iy reaches outputs
# d in {-1, 0, 1, 2} with weights {0.25, 0.75, 0.75, 0.25} (triangle kernel
# max(0, 1 - |fy - iy|)). All weights are dyadic rationals, so the scatter
# sums are float-EXACT on both engines — no rounding tolerance needed.
_BL_OFF = ((-1, 0.25), (0, 0.75), (1, 0.75), (2, 0.25))


@register(
    "bilinear_resample",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL})
    SELECT CAST(2 * cy + ty.d AS BIGINT) AS oy,
           CAST(2 * cx + tx.d AS BIGINT) AS ox,
           round(sum(ty.w * tx.w * x), 6) AS val
    FROM cells
    CROSS JOIN (VALUES {", ".join(f"({d}, {w!r})" for d, w in _BL_OFF)}) AS ty(d, w)
    CROSS JOIN (VALUES {", ".join(f"({d}, {w!r})" for d, w in _BL_OFF)}) AS tx(d, w)
    GROUP BY 1, 2
    """,
    doc=(
        "bilinear 2x raster upsample of the cell-count density surface: "
        "each input cell scatters to the 4x4 output cells its triangle "
        "kernel reaches (separable 0.25/0.75 weights), empty input cells "
        "contribute 0 — the raster resample operator (the reference's "
        "M->I 4-way replication, FILDA.py:272-281, is the nearest-"
        "neighbor special case of this kernel)"
    ),
)
def bilinear_resample(spark, sf_dir):
    """Map-side 16-way scatter explode (the rasterize_segments idiom: the
    fan-out is the kernel footprint, never a join) absorbed by one
    partial-agg groupBy on the output cell key. Weights are dyadic so
    sum order is irrelevant — the parity is exact, the round is
    cosmetic."""
    cells = _cell_counts(spark, sf_dir)
    off = F.array(
        *[
            F.struct(F.lit(d).alias("d"), F.lit(w).alias("w"))
            for d, w in _BL_OFF
        ]
    )
    return (
        cells.select("cy", "cx", "x", F.explode(off).alias("ty"))
        .select("cy", "cx", "x", "ty", F.explode(off).alias("tx"))
        .groupBy(
            (2 * F.col("cy") + F.col("ty.d")).cast("long").alias("oy"),
            (2 * F.col("cx") + F.col("tx.d")).cast("long").alias("ox"),
        )
        .agg(
            F.round(
                F.sum(F.col("ty.w") * F.col("tx.w") * F.col("x")), 6
            ).alias("val")
        )
    )


# per-entity autocorrelation ------------------------------------------------------

_ACF_LAGS = 3
_ACF_MIN_N = 12  # need a few points past the deepest lag for a stable r_k


@register(
    "acf_lags",
    f"""
    WITH b AS (
      SELECT user_id, value,
             lag(value, 1) OVER w AS l1,
             lag(value, 2) OVER w AS l2,
             lag(value, 3) OVER w AS l3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    m AS (
      SELECT user_id, sum(value) / count(*) AS mu,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT b.user_id, any_value(m.n) AS n,
             sum((value - mu) * (value - mu)) AS ss,
             sum(CASE WHEN l1 IS NOT NULL
                 THEN (value - mu) * (l1 - mu) END) AS c1,
             sum(CASE WHEN l2 IS NOT NULL
                 THEN (value - mu) * (l2 - mu) END) AS c2,
             sum(CASE WHEN l3 IS NOT NULL
                 THEN (value - mu) * (l3 - mu) END) AS c3
      FROM b JOIN m USING (user_id)
      GROUP BY b.user_id
    )
    SELECT user_id, lag_k, round(c / ss, 6) AS acf
    FROM (
      SELECT user_id, CAST(1 AS INT) AS lag_k, c1 AS c, ss FROM g
        WHERE n >= {_ACF_MIN_N} AND ss > 0
      UNION ALL
      SELECT user_id, CAST(2 AS INT), c2, ss FROM g
        WHERE n >= {_ACF_MIN_N} AND ss > 0
      UNION ALL
      SELECT user_id, CAST(3 AS INT), c3, ss FROM g
        WHERE n >= {_ACF_MIN_N} AND ss > 0
    )
    """,
    doc=(
        f"per-entity autocorrelation function at lags 1..{_ACF_LAGS}: "
        "r_k = sum((x_t - mu)(x_(t-k) - mu)) / sum((x_t - mu)^2) over each "
        "user's time-ordered value series (ties broken by event_id), "
        f"users with n >= {_ACF_MIN_N} and nonzero variance — the "
        "series-memory diagnostic feeding the trend family "
        "(mann_kendall / theil_sen / cusum)"
    ),
)
def acf_lags(spark, sf_dir):
    """One per-user sort window produces all three lag columns in a
    single pass (the rasterize_segments exchange), the per-user mean
    joins back on the same key (O(users) frame, same partitioning), and
    one partial-agg groupBy emits every lag's cross-product sum at once
    — the 3 output rows per user are a map-side explode of the
    aggregate, not three scans. Float sums ride the window's sorted
    order; residual cross-engine associativity drift is absorbed by the
    6-dp round."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    b = ev.select(
        "user_id",
        "value",
        *[F.lag("value", k).over(w).alias(f"l{k}") for k in (1, 2, 3)],
    )
    m = ev.groupBy("user_id").agg(
        (F.sum("value") / F.count(F.lit(1))).alias("mu"),
        F.count(F.lit(1)).alias("n"),
    )
    dv = F.col("value") - F.col("mu")
    g = (
        b.join(m, "user_id")
        .groupBy("user_id")
        .agg(
            F.first("n").alias("n"),
            F.sum(dv * dv).alias("ss"),
            *[
                F.sum(
                    F.when(
                        F.col(f"l{k}").isNotNull(),
                        dv * (F.col(f"l{k}") - F.col("mu")),
                    )
                ).alias(f"c{k}")
                for k in (1, 2, 3)
            ],
        )
        .filter((F.col("n") >= _ACF_MIN_N) & (F.col("ss") > 0))
    )
    lags = F.array(
        *[
            F.struct(
                F.lit(k).cast("int").alias("lag_k"), F.col(f"c{k}").alias("c")
            )
            for k in (1, 2, 3)
        ]
    )
    return g.select("user_id", "ss", F.explode(lags).alias("t")).select(
        "user_id",
        F.col("t.lag_k").alias("lag_k"),
        F.round(F.col("t.c") / F.col("ss"), 6).alias("acf"),
    )


# common-neighbors link prediction ------------------------------------------------

# Sparser graph than pagerank's: one edge per ORDER (l_linenumber = 1) into a
# 4000-node id space, so non-adjacent two-hop pairs exist at every sf and the
# wedge join (sum of deg^2 over shared neighbors) stays bounded. At 100 TB
# the wedge fan-out is the known cost of common-neighbors scoring; the
# mitigation is the same hub cap the LSH ops use (drop y with deg above a
# threshold) — not needed at this graph's density, noted here.
_CN_N = 4000
_CN_TOPK = 20


@register(
    "common_neighbors",
    f"""
    WITH e0 AS (
      SELECT DISTINCT
             least(l_orderkey % {_CN_N}, l_partkey % {_CN_N}) AS u,
             greatest(l_orderkey % {_CN_N}, l_partkey % {_CN_N}) AS v
      FROM lineitem
      WHERE l_linenumber = 1
        AND l_orderkey % {_CN_N} <> l_partkey % {_CN_N}
    ),
    adj AS (SELECT u AS x, v AS y FROM e0 UNION ALL SELECT v, u FROM e0),
    deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY x),
    cand AS (
      SELECT a.x AS u, b.x AS v, CAST(count(*) AS BIGINT) AS cn
      FROM adj a JOIN adj b ON a.y = b.y AND a.x < b.x
      GROUP BY 1, 2
    ),
    open_pairs AS (
      SELECT c.u, c.v, c.cn FROM cand c
      LEFT JOIN e0 ON e0.u = c.u AND e0.v = c.v
      WHERE e0.u IS NULL
    )
    SELECT op.u, op.v, op.cn,
           round(CAST(op.cn AS DOUBLE) / (du.d + dv.d - op.cn), 6) AS jaccard
    FROM open_pairs op
    JOIN deg du ON du.x = op.u
    JOIN deg dv ON dv.x = op.v
    ORDER BY op.cn DESC, op.u, op.v
    LIMIT {_CN_TOPK}
    """,
    doc=(
        f"common-neighbors link prediction over the order->part graph "
        f"(one edge per order, {_CN_N}-node space): for every NON-adjacent "
        "pair sharing >= 1 neighbor, the common-neighbor count and the "
        "neighborhood Jaccard cn / (deg_u + deg_v - cn); top "
        f"{_CN_TOPK} by cn (integer-deterministic rank) — the classic "
        "missing-link scorer, completing the graph family (pagerank / "
        "triangle_count / k_core / dup_components)"
    ),
)
def common_neighbors(spark, sf_dir):
    """Wedge counting as one self-equi-join of the adjacency list on the
    shared-neighbor key (the triangle_count shape minus the closing
    check), partial-agg groupBy on the (u, v) pair, broadcast-joined
    degree frame (O(nodes)), and an integer-keyed TakeOrdered for the
    top-k — no global sort materializes. The anti join back to e0
    removes already-connected pairs."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    a = (F.col("l_orderkey") % _CN_N).alias("a")
    bcol = (F.col("l_partkey") % _CN_N).alias("b")
    e0 = (
        li.select(a, bcol)
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
    )
    e0 = _persist_evict(e0)  # referenced by adj (twice), anti join
    adj = e0.select(F.col("u").alias("x"), F.col("v").alias("y")).unionAll(
        e0.select(F.col("v").alias("x"), F.col("u").alias("y"))
    )
    deg = adj.groupBy("x").agg(F.count(F.lit(1)).alias("d"))
    cand = (
        adj.alias("a")
        .join(adj.alias("b"), F.col("a.y") == F.col("b.y"))
        .filter(F.col("a.x") < F.col("b.x"))
        .groupBy(F.col("a.x").alias("u"), F.col("b.x").alias("v"))
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    open_pairs = cand.join(e0, ["u", "v"], "left_anti")
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    return (
        open_pairs.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .select(
            "u",
            "v",
            "cn",
            F.round(
                F.col("cn").cast("double")
                / (F.col("du") + F.col("dv") - F.col("cn")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.col("cn").desc(), "u", "v")
        .limit(_CN_TOPK)
    )


# Markov state-transition matrix ---------------------------------------------------


@register(
    "markov_transitions",
    """
    WITH b AS (
      SELECT user_id, event_type AS cur,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    t AS (
      SELECT prev AS from_state, cur AS to_state,
             CAST(count(*) AS BIGINT) AS n
      FROM b WHERE prev IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_state, to_state, n,
           round(CAST(n AS DOUBLE) /
                 sum(n) OVER (PARTITION BY from_state), 6) AS p
    FROM t
    """,
    doc=(
        "first-order Markov transition matrix over per-user event-type "
        "sequences (time-ordered, event_id tie-break): transition counts "
        "and row-normalized probabilities — the behavioral-model "
        "complement to window_funnel / sessionize"
    ),
)
def markov_transitions(spark, sf_dir):
    """One per-user sort window (the shared trajectory exchange) emits
    the (prev, cur) pairs map-side; the transition groupBy partial-aggs
    on a <= |states|^2 key domain so the shuffle is tiny; the row
    normalization is a window over the aggregated 25-row frame, not the
    event stream. Integer counts -> the only float op is one exact
    division."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    b = ev.select(
        F.col("event_type").alias("cur"),
        F.lag("event_type").over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    t = b.groupBy(
        F.col("prev").alias("from_state"), F.col("cur").alias("to_state")
    ).agg(F.count(F.lit(1)).alias("n"))
    wr = Window.partitionBy("from_state")
    return t.select(
        "from_state",
        "to_state",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wr), 6).alias("p"),
    )


# Lorenz curve / Gini coefficient ---------------------------------------------------


@register(
    "lorenz_gini",
    """
    WITH r AS (
      SELECT event_type, value,
             CAST(row_number() OVER (
               PARTITION BY event_type ORDER BY value, event_id) AS BIGINT)
               AS i
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 6) AS total,
           round(2.0 * sum(i * value) / (count(*) * sum(value))
                 - (count(*) + 1.0) / count(*), 6) AS gini
    FROM r GROUP BY event_type
    """,
    doc=(
        "Gini coefficient of the value distribution per event type via "
        "the sorted-rank identity G = 2*sum(i*x_(i)) / (n*sum(x)) - "
        "(n+1)/n (values ascending, event_id tie-break — equal values "
        "swapping ranks leave sum(i*x) unchanged) — the inequality/"
        "concentration measure for skew diagnostics (is 1% of users 90% "
        "of volume?)"
    ),
)
def lorenz_gini(spark, sf_dir):
    """One per-type sort window assigns ranks, one partial-agg groupBy
    on the same key computes all three sums — the window and the
    aggregate share the event_type exchange. Float sums run over the
    window's sorted order; cross-engine associativity drift is absorbed
    by the 6-dp round."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    r = ev.select(
        "event_type", "value", F.row_number().over(w).cast("long").alias("i")
    )
    n = F.count(F.lit(1))
    return r.groupBy("event_type").agg(
        n.alias("n"),
        F.round(F.sum("value"), 6).alias("total"),
        F.round(
            F.lit(2.0) * F.sum(F.col("i") * F.col("value")) / (n * F.sum("value"))
            - (n + F.lit(1.0)) / n,
            6,
        ).alias("gini"),
    )


# Shannon entropy quality score -----------------------------------------------------


@register(
    "entropy_score",
    """
    WITH tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents)
      GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(ln(CAST(sum(c) AS DOUBLE))
                 - sum(c * ln(CAST(c AS DOUBLE))) / sum(c), 6) AS entropy
    FROM tf GROUP BY doc_id
    """,
    doc=(
        "per-document token Shannon entropy H = ln(n) - sum(c*ln(c))/n "
        "(nats) plus distinct-token count — the repetition/diversity "
        "quality signal completing the filter family (gopher_repetition "
        "catches local repeats, this catches global degeneracy: H -> 0 "
        "for one-token spam regardless of arrangement)"
    ),
)
def entropy_score(spark, sf_dir):
    """Tokenize map-side, one (doc, term) partial-agg groupBy, one doc
    groupBy — both on natural high-cardinality keys. The c*ln(c) sum
    runs over each doc's term multiset; order drift absorbed by the
    6-dp round."""
    d = _t(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c")
    return tf.groupBy("doc_id").agg(
        n.alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(
            F.log(n.cast("double"))
            - F.sum(F.col("c") * F.log(F.col("c").cast("double"))) / n,
            6,
        ).alias("entropy"),
    )


# Benford first-digit deviation -----------------------------------------------------


@register(
    "benford_deviation",
    """
    WITH d AS (
      SELECT event_type,
             CAST(substr(CAST(CAST(round(value * 100, 0) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM events
      WHERE CAST(round(value * 100, 0) AS BIGINT) >= 1
    ),
    o AS (
      SELECT event_type, digit, CAST(count(*) AS BIGINT) AS n_obs
      FROM d GROUP BY 1, 2
    )
    SELECT event_type, digit, n_obs,
           round(CAST(n_obs AS DOUBLE)
                 / sum(n_obs) OVER (PARTITION BY event_type), 6) AS p_obs,
           round(log10(1.0 + 1.0 / digit), 6) AS p_benford,
           round(CAST(n_obs AS DOUBLE)
                 / sum(n_obs) OVER (PARTITION BY event_type)
                 - log10(1.0 + 1.0 / digit), 6) AS dev
    FROM o
    """,
    doc=(
        "Benford's-law first-significant-digit audit per event type: "
        "observed digit share vs log10(1 + 1/d) and the deviation — the "
        "fabricated-data / unit-mixup detector for ingest QA. The digit "
        "is extracted from the INTEGER cent value's decimal string "
        "(round(value*100) is the same double op on both engines), never "
        "from floor(log10(x)) whose ULP sits exactly on the decade "
        "boundary"
    ),
)
def benford_deviation(spark, sf_dir):
    """Map-side digit extraction (one round, one int-to-string substr),
    partial-agg groupBy on the <= |types| x 9 key domain, then the
    shares are a window over the aggregated frame — nothing float
    touches the event stream."""
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    d = ev.select(
        "event_type",
        F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit"),
    ).filter(cents >= 1)
    o = d.groupBy("event_type", "digit").agg(F.count(F.lit(1)).alias("n_obs"))
    wt = Window.partitionBy("event_type")
    p_obs = F.col("n_obs").cast("double") / F.sum("n_obs").over(wt)
    p_ben = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return o.select(
        "event_type",
        "digit",
        "n_obs",
        F.round(p_obs, 6).alias("p_obs"),
        F.round(p_ben, 6).alias("p_benford"),
        F.round(p_obs - p_ben, 6).alias("dev"),
    )


# two-proportion A/B z-test ---------------------------------------------------------

_AB_GOAL = "purchase"
_AB_VALUE_MIN = 200.0  # conversion = a high-value goal event, so the rate
# is non-degenerate at every sf (every user has SOME purchase; pp = 1 would
# zero the pooled-variance denominator — guarded with a CASE regardless)


@register(
    "ab_test_ztest",
    f"""
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
             max(CASE WHEN event_type = '{_AB_GOAL}'
                       AND value >= {_AB_VALUE_MIN!r}
                 THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY 1, 2
    ),
    g AS (
      SELECT variant, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(converted) AS BIGINT) AS conv
      FROM u GROUP BY variant
    ),
    s AS (
      SELECT max(CASE WHEN variant = 0 THEN n END) AS n0,
             max(CASE WHEN variant = 1 THEN n END) AS n1,
             max(CASE WHEN variant = 0 THEN conv END) AS c0,
             max(CASE WHEN variant = 1 THEN conv END) AS c1
      FROM g
    ),
    z AS (
      SELECT n0, n1, c0, c1,
             CASE WHEN c0 + c1 > 0 AND c0 + c1 < n0 + n1 THEN
               (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
               / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                      * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                      * (1.0 / n0 + 1.0 / n1))
             END AS zval
      FROM s
    )
    SELECT n0, n1, c0, c1,
           round(CAST(c0 AS DOUBLE) / n0, 6) AS p0,
           round(CAST(c1 AS DOUBLE) / n1, 6) AS p1,
           round(zval, 6) AS z,
           round(2.0 * (1.0 - {physics.normal_cdf_sql("abs(zval)")}), 6)
             AS p_value
    FROM z
    """,
    doc=(
        f"two-proportion pooled z-test: users split by user_id parity, "
        f"conversion = a '{_AB_GOAL}' event with value >= "
        f"{_AB_VALUE_MIN:g}; z and the two-sided p-value via the shared "
        "Abramowitz-Stegun normal CDF (the normal_cdf op's twin) — the "
        "experiment-analysis primitive over the same per-user aggregate "
        "sessionize builds; degenerate pools (all/none converted) yield "
        "NULL z rather than a divide-by-zero"
    ),
)
def ab_test_ztest(spark, sf_dir):
    """One per-user partial-agg groupBy (conversion is a max over the
    user's events, variant rides the key), one 2-row variant aggregate,
    then a single-row pivot — the z arithmetic is scalar. Nothing
    beyond the first groupBy touches the event stream."""
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy(
        "user_id", (F.col("user_id") % 2).cast("int").alias("variant")
    ).agg(
        F.max(
            F.when(
                (F.col("event_type") == _AB_GOAL)
                & (F.col("value") >= _AB_VALUE_MIN),
                1,
            ).otherwise(0)
        ).alias("converted")
    )
    g = u.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    s = g.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("conv"))).alias("c1"),
    )
    conv_tot = F.col("c0") + F.col("c1")
    pp = conv_tot.cast("double") / (F.col("n0") + F.col("n1"))
    zval = F.when(
        (conv_tot > 0) & (conv_tot < F.col("n0") + F.col("n1")),
        (
            F.col("c1").cast("double") / F.col("n1")
            - F.col("c0").cast("double") / F.col("n0")
        )
        / F.sqrt(
            pp
            * (F.lit(1.0) - pp)
            * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
        ),
    )
    z = s.select("n0", "n1", "c0", "c1", zval.alias("zval"))
    return z.select(
        "n0",
        "n1",
        "c0",
        "c1",
        F.round(F.col("c0").cast("double") / F.col("n0"), 6).alias("p0"),
        F.round(F.col("c1").cast("double") / F.col("n1"), 6).alias("p1"),
        F.round(F.col("zval"), 6).alias("z"),
        F.round(
            F.lit(2.0) * (F.lit(1.0) - physics.normal_cdf(F.abs(F.col("zval")))),
            6,
        ).alias("p_value"),
    )


# Moran's I correlogram ------------------------------------------------------------

_MC_R = 3  # max Chebyshev lag ring


@register(
    "moran_correlogram",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    st0 AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s
      FROM cells
    ),
    st AS (
      SELECT n, s,
             CAST(sum(CAST(n * x - s AS HUGEINT)
                      * CAST(n * x - s AS HUGEINT)) AS HUGEINT) AS den
      FROM cells CROSS JOIN st0 GROUP BY n, s
    ),
    pr AS (
      SELECT greatest(abs(b.cy - a.cy), abs(b.cx - a.cx)) AS ring,
             CAST(st.n * a.x - st.s AS HUGEINT)
             * CAST(st.n * b.x - st.s AS HUGEINT) AS zz
      FROM cells a
      JOIN cells b
        ON abs(a.cy - b.cy) <= {_MC_R} AND abs(a.cx - b.cx) <= {_MC_R}
       AND NOT (a.cy = b.cy AND a.cx = b.cx)
      CROSS JOIN st
    )
    SELECT ring,
           CAST(count(*) AS BIGINT) AS w_pairs,
           round((st.n * CAST(sum(zz) AS DOUBLE))
                 / (count(*) * CAST(st.den AS DOUBLE)), 6) AS moran_i,
           round(-1.0 / (st.n - 1), 6) AS e_i
    FROM pr CROSS JOIN st
    GROUP BY ring, st.n, st.den
    """,
    doc=(
        f"Moran's I correlogram over the density surface: global I at "
        f"each Chebyshev lag ring 1..{_MC_R} (binary weights, ordered "
        "pairs) with the CSR expectation -1/(n-1) — autocorrelation decay "
        "vs distance, the global read-off over the same cell frame "
        "local_moran scores per cell. Deviations carried as the scaled "
        "integer n*x - S (the local_moran trick) with 128-bit products, "
        "so both the numerator and Sum(z^2) are exact until ONE double "
        "division per ring"
    ),
)
def moran_correlogram(spark, sf_dir):
    """Persisted cell frame, one kRing-3 explode -> equi-join (the
    variogram cover, ordered pairs so W_r is the plain pair count), one
    partial-agg groupBy to O(3) rows; the (n, S, Sum(z^2)) globals are a
    one-row broadcast. Products ride DECIMAL(38,0) — aggregation order
    cannot drift the statistic at any parallelism."""
    cells = _persist_evict(_cell_counts(spark, sf_dir))
    zhat = lambda col: (F.col("n") * col - F.col("s")).cast("decimal(19,0)")  # noqa: E731
    st0 = cells.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    den = (
        cells.crossJoin(F.broadcast(st0))
        .select((zhat(F.col("x")) * zhat(F.col("x"))).alias("z2"))
        .agg(F.sum("z2").cast("decimal(38,0)").alias("den"))
    )
    st = st0.crossJoin(den)
    right = _ring_explode(
        cells,
        F.col("cy"),
        F.col("cx"),
        [F.col("cy").alias("bcy"), F.col("cx").alias("bcx"), F.col("x").alias("bx_")],
        radius=_MC_R,
        names=("cy", "cx"),
    )
    pr = (
        cells.join(right, ["cy", "cx"])
        .filter(~((F.col("bcy") == F.col("cy")) & (F.col("bcx") == F.col("cx"))))
        .crossJoin(F.broadcast(st))
        .select(
            F.greatest(
                F.abs(F.col("bcy") - F.col("cy")), F.abs(F.col("bcx") - F.col("cx"))
            ).alias("ring"),
            (zhat(F.col("x")) * zhat(F.col("bx_"))).alias("zz"),
            "n",
            "den",
        )
    )
    return pr.groupBy("ring", "n", "den").agg(
        F.count(F.lit(1)).alias("w_pairs"),
        F.sum("zz").cast("decimal(38,0)").alias("num"),
    ).select(
        "ring",
        "w_pairs",
        F.round(
            (F.col("n") * F.col("num").cast("double"))
            / (F.col("w_pairs") * F.col("den").cast("double")),
            6,
        ).alias("moran_i"),
        F.round(F.lit(-1.0) / (F.col("n") - 1), 6).alias("e_i"),
    )


# Huff gravity model ---------------------------------------------------------------

_HF_K = 5  # facilities = the K densest cells
_HF_SMOOTH = 0.5  # distance^2 smoothing so the facility's own cell is finite


@register(
    "huff_gravity",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    fac AS (
      SELECT cy AS fcy, cx AS fcx, x AS attr
      FROM cells ORDER BY x DESC, cy, cx LIMIT {_HF_K}
    ),
    w AS (
      SELECT c.cy, c.cx, f.fcy, f.fcx,
             CAST(f.attr AS DOUBLE)
             / ((c.cy - f.fcy) * (c.cy - f.fcy)
                + (c.cx - f.fcx) * (c.cx - f.fcx) + {_HF_SMOOTH!r}) AS wt
      FROM cells c CROSS JOIN fac f
    )
    SELECT cy, cx, fcy, fcx,
           round(wt / sum(wt) OVER (PARTITION BY cy, cx), 6) AS p_visit
    FROM w
    """,
    doc=(
        f"Huff gravity model: visit probability from every inhabited cell "
        f"to the {_HF_K} densest cells (attractiveness = count, inverse-"
        f"squared cell distance with +{_HF_SMOOTH} smoothing so the "
        "facility's own cell is finite) — the spatial-interaction / "
        "market-area primitive (catchment analysis, trade-area overlap) "
        "the tiling family feeds"
    ),
)
def huff_gravity(spark, sf_dir):
    """The facility frame is a TakeOrdered top-K (integer attractiveness,
    lexicographic tie-break) broadcast against the cell frame — the
    crossJoin is O(cells x K), never points; the normalization is a
    window on the (cy, cx) key the cell frame already carries. One
    exchange for the cell counts, one for the window."""
    cells = _persist_evict(_cell_counts(spark, sf_dir))
    fac = (
        cells.orderBy(F.col("x").desc(), "cy", "cx")
        .limit(_HF_K)
        .select(
            F.col("cy").alias("fcy"),
            F.col("cx").alias("fcx"),
            F.col("x").alias("attr"),
        )
    )
    d2 = (F.col("cy") - F.col("fcy")) * (F.col("cy") - F.col("fcy")) + (
        F.col("cx") - F.col("fcx")
    ) * (F.col("cx") - F.col("fcx"))
    w = cells.crossJoin(F.broadcast(fac)).select(
        "cy",
        "cx",
        "fcy",
        "fcx",
        (F.col("attr").cast("double") / (d2 + F.lit(_HF_SMOOTH))).alias("wt"),
    )
    wn = Window.partitionBy("cy", "cx")
    return w.select(
        "cy",
        "cx",
        "fcy",
        "fcx",
        F.round(F.col("wt") / F.sum("wt").over(wn), 6).alias("p_visit"),
    )


# Wald-Wolfowitz runs test ----------------------------------------------------------

_RT_MIN_N = 12


@register(
    "runs_test",
    f"""
    WITH m AS (
      SELECT user_id, sum(value) / count(*) AS mu,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY user_id
    ),
    b AS (
      SELECT e.user_id, m.n,
             CASE WHEN e.value > m.mu THEN 1 ELSE 0 END AS s,
             lag(CASE WHEN e.value > m.mu THEN 1 ELSE 0 END) OVER (
               PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS ps
      FROM events e JOIN m USING (user_id)
    ),
    g AS (
      SELECT user_id, any_value(n) AS n,
             CAST(sum(s) AS BIGINT) AS n1,
             CAST(sum(1 - s) AS BIGINT) AS n2,
             CAST(1 + sum(CASE WHEN ps IS NOT NULL AND s <> ps
                          THEN 1 ELSE 0 END) AS BIGINT) AS runs
      FROM b GROUP BY user_id
    )
    SELECT user_id, n1, n2, runs,
           round((runs - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))), 6)
             AS z
    FROM g
    WHERE n >= {_RT_MIN_N} AND n1 > 0 AND n2 > 0
      AND 2.0 * n1 * n2 > n1 + n2
    """,
    doc=(
        "Wald-Wolfowitz runs test per user: the value sequence binarized "
        "at the user mean, observed run count vs the randomness "
        "expectation 2*n1*n2/(n1+n2)+1, z-scored — the sequence-"
        "randomness screen beside acf_lags (negative z = too few runs = "
        "positive serial dependence); the variance-degenerate case "
        "2*n1*n2 <= n1+n2 is filtered on both engines"
    ),
)
def runs_test(spark, sf_dir):
    """The acf_lags shape: per-user mean joins back on the user key, one
    per-user sort window for the lagged sign, one partial-agg groupBy
    emits n1/n2/runs as integers — the z expression is the only float
    math and it runs on the aggregated O(users) frame."""
    ev = _t(spark, sf_dir, "events")
    m = ev.groupBy("user_id").agg(
        (F.sum("value") / F.count(F.lit(1))).alias("mu"),
        F.count(F.lit(1)).alias("n"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = F.when(F.col("value") > F.col("mu"), 1).otherwise(0)
    b = ev.join(m, "user_id").select(
        "user_id", "n", s.alias("s"), F.lag(s).over(w).alias("ps")
    )
    g = (
        b.groupBy("user_id")
        .agg(
            F.first("n").alias("n"),
            F.sum("s").alias("n1"),
            F.sum(F.lit(1) - F.col("s")).alias("n2"),
            (
                F.lit(1)
                + F.sum(
                    F.when(
                        F.col("ps").isNotNull() & (F.col("s") != F.col("ps")), 1
                    ).otherwise(0)
                )
            ).alias("runs"),
        )
        .filter(
            (F.col("n") >= _RT_MIN_N)
            & (F.col("n1") > 0)
            & (F.col("n2") > 0)
            & (2.0 * F.col("n1") * F.col("n2") > F.col("n1") + F.col("n2"))
        )
    )
    n1, n2 = F.col("n1"), F.col("n2")
    e_runs = 2.0 * n1 * n2 / (n1 + n2) + F.lit(1.0)
    var = (
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - F.lit(1.0)))
    )
    return g.select(
        "user_id",
        "n1",
        "n2",
        "runs",
        F.round((F.col("runs") - e_runs) / F.sqrt(var), 6).alias("z"),
    )


# Jensen-Shannon divergence between language term distributions ---------------------


@register(
    "jsd_divergence",
    """
    WITH tf AS (
      SELECT lang, term, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT lang, unnest(string_split(text, ' ')) AS term
            FROM documents)
      GROUP BY 1, 2
    ),
    tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS t FROM tf GROUP BY lang),
    pairs AS (
      SELECT a.lang AS l1, b.lang AS l2 FROM tot a JOIN tot b ON a.lang < b.lang
    ),
    vocab AS (
      SELECT p.l1, p.l2, tf.term
      FROM pairs p JOIN tf ON tf.lang IN (p.l1, p.l2)
      GROUP BY 1, 2, 3
    ),
    j AS (
      SELECT v.l1, v.l2, v.term,
             CAST(coalesce(t1.c, 0) AS DOUBLE) / ta.t AS p,
             CAST(coalesce(t2.c, 0) AS DOUBLE) / tb.t AS q
      FROM vocab v
      LEFT JOIN tf t1 ON t1.lang = v.l1 AND t1.term = v.term
      LEFT JOIN tf t2 ON t2.lang = v.l2 AND t2.term = v.term
      JOIN tot ta ON ta.lang = v.l1
      JOIN tot tb ON tb.lang = v.l2
    )
    SELECT l1, l2, CAST(count(*) AS BIGINT) AS n_terms,
           round(sum(CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2.0)) ELSE 0.0 END
                   + CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2.0)) ELSE 0.0 END)
                 / 2.0, 6) AS jsd
    FROM j GROUP BY l1, l2
    """,
    doc=(
        "Jensen-Shannon divergence between per-language token "
        "distributions, every language pair — the corpus-drift / "
        "distribution-shift monitor (JSD in nats, 0 = identical mixes, "
        "ln 2 = disjoint vocabularies); single-sided terms contribute "
        "p*ln(2) through the shared-mixture convention"
    ),
)
def jsd_divergence(spark, sf_dir):
    """One (lang, term) partial-agg groupBy; the pair fan-out joins ride
    the tiny O(|langs| x vocab) frame, never the token stream; totals and
    pairs are broadcasts. The entropy sums run over O(vocab) rows per
    pair — order drift absorbed by the 6-dp round."""
    d = _t(spark, sf_dir, "documents")
    tf = (
        d.select("lang", F.explode(F.split(F.col("text"), " ")).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tf = _persist_evict(tf)
    tot = tf.groupBy("lang").agg(F.sum("c").alias("t"))
    pairs = (
        tot.select(F.col("lang").alias("l1"))
        .join(tot.select(F.col("lang").alias("l2")))
        .filter(F.col("l1") < F.col("l2"))
    )
    vocab = (
        pairs.join(
            F.broadcast(tf.select("lang", "term")),
            (F.col("lang") == F.col("l1")) | (F.col("lang") == F.col("l2")),
        )
        .select("l1", "l2", "term")
        .distinct()
    )
    t1 = tf.select(
        F.col("lang").alias("l1"), F.col("term").alias("term"), F.col("c").alias("c1")
    )
    t2 = tf.select(
        F.col("lang").alias("l2"), F.col("term").alias("term"), F.col("c").alias("c2")
    )
    ta = tot.select(F.col("lang").alias("l1"), F.col("t").alias("ta"))
    tb = tot.select(F.col("lang").alias("l2"), F.col("t").alias("tb"))
    j = (
        vocab.join(F.broadcast(t1), ["l1", "term"], "left")
        .join(F.broadcast(t2), ["l2", "term"], "left")
        .join(F.broadcast(ta), "l1")
        .join(F.broadcast(tb), "l2")
        .select(
            "l1",
            "l2",
            (F.coalesce(F.col("c1"), F.lit(0)).cast("double") / F.col("ta")).alias("p"),
            (F.coalesce(F.col("c2"), F.lit(0)).cast("double") / F.col("tb")).alias("q"),
        )
    )
    mterm = (F.col("p") + F.col("q")) / 2.0
    contrib = F.when(F.col("p") > 0, F.col("p") * F.log(F.col("p") / mterm)).otherwise(
        0.0
    ) + F.when(F.col("q") > 0, F.col("q") * F.log(F.col("q") / mterm)).otherwise(0.0)
    return j.groupBy("l1", "l2").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.sum(contrib) / 2.0, 6).alias("jsd"),
    )


# Area-weighted regrid ---------------------------------------------------------------

# target grid = 8/5 x the 0.5-deg analysis cell (0.8 deg). In FIFTH-units
# the source cell i spans [5i, 5i+5) and target j spans [8j, 8j+8), so the
# per-axis overlap length is an INTEGER in [1, 5] and each source cell
# meets at most 2 targets per axis (5 < 8). Contribution = x * ovy * ovx
# with one double division by 25 (the source area) at the end: mass is
# conserved exactly (sum of weights per source cell = 25) and the
# aggregation is integer until the final scalar op.
_RG_SRC = 5
_RG_DST = 8


@register(
    "area_weighted_regrid",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    d(dy, dx) AS (
      SELECT a.dy, b.dx
      FROM (VALUES (0), (1)) a(dy), (VALUES (0), (1)) b(dx)
    ),
    fan AS (
      SELECT ({_RG_SRC} * cy) // {_RG_DST} + dy AS ty,
             ({_RG_SRC} * cx) // {_RG_DST} + dx AS tx,
             cy, cx, x
      FROM cells CROSS JOIN d
      WHERE ({_RG_SRC} * cy) // {_RG_DST} + dy
              <= ({_RG_SRC} * cy + {_RG_SRC - 1}) // {_RG_DST}
        AND ({_RG_SRC} * cx) // {_RG_DST} + dx
              <= ({_RG_SRC} * cx + {_RG_SRC - 1}) // {_RG_DST}
    ),
    c AS (
      SELECT ty, tx,
             x * (least({_RG_SRC} * cy + {_RG_SRC}, {_RG_DST} * ty + {_RG_DST})
                  - greatest({_RG_SRC} * cy, {_RG_DST} * ty))
               * (least({_RG_SRC} * cx + {_RG_SRC}, {_RG_DST} * tx + {_RG_DST})
                  - greatest({_RG_SRC} * cx, {_RG_DST} * tx)) AS w
      FROM fan
    )
    SELECT ty, tx, CAST(sum(w) AS BIGINT) AS num,
           CAST(sum(w) AS DOUBLE) / {_RG_SRC * _RG_SRC}.0 AS val
    FROM c GROUP BY ty, tx
    """,
    doc=(
        "area-weighted regrid of the density surface from the 0.5-deg "
        "analysis grid to a NON-ALIGNED 0.8-deg grid: each source cell "
        "splits across the <=4 target cells it overlaps with exact "
        "rational area weights (integer overlap lengths in 0.1-deg "
        "fifth-units, one double division by the source area at the end) "
        "— the conservative regridding primitive between misaligned "
        "rasters (model grid <-> tile pyramid), mass-conserving by "
        "construction: sum(val) == total point count"
    ),
)
def area_weighted_regrid(spark, sf_dir):
    """Map-side 4-way fan-out (the rasterize_segments idiom) + ONE
    partial-agg groupBy on the target cell; weights are integer overlap
    products so any aggregation order gives identical rasters. Shuffle
    volume <= 4x inhabited cells, never points."""
    cells = _cell_counts(spark, sf_dir)
    jy0 = F.expr(f"({_RG_SRC} * cy) div {_RG_DST}")
    jx0 = F.expr(f"({_RG_SRC} * cx) div {_RG_DST}")
    jy1 = F.expr(f"({_RG_SRC} * cy + {_RG_SRC - 1}) div {_RG_DST}")
    jx1 = F.expr(f"({_RG_SRC} * cx + {_RG_SRC - 1}) div {_RG_DST}")
    fan = (
        cells.select(
            "cy",
            "cx",
            "x",
            jy0.alias("jy0"),
            jx0.alias("jx0"),
            jy1.alias("jy1"),
            jx1.alias("jx1"),
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
                        for dy in (0, 1)
                        for dx in (0, 1)
                    ]
                )
            ).alias("d"),
        )
        .select(
            "cy",
            "cx",
            "x",
            (F.col("jy0") + F.col("d.dy")).alias("ty"),
            (F.col("jx0") + F.col("d.dx")).alias("tx"),
            "jy1",
            "jx1",
        )
        .filter((F.col("ty") <= F.col("jy1")) & (F.col("tx") <= F.col("jx1")))
    )
    ovy = F.least(
        _RG_SRC * F.col("cy") + _RG_SRC, _RG_DST * F.col("ty") + _RG_DST
    ) - F.greatest(_RG_SRC * F.col("cy"), _RG_DST * F.col("ty"))
    ovx = F.least(
        _RG_SRC * F.col("cx") + _RG_SRC, _RG_DST * F.col("tx") + _RG_DST
    ) - F.greatest(_RG_SRC * F.col("cx"), _RG_DST * F.col("tx"))
    return (
        fan.select("ty", "tx", (F.col("x") * ovy * ovx).alias("w"))
        .groupBy("ty", "tx")
        .agg(F.sum("w").alias("num"))
        .select(
            "ty",
            "tx",
            "num",
            (F.col("num").cast("double") / float(_RG_SRC * _RG_SRC)).alias("val"),
        )
    )


# Morphological closing of the hot-cell mask ----------------------------------------


@register(
    "morph_close",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s
      FROM cells
    ),
    occ AS (
      SELECT cy, cx FROM cells CROSS JOIN g WHERE x * g.n > g.s
    ),
    d(dy, dx) AS (
      SELECT a.dy, b.dx
      FROM (VALUES (-1), (0), (1)) a(dy), (VALUES (-1), (0), (1)) b(dx)
    ),
    dil AS (
      SELECT DISTINCT o.cy + d.dy AS cy, o.cx + d.dx AS cx
      FROM occ o CROSS JOIN d
    ),
    nb AS (
      SELECT a.cy + d.dy AS cy, a.cx + d.dx AS cx FROM dil a CROSS JOIN d
    ),
    clo AS (SELECT cy, cx FROM nb GROUP BY 1, 2 HAVING count(*) = 9)
    SELECT clo.cy, clo.cx, (o.cy IS NOT NULL) AS was_in_mask
    FROM clo LEFT JOIN occ o ON o.cy = clo.cy AND o.cx = clo.cx
    """,
    doc=(
        "binary morphological CLOSING (3x3 dilation then 3x3 erosion) of "
        "the above-mean-density mask (x * n_cells > total — integer-exact "
        "and scale-free): one-cell gaps and pinholes between hot cells "
        "fill, isolated specks survive unchanged — the raster-algebra "
        "gap-filler between detection masks and vectorization "
        "(grid_contour / fire_perimeters). Closing rather than opening "
        "because this corpus's hot mask is speck-structured: a 3x3 "
        "erosion-first pass is empty at every sf, while closing exercises "
        "both passes non-trivially. was_in_mask separates filled cells "
        "from original mask cells"
    ),
)
def morph_close(spark, sf_dir):
    """Two cover passes on the cell lattice: dilation = kRing-1 explode ->
    distinct; erosion = kRing-1 explode of the dilated set -> ONE
    partial-agg groupBy, keep count == 9 (all nine positions dilated,
    self included). The mean gate is a one-row broadcast; everything
    integer, bounded by inhabited cells x 9."""
    cells = _persist_evict(_cell_counts(spark, sf_dir))
    g = cells.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    occ = _persist_evict(
        cells.crossJoin(F.broadcast(g))
        .filter(F.col("x") * F.col("n") > F.col("s"))
        .select("cy", "cx")
    )
    dil = _ring_explode(
        occ, F.col("cy"), F.col("cx"), [], radius=1, names=("cy", "cx")
    ).distinct()
    nb = _ring_explode(
        dil, F.col("cy"), F.col("cx"), [], radius=1, names=("cy", "cx")
    )
    clo = (
        nb.groupBy("cy", "cx")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") == 9)
        .select("cy", "cx")
    )
    return clo.join(
        occ.withColumn("_o", F.lit(True)), ["cy", "cx"], "left"
    ).select("cy", "cx", F.coalesce(F.col("_o"), F.lit(False)).alias("was_in_mask"))


# Two-step floating catchment area (2SFCA) -------------------------------------------

_SF_K = 12  # facilities = the K densest cells (the huff_gravity notion)
_SF_R = 2  # catchment radius, Chebyshev cells


@register(
    "two_sfca",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    fac AS (
      SELECT cy AS fcy, cx AS fcx, x AS supply
      FROM cells ORDER BY x DESC, cy, cx LIMIT {_SF_K}
    ),
    r AS (
      SELECT f.fcy, f.fcx,
             CAST(round(1000000.0 * f.supply / sum(c.x), 0) AS BIGINT)
               AS r_micro
      FROM fac f JOIN cells c
        ON abs(c.cy - f.fcy) <= {_SF_R} AND abs(c.cx - f.fcx) <= {_SF_R}
      GROUP BY f.fcy, f.fcx, f.supply
    ),
    acc AS (
      SELECT c.cy, c.cx,
             CAST(count(*) AS BIGINT) AS n_fac,
             CAST(sum(r.r_micro) AS BIGINT) AS a_micro
      FROM cells c JOIN r
        ON abs(c.cy - r.fcy) <= {_SF_R} AND abs(c.cx - r.fcx) <= {_SF_R}
      GROUP BY c.cy, c.cx
    )
    SELECT cy, cx, n_fac, a_micro / 1000000.0 AS access
    FROM acc
    """,
    doc=(
        f"two-step floating catchment area (2SFCA) accessibility: step 1 "
        f"computes each facility's supply/demand ratio over its Chebyshev-"
        f"{_SF_R} catchment (facilities = the {_SF_K} densest cells, "
        "supply = their count); step 2 sums the ratios of every facility "
        "within reach of each inhabited cell — the healthcare/service-"
        "accessibility primitive beside huff_gravity. Ratios are snapped "
        "to integer MICRO-units before the step-2 sum, so the final "
        "accessibility is an exact integer sum at any parallelism"
    ),
)
def two_sfca(spark, sf_dir):
    """Step 1 is a broadcast-facility cover join folded to K rows; step 2
    ring-explodes the K-row ratio frame (constant 25x) and equi-joins the
    cell frame — both shuffles bounded by inhabited cells; the only float
    op is one division per facility, snapped to micro-units so step 2's
    sum is order-free."""
    cells = _persist_evict(_cell_counts(spark, sf_dir))
    fac = (
        cells.orderBy(F.col("x").desc(), "cy", "cx")
        .limit(_SF_K)
        .select(
            F.col("cy").alias("fcy"),
            F.col("cx").alias("fcx"),
            F.col("x").alias("supply"),
        )
    )
    fcover = _ring_explode(
        fac,
        F.col("fcy"),
        F.col("fcx"),
        [F.col("fcy").alias("ofy"), F.col("fcx").alias("ofx"), "supply"],
        radius=_SF_R,
        names=("cy", "cx"),
    )
    r = (
        cells.join(F.broadcast(fcover), ["cy", "cx"])
        .groupBy("ofy", "ofx", "supply")
        .agg(F.sum("x").alias("demand"))
        .select(
            F.col("ofy").alias("fcy"),
            F.col("ofx").alias("fcx"),
            F.round(1e6 * F.col("supply") / F.col("demand"), 0)
            .cast("long")
            .alias("r_micro"),
        )
    )
    rcover = _ring_explode(
        r,
        F.col("fcy"),
        F.col("fcx"),
        ["r_micro"],
        radius=_SF_R,
        names=("cy", "cx"),
    )
    return (
        cells.join(F.broadcast(rcover), ["cy", "cx"])
        .groupBy("cy", "cx")
        .agg(
            F.count(F.lit(1)).alias("n_fac"),
            F.sum("r_micro").alias("a_micro"),
        )
        .select(
            "cy",
            "cx",
            "n_fac",
            (F.col("a_micro") / F.lit(1e6)).alias("access"),
        )
    )


# Exact-moment OLS trend per event type ----------------------------------------------

# ms offset origin so the 128-bit moment sums keep headroom (see doc)
_OLS_T0 = "TIMESTAMP '2024-01-01'"


@register(
    "ols_trend",
    f"""
    WITH b AS (
      SELECT event_type,
             epoch_ms(ts) - epoch_ms({_OLS_T0}) AS t,
             CAST(round(value * 100, 0) AS BIGINT) AS y
      FROM events
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(t AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(sum(CAST(t AS HUGEINT) * CAST(t AS HUGEINT)) AS HUGEINT) AS sxx,
             CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS syy,
             CAST(sum(CAST(t AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS sxy
      FROM b GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) * 864000.0, 6)
             AS slope_per_day,
           round((CAST(sy AS DOUBLE)
                  - CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) / 100.0, 6) AS intercept,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 * CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
    FROM m
    """,
    doc=(
        "per-event-type OLS trend of value vs time with EXACT integer "
        "moments: t in ms from a fixed 2024-01-01 origin, y in cents, all "
        "five moment sums 128-bit (Spark DECIMAL(38,0) / DuckDB HUGEINT) "
        "so n*Sxy - Sx*Sy and n*Sxx - Sx^2 are exact before the single "
        "double division — slope (value units/day), intercept (value "
        "units at the origin), and r^2 are parallelism-independent; the "
        "origin offset keeps n*Sxx inside 2^127 out to ~1e9 rows/type at "
        "this corpus's 4-month span (beyond that, center per partition "
        "and merge — the std_ellipse scaling note)"
    ),
)
def ols_trend(spark, sf_dir):
    """ONE partial-agg shuffle on event_type; per-type state is 6 numbers.
    The regression algebra runs on the aggregated O(|types|) frame —
    nothing after the first exchange grows with the corpus (the
    std_ellipse discipline applied to the time axis)."""
    ev = _t(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    b = ev.select(
        "event_type",
        (
            F.unix_millis(F.col("ts").cast("timestamp"))
            - F.unix_millis(F.lit("2024-01-01").cast("timestamp"))
        ).alias("t"),
        F.round(F.col("value") * 100, 0).cast("long").alias("y"),
    )
    t, y = F.col("t").cast(d38), F.col("y").cast(d38)
    m = b.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(t).cast(d38).alias("sx"),
        F.sum(y).cast(d38).alias("sy"),
        F.sum(t * t).cast(d38).alias("sxx"),
        F.sum(y * y).cast(d38).alias("syy"),
        F.sum(t * y).cast(d38).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope = num / den
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(slope * 864000.0, 6).alias("slope_per_day"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double")
            / 100.0,
            6,
        ).alias("intercept"),
        F.round(num * num / (den * deny), 6).alias("r2"),
    )


# Pointwise mutual information between co-occurring event types ----------------------


@register(
    "pmi_pairs",
    """
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM events),
    m AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS c FROM ut GROUP BY 1
    ),
    pr AS (
      SELECT a.event_type AS t1, b.event_type AS t2,
             CAST(count(*) AS BIGINT) AS c_ab
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT t1, t2, c_ab,
           round(CAST(n.n * c_ab AS DOUBLE) / (m1.c * m2.c), 6) AS lift,
           round(ln(CAST(n.n * c_ab AS DOUBLE) / (m1.c * m2.c)), 6) AS pmi
    FROM pr
    JOIN m m1 ON m1.event_type = pr.t1
    JOIN m m2 ON m2.event_type = pr.t2
    CROSS JOIN n
    """,
    doc=(
        "pointwise mutual information between event types co-occurring in "
        "the same user's history: PMI = ln(N * c_ab / (c_a * c_b)) over "
        "distinct (user, type) pairs — the association-mining read-off "
        "(basket analysis, feature co-occurrence for tokenizer/vocab "
        "design) beside colocation_patterns' spatial version; counts stay "
        "integer until one ln per O(|types|^2) output row"
    ),
)
def pmi_pairs(spark, sf_dir):
    """distinct (user, type) -> per-user self-equi-join (fan-out bounded
    by |types|^2 per user) -> partial-agg groupBy on the pair key;
    marginals and N are broadcast. The token-stream shuffle happens once
    (the distinct); everything pairwise rides frames bounded by
    |types|^2."""
    ev = _t(spark, sf_dir, "events")
    ut = _persist_evict(ev.select("user_id", "event_type").distinct())
    n = ut.select(F.countDistinct("user_id").alias("n"))
    m = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    pr = (
        ut.alias("a")
        .join(ut.alias("b"), "user_id")
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("t1"), F.col("b.event_type").alias("t2")
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    m1 = m.select(F.col("event_type").alias("t1"), F.col("c").alias("c1"))
    m2 = m.select(F.col("event_type").alias("t2"), F.col("c").alias("c2"))
    ratio = (F.col("n") * F.col("c_ab")).cast("double") / (
        F.col("c1") * F.col("c2")
    )
    return (
        pr.join(F.broadcast(m1), "t1")
        .join(F.broadcast(m2), "t2")
        .crossJoin(F.broadcast(n))
        .select(
            "t1",
            "t2",
            "c_ab",
            F.round(ratio, 6).alias("lift"),
            F.round(F.log(ratio), 6).alias("pmi"),
        )
    )


# Nearest-facility distance field ----------------------------------------------------


@register(
    "nearest_facility_dist",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    fac AS (
      SELECT cy AS fcy, cx AS fcx
      FROM cells ORDER BY x DESC, cy, cx LIMIT {_SF_K}
    ),
    d AS (
      SELECT c.cy, c.cx, f.fcy, f.fcx,
             (c.cy - f.fcy) * (c.cy - f.fcy)
             + (c.cx - f.fcx) * (c.cx - f.fcx) AS d2
      FROM cells c CROSS JOIN fac f
    )
    SELECT cy, cx, fcy, fcx, d2,
           round(sqrt(CAST(d2 AS DOUBLE)) * {_GI_CELL!r}, 6) AS dist_deg
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY cy, cx ORDER BY d2, fcy, fcx) AS rk
      FROM d
    ) WHERE rk = 1
    """,
    doc=(
        f"nearest-facility distance field: for every inhabited cell, the "
        f"closest of the {_SF_K} densest cells (squared integer cell "
        "distance, ties by facility coordinates) and the distance in "
        "degrees — the allocation / service-gap read-off beside "
        "two_sfca's accessibility and huff_gravity's probabilities; "
        "the same K-facility broadcast all three share"
    ),
)
def nearest_facility_dist(spark, sf_dir):
    """TakeOrdered K-row facility frame broadcast against the cell frame
    (O(cells x K), never points), ONE window on the (cy, cx) key for the
    argmin — d2 is an exact integer so the tie-break is total and
    parallelism-independent; sqrt is the only float op, per output row."""
    cells = _persist_evict(_cell_counts(spark, sf_dir))
    fac = (
        cells.orderBy(F.col("x").desc(), "cy", "cx")
        .limit(_SF_K)
        .select(F.col("cy").alias("fcy"), F.col("cx").alias("fcx"))
    )
    d2 = (F.col("cy") - F.col("fcy")) * (F.col("cy") - F.col("fcy")) + (
        F.col("cx") - F.col("fcx")
    ) * (F.col("cx") - F.col("fcx"))
    d = cells.crossJoin(F.broadcast(fac)).select(
        "cy", "cx", "fcy", "fcx", d2.alias("d2")
    )
    wk = Window.partitionBy("cy", "cx").orderBy("d2", "fcy", "fcx")
    return (
        d.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") == 1)
        .select(
            "cy",
            "cx",
            "fcy",
            "fcx",
            "d2",
            F.round(F.sqrt(F.col("d2").cast("double")) * _GI_CELL, 6).alias(
                "dist_deg"
            ),
        )
    )


# Directional (anisotropic) semivariogram --------------------------------------------

_DV_R = 3  # max lag along each principal direction


@register(
    "directional_variogram",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    pr AS (
      SELECT CASE WHEN b.cy = a.cy THEN 'EW'
                  WHEN b.cx = a.cx THEN 'NS'
                  WHEN b.cy - a.cy = b.cx - a.cx THEN 'NE'
                  ELSE 'NW' END AS dir,
             greatest(abs(b.cy - a.cy), abs(b.cx - a.cx)) AS lag,
             CAST(a.x - b.x AS HUGEINT) * CAST(a.x - b.x AS HUGEINT) AS sq
      FROM cells a JOIN cells b
        ON abs(a.cy - b.cy) <= {_DV_R} AND abs(a.cx - b.cx) <= {_DV_R}
       AND (b.cy > a.cy OR (b.cy = a.cy AND b.cx > a.cx))
       AND (b.cy = a.cy OR b.cx = a.cx
            OR abs(b.cy - a.cy) = abs(b.cx - a.cx))
    )
    SELECT dir, lag,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(CAST(sum(sq) AS DOUBLE) / (2.0 * CAST(count(*) AS DOUBLE)), 6)
             AS gamma
    FROM pr GROUP BY dir, lag
    """,
    doc=(
        f"directional semivariogram along the four principal lattice "
        f"directions (E-W, N-S, NE, NW) at lags 1..{_DV_R}: gamma(dir, h) "
        "over axis-/diagonal-aligned cell pairs only — the anisotropy "
        "read-off that empirical_variogram's omnidirectional gamma "
        "cannot give (range differing by direction = drifted plume / "
        "coastline structure); squared differences ride 128-bit integers "
        "(the empirical_variogram treatment), one double division per "
        "(dir, lag)"
    ),
)
def directional_variogram(spark, sf_dir):
    """The empirical_variogram cover (persisted cell frame, kRing-3
    explode, forward-gate equi-join) with an alignment filter and a
    (dir, lag) partial-agg — bounded by inhabited cells x 25 aligned
    offsets; exact integer sums until one division per output row."""
    cells = _persist_evict(_cell_counts(spark, sf_dir))
    right = _ring_explode(
        cells,
        F.col("cy"),
        F.col("cx"),
        [
            F.col("cy").alias("bcy"),
            F.col("cx").alias("bcx"),
            F.col("x").alias("bx_"),
        ],
        radius=_DV_R,
        names=("cy", "cx"),
    )
    dy = F.col("bcy") - F.col("cy")
    dx = F.col("bcx") - F.col("cx")
    diff = F.col("x") - F.col("bx_")
    pr = (
        cells.join(right, ["cy", "cx"])
        .filter(
            (
                (F.col("bcy") > F.col("cy"))
                | ((F.col("bcy") == F.col("cy")) & (F.col("bcx") > F.col("cx")))
            )
            & (
                (F.col("bcy") == F.col("cy"))
                | (F.col("bcx") == F.col("cx"))
                | (F.abs(dy) == F.abs(dx))
            )
        )
        .select(
            F.when(F.col("bcy") == F.col("cy"), F.lit("EW"))
            .when(F.col("bcx") == F.col("cx"), F.lit("NS"))
            .when(dy == dx, F.lit("NE"))
            .otherwise(F.lit("NW"))
            .alias("dir"),
            F.greatest(F.abs(dy), F.abs(dx)).alias("lag"),
            (diff.cast("decimal(19,0)") * diff.cast("decimal(19,0)")).alias("sq"),
        )
    )
    return (
        pr.groupBy("dir", "lag")
        .agg(F.count(F.lit(1)).alias("n_pairs"), F.sum("sq").alias("ssq"))
        .select(
            "dir",
            "lag",
            "n_pairs",
            F.round(
                F.col("ssq").cast("double") / (2.0 * F.col("n_pairs").cast("double")),
                6,
            ).alias("gamma"),
        )
    )


# HITS hubs / authorities -------------------------------------------------------------

_HITS_ITERS = 3


def _hits_oracle_sql() -> str:
    """HITS unrolled into chained CTEs — the pagerank-oracle pattern: same
    float ops, sum-order drift absorbed by the final 6-dp round; the only
    normalization is a max (order-independent) at the end."""
    head = f"""
    WITH e AS (
      SELECT DISTINCT l_orderkey % {_PR_N} AS src, l_partkey % {_PR_N} AS dst
      FROM lineitem
    ),
    nodes AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION SELECT dst FROM e)),
    a0 AS (SELECT v, 1.0 AS a FROM nodes)"""
    steps = []
    for k in range(1, _HITS_ITERS + 1):
        steps.append(f"""
    h{k} AS (
      SELECT n.v, coalesce(sum(p.a), 0.0) AS h
      FROM nodes n
      LEFT JOIN e ON e.src = n.v
      LEFT JOIN a{k - 1} p ON p.v = e.dst
      GROUP BY n.v
    ),
    a{k} AS (
      SELECT n.v, coalesce(sum(q.h), 0.0) AS a
      FROM nodes n
      LEFT JOIN e ON e.dst = n.v
      LEFT JOIN h{k} q ON q.v = e.src
      GROUP BY n.v
    )""")
    k = _HITS_ITERS
    return (
        head
        + ","
        + ",".join(steps)
        + f""",
    mx AS (
      SELECT (SELECT max(a) FROM a{k}) AS ma, (SELECT max(h) FROM h{k}) AS mh
    )
    SELECT a{k}.v AS node,
           round(a{k}.a / mx.ma, 6) AS auth,
           round(h{k}.h / mx.mh, 6) AS hub
    FROM a{k} JOIN h{k} ON h{k}.v = a{k}.v CROSS JOIN mx"""
    )


@register(
    "hits_scores",
    _hits_oracle_sql(),
    doc=(
        f"HITS hubs-and-authorities ({_HITS_ITERS} rounds, max-"
        "normalized) over the order->part graph — the second eigenvector-"
        "style iterative op beside pagerank: authorities = parts many "
        "strong hub orders reference, hubs = orders referencing strong "
        "authorities; normalization is by the MAX score (order-"
        "independent, unlike an L1 sum) so the only nondeterminism is "
        "per-node sum association, absorbed by the 6-dp round"
    ),
)
def hits_scores(spark, sf_dir):
    """The pagerank loop shape: per round two equi-join + partial-agg
    groupBy passes (contributions shuffle, never the graph), edge and
    node frames persisted across rounds; the final max-normalizer is a
    one-row broadcast. 3 static rounds stay under the localCheckpoint
    plan-size threshold (see dup_components for the long-loop form)."""
    li = _t(spark, sf_dir, "lineitem")
    e = _persist_evict(
        li.select(
            (F.col("l_orderkey") % _PR_N).alias("src"),
            (F.col("l_partkey") % _PR_N).alias("dst"),
        ).distinct()
    )
    nodes = _persist_evict(
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
    )
    a = nodes.select("v", F.lit(1.0).alias("a"))
    for _ in range(_HITS_ITERS):
        # contributions shuffle only (the pagerank shape): join the edge
        # frame against the score frame on the score's key, partial-agg to
        # the other endpoint, then left-join back to the node set
        hc = (
            e.join(a.select(F.col("v").alias("dst"), "a"), "dst")
            .groupBy("src")
            .agg(F.sum("a").alias("hs"))
        )
        h = nodes.join(hc, nodes.v == hc.src, "left").select(
            "v", F.coalesce(F.col("hs"), F.lit(0.0)).alias("h")
        )
        ac = (
            e.join(h.select(F.col("v").alias("src"), "h"), "src")
            .groupBy("dst")
            .agg(F.sum("h").alias("as_"))
        )
        a = nodes.join(ac, nodes.v == ac.dst, "left").select(
            "v", F.coalesce(F.col("as_"), F.lit(0.0)).alias("a")
        )
    mx = a.agg(F.max("a").alias("ma")).crossJoin(
        h.agg(F.max("h").alias("mh"))
    )
    return (
        a.join(h, "v")
        .crossJoin(F.broadcast(mx))
        .select(
            F.col("v").alias("node"),
            F.round(F.col("a") / F.col("ma"), 6).alias("auth"),
            F.round(F.col("h") / F.col("mh"), 6).alias("hub"),
        )
    )


# Seasonal (hour-of-day) residual z-scores --------------------------------------------


@register(
    "seasonal_residuals",
    """
    WITH b AS (
      SELECT event_id, event_type, hour(ts) AS hr,
             CAST(round(value * 100, 0) AS BIGINT) AS y
      FROM events
    ),
    m AS (
      SELECT event_type, hr,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS s,
             CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT)
               AS ss
      FROM b GROUP BY event_type, hr
    )
    SELECT b.event_id, b.event_type, b.hr,
           round((b.y - CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE))
                 / sqrt(CAST(m.n * m.ss - m.s * m.s AS DOUBLE)
                        / (CAST(m.n AS DOUBLE) * CAST(m.n - 1 AS DOUBLE))), 6)
             AS z
    FROM b JOIN m ON m.event_type = b.event_type AND m.hr = b.hr
    WHERE m.n >= 2 AND m.n * m.ss > m.s * m.s
    """,
    doc=(
        "seasonal anomaly z-scores: per-event deviation from the "
        "(event_type, hour-of-day) baseline in sample-sd units — the "
        "seasonal-naive residual screen (what is unusual FOR 3am, not "
        "globally) feeding alerting/changepoint; moments in cents are "
        "128-bit exact so mean and variance are parallelism-independent "
        "before the one division+sqrt per group; degenerate groups "
        "(n < 2 or zero variance) filtered identically on both engines"
    ),
)
def seasonal_residuals(spark, sf_dir):
    """ONE partial-agg shuffle builds the O(|types| x 24) baseline, then
    a broadcast join back to the event stream — per-event math is pure
    column algebra (map-side); the z is exact-until-rounded because the
    group moments are 128-bit integers."""
    ev = _t(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    b = ev.select(
        "event_id",
        "event_type",
        F.hour("ts").alias("hr"),
        F.round(F.col("value") * 100, 0).cast("long").alias("y"),
    )
    y = F.col("y").cast(d38)
    m = b.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(y).cast(d38).alias("s"),
        F.sum(y * y).cast(d38).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    var = (F.col("n") * F.col("ss") - F.col("s") * F.col("s")).cast("double") / (
        F.col("n").cast("double") * (F.col("n") - 1).cast("double")
    )
    return (
        b.join(F.broadcast(m), ["event_type", "hr"])
        .filter(
            (F.col("n") >= 2)
            & (F.col("n") * F.col("ss") > F.col("s") * F.col("s"))
        )
        .select(
            "event_id",
            "event_type",
            "hr",
            F.round((F.col("y") - mean) / F.sqrt(var), 6).alias("z"),
        )
    )


# Vocabulary pruning table -------------------------------------------------------------


@register(
    "vocab_prune",
    """
    WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    tf AS (
      SELECT term,
             CAST(count(*) AS BIGINT) AS tf,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents)
      GROUP BY term
    )
    SELECT term, df, tf,
           round(ln(CAST(n.n AS DOUBLE) / df), 6) AS idf,
           CASE WHEN 2 * df >= n.n THEN 'stop'
                WHEN df <= 2 THEN 'rare'
                ELSE 'keep' END AS class
    FROM tf CROSS JOIN n
    """,
    doc=(
        "vocabulary pruning table: per-term document frequency, total "
        "frequency, idf, and the keep/stop/rare decision (stop if the "
        "term hits >= half the corpus, rare if df <= 2 — both integer "
        "compares) — the vocab-construction step before tokenizer "
        "training / tfidf feature selection; one ln per VOCABULARY row, "
        "never per token"
    ),
)
def vocab_prune(spark, sf_dir):
    """Tokenize map-side -> ONE groupBy on the term key carrying both the
    plain count and the distinct-doc count (two-phase partial agg); the
    corpus size is a one-row broadcast. Token stream shuffled once;
    output bounded by vocabulary size."""
    d = _t(spark, sf_dir, "documents")
    n = d.agg(F.count(F.lit(1)).alias("n"))
    tf = (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
    )
    return tf.crossJoin(F.broadcast(n)).select(
        "term",
        "df",
        "tf",
        F.round(F.log(F.col("n").cast("double") / F.col("df")), 6).alias("idf"),
        F.when(2 * F.col("df") >= F.col("n"), F.lit("stop"))
        .when(F.col("df") <= 2, F.lit("rare"))
        .otherwise(F.lit("keep"))
        .alias("class"),
    )


# Adamic-Adar / resource-allocation link prediction ---------------------------------


@register(
    "adamic_adar",
    f"""
    WITH e0 AS (
      SELECT DISTINCT
             least(l_orderkey % {_CN_N}, l_partkey % {_CN_N}) AS u,
             greatest(l_orderkey % {_CN_N}, l_partkey % {_CN_N}) AS v
      FROM lineitem
      WHERE l_linenumber = 1
        AND l_orderkey % {_CN_N} <> l_partkey % {_CN_N}
    ),
    adj AS (SELECT u AS x, v AS y FROM e0 UNION ALL SELECT v, u FROM e0),
    deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY x),
    wz AS (
      SELECT a.x AS u, b.x AS v, a.y AS z
      FROM adj a JOIN adj b ON a.y = b.y AND a.x < b.x
    ),
    sc AS (
      SELECT wz.u, wz.v, CAST(count(*) AS BIGINT) AS cn,
             sum(1.0 / ln(CAST(d.d AS DOUBLE))) AS aa_raw,
             sum(1.0 / CAST(d.d AS DOUBLE)) AS ra_raw
      FROM wz JOIN deg d ON d.x = wz.z
      GROUP BY 1, 2
    )
    SELECT sc.u, sc.v, sc.cn,
           round(sc.aa_raw, 6) AS adamic_adar,
           round(sc.ra_raw, 6) AS resource_alloc
    FROM sc
    LEFT JOIN e0 ON e0.u = sc.u AND e0.v = sc.v
    WHERE e0.u IS NULL AND sc.cn >= 2
    """,
    doc=(
        "Adamic-Adar + resource-allocation link prediction over the "
        "common_neighbors graph: for every NON-adjacent pair with >= 2 "
        "shared neighbors, AA = sum_z 1/ln(deg z) and RA = sum_z 1/deg z "
        "— the degree-weighted upgrades of the raw common-neighbor count "
        "(a shared HUB is weak evidence; a shared leaf is strong). Every "
        "wedge center z has deg >= 2 by construction, so ln(deg) > 0; "
        "per-wedge terms are identical doubles on both engines and only "
        "their per-pair sum is float"
    ),
)
def adamic_adar(spark, sf_dir):
    """The common_neighbors wedge join carrying the shared-neighbor id z
    through to a broadcast degree lookup (O(nodes) frame), then ONE
    partial-agg shuffle on the (u, v) pair key accumulating count + both
    weighted sums in the same pass; anti join removes existing edges.
    Hub mitigation at 100 TB is the same degree cap common_neighbors
    documents — drop z above a deg threshold before the wedge join."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    e0 = (
        li.select(
            (F.col("l_orderkey") % _CN_N).alias("a"),
            (F.col("l_partkey") % _CN_N).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )
    e0 = _persist_evict(e0)
    adj = e0.select(F.col("u").alias("x"), F.col("v").alias("y")).unionAll(
        e0.select(F.col("v").alias("x"), F.col("u").alias("y"))
    )
    adj = _persist_evict(adj)
    deg = adj.groupBy("x").agg(F.count(F.lit(1)).alias("d"))
    degz = deg.select(F.col("x").alias("z"), F.col("d").alias("dz"))
    wz = (
        adj.alias("a")
        .join(adj.alias("b"), F.col("a.y") == F.col("b.y"))
        .filter(F.col("a.x") < F.col("b.x"))
        .select(
            F.col("a.x").alias("u"), F.col("b.x").alias("v"), F.col("a.y").alias("z")
        )
    )
    sc = (
        wz.join(F.broadcast(degz), "z")
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.sum(1.0 / F.log(F.col("dz").cast("double"))).alias("aa_raw"),
            F.sum(1.0 / F.col("dz").cast("double")).alias("ra_raw"),
        )
    )
    return (
        sc.join(e0, ["u", "v"], "left_anti")
        .filter(F.col("cn") >= 2)
        .select(
            "u",
            "v",
            "cn",
            F.round("aa_raw", 6).alias("adamic_adar"),
            F.round("ra_raw", 6).alias("resource_alloc"),
        )
    )


# Radiation model (parameter-free spatial interaction) -------------------------------


@register(
    "radiation_model",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    fac AS (
      SELECT cy AS fcy, cx AS fcx, CAST(x AS BIGINT) AS m
      FROM cells ORDER BY x DESC, cy, cx LIMIT {_SF_K}
    ),
    pr AS (
      SELECT i.fcy AS icy, i.fcx AS icx, i.m AS mi,
             j.fcy AS jcy, j.fcx AS jcx, j.m AS mj,
             (j.fcy - i.fcy) * (j.fcy - i.fcy)
             + (j.fcx - i.fcx) * (j.fcx - i.fcx) AS d2
      FROM fac i JOIN fac j ON NOT (i.fcy = j.fcy AND i.fcx = j.fcx)
    ),
    s AS (
      SELECT pr.icy, pr.icx, pr.jcy, pr.jcx, pr.mi, pr.mj, pr.d2,
             CAST(coalesce(sum(CASE
               WHEN (c.cy - pr.icy) * (c.cy - pr.icy)
                    + (c.cx - pr.icx) * (c.cx - pr.icx) < pr.d2
                AND NOT (c.cy = pr.icy AND c.cx = pr.icx)
                AND NOT (c.cy = pr.jcy AND c.cx = pr.jcx)
               THEN c.x ELSE 0 END), 0) AS BIGINT) AS s_ij
      FROM pr LEFT JOIN cells c ON TRUE
      GROUP BY 1, 2, 3, 4, 5, 6, 7
    )
    SELECT icy, icx, jcy, jcx, mi, mj, d2, s_ij,
           round(CAST(mi * mi * mj AS DOUBLE)
                 / CAST((mi + s_ij) * (mi + mj + s_ij) AS DOUBLE), 6) AS flow
    FROM s
    """,
    doc=(
        f"radiation model of spatial interaction (Simini et al. 2012): "
        f"between every ordered pair of the {_SF_K} densest cells, "
        "T_ij = m_i^2 m_j / ((m_i + s_ij)(m_i + m_j + s_ij)) where s_ij "
        "is the population inside the circle of radius d_ij around i "
        "(endpoints excluded) — the PARAMETER-FREE third member of the "
        "interaction family beside huff_gravity (calibrated decay) and "
        "two_sfca (catchment ratios); populations and the circle sum are "
        "BIGINT-exact, one double division per pair"
    ),
)
def radiation_model(spark, sf_dir):
    """K-facility frame (TakeOrdered, one driver-safe row set) squared to
    K(K-1) ordered pairs, broadcast against the cell frame: the circle
    population is ONE conditional partial-agg pass over cells x pairs "
    (cells scanned once, fan-out K^2 = constant), never a point shuffle.
    Integer products fit BIGINT through sf1-scale counts; at genuinely
    unbounded cell masses the numerator is the one term to lift to
    DECIMAL(38,0) (the empirical_variogram treatment)."""
    cells = _persist_evict(_cell_counts(spark, sf_dir))
    fac = (
        cells.orderBy(F.col("x").desc(), "cy", "cx")
        .limit(_SF_K)
        .select(
            F.col("cy").alias("fcy"), F.col("cx").alias("fcx"), F.col("x").alias("m")
        )
    )
    i, j = fac.alias("i"), fac.alias("j")
    pr = (
        i.crossJoin(j)
        .filter(
            ~((F.col("i.fcy") == F.col("j.fcy")) & (F.col("i.fcx") == F.col("j.fcx")))
        )
        .select(
            F.col("i.fcy").alias("icy"),
            F.col("i.fcx").alias("icx"),
            F.col("i.m").alias("mi"),
            F.col("j.fcy").alias("jcy"),
            F.col("j.fcx").alias("jcx"),
            F.col("j.m").alias("mj"),
            (
                (F.col("j.fcy") - F.col("i.fcy")) * (F.col("j.fcy") - F.col("i.fcy"))
                + (F.col("j.fcx") - F.col("i.fcx"))
                * (F.col("j.fcx") - F.col("i.fcx"))
            ).alias("d2"),
        )
    )
    inside = (
        (F.col("cy") - F.col("icy")) * (F.col("cy") - F.col("icy"))
        + (F.col("cx") - F.col("icx")) * (F.col("cx") - F.col("icx"))
        < F.col("d2")
    ) & ~((F.col("cy") == F.col("icy")) & (F.col("cx") == F.col("icx"))) & ~(
        (F.col("cy") == F.col("jcy")) & (F.col("cx") == F.col("jcx"))
    )
    s = (
        cells.crossJoin(F.broadcast(pr))
        .groupBy("icy", "icx", "jcy", "jcx", "mi", "mj", "d2")
        .agg(
            F.coalesce(
                F.sum(F.when(inside, F.col("x")).otherwise(F.lit(0))), F.lit(0)
            )
            .cast("long")
            .alias("s_ij")
        )
    )
    return s.select(
        "icy",
        "icx",
        "jcy",
        "jcx",
        "mi",
        "mj",
        "d2",
        "s_ij",
        F.round(
            (F.col("mi") * F.col("mi") * F.col("mj")).cast("double")
            / (
                (F.col("mi") + F.col("s_ij"))
                * (F.col("mi") + F.col("mj") + F.col("s_ij"))
            ).cast("double"),
            6,
        ).alias("flow"),
    )


# Exponentially weighted moving average (fold semantics) -----------------------------

_EWMA_A = 0.25  # smoothing factor (exact binary double: 2^-2)


@register(
    "ewma_smooth",
    f"""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n,
           round(last(CAST(value AS DOUBLE) ORDER BY epoch_ms(ts), event_id), 6)
             AS last_v,
           round(list_reduce(
                   list(CAST(value AS DOUBLE) ORDER BY epoch_ms(ts), event_id),
                   (acc, x) -> {_EWMA_A!r} * x + {1.0 - _EWMA_A!r} * acc), 6)
             AS ewma
    FROM events GROUP BY user_id
    """,
    doc=(
        f"per-entity exponential smoothing with FOLD semantics: "
        f"ewma_k = {_EWMA_A} x_k + {1.0 - _EWMA_A} ewma_(k-1) seeded with "
        "the first observation, over the (ts, event_id)-ordered value "
        "stream — the streaming-state baseline (level tracking / anomaly "
        "denominators) evaluated batch-side; alpha = 2^-2 is an exact "
        "binary double and BOTH engines execute the identical "
        "sequential left fold (Spark aggregate(), DuckDB list_reduce()), "
        "so the result is bit-identical by construction, not by "
        "summation-order luck"
    ),
)
def ewma_smooth(spark, sf_dir):
    """ONE per-entity shuffle (groupBy collect_list) and everything else
    map-side: array_sort on the (t_ms, event_id) prefix gives the total
    per-user order, aggregate() folds it sequentially. Per-user history
    rides a single array — the sessionize partitioning contract (an
    entity's stream fits one task at any corpus scale); no window, no
    second exchange."""
    ev = _t(spark, sf_dir, "events")
    p = ev.select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
        "event_id",
        F.col("value").cast("double").alias("v"),
    )
    arr = p.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("t_ms", "event_id", "v"))).alias("a")
    )
    return arr.select(
        "user_id",
        F.size("a").cast("long").alias("n"),
        F.round(F.element_at(F.col("a"), -1)["v"], 6).alias("last_v"),
        F.round(
            F.expr(
                f"aggregate(slice(transform(a, s -> s.v), 2, size(a) - 1), "
                f"element_at(transform(a, s -> s.v), 1), "
                f"(acc, x) -> {_EWMA_A!r}D * x + {1.0 - _EWMA_A!r}D * acc)"
            ),
            6,
        ).alias("ewma"),
    )


# Discrete Hausdorff trajectory similarity -------------------------------------------

_TH_K = 40  # scored pair budget (top-K candidate pairs by co-visitation)

_TH_PTS_SQL = """
      SELECT DISTINCT user_id,
             (user_id % 120) * 1000
               + (CASE WHEN event_id % 13 < 4 THEN 2000 ELSE 0 END)
               + event_id % 7 AS iy,
             (user_id % 300) * 1000
               + (CASE WHEN event_id % 13 < 4 THEN 2000 ELSE 0 END)
               + event_id % 5 AS ix
      FROM events
"""


@register(
    "trajectory_hausdorff",
    f"""
    WITH pts AS ({_TH_PTS_SQL}),
    cellv AS (
      SELECT DISTINCT user_id, iy // 1000 AS qy, ix // 1000 AS qx FROM pts
    ),
    pairs AS (
      SELECT a.user_id AS u1, b.user_id AS u2, CAST(count(*) AS BIGINT) AS shared
      FROM cellv a JOIN cellv b
        ON a.qy = b.qy AND a.qx = b.qx AND a.user_id < b.user_id
      GROUP BY 1, 2
      ORDER BY shared DESC, u1, u2 LIMIT {_TH_K}
    ),
    dp AS (
      SELECT u1, u2, u1 AS ou, u2 AS tu FROM pairs
      UNION ALL
      SELECT u1, u2, u2 AS ou, u1 AS tu FROM pairs
    ),
    md AS (
      SELECT dp.u1, dp.u2, dp.ou, a.iy, a.ix,
             min((a.iy - b.iy) * (a.iy - b.iy)
                 + (a.ix - b.ix) * (a.ix - b.ix)) AS md2
      FROM dp
      JOIN pts a ON a.user_id = dp.ou
      JOIN pts b ON b.user_id = dp.tu
      GROUP BY 1, 2, 3, 4, 5
    ),
    h AS (
      SELECT u1, u2,
             CAST(max(CASE WHEN ou = u1 THEN md2 END) AS BIGINT) AS h_fwd,
             CAST(max(CASE WHEN ou = u2 THEN md2 END) AS BIGINT) AS h_rev
      FROM md GROUP BY 1, 2
    ),
    np AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM pts GROUP BY 1)
    SELECT p.u1, p.u2, p.shared, n1.n AS n1, n2.n AS n2,
           h.h_fwd, h.h_rev,
           greatest(h.h_fwd, h.h_rev) AS h_d2,
           round(sqrt(CAST(greatest(h.h_fwd, h.h_rev) AS DOUBLE)) / 1000.0, 6)
             AS hausdorff_deg
    FROM pairs p
    JOIN h ON h.u1 = p.u1 AND h.u2 = p.u2
    JOIN np n1 ON n1.user_id = p.u1
    JOIN np n2 ON n2.user_id = p.u2
    """,
    doc=(
        f"discrete symmetric Hausdorff distance between entity "
        f"trajectories: candidate pairs by shared visited grid cells "
        f"(top {_TH_K} by co-visitation count, integer-deterministic "
        "rank), then H(A,B) = max(h(A->B), h(B->A)) with "
        "h = max_a min_b d2 over the DISTINCT integer point sets — the "
        "track-similarity scorer (convoy / companion detection) beside "
        "knn_join's point kNN; every distance, min, and max is exact "
        "integer arithmetic, one sqrt per output pair"
    ),
)
def trajectory_hausdorff(spark, sf_dir):
    """Candidate generation is a cell-key equi-join on the distinct "
    (entity, cell) frame (never points x points across all entities) with
    an integer TakeOrdered pair budget; the exact stage is pairs x A x B
    with BOTH point frames persisted, one partial-agg min on the
    (pair, a-point) key and one max to the pair — per-pair cost bounded
    by the distinct-point-set product, with the pair budget as the
    degenerate-hot-cell cap (the dedup salting analogue)."""
    ev = _t(spark, sf_dir, "events")
    jump = F.when(F.col("event_id") % 13 < 4, F.lit(2000)).otherwise(F.lit(0))
    pts = _persist_evict(
        ev.select(
            "user_id",
            ((F.col("user_id") % 120) * 1000 + jump + F.col("event_id") % 7).alias(
                "iy"
            ),
            ((F.col("user_id") % 300) * 1000 + jump + F.col("event_id") % 5).alias(
                "ix"
            ),
        ).distinct()
    )
    cellv = pts.select(
        "user_id",
        F.floor(F.col("iy") / 1000).alias("qy"),
        F.floor(F.col("ix") / 1000).alias("qx"),
    ).distinct()
    pairs = (
        cellv.alias("a")
        .join(
            cellv.alias("b"),
            (F.col("a.qy") == F.col("b.qy"))
            & (F.col("a.qx") == F.col("b.qx"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(
            F.col("a.user_id").alias("u1"), F.col("b.user_id").alias("u2")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .orderBy(F.col("shared").desc(), "u1", "u2")
        .limit(_TH_K)
    )
    pairs = _persist_evict(pairs)
    dp = pairs.select(
        "u1", "u2", F.col("u1").alias("ou"), F.col("u2").alias("tu")
    ).unionAll(pairs.select("u1", "u2", F.col("u2").alias("ou"), F.col("u1").alias("tu")))
    a = pts.select(
        F.col("user_id").alias("ou"), F.col("iy").alias("aiy"), F.col("ix").alias("aix")
    )
    b = pts.select(
        F.col("user_id").alias("tu"), F.col("iy").alias("biy"), F.col("ix").alias("bix")
    )
    d2 = (F.col("aiy") - F.col("biy")) * (F.col("aiy") - F.col("biy")) + (
        F.col("aix") - F.col("bix")
    ) * (F.col("aix") - F.col("bix"))
    md = (
        F.broadcast(dp)
        .join(a, "ou")
        .join(b, "tu")
        .groupBy("u1", "u2", "ou", "aiy", "aix")
        .agg(F.min(d2).alias("md2"))
    )
    h = md.groupBy("u1", "u2").agg(
        F.max(F.when(F.col("ou") == F.col("u1"), F.col("md2")))
        .cast("long")
        .alias("h_fwd"),
        F.max(F.when(F.col("ou") == F.col("u2"), F.col("md2")))
        .cast("long")
        .alias("h_rev"),
    )
    np_ = pts.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    n1 = np_.select(F.col("user_id").alias("u1"), F.col("n").alias("n1"))
    n2 = np_.select(F.col("user_id").alias("u2"), F.col("n").alias("n2"))
    hd2 = F.greatest(F.col("h_fwd"), F.col("h_rev"))
    return (
        pairs.join(h, ["u1", "u2"])
        .join(F.broadcast(n1), "u1")
        .join(F.broadcast(n2), "u2")
        .select(
            "u1",
            "u2",
            "shared",
            "n1",
            "n2",
            "h_fwd",
            "h_rev",
            hd2.alias("h_d2"),
            F.round(F.sqrt(hd2.cast("double")) / 1000.0, 6).alias("hausdorff_deg"),
        )
    )


# Topographic wetness index ----------------------------------------------------------

_TWI_EPS = 0.000001  # slope floor for flat interior cells (exact decimal double)


@register(
    "twi",
    None,  # composed oracle assigned below (flow_accumulation x slope_aspect)
    doc=(
        "topographic wetness index ln(a / tan beta) over the density "
        "surface: contributing area a = 4-round D8 flow accumulation x "
        "cell width, tan beta = the Horn slope — the saturation/"
        "accumulation potential read-off composing the two verified "
        "terrain primitives exactly like hillshade composes slope_aspect "
        "(and emerging_hotspots composes Gi* + Mann-Kendall); the slope "
        "input is the 6-dp-rounded column itself so both engines feed ln "
        "identical doubles, flat cells floored at 1e-6"
    ),
)
def twi(spark, sf_dir):
    """Pure composition: flow_accumulation's contribution-shuffle rounds
    joined to slope_aspect's stencil on the cell key (both bounded by
    inhabited cells), one ln per interior cell. No new shuffle class."""
    fa = flow_accumulation(spark, sf_dir)
    sa = slope_aspect(spark, sf_dir).select("cy", "cx", "slope")
    return fa.join(sa, ["cy", "cx"]).select(
        "cy",
        "cx",
        "acc",
        "slope",
        F.round(
            F.log(
                F.col("acc").cast("double")
                * _GI_CELL
                / F.greatest(F.col("slope"), F.lit(_TWI_EPS))
            ),
            6,
        ).alias("twi"),
    )


REGISTRY["twi"].oracle = f"""
    WITH fa AS ({_fa_oracle_sql()}),
    sa AS ({{SA}})
    SELECT fa.cy, fa.cx, fa.acc, sa.slope,
           round(ln(CAST(fa.acc AS DOUBLE) * {_GI_CELL!r}
                    / greatest(sa.slope, {_TWI_EPS!r})), 6) AS twi
    FROM fa JOIN sa ON sa.cy = fa.cy AND sa.cx = fa.cx
    """.format(SA=REGISTRY["slope_aspect"].oracle)


# Label-propagation communities -------------------------------------------------------

_LP_ROUNDS = 4  # fixed synchronous rounds (the pagerank/flow_accumulation shape)


def _lp_oracle_sql() -> str:
    steps = []
    for k in range(1, _LP_ROUNDS + 1):
        steps.append(f"""
    c{k} AS (
      SELECT a.x, p.lbl, count(*) AS c
      FROM adj a JOIN l{k - 1} p ON p.x = a.y
      GROUP BY 1, 2
    ),
    l{k} AS (
      SELECT x, lbl FROM (
        SELECT x, lbl,
               row_number() OVER (PARTITION BY x ORDER BY c DESC, lbl) AS rn
        FROM c{k}
      ) WHERE rn = 1
    )""")
    return (
        f"""
    WITH e0 AS (
      SELECT DISTINCT
             least(l_orderkey % {_CN_N}, l_partkey % {_CN_N}) AS u,
             greatest(l_orderkey % {_CN_N}, l_partkey % {_CN_N}) AS v
      FROM lineitem
      WHERE l_linenumber = 1
        AND l_orderkey % {_CN_N} <> l_partkey % {_CN_N}
    ),
    adj AS (SELECT u AS x, v AS y FROM e0 UNION ALL SELECT v, u FROM e0),
    l0 AS (SELECT DISTINCT x, x AS lbl FROM adj),"""
        + ",".join(steps)
        + f""",
    sz AS (SELECT lbl, CAST(count(*) AS BIGINT) AS csize
           FROM l{_LP_ROUNDS} GROUP BY lbl)
    SELECT l.x, l.lbl, sz.csize
    FROM l{_LP_ROUNDS} l JOIN sz ON sz.lbl = l.lbl
    """
    )


@register(
    "label_propagation",
    _lp_oracle_sql(),
    doc=(
        f"synchronous label propagation ({_LP_ROUNDS} fixed rounds) over "
        "the common_neighbors graph: every node starts as its own label "
        "and each round adopts the MOST FREQUENT label among its "
        "neighbors (ties to the smallest label — a total integer order, "
        "so the result is parallelism- and engine-independent); emits the "
        "final label and its community size — the community-detection "
        "member of the graph family (dup_components is min-label "
        "CONNECTIVITY; this is majority-vote STRUCTURE: a bridge node "
        "joins the denser side, not just any reachable side)"
    ),
)
def label_propagation(spark, sf_dir):
    """Each round = ONE equi-join (adjacency x labels on the neighbor
    key) + a partial-agg groupBy on (node, label) + a per-node window
    argmax — the contributions-only loop shape of pagerank/"
    flow_accumulation (the shuffle carries label votes, never the
    graph); adjacency is persisted once, the label frame is O(nodes).
    At real horizons the loop adds localCheckpoint every few rounds
    (dup_components' plan-size control); 4 static rounds stay under it."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    e0 = (
        li.select(
            (F.col("l_orderkey") % _CN_N).alias("a"),
            (F.col("l_partkey") % _CN_N).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )
    adj = _persist_evict(
        e0.select(F.col("u").alias("x"), F.col("v").alias("y")).unionAll(
            e0.select(F.col("v").alias("x"), F.col("u").alias("y"))
        )
    )
    labels = adj.select("x").distinct().select("x", F.col("x").alias("lbl"))
    wk = Window.partitionBy("x").orderBy(F.col("c").desc(), "lbl")
    for _ in range(_LP_ROUNDS):
        votes = (
            adj.join(
                labels.select(F.col("x").alias("y"), "lbl"), "y"
            )
            .groupBy("x", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(wk))
            .filter(F.col("rn") == 1)
            .select("x", "lbl")
        )
    sz = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("csize"))
    return labels.join(F.broadcast(sz), "lbl").select("x", "lbl", "csize")


# Two-epoch raster change detection ----------------------------------------------------

_CD_HALF = _MK_BUCKETS // 2  # early epoch = buckets [0, half)


@register(
    "change_detection",
    f"""
    WITH {_MK_SERIES_SQL},
    cd AS (
      SELECT cy, cx,
             CAST(sum(CASE WHEN tb < {_CD_HALF} THEN x ELSE 0 END) AS BIGINT)
               AS early,
             CAST(sum(CASE WHEN tb >= {_CD_HALF} THEN x ELSE 0 END) AS BIGINT)
               AS late
      FROM series GROUP BY 1, 2
    )
    SELECT cy, cx, early, late, late - early AS delta,
           round(ln(CAST(late + 1 AS DOUBLE) / CAST(early + 1 AS DOUBLE)), 6)
             AS log_ratio,
           round(CAST(late - early AS DOUBLE)
                 / sqrt(CAST(late + early AS DOUBLE)), 6) AS z
    FROM cd
    """,
    doc=(
        "two-epoch raster change detection over the density surface: "
        "per-cell early/late counts (first vs last half of the corpus "
        "span), the add-one log ratio, and the Poisson difference z "
        "(late - early) / sqrt(late + early) — the burned-area / "
        "new-flare change screen beside mann_kendall's monotonic trend "
        "(a STEP change is exactly what a rank trend underweights); "
        "counts are BIGINT-exact, two float ops per cell on aggregated "
        "rows only"
    ),
)
def change_detection(spark, sf_dir):
    """Rides the _mk_series frame: ONE partial-agg shuffle to (cell) with
    both epoch sums as conditional aggregates in the same pass; the "
    log/sqrt run on the O(cells) rollup. No new shuffle class."""
    s = _mk_series(spark, sf_dir)
    cd = s.groupBy("cy", "cx").agg(
        F.sum(F.when(F.col("tb") < _CD_HALF, F.col("x")).otherwise(F.lit(0)))
        .cast("long")
        .alias("early"),
        F.sum(F.when(F.col("tb") >= _CD_HALF, F.col("x")).otherwise(F.lit(0)))
        .cast("long")
        .alias("late"),
    )
    return cd.select(
        "cy",
        "cx",
        "early",
        "late",
        (F.col("late") - F.col("early")).alias("delta"),
        F.round(
            F.log(
                (F.col("late") + 1).cast("double") / (F.col("early") + 1).cast("double")
            ),
            6,
        ).alias("log_ratio"),
        F.round(
            (F.col("late") - F.col("early")).cast("double")
            / F.sqrt((F.col("late") + F.col("early")).cast("double")),
            6,
        ).alias("z"),
    )


# Space-time scan statistic (Kulldorff LLR cylinders) ----------------------------------

_STS_MAXLEN = 4  # max cylinder length in time buckets
_STS_K = 25  # reported cylinders


@register(
    "space_time_scan",
    f"""
    WITH {_MK_SERIES_SQL},
    ctr AS (SELECT DISTINCT cy, cx FROM series),
    w AS (
      SELECT c.cy, c.cx, s.tb, CAST(sum(s.x) AS BIGINT) AS w
      FROM series s JOIN ctr c
        ON abs(c.cy - s.cy) <= 1 AND abs(c.cx - s.cx) <= 1
      GROUP BY 1, 2, 3
    ),
    wd AS (
      SELECT ts.s, tl.l
      FROM generate_series(1, {_STS_MAXLEN}) tl(l),
           generate_series(0, {_MK_BUCKETS - 1}) ts(s)
      WHERE ts.s + tl.l <= {_MK_BUCKETS}
    ),
    cyl AS (
      SELECT w.cy, w.cx, wd.s, wd.l, CAST(sum(w.w) AS BIGINT) AS c
      FROM w JOIN wd ON w.tb >= wd.s AND w.tb < wd.s + wd.l
      GROUP BY 1, 2, 3, 4
    ),
    st AS (SELECT cy, cx, CAST(sum(w) AS BIGINT) AS st FROM w GROUP BY 1, 2),
    tt AS (
      SELECT wd.s, wd.l, CAST(sum(se.x) AS BIGINT) AS tt
      FROM wd JOIN series se ON se.tb >= wd.s AND se.tb < wd.s + wd.l
      GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(x) AS BIGINT) AS c0 FROM series),
    sc AS (
      SELECT cyl.cy, cyl.cx, cyl.s, cyl.l, cyl.c,
             CAST(st.st AS DOUBLE) * tt.tt / c0 AS e, tot.c0
      FROM cyl
      JOIN st ON st.cy = cyl.cy AND st.cx = cyl.cx
      JOIN tt ON tt.s = cyl.s AND tt.l = cyl.l
      CROSS JOIN tot
    )
    SELECT cy, cx, s, l, c, round(e, 6) AS e, llr FROM (
      SELECT cy, cx, s, l, c, e,
             round(CASE WHEN CAST(c AS DOUBLE) > e THEN
               CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE) / e)
               + (CASE WHEN c < c0 THEN
                   CAST(c0 - c AS DOUBLE)
                   * ln(CAST(c0 - c AS DOUBLE) / (CAST(c0 AS DOUBLE) - e))
                  ELSE 0.0 END)
             ELSE 0.0 END, 6) AS llr
      FROM sc
    ) ORDER BY llr DESC, cy, cx, s, l LIMIT {_STS_K}
    """,
    doc=(
        f"space-time scan statistic (Kulldorff Poisson LLR) over the "
        f"density series: cylinders = ring-1 spatial window x 1.."
        f"{_STS_MAXLEN} consecutive time buckets, expected count "
        "e = (window's all-time total) x (epoch's all-space total) / N "
        "under independence, LLR = c ln(c/e) + (N-c) ln((N-c)/(N-e)) for "
        f"c > e — the outbreak/hotspot-emergence detector (top {_STS_K} "
        "by rounded LLR then integer keys, a total deterministic rank); "
        "every count is BIGINT-exact, e and the two ln terms are the "
        "only float ops and run on the aggregated cylinder frame"
    ),
)
def space_time_scan(spark, sf_dir):
    """The ring-1 cover explode (constant 9x, map-side) semi-joined to
    inhabited centers, ONE partial-agg to (center, bucket), a constant
    <= {(maxlen)x(buckets)} broadcast window table fanning each bucket "
    "to its covering cylinders, and ONE partial-agg to the cylinder key;
    space totals reuse the windowed frame, time totals and N are
    O(buckets^2)/O(1) broadcasts; top-K is TakeOrdered. No pair joins,
    no global windows; everything is bounded by inhabited cells x a
    constant."""
    s = _persist_evict(_mk_series(spark, sf_dir))
    ctr = s.select("cy", "cx").distinct()
    contrib = _ring_explode(
        s,
        F.col("cy"),
        F.col("cx"),
        [F.col("tb").alias("stb"), F.col("x").alias("sx")],
        radius=1,
        names=("cy", "cx"),
    )
    w = _persist_evict(
        contrib.join(ctr, ["cy", "cx"], "left_semi")
        .groupBy("cy", "cx", F.col("stb").alias("tb"))
        .agg(F.sum("sx").cast("long").alias("w"))
    )
    wd = spark.range(1, _STS_MAXLEN + 1).selectExpr("id AS l").crossJoin(
        spark.range(0, _MK_BUCKETS).selectExpr("id AS s")
    ).filter(F.col("s") + F.col("l") <= _MK_BUCKETS)
    cyl = (
        w.join(
            F.broadcast(wd),
            (F.col("tb") >= F.col("s")) & (F.col("tb") < F.col("s") + F.col("l")),
        )
        .groupBy("cy", "cx", "s", "l")
        .agg(F.sum("w").cast("long").alias("c"))
    )
    st = w.groupBy("cy", "cx").agg(F.sum("w").cast("long").alias("st"))
    tt = (
        s.join(
            F.broadcast(wd),
            (F.col("tb") >= F.col("s")) & (F.col("tb") < F.col("s") + F.col("l")),
        )
        .groupBy("s", "l")
        .agg(F.sum("x").cast("long").alias("tt"))
    )
    tot = s.agg(F.sum("x").cast("long").alias("c0"))
    e = F.col("st").cast("double") * F.col("tt") / F.col("c0")
    sc = (
        cyl.join(st, ["cy", "cx"])
        .join(F.broadcast(tt), ["s", "l"])
        .crossJoin(F.broadcast(tot))
        .select("cy", "cx", "s", "l", "c", e.alias("e"), "c0")
    )
    cd = F.col("c").cast("double")
    llr = F.round(
        F.when(
            cd > F.col("e"),
            cd * F.log(cd / F.col("e"))
            + F.when(
                F.col("c") < F.col("c0"),
                (F.col("c0") - F.col("c")).cast("double")
                * F.log(
                    (F.col("c0") - F.col("c")).cast("double")
                    / (F.col("c0").cast("double") - F.col("e"))
                ),
            ).otherwise(F.lit(0.0)),
        ).otherwise(F.lit(0.0)),
        6,
    )
    return (
        sc.select(
            "cy", "cx", "s", "l", "c", F.round("e", 6).alias("e"), llr.alias("llr")
        )
        .orderBy(F.col("llr").desc(), "cy", "cx", "s", "l")
        .limit(_STS_K)
    )


# Per-entity mobility metrics ----------------------------------------------------------


@register(
    "mobility_metrics",
    f"""
    WITH pts AS (
      SELECT user_id, epoch_ms(ts) AS t_ms, event_id,
             (user_id % 120) * 1000
               + (CASE WHEN event_id % 13 < 4 THEN 2000 ELSE 0 END)
               + event_id % 7 AS iy,
             (user_id % 300) * 1000
               + (CASE WHEN event_id % 13 < 4 THEN 2000 ELSE 0 END)
               + event_id % 5 AS ix
      FROM events
    ),
    legs AS (
      SELECT user_id, iy, ix,
             lag(iy) OVER w AS piy, lag(ix) OVER w AS pix,
             first_value(iy) OVER w AS fiy, first_value(ix) OVER w AS fix,
             last_value(iy) OVER (PARTITION BY user_id ORDER BY t_ms, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS liy,
             last_value(ix) OVER (PARTITION BY user_id ORDER BY t_ms, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lix
      FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY t_ms, event_id)
    ),
    agg AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n,
             CAST(coalesce(sum((iy - piy) * (iy - piy)
                               + (ix - pix) * (ix - pix)), 0) AS BIGINT)
               AS sum_step_d2,
             CAST(coalesce(max((iy - piy) * (iy - piy)
                               + (ix - pix) * (ix - pix)), 0) AS BIGINT)
               AS max_step_d2,
             CAST(max((liy - fiy) * (liy - fiy)
                      + (lix - fix) * (lix - fix)) AS BIGINT) AS net_d2,
             CAST(sum(iy) AS HUGEINT) AS sy, CAST(sum(ix) AS HUGEINT) AS sx,
             CAST(sum(CAST(iy AS HUGEINT) * iy + CAST(ix AS HUGEINT) * ix)
               AS HUGEINT) AS sqq
      FROM legs GROUP BY user_id
    )
    SELECT user_id, n, sum_step_d2, max_step_d2, net_d2,
           CAST(n * sqq - sy * sy - sx * sx AS BIGINT) AS rg2n,
           round(sqrt(CAST(n * sqq - sy * sy - sx * sx AS DOUBLE)) / n / 1000.0,
                 6) AS rg_deg
    FROM agg
    """,
    doc=(
        "per-entity mobility metrics over the integer trajectory: fix "
        "count, total/max squared step length (consecutive fixes in "
        "(ts, event_id) order), net squared displacement (first to "
        "last), and the radius of gyration via the exact moment identity "
        "n*sum|p|^2 - |sum p|^2 = n^2 rg^2 — the movement-ecology "
        "rollup (commuter vs explorer screen) beside stay_points' "
        "dwells and trajectory_hausdorff's pair similarity; every "
        "aggregate is 128-bit-integer exact (the ols_trend treatment), "
        "one sqrt per entity"
    ),
)
def mobility_metrics(spark, sf_dir):
    """ONE per-entity window exchange serves the lag legs and the "
    first/last frame (Catalyst reuses the sort), then ONE partial-agg "
    groupBy to the entity rollup. Moments ride DECIMAL(38,0) so rg is "
    exact-until-rounded at any per-entity history length; per-user "
    history fits a partition at any scale (the sessionize contract)."""
    ev = _t(spark, sf_dir, "events")
    jump = F.when(F.col("event_id") % 13 < 4, F.lit(2000)).otherwise(F.lit(0))
    pts = ev.select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
        "event_id",
        ((F.col("user_id") % 120) * 1000 + jump + F.col("event_id") % 7).alias("iy"),
        ((F.col("user_id") % 300) * 1000 + jump + F.col("event_id") % 5).alias("ix"),
    )
    w = Window.partitionBy("user_id").orderBy("t_ms", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    legs = pts.select(
        "user_id",
        "iy",
        "ix",
        F.lag("iy").over(w).alias("piy"),
        F.lag("ix").over(w).alias("pix"),
        F.first("iy").over(w).alias("fiy"),
        F.first("ix").over(w).alias("fix"),
        F.last("iy").over(wfull).alias("liy"),
        F.last("ix").over(wfull).alias("lix"),
    )
    step = (F.col("iy") - F.col("piy")) * (F.col("iy") - F.col("piy")) + (
        F.col("ix") - F.col("pix")
    ) * (F.col("ix") - F.col("pix"))
    net = (F.col("liy") - F.col("fiy")) * (F.col("liy") - F.col("fiy")) + (
        F.col("lix") - F.col("fix")
    ) * (F.col("lix") - F.col("fix"))
    dec = "decimal(38,0)"
    agg = legs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(step), F.lit(0)).cast("long").alias("sum_step_d2"),
        F.coalesce(F.max(step), F.lit(0)).cast("long").alias("max_step_d2"),
        F.max(net).cast("long").alias("net_d2"),
        F.sum(F.col("iy").cast(dec)).alias("sy"),
        F.sum(F.col("ix").cast(dec)).alias("sx"),
        F.sum(
            F.col("iy").cast(dec) * F.col("iy") + F.col("ix").cast(dec) * F.col("ix")
        ).alias("sqq"),
    )
    rg2n = (
        F.col("n").cast(dec) * F.col("sqq")
        - F.col("sy") * F.col("sy")
        - F.col("sx") * F.col("sx")
    )
    return agg.select(
        "user_id",
        "n",
        "sum_step_d2",
        "max_step_d2",
        "net_d2",
        # moments stay DECIMAL(38,0) internally; the OUTPUT is BIGINT —
        # a Decimal column reaches pandas as object and string-sorts in
        # the driver's canonical row order while DuckDB's decimal lands
        # as float64 and sorts numerically, misaligning rows (caught at
        # sf1: "10..." < "9..." as strings). BIGINT holds to ~1e9 fixes
        # per entity at this coordinate span.
        rg2n.cast("long").alias("rg2n"),
        F.round(F.sqrt(rg2n.cast("double")) / F.col("n") / 1000.0, 6).alias("rg_deg"),
    )


# Holt linear (level + trend) exponential smoothing ------------------------------------

_HOLT_A = 0.5  # level gain (exact binary double: 2^-1)
_HOLT_G = 0.25  # trend gain (exact binary double: 2^-2)


@register(
    "holt_linear",
    f"""
    WITH f AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n,
             list_reduce(
               list_transform(
                 list(CAST(value AS DOUBLE) ORDER BY epoch_ms(ts), event_id),
                 x -> [x, CAST(0 AS DOUBLE)]),
               (acc, e) -> [
                 {_HOLT_A!r}::DOUBLE * e[1]
                   + {1.0 - _HOLT_A!r}::DOUBLE * (acc[1] + acc[2]),
                 {_HOLT_G!r}::DOUBLE
                   * ({_HOLT_A!r}::DOUBLE * e[1]
                      + {1.0 - _HOLT_A!r}::DOUBLE * (acc[1] + acc[2])
                      - acc[1])
                   + {1.0 - _HOLT_G!r}::DOUBLE * acc[2]]) AS st
      FROM events GROUP BY user_id
    )
    SELECT user_id, n, round(st[1], 6) AS level, round(st[2], 6) AS trend,
           round(st[1] + st[2], 6) AS forecast1
    FROM f
    """,
    doc=(
        f"Holt's linear (double-exponential) smoothing with FOLD "
        f"semantics: level l' = {_HOLT_A} x + {1 - _HOLT_A} (l + b), "
        f"trend b' = {_HOLT_G} (l' - l) + {1 - _HOLT_G} b, seeded "
        "(l0, b0) = (x0, 0), over the (ts, event_id)-ordered per-entity "
        "stream; emits level, trend and the one-step forecast l + b — "
        "the trend-aware upgrade of ewma_smooth's level tracking; both "
        "gains are exact binary doubles and BOTH engines run the "
        "identical sequential struct fold (Spark aggregate / DuckDB "
        "list_reduce), so the state is bit-identical by construction"
    ),
)
def holt_linear(spark, sf_dir):
    """ONE per-entity shuffle (groupBy collect_list), then the sort and
    the struct fold run map-side via aggregate() — the ewma_smooth plan
    with a two-field state; per-entity history rides one array (the
    sessionize contract), no window exchange."""
    ev = _t(spark, sf_dir, "events")
    p = ev.select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
        "event_id",
        F.col("value").cast("double").alias("v"),
    )
    arr = p.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("t_ms", "event_id", "v"))).alias("a")
    )
    a, g = _HOLT_A, _HOLT_G
    # state = [level, trend]: the DuckDB twin folds the identical list
    # literal (struct-typed lambda states are rebound field-by-field in
    # DuckDB 1.0 — a later field's formula sees the EARLIER field's new
    # value — so both engines use positional list state instead)
    lp = f"{a!r}D * x + {1.0 - a!r}D * (element_at(acc, 1) + element_at(acc, 2))"
    fold = (
        "aggregate(slice(transform(a, s -> s.v), 2, size(a) - 1), "
        "array(element_at(a, 1).v, CAST(0 AS DOUBLE)), "
        f"(acc, x) -> array({lp}, "
        f"{g!r}D * (({lp}) - element_at(acc, 1)) "
        f"+ {1.0 - g!r}D * element_at(acc, 2)))"
    )
    st = F.expr(fold)
    return arr.select(
        "user_id",
        F.size("a").cast("long").alias("n"),
        F.round(F.element_at(st, 1), 6).alias("level"),
        F.round(F.element_at(st, 2), 6).alias("trend"),
        F.round(F.element_at(st, 1) + F.element_at(st, 2), 6).alias("forecast1"),
    )


# Hourly-profile correlation between event types -----------------------------------------

_PC_H = 24  # profile length (hours of day)


@register(
    "profile_correlation",
    f"""
    WITH m AS (
      SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    marg AS (
      SELECT event_type, CAST(sum(x) AS BIGINT) AS s,
             CAST(sum(x * x) AS BIGINT) AS ss
      FROM m GROUP BY 1
    ),
    cross_ AS (
      SELECT a.event_type AS t1, b.event_type AS t2,
             CAST(sum(a.x * b.x) AS BIGINT) AS sxy
      FROM m a JOIN m b ON a.h = b.h AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT c.t1, c.t2, c.sxy,
           round(CAST({_PC_H} * c.sxy - m1.s * m2.s AS DOUBLE)
                 / sqrt(CAST({_PC_H} * m1.ss - m1.s * m1.s AS DOUBLE)
                        * CAST({_PC_H} * m2.ss - m2.s * m2.s AS DOUBLE)), 6)
             AS corr
    FROM cross_ c
    JOIN marg m1 ON m1.event_type = c.t1
    JOIN marg m2 ON m2.event_type = c.t2
    """,
    doc=(
        "Pearson correlation between the 24-hour activity profiles of "
        "every event-type pair (zeros for silent hours enter exactly via "
        "the moment identity: missing hours contribute 0 to every sum, "
        "so the sparse per-(type, hour) rollup IS the dense computation) "
        "— the co-movement screen behind domain mixing / seasonality "
        "grouping, beside pmi_pairs' co-occurrence lift; all moments are "
        "BIGINT-exact, one sqrt + division per type pair"
    ),
)
def profile_correlation(spark, sf_dir):
    """ONE partial-agg shuffle to the O(|types| x 24) profile frame, "
    then every pairwise term rides broadcast joins of frames bounded by
    |types| — the event stream is scanned and shuffled exactly once."""
    ev = _t(spark, sf_dir, "events")
    m = _persist_evict(
        ev.select(
            "event_type", F.hour(F.col("ts").cast("timestamp")).cast("long").alias("h")
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    marg = m.groupBy("event_type").agg(
        F.sum("x").alias("s"), F.sum(F.col("x") * F.col("x")).alias("ss")
    )
    cr = (
        m.alias("a")
        .join(m.alias("b"), "h")
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("t1"), F.col("b.event_type").alias("t2")
        )
        .agg(F.sum(F.col("a.x") * F.col("b.x")).alias("sxy"))
    )
    m1 = marg.select(
        F.col("event_type").alias("t1"), F.col("s").alias("s1"), F.col("ss").alias("ss1")
    )
    m2 = marg.select(
        F.col("event_type").alias("t2"), F.col("s").alias("s2"), F.col("ss").alias("ss2")
    )
    num = (_PC_H * F.col("sxy") - F.col("s1") * F.col("s2")).cast("double")
    den = F.sqrt(
        (_PC_H * F.col("ss1") - F.col("s1") * F.col("s1")).cast("double")
        * (_PC_H * F.col("ss2") - F.col("s2") * F.col("s2")).cast("double")
    )
    return (
        cr.join(F.broadcast(m1), "t1")
        .join(F.broadcast(m2), "t2")
        .select("t1", "t2", "sxy", F.round(num / den, 6).alias("corr"))
    )


# Per-entity turning statistics -----------------------------------------------------------


@register(
    "turning_stats",
    """
    WITH pts AS (
      SELECT user_id, epoch_ms(ts) AS t_ms, event_id,
             (user_id % 120) * 1000
               + (CASE WHEN event_id % 13 < 4 THEN 2000 ELSE 0 END)
               + event_id % 7 AS iy,
             (user_id % 300) * 1000
               + (CASE WHEN event_id % 13 < 4 THEN 2000 ELSE 0 END)
               + event_id % 5 AS ix
      FROM events
    ),
    legs AS (
      SELECT user_id,
             iy - lag(iy) OVER w AS dy, ix - lag(ix) OVER w AS dx,
             lag(iy) OVER w - lag(iy, 2) OVER w AS pdy,
             lag(ix) OVER w - lag(ix, 2) OVER w AS pdx
      FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY t_ms, event_id)
    ),
    turns AS (
      SELECT user_id, pdy * dx - pdx * dy AS cross_, pdy * dy + pdx * dx AS dot_
      FROM legs
      WHERE pdy IS NOT NULL
        AND NOT (dy = 0 AND dx = 0) AND NOT (pdy = 0 AND pdx = 0)
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_turns,
           CAST(sum(CASE WHEN cross_ > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_left,
           CAST(sum(CASE WHEN cross_ < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_right,
           CAST(sum(CASE WHEN cross_ = 0 AND dot_ > 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_straight,
           CAST(sum(CASE WHEN cross_ = 0 AND dot_ < 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_reverse,
           CAST(sum(CASE WHEN cross_ > 0 THEN 1 ELSE 0 END)
                - sum(CASE WHEN cross_ < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS net_turn
    FROM turns GROUP BY user_id
    """,
    doc=(
        "per-entity turning statistics: consecutive step pairs classified "
        "left / right / straight / reverse by the INTEGER cross product "
        "sign (no atan2, no angles — the slope_aspect compass trick "
        "applied to trajectories), zero-length steps excluded; net_turn "
        "= lefts - rights is the circling indicator — the movement-"
        "ecology read-off (foraging loops vs commute lines) completing "
        "mobility_metrics' magnitudes with direction structure; "
        "everything is exact integer arithmetic"
    ),
)
def turning_stats(spark, sf_dir):
    """ONE per-entity window exchange (two lags at offsets 1 and 2 share
    the same sort), then a codegen'd sign classification and ONE
    partial-agg rollup. Per-entity history fits a partition at any
    scale; no float appears anywhere in the operator."""
    ev = _t(spark, sf_dir, "events")
    jump = F.when(F.col("event_id") % 13 < 4, F.lit(2000)).otherwise(F.lit(0))
    pts = ev.select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
        "event_id",
        ((F.col("user_id") % 120) * 1000 + jump + F.col("event_id") % 7).alias("iy"),
        ((F.col("user_id") % 300) * 1000 + jump + F.col("event_id") % 5).alias("ix"),
    )
    w = Window.partitionBy("user_id").orderBy("t_ms", "event_id")
    legs = pts.select(
        "user_id",
        (F.col("iy") - F.lag("iy").over(w)).alias("dy"),
        (F.col("ix") - F.lag("ix").over(w)).alias("dx"),
        (F.lag("iy").over(w) - F.lag("iy", 2).over(w)).alias("pdy"),
        (F.lag("ix").over(w) - F.lag("ix", 2).over(w)).alias("pdx"),
    )
    turns = legs.filter(
        F.col("pdy").isNotNull()
        & ~((F.col("dy") == 0) & (F.col("dx") == 0))
        & ~((F.col("pdy") == 0) & (F.col("pdx") == 0))
    ).select(
        "user_id",
        (F.col("pdy") * F.col("dx") - F.col("pdx") * F.col("dy")).alias("cross_"),
        (F.col("pdy") * F.col("dy") + F.col("pdx") * F.col("dx")).alias("dot_"),
    )
    left = F.sum(F.when(F.col("cross_") > 0, 1).otherwise(0))
    right = F.sum(F.when(F.col("cross_") < 0, 1).otherwise(0))
    return turns.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        left.cast("long").alias("n_left"),
        right.cast("long").alias("n_right"),
        F.sum(F.when((F.col("cross_") == 0) & (F.col("dot_") > 0), 1).otherwise(0))
        .cast("long")
        .alias("n_straight"),
        F.sum(F.when((F.col("cross_") == 0) & (F.col("dot_") < 0), 1).otherwise(0))
        .cast("long")
        .alias("n_reverse"),
        (left - right).cast("long").alias("net_turn"),
    )


# Landmark harmonic centrality --------------------------------------------------------

_HC_K = 8  # landmark count (smallest node ids)
_HC_ROUNDS = 4  # BFS horizon; 12/d is integer-exact for every d <= 4


def _hc_oracle_sql() -> str:
    steps = []
    for k in range(1, _HC_ROUNDS + 1):
        steps.append(f"""
    d{k} AS (
      SELECT lm, v, CAST(min(dist) AS BIGINT) AS dist FROM (
        SELECT lm, v, dist FROM d{k - 1}
        UNION ALL
        SELECT p.lm, e.dst AS v, p.dist + 1 AS dist
        FROM d{k - 1} p JOIN e ON e.src = p.v
      ) GROUP BY 1, 2
    )""")
    return (
        f"""
    WITH e0 AS (
      SELECT DISTINCT l_orderkey % {_PR_N} AS a, l_partkey % {_PR_N} AS b
      FROM lineitem WHERE l_orderkey % {_PR_N} <> l_partkey % {_PR_N}
    ),
    e AS (SELECT a AS src, b AS dst FROM e0 UNION SELECT b, a FROM e0),
    nodes AS (SELECT DISTINCT src AS v FROM e),
    lm AS (SELECT v AS lm FROM nodes ORDER BY v LIMIT {_HC_K}),
    d0 AS (SELECT lm, lm AS v, CAST(0 AS BIGINT) AS dist FROM lm),"""
        + ",".join(steps)
        + f"""
    SELECT v, CAST(count(*) AS BIGINT) AS n_reached,
           CAST(sum(12 // dist) AS BIGINT) AS harmonic_x12,
           round(CAST(sum(12 // dist) AS DOUBLE) / 12.0, 6) AS harmonic
    FROM d{_HC_ROUNDS} WHERE dist > 0 GROUP BY v
    """
    )


@register(
    "harmonic_centrality",
    _hc_oracle_sql(),
    doc=(
        f"landmark harmonic centrality: multi-source BFS from the {_HC_K} "
        f"smallest node ids over the undirected pagerank graph, "
        f"{_HC_ROUNDS} fixed rounds; per node, sum over reached landmarks "
        "of 1/d — accumulated as the INTEGER sum of 12/d (every d <= 4 "
        "divides 12), so the centrality is exact at any aggregation "
        "order and the float division happens once per output row — the "
        "landmark approximation that replaces all-pairs BFS at scale "
        "(cost = nodes x K, not nodes^2), completing the centrality "
        "family (pagerank / hits / triangle / k_core)"
    ),
)
def harmonic_centrality(spark, sf_dir):
    """Each BFS round is one equi-join (frontier x edges on src) + a
    partial-agg min on the (landmark, node) key + a min-merge — the sssp
    loop with a composite key (state size = nodes x K, the documented
    landmark trade); per-round localCheckpoint truncates lineage exactly
    as sssp/dup_components do. Integer min/sum are merge-order
    independent, so no rounding discipline is needed."""
    from pyspark import StorageLevel

    li = _t(spark, sf_dir, "lineitem")
    a, b = F.col("l_orderkey") % _PR_N, F.col("l_partkey") % _PR_N
    e0 = li.filter(a != b).select(a.alias("a"), b.alias("b")).distinct()
    e = (
        e0.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(e0.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    )
    while len(_PAGERANK_CACHED) > 4:
        _PAGERANK_CACHED.pop(0).unpersist()
    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    _PAGERANK_CACHED.append(e)
    lm = (
        e.select(F.col("src").alias("v"))
        .distinct()
        .orderBy("v")
        .limit(_HC_K)
        .select(F.col("v").alias("lm"))
    )
    dist = lm.select(
        "lm", F.col("lm").alias("v"), F.lit(0).cast("long").alias("dist")
    ).localCheckpoint(eager=False)
    for _ in range(_HC_ROUNDS):
        relax = (
            dist.select(F.col("lm"), F.col("v").alias("src"), "dist")
            .join(e, "src")
            .select("lm", F.col("dst").alias("v"), (F.col("dist") + 1).alias("dist"))
        )
        dist = (
            dist.unionAll(relax)
            .groupBy("lm", "v")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
    hx12 = F.sum(F.expr("12 div dist"))
    return (
        dist.filter(F.col("dist") > 0)
        .groupBy("v")
        .agg(
            F.count(F.lit(1)).alias("n_reached"),
            hx12.cast("long").alias("harmonic_x12"),
            F.round(hx12.cast("double") / 12.0, 6).alias("harmonic"),
        )
    )


# Zonal histogram -----------------------------------------------------------------------

_ZH_BIN = 64.0  # value-bin width (exact binary double)
_ZH_NBINS = 8


@register(
    "zonal_histogram",
    f"""
    WITH {_zonal_assigned_cte()},
    b AS (
      SELECT zone_id,
             least(CAST(floor(value / {_ZH_BIN!r}) AS BIGINT), {_ZH_NBINS - 1})
               AS bin
      FROM assigned
    ),
    h AS (
      SELECT zone_id, bin, CAST(count(*) AS BIGINT) AS n
      FROM b GROUP BY 1, 2
    ),
    zt AS (SELECT zone_id, CAST(sum(n) AS BIGINT) AS zn FROM h GROUP BY 1)
    SELECT h.zone_id, h.bin, h.n,
           round(CAST(h.n AS DOUBLE) / zt.zn, 6) AS share
    FROM h JOIN zt ON zt.zone_id = h.zone_id
    """,
    doc=(
        f"zonal histogram: per polygon zone (broadcast R-tree point-in-"
        f"polygon, the zonal_stats path; -1 = complement), the value "
        f"distribution in {_ZH_NBINS} fixed bins of width {_ZH_BIN} "
        "(clamped top bin) with per-zone shares — the distribution-"
        "aware upgrade of zonal_stats' sum/count (a zone whose MIX "
        "shifts can hold its mean), the raster-analytics 'zonal "
        "histogram' primitive; bin edges are exact binary doubles so "
        "binning never straddles an ulp cross-engine"
    ),
)
def zonal_histogram(spark, sf_dir):
    """The zonal_stats plan (broadcast PIP per Arrow batch, map-side) "
    with the bin id added to the group key: ONE partial-agg shuffle to "
    (zone, bin), then the per-zone total is a second rollup of the "
    O(zones x bins) frame broadcast-joined back. The point stream is "
    scanned once and shuffled never (partial aggs on <= 109 x 8 keys)."""
    from filda_spark.pipeline import make_pip_udf
    from filda_spark.spatial import demo_zones

    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    pts = ev.select(
        "event_id",
        "value",
        ((F.col("event_id") * 7919 % 18000).cast("double") / 100.0 - 90.0).alias(
            "lat"
        ),
        ((F.col("event_id") * 104729 % 36000).cast("double") / 100.0 - 180.0).alias(
            "lon"
        ),
    )
    bc = spark.sparkContext.broadcast(demo_zones())
    zid = make_pip_udf(bc, "zone_id", flag=False)
    h = (
        pts.withColumn("zone_id", zid("lat", "lon"))
        .select(
            "zone_id",
            F.least(
                F.floor(F.col("value") / _ZH_BIN).cast("long"),
                F.lit(_ZH_NBINS - 1).cast("long"),
            ).alias("bin"),
        )
        .groupBy("zone_id", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    h = _persist_evict(h)
    zt = h.groupBy("zone_id").agg(F.sum("n").alias("zn"))
    return h.join(F.broadcast(zt), "zone_id").select(
        "zone_id",
        "bin",
        "n",
        F.round(F.col("n").cast("double") / F.col("zn"), 6).alias("share"),
    )


# Viewshed (integer-exact R3 visibility) ---------------------------------------------

_VS_R = 6  # Chebyshev visibility radius in analysis cells


@register(
    "viewshed",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    o AS (
      SELECT cy AS ocy, cx AS ocx, x AS oh
      FROM cells ORDER BY x DESC, cy, cx LIMIT 1
    ),
    tgt AS (
      SELECT c.cy, c.cx, c.x AS th, o.ocy, o.ocx, o.oh,
             greatest(abs(c.cy - o.ocy), abs(c.cx - o.ocx)) AS s
      FROM cells c CROSS JOIN o
      WHERE NOT (c.cy = o.ocy AND c.cx = o.ocx)
        AND abs(c.cy - o.ocy) <= {_VS_R} AND abs(c.cx - o.ocx) <= {_VS_R}
    ),
    samp AS (
      SELECT t.cy, t.cx, t.s, t.th, t.oh, k.k,
             (2 * (t.ocy * t.s + k.k * (t.cy - t.ocy)) + t.s) // (2 * t.s) AS ny,
             (2 * (t.ocx * t.s + k.k * (t.cx - t.ocx)) + t.s) // (2 * t.s) AS nx
      FROM tgt t JOIN generate_series(1, {_VS_R - 1}) k(k) ON k.k < t.s
    ),
    blocked AS (
      SELECT sp.cy, sp.cx,
             max(CASE WHEN (coalesce(h.x, 0) - sp.oh) * sp.s
                           >= (sp.th - sp.oh) * sp.k
                      THEN 1 ELSE 0 END) AS blk
      FROM samp sp
      LEFT JOIN cells h ON h.cy = sp.ny AND h.cx = sp.nx
      GROUP BY 1, 2
    )
    SELECT t.cy, t.cx, CAST(t.s AS BIGINT) AS s, t.th,
           CAST(CASE WHEN b.blk IS NULL THEN 1 ELSE 1 - b.blk END AS INT)
             AS visible
    FROM tgt t
    LEFT JOIN blocked b ON b.cy = t.cy AND b.cx = t.cx
    """,
    doc=(
        f"full viewshed within Chebyshev radius {_VS_R} of the densest "
        "cell: every target is tested along its own R3 sight line — "
        "intermediate samples at k/s of the way, NEAREST cell by "
        "half-up rounding done in pure integers ((2(o*s + k*dy) + s) "
        "div 2s), missing cells height 0 — and is visible iff every "
        "sample's elevation angle is strictly below the target's, "
        "compared CROSS-MULTIPLIED ((h_k - h_o)*s >= (h_t - h_o)*k "
        "blocks) so no division or float appears ANYWHERE — the full "
        "2D visibility surface line_of_sight's 8 rays cannot give"
    ),
)
def viewshed(spark, sf_dir):
    """One-row observer broadcast against the cell frame (codegen radius
    filter), a constant <= R-1 sample explode per target, ONE equi-join
    back to cells for sample heights, and a partial-agg max to the
    target key — bounded by targets x R; the all-integer blocking
    predicate makes the result parallelism- and engine-independent."""
    cells = _persist_evict(_cell_counts(spark, sf_dir))
    o = (
        cells.orderBy(F.col("x").desc(), "cy", "cx")
        .limit(1)
        .select(
            F.col("cy").alias("ocy"), F.col("cx").alias("ocx"), F.col("x").alias("oh")
        )
    )
    tgt = (
        cells.crossJoin(F.broadcast(o))
        .filter(
            ~((F.col("cy") == F.col("ocy")) & (F.col("cx") == F.col("ocx")))
            & (F.abs(F.col("cy") - F.col("ocy")) <= _VS_R)
            & (F.abs(F.col("cx") - F.col("ocx")) <= _VS_R)
        )
        .select(
            "cy",
            "cx",
            F.col("x").alias("th"),
            "ocy",
            "ocx",
            "oh",
            F.greatest(
                F.abs(F.col("cy") - F.col("ocy")), F.abs(F.col("cx") - F.col("ocx"))
            ).alias("s"),
        )
    )
    tgt = _persist_evict(tgt)
    ks = spark.range(1, _VS_R).selectExpr("id AS k")
    samp = tgt.join(F.broadcast(ks), F.col("k") < F.col("s")).select(
        "cy",
        "cx",
        "s",
        "th",
        "oh",
        "k",
        F.expr("(2 * (ocy * s + k * (cy - ocy)) + s) div (2 * s)").alias("ny"),
        F.expr("(2 * (ocx * s + k * (cx - ocx)) + s) div (2 * s)").alias("nx"),
    )
    h = cells.select(
        F.col("cy").alias("ny"), F.col("cx").alias("nx"), F.col("x").alias("hx")
    )
    blocked = (
        samp.join(h, ["ny", "nx"], "left")
        .groupBy("cy", "cx")
        .agg(
            F.max(
                F.when(
                    (F.coalesce(F.col("hx"), F.lit(0)) - F.col("oh")) * F.col("s")
                    >= (F.col("th") - F.col("oh")) * F.col("k"),
                    1,
                ).otherwise(0)
            ).alias("blk")
        )
    )
    return tgt.join(blocked, ["cy", "cx"], "left").select(
        "cy",
        "cx",
        F.col("s").cast("long").alias("s"),
        "th",
        F.when(F.col("blk").isNull(), 1)
        .otherwise(1 - F.col("blk"))
        .cast("int")
        .alias("visible"),
    )


# Interval union (coverage / gap analysis) ----------------------------------------------


@register(
    "interval_union",
    """
    WITH iv AS (
      SELECT user_id, epoch_ms(ts) AS t0, event_id,
             epoch_ms(ts) + (event_id % 3600) * 1000 + 1000 AS t1
      FROM events
    ),
    m AS (
      SELECT user_id, t0, t1, event_id,
             max(t1) OVER (PARTITION BY user_id ORDER BY t0, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      FROM iv
    ),
    s AS (
      SELECT user_id, t0, t1,
             CASE WHEN pmax IS NULL OR t0 > pmax THEN 1 ELSE 0 END AS brk,
             CASE WHEN pmax IS NOT NULL AND t0 > pmax THEN t0 - pmax
                  ELSE 0 END AS gap,
             sum(CASE WHEN pmax IS NULL OR t0 > pmax THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY t0, event_id
                     ROWS UNBOUNDED PRECEDING) AS seg
      FROM m
    ),
    segs AS (
      SELECT user_id, seg,
             CAST(count(*) AS BIGINT) AS n_iv,
             CAST(max(t1) - min(t0) AS BIGINT) AS covered,
             CAST(max(gap) AS BIGINT) AS lead_gap
      FROM s GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(sum(n_iv) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_merged,
           CAST(sum(covered) AS BIGINT) AS covered_ms,
           CAST(max(lead_gap) AS BIGINT) AS max_gap_ms
    FROM segs GROUP BY user_id
    """,
    doc=(
        "per-entity interval union: deterministic activity spans "
        "[t, t + (event_id % 3600 + 1) s] merged wherever they overlap "
        "(running-max-end sweep — an interval starts a new component iff "
        "it begins after everything seen so far ends), emitting merged-"
        "component count, total covered milliseconds and the largest "
        "silence gap — the coverage/uptime primitive behind sessionize "
        "(which groups by fixed gaps; this merges EXPLICIT durations), "
        "all-integer end to end"
    ),
)
def interval_union(spark, sf_dir):
    """ONE per-entity window exchange serves the running-max sweep and "
    the component-id running sum (same sort, Catalyst reuses it), then
    two partial-agg rollups (component, then entity) on integer-only
    state. Per-entity history fits a partition at any scale."""
    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t0"),
        "event_id",
        (
            F.unix_millis(F.col("ts").cast("timestamp"))
            + (F.col("event_id") % 3600) * 1000
            + 1000
        ).alias("t1"),
    )
    w = Window.partitionBy("user_id").orderBy("t0", "event_id")
    m = iv.select(
        "user_id",
        "t0",
        "t1",
        "event_id",
        F.max("t1").over(w.rowsBetween(Window.unboundedPreceding, -1)).alias("pmax"),
    )
    brk = F.when(F.col("pmax").isNull() | (F.col("t0") > F.col("pmax")), 1).otherwise(
        0
    )
    s = m.select(
        "user_id",
        "t0",
        "t1",
        F.when(
            F.col("pmax").isNotNull() & (F.col("t0") > F.col("pmax")),
            F.col("t0") - F.col("pmax"),
        )
        .otherwise(F.lit(0))
        .alias("gap"),
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("seg"),
    )
    segs = s.groupBy("user_id", "seg").agg(
        F.count(F.lit(1)).alias("n_iv"),
        (F.max("t1") - F.min("t0")).alias("covered"),
        F.max("gap").alias("lead_gap"),
    )
    return segs.groupBy("user_id").agg(
        F.sum("n_iv").cast("long").alias("n_events"),
        F.count(F.lit(1)).alias("n_merged"),
        F.sum("covered").cast("long").alias("covered_ms"),
        F.max("lead_gap").cast("long").alias("max_gap_ms"),
    )


# Dasymetric downscaling ------------------------------------------------------------------

_DD_CELL = 5.0  # downscale cell size (degrees) over the zonal point domain


@register(
    "dasymetric_downscale",
    f"""
    WITH {_zonal_assigned_cte()},
    zt AS (
      SELECT zone_id, round(sum(value), 6) AS zone_total
      FROM assigned WHERE zone_id >= 0 GROUP BY 1
    ),
    wc AS (
      SELECT CAST(floor((CAST(event_id * 7919 % 18000 AS DOUBLE) / 100.0 - 90.0)
                        / {_DD_CELL!r}) AS BIGINT) AS wy,
             CAST(floor((CAST(event_id * 104729 % 36000 AS DOUBLE) / 100.0 - 180.0)
                        / {_DD_CELL!r}) AS BIGINT) AS wx,
             CAST(max(zone_id) AS INT) AS zone_id,
             CAST(count(*) AS BIGINT) AS w
      FROM assigned WHERE zone_id >= 0
      GROUP BY 1, 2
    ),
    zw AS (SELECT zone_id, CAST(sum(w) AS BIGINT) AS zw FROM wc GROUP BY 1)
    SELECT wc.wy, wc.wx, wc.zone_id, wc.w, zt.zone_total,
           round(zt.zone_total * wc.w / zw.zw, 6) AS alloc
    FROM wc
    JOIN zw ON zw.zone_id = wc.zone_id
    JOIN zt ON zt.zone_id = wc.zone_id
    """,
    doc=(
        f"dasymetric downscaling: per-zone value totals (the verified "
        f"zonal_stats PIP assignment) reallocated to {_DD_CELL}-degree "
        "cells proportionally to each cell's point-count weight, cells "
        "keyed to a zone by their dominant (max) assignment — the "
        "population-downscaling / flux-disaggregation primitive that "
        "inverts area_weighted_regrid (which AGGREGATES fine to coarse; "
        "this SPREADS coarse totals down a weight raster); weights are "
        "BIGINT, the zone total is the same 6-dp-rounded double on both "
        "engines, one multiply + divide per output cell"
    ),
)
def dasymetric_downscale(spark, sf_dir):
    """Reuses the broadcast-PIP map pass (points scanned once, never "
    shuffled raw): ONE partial-agg to the weight cells, two O(zones)/
    O(cells) rollups broadcast back. The allocation never joins points
    to points."""
    from filda_spark.pipeline import make_pip_udf
    from filda_spark.spatial import demo_zones

    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    pts = ev.select(
        "event_id",
        "value",
        ((F.col("event_id") * 7919 % 18000).cast("double") / 100.0 - 90.0).alias(
            "lat"
        ),
        ((F.col("event_id") * 104729 % 36000).cast("double") / 100.0 - 180.0).alias(
            "lon"
        ),
    )
    bc = spark.sparkContext.broadcast(demo_zones())
    zid = make_pip_udf(bc, "zone_id", flag=False)
    asg = _persist_evict(
        pts.withColumn("zone_id", zid("lat", "lon")).filter(F.col("zone_id") >= 0)
    )
    zt = asg.groupBy("zone_id").agg(F.round(F.sum("value"), 6).alias("zone_total"))
    wc = (
        asg.select(
            F.floor(F.col("lat") / _DD_CELL).alias("wy"),
            F.floor(F.col("lon") / _DD_CELL).alias("wx"),
            "zone_id",
        )
        .groupBy("wy", "wx")
        .agg(
            F.max("zone_id").cast("int").alias("zone_id"),
            F.count(F.lit(1)).alias("w"),
        )
    )
    wc = _persist_evict(wc)
    zw = wc.groupBy("zone_id").agg(F.sum("w").alias("zw"))
    return (
        wc.join(F.broadcast(zw), "zone_id")
        .join(F.broadcast(zt), "zone_id")
        .select(
            "wy",
            "wx",
            "zone_id",
            "w",
            "zone_total",
            F.round(F.col("zone_total") * F.col("w") / F.col("zw"), 6).alias(
                "alloc"
            ),
        )
    )


# Normalized-difference band math -----------------------------------------------------

_ND_A, _ND_B = "click", "view"  # the two band event types
_ND_THR = 0.2  # class threshold (same parsed double both engines)


@register(
    "normalized_difference",
    f"""
    WITH p AS (
      SELECT event_type,
             CAST(floor((CAST(event_id * 7919 % 2000 AS DOUBLE) / 100.0)
                        / {_GI_CELL!r}) AS BIGINT) AS cy,
             CAST(floor((CAST(event_id * 104729 % 2400 AS DOUBLE) / 100.0 + 10.0)
                        / {_GI_CELL!r}) AS BIGINT) AS cx
      FROM events WHERE event_type IN ('{_ND_A}', '{_ND_B}')
    ),
    b AS (
      SELECT cy, cx,
             CAST(sum(CASE WHEN event_type = '{_ND_A}' THEN 1 ELSE 0 END)
               AS BIGINT) AS a,
             CAST(sum(CASE WHEN event_type = '{_ND_B}' THEN 1 ELSE 0 END)
               AS BIGINT) AS b
      FROM p GROUP BY 1, 2
    )
    SELECT cy, cx, a, b,
           round(CAST(a - b AS DOUBLE) / (a + b), 6) AS nd,
           CASE WHEN CAST(a - b AS DOUBLE) / (a + b) > {_ND_THR!r} THEN 'A'
                WHEN CAST(a - b AS DOUBLE) / (a + b) < -{_ND_THR!r} THEN 'B'
                ELSE 'MIXED' END AS cls
    FROM b
    """,
    doc=(
        f"normalized-difference band math over two density rasters "
        f"(bands = '{_ND_A}' / '{_ND_B}' event counts per analysis "
        "cell): nd = (a - b)/(a + b) with a three-way class at "
        f"+/-{_ND_THR} — the NDVI-shaped raster-calculator primitive "
        "(two co-registered bands -> ratio index -> classification); "
        "counts are BIGINT, nd is one exact-integer division, and the "
        "class compares the identical double on both engines"
    ),
)
def normalized_difference(spark, sf_dir):
    """Map-side band split (conditional partial aggs in ONE pass — the "
    change_detection idiom across type rather than time), a single "
    (cy, cx) shuffle, then codegen'd ratio + classification. Bounded by "
    inhabited cells."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_ND_A, _ND_B)
    )
    p = ev.select(
        "event_type",
        F.floor(
            ((F.col("event_id") * 7919 % 2000).cast("double") / 100.0) / _GI_CELL
        ).alias("cy"),
        F.floor(
            (((F.col("event_id") * 104729 % 2400).cast("double") / 100.0) + 10.0)
            / _GI_CELL
        ).alias("cx"),
    )
    b = p.groupBy("cy", "cx").agg(
        F.sum(F.when(F.col("event_type") == _ND_A, 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("event_type") == _ND_B, 1).otherwise(0))
        .cast("long")
        .alias("b"),
    )
    nd = (F.col("a") - F.col("b")).cast("double") / (F.col("a") + F.col("b"))
    return b.select(
        "cy",
        "cx",
        "a",
        "b",
        F.round(nd, 6).alias("nd"),
        F.when(nd > _ND_THR, F.lit("A"))
        .when(nd < -_ND_THR, F.lit("B"))
        .otherwise(F.lit("MIXED"))
        .alias("cls"),
    )


# Burstiness / Fano factor per event type ----------------------------------------------


@register(
    "burstiness_index",
    """
    WITH p AS (
      SELECT event_type, epoch_ms(ts) AS t_ms FROM events
    ),
    bounds AS (
      SELECT min(t_ms) AS t0,
             1 + (max(t_ms) - min(t_ms)) // 3600000 AS nh
      FROM p
    ),
    hc AS (
      SELECT event_type, (t_ms - t0) // 3600000 AS h,
             CAST(count(*) AS BIGINT) AS x
      FROM p CROSS JOIN bounds GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type,
             CAST(max(nh) AS BIGINT) AS nh,
             CAST(sum(x) AS BIGINT) AS s,
             CAST(sum(x * x) AS BIGINT) AS ss
      FROM hc CROSS JOIN bounds GROUP BY 1
    )
    SELECT event_type, nh, s, ss,
           round(CAST(nh * ss - s * s AS DOUBLE) / (nh * s), 6) AS fano,
           round((sqrt(CAST(nh * ss - s * s AS DOUBLE)) / nh
                    - CAST(s AS DOUBLE) / nh)
                 / (sqrt(CAST(nh * ss - s * s AS DOUBLE)) / nh
                    + CAST(s AS DOUBLE) / nh), 6) AS burstiness
    FROM m
    """,
    doc=(
        "burstiness per event type over the hourly count series "
        "(empty hours included EXACTLY via the moment identity — the "
        "hour-slot count comes from the corpus bounds, never from the "
        "sparse rollup): Fano factor var/mean = (n ss - s^2)/(n s) and "
        "the Goh-Barabasi index (sigma - mu)/(sigma + mu) — the "
        "temporal-clumping screen (machine-like uniform vs bursty "
        "organic traffic) beside seasonal_residuals' per-event scores; "
        "moments are BIGINT-exact, sqrt/divisions run once per type"
    ),
)
def burstiness_index(spark, sf_dir):
    """One scalar bounds broadcast, ONE partial-agg shuffle to the "
    (type, hour) frame, ONE rollup to O(|types|) rows. The event stream "
    is scanned once; empty hours never materialize (the identity "
    carries them)."""
    ev = _t(spark, sf_dir, "events")
    p = ev.select(
        "event_type", F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms")
    )
    bounds = p.agg(
        F.min("t_ms").alias("t0"),
        (1 + ((F.max("t_ms") - F.min("t_ms")) / 3600000).cast("long")).alias("nh"),
    )
    hc = (
        p.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            ((F.col("t_ms") - F.col("t0")) / 3600000).cast("long").alias("h"),
            "nh",
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("x"), F.max("nh").alias("nh"))
    )
    m = hc.groupBy("event_type").agg(
        F.max("nh").cast("long").alias("nh"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("ss"),
    )
    varn = (F.col("nh") * F.col("ss") - F.col("s") * F.col("s")).cast("double")
    sig = F.sqrt(varn) / F.col("nh")
    mu = F.col("s").cast("double") / F.col("nh")
    return m.select(
        "event_type",
        "nh",
        "s",
        "ss",
        F.round(varn / (F.col("nh") * F.col("s")), 6).alias("fano"),
        F.round((sig - mu) / (sig + mu), 6).alias("burstiness"),
    )


# Strahler stream order -------------------------------------------------------------

_SO_ROUNDS = 4  # fixed rounds; exact wherever flow-tree depth <= 4 (the
# flow_accumulation horizon contract)


def _strahler_oracle_sql() -> str:
    steps = []
    for k in range(1, _SO_ROUNDS + 1):
        steps.append(f"""
    g{k} AS (
      SELECT e.tcy AS cy, e.tcx AS cx, p.o AS po, CAST(count(*) AS BIGINT) AS cnt
      FROM e JOIN o{k - 1} p ON p.cy = e.scy AND p.cx = e.scx
      GROUP BY 1, 2, 3
    ),
    m{k} AS (SELECT cy, cx, max(po) AS mo FROM g{k} GROUP BY 1, 2),
    o{k} AS (
      SELECT c.cy, c.cx,
             CAST(CASE WHEN m.mo IS NULL THEN 1
                  ELSE m.mo + (CASE WHEN g.cnt >= 2 THEN 1 ELSE 0 END)
             END AS BIGINT) AS o
      FROM a0 c
      LEFT JOIN m{k} m ON m.cy = c.cy AND m.cx = c.cx
      LEFT JOIN g{k} g ON g.cy = m.cy AND g.cx = m.cx AND g.po = m.mo
    )""")
    return (
        f"WITH {_D8_SQL},\n    e AS ({_fa_edges_sql()}),\n"
        "    a0 AS (SELECT cy, cx FROM cells),\n"
        "    o0 AS (SELECT cy, cx, CAST(1 AS BIGINT) AS o FROM cells),"
        + ",".join(steps)
        + f"\n    SELECT cy, cx, o AS strahler FROM o{_SO_ROUNDS}"
    )


@register(
    "strahler_order",
    _strahler_oracle_sql(),
    doc=(
        f"Strahler stream order over the D8 flow tree ({_SO_ROUNDS} fixed "
        "rounds): a cell with no upstream neighbors is order 1; otherwise "
        "it takes the max upstream order, +1 iff that max is attained by "
        ">= 2 tributaries — the hydrology channel-hierarchy read-off "
        "completing the D8 family (flow dir / accumulation / length / "
        "watershed); exact wherever tree depth <= 4 (the documented "
        "flow_accumulation horizon), all-integer state so the fixpoint "
        "is parallelism-independent"
    ),
)
def strahler_order(spark, sf_dir):
    """Each round = ONE equi-join (edges x orders on the source key) + a
    partial-agg to (target, upstream-order) + an O(cells) max/argmax
    merge — the flow_accumulation loop with a (max, count-at-max)
    payload instead of a sum; edges and the cell base are persisted
    once, per-round state is O(cells)."""
    d8 = _d8_frame(spark, sf_dir).filter(F.col("d8_dir") > 0)
    dy = F.when(F.lit(False), 0)
    dx = F.when(F.lit(False), 0)
    for ddy, ddx, code in _D8_DIRS:
        dy = dy.when(F.col("d8_dir") == code, ddy)
        dx = dx.when(F.col("d8_dir") == code, ddx)
    edges = _persist_evict(
        d8.select(
            F.col("cy").alias("scy"),
            F.col("cx").alias("scx"),
            (F.col("cy") + dy).alias("tcy"),
            (F.col("cx") + dx).alias("tcx"),
        )
    )
    base = _persist_evict(_cell_counts(spark, sf_dir).select("cy", "cx"))
    o = base.select("cy", "cx", F.lit(1).cast("long").alias("o"))
    for _ in range(_SO_ROUNDS):
        g = (
            edges.join(
                o.select(
                    F.col("cy").alias("scy"),
                    F.col("cx").alias("scx"),
                    F.col("o").alias("po"),
                ),
                ["scy", "scx"],
            )
            .groupBy(F.col("tcy").alias("cy"), F.col("tcx").alias("cx"), "po")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        m = g.groupBy("cy", "cx").agg(F.max("po").alias("mo"))
        gm = m.join(
            g.select("cy", "cx", F.col("po").alias("mo"), "cnt"), ["cy", "cx", "mo"]
        )
        # g feeds BOTH m and the argmax join — without the per-round
        # localCheckpoint the o-lineage doubles each round (the sssp
        # finding; measured 13 s -> ~2 s warm for 4 rounds at sf0.1)
        o = (
            base.join(gm, ["cy", "cx"], "left")
            .select(
                "cy",
                "cx",
                F.when(F.col("mo").isNull(), F.lit(1))
                .otherwise(F.col("mo") + F.when(F.col("cnt") >= 2, 1).otherwise(0))
                .cast("long")
                .alias("o"),
            )
            .localCheckpoint(eager=False)
        )
    return o.select("cy", "cx", F.col("o").alias("strahler"))


# Sequential pattern mining (type trigrams) --------------------------------------------


@register(
    "sequence_mining",
    """
    WITH s AS (
      SELECT user_id, event_type,
             lag(event_type) OVER w AS t2p,
             lag(event_type, 2) OVER w AS t1p
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
    ),
    tri AS (
      SELECT t1p AS t1, t2p AS t2, event_type AS t3,
             CAST(count(*) AS BIGINT) AS c3
      FROM s WHERE t1p IS NOT NULL
      GROUP BY 1, 2, 3
    ),
    bi AS (SELECT t1, t2, CAST(sum(c3) AS BIGINT) AS c_ab FROM tri GROUP BY 1, 2)
    SELECT tri.t1, tri.t2, tri.t3, tri.c3, bi.c_ab,
           round(CAST(tri.c3 AS DOUBLE) / bi.c_ab, 6) AS p_next
    FROM tri JOIN bi ON bi.t1 = tri.t1 AND bi.t2 = tri.t2
    """,
    doc=(
        "sequential pattern mining over per-entity event streams: counts "
        "of consecutive type TRIGRAMS and the transition probability "
        "P(t3 | t1, t2) = c3 / sum_c3 — the second-order upgrade of "
        "markov_transitions' first-order chain (a funnel where 'view -> "
        "click' behaves differently after 'error' is invisible at order "
        "1); counts are BIGINT, one exact-integer division per trigram"
    ),
)
def sequence_mining(spark, sf_dir):
    """ONE per-entity window exchange (both lags share the sort), ONE
    partial-agg to the O(|types|^3) trigram frame, and the bigram "
    denominator is a rollup of THAT frame (never a second scan) "
    broadcast back. The event stream is scanned and shuffled once."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_millis(F.col("ts").cast("timestamp")), "event_id"
    )
    s = ev.select(
        "event_type",
        F.lag("event_type").over(w).alias("t2p"),
        F.lag("event_type", 2).over(w).alias("t1p"),
    )
    tri = (
        s.filter(F.col("t1p").isNotNull())
        .groupBy(
            F.col("t1p").alias("t1"),
            F.col("t2p").alias("t2"),
            F.col("event_type").alias("t3"),
        )
        .agg(F.count(F.lit(1)).alias("c3"))
    )
    tri = _persist_evict(tri)
    bi = tri.groupBy("t1", "t2").agg(F.sum("c3").alias("c_ab"))
    return tri.join(F.broadcast(bi), ["t1", "t2"]).select(
        "t1",
        "t2",
        "t3",
        "c3",
        "c_ab",
        F.round(F.col("c3").cast("double") / F.col("c_ab"), 6).alias("p_next"),
    )


# Soundex blocking keys (record linkage) -----------------------------------------------

_SDX_MAP = "01230120022455012623010202"  # a->0 b->1 c->2 d->3 e->0 f->1 g->2
# h->0 i->0 j->2 k->2 l->4 m->5 n->5 o->0 p->1 q->2 r->6 s->2 t->3 u->0
# v->1 w->0 x->2 y->0 z->2  (simplified soundex: h/w/y fold to 0 like
# vowels — the classic see-through-h/w rule needs backreferences, which
# DuckDB's RE2 regex lacks; this variant is deterministic in pure
# translate/filter primitives on both engines)


@register(
    "soundex_blocking",
    f"""
    WITH w0 AS (
      SELECT DISTINCT unnest(string_split(p_name, ' ')) AS word FROM part
    ),
    d AS (
      SELECT word,
             string_split(translate(lower(word),
               'abcdefghijklmnopqrstuvwxyz', '{_SDX_MAP}'), '') AS cs
      FROM w0
    ),
    c AS (
      SELECT word,
             array_to_string(
               list_filter(cs, (x, i) -> i = 1 OR x != cs[i - 1]), '') AS cc
      FROM d
    ),
    k AS (
      SELECT word,
             upper(substr(word, 1, 1))
               || rpad(substr(replace(substr(cc, 2), '0', ''), 1, 3), 3, '0')
               AS skey
      FROM c
    )
    SELECT skey,
           CAST(count(*) AS BIGINT) AS n_words,
           array_to_string(list_sort(list(word)), ',') AS words
    FROM k GROUP BY skey
    """,
    doc=(
        "soundex blocking keys over the part-name vocabulary: simplified "
        "soundex (keep first letter; consonant classes B/C/D/L/M/R; "
        "vowels+h/w/y drop; adjacent duplicates collapse BEFORE vowel "
        "removal — the classic phonetic key, minus the see-through-h/w "
        "rule that needs regex backreferences RE2 lacks) and the "
        "per-key blocking groups — the record-linkage candidate-"
        "generation primitive (phonetic blocking bounds the pair search "
        "exactly like LSH bands bound near-dup search); pure translate/"
        "filter string algebra, no float anywhere"
    ),
)
def soundex_blocking(spark, sf_dir):
    """Map-side key derivation (translate + index-lambda adjacent-dedup "
    + string surgery, all codegen/JVM), ONE distinct + ONE groupBy on "
    the bounded vocabulary. The only index-base difference between "
    engines (Spark filter lambda is 0-based, DuckDB 1-based) is pinned "
    by the brute-force test."""
    p = _t(spark, sf_dir, "part")
    w0 = p.select(
        F.explode(F.split(F.col("p_name"), " ")).alias("word")
    ).distinct()
    d = w0.select(
        "word",
        F.split(
            F.translate(
                F.lower(F.col("word")), "abcdefghijklmnopqrstuvwxyz", _SDX_MAP
            ),
            "",
        ).alias("cs"),
    )
    c = d.select(
        "word",
        F.expr(
            "array_join(filter(cs, (x, i) -> i = 0 OR x != cs[i - 1]), '')"
        ).alias("cc"),
    )
    k = c.select(
        "word",
        F.concat(
            F.upper(F.substring(F.col("word"), 1, 1)),
            F.rpad(
                F.substring(
                    F.regexp_replace(F.expr("substr(cc, 2)"), "0", ""), 1, 3
                ),
                3,
                "0",
            ),
        ).alias("skey"),
    )
    return k.groupBy("skey").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.array_join(F.array_sort(F.collect_list("word")), ",").alias("words"),
    )


# Laplacian curvature ----------------------------------------------------------------


@register(
    "laplacian_curvature",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    nbr AS (
      SELECT a.cy, a.cx, CAST(max(a.x) AS BIGINT) AS x0,
             CAST(sum(CASE WHEN abs(b.cy - a.cy) + abs(b.cx - a.cx) = 1
                      THEN b.x ELSE 0 END) AS BIGINT) AS s4,
             CAST(sum(b.x) AS BIGINT) AS s8,
             CAST(count(*) AS BIGINT) AS nn
      FROM cells a JOIN cells b
        ON abs(a.cy - b.cy) <= 1 AND abs(a.cx - b.cx) <= 1
       AND NOT (a.cy = b.cy AND a.cx = b.cx)
      GROUP BY a.cy, a.cx
    )
    SELECT cy, cx,
           CAST(s4 - 4 * x0 AS BIGINT) AS lap4,
           CAST(s8 - 8 * x0 AS BIGINT) AS lap8,
           CASE WHEN s4 - 4 * x0 < 0 THEN 'PEAK'
                WHEN s4 - 4 * x0 > 0 THEN 'SINK'
                ELSE 'FLAT' END AS cls
    FROM nbr WHERE nn = 8
    """,
    doc=(
        "discrete Laplacian curvature of the density surface: the 4- and "
        "8-neighbor Laplacians (sum of neighbors minus 4x / 8x the "
        "center) with a PEAK / SINK / FLAT class by integer sign — the "
        "second-derivative member of the terrain family (slope_aspect is "
        "the first derivative; this finds local convexity: plume cores "
        "vs clearings), interior cells only (the nn = 8 gate); "
        "all-integer end to end"
    ),
)
def laplacian_curvature(spark, sf_dir):
    """The slope_aspect stencil plan verbatim (persisted cells, ring-1
    explode, ONE equi-join + partial-agg) with Laplacian sums instead of
    Horn differences; no float appears anywhere."""
    cells = _persist_evict(_cell_counts(spark, sf_dir))
    right = _ring_explode(
        cells,
        F.col("cy"),
        F.col("cx"),
        [F.col("cy").alias("bcy"), F.col("cx").alias("bcx"), F.col("x").alias("bx_")],
        radius=1,
        names=("cy", "cx"),
    )
    nbr = (
        cells.join(right, ["cy", "cx"])
        .filter(~((F.col("bcy") == F.col("cy")) & (F.col("bcx") == F.col("cx"))))
        .groupBy("cy", "cx")
        .agg(
            F.max("x").cast("long").alias("x0"),
            F.sum(
                F.when(
                    F.abs(F.col("bcy") - F.col("cy"))
                    + F.abs(F.col("bcx") - F.col("cx"))
                    == 1,
                    F.col("bx_"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("s4"),
            F.sum("bx_").cast("long").alias("s8"),
            F.count(F.lit(1)).alias("nn"),
        )
    )
    lap4 = F.col("s4") - 4 * F.col("x0")
    return nbr.filter(F.col("nn") == 8).select(
        "cy",
        "cx",
        lap4.cast("long").alias("lap4"),
        (F.col("s8") - 8 * F.col("x0")).cast("long").alias("lap8"),
        F.when(lap4 < 0, F.lit("PEAK"))
        .when(lap4 > 0, F.lit("SINK"))
        .otherwise(F.lit("FLAT"))
        .alias("cls"),
    )


# Deterministic k-fold assignment ------------------------------------------------------

_KF_K = 5


@register(
    "kfold_assign",
    f"""
    WITH f AS (
      SELECT lang, {_MD5_60.format(key="doc_id")} % {_KF_K} AS fold
      FROM documents
    ),
    n AS (
      SELECT lang, fold, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY 1, 2
    ),
    t AS (SELECT lang, CAST(sum(n) AS BIGINT) AS tot FROM n GROUP BY 1)
    SELECT n.lang, n.fold, n.n,
           round(CAST(t.tot AS DOUBLE) / {_KF_K}, 6) AS expected,
           round((n.n - CAST(t.tot AS DOUBLE) / {_KF_K})
                 * (n.n - CAST(t.tot AS DOUBLE) / {_KF_K})
                 / (CAST(t.tot AS DOUBLE) / {_KF_K}), 6) AS chi2_part
    FROM n JOIN t ON t.lang = n.lang
    """,
    doc=(
        f"deterministic {_KF_K}-fold cross-validation assignment: fold = "
        "md5(doc_id) % K (the sample_stratified hash idiom — "
        "reproducible splits with NO RNG state to shard or seed), with "
        "per-(language, fold) counts and the chi-square balance "
        "contribution against the uniform expectation — the train/eval "
        "split hygiene check (a skewed fold silently biases "
        "cross-validation); counts BIGINT, three float ops per output "
        "row on the O(langs x K) rollup"
    ),
)
def kfold_assign(spark, sf_dir):
    """Map-side hash fold (the md5 conv idiom, JVM-side), ONE partial-agg
    to (lang, fold), language totals a rollup of THAT frame broadcast
    back — the corpus is scanned once and never reshuffled."""
    d = _t(spark, sf_dir, "documents")
    f = d.select("lang", (_h60("doc_id") % _KF_K).alias("fold"))
    n = f.groupBy("lang", "fold").agg(F.count(F.lit(1)).alias("n"))
    n = _persist_evict(n)
    t = n.groupBy("lang").agg(F.sum("n").alias("tot"))
    e = F.col("tot").cast("double") / _KF_K
    return n.join(F.broadcast(t), "lang").select(
        "lang",
        "fold",
        "n",
        F.round(e, 6).alias("expected"),
        F.round((F.col("n") - e) * (F.col("n") - e) / e, 6).alias("chi2_part"),
    )


# Bivariate (and univariate) global Moran's I -------------------------------------------


@register(
    "bivariate_moran",
    f"""
    WITH p AS (
      SELECT event_type,
             CAST(floor((CAST(event_id * 7919 % 2000 AS DOUBLE) / 100.0)
                        / {_GI_CELL!r}) AS BIGINT) AS cy,
             CAST(floor((CAST(event_id * 104729 % 2400 AS DOUBLE) / 100.0 + 10.0)
                        / {_GI_CELL!r}) AS BIGINT) AS cx
      FROM events WHERE event_type IN ('{_ND_A}', '{_ND_B}')
    ),
    b AS (
      SELECT cy, cx,
             CAST(sum(CASE WHEN event_type = '{_ND_A}' THEN 1 ELSE 0 END)
               AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = '{_ND_B}' THEN 1 ELSE 0 END)
               AS BIGINT) AS y
      FROM p GROUP BY 1, 2
    ),
    pr AS (
      SELECT CAST(count(*) AS HUGEINT) AS w,
             CAST(sum(CAST(a.x AS HUGEINT)) AS HUGEINT) AS wx,
             CAST(sum(CAST(a.y AS HUGEINT)) AS HUGEINT) AS wy,
             CAST(sum(CAST(a.x AS HUGEINT) * b2.y) AS HUGEINT) AS wxy,
             CAST(sum(CAST(a.x AS HUGEINT) * b2.x) AS HUGEINT) AS wxx,
             CAST(sum(CAST(a.y AS HUGEINT) * b2.y) AS HUGEINT) AS wyy
      FROM b a JOIN b b2
        ON abs(a.cy - b2.cy) <= 1 AND abs(a.cx - b2.cx) <= 1
       AND NOT (a.cy = b2.cy AND a.cx = b2.cx)
    ),
    m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM b
    )
    SELECT CAST(n AS BIGINT) AS n, CAST(w AS BIGINT) AS w,
           round(CAST(n * n * wxy - n * sy * wx - n * sx * wy + sx * sy * w
                      AS DOUBLE)
                 / (CAST(w AS DOUBLE)
                    * sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                           * CAST(n * syy - sy * sy AS DOUBLE))), 6) AS i_xy,
           round(CAST(n * n * wxx - 2 * n * sx * wx + sx * sx * w AS DOUBLE)
                 / (CAST(w AS DOUBLE) * CAST(n * sxx - sx * sx AS DOUBLE)), 6)
             AS i_xx,
           round(CAST(n * n * wyy - 2 * n * sy * wy + sy * sy * w AS DOUBLE)
                 / (CAST(w AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6)
             AS i_yy
    FROM pr CROSS JOIN m
    """,
    doc=(
        f"global bivariate Moran's I between the '{_ND_A}' and '{_ND_B}' "
        "density bands (ring-1 binary weights over inhabited cells), plus "
        "both univariate I's from the same pair scan: does high x HERE "
        "sit beside high y NEXT DOOR — the cross-band clustering screen "
        "behind co-location analysis, completing the LISA family "
        "(local_moran / geary_c / join_counts are single-band); every "
        "moment is 128-bit-integer exact via the mean-free identity "
        "n^2 WXY - n Sy WX - n Sx WY + Sx Sy W (the ols_trend "
        "treatment), one sqrt + three divisions on the one-row rollup"
    ),
)
def bivariate_moran(spark, sf_dir):
    """ONE band rollup shuffle (the normalized_difference pass carrying
    both bands), a ring-1 cover equi-join (constant 9x explode, each
    ordered pair met exactly once), and two one-row 128-bit moment
    frames cross-joined — no z-scores materialize, so nothing float
    touches the pair stream."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isin(_ND_A, _ND_B))
    p = ev.select(
        "event_type",
        F.floor(
            ((F.col("event_id") * 7919 % 2000).cast("double") / 100.0) / _GI_CELL
        ).alias("cy"),
        F.floor(
            (((F.col("event_id") * 104729 % 2400).cast("double") / 100.0) + 10.0)
            / _GI_CELL
        ).alias("cx"),
    )
    b = _persist_evict(
        p.groupBy("cy", "cx").agg(
            F.sum(F.when(F.col("event_type") == _ND_A, 1).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("event_type") == _ND_B, 1).otherwise(0))
            .cast("long")
            .alias("y"),
        )
    )
    dec = "decimal(38,0)"
    right = _ring_explode(
        b,
        F.col("cy"),
        F.col("cx"),
        [F.col("cy").alias("bcy"), F.col("cx").alias("bcx"),
         F.col("x").alias("bx_"), F.col("y").alias("by_")],
        radius=1,
        names=("cy", "cx"),
    )
    pairs = b.join(right, ["cy", "cx"]).filter(
        ~((F.col("bcy") == F.col("cy")) & (F.col("bcx") == F.col("cx")))
    )
    pr = pairs.agg(
        F.count(F.lit(1)).cast(dec).alias("w"),
        F.sum(F.col("x").cast(dec)).alias("wx"),
        F.sum(F.col("y").cast(dec)).alias("wy"),
        F.sum(F.col("x").cast(dec) * F.col("by_")).alias("wxy"),
        F.sum(F.col("x").cast(dec) * F.col("bx_")).alias("wxx"),
        F.sum(F.col("y").cast(dec) * F.col("by_")).alias("wyy"),
    )
    m = b.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
    )
    n, w = F.col("n"), F.col("w")
    sx, sy = F.col("sx"), F.col("sy")
    a_ = (n * F.col("sxx") - sx * sx).cast("double")
    b_ = (n * F.col("syy") - sy * sy).cast("double")
    num_xy = (
        n * n * F.col("wxy") - n * sy * F.col("wx") - n * sx * F.col("wy")
        + sx * sy * w
    ).cast("double")
    num_xx = (n * n * F.col("wxx") - 2 * n * sx * F.col("wx") + sx * sx * w).cast(
        "double"
    )
    num_yy = (n * n * F.col("wyy") - 2 * n * sy * F.col("wy") + sy * sy * w).cast(
        "double"
    )
    return pr.crossJoin(m).select(
        n.cast("long").alias("n"),
        w.cast("long").alias("w"),
        F.round(num_xy / (w.cast("double") * F.sqrt(a_ * b_)), 6).alias("i_xy"),
        F.round(num_xx / (w.cast("double") * a_), 6).alias("i_xx"),
        F.round(num_yy / (w.cast("double") * b_), 6).alias("i_yy"),
    )


# Two-sample Kolmogorov-Smirnov test ---------------------------------------------------

_KS_A, _KS_B = "click", "view"  # the two compared samples


@register(
    "ks_test",
    f"""
    WITH vc AS (
      SELECT value,
             CAST(sum(CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END)
               AS BIGINT) AS c1,
             CAST(sum(CASE WHEN event_type = '{_KS_B}' THEN 1 ELSE 0 END)
               AS BIGINT) AS c2
      FROM events WHERE event_type IN ('{_KS_A}', '{_KS_B}')
      GROUP BY value
    ),
    cum AS (
      SELECT value,
             sum(c1) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS f1,
             sum(c2) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS f2
      FROM vc
    ),
    tot AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
      FROM vc
    )
    SELECT n1, n2,
           CAST(max(abs(f1 * n2 - f2 * n1)) AS BIGINT) AS d_num,
           round(CAST(max(abs(f1 * n2 - f2 * n1)) AS DOUBLE) / (n1 * n2), 6)
             AS d,
           round(CAST(max(abs(f1 * n2 - f2 * n1)) AS DOUBLE) / (n1 * n2)
                 * sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)), 6) AS lambda,
           round(2.0 * exp(-2.0
                 * (CAST(max(abs(f1 * n2 - f2 * n1)) AS DOUBLE) / (n1 * n2)
                    * sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)))
                 * (CAST(max(abs(f1 * n2 - f2 * n1)) AS DOUBLE) / (n1 * n2)
                    * sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)))), 6)
             AS p_approx
    FROM cum CROSS JOIN tot GROUP BY n1, n2
    """,
    doc=(
        f"two-sample Kolmogorov-Smirnov test between the '{_KS_A}' and "
        f"'{_KS_B}' value distributions: D = max |F1 - F2| computed as "
        "the INTEGER maximum of |f1 n2 - f2 n1| over the pooled value "
        "grid (cumulative counts on the grouped values — the supremum "
        "over the ECDF step points IS the supremum), then one division; "
        "the effective-n lambda and the first-term asymptotic p-value "
        "2 exp(-2 lambda^2) evaluate from the identical doubles — the "
        "distribution-shift screen (did the metric's WHOLE distribution "
        "move, not just its mean) beside ab_test_ztest / jsd_divergence"
    ),
)
def ks_test(spark, sf_dir):
    """ONE partial-agg to the pooled value grid (both sample counts as
    conditional aggregates in one pass), ONE global ordered window for
    the cumulative ECDFs — the running-sum exchange is on the O(distinct
    values) grid, never raw events — and a one-row max rollup. At truly
    unbounded value cardinality the grid would pre-bucket (the
    log_quantiles treatment), noted here."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isin(_KS_A, _KS_B))
    vc = ev.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == _KS_A, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("event_type") == _KS_B, 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    wv = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    cum = vc.select(
        F.sum("c1").over(wv).alias("f1"), F.sum("c2").over(wv).alias("f2")
    )
    tot = vc.agg(
        F.sum("c1").cast("long").alias("n1"), F.sum("c2").cast("long").alias("n2")
    )
    g = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(
            F.max(F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")))
            .cast("long")
            .alias("d_num")
        )
    )
    d = F.col("d_num").cast("double") / (F.col("n1") * F.col("n2"))
    lam = d * F.sqrt(F.col("n1").cast("double") * F.col("n2") / (F.col("n1") + F.col("n2")))
    return g.select(
        "n1",
        "n2",
        "d_num",
        F.round(d, 6).alias("d"),
        F.round(lam, 6).alias("lambda"),
        F.round(2.0 * F.exp(-2.0 * lam * lam), 6).alias("p_approx"),
    )


# Degree assortativity --------------------------------------------------------------


@register(
    "graph_assortativity",
    f"""
    WITH e0 AS (
      SELECT DISTINCT
             least(l_orderkey % {_CN_N}, l_partkey % {_CN_N}) AS u,
             greatest(l_orderkey % {_CN_N}, l_partkey % {_CN_N}) AS v
      FROM lineitem
      WHERE l_linenumber = 1
        AND l_orderkey % {_CN_N} <> l_partkey % {_CN_N}
    ),
    adj AS (SELECT u AS x, v AS y FROM e0 UNION ALL SELECT v, u FROM e0),
    deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY x),
    de AS (
      SELECT du.d AS dx, dv.d AS dy
      FROM adj a JOIN deg du ON du.x = a.x JOIN deg dv ON dv.x = a.y
    ),
    mm AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(dx) AS BIGINT) AS s,
             CAST(sum(dx * dx) AS BIGINT) AS ss,
             CAST(sum(dx * dy) AS BIGINT) AS sxy
      FROM de
    )
    SELECT m, s, ss, sxy,
           round(CAST(m * sxy - s * s AS DOUBLE)
                 / CAST(m * ss - s * s AS DOUBLE), 6) AS assortativity
    FROM mm
    """,
    doc=(
        "degree assortativity of the common_neighbors graph: the Pearson "
        "correlation of endpoint degrees over the DIRECTED edge list "
        "(both orientations, so the x/y marginals coincide and the "
        "textbook r = (m Sxy - S^2)/(m Sxx - S^2) needs one moment "
        "set) — the hub-wiring summary (social graphs assort, "
        "technological graphs disassort) completing the graph-statistics "
        "family; moments BIGINT-exact, one division on the one-row "
        "rollup"
    ),
)
def graph_assortativity(spark, sf_dir):
    """Edge dedup shuffle once, degree frame O(nodes) broadcast TWICE
    onto the edge stream (per-endpoint lookup, no pair explosion), ONE
    one-row moment rollup. Integer moments make the statistic "
    parallelism-independent."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    e0 = (
        li.select(
            (F.col("l_orderkey") % _CN_N).alias("a"),
            (F.col("l_partkey") % _CN_N).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )
    adj = _persist_evict(
        e0.select(F.col("u").alias("x"), F.col("v").alias("y")).unionAll(
            e0.select(F.col("v").alias("x"), F.col("u").alias("y"))
        )
    )
    deg = adj.groupBy("x").agg(F.count(F.lit(1)).alias("d"))
    du = deg.select(F.col("x"), F.col("d").alias("dx"))
    dv = deg.select(F.col("x").alias("y"), F.col("d").alias("dy"))
    de = adj.join(F.broadcast(du), "x").join(F.broadcast(dv), "y")
    mm = de.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("dx").cast("long").alias("s"),
        F.sum(F.col("dx") * F.col("dx")).cast("long").alias("ss"),
        F.sum(F.col("dx") * F.col("dy")).cast("long").alias("sxy"),
    )
    return mm.select(
        "m",
        "s",
        "ss",
        "sxy",
        F.round(
            (F.col("m") * F.col("sxy") - F.col("s") * F.col("s")).cast("double")
            / (F.col("m") * F.col("ss") - F.col("s") * F.col("s")).cast("double"),
            6,
        ).alias("assortativity"),
    )


# Lexical diversity -----------------------------------------------------------------


@register(
    "lexical_diversity",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c,
             CAST(sum(len(term)) AS BIGINT) AS chars
      FROM tok GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS ttr,
           round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS hapax_ratio,
           round(CAST(sum(chars) AS DOUBLE) / sum(c), 6) AS avg_token_len
    FROM tf GROUP BY doc_id
    """,
    doc=(
        "per-document lexical diversity: type-token ratio, hapax-"
        "legomenon share, and mean token length from one (doc, term) "
        "rollup — the vocabulary-richness screen that separates "
        "template/boilerplate text (low TTR) from natural prose at equal "
        "gopher_repetition scores (repetition measures RUNS; TTR "
        "measures the vocabulary budget) — a standard training-data "
        "quality gate beside text_analysis; counts BIGINT, three "
        "divisions per doc"
    ),
)
def lexical_diversity(spark, sf_dir):
    """Tokenize map-side, ONE partial-agg shuffle to (doc, term) "
    carrying count + character sum in the same pass, ONE rollup to the "
    doc. The token stream is shuffled once (the vocab_prune plan keyed "
    by doc instead of term)."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.length("term")).cast("long").alias("chars"),
    )
    return tf.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("n_hapax"),
        F.round(F.count(F.lit(1)).cast("double") / F.sum("c"), 6).alias("ttr"),
        F.round(
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("hapax_ratio"),
        F.round(F.sum("chars").cast("double") / F.sum("c"), 6).alias(
            "avg_token_len"
        ),
    )


# Segment-segment intersection join ----------------------------------------------------

_SI_MAXLEN = 256  # Chebyshev length cap (bounds each segment's cell cover)
_SI_CELL = 256  # candidate-cover cell size (integer units)


@register(
    "segment_intersections",
    f"""
    WITH p AS (
      SELECT user_id, epoch_ms(ts) AS t_ms, event_id,
             CAST(event_id * 7919 % 2000 AS BIGINT) AS iy,
             CAST(event_id * 104729 % 2400 AS BIGINT) AS ix
      FROM events
    ),
    seg AS (
      SELECT user_id, event_id AS sid, iy AS y2, ix AS x2,
             lag(iy) OVER w AS y1, lag(ix) OVER w AS x1
      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY t_ms, event_id)
    ),
    s AS (
      SELECT user_id, sid, y1, x1, y2, x2
      FROM seg
      WHERE y1 IS NOT NULL
        AND greatest(abs(y2 - y1), abs(x2 - x1))
              BETWEEN 1 AND {_SI_MAXLEN}
    ),
    cov AS (
      SELECT DISTINCT s.user_id, s.sid, s.y1, s.x1, s.y2, s.x2, gy.g AS gy, gx.g AS gx
      FROM s
      JOIN generate_series(0, 9) gy(g)
        ON gy.g BETWEEN least(s.y1, s.y2) // {_SI_CELL}
               AND greatest(s.y1, s.y2) // {_SI_CELL}
      JOIN generate_series(0, 10) gx(g)
        ON gx.g BETWEEN least(s.x1, s.x2) // {_SI_CELL}
               AND greatest(s.x1, s.x2) // {_SI_CELL}
    ),
    cand AS (
      SELECT DISTINCT
             a.user_id AS ua, a.sid AS sa, a.y1 AS ay1, a.x1 AS ax1,
             a.y2 AS ay2, a.x2 AS ax2,
             b.user_id AS ub, b.sid AS sb, b.y1 AS by1, b.x1 AS bx1,
             b.y2 AS by2, b.x2 AS bx2
      FROM cov a JOIN cov b
        ON a.gy = b.gy AND a.gx = b.gx AND a.sid < b.sid
    )
    SELECT ua, sa, ub, sb
    FROM cand
    WHERE ((ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1))
          * ((ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)) < 0
      AND ((bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1))
          * ((bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)) < 0
    """,
    doc=(
        f"segment-segment intersection join (vector overlay): movement "
        f"legs up to {_SI_MAXLEN} units long, candidate pairs from a "
        f"{_SI_CELL}-unit bounding-box cell cover, PROPER crossings "
        "decided by the classic orientation test — both endpoints of "
        "each segment strictly on opposite sides of the other "
        "(d1 d2 < 0 AND d3 d4 < 0, all INTEGER cross products) — the "
        "computational-geometry primitive under every overlay/conflation "
        "workload (road-network conflation, route conflict detection); "
        "no float anywhere, so the result is parallelism- and "
        "engine-independent"
    ),
)
def segment_intersections(spark, sf_dir):
    """Legs from ONE per-entity window exchange; the length cap bounds
    each segment's cover to a constant cell count (the explode is
    map-side); candidates meet in a cell-key equi-join with a distinct "
    pair dedup (a pair sharing k cover cells meets once); the exact "
    test is codegen integer algebra. The cap is the documented "
    trade: long legs go to the rasterize_segments DDA cover instead of "
    a quadratic bbox explosion."""
    ev = _t(spark, sf_dir, "events")
    p = ev.select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
        "event_id",
        (F.col("event_id") * 7919 % 2000).alias("iy"),
        (F.col("event_id") * 104729 % 2400).alias("ix"),
    )
    w = Window.partitionBy("user_id").orderBy("t_ms", "event_id")
    seg = p.select(
        "user_id",
        F.col("event_id").alias("sid"),
        F.col("iy").alias("y2"),
        F.col("ix").alias("x2"),
        F.lag("iy").over(w).alias("y1"),
        F.lag("ix").over(w).alias("x1"),
    )
    s = seg.filter(
        F.col("y1").isNotNull()
        & F.greatest(
            F.abs(F.col("y2") - F.col("y1")), F.abs(F.col("x2") - F.col("x1"))
        ).between(1, _SI_MAXLEN)
    )
    gy = F.explode(
        F.sequence(
            F.expr(f"least(y1, y2) div {_SI_CELL}"),
            F.expr(f"greatest(y1, y2) div {_SI_CELL}"),
        )
    ).alias("gy")
    cov = s.select("user_id", "sid", "y1", "x1", "y2", "x2", gy)
    gx = F.explode(
        F.sequence(
            F.expr(f"least(x1, x2) div {_SI_CELL}"),
            F.expr(f"greatest(x1, x2) div {_SI_CELL}"),
        )
    ).alias("gx")
    cov = cov.select("user_id", "sid", "y1", "x1", "y2", "x2", "gy", gx).distinct()
    a = cov.select(
        *[F.col(c).alias(f"a_{c}") for c in ["user_id", "sid", "y1", "x1", "y2", "x2"]],
        "gy",
        "gx",
    )
    b = cov.select(
        *[F.col(c).alias(f"b_{c}") for c in ["user_id", "sid", "y1", "x1", "y2", "x2"]],
        "gy",
        "gx",
    )
    cand = (
        a.join(b, ["gy", "gx"])
        .filter(F.col("a_sid") < F.col("b_sid"))
        .drop("gy", "gx")
        .distinct()
    )
    d1 = (F.col("a_x2") - F.col("a_x1")) * (F.col("b_y1") - F.col("a_y1")) - (
        F.col("a_y2") - F.col("a_y1")
    ) * (F.col("b_x1") - F.col("a_x1"))
    d2 = (F.col("a_x2") - F.col("a_x1")) * (F.col("b_y2") - F.col("a_y1")) - (
        F.col("a_y2") - F.col("a_y1")
    ) * (F.col("b_x2") - F.col("a_x1"))
    d3 = (F.col("b_x2") - F.col("b_x1")) * (F.col("a_y1") - F.col("b_y1")) - (
        F.col("b_y2") - F.col("b_y1")
    ) * (F.col("a_x1") - F.col("b_x1"))
    d4 = (F.col("b_x2") - F.col("b_x1")) * (F.col("a_y2") - F.col("b_y1")) - (
        F.col("b_y2") - F.col("b_y1")
    ) * (F.col("a_x2") - F.col("b_x1"))
    return cand.filter((d1 * d2 < 0) & (d3 * d4 < 0)).select(
        F.col("a_user_id").alias("ua"),
        F.col("a_sid").alias("sa"),
        F.col("b_user_id").alias("ub"),
        F.col("b_sid").alias("sb"),
    )


# Empirical quantile normalization ----------------------------------------------------


@register(
    "quantile_normalize",
    """
    SELECT event_id, event_type, value,
           round(cume_dist() OVER (
             PARTITION BY event_type ORDER BY value), 6) AS pct
    FROM events
    """,
    doc=(
        "empirical quantile (rank) normalization: every value replaced "
        "by its within-type ECDF position via cume_dist — tie-INCLUSIVE "
        "(equal values share a percentile, so the transform is "
        "deterministic where row_number would not be) — the feature-"
        "engineering normalizer that makes heavy-tailed metrics "
        "comparable across types before clustering/regression; "
        "cume_dist is an exact count/count rational, identical on both "
        "engines"
    ),
)
def quantile_normalize(spark, sf_dir):
    """ONE window exchange partitioned by type. At 5 types this window "
    is deliberately coarse-partitioned — the documented scale path is "
    range partitioning within type (sort-based cume_dist distributes "
    over value ranges; Spark's window already sorts, so the skew lever "
    is repartitionByRange on (type, value) ahead of it), noted here."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value")
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.round(F.cume_dist().over(w), 6).alias("pct"),
    )


# Item-item co-occurrence (market basket) ----------------------------------------------


@register(
    "item_cooccurrence",
    """
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey % 200 AS item FROM lineitem
    ),
    m AS (SELECT item, CAST(count(*) AS BIGINT) AS c FROM op GROUP BY item),
    pr AS (
      SELECT a.item AS i1, b.item AS i2, CAST(count(*) AS BIGINT) AS c_ab
      FROM op a JOIN op b ON a.o = b.o AND a.item < b.item
      GROUP BY 1, 2 HAVING count(*) >= 2
    )
    SELECT pr.i1, pr.i2, pr.c_ab, m1.c AS c1, m2.c AS c2,
           round(CAST(pr.c_ab AS DOUBLE)
                 / sqrt(CAST(m1.c AS DOUBLE) * m2.c), 6) AS cosine,
           round(CAST(pr.c_ab AS DOUBLE) / (m1.c + m2.c - pr.c_ab), 6)
             AS jaccard
    FROM pr
    JOIN m m1 ON m1.item = pr.i1
    JOIN m m2 ON m2.item = pr.i2
    """,
    doc=(
        "item-item co-occurrence over order baskets (items = part keys "
        "folded to 200): support, cosine c_ab / sqrt(c_a c_b) and "
        "Jaccard for every pair co-purchased >= 2 times — the market-"
        "basket similarity matrix behind 'bought-together' retrieval, "
        "the BASKET-level complement of pmi_pairs' user-level "
        "association; per-basket fan-out is bounded by basket size "
        "squared, counts BIGINT, one sqrt per surviving pair"
    ),
)
def item_cooccurrence(spark, sf_dir):
    """Distinct (order, item) shuffle once; the pair join is per-order "
    (fan-out = basket size squared, the pmi_pairs shape) into ONE "
    partial-agg on the pair key; marginals broadcast. The >= 2 support "
    floor is the output bound."""
    li = _t(spark, sf_dir, "lineitem")
    op = _persist_evict(
        li.select(
            F.col("l_orderkey").alias("o"), (F.col("l_partkey") % 200).alias("item")
        ).distinct()
    )
    m = op.groupBy("item").agg(F.count(F.lit(1)).alias("c"))
    pr = (
        op.alias("a")
        .join(op.alias("b"), "o")
        .filter(F.col("a.item") < F.col("b.item"))
        .groupBy(F.col("a.item").alias("i1"), F.col("b.item").alias("i2"))
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= 2)
    )
    m1 = m.select(F.col("item").alias("i1"), F.col("c").alias("c1"))
    m2 = m.select(F.col("item").alias("i2"), F.col("c").alias("c2"))
    return (
        pr.join(F.broadcast(m1), "i1")
        .join(F.broadcast(m2), "i2")
        .select(
            "i1",
            "i2",
            "c_ab",
            "c1",
            "c2",
            F.round(
                F.col("c_ab").cast("double")
                / F.sqrt(F.col("c1").cast("double") * F.col("c2")),
                6,
            ).alias("cosine"),
            F.round(
                F.col("c_ab").cast("double")
                / (F.col("c1") + F.col("c2") - F.col("c_ab")),
                6,
            ).alias("jaccard"),
        )
    )


# Top entry paths -------------------------------------------------------------------

_TP_LEN = 5  # path prefix length


@register(
    "top_paths",
    f"""
    WITH r AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
               ORDER BY epoch_ms(ts), event_id) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= {_TP_LEN}
      GROUP BY user_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_users
    FROM paths GROUP BY path
    """,
    doc=(
        f"top entry paths: each entity's first {_TP_LEN} event types "
        "joined into a '>' path string, counted across entities — the "
        "Sankey/onboarding-funnel source table (which openings dominate, "
        "where do journeys diverge) beside window_funnel's fixed-pattern "
        "matching; the path is an ORDERED string_agg over an integer "
        "rank, so construction is deterministic"
    ),
)
def top_paths(spark, sf_dir):
    """ONE per-entity window exchange (rank), the path assembled from a
    sorted in-partition array (array_join of the sort_array'd prefix —
    no second exchange), ONE partial-agg on the bounded path key."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_millis(F.col("ts").cast("timestamp")), "event_id"
    )
    r = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= _TP_LEN)
    paths = r.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))


# Home/work anchor inference -----------------------------------------------------------


@register(
    "home_work_inference",
    """
    WITH pts AS (
      SELECT user_id,
             (user_id % 120) + (CASE WHEN event_id % 13 < 4 THEN 2 ELSE 0 END)
               AS qy,
             (user_id % 300) + (CASE WHEN event_id % 13 < 4 THEN 2 ELSE 0 END)
               AS qx
      FROM events
    ),
    v AS (
      SELECT user_id, qy, qx, CAST(count(*) AS BIGINT) AS visits
      FROM pts GROUP BY 1, 2, 3
    ),
    r AS (
      SELECT user_id, qy, qx, visits,
             row_number() OVER (PARTITION BY user_id
               ORDER BY visits DESC, qy, qx) AS rk
      FROM v
    )
    SELECT user_id,
           CAST(max(CASE WHEN rk = 1 THEN qy END) AS BIGINT) AS home_qy,
           CAST(max(CASE WHEN rk = 1 THEN qx END) AS BIGINT) AS home_qx,
           CAST(max(CASE WHEN rk = 1 THEN visits END) AS BIGINT) AS home_visits,
           CAST(max(CASE WHEN rk = 2 THEN qy END) AS BIGINT) AS work_qy,
           CAST(max(CASE WHEN rk = 2 THEN qx END) AS BIGINT) AS work_qx,
           CAST(max(CASE WHEN rk = 2 THEN visits END) AS BIGINT) AS work_visits,
           round(sqrt(CAST(
             (max(CASE WHEN rk = 1 THEN qy END) - max(CASE WHEN rk = 2 THEN qy END))
             * (max(CASE WHEN rk = 1 THEN qy END) - max(CASE WHEN rk = 2 THEN qy END))
             + (max(CASE WHEN rk = 1 THEN qx END) - max(CASE WHEN rk = 2 THEN qx END))
             * (max(CASE WHEN rk = 1 THEN qx END) - max(CASE WHEN rk = 2 THEN qx END))
             AS DOUBLE)), 6) AS commute_deg
    FROM r WHERE rk <= 2 GROUP BY user_id HAVING count(*) = 2
    """,
    doc=(
        "home/work anchor inference: each entity's two most-visited grid "
        "cells ranked by visit count (integer tie-break by cell id — a "
        "total order), pivoted to anchor columns with the commute "
        "distance — the canonical mobility-profiling step above "
        "stay_points (dwells find WHERE someone stops; this names the "
        "two anchors and measures the span between them); entities with "
        "a single lifetime cell are excluded by the HAVING gate"
    ),
)
def home_work_inference(spark, sf_dir):
    """ONE partial-agg to (entity, cell) visits, ONE per-entity window "
    for the rank, and the pivot is a conditional aggregate in the final "
    per-entity rollup — no joins at all. Integer ranks and distances; "
    one sqrt per entity."""
    ev = _t(spark, sf_dir, "events")
    jump = F.when(F.col("event_id") % 13 < 4, F.lit(2)).otherwise(F.lit(0))
    pts = ev.select(
        "user_id",
        ((F.col("user_id") % 120) + jump).alias("qy"),
        ((F.col("user_id") % 300) + jump).alias("qx"),
    )
    v = pts.groupBy("user_id", "qy", "qx").agg(F.count(F.lit(1)).alias("visits"))
    wk = Window.partitionBy("user_id").orderBy(F.col("visits").desc(), "qy", "qx")
    r = v.withColumn("rk", F.row_number().over(wk)).filter(F.col("rk") <= 2)

    def at(rk, col):
        return F.max(F.when(F.col("rk") == rk, F.col(col)))

    dqy = at(1, "qy") - at(2, "qy")
    dqx = at(1, "qx") - at(2, "qx")
    return (
        r.groupBy("user_id")
        .agg(
            at(1, "qy").cast("long").alias("home_qy"),
            at(1, "qx").cast("long").alias("home_qx"),
            at(1, "visits").cast("long").alias("home_visits"),
            at(2, "qy").cast("long").alias("work_qy"),
            at(2, "qx").cast("long").alias("work_qx"),
            at(2, "visits").cast("long").alias("work_visits"),
            F.round(
                F.sqrt((dqy * dqy + dqx * dqx).cast("double")), 6
            ).alias("commute_deg"),
            F.count(F.lit(1)).alias("_nr"),
        )
        .filter(F.col("_nr") == 2)
        .drop("_nr")
    )


# Gravity-model calibration ----------------------------------------------------------


@register(
    "gravity_calibration",
    f"""
    WITH p AS (
      SELECT user_id, epoch_ms(ts) AS t_ms, event_id,
             CAST(floor((CAST(event_id * 7919 % 2000 AS DOUBLE) / 100.0)
                        / {_GI_CELL!r}) AS BIGINT) AS cy,
             CAST(floor((CAST(event_id * 104729 % 2400 AS DOUBLE) / 100.0 + 10.0)
                        / {_GI_CELL!r}) AS BIGINT) AS cx
      FROM events
    ),
    legs AS (
      SELECT cy AS dcy, cx AS dcx,
             lag(cy) OVER w AS ocy, lag(cx) OVER w AS ocx
      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY t_ms, event_id)
    ),
    od AS (
      SELECT ocy, ocx, dcy, dcx,
             (dcy - ocy) * (dcy - ocy) + (dcx - ocx) * (dcx - ocx) AS d2,
             CAST(count(*) AS BIGINT) AS n_trips
      FROM legs WHERE ocy IS NOT NULL
        AND NOT (ocy = dcy AND ocx = dcx)
      GROUP BY 1, 2, 3, 4
    ),
    xy AS (
      SELECT ln(CAST(d2 AS DOUBLE)) AS x, ln(CAST(n_trips AS DOUBLE)) AS y
      FROM od
    ),
    mm AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
             sum(y * y) AS syy, sum(x * y) AS sxy
      FROM xy
    )
    SELECT m,
           round((m * sxy - sx * sy) / (m * sxx - sx * sx), 6) AS beta,
           round((sy - (m * sxy - sx * sy) / (m * sxx - sx * sx) * sx) / m, 6)
             AS alpha,
           round((m * sxy - sx * sy) * (m * sxy - sx * sy)
                 / ((m * sxx - sx * sx) * (m * syy - sy * sy)), 6) AS r2
    FROM mm
    """,
    doc=(
        "gravity-model calibration: log-log OLS of OD trip counts against "
        "squared origin-destination distance (ln T = alpha + beta ln d2; "
        "the distance-decay exponent is -2 beta) over the od_flows leg "
        "derivation — the parameter-ESTIMATION step huff_gravity "
        "consumes a fixed exponent for and radiation_model avoids; "
        "the regression inputs are ln's of exact integers (identical "
        "doubles cross-engine), moments one partial-agg rollup"
    ),
)
def gravity_calibration(spark, sf_dir):
    """The od_flows plan (per-entity lag window -> OD pair partial-agg)
    feeding a one-row moment rollup; ln runs on the aggregated OD frame
    (bounded by connected cell pairs), never per event."""
    ev = _t(spark, sf_dir, "events")
    p = ev.select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
        "event_id",
        F.floor(
            ((F.col("event_id") * 7919 % 2000).cast("double") / 100.0) / _GI_CELL
        ).alias("cy"),
        F.floor(
            (((F.col("event_id") * 104729 % 2400).cast("double") / 100.0) + 10.0)
            / _GI_CELL
        ).alias("cx"),
    )
    w = Window.partitionBy("user_id").orderBy("t_ms", "event_id")
    legs = p.select(
        F.col("cy").alias("dcy"),
        F.col("cx").alias("dcx"),
        F.lag("cy").over(w).alias("ocy"),
        F.lag("cx").over(w).alias("ocx"),
    ).filter(
        F.col("ocy").isNotNull()
        & ~((F.col("ocy") == F.col("dcy")) & (F.col("ocx") == F.col("dcx")))
    )
    od = legs.groupBy("ocy", "ocx", "dcy", "dcx").agg(
        F.count(F.lit(1)).alias("n_trips")
    )
    d2 = (F.col("dcy") - F.col("ocy")) * (F.col("dcy") - F.col("ocy")) + (
        F.col("dcx") - F.col("ocx")
    ) * (F.col("dcx") - F.col("ocx"))
    xy = od.select(
        F.log(d2.cast("double")).alias("x"),
        F.log(F.col("n_trips").cast("double")).alias("y"),
    )
    mm = xy.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    m = F.col("m")
    beta = (m * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        m * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return mm.select(
        "m",
        F.round(beta, 6).alias("beta"),
        F.round((F.col("sy") - beta * F.col("sx")) / m, 6).alias("alpha"),
        F.round(
            (m * F.col("sxy") - F.col("sx") * F.col("sy"))
            * (m * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                (m * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (m * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("r2"),
    )


# Directed triad census --------------------------------------------------------------


@register(
    "triad_census",
    f"""
    WITH e AS (
      SELECT DISTINCT l_orderkey % {_PR_N} AS src, l_partkey % {_PR_N} AS dst
      FROM lineitem
      WHERE l_orderkey % {_PR_N} <> l_partkey % {_PR_N}
    ),
    recip AS (
      SELECT CAST(count(*) / 2 AS BIGINT) AS n_recip
      FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src
    ),
    wedge AS (
      SELECT a.src AS x, a.dst AS y, b.dst AS z
      FROM e a JOIN e b ON a.dst = b.src AND a.src <> b.dst
    ),
    ff AS (
      SELECT CAST(count(*) AS BIGINT) AS n_ff
      FROM wedge w JOIN e c ON c.src = w.x AND c.dst = w.z
    ),
    cyc AS (
      SELECT CAST(count(*) / 3 AS BIGINT) AS n_cycle
      FROM wedge w JOIN e c ON c.src = w.z AND c.dst = w.x
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           recip.n_recip, ff.n_ff, cyc.n_cycle
    FROM recip CROSS JOIN ff CROSS JOIN cyc
    """,
    doc=(
        "directed triad census over the order->part graph: reciprocal "
        "dyads, feed-forward triangles (x->y->z plus the x->z shortcut) "
        "and directed 3-cycles (each counted once — the wedge closure "
        "count divides by the 3 rotations) — the motif spectrum that "
        "separates hierarchy (feed-forward-heavy: food webs, DAG-like "
        "pipelines) from feedback structure (cycle-heavy), extending "
        "triangle_count's undirected closure; all-integer joins and "
        "counts"
    ),
)
def triad_census(spark, sf_dir):
    """Edge dedup once (persisted — four references), ONE wedge "
    equi-join reused by both closure probes, each closure an equi-join "
    + one-row count. The wedge fan-out is the documented hub cost with "
    the same degree-cap mitigation as common_neighbors."""
    li = _t(spark, sf_dir, "lineitem")
    s, d = F.col("l_orderkey") % _PR_N, F.col("l_partkey") % _PR_N
    e = _persist_evict(
        li.filter(s != d).select(s.alias("src"), d.alias("dst")).distinct()
    )
    ne = e.agg(F.count(F.lit(1)).alias("n_edges"))
    recip = (
        e.alias("a")
        .join(
            e.alias("b"),
            (F.col("a.src") == F.col("b.dst")) & (F.col("a.dst") == F.col("b.src")),
        )
        .agg((F.count(F.lit(1)) / 2).cast("long").alias("n_recip"))
    )
    wedge = _persist_evict(
        e.alias("a")
        .join(e.alias("b"), F.col("a.dst") == F.col("b.src"))
        .filter(F.col("a.src") != F.col("b.dst"))
        .select(
            F.col("a.src").alias("x"), F.col("a.dst").alias("y"),
            F.col("b.dst").alias("z"),
        )
    )
    ec = e.select(F.col("src").alias("x"), F.col("dst").alias("z"))
    ff = wedge.join(ec, ["x", "z"]).agg(F.count(F.lit(1)).alias("n_ff"))
    er = e.select(F.col("src").alias("z"), F.col("dst").alias("x"))
    cyc = wedge.join(er, ["x", "z"]).agg(
        (F.count(F.lit(1)) / 3).cast("long").alias("n_cycle")
    )
    # four one-row frames composed declaratively — no driver-side counts
    return ne.crossJoin(recip).crossJoin(ff).crossJoin(cyc)


# Theil inequality decomposition --------------------------------------------------------

_TH_REG = 16  # region width in analysis cells (cx div 16 -> 3 regions)


@register(
    "theil_decomposition",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    g AS (SELECT cy, cx, x, cx // {_TH_REG} AS region FROM cells),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS big_n
      FROM g
    ),
    reg AS (
      SELECT region, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(x) AS BIGINT) AS x_g
      FROM g GROUP BY region
    ),
    tw AS (
      SELECT g.region,
             sum(CAST(g.x AS DOUBLE) / r.x_g
                 * ln(CAST(r.n_g AS DOUBLE) * g.x / r.x_g)) AS t_within
      FROM g JOIN reg r ON r.region = g.region
      GROUP BY g.region
    ),
    tb AS (
      SELECT sum(CAST(r.x_g AS DOUBLE) / t.big_n
                 * ln((CAST(r.x_g AS DOUBLE) / t.big_n)
                      / (CAST(r.n_g AS DOUBLE) / t.n))) AS t_between
      FROM reg r CROSS JOIN tot t
    )
    SELECT r.region, r.n_g, r.x_g,
           round(CAST(r.x_g AS DOUBLE) / t.big_n, 6) AS share,
           round(tw.t_within, 6) AS t_within,
           round(CAST(r.x_g AS DOUBLE) / t.big_n * tw.t_within, 6) AS contrib,
           round(tb.t_between, 6) AS t_between
    FROM reg r
    JOIN tw ON tw.region = r.region
    CROSS JOIN tot t CROSS JOIN tb
    """,
    doc=(
        f"Theil inequality decomposition of the detection-density "
        f"surface by longitude bands ({_TH_REG}-cell regions): per-region "
        "within-region Theil index, population share, contribution, and "
        "the between-region term — T_total = T_between + sum(share x "
        "T_within), the standard where-is-the-concentration split "
        "(is burning clustered INSIDE regions or BETWEEN them) beside "
        "lorenz_gini's single-number concentration; every ln argument is "
        "a ratio of exact integers, so both engines feed identical "
        "doubles"
    ),
)
def theil_decomposition(spark, sf_dir):
    """ONE cell rollup shuffle, O(regions) and O(1) frames broadcast "
    back onto the cell stream for the within terms (one partial-agg per "
    region), the between term a cross join of two one-row frames."""
    cells = _persist_evict(_cell_counts(spark, sf_dir))
    g = cells.select(
        "cy", "cx", "x", F.floor(F.col("cx") / _TH_REG).alias("region")
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").cast("long").alias("big_n")
    )
    reg = g.groupBy("region").agg(
        F.count(F.lit(1)).alias("n_g"), F.sum("x").cast("long").alias("x_g")
    )
    tw = (
        g.join(F.broadcast(reg), "region")
        .groupBy("region")
        .agg(
            F.sum(
                F.col("x").cast("double")
                / F.col("x_g")
                * F.log(F.col("n_g").cast("double") * F.col("x") / F.col("x_g"))
            ).alias("t_within")
        )
    )
    tb = (
        reg.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.col("x_g").cast("double")
                / F.col("big_n")
                * F.log(
                    (F.col("x_g").cast("double") / F.col("big_n"))
                    / (F.col("n_g").cast("double") / F.col("n"))
                )
            ).alias("t_between")
        )
    )
    return (
        reg.join(F.broadcast(tw), "region")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tb))
        .select(
            "region",
            "n_g",
            "x_g",
            F.round(F.col("x_g").cast("double") / F.col("big_n"), 6).alias("share"),
            F.round("t_within", 6).alias("t_within"),
            F.round(
                F.col("x_g").cast("double") / F.col("big_n") * F.col("t_within"), 6
            ).alias("contrib"),
            F.round("t_between", 6).alias("t_between"),
        )
    )


# OHLC bars ----------------------------------------------------------------------------


@register(
    "ohlc_bars",
    """
    WITH p AS (
      SELECT event_type, value, epoch_ms(ts) AS t_ms, event_id
      FROM events
    ),
    bounds AS (SELECT min(t_ms) AS t0 FROM p)
    SELECT event_type,
           CAST((t_ms - t0) // 86400000 AS BIGINT) AS day,
           CAST(count(*) AS BIGINT) AS n,
           round(first(value ORDER BY t_ms, event_id), 6) AS open,
           round(max(value), 6) AS high,
           round(min(value), 6) AS low,
           round(last(value ORDER BY t_ms, event_id), 6) AS close,
           round(sum(value), 6) AS volume
    FROM p CROSS JOIN bounds
    GROUP BY event_type, (t_ms - t0) // 86400000
    """,
    doc=(
        "OHLC candlestick bars per (type, corpus day): open/close by the "
        "total (t_ms, event_id) order, high/low/volume — the canonical "
        "time-series downsampling rollup (tick -> bar) that turns an "
        "event stream into chartable state, beside moving_avg's rolling "
        "view; open/close are order-statistics on a UNIQUE key so the "
        "bar is deterministic, min/max order-free, volume the one "
        "order-sensitive float sum (6-dp rounded)"
    ),
)
def ohlc_bars(spark, sf_dir):
    """One scalar bounds broadcast, ONE partial-agg shuffle to (type, "
    day) — open/close ride min/max over a (t_ms, event_id, value) "
    struct (exact, merge-order independent), so no window exchange "
    exists at all."""
    ev = _t(spark, sf_dir, "events")
    p = ev.select(
        "event_type",
        "value",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
        "event_id",
    )
    bounds = p.agg(F.min("t_ms").alias("t0"))
    pb = p.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        "value",
        ((F.col("t_ms") - F.col("t0")) / 86400000).cast("long").alias("day"),
        F.struct("t_ms", "event_id", "value").alias("kv"),
    )
    return pb.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("kv")["value"], 6).alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(F.max("kv")["value"], 6).alias("close"),
        F.round(F.sum("value"), 6).alias("volume"),
    )


# Ridge regression via exact normal equations --------------------------------------

_RIDGE_LAM = 10000  # per-sample ridge penalty, scaled-integer units (lam = n * this)


def _det3_sql(m: list[list[str]]) -> str:
    """3x3 determinant with a FIXED association order — the same helper
    renders both dialects (SQL fragments here, Columns in ``_det3_col``),
    so the IEEE rounding path of the double arithmetic is identical on
    Spark and DuckDB by construction."""
    return (
        f"({m[0][0]}) * (({m[1][1]}) * ({m[2][2]}) - ({m[1][2]}) * ({m[2][1]}))"
        f" - ({m[0][1]}) * (({m[1][0]}) * ({m[2][2]}) - ({m[1][2]}) * ({m[2][0]}))"
        f" + ({m[0][2]}) * (({m[1][0]}) * ({m[2][1]}) - ({m[1][1]}) * ({m[2][0]}))"
    )


def _det3_col(m: list[list[Column]]) -> Column:
    """Spark twin of ``_det3_sql`` — identical term order."""
    return (
        m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
        - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
        + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
    )


def _ridge_oracle_sql() -> str:
    ent = {
        "a11": "nn", "a12": "s1", "a13": "s2",
        "a21": "s1", "a22": "s11 + lam", "a23": "s12",
        "a31": "s2", "a32": "s12", "a33": "s22 + lam",
        "b1": "sy", "b2": "s1y", "b3": "s2y",
    }
    d = {k: f"CAST({v} AS DOUBLE)" for k, v in ent.items()}
    A = [[d["a11"], d["a12"], d["a13"]],
         [d["a21"], d["a22"], d["a23"]],
         [d["a31"], d["a32"], d["a33"]]]
    b = [d["b1"], d["b2"], d["b3"]]
    det = _det3_sql(A)
    det0 = _det3_sql([[b[0], A[0][1], A[0][2]],
                      [b[1], A[1][1], A[1][2]],
                      [b[2], A[2][1], A[2][2]]])
    det1 = _det3_sql([[A[0][0], b[0], A[0][2]],
                      [A[1][0], b[1], A[1][2]],
                      [A[2][0], b[2], A[2][2]]])
    det2 = _det3_sql([[A[0][0], A[0][1], b[0]],
                      [A[1][0], A[1][1], b[1]],
                      [A[2][0], A[2][1], b[2]]])
    return f"""
    WITH r AS (
      SELECT l_returnflag,
             CAST(round(l_quantity * 100, 0) AS BIGINT) AS x1,
             CAST(round(l_discount * 100, 0) AS BIGINT) AS x2,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y
      FROM lineitem
    ),
    m AS (
      SELECT l_returnflag,
             CAST(count(*) AS HUGEINT) AS nn,
             CAST(sum(CAST(x1 AS HUGEINT)) AS HUGEINT) AS s1,
             CAST(sum(CAST(x2 AS HUGEINT)) AS HUGEINT) AS s2,
             CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(sum(CAST(x1 AS HUGEINT) * CAST(x1 AS HUGEINT)) AS HUGEINT) AS s11,
             CAST(sum(CAST(x1 AS HUGEINT) * CAST(x2 AS HUGEINT)) AS HUGEINT) AS s12,
             CAST(sum(CAST(x2 AS HUGEINT) * CAST(x2 AS HUGEINT)) AS HUGEINT) AS s22,
             CAST(sum(CAST(x1 AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS s1y,
             CAST(sum(CAST(x2 AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS s2y
      FROM r GROUP BY l_returnflag
    ),
    lamed AS (SELECT *, nn * {_RIDGE_LAM} AS lam FROM m)
    SELECT l_returnflag, CAST(nn AS BIGINT) AS n,
           round(({det0}) / ({det}) / 100.0, 6) AS intercept,
           round(({det1}) / ({det}), 6) AS coef_qty,
           round(({det2}) / ({det}), 6) AS coef_disc
    FROM lamed
    """


@register(
    "ridge_regression",
    _ridge_oracle_sql(),
    doc=(
        "per-returnflag ridge regression of extendedprice on (quantity, "
        "discount) by EXACT normal equations: all nine Gram/moment sums "
        "128-bit integers over cent/centiunit-scaled inputs, ridge "
        f"penalty lam = n x {_RIDGE_LAM} (per-sample, so the shrinkage is "
        "scale-invariant in the row count), then ONE double Cramer solve "
        "of the 3x3 system with a shared fixed-association determinant "
        "helper rendered into both dialects — the distributed closed-form "
        "GLM fit (the 100 TB path: XtX is a bounded-size partial agg, the "
        "solve is O(1) on the aggregated frame, no gradient iterations)"
    ),
)
def ridge_regression(spark, sf_dir):
    """ONE partial-agg shuffle to |returnflag| rows carrying the 9-number
    Gram state; the Cramer solve runs on the aggregated O(groups) frame.
    This is the normal-equations pattern every closed-form linear model
    reduces to — nothing after the exchange scales with the input."""
    li = _t(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    r = li.select(
        "l_returnflag",
        F.round(F.col("l_quantity") * 100, 0).cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("x2"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
    )
    x1, x2, y = (F.col(c).cast(d38) for c in ("x1", "x2", "y"))
    m = r.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast(d38).alias("nn"),
        F.sum(x1).cast(d38).alias("s1"),
        F.sum(x2).cast(d38).alias("s2"),
        F.sum(y).cast(d38).alias("sy"),
        F.sum(x1 * x1).cast(d38).alias("s11"),
        F.sum(x1 * x2).cast(d38).alias("s12"),
        F.sum(x2 * x2).cast(d38).alias("s22"),
        F.sum(x1 * y).cast(d38).alias("s1y"),
        F.sum(x2 * y).cast(d38).alias("s2y"),
    )
    lam = (F.col("nn") * _RIDGE_LAM).cast(d38)
    dc = lambda c: c.cast("double")  # noqa: E731
    A = [
        [dc(F.col("nn")), dc(F.col("s1")), dc(F.col("s2"))],
        [dc(F.col("s1")), dc(F.col("s11") + lam), dc(F.col("s12"))],
        [dc(F.col("s2")), dc(F.col("s12")), dc(F.col("s22") + lam)],
    ]
    b = [dc(F.col("sy")), dc(F.col("s1y")), dc(F.col("s2y"))]
    det = _det3_col(A)
    det0 = _det3_col([[b[0], A[0][1], A[0][2]],
                      [b[1], A[1][1], A[1][2]],
                      [b[2], A[2][1], A[2][2]]])
    det1 = _det3_col([[A[0][0], b[0], A[0][2]],
                      [A[1][0], b[1], A[1][2]],
                      [A[2][0], b[2], A[2][2]]])
    det2 = _det3_col([[A[0][0], A[0][1], b[0]],
                      [A[1][0], A[1][1], b[1]],
                      [A[2][0], A[2][1], b[2]]])
    return m.select(
        "l_returnflag",
        F.col("nn").cast("long").alias("n"),
        F.round(det0 / det / 100.0, 6).alias("intercept"),
        F.round(det1 / det, 6).alias("coef_qty"),
        F.round(det2 / det, 6).alias("coef_disc"),
    )


# PCA projection (closed-form 2x2 eigen) --------------------------------------------


@register(
    "pca_project",
    """
    WITH p AS (
      SELECT event_id,
             CAST(event_id * 7919 % 2000 AS BIGINT) AS ix,
             CAST(event_id * 104729 % 2400 AS BIGINT) AS iy
      FROM events
    ),
    m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(ix AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(sum(CAST(iy AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(sum(CAST(ix AS HUGEINT) * CAST(ix AS HUGEINT)) AS HUGEINT) AS sxx,
             CAST(sum(CAST(ix AS HUGEINT) * CAST(iy AS HUGEINT)) AS HUGEINT) AS sxy,
             CAST(sum(CAST(iy AS HUGEINT) * CAST(iy AS HUGEINT)) AS HUGEINT) AS syy
      FROM p
    ),
    eig AS (
      SELECT n,
             CAST(n * sxx - sx * sx AS DOUBLE) AS ad,
             CAST(n * syy - sy * sy AS DOUBLE) AS bd,
             CAST(n * sxy - sx * sy AS DOUBLE) AS cd,
             (n * sxy - sx * sy) = 0 AS c_zero,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
             CAST(n AS DOUBLE) AS nd
      FROM m
    ),
    ax AS (
      SELECT *,
             ((ad + bd) + sqrt((ad - bd) * (ad - bd) + 4.0 * cd * cd)) / 2.0 AS l1,
             ((ad + bd) - sqrt((ad - bd) * (ad - bd) + 4.0 * cd * cd)) / 2.0 AS l2
      FROM eig
    ),
    v AS (
      SELECT *,
             CASE WHEN c_zero THEN CASE WHEN ad >= bd THEN 1.0 ELSE 0.0 END
                  ELSE cd END AS v1x,
             CASE WHEN c_zero THEN CASE WHEN ad >= bd THEN 0.0 ELSE 1.0 END
                  ELSE l1 - ad END AS v1y
      FROM ax
    ),
    u AS (SELECT *, sqrt(v1x * v1x + v1y * v1y) AS nrm FROM v)
    SELECT p.event_id,
           round(((nd * p.ix - sxd) * v1x + (nd * p.iy - syd) * v1y)
                 / (nd * nrm) / 100.0, 6) AS pc1,
           round((-(nd * p.ix - sxd) * v1y + (nd * p.iy - syd) * v1x)
                 / (nd * nrm) / 100.0, 6) AS pc2,
           round(l1 / (l1 + l2), 6) AS evr1
    FROM p CROSS JOIN u
    """,
    doc=(
        "PCA of the detection point cloud by closed-form 2x2 eigen "
        "decomposition: covariance moments are EXACT 128-bit integers "
        "over the centidegree lattice (n*Sxx - Sx^2 etc.), the principal "
        "axis comes from the symmetric-eigen identity v1 = (c, l1 - a) "
        "(no atan2/cos/sin — the one irrational is IEEE-correctly-rounded "
        "sqrt, so both engines emit bit-identical doubles), and every "
        "point is projected to (pc1, pc2) scores in degree units plus the "
        "explained-variance ratio — the distributed dimensionality-"
        "reduction pattern: one bounded agg, one scalar broadcast back "
        "over the stream; the c = 0 degenerate (axis-aligned cloud) takes "
        "the exact-integer CASE branch identically on both engines"
    ),
)
def pca_project(spark, sf_dir):
    """ONE 6-number moment agg (partial-agg shuffle to a single row),
    eigen algebra on the one-row frame, then a scalar-broadcast crossJoin
    projecting the full stream map-side — no second shuffle, O(1) driver
    state. The d-dimensional generalization keeps the same shape (the
    Gram agg is d^2 numbers; the solve stays on the aggregated frame)."""
    ev = _t(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    p = ev.select(
        "event_id",
        (F.col("event_id") * 7919 % 2000).alias("ix"),
        (F.col("event_id") * 104729 % 2400).alias("iy"),
    )
    ix, iy = F.col("ix").cast(d38), F.col("iy").cast(d38)
    m = p.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(ix).cast(d38).alias("sx"),
        F.sum(iy).cast(d38).alias("sy"),
        F.sum(ix * ix).cast(d38).alias("sxx"),
        F.sum(ix * iy).cast(d38).alias("sxy"),
        F.sum(iy * iy).cast(d38).alias("syy"),
    )
    eig = m.select(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double").alias("ad"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double").alias("bd"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double").alias("cd"),
        ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) == 0).alias("c_zero"),
        F.col("sx").cast("double").alias("sxd"),
        F.col("sy").cast("double").alias("syd"),
        F.col("n").cast("double").alias("nd"),
    )
    disc = F.sqrt(
        (F.col("ad") - F.col("bd")) * (F.col("ad") - F.col("bd"))
        + 4.0 * F.col("cd") * F.col("cd")
    )
    ax = eig.select(
        "*",
        (((F.col("ad") + F.col("bd")) + disc) / 2.0).alias("l1"),
        (((F.col("ad") + F.col("bd")) - disc) / 2.0).alias("l2"),
    )
    v = ax.select(
        "*",
        F.when(F.col("c_zero"), F.when(F.col("ad") >= F.col("bd"), 1.0).otherwise(0.0))
        .otherwise(F.col("cd"))
        .alias("v1x"),
        F.when(F.col("c_zero"), F.when(F.col("ad") >= F.col("bd"), 0.0).otherwise(1.0))
        .otherwise(F.col("l1") - F.col("ad"))
        .alias("v1y"),
    )
    u = v.select(
        "*", F.sqrt(F.col("v1x") * F.col("v1x") + F.col("v1y") * F.col("v1y")).alias("nrm")
    )
    ux = F.col("nd") * F.col("ix") - F.col("sxd")
    uy = F.col("nd") * F.col("iy") - F.col("syd")
    return p.crossJoin(F.broadcast(u)).select(
        "event_id",
        F.round((ux * F.col("v1x") + uy * F.col("v1y")) / (F.col("nd") * F.col("nrm")) / 100.0, 6).alias("pc1"),
        F.round((-ux * F.col("v1y") + uy * F.col("v1x")) / (F.col("nd") * F.col("nrm")) / 100.0, 6).alias("pc2"),
        F.round(F.col("l1") / (F.col("l1") + F.col("l2")), 6).alias("evr1"),
    )


# Mutual information of the (source, lang) contingency ------------------------------


@register(
    "mutual_information",
    """
    WITH c AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS c_xy
      FROM documents GROUP BY source, lang
    ),
    mx AS (SELECT source, CAST(sum(c_xy) AS BIGINT) AS c_x FROM c GROUP BY source),
    my AS (SELECT lang, CAST(sum(c_xy) AS BIGINT) AS c_y FROM c GROUP BY lang),
    t AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n FROM c),
    terms AS (
      SELECT c.source, c.lang, c.c_xy, mx.c_x, my.c_y, t.n,
             ln(CAST(t.n * c.c_xy AS DOUBLE) / (CAST(mx.c_x AS DOUBLE) * CAST(my.c_y AS DOUBLE))) AS pmi,
             CAST(c.c_xy AS DOUBLE) / t.n
               * ln(CAST(t.n * c.c_xy AS DOUBLE) / (CAST(mx.c_x AS DOUBLE) * CAST(my.c_y AS DOUBLE))) AS contrib
      FROM c JOIN mx ON mx.source = c.source
             JOIN my ON my.lang = c.lang
             CROSS JOIN t
    ),
    tot AS (SELECT sum(contrib) AS mi FROM terms)
    SELECT source, lang, c_xy,
           round(CAST(c_xy AS DOUBLE) / n, 6) AS p_xy,
           round(pmi, 6) AS pmi,
           round(contrib, 6) AS contrib,
           round(tot.mi, 6) AS mi_total
    FROM terms CROSS JOIN tot
    """,
    doc=(
        "mutual information I(source; lang) over the document corpus with "
        "its full per-cell decomposition: joint/marginal counts are exact "
        "BIGINTs (every ln argument is a ratio of exact integers, so both "
        "engines feed identical doubles), each contingency cell reports "
        "its probability, pointwise MI and contribution, and the total MI "
        "rides along as the one order-sensitive double sum (6-dp rounded) "
        "— the dependence-strength diagnostic between two categorical "
        "columns (is the crawl source informative about language?), the "
        "per-cell terms showing WHERE the association lives, beside "
        "jsd_divergence's distribution distance and pmi_pairs' "
        "co-occurrence lift"
    ),
)
def mutual_information(spark, sf_dir):
    """ONE partial-agg shuffle to the O(|sources| x |langs|) cell frame;
    marginals and the total are re-aggregations of that tiny frame
    (persisted — four downstream references), broadcast back onto it.
    Nothing after the first exchange scales with the corpus."""
    docs = _t(spark, sf_dir, "documents")
    c = _persist_evict(
        docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c_xy"))
    )
    mx = c.groupBy("source").agg(F.sum("c_xy").alias("c_x"))
    my = c.groupBy("lang").agg(F.sum("c_xy").alias("c_y"))
    t = c.agg(F.sum("c_xy").alias("n"))
    pmi = F.log(
        (F.col("n") * F.col("c_xy")).cast("double")
        / (F.col("c_x").cast("double") * F.col("c_y").cast("double"))
    )
    terms = _persist_evict(
        c.join(F.broadcast(mx), "source")
        .join(F.broadcast(my), "lang")
        .crossJoin(F.broadcast(t))
        .select(
            "source", "lang", "c_xy", "n",
            pmi.alias("pmi"),
            (F.col("c_xy").cast("double") / F.col("n") * pmi).alias("contrib"),
        )
    )
    tot = terms.agg(F.sum("contrib").alias("mi"))
    return terms.crossJoin(F.broadcast(tot)).select(
        "source", "lang", "c_xy",
        F.round(F.col("c_xy").cast("double") / F.col("n"), 6).alias("p_xy"),
        F.round("pmi", 6).alias("pmi"),
        F.round("contrib", 6).alias("contrib"),
        F.round("mi", 6).alias("mi_total"),
    )


# Chi-square feature selection (token vs language) -----------------------------------

_CHI2_MIN_DF = 20  # document-frequency floor for a token to be scored
_CHI2_TOP_K = 15  # features kept per language


@register(
    "chi2_features",
    f"""
    WITH dt AS (
      SELECT DISTINCT doc_id, lang, tok FROM (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        FROM documents
      ) WHERE tok <> ''
    ),
    nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM documents),
    nl AS (
      SELECT lang, CAST(count(*) AS HUGEINT) AS n_l FROM documents GROUP BY lang
    ),
    df AS (
      SELECT tok, CAST(count(*) AS HUGEINT) AS df_t
      FROM (SELECT DISTINCT doc_id, tok FROM dt) GROUP BY tok
      HAVING count(*) >= {_CHI2_MIN_DF}
    ),
    a AS (
      SELECT tok, lang, CAST(count(*) AS HUGEINT) AS a FROM dt GROUP BY tok, lang
    ),
    x2 AS (
      SELECT a.lang, a.tok, a.a, df.df_t, nl.n_l, nn.n,
             CAST(nn.n * (a.a * (nn.n - nl.n_l - (df.df_t - a.a))
                          - (df.df_t - a.a) * (nl.n_l - a.a))
                       * (a.a * (nn.n - nl.n_l - (df.df_t - a.a))
                          - (df.df_t - a.a) * (nl.n_l - a.a)) AS DOUBLE)
             / CAST(df.df_t * (nn.n - df.df_t) * nl.n_l * (nn.n - nl.n_l) AS DOUBLE)
               AS chi2_raw
      FROM a JOIN df ON df.tok = a.tok
             JOIN nl ON nl.lang = a.lang
             CROSS JOIN nn
    )
    SELECT lang, tok, CAST(a AS BIGINT) AS df_in_lang,
           CAST(df_t AS BIGINT) AS df_total,
           round(chi2_raw, 6) AS chi2, rnk
    FROM (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY lang ORDER BY chi2_raw DESC, tok) AS BIGINT) AS rnk
      FROM x2
    ) WHERE rnk <= {_CHI2_TOP_K}
    """,
    doc=(
        "chi-square feature selection: for every (token, language) pair "
        f"with document frequency >= {_CHI2_MIN_DF}, the 2x2 presence "
        "contingency chi2 statistic n(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)) "
        "with ALL products 128-bit-integer exact before the single double "
        f"division, ranked to the top {_CHI2_TOP_K} features per language "
        "(deterministic (chi2 desc, token) order) — the classic "
        "supervised vocabulary-selection op a training pipeline runs to "
        "find language-discriminative tokens, beside tfidf_topterms' "
        "unsupervised salience"
    ),
)
def chi2_features(spark, sf_dir):
    """Explode -> per-doc-distinct tokens (ONE dedup shuffle), then three
    bounded partial aggs (corpus total, per-lang, per-token DF with the "
    floor pushed into the agg) joined back broadcast; the ranking is a
    WindowGroupLimit on the O(scored features) frame, never on rows."""
    docs = _t(spark, sf_dir, "documents")
    d38 = "decimal(38,0)"
    dt = _persist_evict(
        docs.select(
            "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    nn = docs.agg(F.count(F.lit(1)).cast(d38).alias("n"))
    nl = docs.groupBy("lang").agg(F.count(F.lit(1)).cast(d38).alias("n_l"))
    df = (
        dt.select("doc_id", "tok")
        .distinct()
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast(d38).alias("df_t"))
        .filter(F.col("df_t") >= _CHI2_MIN_DF)
    )
    a = dt.groupBy("tok", "lang").agg(F.count(F.lit(1)).cast(d38).alias("a"))
    dd = F.col("n") - F.col("n_l") - (F.col("df_t") - F.col("a"))
    adbc = F.col("a") * dd - (F.col("df_t") - F.col("a")) * (F.col("n_l") - F.col("a"))
    x2 = (
        a.join(df, "tok")
        .join(F.broadcast(nl), "lang")
        .crossJoin(F.broadcast(nn))
        .select(
            "lang", "tok", "a", "df_t",
            (
                (F.col("n") * adbc * adbc).cast("double")
                / (
                    F.col("df_t") * (F.col("n") - F.col("df_t"))
                    * F.col("n_l") * (F.col("n") - F.col("n_l"))
                ).cast("double")
            ).alias("chi2_raw"),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.desc("chi2_raw"), F.asc("tok"))
    return (
        x2.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _CHI2_TOP_K)
        .select(
            "lang", "tok",
            F.col("a").cast("long").alias("df_in_lang"),
            F.col("df_t").cast("long").alias("df_total"),
            F.round("chi2_raw", 6).alias("chi2"),
            "rnk",
        )
    )


# Hurst exponent via rescaled-range (R/S) analysis ----------------------------------

_HURST_WS = (4, 8, 16)  # R/S window sizes, days (corpus spans ~30)
_HURST_LNW = tuple(__import__("math").log(w) for w in _HURST_WS)


def _hurst_slope_sql(ys: list[str]) -> str:
    """3-point OLS slope of y vs the fixed ln(w) abscissae, fully inlined
    (no aggregate, so no merge-order float drift): the same literal
    ln-width constants are rendered into both dialects."""
    xs = [repr(x) for x in _HURST_LNW]
    n = len(xs)
    sx = f"({' + '.join(xs)})"
    sxx = f"({' + '.join(f'{x} * {x}' for x in xs)})"
    sxy = f"({' + '.join(f'{x} * ({y})' for x, y in zip(xs, ys))})"
    sy = f"({' + '.join(f'({y})' for y in ys)})"
    return f"({n} * {sxy} - {sx} * {sy}) / ({n} * {sxx} - {sx} * {sx})"


@register(
    "hurst_exponent",
    f"""
    WITH b AS (SELECT event_type, epoch_ms(ts) AS t_ms FROM events),
    bounds AS (
      SELECT min(t_ms) AS t0,
             CAST((max(t_ms) - min(t_ms)) // 86400000 + 1 AS BIGINT) AS days
      FROM b
    ),
    z AS (
      SELECT event_type, CAST((t_ms - t0) // 86400000 AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS z
      FROM b CROSS JOIN bounds GROUP BY 1, 2
    ),
    types AS (SELECT DISTINCT event_type FROM b),
    grid AS (
      SELECT event_type, unnest(range(0, days)) AS day
      FROM types CROSS JOIN bounds
    ),
    series AS (
      SELECT g.event_type, g.day, coalesce(z.z, 0) AS z
      FROM grid g LEFT JOIN z ON z.event_type = g.event_type AND z.day = g.day
    ),
    blk AS (
      SELECT s.event_type, w.w, s.day // w.w AS block, s.day % w.w AS k, s.z
      FROM series s
      CROSS JOIN (SELECT unnest([{', '.join(str(w) for w in _HURST_WS)}]) AS w) w
      CROSS JOIN bounds
      WHERE (s.day // w.w + 1) * w.w <= bounds.days
    ),
    cum AS (
      SELECT event_type, w, block, k, z,
             sum(z) OVER (PARTITION BY event_type, w, block
                          ORDER BY k ROWS UNBOUNDED PRECEDING) AS cz,
             sum(z) OVER (PARTITION BY event_type, w, block) AS bsum,
             sum(z * z) OVER (PARTITION BY event_type, w, block) AS szz
      FROM blk
    ),
    bstat AS (
      SELECT event_type, w, block,
             CAST(max(bsum) AS BIGINT) AS bsum, CAST(max(szz) AS BIGINT) AS szz,
             CAST(max(w * cz - (k + 1) * bsum)
                  - min(w * cz - (k + 1) * bsum) AS BIGINT) AS rw
      FROM cum GROUP BY 1, 2, 3
    ),
    rs AS (
      SELECT event_type, w,
             avg(CAST(rw AS DOUBLE) / sqrt(CAST(w * szz - bsum * bsum AS DOUBLE))) AS rsw
      FROM bstat WHERE w * szz - bsum * bsum > 0 GROUP BY 1, 2
    ),
    piv AS (
      SELECT event_type,
             round(max(CASE WHEN w = {_HURST_WS[0]} THEN rsw END), 6) AS rs4,
             round(max(CASE WHEN w = {_HURST_WS[1]} THEN rsw END), 6) AS rs8,
             round(max(CASE WHEN w = {_HURST_WS[2]} THEN rsw END), 6) AS rs16
      FROM rs GROUP BY 1
    )
    SELECT event_type, rs4, rs8, rs16,
           round({_hurst_slope_sql(['ln(rs4)', 'ln(rs8)', 'ln(rs16)'])}, 6) AS hurst
    FROM piv
    """,
    doc=(
        "Hurst exponent of each event type's daily-count series by "
        "rescaled-range analysis: zero-filled day grid, complete blocks "
        f"of w in {_HURST_WS} days, per-block range of cumulative "
        "deviations computed as the EXACT integer w*cumsum_k - (k+1)*"
        "blocksum (so R and the variance radicand are BIGINT-exact and "
        "parallelism-independent), R/S averaged per width (the one "
        "order-sensitive double mean, 6-dp rounded), and H fitted as the "
        "3-point ln-ln slope over the ROUNDED R/S values so both engines "
        "feed identical inputs — the long-range-dependence diagnostic "
        "(H > 0.5 persistent, < 0.5 mean-reverting) beside "
        "burstiness_index's inter-event view"
    ),
)
def hurst_exponent(spark, sf_dir):
    """Day counts: ONE partial-agg shuffle. The zero-filled grid is
    types x days x |widths| (bounded by the calendar span, not the row
    count) built map-side from a sequence explode; block stats ride one
    window exchange on (type, w, block); everything after is O(types).
    At a 100 TB span the day-count agg still reduces the stream to
    O(types x days) before any window work."""
    ev = _t(spark, sf_dir, "events")
    b = ev.select("event_type", F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"))
    b = _persist_evict(b)
    bounds = b.agg(
        F.min("t_ms").alias("t0"),
        (((F.max("t_ms") - F.min("t_ms")) / 86400000).cast("long") + 1).alias("days"),
    )
    z = (
        b.crossJoin(F.broadcast(bounds))
        .select("event_type", ((F.col("t_ms") - F.col("t0")) / 86400000).cast("long").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("z"))
    )
    types = b.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(bounds))
        .select("event_type", F.explode(F.sequence(F.lit(0), F.col("days") - 1)).alias("day"))
    )
    series = grid.join(z, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("z", F.lit(0)).alias("z")
    )
    ws = spark.createDataFrame([(w,) for w in _HURST_WS], "w int")
    blk = (
        series.crossJoin(F.broadcast(ws))
        .crossJoin(F.broadcast(bounds))
        .filter((F.floor(F.col("day") / F.col("w")) + 1) * F.col("w") <= F.col("days"))
        .select(
            "event_type", "w",
            F.floor(F.col("day") / F.col("w")).alias("block"),
            (F.col("day") % F.col("w")).alias("k"),
            "z",
        )
    )
    wp = Window.partitionBy("event_type", "w", "block")
    cum = blk.select(
        "event_type", "w", "block", "k", "z",
        F.sum("z").over(wp.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)).alias("cz"),
        F.sum("z").over(wp).alias("bsum"),
        F.sum(F.col("z") * F.col("z")).over(wp).alias("szz"),
    )
    y = F.col("w") * F.col("cz") - (F.col("k") + 1) * F.col("bsum")
    bstat = cum.groupBy("event_type", "w", "block").agg(
        F.max("bsum").alias("bsum"),
        F.max("szz").alias("szz"),
        (F.max(y) - F.min(y)).cast("long").alias("rw"),
    )
    rad = F.col("w") * F.col("szz") - F.col("bsum") * F.col("bsum")
    rs = (
        bstat.filter(rad > 0)
        .groupBy("event_type", "w")
        .agg(F.avg(F.col("rw").cast("double") / F.sqrt(rad.cast("double"))).alias("rsw"))
    )
    piv = rs.groupBy("event_type").agg(
        F.round(F.max(F.when(F.col("w") == _HURST_WS[0], F.col("rsw"))), 6).alias("rs4"),
        F.round(F.max(F.when(F.col("w") == _HURST_WS[1], F.col("rsw"))), 6).alias("rs8"),
        F.round(F.max(F.when(F.col("w") == _HURST_WS[2], F.col("rsw"))), 6).alias("rs16"),
    )
    xs, n = _HURST_LNW, len(_HURST_WS)
    ys = [F.log(F.col(c)) for c in ("rs4", "rs8", "rs16")]
    sx = sum(xs)
    sxx = sum(x * x for x in xs)
    sxy = xs[0] * ys[0] + xs[1] * ys[1] + xs[2] * ys[2]
    sy = ys[0] + ys[1] + ys[2]
    return piv.select(
        "event_type", "rs4", "rs8", "rs16",
        F.round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6).alias("hurst"),
    )


# Local clustering coefficient -------------------------------------------------------

_LC_E_SQL = f"""
      SELECT DISTINCT least(l_orderkey % {_KC_N}, l_partkey % {_KC_N}) AS u,
             greatest(l_orderkey % {_KC_N}, l_partkey % {_KC_N}) AS v
      FROM lineitem
      WHERE l_orderkey % {_KC_N} <> l_partkey % {_KC_N}
"""


def _lc_edges(spark, sf_dir) -> DataFrame:
    """Spark twin of ``_LC_E_SQL``: canonical u<v edges on the sparse
    {_KC_N}-node graph (~6 avg degree, so clustering/truss statistics are
    non-degenerate, unlike the near-complete {_PR_N}-node pagerank graph)."""
    li = _t(spark, sf_dir, "lineitem")
    sa = F.col("l_orderkey") % _KC_N
    sb = F.col("l_partkey") % _KC_N
    return (
        li.filter(sa != sb)
        .select(F.least(sa, sb).alias("u"), F.greatest(sa, sb).alias("v"))
        .distinct()
    )


@register(
    "local_clustering",
    f"""
    WITH e AS ({_LC_E_SQL}),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
        SELECT u AS node FROM e UNION ALL SELECT v FROM e
      ) GROUP BY node
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    tcnt AS (
      SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT d.node, d.degree, CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_tri,
           round(CAST(2 * coalesce(t.n_tri, 0) AS DOUBLE)
                 / nullif(CAST(d.degree * (d.degree - 1) AS DOUBLE), 0.0), 6) AS cc
    FROM deg d LEFT JOIN tcnt t ON t.node = d.node
    """,
    doc=(
        "local clustering coefficient per node: cc(v) = 2*tri(v) / "
        "(deg(v)*(deg(v)-1)) over the sparse co-purchase graph — the "
        "how-cliquish-is-my-neighborhood statistic (triangle_count gives "
        "the raw counts; this normalizes them into the comparable [0,1] "
        "transitivity measure a fraud/community pipeline thresholds on); "
        "degree-1 nodes report NULL via the nullif guard identically on "
        "both engines, every count BIGINT-exact"
    ),
)
def local_clustering(spark, sf_dir):
    """Persisted canonical edge set (five references: degree explode + two
    wedge sides + closer), ONE triangle enumeration (two equi-joins), "
    constant 3x corner fan-out, two partial-agg groupBys, and a final
    broadcast-size join of the two O(nodes) frames. At real scale the
    wedge join follows degree orientation (the triangle_count note)."""
    e = _persist_evict(_lc_edges(spark, sf_dir))
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    tcnt = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    return deg.join(tcnt, "node", "left").select(
        "node",
        "degree",
        F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri"),
        F.round(
            (2 * F.coalesce("n_tri", F.lit(0))).cast("double")
            / F.nullif((F.col("degree") * (F.col("degree") - 1)).cast("double"), F.lit(0.0)),
            6,
        ).alias("cc"),
    )


# Modularity of a fixed partition ----------------------------------------------------

_MOD_K = 8  # community count of the evaluated hash partition


@register(
    "modularity_score",
    f"""
    WITH e AS ({_LC_E_SQL}),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
    deg AS (
      SELECT node, node % {_MOD_K} AS comm, CAST(count(*) AS BIGINT) AS degree
      FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      GROUP BY node
    ),
    dc AS (
      SELECT comm, CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(degree) AS BIGINT) AS d_sum
      FROM deg GROUP BY comm
    ),
    ec AS (
      SELECT u % {_MOD_K} AS comm, CAST(count(*) AS BIGINT) AS e_in
      FROM e WHERE u % {_MOD_K} = v % {_MOD_K} GROUP BY 1
    ),
    terms AS (
      SELECT dc.comm, dc.n_nodes, CAST(coalesce(ec.e_in, 0) AS BIGINT) AS e_in,
             dc.d_sum, m.m,
             CAST(coalesce(ec.e_in, 0) AS DOUBLE) / m.m
               - (CAST(dc.d_sum AS DOUBLE) / (2 * m.m))
                 * (CAST(dc.d_sum AS DOUBLE) / (2 * m.m)) AS contrib
      FROM dc LEFT JOIN ec ON ec.comm = dc.comm CROSS JOIN m
    ),
    q AS (SELECT sum(contrib) AS q FROM terms)
    SELECT comm, n_nodes, e_in, d_sum,
           round(contrib, 6) AS contrib, round(q.q, 6) AS q_total
    FROM terms CROSS JOIN q
    """,
    doc=(
        f"Newman modularity of a {_MOD_K}-way node partition over the "
        "sparse co-purchase graph: per community the intra-edge count, "
        "degree volume, and contribution e_c/m - (d_c/2m)^2, plus the "
        "total Q — the evaluate-a-community-detection op (in production "
        "the partition column comes from label_propagation / "
        "dup_components; the hash partition here pins a deterministic "
        "oracle and exercises the identical plan); counts BIGINT-exact, "
        "Q the one order-sensitive 8-term double sum (6-dp rounded)"
    ),
)
def modularity_score(spark, sf_dir):
    """Edge set persisted (degree explode + intra-edge filter), two
    partial-agg shuffles to O(communities) frames, one scalar broadcast —
    the modularity evaluation never shuffles anything wider than the
    community rollup regardless of graph size."""
    e = _persist_evict(_lc_edges(spark, sf_dir))
    m = e.agg(F.count(F.lit(1)).alias("m"))
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .select("node", (F.col("node") % _MOD_K).alias("comm"), "degree")
    )
    dc = deg.groupBy("comm").agg(
        F.count(F.lit(1)).alias("n_nodes"), F.sum("degree").alias("d_sum")
    )
    ec = (
        e.filter(F.col("u") % _MOD_K == F.col("v") % _MOD_K)
        .groupBy((F.col("u") % _MOD_K).alias("comm"))
        .agg(F.count(F.lit(1)).alias("e_in"))
    )
    half = F.col("d_sum").cast("double") / (2 * F.col("m"))
    terms = _persist_evict(
        dc.join(F.broadcast(ec), "comm", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "comm", "n_nodes",
            F.coalesce("e_in", F.lit(0)).cast("long").alias("e_in"),
            "d_sum",
            (F.coalesce("e_in", F.lit(0)).cast("double") / F.col("m") - half * half).alias("contrib"),
        )
    )
    q = terms.agg(F.sum("contrib").alias("q"))
    return terms.crossJoin(F.broadcast(q)).select(
        "comm", "n_nodes", "e_in", "d_sum",
        F.round("contrib", 6).alias("contrib"),
        F.round("q", 6).alias("q_total"),
    )


# Power-law degree exponent (Clauset continuous MLE) ---------------------------------

_PL_DMIN = 5  # tail threshold


@register(
    "powerlaw_alpha",
    f"""
    WITH e AS ({_LC_E_SQL}),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
        SELECT u AS node FROM e UNION ALL SELECT v FROM e
      ) GROUP BY node
    ),
    tail AS (SELECT degree FROM deg WHERE degree >= {_PL_DMIN}),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_tail,
             sum(ln(CAST(degree AS DOUBLE) / {_PL_DMIN - 0.5!r})) AS lnsum
      FROM tail
    ),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
    SELECT t.n_nodes, s.n_tail, CAST({_PL_DMIN} AS BIGINT) AS dmin,
           round(CAST(s.n_tail AS DOUBLE) / t.n_nodes, 6) AS tail_share,
           round(1.0 + CAST(s.n_tail AS DOUBLE) / s.lnsum, 6) AS alpha
    FROM s CROSS JOIN t
    """,
    doc=(
        "power-law degree-distribution exponent by the continuous Clauset "
        f"MLE alpha = 1 + n / sum ln(d / (dmin - 1/2)) over the degree >= "
        f"{_PL_DMIN} tail — the scale-free-ness diagnostic that decides "
        "whether skew mitigation (salting, degree-orientation) is needed "
        "before the heavy graph joins; every ln argument is an exact "
        "integer over an exact literal, the lnsum the one order-sensitive "
        "double sum feeding a 6-dp-rounded scalar"
    ),
)
def powerlaw_alpha(spark, sf_dir):
    """Degree histogram: ONE partial-agg shuffle; the MLE runs on two
    one-row aggregates cross-joined broadcast. O(1) output."""
    e = _persist_evict(_lc_edges(spark, sf_dir))
    deg = _persist_evict(
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    s = deg.filter(F.col("degree") >= _PL_DMIN).agg(
        F.count(F.lit(1)).alias("n_tail"),
        F.sum(F.log(F.col("degree").cast("double") / (_PL_DMIN - 0.5))).alias("lnsum"),
    )
    t = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    return s.crossJoin(F.broadcast(t)).select(
        "n_nodes", "n_tail", F.lit(_PL_DMIN).cast("long").alias("dmin"),
        F.round(F.col("n_tail").cast("double") / F.col("n_nodes"), 6).alias("tail_share"),
        F.round(1.0 + F.col("n_tail").cast("double") / F.col("lnsum"), 6).alias("alpha"),
    )


# Directed reciprocity ----------------------------------------------------------------


@register(
    "reciprocity",
    f"""
    WITH d AS (
      SELECT DISTINCT l_orderkey % {_KC_N} AS s, l_partkey % {_KC_N} AS t
      FROM lineitem
      WHERE l_orderkey % {_KC_N} <> l_partkey % {_KC_N}
    ),
    r AS (
      SELECT d.s, d.t,
             CASE WHEN b.s IS NULL THEN 0 ELSE 1 END AS recip
      FROM d LEFT JOIN d b ON b.s = d.t AND b.t = d.s
    ),
    outdeg AS (
      SELECT s AS node, CAST(count(*) AS BIGINT) AS out_deg,
             CAST(sum(recip) AS BIGINT) AS n_recip
      FROM r GROUP BY s
    ),
    indeg AS (SELECT t AS node, CAST(count(*) AS BIGINT) AS in_deg FROM d GROUP BY t)
    SELECT o.node, o.out_deg, CAST(coalesce(i.in_deg, 0) AS BIGINT) AS in_deg,
           o.n_recip,
           round(CAST(o.n_recip AS DOUBLE) / o.out_deg, 6) AS recip_share
    FROM outdeg o LEFT JOIN indeg i ON i.node = o.node
    """,
    doc=(
        "per-node reciprocity of the DIRECTED order->part graph: for "
        "every node its out/in degree, the count of out-edges whose "
        "reverse edge exists (one self-join on the swapped key), and the "
        "reciprocated share — the directed-graph symmetry diagnostic "
        "(the undirected ops above assume symmetry; this measures it); "
        "pure integer counting"
    ),
)
def reciprocity(spark, sf_dir):
    """Distinct directed edges (one dedup shuffle, persisted — probe +
    build + in-degree), reverse-edge existence via a self equi-join on the
    swapped composite key, then two partial-agg rollups to O(nodes)."""
    li = _t(spark, sf_dir, "lineitem")
    s, t = F.col("l_orderkey") % _KC_N, F.col("l_partkey") % _KC_N
    d = _persist_evict(
        li.filter(s != t).select(s.alias("s"), t.alias("t")).distinct()
    )
    b = d.select(F.col("s").alias("t"), F.col("t").alias("s"), F.lit(1).alias("has_rev"))
    r = d.join(b, ["s", "t"], "left").select(
        "s", "t", F.coalesce("has_rev", F.lit(0)).alias("recip")
    )
    outdeg = r.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg"), F.sum("recip").alias("n_recip")
    )
    indeg = d.groupBy(F.col("t").alias("node")).agg(F.count(F.lit(1)).alias("in_deg"))
    return outdeg.join(indeg, "node", "left").select(
        "node", "out_deg",
        F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
        F.col("n_recip").cast("long").alias("n_recip"),
        F.round(F.col("n_recip").cast("double") / F.col("out_deg"), 6).alias("recip_share"),
    )


# k-truss (fixed-round edge peeling on triangle support) ------------------------------

_TRUSS_N = 1000  # node space: ~113 avg degree -> ~13 mean support, peeling bites
_TRUSS_K = 10  # truss order: edges need >= k-2 = 8 supporting triangles
_TRUSS_ROUNDS = 2  # fixed peeling rounds (k_core's unrolled-oracle idiom)


def _truss_oracle_sql() -> str:
    """Unrolled support-peeling: e{r} = edges of e{r-1} with >= K-2
    triangles in the e{r-1}-induced graph; output = surviving edges with
    their final induced support (recomputed on the survivor set)."""
    head = f"""
    WITH e0 AS (
      SELECT DISTINCT least(l_orderkey % {_TRUSS_N}, l_partkey % {_TRUSS_N}) AS u,
             greatest(l_orderkey % {_TRUSS_N}, l_partkey % {_TRUSS_N}) AS v
      FROM lineitem
      WHERE l_orderkey % {_TRUSS_N} <> l_partkey % {_TRUSS_N}
    )"""
    steps = []
    for r in range(_TRUSS_ROUNDS + 1):
        steps.append(f"""
    tri{r} AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e{r} e1
      JOIN e{r} e2 ON e2.u = e1.v
      JOIN e{r} e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    supp{r} AS (
      SELECT u, v, CAST(count(*) AS BIGINT) AS supp FROM (
        SELECT a AS u, b AS v FROM tri{r}
        UNION ALL SELECT b, c FROM tri{r}
        UNION ALL SELECT a, c FROM tri{r}
      ) GROUP BY u, v
    )""")
        if r < _TRUSS_ROUNDS:
            steps.append(f"""
    e{r + 1} AS (
      SELECT u, v FROM supp{r} WHERE supp >= {_TRUSS_K - 2}
    )""")
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT e.u, e.v, CAST(coalesce(s.supp, 0) AS BIGINT) AS support
    FROM e{_TRUSS_ROUNDS} e
    LEFT JOIN supp{_TRUSS_ROUNDS} s ON s.u = e.u AND s.v = e.v"""
    )


@register(
    "k_truss",
    _truss_oracle_sql(),
    doc=(
        f"k-truss decomposition (k={_TRUSS_K}, fixed {_TRUSS_ROUNDS} "
        "peeling rounds): iteratively remove edges supported by fewer "
        f"than k-2 = {_TRUSS_K - 2} triangles, then report survivors with "
        "their induced support — the EDGE-centric cohesive-subgraph "
        "sibling of k_core's vertex peeling (trusses are the standard "
        "stronger-than-core community seed); each round is one triangle "
        "enumeration (two equi-joins) + a constant 3x edge fan-out + one "
        "integer groupBy, exact end to end"
    ),
)
def k_truss(spark, sf_dir):
    """Per round: persisted survivor edges -> wedge join -> closing join
    -> 3x explode -> per-edge support (partial agg) -> filter — the
    shuffle carries per-edge counts, never wedges. localCheckpoint
    truncates the per-round lineage (the k_core discipline). At real
    scale the wedge join runs degree-oriented (triangle_count note) and
    the support filter is a semi-join pushdown on the next round's
    enumeration."""

    def support(edges: DataFrame) -> DataFrame:
        e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
        e2 = edges.select(F.col("u").alias("b"), F.col("v").alias("c"))
        e3 = edges.select(F.col("u").alias("a"), F.col("v").alias("c"))
        tri = e1.join(e2, "b").join(e3, ["a", "c"])
        pairs = tri.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                    F.struct(F.col("b").alias("u"), F.col("c").alias("v")),
                    F.struct(F.col("a").alias("u"), F.col("c").alias("v")),
                )
            ).alias("e")
        ).select("e.u", "e.v")
        return pairs.groupBy("u", "v").agg(F.count(F.lit(1)).alias("supp"))

    li = _t(spark, sf_dir, "lineitem")
    sa = F.col("l_orderkey") % _TRUSS_N
    sb = F.col("l_partkey") % _TRUSS_N
    e = _persist_evict(
        li.filter(sa != sb)
        .select(F.least(sa, sb).alias("u"), F.greatest(sa, sb).alias("v"))
        .distinct()
    )
    for _ in range(_TRUSS_ROUNDS):
        e = _persist_evict(
            support(e).filter(F.col("supp") >= _TRUSS_K - 2).select("u", "v").localCheckpoint()
        )
    sf = support(e)
    return e.join(sf, ["u", "v"], "left").select(
        "u", "v", F.coalesce("supp", F.lit(0)).cast("long").alias("support")
    )


# DSIR importance weights (hashed-feature log-ratio) ---------------------------------

_DSIR_B = 1024  # hashed feature buckets
_DSIR_TGT = "src0"  # target domain (the importance-resampling target)


@register(
    "dsir_weights",
    f"""
    WITH b AS (
      SELECT doc_id, source,
             {_MD5_60.format(key="tok")} % {_DSIR_B} AS bkt
      FROM (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
        FROM documents
      ) WHERE tok <> ''
    ),
    allb AS (SELECT bkt, CAST(count(*) AS BIGINT) AS a_b FROM b GROUP BY bkt),
    tgtb AS (
      SELECT bkt, CAST(count(*) AS BIGINT) AS t_b FROM b
      WHERE source = '{_DSIR_TGT}' GROUP BY bkt
    ),
    tots AS (
      SELECT CAST(count(*) AS BIGINT) AS a_tot,
             CAST(sum(CASE WHEN source = '{_DSIR_TGT}' THEN 1 ELSE 0 END) AS BIGINT) AS t_tot
      FROM b
    )
    SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
           round(sum(
             ln(CAST(coalesce(t.t_b, 0) + 1 AS DOUBLE) / (tots.t_tot + {_DSIR_B}))
             - ln(CAST(a.a_b + 1 AS DOUBLE) / (tots.a_tot + {_DSIR_B}))
           ), 6) AS logweight
    FROM b
    JOIN allb a ON a.bkt = b.bkt
    LEFT JOIN tgtb t ON t.bkt = b.bkt
    CROSS JOIN tots
    GROUP BY b.doc_id
    """,
    doc=(
        "DSIR (Data Selection via Importance Resampling) document "
        f"weights: tokens hashed to {_DSIR_B} buckets, a unigram bucket "
        f"LM fit on the target domain (source = '{_DSIR_TGT}') and on the "
        "raw corpus with add-one smoothing, and each document scored by "
        "its summed log importance ratio ln p_tgt/p_raw — the "
        "train-distribution-matching selection weight a pretraining "
        "pipeline samples by (Xie et al.; public method); every ln "
        "argument is a ratio of exact integers, the per-doc sum the one "
        "order-sensitive reduction (6-dp rounded)"
    ),
)
def dsir_weights(spark, sf_dir):
    """Token stream hashed map-side; TWO bounded partial aggs (per-bucket
    raw/target counts, at most {_DSIR_B} rows each) broadcast back onto
    the stream; per-doc rollup is ONE partial-agg shuffle on doc_id.
    The hashed-bucket LM is the point of DSIR at scale: model state is
    O(buckets), never O(vocab)."""
    docs = _t(spark, sf_dir, "documents")
    b = _persist_evict(
        docs.select(
            "doc_id", "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .select("doc_id", "source", (_h60("tok") % _DSIR_B).alias("bkt"))
    )
    allb = b.groupBy("bkt").agg(F.count(F.lit(1)).alias("a_b"))
    tgtb = (
        b.filter(F.col("source") == _DSIR_TGT)
        .groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("t_b"))
    )
    tots = b.agg(
        F.count(F.lit(1)).alias("a_tot"),
        F.sum(F.when(F.col("source") == _DSIR_TGT, 1).otherwise(0)).alias("t_tot"),
    )
    term = F.log(
        (F.coalesce("t_b", F.lit(0)) + 1).cast("double") / (F.col("t_tot") + _DSIR_B)
    ) - F.log((F.col("a_b") + 1).cast("double") / (F.col("a_tot") + _DSIR_B))
    return (
        b.join(F.broadcast(allb), "bkt")
        .join(F.broadcast(tgtb), "bkt", "left")
        .crossJoin(F.broadcast(tots))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.round(F.sum(term), 6).alias("logweight"),
        )
    )


# Flesch-style readability ------------------------------------------------------------

_FLESCH_SENT = 15  # synthetic sentence length (corpus has no punctuation)


@register(
    "flesch_reading",
    f"""
    WITH w AS (
      SELECT doc_id, tok,
             greatest(len(regexp_extract_all(tok, '[aeiou]+')), 1) AS syl
      FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      ) WHERE tok <> ''
    ),
    d AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(syl) AS BIGINT) AS n_syll,
             CAST(ceil(CAST(count(*) AS DOUBLE) / {_FLESCH_SENT}) AS BIGINT) AS n_sent
      FROM w GROUP BY doc_id
    )
    SELECT doc_id, n_words, n_syll, n_sent,
           round(206.835
                 - 1.015 * (CAST(n_words AS DOUBLE) / n_sent)
                 - 84.6 * (CAST(n_syll AS DOUBLE) / n_words), 6) AS flesch
    FROM d
    """,
    doc=(
        "Flesch reading-ease per document: syllables counted as vowel "
        "groups (min 1/word, the standard heuristic), sentences as "
        f"ceil(words/{_FLESCH_SENT}) since the synthetic corpus carries "
        "no punctuation (documented convention — with real text the "
        "sentence count comes from the same regexp machinery), score = "
        "206.835 - 1.015 w/s - 84.6 syll/w — the classic readability "
        "quality gate beside gopher_repetition / text_analysis; counts "
        "BIGINT-exact, one double formula per doc"
    ),
)
def flesch_reading(spark, sf_dir):
    """Map-side explode + regexp (JVM codegen, no Python), ONE partial-agg
    shuffle on doc_id, scalar formula on the aggregated frame."""
    docs = _t(spark, sf_dir, "documents")
    w = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .select(
            "doc_id",
            F.greatest(
                F.size(F.regexp_extract_all("tok", F.lit("[aeiou]+"), F.lit(0))),
                F.lit(1),
            ).alias("syl"),
        )
    )
    d = w.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("syl").cast("long").alias("n_syll"),
        F.ceil(F.count(F.lit(1)).cast("double") / _FLESCH_SENT).cast("long").alias("n_sent"),
    )
    return d.select(
        "doc_id", "n_words", "n_syll", "n_sent",
        F.round(
            206.835
            - 1.015 * (F.col("n_words").cast("double") / F.col("n_sent"))
            - 84.6 * (F.col("n_syll").cast("double") / F.col("n_words")),
            6,
        ).alias("flesch"),
    )


# Zipf exponent of the token frequency spectrum ---------------------------------------

_ZIPF_TOP = 100  # ranks fitted


@register(
    "zipf_alpha",
    f"""
    WITH t AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    v AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c FROM t WHERE tok <> '' GROUP BY tok
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_types, CAST(sum(c) AS BIGINT) AS n_tokens
      FROM v
    ),
    r AS (
      SELECT c, CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT) AS rnk
      FROM v
    ),
    top AS (SELECT * FROM r WHERE rnk <= {_ZIPF_TOP}),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(ln(CAST(rnk AS DOUBLE))) AS sx,
             sum(ln(CAST(c AS DOUBLE))) AS sy,
             sum(ln(CAST(rnk AS DOUBLE)) * ln(CAST(rnk AS DOUBLE))) AS sxx,
             sum(ln(CAST(rnk AS DOUBLE)) * ln(CAST(c AS DOUBLE))) AS sxy
      FROM top
    )
    SELECT tot.n_types, tot.n_tokens, CAST({_ZIPF_TOP} AS BIGINT) AS top_r,
           round(-( (m.n * m.sxy - m.sx * m.sy)
                    / (m.n * m.sxx - m.sx * m.sx) ), 6) AS alpha,
           round((m.sy - (m.n * m.sxy - m.sx * m.sy)
                         / (m.n * m.sxx - m.sx * m.sx) * m.sx) / m.n, 6) AS ln_c0
    FROM m CROSS JOIN tot
    """,
    doc=(
        "Zipf exponent of the corpus token-frequency spectrum: vocabulary "
        f"counts, deterministic (count desc, token) ranking, and an OLS "
        f"fit of ln(freq) on ln(rank) over the top {_ZIPF_TOP} ranks — "
        "alpha ~= 1 is the natural-language signature; a corpus whose "
        "spectrum departs hard from Zipf (alpha >> 1: template spam; "
        "alpha << 1: shuffled/garbled) fails the distributional quality "
        "gate; all ln arguments exact integers, the 100-term moment sums "
        "the order-sensitive reduction (6-dp rounded)"
    ),
)
def zipf_alpha(spark, sf_dir):
    """Vocab count: ONE partial-agg shuffle; the ranking window runs on
    the aggregated O(vocab) frame (WindowGroupLimit prunes to the top "
    ranks before the moment agg); the fit is O(1)."""
    docs = _t(spark, sf_dir, "documents")
    v = _persist_evict(
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = v.agg(
        F.count(F.lit(1)).alias("n_types"), F.sum("c").cast("long").alias("n_tokens")
    )
    r = v.select(
        "c",
        F.row_number().over(Window.orderBy(F.desc("c"), F.asc("tok"))).cast("long").alias("rnk"),
    ).filter(F.col("rnk") <= _ZIPF_TOP)
    lx, ly = F.log(F.col("rnk").cast("double")), F.log(F.col("c").cast("double"))
    m = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(lx).alias("sx"),
        F.sum(ly).alias("sy"),
        F.sum(lx * lx).alias("sxx"),
        F.sum(lx * ly).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.crossJoin(F.broadcast(tot)).select(
        "n_types", "n_tokens", F.lit(_ZIPF_TOP).cast("long").alias("top_r"),
        F.round(-slope, 6).alias("alpha"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias("ln_c0"),
    )


# Bigram-LM surprisal -----------------------------------------------------------------


@register(
    "bigram_surprisal",
    """
    WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS a FROM documents),
    bi AS (
      SELECT doc_id, lang, a[i] AS w1, a[i + 1] AS w2
      FROM d CROSS JOIN unnest(range(1, len(a))) AS t(i)
    ),
    cb AS (
      SELECT lang, w1, w2, CAST(count(*) AS BIGINT) AS c2
      FROM bi GROUP BY lang, w1, w2
    ),
    cw AS (
      SELECT lang, w1, CAST(count(*) AS BIGINT) AS c1 FROM bi GROUP BY lang, w1
    )
    SELECT bi.doc_id, CAST(count(*) AS BIGINT) AS n_big,
           round(avg(-ln(CAST(cb.c2 AS DOUBLE) / cw.c1)), 6) AS surprisal
    FROM bi
    JOIN cb ON cb.lang = bi.lang AND cb.w1 = bi.w1 AND cb.w2 = bi.w2
    JOIN cw ON cw.lang = bi.lang AND cw.w1 = bi.w1
    GROUP BY bi.doc_id
    """,
    doc=(
        "bigram-LM surprisal per document: a per-language bigram model "
        "fit on the corpus itself (MLE c(w1,w2)/c(w1*), no smoothing "
        "needed for self-scoring), each document scored by its mean "
        "negative log transition probability — the sequence-aware "
        "perplexity quality filter one order above unigram_logprob "
        "(catches shuffled/boilerplate text a unigram model scores as "
        "normal); ln arguments exact integer ratios, the per-doc mean "
        "the order-sensitive reduction (6-dp rounded)"
    ),
)
def bigram_surprisal(spark, sf_dir):
    """Bigrams built MAP-SIDE with zip-of-slices (no position self-join),
    persisted once (three references: model fit x2 + scoring); the model "
    frames are per-(lang, w1[, w2]) partial aggs joined back on their
    natural keys. At 100 TB the bigram vocab join is the one real
    shuffle; the model frames are ~|bigram types| and shuffle-join on
    the same key layout."""
    docs = _t(spark, sf_dir, "documents")
    a = F.split(F.col("text"), " ")
    n = F.size(a)
    bi = _persist_evict(
        docs.select(
            "doc_id", "lang",
            F.explode(
                F.arrays_zip(
                    F.slice(a, 1, n - 1).alias("w1"),
                    F.slice(a, 2, n - 1).alias("w2"),
                )
            ).alias("p"),
        ).select("doc_id", "lang", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    cb = bi.groupBy("lang", "w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    cw = bi.groupBy("lang", "w1").agg(F.count(F.lit(1)).alias("c1"))
    return (
        bi.join(cb, ["lang", "w1", "w2"])
        .join(cw, ["lang", "w1"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_big"),
            F.round(F.avg(-F.log(F.col("c2").cast("double") / F.col("c1"))), 6).alias("surprisal"),
        )
    )


# n-gram novelty (first-occurrence share) ---------------------------------------------


@register(
    "ngram_novelty",
    """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
    g AS (
      SELECT DISTINCT doc_id,
             a[i] || ' ' || a[i + 1] || ' ' || a[i + 2] AS gram
      FROM d CROSS JOIN unnest(range(1, len(a) - 1)) AS t(i)
    ),
    first_ AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram)
    SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           round(CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS novelty
    FROM g JOIN first_ f ON f.gram = g.gram
    GROUP BY g.doc_id
    """,
    doc=(
        "n-gram novelty per document: the share of a document's distinct "
        "word trigrams whose FIRST corpus occurrence (min doc_id — the "
        "ingestion-order proxy) is this document — the marginal-"
        "contribution signal a dedup/curriculum pipeline uses to rank "
        "near-redundant documents (novelty ~0 = everything seen before, "
        "the soft generalization of exact_dedup), computed as one "
        "min-aggregation over the gram key; pure integer counting"
    ),
)
def ngram_novelty(spark, sf_dir):
    """Trigrams zip-of-slices map-side, per-doc DISTINCT (one dedup
    shuffle on (doc, gram)), first-occurrence via ONE min-agg on the gram
    key, joined back on the same key (co-partitioned exchange reuse),
    per-doc rollup partial-agg. Never materializes pairwise comparisons
    — novelty is the linear-cost complement of the quadratic dup scans."""
    docs = _t(spark, sf_dir, "documents")
    a = F.split(F.col("text"), " ")
    n = F.size(a)
    g = _persist_evict(
        docs.select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(a, 1, n - 2).alias("w1"),
                    F.slice(a, 2, n - 2).alias("w2"),
                    F.slice(a, 3, n - 2).alias("w3"),
                )
            ).alias("p"),
        )
        .select(
            "doc_id",
            F.concat_ws(" ", F.col("p.w1"), F.col("p.w2"), F.col("p.w3")).alias("gram"),
        )
        .distinct()
    )
    first = g.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    return (
        g.join(first, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(novel).cast("long").alias("n_novel"),
            F.round(F.sum(novel).cast("double") / F.count(F.lit(1)), 6).alias("novelty"),
        )
    )


# G-function (nearest-neighbour distance CDF) ----------------------------------------

_GF_CELL = 50  # ring cell size, centidegrees (bounds exact NN search to r <= 50)
_GF_RADII = (5, 10, 20, 50)  # evaluation radii, centidegrees


@register(
    "gfunction_nn",
    f"""
    WITH pts AS (
      SELECT event_id,
             CAST(event_id * 7919 % 2000 AS BIGINT) AS iy,
             CAST(event_id * 104729 % 2400 AS BIGINT) + 1000 AS ix
      FROM events
    ),
    cpts AS (SELECT event_id, iy, ix, iy // {_GF_CELL} AS cy, ix // {_GF_CELL} AS cx FROM pts),
    nn AS (
      SELECT a.event_id,
             min((a.iy - b.iy) * (a.iy - b.iy)
                 + (a.ix - b.ix) * (a.ix - b.ix)) AS mind2
      FROM cpts a JOIN cpts b
        ON abs(a.cy - b.cy) <= 1 AND abs(a.cx - b.cx) <= 1
       AND a.event_id <> b.event_id
      WHERE (a.iy - b.iy) * (a.iy - b.iy)
            + (a.ix - b.ix) * (a.ix - b.ix) <= {_GF_CELL * _GF_CELL}
      GROUP BY a.event_id
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_pts FROM pts),
    radii AS (SELECT unnest([{', '.join(str(r) for r in _GF_RADII)}]) AS r)
    SELECT CAST(radii.r AS BIGINT) AS r_centideg,
           CAST(sum(CASE WHEN nn.mind2 <= radii.r * radii.r THEN 1 ELSE 0 END)
             AS BIGINT) AS n_le,
           round(CAST(sum(CASE WHEN nn.mind2 <= radii.r * radii.r THEN 1 ELSE 0 END)
                   AS DOUBLE) / tot.n_pts, 6) AS g
    FROM radii CROSS JOIN tot LEFT JOIN nn ON true
    GROUP BY radii.r, tot.n_pts
    """,
    doc=(
        "empirical G function (nearest-neighbour distance CDF) of the "
        f"detection cloud at radii {_GF_RADII} centidegrees: NN search is "
        f"an exact {_GF_CELL}-centidegree cell-cover ring join with "
        "INTEGER squared distances (the lattice coordinates are exact "
        "ints, so every comparison and the min are drift-free; the ring "
        "bounds the search exactly for r <= cell size), G(r) = share of "
        "all points with a neighbour within r — the distance-CDF "
        "companion to clark_evans' single mean-NN index and ripley_k's "
        "pair counts (the G/K pair is the standard CSR test battery)"
    ),
)
def gfunction_nn(spark, sf_dir, events: DataFrame | None = None):
    """Cell-cover kRing explode -> equi-join (the dedup/cell_knn shape),
    integer min per point (partial agg), then a 4-radius threshold rollup
    on the O(points) NN frame cross-joined with the scalar total. The
    same (cell, salt) skew lever as pipeline.dedup applies if one cell
    degenerates."""
    ev = events if events is not None else _t(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        (F.col("event_id") * 7919 % 2000).alias("iy"),
        ((F.col("event_id") * 104729 % 2400) + 1000).alias("ix"),
    )
    cpts = _persist_evict(
        pts.select(
            "event_id", "iy", "ix",
            F.floor(F.col("iy") / _GF_CELL).alias("cy"),
            F.floor(F.col("ix") / _GF_CELL).alias("cx"),
        )
    )
    off = spark.range(-1, 2).select(F.col("id").alias("dy")).crossJoin(
        spark.range(-1, 2).select(F.col("id").alias("dx"))
    )
    probe = cpts.crossJoin(F.broadcast(off)).select(
        "event_id", "iy", "ix",
        (F.col("cy") + F.col("dy")).alias("cy"),
        (F.col("cx") + F.col("dx")).alias("cx"),
    )
    d2 = (F.col("iy") - F.col("biy")) * (F.col("iy") - F.col("biy")) + (
        F.col("ix") - F.col("bix")
    ) * (F.col("ix") - F.col("bix"))
    b = cpts.select(
        F.col("event_id").alias("bid"), F.col("iy").alias("biy"),
        F.col("ix").alias("bix"), "cy", "cx",
    )
    nn = (
        probe.join(b, ["cy", "cx"])
        .filter((F.col("event_id") != F.col("bid")) & (d2 <= _GF_CELL * _GF_CELL))
        .groupBy("event_id")
        .agg(F.min(d2).alias("mind2"))
    )
    tot = pts.agg(F.count(F.lit(1)).alias("n_pts"))
    radii = spark.createDataFrame([(r,) for r in _GF_RADII], "r long")
    le = F.when(F.col("mind2") <= F.col("r") * F.col("r"), 1).otherwise(0)
    return (
        radii.crossJoin(F.broadcast(tot))
        .join(nn, F.lit(True), "left")
        .groupBy("r", "n_pts")
        .agg(
            F.sum(le).cast("long").alias("n_le"),
            F.round(F.sum(le).cast("double") / F.first("n_pts"), 6).alias("g"),
        )
        .select(F.col("r").alias("r_centideg"), "n_le", "g")
    )


# Cross-K function (bivariate Ripley) --------------------------------------------------

_CK_A = "click"  # source mark
_CK_B = "purchase"  # target mark


@register(
    "cross_k",
    f"""
    WITH pts AS (
      SELECT event_id, event_type,
             CAST(event_id * 7919 % 2000 AS BIGINT) AS iy,
             CAST(event_id * 104729 % 2400 AS BIGINT) + 1000 AS ix
      FROM events WHERE event_type IN ('{_CK_A}', '{_CK_B}')
    ),
    cpts AS (SELECT *, iy // {_GF_CELL} AS cy, ix // {_GF_CELL} AS cx FROM pts),
    bb AS (
      SELECT CAST(sum(CASE WHEN event_type = '{_CK_A}' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN event_type = '{_CK_B}' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST((max(iy) - min(iy)) * (max(ix) - min(ix)) AS BIGINT) AS area
      FROM pts
    ),
    pairs AS (
      SELECT (a.iy - b.iy) * (a.iy - b.iy) + (a.ix - b.ix) * (a.ix - b.ix) AS d2
      FROM cpts a JOIN cpts b
        ON abs(a.cy - b.cy) <= 1 AND abs(a.cx - b.cx) <= 1
      WHERE a.event_type = '{_CK_A}' AND b.event_type = '{_CK_B}'
        AND (a.iy - b.iy) * (a.iy - b.iy) + (a.ix - b.ix) * (a.ix - b.ix)
              <= {_GF_CELL * _GF_CELL}
    ),
    radii AS (SELECT unnest([{', '.join(str(r) for r in _GF_RADII)}]) AS r)
    SELECT CAST(radii.r AS BIGINT) AS r_centideg, bb.n_a, bb.n_b,
           CAST(sum(CASE WHEN pairs.d2 <= radii.r * radii.r THEN 1 ELSE 0 END)
             AS BIGINT) AS n_pairs,
           round(CAST(bb.area AS DOUBLE) / (CAST(bb.n_a AS DOUBLE) * bb.n_b)
                 * sum(CASE WHEN pairs.d2 <= radii.r * radii.r THEN 1 ELSE 0 END), 6)
             AS k_ab
    FROM radii CROSS JOIN bb LEFT JOIN pairs ON true
    GROUP BY radii.r, bb.n_a, bb.n_b, bb.area
    """,
    doc=(
        f"bivariate (cross) Ripley K between '{_CK_A}' and '{_CK_B}' "
        f"marks at radii {_GF_RADII} centidegrees: K_ab(r) = A/(n_a n_b) "
        "x #(a,b pairs within r), pair search the same exact integer "
        "cell-cover ring join as gfunction_nn — the do-purchases-cluster-"
        "around-clicks attraction/repulsion test (ripley_k is the "
        "univariate sibling); every count and the bbox area BIGINT-exact, "
        "one double normalization per radius"
    ),
)
def cross_k(spark, sf_dir, events: DataFrame | None = None):
    """Marked subset scan -> cell-cover ring join between the two marks
    (pairs bounded by the ring), ONE pair-distance frame reused by all
    radii thresholds, scalar (n_a, n_b, area) broadcast. The LEFT JOIN on
    true mirrors the oracle's empty-pairs guard."""
    ev = events if events is not None else _t(spark, sf_dir, "events")
    pts = _persist_evict(
        ev.filter(F.col("event_type").isin(_CK_A, _CK_B)).select(
            "event_id", "event_type",
            (F.col("event_id") * 7919 % 2000).alias("iy"),
            ((F.col("event_id") * 104729 % 2400) + 1000).alias("ix"),
        )
    )
    cpts = pts.select(
        "*",
        F.floor(F.col("iy") / _GF_CELL).alias("cy"),
        F.floor(F.col("ix") / _GF_CELL).alias("cx"),
    )
    bb = pts.agg(
        F.sum(F.when(F.col("event_type") == _CK_A, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("event_type") == _CK_B, 1).otherwise(0)).cast("long").alias("n_b"),
        ((F.max("iy") - F.min("iy")) * (F.max("ix") - F.min("ix"))).cast("long").alias("area"),
    )
    off = spark.range(-1, 2).select(F.col("id").alias("dy")).crossJoin(
        spark.range(-1, 2).select(F.col("id").alias("dx"))
    )
    a = (
        cpts.filter(F.col("event_type") == _CK_A)
        .crossJoin(F.broadcast(off))
        .select(
            F.col("iy").alias("aiy"), F.col("ix").alias("aix"),
            (F.col("cy") + F.col("dy")).alias("cy"),
            (F.col("cx") + F.col("dx")).alias("cx"),
        )
    )
    b = cpts.filter(F.col("event_type") == _CK_B).select(
        F.col("iy").alias("biy"), F.col("ix").alias("bix"), "cy", "cx"
    )
    d2 = (F.col("aiy") - F.col("biy")) * (F.col("aiy") - F.col("biy")) + (
        F.col("aix") - F.col("bix")
    ) * (F.col("aix") - F.col("bix"))
    pairs = a.join(b, ["cy", "cx"]).select(d2.alias("d2")).filter(
        F.col("d2") <= _GF_CELL * _GF_CELL
    )
    radii = spark.createDataFrame([(r,) for r in _GF_RADII], "r long")
    le = F.when(F.col("d2") <= F.col("r") * F.col("r"), 1).otherwise(0)
    return (
        radii.crossJoin(F.broadcast(bb))
        .join(pairs, F.lit(True), "left")
        .groupBy("r", "n_a", "n_b", "area")
        .agg(
            F.sum(le).cast("long").alias("n_pairs"),
            F.round(
                F.col("area").cast("double")
                / (F.first("n_a").cast("double") * F.first("n_b"))
                * F.sum(le),
                6,
            ).alias("k_ab"),
        )
        .select(F.col("r").alias("r_centideg"), "n_a", "n_b", "n_pairs", "k_ab")
    )


# Bearing rose (circular statistics of movement directions) ----------------------------

_ROSE_CASE = """CASE
      WHEN dx > 0 AND dy >= 0 AND dy < dx THEN 0
      WHEN dx > 0 AND dy >= dx THEN 1
      WHEN dy > 0 AND dx <= 0 AND dy > -dx THEN 2
      WHEN dy > 0 AND dx < 0 AND dy <= -dx THEN 3
      WHEN dx < 0 AND dy <= 0 AND -dy < -dx THEN 4
      WHEN dy < 0 AND dx < 0 AND -dy >= -dx THEN 5
      WHEN dy < 0 AND dx >= 0 AND dx < -dy THEN 6
      ELSE 7 END"""


@register(
    "bearing_rose",
    f"""
    WITH pts AS (
      SELECT user_id, epoch_ms(ts) AS t_ms, event_id,
             (user_id % 120) * 1000
               + (CASE WHEN event_id % 13 < 4 THEN 2000 ELSE 0 END)
               + event_id % 7 AS iy,
             (user_id % 300) * 1000
               + (CASE WHEN event_id % 13 < 4 THEN 2000 ELSE 0 END)
               + event_id % 5 AS ix
      FROM events
    ),
    legs AS (
      SELECT user_id,
             iy - lag(iy) OVER w AS dy, ix - lag(ix) OVER w AS dx
      FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY t_ms, event_id)
    ),
    moving AS (
      SELECT user_id, dy, dx,
             {_ROSE_CASE} AS octant,
             CAST(dx AS DOUBLE) / sqrt(CAST(dx * dx + dy * dy AS DOUBLE)) AS ux,
             CAST(dy AS DOUBLE) / sqrt(CAST(dx * dx + dy * dy AS DOUBLE)) AS uy
      FROM legs WHERE dy IS NOT NULL AND NOT (dy = 0 AND dx = 0)
    ),
    per_user AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_legs,
             sum(ux) AS sux, sum(uy) AS suy
      FROM moving GROUP BY user_id
    )
    SELECT m.user_id, CAST(m.octant AS BIGINT) AS octant,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(count(*) AS DOUBLE) / u.n_legs, 6) AS share,
           round(sqrt(u.sux * u.sux + u.suy * u.suy) / u.n_legs, 6) AS rbar
    FROM moving m JOIN per_user u ON u.user_id = m.user_id
    GROUP BY m.user_id, m.octant, u.n_legs, u.sux, u.suy
    """,
    doc=(
        "per-entity bearing rose + circular statistics over movement "
        "legs: each leg classified into one of 8 compass sectors by "
        "EXACT integer sign/magnitude comparisons (boundaries on the "
        "axes and diagonals — no atan2, so the binning is drift-free), "
        "plus the mean resultant length Rbar = |sum of unit vectors|/n "
        "(Rbar -> 1: strongly directional movement, -> 0: isotropic "
        "wandering) — the directional-distribution op beside "
        "turning_stats' turn-handedness; unit vectors are the one "
        "order-sensitive double sum (6-dp rounded)"
    ),
)
def bearing_rose(spark, sf_dir):
    """ONE window exchange on user (legs), integer octant CASE map-side,
    two partial-agg rollups (per-user resultant, per-(user, octant)
    counts) joined on the user key — per-user state is 3 numbers."""
    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
        "event_id",
        (
            (F.col("user_id") % 120) * 1000
            + F.when(F.col("event_id") % 13 < 4, 2000).otherwise(0)
            + F.col("event_id") % 7
        ).alias("iy"),
        (
            (F.col("user_id") % 300) * 1000
            + F.when(F.col("event_id") % 13 < 4, 2000).otherwise(0)
            + F.col("event_id") % 5
        ).alias("ix"),
    )
    w = Window.partitionBy("user_id").orderBy("t_ms", "event_id")
    legs = pts.select(
        "user_id",
        (F.col("iy") - F.lag("iy").over(w)).alias("dy"),
        (F.col("ix") - F.lag("ix").over(w)).alias("dx"),
    )
    dy, dx = F.col("dy"), F.col("dx")
    octant = (
        F.when((dx > 0) & (dy >= 0) & (dy < dx), 0)
        .when((dx > 0) & (dy >= dx), 1)
        .when((dy > 0) & (dx <= 0) & (dy > -dx), 2)
        .when((dy > 0) & (dx < 0) & (dy <= -dx), 3)
        .when((dx < 0) & (dy <= 0) & (-dy < -dx), 4)
        .when((dy < 0) & (dx < 0) & (-dy >= -dx), 5)
        .when((dy < 0) & (dx >= 0) & (dx < -dy), 6)
        .otherwise(7)
    )
    leglen = F.sqrt((dx * dx + dy * dy).cast("double"))
    moving = _persist_evict(
        legs.filter(dy.isNotNull() & ~((dy == 0) & (dx == 0))).select(
            "user_id",
            octant.alias("octant"),
            (dx.cast("double") / leglen).alias("ux"),
            (dy.cast("double") / leglen).alias("uy"),
        )
    )
    per_user = moving.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_legs"),
        F.sum("ux").alias("sux"),
        F.sum("uy").alias("suy"),
    )
    return (
        moving.groupBy("user_id", "octant")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(per_user, "user_id")
        .select(
            "user_id",
            F.col("octant").cast("long").alias("octant"),
            "n",
            F.round(F.col("n").cast("double") / F.col("n_legs"), 6).alias("share"),
            F.round(
                F.sqrt(F.col("sux") * F.col("sux") + F.col("suy") * F.col("suy"))
                / F.col("n_legs"),
                6,
            ).alias("rbar"),
        )
    )


# DEM pit filling (fixed-round spill-level relaxation) ---------------------------------

_PF_ROUNDS = 24  # >= grid Chebyshev radius (~20), so every interior cell resolves
_PF_INF = 1 << 40  # interior initialization sentinel (far above any cell count)


def _pitfill_oracle_sql() -> str:
    """Unrolled monotone-from-above relaxation: boundary cells (any cell
    with < 8 inhabited neighbours — grid edge or sparse hole) are pinned
    at their own elevation; interior cells start at +INF and relax to
    f_k(c) = max(z(c), min over neighbours f_{k-1}(n)) — the standard
    iterative fill-to-spill-level (eps = 0: flats allowed)."""
    head = f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    bc AS (
      SELECT a.cy, a.cx, a.x AS z, CAST(count(*) AS BIGINT) AS nn
      FROM cells a JOIN cells b
        ON abs(a.cy - b.cy) <= 1 AND abs(a.cx - b.cx) <= 1
       AND NOT (a.cy = b.cy AND a.cx = b.cx)
      GROUP BY a.cy, a.cx, a.x
    ),
    f0 AS MATERIALIZED (
      SELECT cy, cx, z, nn,
             CASE WHEN nn < 8 THEN z ELSE {_PF_INF} END AS f
      FROM bc
    )"""
    steps = []
    for k in range(1, _PF_ROUNDS + 1):
        steps.append(f"""
    f{k} AS MATERIALIZED (
      SELECT p.cy, p.cx, p.z, p.nn,
             CASE WHEN p.nn < 8 THEN p.z
                  ELSE greatest(p.z, min(q.f)) END AS f
      FROM f{k - 1} p JOIN f{k - 1} q
        ON abs(p.cy - q.cy) <= 1 AND abs(p.cx - q.cx) <= 1
       AND NOT (p.cy = q.cy AND p.cx = q.cx)
      GROUP BY p.cy, p.cx, p.z, p.nn
    )""")
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT cy, cx, CAST(z AS BIGINT) AS z,
           CASE WHEN f >= {_PF_INF} THEN NULL ELSE CAST(f AS BIGINT) END AS z_filled,
           CAST(CASE WHEN f < {_PF_INF} AND f > z THEN 1 ELSE 0 END AS INT) AS filled
    FROM f{_PF_ROUNDS}"""
    )


@register(
    "pit_fill",
    _pitfill_oracle_sql(),
    doc=(
        f"DEM depression filling over the detection-density surface "
        f"(fixed {_PF_ROUNDS} relaxation rounds): boundary cells pinned, "
        "interior relaxed from +INF by f = max(z, min(neighbour f)) — "
        "the hydrological-conditioning prerequisite of the d8_flow_dir / "
        "flow_accumulation / watershed_basins family (unfilled pits "
        "truncate every flow path at the first depression); pure integer "
        "min/max lattice algebra, cells deeper than the round horizon "
        "stay NULL (documented fixed-round cut, the k_core idiom)"
    ),
)
def pit_fill(spark, sf_dir):
    """3x3 stencil SCATTER -> groupBy per round (each inhabited cell
    broadcasts its fill level to its 8 neighbour positions; the per-
    position integer min is a partial agg — no self-join anywhere, which
    matters twice: one shuffle per round instead of two, and Catalyst's
    sizeInBytes estimate grows linearly instead of squaring per round.
    The original f-join-nm formulation doubled the stats BigInt's DIGIT
    COUNT every round — localCheckpoint in Spark 4 preserves origin
    stats — so by round ~20 the optimizer was multiplying 10^8-digit
    BigInts inside InjectRuntimeFilter and the query never finished
    planning). State is O(inhabited cells) per round; rounds are a fixed
    constant; per-round state rides a join with the ONCE-checkpointed
    base frame, whose stats are flat."""
    cells = _persist_evict(_cell_counts(spark, sf_dir))
    off = spark.range(-1, 2).select(F.col("id").alias("oy")).crossJoin(
        spark.range(-1, 2).select(F.col("id").alias("ox"))
    ).filter(~((F.col("oy") == 0) & (F.col("ox") == 0)))

    def scatter_min(f: DataFrame, col: str) -> DataFrame:
        """Per inhabited position: (# inhabited 8-neighbours, min of their
        ``col``) — contributions scattered outward, never a self-join."""
        return (
            f.crossJoin(F.broadcast(off))
            .select(
                (F.col("cy") + F.col("oy")).alias("cy"),
                (F.col("cx") + F.col("ox")).alias("cx"),
                F.col(col).alias("qv"),
            )
            .groupBy("cy", "cx")
            .agg(F.count(F.lit(1)).alias("nn"), F.min("qv").alias("minf"))
        )

    base = _persist_evict(
        scatter_min(cells.select("cy", "cx", F.col("x").alias("v")), "v")
        .join(cells, ["cy", "cx"])  # drops uninhabited scatter targets
        .select("cy", "cx", F.col("x").alias("z"), "nn")
        .localCheckpoint()
    )
    f = base.select(
        "cy", "cx", "z", "nn",
        F.when(F.col("nn") < 8, F.col("z")).otherwise(F.lit(_PF_INF)).alias("f"),
    )
    for _ in range(_PF_ROUNDS):
        nm = scatter_min(f.select("cy", "cx", "f"), "f").select("cy", "cx", "minf")
        f = _persist_evict(
            base.join(nm, ["cy", "cx"])
            .select(
                "cy", "cx", "z", "nn",
                F.when(F.col("nn") < 8, F.col("z"))
                .otherwise(F.greatest(F.col("z"), F.col("minf")))
                .alias("f"),
            )
            .localCheckpoint()
        )
    return f.select(
        "cy", "cx",
        F.col("z").cast("long").alias("z"),
        F.when(F.col("f") >= _PF_INF, F.lit(None).cast("long"))
        .otherwise(F.col("f").cast("long"))
        .alias("z_filled"),
        F.when((F.col("f") < _PF_INF) & (F.col("f") > F.col("z")), 1)
        .otherwise(0)
        .cast("int")
        .alias("filled"),
    )


# Block motion vectors (two-epoch density cross-correlation) ---------------------------

_MV_BLK = 4  # block size, cells
_MV_SHIFT = 2  # max tested displacement, cells
_MV_SPLIT_DAY = 15  # epoch boundary (corpus spans ~30 days)


@register(
    "motion_vectors",
    f"""
    WITH b AS (
      SELECT event_id, epoch_ms(ts) AS t_ms FROM events
    ),
    bounds AS (SELECT min(t_ms) AS t0 FROM b),
    p AS (
      SELECT b.event_id,
             CAST(floor((CAST(event_id * 7919 % 2000 AS DOUBLE) / 100.0)
                        / {_GI_CELL!r}) AS BIGINT) AS cy,
             CAST(floor((CAST(event_id * 104729 % 2400 AS DOUBLE) / 100.0 + 10.0)
                        / {_GI_CELL!r}) AS BIGINT) AS cx,
             CASE WHEN (t_ms - t0) // 86400000 < {_MV_SPLIT_DAY} THEN 0 ELSE 1 END AS half
      FROM b CROSS JOIN bounds
    ),
    z0 AS (SELECT cy, cx, CAST(count(*) AS BIGINT) AS x FROM p WHERE half = 0 GROUP BY 1, 2),
    z1 AS (SELECT cy, cx, CAST(count(*) AS BIGINT) AS x FROM p WHERE half = 1 GROUP BY 1, 2),
    shifts AS (
      SELECT sy, sx
      FROM unnest(range(-{_MV_SHIFT}, {_MV_SHIFT + 1})) AS t(sy),
           unnest(range(-{_MV_SHIFT}, {_MV_SHIFT + 1})) AS u(sx)
    ),
    corr AS (
      SELECT z0.cy // {_MV_BLK} AS by, z0.cx // {_MV_BLK} AS bx, s.sy, s.sx,
             CAST(sum(z0.x * z1.x) AS BIGINT) AS corr
      FROM z0 CROSS JOIN shifts s
      JOIN z1 ON z1.cy = z0.cy + s.sy AND z1.cx = z0.cx + s.sx
      GROUP BY 1, 2, 3, 4
    ),
    mass AS (
      SELECT cy // {_MV_BLK} AS by, cx // {_MV_BLK} AS bx,
             CAST(sum(x) AS BIGINT) AS mass0
      FROM z0 GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY by, bx
               ORDER BY corr DESC, abs(sy) + abs(sx), sy, sx) AS rn
      FROM corr
    )
    SELECT r.by, r.bx, m.mass0,
           CAST(r.sy AS BIGINT) AS best_sy, CAST(r.sx AS BIGINT) AS best_sx, r.corr
    FROM ranked r JOIN mass m ON m.by = r.by AND m.bx = r.bx
    WHERE r.rn = 1
    """,
    doc=(
        "block motion vectors between the two corpus epochs (days < "
        f"{_MV_SPLIT_DAY} vs rest): per {_MV_BLK}x{_MV_BLK}-cell block, "
        f"the displacement in [-{_MV_SHIFT}, {_MV_SHIFT}]^2 maximizing "
        "the integer cross-correlation of the two density rasters "
        "(deterministic tie-break: smaller |shift|, then sy, sx) — the "
        "feature-tracking / fire-front-motion estimator (the raster twin "
        "of od_flows' entity-level movement); all correlations exact "
        "integer products, argmax a WindowGroupLimit on the O(blocks x "
        "25) frame"
    ),
)
def motion_vectors(spark, sf_dir):
    """Two epoch rasters from ONE base scan (persisted point frame), the
    25-shift probe a constant map-side fan-out into a pure equi-join on
    the shifted cell key (the spatiotemporal_join shape), partial-agg to
    (block, shift), WindowGroupLimit argmax on the bounded frame."""
    ev = _t(spark, sf_dir, "events")
    b = ev.select("event_id", F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"))
    bounds = b.agg(F.min("t_ms").alias("t0"))
    p = _persist_evict(
        b.crossJoin(F.broadcast(bounds)).select(
            F.floor(
                ((F.col("event_id") * 7919 % 2000).cast("double") / 100.0) / _GI_CELL
            ).alias("cy"),
            F.floor(
                ((F.col("event_id") * 104729 % 2400).cast("double") / 100.0 + 10.0)
                / _GI_CELL
            ).alias("cx"),
            F.when(
                ((F.col("t_ms") - F.col("t0")) / 86400000).cast("long") < _MV_SPLIT_DAY, 0
            ).otherwise(1).alias("half"),
        )
    )
    z0 = _persist_evict(
        p.filter(F.col("half") == 0).groupBy("cy", "cx").agg(F.count(F.lit(1)).alias("x"))
    )
    z1 = p.filter(F.col("half") == 1).groupBy("cy", "cx").agg(F.count(F.lit(1)).alias("x"))
    shifts = (
        spark.range(-_MV_SHIFT, _MV_SHIFT + 1)
        .select(F.col("id").alias("sy"))
        .crossJoin(spark.range(-_MV_SHIFT, _MV_SHIFT + 1).select(F.col("id").alias("sx")))
    )
    probe = z0.crossJoin(F.broadcast(shifts)).select(
        F.floor(F.col("cy") / _MV_BLK).alias("by"),
        F.floor(F.col("cx") / _MV_BLK).alias("bx"),
        "sy", "sx",
        (F.col("cy") + F.col("sy")).alias("cy"),
        (F.col("cx") + F.col("sx")).alias("cx"),
        F.col("x").alias("x0"),
    )
    corr = (
        probe.join(z1.select("cy", "cx", F.col("x").alias("x1")), ["cy", "cx"])
        .groupBy("by", "bx", "sy", "sx")
        .agg(F.sum(F.col("x0") * F.col("x1")).cast("long").alias("corr"))
    )
    mass = z0.groupBy(
        F.floor(F.col("cy") / _MV_BLK).alias("by"),
        F.floor(F.col("cx") / _MV_BLK).alias("bx"),
    ).agg(F.sum("x").cast("long").alias("mass0"))
    w = Window.partitionBy("by", "bx").orderBy(
        F.desc("corr"), F.abs(F.col("sy")) + F.abs(F.col("sx")), F.col("sy"), F.col("sx")
    )
    return (
        corr.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(mass, ["by", "bx"])
        .select(
            "by", "bx", "mass0",
            F.col("sy").cast("long").alias("best_sy"),
            F.col("sx").cast("long").alias("best_sx"),
            "corr",
        )
    )


# Exact rank-based AUC (Mann-Whitney) --------------------------------------------------

_AUC_POS = "purchase"  # positive class mark
_AUC_NEG = "click"  # negative class mark


@register(
    "auc_mannwhitney",
    f"""
    WITH s AS (
      SELECT value AS v,
             CAST(sum(CASE WHEN event_type = '{_AUC_POS}' THEN 1 ELSE 0 END) AS BIGINT) AS np,
             CAST(sum(CASE WHEN event_type = '{_AUC_NEG}' THEN 1 ELSE 0 END) AS BIGINT) AS nn
      FROM events
      WHERE event_type IN ('{_AUC_POS}', '{_AUC_NEG}') AND value IS NOT NULL
      GROUP BY value
    ),
    w AS (
      SELECT np, nn,
             sum(nn) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) - nn AS below
      FROM s
    ),
    tot AS (
      SELECT CAST(sum(np) AS BIGINT) AS n_pos, CAST(sum(nn) AS BIGINT) AS n_neg,
             CAST(sum(np * (2 * below + nn)) AS BIGINT) AS u2
      FROM w
    )
    SELECT n_pos, n_neg, u2,
           round(CAST(u2 AS DOUBLE) / (2.0 * n_pos * n_neg), 6) AS auc
    FROM tot
    """,
    doc=(
        f"exact Mann-Whitney AUC of the `value` score separating "
        f"'{_AUC_POS}' from '{_AUC_NEG}' events: group by DISTINCT score "
        "value (np, nn per value), one cumulative window for the "
        "negatives strictly below, then u2 = sum np*(2*below + nn) — "
        "twice the concordant-pair count with ties at half weight, an "
        "exact BIGINT; AUC = u2/(2 n_pos n_neg) is the one double op — "
        "the rank-sum formulation never materializes pos x neg pairs "
        "(ab_test_ztest compares means; this is the threshold-free "
        "separability metric)"
    ),
)
def auc_mannwhitney(spark, sf_dir):
    """ONE partial-agg shuffle to the O(distinct scores) frame, one
    ordered cumulative window on it, scalar rollup. No pair join at any
    scale."""
    ev = _t(spark, sf_dir, "events")
    s = (
        ev.filter(
            F.col("event_type").isin(_AUC_POS, _AUC_NEG) & F.col("value").isNotNull()
        )
        .groupBy(F.col("value").alias("v"))
        .agg(
            F.sum(F.when(F.col("event_type") == _AUC_POS, 1).otherwise(0))
            .cast("long")
            .alias("np"),
            F.sum(F.when(F.col("event_type") == _AUC_NEG, 1).otherwise(0))
            .cast("long")
            .alias("nn"),
        )
    )
    win = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w = s.select(
        "np", "nn", (F.sum("nn").over(win) - F.col("nn")).alias("below")
    )
    return w.agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
        F.sum(F.col("np") * (2 * F.col("below") + F.col("nn"))).cast("long").alias("u2"),
    ).select(
        "n_pos", "n_neg", "u2",
        F.round(
            F.col("u2").cast("double") / (2.0 * F.col("n_pos") * F.col("n_neg")), 6
        ).alias("auc"),
    )


# Naive-Bayes language classifier (add-1 smoothing, resubstitution) --------------------


@register(
    "naive_bayes_lang",
    """
    WITH t AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tc AS (
      SELECT doc_id, lang, tok, CAST(count(*) AS BIGINT) AS c
      FROM t WHERE tok <> '' GROUP BY doc_id, lang, tok
    ),
    cls AS (
      SELECT lang AS c_lang, CAST(sum(c) AS BIGINT) AS tot_c
      FROM tc GROUP BY lang
    ),
    vocab AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM tc),
    prior AS (
      SELECT lang AS c_lang, CAST(count(*) AS BIGINT) AS nd FROM documents GROUP BY lang
    ),
    ndocs AS (SELECT CAST(count(*) AS BIGINT) AS nd_tot FROM documents),
    cw AS (
      SELECT lang AS c_lang, tok, CAST(sum(c) AS BIGINT) AS cnt
      FROM tc GROUP BY lang, tok
    ),
    score AS (
      SELECT d.doc_id, d.lang, cls.c_lang,
             ln(CAST(p.nd AS DOUBLE) / n.nd_tot)
             + sum(d.c * (ln(CAST(coalesce(cw.cnt, 0) + 1 AS DOUBLE))
                          - ln(CAST(cls.tot_c + vocab.v AS DOUBLE)))) AS ll
      FROM tc d
      CROSS JOIN cls
      CROSS JOIN vocab
      CROSS JOIN ndocs n
      JOIN prior p ON p.c_lang = cls.c_lang
      LEFT JOIN cw ON cw.c_lang = cls.c_lang AND cw.tok = d.tok
      GROUP BY d.doc_id, d.lang, cls.c_lang, p.nd, n.nd_tot, cls.tot_c, vocab.v
    ),
    ranked AS (
      SELECT doc_id, lang, c_lang, round(ll, 6) AS ll6,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY round(ll, 6) DESC, c_lang) AS rn
      FROM score
    )
    SELECT doc_id, lang, c_lang AS pred_lang, ll6 AS loglik,
           CAST(CASE WHEN c_lang = lang THEN 1 ELSE 0 END AS INT) AS correct
    FROM ranked WHERE rn = 1
    """,
    doc=(
        "multinomial naive-Bayes language classifier with add-1 "
        "smoothing, scored by resubstitution: per-doc token counts x the "
        "constant class set, class-conditional counts LEFT-joined (unseen "
        "token -> ln 1 = 0 numerator), ll = ln prior + sum c*(ln(cnt+1) - "
        "ln(tot_c + V)); argmax per doc with the deterministic "
        "(round(ll,6) desc, lang) tie-break in BOTH engines — the "
        "supervised companion to langid_confusion's n-gram heuristic; "
        "all ln arguments exact integers, the per-(doc,class) sum is the "
        "order-sensitive reduction (6-dp rounded before ranking)"
    ),
)
def naive_bayes_lang(spark, sf_dir):
    """Fan-out is per-doc tokens x |classes| (a constant), never pairs;
    class-conditional table is O(vocab x classes) and partial-aggs before
    the join; argmax is a WindowGroupLimit on the |classes|-row groups."""
    docs = _t(spark, sf_dir, "documents")
    tc = _persist_evict(
        docs.select(
            "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "lang", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    cls = tc.groupBy(F.col("lang").alias("c_lang")).agg(
        F.sum("c").cast("long").alias("tot_c")
    )
    vocab = tc.agg(F.countDistinct("tok").cast("long").alias("v"))
    prior = docs.groupBy(F.col("lang").alias("c_lang")).agg(
        F.count(F.lit(1)).cast("long").alias("nd")
    )
    ndocs = docs.agg(F.count(F.lit(1)).cast("long").alias("nd_tot"))
    cw = tc.groupBy(F.col("lang").alias("c_lang"), "tok").agg(
        F.sum("c").cast("long").alias("cnt")
    )
    score = (
        tc.crossJoin(F.broadcast(cls.join(prior, "c_lang")))
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(ndocs))
        .join(
            cw.select("c_lang", "tok", "cnt"),
            ["c_lang", "tok"],
            "left",
        )
        .groupBy("doc_id", "lang", "c_lang", "nd", "nd_tot", "tot_c", "v")
        .agg(
            F.sum(
                F.col("c")
                * (
                    F.log((F.coalesce(F.col("cnt"), F.lit(0)) + 1).cast("double"))
                    - F.log((F.col("tot_c") + F.col("v")).cast("double"))
                )
            ).alias("ll_tok")
        )
        .select(
            "doc_id", "lang", "c_lang",
            (
                F.log(F.col("nd").cast("double") / F.col("nd_tot")) + F.col("ll_tok")
            ).alias("ll"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc(F.round(F.col("ll"), 6)), "c_lang")
    return (
        score.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id", "lang",
            F.col("c_lang").alias("pred_lang"),
            F.round(F.col("ll"), 6).alias("loglik"),
            F.when(F.col("c_lang") == F.col("lang"), 1).otherwise(0)
            .cast("int")
            .alias("correct"),
        )
    )


# Box-counting fractal dimension -------------------------------------------------------

_BC_SCALES = (25, 50, 100, 200, 400)  # box sizes, centidegrees


@register(
    "boxcount_dimension",
    f"""
    WITH pts AS (
      SELECT CAST(event_id * 7919 % 2000 AS BIGINT) AS iy,
             CAST(event_id * 104729 % 2400 AS BIGINT) + 1000 AS ix
      FROM events
    ),
    scales AS (SELECT unnest([{', '.join(str(s) for s in _BC_SCALES)}]) AS s),
    boxes AS (
      SELECT scales.s, CAST(count(*) AS BIGINT) AS n_boxes
      FROM scales CROSS JOIN (SELECT DISTINCT iy, ix FROM pts) u
      GROUP BY scales.s, u.iy // scales.s, u.ix // scales.s
    ),
    counts AS (
      SELECT CAST(s AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n_boxes
      FROM boxes GROUP BY s
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(ln(CAST(s AS DOUBLE))) AS sx,
             sum(ln(CAST(n_boxes AS DOUBLE))) AS sy,
             sum(ln(CAST(s AS DOUBLE)) * ln(CAST(s AS DOUBLE))) AS sxx,
             sum(ln(CAST(s AS DOUBLE)) * ln(CAST(n_boxes AS DOUBLE))) AS sxy
      FROM counts
    )
    SELECT counts.s, counts.n_boxes,
           round(-((m.n * m.sxy - m.sx * m.sy)
                   / (m.n * m.sxx - m.sx * m.sx)), 6) AS dim
    FROM counts CROSS JOIN m
    """,
    doc=(
        f"box-counting fractal dimension of the detection point cloud: "
        f"occupied-box counts at box sizes {_BC_SCALES} centidegrees "
        "over the DISTINCT lattice positions, then the OLS slope of "
        "ln N(s) on ln s (negated) — dim ~= 2 for space-filling scatter, "
        "~= 1 for curve-like (road/river-following) detections, the "
        "multi-scale companion to clark_evans/quadrat_chi2's single-"
        "scale clustering tests; counts exact BIGINTs, the 5-term OLS "
        "moment sums the order-sensitive reduction (6-dp rounded)"
    ),
)
def boxcount_dimension(spark, sf_dir):
    """Distinct positions once (one shuffle on the lattice key), a
    |scales|-row broadcast fan-out, two partial aggs; the fit is O(1) and
    rides every output row via a scalar crossJoin."""
    ev = _t(spark, sf_dir, "events")
    u = _persist_evict(
        ev.select(
            (F.col("event_id") * 7919 % 2000).alias("iy"),
            ((F.col("event_id") * 104729 % 2400) + 1000).alias("ix"),
        ).distinct()
    )
    scales = spark.createDataFrame([(s,) for s in _BC_SCALES], "s long")
    counts = _persist_evict(
        u.crossJoin(F.broadcast(scales))
        .groupBy(
            "s",
            F.floor(F.col("iy") / F.col("s")).alias("by"),
            F.floor(F.col("ix") / F.col("s")).alias("bx"),
        )
        .agg(F.count(F.lit(1)).alias("_"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).cast("long").alias("n_boxes"))
    )
    lx = F.log(F.col("s").cast("double"))
    ly = F.log(F.col("n_boxes").cast("double"))
    m = counts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(lx).alias("sx"),
        F.sum(ly).alias("sy"),
        F.sum(lx * lx).alias("sxx"),
        F.sum(lx * ly).alias("sxy"),
    )
    return counts.crossJoin(F.broadcast(m)).select(
        "s", "n_boxes",
        F.round(
            -(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            ),
            6,
        ).alias("dim"),
    )


# Plane trend surface (closed-form OLS via Cramer's rule) ------------------------------


@register(
    "trend_surface",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(cy) AS DOUBLE) AS sy, CAST(sum(cx) AS DOUBLE) AS sx,
             CAST(sum(cy * cy) AS DOUBLE) AS syy,
             CAST(sum(cy * cx) AS DOUBLE) AS syx,
             CAST(sum(cx * cx) AS DOUBLE) AS sxx,
             CAST(sum(x) AS DOUBLE) AS sz,
             CAST(sum(x * cy) AS DOUBLE) AS szy,
             CAST(sum(x * cx) AS DOUBLE) AS szx,
             CAST(sum(x * x) AS DOUBLE) AS szz
      FROM cells
    ),
    fit AS (
      SELECT n, sz, szy, szx, szz,
             (n * (syy * sxx - syx * syx) - sy * (sy * sxx - syx * sx)
              + sx * (sy * syx - syy * sx)) AS det,
             (sz * (syy * sxx - syx * syx) - sy * (szy * sxx - syx * szx)
              + sx * (szy * syx - syy * szx)) AS det0,
             (n * (szy * sxx - syx * szx) - sz * (sy * sxx - syx * sx)
              + sx * (sy * szx - szy * sx)) AS det1,
             (n * (syy * szx - szy * syx) - sy * (sy * szx - szy * sx)
              + sz * (sy * syx - syy * sx)) AS det2
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_cells,
           round(det0 / det, 6) AS b0,
           round(det1 / det, 6) AS b1,
           round(det2 / det, 6) AS b2,
           round(1.0 - (szz - (det0 / det) * sz - (det1 / det) * szy
                        - (det2 / det) * szx)
                       / (szz - sz * sz / n), 6) AS r2
    FROM fit
    """,
    doc=(
        "first-order trend surface of the detection-density raster: "
        "plane z = b0 + b1*cy + b2*cx fit by OLS, solved closed-form by "
        "Cramer's rule on the 3x3 normal equations — the detrending step "
        "that precedes variogram/kriging analysis (empirical_variogram "
        "assumes a detrended field) and the 2D sibling of ols_trend's "
        "1D line fit; every moment an exact integer sum CAST once to "
        "DOUBLE, the determinant expressions written with identical "
        "association in both dialects so the IEEE ops match bit-for-bit"
    ),
)
def trend_surface(spark, sf_dir):
    """One partial-agg shuffle to the cell raster, one scalar moment agg,
    O(1) algebra. Nothing downstream of the 10-number moment row."""
    cells = _cell_counts(spark, sf_dir)
    m = cells.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("cy").cast("double").alias("sy"),
        F.sum("cx").cast("double").alias("sx"),
        F.sum(F.col("cy") * F.col("cy")).cast("double").alias("syy"),
        F.sum(F.col("cy") * F.col("cx")).cast("double").alias("syx"),
        F.sum(F.col("cx") * F.col("cx")).cast("double").alias("sxx"),
        F.sum("x").cast("double").alias("sz"),
        F.sum(F.col("x") * F.col("cy")).cast("double").alias("szy"),
        F.sum(F.col("x") * F.col("cx")).cast("double").alias("szx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("szz"),
    )
    n, sy, sx = F.col("n"), F.col("sy"), F.col("sx")
    syy, syx, sxx = F.col("syy"), F.col("syx"), F.col("sxx")
    sz, szy, szx, szz = F.col("sz"), F.col("szy"), F.col("szx"), F.col("szz")
    det = (
        n * (syy * sxx - syx * syx) - sy * (sy * sxx - syx * sx)
        + sx * (sy * syx - syy * sx)
    )
    det0 = (
        sz * (syy * sxx - syx * syx) - sy * (szy * sxx - syx * szx)
        + sx * (szy * syx - syy * szx)
    )
    det1 = (
        n * (szy * sxx - syx * szx) - sz * (sy * sxx - syx * sx)
        + sx * (sy * szx - szy * sx)
    )
    det2 = (
        n * (syy * szx - szy * syx) - sy * (sy * szx - szy * sx)
        + sz * (sy * syx - syy * sx)
    )
    return m.select(
        n.cast("long").alias("n_cells"),
        F.round(det0 / det, 6).alias("b0"),
        F.round(det1 / det, 6).alias("b1"),
        F.round(det2 / det, 6).alias("b2"),
        F.round(
            F.lit(1.0)
            - (szz - (det0 / det) * sz - (det1 / det) * szy - (det2 / det) * szx)
            / (szz - sz * sz / n),
            6,
        ).alias("r2"),
    )


# Rectangle-union area (coordinate-compressed sweep) -----------------------------------

_RU_MOD = 101  # order-key stride selecting the rectangle subset


@register(
    "rect_union_area",
    f"""
    WITH r AS (
      SELECT o_orderkey AS rid,
             CAST(o_orderkey * 13 % 1000 AS BIGINT) AS x0,
             CAST(o_orderkey * 13 % 1000 + 1 + o_orderkey % 50 AS BIGINT) AS x1,
             CAST(o_orderkey * 29 % 1000 AS BIGINT) AS y0,
             CAST(o_orderkey * 29 % 1000 + 1 + o_orderkey % 40 AS BIGINT) AS y1
      FROM orders WHERE o_orderkey % {_RU_MOD} = 0
    ),
    xs AS (
      SELECT DISTINCT x FROM (
        SELECT x0 AS x FROM r UNION ALL SELECT x1 AS x FROM r
      )
    ),
    slabs AS (
      SELECT x AS x_lo, lead(x) OVER (ORDER BY x) AS x_hi FROM xs
    ),
    sl AS (SELECT *, row_number() OVER (ORDER BY x_lo) AS slab_id
           FROM slabs WHERE x_hi IS NOT NULL),
    act AS (
      SELECT sl.slab_id, sl.x_lo, sl.x_hi, r.y0, r.y1
      FROM sl JOIN r ON r.x0 <= sl.x_lo AND r.x1 >= sl.x_hi
    ),
    marked AS (
      SELECT *,
             CASE WHEN max(y1) OVER (PARTITION BY slab_id ORDER BY y0, y1
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) IS NULL
                    OR y0 > max(y1) OVER (PARTITION BY slab_id ORDER BY y0, y1
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS gap
      FROM act
    ),
    grp AS (
      SELECT *, sum(gap) OVER (PARTITION BY slab_id ORDER BY y0, y1
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS g
      FROM marked
    ),
    seg AS (
      SELECT slab_id, x_lo, x_hi, g,
             max(y1) - min(y0) AS ylen
      FROM grp GROUP BY slab_id, x_lo, x_hi, g
    )
    SELECT CAST((SELECT count(*) FROM r) AS BIGINT) AS n_rects,
           CAST(count(DISTINCT slab_id) AS BIGINT) AS n_slabs,
           CAST(sum(ylen * (x_hi - x_lo)) AS BIGINT) AS area
    FROM seg
    """,
    doc=(
        "exact area of the union of a deterministic rectangle set "
        "(overlaps counted once) by coordinate-compressed sweep: distinct "
        "x coordinates cut the plane into slabs, rectangles active in a "
        "slab found by a bounded slab x rect join, and the per-slab "
        "y-interval union computed with interval_union's running-max "
        "window (gap -> new segment group) — the measure-of-union "
        "primitive behind footprint/coverage accounting that a naive "
        "sum-of-areas double-counts; every coordinate, segment length "
        "and the final area is an exact BIGINT"
    ),
)
def rect_union_area(spark, sf_dir):
    """The rect set is bounded geometry (like the polygon ops): slabs x
    rects is a broadcast join of two O(n_rects) frames, then one window
    + two partial aggs per slab. Points never enter; scale-out applies
    to the upstream table scan only."""
    o = _t(spark, sf_dir, "orders")
    r = _persist_evict(
        o.filter(F.col("o_orderkey") % _RU_MOD == 0).select(
            F.col("o_orderkey").alias("rid"),
            (F.col("o_orderkey") * 13 % 1000).alias("x0"),
            (F.col("o_orderkey") * 13 % 1000 + 1 + F.col("o_orderkey") % 50).alias("x1"),
            (F.col("o_orderkey") * 29 % 1000).alias("y0"),
            (F.col("o_orderkey") * 29 % 1000 + 1 + F.col("o_orderkey") % 40).alias("y1"),
        )
    )
    xs = (
        r.select(F.col("x0").alias("x"))
        .unionAll(r.select(F.col("x1").alias("x")))
        .distinct()
    )
    wx = Window.orderBy("x")
    sl = (
        xs.select(F.col("x").alias("x_lo"), F.lead("x").over(wx).alias("x_hi"))
        .filter(F.col("x_hi").isNotNull())
        .withColumn("slab_id", F.row_number().over(Window.orderBy("x_lo")))
    )
    act = sl.join(
        F.broadcast(r),
        (F.col("x0") <= F.col("x_lo")) & (F.col("x1") >= F.col("x_hi")),
    ).select("slab_id", "x_lo", "x_hi", "y0", "y1")
    wprev = Window.partitionBy("slab_id").orderBy("y0", "y1").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wcur = Window.partitionBy("slab_id").orderBy("y0", "y1").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prevmax = F.max("y1").over(wprev)
    marked = act.withColumn(
        "gap",
        F.when(prevmax.isNull() | (F.col("y0") > prevmax), 1).otherwise(0),
    )
    grp = marked.withColumn("g", F.sum("gap").over(wcur))
    seg = grp.groupBy("slab_id", "x_lo", "x_hi", "g").agg(
        (F.max("y1") - F.min("y0")).alias("ylen")
    )
    n_rects = r.agg(F.count(F.lit(1)).cast("long").alias("n_rects"))
    return seg.crossJoin(F.broadcast(n_rects)).groupBy("n_rects").agg(
        F.countDistinct("slab_id").cast("long").alias("n_slabs"),
        F.sum(F.col("ylen") * (F.col("x_hi") - F.col("x_lo")))
        .cast("long")
        .alias("area"),
    ).select("n_rects", "n_slabs", "area")


# Decision stump (exact Gini split search) ---------------------------------------------

def _fold_sum(cols):
    """Left-fold addition — the association order matches the SQL
    oracle's " + ".join exactly, so the doubles are bit-identical."""
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out




@register(
    "decision_stump",
    """
    WITH b AS (
      SELECT l_quantity AS q,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS p,
             CAST(count(*) AS BIGINT) AS t
      FROM lineitem GROUP BY l_quantity
    ),
    tot AS (SELECT CAST(sum(p) AS BIGINT) AS bp, CAST(sum(t) AS BIGINT) AS bt FROM b),
    c AS (
      SELECT q,
             sum(p) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS pl,
             sum(t) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS tl
      FROM b
    ),
    s AS (
      SELECT q, pl, tl, bp - pl AS pr, bt - tl AS tr, bp, bt
      FROM c CROSS JOIN tot WHERE tl < bt
    ),
    scored AS (
      SELECT *,
             (CAST(pl * pl + (tl - pl) * (tl - pl) AS DOUBLE) / tl
              + CAST(pr * pr + (tr - pr) * (tr - pr) AS DOUBLE) / tr) AS purity
      FROM s
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY purity DESC, q) AS rn FROM scored
    )
    SELECT q AS threshold, tl AS n_left, tr AS n_right, pl AS pos_left,
           pr AS pos_right,
           round(((CAST(tl AS DOUBLE)
                   - CAST(pl * pl + (tl - pl) * (tl - pl) AS DOUBLE) / tl)
                  + (CAST(tr AS DOUBLE)
                     - CAST(pr * pr + (tr - pr) * (tr - pr) AS DOUBLE) / tr)) / bt,
                 6) AS gini
    FROM ranked WHERE rn = 1
    """,
    doc=(
        "exact best-Gini decision stump: split l_quantity predicting "
        "l_returnflag = 'R' — per-distinct-value class counts, ONE "
        "cumulative window for every candidate threshold's left counts, "
        "argmax of the integer-moment purity (pl^2+nl^2)/tl + "
        "(pr^2+nr^2)/tr (equivalent to min weighted Gini; the ranking "
        "double is the same IEEE expression on both engines, tie-break "
        "on the threshold) — the single-feature CART step / feature-"
        "quality probe beside chi2_features' independence test; never "
        "materializes row x threshold pairs"
    ),
)
def decision_stump(spark, sf_dir):
    """One partial-agg shuffle to O(distinct values), one ordered window,
    a scalar-broadcast crossJoin, WindowGroupLimit argmax. Split search
    cost is independent of row count beyond the first agg."""
    li = _t(spark, sf_dir, "lineitem")
    b = li.groupBy(F.col("l_quantity").alias("q")).agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("p"),
        F.count(F.lit(1)).cast("long").alias("t"),
    )
    tot = b.agg(
        F.sum("p").cast("long").alias("bp"), F.sum("t").cast("long").alias("bt")
    )
    win = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = b.select(
        "q", F.sum("p").over(win).alias("pl"), F.sum("t").over(win).alias("tl")
    )
    s = c.crossJoin(F.broadcast(tot)).filter(F.col("tl") < F.col("bt")).select(
        "q", "pl", "tl",
        (F.col("bp") - F.col("pl")).alias("pr"),
        (F.col("bt") - F.col("tl")).alias("tr"),
        "bp", "bt",
    )
    pl, tl, pr, tr = F.col("pl"), F.col("tl"), F.col("pr"), F.col("tr")
    purity = (
        (pl * pl + (tl - pl) * (tl - pl)).cast("double") / tl
        + (pr * pr + (tr - pr) * (tr - pr)).cast("double") / tr
    )
    ranked = s.withColumn("purity", purity).withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("purity"), "q"))
    )
    return ranked.filter(F.col("rn") == 1).select(
        F.col("q").alias("threshold"),
        tl.alias("n_left"),
        tr.alias("n_right"),
        pl.alias("pos_left"),
        pr.alias("pos_right"),
        F.round(
            (
                (tl.cast("double") - (pl * pl + (tl - pl) * (tl - pl)).cast("double") / tl)
                + (tr.cast("double") - (pr * pr + (tr - pr) * (tr - pr)).cast("double") / tr)
            )
            / F.col("bt"),
            6,
        ).alias("gini"),
    )


# Benjamini-Hochberg FDR over Gi* hotspot p-values -------------------------------------

_BH_Q = 0.05  # target false-discovery rate


@register(
    "fdr_bh",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM cells
    ),
    nbr AS (
      SELECT a.cy, a.cx,
             CAST(count(*) AS BIGINT) AS wn,
             CAST(sum(b.x) AS BIGINT) AS wx
      FROM cells a JOIN cells b
        ON abs(a.cy - b.cy) <= 1 AND abs(a.cx - b.cx) <= 1
      GROUP BY a.cy, a.cx
    ),
    z AS (
      SELECT nbr.cy, nbr.cx,
             (CAST(wx AS DOUBLE) - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(wn AS DOUBLE))
             / (
               sqrt(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
                    - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
               * sqrt((CAST(n AS DOUBLE) * CAST(wn AS DOUBLE) - CAST(wn AS DOUBLE) * CAST(wn AS DOUBLE))
                      / (CAST(n AS DOUBLE) - 1.0))
             ) AS zv,
             g.n AS m
      FROM nbr CROSS JOIN g
    ),
    pv AS (
      SELECT cy, cx, m, 1.0 - {physics.normal_cdf_sql('zv')} AS p_hot FROM z
    ),
    ranked AS (
      SELECT *, CAST(row_number() OVER (ORDER BY p_hot, cy, cx) AS BIGINT) AS rnk
      FROM pv
    ),
    thr AS (
      SELECT max(CASE WHEN p_hot <= rnk * {_BH_Q!r} / m THEN rnk ELSE 0 END) AS k
      FROM ranked
    )
    SELECT r.cy, r.cx, round(r.p_hot, 8) AS p_hot, r.rnk,
           CAST(CASE WHEN r.rnk <= thr.k THEN 1 ELSE 0 END AS INT) AS rejected
    FROM ranked r CROSS JOIN thr
    """,
    doc=(
        f"Benjamini-Hochberg FDR correction (q = {_BH_Q}) over the "
        "per-cell one-sided Gi* hotspot p-values: the getis_ord_gi "
        "z-score verbatim, p = 1 - Phi(z) via the shared Zelen-Severo "
        "polynomial (same IEEE expression both engines), deterministic "
        "(p, cy, cx) ranking, and the step-up threshold k = max rank "
        "with p <= rank q/m — the multiple-testing gate that turns 1,900 "
        "raw hotspot z-scores into a defensible discovery set (raw "
        "z > 1.96 thresholding at 1,900 cells expects ~47 false "
        "hotspots; BH caps the false-discovery RATE instead)"
    ),
)
def fdr_bh(spark, sf_dir):
    """Reuses the getis_ord_gi stencil plan (cell counts -> kRing
    equi-join -> scalar-broadcast globals), then one ordered window for
    the ranking and a one-row threshold broadcast. O(cells) state."""
    cells = _persist_evict(_cell_counts(spark, sf_dir))
    g = cells.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nbr_side = cells.select(
        F.col("x").alias("bx_"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cy") + dy).alias("cy"), (F.col("cx") + dx).alias("cx")
                    )
                    for dy in (-1, 0, 1)
                    for dx in (-1, 0, 1)
                ]
            )
        ).alias("tgt"),
    ).select(F.col("tgt.cy").alias("cy"), F.col("tgt.cx").alias("cx"), "bx_")
    nbr = (
        cells.select("cy", "cx")
        .join(nbr_side, ["cy", "cx"])
        .groupBy("cy", "cx")
        .agg(F.count(F.lit(1)).alias("wn"), F.sum("bx_").alias("wx"))
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    wn, wx = F.col("wn"), F.col("wx")
    mean = sx.cast("double") / n.cast("double")
    zv = (wx.cast("double") - mean * wn.cast("double")) / (
        F.sqrt(sxx.cast("double") / n.cast("double") - mean * mean)
        * F.sqrt(
            (n.cast("double") * wn.cast("double") - wn.cast("double") * wn.cast("double"))
            / (n.cast("double") - 1.0)
        )
    )
    pv = nbr.crossJoin(F.broadcast(g)).select(
        "cy", "cx",
        n.alias("m"),
        (F.lit(1.0) - physics.normal_cdf(zv)).alias("p_hot"),
    )
    ranked = _persist_evict(
        pv.withColumn(
            "rnk", F.row_number().over(Window.orderBy("p_hot", "cy", "cx")).cast("long")
        )
    )
    thr = ranked.agg(
        F.max(
            F.when(
                F.col("p_hot") <= F.col("rnk") * _BH_Q / F.col("m"), F.col("rnk")
            ).otherwise(0)
        ).alias("k")
    )
    return ranked.crossJoin(F.broadcast(thr)).select(
        "cy", "cx",
        F.round(F.col("p_hot"), 8).alias("p_hot"),
        "rnk",
        F.when(F.col("rnk") <= F.col("k"), 1).otherwise(0).cast("int").alias("rejected"),
    )


# Simplified silhouette over fixed centroids -------------------------------------------

_SIL_CENTROIDS = ((1, 250, 300), (2, 250, 1500), (3, 1000, 600),
                  (4, 1000, 1800), (5, 1700, 300), (6, 1700, 2100))


def _sil_centroid_sql() -> str:
    rows = ", ".join(f"({cid}, {cy}, {cx})" for cid, cy, cx in _SIL_CENTROIDS)
    return f"(VALUES {rows}) AS c(cid, ky, kx)"


@register(
    "silhouette_simplified",
    f"""
    WITH pts AS (
      SELECT event_id,
             CAST(event_id * 7919 % 2000 AS BIGINT) AS py,
             CAST(event_id * 104729 % 2400 AS BIGINT) AS px
      FROM events
    ),
    d AS (
      SELECT p.event_id, c.cid,
             sqrt(CAST((p.py - c.ky) * (p.py - c.ky)
                       + (p.px - c.kx) * (p.px - c.kx) AS DOUBLE)) AS dist
      FROM pts p CROSS JOIN {_sil_centroid_sql()}
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY event_id
                                   ORDER BY dist, cid) AS rn
      FROM d
    ),
    ab AS (
      SELECT a.event_id, a.cid, a.dist AS a_dist, b.dist AS b_dist
      FROM ranked a JOIN ranked b
        ON b.event_id = a.event_id AND b.rn = 2
      WHERE a.rn = 1
    )
    SELECT cid, CAST(count(*) AS BIGINT) AS n,
           round(avg((b_dist - a_dist) / greatest(a_dist, b_dist)), 6) AS mean_sil,
           round(avg(a_dist), 6) AS mean_a,
           round(avg(b_dist), 6) AS mean_b
    FROM ab GROUP BY cid
    """,
    doc=(
        "simplified silhouette of the fixed 6-centroid clustering of the "
        "event lattice: per point a = distance to its nearest centroid, "
        "b = distance to the runner-up, s = (b - a)/max(a, b), averaged "
        "per cluster — the cluster-quality diagnostic that scores "
        "kmeans_assign-style partitions WITHOUT the O(n^2) pairwise "
        "silhouette (the centroid surrogate is the standard large-n "
        "substitute); distances are sqrt of exact integers (correctly "
        "rounded, never libm-divergent), the per-cluster means the "
        "order-sensitive reduction (6-dp rounded)"
    ),
)
def silhouette_simplified(spark, sf_dir):
    """Constant 6-row broadcast fan-out -> per-point argmin/runner-up via
    ONE partial min over a (dist, cid) struct pair — no window, no
    shuffle of the fan-out — then one groupBy(cid). At 10^12 points the
    per-point state is two structs."""
    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        (F.col("event_id") * 7919 % 2000).alias("py"),
        (F.col("event_id") * 104729 % 2400).alias("px"),
    )
    cents = spark.createDataFrame(
        list(_SIL_CENTROIDS), "cid long, ky long, kx long"
    )
    dist = F.sqrt(
        (
            (F.col("py") - F.col("ky")) * (F.col("py") - F.col("ky"))
            + (F.col("px") - F.col("kx")) * (F.col("px") - F.col("kx"))
        ).cast("double")
    )
    d = pts.crossJoin(F.broadcast(cents)).select(
        "event_id", "cid", dist.alias("dist")
    )
    ab = (
        d.groupBy("event_id")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(F.struct(F.col("dist").alias("dist"), F.col("cid").alias("cid")))
                ),
                1, 2,
            ).alias("top2")
        )
        .select(
            F.col("top2")[0]["cid"].alias("cid"),
            F.col("top2")[0]["dist"].alias("a_dist"),
            F.col("top2")[1]["dist"].alias("b_dist"),
        )
    )
    return ab.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.avg(
                (F.col("b_dist") - F.col("a_dist"))
                / F.greatest(F.col("a_dist"), F.col("b_dist"))
            ),
            6,
        ).alias("mean_sil"),
        F.round(F.avg("a_dist"), 6).alias("mean_a"),
        F.round(F.avg("b_dist"), 6).alias("mean_b"),
    )


# AR(2) Yule-Walker fit per entity -----------------------------------------------------

_AR_MIN_N = 8  # minimum fixes per entity


@register(
    "ar2_yule_walker",
    f"""
    WITH s AS (
      SELECT user_id, value AS v,
             lag(value, 1) OVER w AS v1,
             lag(value, 2) OVER w AS v2,
             avg(value) OVER (PARTITION BY user_id) AS m,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
    ),
    mom AS (
      SELECT user_id, CAST(max(n) AS BIGINT) AS n,
             sum((v - m) * (v - m)) AS c0,
             sum(CASE WHEN v1 IS NOT NULL THEN (v - m) * (v1 - m) END) AS c1,
             sum(CASE WHEN v2 IS NOT NULL THEN (v - m) * (v2 - m) END) AS c2
      FROM s GROUP BY user_id HAVING max(n) >= {_AR_MIN_N}
    )
    SELECT user_id, n,
           round((c1 / c0) * (1.0 - c2 / c0)
                 / (1.0 - (c1 / c0) * (c1 / c0)), 6) AS phi1,
           round((c2 / c0 - (c1 / c0) * (c1 / c0))
                 / (1.0 - (c1 / c0) * (c1 / c0)), 6) AS phi2
    FROM mom
    """,
    doc=(
        "per-entity AR(2) fit by Yule-Walker: centered lag-0/1/2 "
        "autocovariance sums over the (ts, event_id)-ordered value "
        "series, phi1 = r1(1-r2)/(1-r1^2), phi2 = (r2-r1^2)/(1-r1^2) "
        "with rk = ck/c0 — the order-2 extension of acf_lags (which "
        "stops at the correlations) and the AR sibling of holt_linear's "
        "exponential state model; one window exchange per entity, the "
        "covariance sums the order-sensitive reduction (6-dp rounded)"
    ),
)
def ar2_yule_walker(spark, sf_dir):
    """ONE window exchange on the entity key serves the ordered lags, the
    partition mean and the count; the moment rollup is a partial agg on
    the same partitioning (no second shuffle)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_millis(F.col("ts").cast("timestamp")), "event_id"
    )
    wp = Window.partitionBy("user_id")
    s = ev.select(
        "user_id",
        F.col("value").alias("v"),
        F.lag("value", 1).over(w).alias("v1"),
        F.lag("value", 2).over(w).alias("v2"),
        F.avg("value").over(wp).alias("m"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    v, v1, v2, m = F.col("v"), F.col("v1"), F.col("v2"), F.col("m")
    mom = (
        s.groupBy("user_id")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.sum((v - m) * (v - m)).alias("c0"),
            F.sum(F.when(v1.isNotNull(), (v - m) * (v1 - m))).alias("c1"),
            F.sum(F.when(v2.isNotNull(), (v - m) * (v2 - m))).alias("c2"),
        )
        .filter(F.col("n") >= _AR_MIN_N)
    )
    r1 = F.col("c1") / F.col("c0")
    r2 = F.col("c2") / F.col("c0")
    return mom.select(
        "user_id", "n",
        F.round(r1 * (F.lit(1.0) - r2) / (F.lit(1.0) - r1 * r1), 6).alias("phi1"),
        F.round((r2 - r1 * r1) / (F.lit(1.0) - r1 * r1), 6).alias("phi2"),
    )


# Stationary distribution of the event-type Markov chain -------------------------------

_MS_STATES = ("click", "error", "purchase", "signup", "view")
_MS_ROUNDS = 16


def _ms_chain_cte() -> str:
    """The shared WITH-body (legs -> counts -> probabilities -> unrolled
    power iteration through v{rounds}) used by BOTH markov_stationary and
    entropy_rate — single-sourced so the two oracles cannot drift."""
    st = _MS_STATES
    trans_cases = ",\n             ".join(
        f"CAST(sum(CASE WHEN a = '{a}' AND b = '{b}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_{i}_{j}"
        for i, a in enumerate(st)
        for j, b in enumerate(st)
    )
    row_tot = ",\n             ".join(
        "(" + " + ".join(f"n_{i}_{j}" for j in range(len(st))) + f") AS t_{i}"
        for i in range(len(st))
    )
    probs = ",\n             ".join(
        f"CAST(n_{i}_{j} AS DOUBLE) / t_{i} AS p_{i}_{j}"
        for i in range(len(st))
        for j in range(len(st))
    )
    head = f"""
    WITH legs AS (
      SELECT event_type AS b,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_ms(ts), event_id) AS a
      FROM events
    ),
    cnt AS (
      SELECT {trans_cases}
      FROM legs WHERE a IS NOT NULL
    ),
    tot AS (SELECT *, {row_tot} FROM cnt),
    pm AS (SELECT *, {probs} FROM tot),
    v0 AS (SELECT pm.*, {", ".join(f"0.2 AS v_{j}" for j in range(len(st)))} FROM pm)"""
    steps = []
    for k in range(1, _MS_ROUNDS + 1):
        comps = ",\n             ".join(
            " + ".join(f"v_{i} * p_{i}_{j}" for i in range(len(st))) + f" AS v_{j}"
            for j in range(len(st))
        )
        cols = ", ".join(
            [f"n_{i}_{j}" for i in range(len(st)) for j in range(len(st))]
            + [f"t_{i}" for i in range(len(st))]
            + [f"p_{i}_{j}" for i in range(len(st)) for j in range(len(st))]
        )
        steps.append(f"""
    v{k} AS (
      SELECT {cols},
             {comps}
      FROM v{k - 1}
    )""")
    return head + "," + ",".join(steps)


def _ms_oracle_sql() -> str:
    st = _MS_STATES
    out = ", ".join(
        f"round(v_{j}, 6) AS pi_{s}" for j, s in enumerate(st)
    )
    n_trans = " + ".join(f"t_{i}" for i in range(len(st)))
    return (
        _ms_chain_cte()
        + f"""
    SELECT CAST({n_trans} AS BIGINT) AS n_trans, {out}
    FROM v{_MS_ROUNDS}"""
    )


def _ms_chain_frame(spark, sf_dir) -> DataFrame:
    """Spark twin of ``_ms_chain_cte``: the one-row frame carrying counts,
    row totals, probabilities and the iterated v_j columns — shared by
    markov_stationary and entropy_rate so the iteration cannot drift."""
    st = _MS_STATES
    k = len(st)
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_millis(F.col("ts").cast("timestamp")), "event_id"
    )
    legs = ev.select(
        F.col("event_type").alias("b"), F.lag("event_type").over(w).alias("a")
    ).filter(F.col("a").isNotNull())
    cnt = legs.agg(
        *[
            F.sum(F.when((F.col("a") == a) & (F.col("b") == b), 1).otherwise(0))
            .cast("long")
            .alias(f"n_{i}_{j}")
            for i, a in enumerate(st)
            for j, b in enumerate(st)
        ]
    )
    tot = cnt.select(
        "*",
        *[
            _fold_sum([F.col(f"n_{i}_{j}") for j in range(k)]).alias(f"t_{i}")
            for i in range(k)
        ],
    )
    pm = tot.select(
        "*",
        *[
            (F.col(f"n_{i}_{j}").cast("double") / F.col(f"t_{i}")).alias(f"p_{i}_{j}")
            for i in range(k)
            for j in range(k)
        ],
    )
    v = pm.select("*", *[F.lit(0.2).alias(f"v_{j}") for j in range(k)])
    keep = (
        [f"n_{i}_{j}" for i in range(k) for j in range(k)]
        + [f"t_{i}" for i in range(k)]
        + [f"p_{i}_{j}" for i in range(k) for j in range(k)]
    )
    for _ in range(_MS_ROUNDS):
        v = v.select(
            *keep,
            *[
                _fold_sum(
                    [F.col(f"v_{i}") * F.col(f"p_{i}_{j}") for i in range(k)]
                ).alias(f"v_{j}")
                for j in range(k)
            ],
        )
    return v



@register(
    "markov_stationary",
    _ms_oracle_sql(),
    doc=(
        f"stationary distribution of the {len(_MS_STATES)}-state "
        "event-type Markov chain by fixed-round power iteration "
        f"({_MS_ROUNDS} rounds from uniform): transition counts from the "
        "per-user ordered event stream (markov_transitions' legs), row-"
        "normalized to probabilities, then v <- vP unrolled with the "
        "5-term dot products written in identical state order on both "
        "engines (every add/mul association matches, so the doubles are "
        "bit-identical) — the long-run state-occupancy companion to "
        "markov_transitions' one-step matrix; the chain state is ONE row "
        "of 5 doubles, iteration is pure column algebra with no joins"
    ),
)
def markov_stationary(spark, sf_dir):
    """One window exchange for the legs, one conditional-agg rollup to a
    single 25-count row, then 16 rounds of column-expression algebra on
    the one-row frame (no shuffles, no loop joins — the whole iteration
    compiles into one codegen stage)."""
    st = _MS_STATES
    k = len(st)
    v = _ms_chain_frame(spark, sf_dir)
    n_trans = _fold_sum([F.col(f"t_{i}") for i in range(k)])
    return v.select(
        n_trans.cast("long").alias("n_trans"),
        *[F.round(F.col(f"v_{j}"), 6).alias(f"pi_{s}") for j, s in enumerate(st)],
    )


# K-fold ridge cross-validation (exact fold moments, closed-form fits) -----------------

_RCV_K = 5  # folds


def _rcv_oracle_sql() -> str:
    ent = {
        "a11": "nn_t", "a12": "s1_t", "a13": "s2_t",
        "a21": "s1_t", "a22": "s11_t + lam", "a23": "s12_t",
        "a31": "s2_t", "a32": "s12_t", "a33": "s22_t + lam",
        "b1": "sy_t", "b2": "s1y_t", "b3": "s2y_t",
    }
    d = {k: f"CAST({v} AS DOUBLE)" for k, v in ent.items()}
    A = [[d["a11"], d["a12"], d["a13"]],
         [d["a21"], d["a22"], d["a23"]],
         [d["a31"], d["a32"], d["a33"]]]
    b = [d["b1"], d["b2"], d["b3"]]
    det = _det3_sql(A)
    det0 = _det3_sql([[b[0], A[0][1], A[0][2]],
                      [b[1], A[1][1], A[1][2]],
                      [b[2], A[2][1], A[2][2]]])
    det1 = _det3_sql([[A[0][0], b[0], A[0][2]],
                      [A[1][0], b[1], A[1][2]],
                      [A[2][0], b[2], A[2][2]]])
    det2 = _det3_sql([[A[0][0], A[0][1], b[0]],
                      [A[1][0], A[1][1], b[1]],
                      [A[2][0], A[2][1], b[2]]])
    h = lambda c: f"CAST(sum(CAST({c} AS HUGEINT)) AS HUGEINT)"  # noqa: E731
    return f"""
    WITH r AS (
      SELECT {_MD5_60.format(key="l_orderkey * 8 + l_linenumber")} % {_RCV_K} AS fold,
             CAST(round(l_quantity * 100, 0) AS BIGINT) AS x1,
             CAST(round(l_discount * 100, 0) AS BIGINT) AS x2,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y
      FROM lineitem
    ),
    mf AS (
      SELECT fold,
             CAST(count(*) AS HUGEINT) AS nn,
             {h("x1")} AS s1, {h("x2")} AS s2, {h("y")} AS sy,
             {h("x1 * x1")} AS s11, {h("x1 * x2")} AS s12,
             {h("x2 * x2")} AS s22, {h("x1 * y")} AS s1y,
             {h("x2 * y")} AS s2y, {h("y * y")} AS syy
      FROM r GROUP BY fold
    ),
    tot AS (
      SELECT CAST(sum(nn) AS HUGEINT) AS nn, CAST(sum(s1) AS HUGEINT) AS s1,
             CAST(sum(s2) AS HUGEINT) AS s2, CAST(sum(sy) AS HUGEINT) AS sy,
             CAST(sum(s11) AS HUGEINT) AS s11, CAST(sum(s12) AS HUGEINT) AS s12,
             CAST(sum(s22) AS HUGEINT) AS s22, CAST(sum(s1y) AS HUGEINT) AS s1y,
             CAST(sum(s2y) AS HUGEINT) AS s2y, CAST(sum(syy) AS HUGEINT) AS syy
      FROM mf
    ),
    tr AS (
      SELECT mf.fold, mf.nn AS nn_f, mf.s1 AS s1_f, mf.s2 AS s2_f,
             mf.sy AS sy_f, mf.s11 AS s11_f, mf.s12 AS s12_f,
             mf.s22 AS s22_f, mf.s1y AS s1y_f, mf.s2y AS s2y_f,
             mf.syy AS syy_f,
             tot.nn - mf.nn AS nn_t, tot.s1 - mf.s1 AS s1_t,
             tot.s2 - mf.s2 AS s2_t, tot.sy - mf.sy AS sy_t,
             tot.s11 - mf.s11 AS s11_t, tot.s12 - mf.s12 AS s12_t,
             tot.s22 - mf.s22 AS s22_t, tot.s1y - mf.s1y AS s1y_t,
             tot.s2y - mf.s2y AS s2y_t,
             (tot.nn - mf.nn) * {_RIDGE_LAM} AS lam
      FROM mf CROSS JOIN tot
    ),
    fit AS (
      SELECT fold, nn_f, s1_f, s2_f, sy_f, s11_f, s12_f, s22_f, s1y_f,
             s2y_f, syy_f, nn_t,
             ({det0}) / ({det}) AS b0,
             ({det1}) / ({det}) AS b1,
             ({det2}) / ({det}) AS b2
      FROM tr
    )
    SELECT CAST(fold AS BIGINT) AS fold,
           CAST(nn_t AS BIGINT) AS n_train, CAST(nn_f AS BIGINT) AS n_test,
           round(b0, 6) AS b0, round(b1, 6) AS b1, round(b2, 6) AS b2,
           round((CAST(syy_f AS DOUBLE)
                  - 2.0 * (b0 * CAST(sy_f AS DOUBLE) + b1 * CAST(s1y_f AS DOUBLE)
                           + b2 * CAST(s2y_f AS DOUBLE))
                  + (b0 * b0 * CAST(nn_f AS DOUBLE) + b1 * b1 * CAST(s11_f AS DOUBLE)
                     + b2 * b2 * CAST(s22_f AS DOUBLE)
                     + 2.0 * b0 * b1 * CAST(s1_f AS DOUBLE)
                     + 2.0 * b0 * b2 * CAST(s2_f AS DOUBLE)
                     + 2.0 * b1 * b2 * CAST(s12_f AS DOUBLE)))
                 / CAST(nn_f AS DOUBLE), 2) AS test_mse
    FROM fit"""


@register(
    "ridge_cv_mse",
    _rcv_oracle_sql(),
    doc=(
        f"{_RCV_K}-fold cross-validated ridge regression of extendedprice "
        "on (quantity, discount): deterministic md5 folds (the "
        "kfold_assign idiom), EXACT 128-bit Gram moments per fold, train "
        "moments by exact subtraction total - fold (the corpus is scanned "
        "ONCE for all folds — the leave-fold-out trick that makes k-fold "
        "CV a single-pass distributed op), per-fold Cramer solve via the "
        "shared fixed-association determinant helper, and the held-out "
        "MSE expanded in the same fold moments (no second data pass); "
        "the ML-pipeline model-selection op on ridge_regression's "
        "normal-equations machinery"
    ),
)
def ridge_cv_mse(spark, sf_dir):
    """ONE partial-agg shuffle to K 11-number moment rows; everything
    after (train subtraction, solve, MSE expansion) is O(K) algebra on
    the aggregated frame. No per-fold data passes, no gradient steps."""
    li = _t(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    fold = (
        F.conv(
            F.substring(
                F.md5((F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("string")),
                1, 15,
            ),
            16, 10,
        ).cast("long")
        % _RCV_K
    )
    r = li.select(
        fold.alias("fold"),
        F.round(F.col("l_quantity") * 100, 0).cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("x2"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
    )
    x1, x2, y = (F.col(c).cast(d38) for c in ("x1", "x2", "y"))
    mf = r.groupBy("fold").agg(
        F.count(F.lit(1)).cast(d38).alias("nn"),
        F.sum(x1).cast(d38).alias("s1"),
        F.sum(x2).cast(d38).alias("s2"),
        F.sum(y).cast(d38).alias("sy"),
        F.sum(x1 * x1).cast(d38).alias("s11"),
        F.sum(x1 * x2).cast(d38).alias("s12"),
        F.sum(x2 * x2).cast(d38).alias("s22"),
        F.sum(x1 * y).cast(d38).alias("s1y"),
        F.sum(x2 * y).cast(d38).alias("s2y"),
        F.sum(y * y).cast(d38).alias("syy"),
    )
    mf = _persist_evict(mf)
    mcols = ["nn", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y", "syy"]
    tot = mf.agg(*[F.sum(c).cast(d38).alias(c) for c in mcols])
    tr = mf.crossJoin(F.broadcast(tot.select(*[F.col(c).alias(f"{c}_tot") for c in mcols])))
    for c in mcols:
        tr = tr.withColumn(f"{c}_f", F.col(c)).withColumn(
            f"{c}_t", (F.col(f"{c}_tot") - F.col(c)).cast(d38)
        )
    lam = (F.col("nn_t") * _RIDGE_LAM).cast(d38)
    dc = lambda c: c.cast("double")  # noqa: E731
    A = [
        [dc(F.col("nn_t")), dc(F.col("s1_t")), dc(F.col("s2_t"))],
        [dc(F.col("s1_t")), dc(F.col("s11_t") + lam), dc(F.col("s12_t"))],
        [dc(F.col("s2_t")), dc(F.col("s12_t")), dc(F.col("s22_t") + lam)],
    ]
    bv = [dc(F.col("sy_t")), dc(F.col("s1y_t")), dc(F.col("s2y_t"))]
    det = _det3_col(A)
    det0 = _det3_col([[bv[0], A[0][1], A[0][2]],
                      [bv[1], A[1][1], A[1][2]],
                      [bv[2], A[2][1], A[2][2]]])
    det1 = _det3_col([[A[0][0], bv[0], A[0][2]],
                      [A[1][0], bv[1], A[1][2]],
                      [A[2][0], bv[2], A[2][2]]])
    det2 = _det3_col([[A[0][0], A[0][1], bv[0]],
                      [A[1][0], A[1][1], bv[1]],
                      [A[2][0], A[2][1], bv[2]]])
    fit = tr.withColumn("b0", det0 / det).withColumn("b1", det1 / det).withColumn(
        "b2", det2 / det
    )
    b0, b1, b2 = F.col("b0"), F.col("b1"), F.col("b2")
    mse = (
        dc(F.col("syy_f"))
        - 2.0 * (b0 * dc(F.col("sy_f")) + b1 * dc(F.col("s1y_f")) + b2 * dc(F.col("s2y_f")))
        + (
            b0 * b0 * dc(F.col("nn_f"))
            + b1 * b1 * dc(F.col("s11_f"))
            + b2 * b2 * dc(F.col("s22_f"))
            + 2.0 * b0 * b1 * dc(F.col("s1_f"))
            + 2.0 * b0 * b2 * dc(F.col("s2_f"))
            + 2.0 * b1 * b2 * dc(F.col("s12_f"))
        )
    ) / dc(F.col("nn_f"))
    return fit.select(
        F.col("fold").cast("long").alias("fold"),
        F.col("nn_t").cast("long").alias("n_train"),
        F.col("nn_f").cast("long").alias("n_test"),
        F.round(b0, 6).alias("b0"),
        F.round(b1, 6).alias("b1"),
        F.round(b2, 6).alias("b2"),
        F.round(mse, 2).alias("test_mse"),
    )


# Calibration bins (reliability curve) -------------------------------------------------

_CAL_BIN = 25.0  # score-bin width in value units
_CAL_NBIN = 20


@register(
    "calibration_bins",
    f"""
    WITH s AS (
      SELECT least(CAST(floor(value / {_CAL_BIN!r}) AS BIGINT), {_CAL_NBIN - 1}) AS bin,
             CAST(round(value * 100, 0) AS BIGINT) AS c,
             CASE WHEN event_type = '{_AUC_POS}' THEN 1 ELSE 0 END AS pos
      FROM events
      WHERE event_type IN ('{_AUC_POS}', '{_AUC_NEG}') AND value IS NOT NULL
    )
    SELECT bin, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(pos) AS BIGINT) AS n_pos,
           round(CAST(sum(c) AS DOUBLE)
                 / (count(*) * {100.0 * _CAL_BIN * _CAL_NBIN!r}), 6) AS mean_score,
           round(CAST(sum(pos) AS DOUBLE) / count(*), 6) AS pos_rate
    FROM s GROUP BY bin
    """,
    doc=(
        f"reliability (calibration) curve of the normalized value score "
        f"against the '{_AUC_POS}'-vs-'{_AUC_NEG}' outcome: fixed-width "
        f"score bins (width {_CAL_BIN}, capped at {_CAL_NBIN}), per-bin "
        "count, positive count, mean score and empirical positive rate — "
        "the diagnostic that pairs with auc_mannwhitney (AUC measures "
        "ranking, calibration measures probability faithfulness); value "
        "is cent-quantized, so the bin mean is an exact BIGINT cent sum "
        "over one double division — order-insensitive at any scale (the "
        "avg(double) formulation straddled a 6-dp boundary at sf1); "
        "fixed bins, never ntile (rank ties would make bin membership "
        "nondeterministic)"
    ),
)
def calibration_bins(spark, sf_dir):
    """Map-side bin + one partial-agg shuffle to O(bins) rows."""
    ev = _t(spark, sf_dir, "events")
    s = ev.filter(
        F.col("event_type").isin(_AUC_POS, _AUC_NEG) & F.col("value").isNotNull()
    ).select(
        F.least(
            F.floor(F.col("value") / _CAL_BIN).cast("long"), F.lit(_CAL_NBIN - 1)
        ).alias("bin"),
        F.round(F.col("value") * 100, 0).cast("long").alias("c"),
        F.when(F.col("event_type") == _AUC_POS, 1).otherwise(0).alias("pos"),
    )
    return s.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.round(
            F.sum("c").cast("double")
            / (F.count(F.lit(1)) * (100.0 * _CAL_BIN * _CAL_NBIN)),
            6,
        ).alias("mean_score"),
        F.round(F.sum("pos").cast("double") / F.count(F.lit(1)), 6).alias("pos_rate"),
    )


# Population stability index between the two corpus epochs -----------------------------


@register(
    "psi_drift",
    f"""
    WITH b AS (
      SELECT value, epoch_ms(ts) AS t_ms FROM events WHERE value IS NOT NULL
    ),
    bounds AS (SELECT min(t_ms) AS t0 FROM b),
    s AS (
      SELECT least(CAST(floor(value / {_CAL_BIN!r}) AS BIGINT), {_CAL_NBIN - 1}) AS bin,
             CASE WHEN (t_ms - t0) // 86400000 < {_MV_SPLIT_DAY} THEN 0 ELSE 1 END AS half
      FROM b CROSS JOIN bounds
    ),
    c AS (
      SELECT bin,
             CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n0,
             CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n1
      FROM s GROUP BY bin
    ),
    tot AS (SELECT CAST(sum(n0) AS BIGINT) AS t0, CAST(sum(n1) AS BIGINT) AS t1 FROM c)
    SELECT c.bin, c.n0, c.n1,
           round(CAST(c.n0 AS DOUBLE) / tot.t0, 6) AS p0,
           round(CAST(c.n1 AS DOUBLE) / tot.t1, 6) AS p1,
           round((CAST(c.n1 AS DOUBLE) / tot.t1 - CAST(c.n0 AS DOUBLE) / tot.t0)
                 * ln((CAST(c.n1 AS DOUBLE) / tot.t1)
                      / (CAST(c.n0 AS DOUBLE) / tot.t0)), 6) AS psi_part
    FROM c CROSS JOIN tot
    """,
    doc=(
        "population stability index of the value distribution between "
        f"the two corpus epochs (days < {_MV_SPLIT_DAY} vs rest, the "
        "motion_vectors split): fixed-width bins with add-1 smoothing "
        "(so an empty bin in one epoch contributes a finite part, "
        "mirrored exactly), psi_part = (p1 - p0) ln(p1/p0) per bin — "
        "the standard feature-drift monitor for a deployed model "
        "(sum psi_part > 0.25 = major shift); counts exact BIGINTs "
        "including the smoothing, three float ops per O(bins) row"
    ),
)
def psi_drift(spark, sf_dir):
    """One scalar broadcast (epoch origin), map-side bin/half, one
    partial-agg to O(bins), one one-row totals broadcast."""
    ev = _t(spark, sf_dir, "events")
    b = ev.filter(F.col("value").isNotNull()).select(
        "value", F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms")
    )
    bounds = b.agg(F.min("t_ms").alias("t0m"))
    s = b.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor(F.col("value") / _CAL_BIN).cast("long"), F.lit(_CAL_NBIN - 1)
        ).alias("bin"),
        F.when(
            ((F.col("t_ms") - F.col("t0m")) / 86400000).cast("long") < _MV_SPLIT_DAY, 0
        ).otherwise(1).alias("half"),
    )
    c = s.groupBy("bin").agg(
        (F.sum(F.when(F.col("half") == 0, 1).otherwise(0)) + 1).cast("long").alias("n0"),
        (F.sum(F.when(F.col("half") == 1, 1).otherwise(0)) + 1).cast("long").alias("n1"),
    )
    c = _persist_evict(c)
    tot = c.agg(
        F.sum("n0").cast("long").alias("t0"), F.sum("n1").cast("long").alias("t1")
    )
    p0 = F.col("n0").cast("double") / F.col("t0")
    p1 = F.col("n1").cast("double") / F.col("t1")
    return c.crossJoin(F.broadcast(tot)).select(
        "bin", "n0", "n1",
        F.round(p0, 6).alias("p0"),
        F.round(p1, 6).alias("p1"),
        F.round((p1 - p0) * F.log(p1 / p0), 6).alias("psi_part"),
    )


# Small-cell suppression (k-anonymity publication gate) --------------------------------

_SUP_K = 5  # publication threshold


@register(
    "small_cell_suppress",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    prim AS (
      SELECT cy, cx, CAST(x AS BIGINT) AS x,
             CASE WHEN x < {_SUP_K} THEN 1 ELSE 0 END AS supp1
      FROM cells
    ),
    rowstat AS (
      SELECT cy, CAST(count(*) AS BIGINT) AS n_cells,
             CAST(sum(supp1) AS BIGINT) AS n_supp
      FROM prim GROUP BY cy
    ),
    comp AS (
      SELECT cy, cx
      FROM (
        SELECT p.cy, p.cx,
               row_number() OVER (PARTITION BY p.cy ORDER BY p.x, p.cx) AS rn
        FROM prim p JOIN rowstat r ON r.cy = p.cy
        WHERE p.supp1 = 0 AND r.n_supp = 1 AND r.n_cells >= 2
      ) WHERE rn = 1
    )
    SELECT p.cy, p.cx, p.x,
           CAST(CASE WHEN p.supp1 = 1 THEN 1
                     WHEN c.cx IS NOT NULL THEN 2 ELSE 0 END AS INT) AS suppressed
    FROM prim p LEFT JOIN comp c ON c.cy = p.cy AND c.cx = p.cx
    """,
    doc=(
        f"k-anonymity small-cell suppression for publishing the density "
        f"raster: cells with count < {_SUP_K} are primary-suppressed, and "
        "any grid row left with EXACTLY one suppressed cell gets its "
        "smallest unsuppressed cell complementary-suppressed (tie-break "
        "on cx) so the hidden value cannot be recovered from the row "
        "margin — the disclosure-control step between the tiling engine "
        "and a public fire-density product; pure integer logic, one "
        "deterministic window"
    ),
)
def small_cell_suppress(spark, sf_dir):
    """Cell raster once, a per-row (cy) rollup broadcast back, one
    window on the O(candidates) frame. All frames O(cells)."""
    cells = _persist_evict(_cell_counts(spark, sf_dir))
    prim = cells.select(
        "cy", "cx", F.col("x").cast("long").alias("x"),
        F.when(F.col("x") < _SUP_K, 1).otherwise(0).alias("supp1"),
    )
    prim = _persist_evict(prim)
    rowstat = prim.groupBy("cy").agg(
        F.count(F.lit(1)).alias("n_cells"), F.sum("supp1").alias("n_supp")
    )
    cand = (
        prim.join(F.broadcast(rowstat), "cy")
        .filter((F.col("supp1") == 0) & (F.col("n_supp") == 1) & (F.col("n_cells") >= 2))
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("cy").orderBy("x", "cx"))
        )
        .filter(F.col("rn") == 1)
        .select("cy", "cx", F.lit(1).alias("is_comp"))
    )
    return prim.join(cand, ["cy", "cx"], "left").select(
        "cy", "cx", "x",
        F.when(F.col("supp1") == 1, 1)
        .when(F.col("is_comp").isNotNull(), 2)
        .otherwise(0)
        .cast("int")
        .alias("suppressed"),
    )


# Half-sample bootstrap variance of the cell-mean (deterministic replicates) -----------

_BB_REPS = 32  # bootstrap replicates

_CONCAT_BCYX = (
    "concat(CAST(r.b AS VARCHAR), ':', CAST(c.cy AS VARCHAR), "
    "':', CAST(c.cx AS VARCHAR))"
)


@register(
    "block_bootstrap_var",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    reps AS (SELECT unnest(range({_BB_REPS})) AS b),
    inc AS (
      SELECT r.b, c.x
      FROM cells c CROSS JOIN reps r
      WHERE {_MD5_60.format(key=_CONCAT_BCYX)} % 2 = 0
    ),
    rep AS (
      SELECT b, CAST(count(*) AS BIGINT) AS n_inc,
             CAST(sum(x) AS BIGINT) AS sum_x,
             CAST(sum(x) AS DOUBLE) / count(*) AS m
      FROM inc GROUP BY b
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS b_reps, sum(m) AS sm, sum(m * m) AS smm
      FROM rep
    )
    SELECT b_reps,
           round(sm / b_reps, 6) AS mean_of_means,
           round((smm - sm * sm / b_reps) / (b_reps - 1), 6) AS var_est,
           round(sqrt((smm - sm * sm / b_reps) / (b_reps - 1)), 6) AS se
    FROM agg
    """,
    doc=(
        f"deterministic half-sample bootstrap of the mean cell count: "
        f"{_BB_REPS} replicates, replicate b containing cell (cy, cx) "
        "iff md5(b:cy:cx) is even (the kfold/sample_stratified hash "
        "idiom — reproducible resampling with NO RNG state to shard), "
        "per-replicate exact integer mass, then the across-replicate "
        "variance/se of the mean — the spatial-uncertainty quantifier "
        "that respects cell (block) structure where an iid bootstrap "
        "over points would understate autocorrelated variance; the "
        "32-term moment sums are the order-sensitive reduction "
        "(6-dp rounded)"
    ),
)
def block_bootstrap_var(spark, sf_dir):
    """Cell raster once, a constant {reps}-row broadcast fan-out, one
    partial agg to O(reps) rows, one scalar rollup. Replicate membership
    is a map-side hash — no sampling state, no shuffle of points."""
    cells = _cell_counts(spark, sf_dir)
    reps = spark.range(_BB_REPS).select(F.col("id").alias("b"))
    inc = (
        cells.crossJoin(F.broadcast(reps))
        .filter(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("b"), F.col("cy"), F.col("cx"))),
                    1, 15,
                ),
                16, 10,
            ).cast("long")
            % 2
            == 0
        )
        .select("b", "x")
    )
    rep = inc.groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("n_inc"),
        F.sum("x").cast("long").alias("sum_x"),
        (F.sum("x").cast("double") / F.count(F.lit(1))).alias("m"),
    )
    agg = rep.agg(
        F.count(F.lit(1)).cast("long").alias("b_reps"),
        F.sum("m").alias("sm"),
        F.sum(F.col("m") * F.col("m")).alias("smm"),
    )
    br, sm, smm = F.col("b_reps"), F.col("sm"), F.col("smm")
    return agg.select(
        "b_reps",
        F.round(sm / br, 6).alias("mean_of_means"),
        F.round((smm - sm * sm / br) / (br - 1), 6).alias("var_est"),
        F.round(F.sqrt((smm - sm * sm / br) / (br - 1)), 6).alias("se"),
    )


# Percolation clusters over the top-decile density cells -------------------------------

_PC_PCT = 0.9  # occupancy threshold quantile (scale-invariant)
_PC_ROUNDS = 32  # min-label rounds; convergence is CHECKED, never assumed


@register(
    "percolation_clusters",
    f"""
    WITH RECURSIVE p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    rk AS (
      SELECT cy, cx, x,
             row_number() OVER (ORDER BY x, cy, cx) AS rn,
             count(*) OVER () AS nc
      FROM cells
    ),
    thr AS (
      SELECT min(x) AS tau FROM rk
      WHERE rn > CAST(floor(nc * {_PC_PCT!r}) AS BIGINT)
    ),
    occ AS (
      SELECT cy, cx, CAST(x AS BIGINT) AS x, cy * 10000 + cx AS lab0
      FROM rk CROSS JOIN thr WHERE x >= tau
    ),
    adj AS (
      SELECT a.cy AS acy, a.cx AS acx, b.cy AS bcy, b.cx AS bcx
      FROM occ a JOIN occ b
        ON abs(a.cy - b.cy) <= 1 AND abs(a.cx - b.cx) <= 1
    ),
    reach AS (
      SELECT acy AS cy, acx AS cx, bcy, bcx FROM adj
      UNION
      SELECT r.cy, r.cx, a.bcy, a.bcx
      FROM reach r JOIN adj a ON a.acy = r.bcy AND a.acx = r.bcx
    ),
    comp AS (
      SELECT cy, cx, min(bcy * 10000 + bcx) AS comp
      FROM reach GROUP BY cy, cx
    ),
    sz AS (SELECT comp, CAST(count(*) AS BIGINT) AS comp_size FROM comp GROUP BY comp)
    SELECT o.cy, o.cx, o.x, c.comp, s.comp_size
    FROM occ o
    JOIN comp c ON c.cy = o.cy AND c.cx = o.cx
    JOIN sz s ON s.comp = c.comp
    """,
    doc=(
        "site-percolation clusters of the top-decile density cells: the "
        f"occupancy threshold is the exact {_PC_PCT:.0%} quantile of cell "
        "counts (scale-INVARIANT — at 10x density the occupied set stays "
        "~10% of cells, so cluster geometry, not cluster count, is what "
        "scale changes), 8-connected components by min-label propagation "
        "with a convergence CHECK that raises rather than returning "
        "wrong labels, plus per-cluster sizes — the cluster-size-"
        "distribution op behind contiguity analyses (burned-area "
        "patches, urban-light agglomerations); integer-exact end to end"
    ),
)
def percolation_clusters(spark, sf_dir):
    """Threshold via one ordered window on the O(cells) frame; each
    label round is a 3x3 SCATTER -> min partial-agg -> join with the
    once-checkpointed occupied frame (the pit_fill shape: no self-join,
    linear plan-stats growth, one shuffle per round); the final
    convergence probe runs ONE extra round and raises on any change."""
    cells = _persist_evict(_cell_counts(spark, sf_dir))
    wrk = Window.orderBy("x", "cy", "cx")
    rk = cells.select(
        "cy", "cx", "x",
        F.row_number().over(wrk).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy()
        ).alias("nc"),
    )
    thr = rk.filter(
        F.col("rn") > F.floor(F.col("nc") * _PC_PCT).cast("long")
    ).agg(F.min("x").alias("tau"))
    occ = _persist_evict(
        rk.crossJoin(F.broadcast(thr))
        .filter(F.col("x") >= F.col("tau"))
        .select(
            "cy", "cx", F.col("x").cast("long").alias("x"),
            (F.col("cy") * 10000 + F.col("cx")).alias("lab0"),
        )
        .localCheckpoint()
    )
    off = spark.range(-1, 2).select(F.col("id").alias("oy")).crossJoin(
        spark.range(-1, 2).select(F.col("id").alias("ox"))
    )

    def propagate(f: DataFrame) -> DataFrame:
        nm = (
            f.crossJoin(F.broadcast(off))
            .select(
                (F.col("cy") + F.col("oy")).alias("cy"),
                (F.col("cx") + F.col("ox")).alias("cx"),
                F.col("lab").alias("contrib"),
            )
            .groupBy("cy", "cx")
            .agg(F.min("contrib").alias("lab"))
        )
        return occ.select("cy", "cx").join(nm, ["cy", "cx"])

    f = occ.select("cy", "cx", F.col("lab0").alias("lab"))
    for _ in range(_PC_ROUNDS):
        f = _persist_evict(propagate(f).localCheckpoint())
    probe = propagate(f)
    changed = (
        f.join(probe.select("cy", "cx", F.col("lab").alias("lab2")), ["cy", "cx"])
        .filter(F.col("lab") != F.col("lab2"))
        .count()
    )
    if changed:
        raise RuntimeError(
            f"percolation_clusters: {changed} labels still moving after "
            f"{_PC_ROUNDS} rounds — raise _PC_ROUNDS"
        )
    comp = f.select("cy", "cx", F.col("lab").alias("comp"))
    sz = comp.groupBy("comp").agg(F.count(F.lit(1)).cast("long").alias("comp_size"))
    return (
        occ.select("cy", "cx", "x")
        .join(comp, ["cy", "cx"])
        .join(F.broadcast(sz), "comp")
        .select("cy", "cx", "x", "comp", "comp_size")
    )


# Local-maxima non-maximum suppression -------------------------------------------------

_NMS_R = 30  # suppression radius, centidegrees (= ring cell size)


@register(
    "local_maxima_nms",
    f"""
    WITH pts AS (
      SELECT event_id,
             CAST(event_id * 7919 % 2000 AS BIGINT) AS iy,
             CAST(event_id * 104729 % 2400 AS BIGINT) + 1000 AS ix,
             CAST(round(value * 100, 0) AS BIGINT) AS s
      FROM events WHERE value IS NOT NULL
    ),
    cpts AS (SELECT *, iy // {_NMS_R} AS cy, ix // {_NMS_R} AS cx FROM pts),
    sup AS (
      SELECT a.event_id, CAST(count(*) AS BIGINT) AS n_sup
      FROM cpts a JOIN cpts b
        ON abs(a.cy - b.cy) <= 1 AND abs(a.cx - b.cx) <= 1
       AND a.event_id <> b.event_id
      WHERE (a.iy - b.iy) * (a.iy - b.iy) + (a.ix - b.ix) * (a.ix - b.ix)
              <= {_NMS_R * _NMS_R}
        AND (b.s > a.s OR (b.s = a.s AND b.event_id < a.event_id))
      GROUP BY a.event_id
    )
    SELECT p.event_id, p.iy, p.ix, p.s,
           coalesce(s.n_sup, 0) AS n_sup,
           CAST(CASE WHEN s.event_id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
    FROM pts p LEFT JOIN sup s ON s.event_id = p.event_id
    """,
    doc=(
        f"non-maximum suppression of detections: a point survives iff no "
        f"strictly-dominating point lies within {_NMS_R} centidegrees — "
        "dominance is (strength, then smaller id) so the tie-break is "
        "total and the kept set is exactly the greedy-NMS fixed points; "
        "strengths are exact value cents, the pair search the same "
        "integer cell-cover ring join as gfunction_nn — the peak-"
        "extraction step between detection and reporting (one hotspot "
        "per flare, not one per pixel); the dedup (cell, salt) skew "
        "lever applies to a degenerate hot cell"
    ),
)
def local_maxima_nms(spark, sf_dir, events: DataFrame | None = None):
    """kRing explode -> equi-join (never points x points), dominance
    filter, per-point suppressor counts as a partial agg, LEFT join back
    to flag survivors."""
    ev = events if events is not None else _t(spark, sf_dir, "events")
    pts = _persist_evict(
        ev.filter(F.col("value").isNotNull()).select(
            "event_id",
            (F.col("event_id") * 7919 % 2000).alias("iy"),
            ((F.col("event_id") * 104729 % 2400) + 1000).alias("ix"),
            F.round(F.col("value") * 100, 0).cast("long").alias("s"),
        )
    )
    cpts = pts.select(
        "*",
        F.floor(F.col("iy") / _NMS_R).alias("cy"),
        F.floor(F.col("ix") / _NMS_R).alias("cx"),
    )
    off = spark.range(-1, 2).select(F.col("id").alias("dy")).crossJoin(
        spark.range(-1, 2).select(F.col("id").alias("dx"))
    )
    a = cpts.crossJoin(F.broadcast(off)).select(
        "event_id", "iy", "ix", "s",
        (F.col("cy") + F.col("dy")).alias("cy"),
        (F.col("cx") + F.col("dx")).alias("cx"),
    )
    b = cpts.select(
        F.col("event_id").alias("bid"), F.col("iy").alias("biy"),
        F.col("ix").alias("bix"), F.col("s").alias("bs"), "cy", "cx",
    )
    d2 = (F.col("iy") - F.col("biy")) * (F.col("iy") - F.col("biy")) + (
        F.col("ix") - F.col("bix")
    ) * (F.col("ix") - F.col("bix"))
    dom = (F.col("bs") > F.col("s")) | (
        (F.col("bs") == F.col("s")) & (F.col("bid") < F.col("event_id"))
    )
    sup = (
        a.join(b, ["cy", "cx"])
        .filter(
            (F.col("event_id") != F.col("bid")) & (d2 <= _NMS_R * _NMS_R) & dom
        )
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sup"))
    )
    return pts.join(sup, "event_id", "left").select(
        "event_id", "iy", "ix", "s",
        F.coalesce(F.col("n_sup"), F.lit(0)).cast("long").alias("n_sup"),
        F.when(F.col("n_sup").isNull(), 1).otherwise(0).cast("int").alias("kept"),
    )


# Kaplan-Meier survival (signup -> first purchase) -------------------------------------


@register(
    "kaplan_meier",
    """
    WITH e AS (
      SELECT user_id, event_type, epoch_ms(ts) AS t_ms FROM events
    ),
    u AS (
      SELECT user_id,
             min(t_ms) AS t_first,
             min(CASE WHEN event_type = 'purchase' THEN t_ms END) AS t_purch,
             max(t_ms) AS t_last
      FROM e GROUP BY user_id
    ),
    dur AS (
      SELECT user_id,
             CASE WHEN t_purch IS NOT NULL
                  THEN (t_purch - t_first) // 86400000
                  ELSE (t_last - t_first) // 86400000 END AS t_days,
             CASE WHEN t_purch IS NOT NULL THEN 1 ELSE 0 END AS observed
      FROM u
    ),
    byt AS (
      SELECT t_days,
             CAST(sum(observed) AS BIGINT) AS d,
             CAST(sum(1 - observed) AS BIGINT) AS c
      FROM dur GROUP BY t_days
    ),
    tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS n_users FROM byt),
    risk AS (
      SELECT t_days, d, c,
             n_users - coalesce(sum(d + c) OVER (ORDER BY t_days
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM byt CROSS JOIN tot
    )
    SELECT t_days, CAST(n_risk AS BIGINT) AS n_risk, d, c,
           round(CASE WHEN max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
                        OVER (ORDER BY t_days
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
                 THEN 0.0
                 ELSE exp(sum(CASE WHEN d > 0 AND d < n_risk
                              THEN ln(1.0 - CAST(d AS DOUBLE) / n_risk)
                              ELSE 0.0 END)
                          OVER (ORDER BY t_days
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                 END, 6) AS surv
    FROM risk
    """,
    doc=(
        "Kaplan-Meier survival of time-to-first-purchase per user "
        "(censored at the last observed event): per-user durations from "
        "one rollup, event/censor counts per distinct day, the at-risk "
        "count from ONE cumulative window (total minus strictly-earlier "
        "mass — exact integers), and S(t) as exp of the ordered "
        "cumulative sum of ln(1 - d/n) — the window's frame order makes "
        "the float reduction order IDENTICAL on both engines (unlike "
        "groupBy sums), with the d = n_risk exhaustion case pinned to "
        "exactly 0 (Spark ln(0) is NULL, DuckDB -inf — the CASE keeps "
        "both out of the sum) — the churn/conversion-lag curve over the "
        "event stream"
    ),
)
def kaplan_meier(spark, sf_dir):
    """One partial-agg rollup per user, one to distinct days (O(days)
    frame), then ordered cumulative windows — deterministic reduction
    order by construction."""
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
    )
    u = e.groupBy("user_id").agg(
        F.min("t_ms").alias("t_first"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("t_ms"))).alias("t_purch"),
        F.max("t_ms").alias("t_last"),
    )
    dur = u.select(
        F.when(
            F.col("t_purch").isNotNull(),
            ((F.col("t_purch") - F.col("t_first")) / 86400000).cast("long"),
        )
        .otherwise(((F.col("t_last") - F.col("t_first")) / 86400000).cast("long"))
        .alias("t_days"),
        F.when(F.col("t_purch").isNotNull(), 1).otherwise(0).alias("observed"),
    )
    byt = dur.groupBy("t_days").agg(
        F.sum("observed").cast("long").alias("d"),
        F.sum(1 - F.col("observed")).cast("long").alias("c"),
    )
    byt = _persist_evict(byt)
    tot = byt.agg(F.sum(F.col("d") + F.col("c")).cast("long").alias("n_users"))
    wprev = Window.orderBy("t_days").rowsBetween(Window.unboundedPreceding, -1)
    wcur = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = byt.crossJoin(F.broadcast(tot)).select(
        "t_days", "d", "c",
        (
            F.col("n_users")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wprev), F.lit(0))
        ).alias("n_risk"),
    )
    exhausted = (
        F.max(F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0)).over(wcur) == 1
    )
    logsum = F.sum(
        F.when(
            (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
            F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")),
        ).otherwise(F.lit(0.0))
    ).over(wcur)
    return risk.select(
        "t_days",
        F.col("n_risk").cast("long").alias("n_risk"),
        "d", "c",
        F.round(F.when(exhausted, F.lit(0.0)).otherwise(F.exp(logsum)), 6).alias("surv"),
    )


# Entropy rate of the event-type Markov chain ------------------------------------------


def _er_oracle_sql() -> str:
    st = _MS_STATES
    k = len(st)
    rate = " + ".join(f"v_{i} * h_{i}" for i in range(k))
    pi_h = " + ".join(
        f"(CASE WHEN v_{i} > 0 THEN v_{i} * ln(v_{i}) ELSE 0.0 END)" for i in range(k)
    )
    n_trans = " + ".join(f"t_{i}" for i in range(k))
    hdefs = []
    for i in range(k):
        terms = " + ".join(
            f"(CASE WHEN p_{i}_{j} > 0 THEN p_{i}_{j} * ln(p_{i}_{j}) ELSE 0.0 END)"
            for j in range(k)
        )
        hdefs.append(f"-({terms}) AS h_{i}")
    return (
        _ms_chain_cte()
        + f""",
    hrow AS (
      SELECT *, {", ".join(hdefs)}
      FROM v{_MS_ROUNDS}
    )
    SELECT CAST({n_trans} AS BIGINT) AS n_trans,
           round({rate}, 6) AS entropy_rate,
           round(-({pi_h}), 6) AS entropy_stationary
    FROM hrow"""
    )


@register(
    "entropy_rate",
    _er_oracle_sql(),
    doc=(
        "entropy rate of the event-type Markov chain: H = sum_i pi_i "
        "H(P_i.) with pi from the SAME 16-round power iteration as "
        "markov_stationary (the chain CTE/frame is single-sourced, so "
        "the two ops cannot drift), plus the stationary entropy H(pi) "
        "for comparison — H(pi) - H_rate measures how much the chain's "
        "memory compresses the stream (the sequence-predictability "
        "number behind session-modeling and compression-ratio quality "
        "signals); every ln argument and 5-term dot product written in "
        "identical fixed order on both engines"
    ),
)
def entropy_rate(spark, sf_dir):
    """The shared one-row chain frame (one window exchange + one rollup),
    then pure fixed-order column algebra — no additional shuffles."""
    st = _MS_STATES
    k = len(st)
    v = _ms_chain_frame(spark, sf_dir)
    hrow = v.select(
        "*",
        *[
            (
                -_fold_sum(
                    [
                        F.when(
                            F.col(f"p_{i}_{j}") > 0,
                            F.col(f"p_{i}_{j}") * F.log(F.col(f"p_{i}_{j}")),
                        ).otherwise(F.lit(0.0))
                        for j in range(k)
                    ]
                )
            ).alias(f"h_{i}")
            for i in range(k)
        ],
    )
    rate = _fold_sum([F.col(f"v_{i}") * F.col(f"h_{i}") for i in range(k)])
    pi_h = _fold_sum(
        [
            F.when(F.col(f"v_{i}") > 0, F.col(f"v_{i}") * F.log(F.col(f"v_{i}"))).otherwise(
                F.lit(0.0)
            )
            for i in range(k)
        ]
    )
    n_trans = _fold_sum([F.col(f"t_{i}") for i in range(k)])
    return hrow.select(
        n_trans.cast("long").alias("n_trans"),
        F.round(rate, 6).alias("entropy_rate"),
        F.round(-pi_h, 6).alias("entropy_stationary"),
    )


# Heaps' law (vocabulary growth exponent) ----------------------------------------------

_HL_CHECK = 50  # curve checkpoint stride, docs


@register(
    "heaps_law",
    f"""
    WITH t AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tc AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
      FROM t WHERE tok <> '' GROUP BY doc_id, tok
    ),
    first AS (
      SELECT tok, min(doc_id) AS fdoc FROM tc GROUP BY tok
    ),
    perdoc AS (
      SELECT tc.doc_id,
             CAST(sum(tc.c) AS BIGINT) AS n_tok,
             CAST(sum(CASE WHEN f.fdoc = tc.doc_id THEN 1 ELSE 0 END) AS BIGINT)
               AS novel
      FROM tc JOIN first f ON f.tok = tc.tok
      GROUP BY tc.doc_id
    ),
    curve AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS r,
             sum(n_tok) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS n_cum,
             sum(novel) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS v_cum
      FROM perdoc
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(ln(CAST(n_cum AS DOUBLE))) AS sx,
             sum(ln(CAST(v_cum AS DOUBLE))) AS sy,
             sum(ln(CAST(n_cum AS DOUBLE)) * ln(CAST(n_cum AS DOUBLE))) AS sxx,
             sum(ln(CAST(n_cum AS DOUBLE)) * ln(CAST(v_cum AS DOUBLE))) AS sxy
      FROM curve
    )
    SELECT curve.r, CAST(curve.n_cum AS BIGINT) AS n_cum,
           CAST(curve.v_cum AS BIGINT) AS v_cum,
           round((m.n * m.sxy - m.sx * m.sy)
                 / (m.n * m.sxx - m.sx * m.sx), 6) AS beta,
           round((m.sy - (m.n * m.sxy - m.sx * m.sy)
                        / (m.n * m.sxx - m.sx * m.sx) * m.sx) / m.n, 6) AS ln_k
    FROM curve CROSS JOIN m
    WHERE curve.r % {_HL_CHECK} = 0
    """,
    doc=(
        "Heaps' law fit of vocabulary growth V(n) ~ K n^beta over the "
        "doc_id-ordered corpus prefix: per-token first-occurrence doc "
        "(ngram_novelty's idiom), per-doc novel-type and token counts, "
        "TWO ordered cumulative windows for the exact (n_cum, v_cum) "
        "curve, and the OLS fit of ln V on ln n over all prefix points — "
        "beta ~ 0.5 is the natural-corpus signature (beta -> 1: unique-"
        "token spam; beta -> 0: template repetition), the growth-curve "
        f"companion to zipf_alpha's static spectrum; curve emitted every "
        f"{_HL_CHECK} docs, counts exact BIGINTs, the OLS moment sums "
        "the order-sensitive reduction (6-dp rounded)"
    ),
)
def heaps_law(spark, sf_dir):
    """Token counts (one shuffle), first-occurrence mins (partial agg on
    the same key), per-doc rollup, then ordered windows on the O(docs)
    frame; the fit is O(1) and rides the checkpoint rows via a scalar
    crossJoin."""
    docs = _t(spark, sf_dir, "documents")
    tc = _persist_evict(
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    first = tc.groupBy("tok").agg(F.min("doc_id").alias("fdoc"))
    perdoc = (
        tc.join(first, "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tok"),
            F.sum(F.when(F.col("fdoc") == F.col("doc_id"), 1).otherwise(0))
            .cast("long")
            .alias("novel"),
        )
    )
    wcur = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = _persist_evict(
        perdoc.select(
            F.row_number().over(Window.orderBy("doc_id")).cast("long").alias("r"),
            F.sum("n_tok").over(wcur).alias("n_cum"),
            F.sum("novel").over(wcur).alias("v_cum"),
        )
    )
    lx = F.log(F.col("n_cum").cast("double"))
    ly = F.log(F.col("v_cum").cast("double"))
    m = curve.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(lx).alias("sx"),
        F.sum(ly).alias("sy"),
        F.sum(lx * lx).alias("sxx"),
        F.sum(lx * ly).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        curve.filter(F.col("r") % _HL_CHECK == 0)
        .crossJoin(F.broadcast(m))
        .select(
            "r",
            F.col("n_cum").cast("long").alias("n_cum"),
            F.col("v_cum").cast("long").alias("v_cum"),
            F.round(slope, 6).alias("beta"),
            F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias("ln_k"),
        )
    )


# Kruskal-Wallis rank test across event types ------------------------------------------


@register(
    "kruskal_wallis",
    f"""
    WITH s AS (
      SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    cnt AS (
      SELECT v, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY v
    ),
    rk AS (
      SELECT v, c,
             coalesce(sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS below
      FROM cnt
    ),
    gv AS (
      SELECT s.event_type, s.v, CAST(count(*) AS BIGINT) AS n_gv
      FROM s GROUP BY s.event_type, s.v
    ),
    r2 AS (
      SELECT gv.event_type,
             CAST(sum(gv.n_gv) AS BIGINT) AS n_g,
             CAST(sum(CAST(gv.n_gv AS HUGEINT)
                      * (2 * rk.below + rk.c + 1)) AS HUGEINT) AS r2_g
      FROM gv JOIN rk ON rk.v = gv.v
      GROUP BY gv.event_type
    ),
    ties AS (
      SELECT CAST(sum(c) AS HUGEINT) AS n,
             CAST(sum(CAST(c AS HUGEINT) * c * c - c) AS HUGEINT) AS tie_sum
      FROM cnt
    ),
    piv AS (
      SELECT {", ".join(f"CAST(sum(CASE WHEN event_type = '{t}' THEN r2_g ELSE 0 END) AS DOUBLE) AS r2_{i}, CAST(sum(CASE WHEN event_type = '{t}' THEN n_g ELSE 0 END) AS DOUBLE) AS n_{i}" for i, t in enumerate(_MS_STATES))}
      FROM r2
    ),
    h AS (
      SELECT CAST(ties.n AS DOUBLE) AS nd, CAST(ties.tie_sum AS DOUBLE) AS td,
             ({" + ".join(f"r2_{i} * r2_{i} / n_{i}" for i in range(len(_MS_STATES)))})
               AS sr
      FROM piv CROSS JOIN ties
    )
    SELECT r2.event_type, r2.n_g, CAST(r2.r2_g AS BIGINT) AS r2_g,
           round(3.0 / (h.nd * (h.nd + 1.0)) * h.sr - 3.0 * (h.nd + 1.0), 6) AS h_stat,
           round((3.0 / (h.nd * (h.nd + 1.0)) * h.sr - 3.0 * (h.nd + 1.0))
                 / (1.0 - h.td / (h.nd * h.nd * h.nd - h.nd)), 6) AS h_corr
    FROM r2 CROSS JOIN h
    """,
    doc=(
        "Kruskal-Wallis rank test of the value distribution across the "
        "5 event types: tied ranks handled EXACTLY by grouping on the "
        "distinct cent value (2 x average-rank = 2*below + cnt + 1 is an "
        "integer, so every group rank sum r2_g = 2 R_g is an exact "
        "128-bit integer), H = 3/(N(N+1)) sum r2_g^2/n_g - 3(N+1) plus "
        "the tie correction 1 - sum(t^3 - t)/(N^3 - N) — the "
        "nonparametric ANOVA companion to ks_test's two-sample check; "
        "the 5-group reduction is a fixed-order pivot (the markov "
        "idiom), never an unordered float sum"
    ),
)
def kruskal_wallis(spark, sf_dir):
    """Distinct-value rank frame via ONE ordered window on the O(distinct
    cents) frame, per-(group, value) partial agg joined back, a 5-column
    fixed-order pivot for H. No pair joins, no per-row ranks."""
    st = _MS_STATES
    d38 = "decimal(38,0)"
    ev = _t(spark, sf_dir, "events")
    s = _persist_evict(
        ev.filter(F.col("value").isNotNull()).select(
            "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("v")
        )
    )
    cnt = _persist_evict(s.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("c")))
    wb = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    rk = cnt.select(
        "v", "c", F.coalesce(F.sum("c").over(wb), F.lit(0)).alias("below")
    )
    gv = s.groupBy("event_type", "v").agg(F.count(F.lit(1)).cast("long").alias("n_gv"))
    r2 = (
        gv.join(rk, "v")
        .groupBy("event_type")
        .agg(
            F.sum("n_gv").cast("long").alias("n_g"),
            F.sum(
                F.col("n_gv").cast(d38)
                * (2 * F.col("below") + F.col("c") + 1).cast(d38)
            )
            .cast(d38)
            .alias("r2_g"),
        )
    )
    r2 = _persist_evict(r2)
    ties = cnt.agg(
        F.sum("c").cast(d38).alias("n"),
        F.sum(F.col("c").cast(d38) * F.col("c") * F.col("c") - F.col("c"))
        .cast(d38)
        .alias("tie_sum"),
    )
    piv = r2.agg(
        *[
            F.sum(F.when(F.col("event_type") == t, F.col("r2_g")).otherwise(0))
            .cast("double")
            .alias(f"r2_{i}")
            for i, t in enumerate(st)
        ],
        *[
            F.sum(F.when(F.col("event_type") == t, F.col("n_g")).otherwise(0))
            .cast("double")
            .alias(f"n_{i}")
            for i, t in enumerate(st)
        ],
    )
    h = piv.crossJoin(F.broadcast(ties)).select(
        F.col("n").cast("double").alias("nd"),
        F.col("tie_sum").cast("double").alias("td"),
        _fold_sum(
            [F.col(f"r2_{i}") * F.col(f"r2_{i}") / F.col(f"n_{i}") for i in range(len(st))]
        ).alias("sr"),
    )
    nd, td, sr = F.col("nd"), F.col("td"), F.col("sr")
    h_raw = 3.0 / (nd * (nd + 1.0)) * sr - 3.0 * (nd + 1.0)
    return r2.crossJoin(F.broadcast(h)).select(
        "event_type", "n_g",
        F.col("r2_g").cast("long").alias("r2_g"),
        F.round(h_raw, 6).alias("h_stat"),
        F.round(h_raw / (1.0 - td / (nd * nd * nd - nd)), 6).alias("h_corr"),
    )


# One-way ANOVA F across event types ---------------------------------------------------


@register(
    "anova_f",
    f"""
    WITH s AS (
      SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    piv AS (
      SELECT {", ".join(f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS DOUBLE) AS n_{i}, CAST(sum(CASE WHEN event_type = '{t}' THEN v ELSE 0 END) AS DOUBLE) AS s_{i}, CAST(sum(CASE WHEN event_type = '{t}' THEN CAST(v AS HUGEINT) * v ELSE 0 END) AS DOUBLE) AS q_{i}" for i, t in enumerate(_MS_STATES))}
      FROM s
    )
    SELECT CAST({" + ".join(f"n_{i}" for i in range(len(_MS_STATES)))} AS BIGINT) AS n,
           CAST({len(_MS_STATES)} AS BIGINT) AS k,
           round(({" + ".join(f"s_{i} * s_{i} / n_{i}" for i in range(len(_MS_STATES)))})
                 - ({" + ".join(f"s_{i}" for i in range(len(_MS_STATES)))})
                   * ({" + ".join(f"s_{i}" for i in range(len(_MS_STATES)))})
                   / ({" + ".join(f"n_{i}" for i in range(len(_MS_STATES)))}), 2) AS ssb,
           round(({" + ".join(f"q_{i}" for i in range(len(_MS_STATES)))})
                 - ({" + ".join(f"s_{i} * s_{i} / n_{i}" for i in range(len(_MS_STATES)))}), 2) AS ssw,
           round(((({" + ".join(f"s_{i} * s_{i} / n_{i}" for i in range(len(_MS_STATES)))})
                   - ({" + ".join(f"s_{i}" for i in range(len(_MS_STATES)))})
                     * ({" + ".join(f"s_{i}" for i in range(len(_MS_STATES)))})
                     / ({" + ".join(f"n_{i}" for i in range(len(_MS_STATES)))}))
                  / {len(_MS_STATES) - 1}.0)
                 / ((({" + ".join(f"q_{i}" for i in range(len(_MS_STATES)))})
                     - ({" + ".join(f"s_{i} * s_{i} / n_{i}" for i in range(len(_MS_STATES)))}))
                    / (({" + ".join(f"n_{i}" for i in range(len(_MS_STATES)))})
                       - {len(_MS_STATES)}.0)), 6) AS f_stat
    FROM piv
    """,
    doc=(
        "one-way ANOVA F of value (exact cents) across the 5 event "
        "types: per-group count/sum/sum-of-squares via a single "
        "conditional-aggregation pass (the 128-bit q_i sums survive "
        "10^12 rows), then SSB/SSW/F as fixed-order double algebra on "
        "the one-row pivot — the parametric counterpart of "
        "kruskal_wallis on the identical grouping, and the same "
        "moments-then-O(1)-algebra shape as ridge_regression; no "
        "unordered float reduction anywhere"
    ),
)
def anova_f(spark, sf_dir):
    """ONE conditional-agg pass to a one-row frame; all statistics are
    fixed-order column algebra on it."""
    st = _MS_STATES
    k = len(st)
    d38 = "decimal(38,0)"
    ev = _t(spark, sf_dir, "events")
    s = ev.filter(F.col("value").isNotNull()).select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("v")
    )
    piv = s.agg(
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("double")
            .alias(f"n_{i}")
            for i, t in enumerate(st)
        ],
        *[
            F.sum(F.when(F.col("event_type") == t, F.col("v")).otherwise(0))
            .cast("double")
            .alias(f"s_{i}")
            for i, t in enumerate(st)
        ],
        *[
            F.sum(
                F.when(
                    F.col("event_type") == t, F.col("v").cast(d38) * F.col("v")
                ).otherwise(0)
            )
            .cast("double")
            .alias(f"q_{i}")
            for i, t in enumerate(st)
        ],
    )
    n_all = _fold_sum([F.col(f"n_{i}") for i in range(k)])
    s_all = _fold_sum([F.col(f"s_{i}") for i in range(k)])
    within = _fold_sum([F.col(f"s_{i}") * F.col(f"s_{i}") / F.col(f"n_{i}") for i in range(k)])
    q_all = _fold_sum([F.col(f"q_{i}") for i in range(k)])
    ssb = within - s_all * s_all / n_all
    ssw = q_all - within
    return piv.select(
        n_all.cast("long").alias("n"),
        F.lit(k).cast("long").alias("k"),
        F.round(ssb, 2).alias("ssb"),
        F.round(ssw, 2).alias("ssw"),
        F.round((ssb / float(k - 1)) / (ssw / (n_all - float(k))), 6).alias("f_stat"),
    )


# Chao1 species-richness estimator -----------------------------------------------------


@register(
    "chao1_richness",
    """
    WITH t AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    v AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c FROM t WHERE tok <> '' GROUP BY tok
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS s_obs,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
             CAST(sum(c) AS BIGINT) AS n_tok
      FROM v
    )
    SELECT s_obs, f1, f2, n_tok,
           round(s_obs + CAST(f1 AS DOUBLE) * (f1 - 1) / (2.0 * (f2 + 1)), 6)
             AS chao1,
           round(1.0 - CAST(f1 AS DOUBLE) / n_tok, 6) AS coverage
    FROM m
    """,
    doc=(
        "Chao1 vocabulary-richness estimator (bias-corrected form "
        "S + f1(f1-1)/(2(f2+1)), divide-by-zero-free) with Good-Turing "
        "sample coverage 1 - f1/N over the corpus token counts: the "
        "how-much-vocabulary-have-we-NOT-seen estimate that sizes "
        "open-vocabulary risk for tokenizer training (heaps_law fits the "
        "growth curve; chao1 extrapolates its asymptote); singleton/"
        "doubleton counts exact BIGINTs, two double ops total"
    ),
)
def chao1_richness(spark, sf_dir):
    """One vocab-count shuffle, one scalar rollup."""
    docs = _t(spark, sf_dir, "documents")
    v = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    m = v.agg(
        F.count(F.lit(1)).cast("long").alias("s_obs"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("long").alias("f2"),
        F.sum("c").cast("long").alias("n_tok"),
    )
    return m.select(
        "s_obs", "f1", "f2", "n_tok",
        F.round(
            F.col("s_obs")
            + F.col("f1").cast("double") * (F.col("f1") - 1) / (2.0 * (F.col("f2") + 1)),
            6,
        ).alias("chao1"),
        F.round(1.0 - F.col("f1").cast("double") / F.col("n_tok"), 6).alias("coverage"),
    )


# Delete-one-group jackknife variance of the mean value ---------------------------------

_JK_G = 20  # user buckets (deterministic groups)



@register(
    "jackknife_variance",
    f"""
    WITH grp AS (
      SELECT user_id % {_JK_G} AS gid,
             CAST(count(*) AS BIGINT) AS n_i,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS s_i
      FROM events WHERE value IS NOT NULL GROUP BY user_id % {_JK_G}
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS g, CAST(sum(n_i) AS BIGINT) AS n,
             CAST(sum(s_i) AS BIGINT) AS s
      FROM grp
    ),
    loo AS (
      SELECT grp.gid,
             CAST(tot.s - grp.s_i AS DOUBLE) / (tot.n - grp.n_i) AS m_i, tot.g,
             tot.n, tot.s
      FROM grp CROSS JOIN tot
    ),
    run AS (
      SELECT g, n, s,
             sum(m_i) OVER (ORDER BY gid ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS sm,
             sum(m_i * m_i) OVER (ORDER BY gid ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS smm,
             row_number() OVER (ORDER BY gid DESC) AS rn
      FROM loo
    ),
    agg AS (SELECT g, n, s, sm, smm FROM run WHERE rn = 1)
    SELECT g AS n_groups, n AS n_obs,
           round(CAST(s AS DOUBLE) / n, 6) AS theta_hat,
           round(greatest((g - 1.0) / g * (smm - sm * sm / g), 0.0), 6) AS var_jack,
           round(sqrt(greatest((g - 1.0) / g * (smm - sm * sm / g), 0.0)), 6) AS se_jack
    FROM agg
    """,
    doc=(
        f"delete-one-group jackknife of the mean value (exact cents), "
        f"grouped into {_JK_G} user buckets: every leave-one-out mean is "
        "an exact-integer ratio (total minus group totals — one pass, no "
        "G re-scans), variance (g-1)/g sum (m_i - mbar)^2 via the moment "
        "identity, clamped at 0 against cancellation — the leave-"
        "structure-out uncertainty companion to block_bootstrap_var's "
        "resampling (jackknife is deterministic by nature, no hash "
        "replicates needed); user buckets, not grid rows, because the "
        "synthetic lattice is row-uniform and a vacuous zero variance "
        "verifies nothing; the g-term moment sums are the "
        "order-sensitive reduction (6-dp rounded)"
    ),
)
def jackknife_variance(spark, sf_dir):
    """One partial-agg rollup to G group rows -> one-row totals
    broadcast -> O(groups) algebra."""
    ev = _t(spark, sf_dir, "events")
    grp = _persist_evict(
        ev.filter(F.col("value").isNotNull())
        .groupBy((F.col("user_id") % _JK_G).alias("gid"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_i"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("long").alias("s_i"),
        )
    )
    tot = grp.agg(
        F.count(F.lit(1)).cast("long").alias("g"),
        F.sum("n_i").cast("long").alias("n"),
        F.sum("s_i").cast("long").alias("s"),
    )
    loo = grp.crossJoin(F.broadcast(tot)).select(
        "gid",
        ((F.col("s") - F.col("s_i")).cast("double") / (F.col("n") - F.col("n_i"))).alias("m_i"),
        "g", "n", "s",
    )
    # ordered cumulative sums (the kaplan_meier idiom): the float
    # reduction order is the gid order on BOTH engines, so the moment
    # sums are bit-identical — an unordered groupBy sum straddled the
    # 6-dp rounding boundary here
    wcum = Window.orderBy("gid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    agg = (
        loo.select(
            "g", "n", "s",
            F.sum("m_i").over(wcum).alias("sm"),
            F.sum(F.col("m_i") * F.col("m_i")).over(wcum).alias("smm"),
            F.row_number().over(Window.orderBy(F.desc("gid"))).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    g, n, s, sm, smm = (F.col(c) for c in ("g", "n", "s", "sm", "smm"))
    # the moment identity can cancel to a tiny negative when the group
    # means are near-identical — clamp so DuckDB's sqrt doesn't raise
    # (Spark would return NaN, an equally wrong answer)
    var_jack = F.greatest((g - 1.0) / g * (smm - sm * sm / g), F.lit(0.0))
    return agg.select(
        g.alias("n_groups"),
        n.alias("n_obs"),
        F.round(s.cast("double") / n, 6).alias("theta_hat"),
        F.round(var_jack, 6).alias("var_jack"),
        F.round(F.sqrt(var_jack), 6).alias("se_jack"),
    )


# Burrows' Delta stylometry between sources --------------------------------------------

_BD_TOP = 20  # marker-word count


@register(
    "burrows_delta",
    f"""
    WITH t AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tt AS (SELECT source, tok FROM t WHERE tok <> ''),
    top AS (
      SELECT tok FROM (
        SELECT tok, row_number() OVER (ORDER BY count(*) DESC, tok) AS rn
        FROM tt GROUP BY tok
      ) WHERE rn <= {_BD_TOP}
    ),
    st AS (
      SELECT source, CAST(count(*) AS BIGINT) AS tot FROM tt GROUP BY source
    ),
    f AS (
      SELECT st.source, top.tok,
             CAST(coalesce(cnt.c, 0) AS BIGINT) AS c, st.tot
      FROM st CROSS JOIN top
      LEFT JOIN (
        SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        FROM tt GROUP BY source, tok
      ) cnt ON cnt.source = st.source AND cnt.tok = top.tok
    ),
    r AS (
      SELECT source, tok, CAST(c AS DOUBLE) * 1000.0 / tot AS rate FROM f
    ),
    zs AS (
      SELECT source, tok,
             (rate - avg(rate) OVER (PARTITION BY tok))
             / CASE WHEN stddev_pop(rate) OVER (PARTITION BY tok) = 0 THEN 1.0
                    ELSE stddev_pop(rate) OVER (PARTITION BY tok) END AS z
      FROM r
    )
    SELECT a.source AS source_a, b.source AS source_b,
           round(sum(abs(a.z - b.z)) / {_BD_TOP}.0, 6) AS delta
    FROM zs a JOIN zs b ON a.tok = b.tok AND a.source < b.source
    GROUP BY a.source, b.source
    """,
    doc=(
        f"Burrows' Delta stylometric distance between document sources: "
        f"the {_BD_TOP} highest-frequency marker words (deterministic "
        "(count, token) ranking), per-source rates per 1000 tokens on "
        "the full source x marker grid (absent marker = rate 0, not a "
        "missing row), per-marker z-scores across sources, delta(a,b) = "
        "mean |z_a - z_b| — the authorship / source-attribution "
        "fingerprint that flags style-inconsistent (machine-injected) "
        "subcorpora; the z and delta reductions are the order-sensitive "
        "sums (6-dp rounded), source pairs O(|sources|^2) on an "
        "O(sources x markers) frame, never on documents"
    ),
)
def burrows_delta(spark, sf_dir):
    """Vocab count once; the marker set is a WindowGroupLimit top-k; the
    z/delta algebra runs on the sources x markers frame (tiny, broadcast
    both sides of the pair join)."""
    docs = _t(spark, sf_dir, "documents")
    tt = _persist_evict(
        docs.select("source", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    top = (
        tt.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(Window.orderBy(F.desc("c"), "tok")))
        .filter(F.col("rn") <= _BD_TOP)
        .select("tok")
    )
    st = tt.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("tot"))
    cnt = tt.groupBy("source", "tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    f = (
        st.crossJoin(F.broadcast(top))
        .join(cnt, ["source", "tok"], "left")
        .select(
            "source", "tok",
            (F.coalesce(F.col("c"), F.lit(0)).cast("double") * 1000.0 / F.col("tot")).alias("rate"),
        )
    )
    wt = Window.partitionBy("tok")
    sd = F.stddev_pop("rate").over(wt)
    zs = _persist_evict(
        f.select(
            "source", "tok",
            (
                (F.col("rate") - F.avg("rate").over(wt))
                / F.when(sd == 0, F.lit(1.0)).otherwise(sd)
            ).alias("z"),
        )
    )
    a = zs.select(F.col("source").alias("source_a"), "tok", F.col("z").alias("za"))
    b = zs.select(F.col("source").alias("source_b"), "tok", F.col("z").alias("zb"))
    return (
        a.join(b, "tok")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.round(F.sum(F.abs(F.col("za") - F.col("zb"))) / float(_BD_TOP), 6).alias("delta")
        )
    )


# Spearman rank correlation -------------------------------------------------


@register(
    "spearman_rho",
    """
    WITH s AS (
      SELECT l_returnflag AS g,
             CAST(round(l_quantity * 100, 0) AS BIGINT) AS x,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y
      FROM lineitem
    ),
    cx AS (SELECT g, x, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY g, x),
    rx AS (
      SELECT g, x,
             2 * COALESCE(sum(c) OVER (PARTITION BY g ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS r2x
      FROM cx
    ),
    cy AS (SELECT g, y, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY g, y),
    ry AS (
      SELECT g, y,
             2 * COALESCE(sum(c) OVER (PARTITION BY g ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS r2y
      FROM cy
    ),
    j AS (
      SELECT s.g AS g, r2x, r2y
      FROM s JOIN rx ON s.g = rx.g AND s.x = rx.x
             JOIN ry ON s.g = ry.g AND s.y = ry.y
    ),
    m AS (
      SELECT g, CAST(count(*) AS HUGEINT) AS n,
             sum(CAST(r2x AS HUGEINT)) AS sx,
             sum(CAST(r2y AS HUGEINT)) AS sy,
             sum(CAST(r2x AS HUGEINT) * r2x) AS sxx,
             sum(CAST(r2y AS HUGEINT) * r2y) AS syy,
             sum(CAST(r2x AS HUGEINT) * r2y) AS sxy
      FROM j GROUP BY g
    )
    SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                 / sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 6) AS rho
    FROM m
    """,
    doc=(
        "per-returnflag Spearman rank correlation of quantity vs "
        "extendedprice with exact tied average ranks (distinct-cents rank "
        "frame, doubled to stay integral) — the monotone-association "
        "companion to ols_trend's Pearson moments"
    ),
)
def spearman_rho(spark, sf_dir):
    """Ranks are window algebra, not a rank-frame join: doubled average
    tied rank r2 = 2*rank_min + c_ties - 1 stays integral, so the five
    moment sums accumulate exactly in decimal(38,0) and the only float
    ops are the final casts and one division. One exchange on the group
    key serves all four window specs (the tie-count partitions are
    subset-compatible with it). At 100 TB the per-group sort is the
    scale seam — it would move to a two-pass range-partitioned ranking
    (rank = per-range offset + local rank), leaving the moment algebra
    unchanged."""
    d38 = "decimal(38,0)"
    li = _t(spark, sf_dir, "lineitem")
    s = li.select(
        F.col("l_returnflag").alias("g"),
        F.round(F.col("l_quantity") * 100, 0).cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
    )
    # doubled average tied rank as pure window algebra: r2 = 2*rank_min +
    # c_ties - 1 (== 2*below + c + 1). All four window specs cluster on g
    # (the (g,x)/(g,y) count partitions are subset-compatible), so Catalyst
    # plans ONE exchange on g with in-partition re-sorts — no rank-frame
    # join, no per-cell hash agg. The round-robin repartition hands the
    # decimal moment folds to the full core count instead of |groups| tasks.
    wx = Window.partitionBy("g").orderBy("x")
    wcx = Window.partitionBy("g", "x")
    wy = Window.partitionBy("g").orderBy("y")
    wcy = Window.partitionBy("g", "y")
    r = s.select(
        "g",
        (2 * F.rank().over(wx) + F.count(F.lit(1)).over(wcx) - 1).alias("r2x"),
        (2 * F.rank().over(wy) + F.count(F.lit(1)).over(wcy) - 1).alias("r2y"),
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    m = r.repartition(n_parts).groupBy("g").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("r2x").cast(d38)).alias("sx"),
        F.sum(F.col("r2y").cast(d38)).alias("sy"),
        F.sum(F.col("r2x").cast(d38) * F.col("r2x")).alias("sxx"),
        F.sum(F.col("r2y").cast(d38) * F.col("r2y")).alias("syy"),
        F.sum(F.col("r2x").cast(d38) * F.col("r2y")).alias("sxy"),
    )
    return m.select(
        F.col("g").alias("l_returnflag"),
        F.col("n").cast("long").alias("n"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
            )
            / F.sqrt(
                (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
            ),
            6,
        ).alias("rho"),
    )


# Kendall tau-b -------------------------------------------------------------


@register(
    "kendall_tau",
    """
    WITH s AS (
      SELECT CAST(round(l_quantity * 100, 0) AS BIGINT) AS x,
             CAST(round(l_discount * 100, 0) AS BIGINT) AS y
      FROM lineitem
    ),
    cells AS (SELECT x, y, CAST(count(*) AS HUGEINT) AS n FROM s GROUP BY x, y),
    pairs AS (
      SELECT sum(CASE WHEN b.y > a.y THEN a.n * b.n ELSE 0 END) AS conc,
             sum(CASE WHEN b.y < a.y THEN a.n * b.n ELSE 0 END) AS disc
      FROM cells a JOIN cells b ON b.x > a.x
    ),
    tx AS (SELECT sum(m * (m - 1)) AS t FROM
           (SELECT CAST(sum(n) AS HUGEINT) AS m FROM cells GROUP BY x)),
    ty AS (SELECT sum(m * (m - 1)) AS t FROM
           (SELECT CAST(sum(n) AS HUGEINT) AS m FROM cells GROUP BY y)),
    tot AS (SELECT CAST(sum(n) AS HUGEINT) AS n FROM cells)
    SELECT CAST(tot.n AS BIGINT) AS n,
           CAST(conc AS BIGINT) AS conc,
           CAST(disc AS BIGINT) AS disc,
           round(2.0 * CAST(conc - disc AS DOUBLE)
                 / sqrt(CAST(tot.n * (tot.n - 1) - tx.t AS DOUBLE))
                 / sqrt(CAST(tot.n * (tot.n - 1) - ty.t AS DOUBLE)), 6) AS tau_b
    FROM pairs, tx, ty, tot
    """,
    doc=(
        "Kendall tau-b (tie-corrected) of quantity vs discount via exact "
        "concordant/discordant pair counting on the joint distinct-cell "
        "frame — no row-pair join ever touches the data"
    ),
)
def kendall_tau(spark, sf_dir):
    """The O(n^2) pair space collapses to the joint value-cell frame
    (<= |x-domain| * |y-domain| = 550 cells here, data-independent of row
    count), so concordant/discordant counting is a broadcast
    nested-loop join over cells only: rows are touched exactly once by
    the cell groupBy, which partial-aggs map-side. Tie terms come from
    the cell marginals. Every count is exact decimal(38,0); the doubled
    tau identity 2(C-D)/sqrt(n(n-1)-Tx)/sqrt(n(n-1)-Ty) avoids the /2
    halving so the integers never leave exact range. At 100 TB the cell
    frame is unchanged (value domains, not rows) — the plan is one
    shuffle on (x,y) plus constant-size joins."""
    d38 = "decimal(38,0)"
    li = _t(spark, sf_dir, "lineitem")
    cells = _persist_evict(
        li.select(
            F.round(F.col("l_quantity") * 100, 0).cast("long").alias("x"),
            F.round(F.col("l_discount") * 100, 0).cast("long").alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast(d38).alias("n"))
    )
    a = cells.select(
        F.col("x").alias("ax"), F.col("y").alias("ay"), F.col("n").alias("an")
    )
    b = cells.select(
        F.col("x").alias("bx"), F.col("y").alias("by"), F.col("n").alias("bn")
    )
    pairs = (
        a.join(F.broadcast(b), F.col("bx") > F.col("ax"))
        .agg(
            F.sum(
                F.when(F.col("by") > F.col("ay"), F.col("an") * F.col("bn")).otherwise(
                    F.lit(0).cast(d38)
                )
            ).alias("conc"),
            F.sum(
                F.when(F.col("by") < F.col("ay"), F.col("an") * F.col("bn")).otherwise(
                    F.lit(0).cast(d38)
                )
            ).alias("disc"),
        )
    )
    tx = (
        cells.groupBy("x")
        .agg(F.sum("n").alias("m"))
        .agg(F.sum(F.col("m") * (F.col("m") - 1)).alias("t"))
    )
    ty = (
        cells.groupBy("y")
        .agg(F.sum("n").alias("m"))
        .agg(F.sum(F.col("m") * (F.col("m") - 1)).alias("t"))
    )
    tot = cells.agg(F.sum("n").alias("n"))
    nn = F.col("n") * (F.col("n") - 1)
    return (
        pairs.crossJoin(F.broadcast(tx.select(F.col("t").alias("tx"))))
        .crossJoin(F.broadcast(ty.select(F.col("t").alias("ty"))))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("conc").cast("long").alias("conc"),
            F.col("disc").cast("long").alias("disc"),
            F.round(
                2.0 * (F.col("conc") - F.col("disc")).cast("double")
                / F.sqrt((nn - F.col("tx")).cast("double"))
                / F.sqrt((nn - F.col("ty")).cast("double")),
                6,
            ).alias("tau_b"),
        )
    )


# Brown-Forsythe (median-based Levene) test ---------------------------------


def _levene_oracle_sql() -> str:
    st = _MS_STATES
    k = len(st)
    sz = " + ".join(f"sz_{i}" for i in range(k))
    szz = " + ".join(f"szz_{i}" for i in range(k))
    nn = " + ".join(f"n_{i}" for i in range(k))
    ssb_hat = " + ".join(f"sz_{i} * sz_{i} / n_{i}" for i in range(k))
    return f"""
    WITH s AS (
      SELECT event_type AS g, CAST(round(value * 100, 0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    c AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY g, v),
    w AS (
      SELECT g, v, c,
             COALESCE(sum(c) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
             sum(c) OVER (PARTITION BY g) AS n_g
      FROM c
    ),
    m AS (
      SELECT g, n_g,
             min(CASE WHEN below + c >= (n_g + 1) // 2 THEN v END)
             + min(CASE WHEN below + c >= n_g // 2 + 1 THEN v END) AS m2
      FROM w GROUP BY g, n_g
    ),
    z AS (
      SELECT w.g AS g, w.n_g AS n_g,
             sum(CAST(w.c AS HUGEINT) * abs(2 * w.v - m.m2)) AS sz,
             sum(CAST(w.c AS HUGEINT) * (2 * w.v - m.m2) * (2 * w.v - m.m2)) AS szz
      FROM w JOIN m ON w.g = m.g GROUP BY w.g, w.n_g
    ),
    piv AS (
      SELECT {", ".join(f"CAST(sum(CASE WHEN g = '{t}' THEN sz ELSE 0 END) AS DOUBLE) AS sz_{i}, CAST(sum(CASE WHEN g = '{t}' THEN szz ELSE 0 END) AS DOUBLE) AS szz_{i}, CAST(sum(CASE WHEN g = '{t}' THEN n_g ELSE 0 END) AS DOUBLE) AS n_{i}" for i, t in enumerate(st))}
      FROM z
    )
    SELECT CAST({nn} AS BIGINT) AS n,
           CAST({k} AS BIGINT) AS k,
           round(({ssb_hat}) - ({sz}) * ({sz}) / ({nn}), 2) AS ssb_z,
           round(({szz}) - ({ssb_hat}), 2) AS ssw_z,
           round(((({ssb_hat}) - ({sz}) * ({sz}) / ({nn})) / {k - 1}.0)
                 / ((({szz}) - ({ssb_hat})) / (({nn}) - {k}.0)), 6) AS w_stat
    FROM piv
    """


@register(
    "levene_test",
    _levene_oracle_sql(),
    doc=(
        "Brown-Forsythe homogeneity-of-variance test across the 5 event "
        "types: one-way ANOVA F over |value - group median| with exact "
        "group medians from the distinct-cents frame (doubled: z = "
        "|2v - (lo_mid + hi_mid)| stays integral for even counts) — the "
        "variance-equality gate that decides whether anova_f's pooled "
        "error term is trustworthy"
    ),
)
def levene_test(spark, sf_dir):
    """Exact per-group medians never sort rows: the distinct-cents frame
    carries (below, c) prefix counts, and the two middle order statistics
    are min(v | cum >= k) aggregates on that frame. The z-moments are then
    weighted sums over the SAME frame (no re-join against the row table),
    so the whole test is two shuffles on (group, cent) + a 5-row pivot.
    Doubling (2v - m2) keeps every moment integral -> decimal(38,0) exact;
    the fixed-order _fold_sum pivot makes the float folds bit-identical
    to the SQL oracle's " + ".join."""
    st = _MS_STATES
    k = len(st)
    d38 = "decimal(38,0)"
    ev = _t(spark, sf_dir, "events")
    s = ev.filter(F.col("value").isNotNull()).select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100, 0).cast("long").alias("v"),
    )
    c = _persist_evict(
        s.groupBy("g", "v").agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wb = (
        Window.partitionBy("g").orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    )
    wg = Window.partitionBy("g")
    w = c.select(
        "g",
        "v",
        "c",
        F.coalesce(F.sum("c").over(wb), F.lit(0)).alias("below"),
        F.sum("c").over(wg).alias("n_g"),
    )
    cum = F.col("below") + F.col("c")
    m = w.groupBy("g", "n_g").agg(
        (
            F.min(F.when(cum >= F.expr("(n_g + 1) div 2"), F.col("v")))
            + F.min(F.when(cum >= F.expr("n_g div 2 + 1"), F.col("v")))
        ).alias("m2")
    )
    dz = 2 * F.col("v") - F.col("m2")
    # the broadcast join is map-side, so without the round-robin repartition
    # the z-moment partials would run in the window's |groups| partitions;
    # the repartition spreads the decimal products across all cores
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    z = (
        w.join(F.broadcast(m.select("g", "m2")), "g")
        .repartition(n_parts)
        .groupBy("g", "n_g")
        .agg(
            F.sum(F.col("c").cast(d38) * F.abs(dz)).alias("sz"),
            F.sum(F.col("c").cast(d38) * dz * dz).alias("szz"),
        )
    )
    piv = z.agg(
        *[
            F.sum(F.when(F.col("g") == t, F.col("sz")).otherwise(0))
            .cast("double")
            .alias(f"sz_{i}")
            for i, t in enumerate(st)
        ],
        *[
            F.sum(F.when(F.col("g") == t, F.col("szz")).otherwise(0))
            .cast("double")
            .alias(f"szz_{i}")
            for i, t in enumerate(st)
        ],
        *[
            F.sum(F.when(F.col("g") == t, F.col("n_g")).otherwise(0))
            .cast("double")
            .alias(f"n_{i}")
            for i, t in enumerate(st)
        ],
    )
    szs = _fold_sum([F.col(f"sz_{i}") for i in range(k)])
    szzs = _fold_sum([F.col(f"szz_{i}") for i in range(k)])
    nns = _fold_sum([F.col(f"n_{i}") for i in range(k)])
    ssb_hat = _fold_sum(
        [F.col(f"sz_{i}") * F.col(f"sz_{i}") / F.col(f"n_{i}") for i in range(k)]
    )
    ssb = ssb_hat - szs * szs / nns
    ssw = szzs - ssb_hat
    return piv.select(
        nns.cast("long").alias("n"),
        F.lit(k).cast("long").alias("k"),
        F.round(ssb, 2).alias("ssb_z"),
        F.round(ssw, 2).alias("ssw_z"),
        F.round((ssb / float(k - 1)) / (ssw / (nns - float(k))), 6).alias("w_stat"),
    )


# Cramer's V ----------------------------------------------------------------


@register(
    "cramers_v",
    """
    WITH cells AS (
      SELECT o_orderstatus AS s, o_orderpriority AS p,
             CAST(count(*) AS BIGINT) AS o
      FROM orders GROUP BY 1, 2
    ),
    rt AS (SELECT s, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY s),
    ct AS (SELECT p, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY p),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                   CAST(count(DISTINCT s) AS BIGINT) AS r,
                   CAST(count(DISTINCT p) AS BIGINT) AS c
            FROM cells),
    terms AS (
      SELECT CAST(sum(CAST(round(o * o * 1000000000000.0 / (rt * ct)) AS BIGINT))
                  AS BIGINT) AS ts
      FROM cells JOIN rt USING (s) JOIN ct USING (p)
    )
    SELECT n, r, c,
           round((CAST(ts AS DOUBLE) / 1000000000000.0 - 1.0) * n, 6) AS chi2,
           round(sqrt((CAST(ts AS DOUBLE) / 1000000000000.0 - 1.0) * n
                      / (n * least(r - 1, c - 1))), 6) AS cramers_v
    FROM terms, tot
    """,
    doc=(
        "Cramer's V association of orderstatus x orderpriority via the "
        "chi2 = N*(sum O^2/(rt*ct) - 1) identity; per-cell terms are "
        "fixed-scale integers (1e-12 units, each <= 1 by O <= min(rt,ct)) "
        "so the cross-cell sum is order-independent and bit-identical "
        "across engines"
    ),
)
def cramers_v(spark, sf_dir):
    """The contingency table is r*c rows (15 here; bounded by category
    domains, not data), built by one partial-aggregating groupBy over
    orders; marginals and the chi2 fold all run on that tiny frame with
    broadcast joins. Float determinism: each cell's O^2/(rt*ct) term is
    in [0,1], scaled to 1e12 and rounded to an integer, so the only
    cross-row float reduction is an exact BIGINT sum — aggregation order
    cannot flip a bit. chi2's absolute scaling error is <= 7.5e-12 * N,
    far below the 6-dp rounding."""
    od = _t(spark, sf_dir, "orders")
    cells = _persist_evict(
        od.groupBy(
            F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p")
        ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    rt = cells.groupBy("s").agg(F.sum("o").alias("rt"))
    ct = cells.groupBy("p").agg(F.sum("o").alias("ct"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct("s").alias("r"),
        F.countDistinct("p").alias("c"),
    )
    terms = (
        cells.join(F.broadcast(rt), "s")
        .join(F.broadcast(ct), "p")
        .agg(
            F.sum(
                F.round(
                    F.col("o") * F.col("o") * F.lit(1000000000000.0)
                    / (F.col("rt") * F.col("ct"))
                ).cast("long")
            ).alias("ts")
        )
    )
    chi2 = (F.col("ts").cast("double") / 1000000000000.0 - 1.0) * F.col("n")
    return terms.crossJoin(F.broadcast(tot)).select(
        "n",
        "r",
        "c",
        F.round(chi2, 6).alias("chi2"),
        F.round(
            F.sqrt(chi2 / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))), 6
        ).alias("cramers_v"),
    )


# Cohen's kappa -------------------------------------------------------------


@register(
    "cohen_kappa",
    """
    WITH b AS (
      SELECT event_type AS cur,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    t AS (
      SELECT prev, cur, CAST(count(*) AS BIGINT) AS n
      FROM b WHERE prev IS NOT NULL GROUP BY 1, 2
    ),
    r AS (SELECT prev AS k, CAST(sum(n) AS BIGINT) AS rn FROM t GROUP BY 1),
    c AS (SELECT cur AS k, CAST(sum(n) AS BIGINT) AS cn FROM t GROUP BY 1),
    pe AS (SELECT CAST(sum(rn * cn) AS BIGINT) AS pe_num FROM r JOIN c USING (k)),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS n,
             CAST(sum(CASE WHEN prev = cur THEN n ELSE 0 END) AS BIGINT) AS diag
      FROM t
    )
    SELECT tot.n AS n_pairs,
           round(CAST(diag AS DOUBLE) / tot.n, 6) AS po,
           round(CAST(pe_num AS DOUBLE) / tot.n / tot.n, 6) AS pe,
           round(CAST(diag * tot.n - pe_num AS DOUBLE)
                 / CAST(tot.n * tot.n - pe_num AS DOUBLE), 6) AS kappa
    FROM pe, tot
    """,
    doc=(
        "Cohen's kappa agreement between consecutive event types per user "
        "(prev as rater A, cur as rater B): chance-corrected behavioral "
        "stickiness, kappa = (po - pe)/(1 - pe) computed as the exact "
        "integer rational (diag*n - pe_num)/(n^2 - pe_num)"
    ),
)
def cohen_kappa(spark, sf_dir):
    """Reuses markov_transitions' single per-user sort window to emit
    (prev, cur) pairs map-side; everything after the <= |states|^2
    transition groupBy runs on a 25-row frame. kappa never leaves integer
    arithmetic until one final division: (diag*n - pe_num) and
    (n^2 - pe_num) are exact BIGINTs on both engines, so the 6-dp round
    is on identical doubles."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    b = ev.select(
        F.col("event_type").alias("cur"),
        F.lag("event_type").over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    t = _persist_evict(
        b.groupBy("prev", "cur").agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    r = t.groupBy(F.col("prev").alias("k")).agg(F.sum("n").alias("rn"))
    c = t.groupBy(F.col("cur").alias("k")).agg(F.sum("n").alias("cn"))
    pe = r.join(c, "k").agg(F.sum(F.col("rn") * F.col("cn")).alias("pe_num"))
    tot = t.agg(
        F.sum("n").alias("n"),
        F.sum(F.when(F.col("prev") == F.col("cur"), F.col("n")).otherwise(0)).alias(
            "diag"
        ),
    )
    return pe.crossJoin(F.broadcast(tot)).select(
        F.col("n").alias("n_pairs"),
        F.round(F.col("diag").cast("double") / F.col("n"), 6).alias("po"),
        F.round(
            F.col("pe_num").cast("double") / F.col("n") / F.col("n"), 6
        ).alias("pe"),
        F.round(
            (F.col("diag") * F.col("n") - F.col("pe_num")).cast("double")
            / (F.col("n") * F.col("n") - F.col("pe_num")).cast("double"),
            6,
        ).alias("kappa"),
    )


# Diurnal harmonic analysis (periodogram on the hour-of-day cycle) ----------

# Trig literals are generated ONCE here and injected into BOTH engines as
# decimal literals (repr round-trips exactly to the same double), so no
# engine-side cos/sin — libm vs Math.cos last-ulp divergence — can enter
# the fold. Harmonics k=1..4 of the 24-hour cycle.
_DH_K = (1, 2, 3, 4)
_DH_COS = {
    k: [__import__("math").cos(2 * __import__("math").pi * k * h / 24) for h in range(24)]
    for k in _DH_K
}
_DH_SIN = {
    k: [__import__("math").sin(2 * __import__("math").pi * k * h / 24) for h in range(24)]
    for k in _DH_K
}


def _diurnal_oracle_sql() -> str:
    piv = ", ".join(
        f"CAST(sum(CASE WHEN h = {h} THEN n ELSE 0 END) AS DOUBLE) AS n_{h}"
        for h in range(24)
    )
    rows = []
    for k in _DH_K:
        c = " + ".join(f"n_{h} * ({_DH_COS[k][h]!r})" for h in range(24))
        s = " + ".join(f"n_{h} * ({_DH_SIN[k][h]!r})" for h in range(24))
        rows.append(
            f"SELECT CAST({k} AS BIGINT) AS k, round(({c}), 6) AS c_k,"
            f" round(({s}), 6) AS s_k,"
            f" round((({c}) * ({c}) + ({s}) * ({s})) / ({ ' + '.join(f'n_{h}' for h in range(24)) }), 6) AS power_n"
            " FROM piv"
        )
    body = " UNION ALL ".join(rows)
    return f"""
    WITH hh AS (
      SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h FROM events
    ),
    cnt AS (SELECT h, CAST(count(*) AS BIGINT) AS n FROM hh GROUP BY h),
    piv AS (SELECT {piv} FROM cnt)
    {body}
    """


@register(
    "diurnal_harmonics",
    _diurnal_oracle_sql(),
    doc=(
        "periodogram of the event stream on the 24-hour cycle: DFT power "
        "at harmonics k=1..4 of hour-of-day from the 24-bin phase "
        "histogram — the spectral twin of FILDA's day/night gating "
        "(detects diurnal structure without materializing a dense series)"
    ),
)
def diurnal_harmonics(spark, sf_dir):
    """The DFT collapses onto the 24-bin phase histogram: one partial-agg
    groupBy on hour-of-day, then a single-row fixed-order pivot folded
    against literal cos/sin tables shared verbatim with the SQL oracle
    (no engine trig => no libm-vs-Math ulp drift; the only cross-row
    reduction is the exact integer histogram). Scale shape: map-side
    combine onto 24 keys, constant memory at any corpus size."""
    ev = _t(spark, sf_dir, "events")
    cnt = ev.select(F.hour("ts").cast("long").alias("h")).groupBy("h").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    piv = cnt.agg(
        *[
            F.sum(F.when(F.col("h") == h, F.col("n")).otherwise(0))
            .cast("double")
            .alias(f"n_{h}")
            for h in range(24)
        ]
    )
    ntot = _fold_sum([F.col(f"n_{h}") for h in range(24)])
    rows = []
    for k in _DH_K:
        c = _fold_sum([F.col(f"n_{h}") * F.lit(_DH_COS[k][h]) for h in range(24)])
        s = _fold_sum([F.col(f"n_{h}") * F.lit(_DH_SIN[k][h]) for h in range(24)])
        rows.append(
            piv.select(
                F.lit(k).cast("long").alias("k"),
                F.round(c, 6).alias("c_k"),
                F.round(s, 6).alias("s_k"),
                F.round((c * c + s * s) / ntot, 6).alias("power_n"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


# Partial autocorrelation (Durbin-Levinson, lags 1-3) -----------------------


@register(
    "pacf_durbin",
    f"""
    WITH b AS (
      SELECT user_id, CAST(round(value * 100, 0) AS BIGINT) AS v,
             lag(CAST(round(value * 100, 0) AS BIGINT), 1) OVER w AS l1,
             lag(CAST(round(value * 100, 0) AS BIGINT), 2) OVER w AS l2,
             lag(CAST(round(value * 100, 0) AS BIGINT), 3) OVER w AS l3
      FROM events WHERE value IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    m AS (
      SELECT user_id, CAST(count(*) AS HUGEINT) AS n, CAST(sum(v) AS HUGEINT) AS s
      FROM b GROUP BY user_id
    ),
    g AS (
      SELECT b.user_id,
             CAST(max(n) AS BIGINT) AS n,
             sum((n * v - s) * (n * v - s)) AS ss,
             sum(CASE WHEN l1 IS NOT NULL THEN (n * v - s) * (n * l1 - s) END) AS c1,
             sum(CASE WHEN l2 IS NOT NULL THEN (n * v - s) * (n * l2 - s) END) AS c2,
             sum(CASE WHEN l3 IS NOT NULL THEN (n * v - s) * (n * l3 - s) END) AS c3
      FROM b JOIN m ON b.user_id = m.user_id GROUP BY b.user_id
    ),
    r AS (
      SELECT user_id, n,
             CAST(c1 AS DOUBLE) / CAST(ss AS DOUBLE) AS r1,
             CAST(c2 AS DOUBLE) / CAST(ss AS DOUBLE) AS r2,
             CAST(c3 AS DOUBLE) / CAST(ss AS DOUBLE) AS r3
      FROM g WHERE n >= {_ACF_MIN_N} AND ss > 0
    ),
    dl AS (
      SELECT user_id, n, r1, r2, r3,
             (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi2
      FROM r WHERE 1.0 - r1 * r1 <> 0.0
    )
    SELECT user_id, n,
           round(r1, 6) AS phi1,
           round(phi2, 6) AS phi2,
           round((r3 - (r1 - phi2 * r1) * r2 - phi2 * r1)
                 / ((1.0 - r1 * r1) * (1.0 - phi2 * phi2)), 6) AS phi3
    FROM dl WHERE (1.0 - r1 * r1) * (1.0 - phi2 * phi2) <> 0.0
    """,
    doc=(
        "per-user partial autocorrelation at lags 1-3 via the "
        "Durbin-Levinson recursion over exact-integer autocovariances "
        "(n-scaled residuals n*v - S stay integral, so r_k is one exact "
        "division) — the AR-order diagnostic completing acf_lags / "
        "ar2_yule_walker"
    ),
)
def pacf_durbin(spark, sf_dir):
    """Same single per-user sort window as acf_lags emits all three lag
    columns in one pass; the mean join is on the per-user frame. The
    n-scaling trick ((n*v - S) is integer because S = sum of v) keeps
    every autocovariance an exact decimal(38,0) sum — the Durbin-Levinson
    algebra then runs on identical doubles in both engines. One shuffle
    (user sort) + one O(users) join; scales as the trajectory exchange."""
    d38 = "decimal(38,0)"
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.round(F.col("value") * 100, 0).cast("long")
    b = ev.select(
        "user_id",
        v.alias("v"),
        *[F.lag(v, k).over(w).alias(f"l{k}") for k in (1, 2, 3)],
    )
    m = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v).alias("s"),
    )
    dv = F.col("n").cast(d38) * F.col("v") - F.col("s")
    g = (
        b.join(m, "user_id")
        .groupBy("user_id")
        .agg(
            F.first("n").alias("n"),
            F.sum(dv * dv).alias("ss"),
            *[
                F.sum(
                    F.when(
                        F.col(f"l{k}").isNotNull(),
                        dv * (F.col("n").cast(d38) * F.col(f"l{k}") - F.col("s")),
                    )
                ).alias(f"c{k}")
                for k in (1, 2, 3)
            ],
        )
        .filter((F.col("n") >= _ACF_MIN_N) & (F.col("ss") > 0))
    )
    ssd = F.col("ss").cast("double")
    r = g.select(
        "user_id",
        "n",
        (F.col("c1").cast("double") / ssd).alias("r1"),
        (F.col("c2").cast("double") / ssd).alias("r2"),
        (F.col("c3").cast("double") / ssd).alias("r3"),
    )
    one = F.lit(1.0)
    phi2 = (F.col("r2") - F.col("r1") * F.col("r1")) / (
        one - F.col("r1") * F.col("r1")
    )
    dl = r.filter(one - F.col("r1") * F.col("r1") != 0.0).select(
        "user_id", "n", "r1", "r2", "r3", phi2.alias("phi2")
    )
    v2 = (one - F.col("r1") * F.col("r1")) * (one - F.col("phi2") * F.col("phi2"))
    return dl.filter(v2 != 0.0).select(
        "user_id",
        "n",
        F.round(F.col("r1"), 6).alias("phi1"),
        F.round(F.col("phi2"), 6).alias("phi2"),
        F.round(
            (
                F.col("r3")
                - (F.col("r1") - F.col("phi2") * F.col("r1")) * F.col("r2")
                - F.col("phi2") * F.col("r1")
            )
            / v2,
            6,
        ).alias("phi3"),
    )


# Cross-correlation of two daily event-type series --------------------------

_CCF_A, _CCF_B = "click", "purchase"
_CCF_MAXLAG = 3


def _ccf_oracle_sql() -> str:
    lags = ", ".join(str(k) for k in range(-_CCF_MAXLAG, _CCF_MAXLAG + 1))
    return f"""
    WITH e AS (
      SELECT CAST(date_diff('day', (SELECT min(CAST(ts AS DATE)) FROM events),
                            CAST(ts AS DATE)) AS BIGINT) AS d,
             event_type
      FROM events WHERE event_type IN ('{_CCF_A}', '{_CCF_B}')
    ),
    span AS (SELECT CAST(max(d) AS BIGINT) AS dmax FROM e),
    days AS (SELECT CAST(unnest(generate_series(0, (SELECT dmax FROM span))) AS BIGINT) AS d),
    cnt AS (
      SELECT days.d AS d,
             CAST(COALESCE(sum(CASE WHEN event_type = '{_CCF_A}' THEN 1 END), 0) AS HUGEINT) AS a,
             CAST(COALESCE(sum(CASE WHEN event_type = '{_CCF_B}' THEN 1 END), 0) AS HUGEINT) AS b
      FROM days LEFT JOIN e ON days.d = e.d GROUP BY days.d
    ),
    tot AS (SELECT CAST(count(*) AS HUGEINT) AS nd, sum(a) AS sa, sum(b) AS sb FROM cnt),
    sc AS (
      SELECT d, nd * a - sa AS av, nd * b - sb AS bv
      FROM cnt, tot
    ),
    den AS (SELECT sum(av * av) AS da, sum(bv * bv) AS db FROM sc),
    lagk AS (SELECT CAST(unnest(ARRAY[{lags}]) AS BIGINT) AS lag),
    num AS (
      SELECT lagk.lag AS lag, sum(x.av * y.bv) AS nm,
             CAST(count(*) AS BIGINT) AS n_overlap
      FROM lagk JOIN sc x ON TRUE JOIN sc y ON y.d = x.d + lagk.lag
      GROUP BY lagk.lag
    )
    SELECT lag, n_overlap,
           round(CAST(nm AS DOUBLE) / sqrt(CAST(da AS DOUBLE))
                 / sqrt(CAST(db AS DOUBLE)), 6) AS ccf
    FROM num, den
    ORDER BY lag
    """


@register(
    "cross_correlation",
    _ccf_oracle_sql(),
    doc=(
        f"lead-lag cross-correlation (lags -{_CCF_MAXLAG}..+{_CCF_MAXLAG}) "
        "between the daily click and purchase count series: does click "
        "volume lead purchases? nd-scaled residuals (nd*x - S) keep every "
        "numerator/denominator an exact integer sum"
    ),
)
def cross_correlation(spark, sf_dir):
    """The series frame is O(days) — built by one partial-agg groupBy
    over the event scan, densified against a sequence() range so zero
    days weigh in. Every moment is integer (nd-scaled residuals), the
    lag alignment is an equi-join on day index over the tiny frame, and
    the only floats are three final casts. Nothing here grows with the
    corpus except the first groupBy."""
    d38 = "decimal(38,0)"
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_CCF_A, _CCF_B)
    )
    dmin = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    e = ev.crossJoin(F.broadcast(dmin)).select(
        F.datediff(F.to_date("ts"), F.col("d0")).cast("long").alias("d"),
        "event_type",
    )
    cnt = e.groupBy("d").agg(
        F.sum(F.when(F.col("event_type") == _CCF_A, 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("event_type") == _CCF_B, 1).otherwise(0))
        .cast("long")
        .alias("b"),
    )
    span = cnt.agg(F.max("d").alias("dmax"))
    days = span.select(F.explode(F.sequence(F.lit(0), F.col("dmax"))).alias("d"))
    dense = (
        days.join(cnt, "d", "left")
        .select(
            "d",
            F.coalesce(F.col("a"), F.lit(0)).alias("a"),
            F.coalesce(F.col("b"), F.lit(0)).alias("b"),
        )
    )
    dense = _persist_evict(dense)
    tot = dense.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
    )
    sc = _persist_evict(
        dense.crossJoin(F.broadcast(tot)).select(
            "d",
            (F.col("nd").cast(d38) * F.col("a") - F.col("sa")).alias("av"),
            (F.col("nd").cast(d38) * F.col("b") - F.col("sb")).alias("bv"),
        )
    )
    den = sc.agg(
        F.sum(F.col("av") * F.col("av")).alias("da"),
        F.sum(F.col("bv") * F.col("bv")).alias("db"),
    )
    lagk = spark.range(-_CCF_MAXLAG, _CCF_MAXLAG + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    x = sc.select(F.col("d").alias("xd"), "av")
    y = sc.select(F.col("d").alias("yd"), "bv")
    num = (
        lagk.crossJoin(x)
        .join(y, F.col("yd") == F.col("xd") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.sum(F.col("av") * F.col("bv")).alias("nm"),
            F.count(F.lit(1)).cast("long").alias("n_overlap"),
        )
    )
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            "lag",
            "n_overlap",
            F.round(
                F.col("nm").cast("double")
                / F.sqrt(F.col("da").cast("double"))
                / F.sqrt(F.col("db").cast("double")),
                6,
            ).alias("ccf"),
        )
    )


# Maximum drawdown ----------------------------------------------------------


@register(
    "max_drawdown",
    """
    WITH s AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    c AS (
      SELECT user_id, ts, event_id, cents,
             sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM s
    ),
    p AS (
      SELECT user_id, cents, cum,
             max(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM c
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_ev,
           CAST(sum(cents) AS BIGINT) AS net_cents,
           CAST(max(peak) AS BIGINT) AS peak_cents,
           CAST(max(peak - cum) AS BIGINT) AS max_drawdown_cents
    FROM p GROUP BY user_id
    """,
    doc=(
        "per-user maximum drawdown of the cumulative value series "
        "(peak-to-trough in exact cents): running cumsum, running peak, "
        "max gap — the risk metric over the event-stream 'equity curve'"
    ),
)
def max_drawdown(spark, sf_dir):
    """Two stacked windows over the SAME (user, ts, event_id) sort —
    cumsum, then running peak — plan as one exchange with a single
    in-partition sort (the second window reuses the first's ordering);
    the closing per-user aggregate partial-aggs on the same key. All
    arithmetic is exact integer cents."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    c = s.select("user_id", "ts", "event_id", "cents", F.sum("cents").over(w).alias("cum"))
    p = c.select(
        "user_id", "cents", "cum", F.max("cum").over(w).alias("peak")
    )
    return p.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ev"),
        F.sum("cents").cast("long").alias("net_cents"),
        F.max("peak").cast("long").alias("peak_cents"),
        F.max(F.col("peak") - F.col("cum")).cast("long").alias("max_drawdown_cents"),
    )


# Nelson-Aalen cumulative hazard -------------------------------------------


@register(
    "nelson_aalen",
    """
    WITH e AS (
      SELECT user_id, event_type,
             CAST(epoch_ms(CAST(ts AS TIMESTAMP)) AS BIGINT) AS t_ms
      FROM events
    ),
    u AS (
      SELECT user_id, min(t_ms) AS t_first,
             min(CASE WHEN event_type = 'purchase' THEN t_ms END) AS t_purch,
             max(t_ms) AS t_last
      FROM e GROUP BY user_id
    ),
    dur AS (
      SELECT CASE WHEN t_purch IS NOT NULL
                  THEN CAST((t_purch - t_first) // 86400000 AS BIGINT)
                  ELSE CAST((t_last - t_first) // 86400000 AS BIGINT) END AS t_days,
             CASE WHEN t_purch IS NOT NULL THEN 1 ELSE 0 END AS observed
      FROM u
    ),
    byt AS (
      SELECT t_days, CAST(sum(observed) AS BIGINT) AS d,
             CAST(sum(1 - observed) AS BIGINT) AS c
      FROM dur GROUP BY t_days
    ),
    tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS n_users FROM byt),
    risk AS (
      SELECT t_days, d, c,
             n_users - COALESCE(sum(d + c) OVER (ORDER BY t_days
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
      FROM byt, tot
    )
    SELECT t_days, d, CAST(n_risk AS BIGINT) AS n_risk,
           round(sum(CAST(d AS DOUBLE) / n_risk) OVER (ORDER BY t_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS na_hat
    FROM risk WHERE d > 0
    ORDER BY t_days
    """,
    doc=(
        "Nelson-Aalen cumulative-hazard estimator over the same "
        "signup->purchase durations as kaplan_meier (right-censored at "
        "last activity): H(t) = sum d_i/n_i — the hazard-scale "
        "counterpart whose increments are the discrete hazard rates"
    ),
)
def nelson_aalen(spark, sf_dir):
    """Identical reduction shape to kaplan_meier (per-user rollup ->
    O(distinct days) frame -> ordered cumulative window); the hazard
    prefix sum is sequential in day order on both engines, so the float
    accumulation order is pinned by construction. The d > 0 filter is
    applied AFTER n_risk/na_hat so censoring-only days still consume
    risk-set mass, exactly as in the KM twin."""
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
    )
    u = e.groupBy("user_id").agg(
        F.min("t_ms").alias("t_first"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("t_ms"))).alias(
            "t_purch"
        ),
        F.max("t_ms").alias("t_last"),
    )
    dur = u.select(
        F.when(
            F.col("t_purch").isNotNull(),
            ((F.col("t_purch") - F.col("t_first")) / 86400000).cast("long"),
        )
        .otherwise(((F.col("t_last") - F.col("t_first")) / 86400000).cast("long"))
        .alias("t_days"),
        F.when(F.col("t_purch").isNotNull(), 1).otherwise(0).alias("observed"),
    )
    byt = dur.groupBy("t_days").agg(
        F.sum("observed").cast("long").alias("d"),
        F.sum(1 - F.col("observed")).cast("long").alias("c"),
    )
    byt = _persist_evict(byt)
    tot = byt.agg(F.sum(F.col("d") + F.col("c")).cast("long").alias("n_users"))
    wprev = Window.orderBy("t_days").rowsBetween(Window.unboundedPreceding, -1)
    wcur = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = byt.crossJoin(F.broadcast(tot)).select(
        "t_days",
        "d",
        "c",
        (
            F.col("n_users")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wprev), F.lit(0))
        ).alias("n_risk"),
    )
    return (
        risk.select(
            "t_days",
            "d",
            F.col("n_risk").cast("long").alias("n_risk"),
            F.round(
                F.sum(F.col("d").cast("double") / F.col("n_risk")).over(wcur), 6
            ).alias("na_hat"),
        )
        .filter(F.col("d") > 0)
    )


# Yule's K (vocabulary concentration) ---------------------------------------


@register(
    "yule_k",
    """
    WITH b AS (
      SELECT source, unnest(regexp_extract_all(text, '\\S+')) AS tok
      FROM documents
    ),
    v AS (SELECT source, tok, CAST(count(*) AS HUGEINT) AS c
          FROM b GROUP BY source, tok),
    m AS (
      SELECT source, CAST(sum(c) AS HUGEINT) AS n,
             CAST(count(*) AS BIGINT) AS n_types,
             sum(c * c) AS s2
      FROM v GROUP BY source
    )
    SELECT source, CAST(n AS BIGINT) AS n_tok, n_types,
           round(10000.0 * CAST(s2 - n AS DOUBLE) / CAST(n * n AS DOUBLE), 6)
             AS yule_k
    FROM m
    """,
    doc=(
        "Yule's characteristic K per source: vocabulary concentration "
        "10^4 * (sum c_i^2 - N)/N^2 over the token frequency spectrum — "
        "the repetitiveness fingerprint complementing lexical_diversity "
        "(high K = formulaic/boilerplate-heavy source)"
    ),
)
def yule_k(spark, sf_dir):
    """Two partial-agg groupBys (token explode -> per-(source, type)
    counts -> per-source spectrum moments); every moment is an exact
    decimal(38,0) integer and the single float op is the final division.
    Shuffle keys are (source, token) then source — the standard
    vocabulary-build shape that scales to any corpus."""
    d38 = "decimal(38,0)"
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(F.expr(r"regexp_extract_all(text, '\\S+', 0)")).alias("tok"),
    )
    v = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    m = v.groupBy("source").agg(
        F.sum("c").cast(d38).alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("c").cast(d38) * F.col("c")).alias("s2"),
    )
    return m.select(
        "source",
        F.col("n").cast("long").alias("n_tok"),
        "n_types",
        F.round(
            10000.0 * (F.col("s2") - F.col("n")).cast("double")
            / (F.col("n") * F.col("n")).cast("double"),
            6,
        ).alias("yule_k"),
    )


# Simple Good-Turing frequency re-estimation --------------------------------

_GT_MAX_R = 10


@register(
    "good_turing",
    f"""
    WITH b AS (
      SELECT unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents
    ),
    v AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY tok),
    spec AS (SELECT c AS r, CAST(count(*) AS BIGINT) AS n_r FROM v GROUP BY c),
    rr AS (SELECT CAST(unnest(generate_series(1, {_GT_MAX_R})) AS BIGINT) AS r)
    SELECT rr.r AS r,
           CAST(COALESCE(s1.n_r, 0) AS BIGINT) AS n_r,
           CAST(COALESCE(s2.n_r, 0) AS BIGINT) AS n_r1,
           round(CASE WHEN COALESCE(s1.n_r, 0) > 0
                      THEN (rr.r + 1) * CAST(COALESCE(s2.n_r, 0) AS DOUBLE)
                           / COALESCE(s1.n_r, 0)
                      ELSE 0.0 END, 6) AS r_star
    FROM rr LEFT JOIN spec s1 ON s1.r = rr.r
            LEFT JOIN spec s2 ON s2.r = rr.r + 1
    ORDER BY rr.r
    """,
    doc=(
        "simple Good-Turing discounted count r* = (r+1) N_(r+1)/N_r for "
        "r = 1..10 from the corpus token frequency-of-frequencies — the "
        "unseen-mass smoothing curve LM estimators (Katz, SGT) start from"
    ),
)
def good_turing(spark, sf_dir):
    """The frequency spectrum is two nested partial-agg groupBys (token
    counts, then count-of-counts); the r = 1..10 probe frame is a
    broadcast range joined twice against the O(distinct r) spectrum.
    Integer counts all the way; one final division."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.expr(r"regexp_extract_all(text, '\\S+', 0)")).alias("tok")
    )
    v = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    spec = _persist_evict(
        v.groupBy(F.col("c").alias("r")).agg(F.count(F.lit(1)).cast("long").alias("n_r"))
    )
    rr = spark.range(1, _GT_MAX_R + 1).select(F.col("id").cast("long").alias("r"))
    s1 = spec.select(F.col("r").alias("r1"), F.col("n_r").alias("nr"))
    s2 = spec.select(F.col("r").alias("r2"), F.col("n_r").alias("nr1"))
    j = (
        rr.join(F.broadcast(s1), F.col("r") == F.col("r1"), "left")
        .join(F.broadcast(s2), F.col("r2") == F.col("r") + 1, "left")
        .select(
            "r",
            F.coalesce(F.col("nr"), F.lit(0)).cast("long").alias("n_r"),
            F.coalesce(F.col("nr1"), F.lit(0)).cast("long").alias("n_r1"),
        )
    )
    return j.select(
        "r",
        "n_r",
        "n_r1",
        F.round(
            F.when(
                F.col("n_r") > 0,
                (F.col("r") + 1) * F.col("n_r1").cast("double") / F.col("n_r"),
            ).otherwise(0.0),
            6,
        ).alias("r_star"),
    )


# Simpson diversity index ---------------------------------------------------


@register(
    "simpson_diversity",
    """
    WITH b AS (
      SELECT source, unnest(regexp_extract_all(text, '\\S+')) AS tok
      FROM documents
    ),
    v AS (SELECT source, tok, CAST(count(*) AS HUGEINT) AS c
          FROM b GROUP BY source, tok),
    m AS (
      SELECT source, CAST(sum(c) AS HUGEINT) AS n,
             CAST(count(*) AS BIGINT) AS n_types,
             sum(c * (c - 1)) AS s2
      FROM v GROUP BY source
    )
    SELECT source, CAST(n AS BIGINT) AS n_tok, n_types,
           round(1.0 - CAST(s2 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE), 6)
             AS simpson_d
    FROM m
    """,
    doc=(
        "Simpson diversity 1 - sum c_i(c_i - 1)/(N(N-1)) of the token "
        "type distribution per source: the probability two random tokens "
        "differ — the unbiased (small-sample exact) companion to "
        "entropy_score and chao1_richness"
    ),
)
def simpson_diversity(spark, sf_dir):
    """Same two-groupBy vocabulary shape as yule_k (the two share their
    scan but are registered independently so each stays a one-line
    user call); exact decimal moments, one float division."""
    d38 = "decimal(38,0)"
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(F.expr(r"regexp_extract_all(text, '\\S+', 0)")).alias("tok"),
    )
    v = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    m = v.groupBy("source").agg(
        F.sum("c").cast(d38).alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("c").cast(d38) * (F.col("c") - 1)).alias("s2"),
    )
    return m.select(
        "source",
        F.col("n").cast("long").alias("n_tok"),
        "n_types",
        F.round(
            1.0
            - F.col("s2").cast("double")
            / (F.col("n") * (F.col("n") - 1)).cast("double"),
            6,
        ).alias("simpson_d"),
    )


# Kneser-Ney smoothed bigram probabilities ----------------------------------

_KN_D = 0.75
_KN_TOP = 50


@register(
    "kneser_ney_bigram",
    f"""
    WITH d AS (SELECT string_split(text, ' ') AS a FROM documents),
    bi AS (
      SELECT a[i] AS w1, a[i + 1] AS w2
      FROM d CROSS JOIN unnest(range(1, len(a))) AS t(i)
    ),
    cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bi GROUP BY w1, w2),
    cw AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1,
                  CAST(count(*) AS BIGINT) AS t_w1
           FROM cb GROUP BY w1),
    cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS cont_w2 FROM cb GROUP BY w2),
    btypes AS (SELECT CAST(count(*) AS BIGINT) AS n_btypes FROM cb),
    top AS (
      SELECT w1, w2, c2 FROM cb ORDER BY c2 DESC, w1, w2 LIMIT {_KN_TOP}
    )
    SELECT top.w1 AS w1, top.w2 AS w2, top.c2 AS c2,
           round((top.c2 - {_KN_D}) / cw.c1
                 + {_KN_D} * cw.t_w1 / cw.c1
                   * (CAST(cont.cont_w2 AS DOUBLE) / n_btypes), 6) AS p_kn
    FROM top JOIN cw ON cw.w1 = top.w1
             JOIN cont ON cont.w2 = top.w2
             CROSS JOIN btypes
    """,
    doc=(
        "interpolated Kneser-Ney bigram probability (fixed discount "
        "D = 0.75) for the 50 most frequent bigrams: discounted ML term "
        "plus continuation-probability backoff P_cont(w2) = "
        "|preceding types|/|bigram types| — the LM-smoothing benchmark "
        "beside bigram_surprisal's raw ML model"
    ),
)
def kneser_ney_bigram(spark, sf_dir):
    """All model frames are aggregates of the bigram-type frame (built
    map-side by zip-of-slices, no position self-join): context totals and
    fan-out T(w1) from one groupBy, continuation counts from another, the
    type total as a scalar broadcast. The top-50 selection orders by the
    exact integer count with lexicographic tie-break, so the cut is
    deterministic across engines. Joins after the cut touch 50 rows."""
    docs = _t(spark, sf_dir, "documents")
    a = F.split(F.col("text"), " ")
    n = F.size(a)
    bi = docs.select(
        F.explode(
            F.arrays_zip(
                F.slice(a, 1, n - 1).alias("w1"),
                F.slice(a, 2, n - 1).alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    cb = _persist_evict(
        bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c2"))
    )
    cw = cb.groupBy("w1").agg(
        F.sum("c2").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("t_w1"),
    )
    cont = cb.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("cont_w2"))
    btypes = cb.agg(F.count(F.lit(1)).cast("long").alias("n_btypes"))
    wtop = Window.orderBy(F.col("c2").desc(), "w1", "w2")
    top = (
        cb.select("w1", "w2", "c2", F.row_number().over(wtop).alias("rk"))
        .filter(F.col("rk") <= _KN_TOP)
        .drop("rk")
    )
    return (
        top.join(F.broadcast(cw), "w1")
        .join(F.broadcast(cont), "w2")
        .crossJoin(F.broadcast(btypes))
        .select(
            "w1",
            "w2",
            "c2",
            F.round(
                (F.col("c2") - _KN_D) / F.col("c1")
                + _KN_D * F.col("t_w1") / F.col("c1")
                * (F.col("cont_w2").cast("double") / F.col("n_btypes")),
                6,
            ).alias("p_kn"),
        )
    )


# Dice-coefficient collocations ---------------------------------------------


@register(
    "dice_collocations",
    f"""
    WITH d AS (SELECT string_split(text, ' ') AS a FROM documents),
    bi AS (
      SELECT a[i] AS w1, a[i + 1] AS w2
      FROM d CROSS JOIN unnest(range(1, len(a))) AS t(i)
    ),
    uni AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS cu FROM (
        SELECT unnest(a) AS tok FROM d
      ) GROUP BY tok
    ),
    cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bi GROUP BY w1, w2),
    top AS (
      SELECT w1, w2, c2 FROM cb ORDER BY c2 DESC, w1, w2 LIMIT {_KN_TOP}
    )
    SELECT top.w1 AS w1, top.w2 AS w2, top.c2 AS c2,
           round(2.0 * top.c2 / (u1.cu + u2.cu), 6) AS dice
    FROM top JOIN uni u1 ON u1.tok = top.w1
             JOIN uni u2 ON u2.tok = top.w2
    """,
    doc=(
        "Dice-coefficient collocation strength 2 c(w1,w2)/(c(w1)+c(w2)) "
        "for the 50 most frequent adjacent pairs — the symmetric "
        "association measure beside pmi_pairs (PMI rewards rarity, Dice "
        "rewards exclusivity)"
    ),
)
def dice_collocations(spark, sf_dir):
    """Bigram and unigram counts are independent partial-agg groupBys
    over the same split array (bigrams by zip-of-slices); the
    deterministic integer top-50 cut happens BEFORE any join, so the
    unigram frames are probed by 50 rows in broadcast. Exact integers
    into one final division."""
    docs = _t(spark, sf_dir, "documents")
    a = F.split(F.col("text"), " ")
    n = F.size(a)
    arr = _persist_evict(docs.select(a.alias("a")))
    bi = arr.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("a"), 1, F.size(F.col("a")) - 1).alias("w1"),
                F.slice(F.col("a"), 2, F.size(F.col("a")) - 1).alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    uni = arr.select(F.explode(F.col("a")).alias("tok")).groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("cu")
    )
    cb = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c2"))
    wtop = Window.orderBy(F.col("c2").desc(), "w1", "w2")
    top = (
        cb.select("w1", "w2", "c2", F.row_number().over(wtop).alias("rk"))
        .filter(F.col("rk") <= _KN_TOP)
        .drop("rk")
    )
    u1 = uni.select(F.col("tok").alias("w1"), F.col("cu").alias("cu1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("cu").alias("cu2"))
    return (
        top.join(u1, "w1")
        .join(u2, "w2")
        .select(
            "w1",
            "w2",
            "c2",
            F.round(2.0 * F.col("c2") / (F.col("cu1") + F.col("cu2")), 6).alias(
                "dice"
            ),
        )
    )


# Graph diameter lower bound (double-sweep BFS) ------------------------------

_DIAM_ROUNDS = 8


def _bfs_rounds_sql(prefix: str, seed_cte: str, rounds: int) -> str:
    """Unrolled BFS CTEs {prefix}0..{prefix}{rounds} over the ``adj``/
    ``nodes`` CTEs, seeded from scalar CTE ``{seed_cte}`` (column sv).
    Same NULL-safe integer min-relax as the sssp oracle, w = 1."""
    out = [
        f"""
    {prefix}0 AS MATERIALIZED (
      SELECT v, CASE WHEN v = (SELECT sv FROM {seed_cte})
                     THEN CAST(0 AS BIGINT) END AS dist
      FROM nodes
    )"""
    ]
    for k in range(1, rounds + 1):
        out.append(f"""
    {prefix}{k} AS MATERIALIZED (
      SELECT n.v,
             CAST(least(coalesce(min(p.dist), min(q.dist + 1)),
                        coalesce(min(q.dist + 1), min(p.dist))) AS BIGINT) AS dist
      FROM nodes n
      LEFT JOIN {prefix}{k - 1} p ON p.v = n.v
      LEFT JOIN adj ON adj.y = n.v
      LEFT JOIN {prefix}{k - 1} q ON q.v = adj.x
      GROUP BY n.v
    )""")
    return ",".join(out)


def _graph_diameter_oracle_sql() -> str:
    r = _DIAM_ROUNDS
    # MATERIALIZED: DuckDB otherwise inlines adj/nodes into every unrolled
    # round (2 refs x 2 sweeps x rounds), re-opening the parquet scan per
    # copy and exhausting the fd limit
    return f"""
    WITH e0 AS MATERIALIZED ({_LC_E_SQL}),
    adj AS MATERIALIZED (
      SELECT u AS x, v AS y FROM e0 UNION ALL SELECT v AS x, u AS y FROM e0),
    nodes AS MATERIALIZED (SELECT DISTINCT x AS v FROM adj),
    deg AS (SELECT x AS v, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY x),
    s1 AS (SELECT v AS sv FROM deg ORDER BY d DESC, v LIMIT 1),
    {_bfs_rounds_sql("a", "s1", r)},
    e1 AS (SELECT max(dist) AS ecc FROM a{r}),
    s2 AS (SELECT min(v) AS sv FROM a{r} WHERE dist = (SELECT ecc FROM e1)),
    {_bfs_rounds_sql("b", "s2", r)},
    e2 AS (SELECT max(dist) AS ecc FROM b{r}),
    f2 AS (SELECT min(v) AS fv FROM b{r} WHERE dist = (SELECT ecc FROM e2)),
    rc AS (SELECT CAST(count(dist) AS BIGINT) AS n_reached FROM b{r})
    SELECT (SELECT sv FROM s1) AS src1,
           CAST((SELECT ecc FROM e1) AS BIGINT) AS ecc1,
           (SELECT sv FROM s2) AS src2,
           CAST((SELECT ecc FROM e2) AS BIGINT) AS ecc2,
           (SELECT fv FROM f2) AS far2,
           (SELECT n_reached FROM rc) AS n_reached
    """


@register(
    "graph_diameter",
    _graph_diameter_oracle_sql(),
    doc=(
        f"graph diameter lower bound by double-sweep BFS ({_DIAM_ROUNDS} "
        "bounded rounds per sweep) on the sparse co-purchase graph: BFS "
        "from the max-degree hub, re-sweep from the farthest node — ecc2 "
        "is the classic tight diameter lower bound; all-integer, exact"
    ),
)
def graph_diameter(spark, sf_dir):
    """Two bounded BFS sweeps, each the sssp loop with w = 1 (frontier
    equi-join + partial-agg min + NULL-skipping least merge, integer so
    aggregation order is irrelevant; localCheckpoint truncates lineage
    per round). Seed picks are deterministic integer aggregates
    (max-degree tie-broken by min id; farthest tie-broken by min id).
    The bound is {_DIAM_ROUNDS} rounds in BOTH engines, so parity holds
    even if the true eccentricity exceeds it."""
    from pyspark import StorageLevel

    while len(_PAGERANK_CACHED) > 4:
        _PAGERANK_CACHED.pop(0).unpersist()
    e0 = _lc_edges(spark, sf_dir)
    adj = (
        e0.select(F.col("u").alias("x"), F.col("v").alias("y"))
        .unionAll(e0.select(F.col("v").alias("x"), F.col("u").alias("y")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _PAGERANK_CACHED.append(adj)
    nodes = adj.select(F.col("x").alias("v")).distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    _PAGERANK_CACHED.append(nodes)

    def sweep(seed_df: DataFrame) -> DataFrame:
        # frontier BFS: each round touches only the newly-reached layer
        # (not the full node set), so per-round work shrinks as the wave
        # saturates — same reached/dist semantics as the oracle's bounded
        # min-relax, at a fraction of the shuffled rows
        dist = seed_df.select(
            F.col("sv").alias("v"), F.lit(0).cast("long").alias("dist")
        ).localCheckpoint(eager=False)
        frontier = dist
        for k in range(1, _DIAM_ROUNDS + 1):
            cand = (
                frontier.select(F.col("v").alias("x"))
                .join(adj, "x")
                .select(F.col("y").alias("v"))
                .distinct()
            )
            new = (
                cand.join(dist, "v", "left_anti")
                .select("v", F.lit(k).cast("long").alias("dist"))
                .localCheckpoint()
            )
            # exact early exit: an empty wave makes every later round a
            # no-op, so stopping cannot change the bounded-BFS result
            if new.limit(1).count() == 0:
                break
            dist = dist.unionAll(new)
            frontier = new
        return dist

    deg = adj.groupBy("x").agg(F.count(F.lit(1)).alias("d"))
    s1 = (
        deg.orderBy(F.col("d").desc(), "x")
        .limit(1)
        .select(F.col("x").alias("sv"))
    )
    d1 = sweep(s1)
    e1 = d1.agg(F.max("dist").alias("ecc"))
    s2 = (
        d1.crossJoin(F.broadcast(e1))
        .filter(F.col("dist") == F.col("ecc"))
        .agg(F.min("v").alias("sv"))
    )
    d2 = sweep(s2)
    e2 = d2.agg(
        F.max("dist").alias("ecc2x"),
        F.count("dist").cast("long").alias("n_reached"),
    )
    f2 = (
        d2.crossJoin(F.broadcast(e2))
        .filter(F.col("dist") == F.col("ecc2x"))
        .agg(F.min("v").alias("far2"))
    )
    return (
        s1.select(F.col("sv").alias("src1"))
        .crossJoin(F.broadcast(e1.select(F.col("ecc").cast("long").alias("ecc1"))))
        .crossJoin(F.broadcast(s2.select(F.col("sv").alias("src2"))))
        .crossJoin(
            F.broadcast(
                e2.select(
                    F.col("ecc2x").cast("long").alias("ecc2"), "n_reached"
                )
            )
        )
        .crossJoin(F.broadcast(f2))
        .select("src1", "ecc1", "src2", "ecc2", "far2", "n_reached")
    )


# Landmark closeness centrality ----------------------------------------------

_CLOSE_L = 8  # landmarks: the L smallest node ids
_CLOSE_ROUNDS = 6


def _closeness_oracle_sql() -> str:
    r = _CLOSE_ROUNDS
    out = [
        f"""
    WITH e0 AS ({_LC_E_SQL}),
    adj AS (SELECT u AS x, v AS y FROM e0 UNION ALL SELECT v AS x, u AS y FROM e0),
    nodes AS (SELECT DISTINCT x AS v FROM adj),
    lm AS (SELECT v AS l FROM nodes ORDER BY v LIMIT {_CLOSE_L}),
    c0 AS MATERIALIZED (
      SELECT lm.l, n.v,
             CASE WHEN n.v = lm.l THEN CAST(0 AS BIGINT) END AS dist
      FROM lm CROSS JOIN nodes n
    )"""
    ]
    for k in range(1, r + 1):
        out.append(f"""
    c{k} AS MATERIALIZED (
      SELECT s.l, s.v,
             CAST(least(coalesce(min(s.dist), min(q.dist + 1)),
                        coalesce(min(q.dist + 1), min(s.dist))) AS BIGINT) AS dist
      FROM c{k - 1} s
      LEFT JOIN adj ON adj.y = s.v
      LEFT JOIN c{k - 1} q ON q.l = s.l AND q.v = adj.x
      GROUP BY s.l, s.v
    )""")
    return (
        ",".join(out)
        + f"""
    SELECT l AS landmark,
           CAST(count(dist) AS BIGINT) AS n_reached,
           CAST(sum(dist) AS BIGINT) AS sum_dist,
           round(CAST(count(dist) - 1 AS DOUBLE) / sum(dist), 6) AS closeness
    FROM c{r} GROUP BY l
    """
    )


@register(
    "closeness_landmarks",
    _closeness_oracle_sql(),
    doc=(
        f"closeness centrality of {_CLOSE_L} landmark nodes (the smallest "
        f"ids) by multi-source BFS bounded at {_CLOSE_ROUNDS} rounds: "
        "(reached-1)/sum(dist) over the co-purchase graph — the "
        "landmark-sketch APSP approximation used for network-distance "
        "features at scale"
    ),
)
def closeness_landmarks(spark, sf_dir):
    """The BFS state is (landmark, node, dist) — L x N rows, integer
    min-relaxed per round with one equi-join against the adjacency list
    keyed on the frontier node; the landmark id rides along so all L
    sweeps share every shuffle. Bounded rounds (same constant in the SQL
    oracle) keep the unrolled plan finite; localCheckpoint truncates
    lineage. Output is three exact integers + one division per
    landmark."""
    from pyspark import StorageLevel

    while len(_PAGERANK_CACHED) > 4:
        _PAGERANK_CACHED.pop(0).unpersist()
    e0 = _lc_edges(spark, sf_dir)
    adj = (
        e0.select(F.col("u").alias("x"), F.col("v").alias("y"))
        .unionAll(e0.select(F.col("v").alias("x"), F.col("u").alias("y")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _PAGERANK_CACHED.append(adj)
    nodes = adj.select(F.col("x").alias("v")).distinct()
    lm = nodes.orderBy("v").limit(_CLOSE_L).select(F.col("v").alias("l"))
    # frontier BFS over (landmark, node) state — only reached rows are
    # carried, so the L sweeps share shuffles AND each round's join is
    # proportional to the new wave, not L x N (the graph_diameter note)
    st = lm.select("l", F.col("l").alias("v"), F.lit(0).cast("long").alias("dist"))
    st = st.localCheckpoint(eager=False)
    frontier = st
    for k in range(1, _CLOSE_ROUNDS + 1):
        cand = (
            frontier.select("l", F.col("v").alias("x"))
            .join(adj, "x")
            .select("l", F.col("y").alias("v"))
            .distinct()
        )
        new = (
            cand.join(st, ["l", "v"], "left_anti")
            .select("l", "v", F.lit(k).cast("long").alias("dist"))
            .localCheckpoint()
        )
        if new.limit(1).count() == 0:
            break
        st = st.unionAll(new)
        frontier = new
    return st.groupBy(F.col("l").alias("landmark")).agg(
        F.count("dist").cast("long").alias("n_reached"),
        F.sum("dist").cast("long").alias("sum_dist"),
        F.round(
            (F.count("dist") - 1).cast("double") / F.sum("dist"), 6
        ).alias("closeness"),
    )


# Personalized PageRank ------------------------------------------------------

_PPR_ALPHA = 0.15
_PPR_SEEDS = 5
_PPR_ITERS = 5


def _ppr_oracle_sql() -> str:
    base = _PPR_ALPHA / _PPR_SEEDS
    head = f"""
    WITH e AS (
      SELECT DISTINCT l_orderkey % {_PR_N} AS src, l_partkey % {_PR_N} AS dst
      FROM lineitem
    ),
    nodes AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION SELECT dst FROM e)),
    seeds AS (SELECT v FROM nodes ORDER BY v LIMIT {_PPR_SEEDS}),
    deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS d FROM e GROUP BY src),
    r0 AS (
      SELECT v, CASE WHEN v IN (SELECT v FROM seeds)
                     THEN {base!r} ELSE 0.0 END AS r
      FROM nodes
    )"""
    steps = []
    for k in range(1, _PPR_ITERS + 1):
        steps.append(f"""
    r{k} AS (
      SELECT n.v,
             CASE WHEN n.v IN (SELECT v FROM seeds)
                  THEN {base!r} ELSE 0.0 END
             + {1.0 - _PPR_ALPHA!r} * coalesce(sum(p.r / deg.d), 0.0) AS r
      FROM nodes n
      LEFT JOIN e ON e.dst = n.v
      LEFT JOIN deg ON deg.src = e.src
      LEFT JOIN r{k - 1} p ON p.v = e.src
      GROUP BY n.v
    )""")
    return (
        head
        + ","
        + ",".join(steps)
        + f"\n    SELECT v AS node, round(r, 6) AS ppr FROM r{_PPR_ITERS}"
        " WHERE r > 0.0"
    )


@register(
    "ppr_seeds",
    _ppr_oracle_sql(),
    doc=(
        f"personalized PageRank from the {_PPR_SEEDS} lowest node ids "
        f"(restart prob {_PPR_ALPHA}, {_PPR_ITERS} rounds) over the "
        "order->part graph: proximity-to-seed-set scores — the "
        "random-walk-with-restart retrieval primitive beside the global "
        "pagerank"
    ),
)
def ppr_seeds(spark, sf_dir):
    """The pagerank loop with the teleport mass concentrated on the seed
    set (broadcast indicator join instead of a uniform base): one
    contributions-only shuffle per round, persisted edge/degree frames,
    6-dp round absorbing sum-order ULP drift exactly as pagerank
    documents. Zero-mass nodes are filtered so the output is the reached
    neighborhood, not the node universe."""
    from pyspark import StorageLevel

    li = _t(spark, sf_dir, "lineitem")
    e = (
        li.select(
            (F.col("l_orderkey") % _PR_N).alias("src"),
            (F.col("l_partkey") % _PR_N).alias("dst"),
        )
        .distinct()
    )
    while len(_PAGERANK_CACHED) > 2:
        _PAGERANK_CACHED.pop(0).unpersist()
    nodes = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _PAGERANK_CACHED.append(nodes)
    deg = e.groupBy("src").agg(F.count("*").cast("double").alias("d"))
    ed = e.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    _PAGERANK_CACHED.append(ed)
    base = _PPR_ALPHA / _PPR_SEEDS
    seeds = nodes.orderBy("v").limit(_PPR_SEEDS).select(
        "v", F.lit(True).alias("is_seed")
    )
    nb = nodes.join(F.broadcast(seeds), "v", "left").select(
        "v",
        F.when(F.col("is_seed"), F.lit(base)).otherwise(F.lit(0.0)).alias("b"),
    )
    nb = _persist_evict(nb)
    ranks = nb.select("v", F.col("b").alias("r"))
    for _ in range(_PPR_ITERS):
        contrib = (
            ed.join(ranks, ed.src == ranks.v)
            .select(F.col("dst").alias("v"), (F.col("r") / F.col("d")).alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nb.join(contrib, "v", "left").select(
            "v",
            (
                F.col("b")
                + F.lit(1.0 - _PPR_ALPHA) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("r"),
        )
    return ranks.filter(F.col("r") > 0.0).select(
        F.col("v").alias("node"), F.round("r", 6).alias("ppr")
    )


# Rayleigh test of circular uniformity ---------------------------------------


@register(
    "rayleigh_test",
    """
    WITH pts AS (
      SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS t_ms, event_id,
             (user_id % 120) * 1000
               + CASE WHEN event_id % 13 < 4 THEN 2000 ELSE 0 END
               + event_id % 7 AS iy,
             (user_id % 300) * 1000
               + CASE WHEN event_id % 13 < 4 THEN 2000 ELSE 0 END
               + event_id % 5 AS ix
      FROM events
    ),
    legs AS (
      SELECT user_id,
             iy - lag(iy) OVER w AS dy,
             ix - lag(ix) OVER w AS dx
      FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY t_ms, event_id)
    ),
    uv AS (
      SELECT user_id,
             CAST(round(dx * 1000000000000.0 / sqrt(CAST(dx * dx + dy * dy AS DOUBLE)))
                  AS BIGINT) AS ux,
             CAST(round(dy * 1000000000000.0 / sqrt(CAST(dx * dx + dy * dy AS DOUBLE)))
                  AS BIGINT) AS uy
      FROM legs WHERE dx IS NOT NULL AND (dx <> 0 OR dy <> 0)
    ),
    agg AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_legs,
             CAST(sum(ux) AS BIGINT) AS sx, CAST(sum(uy) AS BIGINT) AS sy
      FROM uv GROUP BY user_id
    )
    SELECT user_id, n_legs,
           round(sqrt(CAST(sx AS DOUBLE) * sx + CAST(sy AS DOUBLE) * sy)
                 / (n_legs * 1000000000000.0), 6) AS r_bar,
           round(n_legs * (sqrt(CAST(sx AS DOUBLE) * sx + CAST(sy AS DOUBLE) * sy)
                 / (n_legs * 1000000000000.0))
                 * (sqrt(CAST(sx AS DOUBLE) * sx + CAST(sy AS DOUBLE) * sy)
                 / (n_legs * 1000000000000.0)), 6) AS rayleigh_z
    FROM agg
    """,
    doc=(
        "Rayleigh test of movement-bearing uniformity per user: mean "
        "resultant length of unit leg vectors and z = n*R^2 (large z = "
        "directed drift, small = isotropic wander) over bearing_rose's "
        "trajectory legs; unit vectors are fixed-point 1e-12 integers so "
        "the resultant sum is order-independent and bit-identical"
    ),
)
def rayleigh_test(spark, sf_dir):
    """Same single trajectory window as bearing_rose; each leg's unit
    vector is computed with correctly-rounded IEEE ops (sqrt/div) and
    snapped to 1e-12 fixed point, making the cross-leg reduction an exact
    BIGINT sum — no float accumulation anywhere. Zero-length legs
    (consecutive fixes at the same point) are excluded on both engines."""
    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
        "event_id",
        (
            (F.col("user_id") % 120) * 1000
            + F.when(F.col("event_id") % 13 < 4, 2000).otherwise(0)
            + F.col("event_id") % 7
        ).alias("iy"),
        (
            (F.col("user_id") % 300) * 1000
            + F.when(F.col("event_id") % 13 < 4, 2000).otherwise(0)
            + F.col("event_id") % 5
        ).alias("ix"),
    )
    w = Window.partitionBy("user_id").orderBy("t_ms", "event_id")
    legs = pts.select(
        "user_id",
        (F.col("iy") - F.lag("iy").over(w)).alias("dy"),
        (F.col("ix") - F.lag("ix").over(w)).alias("dx"),
    ).filter(
        F.col("dx").isNotNull() & ((F.col("dx") != 0) | (F.col("dy") != 0))
    )
    hyp = F.sqrt((F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy")).cast("double"))
    uv = legs.select(
        "user_id",
        F.round(F.col("dx") * F.lit(1000000000000.0) / hyp).cast("long").alias("ux"),
        F.round(F.col("dy") * F.lit(1000000000000.0) / hyp).cast("long").alias("uy"),
    )
    agg = uv.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_legs"),
        F.sum("ux").cast("long").alias("sx"),
        F.sum("uy").cast("long").alias("sy"),
    )
    rbar = F.sqrt(
        F.col("sx").cast("double") * F.col("sx")
        + F.col("sy").cast("double") * F.col("sy")
    ) / (F.col("n_legs") * F.lit(1000000000000.0))
    return agg.select(
        "user_id",
        "n_legs",
        F.round(rbar, 6).alias("r_bar"),
        F.round(F.col("n_legs") * rbar * rbar, 6).alias("rayleigh_z"),
    )


# McNemar paired test ---------------------------------------------------------


@register(
    "mcnemar_test",
    """
    WITH u AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             max(CASE WHEN event_type = 'purchase'
                       AND EXTRACT(hour FROM ts) < 12
                      THEN 1 ELSE 0 END) AS h1,
             max(CASE WHEN event_type = 'purchase'
                       AND EXTRACT(hour FROM ts) >= 12
                      THEN 1 ELSE 0 END) AS h2
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN h1 = 1 AND h2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(sum(CASE WHEN h1 = 0 AND h2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c
      FROM u
    )
    SELECT n_pairs, b, c,
           round(CASE WHEN b + c > 0
                      THEN CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
                           / (b + c)
                      ELSE 0.0 END, 6) AS chi2_mcnemar
    FROM m
    """,
    doc=(
        "McNemar paired test of morning-vs-afternoon purchase behavior "
        "over (user, day) pairs (continuity corrected): b/c discordant "
        "counts are exact integers, the density per pair is "
        "scale-invariant (events per user-day is constant across SF), "
        "and the zero-discordant case is guarded identically on both "
        "engines"
    ),
)
def mcnemar_test(spark, sf_dir):
    """One partial-agg rollup on (user, day) with two conditional max
    bits, one global count — integers until the final division. Scales
    as a single groupBy; no scalar pre-pass needed since the AM/PM split
    is per-row algebra."""
    ev = _t(spark, sf_dir, "events")
    hour = F.hour("ts")
    u = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.max(
            F.when((F.col("event_type") == "purchase") & (hour < 12), 1).otherwise(0)
        ).alias("h1"),
        F.max(
            F.when((F.col("event_type") == "purchase") & (hour >= 12), 1).otherwise(0)
        ).alias("h2"),
    )
    m = u.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.when((F.col("h1") == 1) & (F.col("h2") == 0), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when((F.col("h1") == 0) & (F.col("h2") == 1), 1).otherwise(0))
        .cast("long")
        .alias("c"),
    )
    bc = F.abs(F.col("b") - F.col("c"))
    return m.select(
        "n_pairs",
        "b",
        "c",
        F.round(
            F.when(
                F.col("b") + F.col("c") > 0,
                ((bc - 1) * (bc - 1)).cast("double") / (F.col("b") + F.col("c")),
            ).otherwise(0.0),
            6,
        ).alias("chi2_mcnemar"),
    )


# Solar position (NOAA/Spencer closed form) ----------------------------------

# Spencer (1971) Fourier coefficients — public-domain NOAA formulas; literal
# constants shared verbatim by both engines.
_SP_DECL = "0.006918 - 0.399912 * cos({g}) + 0.070257 * sin({g}) - 0.006758 * cos(2 * {g}) + 0.000907 * sin(2 * {g}) - 0.002697 * cos(3 * {g}) + 0.00148 * sin(3 * {g})"
_SP_EQT = "229.18 * (0.000075 + 0.001868 * cos({g}) - 0.032077 * sin({g}) - 0.014615 * cos(2 * {g}) - 0.040849 * sin(2 * {g}))"
_SOLAR_PI = 3.141592653589793


def _solar_oracle_sql() -> str:
    g = "g"
    return f"""
    WITH p AS (
      SELECT event_id,
             (CAST(event_id * 7919 % 1200 AS DOUBLE) / 10.0) - 60.0 AS lat,
             (CAST(event_id * 104729 % 3600 AS DOUBLE) / 10.0) - 180.0 AS lon,
             CAST(dayofyear(CAST(ts AS TIMESTAMP)) AS BIGINT) AS doy,
             CAST(epoch_ms(CAST(ts AS TIMESTAMP)) % 86400000 AS DOUBLE)
               / 3600000.0 AS h
      FROM events
    ),
    a AS (
      SELECT event_id, lat, lon, doy, h,
             2.0 * {_SOLAR_PI!r} / 365.0 * (doy - 1 + (h - 12.0) / 24.0) AS g
      FROM p
    ),
    b AS (
      SELECT event_id, lat, lon, h,
             {_SP_DECL.format(g=g)} AS decl,
             {_SP_EQT.format(g=g)} AS eqt
      FROM a
    ),
    c AS (
      SELECT event_id, lat, decl,
             (h * 60.0 + eqt + 4.0 * lon) / 4.0 - 180.0 AS ha_deg
      FROM b
    )
    SELECT event_id,
           round(decl, 6) AS decl,
           round(sin(lat * {_SOLAR_PI!r} / 180.0) * sin(decl)
                 + cos(lat * {_SOLAR_PI!r} / 180.0) * cos(decl)
                   * cos(ha_deg * {_SOLAR_PI!r} / 180.0), 6) AS cos_zen,
           CASE WHEN sin(lat * {_SOLAR_PI!r} / 180.0) * sin(decl)
                     + cos(lat * {_SOLAR_PI!r} / 180.0) * cos(decl)
                       * cos(ha_deg * {_SOLAR_PI!r} / 180.0) > 0.0
                THEN 1 ELSE 0 END AS is_day
    FROM c
    """


@register(
    "solar_position",
    _solar_oracle_sql(),
    doc=(
        "solar declination, cosine zenith and day/night flag per event "
        "point via the Spencer/NOAA closed form (fractional-year Fourier "
        "declination + equation of time + hour angle) — the astronomy "
        "behind FILDA's day/night granule gating "
        "(reference: FILDA2 solar-zenith day/night shortcut, "
        "src/FILDA2/FILDA.py day-granule pruning), as pure column algebra"
    ),
)
def solar_position(spark, sf_dir):
    """Entirely map-side column algebra — no shuffle at all: day-of-year
    and UTC hour come from integer epoch math, the Spencer series and
    zenith cosine are fixed-structure float expressions with literal
    coefficients shared with the SQL oracle, so both engines execute the
    same IEEE op sequence (residual libm-vs-Math ulp drift absorbed by
    the 6-dp round). At 100 TB this is a free rider on any scan."""
    ev = _t(spark, sf_dir, "events")
    pi = _SOLAR_PI
    lat = (F.col("event_id") * 7919 % 1200).cast("double") / 10.0 - 60.0
    lon = (F.col("event_id") * 104729 % 3600).cast("double") / 10.0 - 180.0
    doy = F.dayofyear(F.col("ts").cast("timestamp")).cast("long")
    h = (
        F.unix_millis(F.col("ts").cast("timestamp")) % 86400000
    ).cast("double") / 3600000.0
    g = 2.0 * F.lit(pi) / 365.0 * (doy - 1 + (h - 12.0) / 24.0)
    decl = (
        F.lit(0.006918)
        - 0.399912 * F.cos(g)
        + 0.070257 * F.sin(g)
        - 0.006758 * F.cos(2 * g)
        + 0.000907 * F.sin(2 * g)
        - 0.002697 * F.cos(3 * g)
        + 0.00148 * F.sin(3 * g)
    )
    eqt = F.lit(229.18) * (
        F.lit(0.000075)
        + 0.001868 * F.cos(g)
        - 0.032077 * F.sin(g)
        - 0.014615 * F.cos(2 * g)
        - 0.040849 * F.sin(2 * g)
    )
    a = ev.select(
        "event_id",
        lat.alias("lat"),
        decl.alias("decl"),
        ((h * 60.0 + eqt + 4.0 * lon) / 4.0 - 180.0).alias("ha_deg"),
    )
    cz = F.sin(F.col("lat") * pi / 180.0) * F.sin(F.col("decl")) + F.cos(
        F.col("lat") * pi / 180.0
    ) * F.cos(F.col("decl")) * F.cos(F.col("ha_deg") * pi / 180.0)
    return a.select(
        "event_id",
        F.round("decl", 6).alias("decl"),
        F.round(cz, 6).alias("cos_zen"),
        F.when(cz > 0.0, 1).otherwise(0).alias("is_day"),
    )


# Great-circle destination point ---------------------------------------------

_GD_R_KM = 6371.0


@register(
    "geodesic_destination",
    f"""
    WITH p AS (
      SELECT event_id,
             ((CAST(event_id * 7919 % 1200 AS DOUBLE) / 10.0) - 60.0)
               * {_SOLAR_PI!r} / 180.0 AS ph1,
             ((CAST(event_id * 104729 % 3600 AS DOUBLE) / 10.0) - 180.0)
               * {_SOLAR_PI!r} / 180.0 AS la1,
             CAST(event_id * 37 % 360 AS DOUBLE) * {_SOLAR_PI!r} / 180.0 AS th,
             CAST(event_id % 500 AS DOUBLE) / {_GD_R_KM!r} AS dr
      FROM events
    ),
    d AS (
      SELECT event_id, ph1, la1, th, dr,
             asin(sin(ph1) * cos(dr) + cos(ph1) * sin(dr) * cos(th)) AS ph2
      FROM p
    )
    SELECT event_id,
           round(ph2 * 180.0 / {_SOLAR_PI!r}, 6) AS lat2,
           round((la1 + atan2(sin(th) * sin(dr) * cos(ph1),
                              cos(dr) - sin(ph1) * sin(ph2)))
                 * 180.0 / {_SOLAR_PI!r}, 6) AS lon2
    FROM d
    """,
    doc=(
        "great-circle destination point: from each event's synthetic "
        "(lat, lon), travel (event_id %% 500) km on bearing "
        "(event_id*37 %% 360) over the sphere — the forward geodesic "
        "primitive complementing the haversine distance family"
    ),
)
def geodesic_destination(spark, sf_dir):
    """Pure map-side spherical trigonometry with the identical expression
    tree in both engines (literal pi / radius), no shuffle; the standard
    forward-azimuth formulas (asin/atan2 are 1-ulp-stable and the 6-dp
    round absorbs drift)."""
    ev = _t(spark, sf_dir, "events")
    pi = _SOLAR_PI
    ph1 = ((F.col("event_id") * 7919 % 1200).cast("double") / 10.0 - 60.0) * pi / 180.0
    la1 = (
        (F.col("event_id") * 104729 % 3600).cast("double") / 10.0 - 180.0
    ) * pi / 180.0
    th = (F.col("event_id") * 37 % 360).cast("double") * pi / 180.0
    dr = (F.col("event_id") % 500).cast("double") / _GD_R_KM
    d = ev.select(
        "event_id",
        ph1.alias("ph1"),
        la1.alias("la1"),
        th.alias("th"),
        dr.alias("dr"),
    ).select(
        "event_id",
        "ph1",
        "la1",
        "th",
        "dr",
        F.asin(
            F.sin(F.col("ph1")) * F.cos(F.col("dr"))
            + F.cos(F.col("ph1")) * F.sin(F.col("dr")) * F.cos(F.col("th"))
        ).alias("ph2"),
    )
    return d.select(
        "event_id",
        F.round(F.col("ph2") * 180.0 / pi, 6).alias("lat2"),
        F.round(
            (
                F.col("la1")
                + F.atan2(
                    F.sin(F.col("th")) * F.sin(F.col("dr")) * F.cos(F.col("ph1")),
                    F.cos(F.col("dr")) - F.sin(F.col("ph1")) * F.sin(F.col("ph2")),
                )
            )
            * 180.0
            / pi,
            6,
        ).alias("lon2"),
    )


# Line densification ----------------------------------------------------------

_LD_STEP = 500.0  # grid units between inserted vertices


@register(
    "line_densify",
    f"""
    WITH pts AS (
      SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS t_ms, event_id,
             (user_id % 120) * 1000
               + CASE WHEN event_id % 13 < 4 THEN 2000 ELSE 0 END
               + event_id % 7 AS iy,
             (user_id % 300) * 1000
               + CASE WHEN event_id % 13 < 4 THEN 2000 ELSE 0 END
               + event_id % 5 AS ix
      FROM events
    ),
    legs AS (
      SELECT user_id,
             row_number() OVER w AS seq,
             lag(ix) OVER w AS x0, lag(iy) OVER w AS y0,
             ix - lag(ix) OVER w AS dx, iy - lag(iy) OVER w AS dy
      FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY t_ms, event_id)
    ),
    seg AS (
      SELECT user_id, seq, x0, y0, dx, dy,
             CAST(floor(sqrt(CAST(dx * dx + dy * dy AS DOUBLE)) / {_LD_STEP!r})
                  AS BIGINT) AS n_ins
      FROM legs WHERE dx IS NOT NULL
    )
    SELECT user_id, seq, CAST(i AS BIGINT) AS i,
           round(x0 + CAST(i AS DOUBLE) / (n_ins + 1) * dx, 6) AS xi,
           round(y0 + CAST(i AS DOUBLE) / (n_ins + 1) * dy, 6) AS yi
    FROM seg CROSS JOIN unnest(generate_series(1, n_ins)) AS t(i)
    WHERE n_ins > 0
    """,
    doc=(
        f"trajectory densification: insert evenly-spaced vertices every "
        f"~{_LD_STEP:.0f} grid units along each leg (floor(len/step) "
        "points, linear interpolation) — the vector-upsampling primitive "
        "feeding rasterize_segments, exact integer endpoints"
    ),
)
def line_densify(spark, sf_dir):
    """One trajectory window emits legs map-side; the vertex fan-out is a
    sequence() explode proportional to leg length over the step (the
    data's own sparsity — no cross join). Endpoints and deltas are exact
    integers; the interpolation fraction i/(n+1) is one double divide per
    emitted vertex, identical IEEE ops on both engines (sqrt is exact, so
    the floor() vertex count cannot disagree)."""
    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
        "event_id",
        (
            (F.col("user_id") % 120) * 1000
            + F.when(F.col("event_id") % 13 < 4, 2000).otherwise(0)
            + F.col("event_id") % 7
        ).alias("iy"),
        (
            (F.col("user_id") % 300) * 1000
            + F.when(F.col("event_id") % 13 < 4, 2000).otherwise(0)
            + F.col("event_id") % 5
        ).alias("ix"),
    )
    w = Window.partitionBy("user_id").orderBy("t_ms", "event_id")
    legs = pts.select(
        "user_id",
        F.row_number().over(w).alias("seq"),
        F.lag("ix").over(w).alias("x0"),
        F.lag("iy").over(w).alias("y0"),
        (F.col("ix") - F.lag("ix").over(w)).alias("dx"),
        (F.col("iy") - F.lag("iy").over(w)).alias("dy"),
    ).filter(F.col("dx").isNotNull())
    seg = legs.select(
        "user_id",
        "seq",
        "x0",
        "y0",
        "dx",
        "dy",
        F.floor(
            F.sqrt((F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy")).cast("double"))
            / _LD_STEP
        )
        .cast("long")
        .alias("n_ins"),
    ).filter(F.col("n_ins") > 0)
    t = F.col("i").cast("double") / (F.col("n_ins") + 1)
    return seg.select(
        "user_id",
        "seq",
        F.explode(F.sequence(F.lit(1), F.col("n_ins"))).alias("i"),
        "x0",
        "y0",
        "dx",
        "dy",
        "n_ins",
    ).select(
        "user_id",
        "seq",
        F.col("i").cast("long").alias("i"),
        F.round(F.col("x0") + t * F.col("dx"), 6).alias("xi"),
        F.round(F.col("y0") + t * F.col("dy"), 6).alias("yi"),
    )


# Tissot distortion of the sinusoidal projection ------------------------------


@register(
    "tissot_sinusoidal",
    f"""
    WITH la AS (SELECT CAST(unnest(generate_series(-60, 60, 10)) AS DOUBLE) AS latd),
    lo AS (SELECT CAST(unnest(generate_series(-170, 170, 20)) AS DOUBLE) AS lond),
    g AS (
      SELECT latd, lond,
             latd * {_SOLAR_PI!r} / 180.0 AS ph,
             lond * {_SOLAR_PI!r} / 180.0 AS lm
      FROM la CROSS JOIN lo
    ),
    m AS (
      SELECT latd, lond,
             lm * lm * sin(ph) * sin(ph) + 2.0 AS tr,
             1.0 AS det
      FROM g
    ),
    e AS (
      SELECT latd, lond,
             sqrt((tr + sqrt(tr * tr - 4.0 * det)) / 2.0) AS a,
             sqrt((tr - sqrt(tr * tr - 4.0 * det)) / 2.0) AS b
      FROM m
    )
    SELECT CAST(latd AS BIGINT) AS lat, CAST(lond AS BIGINT) AS lon,
           round(a, 6) AS a, round(b, 6) AS b,
           round(a * b, 6) AS area_scale,
           round(2.0 * asin((a - b) / (a + b)) * 180.0 / {_SOLAR_PI!r}, 6)
             AS omega_deg
    FROM e
    """,
    doc=(
        "Tissot indicatrix of the sinusoidal projection used by the "
        "MCD12Q1 land-cover tile join (reference: sinusoidal "
        "forward/inverse in src/FILDA2/FILDA_Time_Cord.py tile math): "
        "semi-axes from the eigenvalues of the Jacobian in the "
        "orthonormal spherical frame (parallel column scaled by 1/cos "
        "lat) on a 13x18 graticule, area_scale == 1 confirms the "
        "equal-area property, "
        "omega is the max angular deformation"
    ),
)
def tissot_sinusoidal(spark, sf_dir):
    """A generated 234-point graticule (two sequence() ranges
    cross-joined — constant size, no table scan) with the closed-form
    eigenvalue algebra of the projection Jacobian; structure-identical
    float expressions on both engines. The sf_dir argument is unused —
    the indicatrix is a property of the projection, not the data."""
    la = spark.range(-6, 7).select((F.col("id") * 10).cast("double").alias("latd"))
    lo = spark.range(-17, 18, 2).select((F.col("id") * 10).cast("double").alias("lond"))
    pi = _SOLAR_PI
    g = la.crossJoin(lo).select(
        "latd",
        "lond",
        (F.col("latd") * pi / 180.0).alias("ph"),
        (F.col("lond") * pi / 180.0).alias("lm"),
    )
    m = g.select(
        "latd",
        "lond",
        (
            F.col("lm") * F.col("lm") * F.sin(F.col("ph")) * F.sin(F.col("ph"))
            + 2.0
        ).alias("tr"),
        F.lit(1.0).alias("det"),
    )
    e = m.select(
        "latd",
        "lond",
        F.sqrt((F.col("tr") + F.sqrt(F.col("tr") * F.col("tr") - 4.0 * F.col("det"))) / 2.0).alias("a"),
        F.sqrt((F.col("tr") - F.sqrt(F.col("tr") * F.col("tr") - 4.0 * F.col("det"))) / 2.0).alias("b"),
    )
    return e.select(
        F.col("latd").cast("long").alias("lat"),
        F.col("lond").cast("long").alias("lon"),
        F.round("a", 6).alias("a"),
        F.round("b", 6).alias("b"),
        F.round(F.col("a") * F.col("b"), 6).alias("area_scale"),
        F.round(
            2.0 * F.asin((F.col("a") - F.col("b")) / (F.col("a") + F.col("b")))
            * 180.0
            / pi,
            6,
        ).alias("omega_deg"),
    )


# Catmull-Rom trajectory smoothing --------------------------------------------


@register(
    "catmull_rom_smooth",
    """
    WITH pts AS (
      SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS t_ms, event_id,
             (user_id % 120) * 1000
               + CASE WHEN event_id % 13 < 4 THEN 2000 ELSE 0 END
               + event_id % 7 AS iy,
             (user_id % 300) * 1000
               + CASE WHEN event_id % 13 < 4 THEN 2000 ELSE 0 END
               + event_id % 5 AS ix
      FROM events
    ),
    q AS (
      SELECT user_id,
             row_number() OVER w AS seq,
             lag(ix, 1) OVER w AS x0, lag(iy, 1) OVER w AS y0,
             ix AS x1, iy AS y1,
             lead(ix, 1) OVER w AS x2, lead(iy, 1) OVER w AS y2,
             lead(ix, 2) OVER w AS x3, lead(iy, 2) OVER w AS y3
      FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY t_ms, event_id)
    )
    SELECT user_id, seq,
           round(0.0625 * (-CAST(x0 AS DOUBLE) + 9.0 * x1 + 9.0 * x2 - x3), 6)
             AS xs,
           round(0.0625 * (-CAST(y0 AS DOUBLE) + 9.0 * y1 + 9.0 * y2 - y3), 6)
             AS ys
    FROM q WHERE x0 IS NOT NULL AND x3 IS NOT NULL
    """,
    doc=(
        "Catmull-Rom spline midpoints over each interior trajectory "
        "segment (t = 0.5: (-p0 + 9 p1 + 9 p2 - p3)/16) — C1-continuous "
        "track smoothing/upsampling beside track_simplify (which removes "
        "vertices) and line_densify (which inserts linear ones)"
    ),
)
def catmull_rom_smooth(spark, sf_dir):
    """One per-user sort window supplies the 4-point stencil via
    lag/lead in a single pass; the spline midpoint is a fixed-order
    polynomial on exact integer coordinates (0.0625 and 9 are exact in
    binary, so the only rounding is the final 6-dp display round —
    bit-identical everywhere)."""
    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
        "event_id",
        (
            (F.col("user_id") % 120) * 1000
            + F.when(F.col("event_id") % 13 < 4, 2000).otherwise(0)
            + F.col("event_id") % 7
        ).alias("iy"),
        (
            (F.col("user_id") % 300) * 1000
            + F.when(F.col("event_id") % 13 < 4, 2000).otherwise(0)
            + F.col("event_id") % 5
        ).alias("ix"),
    )
    w = Window.partitionBy("user_id").orderBy("t_ms", "event_id")
    q = pts.select(
        "user_id",
        F.row_number().over(w).alias("seq"),
        F.lag("ix", 1).over(w).alias("x0"),
        F.lag("iy", 1).over(w).alias("y0"),
        F.col("ix").alias("x1"),
        F.col("iy").alias("y1"),
        F.lead("ix", 1).over(w).alias("x2"),
        F.lead("iy", 1).over(w).alias("y2"),
        F.lead("ix", 2).over(w).alias("x3"),
        F.lead("iy", 2).over(w).alias("y3"),
    ).filter(F.col("x0").isNotNull() & F.col("x3").isNotNull())
    return q.select(
        "user_id",
        "seq",
        F.round(
            0.0625
            * (
                -F.col("x0").cast("double")
                + 9.0 * F.col("x1")
                + 9.0 * F.col("x2")
                - F.col("x3")
            ),
            6,
        ).alias("xs"),
        F.round(
            0.0625
            * (
                -F.col("y0").cast("double")
                + 9.0 * F.col("y1")
                + 9.0 * F.col("y2")
                - F.col("y3")
            ),
            6,
        ).alias("ys"),
    )


# ROC curve points ------------------------------------------------------------

_ROC_STEP = 5000  # threshold spacing in cents
_ROC_K = 20


@register(
    "roc_points",
    f"""
    WITH s AS (
      SELECT greatest(CAST(round(value * 100, 0) AS BIGINT), 0) AS sc,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events WHERE value IS NOT NULL
    ),
    b AS (
      SELECT sc // {_ROC_STEP} AS bkt,
             CAST(sum(pos) AS BIGINT) AS np,
             CAST(sum(1 - pos) AS BIGINT) AS nn
      FROM s GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(np) AS BIGINT) AS p, CAST(sum(nn) AS BIGINT) AS n FROM b),
    th AS (SELECT CAST(unnest(generate_series(0, {_ROC_K - 1})) AS BIGINT) AS j),
    cm AS (
      SELECT th.j AS j,
             CAST(COALESCE(sum(CASE WHEN b.bkt >= th.j THEN b.np END), 0) AS BIGINT) AS tp,
             CAST(COALESCE(sum(CASE WHEN b.bkt >= th.j THEN b.nn END), 0) AS BIGINT) AS fp
      FROM th CROSS JOIN b GROUP BY th.j
    )
    SELECT j * {_ROC_STEP} AS threshold, tp, fp,
           round(CAST(tp AS DOUBLE) / p, 6) AS tpr,
           round(CAST(fp AS DOUBLE) / n, 6) AS fpr
    FROM cm, tot ORDER BY threshold
    """,
    doc=(
        f"ROC operating points at {_ROC_K} fixed thresholds (every "
        f"{_ROC_STEP} cents) scoring value against the purchase label: "
        "the curve behind auc_mannwhitney's scalar — exact integer "
        "tp/fp from a bucketed cumulative histogram, never a per-"
        "threshold scan"
    ),
)
def roc_points(spark, sf_dir):
    """One partial-agg groupBy onto the score-bucket histogram (O(score "
    "domain / step) rows), then a constant {K} x buckets broadcast join
    builds every operating point from the same tiny frame. At any corpus
    size the only data-proportional work is the first groupBy."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = ev.select(
        F.greatest(F.round(F.col("value") * 100, 0).cast("long"), F.lit(0)).alias(
            "sc"
        ),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    b = s.groupBy((F.col("sc") / _ROC_STEP).cast("long").alias("bkt")).agg(
        F.sum("pos").cast("long").alias("np"),
        F.sum(1 - F.col("pos")).cast("long").alias("nn"),
    )
    b = _persist_evict(b)
    tot = b.agg(
        F.sum("np").cast("long").alias("p"), F.sum("nn").cast("long").alias("n")
    )
    th = spark.range(0, _ROC_K).select(F.col("id").cast("long").alias("j"))
    cm = (
        th.crossJoin(F.broadcast(b))
        .groupBy("j")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("bkt") >= F.col("j"), F.col("np"))), F.lit(0)
            )
            .cast("long")
            .alias("tp"),
            F.coalesce(
                F.sum(F.when(F.col("bkt") >= F.col("j"), F.col("nn"))), F.lit(0)
            )
            .cast("long")
            .alias("fp"),
        )
    )
    return cm.crossJoin(F.broadcast(tot)).select(
        (F.col("j") * _ROC_STEP).alias("threshold"),
        "tp",
        "fp",
        F.round(F.col("tp").cast("double") / F.col("p"), 6).alias("tpr"),
        F.round(F.col("fp").cast("double") / F.col("n"), 6).alias("fpr"),
    )


# Gains / lift table -----------------------------------------------------------


@register(
    "lift_deciles",
    """
    WITH s AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS sc, event_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events WHERE value IS NOT NULL
    ),
    d AS (
      SELECT pos, ntile(10) OVER (ORDER BY sc DESC, event_id) AS decile
      FROM s
    ),
    g AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pos) AS BIGINT) AS n_pos
      FROM d GROUP BY decile
    ),
    c AS (
      SELECT decile, n, n_pos,
             sum(n) OVER w AS cum_n, sum(n_pos) OVER w AS cum_pos,
             sum(n) OVER () AS tot_n, sum(n_pos) OVER () AS tot_pos
      FROM g
      WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    )
    SELECT decile, n, n_pos,
           round(CAST(n_pos AS DOUBLE) / n, 6) AS rate,
           round((CAST(cum_pos AS DOUBLE) / cum_n)
                 / (CAST(tot_pos AS DOUBLE) / tot_n), 6) AS cum_lift
    FROM c ORDER BY decile
    """,
    doc=(
        "gains/lift table: score-ranked deciles (value cents, event_id "
        "tie-break so the ntile cut is total-order deterministic) vs the "
        "purchase response — per-decile response rate and cumulative "
        "lift, the campaign-targeting evaluation classic"
    ),
)
def lift_deciles(spark, sf_dir):
    """The only full-data pass is the ntile sort (one global window —
    the documented single-task seam shared with kruskal's rank frame; a
    two-pass range-partitioned ntile is the 100 TB path); everything
    after runs on the 10-row decile frame with ordered-prefix windows,
    exact integers into two final divisions."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = ev.select(
        F.round(F.col("value") * 100, 0).cast("long").alias("sc"),
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    d = s.select(
        "pos",
        F.ntile(10).over(Window.orderBy(F.col("sc").desc(), "event_id")).alias(
            "decile"
        ),
    )
    g = d.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pos").cast("long").alias("n_pos"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wt = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = g.select(
        "decile",
        "n",
        "n_pos",
        F.sum("n").over(wc).alias("cum_n"),
        F.sum("n_pos").over(wc).alias("cum_pos"),
        F.sum("n").over(wt).alias("tot_n"),
        F.sum("n_pos").over(wt).alias("tot_pos"),
    )
    return c.select(
        "decile",
        "n",
        "n_pos",
        F.round(F.col("n_pos").cast("double") / F.col("n"), 6).alias("rate"),
        F.round(
            (F.col("cum_pos").cast("double") / F.col("cum_n"))
            / (F.col("tot_pos").cast("double") / F.col("tot_n")),
            6,
        ).alias("cum_lift"),
    )


# NDCG@k of a hash ranking -----------------------------------------------------

_NDCG_K = 20
_NDCG_LN2 = 0.6931471805599453  # literal ln(2) shared by both engines


@register(
    "ndcg_at_k",
    f"""
    WITH d AS (
      SELECT doc_id,
             {_MD5_60.format(key="doc_id")} AS h,
             least(3, n_chars // 150) AS rel
      FROM documents
    ),
    rk AS (
      SELECT rel, row_number() OVER (ORDER BY h DESC, doc_id) AS i FROM d
    ),
    ideal AS (
      SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS i FROM d
    ),
    dcg AS (
      SELECT CAST(sum(CAST(round((pow(2.0, rel) - 1.0)
                   / (ln(CAST(i AS DOUBLE) + 1.0) / {_NDCG_LN2!r})
                   * 1000000000000.0) AS BIGINT)) AS BIGINT) AS s
      FROM rk WHERE i <= {_NDCG_K}
    ),
    idcg AS (
      SELECT CAST(sum(CAST(round((pow(2.0, rel) - 1.0)
                   / (ln(CAST(i AS DOUBLE) + 1.0) / {_NDCG_LN2!r})
                   * 1000000000000.0) AS BIGINT)) AS BIGINT) AS s
      FROM ideal WHERE i <= {_NDCG_K}
    )
    SELECT CAST({_NDCG_K} AS BIGINT) AS k,
           round(CAST(dcg.s AS DOUBLE) / 1000000000000.0, 6) AS dcg,
           round(CAST(idcg.s AS DOUBLE) / 1000000000000.0, 6) AS idcg,
           round(CAST(dcg.s AS DOUBLE) / idcg.s, 6) AS ndcg
    FROM dcg, idcg
    """,
    doc=(
        f"NDCG@{_NDCG_K} of the md5-hash document ranking against "
        "n_chars-graded relevance (0-3, 150-char steps): the ranking-quality metric with "
        "exact fixed-point (1e-12) per-position gains so the DCG sums "
        "are order-independent integers; the hash ranking is the "
        "deterministic null model (expected NDCG of an uninformed "
        "ranker)"
    ),
)
def ndcg_at_k(spark, sf_dir):
    """Two global top-k windows (WindowGroupLimit prunes the sort to the
    k heads), each folding its fixed-point position gains into an exact
    integer sum; the discount uses a literal ln(2) so the only engine
    transcendental is ln(i+1) on {K} small integers — identical IEEE
    inputs on both sides."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        _h60("doc_id").alias("h"),
        F.least(F.lit(3), (F.col("n_chars") / 150).cast("long")).alias("rel"),
    )
    d = _persist_evict(d)
    term = F.round(
        (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
        / (F.log(F.col("i").cast("double") + 1.0) / _NDCG_LN2)
        * 1000000000000.0
    ).cast("long")
    rk = d.select(
        "rel", F.row_number().over(Window.orderBy(F.col("h").desc(), "doc_id")).alias("i")
    ).filter(F.col("i") <= _NDCG_K)
    ideal = d.select(
        "rel",
        F.row_number().over(Window.orderBy(F.col("rel").desc(), "doc_id")).alias("i"),
    ).filter(F.col("i") <= _NDCG_K)
    dcg = rk.agg(F.sum(term).cast("long").alias("s"))
    idcg = ideal.agg(F.sum(term).cast("long").alias("s2"))
    return dcg.crossJoin(F.broadcast(idcg)).select(
        F.lit(_NDCG_K).cast("long").alias("k"),
        F.round(F.col("s").cast("double") / 1000000000000.0, 6).alias("dcg"),
        F.round(F.col("s2").cast("double") / 1000000000000.0, 6).alias("idcg"),
        F.round(F.col("s").cast("double") / F.col("s2"), 6).alias("ndcg"),
    )


# Per-class F1 of the language-ID heuristic ------------------------------------


def _langid_f1_oracle_sql() -> str:
    from filda_spark.functions import text as _TX

    return f"""
    WITH pred AS (
      SELECT lang AS lang_true,
             {_TX.lang_id_sql("' ' || text || ' '")} AS lang_pred
      FROM documents
    ),
    cm AS (
      SELECT lang_true, lang_pred, CAST(count(*) AS BIGINT) AS n
      FROM pred GROUP BY 1, 2
    ),
    cls AS (
      SELECT lang_true AS lang FROM cm
      UNION SELECT lang_pred FROM cm
    ),
    m AS (
      SELECT cls.lang AS lang,
             CAST(COALESCE((SELECT sum(n) FROM cm
               WHERE lang_true = cls.lang AND lang_pred = cls.lang), 0) AS BIGINT) AS tp,
             CAST(COALESCE((SELECT sum(n) FROM cm
               WHERE lang_pred = cls.lang AND lang_true <> cls.lang), 0) AS BIGINT) AS fp,
             CAST(COALESCE((SELECT sum(n) FROM cm
               WHERE lang_true = cls.lang AND lang_pred <> cls.lang), 0) AS BIGINT) AS fn
      FROM cls
    )
    SELECT lang, tp, fp, fn,
           round(CASE WHEN tp + fp > 0
                      THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 0.0 END, 6)
             AS precision_c,
           round(CASE WHEN tp + fn > 0
                      THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 0.0 END, 6)
             AS recall_c,
           round(CASE WHEN 2 * tp + fp + fn > 0
                      THEN 2.0 * tp / (2 * tp + fp + fn) ELSE 0.0 END, 6) AS f1
    FROM m
    """


@register(
    "langid_f1",
    _langid_f1_oracle_sql(),
    doc=(
        "per-class precision/recall/F1 of the n-gram language-ID "
        "heuristic against the labeled lang column — the scalar "
        "class-quality summary over langid_confusion's matrix (F1 via "
        "the division-robust 2tp/(2tp+fp+fn) identity, exact integers "
        "until three final divisions)"
    ),
)
def langid_f1(spark, sf_dir):
    """Map-side prediction (same JVM column algebra as text_analysis /
    langid_confusion), one partial-agg to the O(langs^2) matrix, then
    tp/fp/fn as three conditional rollups of that tiny frame — the class
    universe is the union of true and predicted labels so a class the
    model never predicts still reports recall 0."""
    from filda_spark.functions import text as TX

    d = _t(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    pred = d.select(
        F.col("lang").alias("lang_true"), TX.lang_id(padded).alias("lang_pred")
    )
    cm = _persist_evict(
        pred.groupBy("lang_true", "lang_pred").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
    )
    cls = (
        cm.select(F.col("lang_true").alias("lang"))
        .union(cm.select(F.col("lang_pred").alias("lang")))
        .distinct()
    )
    tp = cm.filter(F.col("lang_true") == F.col("lang_pred")).select(
        F.col("lang_true").alias("lang"), F.col("n").alias("tp0")
    )
    fp = (
        cm.filter(F.col("lang_true") != F.col("lang_pred"))
        .groupBy(F.col("lang_pred").alias("lang"))
        .agg(F.sum("n").alias("fp0"))
    )
    fn = (
        cm.filter(F.col("lang_true") != F.col("lang_pred"))
        .groupBy(F.col("lang_true").alias("lang"))
        .agg(F.sum("n").alias("fn0"))
    )
    m = (
        cls.join(F.broadcast(tp), "lang", "left")
        .join(F.broadcast(fp), "lang", "left")
        .join(F.broadcast(fn), "lang", "left")
        .select(
            "lang",
            F.coalesce("tp0", F.lit(0)).cast("long").alias("tp"),
            F.coalesce("fp0", F.lit(0)).cast("long").alias("fp"),
            F.coalesce("fn0", F.lit(0)).cast("long").alias("fn"),
        )
    )
    tpc, fpc, fnc = F.col("tp"), F.col("fp"), F.col("fn")
    return m.select(
        "lang",
        "tp",
        "fp",
        "fn",
        F.round(
            F.when(tpc + fpc > 0, tpc.cast("double") / (tpc + fpc)).otherwise(0.0), 6
        ).alias("precision_c"),
        F.round(
            F.when(tpc + fnc > 0, tpc.cast("double") / (tpc + fnc)).otherwise(0.0), 6
        ).alias("recall_c"),
        F.round(
            F.when(2 * tpc + fpc + fnc > 0, 2.0 * tpc / (2 * tpc + fpc + fnc)).otherwise(
                0.0
            ),
            6,
        ).alias("f1"),
    )


# Cohen's d / Hedges' g effect size -------------------------------------------


@register(
    "cohens_d",
    """
    WITH s AS (
      SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS v
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
    ),
    m AS (
      SELECT
        CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
        CAST(sum(CASE WHEN event_type = 'click' THEN v ELSE 0 END) AS HUGEINT) AS s1,
        sum(CASE WHEN event_type = 'click' THEN CAST(v AS HUGEINT) * v ELSE 0 END) AS q1,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS HUGEINT) AS n2,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN v ELSE 0 END) AS HUGEINT) AS s2,
        sum(CASE WHEN event_type = 'purchase' THEN CAST(v AS HUGEINT) * v ELSE 0 END) AS q2
      FROM s
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                  - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                 / sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / CAST(n1 AS DOUBLE))
                         + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / CAST(n2 AS DOUBLE)))
                        / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0)), 6) AS d,
           round(((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                  - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                 / sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / CAST(n1 AS DOUBLE))
                         + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / CAST(n2 AS DOUBLE)))
                        / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0)))
                 * (1.0 - 3.0 / (4.0 * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) - 9.0)),
                 6) AS hedges_g
    FROM m
    """,
    doc=(
        "Cohen's d standardized mean difference (click vs purchase "
        "values, pooled SD) with the Hedges' g small-sample correction — "
        "the effect-size companion to ab_test_ztest's significance: "
        "exact integer moments in one pass, closed-form floats at the "
        "end"
    ),
)
def cohens_d(spark, sf_dir):
    """Single partial-agg pass with six conditional exact moments
    (decimal(38,0)), then a fixed-structure float expression — the
    ab_test_ztest shape with a pooled-variance denominator."""
    d38 = "decimal(38,0)"
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isin("click", "purchase")
    )
    v = F.round(F.col("value") * 100, 0).cast("long")
    s = ev.select("event_type", v.alias("v"))
    is1 = F.col("event_type") == "click"
    is2 = F.col("event_type") == "purchase"
    m = s.agg(
        F.sum(F.when(is1, 1).otherwise(0)).cast(d38).alias("n1"),
        F.sum(F.when(is1, F.col("v")).otherwise(0)).cast(d38).alias("s1"),
        F.sum(F.when(is1, F.col("v").cast(d38) * F.col("v")).otherwise(0)).alias("q1"),
        F.sum(F.when(is2, 1).otherwise(0)).cast(d38).alias("n2"),
        F.sum(F.when(is2, F.col("v")).otherwise(0)).cast(d38).alias("s2"),
        F.sum(F.when(is2, F.col("v").cast(d38) * F.col("v")).otherwise(0)).alias("q2"),
    )
    n1d, s1d, q1d = (F.col(c).cast("double") for c in ("n1", "s1", "q1"))
    n2d, s2d, q2d = (F.col(c).cast("double") for c in ("n2", "s2", "q2"))
    dd = (s1d / n1d - s2d / n2d) / F.sqrt(
        ((q1d - s1d * F.col("s1") / n1d) + (q2d - s2d * F.col("s2") / n2d))
        / (n1d + n2d - 2.0)
    )
    return m.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round(dd, 6).alias("d"),
        F.round(dd * (1.0 - 3.0 / (4.0 * (n1d + n2d) - 9.0)), 6).alias("hedges_g"),
    )


# Linear multi-touch attribution ----------------------------------------------

_ATT_WINDOW_MS = 7 * 86400000


@register(
    "attribution_linear",
    f"""
    WITH e AS (
      SELECT user_id, event_id, event_type,
             epoch_ms(CAST(ts AS TIMESTAMP)) AS t_ms
      FROM events
    ),
    conv AS (
      SELECT user_id, event_id AS pid, t_ms AS tp FROM e
      WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT user_id, event_type, t_ms AS tt FROM e
      WHERE event_type IN ('click', 'view')
    ),
    pair AS (
      SELECT conv.pid, touch.event_type
      FROM conv JOIN touch ON touch.user_id = conv.user_id
       AND touch.tt < conv.tp AND touch.tt >= conv.tp - {_ATT_WINDOW_MS}
    ),
    sized AS (
      SELECT pid, event_type,
             CAST(count(*) OVER (PARTITION BY pid) AS BIGINT) AS n_t
      FROM pair
    )
    SELECT event_type AS channel,
           CAST(count(DISTINCT pid) AS BIGINT) AS n_conversions,
           round(CAST(sum(CAST(round(1000000000000.0 / n_t) AS BIGINT)) AS DOUBLE)
                 / 1000000000000.0, 6) AS credit
    FROM sized GROUP BY event_type
    """,
    doc=(
        "linear multi-touch attribution: every purchase splits one unit "
        "of credit equally across the user's click/view touches in the "
        "prior 7 days; per-channel credited conversions — fixed-point "
        "1e-12 credit shares so the cross-touch sum is an exact integer"
    ),
)
def attribution_linear(spark, sf_dir):
    """Conversion-touch pairing is an equi-join on user with a time-range
    refine (both sides pre-filtered projections of one scan); the
    touch-count is a window on the pair key and the credit fold is an
    exact integer sum. At 100 TB the user equi-join is the only shuffle
    and the 7-day predicate bounds the fan-out per conversion."""
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
    )
    conv = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pid"), F.col("t_ms").alias("tp")
    )
    touch = e.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", "event_type", F.col("t_ms").alias("tt")
    )
    pair = conv.join(touch, "user_id").filter(
        (F.col("tt") < F.col("tp"))
        & (F.col("tt") >= F.col("tp") - _ATT_WINDOW_MS)
    )
    sized = pair.select(
        "pid",
        "event_type",
        F.count(F.lit(1)).over(Window.partitionBy("pid")).cast("long").alias("n_t"),
    )
    return sized.groupBy(F.col("event_type").alias("channel")).agg(
        F.countDistinct("pid").cast("long").alias("n_conversions"),
        F.round(
            F.sum(F.round(F.lit(1000000000000.0) / F.col("n_t")).cast("long"))
            .cast("double")
            / 1000000000000.0,
            6,
        ).alias("credit"),
    )


# RFM segmentation -------------------------------------------------------------


@register(
    "rfm_scores",
    """
    WITH p AS (
      SELECT user_id,
             max(epoch_ms(CAST(ts AS TIMESTAMP))) AS last_ms,
             CAST(count(*) AS BIGINT) AS n_purch,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
      GROUP BY user_id
    )
    SELECT user_id, last_ms, n_purch, monetary_cents,
           CAST(ntile(5) OVER (ORDER BY last_ms, user_id) AS BIGINT) AS r_score,
           CAST(ntile(5) OVER (ORDER BY n_purch, user_id) AS BIGINT) AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary_cents, user_id) AS BIGINT)
             AS m_score,
           CAST(100 * ntile(5) OVER (ORDER BY last_ms, user_id)
                + 10 * ntile(5) OVER (ORDER BY n_purch, user_id)
                + ntile(5) OVER (ORDER BY monetary_cents, user_id) AS BIGINT)
             AS rfm
    FROM p
    """,
    doc=(
        "RFM customer segmentation: recency/frequency/monetary quintiles "
        "(ntile over total orders with user_id tie-breaks, so every cut "
        "is deterministic) composed into the classic 3-digit RFM code — "
        "exact integers throughout"
    ),
)
def rfm_scores(spark, sf_dir):
    """One partial-agg rollup to the per-user purchase summary (O(users)
    rows), then three ntile windows over that small frame — the full
    event stream is scanned once and never sorted."""
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    p = ev.groupBy("user_id").agg(
        F.max(F.unix_millis(F.col("ts").cast("timestamp"))).alias("last_ms"),
        F.count(F.lit(1)).cast("long").alias("n_purch"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long"))
        .cast("long")
        .alias("monetary_cents"),
    )
    r = F.ntile(5).over(Window.orderBy("last_ms", "user_id"))
    f = F.ntile(5).over(Window.orderBy("n_purch", "user_id"))
    m = F.ntile(5).over(Window.orderBy("monetary_cents", "user_id"))
    return p.select(
        "user_id",
        "last_ms",
        "n_purch",
        "monetary_cents",
        r.cast("long").alias("r_score"),
        f.cast("long").alias("f_score"),
        m.cast("long").alias("m_score"),
        (100 * r + 10 * f + m).cast("long").alias("rfm"),
    )


# Page-Hinkley drift detector --------------------------------------------------

_PH_DELTA = 50.0  # drift slack, cents
_PH_LAMBDA = 2000.0  # alarm threshold, cents


@register(
    "page_hinkley",
    f"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    x AS (
      SELECT day, CAST(s AS DOUBLE) / c AS xt,
             CAST(sum(s) OVER w AS DOUBLE) / sum(c) OVER w AS runmean
      FROM d WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW)
    ),
    m AS (
      SELECT day, xt,
             sum(xt - runmean - {_PH_DELTA!r}) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mt
      FROM x
    )
    SELECT day, round(xt, 6) AS xt, round(mt, 6) AS mt,
           round(mt - min(mt) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW), 6) AS ph,
           CAST(mt - min(mt) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) > {_PH_LAMBDA!r} AS INT) AS alarm
    FROM m ORDER BY day
    """,
    doc=(
        "Page-Hinkley upward-drift detector over the daily mean value "
        "series: PH_t = m_t - min m_i with m_t the cumulative "
        "(x - runmean - delta) deviation — the sequential changepoint "
        "monitor beside cusum_changepoint's fixed-reference two-sided "
        "charts; day means are exact rationals, prefix sums are "
        "order-pinned by the day ordering"
    ),
)
def page_hinkley(spark, sf_dir):
    """One partial-agg rollup to the O(days) frame, then three stacked
    ordered windows (running mean, cumulative deviation, running min) —
    sequential by construction, so the float accumulation order is
    identical on both engines."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    x = d.select(
        "day",
        (F.col("s").cast("double") / F.col("c")).alias("xt"),
        (F.sum("s").over(w).cast("double") / F.sum("c").over(w)).alias("runmean"),
    )
    m = x.select(
        "day",
        "xt",
        F.sum(F.col("xt") - F.col("runmean") - _PH_DELTA).over(w).alias("mt"),
    )
    ph = F.col("mt") - F.min("mt").over(w)
    return m.select(
        "day",
        F.round("xt", 6).alias("xt"),
        F.round("mt", 6).alias("mt"),
        F.round(ph, 6).alias("ph"),
        (ph > _PH_LAMBDA).cast("int").alias("alarm"),
    )


# Association rules (confidence / lift) ----------------------------------------

_AR_TOP = 25


@register(
    "apriori_rules",
    f"""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey % 200 AS item FROM lineitem
    ),
    nb AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n FROM op),
    m AS (SELECT item, CAST(count(*) AS BIGINT) AS c FROM op GROUP BY item),
    pr AS (
      SELECT a.item AS i1, b.item AS i2, CAST(count(*) AS BIGINT) AS c_ab
      FROM op a JOIN op b ON a.o = b.o AND a.item < b.item
      GROUP BY 1, 2
    ),
    top AS (
      SELECT i1, i2, c_ab FROM pr ORDER BY c_ab DESC, i1, i2 LIMIT {_AR_TOP}
    )
    SELECT top.i1 AS i1, top.i2 AS i2, top.c_ab AS c_ab,
           m1.c AS c1, m2.c AS c2,
           round(CAST(top.c_ab AS DOUBLE) / m1.c, 6) AS conf_12,
           round(CAST(top.c_ab AS DOUBLE) / m2.c, 6) AS conf_21,
           round(CAST(top.c_ab AS DOUBLE) * n / (m1.c * m2.c), 6) AS lift,
           round(CAST(top.c_ab AS DOUBLE) / n
                 - CAST(m1.c AS DOUBLE) * m2.c / n / n, 6) AS leverage
    FROM top JOIN m m1 ON m1.item = top.i1
             JOIN m m2 ON m2.item = top.i2
             CROSS JOIN nb
    """,
    doc=(
        f"association rules for the top-{_AR_TOP} basket pairs (support-"
        "ordered, deterministic tie-break): bidirectional confidence, "
        "lift and leverage — the rule-quality layer over "
        "item_cooccurrence's cosine/jaccard similarity view"
    ),
)
def apriori_rules(spark, sf_dir):
    """Same basket/pair frames as item_cooccurrence (distinct ->
    self-equi-join on the order key -> pair groupBy); the deterministic
    integer top-k cut happens before the metric joins, so the marginal
    and total frames are probed by {TOP} rows in broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    op = _persist_evict(
        li.select(
            F.col("l_orderkey").alias("o"), (F.col("l_partkey") % 200).alias("item")
        ).distinct()
    )
    nb = op.agg(F.countDistinct("o").cast("long").alias("n"))
    m = op.groupBy("item").agg(F.count(F.lit(1)).cast("long").alias("c"))
    a = op.select(F.col("o"), F.col("item").alias("i1"))
    b = op.select(F.col("o"), F.col("item").alias("i2"))
    pr = (
        a.join(b, "o")
        .filter(F.col("i1") < F.col("i2"))
        .groupBy("i1", "i2")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
    )
    wtop = Window.orderBy(F.col("c_ab").desc(), "i1", "i2")
    top = (
        pr.select("i1", "i2", "c_ab", F.row_number().over(wtop).alias("rk"))
        .filter(F.col("rk") <= _AR_TOP)
        .drop("rk")
    )
    m1 = m.select(F.col("item").alias("i1"), F.col("c").alias("c1"))
    m2 = m.select(F.col("item").alias("i2"), F.col("c").alias("c2"))
    return (
        top.join(F.broadcast(m1), "i1")
        .join(F.broadcast(m2), "i2")
        .crossJoin(F.broadcast(nb))
        .select(
            "i1",
            "i2",
            "c_ab",
            "c1",
            "c2",
            F.round(F.col("c_ab").cast("double") / F.col("c1"), 6).alias("conf_12"),
            F.round(F.col("c_ab").cast("double") / F.col("c2"), 6).alias("conf_21"),
            F.round(
                F.col("c_ab").cast("double") * F.col("n")
                / (F.col("c1") * F.col("c2")),
                6,
            ).alias("lift"),
            F.round(
                F.col("c_ab").cast("double") / F.col("n")
                - F.col("c1").cast("double") * F.col("c2") / F.col("n") / F.col("n"),
                6,
            ).alias("leverage"),
        )
    )


# Normal Q-Q points (Acklam probit, literal coefficients) ----------------------

# Acklam's central-region rational approximation of the inverse normal CDF
# (public-domain constants); valid for p in [0.02425, 0.97575] — all 19
# probe points are inside. Shared verbatim by both engines.
_QQ_A = (-39.69683028665376, 220.9460984245205, -275.9285104469687,
         138.3577518672690, -30.66479806614716, 2.506628277459239)
_QQ_B = (-54.47609879822406, 161.5858368580409, -155.6989798598866,
         66.80131188771972, -13.28068155288572)
_QQ_N = 20  # probes at j/20, j = 1..19


def _probit_sql(p: str) -> str:
    a, b = _QQ_A, _QQ_B
    q = f"({p} - 0.5)"
    r = f"({q} * {q})"
    num = f"((((({a[0]!r} * {r} + {a[1]!r}) * {r} + {a[2]!r}) * {r} + {a[3]!r}) * {r} + {a[4]!r}) * {r} + {a[5]!r})"
    den = f"((((({b[0]!r} * {r} + {b[1]!r}) * {r} + {b[2]!r}) * {r} + {b[3]!r}) * {r} + {b[4]!r}) * {r} + 1.0)"
    return f"{num} * {q} / {den}"


def _probit_col(p):
    a, b = _QQ_A, _QQ_B
    q = p - 0.5
    r = q * q
    num = ((((F.lit(a[0]) * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]
    den = ((((F.lit(b[0]) * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1.0
    return num * q / den


@register(
    "qq_normal_points",
    f"""
    WITH s AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    c AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY v),
    w AS (
      SELECT v, c,
             COALESCE(sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND 1 PRECEDING), 0) AS below
      FROM c
    ),
    tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(CAST(v AS HUGEINT) * c) AS HUGEINT) AS sv,
             sum(CAST(v AS HUGEINT) * v * c) AS qv
      FROM c
    ),
    pj AS (SELECT CAST(unnest(generate_series(1, {_QQ_N - 1})) AS BIGINT) AS j),
    emp AS (
      SELECT pj.j AS j,
             min(CASE WHEN w.below + w.c >=
                 CAST(ceil(pj.j * (SELECT n FROM tot) / {_QQ_N}.0) AS BIGINT)
                 THEN w.v END) AS q_emp
      FROM pj CROSS JOIN w GROUP BY pj.j
    )
    SELECT j, round(j / {_QQ_N}.0, 6) AS p, q_emp,
           round({_probit_sql(f"(j / {_QQ_N}.0)")}, 6) AS z_norm,
           round((q_emp * CAST(n AS DOUBLE) - CAST(sv AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(qv AS DOUBLE)
                         - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
                        / (CAST(n AS DOUBLE) - 1.0) * CAST(n AS DOUBLE)), 6)
             AS z_emp
    FROM emp, tot ORDER BY j
    """,
    doc=(
        "normal Q-Q probe points: exact type-1 empirical quantiles at "
        "j/20 (distinct-cents order statistics) against the Acklam "
        "rational-polynomial probit (literal public-domain coefficients, "
        "no engine erfinv) plus the standardized empirical z — the "
        "normality diagnostic behind ks_test's decision"
    ),
)
def qq_normal_points(spark, sf_dir):
    """Order statistics come from the distinct-cents prefix frame (never
    a row sort); the probit is pure literal-coefficient polynomial
    algebra, identical on both engines; the standardization uses exact
    integer moments. The 19-probe join is a broadcast against the
    O(distinct cents) frame."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d38 = "decimal(38,0)"
    s = ev.select(F.round(F.col("value") * 100, 0).cast("long").alias("v"))
    c = _persist_evict(s.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("c")))
    wb = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    w = c.select(
        "v", "c", F.coalesce(F.sum("c").over(wb), F.lit(0)).alias("below")
    )
    tot = c.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("v").cast(d38) * F.col("c")).alias("sv"),
        F.sum(F.col("v").cast(d38) * F.col("v") * F.col("c")).alias("qv"),
    )
    pj = spark.range(1, _QQ_N).select(F.col("id").cast("long").alias("j"))
    emp = (
        pj.crossJoin(F.broadcast(tot))
        .crossJoin(w)
        .groupBy("j", "n", "sv", "qv")
        .agg(
            F.min(
                F.when(
                    F.col("below") + F.col("c")
                    >= F.ceil(F.col("j") * F.col("n") / float(_QQ_N)).cast("long"),
                    F.col("v"),
                )
            ).alias("q_emp")
        )
    )
    nd = F.col("n").cast("double")
    svd = F.col("sv").cast("double")
    qvd = F.col("qv").cast("double")
    sd_scaled = F.sqrt((nd * qvd - svd * svd) / (nd - 1.0) * nd)
    return emp.select(
        "j",
        F.round(F.col("j") / float(_QQ_N), 6).alias("p"),
        "q_emp",
        F.round(_probit_col(F.col("j") / float(_QQ_N)), 6).alias("z_norm"),
        F.round((F.col("q_emp") * nd - svd) / sd_scaled, 6).alias("z_emp"),
    )


# Trimmed / winsorized mean ----------------------------------------------------

_TRIM_PCT = 5  # percent trimmed from EACH tail


@register(
    "trimmed_mean",
    f"""
    WITH s AS (
      SELECT event_type AS g, CAST(round(value * 100, 0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    c AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY g, v),
    w AS (
      SELECT g, v, c,
             COALESCE(sum(c) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN
               UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
             sum(c) OVER (PARTITION BY g) AS n_g
      FROM c
    ),
    k AS (SELECT g, v, c, below, n_g, n_g * {_TRIM_PCT} // 100 AS lo FROM w),
    agg AS (
      SELECT g, CAST(max(n_g) AS BIGINT) AS n, CAST(max(lo) AS BIGINT) AS lo,
             CAST(sum(greatest(0, least(below + c, n_g - lo)
                               - greatest(below, lo)) * CAST(v AS HUGEINT))
                  AS HUGEINT) AS tsum,
             min(CASE WHEN below + c >= lo + 1 THEN v END) AS v_lo,
             min(CASE WHEN below + c >= n_g - lo THEN v END) AS v_hi
      FROM k GROUP BY g
    )
    SELECT g AS event_type, n, lo AS n_trimmed_each,
           round(CAST(tsum AS DOUBLE) / (n - 2 * lo), 6) AS trimmed_mean,
           round(CAST(tsum + lo * CAST(v_lo AS HUGEINT)
                      + lo * CAST(v_hi AS HUGEINT) AS DOUBLE) / n, 6)
             AS winsorized_mean
    FROM agg
    """,
    doc=(
        f"{_TRIM_PCT}%-per-tail trimmed and winsorized means of value "
        "cents per event type: exact interval-overlap weighting on the "
        "distinct-cents prefix frame (kept mass = overlap of each cent's "
        "rank span with [lo+1, n-lo]), boundary order statistics for the "
        "winsorized tails — robust location without any row sort"
    ),
)
def trimmed_mean(spark, sf_dir):
    """The trim never materializes ranked rows: each distinct cent
    contributes max(0, min(below+c, n-lo) - max(below, lo)) copies to the
    kept sum — pure integer algebra on the (group, cent) frame, one
    partial-agg groupBy to finish. Exact decimals into two divisions."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d38 = "decimal(38,0)"
    s = ev.select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100, 0).cast("long").alias("v"),
    )
    c = s.groupBy("g", "v").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wb = Window.partitionBy("g").orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    wg = Window.partitionBy("g")
    w = c.select(
        "g",
        "v",
        "c",
        F.coalesce(F.sum("c").over(wb), F.lit(0)).alias("below"),
        F.sum("c").over(wg).alias("n_g"),
    ).select(
        "g", "v", "c", "below", "n_g",
        F.expr(f"n_g * {_TRIM_PCT} div 100").alias("lo"),
    )
    kept = F.greatest(
        F.lit(0),
        F.least(F.col("below") + F.col("c"), F.col("n_g") - F.col("lo"))
        - F.greatest(F.col("below"), F.col("lo")),
    )
    agg = w.groupBy("g").agg(
        F.max("n_g").cast("long").alias("n"),
        F.max("lo").cast("long").alias("lo"),
        F.sum(kept.cast(d38) * F.col("v")).alias("tsum"),
        F.min(
            F.when(F.col("below") + F.col("c") >= F.col("lo") + 1, F.col("v"))
        ).alias("v_lo"),
        F.min(
            F.when(
                F.col("below") + F.col("c") >= F.col("n_g") - F.col("lo"), F.col("v")
            )
        ).alias("v_hi"),
    )
    return agg.select(
        F.col("g").alias("event_type"),
        "n",
        F.col("lo").alias("n_trimmed_each"),
        F.round(
            F.col("tsum").cast("double") / (F.col("n") - 2 * F.col("lo")), 6
        ).alias("trimmed_mean"),
        F.round(
            (
                F.col("tsum")
                + F.col("lo").cast(d38) * F.col("v_lo")
                + F.col("lo").cast(d38) * F.col("v_hi")
            ).cast("double")
            / F.col("n"),
            6,
        ).alias("winsorized_mean"),
    )


# Grubbs outlier test ----------------------------------------------------------


@register(
    "grubbs_test",
    """
    WITH s AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(v) AS HUGEINT) AS sv,
             sum(CAST(v AS HUGEINT) * v) AS qv
      FROM s
    ),
    dev AS (
      SELECT CAST(max(abs(n * v - sv)) AS HUGEINT) AS mdev FROM s, m
    ),
    who AS (
      SELECT min(v) AS outlier_cents FROM s, m, dev
      WHERE abs(n * v - sv) = mdev
    )
    SELECT CAST(n AS BIGINT) AS n, outlier_cents,
           round(CAST(mdev AS DOUBLE) / CAST(n AS DOUBLE)
                 / sqrt((CAST(n AS DOUBLE) * CAST(qv AS DOUBLE)
                         - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
                        / CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0)), 6)
             AS g_stat
    FROM m, dev, who
    """,
    doc=(
        "Grubbs outlier statistic G = max|x - mean|/sd over value cents: "
        "the deviation max runs on n-scaled integers (|n*v - S|, exact, "
        "aggregation-order free), ties break to the smallest cent value; "
        "one closed-form float expression at the end"
    ),
)
def grubbs_test(spark, sf_dir):
    """One exact-moment pass, one integer max, one tie-broken min — three
    scalar aggregates chained by broadcasts; nothing floats until the
    final G expression."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d38 = "decimal(38,0)"
    s = _persist_evict(
        ev.select(F.round(F.col("value") * 100, 0).cast("long").alias("v"))
    )
    m = s.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("v").cast(d38).alias("sv"),
        F.sum(F.col("v").cast(d38) * F.col("v")).alias("qv"),
    )
    dev = (
        s.crossJoin(F.broadcast(m))
        .agg(F.max(F.abs(F.col("n") * F.col("v") - F.col("sv"))).alias("mdev"))
    )
    who = (
        s.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(dev))
        .filter(F.abs(F.col("n") * F.col("v") - F.col("sv")) == F.col("mdev"))
        .agg(F.min("v").alias("outlier_cents"))
    )
    nd = F.col("n").cast("double")
    svd = F.col("sv").cast("double")
    qvd = F.col("qv").cast("double")
    return (
        m.crossJoin(F.broadcast(dev))
        .crossJoin(F.broadcast(who))
        .select(
            F.col("n").cast("long").alias("n"),
            "outlier_cents",
            F.round(
                F.col("mdev").cast("double") / nd
                / F.sqrt((nd * qvd - svd * svd) / nd / (nd - 1.0)),
                6,
            ).alias("g_stat"),
        )
    )


# Wilcoxon signed-rank test ----------------------------------------------------


@register(
    "wilcoxon_signed_rank",
    """
    WITH ud AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(sum(CASE WHEN EXTRACT(hour FROM ts) < 12
                           THEN CAST(round(value * 100, 0) AS BIGINT)
                           ELSE 0 END) AS BIGINT)
             - CAST(sum(CASE WHEN EXTRACT(hour FROM ts) >= 12
                             THEN CAST(round(value * 100, 0) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS d
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id, CAST(ts AS DATE)
    ),
    nz AS (SELECT abs(d) AS ad, CAST(sign(d) AS BIGINT) AS sg
           FROM ud WHERE d <> 0),
    c AS (SELECT ad, CAST(count(*) AS BIGINT) AS c,
                 CAST(sum(CASE WHEN sg > 0 THEN 1 ELSE 0 END) AS BIGINT) AS cp
          FROM nz GROUP BY ad),
    w AS (
      SELECT ad, c, cp,
             COALESCE(sum(c) OVER (ORDER BY ad ROWS BETWEEN UNBOUNDED
               PRECEDING AND 1 PRECEDING), 0) AS below
      FROM c
    ),
    agg AS (
      SELECT CAST(sum(c) AS HUGEINT) AS n,
             CAST(sum(cp * (2 * below + c + 1)) AS HUGEINT) AS w2p,
             CAST(sum(CAST(c AS HUGEINT) * c * c - c) AS HUGEINT) AS ties
      FROM w
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           CAST(w2p AS BIGINT) AS w2_plus,
           round((2.0 * CAST(w2p AS DOUBLE) - CAST(n * (n + 1) AS DOUBLE))
                 * sqrt(3.0)
                 / sqrt(CAST(2 * n * (n + 1) * (2 * n + 1) - ties AS DOUBLE)),
                 6) AS z
    FROM agg
    """,
    doc=(
        "Wilcoxon signed-rank test of morning-vs-afternoon spend per "
        "(user, day): doubled tied ranks of |d| keep W+ integral "
        "(w2_plus = 2*W+), zero differences dropped, and the normal "
        "approximation carries the exact tie correction — the "
        "nonparametric paired companion to mcnemar_test's binary view"
    ),
)
def wilcoxon_signed_rank(spark, sf_dir):
    """One (user, day) partial-agg rollup builds the paired differences;
    ranks come from the distinct-|d| prefix frame (the kruskal_wallis
    machinery), so W+ and the tie term are exact decimal sums. The only
    floats are the closing z expression."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d38 = "decimal(38,0)"
    cents = F.round(F.col("value") * 100, 0).cast("long")
    hour = F.hour("ts")
    ud = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        (
            F.sum(F.when(hour < 12, cents).otherwise(0))
            - F.sum(F.when(hour >= 12, cents).otherwise(0))
        )
        .cast("long")
        .alias("d")
    )
    nz = ud.filter(F.col("d") != 0).select(
        F.abs(F.col("d")).alias("ad"),
        F.signum(F.col("d")).cast("long").alias("sg"),
    )
    c = nz.groupBy("ad").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum(F.when(F.col("sg") > 0, 1).otherwise(0)).cast("long").alias("cp"),
    )
    wb = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)
    w = c.select(
        "ad", "c", "cp", F.coalesce(F.sum("c").over(wb), F.lit(0)).alias("below")
    )
    agg = w.agg(
        F.sum("c").cast(d38).alias("n"),
        F.sum(
            F.col("cp").cast(d38) * (2 * F.col("below") + F.col("c") + 1)
        ).alias("w2p"),
        F.sum(
            F.col("c").cast(d38) * F.col("c") * F.col("c") - F.col("c")
        ).alias("ties"),
    )
    nd = F.col("n").cast("double")
    return agg.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.col("w2p").cast("long").alias("w2_plus"),
        F.round(
            (2.0 * F.col("w2p").cast("double") - (F.col("n") * (F.col("n") + 1)).cast("double"))
            * F.sqrt(F.lit(3.0))
            / F.sqrt(
                (
                    2 * F.col("n") * (F.col("n") + 1) * (2 * F.col("n") + 1)
                    - F.col("ties")
                ).cast("double")
            ),
            6,
        ).alias("z"),
    )


# Siegel repeated-median slope -------------------------------------------------


@register(
    "siegel_slopes",
    """
    WITH d AS (
      SELECT CAST(date_diff('day',
               (SELECT min(CAST(ts AS DATE)) FROM events), CAST(ts AS DATE))
             AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    pair AS (
      SELECT a.x AS xi, round(CAST(b.y - a.y AS DOUBLE) / (b.x - a.x), 9) AS sl
      FROM d a JOIN d b ON a.x <> b.x
    ),
    pc AS (SELECT xi, sl, CAST(count(*) AS BIGINT) AS c FROM pair GROUP BY xi, sl),
    pw AS (
      SELECT xi, sl, c,
             COALESCE(sum(c) OVER (PARTITION BY xi ORDER BY sl ROWS BETWEEN
               UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
             sum(c) OVER (PARTITION BY xi) AS n_i
      FROM pc
    ),
    med_i AS (
      SELECT xi,
             round((min(CASE WHEN below + c >= (n_i + 1) // 2 THEN sl END)
                    + min(CASE WHEN below + c >= n_i // 2 + 1 THEN sl END))
                   / 2.0, 9) AS mi
      FROM pw GROUP BY xi, n_i
    ),
    mc AS (SELECT mi, CAST(count(*) AS BIGINT) AS c FROM med_i GROUP BY mi),
    mw AS (
      SELECT mi, c,
             COALESCE(sum(c) OVER (ORDER BY mi ROWS BETWEEN UNBOUNDED
               PRECEDING AND 1 PRECEDING), 0) AS below,
             sum(c) OVER () AS n
      FROM mc
    )
    SELECT CAST(max(n) AS BIGINT) AS n_days,
           round((min(CASE WHEN below + c >= (n + 1) // 2 THEN mi END)
                  + min(CASE WHEN below + c >= n // 2 + 1 THEN mi END))
                 / 2.0, 6) AS siegel_slope
    FROM mw
    """,
    doc=(
        "Siegel repeated-median trend of the daily event-count series: "
        "per-day median of pairwise slopes, then the median of those "
        "medians — the 50%-breakdown robust slope beside theil_sen_trend "
        "(29.3%); slopes snap to 9 dp so the two exact-median passes "
        "compare identical doubles on both engines"
    ),
)
def siegel_slopes(spark, sf_dir):
    """The O(days^2) pair frame is tiny (the series is O(days)); both
    median passes run on distinct-value prefix frames, so every
    selection is a min-over-threshold aggregate — deterministic even
    with repeated slope values. Exact integer counts everywhere; the
    slope doubles are identical IEEE quotients snapped to 9 dp."""
    ev = _t(spark, sf_dir, "events")
    dmin = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    d = _persist_evict(
        ev.crossJoin(F.broadcast(dmin))
        .groupBy(F.datediff(F.to_date("ts"), F.col("d0")).cast("long").alias("x"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    a = d.select(F.col("x").alias("xi"), F.col("y").alias("yi"))
    b = d.select(F.col("x").alias("xj"), F.col("y").alias("yj"))
    pair = (
        a.join(F.broadcast(b), F.col("xi") != F.col("xj"))
        .select(
            "xi",
            F.round(
                (F.col("yj") - F.col("yi")).cast("double")
                / (F.col("xj") - F.col("xi")),
                9,
            ).alias("sl"),
        )
    )
    pc = pair.groupBy("xi", "sl").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wb = Window.partitionBy("xi").orderBy("sl").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wg = Window.partitionBy("xi")
    pw = pc.select(
        "xi", "sl", "c",
        F.coalesce(F.sum("c").over(wb), F.lit(0)).alias("below"),
        F.sum("c").over(wg).alias("n_i"),
    )
    cum = F.col("below") + F.col("c")
    med_i = pw.groupBy("xi", "n_i").agg(
        F.round(
            (
                F.min(F.when(cum >= F.expr("(n_i + 1) div 2"), F.col("sl")))
                + F.min(F.when(cum >= F.expr("n_i div 2 + 1"), F.col("sl")))
            )
            / 2.0,
            9,
        ).alias("mi")
    )
    mc = med_i.groupBy("mi").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wb2 = Window.orderBy("mi").rowsBetween(Window.unboundedPreceding, -1)
    wt = Window.orderBy("mi").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    mw = mc.select(
        "mi", "c",
        F.coalesce(F.sum("c").over(wb2), F.lit(0)).alias("below"),
        F.sum("c").over(wt).alias("n"),
    )
    cum2 = F.col("below") + F.col("c")
    return mw.agg(
        F.max("n").cast("long").alias("n_days"),
        F.round(
            (
                F.min(F.when(cum2 >= F.expr("(n + 1) div 2"), F.col("mi")))
                + F.min(F.when(cum2 >= F.expr("n div 2 + 1"), F.col("mi")))
            )
            / 2.0,
            6,
        ).alias("siegel_slope"),
    )


# TextRank keyword scores ------------------------------------------------------

_TR_DAMP = 0.85
_TR_ITERS = 5
_TR_MINLEN = 4
_TR_MINCNT = 5


def _textrank_oracle_sql() -> str:
    head = f"""
    WITH d AS MATERIALIZED (SELECT string_split(text, ' ') AS a FROM documents),
    bi AS MATERIALIZED (
      SELECT a[i] AS w1, a[i + 1] AS w2
      FROM d CROSS JOIN unnest(range(1, len(a))) AS t(i)
      WHERE len(a[i]) >= {_TR_MINLEN} AND len(a[i + 1]) >= {_TR_MINLEN}
        AND a[i] <> a[i + 1]
    ),
    cw AS MATERIALIZED (
      SELECT tok, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT unnest(a) AS tok FROM d
      ) GROUP BY tok HAVING count(*) >= {_TR_MINCNT}
    ),
    e0 AS MATERIALIZED (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS wt FROM bi
      JOIN cw c1 ON c1.tok = bi.w1 JOIN cw c2 ON c2.tok = bi.w2
      GROUP BY w1, w2
    ),
    e AS MATERIALIZED (
      SELECT w1 AS src, w2 AS dst, CAST(sum(wt) AS BIGINT) AS wt FROM (
        SELECT w1, w2, wt FROM e0
        UNION ALL SELECT w2 AS w1, w1 AS w2, wt FROM e0
      ) GROUP BY 1, 2
    ),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS w FROM e),
    deg AS MATERIALIZED (
      SELECT src, CAST(sum(wt) AS DOUBLE) AS dw FROM e GROUP BY src),
    r0 AS MATERIALIZED (SELECT w, 1.0 AS r FROM nodes)"""
    steps = []
    for k in range(1, _TR_ITERS + 1):
        steps.append(f"""
    r{k} AS MATERIALIZED (
      SELECT n.w,
             {1.0 - _TR_DAMP!r}
             + {_TR_DAMP!r} * coalesce(sum(p.r * e.wt / deg.dw), 0.0) AS r
      FROM nodes n
      LEFT JOIN e ON e.dst = n.w
      LEFT JOIN deg ON deg.src = e.src
      LEFT JOIN r{k - 1} p ON p.w = e.src
      GROUP BY n.w
    )""")
    return (
        head
        + ","
        + ",".join(steps)
        + f"\n    SELECT w AS word, round(r, 6) AS score FROM r{_TR_ITERS}"
    )


@register(
    "textrank_scores",
    _textrank_oracle_sql(),
    doc=(
        f"TextRank keyword scores: weighted PageRank ({_TR_ITERS} rounds, "
        f"d = {_TR_DAMP}) over the adjacent-word co-occurrence graph "
        f"(words of >= {_TR_MINLEN} chars appearing >= {_TR_MINCNT} "
        "times; symmetric weighted edges) — the classic unsupervised "
        "keyword extractor, emitted for every graph word like pagerank "
        "(no float-ordered top-k cut)"
    ),
)
def textrank_scores(spark, sf_dir):
    """Graph build is the bigram zip-of-slices with two broadcast vocab
    probes; each round is the pagerank contributions-only shuffle with
    edge weights riding the persisted edge/degree frame. Emitting every
    word's rounded score (not a top-k) keeps the output deterministic
    under sum-order ULP drift, exactly as pagerank documents."""
    from pyspark import StorageLevel

    docs = _t(spark, sf_dir, "documents")
    a = F.split(F.col("text"), " ")
    n = F.size(a)
    bi = docs.select(
        F.explode(
            F.arrays_zip(
                F.slice(a, 1, n - 1).alias("w1"),
                F.slice(a, 2, n - 1).alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")).filter(
        (F.length("w1") >= _TR_MINLEN)
        & (F.length("w2") >= _TR_MINLEN)
        & (F.col("w1") != F.col("w2"))
    )
    toks = docs.select(F.explode(a).alias("tok"))
    cw = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .filter(F.col("c") >= _TR_MINCNT)
        .select("tok")
    )
    e0 = (
        bi.join(F.broadcast(cw.select(F.col("tok").alias("w1"))), "w1")
        .join(F.broadcast(cw.select(F.col("tok").alias("w2"))), "w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("wt"))
    )
    e = (
        e0.select(F.col("w1").alias("src"), F.col("w2").alias("dst"), "wt")
        .unionAll(e0.select(F.col("w2").alias("src"), F.col("w1").alias("dst"), "wt"))
        .groupBy("src", "dst")
        .agg(F.sum("wt").cast("long").alias("wt"))
    )
    while len(_PAGERANK_CACHED) > 2:
        _PAGERANK_CACHED.pop(0).unpersist()
    nodes = e.select(F.col("src").alias("w")).distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    _PAGERANK_CACHED.append(nodes)
    deg = e.groupBy("src").agg(F.sum("wt").cast("double").alias("dw"))
    ed = e.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    _PAGERANK_CACHED.append(ed)
    ranks = nodes.select("w", F.lit(1.0).alias("r"))
    for _ in range(_TR_ITERS):
        contrib = (
            ed.join(ranks, ed.src == ranks.w)
            .select(
                F.col("dst").alias("w"),
                (F.col("r") * F.col("wt") / F.col("dw")).alias("c"),
            )
            .groupBy("w")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contrib, "w", "left").select(
            "w",
            (
                F.lit(1.0 - _TR_DAMP)
                + F.lit(_TR_DAMP) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("r"),
        )
    return ranks.select(F.col("w").alias("word"), F.round("r", 6).alias("score"))


# Spatial thinning -------------------------------------------------------------

_THIN_R2 = 1600  # squared thinning radius in 0.01-degree units (r = 0.4 deg)


@register(
    "spatial_thinning",
    f"""
    WITH p AS (
      SELECT event_id,
             CAST(event_id * 7919 % 2000 AS BIGINT) AS iy,
             CAST(event_id * 104729 % 2400 AS BIGINT) AS ix
      FROM events
    ),
    rep AS (
      SELECT iy // 50 AS cy, ix // 50 AS cx,
             min(event_id) AS event_id
      FROM p GROUP BY 1, 2
    ),
    r AS (
      SELECT rep.cy AS cy, rep.cx AS cx, rep.event_id AS event_id,
             p.iy AS iy, p.ix AS ix
      FROM rep JOIN p ON p.event_id = rep.event_id
    ),
    dropped AS (
      SELECT DISTINCT b.event_id
      FROM r a JOIN r b
        ON abs(a.cy - b.cy) <= 1 AND abs(a.cx - b.cx) <= 1
       AND a.event_id < b.event_id
       AND (a.iy - b.iy) * (a.iy - b.iy) + (a.ix - b.ix) * (a.ix - b.ix)
           < {_THIN_R2}
    )
    SELECT cy, cx, event_id, iy, ix FROM r
    WHERE event_id NOT IN (SELECT event_id FROM dropped)
    """,
    doc=(
        "spatial thinning for presence-only sampling: one representative "
        "(min event id) per 0.5-degree cell, then any representative "
        "within 0.4 degrees of a lower-id representative is dropped "
        "(single-pass id-ordered rule — deterministic, no greedy "
        "sequential state); all-integer geometry"
    ),
)
def spatial_thinning(spark, sf_dir):
    """Cell collapse is one partial-agg groupBy; the proximity check is a
    3x3 kRing self-join on the representative frame (O(occupied cells), "
    "never points) followed by an anti join. The cell edge (0.5 deg) is >= "
    "the radius, so the 3x3 cover is exact. Integer squared distances "
    "throughout."""
    ev = _t(spark, sf_dir, "events")
    p = ev.select(
        "event_id",
        (F.col("event_id") * 7919 % 2000).alias("iy"),
        (F.col("event_id") * 104729 % 2400).alias("ix"),
    )
    p = _persist_evict(p)
    rep = p.groupBy(
        F.expr("iy div 50").alias("cy"), F.expr("ix div 50").alias("cx")
    ).agg(F.min("event_id").alias("event_id"))
    r = _persist_evict(
        rep.join(p, "event_id").select("cy", "cx", "event_id", "iy", "ix")
    )
    a = r.select(
        F.col("cy").alias("acy"), F.col("cx").alias("acx"),
        F.col("event_id").alias("aid"), F.col("iy").alias("aiy"),
        F.col("ix").alias("aix"),
    )
    dropped = (
        a.join(
            r,
            (F.abs(F.col("acy") - F.col("cy")) <= 1)
            & (F.abs(F.col("acx") - F.col("cx")) <= 1)
            & (F.col("aid") < F.col("event_id"))
            & (
                (F.col("aiy") - F.col("iy")) * (F.col("aiy") - F.col("iy"))
                + (F.col("aix") - F.col("ix")) * (F.col("aix") - F.col("ix"))
                < _THIN_R2
            ),
        )
        .select("event_id")
        .distinct()
    )
    return r.join(dropped, "event_id", "left_anti").select(
        "cy", "cx", "event_id", "iy", "ix"
    )


# Hypsometric curve ------------------------------------------------------------

_HYP_BINS = 20


@register(
    "hypsometric_curve",
    f"""
    WITH p AS ({_PT_SQL}),
    cells AS ({_CELLS_SQL}),
    mm AS (SELECT CAST(min(x) AS BIGINT) AS lo, CAST(max(x) AS BIGINT) AS hi,
                  CAST(count(*) AS BIGINT) AS tot
           FROM cells),
    jj AS (SELECT CAST(unnest(generate_series(0, {_HYP_BINS})) AS BIGINT) AS j),
    cur AS (
      SELECT jj.j AS j,
             CAST(COALESCE(sum(CASE WHEN {_HYP_BINS} * (cells.x - mm.lo)
                                         >= jj.j * (mm.hi - mm.lo)
                                    THEN 1 END), 0) AS BIGINT) AS n_above
      FROM jj CROSS JOIN cells CROSS JOIN mm GROUP BY jj.j
    )
    SELECT j, round(j / {_HYP_BINS}.0, 6) AS rel_height,
           n_above,
           round(CAST(n_above AS DOUBLE) / tot, 6) AS area_frac
    FROM cur, mm ORDER BY j
    """,
    doc=(
        "hypsometric curve of the event-density surface (cell count as "
        "elevation): relative area above each of 21 relative heights — "
        "the landscape-maturity diagnostic; thresholds compare as exact "
        "cross-multiplied integers so bin membership cannot straddle a "
        "float boundary"
    ),
)
def hypsometric_curve(spark, sf_dir):
    """One cell rollup (the shared Gi* frame), one scalar min/max/count "
    "aggregate, then a 21-row broadcast probe with integer cross-"
    "multiplied threshold tests — nothing floats until the two display "
    "divisions."""
    cells = _persist_evict(_cell_counts(spark, sf_dir))
    mm = cells.agg(
        F.min("x").cast("long").alias("lo"),
        F.max("x").cast("long").alias("hi"),
        F.count(F.lit(1)).cast("long").alias("tot"),
    )
    jj = spark.range(0, _HYP_BINS + 1).select(F.col("id").cast("long").alias("j"))
    cur = (
        jj.crossJoin(F.broadcast(mm))
        .crossJoin(cells)
        .groupBy("j", "tot")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        _HYP_BINS * (F.col("x") - F.col("lo"))
                        >= F.col("j") * (F.col("hi") - F.col("lo")),
                        1,
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_above")
        )
    )
    return cur.select(
        "j",
        F.round(F.col("j") / float(_HYP_BINS), 6).alias("rel_height"),
        "n_above",
        F.round(F.col("n_above").cast("double") / F.col("tot"), 6).alias(
            "area_frac"
        ),
    )


# Exponential inter-event fit + KS goodness ------------------------------------


@register(
    "exp_fit_ks",
    """
    WITH e AS (
      SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS t_ms, event_id
      FROM events
    ),
    gaps AS (
      SELECT t_ms - lag(t_ms) OVER (PARTITION BY user_id
               ORDER BY t_ms, event_id) AS g
      FROM e
    ),
    nz AS (SELECT g FROM gaps WHERE g IS NOT NULL AND g > 0),
    c AS (SELECT g, CAST(count(*) AS BIGINT) AS c FROM nz GROUP BY g),
    w AS (
      SELECT g, c,
             COALESCE(sum(c) OVER (ORDER BY g ROWS BETWEEN UNBOUNDED
               PRECEDING AND 1 PRECEDING), 0) AS below
      FROM c
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n, CAST(sum(g * c) AS BIGINT) AS sg
            FROM c),
    ks AS (
      SELECT max(greatest(
               abs(CAST(below + c AS DOUBLE) / n
                   - (1.0 - exp(-(CAST(n AS DOUBLE) / sg) * g))),
               abs(CAST(below AS DOUBLE) / n
                   - (1.0 - exp(-(CAST(n AS DOUBLE) / sg) * g)))
             )) AS ks_stat
      FROM w, tot
    )
    SELECT n AS n_gaps,
           round(CAST(n AS DOUBLE) / sg * 3600000.0, 6) AS lambda_per_hour,
           round(ks_stat, 6) AS ks_stat
    FROM tot, ks
    """,
    doc=(
        "exponential fit of pooled inter-event gaps (MLE rate = n/sum) "
        "with the Kolmogorov-Smirnov distance to the fitted CDF, "
        "evaluated both-sided at every distinct gap from the prefix "
        "frame — the Poisson-process diagnostic beside burstiness_index; "
        "max() is order-free so the per-row exp() is the only float"
    ),
)
def exp_fit_ks(spark, sf_dir):
    """Gaps come from one per-user sort window; the ECDF lives on the
    distinct-gap prefix frame (O(distinct gaps)); the KS max folds
    per-row deterministic doubles. Rate is an exact integer rational."""
    ev = _t(spark, sf_dir, "events")
    w0 = Window.partitionBy("user_id").orderBy("t_ms", "event_id")
    e = ev.select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
        "event_id",
    )
    gaps = e.select((F.col("t_ms") - F.lag("t_ms").over(w0)).alias("g")).filter(
        F.col("g").isNotNull() & (F.col("g") > 0)
    )
    c = _persist_evict(gaps.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("c")))
    wb = Window.orderBy("g").rowsBetween(Window.unboundedPreceding, -1)
    w = c.select(
        "g", "c", F.coalesce(F.sum("c").over(wb), F.lit(0)).alias("below")
    )
    tot = c.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("g") * F.col("c")).cast("long").alias("sg"),
    )
    lam = F.col("n").cast("double") / F.col("sg")
    cdf = 1.0 - F.exp(-lam * F.col("g"))
    ks = (
        w.crossJoin(F.broadcast(tot))
        .agg(
            F.max(
                F.greatest(
                    F.abs((F.col("below") + F.col("c")).cast("double") / F.col("n") - cdf),
                    F.abs(F.col("below").cast("double") / F.col("n") - cdf),
                )
            ).alias("ks_stat")
        )
    )
    return tot.crossJoin(F.broadcast(ks)).select(
        F.col("n").alias("n_gaps"),
        F.round(F.col("n").cast("double") / F.col("sg") * 3600000.0, 6).alias(
            "lambda_per_hour"
        ),
        F.round("ks_stat", 6).alias("ks_stat"),
    )


# Cohort lifetime value --------------------------------------------------------


@register(
    "cohort_ltv",
    """
    WITH e AS (
      SELECT user_id, event_type,
             CAST(round(COALESCE(value, 0) * 100, 0) AS BIGINT) AS cents,
             epoch_ms(CAST(ts AS TIMESTAMP)) // 604800000 AS wk
      FROM events
    ),
    first_wk AS (SELECT user_id, min(wk) AS cw FROM e GROUP BY user_id),
    coh AS (SELECT cw, CAST(count(*) AS BIGINT) AS n_users
            FROM first_wk GROUP BY cw),
    spend AS (
      SELECT f.cw AS cw, e.wk - f.cw AS age_wk,
             CAST(sum(CASE WHEN e.event_type = 'purchase'
                           THEN e.cents ELSE 0 END) AS BIGINT) AS sum_cents,
             CAST(count(DISTINCT CASE WHEN e.event_type = 'purchase'
                                      THEN e.user_id END) AS BIGINT)
               AS purchasers
      FROM e JOIN first_wk f ON f.user_id = e.user_id
      GROUP BY f.cw, e.wk - f.cw
    )
    SELECT cw AS cohort_week, age_wk, n_users, purchasers, sum_cents,
           CAST(sum(sum_cents) OVER (PARTITION BY cw ORDER BY age_wk
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_cents,
           round(CAST(sum(sum_cents) OVER (PARTITION BY cw ORDER BY age_wk
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / n_users, 6) AS ltv_cents
    FROM spend JOIN coh USING (cw)
    ORDER BY cw, age_wk
    """,
    doc=(
        "cohort lifetime value: users grouped by first-activity epoch "
        "week, purchase cents accumulated by cohort age — the "
        "revenue-dimension companion to retention_cohorts (which counts "
        "activity); exact integer cents with one display division"
    ),
)
def cohort_ltv(spark, sf_dir):
    """One per-user min rollup (cohort key, O(users)), one broadcast
    join back, one (cohort, age) partial agg, then ordered prefix sums
    on the tiny cohort-age frame. Exact cents throughout."""
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_type",
        F.round(F.coalesce(F.col("value"), F.lit(0)) * 100, 0)
        .cast("long")
        .alias("cents"),
        F.expr("unix_millis(cast(ts as timestamp)) div 604800000").alias("wk"),
    )
    e = _persist_evict(e)
    first_wk = e.groupBy("user_id").agg(F.min("wk").alias("cw"))
    first_wk = _persist_evict(first_wk)
    coh = first_wk.groupBy("cw").agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    spend = (
        e.join(F.broadcast(first_wk), "user_id")
        .groupBy("cw", (F.col("wk") - F.col("cw")).alias("age_wk"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("cents")).otherwise(0)
            )
            .cast("long")
            .alias("sum_cents"),
            F.countDistinct(
                F.when(F.col("event_type") == "purchase", F.col("user_id"))
            )
            .cast("long")
            .alias("purchasers"),
        )
    )
    wc = Window.partitionBy("cw").orderBy("age_wk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        spend.join(F.broadcast(coh), "cw")
        .select(
            F.col("cw").alias("cohort_week"),
            "age_wk",
            "n_users",
            "purchasers",
            "sum_cents",
            F.sum("sum_cents").over(
                Window.partitionBy("cw").orderBy("age_wk").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ).cast("long").alias("cum_cents"),
            F.round(
                F.sum("sum_cents").over(wc).cast("double") / F.col("n_users"), 6
            ).alias("ltv_cents"),
        )
    )


# Partial correlation ----------------------------------------------------------


@register(
    "partial_correlation",
    """
    WITH s AS (
      SELECT CAST(round(l_quantity * 100, 0) AS BIGINT) AS x,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y,
             CAST(round(l_discount * 100, 0) AS BIGINT) AS z
      FROM lineitem
    ),
    m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(z) AS HUGEINT) AS sz,
             sum(CAST(x AS HUGEINT) * x) AS sxx, sum(CAST(y AS HUGEINT) * y) AS syy,
             sum(CAST(z AS HUGEINT) * z) AS szz,
             sum(CAST(x AS HUGEINT) * y) AS sxy, sum(CAST(x AS HUGEINT) * z) AS sxz,
             sum(CAST(y AS HUGEINT) * z) AS syz
      FROM s
    ),
    r AS (
      SELECT CAST(n AS BIGINT) AS n,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
               / sqrt(CAST(n * syy - sy * sy AS DOUBLE)) AS rxy,
             CAST(n * sxz - sx * sz AS DOUBLE)
               / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
               / sqrt(CAST(n * szz - sz * sz AS DOUBLE)) AS rxz,
             CAST(n * syz - sy * sz AS DOUBLE)
               / sqrt(CAST(n * syy - sy * sy AS DOUBLE))
               / sqrt(CAST(n * szz - sz * sz AS DOUBLE)) AS ryz
      FROM m
    )
    SELECT n, round(rxy, 6) AS r_xy, round(rxz, 6) AS r_xz,
           round(ryz, 6) AS r_yz,
           round((rxy - rxz * ryz)
                 / sqrt(1.0 - rxz * rxz) / sqrt(1.0 - ryz * ryz), 6) AS r_xy_z
    FROM r
    """,
    doc=(
        "first-order partial correlation of quantity and extendedprice "
        "controlling for discount: all three pairwise Pearson r from one "
        "exact-integer moment pass, then the closed-form recursion "
        "(r_xy - r_xz r_yz)/sqrt((1-r_xz^2)(1-r_yz^2)) — the "
        "confounder-adjusted association beside ols_trend"
    ),
)
def partial_correlation(spark, sf_dir):
    """One partial-agg pass with ten exact decimal moments; every later
    step is single-row float algebra with the identical expression tree
    on both engines."""
    d38 = "decimal(38,0)"
    li = _t(spark, sf_dir, "lineitem")
    s = li.select(
        F.round(F.col("l_quantity") * 100, 0).cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("z"),
    )
    xc, yc, zc = (F.col(c).cast(d38) for c in ("x", "y", "z"))
    m = s.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum("z").cast(d38).alias("sz"),
        F.sum(xc * F.col("x")).alias("sxx"),
        F.sum(yc * F.col("y")).alias("syy"),
        F.sum(zc * F.col("z")).alias("szz"),
        F.sum(xc * F.col("y")).alias("sxy"),
        F.sum(xc * F.col("z")).alias("sxz"),
        F.sum(yc * F.col("z")).alias("syz"),
    )

    def corr(sab, sa, sb, saa, sbb):
        return (
            (F.col("n") * F.col(sab) - F.col(sa) * F.col(sb)).cast("double")
            / F.sqrt((F.col("n") * F.col(saa) - F.col(sa) * F.col(sa)).cast("double"))
            / F.sqrt((F.col("n") * F.col(sbb) - F.col(sb) * F.col(sb)).cast("double"))
        )

    r = m.select(
        F.col("n").cast("long").alias("n"),
        corr("sxy", "sx", "sy", "sxx", "syy").alias("rxy"),
        corr("sxz", "sx", "sz", "sxx", "szz").alias("rxz"),
        corr("syz", "sy", "sz", "syy", "szz").alias("ryz"),
    )
    return r.select(
        "n",
        F.round("rxy", 6).alias("r_xy"),
        F.round("rxz", 6).alias("r_xz"),
        F.round("ryz", 6).alias("r_yz"),
        F.round(
            (F.col("rxy") - F.col("rxz") * F.col("ryz"))
            / F.sqrt(1.0 - F.col("rxz") * F.col("rxz"))
            / F.sqrt(1.0 - F.col("ryz") * F.col("ryz")),
            6,
        ).alias("r_xy_z"),
    )


# Mahalanobis outliers ---------------------------------------------------------

_MAHA_CHI2_95 = 5.99146  # chi-square df=2, p=0.95 (uniform cloud: corner md2 ~ 6)


@register(
    "mahalanobis_outliers",
    f"""
    WITH p AS (
      SELECT event_id,
             CAST(event_id * 7919 % 2000 AS BIGINT) AS ix,
             CAST(event_id * 104729 % 2400 AS BIGINT) AS iy
      FROM events
    ),
    m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(ix) AS HUGEINT) AS sx, CAST(sum(iy) AS HUGEINT) AS sy,
             sum(CAST(ix AS HUGEINT) * ix) AS sxx,
             sum(CAST(ix AS HUGEINT) * iy) AS sxy,
             sum(CAST(iy AS HUGEINT) * iy) AS syy
      FROM p
    ),
    c AS (
      SELECT CAST(n AS DOUBLE) AS nd,
             CAST(n * sxx - sx * sx AS DOUBLE) AS a,
             CAST(n * sxy - sx * sy AS DOUBLE) AS b,
             CAST(n * syy - sy * sy AS DOUBLE) AS cc,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
      FROM m
    ),
    md AS (
      SELECT event_id,
             (nd - 1.0) / (nd * (a * cc - b * b))
             * (cc * (nd * ix - sxd) * (nd * ix - sxd)
                - 2.0 * b * (nd * ix - sxd) * (nd * iy - syd)
                + a * (nd * iy - syd) * (nd * iy - syd)) AS md2
      FROM p, c
    )
    SELECT event_id, round(md2, 6) AS md2
    FROM md WHERE md2 > {_MAHA_CHI2_95!r}
    """,
    doc=(
        "Mahalanobis outlier flagging on the synthetic 2-D point cloud: "
        "covariance from one exact-integer moment pass, closed-form 2x2 "
        "inverse, per-point squared distance vs the chi2(2, 0.95) "
        "threshold — the multivariate cousin of grubbs_test"
    ),
)
def mahalanobis_outliers(spark, sf_dir):
    """One moment aggregate, then a scalar-broadcast crossJoin scoring
    the stream map-side (the pca_project shape). The n-scaled deviations
    keep the quadratic form's inputs exact; the per-point float
    expression is structure-identical on both engines and no cross-row
    float reduction exists."""
    d38 = "decimal(38,0)"
    ev = _t(spark, sf_dir, "events")
    p = ev.select(
        "event_id",
        (F.col("event_id") * 7919 % 2000).alias("ix"),
        (F.col("event_id") * 104729 % 2400).alias("iy"),
    )
    p = _persist_evict(p)
    ixd, iyd = F.col("ix").cast(d38), F.col("iy").cast(d38)
    m = p.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("ix").cast(d38).alias("sx"),
        F.sum("iy").cast(d38).alias("sy"),
        F.sum(ixd * F.col("ix")).alias("sxx"),
        F.sum(ixd * F.col("iy")).alias("sxy"),
        F.sum(iyd * F.col("iy")).alias("syy"),
    )
    c = m.select(
        F.col("n").cast("double").alias("nd"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("double")
        .alias("a"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("double")
        .alias("b"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("double")
        .alias("cc"),
        F.col("sx").cast("double").alias("sxd"),
        F.col("sy").cast("double").alias("syd"),
    )
    dx = F.col("nd") * F.col("ix") - F.col("sxd")
    dy = F.col("nd") * F.col("iy") - F.col("syd")
    md2 = (
        (F.col("nd") - 1.0)
        / (F.col("nd") * (F.col("a") * F.col("cc") - F.col("b") * F.col("b")))
        * (
            F.col("cc") * dx * dx
            - 2.0 * F.col("b") * dx * dy
            + F.col("a") * dy * dy
        )
    )
    return (
        p.crossJoin(F.broadcast(c))
        .select("event_id", md2.alias("md2"))
        .filter(F.col("md2") > _MAHA_CHI2_95)
        .select("event_id", F.round("md2", 6).alias("md2"))
    )


# Haar wavelet energy ----------------------------------------------------------

_HAAR_LEVELS = 5  # 32-slot dyadic series


@register(
    "haar_energy",
    f"""
    WITH d AS (
      SELECT CAST(date_diff('day', (SELECT min(CAST(ts AS DATE)) FROM events),
                            CAST(ts AS DATE)) AS BIGINT) AS t
      FROM events
    ),
    slots AS (SELECT CAST(unnest(generate_series(0, 31)) AS BIGINT) AS t),
    y AS (
      SELECT slots.t AS t, CAST(COALESCE(count(d.t), 0) AS BIGINT) AS y
      FROM slots LEFT JOIN d ON d.t = slots.t GROUP BY slots.t
    ),
    lv AS (SELECT CAST(unnest(generate_series(1, {_HAAR_LEVELS})) AS BIGINT) AS l),
    det AS (
      SELECT lv.l AS l, y.t // (1 << lv.l) AS k,
             CAST(sum(CASE WHEN (y.t % (1 << lv.l)) * 2 < (1 << lv.l)
                           THEN y.y ELSE -y.y END) AS BIGINT) AS dcoef
      FROM lv CROSS JOIN y GROUP BY lv.l, y.t // (1 << lv.l)
    )
    SELECT l AS level, CAST(count(*) AS BIGINT) AS n_coeffs,
           round(CAST(sum(CAST(dcoef AS HUGEINT) * dcoef) AS DOUBLE)
                 / (1 << l), 6) AS energy
    FROM det GROUP BY l ORDER BY l
    """,
    doc=(
        "Haar wavelet detail energy per level of the (zero-padded to 32 "
        "dyadic slots) daily event-count series: coefficient = "
        "(left-half sum - right-half sum)/sqrt(2^l), energy = sum of "
        "squares — exact integers divided by a power of two, so the "
        "decomposition is bit-exact; the scale-decomposition companion "
        "to diurnal_harmonics' Fourier view"
    ),
)
def haar_energy(spark, sf_dir):
    """Each level's detail coefficients come straight from signed block
    sums (one groupBy over the level x slot fan-out of the 32-row dense "
    "series) — no sequential cascade, exact integers; energy divides by "
    "2^l, a power of two, so even the float display value is exact."""
    ev = _t(spark, sf_dir, "events")
    dmin = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    d = ev.crossJoin(F.broadcast(dmin)).select(
        F.datediff(F.to_date("ts"), F.col("d0")).cast("long").alias("t")
    )
    cnt = d.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("c"))
    slots = spark.range(0, 32).select(F.col("id").cast("long").alias("t"))
    y = (
        slots.join(cnt, "t", "left")
        .select("t", F.coalesce(F.col("c"), F.lit(0)).alias("y"))
    )
    y = _persist_evict(y)
    lv = spark.range(1, _HAAR_LEVELS + 1).select(F.col("id").cast("long").alias("l"))
    blk = F.expr("shiftleft(1, cast(l as int))")
    det = (
        lv.crossJoin(y)
        .groupBy("l", (F.col("t") / blk).cast("long").alias("k"))
        .agg(
            F.sum(
                F.when((F.col("t") % blk) * 2 < blk, F.col("y")).otherwise(
                    -F.col("y")
                )
            )
            .cast("long")
            .alias("dcoef")
        )
    )
    d38 = "decimal(38,0)"
    return (
        det.groupBy(F.col("l").alias("level"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_coeffs"),
            F.sum(F.col("dcoef").cast(d38) * F.col("dcoef")).alias("_e"),
        )
        .select(
            "level",
            "n_coeffs",
            F.round(
                F.col("_e").cast("double")
                / F.expr("shiftleft(1, cast(level as int))"),
                6,
            ).alias("energy"),
        )
    )


# Per-label embedding centroids ------------------------------------------------

_LC_FP = 1000000.0  # fixed-point scale for exact cross-row embedding sums


@register(
    "label_centroids",
    f"""
    WITH e AS (
      SELECT vec_id, label, i - 1 AS dim,
             CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings CROSS JOIN unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    cs AS (
      SELECT label, dim,
             CAST(sum(CAST(round(v * {_LC_FP!r}) AS BIGINT)) AS BIGINT) AS sfp,
             CAST(count(*) AS BIGINT) AS n
      FROM e GROUP BY label, dim
    ),
    cent AS (
      SELECT label, dim, CAST(sfp AS DOUBLE) / (n * {_LC_FP!r}) AS c, n
      FROM cs
    ),
    dots AS (
      SELECT e.vec_id AS vec_id, e.label AS label,
             CAST(sum(CAST(round(e.v * cent.c * 1000000000.0) AS BIGINT))
                  AS BIGINT) AS dvc,
             CAST(sum(CAST(round(e.v * e.v * 1000000000.0) AS BIGINT))
                  AS BIGINT) AS dvv,
             CAST(sum(CAST(round(cent.c * cent.c * 1000000000.0) AS BIGINT))
                  AS BIGINT) AS dcc
      FROM e JOIN cent ON cent.label = e.label AND cent.dim = e.dim
      GROUP BY e.vec_id, e.label
    ),
    coss AS (
      SELECT label,
             CAST(sum(CAST(round(CAST(dvc AS DOUBLE)
                   / sqrt(CAST(dvv AS DOUBLE)) / sqrt(CAST(dcc AS DOUBLE))
                   * 1000000000.0) AS BIGINT)) AS BIGINT) AS scos,
             CAST(count(*) AS BIGINT) AS n_vecs
      FROM dots GROUP BY label
    )
    SELECT coss.label AS label, coss.n_vecs AS n_vecs,
           {", ".join(f"round((SELECT c FROM cent WHERE cent.label = coss.label AND cent.dim = {j}), 6) AS c{j}" for j in range(4))},
           round(CAST(scos AS DOUBLE) / n_vecs / 1000000000.0, 6) AS mean_cos
    FROM coss
    """,
    doc=(
        "per-label embedding centroids (exact fixed-point dimension sums "
        "— no float accumulation order anywhere) with the mean cosine of "
        "members to their own centroid: the cluster-compactness summary "
        "behind ann_ivf_topk's coarse quantizer; first 4 centroid dims "
        "shown"
    ),
)
def label_centroids(spark, sf_dir):
    """Dimension explode -> per-(label, dim) fixed-point integer sums "
    "(exact at any partitioning) -> centroid rationals -> one equi-join "
    "back scoring each vector's cosine from per-dim fixed-point terms. "
    "Every cross-row reduction is an integer sum; floats only appear in "
    "per-row deterministic expressions."""
    em = _t(spark, sf_dir, "embeddings")
    e = em.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("dim", "v0"),
    ).select("vec_id", "label", "dim", F.col("v0").cast("double").alias("v"))
    e = _persist_evict(e)
    cs = e.groupBy("label", "dim").agg(
        F.sum(F.round(F.col("v") * _LC_FP).cast("long")).cast("long").alias("sfp"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    cent = cs.select(
        "label",
        "dim",
        (F.col("sfp").cast("double") / (F.col("n") * _LC_FP)).alias("c"),
        "n",
    )
    cent = _persist_evict(cent)
    fp9 = 1000000000.0
    dots = (
        e.join(F.broadcast(cent.select("label", "dim", "c")), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.round(F.col("v") * F.col("c") * fp9).cast("long"))
            .cast("long")
            .alias("dvc"),
            F.sum(F.round(F.col("v") * F.col("v") * fp9).cast("long"))
            .cast("long")
            .alias("dvv"),
            F.sum(F.round(F.col("c") * F.col("c") * fp9).cast("long"))
            .cast("long")
            .alias("dcc"),
        )
    )
    cos = F.col("dvc").cast("double") / F.sqrt(F.col("dvv").cast("double")) / F.sqrt(
        F.col("dcc").cast("double")
    )
    coss = dots.groupBy("label").agg(
        F.sum(F.round(cos * fp9).cast("long")).cast("long").alias("scos"),
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
    )
    cw = cent.filter(F.col("dim") < 4).groupBy("label").pivot("dim", [0, 1, 2, 3]).agg(
        F.first("c")
    )
    cw = cw.select(
        "label",
        *[F.round(F.col(str(j)), 6).alias(f"c{j}") for j in range(4)],
    )
    return coss.join(F.broadcast(cw), "label").select(
        "label",
        "n_vecs",
        "c0",
        "c1",
        "c2",
        "c3",
        F.round(F.col("scos").cast("double") / F.col("n_vecs") / fp9, 6).alias(
            "mean_cos"
        ),
    )


# Turning-point randomness test ------------------------------------------------


@register(
    "turning_point_test",
    """
    WITH d AS (
      SELECT CAST(date_diff('day', (SELECT min(CAST(ts AS DATE)) FROM events),
                            CAST(ts AS DATE)) AS BIGINT) AS t
      FROM events
    ),
    y AS (SELECT t, CAST(count(*) AS BIGINT) AS y FROM d GROUP BY t),
    q AS (
      SELECT t, y,
             lag(y) OVER (ORDER BY t) AS yp,
             lead(y) OVER (ORDER BY t) AS yn
      FROM y
    ),
    tp AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN yp IS NOT NULL AND yn IS NOT NULL
                            AND (y - yp) * (yn - y) < 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_turning
      FROM q
    )
    SELECT n AS n_days, n_turning,
           round((CAST(n_turning AS DOUBLE) - 2.0 * (n - 2) / 3.0)
                 / sqrt((16.0 * n - 29.0) / 90.0), 6) AS z
    FROM tp
    """,
    doc=(
        "turning-point randomness test on the daily event-count series: "
        "count of strict local extrema vs the E[T] = 2(n-2)/3, "
        "var = (16n-29)/90 null — the i.i.d. diagnostic beside runs_test "
        "(which tests signs, not shape); all-integer until the closing z"
    ),
)
def turning_point_test(spark, sf_dir):
    """One rollup to the O(days) frame, a lag/lead window and two exact
    counts — the closing z is the only float."""
    ev = _t(spark, sf_dir, "events")
    dmin = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    y = (
        ev.crossJoin(F.broadcast(dmin))
        .groupBy(F.datediff(F.to_date("ts"), F.col("d0")).cast("long").alias("t"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    w = Window.orderBy("t")
    q = y.select(
        "t",
        "y",
        F.lag("y").over(w).alias("yp"),
        F.lead("y").over(w).alias("yn"),
    )
    tp = q.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(
                F.col("yp").isNotNull()
                & F.col("yn").isNotNull()
                & ((F.col("y") - F.col("yp")) * (F.col("yn") - F.col("y")) < 0),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_turning"),
    )
    return tp.select(
        F.col("n").alias("n_days"),
        "n_turning",
        F.round(
            (F.col("n_turning").cast("double") - 2.0 * (F.col("n") - 2) / 3.0)
            / F.sqrt((16.0 * F.col("n") - 29.0) / 90.0),
            6,
        ).alias("z"),
    )


# Gumbel fit of block maxima ---------------------------------------------------

_EULER_GAMMA = 0.5772156649015329


@register(
    "gumbel_fit_extremes",
    f"""
    WITH m AS (
      SELECT CAST(ts AS DATE) AS day,
             max(CAST(round(value * 100, 0) AS BIGINT)) AS mx
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    mo AS (
      SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(mx) AS HUGEINT) AS s,
             sum(CAST(mx AS HUGEINT) * mx) AS q
      FROM m
    ),
    fit AS (
      SELECT CAST(n AS BIGINT) AS n_days,
             sqrt(CAST(n * q - s * s AS DOUBLE)
                  / CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0))
               * sqrt(6.0) / {_SOLAR_PI!r} AS beta,
             CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS xbar
      FROM mo
    )
    SELECT n_days,
           round(xbar - {_EULER_GAMMA!r} * beta, 6) AS mu,
           round(beta, 6) AS beta,
           round(xbar - {_EULER_GAMMA!r} * beta
                 - beta * (-2.2503673273124454), 6) AS return_level_10,
           round(xbar - {_EULER_GAMMA!r} * beta
                 - beta * (-4.600149226776579), 6) AS return_level_100
    FROM fit
    """,
    doc=(
        "Gumbel extreme-value fit of daily block maxima (method of "
        "moments: beta = s*sqrt(6)/pi, mu = mean - gamma*beta with "
        "literal Euler-Mascheroni/pi constants) and the 10/100-block "
        "return levels — the EVT tail model beside grubbs_test's "
        "single-outlier view; exact integer moments into closed-form "
        "floats"
    ),
)
def gumbel_fit_extremes(spark, sf_dir):
    """One block-max rollup (O(days)), one exact-moment aggregate, then
    single-row float algebra with shared literal constants — identical
    expression trees on both engines."""
    d38 = "decimal(38,0)"
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    m = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.max(F.round(F.col("value") * 100, 0).cast("long")).alias("mx")
    )
    mo = m.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("mx").cast(d38).alias("s"),
        F.sum(F.col("mx").cast(d38) * F.col("mx")).alias("q"),
    )
    nd = F.col("n").cast("double")
    beta = (
        F.sqrt(
            (F.col("n") * F.col("q") - F.col("s") * F.col("s")).cast("double")
            / nd
            / (nd - 1.0)
        )
        * F.sqrt(F.lit(6.0))
        / _SOLAR_PI
    )
    xbar = F.col("s").cast("double") / nd
    fit = mo.select(
        F.col("n").cast("long").alias("n_days"),
        beta.alias("beta"),
        xbar.alias("xbar"),
    )
    mu = F.col("xbar") - _EULER_GAMMA * F.col("beta")
    return fit.select(
        "n_days",
        F.round(mu, 6).alias("mu"),
        F.round("beta", 6).alias("beta"),
        F.round(mu - F.col("beta") * -2.2503673273124454, 6).alias("return_level_10"),
        F.round(mu - F.col("beta") * -4.600149226776579, 6).alias("return_level_100"),
    )


# Bradley-Terry preference strengths -------------------------------------------

_BT_N = 20
_BT_ITERS = 5
_BT_FP = 1000000000000.0


def _bt_oracle_sql() -> str:
    head = f"""
    WITH oi AS MATERIALIZED (
      SELECT l_orderkey AS o, l_partkey % {_BT_N} AS item,
             CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    cmp AS MATERIALIZED (
      SELECT a.item AS i, b.item AS j,
             CAST(count(*) AS BIGINT) AS n_ij,
             CAST(sum(CASE WHEN a.q > b.q THEN 1 ELSE 0 END) AS BIGINT) AS w_ij
      FROM oi a JOIN oi b ON a.o = b.o AND a.item < b.item AND a.q <> b.q
      GROUP BY 1, 2
    ),
    pairs AS MATERIALIZED (
      SELECT i, j, n_ij, w_ij FROM cmp
      UNION ALL SELECT j AS i, i AS j, n_ij, n_ij - w_ij AS w_ij FROM cmp
    ),
    wins AS MATERIALIZED (
      SELECT i, CAST(sum(w_ij) AS BIGINT) AS w FROM pairs GROUP BY i),
    p0 AS MATERIALIZED (SELECT i, 1.0 AS p FROM wins)"""
    steps = []
    for k in range(1, _BT_ITERS + 1):
        steps.append(f"""
    d{k} AS MATERIALIZED (
      SELECT pairs.i AS i,
             CAST(sum(CAST(round(pairs.n_ij / (pi.p + pj.p) * {_BT_FP!r})
                  AS BIGINT)) AS BIGINT) AS den_fp
      FROM pairs
      JOIN p{k - 1} pi ON pi.i = pairs.i
      JOIN p{k - 1} pj ON pj.i = pairs.j
      GROUP BY pairs.i
    ),
    r{k} AS MATERIALIZED (
      SELECT wins.i AS i,
             CAST(wins.w AS DOUBLE) / (CAST(den_fp AS DOUBLE) / {_BT_FP!r}) AS pr
      FROM wins JOIN d{k} ON d{k}.i = wins.i
    ),
    s{k} AS MATERIALIZED (
      SELECT CAST(sum(CAST(round(pr * {_BT_FP!r}) AS BIGINT)) AS BIGINT) AS tot
      FROM r{k}
    ),
    p{k} AS MATERIALIZED (
      SELECT i, pr * {_BT_N}.0 * {_BT_FP!r} / tot AS p FROM r{k}, s{k}
    )""")
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT wins.i AS item, wins.w AS w_total, round(p.p, 6) AS strength
    FROM wins JOIN p{_BT_ITERS} p ON p.i = wins.i
    """
    )


@register(
    "bradley_terry",
    _bt_oracle_sql(),
    doc=(
        f"Bradley-Terry preference strengths over {_BT_N} part buckets "
        "(within-order quantity comparisons as pairwise contests), "
        f"{_BT_ITERS} fixed MM iterations normalized to mean 1 — the "
        "paired-comparison ranking model beside hits/pagerank; per-term "
        "1e-12 fixed-point keeps every cross-pair fold an exact integer "
        "sum"
    ),
)
def bradley_terry(spark, sf_dir):
    """The contest matrix is a per-order self-join collapsed to "
    "O(items^2) rows once; each MM round is one broadcast join of the "
    "20-row strength frame into the pair frame + a fixed-point partial "
    "agg — no data-proportional work after the first groupBys. "
    "Normalization divides by an exact integer total, so the rounds "
    "stay bit-identical across engines."""
    li = _t(spark, sf_dir, "lineitem")
    oi = _persist_evict(
        li.groupBy(
            F.col("l_orderkey").alias("o"), (F.col("l_partkey") % _BT_N).alias("item")
        ).agg(F.sum(F.round(F.col("l_quantity") * 100, 0).cast("long")).cast("long").alias("q"))
    )
    a = oi.select("o", F.col("item").alias("i"), F.col("q").alias("qi"))
    b = oi.select("o", F.col("item").alias("j"), F.col("q").alias("qj"))
    cmp_ = (
        a.join(b, "o")
        .filter((F.col("i") < F.col("j")) & (F.col("qi") != F.col("qj")))
        .groupBy("i", "j")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ij"),
            F.sum(F.when(F.col("qi") > F.col("qj"), 1).otherwise(0))
            .cast("long")
            .alias("w_ij"),
        )
    )
    pairs = _persist_evict(
        cmp_.select("i", "j", "n_ij", "w_ij").unionAll(
            cmp_.select(
                F.col("j").alias("i"),
                F.col("i").alias("j"),
                "n_ij",
                (F.col("n_ij") - F.col("w_ij")).alias("w_ij"),
            )
        )
    )
    wins = _persist_evict(
        pairs.groupBy("i").agg(F.sum("w_ij").cast("long").alias("w"))
    )
    p = wins.select("i", F.lit(1.0).alias("p"))
    for _ in range(_BT_ITERS):
        pi = p.select(F.col("i"), F.col("p").alias("p_i"))
        pj = p.select(F.col("i").alias("j"), F.col("p").alias("p_j"))
        den = (
            pairs.join(F.broadcast(pi), "i")
            .join(F.broadcast(pj), "j")
            .groupBy("i")
            .agg(
                F.sum(
                    F.round(
                        F.col("n_ij") / (F.col("p_i") + F.col("p_j")) * _BT_FP
                    ).cast("long")
                )
                .cast("long")
                .alias("den_fp")
            )
        )
        r = wins.join(den, "i").select(
            "i",
            (
                F.col("w").cast("double")
                / (F.col("den_fp").cast("double") / _BT_FP)
            ).alias("pr"),
        )
        s = r.agg(
            F.sum(F.round(F.col("pr") * _BT_FP).cast("long")).cast("long").alias("tot")
        )
        p = r.crossJoin(F.broadcast(s)).select(
            "i", (F.col("pr") * _BT_N * _BT_FP / F.col("tot")).alias("p")
        )
        p = p.localCheckpoint()
    return wins.join(p, "i").select(
        F.col("i").alias("item"),
        F.col("w").alias("w_total"),
        F.round("p", 6).alias("strength"),
    )


# Spectral coherence of two diurnal series -------------------------------------

_SC_FP = 1000000.0


def _coherence_oracle_sql() -> str:
    def fold(t, k, tab):
        return " + ".join(
            f"CAST(round(n{t}_{h} * ({tab[k][h]!r}) * {_SC_FP!r}) AS BIGINT)"
            for h in range(24)
        )

    piv = ", ".join(
        f"CAST(sum(CASE WHEN h = {h} AND et = 'click' THEN 1 ELSE 0 END) AS DOUBLE) AS na_{h}, "
        f"CAST(sum(CASE WHEN h = {h} AND et = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) AS nb_{h}"
        for h in range(24)
    )
    rows = []
    for k in _DH_K:
        xc, xs = fold("a", k, _DH_COS), fold("a", k, _DH_SIN)
        yc, ys = fold("b", k, _DH_COS), fold("b", k, _DH_SIN)
        rows.append(f"""
    SELECT CAST({k} AS BIGINT) AS k,
           CAST(sum(CAST(({xc}) AS HUGEINT) * ({yc})
                    + CAST(({xs}) AS HUGEINT) * ({ys})) AS DOUBLE) AS cre,
           CAST(sum(CAST(({xs}) AS HUGEINT) * ({yc})
                    - CAST(({xc}) AS HUGEINT) * ({ys})) AS DOUBLE) AS cim,
           CAST(sum(CAST(({xc}) AS HUGEINT) * ({xc})
                    + CAST(({xs}) AS HUGEINT) * ({xs})) AS DOUBLE) AS sxx,
           CAST(sum(CAST(({yc}) AS HUGEINT) * ({yc})
                    + CAST(({ys}) AS HUGEINT) * ({ys})) AS DOUBLE) AS syy
    FROM piv""")
    body = " UNION ALL ".join(rows)
    return f"""
    WITH e AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
             event_type AS et
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    piv AS (
      SELECT day, {piv} FROM e GROUP BY day
    ),
    sp AS ({body})
    SELECT k,
           round((cre * cre + cim * cim) / (sxx * syy), 6) AS coherence,
           round(atan2(cim, cre), 6) AS phase
    FROM sp ORDER BY k
    """


@register(
    "spectral_coherence",
    _coherence_oracle_sql(),
    doc=(
        "magnitude-squared coherence and phase between the click and "
        "purchase diurnal series at harmonics k=1..4: per-day DFT "
        "components from the shared literal trig tables (fixed-point "
        "1e-6 per-term rounding -> exact integer day components), "
        "cross-spectra averaged over days as exact 128-bit sums — does "
        "purchasing track clicking through the day, and at what lag?"
    ),
)
def spectral_coherence(spark, sf_dir):
    """One (day, hour, type) rollup pivots to 48 fixed-order columns per "
    "day; every per-day DFT component is an exact fixed-point integer "
    "(literal trig, no engine cos/sin), and the cross-day spectral sums "
    "accumulate in decimal(38,0) — the whole estimator is "
    "aggregation-order free."""
    d38 = "decimal(38,0)"
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    e = ev.select(
        F.to_date("ts").alias("day"),
        F.hour("ts").cast("long").alias("h"),
        F.col("event_type").alias("et"),
    )
    piv = e.groupBy("day").agg(
        *[
            c
            for h in range(24)
            for c in (
                F.sum(F.when((F.col("h") == h) & (F.col("et") == "click"), 1).otherwise(0))
                .cast("double")
                .alias(f"na_{h}"),
                F.sum(
                    F.when((F.col("h") == h) & (F.col("et") == "purchase"), 1).otherwise(0)
                )
                .cast("double")
                .alias(f"nb_{h}"),
            )
        ]
    )
    piv = _persist_evict(piv)

    def fold(t, k, tab):
        return _fold_sum(
            [
                F.round(F.col(f"n{t}_{h}") * F.lit(tab[k][h]) * _SC_FP).cast("long")
                for h in range(24)
            ]
        )

    rows = []
    for k in _DH_K:
        xc, xs = fold("a", k, _DH_COS), fold("a", k, _DH_SIN)
        yc, ys = fold("b", k, _DH_COS), fold("b", k, _DH_SIN)
        sp = piv.agg(
            F.sum(xc.cast(d38) * yc + xs.cast(d38) * ys).cast("double").alias("cre"),
            F.sum(xs.cast(d38) * yc - xc.cast(d38) * ys).cast("double").alias("cim"),
            F.sum(xc.cast(d38) * xc + xs.cast(d38) * xs).cast("double").alias("sxx"),
            F.sum(yc.cast(d38) * yc + ys.cast(d38) * ys).cast("double").alias("syy"),
        )
        rows.append(
            sp.select(
                F.lit(k).cast("long").alias("k"),
                F.round(
                    (F.col("cre") * F.col("cre") + F.col("cim") * F.col("cim"))
                    / (F.col("sxx") * F.col("syy")),
                    6,
                ).alias("coherence"),
                F.round(F.atan2(F.col("cim"), F.col("cre")), 6).alias("phase"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


# Permutation entropy ----------------------------------------------------------


def _pe_rank_sql(a: str, b: str, c: str) -> str:
    """rank of {a} among (a, b, c) with index tie-break (a wins ties vs
    later elements)."""
    return (
        f"(CASE WHEN {b} < {a} THEN 1 ELSE 0 END"
        f" + CASE WHEN {c} < {a} THEN 1 ELSE 0 END)"
    )


@register(
    "permutation_entropy",
    f"""
    WITH d AS (
      SELECT CAST(date_diff('day', (SELECT min(CAST(ts AS DATE)) FROM events),
                            CAST(ts AS DATE)) AS BIGINT) AS t
      FROM events
    ),
    y AS (SELECT t, CAST(count(*) AS BIGINT) AS y FROM d GROUP BY t),
    q AS (
      SELECT t, y AS y0,
             lead(y, 1) OVER (ORDER BY t) AS y1,
             lead(y, 2) OVER (ORDER BY t) AS y2
      FROM y
    ),
    pat AS (
      SELECT 100 * ({_pe_rank_sql("y0", "y1", "y2")})
             + 10 * ({_pe_rank_sql("y1", "y0 - 1", "y2")})
             + ({_pe_rank_sql("y2", "y0 - 1", "y1 - 1")}) AS code
      FROM q WHERE y1 IS NOT NULL AND y2 IS NOT NULL
    ),
    cnt AS (SELECT code, CAST(count(*) AS BIGINT) AS c FROM pat GROUP BY code),
    piv AS (
      SELECT {", ".join(f"CAST(sum(CASE WHEN code = {code} THEN c ELSE 0 END) AS DOUBLE) AS c_{i}" for i, code in enumerate((12, 21, 102, 120, 201, 210)))},
             CAST(sum(c) AS DOUBLE) AS n
      FROM cnt
    )
    SELECT CAST(n AS BIGINT) AS n_windows,
           round(-({" + ".join(f"CASE WHEN c_{i} > 0 THEN c_{i} / n * ln(c_{i} / n) ELSE 0.0 END" for i in range(6))}), 6) AS h,
           round(-({" + ".join(f"CASE WHEN c_{i} > 0 THEN c_{i} / n * ln(c_{i} / n) ELSE 0.0 END" for i in range(6))}) / ln(6.0), 6) AS h_norm
    FROM piv
    """,
    doc=(
        "order-3 permutation entropy of the daily event-count series: "
        "each 3-day window maps to its ordinal pattern (index tie-break "
        "keeps ties deterministic: earlier day wins), Shannon entropy of "
        "the 6-pattern distribution — the complexity measure beside "
        "entropy_rate (values) and turning_point_test (extrema); "
        "fixed-order 6-term fold, exact counts"
    ),
)
def permutation_entropy(spark, sf_dir):
    """One O(days) rollup, one lead window, a CASE-algebra pattern code "
    "and a 6-column fixed-order pivot — the entropy fold is bit-"
    "identical to the SQL's ' + '.join."""
    ev = _t(spark, sf_dir, "events")
    dmin = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    y = (
        ev.crossJoin(F.broadcast(dmin))
        .groupBy(F.datediff(F.to_date("ts"), F.col("d0")).cast("long").alias("t"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    w = Window.orderBy("t")
    q = y.select(
        F.col("y").alias("y0"),
        F.lead("y", 1).over(w).alias("y1"),
        F.lead("y", 2).over(w).alias("y2"),
    ).filter(F.col("y1").isNotNull() & F.col("y2").isNotNull())

    def rank(a, b, c):
        return F.when(b < a, 1).otherwise(0) + F.when(c < a, 1).otherwise(0)

    y0, y1, y2 = F.col("y0"), F.col("y1"), F.col("y2")
    # element i counts j as smaller iff y_j < y_i, or y_j == y_i with
    # j < i (stable argsort tie-break); (y - 1 < x) == (y <= x) on integers
    code = (
        100 * rank(y0, y1, y2)
        + 10 * rank(y1, y0 - 1, y2)
        + rank(y2, y0 - 1, y1 - 1)
    )
    cnt = q.select(code.alias("code")).groupBy("code").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    codes = (12, 21, 102, 120, 201, 210)
    piv = cnt.agg(
        *[
            F.sum(F.when(F.col("code") == cd, F.col("c")).otherwise(0))
            .cast("double")
            .alias(f"c_{i}")
            for i, cd in enumerate(codes)
        ],
        F.sum("c").cast("double").alias("n"),
    )
    ent = _fold_sum(
        [
            F.when(
                F.col(f"c_{i}") > 0,
                F.col(f"c_{i}") / F.col("n") * F.log(F.col(f"c_{i}") / F.col("n")),
            ).otherwise(0.0)
            for i in range(6)
        ]
    )
    import math as _math

    return piv.select(
        F.col("n").cast("long").alias("n_windows"),
        F.round(-ent, 6).alias("h"),
        F.round(-ent / _math.log(6.0), 6).alias("h_norm"),
    )


# Odds ratio with Woolf CI -----------------------------------------------------


@register(
    "odds_ratio_ci",
    """
    WITH s AS (
      SELECT CASE WHEN isodow(CAST(ts AS TIMESTAMP)) >= 6 THEN 1 ELSE 0 END AS wkend,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events
    ),
    t AS (
      SELECT CAST(sum(CASE WHEN wkend = 1 AND pos = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN wkend = 1 AND pos = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(sum(CASE WHEN wkend = 0 AND pos = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(sum(CASE WHEN wkend = 0 AND pos = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM s
    )
    SELECT a, b, c, d,
           round(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 6) AS odds_ratio,
           round(exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                 - 1.96 * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)), 6) AS ci_lo,
           round(exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                 + 1.96 * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)), 6) AS ci_hi
    FROM t
    """,
    doc=(
        "weekend-vs-weekday purchase odds ratio with the Woolf 95% CI "
        "(ln OR +/- 1.96*sqrt(1/a+1/b+1/c+1/d)) — the epidemiology-style "
        "2x2 effect measure beside ab_test_ztest's difference of "
        "proportions; exact cell counts, fixed-order 4-term variance fold"
    ),
)
def odds_ratio_ci(spark, sf_dir):
    """One conditional-count aggregate (partial-agg, four integers), one
    single-row float expression. weekday() in Spark (0 = Monday) and
    isodow() in DuckDB (1 = Monday) agree on the weekend predicate."""
    ev = _t(spark, sf_dir, "events")
    wkend = F.when(F.expr("weekday(cast(ts as timestamp))") >= 5, 1).otherwise(0)
    pos = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    s = ev.select(wkend.alias("wkend"), pos.alias("pos"))
    t = s.agg(
        F.sum(F.when((F.col("wkend") == 1) & (F.col("pos") == 1), 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when((F.col("wkend") == 1) & (F.col("pos") == 0), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when((F.col("wkend") == 0) & (F.col("pos") == 1), 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when((F.col("wkend") == 0) & (F.col("pos") == 0), 1).otherwise(0))
        .cast("long")
        .alias("d"),
    )
    orx = F.col("a").cast("double") * F.col("d") / (
        F.col("b").cast("double") * F.col("c")
    )
    se = F.sqrt(
        _fold_sum(
            [1.0 / F.col("a"), 1.0 / F.col("b"), 1.0 / F.col("c"), 1.0 / F.col("d")]
        )
    )
    return t.select(
        "a",
        "b",
        "c",
        "d",
        F.round(orx, 6).alias("odds_ratio"),
        F.round(F.exp(F.log(orx) - 1.96 * se), 6).alias("ci_lo"),
        F.round(F.exp(F.log(orx) + 1.96 * se), 6).alias("ci_hi"),
    )


# Sun-synchronous ground track -------------------------------------------------

# Circular sun-synchronous orbit, VIIRS-like: inclination 98.7 deg,
# period 101.5 min; Earth sidereal rotation 86164 s. All literals shared
# by both engines; one simulated day at 1-minute steps.
_GT_INCL = 98.7 * _SOLAR_PI / 180.0
_GT_PERIOD_S = 6090.0
_GT_OMEGA_E = 2.0 * _SOLAR_PI / 86164.0


@register(
    "ground_track",
    f"""
    WITH m AS (SELECT CAST(unnest(generate_series(0, 1439)) AS BIGINT) AS minute),
    t AS (
      SELECT minute, minute * 60.0 AS ts,
             2.0 * {_SOLAR_PI!r} * (minute * 60.0) / {_GT_PERIOD_S!r} AS u
      FROM m
    ),
    g AS (
      SELECT minute,
             CAST(floor(ts / {_GT_PERIOD_S!r}) AS BIGINT) AS orbit,
             asin(sin({_GT_INCL!r}) * sin(u)) * 180.0 / {_SOLAR_PI!r} AS lat,
             atan2(cos({_GT_INCL!r}) * sin(u), cos(u)) * 180.0 / {_SOLAR_PI!r}
               - {_GT_OMEGA_E!r} * ts * 180.0 / {_SOLAR_PI!r} AS lon0
      FROM t
    )
    SELECT minute, orbit,
           round(lat, 6) AS lat,
           round(lon0 - 360.0 * floor((lon0 + 180.0) / 360.0), 6) AS lon
    FROM g ORDER BY minute
    """,
    doc=(
        "sun-synchronous satellite ground track (VIIRS-like circular "
        "orbit: inclination 98.7 deg, 101.5-min period) for one day at "
        "1-minute steps: spherical orbit propagation + Earth-rotation "
        "longitude drift, normalized to [-180, 180) — the overpass "
        "geometry behind the granule corpus "
        "(reference: orbital tiling in src/FILDA2/FILDA_Time_Cord.py)"
    ),
)
def ground_track(spark, sf_dir):
    """A generated 1440-row frame with closed-form spherical propagation
    — literal orbit constants, structure-identical trig on both engines,
    floor-based longitude wrap (no engine fmod sign ambiguity). Data-free
    like tissot_sinusoidal."""
    m = spark.range(0, 1440).select(F.col("id").cast("long").alias("minute"))
    ts = F.col("minute") * 60.0
    u = 2.0 * _SOLAR_PI * ts / _GT_PERIOD_S
    g = m.select(
        "minute",
        F.floor(ts / _GT_PERIOD_S).cast("long").alias("orbit"),
        (F.asin(F.sin(F.lit(_GT_INCL)) * F.sin(u)) * 180.0 / _SOLAR_PI).alias("lat"),
        (
            F.atan2(F.cos(F.lit(_GT_INCL)) * F.sin(u), F.cos(u)) * 180.0 / _SOLAR_PI
            - _GT_OMEGA_E * ts * 180.0 / _SOLAR_PI
        ).alias("lon0"),
    )
    return g.select(
        "minute",
        "orbit",
        F.round("lat", 6).alias("lat"),
        F.round(
            F.col("lon0") - 360.0 * F.floor((F.col("lon0") + 180.0) / 360.0), 6
        ).alias("lon"),
    )


# Swath coverage ---------------------------------------------------------------

_SW_HALF_KM = 1500.0  # half swath width
_SW_CELL = 5  # degrees


@register(
    "swath_coverage",
    f"""
    WITH m AS (SELECT CAST(unnest(generate_series(0, 1439)) AS BIGINT) AS minute),
    t AS (
      SELECT minute, minute * 60.0 AS ts,
             2.0 * {_SOLAR_PI!r} * (minute * 60.0) / {_GT_PERIOD_S!r} AS u
      FROM m
    ),
    g AS (
      SELECT minute, CAST(floor(ts / {_GT_PERIOD_S!r}) AS BIGINT) AS orbit,
             asin(sin({_GT_INCL!r}) * sin(u)) AS phi,
             radians((atan2(cos({_GT_INCL!r}) * sin(u), cos(u))
                      * 180.0 / {_SOLAR_PI!r}
                      - {_GT_OMEGA_E!r} * ts * 180.0 / {_SOLAR_PI!r})
                     - 360.0 * floor(((atan2(cos({_GT_INCL!r}) * sin(u), cos(u))
                        * 180.0 / {_SOLAR_PI!r}
                        - {_GT_OMEGA_E!r} * ts * 180.0 / {_SOLAR_PI!r}) + 180.0)
                       / 360.0)) AS lam
      FROM t
    ),
    cells AS (
      SELECT CAST(cy.c AS BIGINT) AS cy, CAST(cx.c AS BIGINT) AS cx,
             radians(cy.c * {_SW_CELL}.0 + {_SW_CELL / 2.0!r}) AS cphi,
             radians(cx.c * {_SW_CELL}.0 + {_SW_CELL / 2.0!r}) AS clam
      FROM (SELECT unnest(generate_series(-18, 17)) AS c) cy
      CROSS JOIN (SELECT unnest(generate_series(-36, 35)) AS c) cx
    ),
    hit AS (
      SELECT cells.cy AS cy, cells.cx AS cx, g.minute AS minute, g.orbit AS orbit
      FROM cells JOIN g
        ON 2.0 * 6371.0 * asin(sqrt(
             sin((cells.cphi - g.phi) / 2.0) * sin((cells.cphi - g.phi) / 2.0)
             + cos(g.phi) * cos(cells.cphi)
               * sin((cells.clam - g.lam) / 2.0)
               * sin((cells.clam - g.lam) / 2.0))) < {_SW_HALF_KM!r}
    )
    SELECT cy, cx, CAST(count(*) AS BIGINT) AS n_pts,
           CAST(count(DISTINCT orbit) AS BIGINT) AS n_orbits
    FROM hit GROUP BY cy, cx
    """,
    doc=(
        f"daily swath coverage: which {_SW_CELL}-degree cells fall "
        f"within the {_SW_HALF_KM:.0f}-km half-swath of the simulated "
        "ground track, and by how many orbits — the coverage/revisit "
        "analysis behind get_files' granule pruning (a cell with "
        "n_orbits = 0 never yields a granule that day)"
    ),
)
def swath_coverage(spark, sf_dir):
    """Track (1440 rows) x cell (2592 rows) is a bounded broadcast "
    "nested-loop join on the haversine predicate — both frames are "
    "generated constants, so the plan size is data-independent; per-pair "
    "trig is structure-identical on both engines and the aggregates are "
    "exact counts. At production scale the join would pre-filter by "
    "latitude band (|cphi - phi| bound) before the exact test."""
    m = spark.range(0, 1440).select(F.col("id").cast("long").alias("minute"))
    ts = F.col("minute") * 60.0
    u = 2.0 * _SOLAR_PI * ts / _GT_PERIOD_S
    lon0 = (
        F.atan2(F.cos(F.lit(_GT_INCL)) * F.sin(u), F.cos(u)) * 180.0 / _SOLAR_PI
        - _GT_OMEGA_E * ts * 180.0 / _SOLAR_PI
    )
    g = m.select(
        "minute",
        F.floor(ts / _GT_PERIOD_S).cast("long").alias("orbit"),
        F.asin(F.sin(F.lit(_GT_INCL)) * F.sin(u)).alias("phi"),
        F.radians(
            lon0 - 360.0 * F.floor((lon0 + 180.0) / 360.0)
        ).alias("lam"),
    )
    cy = spark.range(-18, 18).select(F.col("id").cast("long").alias("cy"))
    cx = spark.range(-36, 36).select(F.col("id").cast("long").alias("cx"))
    cells = cy.crossJoin(cx).select(
        "cy",
        "cx",
        F.radians(F.col("cy") * float(_SW_CELL) + _SW_CELL / 2.0).alias("cphi"),
        F.radians(F.col("cx") * float(_SW_CELL) + _SW_CELL / 2.0).alias("clam"),
    )
    dphi = (F.col("cphi") - F.col("phi")) / 2.0
    dlam = (F.col("clam") - F.col("lam")) / 2.0
    hav = 2.0 * 6371.0 * F.asin(
        F.sqrt(
            F.sin(dphi) * F.sin(dphi)
            + F.cos(F.col("phi")) * F.cos(F.col("cphi")) * F.sin(dlam) * F.sin(dlam)
        )
    )
    hit = cells.join(F.broadcast(g), hav < _SW_HALF_KM)
    return hit.groupBy("cy", "cx").agg(
        F.count(F.lit(1)).cast("long").alias("n_pts"),
        F.countDistinct("orbit").cast("long").alias("n_orbits"),
    )


# Weight of evidence / information value ---------------------------------------


def _woe_oracle_sql() -> str:
    iv = " + ".join(
        f"(p_{i} / pt - n_{i} / nt) * ln((p_{i} / pt) / (n_{i} / nt))"
        for i in range(1, 11)
    )
    piv = ", ".join(
        f"CAST(sum(CASE WHEN decile = {i} THEN n_pos ELSE 0 END) AS DOUBLE) AS p_{i}, "
        f"CAST(sum(CASE WHEN decile = {i} THEN n - n_pos ELSE 0 END) AS DOUBLE) AS n_{i}"
        for i in range(1, 11)
    )
    return f"""
    WITH s AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS sc, event_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events WHERE value IS NOT NULL
    ),
    d AS (
      SELECT pos, ntile(10) OVER (ORDER BY sc DESC, event_id) AS decile FROM s
    ),
    gg AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pos) AS BIGINT) AS n_pos
      FROM d GROUP BY decile
    ),
    piv AS (SELECT {piv}, CAST(sum(n_pos) AS DOUBLE) AS pt,
                   CAST(sum(n - n_pos) AS DOUBLE) AS nt
            FROM gg),
    ivv AS (SELECT round({iv}, 6) AS iv FROM piv)
    SELECT decile, n, n_pos,
           round(ln((CAST(n_pos AS DOUBLE) / pt)
                 / (CAST(n - n_pos AS DOUBLE) / nt)), 6) AS woe,
           iv
    FROM gg, piv, ivv ORDER BY decile
    """


@register(
    "woe_iv",
    _woe_oracle_sql(),
    doc=(
        "weight of evidence per score decile (value cents vs the "
        "purchase label, deterministic ntile tie-break) and the total "
        "information value — the credit-scoring feature-strength measure "
        "beside lift_deciles; exact counts, fixed-order 10-term IV fold"
    ),
)
def woe_iv(spark, sf_dir):
    """Same deterministic ntile sort as lift_deciles; everything after "
    "runs on the 10-row decile frame, with the IV folded over a fixed-"
    "order pivot so the float association matches the oracle's "
    "' + '.join."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = ev.select(
        F.round(F.col("value") * 100, 0).cast("long").alias("sc"),
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    d = s.select(
        "pos",
        F.ntile(10).over(Window.orderBy(F.col("sc").desc(), "event_id")).alias(
            "decile"
        ),
    )
    gg = _persist_evict(
        d.groupBy("decile").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("pos").cast("long").alias("n_pos"),
        )
    )
    piv = gg.agg(
        *[
            c
            for i in range(1, 11)
            for c in (
                F.sum(F.when(F.col("decile") == i, F.col("n_pos")).otherwise(0))
                .cast("double")
                .alias(f"p_{i}"),
                F.sum(
                    F.when(F.col("decile") == i, F.col("n") - F.col("n_pos")).otherwise(0)
                )
                .cast("double")
                .alias(f"n_{i}"),
            )
        ],
        F.sum("n_pos").cast("double").alias("pt"),
        F.sum(F.col("n") - F.col("n_pos")).cast("double").alias("nt"),
    )
    ivx = _fold_sum(
        [
            (F.col(f"p_{i}") / F.col("pt") - F.col(f"n_{i}") / F.col("nt"))
            * F.log((F.col(f"p_{i}") / F.col("pt")) / (F.col(f"n_{i}") / F.col("nt")))
            for i in range(1, 11)
        ]
    )
    ivv = piv.select(F.round(ivx, 6).alias("iv"))
    pt = gg.agg(F.sum("n_pos").cast("double").alias("pt"),
                F.sum(F.col("n") - F.col("n_pos")).cast("double").alias("nt"))
    return (
        gg.crossJoin(F.broadcast(pt))
        .crossJoin(F.broadcast(ivv))
        .select(
            "decile",
            "n",
            "n_pos",
            F.round(
                F.log(
                    (F.col("n_pos").cast("double") / F.col("pt"))
                    / ((F.col("n") - F.col("n_pos")).cast("double") / F.col("nt"))
                ),
                6,
            ).alias("woe"),
            "iv",
        )
    )


# Leave-one-out target encoding ------------------------------------------------

_TE_CATS = 50


@register(
    "target_encoding_loo",
    f"""
    WITH s AS (
      SELECT event_id, user_id % {_TE_CATS} AS cat,
             CAST(round(value * 100, 0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    c AS (
      SELECT cat, CAST(sum(v) AS BIGINT) AS s_c, CAST(count(*) AS BIGINT) AS n_c
      FROM s GROUP BY cat
    )
    SELECT s.event_id AS event_id, s.cat AS cat,
           round(CAST(c.s_c - s.v AS DOUBLE) / (c.n_c - 1), 6) AS enc
    FROM s JOIN c ON c.cat = s.cat WHERE c.n_c > 1
    """,
    doc=(
        f"leave-one-out target encoding of the user-bucket category "
        f"({_TE_CATS} buckets) against value cents: enc_i = "
        "(S_cat - v_i)/(n_cat - 1) — the leakage-safe categorical "
        "encoder every tabular-ML pipeline ships; exact integer "
        "numerators, one division per row"
    ),
)
def target_encoding_loo(spark, sf_dir):
    """One category rollup (O(cats)) broadcast back into the stream —
    map-side encode, no second shuffle; the n_c > 1 guard is identical
    on both engines."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = ev.select(
        "event_id",
        (F.col("user_id") % _TE_CATS).alias("cat"),
        F.round(F.col("value") * 100, 0).cast("long").alias("v"),
    )
    c = s.groupBy("cat").agg(
        F.sum("v").cast("long").alias("s_c"),
        F.count(F.lit(1)).cast("long").alias("n_c"),
    )
    return (
        s.join(F.broadcast(c), "cat")
        .filter(F.col("n_c") > 1)
        .select(
            "event_id",
            "cat",
            F.round(
                (F.col("s_c") - F.col("v")).cast("double") / (F.col("n_c") - 1), 6
            ).alias("enc"),
        )
    )


# Embedding distribution drift -------------------------------------------------


@register(
    "embedding_drift",
    f"""
    WITH e AS (
      SELECT vec_id % 2 AS half, i - 1 AS dim,
             CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings CROSS JOIN unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    cs AS (
      SELECT half, dim,
             CAST(sum(CAST(round(v * {_LC_FP!r}) AS BIGINT)) AS BIGINT) AS sfp,
             CAST(count(*) AS BIGINT) AS n
      FROM e GROUP BY half, dim
    ),
    cent AS (
      SELECT dim,
             max(CASE WHEN half = 0 THEN CAST(sfp AS DOUBLE) / (n * {_LC_FP!r}) END) AS ca,
             max(CASE WHEN half = 1 THEN CAST(sfp AS DOUBLE) / (n * {_LC_FP!r}) END) AS cb,
             max(CASE WHEN half = 0 THEN n END) AS na,
             max(CASE WHEN half = 1 THEN n END) AS nb
      FROM cs GROUP BY dim
    ),
    agg AS (
      SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
             CAST(sum(CAST(round((ca - cb) * (ca - cb) * 1000000000.0) AS BIGINT))
                  AS BIGINT) AS d2,
             CAST(sum(CAST(round(ca * cb * 1000000000.0) AS BIGINT)) AS BIGINT) AS dab,
             CAST(sum(CAST(round(ca * ca * 1000000000.0) AS BIGINT)) AS BIGINT) AS daa,
             CAST(sum(CAST(round(cb * cb * 1000000000.0) AS BIGINT)) AS BIGINT) AS dbb
      FROM cent
    )
    SELECT n_a, n_b,
           round(sqrt(CAST(d2 AS DOUBLE) / 1000000000.0), 6) AS l2_drift,
           round(CAST(dab AS DOUBLE) / sqrt(CAST(daa AS DOUBLE))
                 / sqrt(CAST(dbb AS DOUBLE)), 6) AS centroid_cos
    FROM agg
    """,
    doc=(
        "embedding distribution drift between the two vec_id-parity "
        "halves: L2 distance and cosine of the half-corpus centroids "
        "(fixed-point dimension sums, exact at any partitioning) — the "
        "snapshot-comparison monitor for embedding pipelines, the "
        "vector-space twin of psi_drift"
    ),
)
def embedding_drift(spark, sf_dir):
    """Dimension explode -> per-(half, dim) fixed-point sums -> a 64-row "
    "centroid frame whose drift terms are re-quantized before the final "
    "fold, so every cross-row reduction is an exact integer sum."""
    em = _t(spark, sf_dir, "embeddings")
    e = em.select(
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(F.col("embedding")).alias("dim", "v0"),
    ).select("half", "dim", F.col("v0").cast("double").alias("v"))
    cs = e.groupBy("half", "dim").agg(
        F.sum(F.round(F.col("v") * _LC_FP).cast("long")).cast("long").alias("sfp"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    cent = cs.groupBy("dim").agg(
        F.max(
            F.when(F.col("half") == 0, F.col("sfp").cast("double") / (F.col("n") * _LC_FP))
        ).alias("ca"),
        F.max(
            F.when(F.col("half") == 1, F.col("sfp").cast("double") / (F.col("n") * _LC_FP))
        ).alias("cb"),
        F.max(F.when(F.col("half") == 0, F.col("n"))).alias("na"),
        F.max(F.when(F.col("half") == 1, F.col("n"))).alias("nb"),
    )
    fp9 = 1000000000.0
    agg = cent.agg(
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
        F.sum(
            F.round((F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb")) * fp9)
            .cast("long")
        )
        .cast("long")
        .alias("d2"),
        F.sum(F.round(F.col("ca") * F.col("cb") * fp9).cast("long"))
        .cast("long")
        .alias("dab"),
        F.sum(F.round(F.col("ca") * F.col("ca") * fp9).cast("long"))
        .cast("long")
        .alias("daa"),
        F.sum(F.round(F.col("cb") * F.col("cb") * fp9).cast("long"))
        .cast("long")
        .alias("dbb"),
    )
    return agg.select(
        "n_a",
        "n_b",
        F.round(F.sqrt(F.col("d2").cast("double") / fp9), 6).alias("l2_drift"),
        F.round(
            F.col("dab").cast("double")
            / F.sqrt(F.col("daa").cast("double"))
            / F.sqrt(F.col("dbb").cast("double")),
            6,
        ).alias("centroid_cos"),
    )


# Friedman test ----------------------------------------------------------------


def _friedman_sql() -> str:
    st = _MS_STATES
    k = len(st)
    piv = ", ".join(
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS c{i}"
        for i, t in enumerate(st)
    )

    def r2(i: int) -> str:
        less = " + ".join(
            f"CASE WHEN c{j} < c{i} THEN 1 ELSE 0 END" for j in range(k) if j != i
        )
        eq = " + ".join(
            f"CASE WHEN c{j} = c{i} THEN 1 ELSE 0 END" for j in range(k) if j != i
        )
        return f"(2 + 2 * ({less}) + ({eq}))"

    r2s = ", ".join(f"{r2(i)} AS r{i}" for i in range(k))
    sum_R2sq = " + ".join(f"CAST(R{i} AS HUGEINT) * R{i}" for i in range(k))
    sum_r2sq = " + ".join(f"CAST(r{i} AS HUGEINT) * r{i}" for i in range(k))
    Rcols = ", ".join(f"CAST(sum(r{i}) AS BIGINT) AS R{i}" for i in range(k))
    return f"""
    WITH u AS (
      SELECT user_id, {piv} FROM events GROUP BY user_id
    ),
    rk AS (SELECT user_id, {r2s} FROM u),
    ag AS (
      SELECT CAST(count(*) AS BIGINT) AS n, {Rcols},
             CAST(sum({sum_r2sq}) AS BIGINT) AS s_r2sq
      FROM rk
    )
    SELECT n, CAST({k} AS BIGINT) AS k,
           round(CAST(({k} - 1) AS DOUBLE)
                 * CAST(({sum_R2sq})
                        - CAST(n AS HUGEINT) * n * {k} * {(k + 1) ** 2} AS DOUBLE)
                 / CAST(CAST(s_r2sq AS HUGEINT)
                        - CAST(n AS HUGEINT) * {k} * {(k + 1) ** 2} AS DOUBLE), 6)
             AS chi2_f
    FROM ag
    """


@register(
    "friedman_test",
    _friedman_sql(),
    doc=(
        "Friedman rank test across the 5 event types with users as "
        "blocks (per-user counts ranked with exact tied-average doubled "
        "ranks via pairwise CASE algebra — no sort anywhere), "
        "tie-corrected statistic from pure integer sums — the "
        "repeated-measures companion to kruskal_wallis"
    ),
)
def friedman_test(spark, sf_dir):
    """One pivot groupBy (user -> 5 counts), map-side doubled-rank CASE
    algebra (k = 5 constants, 20 comparisons), and one exact-integer
    aggregate; chi2 is a single closing float division."""
    st = _MS_STATES
    k = len(st)
    d38 = "decimal(38,0)"
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("long")
            .alias(f"c{i}")
            for i, t in enumerate(st)
        ]
    )

    def r2(i):
        less = _fold_sum(
            [
                F.when(F.col(f"c{j}") < F.col(f"c{i}"), 1).otherwise(0)
                for j in range(k)
                if j != i
            ]
        )
        eq = _fold_sum(
            [
                F.when(F.col(f"c{j}") == F.col(f"c{i}"), 1).otherwise(0)
                for j in range(k)
                if j != i
            ]
        )
        return 2 + 2 * less + eq

    rk = u.select("user_id", *[r2(i).alias(f"r{i}") for i in range(k)])
    ag = rk.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        *[F.sum(f"r{i}").cast(d38).alias(f"R{i}") for i in range(k)],
        F.sum(
            _fold_sum([F.col(f"r{i}").cast(d38) * F.col(f"r{i}") for i in range(k)])
        ).alias("s_r2sq"),
    )
    sum_R2sq = _fold_sum(
        [F.col(f"R{i}") * F.col(f"R{i}") for i in range(k)]
    )
    return ag.select(
        F.col("n").cast("long").alias("n"),
        F.lit(k).cast("long").alias("k"),
        F.round(
            float(k - 1)
            * (sum_R2sq - F.col("n") * F.col("n") * k * (k + 1) ** 2).cast("double")
            / (F.col("s_r2sq") - F.col("n") * k * (k + 1) ** 2).cast("double"),
            6,
        ).alias("chi2_f"),
    )


# Cochran's Q ------------------------------------------------------------------

_CQ_WEEKS = 4


def _cochran_sql() -> str:
    k = _CQ_WEEKS
    piv = ", ".join(
        f"max(CASE WHEN wk = {w} THEN 1 ELSE 0 END) AS x{w}" for w in range(k)
    )
    Gs = ", ".join(f"CAST(sum(x{w}) AS BIGINT) AS G{w}" for w in range(k))
    sumG2 = " + ".join(f"CAST(G{w} AS HUGEINT) * G{w}" for w in range(k))
    L = " + ".join(f"x{w}" for w in range(k))
    return f"""
    WITH p AS (
      SELECT user_id,
             CAST(date_diff('day', (SELECT min(CAST(ts AS DATE)) FROM events),
                            CAST(ts AS DATE)) AS BIGINT) // 7 AS wk
      FROM events WHERE event_type = 'purchase'
    ),
    u AS (
      SELECT user_id, {piv} FROM p WHERE wk < {k} GROUP BY user_id
    ),
    ag AS (
      SELECT CAST(count(*) AS BIGINT) AS n, {Gs},
             CAST(sum({L}) AS BIGINT) AS t,
             CAST(sum(CAST(({L}) AS HUGEINT) * ({L})) AS BIGINT) AS sl2
      FROM u
    )
    SELECT n, CAST({k} AS BIGINT) AS k, t AS n_successes,
           round(CASE WHEN {k} * t - sl2 > 0
                      THEN CAST(({k} - 1) AS DOUBLE)
                           * CAST({k} * ({sumG2}) - CAST(t AS HUGEINT) * t AS DOUBLE)
                           / CAST({k} * t - sl2 AS DOUBLE)
                      ELSE 0.0 END, 6) AS q_stat
    FROM ag
    """


@register(
    "cochran_q",
    _cochran_sql(),
    doc=(
        f"Cochran's Q over {_CQ_WEEKS} weekly binary outcomes (did the "
        "user purchase in week w?): Q = (k-1)(k*sum G^2 - T^2)/(kT - "
        "sum L^2), exact integers with the degenerate-denominator guard "
        "— the k-treatment extension of mcnemar_test"
    ),
)
def cochran_q(spark, sf_dir):
    """One per-(user, week) presence pivot, one exact-integer aggregate,
    one guarded division. Users active only outside the 4-week window
    drop out on both engines identically."""
    k = _CQ_WEEKS
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    dmin = _t(spark, sf_dir, "events").agg(F.min(F.to_date("ts")).alias("d0"))
    p = ev.crossJoin(F.broadcast(dmin)).select(
        "user_id",
        F.expr("datediff(to_date(ts), d0) div 7").alias("wk"),
    )
    u = p.filter(F.col("wk") < k).groupBy("user_id").agg(
        *[
            F.max(F.when(F.col("wk") == w, 1).otherwise(0)).alias(f"x{w}")
            for w in range(k)
        ]
    )
    d38 = "decimal(38,0)"
    L = _fold_sum([F.col(f"x{w}") for w in range(k)])
    ag = u.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        *[F.sum(f"x{w}").cast(d38).alias(f"G{w}") for w in range(k)],
        F.sum(L).cast(d38).alias("t"),
        F.sum(L.cast(d38) * L).alias("sl2"),
    )
    sumG2 = _fold_sum([F.col(f"G{w}") * F.col(f"G{w}") for w in range(k)])
    den = k * F.col("t") - F.col("sl2")
    return ag.select(
        F.col("n").cast("long").alias("n"),
        F.lit(k).cast("long").alias("k"),
        F.col("t").cast("long").alias("n_successes"),
        F.round(
            F.when(
                den > 0,
                float(k - 1)
                * (k * sumG2 - F.col("t") * F.col("t")).cast("double")
                / den.cast("double"),
            ).otherwise(0.0),
            6,
        ).alias("q_stat"),
    )


# Page trend test --------------------------------------------------------------


def _page_sql() -> str:
    k = _CQ_WEEKS
    piv = ", ".join(
        f"CAST(sum(CASE WHEN wk = {w} THEN 1 ELSE 0 END) AS BIGINT) AS c{w}"
        for w in range(k)
    )

    def r2(i: int) -> str:
        less = " + ".join(
            f"CASE WHEN c{j} < c{i} THEN 1 ELSE 0 END" for j in range(k) if j != i
        )
        eq = " + ".join(
            f"CASE WHEN c{j} = c{i} THEN 1 ELSE 0 END" for j in range(k) if j != i
        )
        return f"(2 + 2 * ({less}) + ({eq}))"

    l2 = " + ".join(f"{w + 1} * {r2(w)}" for w in range(k))
    return f"""
    WITH p AS (
      SELECT user_id,
             CAST(date_diff('day', (SELECT min(CAST(ts AS DATE)) FROM events),
                            CAST(ts AS DATE)) AS BIGINT) // 7 AS wk
      FROM events
    ),
    u AS (
      SELECT user_id, {piv} FROM p WHERE wk < {k} GROUP BY user_id
    ),
    ag AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum({l2}) AS BIGINT) AS l2
      FROM u
    )
    SELECT n, CAST({k} AS BIGINT) AS k, l2 AS l2_stat,
           round(3.0 * CAST(2 * l2 - n * {k} * {(k + 1) ** 2} AS DOUBLE)
                 / ({k * (k + 1)}.0 * sqrt(CAST(n * {k - 1} AS DOUBLE))), 6)
             AS z
    FROM ag
    """


@register(
    "page_trend_test",
    _page_sql(),
    doc=(
        f"Page trend test for a monotone weekly-activity trend across "
        f"{_CQ_WEEKS} weeks (users as blocks, doubled tied ranks, "
        "L = sum j*R_j): untied normal approximation z — the ordered-"
        "alternative refinement of friedman_test"
    ),
)
def page_trend_test(spark, sf_dir):
    """Same pivot-and-CASE-rank machinery as friedman_test over the
    weekly activity counts; L folds position-weighted doubled ranks into
    one exact integer, and the z is a single closed-form float."""
    k = _CQ_WEEKS
    ev = _t(spark, sf_dir, "events")
    dmin = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    p = ev.crossJoin(F.broadcast(dmin)).select(
        "user_id", F.expr("datediff(to_date(ts), d0) div 7").alias("wk")
    )
    u = p.filter(F.col("wk") < k).groupBy("user_id").agg(
        *[
            F.sum(F.when(F.col("wk") == w, 1).otherwise(0))
            .cast("long")
            .alias(f"c{w}")
            for w in range(k)
        ]
    )

    def r2(i):
        less = _fold_sum(
            [
                F.when(F.col(f"c{j}") < F.col(f"c{i}"), 1).otherwise(0)
                for j in range(k)
                if j != i
            ]
        )
        eq = _fold_sum(
            [
                F.when(F.col(f"c{j}") == F.col(f"c{i}"), 1).otherwise(0)
                for j in range(k)
                if j != i
            ]
        )
        return 2 + 2 * less + eq

    l2 = _fold_sum([(w + 1) * r2(w) for w in range(k)])
    d38 = "decimal(38,0)"
    ag = u.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(l2).cast(d38).alias("l2"),
    )
    return ag.select(
        F.col("n").cast("long").alias("n"),
        F.lit(k).cast("long").alias("k"),
        F.col("l2").cast("long").alias("l2_stat"),
        F.round(
            3.0
            * (2 * F.col("l2") - F.col("n") * k * (k + 1) ** 2).cast("double")
            / (
                float(k * (k + 1))
                * F.sqrt((F.col("n") * (k - 1)).cast("double"))
            ),
            6,
        ).alias("z"),
    )


# Spearman footrule / Kendall distance between two item rankings ---------------

_FR_ITEMS = 50


@register(
    "rank_distance",
    f"""
    WITH it AS (
      SELECT l_partkey % {_FR_ITEMS} AS item,
             CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS qty,
             CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS rev
      FROM lineitem GROUP BY 1
    ),
    rk AS (
      SELECT item,
             CAST(row_number() OVER (ORDER BY qty DESC, item) AS BIGINT) AS ra,
             CAST(row_number() OVER (ORDER BY rev DESC, item) AS BIGINT) AS rb
      FROM it
    ),
    foot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(abs(ra - rb)) AS BIGINT) AS footrule
      FROM rk
    ),
    disc AS (
      SELECT CAST(count(*) AS BIGINT) AS kendall_dist
      FROM rk a JOIN rk b ON a.item < b.item
       AND (a.ra - b.ra) * (a.rb - b.rb) < 0
    )
    SELECT n, footrule, kendall_dist,
           round(CAST(footrule AS DOUBLE) / (n * n / 2), 6) AS footrule_norm,
           round(CAST(kendall_dist AS DOUBLE) / (n * (n - 1) / 2), 6)
             AS kendall_norm
    FROM foot, disc
    """,
    doc=(
        f"Spearman footrule and Kendall distance between the "
        f"quantity-ranked and revenue-ranked top-{_FR_ITEMS} item "
        "orderings (deterministic row_number tie-breaks): how differently "
        "do two business metrics order the catalog — the rank-aggregation "
        "distance pair behind rrf_fusion"
    ),
)
def rank_distance(spark, sf_dir):
    """One item rollup, two row_number windows over the {N}-row frame,
    one O(N^2) broadcast pair join for the discordance count — all
    integers until two display divisions."""
    li = _t(spark, sf_dir, "lineitem")
    it = li.groupBy((F.col("l_partkey") % _FR_ITEMS).alias("item")).agg(
        F.sum(F.round(F.col("l_quantity") * 100, 0).cast("long"))
        .cast("long")
        .alias("qty"),
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("rev"),
    )
    rk = _persist_evict(
        it.select(
            "item",
            F.row_number()
            .over(Window.orderBy(F.col("qty").desc(), "item"))
            .cast("long")
            .alias("ra"),
            F.row_number()
            .over(Window.orderBy(F.col("rev").desc(), "item"))
            .cast("long")
            .alias("rb"),
        )
    )
    foot = rk.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.abs(F.col("ra") - F.col("rb"))).cast("long").alias("footrule"),
    )
    a = rk.select(
        F.col("item").alias("ai"), F.col("ra").alias("ara"), F.col("rb").alias("arb")
    )
    disc = (
        a.join(
            F.broadcast(rk),
            (F.col("ai") < F.col("item"))
            & ((F.col("ara") - F.col("ra")) * (F.col("arb") - F.col("rb")) < 0),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("kendall_dist"))
    )
    return foot.crossJoin(F.broadcast(disc)).select(
        "n",
        "footrule",
        "kendall_dist",
        F.round(
            F.col("footrule").cast("double") / (F.col("n") * F.col("n") / 2), 6
        ).alias("footrule_norm"),
        F.round(
            F.col("kendall_dist").cast("double")
            / (F.col("n") * (F.col("n") - 1) / 2),
            6,
        ).alias("kendall_norm"),
    )


# Herfindahl-Hirschman concentration -------------------------------------------


@register(
    "hhi_concentration",
    """
    WITH sr AS (
      SELECT s.s_nationkey AS nation, l.l_suppkey AS supp,
             CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS rev
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2
    ),
    ag AS (
      SELECT nation, CAST(count(*) AS BIGINT) AS n_suppliers,
             CAST(sum(rev) AS HUGEINT) AS tot,
             sum(CAST(rev AS HUGEINT) * rev) AS s2
      FROM sr GROUP BY nation
    )
    SELECT nation, n_suppliers,
           round(10000.0 * CAST(s2 AS DOUBLE)
                 / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)), 6) AS hhi
    FROM ag
    """,
    doc=(
        "Herfindahl-Hirschman revenue-concentration index per supplier "
        "nation (10000 * sum of squared shares, exact integer moments): "
        "the antitrust-style market-structure measure beside "
        "lorenz_gini's inequality view"
    ),
)
def hhi_concentration(spark, sf_dir):
    """One broadcast dimension join (supplier nation), two partial-agg
    rollups, one closed-form float — the canonical share-of-total shape
    that never shuffles the fact table twice."""
    li = _t(spark, sf_dir, "lineitem")
    su = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), F.col("s_nationkey").alias("nation")
    )
    d38 = "decimal(38,0)"
    sr = (
        li.join(F.broadcast(su), "l_suppkey")
        .groupBy("nation", F.col("l_suppkey").alias("supp"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("rev")
        )
    )
    ag = sr.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum("rev").cast(d38).alias("tot"),
        F.sum(F.col("rev").cast(d38) * F.col("rev")).alias("s2"),
    )
    return ag.select(
        "nation",
        "n_suppliers",
        F.round(
            10000.0
            * F.col("s2").cast("double")
            / (F.col("tot").cast("double") * F.col("tot").cast("double")),
            6,
        ).alias("hhi"),
    )


# Generalized Pareto tail fit (peaks over threshold) ---------------------------


@register(
    "gpd_tail_fit",
    """
    WITH s AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    c AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY v),
    w AS (
      SELECT v, c,
             COALESCE(sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND 1 PRECEDING), 0) AS below
      FROM c
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c),
    u AS (
      SELECT min(CASE WHEN below + c >=
               CAST(ceil(0.95 * (SELECT n FROM tot)) AS BIGINT)
               THEN v END) AS u
      FROM w
    ),
    exc AS (
      SELECT CAST(sum(CASE WHEN v > u THEN c ELSE 0 END) AS HUGEINT) AS k,
             CAST(sum(CASE WHEN v > u THEN (v - u) * c ELSE 0 END) AS HUGEINT)
               AS sy,
             sum(CASE WHEN v > u THEN CAST(v - u AS HUGEINT) * (v - u) * c
                      ELSE 0 END) AS qy
      FROM w, u
    )
    SELECT (SELECT u FROM u) AS threshold_cents,
           CAST(k AS BIGINT) AS n_exceed,
           round(0.5 * (1.0 - (CAST(sy AS DOUBLE) / CAST(k AS DOUBLE))
                 * (CAST(sy AS DOUBLE) / CAST(k AS DOUBLE))
                 / ((CAST(k AS DOUBLE) * CAST(qy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                    / CAST(k AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0))), 6) AS xi,
           round(0.5 * (CAST(sy AS DOUBLE) / CAST(k AS DOUBLE))
                 * ((CAST(sy AS DOUBLE) / CAST(k AS DOUBLE))
                    * (CAST(sy AS DOUBLE) / CAST(k AS DOUBLE))
                    / ((CAST(k AS DOUBLE) * CAST(qy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                       / CAST(k AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0)) + 1.0),
                 6) AS beta
    FROM exc
    """,
    doc=(
        "generalized Pareto peaks-over-threshold tail fit: exact p95 "
        "threshold from the distinct-cents frame, method-of-moments "
        "xi = (1 - m^2/s^2)/2 and beta = m(m^2/s^2 + 1)/2 over the "
        "exceedances — the threshold-exceedance companion to "
        "gumbel_fit_extremes' block-maxima view; exact integer moments"
    ),
)
def gpd_tail_fit(spark, sf_dir):
    """Threshold and exceedance moments both live on the distinct-cents
    prefix frame (no row sort, no second scan); closed-form float algebra
    on a single row finishes the fit."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d38 = "decimal(38,0)"
    s = ev.select(F.round(F.col("value") * 100, 0).cast("long").alias("v"))
    c = _persist_evict(s.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("c")))
    wb = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    w = c.select("v", "c", F.coalesce(F.sum("c").over(wb), F.lit(0)).alias("below"))
    tot = c.agg(F.sum("c").cast("long").alias("n"))
    u = (
        w.crossJoin(F.broadcast(tot))
        .agg(
            F.min(
                F.when(
                    F.col("below") + F.col("c")
                    >= F.ceil(0.95 * F.col("n")).cast("long"),
                    F.col("v"),
                )
            ).alias("u")
        )
    )
    exc = (
        w.crossJoin(F.broadcast(u))
        .agg(
            F.sum(F.when(F.col("v") > F.col("u"), F.col("c")).otherwise(0))
            .cast(d38)
            .alias("k"),
            F.sum(
                F.when(
                    F.col("v") > F.col("u"), (F.col("v") - F.col("u")) * F.col("c")
                ).otherwise(0)
            )
            .cast(d38)
            .alias("sy"),
            F.sum(
                F.when(
                    F.col("v") > F.col("u"),
                    (F.col("v") - F.col("u")).cast(d38)
                    * (F.col("v") - F.col("u"))
                    * F.col("c"),
                ).otherwise(F.lit(0).cast(d38))
            ).alias("qy"),
        )
    )
    kd = F.col("k").cast("double")
    m = F.col("sy").cast("double") / kd
    # as in the SQL: s^2 = (k*qy - sy*sy)/k/(k-1)
    s2 = (
        kd * F.col("qy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    ) / kd / (kd - 1.0)
    return exc.crossJoin(F.broadcast(u)).select(
        F.col("u").alias("threshold_cents"),
        F.col("k").cast("long").alias("n_exceed"),
        F.round(0.5 * (1.0 - m * m / s2), 6).alias("xi"),
        F.round(0.5 * m * (m * m / s2 + 1.0), 6).alias("beta"),
    )


# Top-k per group (WindowGroupLimit showcase) ----------------------------------

_TKG_K = 3


@register(
    "topk_per_group",
    f"""
    WITH pr AS (
      SELECT l_returnflag, l_linestatus, l_partkey,
             CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS rev
      FROM lineitem GROUP BY 1, 2, 3
    ),
    rk AS (
      SELECT l_returnflag, l_linestatus, l_partkey, rev,
             CAST(row_number() OVER (PARTITION BY l_returnflag, l_linestatus
               ORDER BY rev DESC, l_partkey) AS BIGINT) AS rk
      FROM pr
    )
    SELECT l_returnflag, l_linestatus, l_partkey, rev, rk
    FROM rk WHERE rk <= {_TKG_K}
    """,
    doc=(
        f"top-{_TKG_K} parts by revenue within each (returnflag, "
        "linestatus) group — the canonical grouped-top-k: Catalyst plans "
        "the rank filter as WindowGroupLimit (per-partition heap, never "
        "a full group sort), deterministic integer tie-break"
    ),
)
def topk_per_group(spark, sf_dir):
    """One partial-agg rollup then a rank window whose <= k predicate
    Catalyst pushes into WindowGroupLimit — each shuffle partition keeps
    a k-row heap instead of sorting its whole group. Exact cents."""
    li = _t(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_returnflag", "l_linestatus", "l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("rev")
    )
    w = Window.partitionBy("l_returnflag", "l_linestatus").orderBy(
        F.col("rev").desc(), "l_partkey"
    )
    return (
        pr.select(
            "l_returnflag",
            "l_linestatus",
            "l_partkey",
            "rev",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= _TKG_K)
    )


# Tukey median polish ----------------------------------------------------------

_MP_ITERS = 2


def _mp_sweep_sql(src: str, out: str, key: str) -> str:
    """One median-removal sweep over CTE ``src`` (cols i, j, x): group by
    ``key``, exact median via the distinct-value threshold trick, subtract.
    Emits CTEs {out}_m (medians) and {out} (residuals)."""
    med = (
        "(min(CASE WHEN below + c >= (ng + 1) // 2 THEN x END)"
        " + min(CASE WHEN below + c >= ng // 2 + 1 THEN x END)) / 2.0"
    )
    return f"""
    {out}_c AS (
      SELECT {key}, x, CAST(count(*) AS BIGINT) AS c FROM {src} GROUP BY {key}, x
    ),
    {out}_w AS (
      SELECT {key}, x, c,
             COALESCE(sum(c) OVER (PARTITION BY {key} ORDER BY x ROWS BETWEEN
               UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
             sum(c) OVER (PARTITION BY {key}) AS ng
      FROM {out}_c
    ),
    {out}_m AS (
      SELECT {key}, {med} AS m FROM {out}_w GROUP BY {key}, ng
    ),
    {out} AS (
      SELECT {src}.i AS i, {src}.j AS j, {src}.x - {out}_m.m AS x
      FROM {src} JOIN {out}_m ON {out}_m.{key} = {src}.{key}
    )"""


def _median_polish_sql() -> str:
    st = _MS_STATES
    sweeps = []
    prev = "t0"
    names = []
    for it in range(_MP_ITERS):
        r, c = f"sr{it}", f"sc{it}"
        sweeps.append(_mp_sweep_sql(prev, r, "i"))
        sweeps.append(_mp_sweep_sql(r, c, "j"))
        names.append((r, c))
        prev = c
    row_eff = " + ".join(f"{r}_m.m" for r, _ in names)
    col_eff = " + ".join(f"{c}_m.m" for _, c in names)
    row_joins = " ".join(f"JOIN {r}_m ON {r}_m.i = ri.i" for r, _ in names)
    col_joins = " ".join(f"JOIN {c}_m ON {c}_m.j = cj.j" for _, c in names)
    return f"""
    WITH cell AS (
      SELECT event_type AS i,
             CAST(date_diff('day', (SELECT min(CAST(ts AS DATE)) FROM events),
                            CAST(ts AS DATE)) AS BIGINT) // 7 AS j,
             CAST(round(value * 100, 0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    t0 AS (
      SELECT i, j, CAST(sum(v) AS DOUBLE) AS x FROM cell
      WHERE j < {_CQ_WEEKS} GROUP BY i, j
    ),
    {",".join(sweeps)},
    ri AS (SELECT DISTINCT i FROM t0),
    cj AS (SELECT DISTINCT j FROM t0),
    rows_out AS (
      SELECT 'row' AS component, ri.i AS key, round({row_eff}, 6) AS effect
      FROM ri {row_joins}
    ),
    cols_out AS (
      SELECT 'col' AS component, CAST(cj.j AS VARCHAR) AS key,
             round({col_eff}, 6) AS effect
      FROM cj {col_joins}
    ),
    resid AS (
      SELECT 'resid_abs_sum' AS component, '*' AS key,
             round(sum(abs(x)), 6) AS effect
      FROM {prev}
    )
    SELECT * FROM rows_out
    UNION ALL SELECT * FROM cols_out
    UNION ALL SELECT * FROM resid
    """


@register(
    "median_polish",
    _median_polish_sql(),
    doc=(
        f"Tukey median polish ({_MP_ITERS} row+column sweeps) of the "
        f"event-type x week spend table ({len(_MS_STATES)}x{_CQ_WEEKS} "
        "cells): alternating exact-median removal — medians come from "
        "the distinct-value threshold trick, so every sweep is "
        "deterministic and the dyadic residuals stay bit-exact; the "
        "robust two-way decomposition beside anova_f's means"
    ),
)
def median_polish(spark, sf_dir):
    """Each sweep is one groupBy median (distinct-value frame, exact) and
    one subtract join on a 20-cell frame — four chained sweeps stay a
    constant-size plan. Integer cell sums enter; all later values are
    dyadic rationals (denominators 2^sweeps), exact in float64."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    dmin = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    cell = ev.crossJoin(F.broadcast(dmin)).select(
        F.col("event_type").alias("i"),
        F.expr("datediff(to_date(ts), d0) div 7").alias("j"),
        F.round(F.col("value") * 100, 0).cast("long").alias("v"),
    )
    t = (
        cell.filter(F.col("j") < _CQ_WEEKS)
        .groupBy("i", "j")
        .agg(F.sum("v").cast("double").alias("x"))
    )
    t = _persist_evict(t)

    def sweep(frame, key):
        c = frame.groupBy(key, "x").agg(F.count(F.lit(1)).cast("long").alias("c"))
        wb = Window.partitionBy(key).orderBy("x").rowsBetween(
            Window.unboundedPreceding, -1
        )
        wg = Window.partitionBy(key)
        w = c.select(
            key,
            "x",
            "c",
            F.coalesce(F.sum("c").over(wb), F.lit(0)).alias("below"),
            F.sum("c").over(wg).alias("ng"),
        )
        cum = F.col("below") + F.col("c")
        med = w.groupBy(key, "ng").agg(
            (
                (
                    F.min(F.when(cum >= F.expr("(ng + 1) div 2"), F.col("x")))
                    + F.min(F.when(cum >= F.expr("ng div 2 + 1"), F.col("x")))
                )
                / 2.0
            ).alias("m")
        ).select(key, "m")
        resid = frame.join(F.broadcast(med), key).select(
            "i", "j", (F.col("x") - F.col("m")).alias("x")
        )
        return resid, med

    frame = t
    row_meds, col_meds = [], []
    for _ in range(_MP_ITERS):
        frame, rm = sweep(frame, "i")
        row_meds.append(rm)
        frame, cm = sweep(frame, "j")
        col_meds.append(cm)
    ri = row_meds[0].select("i")
    row_eff = ri
    for idx, rm in enumerate(row_meds):
        row_eff = row_eff.join(
            F.broadcast(rm.select("i", F.col("m").alias(f"m{idx}"))), "i"
        )
    rows_out = row_eff.select(
        F.lit("row").alias("component"),
        F.col("i").alias("key"),
        F.round(
            _fold_sum([F.col(f"m{idx}") for idx in range(_MP_ITERS)]), 6
        ).alias("effect"),
    )
    cj = col_meds[0].select("j")
    col_eff = cj
    for idx, cm in enumerate(col_meds):
        col_eff = col_eff.join(
            F.broadcast(cm.select("j", F.col("m").alias(f"m{idx}"))), "j"
        )
    cols_out = col_eff.select(
        F.lit("col").alias("component"),
        F.col("j").cast("string").alias("key"),
        F.round(
            _fold_sum([F.col(f"m{idx}") for idx in range(_MP_ITERS)]), 6
        ).alias("effect"),
    )
    resid = frame.agg(
        F.round(F.sum(F.abs(F.col("x"))), 6).alias("effect")
    ).select(
        F.lit("resid_abs_sum").alias("component"),
        F.lit("*").alias("key"),
        "effect",
    )
    return rows_out.unionAll(cols_out).unionAll(resid)


# Price elasticity -------------------------------------------------------------

_PE_BUCKETS = 100
_PE_FP = 1000000000.0


@register(
    "price_elasticity",
    f"""
    WITH s AS (
      SELECT l_partkey % {_PE_BUCKETS} AS bucket,
             CAST(round(ln(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                  * {_PE_FP!r}) AS BIGINT) AS lp,
             CAST(round(ln(CAST(round(l_quantity * 100, 0) AS BIGINT))
                  * {_PE_FP!r}) AS BIGINT) AS lq
      FROM lineitem
      WHERE l_extendedprice > 0 AND l_quantity > 0
    ),
    m AS (
      SELECT bucket, CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(lp) AS HUGEINT) AS sx, CAST(sum(lq) AS HUGEINT) AS sy,
             sum(CAST(lp AS HUGEINT) * lp) AS sxx,
             sum(CAST(lp AS HUGEINT) * lq) AS sxy
      FROM s GROUP BY bucket
    )
    SELECT bucket, CAST(n AS BIGINT) AS n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS elasticity
    FROM m
    """,
    doc=(
        f"log-log price elasticity of demand per part bucket "
        f"({_PE_BUCKETS} buckets): OLS slope of ln(quantity) on "
        "ln(price) — per-row ln snapped to 1e-9 fixed point so the "
        "moment sums are exact integers at any aggregation order"
    ),
)
def price_elasticity(spark, sf_dir):
    """One partial-agg pass per bucket over fixed-point log moments (the
    scale cancels in the slope ratio); a single division per bucket
    finishes."""
    d38 = "decimal(38,0)"
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_extendedprice") > 0) & (F.col("l_quantity") > 0)
    )
    lp = F.round(
        F.log(F.round(F.col("l_extendedprice") * 100, 0).cast("long")) * _PE_FP
    ).cast("long")
    lq = F.round(
        F.log(F.round(F.col("l_quantity") * 100, 0).cast("long")) * _PE_FP
    ).cast("long")
    s = li.select(
        (F.col("l_partkey") % _PE_BUCKETS).alias("bucket"),
        lp.alias("lp"),
        lq.alias("lq"),
    )
    m = s.groupBy("bucket").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("lp").cast(d38).alias("sx"),
        F.sum("lq").cast(d38).alias("sy"),
        F.sum(F.col("lp").cast(d38) * F.col("lp")).alias("sxx"),
        F.sum(F.col("lp").cast(d38) * F.col("lq")).alias("sxy"),
    )
    return m.select(
        "bucket",
        F.col("n").cast("long").alias("n"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"),
            6,
        ).alias("elasticity"),
    )


# VWAP / TWAP ------------------------------------------------------------------


@register(
    "vwap_twap",
    """
    WITH s AS (
      SELECT CAST(l_shipdate AS DATE) AS day,
             CAST(round(l_quantity) AS BIGINT) AS q,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS p
      FROM lineitem
    ),
    a AS (
      SELECT day, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(q) AS BIGINT) AS vol,
             CAST(sum(q * p) AS HUGEINT) AS qp,
             CAST(sum(p) AS HUGEINT) AS sp
      FROM s GROUP BY day
    )
    SELECT day, n, vol,
           round(CAST(qp AS DOUBLE) / vol, 6) AS vwap_cents,
           round(CAST(sp AS DOUBLE) / n, 6) AS twap_cents
    FROM a
    """,
    doc=(
        "daily volume-weighted and time(count)-weighted average price "
        "over shipments: the execution-quality pair beside ohlc_bars — "
        "exact integer quantity/price sums, two divisions per day"
    ),
)
def vwap_twap(spark, sf_dir):
    """One partial-agg rollup per ship day with four exact moments."""
    li = _t(spark, sf_dir, "lineitem")
    s = li.select(
        F.to_date("l_shipdate").alias("day"),
        F.round(F.col("l_quantity")).cast("long").alias("q"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("p"),
    )
    d38 = "decimal(38,0)"
    a = s.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("q").cast("long").alias("vol"),
        F.sum(F.col("q").cast(d38) * F.col("p")).alias("qp"),
        F.sum("p").cast(d38).alias("sp"),
    )
    return a.select(
        "day",
        "n",
        "vol",
        F.round(F.col("qp").cast("double") / F.col("vol"), 6).alias("vwap_cents"),
        F.round(F.col("sp").cast("double") / F.col("n"), 6).alias("twap_cents"),
    )


# Daily clear-sky insolation ---------------------------------------------------

_SI_S0 = 1361.0  # solar constant, W/m^2


@register(
    "solar_irradiance_daily",
    f"""
    WITH doy AS (
      SELECT CAST(dayofyear(min(CAST(ts AS TIMESTAMP))) AS BIGINT) AS d
      FROM events
    ),
    lat AS (SELECT CAST(unnest(generate_series(-80, 80, 10)) AS BIGINT) AS latd),
    g AS (
      SELECT latd, d,
             latd * {_SOLAR_PI!r} / 180.0 AS phi,
             0.006918 - 0.399912 * cos(2.0 * {_SOLAR_PI!r} / 365.0 * (d - 1))
               + 0.070257 * sin(2.0 * {_SOLAR_PI!r} / 365.0 * (d - 1))
               - 0.006758 * cos(2.0 * (2.0 * {_SOLAR_PI!r} / 365.0 * (d - 1)))
               + 0.000907 * sin(2.0 * (2.0 * {_SOLAR_PI!r} / 365.0 * (d - 1)))
               - 0.002697 * cos(3.0 * (2.0 * {_SOLAR_PI!r} / 365.0 * (d - 1)))
               + 0.00148 * sin(3.0 * (2.0 * {_SOLAR_PI!r} / 365.0 * (d - 1)))
               AS decl
      FROM lat, doy
    ),
    w AS (
      SELECT latd, d, phi, decl,
             acos(greatest(-1.0, least(1.0, -tan(phi) * tan(decl)))) AS ws
      FROM g
    )
    SELECT latd AS lat, d AS doy,
           round(decl * 180.0 / {_SOLAR_PI!r}, 6) AS decl_deg,
           round(ws * 180.0 / {_SOLAR_PI!r}, 6) AS sunset_hour_angle_deg,
           round(86400.0 / {_SOLAR_PI!r} * {_SI_S0!r}
                 * (cos(phi) * cos(decl) * sin(ws) + ws * sin(phi) * sin(decl))
                 / 1000000.0, 6) AS insolation_mj_m2
    FROM w
    """,
    doc=(
        "daily top-of-atmosphere insolation per 10-degree latitude band "
        "at the corpus's first day-of-year: Spencer declination, sunset "
        "hour angle acos(-tan phi tan decl) clamped for polar day/night, "
        "H = (86400/pi) S0 (cos phi cos d sin ws + ws sin phi sin d) — "
        "the radiative forcing behind solar_position's instantaneous "
        "geometry"
    ),
)
def solar_irradiance_daily(spark, sf_dir):
    """A 17-row generated latitude frame crossed with one scalar
    aggregate (the corpus's first DOY); pure closed-form trig with
    literal constants, identical expression trees on both engines."""
    ev = _t(spark, sf_dir, "events")
    doy = ev.agg(
        F.dayofyear(F.min(F.col("ts").cast("timestamp"))).cast("long").alias("d")
    )
    lat = spark.range(-8, 9).select((F.col("id") * 10).cast("long").alias("latd"))
    pi = _SOLAR_PI
    g = lat.crossJoin(F.broadcast(doy))
    gam = 2.0 * pi / 365.0 * (F.col("d") - 1)
    decl = (
        F.lit(0.006918)
        - 0.399912 * F.cos(gam)
        + 0.070257 * F.sin(gam)
        - 0.006758 * F.cos(2.0 * gam)
        + 0.000907 * F.sin(2.0 * gam)
        - 0.002697 * F.cos(3.0 * gam)
        + 0.00148 * F.sin(3.0 * gam)
    )
    phi = F.col("latd") * pi / 180.0
    w = g.select(
        "latd",
        "d",
        phi.alias("phi"),
        decl.alias("decl"),
    ).select(
        "latd",
        "d",
        "phi",
        "decl",
        F.acos(
            F.greatest(F.lit(-1.0), F.least(F.lit(1.0), -F.tan(F.col("phi")) * F.tan(F.col("decl"))))
        ).alias("ws"),
    )
    return w.select(
        F.col("latd").alias("lat"),
        F.col("d").alias("doy"),
        F.round(F.col("decl") * 180.0 / pi, 6).alias("decl_deg"),
        F.round(F.col("ws") * 180.0 / pi, 6).alias("sunset_hour_angle_deg"),
        F.round(
            86400.0
            / pi
            * _SI_S0
            * (
                F.cos(F.col("phi")) * F.cos(F.col("decl")) * F.sin(F.col("ws"))
                + F.col("ws") * F.sin(F.col("phi")) * F.sin(F.col("decl"))
            )
            / 1000000.0,
            6,
        ).alias("insolation_mj_m2"),
    )


# Vocabulary coverage curve ----------------------------------------------------

_VC_KS = (10, 100, 1000, 10000)


@register(
    "vocab_coverage",
    f"""
    WITH b AS (
      SELECT unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents
    ),
    v AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY tok),
    r AS (
      SELECT c, CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT) AS rk,
             CAST(sum(c) OVER (ORDER BY c DESC, tok ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      FROM v
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS n_types
            FROM v),
    ks AS (SELECT CAST(unnest(ARRAY[{", ".join(map(str, _VC_KS))}]) AS BIGINT) AS k)
    SELECT ks.k AS k,
           CAST(COALESCE(max(CASE WHEN rk <= ks.k THEN cum END), 0) AS BIGINT)
             AS cum_tokens,
           round(CAST(COALESCE(max(CASE WHEN rk <= ks.k THEN cum END), 0)
                 AS DOUBLE) / n, 6) AS coverage
    FROM ks CROSS JOIN r CROSS JOIN tot
    GROUP BY ks.k, n ORDER BY ks.k
    """,
    doc=(
        "vocabulary coverage curve: token-mass share of the top-k "
        "most frequent types for k in (10, 100, 1k, 10k) — the "
        "tokenizer-budget diagnostic beside zipf_alpha and heaps_law; "
        "the ranking cut is (count desc, token) deterministic"
    ),
)
def vocab_coverage(spark, sf_dir):
    """One vocabulary groupBy, one global deterministic-ordered window
    (rank + cumulative token mass), then a 4-probe broadcast fold —
    exact integers into one display division."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.expr(r"regexp_extract_all(text, '\\S+', 0)")).alias("tok")
    )
    v = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    v = _persist_evict(v)
    wo = Window.orderBy(F.col("c").desc(), "tok")
    r = v.select(
        "c",
        F.row_number().over(wo).cast("long").alias("rk"),
        F.sum("c")
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("cum"),
    )
    tot = v.agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    ks = spark.createDataFrame([(k,) for k in _VC_KS], "k long")
    return (
        ks.crossJoin(r)
        .crossJoin(F.broadcast(tot))
        .groupBy("k", "n")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("rk") <= F.col("k"), F.col("cum"))), F.lit(0)
            )
            .cast("long")
            .alias("cum_tokens")
        )
        .select(
            "k",
            "cum_tokens",
            F.round(F.col("cum_tokens").cast("double") / F.col("n"), 6).alias(
                "coverage"
            ),
        )
    )


# DAU / WAU stickiness ---------------------------------------------------------


@register(
    "dau_wau_stickiness",
    """
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(date_diff('day', (SELECT min(CAST(ts AS DATE)) FROM events),
                            CAST(ts AS DATE)) AS BIGINT) AS d
      FROM events
    ),
    days AS (SELECT DISTINCT d FROM ud),
    dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY d),
    wau AS (
      SELECT days.d AS d, CAST(count(DISTINCT ud.user_id) AS BIGINT) AS wau
      FROM days JOIN ud ON ud.d BETWEEN days.d - 6 AND days.d
      GROUP BY days.d
    )
    SELECT dau.d AS day_idx, dau.dau AS dau, wau.wau AS wau,
           round(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
    FROM dau JOIN wau ON wau.d = dau.d
    ORDER BY day_idx
    """,
    doc=(
        "DAU/WAU engagement stickiness per day: daily active users over "
        "trailing-7-day distinct actives (the product-analytics ratio "
        "behind 'how habitual is usage') — exact distinct counts via a "
        "user-day range join, one division"
    ),
)
def dau_wau_stickiness(spark, sf_dir):
    """One distinct user-day rollup; WAU is a bounded 7-day range join
    on that O(users x days) frame (never the event stream), with exact
    distinct aggregation."""
    ev = _t(spark, sf_dir, "events")
    dmin = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    ud = _persist_evict(
        ev.crossJoin(F.broadcast(dmin))
        .select(
            "user_id", F.datediff(F.to_date("ts"), F.col("d0")).cast("long").alias("d")
        )
        .distinct()
    )
    days = ud.select("d").distinct()
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    w = days.select(F.col("d").alias("wd"))
    wau = (
        w.join(ud, (F.col("d") >= F.col("wd") - 6) & (F.col("d") <= F.col("wd")))
        .groupBy("wd")
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
    )
    return (
        dau.join(wau, dau.d == wau.wd)
        .select(
            F.col("d").alias("day_idx"),
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
                "stickiness"
            ),
        )
    )


# Record (running-maximum) statistics ------------------------------------------

_REC_FP = 1000000000000.0


@register(
    "record_statistics",
    f"""
    WITH d AS (
      SELECT CAST(date_diff('day', (SELECT min(CAST(ts AS DATE)) FROM events),
                            CAST(ts AS DATE)) AS BIGINT) AS t
      FROM events
    ),
    y AS (SELECT t, CAST(count(*) AS BIGINT) AS y FROM d GROUP BY t),
    rec AS (
      SELECT t, y,
             max(y) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING) AS prevmax
      FROM y
    ),
    cnt AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN prevmax IS NULL OR y > prevmax
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_records
      FROM rec
    ),
    harm AS (
      SELECT CAST(sum(CAST(round({_REC_FP!r} / k.k) AS BIGINT)) AS BIGINT) AS h1,
             CAST(sum(CAST(round({_REC_FP!r} / (CAST(k.k AS DOUBLE) * k.k))
                  AS BIGINT)) AS BIGINT) AS h2
      FROM (SELECT CAST(unnest(generate_series(1,
              (SELECT CAST(n AS INT) FROM cnt))) AS BIGINT) AS k) k
    )
    SELECT n, n_records,
           round(CAST(h1 AS DOUBLE) / {_REC_FP!r}, 6) AS expected_records,
           round(CAST(h1 - h2 AS DOUBLE) / {_REC_FP!r}, 6) AS variance_records,
           round((CAST(n_records AS DOUBLE) - CAST(h1 AS DOUBLE) / {_REC_FP!r})
                 / sqrt(CAST(h1 - h2 AS DOUBLE) / {_REC_FP!r}), 6) AS z
    FROM cnt, harm
    """,
    doc=(
        "record statistics of the daily event-count series: observed "
        "running-maximum records vs the i.i.d. null (E = H_n, Var = "
        "H_n - H_n^(2), fixed-point harmonic sums) — the 'was today the "
        "busiest yet?' trend diagnostic; excess records = growth"
    ),
)
def record_statistics(spark, sf_dir):
    """One O(days) rollup + an ordered running-max window for the exact
    record count; the harmonic-number null folds fixed-point per-term
    integers over a generated k-range so the expectation/variance are
    order-free."""
    ev = _t(spark, sf_dir, "events")
    dmin = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    y = (
        ev.crossJoin(F.broadcast(dmin))
        .groupBy(F.datediff(F.to_date("ts"), F.col("d0")).cast("long").alias("t"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    wprev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    rec = y.select("t", "y", F.max("y").over(wprev).alias("prevmax"))
    cnt = rec.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(
                F.col("prevmax").isNull() | (F.col("y") > F.col("prevmax")), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_records"),
    )
    kr = (
        cnt.select(F.explode(F.sequence(F.lit(1), F.col("n"))).alias("k"))
    )
    harm = kr.agg(
        F.sum(F.round(F.lit(_REC_FP) / F.col("k")).cast("long"))
        .cast("long")
        .alias("h1"),
        F.sum(
            F.round(F.lit(_REC_FP) / (F.col("k").cast("double") * F.col("k"))).cast(
                "long"
            )
        )
        .cast("long")
        .alias("h2"),
    )
    e = F.col("h1").cast("double") / _REC_FP
    var = (F.col("h1") - F.col("h2")).cast("double") / _REC_FP
    return cnt.crossJoin(F.broadcast(harm)).select(
        "n",
        "n_records",
        F.round(e, 6).alias("expected_records"),
        F.round(var, 6).alias("variance_records"),
        F.round((F.col("n_records").cast("double") - e) / F.sqrt(var), 6).alias("z"),
    )


# Conversion-lag quantiles -----------------------------------------------------

_CL_QS = (25, 50, 75, 90)


@register(
    "conversion_lag_quantiles",
    f"""
    WITH u AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'click'
                      THEN epoch_ms(CAST(ts AS TIMESTAMP)) END) AS t_click,
             min(CASE WHEN event_type = 'purchase'
                      THEN epoch_ms(CAST(ts AS TIMESTAMP)) END) AS t_purch
      FROM events GROUP BY user_id
    ),
    lagm AS (
      SELECT (t_purch - t_click) // 60000 AS lag_min FROM u
      WHERE t_click IS NOT NULL AND t_purch IS NOT NULL
        AND t_purch >= t_click
    ),
    c AS (SELECT lag_min, CAST(count(*) AS BIGINT) AS c FROM lagm GROUP BY lag_min),
    w AS (
      SELECT lag_min, c,
             COALESCE(sum(c) OVER (ORDER BY lag_min ROWS BETWEEN UNBOUNDED
               PRECEDING AND 1 PRECEDING), 0) AS below
      FROM c
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c),
    qs AS (SELECT CAST(unnest(ARRAY[{", ".join(map(str, _CL_QS))}]) AS BIGINT) AS q)
    SELECT qs.q AS pct,
           min(CASE WHEN w.below + w.c >=
               CAST(ceil(qs.q * (SELECT n FROM tot) / 100.0) AS BIGINT)
               THEN w.lag_min END) AS lag_minutes,
           (SELECT n FROM tot) AS n_users
    FROM qs CROSS JOIN w GROUP BY qs.q ORDER BY qs.q
    """,
    doc=(
        "first-click to first-purchase conversion-lag quantiles "
        "(p25/50/75/90, exact type-1 order statistics on the distinct-"
        "minute frame) — the funnel-latency summary behind "
        "window_funnel's step counts"
    ),
)
def conversion_lag_quantiles(spark, sf_dir):
    """One per-user min rollup, one distinct-lag prefix frame, four
    broadcast quantile probes — exact integers end to end."""
    ev = _t(spark, sf_dir, "events")
    t = F.unix_millis(F.col("ts").cast("timestamp"))
    u = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", t)).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", t)).alias("t_purch"),
    )
    lagm = u.filter(
        F.col("t_click").isNotNull()
        & F.col("t_purch").isNotNull()
        & (F.col("t_purch") >= F.col("t_click"))
    ).select(
        F.expr("(t_purch - t_click) div 60000").alias("lag_min")
    )
    c = _persist_evict(
        lagm.groupBy("lag_min").agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wb = Window.orderBy("lag_min").rowsBetween(Window.unboundedPreceding, -1)
    w = c.select(
        "lag_min", "c", F.coalesce(F.sum("c").over(wb), F.lit(0)).alias("below")
    )
    tot = c.agg(F.sum("c").cast("long").alias("n"))
    qs = spark.createDataFrame([(q,) for q in _CL_QS], "q long")
    return (
        qs.crossJoin(w)
        .crossJoin(F.broadcast(tot))
        .groupBy(F.col("q").alias("pct"), "n")
        .agg(
            F.min(
                F.when(
                    F.col("below") + F.col("c")
                    >= F.ceil(F.col("q") * F.col("n") / 100.0).cast("long"),
                    F.col("lag_min"),
                )
            ).alias("lag_minutes")
        )
        .select("pct", "lag_minutes", F.col("n").alias("n_users"))
    )


# L-moments --------------------------------------------------------------------


@register(
    "l_moments",
    """
    WITH s AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    c AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY v),
    w AS (
      SELECT v, c,
             COALESCE(sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND 1 PRECEDING), 0) AS below
      FROM c
    ),
    /* hockey-stick identity: sum_{i=a..b} C(i-1, r) = C(b, r+1) -
       C(a-1, r+1): each distinct value's tied rank span contributes exact
       integer binomial weights with no rank materialization. */
    bw AS (
      SELECT v, c, below + c AS b, below AS a1,
             CAST(below + c AS HUGEINT) AS bb, CAST(below AS HUGEINT) AS aa
      FROM w
    ),
    mom AS (
      /* raw (un-divided) telescoped binomial sums: the /2, /6, /24 move
         to the closing float so every integer sum stays exact HUGEINT */
      SELECT CAST(sum(c) AS HUGEINT) AS n,
             sum(CAST(v AS HUGEINT) * c) AS s0,
             sum(CAST(v AS HUGEINT) * (bb * (bb - 1) - aa * (aa - 1))) AS s1r,
             sum(CAST(v AS HUGEINT)
                 * (bb * (bb - 1) * (bb - 2) - aa * (aa - 1) * (aa - 2))) AS s2r,
             sum(CAST(v AS HUGEINT)
                 * (bb * (bb - 1) * (bb - 2) * (bb - 3)
                    - aa * (aa - 1) * (aa - 2) * (aa - 3))) AS s3r
      FROM bw
    ),
    lm AS (
      SELECT CAST(n AS DOUBLE) AS nd,
             CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE) AS b0,
             CAST(s1r AS DOUBLE) / 2.0 / CAST(n AS DOUBLE)
               / ((CAST(n AS DOUBLE) - 1.0) / 1.0) AS b1,
             CAST(s2r AS DOUBLE) / 6.0 / CAST(n AS DOUBLE)
               / ((CAST(n AS DOUBLE) - 1.0) * (CAST(n AS DOUBLE) - 2.0) / 2.0) AS b2,
             CAST(s3r AS DOUBLE) / 24.0 / CAST(n AS DOUBLE)
               / ((CAST(n AS DOUBLE) - 1.0) * (CAST(n AS DOUBLE) - 2.0)
                  * (CAST(n AS DOUBLE) - 3.0) / 6.0) AS b3
      FROM mom
    )
    SELECT CAST(nd AS BIGINT) AS n,
           round(b0, 6) AS l1,
           round(2.0 * b1 - b0, 6) AS l2,
           round((6.0 * b2 - 6.0 * b1 + b0) / (2.0 * b1 - b0), 6) AS t3,
           round((20.0 * b3 - 30.0 * b2 + 12.0 * b1 - b0) / (2.0 * b1 - b0), 6)
             AS t4
    FROM lm
    """,
    doc=(
        "L-moments of value cents (L-mean, L-scale, L-skewness t3, "
        "L-kurtosis t4): probability-weighted moments via the "
        "hockey-stick binomial identity on the distinct-cents rank spans "
        "— exact integer weighted sums with NO rank materialization and "
        "no sort; the robust shape statistics hydrology fits GEV/GPD "
        "with (companions: gumbel_fit_extremes, gpd_tail_fit)"
    ),
)
def l_moments(spark, sf_dir):
    """Each distinct cent's tied rank span [a+1, a+c] contributes
    sum C(i-1, r) = C(b, r+1) - C(a, r+1) exactly (hockey stick), so the
    four probability-weighted moments are single decimal(38,0) sums over
    the distinct-value frame; b_r normalization and the L-moment linear
    combinations are closing single-row floats."""
    d38 = "decimal(38,0)"
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = ev.select(F.round(F.col("value") * 100, 0).cast("long").alias("v"))
    c = _persist_evict(s.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("c")))
    wb = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    w = c.select("v", "c", F.coalesce(F.sum("c").over(wb), F.lit(0)).alias("below"))
    bb = (F.col("below") + F.col("c")).cast(d38)
    aa = F.col("below").cast(d38)
    vv = F.col("v").cast(d38)
    mom = w.agg(
        F.sum("c").cast(d38).alias("n"),
        F.sum(vv * F.col("c")).alias("s0"),
        F.sum(vv * (bb * (bb - 1) - aa * (aa - 1))).alias("s1r"),
        F.sum(
            vv * (bb * (bb - 1) * (bb - 2) - aa * (aa - 1) * (aa - 2))
        ).alias("s2r"),
        F.sum(
            vv
            * (
                bb * (bb - 1) * (bb - 2) * (bb - 3)
                - aa * (aa - 1) * (aa - 2) * (aa - 3)
            )
        ).alias("s3r"),
    )
    nd = F.col("n").cast("double")
    b0 = F.col("s0").cast("double") / nd
    b1 = F.col("s1r").cast("double") / 2.0 / nd / ((nd - 1.0) / 1.0)
    b2 = F.col("s2r").cast("double") / 6.0 / nd / ((nd - 1.0) * (nd - 2.0) / 2.0)
    b3 = (
        F.col("s3r").cast("double") / 24.0 / nd
        / ((nd - 1.0) * (nd - 2.0) * (nd - 3.0) / 6.0)
    )
    l2 = 2.0 * b1 - b0
    return mom.select(
        F.col("n").cast("long").alias("n"),
        F.round(b0, 6).alias("l1"),
        F.round(l2, 6).alias("l2"),
        F.round((6.0 * b2 - 6.0 * b1 + b0) / l2, 6).alias("t3"),
        F.round((20.0 * b3 - 30.0 * b2 + 12.0 * b1 - b0) / l2, 6).alias("t4"),
    )


# Trajectory sinuosity ---------------------------------------------------------

_SIN_FP = 1000.0  # fixed-point millimeter-ish grid units for leg lengths


@register(
    "line_sinuosity",
    f"""
    WITH pts AS (
      SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS t_ms, event_id,
             (user_id % 120) * 1000
               + CASE WHEN event_id % 13 < 4 THEN 2000 ELSE 0 END
               + event_id % 7 AS iy,
             (user_id % 300) * 1000
               + CASE WHEN event_id % 13 < 4 THEN 2000 ELSE 0 END
               + event_id % 5 AS ix
      FROM events
    ),
    legs AS (
      SELECT user_id,
             first_value(ix) OVER w AS x0, first_value(iy) OVER w AS y0,
             last_value(ix) OVER wf AS x1, last_value(iy) OVER wf AS y1,
             ix - lag(ix) OVER w AS dx, iy - lag(iy) OVER w AS dy
      FROM pts
      WINDOW w AS (PARTITION BY user_id ORDER BY t_ms, event_id),
             wf AS (PARTITION BY user_id ORDER BY t_ms, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ),
    agg AS (
      SELECT user_id,
             CAST(count(dx) AS BIGINT) AS n_legs,
             CAST(sum(CAST(round(sqrt(CAST(dx * dx + dy * dy AS DOUBLE))
                  * {_SIN_FP!r}) AS BIGINT)) AS BIGINT) AS path_fp,
             max(x0) AS x0, max(y0) AS y0, max(x1) AS x1, max(y1) AS y1
      FROM legs GROUP BY user_id
    )
    SELECT user_id, n_legs,
           round(CAST(path_fp AS DOUBLE) / {_SIN_FP!r}, 6) AS path_len,
           round(sqrt(CAST((x1 - x0) * (x1 - x0)
                 + (y1 - y0) * (y1 - y0) AS DOUBLE)), 6) AS net_disp,
           round(CASE WHEN (x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0) > 0
                      THEN CAST(path_fp AS DOUBLE) / {_SIN_FP!r}
                           / sqrt(CAST((x1 - x0) * (x1 - x0)
                                  + (y1 - y0) * (y1 - y0) AS DOUBLE))
                      ELSE 0.0 END, 6) AS sinuosity
    FROM agg
    """,
    doc=(
        "per-user trajectory sinuosity (traveled path length / net "
        "first-to-last displacement, 1 = straight line): leg lengths are "
        "IEEE-exact sqrt per leg snapped to fixed point so the path sum "
        "is an exact integer — the route-efficiency metric beside "
        "turning_stats/mobility_metrics"
    ),
)
def line_sinuosity(spark, sf_dir):
    """One trajectory window pass (lag deltas + endpoint first/last),
    fixed-point leg lengths into an exact integer path sum, exact
    integer endpoints — closing division guarded for zero displacement."""
    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
        "event_id",
        (
            (F.col("user_id") % 120) * 1000
            + F.when(F.col("event_id") % 13 < 4, 2000).otherwise(0)
            + F.col("event_id") % 7
        ).alias("iy"),
        (
            (F.col("user_id") % 300) * 1000
            + F.when(F.col("event_id") % 13 < 4, 2000).otherwise(0)
            + F.col("event_id") % 5
        ).alias("ix"),
    )
    wo = Window.partitionBy("user_id").orderBy("t_ms", "event_id")
    wf = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    legs = pts.select(
        "user_id",
        F.first("ix").over(wo).alias("x0"),
        F.first("iy").over(wo).alias("y0"),
        F.last("ix").over(wf).alias("x1"),
        F.last("iy").over(wf).alias("y1"),
        (F.col("ix") - F.lag("ix").over(wo)).alias("dx"),
        (F.col("iy") - F.lag("iy").over(wo)).alias("dy"),
    )
    leg_fp = F.round(
        F.sqrt((F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy")).cast("double"))
        * _SIN_FP
    ).cast("long")
    agg = legs.groupBy("user_id").agg(
        F.count("dx").cast("long").alias("n_legs"),
        F.sum(leg_fp).cast("long").alias("path_fp"),
        F.max("x0").alias("x0"),
        F.max("y0").alias("y0"),
        F.max("x1").alias("x1"),
        F.max("y1").alias("y1"),
    )
    disp2 = (F.col("x1") - F.col("x0")) * (F.col("x1") - F.col("x0")) + (
        F.col("y1") - F.col("y0")
    ) * (F.col("y1") - F.col("y0"))
    path = F.col("path_fp").cast("double") / _SIN_FP
    return agg.select(
        "user_id",
        "n_legs",
        F.round(path, 6).alias("path_len"),
        F.round(F.sqrt(disp2.cast("double")), 6).alias("net_disp"),
        F.round(
            F.when(disp2 > 0, path / F.sqrt(disp2.cast("double"))).otherwise(0.0), 6
        ).alias("sinuosity"),
    )


# Duplication rate by source ---------------------------------------------------


@register(
    "dup_rate_by_source",
    """
    WITH h AS (
      SELECT source, md5(text) AS th FROM documents
    ),
    g AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT th) AS BIGINT) AS n_distinct
      FROM h GROUP BY source
    )
    SELECT source, n_docs, n_distinct,
           CAST(n_docs - n_distinct AS BIGINT) AS n_dup,
           round(CAST(n_docs - n_distinct AS DOUBLE) / n_docs, 6) AS dup_rate
    FROM g
    """,
    doc=(
        "exact-duplicate rate per source (md5 text fingerprints, "
        "distinct-vs-total): the per-provider contamination scorecard "
        "that decides which sources feed exact_dedup first — one "
        "partial-agg pass, exact counts"
    ),
)
def dup_rate_by_source(spark, sf_dir):
    """Map-side hash + one groupBy with an exact distinct aggregate —
    the per-source rollup of exact_dedup's global view."""
    d = _t(spark, sf_dir, "documents")
    h = d.select("source", F.md5(F.col("text")).alias("th"))
    g = h.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("th").cast("long").alias("n_distinct"),
    )
    return g.select(
        "source",
        "n_docs",
        "n_distinct",
        (F.col("n_docs") - F.col("n_distinct")).cast("long").alias("n_dup"),
        F.round(
            (F.col("n_docs") - F.col("n_distinct")).cast("double") / F.col("n_docs"),
            6,
        ).alias("dup_rate"),
    )


# Renyi entropy spectrum -------------------------------------------------------


@register(
    "renyi_spectrum",
    """
    WITH b AS (
      SELECT unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents
    ),
    v AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY tok),
    m AS (
      SELECT CAST(sum(c) AS HUGEINT) AS n,
             CAST(count(*) AS BIGINT) AS types,
             sum(CAST(c AS HUGEINT) * c) AS c2,
             CAST(max(c) AS BIGINT) AS cmax
      FROM v
    )
    SELECT CAST(n AS BIGINT) AS n_tokens, types,
           round(ln(CAST(types AS DOUBLE)), 6) AS h0,
           round(-ln(CAST(c2 AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6) AS h2,
           round(-ln(CAST(cmax AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS h_min
    FROM m
    """,
    doc=(
        "Renyi entropy spectrum of the token distribution: H0 = ln "
        "|types| (Hartley), H2 = -ln sum p^2 (collision entropy, from "
        "the exact integer collision mass), H_inf = -ln max p (min-"
        "entropy) — the diversity profile bracketing entropy_score's "
        "Shannon point; exact integers into three ln calls"
    ),
)
def renyi_spectrum(spark, sf_dir):
    """One vocabulary groupBy, one four-moment exact aggregate, three
    single-row ln calls."""
    d = _t(spark, sf_dir, "documents")
    d38 = "decimal(38,0)"
    toks = d.select(
        F.explode(F.expr(r"regexp_extract_all(text, '\\S+', 0)")).alias("tok")
    )
    v = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    m = v.agg(
        F.sum("c").cast(d38).alias("n"),
        F.count(F.lit(1)).cast("long").alias("types"),
        F.sum(F.col("c").cast(d38) * F.col("c")).alias("c2"),
        F.max("c").cast("long").alias("cmax"),
    )
    nd = F.col("n").cast("double")
    return m.select(
        F.col("n").cast("long").alias("n_tokens"),
        "types",
        F.round(F.log(F.col("types").cast("double")), 6).alias("h0"),
        F.round(-F.log(F.col("c2").cast("double") / (nd * nd)), 6).alias("h2"),
        F.round(-F.log(F.col("cmax").cast("double") / nd), 6).alias("h_min"),
    )


# Weekday ANOVA of daily volume ------------------------------------------------


def _weekday_anova_sql() -> str:
    k = 7
    piv = ", ".join(
        f"CAST(sum(CASE WHEN dow = {w} THEN 1 ELSE 0 END) AS DOUBLE) AS n_{w}, "
        f"CAST(sum(CASE WHEN dow = {w} THEN y ELSE 0 END) AS DOUBLE) AS s_{w}, "
        f"CAST(sum(CASE WHEN dow = {w} THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS DOUBLE) AS q_{w}"
        for w in range(k)
    )
    nn = " + ".join(f"n_{w}" for w in range(k))
    ss = " + ".join(f"s_{w}" for w in range(k))
    qq = " + ".join(f"q_{w}" for w in range(k))
    hat = " + ".join(f"s_{w} * s_{w} / n_{w}" for w in range(k))
    return f"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(isodow(CAST(ts AS DATE)) - 1 AS BIGINT) AS dow
      FROM events
    ),
    y AS (SELECT day, CAST(max(dow) AS BIGINT) AS dow,
                 CAST(count(*) AS BIGINT) AS y
          FROM d GROUP BY day),
    piv AS (SELECT {piv} FROM y)
    SELECT CAST({nn} AS BIGINT) AS n_days, CAST({k} AS BIGINT) AS k,
           round(({hat}) - ({ss}) * ({ss}) / ({nn}), 2) AS ssb,
           round(({qq}) - ({hat}), 2) AS ssw,
           round(((({hat}) - ({ss}) * ({ss}) / ({nn})) / {k - 1}.0)
                 / ((({qq}) - ({hat})) / (({nn}) - {k}.0)), 6) AS f_stat
    FROM piv
    """


@register(
    "weekday_anova",
    _weekday_anova_sql(),
    doc=(
        "one-way ANOVA of daily event volume across the 7 weekdays "
        "(ISO day-of-week groups): is there a weekly rhythm? — the "
        "seasonal-effect F test beside diurnal_harmonics' within-day "
        "spectrum; exact integer moments, fixed-order 7-column folds"
    ),
)
def weekday_anova(spark, sf_dir):
    """One O(days) rollup, a 7-group fixed-order pivot, the anova_f
    float algebra — bit-identical folds on both engines."""
    k = 7
    ev = _t(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    y = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.max(F.expr("weekday(to_date(ts))")).cast("long").alias("dow"),
        F.count(F.lit(1)).cast("long").alias("y"),
    )
    piv = y.agg(
        *[
            c
            for w in range(k)
            for c in (
                F.sum(F.when(F.col("dow") == w, 1).otherwise(0))
                .cast("double")
                .alias(f"n_{w}"),
                F.sum(F.when(F.col("dow") == w, F.col("y")).otherwise(0))
                .cast("double")
                .alias(f"s_{w}"),
                F.sum(
                    F.when(F.col("dow") == w, F.col("y").cast(d38) * F.col("y")).otherwise(
                        F.lit(0).cast(d38)
                    )
                )
                .cast("double")
                .alias(f"q_{w}"),
            )
        ]
    )
    nn = _fold_sum([F.col(f"n_{w}") for w in range(k)])
    ss = _fold_sum([F.col(f"s_{w}") for w in range(k)])
    qq = _fold_sum([F.col(f"q_{w}") for w in range(k)])
    hat = _fold_sum([F.col(f"s_{w}") * F.col(f"s_{w}") / F.col(f"n_{w}") for w in range(k)])
    ssb = hat - ss * ss / nn
    ssw = qq - hat
    return piv.select(
        nn.cast("long").alias("n_days"),
        F.lit(k).cast("long").alias("k"),
        F.round(ssb, 2).alias("ssb"),
        F.round(ssw, 2).alias("ssw"),
        F.round((ssb / float(k - 1)) / (ssw / (nn - float(k))), 6).alias("f_stat"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {
        name: " ".join(spec.oracle.split())
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }

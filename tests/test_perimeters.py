"""Raster → vector polygonize (`pipeline.perimeters`): connected fire
regions from the tiles raster, vs the DuckDB recursive-CTE oracle and
hand-computed expectations (component merge across the antimeridian, pole
clamp, perimeter edge counts, WKT text)."""

import duckdb
import pandas as pd
import pytest

from filda_spark import grids, pipeline
from filda_spark.compare import compare
from filda_spark.fire_queries import perimeters_oracle_sql

N = 1 << grids.LEVEL_R7
_BASE = grids.LEVEL_R7 * (1 << 58)


def _cell(x: int, y: int) -> int:
    return _BASE + y * (1 << 29) + x


def _tiles_pdf() -> pd.DataFrame:
    rows = []

    def add(x, y, n_fires=1, frp=10.0):
        rows.append(dict(tile_id="h10v04", cell_r7=_cell(x, y), n_fires=n_fires,
                         total_frp=frp * n_fires, max_frp=frp, n_high_conf=0))

    # L-shaped 3-cell region: perimeter 8 exposed edges
    add(100, 200, 2, 5.0)
    add(101, 200, 1, 7.5)
    add(100, 201, 3, 2.25)
    # 2x2 block: perimeter 8
    for dx in (0, 1):
        for dy in (0, 1):
            add(500 + dx, 500 + dy, 1, 1.0)
    # antimeridian pair: x=N-1 and x=0 at same y are E/W neighbours -> ONE
    # region (perimeter 6); bbox is the raw min/max-x box (documented)
    add(N - 1, 300, 1, 3.0)
    add(0, 300, 1, 4.0)
    # north-pole row: y=0 has no northern neighbour; singleton perimeter
    # still counts 4 (the polar edge is exposed)
    add(7, 0, 1, 9.0)
    # singleton
    add(9000, 9000, 5, 50.0)
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def perim(spark, tmp_path_factory):
    pdf = _tiles_pdf()
    p = tmp_path_factory.mktemp("perim") / "tiles.parquet"
    pdf.to_parquet(str(p), index=False)
    out = pipeline.perimeters(spark.createDataFrame(pdf)).toPandas()
    con = duckdb.connect()
    oracle = con.sql(perimeters_oracle_sql(str(p))).df()
    return out, oracle


def test_oracle_parity(spark, perim):
    out, oracle = perim
    sdf = spark.createDataFrame(out)
    assert compare(sdf, oracle) == []


def test_regions_and_perimeters(perim):
    out, _ = perim
    by_comp = out.set_index("component")
    assert len(out) == 5
    # L-shape: component label = min cell id = (100, 200)
    l = by_comp.loc[_cell(100, 200)]
    assert l.n_cells == 3 and l.n_fires == 6 and l.perimeter_edges == 8
    assert l.max_frp == 7.5
    # 2x2 block
    b = by_comp.loc[_cell(500, 500)]
    assert b.n_cells == 4 and b.perimeter_edges == 8
    # antimeridian merge: one region labeled by x=0 (smaller packed id)
    m = by_comp.loc[_cell(0, 300)]
    assert m.n_cells == 2 and m.perimeter_edges == 6
    # pole singleton: north neighbour clamped off, all 4 edges exposed
    p = by_comp.loc[_cell(7, 0)]
    assert p.n_cells == 1 and p.perimeter_edges == 4
    assert by_comp.loc[_cell(9000, 9000)].n_fires == 5


def test_wkt_text_exact(perim):
    out, _ = perim
    w = out.set_index("component").loc[_cell(7, 0), "bbox_wkt"]
    # x=7: lon_w = 7*360/32768 - 180 = -179.923095703125; y=0: lat_n = 90
    assert w == (
        "POLYGON((-179.923095703125000 89.994506835937500, "
        "-179.912109375000000 89.994506835937500, "
        "-179.912109375000000 90.000000000000000, "
        "-179.923095703125000 90.000000000000000, "
        "-179.923095703125000 89.994506835937500))"
    )

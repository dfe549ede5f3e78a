#!/usr/bin/env python
"""sf1 spot-parity for the heavy cover joins (VERDICT.md r3 item 6).

The driver's correctness gate runs at sf0.01; the operators whose pair
counts grow super-linearly (spatiotemporal cover join, kNN join, LSH
connected components, polygon polyfill) deserve evidence at ~sf1 where
the cover joins produce 100x the pairs. There is no driver-generated sf1
directory, so this script deterministically expands sf0.1 by 10x (no RNG:
key-shifted copies; document texts get a deterministic suffix on half the
copies so near-dup — not only exact-dup — clusters appear) and runs the
same Spark-vs-DuckDB hash-parity comparison the driver does, via
``filda_spark.compare.compare``.

    python scripts/sf1_parity.py [--keep]

Prints one JSON line per query plus a summary; exits non-zero on any
mismatch. Results are recorded in SURVEY.md §8.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/filda_sf1"
COPIES = 10

# deterministic key shifts, far above any sf0.1 key range
EV_SHIFT = 1_000_000_000
USER_SHIFT = 10_000_000
CUST_SHIFT = 10_000_000
DOC_SHIFT = 10_000_000

QUERIES = [
    "spatiotemporal_join",
    "knn_join",
    "dup_components",
    "hex_polyfill_x",
    "dbscan_clusters",
    # round-4 layout/analytics ops at 10x rows (registered oracles apply
    # directly; rules out scale-dependent tie-break or overflow divergence)
    "zorder_key",
    "geohash_encode",
    "tile_pyramid",
    "getis_ord_gi",
    "mann_kendall_trend",
    # round-4 continuation ops whose pair/candidate counts scale with the
    # 10x corpus (bloom_registers and polygon_stats are fixed-size inputs
    # here — orders are copied unchanged and the zone set is static)
    "snap_to_segments",
    "bloom_semi_prune",
    "grid_contour",
    "emerging_hotspots",
    # round-4 session-2 ops at 10x rows: the cell-bounded / map-only /
    # window ops run full-corpus with their registered oracles; the two
    # all-pairs covers (ripley, knox) run on a deterministic window at
    # FULL sf1 density (the spatiotemporal_join treatment)
    "local_moran",
    "log_quantiles",
    "slope_aspect",
    "od_flows",
    "hilbert_key",
    "track_simplify",
    "quadtree_bins",
    "kde_epanechnikov",
    "ripley_k_window",
    "knox_pairs_window",
    # session-3: participation-index co-location mining — same windowed
    # treatment (the oracle is a naive theta self-join, quadratic at sf1)
    "colocation_patterns_window",
    # session-3: categorical focal majority — cell-bounded, full corpus
    "focal_majority",
    # session-3: trig-free hillshade over the slope_aspect gradient
    "hillshade",
    # session-3: geostatistics lag structure — cell-bounded, full corpus
    "empirical_variogram",
    # session-4: hydrology pair, robust trend, join counts, ellipse —
    # all cell-/type-bounded, full 10x corpus with registered oracles
    # (std_ellipse additionally exercises the 128-bit moment sums at
    # 10x rows); chunk_documents is map-only over the 10x doc table
    "d8_flow_dir",
    "flow_accumulation",
    "theil_sen_trend",
    "join_counts",
    "std_ellipse",
    "chunk_documents",
    # sessions 5-8: ops whose input volume grows 10x (docs / events /
    # trajectory legs / cell grid); clark_evans is EXCLUDED (censored
    # pair cover goes ~100x at 10x density — the windowed treatment the
    # other pair covers get would not exercise anything new) and
    # skyline_2d / extreme_points / cost-fixed lineitem ops are excluded
    # (inputs copied unchanged)
    "contamination_check",
    "geary_c",
    "terrain_ruggedness",
    "gopher_repetition",
    "unigram_logprob",
    "sequence_pack",
    "bpe_merge_step",
    "window_funnel",
    "retention_cohorts",
    "rasterize_segments",
    "winnowing_fingerprint",
    "domain_mix_weights",
    "histogram_equalize",
    "kmeans_assign",
    # session 9: full-corpus ops over the 10x tables (edit_distance_pairs
    # additionally exercises the hot-fingerprint cap: the 10-copy clusters
    # push every shared fingerprint past _ED_FP_CAP, so the pair set
    # SHRINKS by design — the cap doing its anti-quadratic job)
    "quadrat_chi2",
    "bilinear_resample",
    "acf_lags",
    "bm25_score",
    "markov_transitions",
    "lorenz_gini",
    "entropy_score",
    "benford_deviation",
    "ab_test_ztest",
    "edit_distance_pairs",
    # session 10: moran/huff ride the 10x-denser cell frame (kRing cover
    # pairs and the K-facility broadcast both grow with inhabited cells);
    # runs_test/jsd ride the 10x event/doc tables. vector_quantize is
    # EXCLUDED — embeddings.parquet is copied unchanged at sf1, so the
    # encode would re-run the identical input
    "moran_correlogram",
    "huff_gravity",
    "runs_test",
    "jsd_divergence",
    # session 10b: regrid/morphology/catchment ride the denser cell frame;
    # ols/pmi ride the 10x event table (pmi additionally gets 10x users)
    "area_weighted_regrid",
    "morph_close",
    "two_sfca",
    "ols_trend",
    "pmi_pairs",
    # session 10c: facility/variogram ride the denser cells; hits rides the
    # copied-unchanged lineitem graph — EXCLUDED; seasonal/vocab ride the
    # 10x event/doc tables
    "nearest_facility_dist",
    "directional_variogram",
    "seasonal_residuals",
    "vocab_prune",
    # sessions 11-12: radiation/twi/viewshed/space_time_scan/change ride the
    # 10x-denser cell frame; ewma/holt/mobility/turning/interval ride 10x
    # users (copy-shifted user ids land on fresh trajectory sites since
    # 10^7 % 120 != 0); profile/burstiness/normalized_difference ride the
    # 10x event stream; rrf/zonal/dasymetric ride 10x docs/points.
    # adamic_adar / label_propagation / harmonic_centrality are EXCLUDED —
    # lineitem is copied unchanged, so the graph is identical to sf0.1
    "radiation_model",
    "twi",
    "viewshed",
    "space_time_scan",
    "change_detection",
    "ewma_smooth",
    "holt_linear",
    "mobility_metrics",
    "turning_stats",
    "trajectory_hausdorff",
    "interval_union",
    "profile_correlation",
    "burstiness_index",
    "normalized_difference",
    "rrf_fusion",
    "zonal_histogram",
    "dasymetric_downscale",
    # sessions 13-14: strahler/laplacian/theil/bivariate_moran ride the
    # denser cell frame (bivariate_moran additionally stresses the 128-bit
    # pair moments at 100x products); segment_intersections' candidate
    # pairs grow ~100x (the cover-join scaling case); the rest ride 10x
    # events/users/docs. soundex_blocking / item_cooccurrence /
    # triad_census / graph_assortativity / ann_pq_search are EXCLUDED —
    # part/lineitem/embeddings are copied unchanged
    "strahler_order",
    "sequence_mining",
    "laplacian_curvature",
    "kfold_assign",
    "bivariate_moran",
    "ks_test",
    "lexical_diversity",
    "segment_intersections",
    "quantile_normalize",
    "top_paths",
    "home_work_inference",
    "gravity_calibration",
    "theil_decomposition",
    "ohlc_bars",
    "langid_confusion",
    # session-15 batch: pca/MI/chi2/hurst ride the 10x events/docs corpus
    # (exact-integer moment paths stressed at 10x magnitudes);
    # ridge_regression is EXCLUDED — lineitem is copied unchanged
    "pca_project",
    "mutual_information",
    "chi2_features",
    "hurst_exponent",
    # session-15 graph batch (local_clustering/modularity_score/
    # powerlaw_alpha/reciprocity/k_truss) is EXCLUDED wholesale —
    # all five ride lineitem, which is copied unchanged at sf1
    # session-15 training batch: all five ride the 10x document corpus
    # (bigram/trigram model counts and hashed-bucket LMs at 10x mass;
    # ngram_novelty's first-occurrence min spans the suffixed copies)
    "dsir_weights",
    "flesch_reading",
    "zipf_alpha",
    "bigram_surprisal",
    "ngram_novelty",
    # session-16 point-pattern batch: gfunction_nn/cross_k get the windowed
    # treatment (their DuckDB ring-join oracles are blockwise-NL quadratic
    # at 10x points — the ripley precedent); bearing_rose/motion_vectors
    # ride the 10x trajectory/epoch rasters; pit_fill rides the 10x density
    # surface (same grid, 10x counts — boundary set unchanged)
    "gfunction_nn_window",
    "cross_k_window",
    "bearing_rose",
    "pit_fill",
    "motion_vectors",
    # session-16 analytics batch: auc/boxcount/trend_surface ride the 10x
    # event corpus (denser score sample / lattice / raster); naive_bayes
    # rides the 10x suffixed document corpus (vocab + class mass grow);
    # rect_union_area is EXCLUDED — orders are copied unchanged at sf1
    "auc_mannwhitney",
    "naive_bayes_lang",
    "boxcount_dimension",
    "trend_surface",
    # session-16 batch 3: stump/silhouette ride 10x rows (1M lineitem /
    # 1M events), fdr_bh rides the 10x-denser cell field, ar2/markov ride
    # the 10x per-user series (interleaved hour-shifted copies change the
    # leg structure, not just the mass)
    "decision_stump",
    "fdr_bh",
    "silhouette_simplified",
    "ar2_yule_walker",
    "markov_stationary",
    # session-16 batch 4: calibration/psi ride 1M events, suppress/
    # bootstrap ride the 10x-denser cell field (suppression pattern and
    # replicate membership both change with the counts); ridge_cv_mse is
    # EXCLUDED — lineitem is copied unchanged at sf1 (the
    # ridge_regression convention)
    "calibration_bins",
    "psi_drift",
    "small_cell_suppress",
    "block_bootstrap_var",
    # session-16 batch 5: percolation's quantile threshold is scale-
    # invariant (occupied set stays ~10% of cells at 10x density — the
    # cluster GEOMETRY changes); nms/kaplan/entropy/heaps ride 1M events
    # / 10x user series / 50k suffixed docs
    "percolation_clusters",
    "local_maxima_nms_window",
    "kaplan_meier",
    "entropy_rate",
    "heaps_law",
    # session-16 batch 6: rank/ANOVA/jackknife ride 1M events (128-bit
    # rank sums at 10x N); chao1/burrows ride the 10x suffixed doc corpus
    # (the ' rev' suffix tokens shift the singleton spectrum and marker
    # rates between copies)
    "kruskal_wallis",
    "anova_f",
    "chao1_richness",
    "jackknife_variance",
    "burrows_delta",
    # session-17 batch 1 (association tests): levene/kappa ride 1M events
    # (128-bit z-moments, 10x transition pairs); spearman_rho/kendall_tau/
    # cramers_v are EXCLUDED — lineitem/orders are copied unchanged
    "levene_test",
    "cohen_kappa",
    # session-17 batch 2 (time series): all five ride 1M events (10x
    # phase-histogram mass, 10x per-user series for pacf/drawdown, 10x
    # daily counts for the CCF, 10x users for the hazard curve)
    "diurnal_harmonics",
    "pacf_durbin",
    "cross_correlation",
    "max_drawdown",
    "nelson_aalen",
    # session-17 batch 3 (lexical): all five ride the 10x suffixed doc
    # corpus (spectra, bigram models and top-50 cuts all shift)
    "yule_k",
    "good_turing",
    "simpson_diversity",
    "kneser_ney_bigram",
    "dice_collocations",
    # session-17 batch 4: rayleigh/mcnemar ride 10x users / user-days;
    # graph_diameter/closeness_landmarks/ppr_seeds are EXCLUDED —
    # lineitem is copied unchanged (the adamic_adar convention)
    "rayleigh_test",
    "mcnemar_test",
    # session-17 batch 5 (geo): solar/geodesic/densify/catmull ride 1M
    # events (10x points / trajectory legs); tissot_sinusoidal is
    # EXCLUDED — its graticule is data-free
    "solar_position",
    "geodesic_destination",
    "line_densify",
    "catmull_rom_smooth",
    # session-17 batch 6 (ML eval): roc/lift/cohens_d ride 1M scored
    # events, ndcg/langid_f1 ride the 10x doc corpus (hash ranking and
    # class matrix both change)
    "roc_points",
    "lift_deciles",
    "ndcg_at_k",
    "langid_f1",
    "cohens_d",
    # session-17 batch 7: attribution/rfm/page_hinkley ride 1M events
    # (10x touch pairs, 10x users, same 30-day frame at 10x mass);
    # apriori_rules is EXCLUDED (lineitem copied unchanged)
    "attribution_linear",
    "rfm_scores",
    "page_hinkley",
    # session-17 batch 8 (robust stats): all five ride 1M events (10x
    # distinct-cents frames, 10x user-day pairs, denser daily series)
    "qq_normal_points",
    "trimmed_mean",
    "grubbs_test",
    "wilcoxon_signed_rank",
    "siegel_slopes",
    # session-17 batch 9: textrank rides the 10x doc graph (vocab and
    # edge mass), thinning/hypsometric ride the 10x-denser point/cell
    # field (occupancy and drop pattern change), exp_fit/cohort ride 1M
    # events / 10x users
    "textrank_scores",
    "spatial_thinning",
    "hypsometric_curve",
    "exp_fit_ks",
    "cohort_ltv",
    # session-17 batch 10: mahalanobis/haar/turning ride 1M events (10x
    # moments, 10x daily mass in the dyadic slots), partial_correlation
    # and label_centroids are EXCLUDED (lineitem/embeddings copied
    # unchanged)
    "mahalanobis_outliers",
    "haar_energy",
    "turning_point_test",
    # session-17 batch 11: gumbel/coherence/permutation/odds ride 1M
    # events (10x block maxima mass, 10x day spectra, interleaved
    # hour-shifted copies change the ordinal patterns and weekday mix);
    # bradley_terry is EXCLUDED (lineitem copied unchanged)
    "gumbel_fit_extremes",
    "spectral_coherence",
    "permutation_entropy",
    "odds_ratio_ci",
    # session-17 batch 12: woe/target-encoding ride 1M scored events
    # (decile cuts and category sums shift); ground_track/swath_coverage
    # are data-free constants and embedding_drift rides the
    # copied-unchanged embeddings — all three EXCLUDED
    "woe_iv",
    "target_encoding_loo",
    # session-17 batch 13: friedman/cochran/page ride 10x users' weekly
    # pivots; rank_distance/hhi_concentration are EXCLUDED (lineitem/
    # supplier copied unchanged)
    "friedman_test",
    "cochran_q",
    "page_trend_test",
    # session-17 batch 14: gpd/median_polish ride 1M events (10x tail
    # mass, 10x cell sums); topk/elasticity/vwap are EXCLUDED
    # (lineitem copied unchanged)
    "gpd_tail_fit",
    "median_polish",
    # session-17 batch 15: vocab/dau/record/conversion ride 1M events or
    # the 10x doc corpus (coverage curve, user-day frames, record
    # pattern and lag distribution all shift); solar_irradiance_daily is
    # a data-free graticule (only DOY is data-derived) — EXCLUDED
    "vocab_coverage",
    "dau_wau_stickiness",
    "record_statistics",
    "conversion_lag_quantiles",
    # session-17 batch 16: l_moments/sinuosity/weekday ride 1M events
    # (128-bit hockey-stick sums at 10x rank spans); dup_rate/renyi ride
    # the 10x suffixed doc corpus (the suffix copies create real
    # source-level duplicates)
    "l_moments",
    "line_sinuosity",
    "dup_rate_by_source",
    "renyi_spectrum",
    "weekday_anova",
    # session-17 batch 17 (two-sample tests): all five ride 1M events
    # (pooled prefix frames, risk sets and median splits at 10x mass)
    "cramer_von_mises_2s",
    "anderson_darling_2s",
    "qte_deciles",
    "logrank_test",
    "mood_median_test",
    # session-17 batch 18: all five ride 1M events (within-weekday pair
    # signs, weighted transition mass, diurnal power and octile frames
    # at 10x counts); chi2_residuals is EXCLUDED (orders copied
    # unchanged)
    "seasonal_mann_kendall",
    "weighted_kappa",
    "spectral_entropy",
    "quantile_shape",
]

# 2x2-degree window at full sf1 density for the pair-cover ops (~8k points
# -> ~3e7 DuckDB pair candidates; the quantity that drives pair blowup is
# density, which this preserves exactly)
_RPK_WIN = dict(lat0=2.0, lat1=4.0, lon0=12.0, lon1=14.0)

# spatiotemporal_join at full sf1 produces ~1e8 pairs — too many to collect
# into the pandas comparison (and the oracle is a deliberately naive range
# join). Parity runs on a deterministic spatial window at FULL sf1 density
# (the quantity that drives pair blowup); the full-domain Spark run is
# additionally executed end-to-end (noop sink) and its wall/row count
# recorded as the scale-posture number.
_ST_WIN = dict(lat0=0.0, lat1=5.0, lon0=10.0, lon1=15.0)


def build_sf1() -> None:
    if os.path.isdir(DST) and os.path.exists(f"{DST}/_BUILT"):
        return
    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW ks AS SELECT unnest(range({COPIES})) AS k")
    con.sql(
        f"""
        COPY (
          SELECT e.event_id + k.k * {EV_SHIFT} AS event_id,
                 e.ts + INTERVAL (k.k) HOUR AS ts,
                 e.user_id + k.k * {USER_SHIFT} AS user_id,
                 e.event_type, e.value, e.props
          FROM read_parquet('{SRC}/events.parquet') e CROSS JOIN ks k
        ) TO '{DST}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.sql(
        f"""
        COPY (
          SELECT c.c_custkey + k.k * {CUST_SHIFT} AS c_custkey,
                 c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment
          FROM read_parquet('{SRC}/customer.parquet') c CROSS JOIN ks k
        ) TO '{DST}/customer.parquet' (FORMAT PARQUET)
        """
    )
    # half the copies are byte-exact duplicates, half get a deterministic
    # suffix -> both exact-dup and near-dup clusters at 10x document count
    con.sql(
        f"""
        COPY (
          SELECT CAST(d.doc_id AS BIGINT) + k.k * {DOC_SHIFT} AS doc_id,
                 CASE WHEN k.k >= {COPIES // 2}
                      THEN d.text || ' rev' || CAST(k.k AS VARCHAR)
                      ELSE d.text END AS text,
                 d.lang, d.source, d.n_chars
          FROM read_parquet('{SRC}/documents.parquet') d CROSS JOIN ks k
        ) TO '{DST}/documents.parquet' (FORMAT PARQUET)
        """
    )
    for t in ["region", "nation", "supplier", "part", "orders", "lineitem", "embeddings"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    open(f"{DST}/_BUILT", "w").close()


def _polyfill_x(scale_res: int = 2):
    """hex_polyfill at ~100x the candidate cover: every demo zone (108 vs
    16) at resolution _POLYFILL_RES + ``scale_res`` (each res step shrinks
    cells ~3x in area). Reuses the production kernels (hex pack/center,
    broadcast R-tree PIP) and the production oracle construction
    (_zone_edges_sql ray-cast)."""
    import math

    from pyspark.sql import functions as F

    from filda_spark import hex as hx
    from filda_spark import relational as R
    from filda_spark.pipeline import make_pip_udf
    from filda_spark.spatial import demo_zones

    res = R._POLYFILL_RES + scale_res
    zones = demo_zones()
    cqx, cqy, crx, cry = hx._inv(res)
    ranges = []
    for z in zones:
        corners = [
            (la, lo)
            for la in (min(z["lat"]), max(z["lat"]))
            for lo in (min(z["lon"]), max(z["lon"]))
        ]
        qs = [cqx * lo + cqy * la for la, lo in corners]
        rs = [crx * lo + cry * la for la, lo in corners]
        ranges.append(
            (
                z["zone_id"],
                math.floor(min(qs)) - 1,
                math.ceil(max(qs)) + 1,
                math.floor(min(rs)) - 1,
                math.ceil(max(rs)) + 1,
            )
        )

    def spark_side(spark, sf_dir):
        rdf = spark.createDataFrame(ranges, "zone int, q0 long, q1 long, r0 long, r1 long")
        cand = (
            rdf.select(F.explode(F.sequence("q0", "q1")).alias("q"), "r0", "r1")
            .select("q", F.explode(F.sequence("r0", "r1")).alias("r"))
            .distinct()
        )
        clat, clon = hx.center_cols(F.col("q"), F.col("r"), res)
        cells = cand.select(
            hx.pack_cols(F.col("q"), F.col("r"), res).alias("cell"),
            clat.alias("clat"),
            clon.alias("clon"),
        )
        bc = spark.sparkContext.broadcast(zones)
        zid = make_pip_udf(bc, "zone_id", flag=False).asNondeterministic()
        return (
            cells.withColumn("zone_id", zid("clat", "clon"))
            .filter(F.col("zone_id") >= 0)
            .select("zone_id", "cell")
        )

    clat_sql, clon_sql = hx.center_sql("q", "r", res)
    pack = hx.pack_sql("q", "r", res)
    oracle = f"""
    WITH ranges(zone, q0, q1, r0, r1) AS (VALUES
      {",".join(f"({z}, {q0}, {q1}, {r0}, {r1})" for z, q0, q1, r0, r1 in ranges)}
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
      SELECT {pack} AS cell, {clat_sql} AS clat, {clon_sql} AS clon FROM cand
    ),
    edges(zone, yi, xi, yj, xj) AS (VALUES
      {R._zone_edges_sql(zones)}
    )
    SELECT CAST(e.zone AS INT) AS zone_id, c.cell
    FROM cells c JOIN edges e
      ON (e.yi > c.clat) != (e.yj > c.clat)
     AND c.clon < (e.xj - e.xi) * (c.clat - e.yi) / (e.yj - e.yi) + e.xi
    GROUP BY e.zone, c.cell
    HAVING count(*) % 2 = 1
    """
    return spark_side, oracle


def main() -> int:
    from filda_spark.compare import compare, duckdb_con
    from filda_spark.session import get_spark

    t0 = time.perf_counter()
    build_sf1()
    print(json.dumps({"built": DST, "sec": round(time.perf_counter() - t0, 1)}))
    wanted = [a for a in sys.argv[1:] if not a.startswith("--")]
    queries = [q for q in QUERIES if not wanted or q in wanted]
    run_full_st = not wanted or "spatiotemporal_full_sf1" in wanted

    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from filda_spark import relational as R

    qmap = entry.queries()
    omap = entry.oracle_sql()
    spark = get_spark("sf1-parity")
    con = duckdb_con(DST)
    failures = 0
    results = {}
    try:
        for name in queries:
            t0 = time.perf_counter()
            if name == "hex_polyfill_x":
                fn, osql = _polyfill_x()
                sdf = fn(spark, DST)
            elif name == "spatiotemporal_join":
                w = _ST_WIN
                lat = (F.col("event_id") * 7919 % 2000).cast("double") / 100.0
                lon = ((F.col("event_id") * 104729 % 2400).cast("double") / 100.0) + 10.0
                ev = R._t(spark, DST, "events").filter(
                    (lat >= w["lat0"]) & (lat < w["lat1"])
                    & (lon >= w["lon0"]) & (lon < w["lon1"])
                )
                sdf = R._spatiotemporal_pairs(spark, DST, events=ev)
                osql = f"""
                WITH p0 AS (
                  SELECT event_id, epoch_ms(ts) AS t_ms,
                         CAST(event_id * 7919 % 2000 AS DOUBLE) / 100.0 AS lat,
                         CAST(event_id * 104729 % 2400 AS DOUBLE) / 100.0 + 10.0 AS lon
                  FROM events
                ), p AS (
                  SELECT * FROM p0
                  WHERE lat >= {w["lat0"]} AND lat < {w["lat1"]}
                    AND lon >= {w["lon0"]} AND lon < {w["lon1"]}
                )
                SELECT a.event_id AS a_id, b.event_id AS b_id,
                       round((a.lat-b.lat)*(a.lat-b.lat) + (a.lon-b.lon)*(a.lon-b.lon), 9) AS d2,
                       CAST(abs(a.t_ms - b.t_ms) AS BIGINT) AS dt_ms
                FROM p a JOIN p b
                  ON a.event_id < b.event_id
                 AND b.t_ms BETWEEN a.t_ms - {R._ST_T_MS} AND a.t_ms + {R._ST_T_MS}
                 AND (a.lat-b.lat)*(a.lat-b.lat) + (a.lon-b.lon)*(a.lon-b.lon)
                     <= {R._ST_D * R._ST_D!r}
                """
            elif name in (
                "ripley_k_window",
                "knox_pairs_window",
                "colocation_patterns_window",
                "gfunction_nn_window",
                "cross_k_window",
                "local_maxima_nms_window",
            ):
                w = _RPK_WIN
                lat = (F.col("event_id") * 7919 % 2000).cast("double") / 100.0
                lon = ((F.col("event_id") * 104729 % 2400).cast("double") / 100.0) + 10.0
                ev = R._t(spark, DST, "events").filter(
                    (lat >= w["lat0"]) & (lat < w["lat1"])
                    & (lon >= w["lon0"]) & (lon < w["lon1"])
                )
                base = name.removesuffix("_window")
                sdf = R.REGISTRY[base].fn(spark, DST, events=ev)
                win_sql = (
                    f"lat >= {w['lat0']} AND lat < {w['lat1']}"
                    f" AND lon >= {w['lon0']} AND lon < {w['lon1']}"
                )
                osql = R.REGISTRY[base].oracle
                if base == "ripley_k":
                    # rename the _PT_SQL CTE and interpose a windowed view
                    # under the original name (downstream CTEs untouched)
                    osql = osql.replace("WITH p AS (", "WITH p0_ AS (", 1).replace(
                        "),\n    g AS",
                        f"),\n    p AS (SELECT * FROM p0_ WHERE {win_sql}),\n    g AS",
                        1,
                    )
                elif base == "colocation_patterns":
                    osql = osql.replace("WITH p AS (", "WITH p0_ AS (", 1).replace(
                        "),\n    pairs AS",
                        f"),\n    p AS (SELECT * FROM p0_ WHERE {win_sql}),\n    pairs AS",
                        1,
                    )
                elif base in ("gfunction_nn", "cross_k", "local_maxima_nms"):
                    # lattice coords are centidegrees: iy = lat*100,
                    # ix = lon*100, so the lat/lon window maps exactly
                    iy_lo, iy_hi = int(w["lat0"] * 100), int(w["lat1"] * 100)
                    ix_lo, ix_hi = int(w["lon0"] * 100), int(w["lon1"] * 100)
                    lat_win = (
                        f"iy >= {iy_lo} AND iy < {iy_hi}"
                        f" AND ix >= {ix_lo} AND ix < {ix_hi}"
                    )
                    osql = osql.replace("WITH pts AS (", "WITH p0_ AS (", 1).replace(
                        "),\n    cpts AS",
                        f"),\n    pts AS (SELECT * FROM p0_ WHERE {lat_win}),\n    cpts AS",
                        1,
                    )
                else:
                    # knox: window p0 BEFORE the bucket computation so the
                    # time span comes from the windowed subset (mirrors the
                    # Spark side, which receives the filtered frame)
                    osql = osql.replace(
                        "bounds AS (SELECT min(t_ms) AS t0, max(t_ms) + 1 AS t1 FROM p0)",
                        f"p0w AS (SELECT * FROM p0 WHERE {win_sql}),\n"
                        "    bounds AS (SELECT min(t_ms) AS t0, max(t_ms) + 1 AS t1 FROM p0w)",
                        1,
                    ).replace("FROM p0 CROSS JOIN bounds", "FROM p0w CROSS JOIN bounds", 1)
                assert "p0w" in osql or "p0_" in osql, "oracle rewrite failed"
            elif name == "dup_components":
                # the driver-gate oracle (recursive reach CTE) is quadratic
                # in component size and the 10x corpus has dense exact-dup
                # cliques — DuckDB grinds for hours. The sf1 oracle is the
                # LSH pair set computed BY DuckDB (the independent part)
                # plus a plain union-find over those edges (pinned equal to
                # the engine's min-label propagation by tests/test_graph).
                import pandas as pd

                sdf = qmap[name](spark, DST)
                edges = con.sql(omap["minhash_lsh_pairs"]).df()
                docs = con.sql("SELECT CAST(doc_id AS BIGINT) AS d FROM documents").df()
                parent = {int(d): int(d) for d in docs["d"]}

                def find(x: int) -> int:
                    while parent[x] != x:
                        parent[x] = parent[parent[x]]
                        x = parent[x]
                    return x

                for a, b in zip(edges["doc_a"], edges["doc_b"]):
                    ra, rb = find(int(a)), find(int(b))
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
                odf = pd.DataFrame(
                    {"doc_id": list(parent), "component": [find(x) for x in parent]}
                )
                osql = None
            elif name == "dbscan_clusters":
                # at sf1 the lattice positions collapse 10-deep (EV_SHIFT
                # keeps ids distinct, positions repeat), so the window holds
                # dense cliques — the recursive-CTE driver oracle is
                # quadratic in clique size. Same treatment as
                # dup_components: DuckDB computes the INDEPENDENT part (the
                # eps pair set, identical float arithmetic), python
                # union-find + border assignment derive the clustering.
                import pandas as pd

                sdf = qmap[name](spark, DST)
                eps2 = repr(R._DB_EPS * R._DB_EPS)
                pairs = con.sql(
                    f"""
                    WITH p0 AS (
                      SELECT event_id,
                             CAST(event_id * 7919 % 2000 AS DOUBLE) / 100.0 AS lat,
                             CAST(event_id * 104729 % 2400 AS DOUBLE) / 100.0 + 10.0 AS lon
                      FROM events
                    ), p AS (
                      SELECT * FROM p0
                      WHERE lat < {R._DB_LAT_MAX!r} AND lon < {R._DB_LON_MAX!r}
                    )
                    SELECT a.event_id AS a_id, b.event_id AS b_id
                    FROM p a JOIN p b
                      ON a.event_id < b.event_id
                     AND (a.lat-b.lat)*(a.lat-b.lat) + (a.lon-b.lon)*(a.lon-b.lon)
                         <= {eps2}
                    """
                ).df()
                adj_count = pairs.groupby("a_id").size().to_dict()
                for b_id, n in pairs.groupby("b_id").size().items():
                    adj_count[b_id] = adj_count.get(b_id, 0) + n
                core = {n for n, c in adj_count.items() if c + 1 >= R._DB_MINPTS}
                parent = {n: n for n in core}

                def find(x: int) -> int:
                    while parent[x] != x:
                        parent[x] = parent[parent[x]]
                        x = parent[x]
                    return x

                aa, bb = pairs["a_id"].to_numpy(), pairs["b_id"].to_numpy()
                for a_, b_ in zip(aa, bb):
                    a_, b_ = int(a_), int(b_)
                    if a_ in core and b_ in core:
                        ra, rb = find(a_), find(b_)
                        if ra != rb:
                            parent[max(ra, rb)] = min(ra, rb)
                comp = {n: find(n) for n in core}
                border: dict[int, int] = {}
                for a_, b_ in zip(aa, bb):
                    a_, b_ = int(a_), int(b_)
                    for x, y in ((a_, b_), (b_, a_)):
                        if x not in core and y in core:
                            c = comp[y]
                            if x not in border or c < border[x]:
                                border[x] = c
                odf = pd.DataFrame(
                    {
                        "event_id": list(comp) + list(border),
                        "cluster": list(comp.values()) + list(border.values()),
                        "is_core": [True] * len(comp) + [False] * len(border),
                    }
                )
                osql = None
            else:
                fn, osql = qmap[name], omap[name]
                sdf = fn(spark, DST)
            if osql is not None:
                odf = con.sql(osql).df()
            issues = compare(sdf, odf)
            wall = round(time.perf_counter() - t0, 1)
            ok = not issues
            failures += 0 if ok else 1
            results[name] = dict(ok=ok, rows=len(odf), sec=wall, issues=issues[:2])
            print(json.dumps({name: results[name]}))

        if run_full_st:
            # full-domain spatiotemporal cover join at sf1, Spark end-to-end
            # (count only — the pair set itself is the 1e8-row scale evidence)
            t0 = time.perf_counter()
            full_rows = qmap["spatiotemporal_join"](spark, DST).count()
            results["spatiotemporal_full_sf1"] = dict(
                rows=int(full_rows), sec=round(time.perf_counter() - t0, 1)
            )
            print(json.dumps({"spatiotemporal_full_sf1": results["spatiotemporal_full_sf1"]}))
    finally:
        spark.stop()
        if "--keep" not in sys.argv:
            shutil.rmtree(DST, ignore_errors=True)
    print(json.dumps({"sf1_parity": "PASS" if not failures else "FAIL", "queries": results}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

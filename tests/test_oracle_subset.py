"""Cross-engine regression net inside pytest: a cheap subset of catalog
queries hash-compared against DuckDB at sf0.001 on every test run, so an
oracle-breaking change fails the suite immediately rather than at the
round gate. The full sweep stays in tools/oracle_check.py (sf0.01)."""

from __future__ import annotations

import os

import duckdb
import pytest

from finporter_spark.queries.catalog import catalog_oracles, catalog_queries
from tools.oracle_check import frame_hash

SUBSET = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "p6_datetime",
    "p10_surrogate_id",
    "j6_asof_join",
    "a4_cube",
    "w3_running_sum",
    "o5_dedup_latest",
    "u3_grouped_agg_median",
    "l1_exact_dedup",
    "l6_rolling_hash",
    "x2_sliding_window",
    # round-3 additions: one per new operator family
    "q6_revenue_change",
    "q13_customer_distribution",
    "q21_waiting_supplier",
    "u5_udtf_bigrams",
    "s9_schema_evolution",
    "o8_compact_small_files",
    "p15_higher_order_funcs",
    "l15_bigram_lm_score",
    "w5_gap_fill",
    # round-4 additions
    "l19_blocked_allpairs",
    "w6_sessionize",
    "o9_scd2_history",
    "o10_cdc_apply",
    "p16_fuzzy_join",
    "p17_url_extract",
    "z4_salted_join",
    "j6b_asof_forward",
    # round-5 additions
    "o12_epoch_shuffle",
    "o13_source_mix",
    "o14_three_way_split",
    "w7_streaks",
    "l22_semantic_dedup",
    "l23_curriculum_sample",
    "l24_bm25_rank",
    "l25_span_dedup",
    "a13_profile_columns",
    "pipe4_hybrid_retrieval",
    "w8_time_decay_score",
    "m11_image_dhash_dedup",
    "l26_quality_classifier",
    "x11_stream_budget_gate",
    "s12_python_datasource",
    "s13_datasource_roundtrip",
    "x12_datasource_stream",
    "w9_ohlc_downsample",
    "o15_k_anonymity",
    "w10_max_drawdown",
    "o16_snapshot_diff",
    "l27_frequency_spectrum",
    "a15_grouping_sets",
    # round-11 additions
    pytest.param(
        "l45c_ivfadc_topk",
        marks=pytest.mark.slow,  # ~63 s: full IVFADC build; the driver's own oracle gate and the committed full sweep cover it
    ),
    "a42_psi_weekly",
    "a43_ks_weekly",
    "a44_mwu_weekly",
    "s15_orc_pushdown",
    "p18_variant_extract",
    "s16_xml_roundtrip",
    "a45_attribution",
    "l42_label_propagation",
    "p19_lateral_topk",
    # a14_rolling_hll_rollup: ≈ operator, no SQL oracle — error bound
    # asserted in tests/test_operators.py instead
]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.sql(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_hash_matches_duckdb(spark, sf_dir, ddb, name):
    spark_df = catalog_queries()[name](spark, sf_dir).toPandas()
    oracle_df = ddb.sql(catalog_oracles()[name]).df()
    assert len(spark_df) == len(oracle_df), "row count"
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), "columns"
    assert frame_hash(spark_df) == frame_hash(oracle_df), "value hash"

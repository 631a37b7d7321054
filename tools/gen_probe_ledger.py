#!/usr/bin/env python3
"""Generate tools/probe_ledger.json — the EXECUTABLE probe-exclusion
ledger (VERDICT r17 #2).

The scale probe measures ~114 of the registry's rows; the rest are
excluded for reasons that previously lived scattered across three
BASELINE.md narrative sections, so "zero super-linear" was only
auditable by reading prose. This script IS the reviewable source of
the classification: every registry row is listed explicitly (no
pattern magic), assigned one category and a one-line reason. It emits:

  tools/probe_ledger.json  — {row: {category, reason}}, the artifact
                             scale_probe.py reads its ROWS from and
                             ProbeLedgerSpec enforces against the live
                             registry (keys == SparkEntry.queries keys,
                             categories valid, probed rows backed by
                             real x8+x32 measurements in
                             scale_probe_out.json).

Categories:
  probed           — slope/state measured at 1x/8x/32x steady reps
                     (tools/scale_probe_out.json carries the samples)
  pinned-witness   — parameters pinned so the DuckDB oracle can replay
                     the construction; quadratic past design density BY
                     CONSTRUCTION; the production dispatch is probed
  micro-batch-floor— cost is the streaming micro-batch lifecycle
                     (state-store commits, trigger cycles) over a fixed
                     staged feed, not input-proportional data work
  sub-floor-scalar — map-only codegen'd projection/filter; steady time
                     below the ~0.3 s per-query floor where a slope
                     measures JVM fixed costs, not data work
  fixed-domain     — input/output is a fixed-size domain (dims,
                     synthetic series, SQL-surface witnesses over
                     bounded tables) that does not scale with sf

(the former family-covered category — trust-by-analogy plan-shape
coverage — was eliminated in round 18 and DELETED from the taxonomy in
round 19, ADVICE r18 #3.)

Run from the repo root after adding/removing a Spec; ProbeLedgerSpec
fails the build if the ledger and the registry drift.
"""
import json, os, re, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ---- probed rows (must each carry x8+x32 samples in scale_probe_out) ----
PROBED = """sql_tpch_q1 sql_tpch_q4 sql_tpch_q5 sql_tpch_q9 sql_tpch_q11
sql_tpch_q18 sql_tpch_q21 sql_tpch_q22
join_inner_hash join_multiway join_broadcast join_asof join_skew_aqe
join_salted join_fuzzy join_range_bin
agg_hash_group agg_distinct agg_grouping_sets agg_sketch_quantile
agg_sketch_cms agg_approx_distinct
win_topk_per_group win_ntile win_retention sort_multi set_union_distinct
scan_parquet filter_pred
llm_dedup_exact llm_dedup_near llm_dedup_simhash llm_dedup_incremental
llm_cosine_topk llm_ann_lsh llm_ann_ivf llm_text_stats llm_tfidf
llm_lm_score llm_cooccur llm_chunking llm_multimodal_decode
graph_pagerank ts_interpolate_linear
llm_dedup_ngram llm_dedup_cluster llm_dedup_embed llm_vocab
llm_lang_id llm_quality_score llm_fingerprint llm_ngram_lm
llm_contamination llm_pack_sequences llm_split_hash
win_lag_lead agg_rollup agg_cube set_except pivot_status
sink_partitioned sink_codec_zstd agg_custom_typed ds_map_partitions
win_running_frame win_range_frame join_left_anti join_left_semi
set_intersect llm_winsorize llm_curriculum llm_oov_rate
source_stream_window stream_transform_with_state stream_update_mode
stream_foreachbatch_upsert stream_chained_agg
join_stream_stream join_stream_stream_outer join_stream_stream_full
join_stream_static stream_join_then_window
source_stream_join source_stream_join_outer
stream_dedup stream_session stream_watermark_late
stream_tumbling stream_sliding stream_stateful_custom
stream_tws_timers stream_tws_mapstate
sql_tpch_q2 sql_tpch_q3 sql_tpch_q6 sql_tpch_q7 sql_tpch_q8
sql_tpch_q10 sql_tpch_q12 sql_tpch_q13 sql_tpch_q14 sql_tpch_q15
sql_tpch_q16 sql_tpch_q17 sql_tpch_q19 sql_tpch_q20
sink_compacted zorder_layout snapshot_diff merge_upsert
llm_bm25 llm_bm25_ln llm_dup_span llm_semdedup
scan_csv scan_json scan_avro scan_orc scan_xml scan_text
scan_schema_evolve scan_partition_prune
join_left_outer join_full_outer join_using_natural join_dpp
join_bucketed join_bloom join_lateral subquery_correlated
win_rank win_scd2_intervals win_session_gap win_cume_dist
sql_lateral_view sql_udf_scalar sql_udf_table sql_script_transform
sql_cluster_by sql_hint_rebalance
set_union_all set_except_all set_intersect_all set_union_byname
llm_pii_scrub llm_token_count llm_repetition llm_url_canonical
llm_embed_quantize llm_bpe_apply llm_multimodal_resize
llm_multimodal_audio
agg_collect agg_string_concat agg_skew_salted agg_max_by
filter_date project gap_fill_daily sink_json_lines
llm_ann_ivfpq
agg_any_value agg_approx_percentile agg_approx_topk agg_bitmap_distinct agg_bitmap_native agg_bool_family
agg_corr_covar agg_filtered agg_global agg_grouping_id agg_higher_moments agg_histogram
agg_mode agg_percentile agg_regression agg_sketch_hll agg_stats_builtin agg_stats_moments
agg_listagg agg_within_group agg_try_arith win_first_last win_rolling_distinct win_locf
win_percent_rank win_pattern_match join_right_outer join_hint_shj join_point_in_time join_theta_range
scan_json_multiline scan_csv_corrupt scan_manifest_pruned scan_recursive_lookup scan_binaryfile sink_csv_options
sink_partition_overwrite sink_table_v2 opt_aqe_coalesce opt_exchange_reuse opt_cbo_reorder opt_levenshtein_rule llm_instruction_format
llm_text_normalize llm_sample_stratified llm_filter_funnel llm_domain_mix llm_bpe_pairs llm_bpe_train
llm_multimodal_framesample llm_multimodal_struct fn_math fn_regex fn_json fn_sequence_array
fn_stack ds_typed_api ds_random_split limit_topk offset_page pivot_multi_agg
filter_like_family join_null_aware_anti join_anti_null_rewrite join_null_safe profile_accumulator profile_analyze_stats
profile_columns profile_crosstab profile_observe profile_sketch_functions profile_stat_functions
profile_summary scan_file_metadata sql_hint_broadcast sql_hint_merge sql_lateral_alias
sql_named_window stream_rocksdb_state win_range_interval""".split()

PROBED_REASON = ("slope/state measured at 1x/8x/32x steady reps "
                 "(tools/scale_probe_out.json)")

# Probed rows whose super-linear slope is REAL and adjudicated: the
# measurement stays on disk and in the report, with the evidence here.
# (round 19: the opt_exchange_reuse adjudication was RETIRED by
# re-shaping the row itself — the reuse witness is now two different
# aggregates over one exchange, linear output; the quadratic
# equal-count self-join shape is documented in the row's docstring as
# do-not-ship, with the closed form. Fresh x8/x32 samples for the
# re-shaped row replaced the old ones in scale_probe_out.json.)
ADJUDICATED = {}

# ---- excluded rows: {row: (category, reason)} -------------------------
# (ADVICE r18 #3: the family-covered category was eliminated in round 18
# — every former member is measured — so FAM and its reason strings are
# DELETED from this taxonomy and from ProbeLedgerSpec's valid set;
# reintroducing trust-by-analogy coverage now requires an explicit,
# reviewable change to both files.)
MBF = "micro-batch-floor"
SFS = "sub-floor-scalar"
FXD = "fixed-domain"
PIN = "pinned-witness"

_scalar = ("map-only codegen'd scalar projection over the fixture; "
           "no exchange, steady time under the per-query floor")
_sqlsurf = ("SQL-surface witness over a fixed/dim-sized domain; no "
            "sf-proportional data work")

EXCLUDED = {
    # re-homed entries whose original lines were shared with rows the
    # round-18 probe expansions promoted to `probed`
    "fn_regex_position": (SFS, _scalar),
    "fn_str_to_map": (SFS, _scalar),
    "agg_unpivot": (FXD, "unpivot of a single global-agg row; output is "
        "O(measures), fixed"),
    "ds_cache_reuse": (FXD, "cache-hit semantics witness; fixed 5-row "
        "output over one scan"),
    "ds_checkpoint": (FXD, "lineage-truncation witness; fixed output"),
    "ds_transpose": (FXD, "2-row transposed output; O(columns) domain"),
    "fn_aes_roundtrip": (SFS, _scalar), "fn_array": (SFS, _scalar),
    "fn_array_construct": (SFS, _scalar), "fn_array_edit": (SFS, _scalar),
    "fn_array_set_ops": (SFS, _scalar), "fn_avro_roundtrip": (SFS, _scalar),
    "fn_binary_conv": (SFS, _scalar), "fn_bitwise": (SFS, _scalar),
    "fn_conditional": (SFS, _scalar), "fn_csv_roundtrip": (SFS, _scalar),
    "fn_date": (SFS, _scalar), "fn_date_parts": (SFS, _scalar),
    "fn_datetime_format": (SFS, _scalar), "fn_datetime_make": (SFS, _scalar),
    "fn_datetime_names": (SFS, _scalar), "fn_explode_outer": (SFS, _scalar),
    "fn_guards": (SFS, _scalar), "fn_hash": (SFS, _scalar),
    "fn_interval": (SFS, _scalar),
    "fn_json_meta": (SFS, _scalar), "fn_luhn": (SFS, _scalar),
    "fn_map": (SFS, _scalar), "fn_map_hof": (SFS, _scalar),
    "fn_mask": (SFS, _scalar),
    "fn_na_fill": (SFS, _scalar), "fn_number_format": (SFS, _scalar),
    "fn_printf": (SFS, _scalar), "fn_reflect": (SFS, _scalar),
    "fn_rounding": (SFS, _scalar),
    "fn_string": (SFS, _scalar), "fn_string_edit": (SFS, _scalar),
    "fn_timezone": (SFS, _scalar), "fn_to_number": (SFS, _scalar),
    "fn_try_arith": (SFS, _scalar), "fn_try_cast": (SFS, _scalar),
    "fn_udf_scalar": (SFS, _scalar + " (quarantined UDF demo)"),
    "fn_udtf_explode": (SFS, "explode fan-out projection; the "
        "explode+agg scaling is probed via llm_chunking/llm_text_stats"),
    "fn_url": (SFS, _scalar), "fn_variant": (SFS, _scalar),
    "fn_variant_explode": (SFS, _scalar), "fn_width_bucket": (SFS, _scalar),
    "fn_xml_roundtrip": (SFS, _scalar), "fn_xpath": (SFS, _scalar),
    "fn_collation": (FXD, "1-row collation witness"),
    "fn_id_generation": (FXD, "id-uniqueness witness; 1-row output"),
    "fn_encode": (FXD, "20-row charset round-trip witness"),
    # time series / gap fill
    "join_bnlj_theta": (FXD, "bounded dim-side build, BNLJ allowlisted "
        "in PlanAuditSpec for bounded builds only"),
    "join_cross": (FXD, "bounded dim x dim cross (region/nation); "
        "cartesian allowlisted for bounded builds only"),
    "llm_dedup_embed_ortables": (PIN, "(b, T) pinned at the n=32768 "
        "design values so the DuckDB oracle replays the construction; "
        "quadratic past that density BY CONSTRUCTION — the production "
        "dispatch llm_dedup_embed is probed (slope 0.94)"),
    "llm_semdedup_scaled": (PIN, "k=128/p=4 pinned for the exact oracle "
        "replay; same adjudication as llm_dedup_embed_ortables — the "
        "production dispatch llm_semdedup is probed (slope 0.44)"),
    "profile_stream_progress": (MBF, "progress-event introspection of a "
        "fixed 2-batch stream; cost is the trigger lifecycle"),
    # scans beyond parquet
    "scan_jdbc": (FXD, "embedded-Derby partitioned read of a fixed "
        "375-row table; the 4-partition split is the witness"),
    "scan_state_metadata": (FXD, "metadata of the fixed 600-row "
        "synthetic checkpoint"),
    "scan_state_store": (FXD, "state read-back of the fixed 600-row "
        "synthetic checkpoint"),
    # set ops beyond the probed reps
    "sink_stream_foreach": (MBF, "foreach sink lifecycle over a staged "
        "replay; per-batch sink commits dominate"),
    "sink_stream_table": (MBF, "toTable sink lifecycle; fixed staged "
        "feed, per-batch commits dominate"),
    # streaming sources with fixed feeds
    "source_stream_file": (MBF, "5-file staged replay; cost is the "
        "micro-batch admission/commit cycle, not data mass"),
    "source_stream_rate": (MBF, "rate-micro-batch synthetic feed of "
        "fixed n=1000; single AvailableNow batch lifecycle"),
    "source_stream_socket": (MBF, "loopback feeder of fixed 500 lines; "
        "cost is socket/trigger lifecycle (first-touch pre-paid in "
        "Bench since r18)"),
    "stream_incremental_restart": (MBF, "checkpoint kill/restart "
        "witness; cost is restart + offset-replay lifecycle"),
    "sql_default_columns": (FXD, "DEFAULT-column DDL/DML witness over a "
        "5-row managed table"),
    "sql_execute_immediate": (FXD, _sqlsurf),
    "sql_group_by_all": (FXD, _sqlsurf),
    "sql_identifier_clause": (FXD, _sqlsurf),
    "sql_insert_into": (FXD, _sqlsurf + " (4-row managed table)"),
    "sql_parameterized": (FXD, _sqlsurf),
    "sql_pipe_syntax": (FXD, _sqlsurf),
    "sql_pivot_clause": (FXD, _sqlsurf + "; pivot_status is the probed "
        "pivot representative"),
    "sql_recursive_cte": (FXD, "bounded-depth recursion over a small "
        "edge set; output fixed by the closure"),
    "sql_scripting": (FXD, _sqlsurf), "sql_scripting_for": (FXD, _sqlsurf),
    "sql_session_variable": (FXD, _sqlsurf),
    "sql_star_except": (FXD, _sqlsurf),
    "sql_tablesample": (FXD, "TABLESAMPLE witness; 1-row count output"),
    "sql_tvf_range": (FXD, "range() TVF witness; 10-row synthetic "
        "domain"),
    "sql_unpivot_clause": (FXD, _sqlsurf),
    "sql_values_inline": (FXD, "inline VALUES; no fixture scan at all"),
    # correlated subquery

}
VALID = {"probed", PIN, MBF, SFS, FXD}


def registry_names():
    """Registry = the SURVEY §2.11 index (RegistryIndexSpec keeps it
    set-equal to the live SparkEntry.queries)."""
    text = open(os.path.join(REPO, "SURVEY.md")).read()
    start = text.index("### 2.11")
    return re.findall(r"\| `([a-z0-9_]+)` \| src/", text[start:])


def main():
    names = registry_names()
    ledger = {}
    for n in PROBED:
        ledger[n] = {"category": "probed", "reason": PROBED_REASON}
        if n in ADJUDICATED:
            ledger[n]["adjudication"] = ADJUDICATED[n]
    assert not (set(ADJUDICATED) - set(PROBED)), \
        "adjudications only apply to probed rows"
    for n, (cat, reason) in EXCLUDED.items():
        assert n not in ledger, f"{n} both probed and excluded"
        ledger[n] = {"category": cat, "reason": reason}
    missing = set(names) - set(ledger)
    extra = set(ledger) - set(names)
    # sink_parquet is a §2 table row but not a registry query; the
    # ledger covers the REGISTRY (what the probe can run).
    assert not missing, f"registry rows missing a ledger entry: {sorted(missing)}"
    assert not extra, f"ledger rows not in the registry: {sorted(extra)}"
    for n, e in ledger.items():
        assert e["category"] in VALID and e["reason"].strip(), n
    out = os.path.join(REPO, "tools", "probe_ledger.json")
    with open(out, "w") as f:
        json.dump({k: ledger[k] for k in sorted(ledger)}, f, indent=1)
        f.write("\n")
    by_cat = {}
    for n, e in ledger.items():
        by_cat.setdefault(e["category"], []).append(n)
    print(f"wrote {out}: {len(ledger)} rows")
    for c in sorted(by_cat):
        print(f"  {c:18s} {len(by_cat[c])}")


if __name__ == "__main__":
    main()

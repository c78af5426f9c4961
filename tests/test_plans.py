"""Physical-plan regression guards for the analytics shapes.

Correctness is the oracle gate's job; these tests pin the PLANS — the
properties that decide whether a query survives a 100× scale-up:
dimension joins stay broadcast (no dim-side shuffle), selective filters
reach the parquet scan (PushedFilters), and nothing degenerates into a
cartesian/nested-loop join.
"""

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = entry.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name,min_broadcasts",
    [
        ("local_supplier_volume", 3),  # supplier, nation, region dims
        ("nation_trade_volume", 3),    # supplier + both nation aliases
        ("market_share", 4),           # part, nations, region, supplier
        ("nation_profit", 3),          # part, supplier, nation
        ("small_quantity_revenue", 1), # part dim broadcast
        ("idle_customers", 1),         # one-row scalar floor broadcast
    ],
)
def test_dims_stay_broadcast(spark, name, min_broadcasts):
    plan = _plan(spark, name)
    assert plan.count("BroadcastHashJoin") >= min_broadcasts, plan
    assert "CartesianProduct" not in plan
    # BroadcastNestedLoopJoin is legitimate ONLY for the deliberate
    # one-row scalar crossJoins; never for a keyed dim join
    if name != "idle_customers":
        assert "BroadcastNestedLoopJoin" not in plan or "Cross" in plan


def test_selective_filters_reach_the_scan(spark):
    # Q6 shape: date/discount/quantity predicates must be in PushedFilters
    plan = _plan(spark, "forecast_revenue")
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed, pushed


def test_pair_selection_prunes_to_metadata_columns(spark):
    # ReadSchema on documents must carry only the derivation columns
    plan = _plan(spark, "image_pairs_select")
    read_schemas = [
        seg.split(">", 1)[0] for seg in plan.split("ReadSchema: struct<")[1:]
    ]
    assert read_schemas, plan
    for rs in read_schemas:
        cols = {c.split(":")[0] for c in rs.split(",") if c}
        assert cols <= {"doc_id", "text"}, cols


def test_topk_is_take_ordered_not_global_sort(spark):
    # cosine_topk must plan TakeOrderedAndProject, not a full Sort+Limit
    plan = _plan(spark, "cosine_topk")
    assert "TakeOrderedAndProject" in plan, plan


def test_caption_alignment_stays_native(spark):
    # the CLIP-shaped filter must be pure JVM expressions — any Python
    # row/batch eval node means the hot path fell off whole-stage codegen
    plan = _plan(spark, "caption_alignment")
    assert "PythonUDF" not in plan and "ArrowEval" not in plan, plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_ar_bucket_batches_single_exchange(spark):
    # band key -> window -> agg must reuse ONE hash partitioning: the
    # window's (bucket) partitioning also serves the groupBy(bucket,
    # batch_id) agg, so exactly one shuffle of the fact rows
    plan = _plan(spark, "ar_bucket_batches")
    body = plan.split("== Initial Plan ==")[0]
    assert body.count("Exchange hashpartitioning") == 1, body


@pytest.mark.parametrize(
    "name,min_broadcasts",
    [
        ("min_cost_supplier", 3),      # part, supplier, nation dims
        ("supplier_part_variety", 2),  # part dim + supplier blacklist
        ("surplus_suppliers", 2),      # red-parts dim on both aggregates
        ("countmin_heavy_hitters", 1), # the 4x256 grid broadcasts
        ("pq_adc_topk", 2),            # codebook + query distance table
    ],
)
def test_new_shapes_stay_broadcast(spark, name, min_broadcasts):
    plan = _plan(spark, name)
    assert plan.count("BroadcastHashJoin") >= min_broadcasts, plan
    assert "CartesianProduct" not in plan


def test_sitemap_parse_is_pure_codegen(spark):
    """Sitemap parsing must stay native (regex extraction in codegen):
    no Python evaluation node anywhere in the plan."""
    plan = _plan(spark, "sitemap_ingest")
    for node in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas", "MapInPandas"):
        assert node not in plan, plan
    # the priority regex must run on the exploded ENTRY, never re-parse
    # the whole xml blob per output row (Generate-boundary CSE trap)
    assert "regexp_extract_all(xml" not in plan.split("Generate ", 1)[0], plan


def test_pq_scan_side_never_sorts_globally(spark):
    """ADC top-k must be TakeOrdered (per-partition heap + driver merge),
    not a global Sort+Limit."""
    plan = _plan(spark, "pq_adc_topk")
    assert "TakeOrderedAndProject" in plan, plan


def test_quality_classifier_single_scan_no_shuffle(spark):
    """The hashed linear model must run entirely inside the scan
    projection: no Python eval nodes AND no Exchange — scoring 10^10
    docs is then embarrassingly parallel by construction."""
    plan = _plan(spark, "quality_classifier")
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, plan
    body = plan.split("== Initial Plan ==")[0]
    assert "Exchange" not in body, body


def test_warc_parse_is_pure_codegen(spark):
    """WARC record parsing (write + re-parse + agg) must stay native —
    regex extraction in codegen, no Python evaluation anywhere."""
    plan = _plan(spark, "warc_roundtrip")
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, plan


def test_curriculum_stages_has_no_window(spark):
    """Stage boundaries must come from percentile aggregation + a
    broadcast join — a regression to a global ntile window would
    serialize the corpus into one sort task."""
    plan = _plan(spark, "curriculum_stages")
    assert "Window" not in plan, plan
    assert "BroadcastNestedLoopJoin BuildRight, Cross" in plan  # 1-row cuts


def test_retrieval_eval_broadcasts_the_sample_side(spark):
    """The caption corpus streams; only the query SAMPLE is broadcast.
    The materialization boundary (repartition Exchange below the join)
    must survive too — without it the md5 projection re-derives per
    pair."""
    plan = _plan(spark, "retrieval_recall")
    assert "BroadcastNestedLoopJoin BuildRight, Cross" in plan, plan
    assert "Exchange" in plan, plan


def test_pack_windows_are_bucket_partitioned(spark):
    """Shard packing's running-sum window must be partitioned by the
    hash bucket — a partition-less window is the global-sort trap."""
    for name in ("pair_shards", "pair_pipeline", "sequence_packing"):
        plan = _plan(spark, name).lower()
        assert "windowspecdefinition(bucket" in plan, (name, plan[:2000])


def test_ivf_batch_no_cartesian(spark):
    """Multi-query IVF: probe ranking and candidate scoring must stay
    keyed joins (cell_id) plus deliberate small-side crosses — never a
    CartesianProduct."""
    plan = _plan(spark, "ann_recall_eval")
    assert "CartesianProduct" not in plan, plan


def test_spam_mass_totals_broadcast_and_no_cartesian(spark):
    # the two one-row totals fold in via broadcast; the seed indicator
    # joins broadcast; nothing may degenerate to CartesianProduct
    plan = _plan(spark, "spam_mass")
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) >= 3, plan
    assert "PythonUDF" not in plan


def test_host_communities_stays_native(spark):
    plan = _plan(spark, "host_communities")
    assert "CartesianProduct" not in plan, plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_shingle_containment_shares_jaccards_shape(spark):
    # shared-shingle equi-join candidate pre-filter: a real keyed join,
    # no cartesian, no Python in the pair loop
    plan = _plan(spark, "shingle_containment")
    assert "CartesianProduct" not in plan, plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_sitemap_coverage_is_single_shuffle(spark):
    # one map-side projection + one host-keyed agg: exactly one
    # exchange (partial->final HashAggregate pair around it)
    plan = _plan(spark, "sitemap_coverage")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("HashAggregate") == 2, plan
    assert "PythonUDF" not in plan


def test_dust_apply_rules_stay_broadcast(spark):
    # the mined per-host rules dimension must broadcast back onto the
    # URL stream (at 10^10 URLs a shuffle join here would be the
    # bottleneck; rules are O(hosts))
    plan = _plan(spark, "dust_apply")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_hyperball_stays_native_keyed_joins(spark):
    # the register-union rounds are localCheckpoint-truncated, so the
    # visible plan is the estimator layer: per-round partial-agg sums
    # over checkpointed registers, unioned — no cartesian, no Python,
    # no global sort anywhere in the visible plan
    for name in ("hyperball_balls", "harmonic_centrality"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, plan
        assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
        assert "partial_sum" in plan, plan
        assert plan.count("Sort [") == 0 or name == "harmonic_centrality", plan


def test_ppjoin_prefix_join_stays_keyed(spark):
    # the candidate join must be a keyed equi-join on the prefix
    # shingle (length filters ride along as join conditions), never a
    # cartesian; exact verify is also keyed; zero Python anywhere
    plan = _plan(spark, "ppjoin_pairs")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan  # length filter must ride the equi-join
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    keyed = (
        plan.count("SortMergeJoin")
        + plan.count("ShuffledHashJoin")
        + plan.count("BroadcastHashJoin")  # AQE at tiny sf
    )
    assert keyed >= 3, plan


def test_ed_join_stays_keyed_native(spark):
    # candidate generation is two keyed equi-joins (prefix gram; length
    # band), verify rides levenshtein in codegen; never cartesian, zero
    # Python
    plan = _plan(spark, "ed_join_pairs")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    assert "levenshtein" in plan, plan


def test_refresh_allocation_uses_take_ordered(spark):
    # global top-B must be TakeOrderedAndProject (per-partition top-B +
    # driver merge), never a global Sort+Limit single partition; all
    # int64 native math, zero Python
    plan = _plan(spark, "refresh_allocation")
    assert "TakeOrderedAndProject" in plan, plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_dup_line_gate_is_shuffle_free(spark):
    # the whole point of the sorted-adjacent fold: per-doc gate with NO
    # exchange anywhere — a pure map-side corpus pass
    plan = _plan(spark, "dup_line_gate")
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_trap_gate_two_host_aggs_no_python(spark):
    plan = _plan(spark, "trap_gate")
    # per-URL signals stay native (no Python eval), join on the host
    # dimension only; partial aggregates combine map-side
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 4, plan  # partial+final x2 keys


def test_repetition_mapside_is_shuffle_free(spark):
    # the twin exists to delete the suite's (doc, gram) shuffle — pin it
    plan = _plan(spark, "repetition_mapside")
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

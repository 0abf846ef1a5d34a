"""The driver-mimic: every registered query must match its DuckDB oracle at
sf0.001 (fast). tools/parity.py runs the same at sf0.01 (the driver gate)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tools.parity import compare, duck_connection


def _registry():
    from pulsar_replay_spark import registry

    registry.load_all()
    return registry


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


def _names():
    return sorted(_registry().QUERIES)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, duck, name):
    reg = _registry()
    sdf = reg.QUERIES[name](spark, SF_SMOKE).toPandas()
    if name not in reg.ORACLES:
        pytest.skip("rows-only query (no oracle)")
    ddf = duck.execute(reg.ORACLES[name]).df()
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: {problems}"


# Queries intentionally registered rows-only, each with the reason the
# driver's weaker check is acceptable. Empty since round 2: the frame
# sampler's deterministic fakes are hex-slice-reproducible in DuckDB.
ROWS_ONLY: set[str] = set()


def test_every_query_has_oracle_or_reason():
    reg = _registry()
    missing = set(reg.QUERIES) - set(reg.ORACLES) - ROWS_ONLY
    assert not missing, f"queries without oracle: {missing}"
    stale = ROWS_ONLY & set(reg.ORACLES)
    assert not stale, f"ROWS_ONLY entries that now have oracles: {stale}"


def test_entry_contract(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    assert df.count() > 0
    assert set(m.queries()) == set(m.oracle_sql()) | (set(m.queries()) - set(m.oracle_sql()))


def test_unregistered_q14_matches_oracle(spark, duck):
    """q14 lost its contract slot to semantic_dedup in r3 but stays part of
    the engine surface — same oracle gate, pytest-side."""
    from pulsar_replay_spark.queries_relational import Q14_ORACLE, q14_promo_revenue_pct

    sdf = q14_promo_revenue_pct(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(Q14_ORACLE).df()
    problems = compare(sdf, ddf)
    assert not problems, f"q14: {problems}"


def test_unregistered_q5_matches_oracle(spark, duck):
    """q5 lost its contract slot to pack_sequences in r4 (broadcast-dim-join
    shape triple-covered by q3/q10) but stays part of the engine surface —
    same oracle gate, pytest-side; plan shape still pinned in test_plans.py."""
    from pulsar_replay_spark.queries_relational import Q5_ORACLE, q5_region_revenue

    sdf = q5_region_revenue(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(Q5_ORACLE).df()
    problems = compare(sdf, ddf)
    assert not problems, f"q5: {problems}"


def test_unregistered_q18_matches_oracle(spark, duck):
    """q18 lost its contract slot to image_near_dup_pairs in r8 (the
    semi-join-on-aggregated-keyset family stays contract-covered by q4/q22,
    the dim-join shape by q3) but stays part of the engine surface — same
    oracle gate, pytest-side."""
    from pulsar_replay_spark.queries_relational import (
        Q18_ORACLE,
        q18_large_volume_orders,
    )

    sdf = q18_large_volume_orders(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(Q18_ORACLE).df()
    problems = compare(sdf, ddf)
    assert not problems, f"q18: {problems}"


def test_unregistered_q10_matches_oracle(spark, duck):
    """q10 lost its contract slot to simhash_near_pairs in r6 (broadcast-
    dim-join shape still contract-covered by q3, still benched) but stays
    part of the engine surface — same oracle gate, pytest-side."""
    from pulsar_replay_spark.queries_relational import (
        Q10_ORACLE,
        q10_returned_item_customers,
    )

    sdf = q10_returned_item_customers(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(Q10_ORACLE).df()
    problems = compare(sdf, ddf)
    assert not problems, f"q10: {problems}"


@pytest.mark.parametrize(
    "qname",
    ["q6", "q7", "q8", "q9", "q11", "q12", "q13", "q15", "q16", "q20", "q21"],
)
def test_extra_tpch_shapes_match_oracle(spark, duck, qname):
    """The r3 breadth shapes — pytest-oracle-gated because the 50-slot
    contract is full. q7/q13/q15/q21: alias-pair dim join, outer
    count-of-counts, agg-view + scalar MAX, EXISTS/NOT-EXISTS chain.
    q6/q8/q9/q11/q12/q16/q20 complete the TPC-H sweep: pushdown scalar agg,
    conditional market share, profit rollup, scalar-subquery fraction,
    CASE-split counts, distinct-supplier agg, HAVING-semi chain (the last
    four adapted to the partsupp-less fixtures via the lineitem bridge)."""
    from pulsar_replay_spark import queries_relational as qr

    fn, oracle = {
        "q6": (qr.q6_forecast_revenue, qr.Q6_ORACLE),
        "q7": (qr.q7_volume_shipping, qr.Q7_ORACLE),
        "q8": (qr.q8_market_share, qr.Q8_ORACLE),
        "q9": (qr.q9_product_profit, qr.Q9_ORACLE),
        "q11": (qr.q11_important_parts, qr.Q11_ORACLE),
        "q12": (qr.q12_priority_lines, qr.Q12_ORACLE),
        "q13": (qr.q13_customer_distribution, qr.Q13_ORACLE),
        "q15": (qr.q15_top_supplier, qr.Q15_ORACLE),
        "q16": (qr.q16_supplier_cnt, qr.Q16_ORACLE),
        "q20": (qr.q20_excess_shipments, qr.Q20_ORACLE),
        "q21": (qr.q21_waiting_supplier, qr.Q21_ORACLE),
    }[qname]
    sdf = fn(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(oracle).df()
    problems = compare(sdf, ddf)
    assert not problems, f"{qname}: {problems}"
    assert len(sdf) > 0, f"{qname}: vacuous (0 rows) — pick different constants"


def test_window_extras_match_oracle(spark, duck):
    """§2.5 breadth: percent_rank / cume_dist / nth_value / unbounded-frame
    first+last — pytest-oracle-gated."""
    from pulsar_replay_spark.queries_relational import (
        WINDOW_EXTRAS_ORACLE,
        q_window_extras,
    )

    sdf = q_window_extras(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(WINDOW_EXTRAS_ORACLE).df()
    problems = compare(sdf, ddf)
    assert not problems, problems
    assert len(sdf) > 0


def test_agg_extras_match_oracle(spark, duck):
    """§2.4 breadth: median / count_if / bool_and / bool_or / composite
    max_by — pytest-oracle-gated."""
    from pulsar_replay_spark.queries_relational import (
        AGG_EXTRAS_ORACLE,
        q_agg_extras,
    )

    sdf = q_agg_extras(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(AGG_EXTRAS_ORACLE).df()
    problems = compare(sdf, ddf)
    assert not problems, problems
    assert len(sdf) > 0


@pytest.mark.parametrize("qname", ["anomaly", "interp"])
def test_timeseries_extras_match_oracle(spark, duck, qname):
    """Time-series breadth: trailing-window 3-sigma anomaly flags and
    linear gap-fill interpolation — pytest-oracle-gated."""
    from pulsar_replay_spark import queries_temporal as qt

    fn, oracle = {
        "anomaly": (qt.q_rolling_anomaly_flags, qt.ANOMALY_ORACLE),
        "interp": (qt.q_linear_interpolation, qt.INTERP_ORACLE),
    }[qname]
    sdf = fn(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(oracle).df()
    problems = compare(sdf, ddf)
    assert not problems, f"{qname}: {problems}"
    assert len(sdf) > 0


@pytest.mark.parametrize("qname", ["cohort", "funnel"])
def test_product_analytics_match_oracle(spark, duck, qname):
    """Product-analytics breadth: cohort retention matrix and ordered
    funnel — pytest-oracle-gated."""
    from pulsar_replay_spark import queries_temporal as qt

    fn, oracle = {
        "cohort": (qt.q_cohort_retention, qt.COHORT_ORACLE),
        "funnel": (qt.q_funnel_steps, qt.FUNNEL_ORACLE),
    }[qname]
    sdf = fn(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(oracle).df()
    problems = compare(sdf, ddf)
    assert not problems, f"{qname}: {problems}"
    assert len(sdf) > 0


def test_event_transitions_match_oracle(spark, duck):
    """First-order event-type transition matrix — pytest-oracle-gated; rows
    normalize to 1 per from_type."""
    from pulsar_replay_spark.queries_temporal import (
        TRANSITIONS_ORACLE,
        q_event_transitions,
    )

    sdf = q_event_transitions(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(TRANSITIONS_ORACLE).df()
    problems = compare(sdf, ddf)
    assert not problems, problems
    sums = sdf.groupby("from_type")["p"].sum()
    assert ((sums - 1.0).abs() < 0.01).all()


def test_dau_mau_stickiness_matches_oracle(spark, duck):
    from pulsar_replay_spark.queries_temporal import (
        STICKINESS_ORACLE,
        q_dau_mau_stickiness,
    )

    sdf = q_dau_mau_stickiness(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(STICKINESS_ORACLE).df()
    problems = compare(sdf, ddf)
    assert not problems, problems
    assert len(sdf) > 0
    assert (sdf["stickiness"] <= 1.0).all() and (sdf["dau"] <= sdf["mau"]).all()


def test_conversion_attribution_matches_oracle(spark, duck):
    from pulsar_replay_spark.queries_temporal import (
        ATTRIBUTION_ORACLE,
        q_conversion_attribution,
    )

    sdf = q_conversion_attribution(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(ATTRIBUTION_ORACLE).df()
    problems = compare(sdf, ddf)
    assert not problems, problems
    assert len(sdf) > 0


def test_rfm_segmentation_matches_oracle(spark, duck):
    from pulsar_replay_spark.queries_relational import RFM_ORACLE, q_rfm_segmentation

    sdf = q_rfm_segmentation(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(RFM_ORACLE).df()
    problems = compare(sdf, ddf)
    assert not problems, problems
    assert len(sdf) > 0
    for c in ("r_score", "f_score", "m_score"):
        assert set(sdf[c].unique()) <= set(range(1, 6))


def test_session_paths_match_oracle(spark, duck):
    from pulsar_replay_spark.queries_temporal import (
        SESSION_PATHS_ORACLE,
        q_session_paths,
    )

    sdf = q_session_paths(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(SESSION_PATHS_ORACLE).df()
    problems = compare(sdf, ddf)
    assert not problems, problems
    assert len(sdf) > 0


def test_simhash_16bit_width_matches_oracle(spark, duck):
    """The 16-bit compat width under the same DuckDB gate as the bits=60
    contract row (the widths swapped tiers in r6: the contract now runs
    the corpus-scale width, so the default 16-bit keeps its oracle here):
    signatures and the banded hamming<=3 pair set must be exactly
    reproducible cross-engine."""
    from pulsar_replay_spark.queries_llm import (
        SIMHASH_PAIRS_ORACLE,
        q_simhash_near_pairs_16,
    )

    sdf = q_simhash_near_pairs_16(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(SIMHASH_PAIRS_ORACLE).df()
    problems = compare(sdf, ddf)
    assert not problems, f"simhash 16-bit: {problems}"


def test_bitext_mine_matches_oracle(spark, duck):
    """Margin-based bitext mining (Artetxe-Schwenk) under the full DuckDB
    gate over the parity-split embeddings fixture: mutual-best ratio-margin
    pairs, order-free int-scaled k-NN averages, floor-half-up rounding —
    exact cross-engine."""
    from pulsar_replay_spark.queries_llm import BITEXT_ORACLE, q_bitext_mine

    sdf = q_bitext_mine(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(BITEXT_ORACLE).df()
    problems = compare(sdf, ddf)
    assert not problems, f"bitext: {problems}"
    assert len(sdf) > 0


def test_minhash_planner_geometry_matches_oracle(spark, duck):
    """The (bands=2, rows_per_band=4) planner geometry under the same DuckDB
    gate as the 4x2 contract row — the banding knob is cross-engine exact
    at every geometry, same discipline as the simhash width."""
    from pulsar_replay_spark.queries_llm import (
        MINHASH_24_ORACLE,
        q_minhash_pairs_24,
    )

    sdf = q_minhash_pairs_24(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(MINHASH_24_ORACLE).df()
    problems = compare(sdf, ddf)
    assert not problems, f"minhash 2x4: {problems}"


def test_unregistered_q17_matches_oracle(spark, duck):
    """q17 lost its contract slot to bm25_topk in r9 (correlated-scalar-
    subquery family stays contract-covered by q2_min_cost_supplier) but
    stays part of the engine surface — same oracle gate, pytest-side."""
    from pulsar_replay_spark.queries_relational import (
        Q17_ORACLE,
        q17_small_quantity_revenue,
    )

    sdf = q17_small_quantity_revenue(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(Q17_ORACLE).df()
    problems = compare(sdf, ddf)
    assert not problems, f"q17: {problems}"


def test_unregistered_q4_matches_oracle(spark, duck):
    """q4 lost its contract slot to pagerank_trade in r8 (the EXISTS/semi
    family stays contract-covered by q22's anti-join and the semi joins in
    capture_pipeline/decontaminate) but stays part of the engine surface —
    same oracle gate, pytest-side."""
    from pulsar_replay_spark.queries_relational import Q4_ORACLE, q4_order_priority

    sdf = q4_order_priority(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(Q4_ORACLE).df()
    problems = compare(sdf, ddf)
    assert not problems, f"q4: {problems}"


def test_line_scrub_matches_oracle(spark, duck):
    """The r8 line-frequency scrub (CCNet boilerplate removal): pytest-tier
    oracle gate over a PLANTED corpus (the synthetic documents carry no
    newlines, so the SF gate alone would be structurally empty); also in
    parity --extras as x_line_scrub. Boilerplate in >=3 distinct docs
    vanishes from EVERY copy; unique lines survive in order."""
    from pulsar_replay_spark.operators import dedup
    from pulsar_replay_spark.queries_llm import LINE_SCRUB_ORACLE

    rows = []
    for i in range(12):
        body = f"unique line {i}\nsecond unique {i}"
        if i % 2 == 0:
            body += "\nCOOKIE BANNER"   # 6 docs: over the threshold
        if i % 3 == 0:
            body += "\nSHARE THIS PAGE"  # 4 docs: over the threshold
        if i in (0, 1):
            body += "\nrare pair line"  # 2 docs: UNDER the threshold, kept
        rows.append((i, body))
    planted = spark.createDataFrame(rows, "doc_id long, text string")
    sdf = dedup.scrub_boilerplate_lines(planted, max_doc_freq=3).toPandas()

    import pandas as pd

    duck.register("planted_docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    ddf = duck.execute(
        LINE_SCRUB_ORACLE.replace("FROM documents", "FROM planted_docs")
    ).df()
    problems = compare(sdf, ddf)
    assert not problems, f"line_scrub: {problems}"

    cleaned = dict(zip(sdf["doc_id"], sdf["cleaned_text"]))
    assert all("COOKIE BANNER" not in t and "SHARE THIS" not in t
               for t in cleaned.values())
    assert cleaned[0].endswith("rare pair line")  # under-threshold kept
    assert cleaned[5] == "unique line 5\nsecond unique 5"


def test_bm25_matches_oracle(spark, duck):
    """The BM25 lexical-retrieval tier: registered in the 50-slot contract
    since r9 (this standalone gate predates the rotation and stays as the
    named anchor; also in parity --extras as x_bm25). Queries derive from
    the corpus itself, scores sum in integer micro-units, so the comparison
    is hash-exact across engines."""
    from pulsar_replay_spark.queries_llm import BM25_ORACLE, q_bm25_topk

    sdf = q_bm25_topk(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(BM25_ORACLE).df()
    problems = compare(sdf, ddf)
    assert not problems, f"bm25: {problems}"


def test_span_scrub_matches_oracle(spark, duck):
    """r9 span-level decontamination: scrub only the contaminated token
    spans (eval shingles planted from the corpus's own lowest doc_ids —
    load-bearing: those docs MUST lose spans); pytest-tier oracle + parity
    --extras (x_span_scrub)."""
    from pulsar_replay_spark.queries_llm import (
        SPAN_SCRUB_ORACLE,
        q_span_scrubbed_corpus,
    )

    sdf = q_span_scrubbed_corpus(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(SPAN_SCRUB_ORACLE).df()
    problems = compare(sdf, ddf)
    assert not problems, f"span_scrub: {problems}"
    # load-bearing: at least the three planted source docs lost tokens
    assert (sdf["n_kept_tokens"] < sdf["n_tokens"]).sum() >= 3


def test_dup_span_scrub_is_load_bearing(spark):
    """r10 contract row `dup_span_scrub` (oracle runs in the registered
    sweep above): beyond hash parity, pin the construction — the three
    planted variable-length clones (11/25/63 tokens) MUST scrub to empty
    while their source docs keep every token."""
    from pulsar_replay_spark.queries_llm import q_dup_span_scrub

    sdf = q_dup_span_scrub(spark, SF_SMOKE).toPandas().set_index("doc_id")
    clones = sdf[sdf.index >= 1000000]
    assert len(clones) == 3
    assert (clones["n_kept_tokens"] == 0).all()
    assert (clones["cleaned_text"] == "").all()
    srcs = sdf.loc[[i - 1000000 for i in clones.index]]
    assert (srcs["n_kept_tokens"] == srcs["n_tokens"]).all()


def test_dup_span_scrub_none_policy_matches_oracle(spark, duck):
    """The keep='none' (remove-all) leg of the r10 contract row: the
    planted clones' SOURCES lose their spans too. Pytest + parity
    --extras (x_dup_span_none)."""
    from pulsar_replay_spark.queries_llm import (
        DUP_SPAN_NONE_ORACLE,
        q_dup_span_scrub_none,
    )

    sdf = q_dup_span_scrub_none(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(DUP_SPAN_NONE_ORACLE).df()
    problems = compare(sdf, ddf)
    assert not problems, f"dup_span_none: {problems}"
    i = sdf.set_index("doc_id")
    srcs = i.loc[[d - 1000000 for d in i.index if d >= 1000000]]
    assert len(srcs) == 3
    assert (srcs["n_kept_tokens"] < srcs["n_tokens"]).all()


def test_unregistered_per_topic_count_ratio_matches_oracle(spark, duck):
    """r11 rotation: per_topic_count_ratio ceded its contract slot to
    bm25_topk_served (the store-lifecycle row — build → serve must
    hash-match a raw-corpus recompute under the driver gate); its oracle
    stays pinned here + parity --extras (x_per_topic_count_ratio)."""
    from pulsar_replay_spark.queries_reference import (
        PER_TOPIC_COUNT_RATIO_ORACLE,
        q_per_topic_count_ratio,
    )

    sdf = q_per_topic_count_ratio(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(PER_TOPIC_COUNT_RATIO_ORACLE).df()
    problems = compare(sdf, ddf)
    assert not problems, f"per_topic_count_ratio: {problems}"


def test_unregistered_embedding_topk_matches_oracle(spark, duck):
    """r12 rotation: embedding_topk ceded its contract slot to
    semantic_decon_served (the dense store-lifecycle row); its brute-force
    cosine oracle stays pinned here + parity --extras (x_embedding_topk),
    and it remains the ANN recall oracle in tests/test_similarity.py."""
    from pulsar_replay_spark.queries_llm import (
        EMBEDDING_TOPK_ORACLE,
        q_embedding_topk,
    )

    sdf = q_embedding_topk(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(EMBEDDING_TOPK_ORACLE).df()
    problems = compare(sdf, ddf)
    assert not problems, f"embedding_topk: {problems}"


def test_semantic_decon_served_planted_doc_surfaces(spark):
    """The dense store-lifecycle row is load-bearing: the planted vector
    (-77, an exact copy of eval 7's embedding) exists ONLY in the
    store-build input — the SERVED decon must flag it at sim 1.0 accused
    by eval 7, proving the result came through the persisted store, not a
    rescan of `embeddings`."""
    from pulsar_replay_spark.queries_llm import q_semantic_decon_served

    out = q_semantic_decon_served(spark, SF_SMOKE)
    hit = out.filter("doc_id = -77").collect()
    assert len(hit) == 1
    assert hit[0].eval_id == 7 and hit[0].sim == 1.0


def test_bm25_served_planted_doc_surfaces(spark):
    """The store-lifecycle row is load-bearing: the planted doc (−77,
    text = query 1's exact text) exists ONLY in the store-build input —
    it must rank first for query 1 in the SERVED result, proving the
    result came through the store, not a rescan of `documents`."""
    from pulsar_replay_spark.queries_llm import q_bm25_topk_served

    out = q_bm25_topk_served(spark, SF_SMOKE)
    q1 = min(r.query_id for r in out.select("query_id").distinct().collect())
    top = out.filter(f"query_id = {q1} AND rk = 1").collect()[0]
    assert top.doc_id == -77


def test_unregistered_scrubbed_corpus_matches_oracle(spark, duck):
    """r10 rotation: the fixed-window chunk scrub ceded its slot to
    dup_span_scrub (same family, any-length generalization); its oracle
    stays pinned here + parity --extras (x_scrubbed_corpus)."""
    from pulsar_replay_spark.queries_llm import (
        SCRUBBED_CORPUS_ORACLE,
        q_scrubbed_corpus,
    )

    sdf = q_scrubbed_corpus(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(SCRUBBED_CORPUS_ORACLE).df()
    problems = compare(sdf, ddf)
    assert not problems, f"scrubbed_corpus: {problems}"


def test_unregistered_pagerank_trade_matches_oracle(spark, duck):
    """r10 swap: the contract row is pagerank_trade_adaptive (scale derived
    from the measured node count); the pinned scale=1e12 variant keeps its
    hash-exact unrolled-CTE oracle here + parity --extras (x_pagerank).
    At gate SFs the bound admits the 1e12 cap, so the two variants' ranks
    must also be IDENTICAL — pinned as the swap's no-regression check."""
    from pulsar_replay_spark.queries_relational import (
        PAGERANK_TRADE_ORACLE,
        pagerank_trade,
        pagerank_trade_adaptive,
    )

    sdf = pagerank_trade(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(PAGERANK_TRADE_ORACLE).df()
    problems = compare(sdf, ddf)
    assert not problems, f"pagerank_trade: {problems}"

    adf = pagerank_trade_adaptive(spark, SF_SMOKE).toPandas()
    assert (adf["scale"] == 10**12).all()  # gate SF: cap admitted
    assert list(adf["node"]) == list(sdf["node"])
    assert list(adf["rank_fp"]) == list(sdf["rank_fp"])


def test_unregistered_tfidf_matches_oracle(spark, duck):
    """r10 rotation: tfidf_top_terms ceded its slot to span_scrub (its
    explode → tf/df → broadcast-stat → window-topk family is contract-
    covered by bm25_topk); oracle stays pinned here + parity --extras
    (x_tfidf)."""
    from pulsar_replay_spark.queries_llm import TFIDF_ORACLE, q_tfidf_top_terms

    sdf = q_tfidf_top_terms(spark, SF_SMOKE).toPandas()
    ddf = duck.execute(TFIDF_ORACLE).df()
    problems = compare(sdf, ddf)
    assert not problems, f"tfidf: {problems}"

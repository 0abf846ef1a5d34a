"""Driver-mimicking oracle parity checker.

Runs every registered query through Spark AND its DuckDB oracle on the same
parquet tables, then compares row count, column names, and order-insensitive
values. This is the local feedback loop for the driver's CORRECTNESS gate.

Usage: python tools/parity.py [sf_dir] [query ...]
       python tools/parity.py [sf_dir] --extras   # ALSO run the pytest-only
                                                  # oracle tier (TPC-H sweep,
                                                  # window/agg extras,
                                                  # time-series + product
                                                  # analytics, RFM)
"""

from __future__ import annotations

import decimal
import math
import sys

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[ms]").astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _is_decimal_col(s: pd.Series) -> bool:
    """True when the column carries decimal.Decimal values — the pandas face
    of an arrow decimal128 column (e.g. DuckDB HUGEINT from windowed SUM).

    The driver's value hash sees the raw arrow type, so Decimal('3') vs
    int64 3 is a hash mismatch even though str-canonicalization equates
    them; catch it here so local parity matches the driver's verdict."""
    if s.dtype != object:
        return False
    nn = s.dropna()
    return len(nn) > 0 and isinstance(nn.iloc[0], decimal.Decimal)


def compare(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(f"columns: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return problems
    for c in sorted(spark_df.columns):
        sd, dd = _is_decimal_col(spark_df[c]), _is_decimal_col(duck_df[c])
        if sd != dd:
            which = "duck" if dd else "spark"
            problems.append(
                f"col {c}: TYPE divergence — {which} side is decimal128 "
                f"(DuckDB HUGEINT?) vs plain numeric; driver hash will fail. "
                f"CAST the oracle (or Spark) side to BIGINT/DOUBLE."
            )
    if problems:
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"rowcount: spark={len(spark_df)} duck={len(duck_df)}")
    a, b = _canon(spark_df), _canon(duck_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                bad = [
                    i
                    for i, (x, y) in enumerate(zip(av, bv))
                    if not (
                        (pd.isna(x) and pd.isna(y))
                        or (not pd.isna(x) and not pd.isna(y) and math.isclose(float(x), float(y), rel_tol=0, abs_tol=0))
                    )
                ]
            else:
                neq = av.astype(str) != bv.astype(str)
                bad = list(av.index[neq])
            if bad:
                i = bad[0]
                problems.append(
                    f"col {c}: {len(bad)} mismatches, first at row {i}: spark={a[c][i]!r} duck={b[c][i]!r}"
                )
    return problems


def extra_oracles() -> dict:
    """The pytest-only oracle tier (the 50-slot contract is full): every
    breadth query with a DuckDB twin, runnable here as one sweep."""
    from pulsar_replay_spark import queries_llm as ql
    from pulsar_replay_spark import queries_reference as qref
    from pulsar_replay_spark import queries_relational as qr
    from pulsar_replay_spark import queries_temporal as qt

    return {
        # r11 rotation: per_topic_count_ratio ceded its slot to
        # bm25_topk_served (the store-lifecycle row); oracle retained here
        # + pytest
        "x_per_topic_count_ratio": (
            qref.q_per_topic_count_ratio,
            qref.PER_TOPIC_COUNT_RATIO_ORACLE,
        ),
        # r12 rotation: embedding_topk ceded its slot to
        # semantic_decon_served (the dense store-lifecycle row); oracle
        # retained here + pytest
        "x_embedding_topk": (ql.q_embedding_topk, ql.EMBEDDING_TOPK_ORACLE),
        "x_simhash_16": (ql.q_simhash_near_pairs_16, ql.SIMHASH_PAIRS_ORACLE),
        "x_minhash_24": (ql.q_minhash_pairs_24, ql.MINHASH_24_ORACLE),
        "x_bitext": (ql.q_bitext_mine, ql.BITEXT_ORACLE),
        "x_line_scrub": (ql.q_line_scrubbed_corpus, ql.LINE_SCRUB_ORACLE),
        "x_span_scrub": (ql.q_span_scrubbed_corpus, ql.SPAN_SCRUB_ORACLE),
        "x_bm25": (ql.q_bm25_topk, ql.BM25_ORACLE),
        # r10 rotations: scrubbed_corpus ceded to dup_span_scrub, tfidf to
        # span_scrub — both keep their oracle gates here + pytest
        "x_scrubbed_corpus": (ql.q_scrubbed_corpus, ql.SCRUBBED_CORPUS_ORACLE),
        "x_tfidf": (ql.q_tfidf_top_terms, ql.TFIDF_ORACLE),
        # r10 swap: the contract row is pagerank_trade_adaptive; the pinned
        # scale=1e12 variant keeps its oracle gate here + pytest
        "x_pagerank": (qr.pagerank_trade, qr.PAGERANK_TRADE_ORACLE),
        # the remove-all policy leg of the r10 contract row
        "x_dup_span_none": (ql.q_dup_span_scrub_none, ql.DUP_SPAN_NONE_ORACLE),
        "x_q4": (qr.q4_order_priority, qr.Q4_ORACLE),
        "x_q17": (qr.q17_small_quantity_revenue, qr.Q17_ORACLE),
        "x_q5": (qr.q5_region_revenue, qr.Q5_ORACLE),
        "x_q10": (qr.q10_returned_item_customers, qr.Q10_ORACLE),
        "x_q6": (qr.q6_forecast_revenue, qr.Q6_ORACLE),
        "x_q7": (qr.q7_volume_shipping, qr.Q7_ORACLE),
        "x_q8": (qr.q8_market_share, qr.Q8_ORACLE),
        "x_q9": (qr.q9_product_profit, qr.Q9_ORACLE),
        "x_q11": (qr.q11_important_parts, qr.Q11_ORACLE),
        "x_q12": (qr.q12_priority_lines, qr.Q12_ORACLE),
        "x_q13": (qr.q13_customer_distribution, qr.Q13_ORACLE),
        "x_q14": (qr.q14_promo_revenue_pct, qr.Q14_ORACLE),
        "x_q15": (qr.q15_top_supplier, qr.Q15_ORACLE),
        "x_q16": (qr.q16_supplier_cnt, qr.Q16_ORACLE),
        "x_q18": (qr.q18_large_volume_orders, qr.Q18_ORACLE),
        "x_q20": (qr.q20_excess_shipments, qr.Q20_ORACLE),
        "x_q21": (qr.q21_waiting_supplier, qr.Q21_ORACLE),
        "x_window_extras": (qr.q_window_extras, qr.WINDOW_EXTRAS_ORACLE),
        "x_agg_extras": (qr.q_agg_extras, qr.AGG_EXTRAS_ORACLE),
        "x_rfm": (qr.q_rfm_segmentation, qr.RFM_ORACLE),
        "x_anomaly": (qt.q_rolling_anomaly_flags, qt.ANOMALY_ORACLE),
        "x_interp": (qt.q_linear_interpolation, qt.INTERP_ORACLE),
        "x_cohort": (qt.q_cohort_retention, qt.COHORT_ORACLE),
        "x_funnel": (qt.q_funnel_steps, qt.FUNNEL_ORACLE),
        "x_transitions": (qt.q_event_transitions, qt.TRANSITIONS_ORACLE),
        "x_stickiness": (qt.q_dau_mau_stickiness, qt.STICKINESS_ORACLE),
        "x_attribution": (qt.q_conversion_attribution, qt.ATTRIBUTION_ORACLE),
        "x_session_paths": (qt.q_session_paths, qt.SESSION_PATHS_ORACLE),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    args = sys.argv[2:]
    extras = "--extras" in args
    only = {a for a in args if a != "--extras"}

    sys.path.insert(0, ".")
    import __spark_entry__ as entrymod
    from pulsar_replay_spark.session import get_spark

    spark = get_spark(cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows-only, {len(sdf)} rows)")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = compare(sdf, ddf)
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"OK    {name} ({len(sdf)} rows)")

    if extras:
        for name, (fn, sql) in extra_oracles().items():
            if only and name not in only:
                continue
            try:
                sdf = fn(spark, sf_dir).toPandas()
                ddf = con.execute(sql).df()
            except Exception as e:  # noqa: BLE001 — report, keep sweeping
                failures.append(name)
                print(f"FAIL  {name}: {e}")
                continue
            problems = compare(sdf, ddf)
            if problems:
                failures.append(name)
                print(f"FAIL  {name}: " + "; ".join(problems))
            else:
                print(f"OK    {name} ({len(sdf)} rows)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

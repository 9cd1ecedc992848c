"""Semantic tests for the round-4 analytics/time-series additions
(market basket, Welch A/B, transitions, RFM, TWAP, counter rate, fuzzy
decontam). Oracle parity is covered by test_oracle_parity.py; these pin
the properties the oracle can't state, reconstructed independently from
the raw tables."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from full_stack_big_data_spark.engine.catalog import Catalog
from full_stack_big_data_spark.operators.analytics import (
    AB_CONTROL, AB_TREATMENT, BASKET_MIN_COUNT,
    q_abtest_welch, q_market_basket, q_rfm_segmentation, q_user_transitions,
)
from full_stack_big_data_spark.operators.decontam import (
    EVAL_MOD, FUZZY_DECONTAM_THRESHOLD, decontam_fuzzy,
)
from full_stack_big_data_spark.operators.timeseries import (
    q_counter_rate, q_time_weighted_avg,
)
from conftest import SF_SMOKE


def test_market_basket_counts_match_reconstruction(spark):
    li = (Catalog(spark, SF_SMOKE).lineitem
          .select("l_orderkey", "l_partkey").distinct().collect())
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    pair_n = Counter()
    for items in baskets.values():
        s = sorted(items)
        for i, a in enumerate(s):
            for b in s[i + 1:]:
                pair_n[(a, b)] += 1
    expected = {p: n for p, n in pair_n.items() if n >= BASKET_MIN_COUNT}
    got = {(r.part_a, r.part_b): r.n_both
           for r in q_market_basket(spark, SF_SMOKE).collect()}
    assert got == expected


def test_market_basket_lift_identity(spark):
    """lift == support(a,b) / (support(a) * support(b)) — i.e. the
    emitted columns are mutually consistent, not three unrelated stats."""
    n_orders = (Catalog(spark, SF_SMOKE).lineitem
                .select("l_orderkey").distinct().count())
    for r in q_market_basket(spark, SF_SMOKE).collect():
        expect = (r.n_both / n_orders) / ((r.n_a / n_orders) * (r.n_b / n_orders))
        assert abs(r.lift - expect) < 1e-4


def test_welch_matches_numpy(spark):
    vals = defaultdict(list)
    for r in (Catalog(spark, SF_SMOKE).events
              .where(F.col("event_type").isin(AB_TREATMENT, AB_CONTROL))
              .select("event_type", "value").collect()):
        vals[r.event_type].append(r.value)
    t_v, c_v = vals[AB_TREATMENT], vals[AB_CONTROL]

    def mean(xs):
        return sum(xs) / len(xs)

    def var(xs):  # sample variance
        m = mean(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    se = var(t_v) / len(t_v) + var(c_v) / len(c_v)
    t_stat = (mean(t_v) - mean(c_v)) / math.sqrt(se)
    df = se * se / ((var(t_v) / len(t_v)) ** 2 / (len(t_v) - 1)
                    + (var(c_v) / len(c_v)) ** 2 / (len(c_v) - 1))
    row = q_abtest_welch(spark, SF_SMOKE).first()
    assert row.n_t == len(t_v) and row.n_c == len(c_v)
    assert abs(row.t_stat - t_stat) < 1e-4
    assert abs(row.welch_df - df) < 1e-2
    assert row.significant == int(abs(t_stat) > 1.96)


def test_transitions_probabilities_normalize(spark):
    rows = q_user_transitions(spark, SF_SMOKE).collect()
    by_prev = defaultdict(float)
    for r in rows:
        by_prev[r.prev_type] += r.prob
    for prev, total in by_prev.items():
        assert abs(total - 1.0) < 1e-4, prev


def test_transitions_count_conservation(spark):
    """Every event except each user's first is exactly one transition."""
    ev = Catalog(spark, SF_SMOKE).events
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    total = sum(r.n_transitions
                for r in q_user_transitions(spark, SF_SMOKE).collect())
    assert total == n_events - n_users


def test_rfm_partitions_customers_and_orders_bins(spark):
    rows = q_rfm_segmentation(spark, SF_SMOKE).collect()
    n_customers = (Catalog(spark, SF_SMOKE).orders
                   .select("o_custkey").distinct().count())
    assert sum(r.n_customers for r in rows) == n_customers
    for r in rows:
        assert 0 <= r.r_bin <= 3 and 0 <= r.f_bin <= 3 and 0 <= r.m_bin <= 3
    # Monetary bins are global quartiles: the ranges of consecutive
    # m_bins cannot overlap (equal values land in the same bin).
    lo = defaultdict(lambda: float("inf"))
    hi = defaultdict(lambda: float("-inf"))
    for r in rows:
        lo[r.m_bin] = min(lo[r.m_bin], r.min_monetary_cents)
        hi[r.m_bin] = max(hi[r.m_bin], r.max_monetary_cents)
    bins = sorted(lo)
    for a, b in zip(bins, bins[1:]):
        assert hi[a] < lo[b]


def test_twap_matches_reconstruction_for_one_group(spark):
    out = {(r.event_type, r.day): r for r in
           q_time_weighted_avg(spark, SF_SMOKE).collect()}
    (etype, day), row = sorted(out.items())[0]
    ev = sorted(
        Catalog(spark, SF_SMOKE).events
        .where(F.col("event_type") == etype)
        .where(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd") == day)
        .select(F.unix_micros("ts").alias("us"), "event_id", "value").collect(),
        key=lambda r: (r.us, r.event_id))
    num = den = 0.0
    for a, b in zip(ev, ev[1:]):
        num += a.value * (b.us - a.us)
        den += b.us - a.us
    assert row.n_events == len(ev)
    assert row.span_us == den
    assert abs(row.twap - num / den) < 1e-4


def test_counter_rate_matches_reconstruction_for_one_user(spark):
    row = sorted(q_counter_rate(spark, SF_SMOKE).collect(),
                 key=lambda r: r.user_id)[0]
    ev = sorted(
        Catalog(spark, SF_SMOKE).events
        .where(F.col("user_id") == row.user_id)
        .select(F.unix_micros("ts").alias("us"), "event_id", "value").collect(),
        key=lambda r: (r.us, r.event_id))
    increase, resets = 0.0, 0
    for a, b in zip(ev, ev[1:]):
        if b.value >= a.value:
            increase += b.value - a.value
        else:
            increase += b.value
            resets += 1
    span_us = ev[-1].us - ev[0].us
    assert row.n_samples == len(ev)
    assert row.n_resets == resets
    assert abs(row.increase - increase) < 1e-3
    assert abs(row.rate_per_hour - increase / (span_us / 3.6e9)) < 1e-3


def test_fuzzy_decontam_pairs_are_bipartite_and_verified(spark):
    from full_stack_big_data_spark.operators.dedup import _shingle_sets
    sets = {r.doc_id: set(r.s)
            for r in _shingle_sets(spark, SF_SMOKE).collect()}
    rows = decontam_fuzzy(spark, SF_SMOKE).collect()
    assert rows, "fixture should contain fuzzy contamination"
    for r in rows:
        assert r.eval_doc % EVAL_MOD == 0
        assert r.train_doc % EVAL_MOD != 0
        sa, sb = sets[r.eval_doc], sets[r.train_doc]
        jac = len(sa & sb) / len(sa | sb)
        assert jac >= FUZZY_DECONTAM_THRESHOLD
        assert abs(r.jaccard - jac) < 1e-5


def test_ohlc_matches_reconstruction_for_one_bar(spark):
    from full_stack_big_data_spark.operators.timeseries import q_ohlc_bars
    out = {(r.event_type, r.bar): r for r in q_ohlc_bars(spark, SF_SMOKE).collect()}
    (etype, bar), row = sorted(out.items())[0]
    ev = sorted(
        Catalog(spark, SF_SMOKE).events
        .where(F.col("event_type") == etype)
        .where(F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00") == bar)
        .select(F.unix_micros("ts").alias("us"), "event_id", "value").collect(),
        key=lambda r: (r.us, r.event_id))
    assert row.open == ev[0].value
    assert row.close == ev[-1].value
    assert row.high == max(r.value for r in ev)
    assert row.low == min(r.value for r in ev)
    assert row.n_ticks == len(ev)


def test_lttb_selects_max_area_point_per_bucket(spark):
    from full_stack_big_data_spark.operators.timeseries import (
        LTTB_BUCKETS, q_lttb_downsample,
    )
    rows = q_lttb_downsample(spark, SF_SMOKE).collect()
    pts = Catalog(spark, SF_SMOKE).events.select(
        "event_type", "event_id",
        F.unix_micros("ts").alias("x"), F.col("value").alias("y")).collect()
    by_series = defaultdict(list)
    for p in pts:
        by_series[p.event_type].append(p)
    # Reconstruct buckets, means and anchors per series.
    for etype, ps in by_series.items():
        xmin, xmax = min(p.x for p in ps), max(p.x for p in ps)
        buckets = defaultdict(list)
        for p in ps:
            bkt = min(int((p.x - xmin) * LTTB_BUCKETS // (xmax - xmin)),
                      LTTB_BUCKETS - 1)
            buckets[bkt].append(p)
        means = {b: (sum(p.x for p in v) / len(v), sum(p.y for p in v) / len(v))
                 for b, v in buckets.items()}
        order = sorted(means)
        out = {r.bucket: r for r in rows if r.event_type == etype}
        # One selected point per non-empty bucket, covering all points.
        assert sorted(out) == order
        assert sum(r.n_in_bucket for r in out.values()) == len(ps)
        for i, b in enumerate(order):
            ax, ay = means[order[i - 1]] if i > 0 else means[b]
            bx, by = means[order[i + 1]] if i + 1 < len(order) else means[b]
            area = {p.event_id: abs((ax - bx) * (p.y - ay) - (ax - p.x) * (by - ay))
                    for p in buckets[b]}
            sel = out[b]
            assert sel.event_id in area
            best = max(area.values())
            # Selected point's area is maximal (event_id breaks exact ties).
            assert area[sel.event_id] >= best - 1e-6 * max(best, 1.0)

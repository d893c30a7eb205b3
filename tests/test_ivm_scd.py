"""SCD2, CDC latest-wins, and incremental view maintenance: semantic
edge cases the sf-data oracles can't be relied on to hit (exact-tie
facts, pre-first-change facts, full retraction, out-of-order deltas),
plus the plan shapes the 100 TB claims rest on.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import functions as F

from pyconform_spark.operators import ivm, scd
from tests.test_plans import count_nodes, plan_of

SF = "/root/testdata/sf0.001"


def _ts(day: int, hour: int = 0):
    return dt.datetime(2024, 1, day, hour)


# ------------------------------------------------------------- SCD2
def test_scd2_intervals_versions_and_open_tail(spark):
    ch = spark.createDataFrame(
        [(1, _ts(1), 10), (1, _ts(5), 20), (2, _ts(3), 7)],
        "user_id int, ts timestamp, plan int",
    )
    out = {
        (r.user_id, r.scd_version): r
        for r in scd.scd2_intervals(ch, ["user_id"], "ts", ["plan"]).collect()
    }
    assert out[(1, 1)].valid_from == _ts(1)
    assert out[(1, 1)].valid_to == _ts(5)
    assert out[(1, 2)].valid_to is None  # current version stays open
    assert out[(2, 1)].valid_to is None
    assert out[(1, 2)].plan == 20


def test_scd2_join_tie_and_prehistory_semantics(spark):
    """A fact AT the change instant sees the NEW attributes
    (closed-open intervals); a fact before the first change gets
    NULLs, not a dropped row."""
    ch = spark.createDataFrame(
        [(1, _ts(2), 10), (1, _ts(6), 20)],
        "user_id int, cts timestamp, plan int",
    )
    facts = spark.createDataFrame(
        [(1, _ts(1), "pre"), (1, _ts(2), "at_change"),
         (1, _ts(4), "mid"), (1, _ts(6), "at_second"), (1, _ts(9), "after")],
        "user_id int, fts timestamp, tag string",
    )
    rows = {
        r.tag: r
        for r in scd.scd2_join(
            facts, ch, ["user_id"], "fts", "cts", ["plan"]
        ).collect()
    }
    assert len(rows) == 5  # left semantics: prehistory kept
    assert rows["pre"].asof_plan is None
    assert rows["pre"].asof_scd_version is None
    assert rows["at_change"].asof_plan == 10  # new attrs at the instant
    assert rows["mid"].asof_plan == 10
    assert rows["at_second"].asof_plan == 20
    assert rows["after"].asof_plan == 20
    assert rows["after"].asof_scd_version == 2


# ---------------------------------------------------------------- IVM
def _facts(spark, rows):
    return spark.createDataFrame(
        rows, "k string, v decimal(20,6)"
    )


def test_ivm_apply_matches_recompute_any_order(spark):
    """Deltas are commutative: applying epoch 2 then 1 equals the full
    recompute (the property refresh_late's additive merge rests on)."""
    e1 = _facts(spark, [("a", Decimal(1)), ("a", Decimal(2)), ("b", Decimal(5))])
    e2 = _facts(spark, [("a", Decimal(10)), ("c", Decimal(7))])
    keys, meas = ["k"], {"total": "v"}
    empty = ivm.agg_delta(e1.limit(0), keys, meas)
    out_21 = ivm.apply(
        ivm.apply(empty, ivm.agg_delta(e2, keys, meas), keys, ["total"]),
        ivm.agg_delta(e1, keys, meas),
        keys,
        ["total"],
    )
    full = ivm.agg_delta(e1.unionByName(e2), keys, meas)
    got = {r.k: (r.total, r.ivm_count) for r in out_21.collect()}
    exp = {r.k: (r.total, r.ivm_count) for r in full.collect()}
    assert got == exp


def test_ivm_full_retraction_deletes_the_group(spark):
    """A group whose rows are all retracted disappears — counts, not
    sums, decide existence (a zero-sum live group must survive)."""
    e1 = _facts(
        spark,
        [("a", Decimal(3)), ("b", Decimal(4)), ("z", Decimal(2)), ("z", Decimal(-2))],
    )
    keys, meas = ["k"], {"total": "v"}
    view = ivm.agg_delta(e1, keys, meas)
    # retract ALL of group a
    retract_a = ivm.agg_delta(
        e1.where(F.col("k") == "a"), keys, meas, sign=-1
    )
    out = {r.k: (r.total, r.ivm_count)
           for r in ivm.apply(view, retract_a, keys, ["total"]).collect()}
    assert "a" not in out
    assert out["b"] == (Decimal("4.000000"), 1)
    assert out["z"] == (Decimal("0.000000"), 2)  # zero-sum but alive


def test_ivm_retract_reinsert_roundtrip_is_identity(spark):
    e1 = _facts(spark, [("a", Decimal(3)), ("b", Decimal(4))])
    keys, meas = ["k"], {"total": "v"}
    view = ivm.agg_delta(e1, keys, meas)
    sub = e1.where(F.col("k") == "a")
    round_trip = ivm.apply(
        ivm.apply(view, ivm.agg_delta(sub, keys, meas, sign=-1), keys, ["total"]),
        ivm.agg_delta(sub, keys, meas),
        keys,
        ["total"],
    )
    got = sorted((r.k, r.total, r.ivm_count) for r in round_trip.collect())
    exp = sorted((r.k, r.total, r.ivm_count) for r in view.collect())
    assert got == exp


# ---------------------------------------------------------- plan gates
def test_cdc_latest_wins_is_partial_agg_one_exchange(spark):
    """The latest-wins upsert must be an aggregate with MAP-SIDE
    PARTIALS (max(struct) — Spark plans SortAggregate for struct
    buffers, so partition-local sorts are expected) and exactly one
    exchange that moves |local keys| rows — never the row_number
    window the oracle uses, which would shuffle the FULL feed."""
    from pyconform_spark import queries as Q

    plan = plan_of(Q.cdc_apply_latest(spark, SF))
    assert count_nodes(plan, "Window") == 0
    assert count_nodes(plan, "Exchange") == 1
    assert "partial_max" in plan
    # the partial aggregate must run BEFORE the exchange (map side):
    # formatted-plan node ids are postorder, so the partial_max
    # section's node id must be smaller than the Exchange's
    import re

    sections = re.split(r"^\((\d+)\) ", plan, flags=re.M)
    node_of = {}  # header text -> node id
    for i in range(1, len(sections) - 1, 2):
        node_of[int(sections[i])] = sections[i + 1]
    partial_ids = [n for n, s in node_of.items() if "partial_max" in s]
    exchange_ids = [n for n, s in node_of.items() if s.startswith("Exchange")]
    assert partial_ids and exchange_ids
    assert min(partial_ids) < min(exchange_ids)


def test_ivm_view_never_rescans_base_on_apply(spark):
    """The maintenance plan reads each fact slice once and the
    dimension broadcasts; no sort-merge join, no window."""
    from pyconform_spark import queries as Q

    plan = plan_of(Q.ivm_join_view(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert count_nodes(plan, "Window") == 0


def test_scd2_join_is_one_exchange_one_sort_union(spark):
    """The interval join collapses to the union-sort as-of: one
    shuffle on the key, key-local sorts only, no range cross-join."""
    from pyconform_spark import queries as Q

    plan = plan_of(Q.scd2_dim_join(spark, SF))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # facts flow through exactly ONE exchange (the union-sort window);
    # the two extra exchanges sit on the CHANGE-LOG side only (the
    # (user, ts) pre-agg and the version window over the tiny dim)
    assert count_nodes(plan, "Exchange") <= 3
    assert count_nodes(plan, "Window") == 2  # version + as-of fill

"""Broadcast-vs-co-partitioned join regime switches (round-2 verdict
Next #6): forcing the two-large-table path must reproduce the
broadcast path bit-for-bit — the switch is a pure execution-strategy
choice keyed on parquet-metadata row counts."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forum_dl_ray.ops import queries as q

SF_DIR = "/root/testdata/sf0.001"


def test_q3_copartitioned_equals_broadcast(ray_session):
    broadcast = q.q3_top_revenue_orders(SF_DIR)  # orders tiny -> broadcast
    copart = q.q3_top_revenue_orders(SF_DIR, broadcast_row_limit=0)
    assert broadcast.equals(copart), (broadcast, copart)


def test_revenue_by_nation_copartitioned_equals_broadcast(ray_session):
    broadcast = q.revenue_by_nation(SF_DIR)
    copart = q.revenue_by_nation(SF_DIR, broadcast_row_limit=0)
    assert broadcast.reset_index(drop=True).equals(copart.reset_index(drop=True)), (
        broadcast, copart)


def test_switch_probe_reads_metadata_only():
    # the probe must not scan data files: row count from the footer
    assert q._table_rows(SF_DIR, "orders") > 0

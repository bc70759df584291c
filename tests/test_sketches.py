"""HyperLogLog sketch ops: register math, merge-associativity, and
accuracy vs exact distinct counts (the register TABLE is DuckDB-oracled
by the driver; the float estimate is pinned here)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forum_dl_ray.ops.sketches import _hll_estimate, _hll_registers

SF_DIR = "/root/testdata/sf0.001"


def _rand_hashes(n: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(
        0, np.iinfo(np.uint64).max, size=n, dtype=np.uint64)


@pytest.mark.parametrize("n", [10, 1000, 100_000])
def test_hll_accuracy_synthetic(n):
    est = _hll_estimate(_hll_registers(_rand_hashes(n, seed=n)))
    assert abs(est - n) / n < 0.06, (n, est)


def test_hll_merge_equals_single_pass():
    h = _rand_hashes(50_000, seed=7)
    whole = _hll_registers(h)
    parts = np.maximum.reduce([_hll_registers(c) for c in np.array_split(h, 13)])
    assert np.array_equal(whole, parts)


def test_distinct_counts_hll_vs_exact(ray_session):
    import duckdb

    from forum_dl_ray.ops.sketches import distinct_counts_hll, hll_estimates

    out = hll_estimates(distinct_counts_hll(SF_DIR))
    con = duckdb.connect()
    exact_tokens = con.execute(rf"""
        SELECT count(DISTINCT t) FROM (
            SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS t
            FROM read_parquet('{SF_DIR}/documents.parquet')) WHERE t != ''
    """).fetchone()[0]
    exact_users = con.execute(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchone()[0]
    assert abs(out["distinct_tokens"] - exact_tokens) / exact_tokens < 0.06
    assert abs(out["distinct_users"] - exact_users) / max(1, exact_users) < 0.06


def test_distinct_counts_deterministic(ray_session):
    from forum_dl_ray.ops.sketches import distinct_counts_hll

    assert distinct_counts_hll(SF_DIR).equals(distinct_counts_hll(SF_DIR))


def test_heavy_hitters_cms_exact_vs_duckdb(ray_session):
    import duckdb

    from forum_dl_ray.ops.sketches import heavy_hitters_cms

    got = heavy_hitters_cms(SF_DIR, min_count=50)
    con = duckdb.connect()
    want = con.execute(rf"""
        WITH toks AS (
            SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
            FROM read_parquet('{SF_DIR}/documents.parquet'))
        SELECT token, CAST(count(*) AS BIGINT) AS n FROM toks
        WHERE token != '' GROUP BY token HAVING count(*) >= 50
        ORDER BY n DESC, token
    """).fetchdf()
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))

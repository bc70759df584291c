"""Vectorized md5-low-64 vs hashlib (the DuckDB md5_number_lower
convention every SQL-oracled shard/bucket assignment relies on)."""
import hashlib
import sys
import os

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forum_dl_ray.ops._md5v import md5_low64


def _ref(vals):
    return np.array(
        [int.from_bytes(hashlib.md5(v.encode()).digest()[8:16], "little")
         for v in vals],
        dtype=np.uint64,
    )


def test_md5_low64_boundaries():
    vals = ["", "a", "img-000042", "x" * 54, "y" * 55, "z" * 56, "w" * 200,
            "héllo wörld", "日本語のテキスト", "\x00\x01", "-123456789"]
    got = md5_low64(vals)
    assert got.dtype == np.uint64
    np.testing.assert_array_equal(got, _ref(vals))
    assert md5_low64([]).shape == (0,)


def test_md5_low64_arrow_inputs():
    vals = [f"doc-{i}" for i in range(1000)]
    ref = _ref(vals)
    np.testing.assert_array_equal(md5_low64(pa.array(vals)), ref)
    np.testing.assert_array_equal(
        md5_low64(pa.array(vals, pa.large_string())), ref)
    np.testing.assert_array_equal(
        md5_low64(pa.chunked_array([vals[:300], vals[300:]])), ref)
    # sliced array (non-zero offset) must respect the slice
    arr = pa.array(vals).slice(100, 50)
    np.testing.assert_array_equal(md5_low64(arr), ref[100:150])


@settings(max_examples=150, deadline=None)
@given(st.lists(st.text(max_size=80), max_size=40))
def test_md5_low64_matches_hashlib(vals):
    np.testing.assert_array_equal(md5_low64(vals), _ref(vals))

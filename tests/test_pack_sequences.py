"""Sequence-packing invariants (rows-only op: greedy state isn't
SQL-expressible, so the invariants are pinned here instead)."""

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
BUDGET = 512


def test_pack_sequences_invariants(ray_session):
    from forum_dl_ray.ops.queries import pack_sequences

    out = pack_sequences(SF_DIR, budget=BUDGET).to_pandas()
    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                         columns=["doc_id"])
    # every doc packed exactly once
    assert sorted(out["doc_id"]) == sorted(docs["doc_id"].to_pylist())
    # pack budgets: a pack exceeds budget only as a single long doc
    sums = out.groupby("pack_id").agg(total=("n_tokens", "sum"),
                                      n=("n_tokens", "size"))
    over = sums[sums["total"] > BUDGET]
    assert (over["n"] == 1).all()
    # greedy: within a range, a doc opens a new pack only because the
    # previous pack could not fit it
    out = out.sort_values("doc_id").reset_index(drop=True)
    prev_fill: dict[int, int] = {}
    for _, row in out.iterrows():
        pid = int(row["pack_id"])
        if int(row["pack_pos"]) == 0 and (pid & 0xFFFFF) > 0:
            assert prev_fill[pid - 1] + int(row["n_tokens"]) > BUDGET
        prev_fill[pid] = prev_fill.get(pid, 0) + int(row["n_tokens"])
    # doc order inside packs follows doc_id order; pack_pos is 0..n-1
    for _, grp in out.groupby("pack_id"):
        grp = grp.sort_values("pack_pos")
        assert grp["doc_id"].is_monotonic_increasing
        assert grp["pack_pos"].tolist() == list(range(len(grp)))


def test_pack_sequences_deterministic(ray_session):
    from forum_dl_ray.ops.queries import pack_sequences

    a = pack_sequences(SF_DIR).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = pack_sequences(SF_DIR).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)

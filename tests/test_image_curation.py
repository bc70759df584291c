"""Image curation chain: pHash clusters → keeper rule → curated tar
export (ops/images_ops.py + ops/export.py).

Oracle strategy: brute-force transitive closure + per-cluster max-res
rule computed in pure Python over the source table, compared against
the distributed ops' output; curated export checked by round-trip set
equality (keepers present, non-keepers absent)."""

import os
import sys

import pandas as pd
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forum_dl_ray.ops.export import curated_shard_export, images_table_path, read_shards
from forum_dl_ray.ops.images_ops import (
    image_dedup_drop_set,
    image_dedup_keepers,
    image_phash_clusters,
    image_phash_neardup,
)

MAX_HAMMING = 12


@pytest.fixture(scope="module")
def source_df():
    return pq.read_table(images_table_path()).to_pandas()


@pytest.fixture(scope="module")
def brute_clusters(ray_session, source_df):
    """Transitive closure over the (already separately oracled) pair
    set, pure Python — the reference semantics for both ops."""
    pairs = image_phash_neardup(None, MAX_HAMMING)
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for i in source_df["image_id"]:
        out[i] = find(i) if i in parent else i
    assert len(pairs) > 0, "fixture must exercise the near-dup path"
    return out


def test_clusters_match_bruteforce(ray_session, brute_clusters):
    got = image_phash_clusters(None, MAX_HAMMING).to_pandas()
    assert dict(zip(got["image_id"], got["cluster_id"])) == brute_clusters


def test_keeper_rule_max_resolution(ray_session, source_df, brute_clusters):
    res = {r.image_id: int(r.w) * int(r.h) for r in source_df.itertuples(index=False)}
    by_root = {}
    for i, root in brute_clusters.items():
        by_root.setdefault(root, []).append(i)
    want_keep = set()
    for members in by_root.values():
        want_keep.add(min(members, key=lambda i: (-res[i], i)))
    got = set(image_dedup_keepers(None, MAX_HAMMING).to_pandas()["image_id"])
    assert got == want_keep
    # drop set is the complement, restricted to clustered ids only
    drop = image_dedup_drop_set(None, MAX_HAMMING)
    assert drop == set(source_df["image_id"]) - want_keep
    clustered = {i for i, r in brute_clusters.items()
                 if len(by_root[r]) > 1}
    assert drop <= clustered  # never grows past the near-dup set


def test_curated_export_roundtrip(ray_session, tmp_path, source_df):
    out = str(tmp_path / "curated")
    manifest = curated_shard_export(None, out, n_shards=8, max_hamming=MAX_HAMMING)
    back = read_shards(out)
    keep = set(image_dedup_keepers(None, MAX_HAMMING).to_pandas()["image_id"])
    assert set(back) == keep
    assert int(manifest["n_samples"].sum()) == len(keep)
    src = source_df.set_index("image_id")
    for i in list(keep)[:50]:
        img, cap, meta = back[i]
        assert img == bytes(src.loc[i, "bytes"])
        assert cap == (src.loc[i, "caption"] or "")


def test_image_ann_topk_vs_bruteforce(ray_session, source_df):
    """Exact in-test oracle: embed everything with the same stub
    encoder, full cosine matrix, compare top-k per query."""
    import numpy as np
    import pyarrow as pa

    from forum_dl_ray.images import decode_image, resize_nearest
    from forum_dl_ray.ops.images_ops import FakeEmbedStage, image_ann_topk

    got = image_ann_topk(None, k=5)
    assert set(got.columns) == {"query_id", "image_id", "rank", "sim_e6"}
    qids = sorted(source_df["image_id"])[:3]
    assert sorted(got["query_id"].unique()) == qids

    # exact brute force
    stage = FakeEmbedStage()
    tbl = pa.Table.from_pandas(source_df[["image_id", "bytes", "fmt"]])
    emb = stage(tbl)
    ids = np.array(emb["image_id"].to_pylist())
    m = np.array([np.asarray(v, dtype=np.float32)
                  for v in emb["embedding"].to_pylist()])
    mn = m / np.maximum(1e-9, np.linalg.norm(m, axis=1, keepdims=True))
    for qid in qids:
        qv = mn[ids == qid][0]
        sims = mn @ qv
        mask = ids != qid
        order = np.lexsort((ids[mask], -sims[mask]))[:5]
        want = list(ids[mask][order])
        have = got[got["query_id"] == qid].sort_values("rank")["image_id"].tolist()
        assert have == want, (qid, have, want)


def test_image_ann_topk_deterministic(ray_session):
    from forum_dl_ray.ops.images_ops import image_ann_topk

    assert image_ann_topk(None, k=3).equals(image_ann_topk(None, k=3))

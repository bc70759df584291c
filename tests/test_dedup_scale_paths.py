"""Scale-path dedup ops: n-gram Jaccard prefix-filter join and
random-hyperplane embedding LSH. The oracle suite covers value-level
correctness for ngram_jaccard_pairs; these tests pin the structural
guarantees (prefix-filter completeness, LSH subset/recall)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def test_ngram_prefix_filter_complete(ray_session):
    """The PPJoin prefix index must produce EVERY pair with J >= t —
    compare against an in-process brute-force all-pairs Jaccard over
    the same shingle hashes."""
    import pyarrow.parquet as pq

    from forum_dl_ray.ops import dedup
    from forum_dl_ray.ops.text import token_hashes

    got = dedup.ngram_jaccard_pairs(SF_DIR, shingle=3, threshold_e4=5000)
    # the prefix-filter (hot-gram) regime must agree with the direct
    # count-join regime pair-for-pair
    via_prefix = dedup.ngram_jaccard_pairs(SF_DIR, shingle=3, threshold_e4=5000,
                                           pair_budget=0)
    assert got.equals(via_prefix)

    tbl = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                        columns=["doc_id", "text"])
    ids = tbl["doc_id"].to_pylist()
    sets = [set(h.tolist()) for h in token_hashes(tbl["text"].to_pylist(), shingle=3)]
    want = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = len(sets[i] & sets[j])
            if inter == 0:
                continue
            union = len(sets[i] | sets[j])
            e4 = (inter * 10000) // union
            if e4 >= 5000:
                a, b = sorted((ids[i], ids[j]))
                want[(a, b)] = e4
    have = {(a, b): e for a, b, e in zip(got["id_a"], got["id_b"], got["jacc_e4"])}
    assert have == want


def test_embedding_lsh_subset_and_recall(ray_session):
    """LSH output must be a subset of the exact op (verify is exact
    cosine) with recall >= 0.85 in the low-sim parameter regime."""
    from forum_dl_ray.ops import dedup

    exact = dedup.embedding_dedup_pairs(SF_DIR)
    lsh = dedup.embedding_dedup_pairs_lsh(SF_DIR, n_planes=5, n_tables=24)
    e = set(zip(exact["id_a"], exact["id_b"]))
    l = set(zip(lsh["id_a"], lsh["id_b"]))
    assert l <= e
    assert len(e) > 0
    assert len(l & e) / len(e) >= 0.85, f"recall {len(l & e) / len(e):.2f}"
    # cos values on the common pairs must be identical (same verify math)
    em = {(a, b): c for a, b, c in zip(exact["id_a"], exact["id_b"], exact["cos_r"])}
    for a, b, c in zip(lsh["id_a"], lsh["id_b"], lsh["cos_r"]):
        assert em[(a, b)] == pytest.approx(c, abs=1e-9)


def test_embedding_lsh_deterministic(ray_session):
    from forum_dl_ray.ops import dedup

    a = dedup.embedding_dedup_pairs_lsh(SF_DIR, n_planes=5, n_tables=8)
    b = dedup.embedding_dedup_pairs_lsh(SF_DIR, n_planes=5, n_tables=8)
    assert a.equals(b)


def test_ngram_jaccard_prefix_prunes(ray_session):
    """The prefix index must be materially smaller than the full
    shingle inverted index (the point of prefix filtering)."""
    import pyarrow.parquet as pq

    from forum_dl_ray.ops.text import token_hashes

    tbl = pq.read_table(os.path.join(SF_DIR, "documents.parquet"), columns=["text"])
    total = 0
    prefix = 0
    for h in token_hashes(tbl["text"].to_pylist(), shingle=3):
        m = len(np.unique(h))
        total += m
        prefix += m - int(np.ceil(0.5 * m)) + 1
    assert prefix < 0.6 * total


def test_simhash_pairs_match_bruteforce(ray_session):
    """simhash_dedup_pairs must equal the brute-force enumeration:
    all pairs within max_hamming that share at least one 16-bit band
    (the op's LSH admission rule), with the exact hamming distance."""
    import pyarrow.parquet as pq

    from forum_dl_ray.ops import dedup
    from forum_dl_ray.ops.text import simhash64

    got = dedup.simhash_dedup_pairs(SF_DIR, max_hamming=8)

    tbl = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                        columns=["doc_id", "text"])
    ids = np.array(tbl["doc_id"].to_pylist(), dtype=np.int64)
    sh = simhash64(tbl["text"].to_pylist()).view(np.uint64)
    n = len(ids)
    iu, ju = np.triu_indices(n, 1)
    x = sh[iu] ^ sh[ju]
    ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
    band_share = np.zeros(len(x), dtype=bool)
    for b in range(4):
        band_share |= ((x >> np.uint64(16 * b)) & np.uint64(0xFFFF)) == 0
    keep = (ham <= 8) & band_share
    a = np.minimum(ids[iu[keep]], ids[ju[keep]])
    b = np.maximum(ids[iu[keep]], ids[ju[keep]])
    want = {(int(x_), int(y_)): int(h_) for x_, y_, h_ in zip(a, b, ham[keep])}
    have = {(int(r.id_a), int(r.id_b)): int(r.hamming) for r in got.itertuples()}
    assert have == want


def test_lsh_pair_guard_degenerate_corpus(ray_session, tmp_path):
    """A pathological all-identical corpus must complete in bounded
    time/memory (spanning-star degradation, round-2 verdict #4) while
    preserving cluster connectivity; a normal corpus is bit-identical
    with and without the guard active."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq_mod

    import ray.data as rd

    from forum_dl_ray.ops import dedup

    n = 4000
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["the same exact document body here"] * n),
    })
    sf = str(tmp_path / "degenerate")
    os.makedirs(sf, exist_ok=True)
    pq_mod.write_table(tbl, os.path.join(sf, "documents.parquet"))

    # unguarded volume would be ~4000^2/2 * 16 bands; the guard caps a
    # key at k-1 star pairs, so candidates stay O(n)
    pairs = dedup.minhash_dedup_pairs(sf)
    assert 0 < len(pairs) <= 3 * n
    assert (pairs["jacc_r"] == 1.0).all()
    clusters = dedup.minhash_clusters(sf).to_pandas()
    assert clusters["cluster_id"].nunique() == 1  # connectivity preserved

    # guard inert on a normal corpus: forcing a tiny cap on the real
    # sf0.001 corpus must change nothing (its biggest bucket is small)
    band_ds = dedup.minhash_bands(SF_DIR)
    with_guard = dedup._lsh_candidate_pairs(band_ds, ["band_id", "band_hash"],
                                            key_pair_cap=10**6)
    no_guard = dedup._lsh_candidate_pairs(band_ds, ["band_id", "band_hash"],
                                          key_pair_cap=10**18)
    key = lambda df: sorted(map(tuple, df.drop_duplicates().to_numpy()))
    assert key(with_guard) == key(no_guard)


def test_bucket_width_does_not_change_results(ray_session):
    """Shuffle widths are internal co-location keys: any power-of-two
    width must give identical op output (pins the cluster-scaled
    default_buckets refactor)."""
    from forum_dl_ray.ops import queries as q

    a = q.events_sessionized(SF_DIR, n_buckets=4).to_pandas()
    b = q.events_sessionized(SF_DIR, n_buckets=256).to_pandas()
    srt = lambda df: df.sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    assert srt(a).equals(srt(b))

    ca = q.corpus_clean(SF_DIR, n_buckets=4).to_pandas()
    cb = q.corpus_clean(SF_DIR, n_buckets=512).to_pandas()
    srt2 = lambda df: df.sort_values("doc_id").reset_index(drop=True)
    assert srt2(ca).equals(srt2(cb))


def test_fingerprint_matches_scalar_reference():
    """The vectorized Rabin-Karp fingerprint must equal the sequential
    definition h = (h*P + byte) mod 2^64 folded from the FNV seed."""
    from forum_dl_ray.ops.text import _FP_BASE, _FP_SEED, _rolling_fingerprint

    def scalar(text: str) -> int:
        h = int(_FP_SEED)
        for byte in text.encode("utf-8"):
            h = (h * int(_FP_BASE) + byte) % (1 << 64)
        return h - (1 << 64) if h >= (1 << 63) else h

    for t in ["", "a", "hello world", "ü ünicode ☃", "x" * 5000,
              "The quick brown fox jumps over the lazy dog."]:
        assert _rolling_fingerprint(t) == scalar(t), t


def test_hub_local_star_verify_plan():
    """r3 verdict #4: a star hub's shingle array must cross the verify
    shuffle ONCE, not once per spoke. The emit plan is the counter:
    total serializations = n_hubs + n_pairs, and the hub of a k-spoke
    star has exactly one entry."""
    import pandas as pd

    from forum_dl_ray.ops.dedup import _pair_verify_plan

    k = 500  # spanning star: hub 0 paired with every other doc
    cand = pd.DataFrame({"id_a": [0] * k, "id_b": list(range(1, k + 1))})
    plan = _pair_verify_plan(cand)
    hub_entries = [e for e in plan[0] if e[2] == 1]
    assert len(plan[0]) == 1 and len(hub_entries) == 1  # hub ships once
    total_rows = sum(len(v) for v in plan.values())
    assert total_rows == 1 + k  # n_hubs + n_pairs, vs 2k pair-keyed
    # every pair is covered exactly once by a spoke entry
    covered = sorted(p for v in plan.values() for _, p, h in v if h == 0)
    assert covered == list(range(k))

    # mixed graph: triangle + pendant — every pair covered, each doc
    # emits ≤ (1 hub entry + its spoke pairs)
    cand2 = pd.DataFrame({"id_a": [1, 1, 2, 3], "id_b": [2, 3, 3, 4]})
    plan2 = _pair_verify_plan(cand2)
    covered2 = sorted(p for v in plan2.values() for _, p, h in v if h == 0)
    assert covered2 == [0, 1, 2, 3]
    rows2 = sum(len(v) for v in plan2.values())
    assert rows2 <= 4 + 4  # never worse than pair-keyed (2 * n_pairs)


def test_minhash_bands_non_dividing_band_count(ray_session):
    """r5 review: bands that don't divide num_perm must use the first
    bands*rows_per_band perms (the pre-vectorization per-band slicing
    semantics), not raise a reshape ValueError."""
    from forum_dl_ray.ops import dedup

    band_ds = dedup.minhash_bands(SF_DIR, num_perm=64, bands=12)
    df = band_ds.to_pandas()
    n_docs = df["doc_id"].nunique()
    assert len(df) == n_docs * 12
    assert sorted(df["band_id"].unique()) == list(range(12))

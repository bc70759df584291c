"""Deduplication family over the documents / embeddings tables.

- exact dedup: content-hash column (vectorized) → groupby(hash).min —
  the partial-then-small-groupby pattern; identical to the reference's
  first-wins URL dedup semantics at table scale (SURVEY.md A4).
- MinHash+LSH near-dup: shingle → minhash signature (vectorized
  universal hashing) → band rows → groupby((band, band_hash)) buckets
  → candidate pairs → exact Jaccard verify → cluster by min-label.
- SimHash near-dup: 64-bit simhash → 4x16-bit band bucketing →
  hamming verify.
- n-gram Jaccard: exact pairwise within LSH buckets (the verify stage
  exposed standalone).
- embedding cosine near-dup: blocked all-pairs cosine against a
  broadcast matrix (exact at test scale; the IVF variant in
  similarity.py is the 10^9-row path).

All shuffles are on small derived tables (hashes / band keys), never
on full text bodies.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from forum_dl_ray import STAGE_RUNTIME_ENV as _RENV

from .text import token_hashes

_MERSENNE = np.uint64((1 << 61) - 1)


def _read_docs(sf_dir: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


# ------------------------------------------------------------- exact dedup
def exact_dedup_keepers(sf_dir: str) -> pd.DataFrame:
    """Min doc_id per distinct text. Hash column computed per batch;
    groupby shuffles only (hash, doc_id) — not the text bodies."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [
            int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little", signed=True)
            for t in batch["text"].to_pylist()
        ]
        return pa.table({"text_hash": pa.array(hs, pa.int64()), "doc_id": batch["doc_id"]})

    from ray.data.aggregate import Min

    out = (
        ds.map_batches(add_hash, batch_format="pyarrow", runtime_env=_RENV, batch_size=8192)
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .to_pandas()
    )
    return out[["doc_id"]].sort_values("doc_id").reset_index(drop=True)


# ------------------------------------------------------------ minhash LSH
def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minima of universal hashes h_i(x) = (a_i*x + b_i) mod M."""
    if len(shingle_hashes) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        x = shingle_hashes[:, None] & _MERSENNE
        h = (x * a[None, :] + b[None, :]) % _MERSENNE
    return h.min(axis=0)


def minhash_bands(sf_dir: str, num_perm: int = 64, bands: int = 16, shingle: int = 3) -> rd.Dataset:
    """documents → (doc_id, band_id, band_hash) rows, the LSH explode."""
    rows_per_band = num_perm // bands
    a, b = _minhash_params(num_perm)

    def f(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_pylist()
        out_doc, out_band, out_hash = [], [], []
        for doc_id, hashes in zip(ids, token_hashes(texts, shingle=shingle)):
            sig = minhash_signature(hashes, a, b)
            for band in range(bands):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                bh = int.from_bytes(
                    hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "little", signed=True
                )
                out_doc.append(doc_id)
                out_band.append(band)
                out_hash.append(bh)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "band_id": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", runtime_env=_RENV, batch_size=4096
    )


def _lsh_candidate_pairs(band_ds: rd.Dataset, keys: list[str], n_buckets: int = 128) -> pd.DataFrame:
    """Distinct (id_a, id_b) sharing any LSH bucket.

    A naive ``groupby(keys).map_groups`` makes one pandas group per
    bucket — at 16 bands × n_docs that is O(corpus) mostly-singleton
    groups and the per-group overhead dominates (measured 25 s at
    5k docs). Instead: hash buckets into ``n_buckets`` coarse
    partitions (ONE shuffle, bounded group count) and extract pairs
    inside each partition vectorized — duplicated() mask drops the
    singleton majority before any Python-level pairing."""
    key_col = keys[-1]

    def coarse(batch: pa.Table) -> pa.Table:
        b = pc.bit_wise_and(batch[key_col], pa.scalar(n_buckets - 1, pa.int64()))
        return batch.append_column("bucket", b)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        dup = g[g.duplicated(subset=keys, keep=False)]
        if not len(dup):
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        out_a: list[int] = []
        out_b: list[int] = []
        for _, grp in dup.groupby(keys, sort=False):
            ids = sorted(set(grp["doc_id"]))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pd.DataFrame({"id_a": pd.Series(out_a, dtype="int64"),
                             "id_b": pd.Series(out_b, dtype="int64")})

    return (
        band_ds.map_batches(coarse, batch_format="pyarrow", runtime_env=_RENV, batch_size=65536)
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas", runtime_env=_RENV)
        .to_pandas()
    )


def _jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def minhash_dedup_pairs(sf_dir: str, num_perm: int = 64, bands: int = 16,
                        shingle: int = 3, threshold: float = 0.5) -> pd.DataFrame:
    """Candidate pairs from LSH buckets, verified by exact shingle
    Jaccard ≥ threshold. Returns (id_a, id_b, jacc_r) with id_a<id_b."""
    band_ds = minhash_bands(sf_dir, num_perm, bands, shingle)

    cand = _lsh_candidate_pairs(band_ds, ["band_id", "band_hash"])
    if len(cand) == 0:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "jacc_r": pd.Series([], dtype="float64")})
    cand = cand.drop_duplicates().astype({"id_a": "int64", "id_b": "int64"})

    # verify: fetch shingle sets for candidate doc ids (small set) and
    # compute exact Jaccard — broadcast the shingle map to a verify stage
    need = sorted(set(cand["id_a"]) | set(cand["id_b"]))
    docs = _read_docs(sf_dir, ["doc_id", "text"]).to_pandas()
    docs = docs[docs["doc_id"].isin(need)]
    shingles = {
        int(d): set(h.tolist())
        for d, h in zip(docs["doc_id"], token_hashes(list(docs["text"]), shingle=shingle))
    }
    jac = [
        _jaccard(shingles[int(a)], shingles[int(b)])
        for a, b in zip(cand["id_a"], cand["id_b"])
    ]
    cand["jacc_r"] = np.round(jac, 4)
    out = cand[cand["jacc_r"] >= threshold]
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def minhash_clusters(sf_dir: str, **kw) -> pd.DataFrame:
    """(doc_id, cluster_id) with cluster_id = min doc_id reachable via
    verified near-dup pairs (union-find on the verified pair set —
    driver-side, valid because verified pairs ≪ corpus; the iterative
    min-label-propagation groupby is the fallback at larger pair
    counts)."""
    pairs = minhash_dedup_pairs(sf_dir, **kw)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    all_ids = _read_docs(sf_dir, ["doc_id"]).to_pandas()["doc_id"]
    out = pd.DataFrame(
        {"doc_id": all_ids, "cluster_id": [find(int(d)) for d in all_ids]}
    )
    return out.sort_values("doc_id").reset_index(drop=True)


# ------------------------------------------------------------ simhash dedup
def simhash_dedup_pairs(sf_dir: str, max_hamming: int = 8) -> pd.DataFrame:
    """SimHash banding: 4x16-bit chunks as bucket keys (any pair within
    hamming<=... shares a chunk with good probability), verified by
    exact hamming distance."""
    from .text import simhashes

    sh = simhashes(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        hs = batch["simhash"].to_pylist()
        out_id, out_band, out_key = [], [], []
        for d, h in zip(ids, hs):
            u = h & ((1 << 64) - 1)
            for band in range(4):
                out_id.append(d)
                out_band.append(band)
                out_key.append((u >> (band * 16)) & 0xFFFF)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "band_id": pa.array(out_band, pa.int32()),
                "band_key": pa.array(out_key, pa.int64()),
            }
        )

    cand = _lsh_candidate_pairs(
        sh.map_batches(explode, batch_format="pyarrow", runtime_env=_RENV, batch_size=8192),
        ["band_id", "band_key"],
    )
    if len(cand) == 0:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "hamming": pd.Series([], dtype="int64")})
    cand = cand.drop_duplicates().astype({"id_a": "int64", "id_b": "int64"})
    hmap = dict(zip(*(lambda df: (df["doc_id"], df["simhash"]))(sh.to_pandas())))
    ham = [
        bin((int(hmap[a]) ^ int(hmap[b])) & ((1 << 64) - 1)).count("1")
        for a, b in zip(cand["id_a"], cand["id_b"])
    ]
    cand["hamming"] = pd.Series(ham, index=cand.index, dtype="int64")
    out = cand[cand["hamming"] <= max_hamming]
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ------------------------------------------------- embedding cosine dedup
def embedding_dedup_pairs(sf_dir: str, threshold: float = 0.4) -> pd.DataFrame:
    """Exact blocked all-pairs cosine: each batch is multiplied against
    the broadcast normalized matrix (numpy matmul) — O(n^2) FLOPs but
    streamed in blocks; the IVF path (similarity.ivf_build/ivf_search)
    is the approximate 10^9-row variant."""
    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    full = emb.to_pandas()
    ids = full["vec_id"].to_numpy()
    mat = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ref = ray.put((ids, mat))

    def block(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        bids = batch["vec_id"].to_numpy(zero_copy_only=False)
        bmat = np.stack(batch["embedding"].to_pandas().to_numpy()).astype(np.float64)
        bmat /= np.linalg.norm(bmat, axis=1, keepdims=True)
        sims = bmat @ all_mat.T
        src, dst = np.nonzero(sims >= threshold)
        a = bids[src]
        b = all_ids[dst]
        keep = a < b
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b[keep], pa.int64()),
                "cos_r": pa.array(np.round(sims[src, dst][keep], 4), pa.float64()),
            }
        )

    out = emb.map_batches(block, batch_format="pyarrow", runtime_env=_RENV, batch_size=2048).to_pandas()
    if "id_a" not in out.columns:  # all blocks empty -> columnless frame
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "cos_r": pd.Series([], dtype="float64")})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)

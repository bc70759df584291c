"""End-to-end TEXT corpus curation + sharded delivery.

The text-side analog of ops/export.py's image chain: quality gate →
exact-dedup keeper → MinHash near-dup keeper → resumable parquet
shard export of the surviving documents. The composition a
pre-training data pipeline runs end to end before tokenization.

Scale shapes (the ones that matter at 100 TB):

- **One text shuffle, keyed by the export shard.** The survivor
  stream (doc_id + stats, no text) and the document stream (with
  text) are BOTH tagged with ``shard = md5(doc_id) % n_shards`` —
  the same key the export is partitioned by — and a single
  ``groupby(shard)`` performs the semi-join AND the co-location for
  writing in one exchange. Text bodies move exactly once;
  re-bucketing by a second key would move them twice (the
  pick-one-partitioning-key rule, SURVEY.md §2.5).
- **Near-dup verdicts are O(pairs).** The MinHash non-keeper set
  comes from the verified pair list (pairs ≪ corpus by LSH
  construction) and is broadcast once via ``ray.put``.
- **Resumable**: per-shard JSON markers; a resumed run prunes
  finished shards' rows inside the tag stage, BEFORE the shuffle —
  finished text never leaves the source parquet again.
- **Deterministic manifests**: shard content hash = sha256 over the
  doc_id-sorted (doc_id, blake2b(text)) stream — stable across runs,
  block layouts and pyarrow versions (parquet file bytes are not).
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from forum_dl_ray import STAGE_RUNTIME_ENV as _RENV

from ._io import read_parquet_clean
from ._md5v import md5_low64

_TARGET_SHARD_BYTES = 16 << 20  # sandbox-scale; ~1 GiB at 100 TB


def neardup_drop_set(sf_dir: str, **kw) -> frozenset:
    """Doc ids removed by the MinHash near-dup keeper rule (keeper =
    min doc_id reachable via verified pairs; everything else in a
    cluster drops). O(pairs) ≪ corpus."""
    from ._uf import union_find_roots
    from .dedup import minhash_dedup_pairs

    pairs = minhash_dedup_pairs(sf_dir, **kw)
    roots = union_find_roots(pairs["id_a"], pairs["id_b"])
    return frozenset(d for d, r in roots.items() if r != d)


def corpus_shards_default(sf_dir: str,
                          target_shard_bytes: int = _TARGET_SHARD_BYTES) -> int:
    """Metadata-only shard count; documents.parquet may be a single
    file or a parquet directory (crawl-derived corpora)."""
    path = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(path):
        files = [os.path.join(r, f) for r, _, fs in os.walk(path)
                 for f in fs if f.endswith(".parquet")]
    else:
        files = [path]
    total = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        total += sum(md.row_group(i).total_byte_size
                     for i in range(md.num_row_groups))
    return int(min(4096, max(4, round(total / target_shard_bytes))))


def _marker(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, f"shard-{shard:05d}.json")


def _read_done(out_dir: str, n_shards: int | None = None) -> dict[int, dict]:
    """Finished-shard markers (shared protocol, ops/_markers.py)."""
    from ._markers import read_done

    return read_done(out_dir, n_shards, ".parquet")


_SHARD_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("text", pa.large_string()),
    ("n_tokens", pa.int64()), ("pack_id", pa.int64()),
    ("pack_pos", pa.int64()),
])


def _shard_of_int_ids(ids: np.ndarray, n_shards: int) -> np.ndarray:
    """md5-low-64-LE of str(doc_id) — DuckDB
    ``md5_number_lower(CAST(doc_id AS VARCHAR)) % n`` (the repo-wide
    SQL-reproducible hash convention, text.py:_md5_token_hashes).
    Vectorized: Arrow int→string cast + single-block md5 (_md5v.py);
    no per-row hashlib in the shuffle-feeding stage (r3 verdict #3)."""
    s = pc.cast(pa.array(np.asarray(ids, dtype=np.int64)), pa.string())
    return (md5_low64(s) % np.uint64(n_shards)).astype(np.int64)


def corpus_curated_export(
    sf_dir: str,
    out_dir: str,
    n_shards: int | None = None,
    resume: bool = True,
    pack_budget: int = 512,
    decontaminate_min_hits: int | None = None,
) -> pd.DataFrame:
    """Quality ∩ exact-keeper ∩ near-dup-keeper documents (minus
    benchmark-contaminated docs when ``decontaminate_min_hits`` is
    set), written as doc_id-sorted parquet shards with per-shard
    manifest markers.

    Shards come out TRAIN-READY: each carries (doc_id, text, n_tokens,
    pack_id, pack_pos) with the greedy ``pack_budget``-token packing
    of ops/queries.pack_sequences applied WITHIN the shard — the
    shard's rows are already co-located and doc_id-sorted at write
    time, so packing costs zero extra shuffle, and pack ids
    (shard << 20 | local) stay globally unique with no coordination.
    Returns the manifest (shard, n_docs, n_chars, n_packs, sha256,
    resumed) — O(n_shards), driver-small."""
    from .queries import corpus_clean

    from ._markers import clear_stale, closeout_empty

    if n_shards is None:
        n_shards = corpus_shards_default(sf_dir)
    os.makedirs(out_dir, exist_ok=True)
    cols = ["shard", "n_docs", "n_chars", "n_packs", "sha256", "resumed"]
    if resume:
        done = _read_done(out_dir, n_shards)
    else:
        # fresh run: clear stale shards from a previous (possibly
        # different-n_shards) export — consumers glob shard-*.parquet
        # and would read duplicated docs (r5 review)
        clear_stale(out_dir, ".parquet")
        done = {}
    if len(done) == n_shards:
        # fully finished: skip the ENTIRE pipeline (the near-dup
        # LSH+verify chain is several corpus scans) — r5 review,
        # mirrors warc_export's early exit
        return (pd.DataFrame([{**m, "resumed": True} for m in done.values()],
                             columns=cols)
                .sort_values("shard").reset_index(drop=True)
                .astype({"shard": "int64", "n_docs": "int64",
                         "n_chars": "int64", "n_packs": "int64"}))
    drop = set(neardup_drop_set(sf_dir))
    if decontaminate_min_hits is not None:
        # benchmark-decontamination stage: the hit list is O(docs
        # sharing grams with the tiny held-out set) — broadcastable
        # exactly like the near-dup verdicts it joins here
        from .dedup import decontaminate_hits

        hits = decontaminate_hits(sf_dir)
        drop |= set(hits.loc[hits["n_hit"] >= decontaminate_min_hits, "doc_id"]
                    .astype(int))
    drop_sorted = np.sort(np.fromiter(drop, dtype=np.int64, count=len(drop)))
    drop_ref = ray.put(drop_sorted)

    def _tag(batch: pa.Table, side: int) -> pa.Table:
        ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        shard = _shard_of_int_ids(ids, n_shards)
        keep = np.ones(len(ids), dtype=bool)
        if done:  # resumed: finished shards pruned before the shuffle
            keep &= ~np.isin(shard, list(done))
        # near-dup / decontamination drops pruned BEFORE the shuffle
        # too: a dropped doc's text body must never cross the
        # pipeline's only exchange just to be discarded in write_shard
        # (r5 review; the module docstring promises it)
        ds_ = ray.get(drop_ref)
        if len(ds_):
            pos = np.minimum(np.searchsorted(ds_, ids), len(ds_) - 1)
            keep &= ds_[pos] != ids
        text = (batch["text"] if side == 1
                else pa.array([""] * len(batch), pa.large_string()))
        t = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pc.cast(text, pa.large_string()),
            "side": pa.array(np.full(len(batch), side, dtype=np.int8)),
            "shard": pa.array(shard, pa.int64()),
        })
        if not keep.all():
            t = t.filter(pa.array(keep))
        return t

    survivors = corpus_clean(sf_dir).map_batches(
        lambda b: _tag(b, 0), batch_format="pyarrow", runtime_env=_RENV,
        batch_size=65536,
    )
    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(
        lambda b: _tag(b, 1), batch_format="pyarrow", runtime_env=_RENV,
        batch_size=8192,
    )

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["shard"].iloc[0])
        surv = set(g.loc[g["side"] == 0, "doc_id"])
        drop = ray.get(drop_ref)
        rows = g[(g["side"] == 1)
                 & g["doc_id"].isin(surv)
                 & ~g["doc_id"].isin(drop)].sort_values("doc_id")
        h = hashlib.sha256()
        for r in rows.itertuples(index=False):
            h.update(str(r.doc_id).encode())
            h.update(hashlib.blake2b(r.text.encode(), digest_size=16).digest())
        # in-shard greedy packing — the SAME kernel pack_sequences
        # runs (shared: queries.pack_greedy), so the shard packs can't
        # drift from the oracle's rule (r5 review)
        from .queries import pack_greedy

        n_tok = rows["text"].str.count(r"\S+").to_numpy(dtype=np.int64)
        pack_local, pack_pos = pack_greedy(n_tok, pack_budget)
        cur = int(pack_local[-1]) if len(pack_local) else 0
        path = os.path.join(out_dir, f"shard-{shard:05d}.parquet")
        pq.write_table(
            pa.table({"doc_id": pa.array(rows["doc_id"].to_numpy(), pa.int64()),
                      "text": pa.array(rows["text"], pa.large_string()),
                      "n_tokens": pa.array(n_tok, pa.int64()),
                      "pack_id": pa.array((shard << 20) + pack_local, pa.int64()),
                      "pack_pos": pa.array(pack_pos, pa.int64())}),
            path + ".tmp")
        os.replace(path + ".tmp", path)
        manifest = {
            "shard": shard,
            "n_docs": int(len(rows)),
            "n_chars": int(rows["text"].str.len().sum()),
            "n_packs": int(cur + 1) if len(rows) else 0,
            "sha256": h.hexdigest(),
        }
        with open(_marker(out_dir, shard) + ".tmp", "w") as f:
            # n_shards recorded in the MARKER only (resume guard)
            json.dump({**manifest, "n_shards": n_shards}, f)
        os.replace(_marker(out_dir, shard) + ".tmp", _marker(out_dir, shard))
        return pd.DataFrame([{**manifest, "resumed": False}])

    written = (
        survivors.union(docs)
        .groupby("shard")
        .map_groups(write_shard, batch_format="pandas", runtime_env=_RENV)
        .to_pandas()
    )
    if written.empty:
        written = pd.DataFrame(columns=cols)
    # close out md5-empty shards with an empty (0-row, right-schema)
    # parquet + marker so resume early-exits and the manifest covers
    # every shard (shared protocol, r5 review)
    covered = set(done) | {int(s) for s in written.get("shard", [])}
    zeros = closeout_empty(
        out_dir, n_shards, covered, ".parquet",
        lambda p: pq.write_table(_SHARD_SCHEMA.empty_table(), p),
        lambda s: {"shard": s, "n_docs": 0, "n_chars": 0, "n_packs": 0,
                   "sha256": hashlib.sha256().hexdigest()})
    skipped = pd.DataFrame([{**m, "resumed": True} for m in done.values()]
                           + [{**m, "resumed": False} for m in zeros],
                           columns=cols)
    out = pd.concat([written, skipped], ignore_index=True)
    return out.sort_values("shard").reset_index(drop=True).astype(
        {"shard": "int64", "n_docs": "int64", "n_chars": "int64",
         "n_packs": "int64", "resumed": "bool"})


def crawl_documents_table(crawl_out: str, dest_root: str) -> str:
    """Materialize a crawl run's POST contents as a documents table so
    the whole text-curation chain runs over crawl output with zero
    adapters (every reader in ops/ opens ``<dir>/documents.parquet``
    via ray.data, which accepts the parquet DIRECTORY this writes).

    doc_id = low-62-bit blake2b of (origin, subpath) — deterministic,
    independent of crawl order / pump count, collision probability
    ~n²/2⁶² (negligible to 10^9 posts). Returns the sf_dir-shaped
    directory."""
    from ..crawl.crawler import entries_dataset

    doc_dir = os.path.join(dest_root, "documents.parquet")
    import shutil

    shutil.rmtree(doc_dir, ignore_errors=True)
    os.makedirs(doc_dir, exist_ok=True)

    def project(batch: pa.Table) -> pa.Table:
        keys = [f"{o}\x00{s}" for o, s in
                zip(batch["origin"].to_pylist(), batch["subpath"].to_pylist())]
        ids = np.array(
            [int.from_bytes(hashlib.blake2b(k.encode(), digest_size=8).digest(),
                            "little") >> 2 for k in keys],
            dtype=np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pc.cast(batch["content"], pa.large_string())})

    import pyarrow.fs as pafs

    (entries_dataset(crawl_out)
     .filter(expr="type == 'post'")
     .map_batches(project, batch_format="pyarrow", runtime_env=_RENV,
                  batch_size=8192)
     .write_parquet(doc_dir, filesystem=pafs.LocalFileSystem()))
    return dest_root


def crawl_corpus_export(crawl_out: str, out_dir: str, **kw) -> pd.DataFrame:
    """The text half of crawl→curate→train: quality ∩ exact-keeper ∩
    near-dup-keeper over the crawl's own post contents, delivered as
    train-ready packed shards (see :func:`corpus_curated_export`)."""
    sf_like = crawl_documents_table(crawl_out, os.path.join(out_dir, "_docs"))
    return corpus_curated_export(sf_like, out_dir, **kw)


def read_corpus_shards(out_dir: str) -> pd.DataFrame:
    """Consumer helper: every shard back as one (doc_id, text) frame."""
    parts = [
        pq.read_table(os.path.join(out_dir, n)).to_pandas()
        for n in sorted(os.listdir(out_dir)) if n.endswith(".parquet")
    ]
    if not parts:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "text": pd.Series([], dtype="object")})
    return pd.concat(parts, ignore_index=True).sort_values(
        "doc_id").reset_index(drop=True)

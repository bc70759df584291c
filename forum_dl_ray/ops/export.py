"""Sharded training-data export — WebDataset-style tar shards.

The delivery format large-scale image/caption training jobs consume is
a directory of tar shards, each holding (sample.jpg, sample.txt,
sample.json) triples, streamed sequentially by the data loader. The
reference has nothing like this (its sinks are mail/jsonl files,
writers/*.py); this op is part of the §2.8 beyond-reference layer the
graft brief asks for: the export side of a crawl→curate→train corpus.

Ray-Data-first design, sized for the 100 TB case:

- **Deterministic shard assignment**: ``shard = md5_low64(image_id)
  % n_shards`` (the DuckDB-reproducible hash the simhash family
  already uses, text.py:246-263) — independent of row order, block
  layout and cluster width, so re-runs and resumes agree on where
  every sample lives. (WebDataset packs sequentially; hash assignment
  is the deliberate deviation that buys order-free resumability —
  documented here because loaders that rely on within-shard sample
  order should sort by key, which is also the in-shard order we
  write.)
- **One shuffle, payload moves once**: assignment is a vectorized
  ``map_batches`` column add; ``groupby(shard).map_groups`` then
  co-locates each shard's rows on one worker, which writes ONE tar —
  the only all-to-all the op performs, and it is the intrinsic one
  (packing requires co-location).
- **Resumable**: every completed shard leaves a ``shard-NNNNN.json``
  marker (count, payload bytes, sha256). A resumed run reads the
  marker set (driver-side, O(n_shards) small), broadcasts it, and
  FILTERS finished shards' rows out before the shuffle — finished
  payload never leaves the source parquet again.
- **Byte-deterministic tars**: entries sorted by image_id, USTAR
  format, mtime=0, uid/gid=0, fixed mode — so shard sha256 is a
  stable content hash (tested: two exports are byte-identical).
- **Atomic**: tar written to ``.tmp`` then renamed; marker written
  last — a killed run leaves either nothing or a complete shard.

``n_shards`` defaults from source parquet metadata (total compressed
bytes / ``target_shard_bytes``), i.e. it scales with the corpus, not
with a constant.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import tarfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from forum_dl_ray import STAGE_RUNTIME_ENV as _RENV

from ._io import read_parquet_clean
from ._md5v import md5_low64
from .images_ops import images_table_path

_TARGET_SHARD_BYTES = 32 << 20  # sandbox-scale default; at 100 TB use ~1 GiB


def shard_of_ids(ids, n_shards: int) -> np.ndarray:
    """md5-low-64 % n_shards, equal to DuckDB
    ``md5_number_lower(id) % n_shards`` (same digest-slice convention
    as text.py:_md5_token_hashes). Vectorized single-block md5
    (_md5v.py) — accepts a pyarrow string array or list[str]; no
    per-row hashlib in the payload-moving stage (r3 verdict #3)."""
    return (md5_low64(ids) % np.uint64(n_shards)).astype(np.int64)


def default_n_shards(images_pq: str, target_shard_bytes: int = _TARGET_SHARD_BYTES) -> int:
    """Shard count from parquet metadata only (no data read). Accepts
    a single file or a directory tree (a crawl's images output)."""
    if os.path.isdir(images_pq):
        files = [os.path.join(r, f) for r, _, fs in os.walk(images_pq)
                 for f in fs if f.endswith(".parquet")]
    else:
        files = [images_pq]
    total = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        total += sum(md.row_group(i).total_byte_size
                     for i in range(md.num_row_groups))
    return int(min(4096, max(8, round(total / target_shard_bytes))))


def _marker_path(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, f"shard-{shard:05d}.json")


def _tar_path(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, f"shard-{shard:05d}.tar")


def _read_markers(out_dir: str, n_shards: int | None = None) -> dict[int, dict]:
    """Finished-shard markers (shared protocol, ops/_markers.py)."""
    from ._markers import read_done

    return read_done(out_dir, n_shards, ".tar")


def _empty_tar_bytes() -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT):
        pass
    return buf.getvalue()


def _add_entry(tf: tarfile.TarFile, name: str, payload: bytes) -> None:
    ti = tarfile.TarInfo(name=name)
    ti.size = len(payload)
    ti.mtime = 0
    ti.uid = ti.gid = 0
    ti.uname = ti.gname = ""
    ti.mode = 0o644
    tf.addfile(ti, io.BytesIO(payload))


def write_shard_tar(g: pd.DataFrame, out_dir: str,
                    n_shards: int | None = None) -> pd.DataFrame:
    """Pack one shard group into a deterministic tar; returns its
    manifest row. Runs inside map_groups — one task per shard."""
    shard = int(g["shard"].iloc[0])
    g = g.sort_values("image_id")
    buf = io.BytesIO()
    payload_bytes = 0
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for row in g.itertuples(index=False):
            img = bytes(row.bytes)
            cap = (row.caption or "").encode()
            meta = json.dumps(
                {"w": int(row.w), "h": int(row.h), "fmt": row.fmt,
                 "phash": int(row.phash)},
                sort_keys=True,
            ).encode()
            _add_entry(tf, f"{row.image_id}.{row.fmt}", img)
            _add_entry(tf, f"{row.image_id}.txt", cap)
            _add_entry(tf, f"{row.image_id}.json", meta)
            payload_bytes += len(img) + len(cap)
    raw = buf.getvalue()
    sha = hashlib.sha256(raw).hexdigest()
    tmp = _tar_path(out_dir, shard) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(raw)
    os.replace(tmp, _tar_path(out_dir, shard))
    manifest = {
        "shard": shard,
        "n_samples": int(len(g)),
        "payload_bytes": int(payload_bytes),
        "sha256": sha,
    }
    with open(_marker_path(out_dir, shard) + ".tmp", "w") as f:
        # n_shards goes into the MARKER only (resume guard), not the
        # returned manifest row — placement is invalid under any other
        # shard count
        json.dump({**manifest, "n_shards": n_shards}
                  if n_shards is not None else manifest, f)
    os.replace(_marker_path(out_dir, shard) + ".tmp", _marker_path(out_dir, shard))
    return pd.DataFrame([{**manifest, "resumed": False}])


def image_shard_export(
    sf_dir: str,
    out_dir: str,
    n_shards: int | None = None,
    resume: bool = True,
    drop_ids: frozenset[str] | None = None,
    src: str | None = None,
) -> pd.DataFrame:
    """Export the image+caption table to WebDataset-style tar shards.

    ``drop_ids`` (curation verdicts — near-dup non-keepers, quality
    rejects; ≪ corpus by construction) is broadcast once via
    ``ray.put`` and filtered out inside the assignment stage, before
    any payload moves. Returns the manifest (shard, n_samples,
    payload_bytes, sha256, resumed) — O(n_shards), driver-small by
    construction."""
    import ray as _ray

    from ._markers import clear_stale, closeout_empty, write_marker

    src = src or images_table_path(sf_dir)
    if n_shards is None:
        n_shards = default_n_shards(src)
    os.makedirs(out_dir, exist_ok=True)
    cols = ["shard", "n_samples", "payload_bytes", "sha256", "resumed"]
    if resume:
        done = _read_markers(out_dir, n_shards)
    else:
        # fresh run: stale shards from a previous (possibly
        # different-n_shards) export must not survive next to the new
        # ones — consumers glob shard-* and would read samples twice
        # (r5 review; mirrors pump's fresh-run ckpt_dir clear)
        clear_stale(out_dir, ".tar")
        done = {}
    if len(done) == n_shards:  # fully finished: skip the whole pipeline
        return (pd.DataFrame([{**m, "resumed": True} for m in done.values()],
                             columns=cols)
                .drop(columns=["n_shards"], errors="ignore")
                .sort_values("shard").reset_index(drop=True)
                .astype({"shard": "int64", "n_samples": "int64",
                         "payload_bytes": "int64"}))
    drop_ref = _ray.put(drop_ids) if drop_ids else None

    def assign(batch: pa.Table) -> pa.Table:
        if drop_ref is not None:  # curation filter, payload-side prune
            drop = _ray.get(drop_ref)
            keep_c = ~pd.Series(batch["image_id"].to_pylist()).isin(drop)
            batch = batch.filter(pa.array(keep_c.to_numpy()))
        shard = shard_of_ids(batch["image_id"], n_shards)
        batch = batch.append_column("shard", pa.array(shard, pa.int64()))
        if done:  # prune finished shards before any payload moves
            keep = ~np.isin(shard, list(done))
            batch = batch.filter(pa.array(keep))
        return batch

    ds = read_parquet_clean(src).map_batches(
        assign, batch_format="pyarrow", batch_size=256, runtime_env=_RENV
    )

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        return write_shard_tar(g, out_dir, n_shards=n_shards)

    written = (
        ds.groupby("shard")
        .map_groups(pack, batch_format="pandas", runtime_env=_RENV)
        .to_pandas()
    )
    if written.empty:  # fully-resumed run: no groups reached the packer
        written = pd.DataFrame(columns=cols)
    # md5-empty shards: close them out with an empty tar + marker so
    # len(done)==n_shards is a reliable finished test and the manifest
    # covers every shard (r5 review; the warc sink's protocol)
    covered = set(done) | {int(s) for s in written.get("shard", [])}
    empty_raw = _empty_tar_bytes()

    def _make_empty(path: str) -> None:
        with open(path, "wb") as f:
            f.write(empty_raw)

    zeros = closeout_empty(
        out_dir, n_shards, covered, ".tar", _make_empty,
        lambda s: {"shard": s, "n_samples": 0, "payload_bytes": 0,
                   "sha256": hashlib.sha256(empty_raw).hexdigest()})
    skipped = pd.DataFrame(
        [{**m, "resumed": True} for m in done.values()]
        + [{**m, "resumed": False} for m in zeros],
        columns=cols,
    )
    out = pd.concat([written, skipped], ignore_index=True)
    # explicit resumed cast: concat with an all-empty `written` frame
    # leaves object dtype, and callers negate the column (~resumed)
    return out.sort_values("shard").reset_index(drop=True).astype(
        {"shard": "int64", "n_samples": "int64", "payload_bytes": "int64",
         "resumed": "bool"}
    )


def curated_shard_export(
    sf_dir: str,
    out_dir: str,
    n_shards: int | None = None,
    max_hamming: int = 12,
    resume: bool = True,
    src: str | None = None,
) -> pd.DataFrame:
    """The end-to-end image-curation delivery pipeline: pHash near-dup
    clustering → keep the highest-resolution member per cluster
    (images_ops.image_dedup_keepers' rule) → tar-shard export of the
    curated set. The drop set (non-keepers, ≪ corpus by LSH
    construction) is the only curation state that crosses stages, as
    one broadcast — payload bytes stream straight from the source
    parquet into the shard tars exactly once."""
    from .images_ops import image_dedup_drop_set

    return image_shard_export(
        sf_dir, out_dir, n_shards=n_shards, resume=resume,
        drop_ids=image_dedup_drop_set(sf_dir, max_hamming, src=src),
        src=src,
    )


def read_shards(out_dir: str) -> dict[str, tuple[bytes, str, dict]]:
    """Test/consumer helper: stream every shard back into
    {image_id: (bytes, caption, meta)} (loader-side view)."""
    out: dict[str, tuple[bytes, str, dict]] = {}
    parts: dict[str, dict] = {}
    for name in sorted(os.listdir(out_dir)):
        if not name.endswith(".tar"):
            continue
        with tarfile.open(os.path.join(out_dir, name)) as tf:
            for ti in tf:
                stem, ext = ti.name.rsplit(".", 1)
                parts.setdefault(stem, {})[ext] = tf.extractfile(ti).read()
    for stem, p in parts.items():
        meta_raw = p.pop("json")
        cap = p.pop("txt").decode()
        (_ext, img), = p.items()
        out[stem] = (img, cap, json.loads(meta_raw))
    return out

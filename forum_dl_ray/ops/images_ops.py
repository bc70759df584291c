"""Multimodal (image payload) pipelines over the synthetic fixture.

Treats images as opaque ``binary`` columns with typed metadata — the
BASELINE.json input_hint payload shape ``(image_id, bytes, w, h, fmt,
caption, phash)`` — and runs decode / feature / resize / near-dup as
Ray Data stages (actor pools for the decode-heavy ones, setup in
``__init__``). Real image libraries are absent in this container:
``png`` decode is a real minimal codec, ``jpeg`` a clearly-marked
deterministic stand-in (forum_dl_ray/images.py docstring) — the
Ray-side plumbing (schema, batch sizes, actor signature, output
layout) is real and tested, per the multimodal-ops contract.

The input table is the deterministic ``small_spec`` fixture images
parquet (seeded; byte-identical across runs) — self-contained like the
crawl queries, independent of the sf_dir tables.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from forum_dl_ray import STAGE_RUNTIME_ENV as _RENV

from ._io import read_parquet_clean

from ..images import (
    ImageDecodeStage,
    decode_image,
    encode_png,
    phash64,
    psnr,
    resize_nearest,
)

# wide binary rows -> small batches (SURVEY.md §7.4)
_IMG_BATCH = 128


def images_table_path(sf_dir: str | None = None) -> str:
    """Deterministic image payload table (generated once, cached)."""
    from ..fixtures import generate_fixture, small_spec

    return os.path.join(generate_fixture(small_spec()), "images.parquet")


def _read_images(columns=None, src: str | None = None) -> rd.Dataset:
    """``src`` overrides the fixture table: a parquet file, a
    directory tree (e.g. a crawl run's ``out/images`` — the crawl's
    asset stage emits exactly the input_hint schema, assets.py:53-64,
    so every curation op here runs unchanged on crawl output), or a
    ``.lance`` dataset (the north rule's native layout; ray.data has
    first-class read_lance/write_lance). The lance package is not in
    this container, so the lance branch is import-gated — the ops
    themselves are storage-agnostic Dataset transforms either way."""
    src = src or images_table_path()
    if src.endswith(".lance"):
        try:
            import lance  # noqa: F401  (absent here; seam for real deploys)
        except ImportError as e:
            raise ImportError(
                "the .lance image-table path needs the `lance` package, "
                "which is not installed in this container; use the "
                "equivalent parquet table instead") from e
        return rd.read_lance(src, columns=columns)
    return read_parquet_clean(src, columns=columns)


def image_decode_stats(sf_dir: str) -> pd.DataFrame:
    """Decode every payload (actor pool) and verify dims against the
    typed metadata; returns (image_id, w, h, fmt, caption, decode_ok,
    dims_match, phash_match). Columns w/h are the DECODED dims."""
    ds = _read_images()
    out = ds.map_batches(
        ImageDecodeStage, batch_format="pyarrow", batch_size=_IMG_BATCH,
        concurrency=2, runtime_env=_RENV,
    )

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        dims_match = pc.and_(
            pc.equal(batch["decoded_w"], batch["w"]),
            pc.equal(batch["decoded_h"], batch["h"]),
        )
        # hamming(stored, decoded) — vectorized xor + bit count
        x = np.bitwise_xor(
            batch["phash"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64),
            batch["phash_computed"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64),
        )
        ham = np.unpackbits(x.view(np.uint8)).reshape(len(x), 8 * 8).sum(axis=1).astype(np.int64)
        fmts = batch["fmt"].to_numpy(zero_copy_only=False)
        # lossless must roundtrip phash exactly; the lossy stand-in may
        # flip a few DCT-median bits (measured max 8 at quant step 4)
        ok = np.where(fmts == "png", ham == 0, ham <= 10)
        return pa.table(
            {
                "image_id": batch["image_id"],
                "w": batch["decoded_w"],
                "h": batch["decoded_h"],
                "fmt": batch["fmt"],
                "caption": batch["caption"],
                "decode_ok": batch["decode_ok"],
                "dims_match": dims_match,
                "phash_ok": pa.array(ok, pa.bool_()),
            }
        )

    df = out.map_batches(
        project, batch_format="pyarrow", batch_size=1024, runtime_env=_RENV
    ).to_pandas()
    return df.sort_values("image_id").reset_index(drop=True)


def image_psnr_check(sf_dir: str) -> pd.DataFrame:
    """Per-row decoded-pixel invariant (BASELINE.json input_hint):
    regenerate the reference pixels from the seeded generator and
    assert PSNR ≥ 40 dB for the lossy format / exact for lossless.
    Returns (image_id, fmt, passes)."""
    from ..images import synth_pixels

    ds = _read_images(["image_id", "bytes", "fmt", "w", "h"])

    def check(batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        vals, passes = [], []
        for i, raw in enumerate(blobs):
            px = decode_image(raw, fmts[i])
            ref = synth_pixels(ids[i], ws[i], hs[i])
            p = psnr(ref, px)
            capped = 999.0 if p == float("inf") else p
            vals.append(int(round(capped * 10)))
            passes.append(p >= 40.0)
        return pa.table(
            {
                "image_id": batch["image_id"],
                "fmt": batch["fmt"],
                "passes": pa.array(passes, pa.bool_()),
            }
        )

    df = ds.map_batches(
        check, batch_format="pyarrow", batch_size=_IMG_BATCH, runtime_env=_RENV
    ).to_pandas()
    return df.sort_values("image_id").reset_index(drop=True)


def image_phash_neardup(sf_dir: str, max_hamming: int = 12,
                        src: str | None = None) -> pd.DataFrame:
    """Near-duplicate images via 64-bit pHash banding (4×16-bit bucket
    keys → shared-bucket candidates → exact hamming verify) — the same
    LSH-bucket shuffle pattern as text simhash dedup."""
    from .dedup import _lsh_candidate_pairs

    ds = _read_images(["image_id", "phash"], src)

    def explode(batch: pa.Table) -> pa.Table:
        import hashlib

        ids = batch["image_id"].to_pylist()
        hs = batch["phash"].to_pylist()
        out_band, out_key, id_num = [], [], []
        for d, h in zip(ids, hs):
            u = h & ((1 << 64) - 1)
            num = int.from_bytes(
                hashlib.blake2b(d.encode(), digest_size=7).digest(), "little"
            )
            for band in range(4):
                id_num.append(num)
                out_band.append(band)
                out_key.append((u >> (band * 16)) & 0xFFFF)
        return pa.table(
            {
                "doc_id": pa.array(id_num, pa.int64()),
                "band_id": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_key, pa.int64()),
            }
        )

    band_ds = ds.map_batches(
        explode, batch_format="pyarrow", batch_size=4096, runtime_env=_RENV
    )
    cand = _lsh_candidate_pairs(band_ds, ["band_id", "band_hash"])
    if len(cand) == 0:
        return pd.DataFrame({"id_a": pd.Series([], dtype="str"),
                             "id_b": pd.Series([], dtype="str"),
                             "hamming": pd.Series([], dtype="int64")})
    cand = cand.drop_duplicates()
    # distributed semi-join: broadcast the candidate id-hash set and
    # filter the (image_id, phash) stream to it — only candidate rows
    # (≪ corpus) ever reach the driver
    import ray as _ray

    need = np.sort(np.unique(np.concatenate(
        [cand["id_a"].to_numpy(np.int64), cand["id_b"].to_numpy(np.int64)])))
    need_ref = _ray.put(need)

    def only_candidates(batch: pa.Table) -> pa.Table:
        import hashlib

        keys = _ray.get(need_ref)
        ids = batch["image_id"].to_pylist()
        nums = np.fromiter(
            (int.from_bytes(hashlib.blake2b(d.encode(), digest_size=7).digest(), "little")
             for d in ids), dtype=np.int64, count=len(ids))
        pos = np.searchsorted(keys, nums)
        pos[pos >= len(keys)] = len(keys) - 1
        mask = keys[pos] == nums
        return batch.filter(pa.array(mask)).append_column(
            "id_num", pa.array(nums[mask], pa.int64()))

    cand_rows = _read_images(["image_id", "phash"], src).map_batches(
        only_candidates, batch_format="pyarrow", batch_size=8192, runtime_env=_RENV
    ).to_pandas()
    num2id = dict(zip(cand_rows["id_num"], cand_rows["image_id"]))
    pmap = dict(zip(cand_rows["id_num"], cand_rows["phash"]))
    # vectorized hamming popcount over the candidate pairs
    av = cand["id_a"].map(pmap).to_numpy(np.int64).view(np.uint64)
    bv = cand["id_b"].map(pmap).to_numpy(np.int64).view(np.uint64)
    x = (av ^ bv).view(np.uint8).reshape(len(cand), 8)
    ham = np.unpackbits(x, axis=1).sum(axis=1).astype(np.int64)
    rows = set()
    for a, b, h in zip(cand["id_a"], cand["id_b"], ham):
        if h <= max_hamming:
            ia, ib = sorted((num2id[int(a)], num2id[int(b)]))
            rows.add((ia, ib, int(h)))
    out = pd.DataFrame(sorted(rows), columns=["id_a", "id_b", "hamming"])
    return out.astype({"hamming": "int64"}).reset_index(drop=True)


class ThumbnailStage:
    """Actor-pool resize stage: decode → nearest-neighbor downsample →
    re-encode PNG. Real kernels (our codecs are numpy); a real
    image-lib resize slots in behind the same batch signature."""

    def __init__(self, thumb: int = 32):
        self.thumb = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        out_bytes, tws, ths = [], [], []
        for raw, fmt in zip(blobs, fmts):
            px = decode_image(raw, fmt)
            t = resize_nearest(px, self.thumb, self.thumb)
            out_bytes.append(encode_png(t))
            tws.append(t.shape[1])
            ths.append(t.shape[0])
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "thumb_bytes": pa.array(out_bytes, pa.binary()),
                "thumb_w": pa.array(tws, pa.int32()),
                "thumb_h": pa.array(ths, pa.int32()),
            }
        )


def image_thumbnails(sf_dir: str) -> pd.DataFrame:
    """Thumbnail pipeline; returns (image_id, thumb_w, thumb_h, shard)
    — the bytes stay in the pipeline (compare-light). ``shard`` is the
    tar-export placement (ops/export.py shard_of_ids), surfaced here so
    the DuckDB oracle certifies the export's deterministic assignment."""
    ds = _read_images(["image_id", "bytes", "fmt"])
    out = ds.map_batches(
        ThumbnailStage, batch_format="pyarrow", batch_size=_IMG_BATCH,
        concurrency=2, runtime_env=_RENV,
    )

    def project(batch: pa.Table) -> pa.Table:
        from .export import shard_of_ids

        return pa.table(
            {
                "image_id": batch["image_id"],
                "thumb_w": batch["thumb_w"],
                "thumb_h": batch["thumb_h"],
                "shard": pa.array(
                    shard_of_ids(batch["image_id"].to_pylist(), 16), pa.int64()
                ),
            }
        )

    df = out.map_batches(
        project, batch_format="pyarrow", batch_size=1024, runtime_env=_RENV
    ).to_pandas()
    return df.sort_values("image_id").reset_index(drop=True)


class FakeEmbedStage:
    """DETERMINISTIC STAND-IN for model-based image embedding (no
    vision model exists in this container): mean-pools 4×4 patch
    luminance into a 16-dim vector. A real encoder (CLIP et al.) drops
    in behind the same (batch in → list<float> column out) signature
    with weights loaded once per actor in __init__."""

    def __init__(self, grid: int = 4):
        self.grid = grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        vecs = []
        for raw, fmt in zip(blobs, fmts):
            px = decode_image(raw, fmt).astype(np.float32).mean(axis=2)
            g = self.grid
            t = resize_nearest(px[..., None], g, g)[..., 0]
            v = (t / 255.0).flatten()
            vecs.append([round(float(x), 4) for x in v])
        return pa.table(
            {
                "image_id": batch["image_id"],
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
            }
        )


def image_ann_topk(sf_dir: str, query_ids: list[str] | None = None, k: int = 5,
                   src: str | None = None) -> pd.DataFrame:
    """Similarity search on the IMAGE axis: brute-force cosine top-k of
    every image against a handful of query images — the visual-dedup /
    retrieval primitive, mirroring ``similarity.brute_topk``'s scale
    shape. Query vectors come from a PUSHED-DOWN point read (only the
    query rows' payloads are decoded twice), are broadcast via
    ``ray.put``, and the corpus streams ONCE through the embed actor
    pool with a per-batch matmul + local top-k combiner; the driver
    reduce sees O(batches·|Q|·k) rows, never the corpus. Returns
    (query_id, image_id, rank, sim_e6); self-matches excluded.
    Deterministic (stub encoder), pinned against an in-test exact
    brute force."""
    import pyarrow.compute as _pc

    import ray as _ray

    if query_ids is None:
        # deterministic default: first 3 ids in lexicographic order —
        # via a per-batch min-3 combiner (the full .to_pandas() here
        # pulled the whole id column through the driver, the exact
        # round-1 antipattern the other ops fixed; r5 review). The
        # driver sees O(blocks·3) rows.
        def local_min3(batch: pa.Table) -> pa.Table:
            ids = sorted(batch["image_id"].to_pylist())[:3]
            return pa.table({"image_id": pa.array(ids, pa.string())})

        partials = (_read_images(["image_id"], src)
                    .map_batches(local_min3, batch_format="pyarrow",
                                 runtime_env=_RENV, batch_size=65536)
                    .to_pandas())
        query_ids = sorted(partials["image_id"])[:3]
    qset = list(query_ids)

    def only_queries(batch: pa.Table) -> pa.Table:
        keep = _pc.is_in(batch["image_id"], value_set=pa.array(qset))
        return batch.filter(keep)

    q_rows = (_read_images(["image_id", "bytes", "fmt"], src)
              .map_batches(only_queries, batch_format="pyarrow",
                           runtime_env=_RENV, batch_size=_IMG_BATCH)
              .map_batches(FakeEmbedStage, batch_format="pyarrow",
                           batch_size=_IMG_BATCH, concurrency=1,
                           runtime_env=_RENV)
              .to_pandas())  # |Q| rows — tiny
    q_rows = q_rows.set_index("image_id").loc[qset]
    qm = np.array([np.asarray(v, dtype=np.float32) for v in q_rows["embedding"]])
    qn = qm / np.maximum(1e-9, np.linalg.norm(qm, axis=1, keepdims=True))
    q_ref = _ray.put((qset, qn))

    class EmbedTopK:
        """Embed + local top-k in ONE actor stage (payload decoded
        once; only (query, candidate, sim) rows leave the worker)."""

        def __init__(self):
            self.embed = FakeEmbedStage()
            self.qids, self.qn = _ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = self.embed(batch)
            ids = np.array(emb["image_id"].to_pylist())
            m = np.array([np.asarray(v, dtype=np.float32)
                          for v in emb["embedding"].to_pylist()])
            mn = m / np.maximum(1e-9, np.linalg.norm(m, axis=1, keepdims=True))
            sims = mn @ self.qn.T  # (batch, |Q|)
            out_q, out_i, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                col = sims[:, qi]
                mask = ids != qid  # no self-match
                order = np.lexsort((ids[mask], -col[mask]))[:k]
                sel = np.nonzero(mask)[0][order]
                out_q += [qid] * len(sel)
                out_i += list(ids[sel])
                out_s += [int(round(s * 1e6)) for s in col[sel]]
            return pa.table({"query_id": pa.array(out_q, pa.string()),
                             "image_id": pa.array(out_i, pa.string()),
                             "sim_e6": pa.array(out_s, pa.int64())})

    parts = (_read_images(["image_id", "bytes", "fmt"], src)
             .map_batches(EmbedTopK, batch_format="pyarrow",
                          batch_size=_IMG_BATCH, concurrency=2,
                          runtime_env=_RENV)
             .to_pandas())  # O(batches * |Q| * k)
    parts = parts.sort_values(["query_id", "sim_e6", "image_id"],
                              ascending=[True, False, True])
    top = parts.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount().astype("int64")
    return top[["query_id", "image_id", "rank", "sim_e6"]]


def image_embeddings(sf_dir: str) -> pd.DataFrame:
    ds = _read_images(["image_id", "bytes", "fmt"])
    out = ds.map_batches(
        FakeEmbedStage, batch_format="pyarrow", batch_size=_IMG_BATCH,
        concurrency=2, runtime_env=_RENV,
    ).to_pandas()
    out["embedding"] = out["embedding"].map(lambda v: [round(float(x), 4) for x in v])
    return out.sort_values("image_id").reset_index(drop=True)


class VideoFrameSampleStage:
    """Actor-pool frame-sampling stage for video payloads.

    Since round 5 the video table (`fixtures/media.py
    video_table_path`) holds REAL RIFF AVI files with Motion-JPEG
    streams, and `decode_frames` demuxes them for real
    (`riffav.decode_avi_mjpeg`: RIFF chunk walk → strh dwScale/dwRate
    → per-'00dc' baseline-JFIF decode through `jpeg.py`). Frame
    timestamps come from the container's own rate. The pre-round-5
    deterministic fake remains only as the documented fallback for
    bytes that aren't a RIFF AVI (e.g. driving this stage over the
    crawl image table), so the plumbing stays total over arbitrary
    binary. Scale contract unchanged: opaque `binary` media column in,
    SMALL batches (wide binary rows), one output row per frame with
    (media_id, frame_idx, ts_ms, w, h, frame PNG)."""

    def __init__(self, frame_w: int = 16, frame_h: int = 16, max_frames: int = 4,
                 frame_interval_ms: int = 500):
        self.frame_w = frame_w
        self.frame_h = frame_h
        self.max_frames = max_frames
        self.interval = frame_interval_ms

    def decode_frames(self, media_id: str, raw: bytes) -> tuple[list, list[int]]:
        """(frames, per-frame ts_ms). Real demux+decode for RIFF AVI;
        the deterministic fallback plan for anything else — INCLUDING
        AVI-shaped payloads this decoder can't handle (non-MJPEG
        streams, corrupt chunks), so the stage stays total over
        arbitrary binary. Over the metadata-carrying video table a
        fallback result then fails the n_frames/dims assertions in
        __call__, so corruption still surfaces in-query."""
        from ..riffav import decode_avi_mjpeg, sniff

        if sniff(raw) == "avi":
            try:
                frames, fps = decode_avi_mjpeg(raw)
            except Exception:
                frames = None
            if frames is not None:
                return frames, [i * 1000 // fps for i in range(len(frames))]
        from ..images import synth_pixels

        n = 1 + (len(raw) % self.max_frames)
        frames = [synth_pixels(f"{media_id}-f{i}", self.frame_w, self.frame_h)
                  for i in range(n)]
        return frames, [i * self.interval for i in range(n)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..images import encode_png

        key = "media_id" if "media_id" in batch.column_names else "image_id"
        ids = batch[key].to_pylist()
        blobs = batch["bytes"].to_pylist()
        metas = (batch.select(["n_frames", "w", "h"]).to_pylist()
                 if "n_frames" in batch.column_names else [None] * len(ids))
        out = {"media_id": [], "frame_idx": [], "ts_ms": [], "w": [], "h": [],
               "frame_png": []}
        for mid, raw, meta in zip(ids, blobs, metas):
            frames, tss = self.decode_frames(mid, raw)
            if meta is not None:
                # the decoded stream must agree with the table's typed
                # metadata — a demuxer that drops frames or mis-reads
                # dims fails here, in-query (the crawl-hash pattern)
                assert len(frames) == meta["n_frames"], (mid, len(frames))
                assert frames[0].shape[:2] == (meta["h"], meta["w"]), mid
            for i, (px, ts) in enumerate(zip(frames, tss)):
                out["media_id"].append(mid)
                out["frame_idx"].append(i)
                out["ts_ms"].append(ts)
                out["w"].append(px.shape[1])
                out["h"].append(px.shape[0])
                out["frame_png"].append(encode_png(px))
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.string()),
                "frame_idx": pa.array(out["frame_idx"], pa.int32()),
                "ts_ms": pa.array(out["ts_ms"], pa.int64()),
                "w": pa.array(out["w"], pa.int32()),
                "h": pa.array(out["h"], pa.int32()),
                "frame_png": pa.array(out["frame_png"], pa.binary()),
            }
        )


def video_frame_sample(sf_dir: str) -> rd.Dataset:
    """Frame sampling over REAL AVI/MJPEG payloads: every frame of
    every video, (media_id, frame_idx, ts_ms, w, h) as a streaming
    Dataset; frame PNG bytes stay inside the pipeline (pixel fidelity
    is pinned by pytest PSNR, not the driver hash). The stage asserts
    the decoded stream against the table's independent
    n_frames/w/h metadata columns in-query, and the emitted plan
    (indices, container-rate timestamps, dims) is exactly reproducible
    from those metadata columns — so the driver's DuckDB oracle pins
    the demux+decode without re-decoding: a demuxer that drops frames,
    misreads strh rate, or decodes wrong dims mismatches the hash."""
    from ..fixtures.media import video_table_path

    from ._io import read_parquet_clean

    ds = read_parquet_clean(video_table_path(),
                            columns=["media_id", "bytes", "n_frames", "w", "h"])
    out = ds.map_batches(
        VideoFrameSampleStage, batch_format="pyarrow", batch_size=64,
        concurrency=2, runtime_env=_RENV,
    )

    def project(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["frame_png"])

    return out.map_batches(
        project, batch_format="pyarrow", batch_size=1024, runtime_env=_RENV
    )


def image_phash_clusters(sf_dir: str, max_hamming: int = 12,
                         src: str | None = None) -> rd.Dataset:
    """(image_id, cluster_id) — connected components over the verified
    pHash near-dup pairs, cluster_id = the lexicographically smallest
    member. Same scale shape as text ``minhash_clusters``
    (dedup.py:302): union-find runs on the driver over the PAIR set
    only (pairs ≪ corpus), the collapsed root map is broadcast, and
    ids are assigned vectorized in a streaming ``map_batches`` over
    the corpus — the result stays a Dataset."""
    import ray as _ray

    from ._uf import union_find_roots

    pairs = image_phash_neardup(sf_dir, max_hamming, src=src)
    roots = union_find_roots(pairs["id_a"], pairs["id_b"])
    root_ref = _ray.put(roots)

    def assign(batch: pa.Table) -> pa.Table:
        r = _ray.get(root_ref)
        ids = pd.Series(batch["image_id"].to_pylist())
        cluster = ids.map(r).fillna(ids)
        return pa.table({"image_id": pa.array(ids, pa.string()),
                         "cluster_id": pa.array(cluster, pa.string())})

    return _read_images(["image_id"], src).map_batches(
        assign, batch_format="pyarrow", runtime_env=_RENV, batch_size=8192
    )


def image_dedup_drop_set(sf_dir: str, max_hamming: int = 12,
                         src: str | None = None) -> frozenset:
    """Non-keeper image_ids under the curation rule "one keeper per
    pHash near-dup cluster: the highest-resolution member (max w·h,
    ties to the smallest image_id)". O(near-dups) ≪ corpus by LSH
    construction — this set is what downstream stages broadcast.

    Scale shape: only CLUSTERED ids have their (w, h) fetched, via a
    broadcast semi-join filter on the metadata columns (payload bytes
    never read); the keeper choice runs driver-side over that tiny
    set."""
    import ray as _ray

    from ._uf import union_find_roots

    pairs = image_phash_neardup(sf_dir, max_hamming, src=src)
    clustered = union_find_roots(pairs["id_a"], pairs["id_b"])
    members = sorted(clustered)
    if not members:
        return frozenset()
    member_ref = _ray.put(frozenset(members))

    def member_meta(batch: pa.Table) -> pa.Table:
        mem = _ray.get(member_ref)
        keep = pd.Series(batch["image_id"].to_pylist()).isin(mem)
        return batch.filter(pa.array(keep.to_numpy()))

    meta = _read_images(["image_id", "w", "h"], src).map_batches(
        member_meta, batch_format="pyarrow", runtime_env=_RENV, batch_size=8192
    ).to_pandas()  # O(clustered ids) — tiny by LSH construction
    meta["root"] = meta["image_id"].map(clustered)  # collapsed root map
    meta["res"] = meta["w"].astype(np.int64) * meta["h"].astype(np.int64)
    meta = meta.sort_values(["root", "res", "image_id"],
                            ascending=[True, False, True])
    keepers = meta.groupby("root", sort=False).head(1)["image_id"]
    return frozenset(meta["image_id"]) - frozenset(keepers)


def image_dedup_keepers(sf_dir: str, max_hamming: int = 12,
                        src: str | None = None) -> rd.Dataset:
    """Surviving image_ids under :func:`image_dedup_drop_set`'s rule —
    singletons plus one highest-resolution keeper per near-dup
    cluster. The drop set (≪ corpus) is broadcast and filtered
    against the streaming corpus scan; output stays a Dataset."""
    import ray as _ray

    drop_ref = _ray.put(image_dedup_drop_set(sf_dir, max_hamming, src=src))

    def keep_only(batch: pa.Table) -> pa.Table:
        drop = _ray.get(drop_ref)
        keep = ~pd.Series(batch["image_id"].to_pylist()).isin(drop)
        return batch.filter(pa.array(keep.to_numpy()))

    return _read_images(["image_id"], src).map_batches(
        keep_only, batch_format="pyarrow", runtime_env=_RENV, batch_size=8192
    )


def image_exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact payload dedup: min image_id per distinct byte content —
    the first pass every image-corpus pipeline runs (identical bytes
    re-posted across threads/hosts). Same partial-then-small-groupby
    shape as the text exact dedup: payload bytes are hashed inside the
    scan stage and only (hash, id) rows shuffle, never the payloads."""
    import hashlib

    from ray.data.aggregate import Min

    ds = _read_images(["image_id", "bytes"])

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [
            int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "little",
                           signed=True)
            for b in batch["bytes"].to_pylist()
        ]
        return pa.table({"bytes_hash": pa.array(hs, pa.int64()),
                         "image_id": batch["image_id"]})

    out = (
        ds.map_batches(add_hash, batch_format="pyarrow", runtime_env=_RENV,
                       batch_size=_IMG_BATCH)
        .groupby("bytes_hash")
        .aggregate(Min("image_id", alias_name="image_id"))
        .to_pandas()
    )
    return out[["image_id"]].sort_values("image_id").reset_index(drop=True)


def caption_quality(sf_dir: str, ) -> pd.DataFrame:
    """Caption-side curation stats for image-text pairs (the text half
    of LAION-style pair filtering): per caption, token count, char
    count and ASCII-alpha ratio — the same integer fixed-point kernels
    the documents quality filter uses, over the payload table."""
    import pyarrow.compute as pc

    ds = _read_images(["image_id", "caption"])

    def f(batch: pa.Table) -> pa.Table:
        cap = pc.cast(batch["caption"], pa.large_string())
        n_tok = pc.cast(pc.count_substring_regex(cap, pattern=r"\S+"), pa.int64())
        n_chars = pc.cast(pc.utf8_length(cap), pa.int64())
        n_alpha = pc.cast(pc.utf8_length(
            pc.replace_substring_regex(cap, "[^A-Za-z]", "")), pa.int64())
        alpha_e3 = pc.cast(
            pc.divide(pc.multiply(n_alpha, pa.scalar(1000, pa.int64())),
                      pc.max_element_wise(n_chars, pa.scalar(1, pa.int64()))),
            pa.int64())
        return pa.table(
            {"image_id": batch["image_id"], "cap_n_tokens": n_tok,
             "cap_n_chars": n_chars, "cap_alpha_e3": alpha_e3}
        )

    out = ds.map_batches(f, batch_format="pyarrow", runtime_env=_RENV,
                         batch_size=4096).to_pandas()
    return out.sort_values("image_id").reset_index(drop=True)


class _FakeTextEmbedStage:
    """DETERMINISTIC STAND-IN for a text encoder: hashed bag-of-words
    into the same 16-dim space the fake image encoder uses (a real
    CLIP text tower drops in behind the same signature)."""

    def __init__(self, dim: int = 16):
        self.dim = dim

    def embed(self, texts: list[str]) -> np.ndarray:
        import hashlib

        out = np.zeros((len(texts), self.dim), dtype=np.float64)
        for i, t in enumerate(texts):
            for w in t.lower().split():
                d = hashlib.blake2b(w.encode(), digest_size=4).digest()
                out[i, int.from_bytes(d, "little") % self.dim] += 1.0
            n = np.linalg.norm(out[i])
            if n > 0:
                out[i] /= n
        return out


class ImageCaptionSimStage:
    """Actor-pool CLIP-score stage (stub encoders): BOTH modalities
    live on the same payload row, so the pair score needs NO join —
    one streaming pass embeds image bytes (FakeEmbedStage kernel) and
    caption text (_FakeTextEmbedStage) per batch and emits the cosine.
    Real CLIP towers load their weights here in __init__ and keep this
    exact batch signature."""

    def __init__(self, grid: int = 4, dim: int = 16):
        self.img = FakeEmbedStage(grid=grid)
        self.txt = _FakeTextEmbedStage(dim=dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        img_tbl = self.img(batch)
        iv = np.stack(img_tbl["embedding"].to_pandas().to_numpy()).astype(np.float64)
        norms = np.linalg.norm(iv, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        iv /= norms
        tv = self.txt.embed(batch["caption"].to_pylist())
        sim = np.einsum("ij,ij->i", iv, tv)
        return pa.table(
            {"image_id": batch["image_id"],
             "embedding": img_tbl["embedding"],
             "sim_e4": pa.array((sim * 10000).astype(np.int64), pa.int64())}
        )


def image_caption_sim(sf_dir: str) -> pd.DataFrame:
    """Image-text pair alignment scores (the CLIP-score filter of
    pair-curation pipelines, stub encoders) — fully streaming, no
    shuffle, no driver materialization of anything corpus-sized.
    Rows-only (model-defined output); determinism pinned in tests."""
    out = image_embed_sim(sf_dir).select_columns(["image_id", "sim_e4"]).to_pandas()
    return out.sort_values("image_id").reset_index(drop=True)


def image_embed_sim(sf_dir: str) -> rd.Dataset:
    """(image_id, embedding, sim_e4) in ONE streaming pass — the
    driver-facing merge of :func:`image_embeddings` and
    :func:`image_caption_sim` (same-key rows-only ops share one entry
    under the driver's 50-query cap; both library functions and their
    determinism tests remain separate). One decode per payload instead
    of two."""
    return _read_images(["image_id", "bytes", "fmt", "caption"]).map_batches(
        ImageCaptionSimStage, batch_format="pyarrow", batch_size=_IMG_BATCH,
        concurrency=2, runtime_env=_RENV,
    )

"""Real ISO-28500 (WARC/1.1) capture export — S5's interchange format.

The reference's WARC *writer* is a no-op shell
(/root/reference/forum_dl/writers/warc.py:10-11) but its session
captures true WARC records via ``warcio.capture_http``
(/root/reference/forum_dl/session.py:37-48): one request + one
response record per fetch. This module reproduces that record shape
from first principles (no warcio here): WARC/1.1 headers, CRLF
framing, ``Content-Length``-delimited blocks, and ONE GZIP MEMBER PER
RECORD (the standard `.warc.gz` layout, which lets a reader seek to
any member boundary without decompressing the whole file).

Ray-Data shape (mirrors ops/export.py's tar-shard export):

- the crawl's lineage rows (metadata only — url, order_key, status,
  sha1; ~100 bytes/row) are the ONLY thing that shuffles: one
  ``groupby(shard)`` where ``shard = md5_low64(url) % n_shards``;
- bodies never move — each shard writer resolves them zero-copy from
  the broadcast page store (`ray.put` once, crawl/fetch.py) and
  verifies byte-identity against the lineage row's recorded sha1, so
  a store mutated since the crawl fails loudly instead of archiving
  the wrong bytes. Over the real-socket seam (HttpPageStore) the body
  is re-fetched — a REPLAYED capture, same sha1 gate;
- output is deterministic: records sorted by (order_key, url) within
  a shard, fixed WARC-Date (caller-stamped download_time — never
  wall-clock, CLAUDE.md), uuid5 record ids, gzip mtime=0. Shard files
  land atomically (`.tmp` + rename) with a JSON marker carrying
  n_shards (resume guard: md5 placement is a function of n_shards).

Determinism + atomicity make the export resumable: finished shards
are pruned BEFORE the shuffle, like image_shard_export.
"""

from __future__ import annotations

import gzip
import io
import json
import os
import uuid
from http.client import responses as _HTTP_REASONS
from urllib.parse import urlsplit

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import STAGE_RUNTIME_ENV as _RENV

_CRLF = "\r\n"


def _warc_record(warc_type: str, headers: list[tuple[str, str]], block: bytes) -> bytes:
    head = f"WARC/1.1{_CRLF}WARC-Type: {warc_type}{_CRLF}"
    for k, v in headers:
        head += f"{k}: {v}{_CRLF}"
    head += f"Content-Length: {len(block)}{_CRLF}{_CRLF}"
    return head.encode("utf-8") + block + b"\r\n\r\n"


def _record_id(*parts: str) -> str:
    """Deterministic record id (uuid5 over the capture identity)."""
    return f"<urn:uuid:{uuid.uuid5(uuid.NAMESPACE_URL, '|'.join(parts))}>"


def _http_request_block(url: str, user_agent: str) -> bytes:
    sp = urlsplit(url)
    path = sp.path or "/"
    if sp.query:
        path += "?" + sp.query
    lines = [f"GET {path} HTTP/1.1", f"Host: {sp.netloc}", "Accept-Encoding: gzip"]
    if user_agent:
        lines.append(f"User-Agent: {user_agent}")
    return (_CRLF.join(lines) + _CRLF + _CRLF).encode("utf-8")


def _http_response_block(status: int, content_type: str, body: bytes) -> bytes:
    reason = _HTTP_REASONS.get(status, "")
    lines = [f"HTTP/1.1 {status} {reason}".rstrip()]
    if content_type:
        lines.append(f"Content-Type: {content_type}")
    lines.append(f"Content-Length: {len(body)}")
    return (_CRLF.join(lines) + _CRLF + _CRLF).encode("utf-8") + body


def capture_members(url: str, status: int, content_type: str, body: bytes,
                    date_iso: str, user_agent: str = "", key: str = "") -> bytes:
    """request + response records for one fetch, each its own gzip
    member (warcio capture_http parity: session.py:37-48)."""
    resp_id = _record_id(url, key, "response")
    req_id = _record_id(url, key, "request")
    req = _warc_record(
        "request",
        [("WARC-Record-ID", req_id), ("WARC-Date", date_iso),
         ("WARC-Target-URI", url), ("WARC-Concurrent-To", resp_id),
         ("Content-Type", "application/http; msgtype=request")],
        _http_request_block(url, user_agent),
    )
    resp = _warc_record(
        "response",
        [("WARC-Record-ID", resp_id), ("WARC-Date", date_iso),
         ("WARC-Target-URI", url),
         ("Content-Type", "application/http; msgtype=response")],
        _http_response_block(status, content_type, body),
    )
    return gzip.compress(req, mtime=0) + gzip.compress(resp, mtime=0)


def metadata_member(url: str, payload: dict, date_iso: str, key: str = "") -> bytes:
    """WARC metadata record (parse-error lineage rows have no HTTP
    exchange to capture; the error JSON is the archival payload)."""
    rec = _warc_record(
        "metadata",
        [("WARC-Record-ID", _record_id(url, key, "metadata")),
         ("WARC-Date", date_iso), ("WARC-Target-URI", url),
         ("Content-Type", "application/json")],
        json.dumps(payload, sort_keys=True).encode("utf-8"),
    )
    return gzip.compress(rec, mtime=0)


# ----------------------------------------------------------------- reader
def iter_warc_records(path: str):
    """Parse a .warc.gz (or plain .warc) back into (headers, block)
    dicts — the round-trip surface. The gzip module reads concatenated
    members transparently, so member-per-record and whole-file gzip
    both parse."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        data = f.read()
    pos = 0
    while pos < len(data):
        end = data.index(b"\r\n\r\n", pos)
        head_lines = data[pos:end].decode("utf-8").split(_CRLF)
        if not head_lines[0].startswith("WARC/"):
            raise ValueError(f"bad record header at {pos}: {head_lines[0]!r}")
        headers = {}
        for line in head_lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip()] = v.strip()
        n = int(headers["Content-Length"])
        block = data[end + 4 : end + 4 + n]
        if data[end + 4 + n : end + 4 + n + 4] != b"\r\n\r\n":
            raise ValueError(f"missing record trailer after {headers}")
        yield {"headers": headers, "block": block}
        pos = end + 4 + n + 4


def split_http_block(block: bytes) -> tuple[str, dict, bytes]:
    """(status_line, http_headers, body) of an application/http block."""
    end = block.index(b"\r\n\r\n")
    lines = block[:end].decode("utf-8").split(_CRLF)
    hdrs = {}
    for line in lines[1:]:
        k, _, v = line.partition(":")
        hdrs[k.strip().lower()] = v.strip()
    return lines[0], hdrs, block[end + 4 :]


# ----------------------------------------------------------------- export
def _shard_file(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, f"shard-{shard:05d}.warc.gz")


def _marker(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, f"shard-{shard:05d}.json")


def _finished_shards(out_dir: str, n_shards: int) -> dict[int, dict]:
    """Finished-shard manifests (shared protocol, ops/_markers.py)."""
    from ..ops._markers import read_done

    return read_done(out_dir, n_shards, ".warc.gz")


def _write_warc_shard(g: pd.DataFrame, *, out_dir: str, pages,
                      date_iso: str, user_agent: str,
                      n_shards: int) -> pd.DataFrame:
    """One shard group → one deterministic .warc.gz. Body recovery +
    sha1 verification happen HERE, store-side — bodies never shuffle."""
    import hashlib

    from ..crawl.fetch import HttpPageStore, get_store

    shard = int(g["shard"].iloc[0])
    # `data` tiebreaker: a fetch's status row and a parse-error row
    # share (order_key, url), and a stable sort would leave their
    # relative order to post-shuffle block arrival — nondeterministic
    # shard bytes (r5 review). data is the JSON payload, distinct and
    # deterministic per row.
    g = g.sort_values(["order_key", "url", "data"], kind="mergesort")
    store = get_store(pages)
    urls = g["url"].tolist()
    rows = store.lookup(urls) if not isinstance(store, HttpPageStore) else None

    buf = io.BytesIO()
    n_resp = n_meta = 0
    for i, (url, key, data_json) in enumerate(
            zip(urls, g["order_key"].tolist(), g["data"].tolist())):
        meta = json.loads(data_json) if data_json else {}
        if "status" not in meta:
            buf.write(metadata_member(url, meta, date_iso, key=key))
            n_meta += 1
            continue
        status = int(meta["status"])
        body, ctype = b"", ""
        if status == 200:
            if rows is not None:
                r = rows[i]
                if r >= 0:
                    body = store.table["body"][r].as_py()
                    ctype = store.table["content_type"][r].as_py()
            else:
                _s, body, ctype = store.fetch(url)  # replayed capture
            got = hashlib.sha1(body).hexdigest()
            if got != meta.get("sha1"):
                raise ValueError(
                    f"WARC body drift for {url}: store sha1 {got} != "
                    f"lineage sha1 {meta.get('sha1')} — the page source "
                    "changed since the crawl; refusing to archive")
        buf.write(capture_members(url, status, ctype, body, date_iso,
                                  user_agent=user_agent, key=key))
        n_resp += 1

    raw = buf.getvalue()
    tmp = _shard_file(out_dir, shard) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(raw)
    os.replace(tmp, _shard_file(out_dir, shard))
    manifest = {"shard": shard, "n_responses": n_resp, "n_metadata": n_meta,
                "file_bytes": len(raw)}
    with open(_marker(out_dir, shard) + ".tmp", "w") as f:
        json.dump({**manifest, "n_shards": n_shards}, f)
    os.replace(_marker(out_dir, shard) + ".tmp", _marker(out_dir, shard))
    return pd.DataFrame([manifest])


def warc_export(crawl_dir: str, pages, out_dir: str, *, n_shards: int = 4,
                download_time: str = "2026-01-01T00:00:00+00:00",
                user_agent: str = "", resume: bool = True) -> pd.DataFrame:
    """Write the crawl's fetch lineage as sharded `.warc.gz` files.

    ``pages`` is whatever the crawl fetched through: a broadcast store
    ref (put_store), a parquet path, or an ``("http", ...)`` spec.
    Returns the manifest (shard, n_responses, n_metadata, file_bytes)
    — O(n_shards) rows, driver-small."""
    from ..ops._md5v import md5_low64

    from ..ops._markers import clear_stale, closeout_empty

    date_iso = download_time.replace("+00:00", "Z")
    os.makedirs(out_dir, exist_ok=True)
    if resume:
        done_m = _finished_shards(out_dir, n_shards)
    else:
        # fresh run: clear stale shards from a previous (possibly
        # different-n_shards) export (shared protocol, r5 review)
        clear_stale(out_dir, ".warc.gz")
        done_m = {}
    done = set(done_m)
    if len(done) == n_shards:  # nothing left: skip the pipeline
        rows = [{k: v for k, v in m.items() if k != "n_shards"}
                for m in done_m.values()]
        return (pd.DataFrame(rows).sort_values("shard")
                .reset_index(drop=True))

    def assign(batch: pa.Table) -> pa.Table:
        # project HERE (not via a select_columns stage): Filter's
        # empty-block passthrough skips a downstream Project and emits
        # mixed-schema RefBundles into the groupby (observed Ray
        # warning); every block passes through this map, so the
        # shuffle input schema is uniform
        batch = batch.select(["url", "order_key", "data"])
        shard = (md5_low64(batch["url"]) % np.uint64(n_shards)).astype(np.int64)
        batch = batch.append_column("shard", pa.array(shard, pa.int64()))
        if done:  # prune finished shards before the (only) shuffle
            batch = batch.filter(pa.array(~np.isin(shard, list(done))))
        return batch

    import ray.data as rd

    lineage = (
        rd.read_parquet(os.path.join(crawl_dir, "entries"),
                        columns=["type", "url", "order_key", "data"])
        .filter(expr="type == 'lineage'")
        .map_batches(assign, batch_format="pyarrow", batch_size=65536,
                     runtime_env=_RENV)
    )
    import functools

    write = functools.partial(_write_warc_shard, out_dir=out_dir, pages=pages,
                              date_iso=date_iso, user_agent=user_agent,
                              n_shards=n_shards)
    fresh = lineage.groupby("shard").map_groups(
        write, batch_format="pandas", runtime_env=_RENV
    ).to_pandas()
    rows = [fresh] if len(fresh) else []
    # shards md5 placement left EMPTY produce no group above, so they
    # would never get a marker — len(done) then never reaches n_shards
    # and every resumed call re-runs the whole read+shuffle to write
    # nothing (r5 review). Close them out with an empty shard file +
    # marker (zero-member .warc.gz parses to no records) so resume
    # early-exits and the manifest covers ALL shards.
    covered = done | (set(fresh["shard"].astype(int)) if len(fresh) else set())
    zeros = closeout_empty(
        out_dir, n_shards, covered, ".warc.gz",
        lambda p: open(p, "wb").close(),
        lambda s: {"shard": s, "n_responses": 0, "n_metadata": 0,
                   "file_bytes": 0})
    rows.extend(pd.DataFrame([m]) for m in zeros)
    for s, m in sorted(done_m.items()):
        rows.append(pd.DataFrame(
            [{k: v for k, v in m.items() if k != "n_shards"}]))
    if not rows:
        return pd.DataFrame(
            columns=["shard", "n_responses", "n_metadata", "file_bytes"])
    return (pd.concat(rows, ignore_index=True)
            .sort_values("shard").reset_index(drop=True))

"""Asset stage: fetched image bytes → payload-table rows.

The reference writes embedded files to disk per URL (writers/
common.py:140-189 ``write_file``). Here image fetch results land in
the payload table of BASELINE.json input_hint shape ``(image_id,
bytes, w, h, fmt, caption, phash)`` (SURVEY.md S8): decode via the
codec seam, dims + phash computed from decoded pixels, caption carried
on the frontier entry from the discovering ``<img alt>``.

Rows that fail to decode are dropped (their fetch lineage row was
already emitted by the parse stage of the discovering page; the fetch
failure itself is in the frontier failed-set).
"""

from __future__ import annotations

import pyarrow as pa

from ..fixtures.golden import image_id_from_url
from ..images import decode_image, phash64
from ..schemas import IMAGES


def asset_batch(batch: pa.Table) -> pa.Table:
    ids: list[str] = []
    blobs: list[bytes] = []
    ws: list[int] = []
    hs: list[int] = []
    fmts: list[str] = []
    captions: list[str] = []
    hashes: list[int] = []

    urls = batch["url"].to_pylist()
    bodies = batch["body"].to_pylist()
    statuses = batch["status"].to_pylist()
    titles = batch["title"].to_pylist()
    for url, body, status, caption in zip(urls, bodies, statuses, titles):
        if status != 200 or not body:
            continue
        image_id, ext = image_id_from_url(url)
        try:
            px = decode_image(body, ext)
        except Exception:
            continue
        ids.append(image_id)
        blobs.append(body)
        ws.append(px.shape[1])
        hs.append(px.shape[0])
        fmts.append(ext)
        captions.append(caption or "")
        hashes.append(phash64(px))

    return pa.table(
        {
            "image_id": ids,
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": fmts if ids else pa.array([], pa.string()),
            "caption": captions if ids else pa.array([], pa.string()),
            "phash": pa.array(hashes, pa.int64()),
        },
        schema=IMAGES,
    )

"""WebDataset-style tar shard export (ops/export.py).

Oracle strategy: the export is a FILE sink, so its correctness gate is
round-trip equality — every (image_id, bytes, caption, metadata) read
back from the tars must equal the source table — plus byte-determinism
(stable shard sha256) and resume semantics (finished shards' payload
is pruned before the shuffle and never rewritten). Shard assignment is
md5-based so DuckDB can reproduce it (see __ray_entry__
image_thumbnails oracle).
"""

import json
import os
import sys

import pandas as pd
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forum_dl_ray.ops.export import (
    image_shard_export,
    images_table_path,
    read_shards,
    shard_of_ids,
)

N_SHARDS = 12


@pytest.fixture(scope="module")
def source_df():
    return pq.read_table(images_table_path()).to_pandas()


@pytest.fixture(scope="module")
def export_dir(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("exp") / "shards")
    manifest = image_shard_export(None, out, n_shards=N_SHARDS)
    return out, manifest


def test_roundtrip_equals_source(export_dir, source_df):
    out, manifest = export_dir
    back = read_shards(out)
    assert len(back) == len(source_df)
    for row in source_df.itertuples(index=False):
        img, cap, meta = back[row.image_id]
        assert img == bytes(row.bytes)
        assert cap == (row.caption or "")
        assert meta == {"w": int(row.w), "h": int(row.h), "fmt": row.fmt,
                        "phash": int(row.phash)}


def test_manifest_counts_and_assignment(export_dir, source_df):
    out, manifest = export_dir
    shards = shard_of_ids(source_df["image_id"].tolist(), N_SHARDS)
    want = pd.Series(shards).value_counts().to_dict()
    got = dict(zip(manifest["shard"], manifest["n_samples"]))
    assert got == {int(k): int(v) for k, v in want.items()}
    assert not manifest["resumed"].any()
    # markers agree with manifest
    for row in manifest.itertuples(index=False):
        with open(os.path.join(out, f"shard-{row.shard:05d}.json")) as f:
            m = json.load(f)
        assert (m["n_samples"], m["sha256"]) == (row.n_samples, row.sha256)


def test_export_is_byte_deterministic(export_dir, ray_session, tmp_path):
    out, manifest = export_dir
    out2 = str(tmp_path / "again")
    m2 = image_shard_export(None, out2, n_shards=N_SHARDS)
    assert manifest["sha256"].tolist() == m2["sha256"].tolist()
    a = sorted(f for f in os.listdir(out) if f.endswith(".tar"))
    for f in a:
        assert open(os.path.join(out, f), "rb").read() == open(
            os.path.join(out2, f), "rb").read()


def test_resume_skips_finished_shards(export_dir, ray_session, tmp_path):
    out, manifest = export_dir
    out3 = str(tmp_path / "resume")
    m_first = image_shard_export(None, out3, n_shards=N_SHARDS)
    # kill two shards (tar + marker), as a mid-run failure would
    victims = sorted(m_first["shard"])[:2]
    for s in victims:
        os.remove(os.path.join(out3, f"shard-{s:05d}.tar"))
        os.remove(os.path.join(out3, f"shard-{s:05d}.json"))
    survivor_mtimes = {
        f: os.path.getmtime(os.path.join(out3, f))
        for f in os.listdir(out3)
        if f.endswith(".tar")
    }
    m_resumed = image_shard_export(None, out3, n_shards=N_SHARDS)
    rewritten = set(m_resumed[~m_resumed["resumed"]]["shard"])
    assert rewritten == set(victims)
    for f, t in survivor_mtimes.items():  # untouched shards not rewritten
        assert os.path.getmtime(os.path.join(out3, f)) == t
    assert m_resumed["sha256"].tolist() == manifest["sha256"].tolist()
    # full corpus present after resume
    assert len(read_shards(out3)) == int(manifest["n_samples"].sum())


def test_shard_assignment_matches_duckdb(source_df):
    import duckdb

    ids = source_df["image_id"].tolist()
    ours = dict(zip(ids, shard_of_ids(ids, N_SHARDS).tolist()))
    df = source_df[["image_id"]]  # noqa: F841 (duckdb scans locals by name)
    rows = duckdb.sql(
        f"SELECT image_id, md5_number_lower(image_id) % {N_SHARDS} AS s FROM df"
    ).fetchall()
    assert {r[0]: int(r[1]) for r in rows} == ours


def test_resume_refuses_n_shards_change(export_dir, ray_session, tmp_path):
    out4 = str(tmp_path / "widthchange")
    image_shard_export(None, out4, n_shards=N_SHARDS)
    # md5 placement is a function of n_shards: resuming into the same
    # out_dir with a different width must refuse, not silently
    # drop/duplicate samples (ADVICE r3)
    with pytest.raises(ValueError, match="n_shards"):
        image_shard_export(None, out4, n_shards=N_SHARDS + 1)
    # resume=False ignores stale markers entirely
    image_shard_export(None, out4, n_shards=N_SHARDS + 1, resume=False)

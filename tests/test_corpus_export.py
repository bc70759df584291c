"""Text-corpus curation + shard export (ops/curate.py).

Oracle strategy: the survivor set is cross-checked against the
already-driver-validated corpus_clean DuckDB oracle minus the MinHash
near-dup drop set (itself pair-oracled elsewhere); the export is a
FILE sink, so its gate is round-trip equality + manifest determinism
+ resume semantics, mirroring tests/test_export.py."""

import json
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod
from forum_dl_ray.ops.curate import (
    corpus_curated_export,
    neardup_drop_set,
    read_corpus_shards,
)

SF_DIR = "/root/testdata/sf0.001"
N_SHARDS = 6


@pytest.fixture(scope="module")
def export_dir(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("corpus") / "shards")
    manifest = corpus_curated_export(SF_DIR, out, n_shards=N_SHARDS)
    return out, manifest


@pytest.fixture(scope="module")
def expected_ids(ray_session):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM read_parquet('{SF_DIR}/documents.parquet')")
    clean = {r[0] for r in con.sql(
        f"SELECT doc_id FROM ({entrymod.oracle_sql()['corpus_clean']})"
    ).fetchall()}
    assert clean, "sf0.001 corpus_clean must be non-empty"
    return clean - neardup_drop_set(SF_DIR)


def test_survivors_match_oracle(export_dir, expected_ids):
    out, manifest = export_dir
    back = read_corpus_shards(out)
    assert set(back["doc_id"]) == expected_ids
    assert int(manifest["n_docs"].sum()) == len(expected_ids)
    # texts are the source texts, verbatim
    src = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).df().set_index("doc_id")["text"]
    sample = back.head(50)
    assert all(src.loc[r.doc_id] == r.text for r in sample.itertuples(index=False))


def test_pack_invariants(export_dir):
    """pack_sequences' rule inside every shard: docs never split, pack
    token totals never exceed the budget except a single over-budget
    doc, pack_pos consecutive from 0 in doc_id order."""
    out, manifest = export_dir
    back = read_corpus_shards(out)
    assert (back["n_tokens"] == back["text"].str.count(r"\S+")).all()
    n_packs_seen = 0
    for pack_id, g in back.groupby("pack_id"):
        g = g.sort_values("doc_id")
        assert g["pack_pos"].tolist() == list(range(len(g)))
        if len(g) > 1:
            assert g["n_tokens"].sum() <= 512
        n_packs_seen += 1
    assert n_packs_seen == int(manifest["n_packs"].sum())
    # pack ids are globally unique across shards by construction
    assert (back["pack_id"] // (1 << 20)).isin(manifest["shard"]).all()


def test_manifest_deterministic(export_dir, ray_session, tmp_path):
    out, manifest = export_dir
    out2 = str(tmp_path / "again")
    m2 = corpus_curated_export(SF_DIR, out2, n_shards=N_SHARDS)
    assert manifest["sha256"].tolist() == m2["sha256"].tolist()
    assert manifest["n_docs"].tolist() == m2["n_docs"].tolist()


def test_decontamination_stage(ray_session, tmp_path, expected_ids):
    from forum_dl_ray.ops.dedup import decontaminate_hits

    hits = decontaminate_hits(SF_DIR)
    contaminated = set(hits.loc[hits["n_hit"] >= 1, "doc_id"].astype(int))
    assert contaminated, "fixture must exercise the decontamination path"
    out = str(tmp_path / "decon")
    m = corpus_curated_export(SF_DIR, out, n_shards=N_SHARDS,
                              decontaminate_min_hits=1)
    back = read_corpus_shards(out)
    assert set(back["doc_id"]) == expected_ids - contaminated
    assert int(m["n_docs"].sum()) == len(expected_ids - contaminated)


def test_resume_skips_finished(export_dir, ray_session, tmp_path):
    out, manifest = export_dir
    out3 = str(tmp_path / "resume")
    m1 = corpus_curated_export(SF_DIR, out3, n_shards=N_SHARDS)
    victim = int(sorted(m1["shard"])[0])
    os.remove(os.path.join(out3, f"shard-{victim:05d}.parquet"))
    os.remove(os.path.join(out3, f"shard-{victim:05d}.json"))
    mtimes = {f: os.path.getmtime(os.path.join(out3, f))
              for f in os.listdir(out3) if f.endswith(".parquet")}
    m2 = corpus_curated_export(SF_DIR, out3, n_shards=N_SHARDS)
    rewritten = set(m2[~m2["resumed"]]["shard"])
    assert rewritten == {victim}
    for f, t in mtimes.items():
        assert os.path.getmtime(os.path.join(out3, f)) == t
    assert m2["sha256"].tolist() == manifest["sha256"].tolist()
    # markers agree with the manifest
    for row in m2.itertuples(index=False):
        with open(os.path.join(out3, f"shard-{row.shard:05d}.json")) as f:
            m = json.load(f)
        assert (m["n_docs"], m["sha256"]) == (row.n_docs, row.sha256)


def test_resume_refuses_n_shards_change(export_dir, ray_session, tmp_path):
    out = str(tmp_path / "widthchange")
    corpus_curated_export(SF_DIR, out, n_shards=N_SHARDS)
    # md5 placement is a function of n_shards — a resumed run under a
    # different width must refuse (ADVICE r3), not silently mix
    with pytest.raises(ValueError, match="n_shards"):
        corpus_curated_export(SF_DIR, out, n_shards=N_SHARDS + 1)
    corpus_curated_export(SF_DIR, out, n_shards=N_SHARDS + 1, resume=False)

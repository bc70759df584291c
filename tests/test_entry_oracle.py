"""Driver-style correctness gate: run each queries() entry and compare
against its oracle_sql() DuckDB result (row count + schema + values),
mimicking CORRECTNESS_r{N}.json before the driver does."""

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLED = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(ray_session, con, name):
    ours = _normalize(_to_df(entrymod.queries()[name](SF_DIR)))
    theirs = _normalize(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(ours.columns) == list(theirs.columns), (ours.columns, theirs.columns)
    assert len(ours) == len(theirs)
    for c in ours.columns:
        # the driver's value hash is dtype-sensitive: DuckDB sum() yields
        # HUGEINT -> float64 in pandas unless the SQL CASTs it back; catch
        # any representation drift here, not in CORRECTNESS_r{N}.json
        assert ours[c].dtype == theirs[c].dtype, (
            f"{name}.{c} dtype drift: ray={ours[c].dtype} oracle={theirs[c].dtype}"
        )
    for c in ours.columns:
        a, b = ours[c].tolist(), theirs[c].tolist()
        if ours[c].dtype.kind == "f":
            assert all(
                (math.isnan(x) and math.isnan(y)) or x == y for x, y in zip(a, b)
            ), f"{name}.{c} float mismatch"
        else:
            assert a == b, f"{name}.{c} mismatch"


def test_entry_runs(ray_session):
    ds = entrymod.entry()
    df = ds.to_pandas()
    assert len(df) == 500
    assert {"doc_id", "lang_pred", "cluster_id", "is_exact_keeper", "fingerprint"} <= set(df.columns)


def test_rows_only_queries_run(ray_session):
    qs = entrymod.queries()
    rows_only = set(qs) - set(entrymod.oracle_sql())
    assert rows_only, "expected some non-SQL-expressible queries"
    for name in sorted(rows_only):
        df = _to_df(qs[name](SF_DIR))
        assert df is not None and len(df.columns) > 0, name


def test_ivf_recall_vs_brute(ray_session, tmp_path):
    from forum_dl_ray.ops import similarity

    idx = str(tmp_path / "ivf_idx")
    brute = similarity.brute_topk(SF_DIR, [0, 1, 2], k=10)
    ivf = similarity.ivf_topk(SF_DIR, [0, 1, 2], k=10, n_clusters=8, nprobe=4,
                              index_dir=idx)
    recalls = []
    for q in [0, 1, 2]:
        b = set(brute.loc[brute["query_id"] == q, "vec_id"])
        i = set(ivf.loc[ivf["query_id"] == q, "vec_id"])
        recalls.append(len(b & i) / len(b))
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_ivf_index_persisted_and_query_scans_probed_buckets_only(
        ray_session, tmp_path):
    """r3 verdict Next #1 'done' criteria: the index is a persisted
    bucket-partitioned layout, reused across query sets, and the query
    path reads ≤ (nprobe/n_clusters + imbalance slack) of the corpus."""
    import pyarrow.parquet as pq

    from forum_dl_ray.ops import similarity

    idx = str(tmp_path / "ivf_idx2")
    n_clusters, nprobe = 16, 4
    built = similarity.ivf_build(SF_DIR, idx, n_clusters=n_clusters)
    assert built == idx and os.path.exists(os.path.join(idx, "_DONE"))
    per_bucket = similarity.ivf_bucket_rows(idx)
    total = sum(per_bucket.values())
    emb_rows = pq.read_metadata(
        os.path.join(SF_DIR, "embeddings.parquet")).num_rows
    assert total == emb_rows  # every corpus row lives in exactly one bucket

    # rebuild request on an unchanged corpus must REUSE (content digest)
    marker = os.path.join(idx, "meta.json")
    mtime = os.path.getmtime(marker)
    similarity.ivf_build(SF_DIR, idx, n_clusters=n_clusters)
    assert os.path.getmtime(marker) == mtime

    # query-path scan fraction: union of probed buckets across queries
    cent = __import__("numpy").load(os.path.join(idx, "centroids.npy"))
    q_ids, q_mat = similarity._query_matrix(SF_DIR, [0, 1, 2])
    import numpy as np

    probe = np.argsort(-(q_mat @ cent.T), axis=1)[:, :nprobe]
    probed_rows = sum(per_bucket.get(int(b), 0) for b in set(probe.ravel()))
    frac = probed_rows / total
    # 3 queries × nprobe/n_clusters with generous bucket-imbalance
    # slack; the point is it is FAR below a full scan
    assert frac <= 0.75, frac
    # and the served result only reads those directories: the probed
    # reader skips every non-probed bucket
    ds = similarity._read_probed_buckets(idx, probe.ravel().tolist())
    assert ds.count() == probed_rows


def test_ivf_compact_files_and_atomic_publish(ray_session, tmp_path):
    """r4 verdict Next #10 + advice #3: compact_files co-locates each
    bucket into one file; builds publish via temp-dir + rename, so a
    completed index is never deleted while readable and stale partial
    build dirs never shadow the real one."""
    import shutil

    from forum_dl_ray.ops import similarity

    idx = str(tmp_path / "ivf_compact")
    similarity.ivf_build(SF_DIR, idx, n_clusters=8, compact_files=True)
    for name in os.listdir(idx):
        if name.startswith("bucket="):
            files = [f for f in os.listdir(os.path.join(idx, name))
                     if f.endswith(".parquet")]
            assert len(files) == 1, (name, files)
    # compact layout serves the same answers as the default layout
    a = similarity.ivf_topk(SF_DIR, [0, 1], k=5, n_clusters=8, nprobe=8,
                            index_dir=idx)
    b = similarity.ivf_topk(SF_DIR, [0, 1], k=5, n_clusters=8, nprobe=8,
                            index_dir=str(tmp_path / "ivf_default"))
    assert a.to_dict() == b.to_dict()
    # and the query SERVED the compact index rather than silently
    # rebuilding it in the default layout (the digest is
    # layout-independent — r5 review fix): still one file per bucket
    for name in os.listdir(idx):
        if name.startswith("bucket="):
            files = [f for f in os.listdir(os.path.join(idx, name))
                     if f.endswith(".parquet")]
            assert len(files) == 1, (name, files)

    # atomic publish: an incomplete leftover dir (no _DONE) is replaced;
    # a COMPLETE one is reused without ever being deleted
    stale = str(tmp_path / "ivf_stale")
    os.makedirs(stale)
    open(os.path.join(stale, "junk.parquet"), "w").write("not parquet")
    similarity.ivf_build(SF_DIR, stale, n_clusters=8)
    assert os.path.exists(os.path.join(stale, "_DONE"))
    assert not os.path.exists(os.path.join(stale, "junk.parquet"))
    ino = os.stat(stale).st_ino
    similarity.ivf_build(SF_DIR, stale, n_clusters=8)  # reuse, no rebuild
    assert os.stat(stale).st_ino == ino
    # no orphaned .build-* temp dirs remain
    parent = os.path.dirname(stale)
    assert not [n for n in os.listdir(parent) if ".build-" in n]

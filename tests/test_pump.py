"""Distributed-pump crawler parity (the multi-node pump scale path).

The MultiPumpCrawler must reproduce the wave crawler's outputs exactly:
order keys are enqueue-derived, so which pump fetched a page cannot
change the reconstructed order, seen set, or content.
"""

import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forum_dl_ray.crawl import CrawlConfig
from forum_dl_ray.crawl.crawler import images_dataset, ordered_items
from forum_dl_ray.crawl.pump import MultiPumpCrawler
from forum_dl_ray.fixtures import generate_fixture, micro_spec
from forum_dl_ray.fixtures.synth import mixed_spec
from forum_dl_ray.fixtures.golden import simulate_fixture_dir

ITEM_COLS = ["type", "path", "subpath", "url", "origin", "title", "author",
             "creation_time", "content", "content_type", "order_key"]


@pytest.fixture(scope="module")
def micro_dir():
    return generate_fixture(micro_spec())


@pytest.fixture(scope="module")
def micro_golden(micro_dir):
    return simulate_fixture_dir(micro_dir)


@pytest.fixture(scope="module")
def pump_out(ray_session, micro_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out") / "pump")
    stats = MultiPumpCrawler(
        micro_dir, out, CrawlConfig(num_shards=4, min_rows_per_task=64),
        n_pumps=2,
    ).run()
    return out, stats


def test_pump_parity_micro(pump_out, micro_golden):
    out, stats = pump_out
    assert stats["pumps"] == 2 and stats["urls_fetched"] > 0
    df = ordered_items(out).to_pandas()
    assert len(df) == len(micro_golden.entries)
    for col in ITEM_COLS:
        want = [e[col] for e in micro_golden.entries]
        have = df[col].tolist()
        if col == "creation_time":
            import pandas as pd

            have = [None if pd.isna(v) else v.to_pydatetime() for v in df[col]]
        assert have == want, f"column {col} diverges"
    seen = pq.read_table(os.path.join(out, "seen.parquet")).to_pylist()
    assert {r["url"]: r["failed"] for r in seen} == micro_golden.seen


def test_pump_images_payload(pump_out, micro_golden):
    out, _ = pump_out
    imgs = images_dataset(out).to_pandas()
    want = {g["image_id"] for g in micro_golden.images}
    assert set(imgs["image_id"]) == want


def test_pump_resume_equals_uninterrupted(ray_session, micro_dir, micro_golden,
                                          tmp_path):
    """Interrupt mid-crawl after a checkpoint (tick budget as the
    "kill"), resume from it, final outputs identical to the golden
    walker — the wave crawler's resume gate, on the pump path."""
    out = str(tmp_path / "pump_resumed")
    cfg_stop = CrawlConfig(num_shards=4, min_rows_per_task=64,
                           checkpoint_every=1, max_waves=2)
    stats1 = MultiPumpCrawler(micro_dir, out, cfg_stop, n_pumps=2).run()
    assert os.path.exists(os.path.join(out, "checkpoints", "LATEST_PUMP"))
    # genuinely mid-crawl: the interrupted run must not have finished
    assert stats1["urls_fetched"] < len(micro_golden.seen)
    cfg_go = CrawlConfig(num_shards=4, min_rows_per_task=64,
                         checkpoint_every=3)
    MultiPumpCrawler(micro_dir, out, cfg_go, n_pumps=2).run(resume=True)
    df = ordered_items(out).to_pandas()
    assert df["order_key"].tolist() == [e["order_key"] for e in micro_golden.entries]
    assert df["content"].tolist() == [e["content"] for e in micro_golden.entries]
    assert df["title"].tolist() == [e["title"] for e in micro_golden.entries]
    seen = pq.read_table(os.path.join(out, "seen.parquet")).to_pylist()
    assert {r["url"]: r["failed"] for r in seen} == micro_golden.seen
    imgs = images_dataset(out).to_pandas()
    assert set(imgs["image_id"]) == {g["image_id"] for g in micro_golden.images}


def test_pump_parity_mixed_engines(ray_session, tmp_path):
    """All four engine cursor styles through the distributed pumps."""
    fx = generate_fixture(mixed_spec())
    golden = simulate_fixture_dir(fx)
    out = str(tmp_path / "pump_mixed")
    MultiPumpCrawler(fx, out, CrawlConfig(num_shards=4), n_pumps=3).run()
    df = ordered_items(out).to_pandas()
    assert df["order_key"].tolist() == [e["order_key"] for e in golden.entries]
    assert df["content"].tolist() == [e["content"] for e in golden.entries]
    seen = pq.read_table(os.path.join(out, "seen.parquet")).to_pylist()
    assert {r["url"]: r["failed"] for r in seen} == golden.seen


def test_fresh_run_clears_stale_checkpoints(ray_session, micro_dir, tmp_path):
    """A fresh (resume=False) pump run must clear ckpt_dir (ADVICE r3):
    a previous run's LATEST_PUMP surviving into a new run would let a
    later resume restore a stale frontier and prune the NEW run's part
    files against stale watermarks."""
    out = str(tmp_path / "pump_stale")
    cfg_ckpt = CrawlConfig(num_shards=4, min_rows_per_task=64,
                           checkpoint_every=1, max_waves=2)
    MultiPumpCrawler(micro_dir, out, cfg_ckpt, n_pumps=2).run()
    latest = os.path.join(out, "checkpoints", "LATEST_PUMP")
    assert os.path.exists(latest)
    # fresh run with checkpointing OFF: stale snapshots must be gone
    cfg_nockpt = CrawlConfig(num_shards=4, min_rows_per_task=64,
                             checkpoint_every=0)
    MultiPumpCrawler(micro_dir, out, cfg_nockpt, n_pumps=2).run()
    assert not os.path.exists(latest)
    with pytest.raises(FileNotFoundError):
        MultiPumpCrawler(micro_dir, out, cfg_nockpt, n_pumps=2).run(resume=True)


def test_pump_resume_mid_boundary_kill(ray_session, micro_dir, micro_golden,
                                       tmp_path):
    """Burst-budget arithmetic: checkpoint_every=2 with max_waves=3
    makes the coordinator run burst budgets {2, 1} (a burst may never
    cross the checkpoint boundary or the kill budget), so the kill
    lands BETWEEN checkpoints — resume must restore the tick-2
    snapshot, prune part files above its watermarks, and still
    converge to the golden walk."""
    out = str(tmp_path / "pump_midkill")
    cfg_stop = CrawlConfig(num_shards=4, min_rows_per_task=64,
                           checkpoint_every=2, max_waves=3)
    stats1 = MultiPumpCrawler(micro_dir, out, cfg_stop, n_pumps=2).run()
    ckpt_root = os.path.join(out, "checkpoints")
    assert os.path.exists(os.path.join(ckpt_root, "LATEST_PUMP"))
    latest = int(open(os.path.join(ckpt_root, "LATEST_PUMP")).read())
    assert latest == 2  # exactly one checkpoint before the tick-3 kill
    assert stats1["urls_fetched"] < len(micro_golden.seen)
    MultiPumpCrawler(micro_dir, out,
                     CrawlConfig(num_shards=4, min_rows_per_task=64),
                     n_pumps=2).run(resume=True)
    df = ordered_items(out).to_pandas()
    assert df["order_key"].tolist() == [e["order_key"]
                                        for e in micro_golden.entries]
    assert df["content"].tolist() == [e["content"]
                                      for e in micro_golden.entries]
    seen = pq.read_table(os.path.join(out, "seen.parquet")).to_pylist()
    assert {r["url"]: r["failed"] for r in seen} == micro_golden.seen

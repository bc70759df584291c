"""Print Ray Data stage stats for Dataset-returning queries.

Usage (from a cwd OUTSIDE the repo — worker-import gotcha, CLAUDE.md):

    cd /tmp && python /root/repo/scripts/profile_query.py \
        quality_filter corpus_clean [sf_dir]

For each named `queries()` entry that returns a ray.data.Dataset, the
pipeline is executed once and `ds.stats()` is printed — per-operator
wall time, block counts and sizes — the feedback loop for checking a
stage's wall time is dominated by useful compute (ray_guide.md).
Pandas/Arrow-returning queries are timed only (their Ray stages
already ended inside the call)."""

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.01"
    names = []
    for a in args:
        if a.startswith("/"):
            sf_dir = a
        else:
            names.append(a)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as em

    qs = em.queries()
    if not names:
        names = sorted(qs)
    for name in names:
        t0 = time.perf_counter()
        res = qs[name](sf_dir)
        if isinstance(res, rd.Dataset):
            res = res.materialize()
            print(f"\n=== {name} ({time.perf_counter() - t0:.2f}s, "
                  f"{res.count()} rows) ===")
            print(res.stats())
        else:
            n = len(res) if hasattr(res, "__len__") else "?"
            print(f"\n=== {name} ({time.perf_counter() - t0:.2f}s, {n} rows; "
                  f"non-Dataset result — stages completed internally) ===")
    ray.shutdown()


if __name__ == "__main__":
    main()

"""Shared shard-marker protocol for the three resumable sharded sinks
(ops/export.py tars, ops/curate.py parquet shards, sinks/warc.py
warc.gz shards).

One implementation of the resume semantics the three sinks had each
hand-rolled — and drifted on (r5 review): only warc closed out
md5-empty shards (so the other two could never early-exit a fully
finished export) and none cleared stale outputs on a fresh
``resume=False`` re-export into a dir written under a DIFFERENT
n_shards, leaving old shards that consumers glob up as duplicated
samples.

Protocol:
- a shard is DONE iff ``shard-NNNNN.json`` exists AND the matching
  data file ``shard-NNNNN<suffix>`` exists;
- every marker records ``n_shards``; reading a marker written under a
  different width raises (md5 placement is a function of n_shards);
- markers and data files land atomically (``.tmp`` + rename);
- shards whose md5 placement receives no rows are closed out with an
  EMPTY data file + marker so ``len(done) == n_shards`` is a reliable
  fully-finished test and the manifest covers every shard.
"""

from __future__ import annotations

import json
import os
from typing import Callable


def marker_path(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, f"shard-{shard:05d}.json")


def data_path(out_dir: str, shard: int, suffix: str) -> str:
    return os.path.join(out_dir, f"shard-{shard:05d}{suffix}")


def read_done(out_dir: str, n_shards: int | None, suffix: str) -> dict[int, dict]:
    """Finished-shard manifests keyed by shard id; raises when any
    marker was written under a different ``n_shards``."""
    done: dict[int, dict] = {}
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if name.startswith("shard-") and name.endswith(".json"):
            with open(os.path.join(out_dir, name)) as f:
                m = json.load(f)
            if (n_shards is not None and "n_shards" in m
                    and m["n_shards"] != n_shards):
                raise ValueError(
                    f"{out_dir}/{name} was written with n_shards="
                    f"{m['n_shards']} but this run uses {n_shards} — "
                    "md5 placement differs; export to a fresh out_dir")
            if os.path.exists(data_path(out_dir, m["shard"], suffix)):
                done[m["shard"]] = m
    return done


def write_marker(out_dir: str, shard: int, manifest: dict,
                 n_shards: int) -> None:
    p = marker_path(out_dir, shard)
    with open(p + ".tmp", "w") as f:
        json.dump({**manifest, "n_shards": n_shards}, f)
    os.replace(p + ".tmp", p)


def clear_stale(out_dir: str, suffix: str) -> None:
    """Fresh (resume=False) run: remove every prior shard data file
    and marker so outputs placed under a different n_shards cannot
    survive next to the new shards (consumers glob shard-*)."""
    if not os.path.isdir(out_dir):
        return
    for name in os.listdir(out_dir):
        if name.startswith("shard-") and (
                name.endswith(".json") or name.endswith(suffix)
                or name.endswith(".tmp")):
            os.remove(os.path.join(out_dir, name))


def closeout_empty(out_dir: str, n_shards: int, covered: set[int],
                   suffix: str, make_empty: Callable[[str], None],
                   zero_manifest: Callable[[int], dict]) -> list[dict]:
    """Write an empty data file + marker for every shard id the run
    produced no rows for. Returns the zero manifests (so the caller's
    manifest covers ALL shards)."""
    out = []
    for s in range(n_shards):
        if s in covered:
            continue
        dp = data_path(out_dir, s, suffix)
        make_empty(dp + ".tmp")
        os.replace(dp + ".tmp", dp)
        m = zero_manifest(s)
        write_marker(out_dir, s, m, n_shards)
        out.append(m)
    return out

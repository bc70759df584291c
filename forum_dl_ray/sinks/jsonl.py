"""JSONL Datasink (SURVEY.md S6).

The reference writes one JSON entry per line to a single file or
stdout (/root/reference/forum_dl/writers/common.py:213-285). A single
file does not scale or resume; this Datasink writes one
``part-{task_idx:05d}.jsonl`` per write task (deterministic names →
a retried task overwrites its own file, idempotent) and a ``_DONE``
marker on commit, matching the partitioned-output convention of the
crawler's parquet sinks.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Iterable

import pyarrow as pa

from ray.data import Datasink
from ray.data.block import Block


class JsonlDatasink(Datasink):
    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def on_write_start(self) -> None:
        shutil.rmtree(self.out_dir, ignore_errors=True)
        os.makedirs(self.out_dir, exist_ok=True)

    def write(self, blocks: Iterable[Block], ctx: Any) -> Any:
        path = os.path.join(self.out_dir, f"part-{ctx.task_idx:05d}.jsonl")
        n = 0
        with open(path, "w", encoding="utf-8") as f:
            for block in blocks:
                if isinstance(block, pa.Table):
                    lines = block["line"].to_pylist()
                else:  # pandas
                    lines = list(block["line"])
                for ln in lines:
                    f.write(ln)
                    f.write("\n")
                n += len(lines)
        return n

    def on_write_complete(self, write_result) -> None:
        with open(os.path.join(self.out_dir, "_DONE"), "w") as f:
            f.write("ok")


def write_entries_jsonl(
    entries_ds, out_dir: str, *, extractor: str, download_time: str
) -> None:
    """Entry table → ordered JSONL partition set. Lines carry the
    emission order key; ``sort('order_key')`` before writing makes the
    concatenated partition files reproduce the reference's sequential
    output order (order parity surface A2)."""
    import functools

    from forum_dl_ray import STAGE_RUNTIME_ENV as _RENV

    from .envelope import entry_envelope, to_jsonl_lines

    ds = entries_ds.map_batches(
        functools.partial(
            entry_envelope, extractor=extractor, download_time=download_time
        ),
        batch_format="pyarrow",
        batch_size=4096,
        runtime_env=_RENV,
    ).map_batches(
        to_jsonl_lines, batch_format="pyarrow", batch_size=4096, runtime_env=_RENV
    )
    ds = ds.sort("order_key")
    ds.write_datasink(
        JsonlDatasink(out_dir), ray_remote_args={"runtime_env": _RENV}
    )

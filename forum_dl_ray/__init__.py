"""forum_dl_ray — a from-scratch Ray-Data-native crawl engine.

A brand-new URL-frontier + fetch scheduler with the query and
data-processing capabilities of the reference (mikwielgus/forum-dl,
read-only at /root/reference), re-expressed Ray-Data-first:

- ``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy
  Arrow batches (fetch + parse stages),
- a pool of stateful frontier actors holding the sharded URL-seen set
  (bloom pre-check + cuckoo filter + exact side-set at test scale),
  per-host politeness token buckets, robots rules and the priority
  heap ordered by (depth, recency, host budget),
- payload tables of ``(image_id, bytes, w, h, fmt, caption, phash)``
  rows written as partitioned Parquet (Lance gated behind import-try —
  not present in this container),
- training-data-scale ops (dedup, similarity search, text analysis)
  over the driver-provided parquet tables.

Nothing here calls ``ray.init()``/``ray.shutdown()`` — session
ownership belongs to the caller (driver, bench.py, test fixture).
"""

__version__ = "0.2.0"

import os as _os

# Ray workers resolve this package via the DRIVER's cwd in local mode;
# when the driver runs from elsewhere (the driver harness, bench
# subprocesses), any stage whose function/class references package
# code must pin PYTHONPATH so its workers can import us. Every
# map_batches / actor in this repo passes STAGE_RUNTIME_ENV. (Pickling
# the modules by value instead is tempting but wrong: each task then
# deserializes a fresh copy of the module globals, which breaks
# process-global caches like the fetch-stage page store and re-ships
# module code on every task.)
REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
STAGE_RUNTIME_ENV = {"env_vars": {"PYTHONPATH": REPO_ROOT}}


def _shim_fsspec_http() -> None:
    """Make ``fsspec.implementations.http`` importable deterministically.

    This container has fsspec but no aiohttp, so that import fails —
    and because a FAILED import is retried on every attempt, concurrent
    Dataset writes (our overlapped crawl waves) race inside Python's
    import machinery: the losing thread sees a partially-initialized
    module and gets a plain ImportError, which Ray's
    ``_is_http_filesystem`` (ray/data/datasource/path_util.py) does NOT
    catch (it only catches ModuleNotFoundError). Installing a sentinel
    module with an HTTPFileSystem class nothing ever instantiates makes
    the import succeed once and stay cached — no more race.
    """
    import sys
    import types

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except ImportError:
        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # sentinel only; aiohttp absent
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


_shim_fsspec_http()

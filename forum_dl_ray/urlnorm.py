"""URL canonicalization + 64-bit hashing.

Reproduces the reference's canonicalization semantics
(/root/reference/forum_dl/extractors/common.py:35-62 ``normalize_url``
and :22-32 ``get_relative_url``) as scalar kernels usable inside
``map_batches``, and adds the 64-bit canonical-URL hash that feeds the
sharded frontier (SURVEY.md M1 / S4): shard = hash64(canonical) %
num_shards, host affinity = hash64(host) % num_shards.

The hash is BLAKE2b-8byte — stable across runs, processes and machines
(unlike Python's ``hash``), cheap enough at batch granularity, and with
a 64-bit space the 10^10-URL frontier sees ~0.3% collision probability
overall, which the exact per-shard side-set (test scale) and cuckoo
fingerprints (large scale) are layered over.
"""

from __future__ import annotations

import hashlib
from pathlib import PurePosixPath
from urllib.parse import parse_qs, urlencode, urlparse, urlunparse

import numpy as np
import pyarrow as pa

_DEFAULT_REMOVE_SUFFIXES = ("index.php",)

# inline-payload URL (M22): content decodes from the URL itself, no
# fetch — reference writers/common.py:161-162 `data:(.+/.+);base64,`
import re as _re

DATA_URL_RE = _re.compile(r"data:(.+/.+);base64,(.*)", _re.S)


def normalize_url(
    url: str,
    remove_suffixes: tuple[str, ...] = _DEFAULT_REMOVE_SUFFIXES,
    append_slash: bool = True,
    keep_queries: tuple[str, ...] = (),
) -> str:
    """Canonicalize a URL (parity with reference normalize_url).

    Strips configured path suffixes (e.g. ``index.php``), trailing
    slashes, params and fragment; keeps only whitelisted query keys;
    re-appends a trailing slash when there is no query.

    Deliberate deviation from the reference: ALL trailing slashes are
    stripped (the reference's single ``removesuffix("/")`` makes
    ``normalize`` non-idempotent on ``...///`` paths — found by the
    hypothesis property test — and a non-idempotent canonical key
    splits the frontier seen-set at 10^10-URL scale).
    """
    parsed = urlparse(url)
    new_path = parsed.path.rstrip("/")

    if not keep_queries or not parsed.query:
        for suffix in remove_suffixes:
            new_path = new_path.removesuffix(suffix)

    new_path = new_path.rstrip("/")

    query = parse_qs(parsed.query)
    new_query = {key: query[key] for key in keep_queries if key in query}

    new_parsed = parsed._replace(
        path=new_path, params="", query=urlencode(new_query, doseq=True), fragment=""
    )
    new_url = urlunparse(new_parsed)

    if append_slash and not new_parsed.query:
        return f"{new_url}/"
    return str(new_url)


def join_canon(href: str, base_url: str, keep_queries: tuple[str, ...] = ()) -> str:
    """``normalize_url(urljoin(base_url, href), keep_queries=...)`` with
    a fast path for the overwhelmingly common case (root-relative href,
    no query/fragment) — the parse stage canonicalizes every discovered
    link, and urlparse dominates its profile otherwise. MUST return the
    exact same string as the slow path (tested property)."""
    if href.startswith("/") and not href.startswith("//"):
        p = base_url.find("/", base_url.find("://") + 3)
        full = (base_url[:p] if p > 0 else base_url) + href
    elif "://" in href[:10]:
        full = href
    else:
        from urllib.parse import urljoin

        return normalize_url(urljoin(base_url, href), keep_queries=keep_queries)
    if "?" not in full and "#" not in full and ";" not in full:
        t = full
        if t.endswith("/"):
            t = t[:-1]
        for suffix in _DEFAULT_REMOVE_SUFFIXES:
            if t.endswith(suffix):
                t = t[: -len(suffix)]
        if t.endswith("/"):
            t = t[:-1]
        return t + "/"
    return normalize_url(full, keep_queries=keep_queries)


def get_relative_url(url: str, base_url: str) -> str:
    """Path of ``url`` relative to ``base_url``'s path.

    Raises ``ValueError`` when ``url`` is not under ``base_url`` — the
    reference uses that raise as its same-site filter
    (common.py:22-32); callers turn it into a filter predicate.
    """
    base_path = PurePosixPath(urlparse(base_url).path)
    path = PurePosixPath(urlparse(url).path)
    if str(base_path) == ".":
        return str(path)
    return str(path.relative_to(base_path))


def is_same_site(url: str, base_url: str) -> bool:
    """Crawl-scope predicate (M2): same host AND path under the base's
    path. The reference expresses this as `get_relative_url` raising
    ValueError (common.py:22-32); this wraps that raise into the filter
    predicate the frontier applies to offers."""
    if host_of(url) != host_of(base_url):
        return False
    try:
        get_relative_url(url, base_url)
        return True
    except ValueError:
        return False


def host_of(url: str) -> str:
    """netloc of a URL (string fast path; runs per frontier offer)."""
    i = url.find("://")
    if i < 0:
        return urlparse(url).netloc
    rest = url[i + 3 :]
    for stop in ("/", "?", "#"):
        j = rest.find(stop)
        if j >= 0:
            rest = rest[:j]
    return rest


def url_hash64(url: str) -> int:
    """Stable signed 64-bit hash of one canonical URL (blake2b-8).

    This is THE frontier hash: shard routing, seen-set membership and
    golden seen-set files all key on it. blake2b is stable across
    runs, processes, machines and library versions — required because
    goldens and frontier checkpoints persist these hashes.
    """
    digest = hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(digest, "little", signed=True)


def url_hash64_array(urls: pa.Array | pa.ChunkedArray | list[str]) -> np.ndarray:
    """Batch form of :func:`url_hash64` (same function, same values).

    Per-row blake2b over the batch (~1M short URLs/s/core) — the
    frontier RPC and fetch dominate wall-time, and hash *stability*
    across processes/versions outranks SIMD speed here because the
    hashes are persisted in checkpoints and goldens.
    """
    if isinstance(urls, (pa.Array, pa.ChunkedArray)):
        urls = urls.to_pylist()
    out = np.empty(len(urls), dtype=np.int64)
    blake2b = hashlib.blake2b
    for i, u in enumerate(urls):
        out[i] = int.from_bytes(
            blake2b(u.encode("utf-8"), digest_size=8).digest(), "little", signed=True
        )
    return out

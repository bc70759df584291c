"""Driver-surface pins.

CORRECTNESS_r02 proved the driver's harness runs AT MOST the first 50
entries of ``queries()`` (round 2 exposed 53; exactly the last three
were silently absent from the record). These tests make it impossible
to silently shrink the surface again: the dict must hold exactly 50
entries, every oracle key must resolve, and the crawl/sink queries —
the ones that fell off in round 2 — must sit safely inside the cap.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

DRIVER_QUERY_CAP = 50  # measured: len(CORRECTNESS_r02.json)

MUST_RUN = [
    "crawl_entries_ordered",
    "crawl_seen_set",
    "crawl_images_payload",
    "jsonl_entry_lines",
    "mail_messages",
    "crawl_oracle_hashes",
]


def test_query_surface_fits_driver_cap():
    qs = entrymod.queries()
    assert len(qs) == DRIVER_QUERY_CAP, (
        f"{len(qs)} queries: the driver records only the first "
        f"{DRIVER_QUERY_CAP} — merge entries instead of exceeding the cap"
    )


def test_oracles_reference_existing_queries():
    qs = set(entrymod.queries())
    orphans = set(entrymod.oracle_sql()) - qs
    assert not orphans, f"oracle_sql keys without a queries() entry: {orphans}"


def test_crawl_and_sink_queries_inside_cap():
    names = list(entrymod.queries())
    for name in MUST_RUN:
        assert name in names, name
        # leave headroom: even a cap shrunk to 45 keeps these running
        assert names.index(name) < 45, (name, names.index(name))


def test_round2_query_names_still_covered():
    """Every round-2 query name either survives verbatim or was merged
    into a documented successor — no operator silently lost."""
    merged = {
        "fingerprints": "doc_signatures",
        "simhashes": "doc_signatures",
        "image_caption_sim": "image_embeddings",
        "audio_windows": "audio_decode_stats",
    }
    import json

    r02 = json.load(open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "CORRECTNESS_r02.json")))
    qs = set(entrymod.queries())
    for name in r02:
        assert name in qs or merged.get(name) in qs, name

"""Free-text date kernel (M17 — deterministic dateparser-equivalent;
reference feeds dateparser at phpbb.py:465, simplemachines.py:434,
hyperkitty.py:270, pipermail.py:344)."""

import os
import sys
from datetime import datetime

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forum_dl_ray.engines.dates import parse_freeform

CASES = [
    # ISO 8601
    ("2024-01-02T10:03:04", "2024-01-02T10:03:04"),
    ("2024-01-02 10:03", "2024-01-02T10:03:00"),
    ("2024-01-02", "2024-01-02T00:00:00"),
    ("2024-01-02T10:03:04Z", "2024-01-02T10:03:04"),
    ("2024-01-02T12:03:04+02:00", "2024-01-02T10:03:04"),
    ("2024-01-02T08:03:04-0200", "2024-01-02T10:03:04"),
    # epoch
    ("1704189784", "2024-01-02T10:03:04"),
    ("1704189784000", "2024-01-02T10:03:04"),
    # RFC 2822 (mail Date headers)
    ("Tue, 2 Jan 2024 10:03:04 +0000", "2024-01-02T10:03:04"),
    ("Tue, 2 Jan 2024 12:03:04 +0200", "2024-01-02T10:03:04"),
    ("2 Jan 2024 10:03:04 GMT", "2024-01-02T10:03:04"),
    # ctime
    ("Tue Jan  2 10:03:04 2024", "2024-01-02T10:03:04"),
    ("Tue Jan 02 10:03:04 UTC 2024", "2024-01-02T10:03:04"),
    # zone abbreviations carry real offsets (round-2 advice: EST/PST/
    # CET were silently treated as UTC)
    ("Tue, 2 Jan 2024 05:03:04 EST", "2024-01-02T10:03:04"),
    ("Tue Jan  2 02:03:04 PST 2024", "2024-01-02T10:03:04"),
    ("Tue, 2 Jan 2024 11:03:04 CET", "2024-01-02T10:03:04"),
    ("Tue, 2 Jan 2024 10:03:04 XQZ", "2024-01-02T10:03:04"),  # unknown -> UTC
    # month-name first
    ("January 2, 2024, 10:03", "2024-01-02T10:03:00"),
    ("Jan 2, 2024 10:03:04 PM", "2024-01-02T22:03:04"),
    ("January 2nd, 2024 at 10:03 am", "2024-01-02T10:03:00"),
    ("December 02, 2024, 12:03:00 AM", "2024-12-02T00:03:00"),
    ("Sept 5, 2024", "2024-09-05T00:00:00"),
    # weekday-prefixed month-name (phpBB default style, phpbb.py:465-471)
    ("Thu May 04, 2023 12:30 pm", "2023-05-04T12:30:00"),
    ("Saturday, March 10, 2021, 14:05", "2021-03-10T14:05:00"),
    # day-first
    ("2 January 2024, 10:03", "2024-01-02T10:03:00"),
    ("02 Jan 2024", "2024-01-02T00:00:00"),
    ("2nd January 2024 at 22:15", "2024-01-02T22:15:00"),
    # numeric slash (MDY default, like dateparser's en locale)
    ("01/02/2024 10:03", "2024-01-02T10:03:00"),
    ("01/02/2024", "2024-01-02T00:00:00"),
]


@pytest.mark.parametrize("text,expect", CASES)
def test_parse_freeform(text, expect):
    assert parse_freeform(text) == expect


def test_dayfirst_flips_slash():
    assert parse_freeform("02/01/2024", dayfirst=True) == "2024-01-02T00:00:00"


def test_relative_needs_base():
    base = datetime(2024, 1, 3, 18, 0, 0)
    assert parse_freeform("Today at 10:03 AM") is None  # no wall clock
    assert parse_freeform("Today at 10:03 AM", base=base) == "2024-01-03T10:03:00"
    assert parse_freeform("Yesterday at 22:15", base=base) == "2024-01-02T22:15:00"


@pytest.mark.parametrize("bad", [
    "", "not a date", "2024-13-40", "32 January 2024", "Foo 2, 2024",
    "99/99/2024", "25:00", "January 2, 2024, 25:61",
])
def test_rejects_garbage(bad):
    assert parse_freeform(bad) is None


def test_smf_freeform_markup_roundtrip():
    """Every fixture freeform style must round-trip exactly through
    the SMF kernel (the write side in fixtures/synth.py and the read
    side in engines/html_generic.py)."""
    from forum_dl_ray.engines.html_generic import _posts_smf
    from forum_dl_ray.fixtures.synth import _post_markup

    t = "2020-01-01T05:07:00"
    for num in range(4):  # one per style branch
        p = {"pid": f"p{num}", "author": "ann@x", "time": t, "indent": 0,
             "content": "<p>hello</p>"}
        html = _post_markup("smf", p, "freeform")
        got = list(_posts_smf(html))
        assert len(got) == 1
        pid, author, time_iso, indent, content = got[0]
        assert time_iso == t, f"style {num}: {time_iso}"
        assert (pid, author, content) == (f"p{num}", "ann@x", "<p>hello</p>")


@pytest.mark.parametrize("text,expect", [
    # German: ordinal-dot day-first, weekday prefixes, abbrevs
    ("4. Mai 2023", "2023-05-04T00:00:00"),
    ("Donnerstag, 4. Mai 2023 12:30", "2023-05-04T12:30:00"),
    ("15. Dezember 2021, 23:59", "2021-12-15T23:59:00"),
    ("1. März 2024", "2024-03-01T00:00:00"),
    ("3. Okt. 2022 09:15", "2022-10-03T09:15:00"),
    # French: plain day-first, accented + unaccented
    ("4 août 2023", "2023-08-04T00:00:00"),
    ("mardi, 2 janvier 2024 10:03", "2024-01-02T10:03:00"),
    ("28 février 2020 18:45", "2020-02-28T18:45:00"),
    ("28 fevrier 2020", "2020-02-28T00:00:00"),  # mojibake-stripped
    ("5 juil. 2019 07:00", "2019-07-05T07:00:00"),
    # Spanish: "de" connectors, weekday, abbrevs
    ("4 de mayo de 2023", "2023-05-04T00:00:00"),
    ("domingo, 10 de septiembre de 2023 21:05", "2023-09-10T21:05:00"),
    ("10 de setiembre de 2023", "2023-09-10T00:00:00"),
    ("1 dic. 2022 08:30", "2022-12-01T08:30:00"),
    # month-first with a non-English name (rare but dateparser-accepted)
    ("Enero 2, 2024 10:03", "2024-01-02T10:03:00"),
])
def test_parse_freeform_i18n(text, expect):
    assert parse_freeform(text) == expect


def test_i18n_no_false_positives():
    # a non-month word must not suddenly parse
    assert parse_freeform("4 foobar 2023") is None
    assert parse_freeform("notaday, 4. Mai 2023") is None

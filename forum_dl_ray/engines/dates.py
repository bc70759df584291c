"""Free-text date parsing (M17) — a deterministic `dateparser.parse`
equivalent for the formats the reference feeds it.

The reference calls `dateparser.parse` on free-text dates in phpBB
(phpbb.py:465-471), SMF (simplemachines.py:434), Hyperkitty
(hyperkitty.py:270,320) and Pipermail (pipermail.py:344). dateparser
is locale- and wall-clock-dependent; this kernel is a fixed-rule
subset covering those call sites' real-world formats, chosen so the
same input always yields the same output on any machine:

- ISO 8601 (`2024-01-02T10:03:04`, space separator, `Z`/offset)
- epoch seconds / milliseconds
- RFC 2822 (`Tue, 2 Jan 2024 10:03:04 +0000` — mail Date headers)
- ctime (`Tue Jan  2 10:03:04 2024`, optional zone token)
- month-name (`January 2, 2024, 10:03`, `Jan 2, 2024 10:03:04 PM`)
- day-first (`2 January 2024 10:03`, `02 Jan 2024`)
- German/French/Spanish month names and day-first forms
  (`4. Mai 2023`, `Donnerstag, 4. Mai 2023 12:30`, `4 août 2023`,
  `4 de mayo de 2023`) — fixed tables, no locale detection
- numeric slash (`01/02/2024 10:03` — MDY by default like
  dateparser's `en` locale; `dayfirst=True` flips it)
- relative (`Today at 10:03 AM`, `Yesterday at 22:15`) — ONLY when a
  caller-stamped `base` datetime is given (XenForo/vBulletin style;
  wall-clock-relative forms are rejected without a base, per the
  no-nondeterminism rule in CLAUDE.md)

All aware inputs are converted to naive UTC (the convention every
kernel's `time_iso` uses). Returns an ISO string or None.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

_MONTHS = {
    m.lower(): i + 1
    for i, m in enumerate(
        ["January", "February", "March", "April", "May", "June", "July",
         "August", "September", "October", "November", "December"]
    )
}
for _m, _i in list(_MONTHS.items()):
    _MONTHS[_m[:3]] = _i
_MONTHS["sept"] = 9

# non-English month tables (r3 verdict Next #10) — the German, French
# and Spanish names dateparser's locale detection would absorb at the
# reference's call sites, behind the same fixed-rule determinism.
# Unaccented spellings included so mojibake'd pages still parse.
_MONTHS.update({
    # German
    "januar": 1, "februar": 2, "märz": 3, "marz": 3, "mrz": 3,
    "mai": 5, "juni": 6, "juli": 7, "oktober": 10, "okt": 10,
    "dezember": 12, "dez": 12,
    # French
    "janvier": 1, "janv": 1, "février": 2, "fevrier": 2, "févr": 2,
    "fevr": 2, "fév": 2, "mars": 3, "avril": 4, "avr": 4, "juin": 6,
    "juillet": 7, "juil": 7, "août": 8, "aout": 8, "septembre": 9,
    "octobre": 10, "novembre": 11, "décembre": 12, "decembre": 12,
    "déc": 12,
    # Spanish
    "enero": 1, "ene": 1, "febrero": 2, "marzo": 3, "abril": 4,
    "abr": 4, "mayo": 5, "junio": 6, "julio": 7, "agosto": 8,
    "ago": 8, "septiembre": 9, "setiembre": 9, "set": 9,
    "octubre": 10, "noviembre": 11, "diciembre": 12, "dic": 12,
})

# weekday tokens that may prefix a free-text date (en + de/fr/es)
_WEEKDAY = (
    r"(?:(?:Mon|Tue(?:s)?|Wed(?:nes)?|Thu(?:rs)?|Fri|Sat(?:ur)?|Sun)(?:day)?"
    r"|Montag|Dienstag|Mittwoch|Donnerstag|Freitag|Samstag|Sonntag"
    r"|lundi|mardi|mercredi|jeudi|vendredi|samedi|dimanche"
    r"|lunes|martes|mi[ée]rcoles|jueves|viernes|s[áa]bado|domingo)"
)

_TIME = r"(?P<h>\d{1,2}):(?P<mi>\d{2})(?::(?P<s>\d{2}))?\s*(?P<ap>[ap]\.?m\.?)?"
_ZONE = r"(?:Z|UTC|GMT|[+-]\d{2}:?\d{2})?"

_ISO_RE = re.compile(
    r"^(?P<y>\d{4})-(?P<mo>\d{2})-(?P<d>\d{2})(?:[T ]" + _TIME + r")?\s*"
    r"(?P<tz>Z|[+-]\d{2}:?\d{2})?$",
    re.I,
)
_EPOCH_RE = re.compile(r"^(?P<n>\d{10}|\d{13})$")
_RFC2822_RE = re.compile(
    r"^(?:\w{3},\s*)?(?P<d>\d{1,2})\s+(?P<mo>[A-Za-z]{3,9})\.?\s+(?P<y>\d{4})"
    r"(?:\s+" + _TIME + r")?\s*(?P<tz>[+-]\d{4}|[A-Z]{2,4})?$"
)
_CTIME_RE = re.compile(
    r"^\w{3}\s+(?P<mo>[A-Za-z]{3})\s+(?P<d>\d{1,2})\s+" + _TIME +
    r"(?:\s+(?P<tz>[A-Z]{2,4}))?\s+(?P<y>\d{4})$"
)
_MONTH_NAME_RE = re.compile(
    # optional weekday prefix: phpBB's default style is
    # "Thu May 04, 2023 12:30 pm" (phpbb.py:465-471 feeds it to
    # dateparser); the prefix is restricted to weekday tokens so a
    # month name is never mis-consumed as one. Month token class is
    # unicode-letter so accented names (août, März) match.
    r"^(?:" + _WEEKDAY + r",?\s+)?"
    r"(?P<mo>[^\W\d_]{3,10})\.?\s+(?P<d>\d{1,2})(?:st|nd|rd|th)?,?\s+(?P<y>\d{4})"
    r"(?:,?\s+(?:at\s+)?" + _TIME + r")?$",
    re.I,
)
_SLASH_RE = re.compile(
    r"^(?P<a>\d{1,2})/(?P<b>\d{1,2})/(?P<y>\d{4})(?:,?\s+" + _TIME + r")?$"
)
_RELATIVE_RE = re.compile(
    r"^(?P<day>Today|Yesterday)\s+at\s+" + _TIME + r"$", re.I
)
_TZ_OFF_RE = re.compile(r"^([+-])(\d{2}):?(\d{2})$")

# fixed offsets (minutes east of UTC) for the zone abbreviations
# dateparser resolves in its `en` locale — round-2 advice: treating
# EST/PST/CET as UTC silently shifted mail-header timestamps by hours.
# Ambiguous abbreviations (e.g. IST, CST in Asia) use the US/European
# reading dateparser's default locale picks.
_TZ_ABBREV_MIN = {
    "EST": -300, "EDT": -240, "CST": -360, "CDT": -300,
    "MST": -420, "MDT": -360, "PST": -480, "PDT": -420,
    "AKST": -540, "AKDT": -480, "HST": -600,
    "CET": 60, "CEST": 120, "EET": 120, "EEST": 180,
    "WET": 0, "WEST": 60, "BST": 60, "MSK": 180,
    "IST": 330, "JST": 540, "KST": 540, "SGT": 480, "HKT": 480,
    "AEST": 600, "AEDT": 660, "NZST": 720, "NZDT": 780,
}


def _clock(m: re.Match) -> tuple[int, int, int] | None:
    """(h, mi, s) from the shared time groups; None on a bad clock."""
    if m.group("h") is None:
        return 0, 0, 0
    h = int(m.group("h"))
    mi = int(m.group("mi"))
    s = int(m.group("s") or 0)
    ap = (m.group("ap") or "").replace(".", "").lower()
    if ap == "pm" and h != 12:
        h += 12
    elif ap == "am" and h == 12:
        h = 0
    if h > 23 or mi > 59 or s > 60:
        return None
    return h, mi, s


def _shift_to_utc(dt: datetime, tz: str | None) -> datetime:
    """Apply a trailing zone token and return naive UTC."""
    if not tz or tz.upper() in ("Z", "UTC", "GMT", "UT"):
        return dt
    off = _TZ_OFF_RE.match(tz) or re.match(r"^([+-])(\d{2})(\d{2})$", tz)
    if off:
        delta = timedelta(hours=int(off.group(2)), minutes=int(off.group(3)))
        return dt - delta if off.group(1) == "+" else dt + delta
    minutes = _TZ_ABBREV_MIN.get(tz.upper())
    if minutes is not None:
        return dt - timedelta(minutes=minutes)
    return dt  # unrecognized alpha zone: DELIBERATE deviation from
    # dateparser — assumed UTC rather than failing the whole parse


def parse_freeform(text: str, base: datetime | None = None,
                   dayfirst: bool = False) -> str | None:
    """Parse a free-text date into a naive-UTC ISO string, or None."""
    t = " ".join(text.strip().split())
    if not t:
        return None

    m = _ISO_RE.match(t)
    if m:
        clock = _clock(m)
        if clock is None:
            return None
        try:
            dt = datetime(int(m.group("y")), int(m.group("mo")), int(m.group("d")),
                          *clock)
        except ValueError:
            return None
        return _shift_to_utc(dt, m.group("tz")).isoformat()

    m = _EPOCH_RE.match(t)
    if m:
        n = int(m.group("n"))
        if len(m.group("n")) == 13:
            n /= 1000.0
        return (datetime.fromtimestamp(n, tz=timezone.utc)
                .replace(tzinfo=None).isoformat())

    for rx in (_RFC2822_RE, _CTIME_RE, _MONTH_NAME_RE):
        m = rx.match(t)
        if not m:
            continue
        mo = _MONTHS.get(m.group("mo").lower().rstrip("."))
        if mo is None:
            continue
        clock = _clock(m)
        if clock is None:
            return None
        try:
            dt = datetime(int(m.group("y")), mo, int(m.group("d")), *clock)
        except ValueError:
            return None
        tz = m.groupdict().get("tz")
        return _shift_to_utc(dt, tz).isoformat()

    # day-first: "2 January 2024 10:03", "02 Jan 2024", and the
    # de/fr/es forms "4. Mai 2023" (German ordinal dot), "4 mai 2023",
    # "4 de mayo de 2023" (Spanish connectors), optional weekday
    m = re.match(
        r"^(?:" + _WEEKDAY + r",?\s+)?"
        r"(?P<d>\d{1,2})(?:st|nd|rd|th|\.)?\s+(?:de\s+)?"
        r"(?P<mo>[^\W\d_]{3,10})\.?,?\s+(?:de\s+)?(?P<y>\d{4})"
        r"(?:,?\s+(?:at\s+)?" + _TIME + r")?$", t, re.I)
    if m:
        mo = _MONTHS.get(m.group("mo").lower().rstrip("."))
        clock = _clock(m)
        if mo is not None and clock is not None:
            try:
                return datetime(int(m.group("y")), mo, int(m.group("d")),
                                *clock).isoformat()
            except ValueError:
                return None

    m = _SLASH_RE.match(t)
    if m:
        a, b = int(m.group("a")), int(m.group("b"))
        mo, d = (b, a) if dayfirst else (a, b)
        clock = _clock(m)
        if clock is None:
            return None
        try:
            return datetime(int(m.group("y")), mo, d, *clock).isoformat()
        except ValueError:
            return None

    m = _RELATIVE_RE.match(t)
    if m and base is not None:
        clock = _clock(m)
        if clock is None:
            return None
        day = base.date()
        if m.group("day").lower() == "yesterday":
            day = day - timedelta(days=1)
        return datetime(day.year, day.month, day.day, *clock).isoformat()

    return None

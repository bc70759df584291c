"""Engine adapter registry.

The reference's user-extension surface is ``Extractor`` subclasses
found in a fixed detection order (/root/reference/forum_dl/extractors/
__init__.py:12-37 — order-sensitive, first non-None detect wins).
Here an engine adapter is a module of PURE functions over page bytes
(SURVEY.md §2.7 mapping): ``detect(url, body)``, ``parse_board_page``,
``parse_thread_page`` — shared verbatim by the sequential golden
simulator and the Ray parse stage, which is what makes order/seen-set
parity testable.
"""

from __future__ import annotations

from . import html_generic, json_registry, json_stream, mail_archive

# fixed detection order (first match wins, like the reference registry)
ENGINES = {
    "html-generic": html_generic,
    "json-stream": json_stream,
    "json-registry": json_registry,
    "mail-archive": mail_archive,
}

DETECTION_ORDER = ["json-stream", "json-registry", "mail-archive", "html-generic"]


def detect_engine(url: str, body: bytes) -> str | None:
    for name in DETECTION_ORDER:
        if ENGINES[name].detect(url, body):
            return name
    return None

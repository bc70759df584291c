"""Output sinks — the reference's writer registry re-expressed as Ray
Data sinks and projections.

Reference surface (/root/reference/forum_dl/writers/__init__.py:13-38
format registry): jsonl (writers/jsonl.py), mail family
(mbox/maildir/mh/mmdf/babyl via writers/common.py MailWriter), files,
warc (lineage), plus the --textify / --content-as-title /
--author-as-addr-spec projections (writers/common.py:355-396). Here:

- ``envelope``  — Entry envelope projection + JSONL serialization
- ``jsonl``     — JsonlDatasink (deterministic per-task file names)
- ``mail``      — RFC-2822 message build (J3 file→post attach via one
                  groupby(thread) shuffle) + foldered mbox writer
"""

from .envelope import entry_envelope, to_jsonl_lines
from .jsonl import JsonlDatasink, write_entries_jsonl
from .mail import MailOptions, build_mail_messages, write_mail, write_mbox_folders

__all__ = [
    "entry_envelope",
    "to_jsonl_lines",
    "JsonlDatasink",
    "write_entries_jsonl",
    "MailOptions",
    "build_mail_messages",
    "write_mail",
    "write_mbox_folders",
]

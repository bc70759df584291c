"""Mail sinks: post rows → RFC-2822 messages → foldered mbox files.

Reference semantics (/root/reference/forum_dl/writers/common.py:
355-442): per post, ``Message-ID = <'.'.join(path+subpath)>``,
``In-Reply-To`` = parent path, ``Date`` from creation_time, ``From``
author (optionally ``author <author@netloc>`` — M20), Subject =
thread title (or first line of textified content — M19), body HTML
(or textified — M18); embedded files attach to the post whose
``subpath`` prefixes theirs (J3, writers/common.py:328-343); foldered
variants put each board's messages in folder ``'.'.join(board.path)``.

Ray shape: ONE shuffle — ``groupby(thread path).map_groups`` — builds
every message of a thread locally (posts + thread title + file
attach all share the path key), then a second small shuffle groups
messages per board folder for the mbox files. No driver-side loops.
"""

from __future__ import annotations

import base64
import email.utils
import hashlib
import html as _htmlmod
import json
import os
import re
import shutil
from dataclasses import dataclass

import pandas as pd

from forum_dl_ray import STAGE_RUNTIME_ENV as _RENV

_TAG_RE = re.compile(r"<[^>]+>")


def textify(html: str) -> str:
    """Lossy HTML → plaintext (M18; stands in for html2text, absent
    in this container): tag strip + entity unescape + space squeeze."""
    return re.sub(r"[ \t]+", " ", _htmlmod.unescape(_TAG_RE.sub(" ", html))).strip()


@dataclass
class MailOptions:
    textify: bool = False
    content_as_title: bool = False
    author_as_addr_spec: bool = False
    base_netloc: str = ""


def _build_message(
    path: list[str], subpath: list[str], url: str, author: str,
    creation_ts: float | None, content: str, thread_title: str,
    attachments: list[tuple[str, str, bytes]], opts: MailOptions,
) -> str:
    full = path + subpath
    msgid = "<" + ".".join(full) + ">"
    headers = [("Message-ID", msgid), ("Content-Location", url)]
    if creation_ts is not None:
        headers.append(("Date", email.utils.formatdate(creation_ts)))
    if opts.author_as_addr_spec and opts.base_netloc:
        headers.append(("From", f"{author} <{author}@{opts.base_netloc}>"))
    else:
        headers.append(("From", author))
    if len(full) >= 2:
        headers.append(("In-Reply-To", "<" + ".".join(full[:-1]) + ">"))
    if subpath and opts.content_as_title:
        headers.append(("Subject", textify(content[:98]).partition("\n")[0]))
    else:
        headers.append(("Subject", thread_title))

    body = textify(content) if opts.textify else content
    body_ct = "text/plain" if opts.textify else "text/html"
    if not attachments:
        headers.append(("MIME-Version", "1.0"))
        headers.append(("Content-Type", f'{body_ct}; charset="utf-8"'))
        head = "".join(f"{k}: {v}\n" for k, v in headers)
        return head + "\n" + body + "\n"
    boundary = "==fdr-" + hashlib.blake2b(msgid.encode(), digest_size=8).hexdigest()
    headers.append(("MIME-Version", "1.0"))
    headers.append(("Content-Type", f'multipart/mixed; boundary="{boundary}"'))
    head = "".join(f"{k}: {v}\n" for k, v in headers)
    parts = [f'--{boundary}\nContent-Type: {body_ct}; charset="utf-8"\n\n{body}\n']
    for file_url, content_type, blob in attachments:
        b64 = base64.b64encode(blob or b"").decode("ascii")
        wrapped = "\n".join(b64[i : i + 76] for i in range(0, len(b64), 76))
        parts.append(
            f"--{boundary}\n"
            f"Content-Type: {content_type}\n"
            "MIME-Version: 1.0\n"
            "Content-Transfer-Encoding: base64\n"
            f"Content-Disposition: attachment; filename={_quote(file_url)}\n\n"
            f"{wrapped}\n"
        )
    parts.append(f"--{boundary}--\n")
    return head + "\n" + "".join(parts)


def _quote(url: str) -> str:
    from urllib.parse import quote_plus

    return quote_plus(url)


def _thread_messages(g: pd.DataFrame, opts: MailOptions) -> pd.DataFrame:
    """One thread's rows (thread + posts + files, all sharing the path
    key) → message rows. The file→post attach (J3) is the in-group
    subpath-prefix match — no extra shuffle."""
    g = g.sort_values("order_key")
    host = g["thread_key"].iloc[0].split("|", 1)[0]
    if opts.author_as_addr_spec and not opts.base_netloc:
        from dataclasses import replace

        opts = replace(opts, base_netloc=host)  # site netloc (M20)
    threads = g[g["type"] == "thread"]
    thread_title = threads["title"].iloc[0] if len(threads) else ""
    posts = g[g["type"] == "post"]
    files = g[g["type"] == "file"]
    file_rows = [
        (json.loads(r.subpath) if r.subpath else [], r.url, r.content_type, r.content_bytes)
        for r in files.itertuples()
    ]
    out_folder, out_key, out_id, out_msg = [], [], [], []
    for r in posts.itertuples():
        path = json.loads(r.path) if r.path else []
        subpath = json.loads(r.subpath) if r.subpath else []
        ts = None
        if r.creation_time is not None and not pd.isna(r.creation_time):
            ts = pd.Timestamp(r.creation_time).timestamp()
        attach = [
            (fu, fct or "application/octet-stream", fb)
            for fsub, fu, fct, fb in file_rows
            if fsub[:-1] == subpath
        ]
        msg = _build_message(
            path, subpath, r.url, r.author or "", ts, r.content or "",
            thread_title, attach, opts,
        )
        out_folder.append(host + "/" + ".".join(path[:-1]))
        out_key.append(r.order_key)
        out_id.append("<" + ".".join(path + subpath) + ">")
        out_msg.append(msg)
    return pd.DataFrame(
        {
            "folder": pd.Series(out_folder, dtype="str"),
            "order_key": pd.Series(out_key, dtype="str"),
            "message_id": pd.Series(out_id, dtype="str"),
            "message": pd.Series(out_msg, dtype="str"),
        }
    )


def build_mail_messages(entries_ds, opts: MailOptions | None = None):
    """Entry Dataset → (folder, order_key, message_id, message) rows.

    The shuffle key is (origin host, path): item ids are site-local in
    the reference (each URL run gets its own extractor), so ``path``
    alone is not globally unique across a multi-site crawl."""
    import functools

    import pyarrow as pa

    from ..urlnorm import host_of

    opts = opts or MailOptions()
    ds = entries_ds.filter(expr="type in ['thread', 'post', 'file']")

    def add_key(batch: pa.Table) -> pa.Table:
        keys = [
            f"{host_of(o)}|{p}"
            for o, p in zip(batch["origin"].to_pylist(), batch["path"].to_pylist())
        ]
        return batch.append_column("thread_key", pa.array(keys, pa.string()))

    ds = ds.map_batches(add_key, batch_format="pyarrow", batch_size=4096, runtime_env=_RENV)
    return ds.groupby("thread_key").map_groups(
        functools.partial(_thread_messages, opts=opts),
        batch_format="pandas",
        runtime_env=_RENV,
    )


def _write_folder(g: pd.DataFrame, out_dir: str) -> pd.DataFrame:
    g = g.sort_values("order_key")
    folder = g["folder"].iloc[0] or "root"
    path = os.path.join(out_dir, folder.rstrip("/") + ".mbox")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        for msg in g["message"]:
            f.write("From MAILER-DAEMON Wed Jan  1 00:00:00 2020\n")
            f.write(msg.replace("\nFrom ", "\n>From "))
            f.write("\n")
    return pd.DataFrame({"folder": [folder], "n_messages": [len(g)]})


def write_mbox_folders(entries_ds, out_dir: str, opts: MailOptions | None = None):
    """Foldered mbox sink (reference FolderedMailWriter): one mbox per
    board folder, messages in emission order. Returns (folder,
    n_messages) rows."""
    return _write_mail(entries_ds, out_dir, opts, _write_folder)


def _write_maildir(g: pd.DataFrame, out_dir: str) -> pd.DataFrame:
    """Maildir: one file per message under <folder>/cur, deterministic
    names (order key + msgid hash — a retried task overwrites)."""
    g = g.sort_values("order_key")
    folder = g["folder"].iloc[0] or "root"
    base = os.path.join(out_dir, folder.rstrip("/"))
    for sub in ("cur", "new", "tmp"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    for r in g.itertuples():
        h = hashlib.blake2b(r.message_id.encode(), digest_size=8).hexdigest()
        name = f"{r.order_key}.{h}.fdr:2,S"
        with open(os.path.join(base, "cur", name), "w", encoding="utf-8") as f:
            f.write(r.message)
    return pd.DataFrame({"folder": [folder], "n_messages": [len(g)]})


def _write_mh(g: pd.DataFrame, out_dir: str) -> pd.DataFrame:
    """MH: numbered message files (1..n in emission order) per folder."""
    g = g.sort_values("order_key")
    folder = g["folder"].iloc[0] or "root"
    base = os.path.join(out_dir, folder.rstrip("/"))
    os.makedirs(base, exist_ok=True)
    for i, r in enumerate(g.itertuples(), start=1):
        with open(os.path.join(base, str(i)), "w", encoding="utf-8") as f:
            f.write(r.message)
    return pd.DataFrame({"folder": [folder], "n_messages": [len(g)]})


def _write_mmdf(g: pd.DataFrame, out_dir: str) -> pd.DataFrame:
    """MMDF: ^A^A^A^A delimited messages, one file per folder."""
    g = g.sort_values("order_key")
    folder = g["folder"].iloc[0] or "root"
    path = os.path.join(out_dir, folder.rstrip("/") + ".mmdf")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    sep = "\x01\x01\x01\x01\n"
    with open(path, "w", encoding="utf-8") as f:
        for msg in g["message"]:
            f.write(sep)
            f.write(msg)
            f.write("\n" + sep)
    return pd.DataFrame({"folder": [folder], "n_messages": [len(g)]})


def _write_babyl(g: pd.DataFrame, out_dir: str) -> pd.DataFrame:
    """Babyl (Rmail): \\f-separated messages with the EOOH marker."""
    g = g.sort_values("order_key")
    folder = g["folder"].iloc[0] or "root"
    path = os.path.join(out_dir, folder.rstrip("/") + ".babyl")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write("BABYL OPTIONS:\nVersion: 5\n\x1f")
        for msg in g["message"]:
            head, _, body = msg.partition("\n\n")
            f.write("\x0c\n0, unseen,,\n*** EOOH ***\n")
            f.write(head + "\n\n" + body)
            f.write("\x1f")
    return pd.DataFrame({"folder": [folder], "n_messages": [len(g)]})


_MAIL_FORMATS = {
    "mbox": _write_folder,
    "maildir": _write_maildir,
    "mh": _write_mh,
    "mmdf": _write_mmdf,
    "babyl": _write_babyl,
}


def _write_mail(entries_ds, out_dir: str, opts, writer):
    import functools

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    msgs = build_mail_messages(entries_ds, opts)
    out = msgs.groupby("folder").map_groups(
        functools.partial(writer, out_dir=out_dir),
        batch_format="pandas",
        runtime_env=_RENV,
    )
    return out.to_pandas().sort_values("folder").reset_index(drop=True)


def write_mail(entries_ds, out_dir: str, fmt: str = "mbox",
               opts: MailOptions | None = None):
    """Foldered mail sink in any reference format
    (writers/{mbox,maildir,mh,mmdf,babyl}.py): same message builder,
    format-specific per-folder writer."""
    if fmt not in _MAIL_FORMATS:
        raise ValueError(f"unknown mail format {fmt!r}; one of {sorted(_MAIL_FORMATS)}")
    return _write_mail(entries_ds, out_dir, opts, _MAIL_FORMATS[fmt])

"""robots.txt discovery + parsing for the crawl frontier.

The reference has no robots support at all (SURVEY.md ST7: politeness
is a new design element required by the north rule). The frontier
enforces per-host disallow prefixes at ENQUEUE time
(frontier/shard.py:_robots_allows); this module supplies those rules
from actual ``/robots.txt`` documents instead of only from config:
at seed time the driver looks up each seed host's robots.txt in the
page store (one point lookup per host — O(hosts), never a scan) and
merges the parsed rules with any config-provided ones (config wins on
conflict: an operator override must beat the remote file).

Parser scope (RFC 9309): groups of ``User-agent:`` lines followed by
``Disallow:`` / ``Allow:`` lines. Group selection follows RFC 9309
§2.2.1: only the MOST SPECIFIC matching group(s) apply — the longest
agent token that is a case-insensitive prefix of ours, with
same-length groups merged in file order — and the ``*`` group is used
solely when no specific group matches.

Rule encoding (r4 verdict Next #6): each rule is the raw robots.txt
path PATTERN (``*`` = any char run, trailing ``$`` = end anchor, RFC
9309 §2.2.3), with Allow rules carried as ``"!" + pattern`` (a valid
robots path always starts with ``/`` or ``*``, so the prefix is
unambiguous). The frontier matcher (frontier/shard.py
``_compile_robots``) applies RFC §2.2.2 precedence: the longest
matching pattern wins; on a length tie Allow beats Disallow; no match
= allowed. Plain disallow-prefix lists (config compatibility) take a
fast prefix-only path.
"""

from __future__ import annotations

import pyarrow.compute as pc
import pyarrow.parquet as pq


def parse_robots(text: str, user_agent: str = "forum-dl-ray") -> list[str]:
    """Rules applying to ``user_agent`` per RFC 9309 §2.2.1 group
    selection: only the most specific matching group(s) apply (longest
    agent token that is a case-insensitive prefix of ours; same-length
    matches merge in file order); the ``*`` group is the fallback when
    no specific group matches, never a union with one. Disallow rules
    are the raw pattern, Allow rules are ``"!" + pattern`` (module
    docstring); empty values (allow-all Disallow) contribute
    nothing."""
    ua = user_agent.lower()
    groups: list[tuple[list[str], list[str]]] = []  # (agents, rules)
    agents: list[str] = []
    rules: list[str] = []
    group_open = False  # inside the agent-line run of a group
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not group_open:
                if agents:
                    groups.append((agents, rules))
                agents, rules = [], []
                group_open = True
            agents.append(value.lower())
        elif field in ("disallow", "allow"):
            # only RULE lines close a user-agent run; unknown fields
            # (Sitemap:, Crawl-delay:, ...) must not interfere with
            # group parsing (RFC 9309 §2.2.2 "MUST NOT interfere";
            # r5 review: a Sitemap line between two User-agent lines
            # split what should be one merged group and dropped the
            # earlier agent's rules)
            group_open = False
            # a robots path must start with '/' or '*' (RFC 9309
            # §2.2.2); anything else is malformed AND, for Disallow,
            # would be INJECTABLE into the internal "!"-prefix Allow
            # encoding ("Disallow: !/x" must not decode as an Allow
            # carve-out that weakens a legitimate Disallow) — drop it
            if not value.startswith(("/", "*")):
                continue
            if field == "disallow" and value and agents:
                rules.append(value)
            elif field == "allow" and value and agents:
                rules.append("!" + value)
    if agents:
        groups.append((agents, rules))

    best = -1  # longest specific (non-'*') matching agent token
    for ag, _ in groups:
        for a in ag:
            if a != "*" and ua.startswith(a):
                best = max(best, len(a))
    out: list[str] = []
    for ag, rs in groups:
        if best >= 0:
            hit = any(a != "*" and ua.startswith(a) and len(a) == best
                      for a in ag)
        else:
            hit = "*" in ag
        if hit:
            out.extend(rs)
    return out


def discover_robots(pages_path: str, hosts: list[str],
                    user_agent: str = "forum-dl-ray") -> dict[str, list[str]]:
    """{host: disallow_prefixes} for every host whose
    ``http://host/robots.txt`` exists in the page store. Point lookup
    via a parquet filter on the url column — rows decoded only for the
    (at most) len(hosts) matches."""
    if not hosts:
        return {}
    wanted = {f"http://{h}/robots.txt": h for h in hosts}
    t = pq.read_table(pages_path, columns=["url", "body"],
                      filters=[("url", "in", list(wanted))])
    out: dict[str, list[str]] = {}
    for url, body in zip(t["url"].to_pylist(), t["body"].to_pylist()):
        rules = parse_robots(bytes(body).decode("utf-8", "replace"), user_agent)
        if rules:
            out[wanted[url]] = rules
    return out


def merged_robots(pages_path: str, hosts: list[str], config_robots: dict,
                  user_agent: str = "forum-dl-ray") -> dict[str, list[str]]:
    """Discovered rules overlaid with config rules; a host present in
    the config keeps exactly its configured list (operator override)."""
    out = discover_robots(pages_path, hosts, user_agent)
    out.update({h: list(v) for h, v in config_robots.items()})
    return out

"""Reply-tree linearization: indent stream → nested subpath tuples.

Reimplements the reference's stack semantics for reconstructing reply
nesting from posts streamed in display order (SURVEY.md §2.6.3;
/root/reference/forum_dl/extractors/hyperkitty.py:283-324 and
pipermail.py:293-318: push when depth increases, replace the tail
sibling at equal depth, splice back when depth decreases).

The stack is per-THREAD state that must survive pagination — it is
carried in the frontier entry's cursor between a thread's pages, not
held in any actor (SURVEY.md ST4).
"""

from __future__ import annotations


def advance_stack(stack: list[str], indent: int, post_id: str) -> list[str]:
    """Mutates and returns ``stack`` so that ``tuple(stack)`` is the
    subpath of the post just consumed. ``indent`` 0 = top-level post."""
    indent = max(0, indent)
    if indent >= len(stack):
        # one level deeper (clamped: malformed deeper jumps attach here)
        stack.append(post_id)
    else:
        # sibling at this depth: drop deeper frames, replace
        del stack[indent + 1 :]
        stack[indent] = post_id
    return stack

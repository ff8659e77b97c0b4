"""Deterministic HTML -> text extraction shared by the engine and the oracle.

The north rule (BASELINE.json input_hint) requires byte-identical extracted
``text`` per ``url`` between the distributed engine and the reference
(single-process oracle) replay.  Both import THIS function, and it is pure
Python + stdlib only (no locale, no version-dependent parser), so equality
is structural, not accidental.

Reference analogue: the reference has no HTML extraction (its payloads are
JSON chain events); the closest transform is the per-topic projection
`src/pipeline/core/spark.py:108-121`.  Extraction is the target-added M18
operator (SURVEY.md §2.3).
"""

from __future__ import annotations

import html as _htmllib
import re

# Tags whose entire content is dropped.
_DROP_CONTENT = re.compile(
    rb"<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
# Comments and CDATA.
_COMMENT = re.compile(rb"<!--.*?-->", re.DOTALL)
# Block-level tags that imply a line break when stripped.
_BLOCK_TAG = re.compile(
    rb"</?(p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|header|footer|"
    rb"blockquote|pre|hr)\b[^>]*>",
    re.IGNORECASE,
)
# Any remaining tag.
_ANY_TAG = re.compile(rb"<[^>]+>")
# Whitespace normalization (after decode).  Semantics are the classic
# three passes — collapse ASCII-ws runs to one space, absorb spaces
# around newlines, collapse blank lines — but the patterns skip the
# overwhelmingly common no-op matches (a single plain space, a bare
# newline), which were ~60% of extraction CPU as no-op rewrites:
#  * _WS_RUN: only runs containing a non-space ws char, or >= 2 spaces
#    (a lone " " already IS the replacement);
#  * _NL_ABSORB: only newline runs with adjacent ASCII ws or >= 2 \n
#    (a lone "\n" already IS the replacement).
# _NL_RUN stays as the final (rare) pass for blank lines separated by
# Unicode whitespace, which \s sees but the ASCII classes above do not.
_WS_RUN = re.compile(r"[ \t\r\f\v]*[\t\r\f\v][ \t\r\f\v]*| {2,}")
_NL_ABSORB = re.compile(r" \n[ \n]*|\n[ \n]+")
_NL_RUN = re.compile(r"\n\s*\n+")


def extract_text(html_bytes: bytes | None) -> str:
    """Deterministically extract visible text from HTML bytes.

    Pipeline: drop script/style/comment content -> turn block tags into
    newlines -> strip remaining tags -> utf-8 decode (replace) -> unescape
    entities -> collapse whitespace.  Stable across platforms and Python
    versions (stdlib ``html.unescape`` + ``re`` only).
    """
    if html_bytes is None:
        return ""
    if isinstance(html_bytes, str):  # defensive: accept str payloads too
        html_bytes = html_bytes.encode("utf-8", "surrogatepass")
    b = _COMMENT.sub(b"", html_bytes)
    b = _DROP_CONTENT.sub(b"", b)
    b = _BLOCK_TAG.sub(b"\n", b)
    b = _ANY_TAG.sub(b" ", b)
    s = b.decode("utf-8", "replace")
    s = _htmllib.unescape(s)
    s = _WS_RUN.sub(" ", s)
    # normalize spaces around newlines, collapse blank lines
    s = _NL_ABSORB.sub("\n", s)
    s = _NL_RUN.sub("\n", s)
    return s.strip()

"""Text extractors M7–M13 (SURVEY.md §2.2), re-targeted to transcript text.

Same semantics as the reference's EventProcessor helpers (reference:
src/nostr_pipeline/transformers/event_processor.py:210-315), kept pure so
they can be unit-tested exactly and wrapped in vectorized batch stages
(stages/text.py). Patterns are compiled once at import (the
"compile once per worker" rule — workers import the module once).
"""

from __future__ import annotations

import re

HASHTAG_RE = re.compile(r"#(\w+)")  # event_processor.py:30
URL_RE = re.compile(r"https?://[^\s]+")  # event_processor.py:31
MEDIA_EXTENSIONS = (".jpg", ".jpeg", ".png", ".gif", ".webp", ".mp4", ".mov", ".webm")


def extract_hashtags(text: str, tag_values: list[str] | None = None) -> list[str]:
    """Content-regex ∪ explicit tag values, lower-cased, set-deduped.

    Reference: event_processor.py:210-223 (content `#(\\w+)` matches union
    `t`-tags). Returned sorted for determinism (the reference returns
    arbitrary set order; downstream aggregates are order-insensitive).
    """
    found = {m.group(1).lower() for m in HASHTAG_RE.finditer(text or "")}
    for v in tag_values or []:
        found.add(v.lower())
    return sorted(found)


def extract_urls(text: str) -> list[str]:
    """Reference: event_processor.py:225-227."""
    return URL_RE.findall(text or "")


def extract_mentions(tags: list[list[str]]) -> list[str]:
    """Values of `p`-tags, in order. Reference: event_processor.py:229-235."""
    return [t[1] for t in tags if len(t) >= 2 and t[0] == "p"]


def media_urls(urls: list[str]) -> list[str]:
    """URLs whose path ends in a media extension (query string stripped).

    Reference: event_processor.py:237-248 (urlparse().path.lower() suffix
    test against the extension set).
    """
    out = []
    for url in urls:
        path = url.split("?", 1)[0].split("#", 1)[0]
        # drop scheme+host → path only, like urlparse().path
        if "://" in path:
            rest = path.split("://", 1)[1]
            path = rest[rest.find("/") :] if "/" in rest else ""
        if path.lower().endswith(MEDIA_EXTENSIONS):
            out.append(url)
    return out


def has_media(urls: list[str]) -> bool:
    return len(media_urls(urls)) > 0


def extract_reply_to(tags: list[list[str]]) -> str | None:
    """`e`-tag with marker "reply" wins; else the LAST `e`-tag (order-
    sensitive). Reference: event_processor.py:250-260."""
    fallback = None
    for t in tags:
        if len(t) >= 2 and t[0] == "e":
            if len(t) >= 4 and t[3] == "reply":
                return t[1]
            fallback = t[1]
    return fallback


_BOLT11_MULTIPLIERS = {"m": 100_000.0, "u": 100.0, "n": 0.1, "p": 0.0001}
_BOLT11_RE = re.compile(r"^lnbc(\d+)([munp]?)")


def parse_bolt11_amount(bolt11: str | None) -> int | None:
    """Amount in msats from an lnbc invoice prefix.

    Format lnbc<amount><multiplier>1...; multiplier table m/u/n/p (msats per
    unit); bare amount is whole bitcoin. Reference: event_processor.py:262-297
    — NOTE the reference splits on the literal "1" and therefore returns None
    for any amount containing the digit 1, failing its own unit test
    (tests/test_event_processor.py:55-63 expects lnbc1000m → 100_000_000).
    We implement the intended semantics the test pins (FIXTURES.md §5).
    """
    if not bolt11:
        return None
    m = _BOLT11_RE.match(bolt11.lower())
    if not m or not m.group(1):
        return None
    amount = float(m.group(1))
    mult = _BOLT11_MULTIPLIERS.get(m.group(2))
    if mult is not None:
        return int(amount * mult)
    return int(amount * 100_000_000_000)  # bare amount = whole bitcoin


def detect_language(text: str) -> str | None:
    """Char-range heuristic language id (zh/ja/ko, default en).

    Reference: event_processor.py:299-315. The vectorized twin lives in
    stages/text.py.
    """
    if not text:
        return None
    if any("一" <= ch <= "鿿" for ch in text):
        return "zh"
    if any("぀" <= ch <= "ゟ" or "゠" <= ch <= "ヿ" for ch in text):
        return "ja"
    if any("가" <= ch <= "힯" for ch in text):
        return "ko"
    return "en"


_LIKE_EMOJI = {"+", "\U0001F44D", "❤️", "\U0001F919"}


def is_like(reaction_content: str) -> bool:
    """Like-classification by emoji set. Reference: event_processor.py:122-143."""
    return reaction_content in _LIKE_EMOJI

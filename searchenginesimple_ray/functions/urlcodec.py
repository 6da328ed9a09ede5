"""URL / payload codecs (serving-path parity, SURVEY §2.2 M6/M7).

The reference percent-decodes request keys TWICE
(`include/helper/urlcode.hpp:12-60`, call sites
`src/Server/WebServer.cc:187-200`, `src/Server/KeyServer.cc:136-137`)
and base64-url-decodes click payloads (`WebServer.cc:208-210`).
Python's stdlib provides both; these wrappers pin the reference's exact
behaviour (double decode; '+' NOT treated as space — the reference's
decoder only handles %XX escapes).
"""

from __future__ import annotations

import base64
from urllib.parse import unquote


def percent_decode(s: str) -> str:
    """Single %XX decode ('+' left as-is, matching urlcode.hpp:12-60)."""
    return unquote(s)


def double_percent_decode(s: str) -> str:
    """The reference decodes every request key twice (WebServer.cc:187-200)."""
    return unquote(unquote(s))


def base64url_decode(s: str) -> bytes:
    """Click payload decode (WebServer.cc:208-210); tolerant of missing
    padding."""
    pad = -len(s) % 4
    return base64.urlsafe_b64decode(s + "=" * pad)


def base64url_encode(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).decode("ascii").rstrip("=")

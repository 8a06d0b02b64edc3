"""Deterministic mocks for the reference's external connectors.

The reference calls imgur (Common.py:217-254), TMDb (Common.py:367-385)
and Google Translate (FaselAnimeScraper.py:16-29). No network exists in
this sandbox, so each connector is a pure deterministic function — the
engine wraps them in actor-held lookup stages (the T4 "loaded once per
worker" pattern) and the oracle calls them directly, so both sides see
identical "API responses".
"""

from __future__ import annotations

from .hashing import stable_hash64

IMGUR_PLACEHOLDER = "https://imgpile.com/images/TPDrVl.jpg"

_TRANSLATE_TOKENS = {
    "انمي": "Anime",
    "فيلم": "Film",
    "مسلسل": "Series",
    "مترجم": "Translated",
}


def mock_imgur_upload(image_ref: str) -> str:
    """The imgur POST (Common.py:248-254): deterministic hosted URL;
    placeholder on empty input (Common.py:228-229)."""
    if image_ref == "":
        return IMGUR_PLACEHOLDER
    return f"https://i.imgur.test/{stable_hash64(image_ref) % 10**10}.jpg"


def mock_tmdb_id(title: str, kind: str) -> int | None:
    """TMDb search (Common.py:367-385): first-result id or None on miss.

    Deterministic: ~10% of titles miss (IndexError → None path).
    """
    h = stable_hash64(f"{title}|{kind}")
    if h % 10 == 0:
        return None
    return int(h % 1_000_000)


def mock_translate_ar_en(text: str) -> str:
    """Google-translate ar→en mock: token-wise dictionary replacement;
    unknown Arabic tokens pass through (cleaned later by
    clean_anime_title's ASCII fold)."""
    return " ".join(_TRANSLATE_TOKENS.get(tok, tok) for tok in text.split(" "))

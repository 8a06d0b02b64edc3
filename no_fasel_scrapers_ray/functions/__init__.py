from .text import (
    remove_arabic_chars,
    remove_year,
    clean_iframe_source,
    normalize_title,
    clean_anime_title,
    clean_genres,
    decode_akwam_genres,
    decode_cimanow_genres,
    AKWAM_GENRES,
    CIMA_NOW_GENRES,
)
from .urls import fix_url, canonicalize_url, url_host, url_hash64
from .hashing import stable_hash64, stable_id, md5_of_json

__all__ = [
    "remove_arabic_chars",
    "remove_year",
    "clean_iframe_source",
    "normalize_title",
    "clean_anime_title",
    "clean_genres",
    "decode_akwam_genres",
    "decode_cimanow_genres",
    "AKWAM_GENRES",
    "CIMA_NOW_GENRES",
    "fix_url",
    "canonicalize_url",
    "url_host",
    "url_hash64",
    "stable_hash64",
    "stable_id",
    "md5_of_json",
]

"""Pure string functions replicating the reference scraper semantics.

Each function documents the reference location (file:line in
/root/reference) whose observable behavior it reproduces, including the
deliberate quirks (see SURVEY.md §2.4). All functions are pure and cheap
so they can run inside ``map_batches`` bodies without per-row Python
overhead dominating (they are applied via pandas ``Series.map`` or list
comprehensions over Arrow string arrays — the payloads are short titles,
not documents).
"""

from __future__ import annotations

# Genre-id → name decode table (reference: Common.py:32-58).
AKWAM_GENRES = {
    "87": "Ramadan", "30": "Animated", "18": "Action", "71": "Dubbed",
    "72": "Netflix", "20": "Comedy", "35": "Thriller", "34": "Mystery",
    "33": "Family", "88": "Kids", "32": "Sports", "25": "War",
    "89": "Short", "43": "Fantasy", "24": "Science Fiction",
    "31": "Musical", "29": "Biography", "28": "Documentary",
    "27": "Romance", "26": "History", "23": "Drama", "22": "Horror",
    "21": "Crime", "19": "Adventure", "91": "Western",
}

# Arabic → English genre decode table (reference: Common.py:60-77).
CIMA_NOW_GENRES = {
    "تشويق": "Suspense", "درامي": "Drama", "اكشن": "Action",
    "رعب": "Horror", "كوميدى": "Comedy", "مغامرة": "Adventure",
    "ترفيهي": "Entertainment", "غنائي": "Musical",
    "مسابقات": "Competitions", "اجتماعي": "Social", "جريمة": "Crime",
    "اثارة": "Thriller", "رومانسى": "Romance", "عائلي": "Family",
    "كوميدي": "Comedy", "درامى": "Drama",
}


def remove_arabic_chars(string: str) -> str:
    """Drop ALL non-ASCII characters, then strip whitespace.

    Reference: Common.py:163-165 (``encode("ascii","ignore").decode().strip()``).
    """
    return string.encode("ascii", "ignore").decode().strip()


def remove_year(title: str) -> str:
    """Remove a trailing production year from a title.

    Reference: Common.py:257-264. Faithfully replicates the quirk: when the
    last 4 chars are digits and len > 4, the reference does
    ``title.replace(title[-5:], "")`` which removes *every* occurrence of
    that 5-gram (separator + year), not just the trailing one.
    """
    if title[-4:].isdigit() and len(title) > 4:
        title = title.replace(title[-5:], "")
    return title


def clean_iframe_source(iframe_source: str) -> str:
    """Extract the stream URL embedded in an iframe src.

    Reference: Common.py:360-364 —
    ``src.split("=")[2].replace("&img", "")``; "" when there are fewer
    than three '='-separated fields (IndexError path).
    """
    try:
        return iframe_source.split("=")[2].replace("&img", "")
    except IndexError:
        return ""


def normalize_title(title: str) -> str:
    """Lowercase and remove ALL whitespace — the trending join key.

    Reference: TrendingScraper.py:87-88 (``"".join(t.lower().split())``).
    """
    return "".join(title.lower().split())


def clean_anime_title(translated_title: str) -> str:
    """Post-translation anime title cleanup.

    Reference: FaselAnimeScraper.py:16-29. The ar→en translation itself is
    an external service; in this engine it is a broadcast dimension-table
    lookup (see stages/adapters.py). This function applies the cleanup the
    reference applies to the translated text: drop "Anime"/"anime"/"?",
    strip, ASCII-fold.
    """
    return (
        translated_title.replace("Anime", "")
        .replace("anime", "")
        .replace("?", "")
        .strip()
        .encode("ascii", "ignore")
        .decode()
    )


def clean_genres(genres: list[str]) -> list[str]:
    """Remove junk genres: any containing '%' or equal to '/'.

    Reference: Postprocessing.py:36-49.
    """
    return [g for g in genres if "%" not in g and g != "/"]


def decode_akwam_genres(genre_hrefs: list[str]) -> list[str]:
    """Badge hrefs → genre ids → names via AKWAM_GENRES.

    Reference: Common.py:322-332 (``tag["href"].split("=")[-1]`` then
    direct dict indexing — unknown ids raise there; we mirror with a
    KeyError-free ``[]`` only for hrefs whose id is absent, which the
    committed corpus never contains).
    """
    out = []
    for href in genre_hrefs:
        gid = href.split("=")[-1]
        if gid in AKWAM_GENRES:
            out.append(AKWAM_GENRES[gid])
    return out


def decode_cimanow_genres(raw_genres: str) -> list[str]:
    """Arabic genre string → English names (None on unknown, kept).

    Reference: CimaNowMovieScraper.py:51-52 —
    ``[CIMA_NOW_GENRES.get(g) for g in raw.split(" ، ")]`` (misses map to
    None and are *kept* in the list).
    """
    return [CIMA_NOW_GENRES.get(genre) for genre in raw_genres.split(" ، ")]


def fasel_genre_from_href(href: str) -> str:
    """Genre anchor href → last path segment, capitalized.

    Reference: Common.py:275-285 (``tag["href"].split("/")[-1].capitalize()``).
    """
    return href.split("/")[-1].capitalize()


def content_id_from_text(raw: str) -> str:
    """The fa-dot-circle id extraction: drop ':' and '#', then ASCII-fold.

    Reference: Common.py:205-214.
    """
    return remove_arabic_chars(raw.replace(":", "").replace("#", ""))


def content_format_from_text(raw: str | None) -> str:
    """Format text; 'N/A' when missing or non-ASCII.

    Reference: Common.py:189-202.
    """
    if raw is None:
        return "N/A"
    return raw if raw.isascii() else "N/A"

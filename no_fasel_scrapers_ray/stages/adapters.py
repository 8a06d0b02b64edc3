"""Site adapters: pure extraction functions per (site, page_type).

``extract_page(row, page, state)`` consumes one fetched page's span
sequence and returns ``(records, links)``:

- records: dicts with (catalog, record_type, key, series_key,
  season_key, order_key, payload) — payload is the exact JSON fragment
  the reference writer would emit (key order preserved for byte-equal
  catalogs);
- links: FRONTIER_SCHEMA dicts for the next crawl round.

Adapters are stateless pure functions (run inside ``map_batches``
tasks); cross-run incremental state (the previous catalogs, D1/D2) and
the image-index cache arrive via the broadcast ``state`` dict:
``state["old"][catalog]`` digests and ``state["images"]``.

Page-type flow per site mirrors the reference walks (citations inline).
``order_key`` is the structural discovery clock: dot-separated zero-
padded segments "{category_rank}.{shard_rank}.{page}.{card}..." —
lexicographic order == the oracle's canonical sequential order.
"""

from __future__ import annotations

import json

from ..corpus.spans import PageView
from ..functions.connectors import (
    IMGUR_PLACEHOLDER,
    mock_imgur_upload,
    mock_tmdb_id,
    mock_translate_ar_en,
)
from ..functions.hashing import stable_id
from ..functions.text import (
    clean_anime_title,
    clean_iframe_source,
    content_format_from_text,
    content_id_from_text,
    decode_akwam_genres,
    decode_cimanow_genres,
    fasel_genre_from_href,
    remove_arabic_chars,
    remove_year,
)
from ..functions.urls import url_host
from ..oracle.reference_oracle import split_into_ranges

FASEL = "https://fasel.test"
AKWAM = "https://akwam.test"
WECIMA = "https://wecima.test"
CIMANOW = "https://cimanow.test"
HDW = "https://hdw.test"

# priority rank of each category within its site = the order the
# reference runs them (ScrapeAll.py:7-12, FaselSeriesScraper.py:11-15)
CATEGORY_RANK = {
    ("fasel", "movies"): 0, ("fasel", "series"): 1, ("fasel", "tvshows"): 2,
    ("fasel", "asian-series"): 3, ("fasel", "anime"): 4,
    ("akwam", "arabic-movies"): 0, ("akwam", "arabic-series"): 1,
    ("wecima", "wecima"): 0,
    ("hdw", "hdwmovies"): 0, ("hdw", "hdwseries"): 1,
}

SERIES_PATHS = ("series", "tvshows", "asian-series")


def _key(*segs) -> str:
    return ".".join(f"{s:06d}" if isinstance(s, int) else str(s)
                    for s in segs)


def _mk_link(url, site, category, page_type, depth, order_key, meta=None):
    return {
        "url": url, "host": url_host(url), "site": site,
        "category": category, "page_type": page_type, "depth": depth,
        "seq": 0, "order_key": order_key,
        "meta": json.dumps(meta or {}, ensure_ascii=False),
    }


def _mk_record(catalog, record_type, key, order_key, payload,
               series_key="", season_key=""):
    return {
        "catalog": catalog, "record_type": record_type, "key": key,
        "series_key": series_key, "season_key": season_key,
        "order_key": order_key,
        "payload": json.dumps(payload, ensure_ascii=False),
    }


def upload_image(state: dict, image_url: str, content_id: str) -> str:
    """Common.py:217-254: image-index cache hit → cached URL; empty →
    placeholder; else (mock) imgur upload."""
    images = state.get("images", {})
    if content_id in images:
        return images[content_id]
    if image_url == "":
        return IMGUR_PLACEHOLDER
    return mock_imgur_upload(image_url)


def _listing_page_links(page: PageView, row: dict, n_pages: int,
                        url_fn) -> list[dict]:
    """Seed page → one link per listing page, ordered by the
    reference's 8-way shard ranks (split_into_ranges, Common.py:141-160)."""
    crank = CATEGORY_RANK.get((row["site"], row["category"]), 0)
    links = []
    for srank, (b, e) in enumerate(split_into_ranges(8, n_pages)):
        for p in range(b, e):
            links.append(_mk_link(
                url_fn(p), row["site"], row["category"], "listing", 0,
                _key(f"{crank:02d}", f"{srank:02d}", p)))
    return links


# ---------------------------------------------------------------------------
# fasel
# ---------------------------------------------------------------------------

def _fasel_page_count(page: PageView) -> int:
    """get_number_of_pages (Common.py:168-181)."""
    if page.first_text("paginate-last") is not None:
        return int(page.links()[0].split("/")[-1])
    return int(page.texts("page-item")[-1])


def fasel_size(row, page, state):
    cat = row["category"]
    n = _fasel_page_count(page)
    return [], _listing_page_links(
        page, row, n, lambda p: f"{FASEL}/{cat}/page/{p}")


def fasel_listing(row, page, state):
    """Listing cards → detail links carrying the card context (title
    span + poster), the analogue of passing movie_div into scrape_page
    (FaselMoviesScraper.py:14-45)."""
    links = []
    for idx, card in enumerate(page.cards(("h1",))):
        raw_title = card.first_text("h1")
        hrefs = card.links()
        medias = card.medias()
        if not hrefs or not medias:
            continue
        links.append(_mk_link(
            hrefs[0], row["site"], row["category"], "detail", 1,
            _key(row["order_key"], idx),
            {"raw_title": raw_title, "poster": medias[0]}))
    return [], links


def fasel_detail(row, page, state):
    cat = row["category"]
    meta = json.loads(row["meta"])
    if cat == "movies":
        return _fasel_detail_movie(row, page, state, meta)
    if cat in SERIES_PATHS:
        return _fasel_detail_series(row, page, state, meta)
    if cat == "anime":
        return _fasel_detail_anime(row, page, state, meta)
    raise ValueError(cat)


def _fasel_detail_movie(row, page, state, meta):
    """FaselMoviesScraper.py:17-45 incl. seen-skip (D1) and iframe-miss
    skip (M11)."""
    movie_id = _content_id(page)
    if movie_id is None or movie_id in state["old"].get("movies", {}):
        return [], []
    iframe = page.first_media()
    if iframe is None:
        return [], []
    payload = {
        "Title": remove_year(remove_arabic_chars(meta["raw_title"])),
        "Category": "movies",
        "Genres": [fasel_genre_from_href(h) for h in page.texts("genre")],
        "Format": content_format_from_text(page.first_text("play-circle")),
        "Image Source": upload_image(state, meta["poster"],
                                     movie_id + "-fasel"),
        "Source": clean_iframe_source(iframe),
    }
    return [_mk_record("movies", "record", movie_id, row["order_key"],
                       payload)], []


def _fasel_detail_series(row, page, state, meta):
    """FaselSeriesScraper.py:103-146: head record + season links; the
    old-vs-new season split happens at the season page (D2)."""
    series_id = _content_id(page)
    if series_id is None:
        return [], []
    cat = row["category"]
    head = {
        "Title": remove_year(remove_arabic_chars(meta["raw_title"])),
        "Category": cat,
        "Format": content_format_from_text(page.first_text("play-circle")),
        "Genres": [fasel_genre_from_href(h) for h in page.texts("genre")],
        "Number Of Episodes": 0,
        "Image Source": upload_image(state, meta["poster"],
                                     series_id + "-fasel"),
        "Seasons": {},
    }
    records = [_mk_record(cat, "series_head", series_id, row["order_key"],
                          head, series_key=series_id)]
    links = []
    for idx, (s_raw, s_href) in enumerate(page.marked_links("season-title")):
        season_id = s_href.split("=")[-1]
        season_number = int(remove_arabic_chars(s_raw).lstrip())
        links.append(_mk_link(
            s_href, row["site"], cat, "season", 2,
            _key(row["order_key"], idx),
            {"series_key": series_id, "season_id": season_id,
             "season_number": season_number}))
    return records, links


def _fasel_detail_anime(row, page, state, meta):
    """FaselAnimeScraper.py:80-133 incl. the count-delta (D2)."""
    anime_id = _content_id(page)
    if anime_id is None:
        return [], []
    eps = page.marked_links("ep-num")
    if not eps:
        return [], []
    current_n = len(eps)
    old = state["old"].get("anime", {})
    records, links = [], []
    if anime_id in old:
        old_n = old[anime_id]
        if current_n == old_n:
            return [], []
        records.append(_mk_record(
            "anime", "anime_delta", anime_id, row["order_key"],
            {"old_count": old_n}, series_key=anime_id))
        slice_eps = eps[old_n:]
    else:
        head = {
            "Title": clean_anime_title(mock_translate_ar_en(meta["raw_title"])),
            "Category": "anime",
            "Number Of Episodes": current_n,
            "Format": content_format_from_text(page.first_text("play-circle")),
            "Image Source": upload_image(state, meta["poster"],
                                         anime_id + "-fasel"),
            "Episodes": {},
        }
        records.append(_mk_record("anime", "series_head", anime_id,
                                  row["order_key"], head,
                                  series_key=anime_id))
        slice_eps = eps
    for idx, (ep_text, href) in enumerate(slice_eps):
        links.append(_mk_link(
            href, row["site"], "anime", "anime_episode", 2,
            _key(row["order_key"], idx),
            {"series_key": anime_id, "ep_text": ep_text,
             "is_delta": anime_id in old}))
    return records, links


def fasel_season(row, page, state):
    """scrape_season (FaselSeriesScraper.py:48-100): count episodes,
    compare with the old catalog (D2):
    - old season, same count → nothing;
    - old season, grown → episode links for [old_n:], renumbered from
      old_n, plus a season_delta row (count += n_links quirk);
    - new season (or new series) → full episode links + season row."""
    meta = json.loads(row["meta"])
    cat = row["category"]
    series_id, season_id = meta["series_key"], meta["season_id"]
    ep_links = [h for _, h in page.marked_links("epAll-mark")]
    current_n = len(ep_links)
    old_seasons = state["old"].get(cat, {}).get(series_id)
    old_n = old_seasons.get(season_id) if old_seasons else None
    records, links = [], []
    if old_n is not None:
        if current_n == old_n:
            return [], []
        new_links = ep_links[old_n:]
        records.append(_mk_record(
            cat, "season_delta", season_id, row["order_key"],
            {"n_links": len(new_links)},
            series_key=series_id, season_key=season_id))
        for idx, href in enumerate(new_links):
            links.append(_mk_link(
                href, row["site"], cat, "episode", 3,
                _key(row["order_key"], idx),
                {"series_key": series_id, "season_id": season_id,
                 "ep_number": old_n + idx + 1, "is_delta": True}))
        return records, links
    season_is_orphan = old_seasons is not None  # new season of known
    # series: scraped but discarded by the old-wins merge
    # (FaselSeriesScraper.py:90-100 + :217) — flagged for the writer
    records.append(_mk_record(
        cat, "season", season_id, row["order_key"],
        {"Season Number": meta["season_number"],
         "Number Of Episodes": current_n,
         "orphan": season_is_orphan},
        series_key=series_id, season_key=season_id))
    for idx, href in enumerate(ep_links):
        links.append(_mk_link(
            href, row["site"], cat, "episode", 3,
            _key(row["order_key"], idx),
            {"series_key": series_id, "season_id": season_id,
             "ep_number": idx + 1, "is_delta": False}))
    return records, links


def fasel_episode(row, page, state):
    """scrape_episodes (FaselSeriesScraper.py:18-45): liskSh id +
    cleaned iframe; missing either → skip."""
    meta = json.loads(row["meta"])
    lisk = page.first_text("liskSh")
    iframe = page.first_media()
    if lisk is None or iframe is None:
        return [], []
    episode_id = lisk.split("=")[-1]
    payload = {
        "Episode Number": meta["ep_number"],
        "Source": clean_iframe_source(iframe),
    }
    rt = "episode_delta" if meta.get("is_delta") else "episode"
    return [_mk_record(row["category"], rt, episode_id, row["order_key"],
                       payload, series_key=meta["series_key"],
                       season_key=meta["season_id"])], []


def fasel_anime_episode(row, page, state):
    """get_iframe_source (FaselAnimeScraper.py:32-57): dot-circle id,
    RAW iframe, number from the anchor text."""
    meta = json.loads(row["meta"])
    episode_id = _content_id(page)
    iframe = page.first_media()
    if iframe is None:
        return [], []
    payload = {
        "Episode Number": int(remove_arabic_chars(meta["ep_text"]).strip()),
        "Source": iframe,
    }
    rt = "episode_delta" if meta.get("is_delta") else "episode"
    return [_mk_record("anime", rt, episode_id, row["order_key"], payload,
                       series_key=meta["series_key"],
                       season_key=meta["series_key"])], []


def _content_id(page: PageView) -> str | None:
    raw = page.first_text("dot-circle")
    return None if raw is None else content_id_from_text(raw)


# ---------------------------------------------------------------------------
# akwam
# ---------------------------------------------------------------------------

def akwam_size(row, page, state):
    """akwam_get_last_page_number: page-link[-3] (Common.py:302-307)."""
    n = int(page.texts("page-link")[-3])
    base = row["url"]
    return [], _listing_page_links(
        page, row, n, lambda p: f"{base}&page={p}")


def akwam_listing(row, page, state):
    links = []
    for idx, (_, href) in enumerate(page.marked_links("icn-play-mark")):
        links.append(_mk_link(
            href, "akwam", row["category"], "detail", 1,
            _key(row["order_key"], idx)))
    return [], links


def akwam_detail(row, page, state):
    if row["category"] == "arabic-movies":
        return _akwam_detail_movie(row, page, state)
    return _akwam_detail_series(row, page, state)


def _akwam_detail_movie(row, page, state):
    """get_movie (AkwamMoviesScaper.py:10-36) — no seen-check."""
    movie_id = row["url"].split("/")[4]
    title = page.first_text("entry-title").strip()
    image_url = page.medias()[0]
    short_id = [h for _, h in page.marked_links("link-btn-mark")][0] \
        .split("/")[-1]
    payload = {
        "Title": title,
        "Category": "arabic-movies",
        "Genres": decode_akwam_genres(page.texts("badge")),
        "Image Source": upload_image(state, image_url,
                                     movie_id + "-akwam-movies"),
        "Source": f"{AKWAM}/watch/{short_id}/{movie_id}",
    }
    return [_mk_record("arabic-movies", "record", movie_id,
                       row["order_key"], payload)], []


def _akwam_detail_series(row, page, state):
    """scrape_series (AkwamSeriesScraper.py:57-112): count-equal skip
    (D2 akwam flavor: full rescrape on change)."""
    series_id = row["url"].split("/")[-2]
    ep_links = [h for _, h in page.marked_links("h2-18-mark")]
    current_n = len(ep_links)
    old = state["old"].get("arabic-series", {})
    if series_id in old and old[series_id] == current_n:
        return [], []
    title = page.first_text("entry-title").strip()
    image_url = page.medias()[0]
    head = {
        "Title": title,
        "Category": "arabic-series",
        "Number Of Episodes": current_n,
        "Format": "WEB-DL",
        "Genres": decode_akwam_genres(page.texts("badge")),
        "Image Source": upload_image(state, image_url,
                                     series_id + "-akwam-series"),
        "Episodes": {},
    }
    records = [_mk_record("arabic-series", "series_head", series_id,
                          row["order_key"], head, series_key=series_id)]
    links = []
    for idx, href in enumerate(ep_links):
        episode_id = href.split("/")[4]
        links.append(_mk_link(
            href, "akwam", "arabic-series", "ep_select", 2,
            _key(row["order_key"], idx),
            {"series_key": series_id, "episode_id": episode_id}))
    return records, links


def akwam_ep_select(row, page, state):
    """Hop 1 of the 3-hop walk (AkwamSeriesScraper.py:21-27)."""
    meta = json.loads(row["meta"])
    shorts = [h for _, h in page.marked_links("link-btn-mark")]
    if not shorts:
        return [], []
    return [], [_mk_link(shorts[0], "akwam", "arabic-series", "short", 3,
                         _key(row["order_key"], 0), meta)]


def akwam_short(row, page, state):
    """Hop 2 (AkwamSeriesScraper.py:32-36)."""
    meta = json.loads(row["meta"])
    watches = [h for _, h in page.marked_links("download-link-mark")]
    if not watches:
        return [], []
    return [], [_mk_link(watches[0], "akwam", "arabic-series", "watch", 4,
                         _key(row["order_key"], 0), meta)]


def akwam_watch(row, page, state):
    """Hop 3 (AkwamSeriesScraper.py:38-52): number from the h2 text,
    Source = the watch page URL itself."""
    meta = json.loads(row["meta"])
    raw = page.first_text("h2-bold")
    episode_number = int(remove_arabic_chars(raw).split("\n")[0])
    payload = {"Episode Number": episode_number, "Source": row["url"]}
    return [_mk_record("arabic-series", "episode", meta["episode_id"],
                       row["order_key"], payload,
                       series_key=meta["series_key"],
                       season_key=meta["series_key"])], []


# ---------------------------------------------------------------------------
# wecima
# ---------------------------------------------------------------------------

def wecima_size(row, page, state):
    """page-numbers li[-2] (WeCimaScraper.py:10-14)."""
    n = int(page.texts("page-num")[-2])
    return [], _listing_page_links(
        page, row, n,
        lambda p: f"{WECIMA}/download-series/?page_number={p}/")


def wecima_listing(row, page, state):
    """scrape_pages (WeCimaScraper.py:17-57): self-contained cards with
    seen-skip (D1)."""
    old = state["old"].get("WeCima", {})
    records = []
    for idx, card in enumerate(page.cards(("grid-id",))):
        div_id = card.first_text("grid-id")
        if div_id in old:
            continue
        payload = {
            "Title": card.first_text("hasyear").split("-")[0].strip(),
            "Image Source": card.medias()[0]
                                .replace("--image:url(", "").replace(");", ""),
            "Season Number": remove_arabic_chars(
                card.first_text("anchor-title")),
            "Source": card.links()[0].replace(f"{WECIMA}/series/", ""),
        }
        records.append(_mk_record("WeCima", "record", div_id,
                                  _key(row["order_key"], idx), payload))
    return records, []


# ---------------------------------------------------------------------------
# cimanow
# ---------------------------------------------------------------------------

def cimanow_size(row, page, state):
    """cima_now_get_last_page (Common.py:388-389); pages 1..last
    sequential (CimaNowMovieScraper.py:30), no 8-way sharding."""
    last = int(page.texts("pg-li")[-1])
    crank = json.loads(row["meta"]).get("route_rank", 0)
    base = row["url"]
    links = []
    for p in range(1, last + 1):
        links.append(_mk_link(
            f"{base}/page/{p}", "cimanow", row["category"], "listing", 0,
            _key(f"{crank:02d}", "00", p)))
    return [], links


def cimanow_listing(row, page, state):
    """scrape_route cards (CimaNowMovieScraper.py:38-71): deterministic
    id (stable_id — documented deviation from builtin hash), seen-skip,
    then the watch-page fetch for sources."""
    old = state["old"].get("CimaNowMovies", {})
    links = []
    for idx, card in enumerate(page.cards(("card-em",))):
        raw_genres = card.first_text("card-em")
        title = card.first_text("card-li").replace(raw_genres, "").strip()
        movie_id = stable_id(title)
        if movie_id in old:
            continue
        href_slug = card.links()[0].split("/")[-2]
        links.append(_mk_link(
            f"{CIMANOW}/{href_slug}/watching", "cimanow", row["category"],
            "watch", 1, _key(row["order_key"], idx),
            {"title": title, "movie_id": movie_id,
             "poster": card.medias()[0], "raw_genres": raw_genres}))
    return [], links


def cimanow_watch(row, page, state):
    """cima_now_get_sources (Common.py:392-394) + record assembly
    (CimaNowMovieScraper.py:64-71)."""
    meta = json.loads(row["meta"])
    sources = [{q.split(" ")[0]: h} for q, h in page.marked_medias("dl")]
    payload = {
        "Title": meta["title"],
        "Image Source": meta["poster"],
        "Genres": decode_cimanow_genres(meta["raw_genres"]),
        "Sources": sources,
        "Category": "cimanow-movie",
        "TMDb ID": mock_tmdb_id(meta["title"], "movies"),
    }
    return [_mk_record("CimaNowMovies", "record", meta["movie_id"],
                       row["order_key"], payload)], []


# ---------------------------------------------------------------------------
# hdw
# ---------------------------------------------------------------------------

def hdw_size(row, page, state):
    """hdw_get_last_page_number: page-link[-2] (Common.py:335-339) with
    the call sites' +2 fudge (HDWMoviesScraper.py:57-60)."""
    last = int(page.texts("page-link")[-2])
    base = row["url"]
    return [], _listing_page_links(
        page, row, last + 2, lambda p: f"{base}?page={p}")


def hdw_movies_listing(row, page, state):
    """scrape_page_range (HDWMoviesScraper.py:12-51): self-contained
    cards, seen-skip."""
    old = state["old"].get("hdwmovies", {})
    records = []
    for idx, card in enumerate(page.cards(("span-title",))):
        hrefs = card.links()
        if not hrefs:
            continue
        href = hrefs[0]
        movie_id = href.split("/")[-2]
        if movie_id in old:
            continue
        rating = card.first_text("rating")
        payload = {
            "Title": card.first_text("span-title"),
            "Category": "hdwmovies",
            "Image Source": card.medias()[0],
            "Genres": [g.strip() for g in
                       card.first_text("views").split(", ")],
            "Source": f"{HDW}/free{href}",
            "Rating": rating.replace(",", ".").strip()
                      if rating is not None else None,
        }
        records.append(_mk_record("hdwmovies", "record", movie_id,
                                  _key(row["order_key"], idx), payload))
    return records, []


def hdw_series_listing(row, page, state):
    """HDWSeriesScraper.py:8-31: head record from the card + the series
    page link (no seen-check in the reference)."""
    records, links = [], []
    for idx, card in enumerate(page.cards(("a-title",))):
        hrefs = card.links()
        if not hrefs:
            continue
        href = hrefs[0]
        series_id = href.split("/")[2]
        rating = card.first_text("rating")
        head = {
            "Title": card.first_text("a-title"),
            "Category": "hdwseries",
            "Genres": [g.strip() for g in
                       card.first_text("views").split(", ")],
            "Image Source": card.medias()[0],
            "Rating": rating.replace(",", ".").strip()
                      if rating is not None else None,
            "Seasons": {},
        }
        ok = _key(row["order_key"], idx)
        records.append(_mk_record("hdwseries", "series_head", series_id,
                                  ok, head, series_key=series_id))
        links.append(_mk_link(f"{HDW}{href}", "hdw", "hdwseries",
                              "series", 1, ok, {"series_key": series_id}))
    return records, links


def hdw_series_page(row, page, state):
    """HDWSeriesScraper.py:31-91: season buttons → season pages; no
    seasons → episodes inline under a synthetic season (number 1, INT —
    unlike real seasons whose number is the raw STRING)."""
    meta = json.loads(row["meta"])
    series_id = meta["series_key"]
    season_links = [h for _, h in page.marked_links("season-btn-mark")]
    records, links = [], []
    if not season_links:
        eps = _hdw_episode_records(row, page, "hdwseries", series_id,
                                   series_id)
        records.append(_mk_record(
            "hdwseries", "season", series_id, _key(row["order_key"], 0),
            {"Season Number": 1, "Number Of Episodes": len(eps)},
            series_key=series_id, season_key=series_id))
        records.extend(eps)
        return records, []
    for idx, s_href in enumerate(season_links):
        season_number = s_href.split("=")[-1]
        season_id = s_href.split("/")[-2] + season_number
        links.append(_mk_link(
            f"{HDW}{s_href}", "hdw", "hdwseries", "season", 2,
            _key(row["order_key"], idx),
            {"series_key": series_id, "season_id": season_id,
             "season_number": season_number}))
    return records, links


def hdw_season(row, page, state):
    meta = json.loads(row["meta"])
    eps = _hdw_episode_records(row, page, "hdwseries", meta["series_key"],
                               meta["season_id"])
    rec = _mk_record(
        "hdwseries", "season", meta["season_id"],
        _key(row["order_key"], 0),
        {"Season Number": meta["season_number"],
         "Number Of Episodes": len(eps)},
        series_key=meta["series_key"], season_key=meta["season_id"])
    return [rec] + eps, []


def _hdw_episode_records(row, page, catalog, series_key, season_key):
    """Episode-number parse with the ValueError fallback
    (HDWSeriesScraper.py:43-46)."""
    out = []
    for idx, (_, href) in enumerate(page.marked_links("content-info-mark")):
        episode_id = href.split("/")[-2]
        try:
            episode_number = int(href.split("-")[-2])
        except ValueError:
            episode_number = int(href.split("-")[-1])
        out.append(_mk_record(
            catalog, "episode", episode_id,
            _key(row["order_key"], 1, idx),
            {"Episode Number": int(episode_number),
             "Source": f"{HDW}{href}"},
            series_key=series_key, season_key=season_key))
    return out


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

HANDLERS = {
    ("fasel", "size"): fasel_size,
    ("fasel", "listing"): fasel_listing,
    ("fasel", "detail"): fasel_detail,
    ("fasel", "season"): fasel_season,
    ("fasel", "episode"): fasel_episode,
    ("fasel", "anime_episode"): fasel_anime_episode,
    ("akwam", "size"): akwam_size,
    ("akwam", "listing"): akwam_listing,
    ("akwam", "detail"): akwam_detail,
    ("akwam", "ep_select"): akwam_ep_select,
    ("akwam", "short"): akwam_short,
    ("akwam", "watch"): akwam_watch,
    ("wecima", "size"): wecima_size,
    ("wecima", "listing"): wecima_listing,
    ("cimanow", "size"): cimanow_size,
    ("cimanow", "listing"): cimanow_listing,
    ("cimanow", "watch"): cimanow_watch,
    ("hdw", "size"): hdw_size,
}


def extract_page(row: dict, page: PageView, state: dict):
    """Dispatch one fetched page to its adapter → (records, links)."""
    site, pt = row["site"], row["page_type"]
    if site == "hdw" and pt == "listing":
        handler = (hdw_movies_listing if row["category"] == "hdwmovies"
                   else hdw_series_listing)
    elif site == "hdw" and pt == "series":
        handler = hdw_series_page
    elif site == "hdw" and pt == "season":
        handler = hdw_season
    else:
        handler = HANDLERS[(site, pt)]
    return handler(row, page, state)


def seed_rows(seeds: list[dict]) -> list[dict]:
    """Seed table rows → round-0 frontier rows (page_type='size')."""
    out = []
    for s in seeds:
        site, cat, url = s["site"], s["category"], s["url"]
        if site == "cimanow":
            # route rank = seed order within the site
            rank = len([x for x in out if x["site"] == "cimanow"])
            meta = {"route_rank": rank}
            crank = rank
        else:
            cat = _seed_category(site, cat)
            meta = {}
            crank = CATEGORY_RANK.get((site, cat), 0)
        out.append(_mk_link(url, site, cat, "size", 0, f"{crank:02d}",
                            meta))
    return out


def _seed_category(site: str, category: str) -> str:
    """Map generator seed categories to catalog names."""
    if site == "akwam":
        return "arabic-movies" if category == "movies" else "arabic-series"
    if site == "hdw":
        return "hdwmovies" if category == "movies" else "hdwseries"
    if site == "wecima":
        return "wecima"
    return category

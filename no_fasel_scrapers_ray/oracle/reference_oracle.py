"""Single-threaded reimplementation of the reference scrapers' semantics
over the synthetic span corpus — the equality oracle for the engine
(SURVEY.md §5.2 step 2).

Every method mirrors one reference scraper's walk + extraction, applied
to PageView spans instead of BeautifulSoup trees, with the reference's
quirks preserved (seen-set skips, episode-count deltas, merge
precedence, dropped new-seasons-of-known-series, renumber-from-old-
count). The canonical visit order is the deterministic sequential order
(shard rank from split_into_ranges(8, ...), then page, then card) —
SURVEY.md §7.3's resolution of the reference's thread-timing races.

The oracle shares ONLY the span-access helpers (corpus/spans.py), the
pure string functions (functions/text.py) and the connector mocks with
the engine; the walk, scheduling and assembly code paths are fully
independent.
"""

from __future__ import annotations

from ..corpus.spans import PageView
from ..functions.connectors import (
    IMGUR_PLACEHOLDER,
    mock_imgur_upload,
    mock_tmdb_id,
    mock_translate_ar_en,
)
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
from ..functions.hashing import stable_id

FASEL = "https://fasel.test"
AKWAM = "https://akwam.test"
WECIMA = "https://wecima.test"
CIMANOW = "https://cimanow.test"
HDW = "https://hdw.test"

CIMANOW_ROUTES_ORACLE = None  # filled from synth at call time


def split_into_ranges(number_of_ranges: int, range_end: int,
                      range_start: int = 0) -> list[tuple[int, int]]:
    """Exact replica of the reference's static partitioner semantics
    (Common.py:141-160) including the dropped-empty/duplicate quirk."""
    number_to_be_split = range_end - range_start
    number_per_chunk = number_to_be_split // number_of_ranges
    ranges_list: list[tuple[int, int]] = []
    for number in range(number_of_ranges):
        begin = range_start + (number_per_chunk * number)
        if number == number_of_ranges - 1:
            end = range_end
        else:
            end = range_start + (number_per_chunk * (number + 1))
        if (begin + 1, end + 1) in ranges_list or (begin + 1 == end + 1):
            continue
        ranges_list.append((begin + 1, end + 1))
    return ranges_list


class Oracle:
    def __init__(self, corpus_table, image_sources: dict | None = None,
                 old_catalogs: dict | None = None):
        doc_ids = corpus_table["doc_id"].to_pylist()
        spans = corpus_table["spans"].to_pylist()
        self.pages = {d: PageView(s) for d, s in zip(doc_ids, spans)}
        import json as _json
        self.image_sources = dict(image_sources or {})
        # deep copy: the delta logic mutates nested season/episode dicts
        # in place (as the reference mutates old_series_dict) — the
        # caller's dict must stay pristine
        self.old = _json.loads(_json.dumps(old_catalogs or {}))
        self.visits: list[tuple[str, str, str, int]] = []  # url site cat depth
        self.catalogs: dict[str, dict] = {}

    # -- fetch -------------------------------------------------------------

    def fetch(self, url: str, site: str, category: str, depth: int) -> PageView | None:
        self.visits.append((url, site, category, depth))
        return self.pages.get(url)

    def seen_set(self) -> set[str]:
        return {v[0] for v in self.visits}

    # -- shared extractors -------------------------------------------------

    def upload_image(self, image_url: str, content_id: str) -> str:
        """Common.py:217-254 minus the real POST (mocked)."""
        if content_id in self.image_sources:
            return self.image_sources[content_id]
        if image_url == "":
            return IMGUR_PLACEHOLDER
        return mock_imgur_upload(image_url)

    @staticmethod
    def get_content_id(page: PageView) -> str | None:
        raw = page.first_text("dot-circle")
        return None if raw is None else content_id_from_text(raw)

    @staticmethod
    def get_content_title(raw_title: str) -> str:
        return remove_year(remove_arabic_chars(raw_title))

    @staticmethod
    def get_genres(page: PageView) -> list[str]:
        return [fasel_genre_from_href(h) for h in page.texts("genre")]

    @staticmethod
    def get_format(page: PageView) -> str:
        return content_format_from_text(page.first_text("play-circle"))

    # -- fasel movies (FaselMoviesScraper.py) ------------------------------

    def crawl_fasel_movies(self) -> dict:
        old = self.old.get("movies", {})
        base = f"{FASEL}/movies"
        listing = self.fetch(base, "fasel", "movies", 0)
        n_pages = self._fasel_page_count(listing)
        out: dict = {}
        for (b, e) in split_into_ranges(8, n_pages):
            for p in range(b, e):
                page = self.fetch(f"{base}/page/{p}", "fasel", "movies", 0)
                for card in page.cards(("h1",)):
                    raw_title = card.first_text("h1")
                    detail_url = card.links()[0]
                    poster = card.medias()[0]
                    detail = self.fetch(detail_url, "fasel", "movies", 1)
                    if detail is None:
                        continue
                    movie_id = self.get_content_id(detail)
                    if movie_id in old or movie_id is None:
                        continue
                    iframe = detail.first_media()
                    if iframe is None:  # M11 TypeError → skip
                        continue
                    out[movie_id] = {
                        "Title": self.get_content_title(raw_title),
                        "Category": "movies",
                        "Genres": self.get_genres(detail),
                        "Format": self.get_format(detail),
                        "Image Source": self.upload_image(
                            poster, movie_id + "-fasel"),
                        "Source": clean_iframe_source(iframe),
                    }
        merged = dict(old)
        merged.update(out)  # new wins (FaselMoviesScraper.py:100-101)
        self.catalogs["movies"] = merged
        return merged

    def _fasel_page_count(self, listing: PageView) -> int:
        """get_number_of_pages (Common.py:168-181): » button href's last
        segment, else last li.page-item text."""
        if listing.first_text("paginate-last") is not None:
            href = listing.links()[0]
            return int(href.split("/")[-1])
        return int(listing.texts("page-item")[-1])

    # -- fasel series family (FaselSeriesScraper.py) -----------------------

    def crawl_fasel_series(self, path: str) -> dict:
        old = self.old.get(path, {})
        base = f"{FASEL}/{path}"
        listing = self.fetch(base, "fasel", path, 0)
        n_pages = self._fasel_page_count(listing)
        new: dict = {}
        for (b, e) in split_into_ranges(8, n_pages):
            for p in range(b, e):
                page = self.fetch(f"{base}/page/{p}", "fasel", path, 0)
                for card in page.cards(("h1",)):
                    raw_title = card.first_text("h1")
                    detail_url = card.links()[0]
                    poster = card.medias()[0]
                    detail = self.fetch(detail_url, "fasel", path, 1)
                    series_id = self.get_content_id(detail)
                    if series_id is None:
                        # reference returns {} for the whole div chunk
                        # (FaselSeriesScraper.py:113-114); sequential oracle
                        # order makes that equivalent to skipping the card
                        continue
                    entry = {
                        "Title": self.get_content_title(raw_title),
                        "Category": path,
                        "Format": self.get_format(detail),
                        "Genres": self.get_genres(detail),
                        "Number Of Episodes": 0,
                        "Image Source": self.upload_image(
                            poster, series_id + "-fasel"),
                        "Seasons": {},
                    }
                    total = 0
                    for s_raw, s_href in detail.marked_links("season-title"):
                        season_id = s_href.split("=")[-1]
                        season_number = int(remove_arabic_chars(s_raw).lstrip())
                        sdict = self._fasel_scrape_season(
                            path, old, series_id, season_id, season_number,
                            s_href)
                        for sk, sv in sdict.items():
                            entry["Seasons"][sk] = sv
                            total += sv["Number Of Episodes"]
                    entry["Number Of Episodes"] = total
                    new[series_id] = entry
        combined = dict(new)
        combined.update(old)  # OLD wins (FaselSeriesScraper.py:217)
        self.catalogs[path] = combined
        return combined

    def _fasel_scrape_season(self, path, old, series_id, season_id,
                             season_number, season_url) -> dict:
        """scrape_season (FaselSeriesScraper.py:48-100) incl. D2 delta:
        known season with same count → skip; known season grown → append
        renumbered episodes into OLD entry, return {}; new season → full."""
        page = self.fetch(season_url, "fasel", path, 2)
        ep_links = [href for _, href in page.marked_links("epAll-mark")]
        current_n = len(ep_links)
        old_season = (old.get(series_id, {}).get("Seasons", {})
                      .get(season_id)) if series_id in old else None
        if old_season is not None:
            old_n = old_season["Number Of Episodes"]
            if current_n == old_n:
                return {}
            raw_new = ep_links[old_n:]
            old_season["Number Of Episodes"] += len(raw_new)
            new_eps = self._fasel_scrape_episodes(path, raw_new, old_n)
            old_season["Episodes"].update(new_eps)
            return {}
        return {season_id: {
            "Season Number": season_number,
            "Number Of Episodes": current_n,
            "Episodes": self._fasel_scrape_episodes(path, ep_links, 0),
        }}

    def _fasel_scrape_episodes(self, path, ep_links, last_n) -> dict:
        """scrape_episodes (FaselSeriesScraper.py:18-45)."""
        out = {}
        for index, href in enumerate(ep_links, start=1):
            page = self.fetch(href, "fasel", path, 3)
            if page is None:
                continue
            lisk = page.first_text("liskSh")
            iframe = page.first_media()
            if lisk is None or iframe is None:
                continue
            episode_id = lisk.split("=")[-1]
            out[episode_id] = {
                "Episode Number": last_n + index,
                "Source": clean_iframe_source(iframe),
            }
        return out

    # -- fasel anime (FaselAnimeScraper.py) --------------------------------

    def crawl_fasel_anime(self) -> dict:
        old = self.old.get("anime", {})
        base = f"{FASEL}/anime"
        listing = self.fetch(base, "fasel", "anime", 0)
        n_pages = self._fasel_page_count(listing)
        new: dict = {}
        for (b, e) in split_into_ranges(8, n_pages):
            for p in range(b, e):
                page = self.fetch(f"{base}/page/{p}", "fasel", "anime", 0)
                for card in page.cards(("h1",)):
                    raw_title = card.first_text("h1")
                    detail_url = card.links()[0]
                    poster = card.medias()[0]
                    detail = self.fetch(detail_url, "fasel", "anime", 1)
                    anime_id = self.get_content_id(detail)
                    if anime_id is None:
                        continue
                    eps = detail.marked_links("ep-num")
                    if not eps:  # no epAll div → AttributeError → skip
                        continue
                    current_n = len(eps)
                    if anime_id in old:
                        old_n = old[anime_id]["Number Of Episodes"]
                        if current_n == old_n:
                            continue
                        # scrape only episodes[old_n:] via split ranges
                        new_eps = self._anime_scrape_episodes(
                            eps[old_n:])
                        old[anime_id]["Number Of Episodes"] += len(new_eps)
                        old[anime_id]["Episodes"].update(new_eps)
                        continue
                    new[anime_id] = {
                        "Title": clean_anime_title(
                            mock_translate_ar_en(raw_title)),
                        "Category": "anime",
                        "Number Of Episodes": current_n,
                        "Format": self.get_format(detail),
                        "Image Source": self.upload_image(
                            poster, anime_id + "-fasel"),
                        "Episodes": self._anime_scrape_episodes(eps),
                    }
        merged = dict(old)
        merged.update(new)  # new wins (FaselAnimeScraper.py:158-159)
        self.catalogs["anime"] = merged
        return merged

    def _anime_scrape_episodes(self, eps) -> dict:
        """get_iframe_source (FaselAnimeScraper.py:32-57): episode id via
        dot-circle, episode number from the anchor text, RAW iframe."""
        out = {}
        for ep_text, href in eps:
            page = self.fetch(href, "fasel", "anime", 2)
            if page is None:
                continue
            episode_id = self.get_content_id(page)
            iframe = page.first_media()
            if iframe is None:
                continue
            out[episode_id] = {
                "Episode Number": int(remove_arabic_chars(ep_text).strip()),
                "Source": iframe,
            }
        return out

    # -- akwam (AkwamMoviesScaper.py / AkwamSeriesScraper.py) --------------

    def _akwam_listing_pages(self, kind: str, category: str):
        base = (f"{AKWAM}/{kind}?section=0&category=0&rating=0&year=0"
                f"&language=1&formats=0&quality=0")
        listing = self.fetch(base, "akwam", category, 0)
        n_pages = int(listing.texts("page-link")[-3])
        for (b, e) in split_into_ranges(8, n_pages):
            for p in range(b, e):
                page = self.fetch(f"{base}&page={p}", "akwam", category, 0)
                for _, href in page.marked_links("icn-play-mark"):
                    yield href

    def crawl_akwam_movies(self) -> dict:
        out: dict = {}
        for link in self._akwam_listing_pages("movies", "arabic-movies"):
            page = self.fetch(link, "akwam", "arabic-movies", 1)
            movie_id = link.split("/")[4]
            title = page.first_text("entry-title").strip()
            image_url = page.medias()[0]
            short_id = [h for _, h in page.marked_links("link-btn-mark")][0] \
                .split("/")[-1]
            out[movie_id] = {
                "Title": title,
                "Category": "arabic-movies",
                "Genres": decode_akwam_genres(page.texts("badge")),
                "Image Source": self.upload_image(
                    image_url, movie_id + "-akwam-movies"),
                "Source": f"{AKWAM}/watch/{short_id}/{movie_id}",
            }
        # AkwamMoviesScaper writes master_dict only (no old merge,
        # AkwamMoviesScaper.py:68-77)
        self.catalogs["arabic-movies"] = out
        return out

    def crawl_akwam_series(self) -> dict:
        old = self.old.get("arabic-series", {})
        new: dict = {}
        for link in self._akwam_listing_pages("series", "arabic-series"):
            series_id = link.split("/")[-2]
            page = self.fetch(link, "akwam", "arabic-series", 1)
            title = page.first_text("entry-title").strip()
            image_url = page.medias()[0]
            ep_links = [h for _, h in page.marked_links("h2-18-mark")]
            current_n = len(ep_links)
            if series_id in old and \
                    old[series_id]["Number Of Episodes"] == current_n:
                continue
            entry = {
                "Title": title,
                "Category": "arabic-series",
                "Number Of Episodes": current_n,
                "Format": "WEB-DL",
                "Genres": decode_akwam_genres(page.texts("badge")),
                "Image Source": self.upload_image(
                    image_url, series_id + "-akwam-series"),
                "Episodes": {},
            }
            for ep_link in ep_links:
                ep = self._akwam_scrape_episode(ep_link)
                if ep is not None:
                    entry["Episodes"].update(ep)
            entry["Number Of Episodes"] = len(entry["Episodes"])
            new[series_id] = entry
        merged = dict(old)
        merged.update(new)  # new wins (AkwamSeriesScraper.py:148-149)
        self.catalogs["arabic-series"] = merged
        return merged

    def _akwam_scrape_episode(self, ep_link) -> dict | None:
        """The 3-hop walk (AkwamSeriesScraper.py:13-54)."""
        episode_id = ep_link.split("/")[4]
        select = self.fetch(ep_link, "akwam", "arabic-series", 2)
        shorts = [h for _, h in select.marked_links("link-btn-mark")]
        if not shorts:
            return None
        short_page = self.fetch(shorts[0], "akwam", "arabic-series", 3)
        watches = [h for _, h in short_page.marked_links("download-link-mark")]
        if not watches:
            return None
        watch_url = watches[0]
        watch = self.fetch(watch_url, "akwam", "arabic-series", 4)
        raw = watch.first_text("h2-bold")
        episode_number = int(remove_arabic_chars(raw).split("\n")[0])
        return {episode_id: {"Episode Number": episode_number,
                             "Source": watch_url}}

    # -- wecima (WeCimaScraper.py) -----------------------------------------

    def crawl_wecima(self) -> dict:
        old = self.old.get("WeCima", {})
        base = f"{WECIMA}/download-series/"
        listing = self.fetch(base, "wecima", "wecima", 0)
        n_pages = int(listing.texts("page-num")[-2])
        new: dict = {}
        for (b, e) in split_into_ranges(8, n_pages):
            for p in range(b, e):
                page = self.fetch(f"{base}?page_number={p}/",
                                  "wecima", "wecima", 0)
                for card in page.cards(("grid-id",)):
                    div_id = card.first_text("grid-id")
                    if div_id in old:
                        continue
                    href = card.links()[0]
                    new[div_id] = {
                        "Title": card.first_text("hasyear")
                                     .split("-")[0].strip(),
                        "Image Source": card.medias()[0]
                                            .replace("--image:url(", "")
                                            .replace(");", ""),
                        "Season Number": remove_arabic_chars(
                            card.first_text("anchor-title")),
                        "Source": href.replace(f"{WECIMA}/series/", ""),
                    }
        merged = dict(old)
        merged.update(new)  # new wins (WeCimaScraper.py:71-72)
        self.catalogs["WeCima"] = merged
        return merged

    # -- cimanow (CimaNowMovieScraper.py) ----------------------------------

    def crawl_cimanow(self, routes: list[str]) -> dict:
        old = self.old.get("CimaNowMovies", {})
        new: dict = {}
        for route in routes:
            base = f"{CIMANOW}/category/{route}"
            listing = self.fetch(base, "cimanow", route, 0)
            last_page = int(listing.texts("pg-li")[-1])
            for p in range(1, last_page + 1):
                page = self.fetch(f"{base}/page/{p}", "cimanow", route, 0)
                for card in page.cards(("card-em",)):
                    raw_genres = card.first_text("card-em")
                    title = card.first_text("card-li") \
                        .replace(raw_genres, "").strip()
                    genres = decode_cimanow_genres(raw_genres)
                    movie_id = stable_id(title)
                    if movie_id in old:
                        continue
                    href_slug = card.links()[0].split("/")[-2]
                    watch = self.fetch(f"{CIMANOW}/{href_slug}/watching",
                                       "cimanow", route, 1)
                    sources = [{q.split(" ")[0]: h}
                               for q, h in watch.marked_medias("dl")]
                    new[movie_id] = {
                        "Title": title,
                        "Image Source": card.medias()[0],
                        "Genres": genres,
                        "Sources": sources,
                        "Category": "cimanow-movie",
                        "TMDb ID": mock_tmdb_id(title, "movies"),
                    }
        merged = dict(old)
        merged.update(new)  # new wins (CimaNowMovieScraper.py:87-88)
        self.catalogs["CimaNowMovies"] = merged
        return merged

    # -- hdw (HDWMoviesScraper.py / HDWSeriesScraper.py) -------------------

    def crawl_hdw_movies(self) -> dict:
        old = self.old.get("hdwmovies", {})
        listing = self.fetch(f"{HDW}/movies", "hdw", "hdwmovies", 0)
        last = int(listing.texts("page-link")[-2])
        new: dict = {}
        for (b, e) in split_into_ranges(8, last + 2):
            for p in range(b, e):
                page = self.fetch(f"{HDW}/movies?page={p}", "hdw",
                                  "hdwmovies", 0)
                for card in page.cards(("span-title",)):
                    href = card.links()[0]
                    movie_id = href.split("/")[-2]
                    if movie_id in old:
                        continue
                    new[movie_id] = {
                        "Title": card.first_text("span-title"),
                        "Category": "hdwmovies",
                        "Image Source": card.medias()[0],
                        "Genres": [g.strip() for g in
                                   card.first_text("views").split(", ")],
                        "Source": f"{HDW}/free{href}",
                        "Rating": (card.first_text("rating") or "")
                                  .replace(",", ".").strip() or None,
                    }
        merged = dict(old)
        merged.update(new)  # new wins (HDWMoviesScraper.py:70-71)
        self.catalogs["hdwmovies"] = merged
        return merged

    def crawl_hdw_series(self) -> dict:
        listing = self.fetch(f"{HDW}/tv-shows", "hdw", "hdwseries", 0)
        last = int(listing.texts("page-link")[-2])
        out: dict = {}
        for (b, e) in split_into_ranges(8, last + 2):
            for p in range(b, e):
                page = self.fetch(f"{HDW}/tv-shows?page={p}", "hdw",
                                  "hdwseries", 0)
                for card in page.cards(("a-title",)):
                    href = card.links()[0]
                    series_id = href.split("/")[2]
                    entry = {
                        "Title": card.first_text("a-title"),
                        "Category": "hdwseries",
                        "Genres": [g.strip() for g in
                                   card.first_text("views").split(", ")],
                        "Image Source": card.medias()[0],
                        "Rating": (card.first_text("rating") or "")
                                  .replace(",", ".").strip() or None,
                        "Seasons": {},
                    }
                    out[series_id] = entry
                    sp = self.fetch(f"{HDW}{href}", "hdw", "hdwseries", 1)
                    season_links = [h for _, h in
                                    sp.marked_links("season-btn-mark")]
                    if not season_links:
                        eps = self._hdw_episodes(sp)
                        entry["Seasons"][series_id] = {
                            "Season Number": 1,
                            "Number Of Episodes": len(eps),
                            "Episodes": eps,
                        }
                    else:
                        for s_href in season_links:
                            season_number = s_href.split("=")[-1]
                            season_id = s_href.split("/")[-2] + season_number
                            spage = self.fetch(f"{HDW}{s_href}", "hdw",
                                               "hdwseries", 2)
                            eps = self._hdw_episodes(spage)
                            entry["Seasons"][season_id] = {
                                "Season Number": season_number,
                                "Number Of Episodes": len(eps),
                                "Episodes": eps,
                            }
        # HDWSeriesScraper writes master_dict only (no old merge,
        # HDWSeriesScraper.py:123-143)
        self.catalogs["hdwseries"] = out
        return out

    def _hdw_episodes(self, page: PageView) -> dict:
        eps = {}
        for _, href in page.marked_links("content-info-mark"):
            episode_id = href.split("/")[-2]
            try:
                episode_number = int(href.split("-")[-2])
            except ValueError:
                episode_number = int(href.split("-")[-1])
            eps[episode_id] = {"Episode Number": int(episode_number),
                               "Source": f"{HDW}{href}"}
        return eps

    # -- trending (TrendingScraper.py) -------------------------------------

    def crawl_trending(self) -> tuple[dict, dict]:
        """main() = scrape_fasel() then scrape_akwam()
        (TrendingScraper.py:158-163). Reads the catalogs as written by
        the crawl (pre-postprocess — the reference races Trending
        against Postprocessing, SURVEY.md §3.1; we pin the
        deterministic pre-postprocess read)."""
        from ..functions.text import normalize_title
        content_dict = {"movies": {}, "asian-series": {}, "anime": {},
                        "series": {}, "arabic-series": {},
                        "arabic-movies": {}}
        featured = {"content": []}
        # ---- scrape_fasel (TrendingScraper.py:53-155)
        home = self.fetch(f"{FASEL}/", "fasel", "trending", 0)
        seen: list[str] = []
        for _, link in home.marked_links("blockMovie-mark"):
            page = self.fetch(link, "fasel", "trending", 1)
            raw = page.first_text("h1-title")
            content_title = remove_year(remove_arabic_chars(
                raw.split("\n")[1].strip()))
            if "%d9%81%d9%8a%d9%84%d9%85" in link:
                category = "movies"
            elif "asian-episodes" in link:
                category = "asian-series"
            elif "anime-episodes" in link:
                category = "anime"
            else:
                category = "series"
            content_file = self.catalogs.get(category, {})
            for key in content_file:
                current = normalize_title(content_file[key]["Title"])
                clean = normalize_title(content_title)
                if current == clean and key not in seen:
                    seen.append(key)
                    rec = content_file[key]
                    content_dict[category][key] = {
                        "Title": rec["Title"],
                        "Image Source": rec["Image Source"],
                        "Category": category,
                        # .get: the reference indexes ["Genres"] and
                        # relies on the concurrent postprocess having
                        # already defaulted it (race, SURVEY.md §3.1);
                        # pinned to the deterministic common case
                        "Genres": rec.get("Genres", []),
                        "Rating": rec.get("Rating", "N/A"),
                        "TMDb ID": rec.get("TMDb ID", None),
                    }
                    break
        movies = self.catalogs.get("movies", {})
        for _, link in home.marked_links("h1mb1-mark"):
            page = self.fetch(link, "fasel", "trending", 1)
            movie_id = self.get_content_id(page)
            rec = movies[movie_id]
            featured["content"].append({
                "key": movie_id,
                "Title": rec["Title"],
                "Image Source": rec["Image Source"],
                "Category": rec["Category"],
                "Genres": rec.get("Genres", []),
                "Rating": rec.get("Rating", "N/A"),
                "TMDb ID": rec.get("TMDb ID", "N/A"),
            })
        # ---- scrape_akwam (TrendingScraper.py:15-50)
        one = self.fetch(f"{AKWAM}/one", "akwam", "trending", 0)
        arabic_series = self.catalogs.get("arabic-series", {})
        arabic_movies = self.catalogs.get("arabic-movies", {})
        for _, link in one.marked_links("icn-play-mark"):
            if "series" in link:
                sid = link.split("/")[-2]
                if sid in arabic_series:
                    content_dict["arabic-series"][sid] = {
                        "Title": arabic_series[sid]["Title"],
                        "Image Source": arabic_series[sid]["Image Source"],
                        "Category": "arabic-series"}
            elif "movie" in link:
                mid = link.split("/")[-2]
                if mid in arabic_movies:
                    content_dict["arabic-movies"][mid] = {
                        "Title": arabic_movies[mid]["Title"],
                        "Image Source": arabic_movies[mid]["Image Source"],
                        "Category": "arabic-movies"}
        self.catalogs["trending-content"] = content_dict
        self.catalogs["featured-content"] = featured
        return content_dict, featured

    # -- postprocess (Postprocessing.py) -----------------------------------

    def postprocess(self, image_indices: dict | None = None) -> dict:
        """Postprocessing.py:23-96 over the crawled catalogs: genre
        cleanup, TMDb fill, index-ranged drops, image-index rebuild."""
        from ..functions.text import clean_genres
        image_indices = dict(image_indices or {})
        file_names = ["movies", "anime", "asian-series", "series",
                      "tvshows", "arabic-series", "arabic-movies"]
        for index, file in enumerate(file_names):
            content = self.catalogs.get(file, {})
            for key in content:
                if "arabic" in file:
                    image_indices[key + "-akwam-" + file.split("-")[-1]] = \
                        content[key]["Image Source"]
                elif "hdw" in file:
                    image_indices[key + "-hdw"] = content[key]["Image Source"]
                else:
                    image_indices[key + "-fasel"] = \
                        content[key]["Image Source"]
                if "Genres" in content[key]:
                    content[key]["Genres"] = clean_genres(
                        content[key]["Genres"])
                else:
                    content[key]["Genres"] = []
                if "TMDb ID" in content[key] and \
                        content[key]["TMDb ID"] is not None:
                    pass
                else:
                    kind = "movies" if "movies" in file else "tv"
                    content[key]["TMDb ID"] = mock_tmdb_id(
                        content[key]["Title"], kind)
            if index in range(2, 5):
                for key in list(content.keys()):
                    if len(content[key]["Seasons"]) == 0:
                        del content[key]
            elif index == 0:
                for key in list(content.keys()):
                    if content[key]["Source"] == "":
                        del content[key]
        self.image_indices = image_indices
        return image_indices

    def all_content(self) -> dict:
        """AllContentIndexer.py:5-33."""
        file_names = ["movies", "anime", "asian-series", "series",
                      "tvshows", "arabic-series", "arabic-movies"]
        out = []
        for name in file_names:
            data = self.catalogs.get(name, {})
            for key in data:
                out.append({
                    "key": key,
                    "Title": data[key]["Title"],
                    "Image Source": data[key]["Image Source"],
                    "Category": data[key]["Category"],
                    "Rating": data[key].get("Rating", "N/A"),
                    "Genres": data[key].get("Genres", []),
                })
        return {"content": out}

    # -- full run ----------------------------------------------------------

    def crawl_all(self, cimanow_routes: list[str]) -> dict[str, dict]:
        """ScrapeAll.py's six production scrapers + the HDW pair, in the
        canonical order."""
        self.crawl_fasel_movies()
        self.crawl_fasel_series("series")
        self.crawl_fasel_series("tvshows")
        self.crawl_fasel_series("asian-series")
        self.crawl_fasel_anime()
        self.crawl_akwam_movies()
        self.crawl_akwam_series()
        self.crawl_wecima()
        self.crawl_cimanow(cimanow_routes)
        self.crawl_hdw_movies()
        self.crawl_hdw_series()
        return self.catalogs

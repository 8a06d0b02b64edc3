"""Deterministic synthetic-web generator (FIXTURES.md §1).

Emits the interleaved-document corpus ``(doc_id, host, spans)`` for a
seeded fake web mirroring every reference site family's page shapes —
listing pagination, detail pages, season/episode chains, the Akwam
3-hop episode walk — so the engine and the reference-semantics oracle
can both crawl it and be compared exactly.

Span-text convention: text spans are ``"<class>::<payload>"`` where
<class> mirrors the reference's CSS-selector role (e.g. ``dot-circle``
for Common.py:205-214's id span); link/media spans carry their URL in
``media_ref`` with ``text=''``. A text span whose class ends in ``-for-
next-link`` (e.g. ``ep-num``) annotates the NEXT link span (adjacency
convention, the analogue of anchor text).

Epochs: ``epoch=0`` is a strict prefix of ``epoch=1`` (fewer titles,
fewer episodes per season) so incremental-crawl fixtures (seen-set skip
D1, episode-count delta D2) can diff two generator epochs.

Everything is a pure function of (config, seed): no wall clock, no
global state.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

import pyarrow as pa

from .schema import CORPUS_SCHEMA

FASEL = "https://fasel.test"
AKWAM = "https://akwam.test"
WECIMA = "https://wecima.test"
CIMANOW = "https://cimanow.test"
HDW = "https://hdw.test"

AR_PREFIXES = ["فيلم ", "مسلسل ", "انمي ", ""]
AR_SUFFIXES = [" مترجم", " اون لاين", ""]
AR_SEASON = "الموسم "
AR_EPISODE = "الحلقة "

DEFAULT_WORDS = [
    "silver", "falcon", "night", "river", "stone", "ember", "hollow",
    "crown", "shadow", "drift", "atlas", "harbor", "willow", "garnet",
    "summit", "meadow", "raven", "cipher", "lantern", "voyage", "orchid",
    "thunder", "canyon", "velvet", "beacon", "frost", "saber", "nomad",
]

FASEL_GENRES = ["action", "drama", "comedy", "horror", "romance",
                "thriller", "fantasy", "%d8%a7%d9%83%d8%b4%d9%86", "/"]
AKWAM_GENRE_IDS = ["18", "23", "20", "22", "19", "27", "35", "24"]
CIMANOW_RAW_GENRES = ["اكشن", "درامي", "رعب", "كوميدى", "مغامرة", "جريمة",
                      "غير معروف"]
HDW_GENRES = ["Action", "Drama", "Sci-Fi", "Comedy", "Mystery"]
FORMATS = ["1080p WebDL", "720p HDTV", "480p", "جودة عالية", None]

CIMANOW_ROUTES = [
    "%D8%A7%D9%81%D9%84%D8%A7%D9%85-%D8%B9%D8%B1%D8%A8%D9%8A%D8%A9",
    "%D8%A7%D9%81%D9%84%D8%A7%D9%85-%D8%A7%D8%AC%D9%86%D8%A8%D9%8A%D8%A9",
    "%D8%A7%D9%81%D9%84%D8%A7%D9%85-%D8%AA%D8%B1%D9%83%D9%8A%D8%A9",
]


@dataclass
class SynthConfig:
    seed: int = 42
    epoch: int = 1
    cards_per_page: int = 8
    # entity counts AT EPOCH 1 (epoch 0 gets ~60%): hot-host skew — fasel
    # dominates (SURVEY.md §7.3)
    n_fasel_movies: int = 48
    n_fasel_series: int = 10      # per series-path (series/tvshows/asian-series)
    n_fasel_anime: int = 8
    n_akwam_movies: int = 16
    n_akwam_series: int = 8
    n_wecima: int = 24
    n_cimanow: int = 12           # per route
    n_hdw_movies: int = 16
    n_hdw_series: int = 6
    max_seasons: int = 3
    max_episodes: int = 8
    big_series_episodes: int = 0  # bench outlier: one series with this many eps
    words: list[str] = field(default_factory=lambda: list(DEFAULT_WORDS))


def tiny_config(**kw) -> SynthConfig:
    return SynthConfig(**kw)


def small_config(**kw) -> SynthConfig:
    base = dict(n_fasel_movies=400, n_fasel_series=40, n_fasel_anime=30,
                n_akwam_movies=80, n_akwam_series=30, n_wecima=150,
                n_cimanow=50, n_hdw_movies=80, n_hdw_series=20,
                max_seasons=4, max_episodes=12)
    base.update(kw)
    return SynthConfig(**base)


def bench_config(**kw) -> SynthConfig:
    base = dict(n_fasel_movies=400000, n_fasel_series=25000,
                n_fasel_anime=15000, n_akwam_movies=60000,
                n_akwam_series=15000, n_wecima=80000, n_cimanow=25000,
                n_hdw_movies=60000, n_hdw_series=10000,
                max_seasons=4, max_episodes=10, big_series_episodes=1000)
    base.update(kw)
    return SynthConfig(**base)


class _PageSink:
    def __init__(self):
        self.doc_ids: list[str] = []
        self.hosts: list[str] = []
        self.spans: list[list[dict]] = []

    def page(self, url: str, host: str, spans: list[tuple[str, str, str]]):
        self.doc_ids.append(url)
        self.hosts.append(host)
        self.spans.append([
            {"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m) in enumerate(spans)
        ])

    def table(self) -> pa.Table:
        return pa.table(
            {"doc_id": self.doc_ids, "host": self.hosts,
             "spans": pa.array(self.spans, type=CORPUS_SCHEMA.field("spans").type)},
            schema=CORPUS_SCHEMA,
        )


def _txt(cls: str, payload: str) -> tuple[str, str, str]:
    return ("text", f"{cls}::{payload}", "")


def _link(url: str) -> tuple[str, str, str]:
    return ("link", "", url)


def _media(url: str) -> tuple[str, str, str]:
    return ("media_ref", "", url)


def _epoch_count(n: int, epoch: int) -> int:
    return max(1, (n * 3) // 5) if epoch == 0 else n


class SynthWeb:
    """Generates the full corpus + seeds for one epoch."""

    def __init__(self, cfg: SynthConfig):
        self.cfg = cfg
        self.rng = random.Random(cfg.seed)
        self.sink = _PageSink()
        self.seeds: list[dict] = []

    # -- entity helpers -----------------------------------------------------

    def _title(self, rng: random.Random, ascii_only=False) -> str:
        w = rng.sample(self.cfg.words, k=rng.randint(2, 3))
        t = " ".join(x.capitalize() for x in w)
        if rng.random() < 0.35:
            t += f" {rng.randint(1999, 2023)}"
        return t

    def _raw_fasel_title(self, rng: random.Random, title: str) -> str:
        return rng.choice(AR_PREFIXES) + title + rng.choice(AR_SUFFIXES)

    def _entities(self, n_at_e1: int, id_base: int, maker):
        """Generate the epoch-1 entity list deterministically, slice to
        the current epoch. ``maker(rng, i, eid)`` builds one entity."""
        full = []
        for i in range(n_at_e1):
            # stable per-entity rng independent of epoch/count
            rng = random.Random(f"{self.cfg.seed}-{id_base}-{i}")
            full.append(maker(rng, i, id_base + i))
        return full[: _epoch_count(n_at_e1, self.cfg.epoch)], full

    def _listing_pages(self, urls_base: str, n_items: int):
        cpp = self.cfg.cards_per_page
        n_pages = max(1, -(-n_items // cpp))
        return n_pages

    # -- fasel --------------------------------------------------------------

    def gen_fasel_movies(self):
        cfg = self.cfg

        def mk(rng, i, eid):
            title = self._title(rng)
            return {
                "id": str(2000 + eid),
                "slug": f"m{eid}",
                "title": title,
                "raw_title": self._raw_fasel_title(rng, title),
                "genres": rng.sample(FASEL_GENRES, k=rng.randint(0, 3)),
                "format": rng.choice(FORMATS),
                "poster": f"https://img.fasel.test/p{eid}" + rng.choice([".jpg", ".webp"]),
                "has_id": rng.random() > 0.04,
                "has_iframe": rng.random() > 0.04,
                "stream": f"https://cdn.fasel.test/stream/{eid}",
                "uid": eid * 7 % 1000,
            }

        movies, _ = self._entities(cfg.n_fasel_movies, 0, mk)
        self._fasel_listing("movies", movies, pagination="arrow")
        for m in movies:
            spans = []
            if m["has_id"]:
                spans.append(_txt("dot-circle", f"رقم الفيلم : #{m['id']}"))
            if m["format"] is not None:
                spans.append(_txt("play-circle", m["format"]))
            for g in m["genres"]:
                spans.append(_txt("genre", f"{FASEL}/genres/{g}"))
            if m["has_iframe"]:
                spans.append(_media(
                    f"https://video.fasel.test/player?uid={m['uid']}={m['stream']}&img"))
            self.sink.page(f"{FASEL}/movies/{m['slug']}", "fasel.test", spans)
        return movies

    def _fasel_listing(self, cat: str, items: list[dict], pagination: str):
        cpp = self.cfg.cards_per_page
        n_pages = max(1, -(-len(items) // cpp))
        for p in range(1, n_pages + 1):
            spans = []
            if pagination == "arrow":
                spans.append(_txt("paginate-last", "»"))
                spans.append(_link(f"{FASEL}/{cat}/page/{n_pages}"))
            else:  # li.page-item fallback (Common.py:177-179): window,
                # [-1] = N
                for k in list(range(1, min(3, n_pages) + 1)):
                    spans.append(_txt("page-item", str(k)))
                spans.append(_txt("page-item", str(n_pages)))
            for it in items[(p - 1) * cpp: p * cpp]:
                spans.append(_txt("h1", it["raw_title"]))
                spans.append(_link(f"{FASEL}/{cat}/{it['slug']}"))
                spans.append(_media(it["poster"]))
            url = f"{FASEL}/{cat}" if p == 1 else f"{FASEL}/{cat}/page/{p}"
            self.sink.page(url, "fasel.test", spans)
            if p == 1:
                # /page/1 aliases the base listing (both exist on the site)
                self.sink.page(f"{FASEL}/{cat}/page/1", "fasel.test", spans)
        self.seeds.append({"url": f"{FASEL}/{cat}", "site": "fasel",
                           "category": cat})

    def gen_fasel_series_path(self, path: str, base_id: int):
        cfg = self.cfg

        def mk(rng, i, eid):
            n_seasons = rng.randint(1, cfg.max_seasons)
            seasons = []
            for s in range(1, n_seasons + 1):
                n_eps_e1 = rng.randint(2, cfg.max_episodes)
                seasons.append({
                    "sid": f"s{eid}x{s}",
                    "number": s,
                    "n_eps_e1": n_eps_e1,
                    "ep_ids": [f"{eid}{s}{e:03d}" for e in range(1, n_eps_e1 + 1)],
                })
            title = self._title(rng)
            return {
                "id": str(eid), "slug": f"t{eid}",
                "title": title,
                "raw_title": self._raw_fasel_title(rng, title),
                "genres": rng.sample(FASEL_GENRES, k=rng.randint(0, 3)),
                "format": rng.choice(FORMATS),
                "poster": f"https://img.fasel.test/s{eid}.jpg",
                "has_id": rng.random() > 0.05,
                "seasons": seasons,
            }

        series, _ = self._entities(cfg.n_fasel_series, base_id, mk)
        # epoch 0 shrinks episode counts (the D2 delta fixture)
        for sr in series:
            for se in sr["seasons"]:
                n = se["n_eps_e1"] if cfg.epoch == 1 else max(1, (se["n_eps_e1"] * 3) // 5)
                se["eps"] = se["ep_ids"][:n]
        self._fasel_listing(path, series,
                            pagination="pageitem" if path == "tvshows" else "arrow")
        for sr in series:
            spans = []
            if sr["has_id"]:
                spans.append(_txt("dot-circle", f"رقم المسلسل : #{sr['id']}"))
            if sr["format"] is not None:
                spans.append(_txt("play-circle", sr["format"]))
            for g in sr["genres"]:
                spans.append(_txt("genre", f"{FASEL}/genres/{g}"))
            for se in sr["seasons"]:
                spans.append(_txt("season-title", f"{AR_SEASON}{se['number']}"))
                spans.append(_link(f"{FASEL}/?p={se['sid']}"))
            self.sink.page(f"{FASEL}/{path}/{sr['slug']}", "fasel.test", spans)
            for se in sr["seasons"]:
                sp = []
                for eid in se["eps"]:
                    sp.append(_txt("epAll-mark", ""))
                    sp.append(_link(f"{FASEL}/episodes/e{eid}"))
                self.sink.page(f"{FASEL}/?p={se['sid']}", "fasel.test", sp)
                for k, eid in enumerate(se["eps"], start=1):
                    esp = [
                        _txt("liskSh", f"https://short.fasel.test/?watch={eid}"),
                        _media(f"https://video.fasel.test/player?uid={k}="
                               f"https://cdn.fasel.test/ep/{eid}&img"),
                    ]
                    self.sink.page(f"{FASEL}/episodes/e{eid}", "fasel.test", esp)
        return series

    def gen_fasel_anime(self):
        cfg = self.cfg

        def mk(rng, i, eid):
            n_eps_e1 = rng.randint(2, cfg.max_episodes)
            if cfg.big_series_episodes and i == 0:
                n_eps_e1 = cfg.big_series_episodes
            title = self._title(rng)
            return {
                "id": str(9000 + eid), "slug": f"a{eid}",
                "title": title,
                "raw_title": "انمي " + title,      # translated via mock table
                "format": rng.choice(FORMATS),
                "poster": f"https://img.fasel.test/a{eid}.jpg",
                "has_id": rng.random() > 0.05,
                "n_eps_e1": n_eps_e1,
                "ep_ids": [f"9{eid}{e:04d}" for e in range(1, n_eps_e1 + 1)],
            }

        animes, _ = self._entities(cfg.n_fasel_anime, 0, mk)
        for an in animes:
            n = an["n_eps_e1"] if cfg.epoch == 1 else max(1, (an["n_eps_e1"] * 3) // 5)
            an["eps"] = an["ep_ids"][:n]
        self._fasel_listing("anime", animes, pagination="arrow")
        for an in animes:
            spans = []
            if an["has_id"]:
                spans.append(_txt("dot-circle", f"رقم الانمي : #{an['id']}"))
            if an["format"] is not None:
                spans.append(_txt("play-circle", an["format"]))
            for k, eid in enumerate(an["eps"], start=1):
                spans.append(_txt("ep-num", f"{AR_EPISODE}{k}"))
                spans.append(_link(f"{FASEL}/episodes/e{eid}"))
            self.sink.page(f"{FASEL}/anime/{an['slug']}", "fasel.test", spans)
            for k, eid in enumerate(an["eps"], start=1):
                esp = [
                    _txt("dot-circle", f"رقم الحلقة : #ep{eid}"),
                    _media(f"https://video.fasel.test/anime?uid={k}="
                           f"https://cdn.fasel.test/an/{eid}&img"),
                ]
                self.sink.page(f"{FASEL}/episodes/e{eid}", "fasel.test", esp)
        return animes

    # -- akwam --------------------------------------------------------------

    def _akwam_listing(self, kind: str, items: list[dict]):
        cpp = self.cfg.cards_per_page
        n_pages = max(1, -(-len(items) // cpp))
        base = (f"{AKWAM}/{kind}?section=0&category=0&rating=0&year=0"
                f"&language=1&formats=0&quality=0")
        for p in range(1, n_pages + 1):
            # pagination WINDOW (real sites show 1 2 3 … N, not every
            # page); akwam_get_last_page_number reads page-link[-3]
            # (Common.py:302-307) — [-3] = N below
            spans = []
            for k in range(1, min(3, n_pages) + 1):
                spans.append(_txt("page-link", str(k)))
            spans.append(_txt("page-link", str(n_pages)))
            spans.append(_txt("page-link", "next"))
            spans.append(_txt("page-link", "last"))
            for it in items[(p - 1) * cpp: p * cpp]:
                spans.append(_txt("icn-play-mark", ""))
                spans.append(_link(it["url"]))
            self.sink.page(f"{base}&page={p}", "akwam.test", spans)
            if p == 1:
                self.sink.page(base, "akwam.test", spans)
        self.seeds.append({"url": base, "site": "akwam", "category": kind})

    def gen_akwam_movies(self):
        cfg = self.cfg

        def mk(rng, i, eid):
            mid = str(4000 + eid)
            return {
                "id": mid, "slug": f"am{eid}",
                "url": f"{AKWAM}/movie/{mid}/am{eid}",
                "title": rng.choice(AR_PREFIXES) + self._title(rng),
                "genre_ids": rng.sample(AKWAM_GENRE_IDS, k=rng.randint(1, 3)),
                "poster": f"https://img.akwam.test/m{eid}.jpg",
                "short": f"sh{eid}",
            }

        movies, _ = self._entities(cfg.n_akwam_movies, 0, mk)
        self._akwam_listing("movies", movies)
        for m in movies:
            spans = [
                _txt("entry-title", m["title"]),
                _media(m["poster"]),
            ]
            for gid in m["genre_ids"]:
                spans.append(_txt("badge", f"{AKWAM}/movies?genre={gid}"))
            spans.append(_txt("link-btn-mark", ""))
            spans.append(_link(f"{AKWAM}/link/{m['short']}"))
            self.sink.page(m["url"], "akwam.test", spans)
        return movies

    def gen_akwam_series(self):
        cfg = self.cfg

        def mk(rng, i, eid):
            sid = str(5000 + eid)
            n_eps_e1 = rng.randint(2, cfg.max_episodes)
            return {
                "id": sid, "slug": f"as{eid}",
                "url": f"{AKWAM}/series/{sid}/as{eid}",
                "title": rng.choice(AR_PREFIXES) + self._title(rng),
                "genre_ids": rng.sample(AKWAM_GENRE_IDS, k=rng.randint(1, 3)),
                "poster": f"https://img.akwam.test/s{eid}.jpg",
                "n_eps_e1": n_eps_e1,
                "ep_ids": [f"5{eid}{e:03d}" for e in range(1, n_eps_e1 + 1)],
            }

        series, _ = self._entities(cfg.n_akwam_series, 0, mk)
        for sr in series:
            n = sr["n_eps_e1"] if cfg.epoch == 1 else max(1, (sr["n_eps_e1"] * 3) // 5)
            sr["eps"] = sr["ep_ids"][:n]
        self._akwam_listing("series", series)
        for sr in series:
            spans = [
                _txt("entry-title", sr["title"]),
                _media(sr["poster"]),
            ]
            for gid in sr["genre_ids"]:
                spans.append(_txt("badge", f"{AKWAM}/series?genre={gid}"))
            for k, eid in enumerate(sr["eps"], start=1):
                spans.append(_txt("h2-18-mark", ""))
                spans.append(_link(f"{AKWAM}/episode/{eid}/ep{k}"))
            self.sink.page(sr["url"], "akwam.test", spans)
            for k, eid in enumerate(sr["eps"], start=1):
                self.sink.page(
                    f"{AKWAM}/episode/{eid}/ep{k}", "akwam.test",
                    [_txt("link-btn-mark", ""), _link(f"{AKWAM}/link/L{eid}")])
                self.sink.page(
                    f"{AKWAM}/link/L{eid}", "akwam.test",
                    [_txt("download-link-mark", ""),
                     _link(f"{AKWAM}/watch/L{eid}/{eid}")])
                self.sink.page(
                    f"{AKWAM}/watch/L{eid}/{eid}", "akwam.test",
                    [_txt("h2-bold", f"{AR_EPISODE}{k}\nمشاهدة")])
        return series

    # -- wecima -------------------------------------------------------------

    def gen_wecima(self):
        cfg = self.cfg

        def mk(rng, i, eid):
            title = self._title(rng)
            return {
                "cpd": f"w{7000 + eid}",
                "title": title,
                "year": rng.randint(2015, 2023),
                "season_raw": f"{AR_SEASON}{rng.randint(1, 5)}",
                "slug": f"ws{eid}",
                "poster": f"https://img.wecima.test/w{eid}.jpg",
            }

        items, _ = self._entities(cfg.n_wecima, 0, mk)
        cpp = cfg.cards_per_page
        n_pages = max(1, -(-len(items) // cpp))
        for p in range(1, n_pages + 1):
            # window; get_number_of_pages reads page-numbers li[-2]
            # (WeCimaScraper.py:10-14) — [-2] = N below
            spans = []
            for k in range(1, min(3, n_pages) + 1):
                spans.append(_txt("page-num", str(k)))
            spans.append(_txt("page-num", str(n_pages)))
            spans.append(_txt("page-num", "next"))
            for it in items[(p - 1) * cpp: p * cpp]:
                spans.append(_txt("grid-id", it["cpd"]))
                spans.append(_txt("hasyear", f"{it['title']} - {it['year']}"))
                spans.append(_txt("anchor-title", it["season_raw"]))
                spans.append(_link(f"{WECIMA}/series/{it['slug']}"))
                spans.append(_media(f"--image:url({it['poster']});"))
            url = (f"{WECIMA}/download-series/?page_number={p}/")
            self.sink.page(url, "wecima.test", spans)
            if p == 1:
                self.sink.page(f"{WECIMA}/download-series/", "wecima.test", spans)
        self.seeds.append({"url": f"{WECIMA}/download-series/", "site": "wecima",
                           "category": "wecima"})
        return items

    # -- cimanow ------------------------------------------------------------

    def gen_cimanow(self):
        cfg = self.cfg
        all_items = []
        for ri, route in enumerate(CIMANOW_ROUTES):
            def mk(rng, i, eid, _ri=ri):
                title = self._title(rng)
                qualities = rng.sample(["1080p", "720p", "480p"],
                                       k=rng.randint(1, 3))
                return {
                    "title": title,
                    "raw_genres": " ، ".join(
                        rng.sample(CIMANOW_RAW_GENRES, k=rng.randint(1, 2))),
                    "slug": f"cn{_ri}x{eid}",
                    "poster": f"https://img.cimanow.test/c{_ri}x{eid}.jpg",
                    "sources": [
                        (q, f"https://dl.cimanow.test/{_ri}x{eid}/{q}")
                        for q in qualities],
                }

            items, _ = self._entities(cfg.n_cimanow, ri * 1000, mk)
            cpp = cfg.cards_per_page
            n_pages = max(1, -(-len(items) // cpp))
            for p in range(1, n_pages + 1):
                # window; cima_now_get_last_page reads the last li
                # (Common.py:388-389) — [-1] = N below
                spans = []
                for k in range(1, min(3, n_pages) + 1):
                    spans.append(_txt("pg-li", str(k)))
                spans.append(_txt("pg-li", str(n_pages)))
                for it in items[(p - 1) * cpp: p * cpp]:
                    spans.append(_txt("card-em", it["raw_genres"]))
                    spans.append(_txt("card-li", f"{it['title']} {it['raw_genres']}"))
                    spans.append(_media(it["poster"]))
                    spans.append(_link(f"{CIMANOW}/{it['slug']}/"))
                base = f"{CIMANOW}/category/{route}"
                self.sink.page(base if p == 1 else f"{base}/page/{p}",
                               "cimanow.test", spans)
                if p == 1:
                    self.sink.page(f"{base}/page/1", "cimanow.test", spans)
            for it in items:
                spans = []
                for q, href in it["sources"]:
                    spans.append(_txt("dl", f"{q} تحميل"))
                    spans.append(_media(href))
                self.sink.page(f"{CIMANOW}/{it['slug']}/watching",
                               "cimanow.test", spans)
            self.seeds.append({"url": f"{CIMANOW}/category/{route}",
                               "site": "cimanow", "category": route})
            all_items.append(items)
        return all_items

    # -- hdw ----------------------------------------------------------------

    def _hdw_listing(self, kind: str, items: list[dict], card_fn):
        cpp = self.cfg.cards_per_page
        n_pages = max(1, -(-len(items) // cpp))
        page1_spans = None
        for p in range(1, n_pages + 1):
            # window; hdw_get_last_page_number reads page-link[-2]
            # (Common.py:335-339) — [-2] = N below
            spans = []
            for k in range(1, min(3, n_pages) + 1):
                spans.append(_txt("page-link", str(k)))
            spans.append(_txt("page-link", str(n_pages)))
            spans.append(_txt("page-link", "next"))
            #
            # call sites add +2 (HDWMoviesScraper.py:60) so pages up to N+2
            # must exist (possibly-empty listing pages)
            for it in items[(p - 1) * cpp: p * cpp]:
                spans.extend(card_fn(it))
            self.sink.page(f"{HDW}/{kind}?page={p}", "hdw.test", spans)
            if p == 1:
                page1_spans = spans
        for extra in (n_pages + 1, n_pages + 2):
            spans = [_txt("page-link", str(k))
                     for k in range(1, min(3, n_pages) + 1)]
            spans.append(_txt("page-link", str(n_pages)))
            spans.append(_txt("page-link", "next"))
            self.sink.page(f"{HDW}/{kind}?page={extra}", "hdw.test", spans)
        # the bare listing URL (used for last-page sizing) aliases page 1
        self.sink.page(f"{HDW}/{kind}", "hdw.test", page1_spans)
        self.seeds.append({"url": f"{HDW}/{kind}", "site": "hdw",
                           "category": kind})

    def gen_hdw_movies(self):
        cfg = self.cfg

        def mk(rng, i, eid):
            mid = str(8000 + eid)
            return {
                "id": mid,
                "href": f"/movie/{mid}/hm{eid}",
                "title": self._title(rng, ascii_only=True),
                "poster": f"https://img.hdw.test/m{eid}.jpg",
                "rating": (f"{rng.randint(1, 9)},{rng.randint(0, 9)}"
                           if rng.random() > 0.2 else None),
                "genres": rng.sample(HDW_GENRES, k=rng.randint(1, 3)),
            }

        movies, _ = self._entities(cfg.n_hdw_movies, 0, mk)

        def card(it):
            spans = [
                _txt("span-title", it["title"]),
                _link(it["href"]),
                _media(it["poster"]),
            ]
            if it["rating"] is not None:
                spans.append(_txt("rating", it["rating"]))
            spans.append(_txt("views", ", ".join(it["genres"])))
            return spans

        self._hdw_listing("movies", movies, card)
        return movies

    def gen_hdw_series(self):
        cfg = self.cfg

        def mk(rng, i, eid):
            sid = str(8500 + eid)
            has_seasons = rng.random() > 0.4
            seasons = []
            if has_seasons:
                for s in range(1, rng.randint(2, cfg.max_seasons) + 1):
                    n_eps = rng.randint(2, cfg.max_episodes)
                    seasons.append({
                        "number": str(s),
                        "href": f"/show/{sid}/hs{eid}?season={s}",
                        "eps": [(f"{sid}{s}{e:02d}",
                                 (f"/episode/{sid}{s}{e:02d}/t-{e}-hd"
                                  if rng.random() > 0.3
                                  else f"/episode/{sid}{s}{e:02d}/t-ep-{e}"), e)
                                for e in range(1, n_eps + 1)],
                    })
            else:
                n_eps = rng.randint(2, cfg.max_episodes)
                seasons.append({
                    "number": "1", "href": None,
                    "eps": [(f"{sid}0{e:02d}", f"/episode/{sid}0{e:02d}/t-{e}-x", e)
                            for e in range(1, n_eps + 1)],
                })
            return {
                "id": sid, "href": f"/show/{sid}/hs{eid}",
                "title": self._title(rng, ascii_only=True),
                "poster": f"https://img.hdw.test/s{eid}.jpg",
                "rating": (f"{rng.randint(1, 9)},{rng.randint(0, 9)}"
                           if rng.random() > 0.2 else None),
                "genres": rng.sample(HDW_GENRES, k=rng.randint(1, 3)),
                "has_seasons": has_seasons,
                "seasons": seasons,
            }

        series, _ = self._entities(cfg.n_hdw_series, 0, mk)

        def card(it):
            spans = [
                _txt("a-title", it["title"]),
                _link(it["href"]),
                _media(it["poster"]),
            ]
            if it["rating"] is not None:
                spans.append(_txt("rating", it["rating"]))
            spans.append(_txt("views", ", ".join(it["genres"])))
            return spans

        self._hdw_listing("tv-shows", series, card)

        def episode_cards(eps):
            spans = []
            for (eid, href, _n) in eps:
                spans.append(_txt("content-info-mark", ""))
                spans.append(_link(href))
            return spans

        for sr in series:
            spans = []
            if sr["has_seasons"]:
                for se in sr["seasons"]:
                    spans.append(_txt("season-btn-mark", ""))
                    spans.append(_link(se["href"]))
            else:
                spans.extend(episode_cards(sr["seasons"][0]["eps"]))
            self.sink.page(f"{HDW}{sr['href']}", "hdw.test", spans)
            if sr["has_seasons"]:
                for se in sr["seasons"]:
                    self.sink.page(f"{HDW}{se['href']}", "hdw.test",
                                   episode_cards(se["eps"]))
        return series

    # -- trending / home pages (TrendingScraper.py fixtures) ---------------

    def gen_trending(self):
        """fasel home (trending divs + featured divs) and akwam home
        (/one): trending links classify by URL substring
        (TrendingScraper.py:74-81); content pages carry an 'h1 title'
        text whose 2nd line is the title (TrendingScraper.py:71-72)."""
        rng = random.Random(f"{self.cfg.seed}-trending")
        spans = []
        t_movies = self.truth["fasel_movies"]
        t_series = self.truth["fasel_series"]["series"]
        t_asian = self.truth["fasel_series"]["asian-series"]
        t_anime = self.truth["fasel_anime"]

        picks = []
        for kind, pool, url_part in [
            ("movies", t_movies, "%d9%81%d9%8a%d9%84%d9%85"),
            ("asian-series", t_asian, "asian-episodes"),
            ("anime", [a for a in t_anime
                       if not a["title"][-4:].isdigit()], "anime-episodes"),
            ("series", t_series, "shows"),
        ]:
            for it in pool[: min(3, len(pool))]:
                picks.append((kind, it, url_part))
        rng.shuffle(picks)
        for n, (kind, it, url_part) in enumerate(picks):
            page_url = f"{FASEL}/{url_part}-tr{n}"
            spans.append(_txt("blockMovie-mark", ""))
            spans.append(_link(page_url))
            # the trending content page: title on line 2 of 'h1 title'
            self.sink.page(page_url, "fasel.test", [
                _txt("h1-title", f"عنوان\n{it['raw_title']}\nمشاهدة")])
        # featured: h1 mb-1 divs linking to movie detail pages; must be
        # catalogued movies (the reference indexes movies[movie_id]
        # outside the try — a miss would crash it,
        # TrendingScraper.py:125-138)
        featured = [it for it in t_movies
                    if it["has_id"] and it["has_iframe"]][:3]
        for it in featured:
            spans.append(_txt("h1mb1-mark", ""))
            spans.append(_link(f"{FASEL}/movies/{it['slug']}"))
        self.sink.page(f"{FASEL}/", "fasel.test", spans)

        ak_spans = []
        for sr in self.truth["akwam_series"][:2]:
            ak_spans.append(_txt("icn-play-mark", ""))
            ak_spans.append(_link(sr["url"]))
        for mv in self.truth["akwam_movies"][:2]:
            ak_spans.append(_txt("icn-play-mark", ""))
            ak_spans.append(_link(mv["url"]))
        # one dangling link neither 'series' nor 'movie' (skipped,
        # TrendingScraper.py:49-50)
        ak_spans.append(_txt("icn-play-mark", ""))
        ak_spans.append(_link(f"{AKWAM}/games/1/x"))
        self.sink.page(f"{AKWAM}/one", "akwam.test", ak_spans)

    # -- build --------------------------------------------------------------

    def build(self):
        self.truth = {
            "fasel_movies": self.gen_fasel_movies(),
            "fasel_series": {
                # disjoint id spaces per path (up to 30k series each)
                path: self.gen_fasel_series_path(path, base)
                for path, base in [("series", 30000), ("tvshows", 60000),
                                   ("asian-series", 90000)]
            },
            "fasel_anime": self.gen_fasel_anime(),
            "akwam_movies": self.gen_akwam_movies(),
            "akwam_series": self.gen_akwam_series(),
            "wecima": self.gen_wecima(),
            "cimanow": self.gen_cimanow(),
            "hdw_movies": self.gen_hdw_movies(),
            "hdw_series": self.gen_hdw_series(),
        }
        self.gen_trending()
        return self.sink.table(), pa.table({
            "url": [s["url"] for s in self.seeds],
            "site": [s["site"] for s in self.seeds],
            "category": [s["category"] for s in self.seeds],
        })


def generate(cfg: SynthConfig):
    """Build (corpus_table, seeds_table) for the config. Deterministic."""
    return SynthWeb(cfg).build()

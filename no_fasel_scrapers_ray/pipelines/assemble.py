"""Catalog assembly: flat record rows → nested catalog dicts + the
merge-precedence writer (SURVEY.md §2.7 A1-A5).

The wide step — episode→season→series nesting — is a
``groupby(catalog, series_key).map_groups`` (one group per series, so a
1000-episode outlier is one group, not one driver loop). The output of
assembly is one row per catalog entry (catalog, key, order_key,
payload_json); the final writer applies each catalog's exact merge
precedence and delta semantics against the previous run's catalogs and
emits reference-shaped JSON files (dict-of-dicts, indent=4).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import ray.data as rd

from ..functions.hashing import md5_of_json
from ..ops.util import stable_bucket

FLAT_CATALOGS = ("movies", "arabic-movies", "WeCima", "CimaNowMovies",
                 "hdwmovies")
NESTED_SEASONS = ("series", "tvshows", "asian-series", "hdwseries")
NESTED_FLAT_EPISODES = ("anime", "arabic-series")

# merge precedence per catalog (SURVEY.md A5, citations inline below)
OLD_WINS = {"series", "tvshows", "asian-series"}      # FaselSeriesScraper.py:217
NO_MERGE = {"arabic-movies", "hdwseries"}             # master_dict only


def assemble_records(records: rd.Dataset, n_buckets: int = 64) -> pd.DataFrame:
    """Distributed nesting: returns (catalog, key, order_key, payload)
    entry rows — nested entries built per series, flat entries passed
    through, delta rows tagged for the writer.

    Shuffle shape: series are hash-bucketed (series co-location is the
    only requirement) and each bucket assembles ALL its series in one
    sorted pass — a per-series map_groups measured 180 s at 300k series
    from per-group overhead alone; 64 buckets assemble the same rows in
    seconds. A 1000-episode outlier series is still one in-memory
    group within its bucket."""

    import pyarrow.compute as pc
    records = records.map_batches(
        lambda t: t.filter(pc.not_equal(t["catalog"], "__pages__")),
        batch_format="pyarrow")

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        key = df["catalog"] + "\x00" + df["series_key"]
        df["bucket"] = stable_bucket(key, n_buckets)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["catalog", "series_key", "order_key"],
                          kind="stable")
        is_nest = (g["series_key"] != "") & g["record_type"].isin(
            ["series_head", "season", "episode"])
        passthrough = g[~is_nest][["catalog", "record_type", "key",
                                   "season_key", "order_key", "payload"]]
        nest = g[is_nest]
        out = {"catalog": [], "record_type": [], "key": [],
               "season_key": [], "order_key": [], "payload": []}

        def emit_series(catalog, rows):
            # rows: list of (record_type, key, season_key, order_key,
            # payload) in order_key order
            head = None
            head_key = head_ok = None
            seasons: list[tuple[str, dict]] = []
            eps_by_season: dict[str, dict] = {}
            flat_eps: dict[str, dict] = {}
            for rt, key, season_key, ok, payload in rows:
                if rt == "series_head" and head is None:
                    head = json.loads(payload)
                    head_key, head_ok = key, ok
                elif rt == "season":
                    sp = json.loads(payload)
                    sp.pop("orphan", None)
                    seasons.append((key, sp))
                elif rt == "episode":
                    if catalog in NESTED_SEASONS:
                        eps_by_season.setdefault(season_key, {})[key] = \
                            json.loads(payload)
                    else:
                        flat_eps[key] = json.loads(payload)
            if head is None:
                return
            if catalog in NESTED_SEASONS:
                total = 0
                season_map = {}
                for skey, sp in seasons:
                    eps = eps_by_season.get(skey, {})
                    # fasel: count = link count (set at season extract);
                    # hdw: count = card count — both already in payload
                    season_map[skey] = {
                        "Season Number": sp["Season Number"],
                        "Number Of Episodes": sp["Number Of Episodes"],
                        "Episodes": eps,
                    }
                    total += sp["Number Of Episodes"]
                head["Seasons"] = season_map
                if "Number Of Episodes" in head:
                    head["Number Of Episodes"] = total
            else:  # anime / arabic-series: flat Episodes
                head["Episodes"] = flat_eps
                if catalog == "arabic-series":
                    # A3 fix-up: count = scraped episodes
                    # (AkwamSeriesScraper.py:109-110)
                    head["Number Of Episodes"] = len(flat_eps)
            out["catalog"].append(catalog)
            out["record_type"].append("record")
            out["key"].append(head_key)
            out["season_key"].append("")
            out["order_key"].append(head_ok)
            out["payload"].append(json.dumps(head, ensure_ascii=False))

        current = None
        buf: list = []
        cols = (nest["catalog"].tolist(), nest["series_key"].tolist(),
                nest["record_type"].tolist(), nest["key"].tolist(),
                nest["season_key"].tolist(), nest["order_key"].tolist(),
                nest["payload"].tolist())
        for cat, skey, rt, key, season_key, ok, payload in zip(*cols):
            ident = (cat, skey)
            if ident != current:
                if current is not None:
                    emit_series(current[0], buf)
                current, buf = ident, []
            buf.append((rt, key, season_key, ok, payload))
        if current is not None:
            emit_series(current[0], buf)
        return pd.concat([passthrough, pd.DataFrame(out)],
                         ignore_index=True)

    return (records
            .map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket")
            .map_groups(per_bucket, batch_format="pandas")
            .to_pandas())


def build_catalogs(entries: pd.DataFrame,
                   old_catalogs: dict | None = None) -> dict[str, dict]:
    """Apply per-catalog merge precedence + delta semantics; returns
    {catalog: dict-of-dicts} in the reference's key order."""
    old_catalogs = {k: {kk: json.loads(json.dumps(vv))
                        for kk, vv in v.items()}
                    for k, v in (old_catalogs or {}).items()}
    catalogs: dict[str, dict] = {}
    entries = entries.sort_values("order_key", kind="stable")

    for catalog, g in entries.groupby("catalog", sort=True):
        old = old_catalogs.get(catalog, {})
        new: dict = {}
        recs = g[g["record_type"] == "record"]
        for k, payload in zip(recs["key"].tolist(),
                              recs["payload"].tolist()):
            new[k] = json.loads(payload)

        # D2 delta application into the OLD catalog
        if catalog in ("series", "tvshows", "asian-series"):
            for _, row in g[g["record_type"] == "season_delta"].iterrows():
                sid = row["key"]
                series = _find_series_with_season(old, sid)
                if series is not None:
                    # count += n_links (link count, FaselSeriesScraper.py:79)
                    old[series]["Seasons"][sid]["Number Of Episodes"] += \
                        json.loads(row["payload"])["n_links"]
            for _, row in g[g["record_type"] == "episode_delta"].iterrows():
                sid = row["season_key"]
                series = _find_series_with_season(old, sid)
                if series is not None:
                    old[series]["Seasons"][sid]["Episodes"][row["key"]] = \
                        json.loads(row["payload"])
        elif catalog == "anime":
            delta_eps: dict[str, dict] = {}
            for _, row in g[g["record_type"] == "episode_delta"].iterrows():
                delta_eps.setdefault(row["season_key"], {})[row["key"]] = \
                    json.loads(row["payload"])
            for aid, eps in delta_eps.items():
                if aid in old:
                    # count += len(scraped dict) (FaselAnimeScraper.py:120)
                    old[aid]["Number Of Episodes"] += len(eps)
                    old[aid]["Episodes"].update(eps)

        # A5 merge precedence
        if catalog in NO_MERGE:
            merged = new
        elif catalog in OLD_WINS:
            merged = dict(new)
            merged.update(old)     # `new | old` — old wins, new order first
        else:
            merged = dict(old)
            merged.update(new)     # old.update(new) — new wins
        catalogs[catalog] = merged
    # catalogs with no new records this run still carry forward
    for catalog, old in old_catalogs.items():
        if catalog not in catalogs:
            catalogs[catalog] = old
    return catalogs


def _find_series_with_season(old: dict, season_id: str):
    for sid, rec in old.items():
        if season_id in rec.get("Seasons", {}):
            return sid
    return None


def write_catalogs(catalogs: dict[str, dict], out_dir: str,
                   hashes: bool = True) -> dict[str, str]:
    """Reference-shaped sinks: one pretty-printed JSON per catalog
    (S6) + the md5 manifest (S8, Postprocessing.py:98-110)."""
    os.makedirs(out_dir, exist_ok=True)
    file_hashes = {}
    for catalog, data in catalogs.items():
        path = os.path.join(out_dir, f"{catalog}.json")
        ensure_ascii = catalog in ("movies", "series", "tvshows",
                                   "asian-series", "anime")
        # Arabic preserved where the reference passes ensure_ascii=False
        # (AkwamMoviesScaper.py:76-77, WeCimaScraper.py:74-75, ...)
        with open(path, "w", encoding="utf-8") as fp:
            json.dump(data, fp, indent=4, ensure_ascii=ensure_ascii)
        file_hashes[catalog] = md5_of_json(data)
    if hashes:
        with open(os.path.join(out_dir, "file-hashes.json"), "w") as fp:
            json.dump(file_hashes, fp, indent=4)
    return file_hashes

"""One-shot orchestrated run — ScrapeAll parity (ScrapeAll.py:5-39):
crawl all sites → assemble catalogs → trending + postprocess →
all-content index → image-blob transcode → one output directory with
every reference artifact:

    <catalog>.json (all 11), trending-content.json, featured-content.json,
    image-indices.json, all-content.json, file-hashes.json,
    last-scraped.txt, image-blobs/ (parquet, S9 re-host sink)

Phase mapping (file → reference):
- crawl+assemble        = the 6 scraper processes (ScrapeAll.py:7-20)
- trending              = TrendingScraper.py (reads PRE-postprocess
                          catalogs, as the reference's concurrent run does)
- postprocess + rewrite = Postprocessing.py (FILE_NAMES files rewritten
                          ensure_ascii=False, Postprocessing.py:64-65)
- all-content           = AllContentIndexer.py
- last-scraped stamp    = ScrapeAll.py:34-35
- file-hashes           = Postprocessing.py:88-110 ALL_FILES manifest.
  Documented deviation: the reference hashes all-content.json and
  last-scraped.txt BEFORE they are (re)written this run (ScrapeAll runs
  the indexer and the stamp after postprocessing), i.e. its manifest
  records the PREVIOUS run's bytes for those two. The engine hashes the
  final artifacts of THIS run — same algorithm (md5 of json.dumps /
  raw text, Postprocessing.py:94-107), coherent timing.
"""

from __future__ import annotations

import hashlib
import json
import os

from ..functions.hashing import md5_of_json
from ..stages.images import image_table_from_indices, transcode_images
from .assemble import (assemble_records, build_catalogs,
                       write_catalogs_parallel)
from .crawl import CrawlEngine
from .postprocess import FILE_NAMES, all_content_index, postprocess_catalogs
from .trending import run_trending

# Postprocessing.py:11-12
ALL_FILES = ["all-content.json", "anime.json", "arabic-movies.json",
             "arabic-series.json", "asian-series.json",
             "featured-content.json", "movies.json", "series.json",
             "trending-content.json", "tvshows.json", "last-scraped.txt"]


def _write_json(path: str, data, ensure_ascii: bool) -> None:
    with open(path, "w", encoding="utf-8") as fp:
        json.dump(data, fp, indent=4, ensure_ascii=ensure_ascii)


def scrape_all(corpus, seeds: list[dict], run_dir: str,
               old_catalogs: dict | None = None,
               image_sources: dict | None = None,
               n_shards: int = 4, fetch_concurrency: int = 4,
               today: str = "2023-09-17") -> dict:
    """Run the whole reference pipeline once; returns summary metrics.
    ``today`` is injected (not wall clock) so runs are reproducible."""
    out_dir = os.path.join(run_dir, "output")
    os.makedirs(out_dir, exist_ok=True)

    # 1. crawl (the six scraper processes)
    eng = CrawlEngine(corpus, seeds, run_dir, n_shards=n_shards,
                      old_catalogs=old_catalogs,
                      image_sources=image_sources,
                      fetch_concurrency=fetch_concurrency)
    metrics = eng.run()
    eng.release()

    # 2. assemble → scraper-stage catalog files (distributed writer)
    entries = assemble_records(eng.records_dataset(),
                               old_catalogs=old_catalogs).materialize()
    write_catalogs_parallel(entries, out_dir, hashes=False)
    # record-scale dicts for the post-crawl phases (catalogs ≪ corpus)
    catalogs = build_catalogs(entries)

    # 3. trending (PRE-postprocess catalogs, like the concurrent run)
    trending_content, featured, _ = run_trending(corpus, catalogs)
    _write_json(os.path.join(out_dir, "trending-content.json"),
                trending_content, ensure_ascii=False)   # TrendingScraper.py:162-163
    _write_json(os.path.join(out_dir, "featured-content.json"),
                featured, ensure_ascii=True)            # TrendingScraper.py:154-155

    # 4. postprocess + FILE_NAMES rewrite (Postprocessing.py:64-65:
    # rewritten files are ensure_ascii=False regardless of how the
    # scraper stage wrote them)
    post, image_indices = postprocess_catalogs(catalogs, image_sources)
    for name in FILE_NAMES:
        if name in post:
            _write_json(os.path.join(out_dir, f"{name}.json"),
                        post[name], ensure_ascii=False)
    _write_json(os.path.join(out_dir, "image-indices.json"),
                image_indices, ensure_ascii=False)      # Postprocessing.py:66-67

    # 5. all-content index (AllContentIndexer.py:31-33)
    all_content = all_content_index(post)
    _write_json(os.path.join(out_dir, "all-content.json"),
                all_content, ensure_ascii=False)

    # 6. run stamp (ScrapeAll.py:34-35)
    with open(os.path.join(out_dir, "last-scraped.txt"), "w") as fp:
        fp.write(today)

    # 7. file-hashes manifest (Postprocessing.py:88-110 semantics; see
    # module docstring for the timing deviation)
    final_json = {
        "all-content": all_content,
        "featured-content": featured,
        "trending-content": trending_content,
    }
    file_hashes: dict[str, str] = {}
    for fname in ALL_FILES:
        stem = fname.split(".")[0]
        if fname.endswith(".json"):
            content = final_json.get(stem)
            if content is None:
                content = post.get(stem, catalogs.get(stem))
            if content is None:
                continue
            file_hashes[stem] = md5_of_json(content)
        else:
            file_hashes[stem] = hashlib.md5(
                today.encode("utf-8")).hexdigest()
    with open(os.path.join(out_dir, "file-hashes.json"), "w") as fp:
        json.dump(file_hashes, fp, indent=4)

    # 8. S9 image-blob pipeline: poster URLs → synthetic fetch →
    # webp→jpg transcode actor pool → parquet re-host sink
    import ray.data as rd
    img_table = image_table_from_indices(image_indices)
    n_images = 0
    if img_table.num_rows:
        transcoded = transcode_images(rd.from_arrow(img_table),
                                      image_sources)
        transcoded.write_parquet(os.path.join(out_dir, "image-blobs"))
        n_images = img_table.num_rows

    return {
        "crawl": metrics,
        "out_dir": out_dir,
        "n_entries": sum(len(v) for v in catalogs.values()),
        "n_images": n_images,
        "file_hashes": file_hashes,
    }

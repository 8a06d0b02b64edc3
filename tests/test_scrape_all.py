"""One-shot orchestration (ScrapeAll parity): a single ``scrape_all``
call must produce the reference's whole output directory, equal to the
oracle's artifacts — catalogs (postprocessed where the reference
postprocesses), trending, featured, all-content, image-indices,
file-hashes, run stamp — plus the S9 image-blob parquet."""

import hashlib
import json
import os

import pyarrow.parquet as pq
import pytest

from no_fasel_scrapers_ray.corpus.synth import (
    CIMANOW_ROUTES, generate, tiny_config)
from no_fasel_scrapers_ray.functions.hashing import md5_of_json
from no_fasel_scrapers_ray.oracle import Oracle
from no_fasel_scrapers_ray.pipelines.postprocess import FILE_NAMES
from no_fasel_scrapers_ray.pipelines.scrape_all import scrape_all
from no_fasel_scrapers_ray.stages.images import JPEG_MAGIC, PLACEHOLDER_URL

IMAGES0 = {"preexisting-fasel": "https://x/p.jpg"}
STAMP = "2023-09-17"


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    corpus, seeds = generate(tiny_config())
    run_dir = str(tmp_path_factory.mktemp("scrape_all"))
    summary = scrape_all(corpus, seeds.to_pylist(), run_dir,
                         image_sources=IMAGES0, n_shards=2, today=STAMP)
    return summary["out_dir"], summary


@pytest.fixture(scope="module")
def oracle():
    corpus, _ = generate(tiny_config())
    o = Oracle(corpus, image_sources=IMAGES0)
    o.crawl_all(CIMANOW_ROUTES)
    o.crawl_trending()
    images = o.postprocess(IMAGES0)
    return o, images


def _load(out_dir, name):
    with open(os.path.join(out_dir, name), encoding="utf-8") as fp:
        return json.load(fp)


def test_all_artifacts_present(run):
    out_dir, summary = run
    names = set(os.listdir(out_dir))
    for f in ("movies.json", "series.json", "anime.json",
              "trending-content.json", "featured-content.json",
              "all-content.json", "image-indices.json",
              "file-hashes.json", "last-scraped.txt", "image-blobs"):
        assert f in names, f
    assert summary["n_entries"] > 0


def test_postprocessed_catalogs_match_oracle(run, oracle):
    out_dir, _ = run
    o, _ = oracle
    for name in FILE_NAMES:
        got = _load(out_dir, f"{name}.json")
        assert list(got) == list(o.catalogs[name]), name
        assert got == o.catalogs[name], name


def test_trending_featured_allcontent(run, oracle):
    out_dir, _ = run
    o, _ = oracle
    assert _load(out_dir, "trending-content.json") == \
        o.catalogs["trending-content"]
    assert _load(out_dir, "featured-content.json") == \
        o.catalogs["featured-content"]
    assert _load(out_dir, "all-content.json") == o.all_content()


def test_image_indices_match_oracle(run, oracle):
    out_dir, _ = run
    _, images = oracle
    assert _load(out_dir, "image-indices.json") == images


def test_file_hashes_manifest(run):
    """md5(json.dumps(content)) over the FINAL artifacts
    (Postprocessing.py:94-107 algorithm)."""
    out_dir, _ = run
    manifest = _load(out_dir, "file-hashes.json")
    for stem, digest in manifest.items():
        if stem == "last-scraped":
            with open(os.path.join(out_dir, "last-scraped.txt")) as fp:
                assert digest == hashlib.md5(
                    fp.read().encode("utf-8")).hexdigest()
        else:
            assert digest == md5_of_json(_load(out_dir, f"{stem}.json")), stem
    with open(os.path.join(out_dir, "last-scraped.txt")) as fp:
        assert fp.read() == STAMP


def test_image_blob_pipeline(run):
    """S9: every image-index entry went through the binary stage; webp
    posters were transcoded to jpeg bytes; cache hits kept their URL."""
    out_dir, _ = run
    indices = _load(out_dir, "image-indices.json")
    t = pq.read_table(os.path.join(out_dir, "image-blobs"))
    assert t.num_rows == len(indices)
    rows = t.to_pylist()
    by_id = {r["content_id"]: r for r in rows}
    assert by_id["preexisting-fasel"]["action"] == "cached"
    assert by_id["preexisting-fasel"]["hosted_url"] == IMAGES0["preexisting-fasel"]
    n_webp = n_placeholder = 0
    for r in rows:
        url = indices[r["content_id"]]
        if r["action"] == "transcoded":
            assert ".webp" in url
            assert r["jpg_bytes"].startswith(JPEG_MAGIC)
            n_webp += 1
        elif r["action"] == "placeholder":
            assert url == ""
            assert r["hosted_url"] == PLACEHOLDER_URL
            n_placeholder += 1
        elif r["action"] == "uploaded":
            assert r["hosted_url"].startswith("https://")
    assert n_webp + n_placeholder >= 0  # corpus-dependent; presence below
    assert any(r["action"] == "uploaded" or r["action"] == "transcoded"
               for r in rows)

"""Host-partitioned corpus storage + partition-pruned path-mode fetch:

- write_corpus lays out hive ``host=`` partitions; read_corpus_table
  round-trips the exact rows;
- PartitionedFetcher loads ONLY the partitions of hosts it serves
  (r01's path mode made every worker read the whole corpus);
- a full crawl in path mode produces the SAME catalogs and frontier
  log as the broadcast-table mode.
"""

import pyarrow as pa
import pytest

from no_fasel_scrapers_ray.corpus.storage import (
    corpus_hosts, is_host_partitioned, read_corpus_table, write_corpus)
from no_fasel_scrapers_ray.corpus.synth import generate, tiny_config
from no_fasel_scrapers_ray.pipelines.assemble import (
    assemble_records, build_catalogs)
from no_fasel_scrapers_ray.pipelines.crawl import CrawlEngine
from no_fasel_scrapers_ray.stages.fetch import PartitionedFetcher


@pytest.fixture(scope="module")
def corpus_on_disk(tmp_path_factory):
    corpus, seeds = generate(tiny_config())
    root = str(tmp_path_factory.mktemp("corpus_store"))
    path = write_corpus(corpus, root)
    return corpus, seeds, path


def test_partitioned_roundtrip(corpus_on_disk):
    corpus, _, path = corpus_on_disk
    assert is_host_partitioned(path)
    hosts = corpus_hosts(path)
    assert set(hosts) == set(corpus.column("host").to_pylist())
    back = read_corpus_table(path)
    assert back.num_rows == corpus.num_rows
    got = {r["doc_id"]: r["spans"] for r in back.to_pylist()}
    for row in corpus.to_pylist():
        assert got[row["doc_id"]] == row["spans"]


def test_partition_pruned_fetch(corpus_on_disk):
    corpus, _, path = corpus_on_disk
    f = PartitionedFetcher(path)
    host = corpus.column("host")[0].as_py()
    import pyarrow.compute as pc
    sample = corpus.filter(pc.equal(corpus.column("host"), host)).slice(0, 5)
    batch = pa.table({"url": sample.column("doc_id"),
                      "host": sample.column("host")})
    out = f(batch)
    assert out.num_rows == 5
    # ONLY the touched host's partitions are resident, and only the
    # SALT slices the probe urls live in (not all CORPUS_SALTS)
    assert f.hosts_loaded == [host]
    from no_fasel_scrapers_ray.corpus.storage import url_salts
    probe_salts = set(url_salts(sample.column("doc_id").to_pylist())
                      .tolist())
    assert {s for h, s in f.partitions_loaded} == probe_salts
    # span sequences survive the partitioned path byte-exactly (rows
    # come back grouped by salt partition → compare keyed by url)
    got = dict(zip(out.column("url").to_pylist(),
                   out.column("spans").to_pylist()))
    want = dict(zip(sample.column("doc_id").to_pylist(),
                    sample.column("spans").to_pylist()))
    assert got == want
    # unknown host → no partition load beyond the probe, no rows
    miss = f(pa.table({"url": pa.array(["http://nowhere.test/x"]),
                       "host": pa.array(["nowhere.test"])}))
    assert miss.num_rows == 0


def test_path_mode_crawl_equivalence(corpus_on_disk, tmp_path_factory):
    corpus, seeds, path = corpus_on_disk
    bdir = str(tmp_path_factory.mktemp("bcast_run"))
    pdir = str(tmp_path_factory.mktemp("path_run"))
    eng_b = CrawlEngine(corpus, seeds.to_pylist(), bdir, n_shards=2)
    eng_b.run()
    eng_p = CrawlEngine(path, seeds.to_pylist(), pdir, n_shards=2)
    eng_p.run()
    assert eng_p.frontier_log_table().to_pylist() == \
        eng_b.frontier_log_table().to_pylist()
    cat_b = build_catalogs(assemble_records(eng_b.records_dataset()))
    cat_p = build_catalogs(assemble_records(eng_p.records_dataset()))
    assert cat_p == cat_b
    assert eng_p.seen_urls() == eng_b.seen_urls()

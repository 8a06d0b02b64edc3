"""Per-page parse artifacts emitted by the crawl's extract stage.

``page_stats_record`` computes, for every fetched page:
- the **span-sequence fingerprint**: blake2b over the canonical
  (kind, text, media_ref, order) tuple stream — the per-row
  span-sequence-exact checksum (BASELINE.json input_hint invariant),
  persisted per page so any later re-parse can be verified without
  re-reading the corpus;
- crawl-time text statistics (token count, stopword hits, text-span
  count) — the quality-scoring pass a training-data pipeline runs on
  every crawled page.

This is deliberate per-page compute in the hot path: it is the
"parse" of "pages fetched+parsed/sec" in the sandbox, where fetch is
an in-memory lookup.
"""

from __future__ import annotations

import hashlib
import json

from ..corpus.spans import PageView

STOPWORDS = frozenset(("the", "a", "of", "and", "in"))


def span_fingerprint(page: PageView) -> str:
    h = hashlib.blake2b(digest_size=16)
    K, T, M = page.kinds, page.txts, page.mrefs
    for i in range(page.lo, page.hi):
        h.update(K[i].encode())
        h.update(b"\x00")
        h.update(T[i].encode())
        h.update(b"\x00")
        h.update(M[i].encode())
        h.update(b"\x01")
    return h.hexdigest()


def page_stats_record(row: dict, page: PageView) -> dict:
    n_tokens = 0
    n_stop = 0
    n_text = 0
    K, T = page.kinds, page.txts
    for i in range(page.lo, page.hi):
        if K[i] != "text":
            continue
        n_text += 1
        toks = T[i].split()
        n_tokens += len(toks)
        for t in toks:
            if t in STOPWORDS:
                n_stop += 1
    return {
        "catalog": "__pages__",
        "record_type": "page_stat",
        "key": row["url"],
        "series_key": "",
        "season_key": "",
        "order_key": row["order_key"],
        "payload": json.dumps({
            "fingerprint": span_fingerprint(page),
            "n_spans": len(page),
            "n_text_spans": n_text,
            "n_tokens": n_tokens,
            "n_stopwords": n_stop,
            "depth": row["depth"],
            "site": row["site"],
        }),
    }

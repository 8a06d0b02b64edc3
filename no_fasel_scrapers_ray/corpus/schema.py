"""Arrow schemas for the interleaved-document corpus and the engine's
intermediate tables (BASELINE.json input_hint / FIXTURES.md).

The corpus row is one fetchable page:
  doc_id: string                       # canonical URL
  spans:  list<struct<kind, text, media_ref, offset>>  # document order

Span kinds:
  'text'      — text content in ``text`` (format "class::payload", the
                selector-analogue; media_ref = '')
  'media_ref' — poster/stream/iframe URL in ``media_ref`` (text = '')
  'link'      — discovered href in ``media_ref`` (text = '')

The per-row invariant checked by tests is span-sequence equality
(kind, text, media_ref, order) between the engine's parse output and the
oracle (north_rule).
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])

SPAN_TYPE = pa.list_(SPAN_STRUCT)

CORPUS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("host", pa.string()),      # partition column (groupby-host shuffle key)
    ("spans", SPAN_TYPE),
])

# Frontier rows: the unit of fetch scheduling. ``seq`` is the logical
# discovery clock (monotone per push), the third component of the
# (site, depth, discovery_time) priority (north_rule). ``meta`` carries
# listing-card context to the detail fetch (title/poster/category — the
# engine analogue of the reference passing movie_div into scrape_page,
# FaselMoviesScraper.py:14-45). ``order_key`` is the packed catalog
# ordering key (shard_rank, page, card) — SURVEY.md §1.3.
FRONTIER_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("host", pa.string()),
    ("site", pa.string()),
    ("category", pa.string()),
    ("page_type", pa.string()),
    ("depth", pa.int32()),
    ("seq", pa.int64()),
    ("order_key", pa.string()),  # dot-separated structural clock (sortable)
    ("meta", pa.string()),       # JSON payload
])

# Flat record rows emitted by extract; nesting into seasons/episodes
# happens in the assembly groupby (A1/A2). One row per movie / series /
# season / episode / wecima-entry etc., discriminated by ``record_type``.
RECORD_SCHEMA = pa.schema([
    ("record_type", pa.string()),   # movie | series | season | episode | ...
    ("site", pa.string()),
    ("catalog", pa.string()),       # output file family, e.g. 'movies'
    ("key", pa.string()),           # content id (catalog dict key)
    ("series_key", pa.string()),
    ("season_key", pa.string()),
    ("title", pa.string()),
    ("category", pa.string()),
    ("genres", pa.list_(pa.string())),
    ("format", pa.string()),
    ("rating", pa.string()),
    ("image_ref", pa.string()),
    ("source", pa.string()),
    ("season_number", pa.string()), # string: HDW uses raw "2", fasel int-as-str
    ("episode_number", pa.int64()),
    ("n_episodes", pa.int64()),
    ("sources_json", pa.string()),  # CimaNow list<{quality: url}>
    ("order_key", pa.int64()),
])


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()

"""Span-sequence access helpers — the engine's "selector" layer.

A page is a sequence of (kind, text, media_ref, offset) spans; text
spans carry ``"class::payload"`` (schema.py). PageView gives the
selector-equivalent operations the reference performs with
BeautifulSoup — filter by class, first-match, adjacency pairing of a
marker text span with the link/media span that follows it (the anchor-
text analogue). Used by both the site adapters (stages/adapters.py)
and the reference-semantics oracle, which share NOTHING else.
"""

from __future__ import annotations


class PageView:
    __slots__ = ("spans",)

    def __init__(self, spans: list[dict]):
        # spans: [{kind, text, media_ref, offset}] in document order
        self.spans = spans

    def sequence(self) -> list[tuple[str, str, str, int]]:
        """The invariant tuple sequence (kind, text, media_ref, order)."""
        return [(s["kind"], s["text"], s["media_ref"], i)
                for i, s in enumerate(self.spans)]

    # -- text selectors ----------------------------------------------------

    def texts(self, cls: str) -> list[str]:
        prefix = cls + "::"
        return [s["text"][len(prefix):] for s in self.spans
                if s["kind"] == "text" and s["text"].startswith(prefix)]

    def first_text(self, cls: str) -> str | None:
        prefix = cls + "::"
        for s in self.spans:
            if s["kind"] == "text" and s["text"].startswith(prefix):
                return s["text"][len(prefix):]
        return None

    # -- link / media selectors --------------------------------------------

    def links(self) -> list[str]:
        return [s["media_ref"] for s in self.spans if s["kind"] == "link"]

    def medias(self) -> list[str]:
        return [s["media_ref"] for s in self.spans if s["kind"] == "media_ref"]

    def first_media(self) -> str | None:
        for s in self.spans:
            if s["kind"] == "media_ref":
                return s["media_ref"]
        return None

    def marked_links(self, marker_cls: str) -> list[tuple[str, str]]:
        """(marker_payload, href) for each text span of ``marker_cls``
        immediately followed by a link span — the anchor-text pairing."""
        prefix = marker_cls + "::"
        out = []
        for i, s in enumerate(self.spans[:-1]):
            nxt = self.spans[i + 1]
            if (s["kind"] == "text" and s["text"].startswith(prefix)
                    and nxt["kind"] == "link"):
                out.append((s["text"][len(prefix):], nxt["media_ref"]))
        return out

    def marked_medias(self, marker_cls: str) -> list[tuple[str, str]]:
        prefix = marker_cls + "::"
        out = []
        for i, s in enumerate(self.spans[:-1]):
            nxt = self.spans[i + 1]
            if (s["kind"] == "text" and s["text"].startswith(prefix)
                    and nxt["kind"] == "media_ref"):
                out.append((s["text"][len(prefix):], nxt["media_ref"]))
        return out

    def cards(self, start_classes: tuple[str, ...]) -> list["PageView"]:
        """Split the page into card sub-sequences: a new card starts at a
        text span whose class is in ``start_classes``. Pagination/header
        spans before the first card are dropped."""
        groups: list[list[dict]] = []
        current: list[dict] | None = None
        prefixes = tuple(c + "::" for c in start_classes)
        for s in self.spans:
            if s["kind"] == "text" and s["text"].startswith(prefixes):
                current = [s]
                groups.append(current)
            elif current is not None:
                current.append(s)
        return [PageView(g) for g in groups]


def span_rows_to_pages(batch) -> list[tuple[str, PageView]]:
    """Arrow batch of corpus rows → [(doc_id, PageView)]."""
    doc_ids = batch["doc_id"].to_pylist()
    spans = batch["spans"].to_pylist()
    return [(d, PageView(s)) for d, s in zip(doc_ids, spans)]

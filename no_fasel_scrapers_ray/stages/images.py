"""Binary image-column stage (S9): cache join + webp→jpg transcode +
re-host, as a ``map_batches`` ACTOR-POOL stage over Arrow binary
batches. Reference: ``upload_image`` (Common.py:217-254) — image-index
cache hit → cached URL; empty URL → placeholder; ``.webp`` → decode,
convert RGB, re-encode jpeg; then imgur upload → hosted URL.

Codec seam (the sandbox ships no Pillow and no network):
- when PIL imports, ``_transcode`` decodes real webp bytes and encodes
  real jpeg bytes;
- otherwise a deterministic fake container stands in: synthetic blobs
  from ``synth_image_blob`` carry a magic header + payload, and
  transcoding re-wraps the payload under the JPEG magic. The Ray-side
  plumbing — schema, small-batch sizing for big binary payloads, the
  actor pool with per-actor codec/cache setup, the parquet output
  layout — is real and tested either way.

Scale shape: image bytes are the heaviest column in the engine, so
``batch_size`` stays small (bytes × batch_size × concurrency must fit
worker heaps) and the stage is an actor pool (codec + cache built once
per actor, never per batch). The cache is a ``ray.put`` broadcast
fetched once in ``__init__``.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray
import ray.data as rd

from ..functions.connectors import mock_imgur_upload
from ..ops.util import pool_size

# Common.py:229 — the placeholder poster
PLACEHOLDER_URL = "https://imgpile.com/images/TPDrVl.jpg"

WEBP_MAGIC = b"FAKEWEBP\x00"
JPEG_MAGIC = b"FAKEJPEG\x00"

IMAGE_SCHEMA = pa.schema([
    ("content_id", pa.string()),
    ("image_url", pa.string()),
    ("image_bytes", pa.binary()),
])


def synth_image_blob(image_url: str) -> bytes:
    """Deterministic stand-in for the HTTP image fetch: a fake container
    whose payload derives from the URL. ``.webp`` URLs produce fake-webp
    blobs, everything else fake-jpeg — mirroring what the reference's
    ``get_image`` would return."""
    if not image_url:
        return b""
    payload = hashlib.blake2b(image_url.encode("utf-8"),
                              digest_size=32).digest() * 8
    magic = WEBP_MAGIC if ".webp" in image_url else JPEG_MAGIC
    return magic + payload


class ImageTranscoder:
    """Per-actor state: the image-source cache (broadcast, fetched once)
    and the codec (PIL when importable, fake container otherwise)."""

    def __init__(self, image_sources_ref=None):
        self.cache: dict = (ray.get(image_sources_ref)
                            if image_sources_ref is not None else {})
        try:
            from PIL import Image          # pragma: no cover (not in sandbox)
            self._pil = Image
        except ImportError:
            self._pil = None

    def _transcode(self, blob: bytes) -> bytes:
        """webp bytes → jpeg bytes (Common.py:237-246)."""
        if self._pil is not None:          # pragma: no cover
            import io
            img = self._pil.open(io.BytesIO(blob)).convert("RGB")
            out = io.BytesIO()
            img.save(out, "jpeg")
            return out.getvalue()
        if blob.startswith(WEBP_MAGIC):
            return JPEG_MAGIC + blob[len(WEBP_MAGIC):]
        return blob

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("content_id").to_pylist()
        urls = batch.column("image_url").to_pylist()
        blobs = batch.column("image_bytes").to_pylist()
        hosted, jpg, action = [], [], []
        for cid, url, blob in zip(ids, urls, blobs):
            if cid in self.cache:                      # Common.py:222-224
                hosted.append(self.cache[cid])
                jpg.append(b"")
                action.append("cached")
            elif not url:                              # Common.py:226-229
                hosted.append(PLACEHOLDER_URL)
                jpg.append(b"")
                action.append("placeholder")
            else:
                is_webp = (".webp" in url) or blob.startswith(WEBP_MAGIC)
                out = self._transcode(blob) if is_webp else blob
                digest = hashlib.md5(out).hexdigest()
                hosted.append(mock_imgur_upload(f"{cid}:{digest}"))
                jpg.append(out)
                action.append("transcoded" if is_webp else "uploaded")
        return pa.table({
            "content_id": pa.array(ids, pa.string()),
            "hosted_url": pa.array(hosted, pa.string()),
            "jpg_bytes": pa.array(jpg, pa.binary()),
            "action": pa.array(action, pa.string()),
        })


def image_table_from_indices(image_indices: dict[str, str]) -> pa.Table:
    """(content_id → poster URL) map → the binary-column input table,
    with blobs synthesized deterministically (the sandbox fetch)."""
    ids = sorted(image_indices)
    urls = [image_indices[k] for k in ids]
    return pa.table({
        "content_id": pa.array(ids, pa.string()),
        "image_url": pa.array(urls, pa.string()),
        "image_bytes": pa.array([synth_image_blob(u) for u in urls],
                                pa.binary()),
    }, schema=IMAGE_SCHEMA)


def transcode_images(images: rd.Dataset, image_sources: dict | None = None,
                     concurrency: int = 4,
                     batch_size: int = 128) -> rd.Dataset:
    """The S9 stage: binary batches through the ImageTranscoder actor
    pool. batch_size is deliberately small — payload bytes dominate the
    batch footprint."""
    ref = ray.put(image_sources or {})
    return images.map_batches(
        ImageTranscoder, fn_constructor_args=(ref,),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=pool_size(concurrency), num_cpus=1)

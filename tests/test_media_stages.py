"""Multimodal binary-column stages (stages/media.py): schema, actor-pool
plumbing, and deterministic fake-codec semantics — resize keeps aspect,
frame sampling picks every k-th frame verbatim, audio features are a
fixed-length float32 vector."""

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from no_fasel_scrapers_ray.stages.media import (
    AudioFeaturizer, extract_audio_features, resize_images, sample_frames,
    synth_audio, synth_image, synth_video)


def _ds(col: str, blobs: dict[str, bytes]) -> rd.Dataset:
    ids = sorted(blobs)
    return rd.from_arrow(pa.table({
        "content_id": pa.array(ids, pa.string()),
        col: pa.array([blobs[i] for i in ids], pa.binary()),
    }))


def test_resize_images():
    ds = _ds("image_bytes", {
        "big": synth_image("big", 320, 240),
        "small": synth_image("small", 64, 48),     # already fits: untouched
    })
    out = resize_images(ds, max_w=128, max_h=128,
                        concurrency=1).to_pandas().set_index("content_id")
    assert out.loc["big", "thumb_w"] == 128 and out.loc["big", "thumb_h"] == 96
    assert out.loc["small", "thumb_w"] == 64 and out.loc["small", "thumb_h"] == 48
    assert len(out.loc["big", "thumb_bytes"]) < len(synth_image("big", 320, 240))
    # deterministic across runs
    out2 = resize_images(ds, max_w=128, max_h=128,
                         concurrency=1).to_pandas().set_index("content_id")
    assert out.loc["big", "thumb_bytes"] == out2.loc["big", "thumb_bytes"]


def test_sample_frames():
    ds = _ds("video_bytes", {"v1": synth_video("v1", n_frames=48,
                                               frame_bytes=64)})
    out = sample_frames(ds, every=8, max_frames=16,
                        concurrency=1).to_pandas()
    assert out["n_sampled"].tolist() == [6]          # frames 0,8,...,40
    frames = out["frames"].iloc[0]
    for k, frame in enumerate(frames):
        expect = hashlib.blake2b(f"v1:{k * 8}".encode(),
                                 digest_size=64).digest()
        assert bytes(frame) == expect


def test_audio_features():
    ds = _ds("audio_bytes", {"a1": synth_audio("a1"),
                             "bad": b"not audio"})
    out = extract_audio_features(ds, concurrency=1).to_pandas() \
        .set_index("content_id")
    feat = np.asarray(out.loc["a1", "features"], dtype=np.float32)
    assert feat.shape == (AudioFeaturizer.N_BINS + 1,)
    assert feat[0] > 0                                # RMS energy
    assert abs(float(feat[1:].sum()) - 1.0) < 1e-3    # histogram mass
    assert np.allclose(np.asarray(out.loc["bad", "features"]), 0.0)

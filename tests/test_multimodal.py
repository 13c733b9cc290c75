"""Multimodal plumbing: schemas, mapInPandas batching, deterministic stub
decode, numpy-oracle checks on features, and the real-decoder gate."""

from __future__ import annotations

import numpy as np
import pytest

from soweego_spark.operators.multimodal import (
    audio_frame_energy,
    decode_image_features,
    generate_media_fixture,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    return generate_media_fixture(spark, n_assets=60, seed=42).cache()


def test_image_features_match_numpy_oracle(spark, media):
    raw = {
        r["asset_id"]: (bytes(r["content"]), r["meta"])
        for r in media.filter("kind = 'image'").collect()
    }
    got = {r["asset_id"]: r for r in decode_image_features(media).collect()}
    assert set(got) == set(raw) and len(got) == 20
    for aid, (content, meta) in raw.items():
        buf = np.frombuffer(content, dtype=np.uint8)
        hist, _ = np.histogram(buf, bins=16, range=(0, 256))
        assert got[aid]["n_bytes"] == len(buf)
        assert got[aid]["histogram"] == hist.tolist()
        p = hist / len(buf)
        ent = float(-(p[p > 0] * np.log2(p[p > 0])).sum())
        assert abs(got[aid]["byte_entropy"] - round(ent, 6)) < 1e-9
        assert len(got[aid]["channel_mean"]) == 3
        assert all(0 <= m <= 255 for m in got[aid]["channel_mean"])


def test_image_features_deterministic(spark, media):
    a = sorted(map(tuple, decode_image_features(media).collect()))
    b = sorted(map(tuple, decode_image_features(media).collect()))
    assert a == b


def test_audio_energy_oracle(spark, media):
    raw = {
        r["asset_id"]: bytes(r["content"])
        for r in media.filter("kind = 'audio'").collect()
    }
    got = {r["asset_id"]: r for r in audio_frame_energy(media).collect()}
    assert set(got) == set(raw)
    for aid, content in raw.items():
        buf = np.frombuffer(content, dtype=np.uint8).astype(np.float64)
        n_frames = int(np.ceil(len(buf) / 1024))
        assert got[aid]["n_frames"] == n_frames
        assert len(got[aid]["frame_energy"]) == n_frames
        x = np.pad(buf - 128.0, (0, n_frames * 1024 - len(buf)))
        energy = np.round(np.sqrt((x.reshape(n_frames, 1024) ** 2).mean(axis=1)), 6)
        assert got[aid]["peak_frame"] == int(energy.argmax())
        np.testing.assert_allclose(got[aid]["frame_energy"], energy)


def test_video_frame_sampling(spark, media):
    metas = {
        r["asset_id"]: r["meta"]["duration_ms"]
        for r in media.filter("kind = 'video'").collect()
    }
    frames = sample_video_frames(media, fps=1.0).collect()
    by_asset = {}
    for f in frames:
        by_asset.setdefault(f["asset_id"], []).append(f)
    assert set(by_asset) == set(metas)
    for aid, fs in by_asset.items():
        expected_n = len(range(0, metas[aid], 1000))
        assert len(fs) == expected_n
        offs = sorted(f["offset_ms"] for f in fs)
        assert offs == list(range(0, metas[aid], 1000))
        assert all(len(bytes(f["frame"])) > 0 for f in fs)


def test_real_decoder_gated(spark, media):
    with pytest.raises(NotImplementedError):
        decode_image_features(media, decoder="real")
    with pytest.raises(NotImplementedError):
        audio_frame_energy(media, decoder="real")
    with pytest.raises(NotImplementedError):
        sample_video_frames(media, decoder="real")


def test_resize_images_shape_and_replay(spark):
    """Every image resizes to the target tensor shape, and the pixel
    buffer replays exactly from the same stub decode + NN grid in numpy."""
    import numpy as np

    from soweego_spark.operators.multimodal import (
        _fake_decode_image,
        generate_media_fixture,
        resize_images,
    )

    media = generate_media_fixture(spark, n_assets=12, seed=7)
    tw, th = 16, 16
    got = {
        r["asset_id"]: (r["width"], r["height"], bytes(r["pixels"]))
        for r in resize_images(media, target_w=tw, target_h=th).collect()
    }
    src = {
        r["asset_id"]: (bytes(r["content"]), r["meta"])
        for r in media.filter("kind = 'image'").collect()
    }
    assert set(got) == set(src) and len(got) > 0
    for aid, (w_out, h_out, pix) in got.items():
        assert (w_out, h_out) == (tw, th)
        assert len(pix) == tw * th * 3
        content, meta = src[aid]
        w, h = int(meta["width"]), int(meta["height"])
        img = _fake_decode_image(content, w, h)
        ys = (np.arange(th) * h // th).clip(0, h - 1)
        xs = (np.arange(tw) * w // tw).clip(0, w - 1)
        assert pix == img[ys[:, None], xs[None, :], :].tobytes()

"""Native C++ data runtime: build, decode parity vs PIL, WAV parity."""

import os
import sys
import wave

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import runtime  # noqa: E402


pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason="native runtime unavailable")


def test_jpeg_decode_matches_pil(tmp_path):
    from PIL import Image

    rs = np.random.RandomState(0)
    paths = []
    for i, (h, w) in enumerate([(100, 80), (64, 64), (257, 311)]):
        img = (rs.rand(h, w, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"img{i}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)

    out, ok = runtime.decode_image_batch(paths, 48)
    assert ok.all()
    assert out.shape == (3, 48, 48, 3)
    # parity vs PIL decode + same resize/crop rule
    from vast_tpu.data.vision import _load_image, _resize_short_side
    for i, p in enumerate(paths):
        ref = _resize_short_side(_load_image(p), 48)
        # both pipelines decode the same jpeg then bilinear-resize; allow
        # small interpolation differences
        diff = np.abs(out[i].astype(int) - ref.astype(int))
        assert diff.mean() < 12.0, (i, diff.mean())


def test_jpeg_decode_bad_file(tmp_path):
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"not a jpeg")
    missing = str(tmp_path / "missing.jpg")
    out, ok = runtime.decode_image_batch([bad, missing], 32)
    assert not ok.any()
    assert (out == 0).all()


def test_wav_load_matches_python(tmp_path):
    sr = 22050
    t = np.arange(sr, dtype=np.float32) / sr
    tone = (np.sin(2 * np.pi * 440 * t) * 16000).astype(np.int16)
    p = str(tmp_path / "tone.wav")
    with wave.open(p, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(tone.tobytes())

    n_samples = 16000
    out, valid = runtime.load_wav_batch([p], n_samples)
    assert valid[0] == 1
    from vast_tpu.data.audio import read_wav, resample_linear
    ref, sr2 = read_wav(p)
    ref = resample_linear(ref, sr2, 16000) * 2 ** 15
    ref = ref[:n_samples]
    np.testing.assert_allclose(out[0][: len(ref)], ref, atol=30.0)


def test_wav_missing_gives_zero(tmp_path):
    out, valid = runtime.load_wav_batch([str(tmp_path / "nope.wav")], 1000)
    assert valid[0] == 0
    assert (out == 0).all()

"""Tar-shard streaming dataset (webdataset equivalent)."""

import io
import json
import os
import tarfile

import numpy as np
import pytest

from tests.helpers import TINY_MODEL_CFG_JSON
from vast_tpu.config import EasyDict
from vast_tpu.data.src_dataset import SrcIndexedDataset
from vast_tpu.data.tokenizer import tiny_tokenizer


def make_shard(path, n, start=0, corrupt_one=False):
    from PIL import Image

    rs = np.random.RandomState(start)
    with tarfile.open(path, "w") as tf:
        for i in range(start, start + n):
            key = f"img{i:05d}"
            buf = io.BytesIO()
            Image.fromarray(
                (rs.rand(40, 40, 3) * 255).astype(np.uint8)).save(
                    buf, format="JPEG")
            data = buf.getvalue()
            if corrupt_one and i == start:
                data = b"garbage"
            info = tarfile.TarInfo(key + ".jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            txt = f"a man in the park {i}".encode()
            info = tarfile.TarInfo(key + ".txt")
            info.size = len(txt)
            tf.addfile(info, io.BytesIO(txt))


def make_args():
    return EasyDict({
        "model_cfg": dict(TINY_MODEL_CFG_JSON),
        "run_cfg": {"seed": 0},
    })


def test_streams_samples_across_shards(tmp_path):
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    make_shard(str(shard_dir / "s0.tar"), 3, 0)
    make_shard(str(shard_dir / "s1.tar"), 3, 3)
    d_cfg = {"type": "srcindexed", "training": False, "name": "laion",
             "txt": str(shard_dir), "vision_format": "image_rawimage",
             "task": "ret%tv", "batch_size": 2}
    ds = SrcIndexedDataset(d_cfg, make_args(), tiny_tokenizer())
    samples = list(ds)
    assert len(samples) == 6
    s = samples[0]
    assert s["vision_frames"].shape[0] == 1
    assert s["vision_frames"].dtype == np.uint8
    assert "man" in s["raw_captions"]


def test_warn_and_continue_on_corrupt(tmp_path):
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    make_shard(str(shard_dir / "s0.tar"), 3, 0, corrupt_one=True)
    d_cfg = {"type": "srcindexed", "training": False, "name": "laion",
             "txt": str(shard_dir), "vision_format": "image_rawimage",
             "task": "ret%tv", "batch_size": 2}
    ds = SrcIndexedDataset(d_cfg, make_args(), tiny_tokenizer())
    samples = list(ds)
    assert len(samples) == 2  # corrupt sample skipped, not fatal


def test_host_sharding(tmp_path):
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    for i in range(4):
        make_shard(str(shard_dir / f"s{i}.tar"), 1, i)
    d_cfg = {"type": "srcindexed", "training": False, "name": "laion",
             "txt": str(shard_dir), "vision_format": "image_rawimage",
             "task": "ret%tv", "batch_size": 1}
    a = SrcIndexedDataset(d_cfg, make_args(), tiny_tokenizer(),
                          host_id=0, num_hosts=2)
    b = SrcIndexedDataset(d_cfg, make_args(), tiny_tokenizer(),
                          host_id=1, num_hosts=2)
    ids_a = {s["id"] for s in a}
    ids_b = {s["id"] for s in b}
    assert not ids_a & ids_b
    assert len(ids_a | ids_b) == 4


# ---------------------------------------------------------------------
# video tars, txt_format sidecars, shuffle buffer (round-4: IndexSrc.py
# :104-131,163-175 coverage)
# ---------------------------------------------------------------------

def _media_available():
    try:
        import runtime
        return runtime.media_available()
    except Exception:
        return False


def make_video_shard(path, n, start=0, n_frames=40, with_txt=True,
                     key_prefix="vid"):
    """Tar of runtime-encoded mp4 members (frame i has luma 21 + 2*i)."""
    import runtime

    tmp = str(path) + ".work.mp4"
    with tarfile.open(path, "w") as tf:
        for i in range(start, start + n):
            key = f"{key_prefix}{i:05d}"
            assert runtime.encode_video(tmp, w=48, h=48, n_frames=n_frames,
                                        fps=20.0)
            data = open(tmp, "rb").read()
            info = tarfile.TarInfo(key + ".mp4")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            if with_txt:
                txt = f"a video of thing {i}".encode()
                info = tarfile.TarInfo(key + ".txt")
                info.size = len(txt)
                tf.addfile(info, io.BytesIO(txt))
    os.remove(tmp)


@pytest.mark.skipif(not _media_available(),
                    reason="native media runtime unavailable")
def test_video_tar_round_trip(tmp_path):
    """mp4 tar members stream with split-segment frame sampling
    (IndexSrc.py:104-110): eval picks segment centers, so the fixture's
    monotone luma must come back strictly increasing."""
    import runtime

    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    make_video_shard(str(shard_dir / "v0.tar"), 2, 0, n_frames=40)
    d_cfg = {"type": "srcindexed", "training": False, "name": "webvid",
             "vision": str(shard_dir), "vision_format": "video_rawvideo",
             "vision_sample_num": 4, "task": "ret%tv", "batch_size": 2}
    ds = SrcIndexedDataset(d_cfg, make_args(), tiny_tokenizer())
    samples = list(ds)
    assert len(samples) == 2
    s = samples[0]
    assert s["vision_frames"].shape == (4, ds.host_size, ds.host_size, 3)
    assert s["vision_frames"].dtype == np.uint8
    assert "thing" in s["raw_captions"]
    # eval sampling = segment centers of 40 frames -> indices 4,14,24,34;
    # fixture luma rises 2/frame, so mean brightness is strictly increasing
    means = s["vision_frames"].reshape(4, -1).mean(axis=1)
    assert (np.diff(means) > 5).all(), means
    # and the segment-center frames match a direct native decode
    blob = None
    with tarfile.open(str(shard_dir / "v0.tar")) as tf:
        for m in tf:
            if m.name.endswith(".mp4"):
                blob = tf.extractfile(m).read()
                break
    direct, ok = runtime.decode_video_bytes_batch(
        [blob], np.asarray([[4, 14, 24, 34]], np.int32), ds.host_size)
    assert ok[0]
    np.testing.assert_array_equal(s["vision_frames"], direct[0])


@pytest.mark.skipif(not _media_available(),
                    reason="native media runtime unavailable")
def test_video_tar_training_samples_within_segments(tmp_path):
    """Training picks a random frame inside each of the 4 even segments
    (split() + random.choice, IndexSrc.py:108-109)."""
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    make_video_shard(str(shard_dir / "v0.tar"), 1, 0, n_frames=40)
    d_cfg = {"type": "srcindexed", "training": True, "name": "webvid",
             "vision": str(shard_dir), "vision_format": "video_rawvideo",
             "vision_sample_num": 4, "task": "ret%tv", "batch_size": 1,
             "shuffle_buffer": 0}
    ds = SrcIndexedDataset(d_cfg, make_args(), tiny_tokenizer())
    s = next(iter(ds))
    means = s["vision_frames"].reshape(4, -1).mean(axis=1)
    # luma rises 2/frame within the whole clip; segments are [0,10),[10,20)
    # etc so segment means stay ordered even with random in-segment picks
    assert (np.diff(means) > 0).all(), means


def _image_member(rs):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray((rs.rand(40, 40, 3) * 255).astype(np.uint8)).save(
        buf, format="JPEG")
    return buf.getvalue()


def make_image_shard_no_txt(path, keys):
    rs = np.random.RandomState(0)
    with tarfile.open(path, "w") as tf:
        for key in keys:
            data = _image_member(rs)
            info = tarfile.TarInfo(key + ".jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))


def test_txt_format_dir_sidecars(tmp_path):
    """txt_format='dir': captions from per-prefix JSON files keyed either
    '<id[:5]>/<id>' or '<id>' (IndexSrc.py:121-131); captionless ids are
    skipped."""
    shard_dir = tmp_path / "shards"
    cap_dir = tmp_path / "caps"
    shard_dir.mkdir()
    cap_dir.mkdir()
    keys = ["abcde001", "abcde002", "zzzzz001", "nocap001"]
    make_image_shard_no_txt(str(shard_dir / "s0.tar"), keys)
    with open(cap_dir / "abcde.json", "w") as f:
        json.dump({"abcde/abcde001": ["cap one a", "cap one b"],
                   "abcde002": ["cap two"]}, f)
    with open(cap_dir / "zzzzz.json", "w") as f:
        json.dump({"zzzzz001": ["cap three"]}, f)
    d_cfg = {"type": "srcindexed", "training": False, "name": "laion400m",
             "vision": str(shard_dir), "txt": str(cap_dir),
             "txt_format": "dir", "vision_format": "image_rawimage",
             "task": "ret%tv", "batch_size": 2}
    ds = SrcIndexedDataset(d_cfg, make_args(), tiny_tokenizer())
    samples = {s["id"]: s["raw_captions"] for s in ds}
    assert set(samples) == {"abcde001", "abcde002", "zzzzz001"}
    assert samples["abcde001"] in ("cap one a", "cap one b")
    assert samples["abcde002"] == "cap two"
    assert samples["zzzzz001"] == "cap three"


def test_txt_format_json_dict(tmp_path):
    """txt_format='json': one big id->caption dict (IndexSrc.py:72-73,
    119-120)."""
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    keys = ["img00001", "img00002"]
    make_image_shard_no_txt(str(shard_dir / "s0.tar"), keys)
    cap_path = tmp_path / "caps.json"
    with open(cap_path, "w") as f:
        json.dump({"img00001": "first caption", "img00002": "second one"}, f)
    d_cfg = {"type": "srcindexed", "training": False, "name": "cc12m",
             "vision": str(shard_dir), "txt": str(cap_path),
             "txt_format": "json", "vision_format": "image_rawimage",
             "task": "ret%tv", "batch_size": 2}
    ds = SrcIndexedDataset(d_cfg, make_args(), tiny_tokenizer())
    samples = {s["id"]: s["raw_captions"] for s in ds}
    assert samples == {"img00001": "first caption",
                       "img00002": "second one"}


def test_txt_format_json_overrides_tar_member(tmp_path):
    """When txt_format='json', the json lookup unconditionally overrides an
    in-tar .txt member (IndexSrc.py:119-120); the tar member is used only
    when the lookup misses the key (ADVICE r4)."""
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    # make_shard writes BOTH a .jpg and a .txt member per key
    make_shard(str(shard_dir / "s0.tar"), 2, 0)
    cap_path = tmp_path / "caps.json"
    with open(cap_path, "w") as f:
        json.dump({"img00000": "json wins"}, f)  # img00001 missing
    d_cfg = {"type": "srcindexed", "training": False, "name": "cc12m",
             "vision": str(shard_dir), "txt": str(cap_path),
             "txt_format": "json", "vision_format": "image_rawimage",
             "task": "ret%tv", "batch_size": 2}
    ds = SrcIndexedDataset(d_cfg, make_args(), tiny_tokenizer())
    samples = {s["id"]: s["raw_captions"] for s in ds}
    assert samples["img00000"] == "json wins"          # override
    assert samples["img00001"] == "a man in the park 1"  # fallback


def test_shard_list_from_json(tmp_path):
    """The shard source may be a JSON list of tar paths
    (IndexSrc.py:150-152)."""
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    make_shard(str(shard_dir / "s0.tar"), 2, 0)
    make_shard(str(shard_dir / "s1.tar"), 2, 2)
    lst = tmp_path / "tars.json"
    with open(lst, "w") as f:
        json.dump([str(shard_dir / "s0.tar"), str(shard_dir / "s1.tar")], f)
    d_cfg = {"type": "srcindexed", "training": False, "name": "laion",
             "vision": str(lst), "vision_format": "image_rawimage",
             "task": "ret%tv", "batch_size": 2}
    ds = SrcIndexedDataset(d_cfg, make_args(), tiny_tokenizer())
    assert len(list(ds)) == 4


def test_shuffle_buffer_reorders_within_shard(tmp_path):
    """Training streams pass through a ~1000-slot replacement buffer
    (webdataset .shuffle(1000), IndexSrc.py:170) so batches are not
    tar-sequential. With one shard, tar order is deterministic -> any
    order change must come from the sample-level buffer."""
    import itertools

    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    make_shard(str(shard_dir / "s0.tar"), 16, 0)
    base = {"type": "srcindexed", "training": True, "name": "laion",
            "txt": str(shard_dir), "vision_format": "image_rawimage",
            "task": "ret%tv", "batch_size": 4}
    ordered = SrcIndexedDataset({**base, "shuffle_buffer": 0},
                                make_args(), tiny_tokenizer())
    shuffled = SrcIndexedDataset({**base, "shuffle_buffer": 8},
                                 make_args(), tiny_tokenizer())
    ids_ordered = [s["id"] for s in itertools.islice(iter(ordered), 16)]
    ids_shuffled = [s["id"] for s in itertools.islice(iter(shuffled), 16)]
    assert ids_ordered == sorted(ids_ordered)  # tar order, single shard
    assert set(ids_shuffled) <= set(ids_ordered)
    assert ids_shuffled != ids_ordered


@pytest.mark.skipif(not _media_available(),
                    reason="native media runtime unavailable")
def test_video_tar_yuv420_wire(tmp_path):
    """pixel_format yuv420 streams packed planes under vision_frames_yuv;
    the device expansion recovers the same frames as the RGB path."""
    from vast_tpu.ops.image import yuv420_to_rgb

    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    make_video_shard(str(shard_dir / "v0.tar"), 2, 0, n_frames=40)
    d_cfg = {"type": "srcindexed", "training": False, "name": "webvid",
             "vision": str(shard_dir), "vision_format": "video_rawvideo",
             "vision_sample_num": 4, "task": "ret%tv", "batch_size": 2,
             "pixel_format": "yuv420"}
    ds = SrcIndexedDataset(d_cfg, make_args(), tiny_tokenizer())
    assert ds.out_key == "vision_frames_yuv" and ds.host_size % 2 == 0
    s = next(iter(ds))
    t = ds.host_size
    assert s["vision_frames_yuv"].shape == (4, t * t * 3 // 2)
    rgb = np.asarray(yuv420_to_rgb(s["vision_frames_yuv"]))
    means = rgb.reshape(4, -1).mean(axis=1)
    assert (np.diff(means) > 5).all(), means


@pytest.mark.skipif(not _media_available(),
                    reason="native media runtime unavailable")
def test_image_tar_yuv420_host_pack(tmp_path):
    """Image members of a yuv420 dataset get host-packed so the stream
    stays one wire format; the round trip preserves pixels closely."""
    from vast_tpu.data.vision import rgb_to_yuv420_packed
    from vast_tpu.ops.image import yuv420_to_rgb

    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    make_shard(str(shard_dir / "i0.tar"), 2, 0)
    d_cfg = {"type": "srcindexed", "training": False, "name": "cc",
             "vision": str(shard_dir), "vision_format": "image_rawimage",
             "vision_sample_num": 1, "task": "ret%tv", "batch_size": 2,
             "pixel_format": "yuv420"}
    ds = SrcIndexedDataset(d_cfg, make_args(), tiny_tokenizer())
    s = next(iter(ds))
    t = ds.host_size
    assert s["vision_frames_yuv"].shape == (1, t * t * 3 // 2)

    # helper round-trip on a synthetic smooth gradient (chroma-subsample
    # loss is bounded on smooth content)
    rs = np.random.RandomState(0)
    base = rs.rand(8, 8, 3) * 255
    img = np.asarray(
        np.kron(base, np.ones((4, 4, 1))), np.float32).astype(np.uint8)
    rgb = np.asarray(yuv420_to_rgb(rgb_to_yuv420_packed(img)[None]))[0]
    assert np.abs(rgb - img.astype(np.float32)).mean() < 3.0

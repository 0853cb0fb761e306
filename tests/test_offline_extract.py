"""Offline ffmpeg extraction tool: command parity + end-to-end with a
recording fake ffmpeg (the real binary is absent in this image)."""

import json
import os
import stat
import subprocess
import sys

from vast_tpu.data.offline_extract import (
    audio_cmd,
    extract_all,
    extract_one,
    frame_cmd,
)


def test_commands_match_reference_flags():
    fc = frame_cmd("/v/x.mp4", "/o/frames_fps1/x", 1.0)
    # offline_process_data.py:31-32
    assert fc[0] == "ffmpeg"
    assert "-vsync" in fc and "image2" in fc and "-qscale:v" in fc
    assert "fps=fps=1.00" in fc
    assert fc[-1].endswith("frame_%04d.jpg")

    ac = audio_cmd("/v/x.mp4", "/o/audios/x.wav", 22050)
    # offline_process_data.py:48-49
    for flag in ("-f", "wav", "-vn", "-ac", "1", "-ab", "16k",
                 "-ar", "22050", "-y"):
        assert flag in ac
    assert ac[-1] == "/o/audios/x.wav"


def make_fake_ffmpeg(tmp_path):
    """A fake ffmpeg that logs argv and creates its output file."""
    log = tmp_path / "calls.jsonl"
    script = tmp_path / "fake_ffmpeg"
    script.write_text(f"""#!{sys.executable}
import json, sys, os
with open({str(log)!r}, "a") as f:
    f.write(json.dumps(sys.argv[1:]) + "\\n")
out = sys.argv[-1]
if "%04d" in out:
    out = out.replace("%04d", "0001")
open(out, "wb").close()
""")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    return str(script), log


def test_extract_all_end_to_end(tmp_path):
    vid_dir = tmp_path / "vids"
    out_dir = tmp_path / "out"
    vid_dir.mkdir()
    for name in ("a.mp4", "b.mkv", "notavideo.txt"):
        (vid_dir / name).write_bytes(b"xx")
    ffmpeg, log = make_fake_ffmpeg(tmp_path)

    ok, failed = extract_all(str(vid_dir), str(out_dir), workers=1,
                             fps=2.0, sr=16000, ffmpeg=ffmpeg)
    assert (ok, failed) == (2, 0)
    assert os.path.exists(out_dir / "frames_fps2" / "a" / "frame_0001.jpg")
    assert os.path.exists(out_dir / "audios" / "b.wav")
    calls = [json.loads(l) for l in log.read_text().splitlines()]
    assert len(calls) == 4  # 2 videos x (frames + audio)
    assert any("-ar" in c and "16000" in c for c in calls)


def test_extract_one_warns_and_continues(tmp_path, capsys):
    assert extract_one("/does/not/exist.mp4", str(tmp_path),
                       ffmpeg="/no/such/ffmpeg") is False
    assert "warn:" in capsys.readouterr().err


def test_cli_requires_ffmpeg(tmp_path):
    r = subprocess.run(
        [sys.executable, "-m", "vast_tpu.data.offline_extract",
         str(tmp_path), str(tmp_path), "--ffmpeg", "/no/such/bin"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 2
    assert "not found" in r.stderr

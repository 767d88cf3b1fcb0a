"""Example CLIs run end-to-end as subprocesses on tiny inputs (the
examples are the reference README's de-facto usage docs; they must stay
runnable)."""

import os
import subprocess
import sys

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from conftest import cpu_subprocess_env

ENV = cpu_subprocess_env()


def _run(args, timeout=900):
    # 900s: these are subprocess smoke tests on a single CPU core; the
    # per-frame jitted step EXECUTES in minutes there (tracker capacity
    # loops dominate), and concurrent TPU probe processes steal the core.
    # Value is CLI correctness, not speed.
    return subprocess.run(
        [sys.executable] + args, capture_output=True, text=True,
        cwd="/root/repo", env=ENV, timeout=timeout,
    )


@pytest.mark.slow
def test_detect_image_example(tmp_path):
    img = tmp_path / "in.jpg"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 256, (96, 96, 3), np.uint8)
    ).save(img)
    out = tmp_path / "out.jpg"
    r = _run(["examples/detect_image.py", str(img), "--cfg", "yolov3-tiny",
              "--img-size", "96", "--out", str(out)])
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()


@pytest.mark.slow
def test_detect_folder_example(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(1)
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 256, (96, 96, 3), np.uint8)
        ).save(d / f"{i}.jpg")
    out_dir = tmp_path / "out"
    r = _run(["examples/detect_folder.py", str(d), "--cfg", "yolov3-tiny",
              "--img-size", "96", "--out-dir", str(out_dir)])
    assert r.returncode == 0, r.stderr[-2000:]
    assert len(list(out_dir.iterdir())) == 2


@pytest.mark.slow
def test_track_video_example(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from yolo_deepsort_tpu.runtime.video import VideoWriter

    clip = tmp_path / "clip.mp4"
    wri = VideoWriter(str(clip), 10.0, (96, 72))
    rng = np.random.default_rng(2)
    for _ in range(3):
        wri.write(rng.integers(0, 256, (72, 96, 3), np.uint8))
    wri.release()
    out = tmp_path / "tracked.mp4"
    r = _run(["examples/track_video.py", str(clip), "--cfg", "yolov3-tiny",
              "--img-size", "96", "--out", str(out)])
    assert r.returncode == 0, r.stderr[-2000:]


@pytest.mark.slow
def test_track_multicamera_example(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from yolo_deepsort_tpu.runtime import native
    from yolo_deepsort_tpu.runtime.video import VideoWriter

    if not native.available():
        pytest.skip("native frame_ring unavailable")
    rng = np.random.default_rng(3)
    clips = []
    for i in range(2):
        p = tmp_path / f"cam{i}.mp4"
        wri = VideoWriter(str(p), 10.0, (96, 72))
        for _ in range(3):
            wri.write(rng.integers(0, 256, (72, 96, 3), np.uint8))
        wri.release()
        clips.append(str(p))
    r = _run(["examples/track_multicamera.py", *clips, "--cfg", "yolov3-tiny",
              "--img-size", "96", "--height", "72", "--width", "96",
              "--max-steps", "4"])
    assert r.returncode == 0, r.stderr[-2000:]


@pytest.mark.slow
def test_make_demo_example(tmp_path):
    cv2 = pytest.importorskip("cv2")
    out = tmp_path / "demo.mp4"
    r = _run(["examples/make_demo.py", "--out", str(out), "--frames", "12",
              "--width", "160", "--height", "120", "--objects", "2"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists() and out.stat().st_size > 0


def test_example_clis_importable_fast():
    """Default-tier stand-in for the full example runs (slow tier): every
    example CLI parses --help in a subprocess, proving imports and arg
    wiring without paying a JAX cold compile."""
    import glob

    clis = sorted(glob.glob("/root/repo/examples/*.py"))
    assert clis
    for cli in clis:
        r = _run([cli, "--help"], timeout=120)
        assert r.returncode == 0, f"{cli} --help failed:\n{r.stderr[-800:]}"

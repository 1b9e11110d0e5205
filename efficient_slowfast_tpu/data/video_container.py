"""Container probe shim (reference: slowfast/datasets/video_container.py:7-29).

The reference returns a PyAV container object; this build's decode is one
native call (data/decoder.py), so `get_video_container` returns the probe
info dict — kept for API parity with code that checks openability."""

from __future__ import annotations

from . import decoder


def get_video_container(path_to_vid: str, multi_thread_decode: bool = False,
                        backend: str = "ffmpeg"):
    assert backend in ("ffmpeg", "pyav", "torchvision"), backend
    info = decoder.probe(path_to_vid)
    if info is None:
        raise RuntimeError(f"Failed to open video {path_to_vid}")
    return info

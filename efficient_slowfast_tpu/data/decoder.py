"""ctypes wrapper over the native C++ FFmpeg decode library.

Reference semantics reproduced natively (see csrc/decode.cpp):
selective pts-window decode with 1024-pts seek margin, reference clip-window
math, linspace temporal sampling, swscale short-side resize. The library is
built by ``make -C csrc`` (also attempted automatically on first use).
"""

from __future__ import annotations

import ctypes
import os
import random
import subprocess
import threading
from typing import Optional

import numpy as np

from ..utils.logging import get_logger
from .datasets import canvas_width  # noqa: F401 (re-export convenience)

logger = get_logger(__name__)

_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "libesf_decode.so")


def _build_lib(reason: str = "is missing") -> None:
    csrc = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
    if not os.path.isdir(csrc):
        # wheels are platform-tagged and build the library at package time
        # (setup.py); if the installed copy is unusable AND there is no
        # source tree to rebuild from, say so plainly instead of failing
        # inside make
        raise RuntimeError(
            f"native decoder library {_lib_path()} {reason} and the csrc/ "
            "source tree is not present (installed copy?). Reinstall the "
            "package from a wheel built for this platform, or install from "
            "the sdist / a source checkout, which include csrc/ and rebuild "
            "the library locally (requires g++ and the FFmpeg dev libs)."
        )
    logger.info("Building native decoder (make -C %s)...", csrc)
    subprocess.run(["make", "-C", csrc], check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        path = _lib_path()
        if not os.path.exists(path):
            _build_lib()
        try:
            lib = ctypes.CDLL(path)
        except OSError as e:
            # a stale or wrong-platform binary (e.g. a linux-x86_64 .so on
            # another platform/ABI): rebuild from source when the tree is
            # available; _build_lib raises a plain-language error otherwise
            logger.warning(
                "native decoder at %s failed to load (%s); rebuilding from "
                "csrc/", path, e)
            # remove the bad binary first: make is timestamp-driven and
            # would otherwise consider the unloadable file up-to-date
            try:
                os.remove(path)
            except OSError:
                pass
            _build_lib(reason="failed to load (wrong platform or stale?)")
            lib = ctypes.CDLL(path)
        try:
            lib.esf_decode_clip2
        except AttributeError:
            # an installed pre-r4 binary without the keep_tall entry point:
            # rebuild from source (same policy as the wrong-platform path)
            try:
                os.remove(path)
            except OSError:
                pass
            _build_lib(reason="predates esf_decode_clip2 (stale wheel?)")
            lib = ctypes.CDLL(path)
        lib.esf_decode_clip.restype = ctypes.c_int
        lib.esf_decode_clip.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_int),
        ]
        lib.esf_decode_clip2.restype = ctypes.c_int
        lib.esf_decode_clip2.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        if hasattr(lib, "esf_decode_views"):
            lib.esf_decode_views.restype = ctypes.c_int
            lib.esf_decode_views.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_double,
                ctypes.c_double, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
        if hasattr(lib, "esf_stream_open"):
            lib.esf_stream_open.restype = ctypes.c_void_p
            lib.esf_stream_open.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.esf_stream_next.restype = ctypes.c_int
            lib.esf_stream_next.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte),
                ctypes.POINTER(ctypes.c_longlong),
            ]
            lib.esf_stream_close.restype = None
            lib.esf_stream_close.argtypes = [ctypes.c_void_p]
        lib.esf_probe.restype = ctypes.c_int
        lib.esf_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.esf_write_test_video.restype = ctypes.c_int
        lib.esf_write_test_video.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.esf_encoder_open.restype = ctypes.c_void_p
        lib.esf_encoder_open.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        if hasattr(lib, "esf_encoder_open2"):
            lib.esf_encoder_open2.restype = ctypes.c_void_p
            lib.esf_encoder_open2.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int,
            ]
        lib.esf_encoder_append.restype = ctypes.c_int
        lib.esf_encoder_append.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
        ]
        lib.esf_encoder_close.restype = ctypes.c_int
        lib.esf_encoder_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib


def decode_clip(path: str, num_frames: int, sampling_rate: float,
                clip_idx: int, num_clips: int, target_fps: float,
                short_side: int, random_clip: bool,
                multi_thread: bool = False,
                max_aspect: float = 2.0,
                width_hint: Optional[int] = None) -> Optional[np.ndarray]:
    """Decode one clip in NATURAL orientation, short side == short_side.

    Landscape → uint8 (num_frames, short_side, W, 3), W ≤ max_aspect·short.
    Portrait  → uint8 (num_frames, H, short_side, 3), H ≤ max_aspect·short —
    the C++ layer writes tall content transposed into the landscape canvas
    (esf_decode_clip2 keep_tall) and the axis swap back here is a zero-copy
    view, so the full vertical extent survives for the reference's
    3-position tall-video test protocol (transform.py:425-468; the canvas
    feeder re-transposes via fit_canvas keep_portrait).

    ``max_aspect`` bounds the long axis of the decode buffer (content beyond
    it is center-cropped by the C++ layer). The clip loaders raise it to
    ``datasets.TEST_DECODE_ASPECT`` so >2:1 media (cinema ≈ 2.39:1) keeps
    its full long axis for the per-view canvas windows (test) / the
    full-width random crop (train).

    ``width_hint``: the EXACT long-axis extent this path produced at this
    ``short_side`` on a previous decode (a file's aspect is constant), used
    to size the buffer instead of the worst-case ``max_aspect`` cap — at
    16:9 that roughly halves the per-decode allocation vs a 4:1 buffer.
    Only ever pass a value observed from the same (path, short_side); a
    too-small hint would center-crop content.

    Returns None on decode failure (caller retries per the reference's
    retry-with-replacement policy, kinetics.py:192-255).
    """
    lib = get_lib()
    max_w = max(short_side * 2, int(round(short_side * max_aspect)))
    if width_hint is not None:
        max_w = min(max_w, max(int(width_hint), 1))
    # np.empty, not np.zeros: the C++ layer fills every row and zeroes the
    # right-pad tail itself, so a Python-side zeroing pass (a full extra
    # write of the buffer on the decode hot path) would be pure waste
    out = np.empty((num_frames, short_side, max_w, 3), np.uint8)
    out_w = ctypes.c_int(0)
    out_portrait = ctypes.c_int(0)
    rnd = random.random() if random_clip else 0.0
    rc = lib.esf_decode_clip2(
        path.encode(), num_frames, float(sampling_rate), float(target_fps),
        -1 if random_clip else int(clip_idx), int(num_clips), float(rnd),
        int(short_side), int(max_w), int(bool(multi_thread)), 1,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.byref(out_w), ctypes.byref(out_portrait),
    )
    if rc != 0:
        logger.warning("native decode failed (%d) for %s", rc, path)
        return None
    frames = out[:, :, : out_w.value]
    if out_portrait.value:
        frames = np.swapaxes(frames, 1, 2)
    return frames


def decode_views(path: str, num_frames: int, sampling_rate: float,
                 num_clips: int, target_fps: float, short_side: int,
                 multi_thread: bool = False, max_aspect: float = 2.0,
                 width_hint: Optional[int] = None) -> Optional[np.ndarray]:
    """Decode ALL ``num_clips`` temporal test views of one video at once.

    Returns uint8 (num_clips, num_frames, H, W, 3) in natural orientation —
    BIT-IDENTICAL to ``num_clips`` independent :func:`decode_clip` calls
    with clip_idx = 0..num_clips-1 (tests/test_decoder.py) — or None on
    failure, including streams with duplicate/irregular pts where the
    union-decode's frame matching would be ambiguous (rc −14/−15; the
    caller falls back to per-view decodes). The win: the overlapping view
    windows are served by ~2 sequential full decodes instead of num_clips
    seek+window decodes, and each selected frame is swscaled once even when
    several views share it (csrc/decode.cpp esf_decode_views; PERF.md r5).
    """
    lib = get_lib()
    if not hasattr(lib, "esf_decode_views"):
        return None  # stale pre-r5 binary: callers use per-view decodes
    max_w = max(short_side * 2, int(round(short_side * max_aspect)))
    if width_hint is not None:
        max_w = min(max_w, max(int(width_hint), 1))
    out = np.empty((num_clips, num_frames, short_side, max_w, 3), np.uint8)
    out_w = ctypes.c_int(0)
    out_portrait = ctypes.c_int(0)
    rc = lib.esf_decode_views(
        path.encode(), num_frames, float(sampling_rate), float(target_fps),
        int(num_clips), int(short_side), int(max_w),
        int(bool(multi_thread)), 1,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.byref(out_w), ctypes.byref(out_portrait),
    )
    if rc != 0:
        # expected fallbacks stay quiet: -14/-15 ambiguous pts matching,
        # -16 the length guard (windows can't overlap — per-view seek
        # decodes are faster than the union's two full passes; PERF.md r5)
        if rc not in (-14, -15, -16):
            logger.warning("native union decode failed (%d) for %s", rc, path)
        return None
    frames = out[:, :, :, : out_w.value]
    if out_portrait.value:
        frames = np.swapaxes(frames, 2, 3)
    return frames


class VideoStream:
    """Sequential canvas-frame stream over a video file (csrc
    ``esf_stream_*``): open once, iterate ``(pts, frame)`` pairs decoded
    exactly once each — no per-window seek/keyframe-backoff cost. Each
    ``frame`` is uint8 in NATURAL orientation (landscape ``(short, W, 3)``,
    portrait ``(H, short, 3)``), byte-identical to the same source frame
    in a :func:`decode_clip` result (same geometry + swscale path), which
    is what lets the demo's streaming window iterator reproduce the
    seek-based windows exactly (engine/demo.py; PERF.md r5).

    Attributes ``fps`` / ``nb_frames`` / ``duration`` expose the container
    metadata (the per-window pts math needs them; ``nb_frames``/``duration``
    are 0 when the container lacks them — callers fall back to seeks).
    Context-manager or explicit :meth:`close`; iteration stops at EOF.
    """

    def __init__(self, path: str, short_side: int, multi_thread: bool = False,
                 max_aspect: float = 2.0, width_hint: Optional[int] = None):
        lib = get_lib()
        if not hasattr(lib, "esf_stream_open"):
            raise RuntimeError("native decoder predates esf_stream_open")
        self._lib = lib
        self._short = int(short_side)
        max_w = max(short_side * 2, int(round(short_side * max_aspect)))
        if width_hint is not None:
            max_w = min(max_w, max(int(width_hint), 1))
        self._max_w = max_w
        fps = ctypes.c_double(0)
        nb = ctypes.c_int64(0)
        dur = ctypes.c_int64(0)
        out_w = ctypes.c_int(0)
        out_p = ctypes.c_int(0)
        err = ctypes.c_int(0)
        self._h = lib.esf_stream_open(
            path.encode(), int(bool(multi_thread)), self._short, max_w, 1,
            ctypes.byref(fps), ctypes.byref(nb), ctypes.byref(dur),
            ctypes.byref(out_w), ctypes.byref(out_p), ctypes.byref(err))
        if not self._h:
            raise RuntimeError(f"esf_stream_open({path!r}) failed: {err.value}")
        self.fps = fps.value
        self.nb_frames = int(nb.value)
        self.duration = int(dur.value)
        self.width = int(out_w.value)
        self.portrait = bool(out_p.value)

    def __iter__(self):
        return self

    def __next__(self):
        if self._h is None:
            raise StopIteration
        buf = np.empty((self._short, self._max_w, 3), np.uint8)
        pts = ctypes.c_longlong(0)
        rc = self._lib.esf_stream_next(
            self._h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.byref(pts))
        if rc != 0:
            self.close()
            raise StopIteration
        frame = buf[:, : self.width]
        if self.portrait:
            frame = np.swapaxes(frame, 0, 1)
        return int(pts.value), frame

    def close(self):
        if self._h is not None:
            self._lib.esf_stream_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def probe(path: str):
    lib = get_lib()
    fps = ctypes.c_double(0)
    nb = ctypes.c_int64(0)
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    rc = lib.esf_probe(path.encode(), ctypes.byref(fps), ctypes.byref(nb),
                       ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    return {"fps": fps.value, "nb_frames": nb.value,
            "width": w.value, "height": h.value}


class VideoEncoder:
    """Streaming mp4 encoder over the native lib: open once, ``append``
    (N, H, W, 3) uint8 RGB clips per window, ``close`` writes the trailer.
    Constant memory over arbitrarily long streams — the demo's annotated
    output sink (reference streams via cv2.VideoWriter,
    tools/demo_net.py:62-75). Usable as a context manager."""

    def __init__(self, path: str, width: int, height: int, fps: int,
                 gop: int = 8):
        """``gop``: keyframe interval — fixtures default to 8 (cheap test
        seeks); pass production-like values (x264 defaults to 250) to
        exercise seek-backoff behavior."""
        self._lib = get_lib()
        self._h = self._lib.esf_encoder_open2(
            path.encode(), int(width), int(height), max(int(fps), 1),
            int(gop))
        if not self._h:
            raise RuntimeError(f"cannot open encoder for {path}")
        self.path = path
        self.width, self.height = int(width), int(height)
        self.frames_written = 0

    def append(self, frames: np.ndarray) -> None:
        frames = np.asarray(frames)
        if frames.ndim != 4 or frames.shape[-1] != 3:
            raise ValueError(
                f"expected (N, H, W, 3) RGB frames, got {frames.shape}")
        if frames.dtype != np.uint8:
            raise ValueError(f"expected uint8 frames, got {frames.dtype}")
        n, h, w, _c = frames.shape
        if (h, w) != (self.height, self.width):
            raise ValueError(
                f"window size {(h, w)} != encoder size "
                f"{(self.height, self.width)}")
        frames = np.ascontiguousarray(frames)
        rc = self._lib.esf_encoder_append(
            self._h, frames.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            n)
        if rc != 0:
            raise RuntimeError(
                f"encoder append failed ({rc}) — encode or mux error "
                f"(disk full?) writing {self.path}")
        self.frames_written += n

    def close(self) -> None:
        if self._h:
            rc = self._lib.esf_encoder_close(self._h)
            self._h = None
            if rc != 0:
                raise RuntimeError(f"encoder close failed ({rc})")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def write_test_video(path: str, frames: np.ndarray, fps: int = 30,
                     gop: int = 8) -> None:
    """Encode uint8 (N, H, W, 3) frames to an mpeg4 file (test fixtures).

    ``gop``: keyframe interval (8 keeps test seeks cheap; use ~250 to
    emulate production x264 media)."""
    frames = np.ascontiguousarray(frames, np.uint8)
    n, h, w, _ = frames.shape
    with VideoEncoder(path, w, h, fps, gop=gop) as enc:
        enc.append(frames)

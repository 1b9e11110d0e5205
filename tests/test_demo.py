"""Demo engine end-to-end: sliding-window inference over a fixture video
with label overlay + FPS (reference: tools/demo_net.py:26-399)."""

import os

import numpy as np

from efficient_slowfast_tpu.config import get_cfg
from efficient_slowfast_tpu.data import decoder
from efficient_slowfast_tpu.engine.demo import demo


def test_file_window_stream_matches_seek_decodes(tmp_path):
    """The demo's sequential streaming window iterator (r5: one decode per
    source frame instead of a keyframe-backoff seek per window) must yield
    byte-identical (widx, frames) to the per-window seek path it replaced —
    landscape and portrait media."""
    from efficient_slowfast_tpu.engine.demo import (
        _seek_window_stream, file_window_stream)

    # gop=250 emulates production x264 keyframe spacing, where the seek
    # path pays its full backoff (measured 6.3x there — PERF.md r5)
    for name, (h, w, gop) in {"land": (96, 128, 8), "tall": (128, 72, 8),
                              "gop250": (96, 128, 250)}.items():
        src = str(tmp_path / f"{name}.mp4")
        rs = np.random.RandomState(3)
        decoder.write_test_video(
            src, rs.randint(0, 255, (96, h, w, 3), np.uint8), fps=24,
            gop=gop)
        cfg = get_cfg()
        cfg.merge_from_file("configs/Synthetic/SHUFFLENETV2_TINY.yaml")
        cfg.DEMO.DATA_SOURCE = src
        info = decoder.probe(src)
        clip_s = (cfg.DATA.NUM_FRAMES * cfg.DATA.SAMPLING_RATE
                  / cfg.DATA.TARGET_FPS)
        num_windows = max(int(info["nb_frames"] / info["fps"] / clip_s), 1)
        streamed = list(file_window_stream(cfg))
        seeked = list(_seek_window_stream(cfg, num_windows))
        assert len(streamed) == len(seeked) >= 2, name
        for (wa, fa), (wb, fb) in zip(streamed, seeked):
            assert wa == wb, name
            assert fa.shape == fb.shape, (name, wa)
            assert (fa == fb).all(), (name, wa)


def test_demo_windows_labels_fps(tmp_path):
    src = str(tmp_path / "clip.mp4")
    n, h, w = 96, 96, 128
    frames = np.zeros((n, h, w, 3), np.uint8)
    for i in range(n):
        frames[i, :, :, 0] = (i * 2) % 255
        frames[i, :, :, 1] = 100
    decoder.write_test_video(src, frames, fps=24)

    labels_file = tmp_path / "labels.txt"
    labels_file.write_text("".join(f"class{i}\n" for i in range(10)))

    cfg = get_cfg()
    cfg.merge_from_file("configs/Synthetic/SHUFFLENETV2_TINY.yaml")
    cfg.TRAIN.ENABLE = False
    cfg.TEST.ENABLE = False
    cfg.DEMO.ENABLE = True
    cfg.DEMO.DATA_SOURCE = src
    cfg.DEMO.LABEL_FILE_PATH = str(labels_file)
    cfg.DEMO.OUTPUT_FILE = str(tmp_path / "out.mp4")
    cfg.OUTPUT_DIR = str(tmp_path / "run")

    results = demo(cfg)
    assert len(results) >= 2  # several sliding windows over 96/24fps video
    for entry in results:
        assert entry["_type"] == "demo_window"
        assert len(entry["top_classes"]) == len(entry["scores"]) >= 1
        # labels resolved through LABEL_FILE_PATH, not raw ids
        assert all(isinstance(c, str) and c.startswith("class")
                   for c in entry["top_classes"])
        # per-window FPS measurement (reference demo_net.py:240-255)
        assert entry["fps"] > 0

    # annotated mp4 written via the native encoder and decodable again
    assert os.path.exists(cfg.DEMO.OUTPUT_FILE)
    info = decoder.probe(cfg.DEMO.OUTPUT_FILE)
    assert info is not None and info["nb_frames"] > 0
    # playback at the window frame rate (windows keep 1 of SAMPLING_RATE
    # frames of the TARGET_FPS-resampled source), not the source rate
    assert round(info["fps"]) == round(
        cfg.DATA.TARGET_FPS / cfg.DATA.SAMPLING_RATE)
    # the overlay must have changed pixels vs a plain resize of the source
    clip = decoder.decode_clip(cfg.DEMO.OUTPUT_FILE, num_frames=4,
                               sampling_rate=1, clip_idx=0, num_clips=1,
                               target_fps=24, short_side=96,
                               random_clip=False)
    assert clip is not None


def test_demo_detection_boxes(tmp_path):
    """Detection demo: precomputed boxes json -> per-box action labels +
    box overlays (reference demo_net.py detection branch, external
    detector replaced by DEMO.BOXES_FILE)."""
    import json

    src = str(tmp_path / "clip.mp4")
    rs = np.random.RandomState(1)
    decoder.write_test_video(
        src, rs.randint(0, 255, (64, 96, 128, 3), np.uint8), fps=24)

    boxes = {"0": [[0.1, 0.1, 0.5, 0.9]], "1": [[0.2, 0.1, 0.6, 0.9],
                                                [0.5, 0.2, 0.9, 0.8]]}
    boxes_file = tmp_path / "boxes.json"
    boxes_file.write_text(json.dumps(boxes))

    cfg = get_cfg()
    cfg.merge_from_file("configs/AVA/SLOWFAST_32x2_R50_SHORT.yaml")
    cfg.TRAIN.ENABLE = False
    cfg.TEST.ENABLE = False
    cfg.DEMO.ENABLE = True
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TEST_CROP_SIZE = 64
    cfg.DATA.CROP_SIZE = 64
    cfg.MODEL.NUM_CLASSES = 5
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DEMO.DATA_SOURCE = src
    cfg.DEMO.BOXES_FILE = str(boxes_file)
    cfg.DEMO.OUTPUT_FILE = str(tmp_path / "det.mp4")
    cfg.OUTPUT_DIR = str(tmp_path / "run")

    results = demo(cfg)
    assert len(results) >= 1
    for entry in results:
        assert entry["boxes"], entry
        for be in entry["boxes"]:
            assert len(be["box"]) == 4
            assert len(be["top_classes"]) == len(be["scores"]) >= 1
            # RoI head scores are per-box sigmoid activations
            assert all(0.0 <= s <= 1.0 for s in be["scores"])
    assert os.path.exists(cfg.DEMO.OUTPUT_FILE)
    assert decoder.probe(cfg.DEMO.OUTPUT_FILE)["nb_frames"] > 0


def test_demo_detection_vertical_video_box_mapping(tmp_path):
    """Vertical (9:16-ish) source: normalized boxes must map through the
    fit_canvas resize + center-crop, and windows without boxes must still
    appear in the output video (time continuity)."""
    import json

    src = str(tmp_path / "vert.mp4")
    rs = np.random.RandomState(2)
    # 160x96 vertical video, 64 frames
    decoder.write_test_video(
        src, rs.randint(0, 255, (64, 160, 96, 3), np.uint8), fps=24)

    # boxes only for window 0; window >=1 has none
    boxes_file = tmp_path / "boxes.json"
    boxes_file.write_text(json.dumps({"0": [[0.2, 0.4, 0.8, 0.6]]}))

    cfg = get_cfg()
    cfg.merge_from_file("configs/AVA/SLOWFAST_32x2_R50_SHORT.yaml")
    cfg.TRAIN.ENABLE = False
    cfg.TEST.ENABLE = False
    cfg.DEMO.ENABLE = True
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TEST_CROP_SIZE = 64
    cfg.DATA.CROP_SIZE = 64
    cfg.MODEL.NUM_CLASSES = 5
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DEMO.DATA_SOURCE = src
    cfg.DEMO.BOXES_FILE = str(boxes_file)
    cfg.DEMO.OUTPUT_FILE = str(tmp_path / "det.mp4")
    cfg.OUTPUT_DIR = str(tmp_path / "run")

    results = demo(cfg)
    assert len(results) == 1
    (be,) = results[0]["boxes"]
    x1, y1, x2, y2 = be["box"]
    # vertical source: resized to width=short(64), height ~107, center-
    # cropped to 64: y_norm 0.4/0.6 -> ~107*0.4-21=21.7, ~107*0.6-21=43.1
    assert 0 <= x1 < x2 <= 64
    assert 15 < y1 < 28 and 38 < y2 < 50, (y1, y2)
    # all decoded windows present in the output video (boxless ones too)
    info = decoder.probe(cfg.DEMO.OUTPUT_FILE)
    assert info["nb_frames"] > cfg.DATA.NUM_FRAMES  # more than one window


class _FakeCapture:
    """cv2.VideoCapture stand-in: serves BGR frames, tracks release()."""

    def __init__(self, frames_bgr):
        self._frames = list(frames_bgr)
        self._pos = 0
        self.released = False

    def read(self):
        if self._pos >= len(self._frames):
            return False, None
        f = self._frames[self._pos]
        self._pos += 1
        return True, f

    def release(self):
        self.released = True


def test_camera_window_stream_buffers_and_subsamples():
    """VERDICT r2 #7: live-source windows — NUM_FRAMES*SAMPLING_RATE frames
    buffered per window, every SAMPLING_RATE-th kept, BGR->RGB converted,
    capture released at stream end (reference tools/demo_net.py:156-172
    buffer loop + :310-393 VideoReader). Frames stay raw-sized: the demo
    loop's fit_canvas does the short-side resize, same as the file path."""
    from efficient_slowfast_tpu.engine.demo import camera_window_stream

    cfg = get_cfg()
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TEST_CROP_SIZE = 32

    # 20 frames of 48x64; frame i has B=i (-> R=i after conversion)
    frames = []
    for i in range(20):
        f = np.zeros((48, 64, 3), np.uint8)
        f[..., 0] = i          # BGR blue channel
        f[..., 2] = 200        # BGR red channel
        frames.append(f)
    cap = _FakeCapture(frames)

    windows = list(camera_window_stream(cfg, capture=cap))
    # 20 frames / (4*2 per window) -> 2 full windows, remainder dropped
    assert [w for w, _ in windows] == [0, 1]
    for widx, clip in windows:
        assert clip.shape == (4, 48, 64, 3)
        # subsampling: window w holds source frames [8w, 8w+2, 8w+4, 8w+6];
        # BGR->RGB moves the frame index (BGR channel 0) into RGB channel 2
        got = [int(clip[i, 0, 0, 2]) for i in range(4)]
        assert got == [8 * widx, 8 * widx + 2, 8 * widx + 4, 8 * widx + 6]
        assert int(clip[0, 0, 0, 0]) == 200  # BGR red now RGB channel 0
    assert cap.released


def test_demo_from_injected_stream(tmp_path):
    """The demo engine runs unchanged over an injected synthetic window
    stream (the camera path minus cv2), preserving overlays + FPS."""
    from efficient_slowfast_tpu.engine.demo import demo as run_demo

    cfg = get_cfg()
    cfg.merge_from_file("configs/Synthetic/SHUFFLENETV2_TINY.yaml")
    cfg.TRAIN.ENABLE = False
    cfg.TEST.ENABLE = False
    cfg.DEMO.ENABLE = True
    cfg.DEMO.DATA_SOURCE = "0"  # camera index form; stream injected below
    cfg.DEMO.OUTPUT_FILE = str(tmp_path / "out.mp4")
    cfg.OUTPUT_DIR = str(tmp_path / "run")

    short = cfg.DATA.TEST_CROP_SIZE
    rs = np.random.RandomState(0)
    stream = [
        (w, rs.randint(0, 255, (cfg.DATA.NUM_FRAMES, short,
                                int(short * 4 / 3), 3), np.uint8))
        for w in range(2)
    ]
    results = run_demo(cfg, stream=iter(stream))
    assert len(results) == 2
    for entry in results:
        assert entry["_type"] == "demo_window"
        assert len(entry["top_classes"]) == len(entry["scores"]) >= 1
        assert entry["fps"] > 0
    assert os.path.exists(cfg.DEMO.OUTPUT_FILE)
    assert decoder.probe(cfg.DEMO.OUTPUT_FILE)["nb_frames"] > 0


def test_demo_display_sink_and_esc_quit(tmp_path):
    """DEMO.DISPLAY live view (reference demo_net.py:71-75,393-397): each
    window's annotated frames reach the display sink, and the sink
    returning False (Esc) stops the demo early."""
    from efficient_slowfast_tpu.engine.demo import demo as run_demo

    cfg = get_cfg()
    cfg.merge_from_file("configs/Synthetic/SHUFFLENETV2_TINY.yaml")
    cfg.TRAIN.ENABLE = False
    cfg.TEST.ENABLE = False
    cfg.DEMO.ENABLE = True
    cfg.DEMO.DATA_SOURCE = "0"
    cfg.DEMO.OUTPUT_FILE = ""
    cfg.OUTPUT_DIR = str(tmp_path / "run")

    short = cfg.DATA.TEST_CROP_SIZE
    rs = np.random.RandomState(4)
    stream = [
        (w, rs.randint(0, 255, (cfg.DATA.NUM_FRAMES, short,
                                int(short * 4 / 3), 3), np.uint8))
        for w in range(4)
    ]

    shown = []

    def show(frames):
        shown.append(frames.shape)
        return len(shown) < 2  # "Esc" during the second window

    results = run_demo(cfg, stream=iter(stream), display=show)
    assert len(shown) == 2  # window 0 shown, window 1 hit Esc
    assert len(results) == 2  # no windows processed after the quit
    # annotated clips keep the window's frame count and channel order
    assert all(s[0] == cfg.DATA.NUM_FRAMES and s[-1] == 3 for s in shown)


def test_demo_int8_lazy_calibration(tmp_path, monkeypatch):
    """TPU.INT8_EVAL in the demo: the first window triggers exactly one
    activation-range calibration (engine/demo.py lazy path), and every
    window still produces valid scores."""
    from efficient_slowfast_tpu.engine import quantize as qmod
    from efficient_slowfast_tpu.engine.demo import demo as run_demo

    calls = []
    real = qmod.calibrate_int8
    monkeypatch.setattr(
        qmod, "calibrate_int8",
        lambda *a, **k: calls.append(1) or real(*a, **k))

    cfg = get_cfg()
    cfg.merge_from_file("configs/Synthetic/SHUFFLENETV2_TINY.yaml")
    cfg.TRAIN.ENABLE = False
    cfg.TEST.ENABLE = False
    cfg.DEMO.ENABLE = True
    cfg.DEMO.DATA_SOURCE = "0"
    cfg.DEMO.OUTPUT_FILE = ""
    cfg.OUTPUT_DIR = str(tmp_path / "run")
    cfg.TPU.INT8_EVAL = True
    cfg.TPU.COMPUTE_DTYPE = "float32"

    short = cfg.DATA.TEST_CROP_SIZE
    rs = np.random.RandomState(3)
    stream = [
        (w, rs.randint(0, 255, (cfg.DATA.NUM_FRAMES, short,
                                int(short * 4 / 3), 3), np.uint8))
        for w in range(3)
    ]
    results = run_demo(cfg, stream=iter(stream))
    assert len(calls) == 1  # calibrated once, on the first window only
    assert len(results) == 3
    for entry in results:
        assert len(entry["top_classes"]) == len(entry["scores"]) >= 1
        assert all(np.isfinite(s) for s in entry["scores"])


_DETECTOR_PLUGIN = '''
import numpy as np

CALLS = []


def window_detector(frames, widx):
    """Per-window function form: boxes over the raw frames."""
    CALLS.append((widx, frames.shape))
    return np.asarray([[0.1, 0.1, 0.6, 0.9]], np.float32)


class CfgDetector:
    """Class form: instantiated once as cls(cfg)."""

    def __init__(self, cfg):
        self.crop = cfg.DATA.TEST_CROP_SIZE

    def __call__(self, frames, widx):
        return np.asarray([[0.2, 0.2, 0.8, 0.8]], np.float32)


def make_detector(cfg):
    """Factory form: make(cfg) -> per-window callable."""
    def fn(frames, widx):
        # out-of-range coords on purpose: the loader must clip to [0,1]
        return np.asarray([[-0.5, 0.0, 1.5, 2.0]], np.float32)
    return fn


def bad_shape_detector(frames, widx):
    return np.asarray([0.1, 0.1, 0.6], np.float32)
'''


def _write_detector_plugin(tmp_path, monkeypatch):
    (tmp_path / "demo_det_plugin.py").write_text(_DETECTOR_PLUGIN)
    monkeypatch.syspath_prepend(str(tmp_path))
    import sys

    sys.modules.pop("demo_det_plugin", None)


def test_demo_detection_live_detector_on_camera_stream(tmp_path, monkeypatch):
    """DEMO.DETECTOR_FN: a pluggable live person detector drives the
    detection demo — including on a camera-form source, which
    DEMO.BOXES_FILE fundamentally cannot serve (the generalization of the
    reference's bundled detectron2 predictor, tools/demo_net.py:130-146).
    The detector sees the RAW window frames and its boxes flow through the
    same canvas mapping as precomputed ones."""
    _write_detector_plugin(tmp_path, monkeypatch)

    cfg = get_cfg()
    cfg.merge_from_file("configs/AVA/SLOWFAST_32x2_R50_SHORT.yaml")
    cfg.TRAIN.ENABLE = False
    cfg.TEST.ENABLE = False
    cfg.DEMO.ENABLE = True
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TEST_CROP_SIZE = 64
    cfg.DATA.CROP_SIZE = 64
    cfg.MODEL.NUM_CLASSES = 5
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DEMO.DATA_SOURCE = "0"  # camera index form; stream injected below
    cfg.DEMO.DETECTOR_FN = "demo_det_plugin:window_detector"
    cfg.DEMO.OUTPUT_FILE = str(tmp_path / "det.mp4")
    cfg.OUTPUT_DIR = str(tmp_path / "run")

    rs = np.random.RandomState(5)
    stream = [(w, rs.randint(0, 255, (8, 96, 128, 3), np.uint8))
              for w in range(2)]
    results = demo(cfg, stream=iter(stream))

    import demo_det_plugin

    # called once per window with the raw (pre-canvas) frames
    assert demo_det_plugin.CALLS == [(0, (8, 96, 128, 3)),
                                     (1, (8, 96, 128, 3))]
    assert len(results) == 2
    for entry in results:
        (be,) = entry["boxes"]
        assert len(be["box"]) == 4
        assert len(be["top_classes"]) == len(be["scores"]) >= 1
        assert all(0.0 <= s <= 1.0 for s in be["scores"])
    assert os.path.exists(cfg.DEMO.OUTPUT_FILE)
    assert decoder.probe(cfg.DEMO.OUTPUT_FILE)["nb_frames"] > 0


def test_load_detector_forms_and_validation(tmp_path, monkeypatch):
    """_load_detector resolves all three symbol forms (function, class(cfg),
    factory(cfg)), clips returned boxes to [0,1], and rejects bad shapes."""
    import pytest

    from efficient_slowfast_tpu.engine.demo import _load_detector

    _write_detector_plugin(tmp_path, monkeypatch)
    frames = np.zeros((4, 32, 48, 3), np.uint8)

    cfg = get_cfg()
    cfg.DEMO.DETECTOR_FN = "demo_det_plugin:window_detector"
    np.testing.assert_allclose(_load_detector(cfg)(frames, 0),
                               [[0.1, 0.1, 0.6, 0.9]])

    cfg.DEMO.DETECTOR_FN = "demo_det_plugin:CfgDetector"
    np.testing.assert_allclose(_load_detector(cfg)(frames, 0),
                               [[0.2, 0.2, 0.8, 0.8]])

    cfg.DEMO.DETECTOR_FN = "demo_det_plugin:make_detector"
    # factory output clipped into [0,1]
    np.testing.assert_allclose(_load_detector(cfg)(frames, 0),
                               [[0.0, 0.0, 1.0, 1.0]])

    cfg.DEMO.DETECTOR_FN = "demo_det_plugin:bad_shape_detector"
    with pytest.raises(ValueError, match="expected \\(N, 4\\)"):
        _load_detector(cfg)(frames, 0)

    cfg.DEMO.DETECTOR_FN = "no_such_module:fn"
    with pytest.raises(RuntimeError, match="cannot import"):
        _load_detector(cfg)

    cfg.DEMO.DETECTOR_FN = "justamodule"
    with pytest.raises(ValueError, match="package.module:symbol"):
        _load_detector(cfg)

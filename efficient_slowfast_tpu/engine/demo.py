"""Demo: sliding-window inference over a video file OR a live frame stream
(reference: tools/demo_net.py:26-399).

The reference reads a webcam/file with cv2, buffers NUM_FRAMES×SAMPLING_RATE
frames, packs pathways inline and overlays the top-k labels. This build
iterates a window stream from DEMO.DATA_SOURCE — a video file decoded by the
native decoder (selective seeks), or a live camera when the source is an
integer index (cv2.VideoCapture, import-guarded; reference
tools/demo_net.py:87-146,310-393) — runs the jitted forward per window,
logs {sec, top-k labels, scores} json lines, and (optionally) writes an
annotated mp4 via the native encoder when DEMO.OUTPUT_FILE is set. Tests
inject synthetic streams through the ``stream``/``capture`` parameters.

Detection mode (cfg.DETECTION.ENABLE): person boxes come from a
DEMO.BOXES_FILE json — ``{"<window_idx>": [[x1,y1,x2,y2], ...]}`` in
normalized [0,1] coordinates — OR live from a pluggable detector named by
DEMO.DETECTOR_FN ("module:symbol", called per window with the raw RGB
frames; the generalization of the reference's bundled detectron2 person
predictor, tools/demo_net.py:130-146). The demo scales the boxes to the
canvas, runs the RoI head per window, logs per-box top-k actions, and
draws box + label overlays. A live detector also unlocks camera sources
for detection, which precomputed boxes fundamentally cannot serve.
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax

from ..data import decoder
from ..data.preprocess import make_test_preprocess
from ..models import build_model
from ..parallel.mesh import build_mesh, replicated
from ..utils import checkpoint as cu
from ..utils.logging import get_logger, log_json_stats, setup_logging
from .state import create_train_state, make_forward

logger = get_logger(__name__)


def _is_camera_source(source) -> bool:
    """True when DEMO.DATA_SOURCE names a live camera index, not a file
    (reference demo_net.py:331: cv2.VideoCapture(int(source)))."""
    return isinstance(source, int) or (
        isinstance(source, str) and source.isdigit()
    )


def _open_camera(cfg):
    try:
        import cv2
    except ImportError as e:  # cv2 is optional in this image
        raise RuntimeError(
            "DEMO.DATA_SOURCE is a camera index but cv2 is not "
            "available; install opencv-python or use a file source"
        ) from e
    cap = cv2.VideoCapture(int(cfg.DEMO.DATA_SOURCE))
    # requested capture resolution (reference demo_net.py:36-41)
    if cfg.DEMO.DISPLAY_WIDTH > 0 and cfg.DEMO.DISPLAY_HEIGHT > 0:
        cap.set(cv2.CAP_PROP_FRAME_WIDTH, cfg.DEMO.DISPLAY_WIDTH)
        cap.set(cv2.CAP_PROP_FRAME_HEIGHT, cfg.DEMO.DISPLAY_HEIGHT)
    return cap


def _make_display(cfg):
    """Live on-screen sink: (show, close) where ``show(frames_rgb)`` renders
    a (T, H, W, 3) uint8 clip and returns False when the user hit Esc
    (reference demo_net.py:71-75 displays via cv2.imshow when no output
    file is set + :393-397 Esc-quit; here it is the explicit opt-in
    ``DEMO.DISPLAY`` so headless runs never pop windows)."""
    if not cfg.DEMO.DISPLAY:
        return None, lambda: None
    try:
        import cv2
    except ImportError as e:
        raise RuntimeError(
            "DEMO.DISPLAY requires cv2; install opencv-python or write to "
            "DEMO.OUTPUT_FILE instead"
        ) from e

    def show(frames: np.ndarray) -> bool:
        for f in frames:
            cv2.imshow("efficient-slowfast", np.ascontiguousarray(
                f[..., ::-1]))  # RGB -> cv2's BGR
            if cv2.waitKey(1) == 27:  # Esc quits
                return False
        return True

    return show, cv2.destroyAllWindows


def _capture_fps(capture) -> float:
    """Source frame rate of an open capture (cv2 CAP_PROP_FPS; 0/NaN on
    cameras that don't report one → 30)."""
    get = getattr(capture, "get", None)
    fps = 0.0
    if get is not None:
        try:
            import cv2

            fps = float(get(cv2.CAP_PROP_FPS) or 0.0)
        except Exception:
            fps = float(get(5) or 0.0)  # CAP_PROP_FPS == 5
    return fps if fps and np.isfinite(fps) else 30.0


def camera_window_stream(cfg, capture=None):
    """Yield (widx, frames) RGB uint8 windows from a live capture source.

    Buffers NUM_FRAMES×SAMPLING_RATE consecutive frames per window and
    subsamples every SAMPLING_RATE-th, exactly like the reference's webcam
    loop (tools/demo_net.py:156-172: seq_len buffer → index_select).
    ``capture`` is anything with ``read() -> (ok, bgr_frame)`` (and
    optionally ``release()``): cv2.VideoCapture in production, a synthetic
    frame source in tests. BGR→RGB conversion matches cv2's channel order.
    """
    if capture is None:
        capture = _open_camera(cfg)
    seq_len = cfg.DATA.NUM_FRAMES * cfg.DATA.SAMPLING_RATE
    widx = 0
    buf = []
    try:
        while True:
            ok, frame = capture.read()
            if not ok:
                break
            buf.append(np.asarray(frame)[..., ::-1])  # BGR -> RGB
            if len(buf) == seq_len:
                # raw frames: the demo loop's fit_canvas does the short-side
                # resize (same bilinear as the decoder path)
                yield widx, np.stack(buf[:: cfg.DATA.SAMPLING_RATE])
                widx += 1
                buf = []
    finally:
        release = getattr(capture, "release", None)
        if release is not None:
            release()


def _seek_window_stream(cfg, num_windows, start_widx=0):
    """Per-window selective-seek decode (one decode_clip per window) — the
    fallback for containers the sequential stream cannot serve exactly
    (missing seek metadata, non-monotonic pts)."""
    for widx in range(start_widx, num_windows):
        frames = decoder.decode_clip(
            cfg.DEMO.DATA_SOURCE, cfg.DATA.NUM_FRAMES, cfg.DATA.SAMPLING_RATE,
            clip_idx=widx, num_clips=num_windows,
            target_fps=cfg.DATA.TARGET_FPS, short_side=cfg.DATA.TEST_CROP_SIZE,
            random_clip=False,
        )
        if frames is None:
            continue
        yield widx, frames


def file_window_stream(cfg, info=None):
    """Yield (widx, frames) windows from a video file.

    Decodes the file SEQUENTIALLY (decoder.VideoStream) and assembles each
    window from the frames streaming by, with the per-window pts bounds and
    linspace selection computed exactly as the selective decoder would
    (csrc esf_decode_clip2) — so the windows are byte-identical to the
    per-window seek path while every source frame is decoded exactly once.
    Seek-based decoding pays a keyframe backoff of up to a full GOP (~250
    frames on typical x264 media) per ~64-frame window, which made the old
    per-window path ~4× more decode work on real media (PERF.md r5; the
    reference demo also reads sequentially, tools/demo_net.py:156-172).
    Falls back to per-window seeks (bit-identical results) when the
    container lacks seek metadata or its pts are not strictly increasing.
    ``info`` reuses an existing ``decoder.probe`` result for window count.
    """
    import math

    if info is None:
        info = decoder.probe(cfg.DEMO.DATA_SOURCE)
    assert info is not None, f"cannot open {cfg.DEMO.DATA_SOURCE}"
    fps = info["fps"] or 30.0
    clip_len_s = (cfg.DATA.NUM_FRAMES * cfg.DATA.SAMPLING_RATE
                  / cfg.DATA.TARGET_FPS)
    duration_s = info["nb_frames"] / fps if info["nb_frames"] else 0
    num_windows = max(int(duration_s / max(clip_len_s, 1e-6)), 1)

    try:
        stream = decoder.VideoStream(
            cfg.DEMO.DATA_SOURCE, cfg.DATA.TEST_CROP_SIZE,
            multi_thread=cfg.DATA_LOADER.ENABLE_MULTI_THREAD_DECODE)
    except RuntimeError:
        yield from _seek_window_stream(cfg, num_windows)
        return
    if not (stream.duration > 0 and stream.nb_frames > 0 and stream.fps > 0):
        stream.close()
        yield from _seek_window_stream(cfg, num_windows)
        return

    # per-window [start_pts, end_pts], exactly esf_decode_clip2's selective
    # branch at clip_idx=w, num_clips=num_windows
    t = cfg.DATA.NUM_FRAMES
    clip = (cfg.DATA.SAMPLING_RATE * t / cfg.DATA.TARGET_FPS) * stream.fps
    delta = max(stream.nb_frames - clip, 0)
    timebase = stream.duration / stream.nb_frames
    bounds = [(int((delta * w / num_windows) * timebase),
               int((delta * w / num_windows + clip - 1) * timebase))
              for w in range(num_windows)]

    def select(win):
        # linspace over the window's frame count (lround == floor(+0.5)
        # for the non-negative positions here)
        n = len(win)
        out = []
        for i in range(t):
            pos = 0.0 if t == 1 else (n - 1) * i / (t - 1)
            out.append(win[min(max(math.floor(pos + 0.5), 0), n - 1)])
        return np.stack(out)

    active = {}          # widx -> frames collected so far
    next_w = 0           # first window not yet activated
    done_w = 0           # windows finalized (yielded or skipped), in order
    last_pts = None
    with stream:
        for pts, frame in stream:
            if last_pts is not None and pts <= last_pts:
                # non-monotonic pts: the pts-bound assembly would not match
                # the sorted seek windows — replay the rest via seeks
                logger.warning(
                    "non-monotonic pts in %s: falling back to per-window "
                    "seek decodes from window %d", cfg.DEMO.DATA_SOURCE,
                    done_w)
                yield from _seek_window_stream(cfg, num_windows, done_w)
                return
            last_pts = pts
            while next_w < num_windows and pts >= bounds[next_w][0]:
                active[next_w] = []
                next_w += 1
            # finalize in window order; bounds' ends are non-decreasing
            while done_w < next_w and done_w in active \
                    and bounds[done_w][1] < pts:
                win = active.pop(done_w)
                if win:
                    yield done_w, select(win)
                done_w += 1
            for w, win in active.items():
                if bounds[w][0] <= pts <= bounds[w][1]:
                    win.append(frame)
    while done_w < num_windows:
        win = active.pop(done_w, None)
        if win:
            yield done_w, select(win)
        done_w += 1


class _LazyWriter:
    """Streaming annotated-output sink shared by both demo paths: opens the
    native encoder at the first window (when the frame size is known) and
    appends per window — constant memory over long streams. ``close`` (run
    in a finally) writes the mp4 trailer so an interrupted recording stays
    playable. No-op when ``path`` is empty."""

    def __init__(self, path: str, fps: float):
        self.path = path
        self.fps = fps
        self.frames_written = 0
        self._enc = None

    def write(self, frames: np.ndarray) -> None:
        if not self.path:
            return
        if self._enc is None:
            self._enc = decoder.VideoEncoder(
                self.path, frames.shape[2], frames.shape[1],
                round(self.fps))
        self._enc.append(frames)
        self.frames_written = self._enc.frames_written

    def close(self) -> None:
        if self._enc is not None:
            enc, self._enc = self._enc, None
            enc.close()
            logger.info("Wrote annotated video to %s (%d frames)",
                        self.path, enc.frames_written)


def _load_detector(cfg):
    """Resolve DEMO.DETECTOR_FN ("package.module:symbol") into a per-window
    detector callable ``fn(frames, window_idx) -> (N, 4)`` of normalized
    [x1,y1,x2,y2] boxes over the raw frame.

    Three shapes of symbol are accepted (so detectors that need one-time
    model loading don't rebuild per window): a plain per-window function, a
    class instantiated once as ``cls(cfg)``, or a one-parameter factory
    ``make(cfg)`` returning the per-window callable. This is the TPU
    build's counterpart of the reference's in-process detectron2
    DefaultPredictor (tools/demo_net.py:130-146) — any person detector
    (torch, ONNX, a remote service) plugs in without framework changes.
    """
    import importlib
    import inspect

    spec = cfg.DEMO.DETECTOR_FN
    mod_name, sep, attr_path = spec.partition(":")
    if not sep:
        mod_name, _, attr_path = spec.rpartition(".")
    if not mod_name or not attr_path:
        raise ValueError(
            f"DEMO.DETECTOR_FN={spec!r} — expected 'package.module:symbol'")
    try:
        obj = importlib.import_module(mod_name)
    except ImportError as e:
        raise RuntimeError(
            f"DEMO.DETECTOR_FN: cannot import module {mod_name!r} "
            f"(is it on PYTHONPATH?)") from e
    for part in attr_path.split("."):
        obj = getattr(obj, part)
    if inspect.isclass(obj):
        obj = obj(cfg)
    else:
        try:
            params = list(inspect.signature(obj).parameters)
        except (TypeError, ValueError):
            params = None
        if params == ["cfg"]:
            obj = obj(cfg)  # factory
    if not callable(obj):
        raise TypeError(
            f"DEMO.DETECTOR_FN={spec!r} resolved to a non-callable "
            f"{type(obj).__name__}")

    def detect(frames, widx):
        boxes = np.asarray(obj(frames, widx), np.float32)
        if boxes.size == 0:
            return np.zeros((0, 4), np.float32)
        if boxes.ndim != 2 or boxes.shape[1] != 4:
            raise ValueError(
                f"detector returned shape {boxes.shape} for window {widx}; "
                "expected (N, 4) normalized [x1,y1,x2,y2]")
        return np.clip(boxes, 0.0, 1.0)

    return detect


def _demo_calibrate(cfg, model, variables, batch, widx):
    """Lazy first-window int8 calibration + persistence (calibrate once,
    serve many — the next demo/test run loads the file instead)."""
    from .quantize import calibrate_int8, save_calibration

    variables = calibrate_int8(model, variables, [batch])
    path = save_calibration(cfg, variables, variables["quant"])
    logger.info("TPU.INT8_EVAL: calibrated activation ranges on window %d; "
                "persisted to %s", widx, path)
    return variables


def demo(cfg, stream=None, display=None):
    """Run the sliding-window demo; ``stream`` overrides the window source
    (an iterable of (widx, (T,H,W,3) uint8 RGB frames)) and ``display``
    the DEMO.DISPLAY sink (a ``show(frames)->bool`` callable) for tests."""
    setup_logging(cfg.OUTPUT_DIR)
    assert stream is not None or cfg.DEMO.DATA_SOURCE or (
        isinstance(cfg.DEMO.DATA_SOURCE, int)
    ), "DEMO.DATA_SOURCE must point to a video file or camera index"

    mesh = build_mesh(cfg)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(cfg.RNG_SEED)
    state, _ = create_train_state(cfg, model, rng)
    state = cu.load_test_checkpoint(cfg, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if cfg.TPU.INT8_EVAL:
        # reuse a persisted serving calibration when one matches this
        # model/config; otherwise the loop below calibrates lazily on the
        # first window
        from .quantize import load_calibration

        _q = load_calibration(cfg, variables)
        if _q is not None:
            variables["quant"] = _q
            logger.info("TPU.INT8_EVAL: loaded persisted calibration")

    labels = None
    if cfg.DEMO.LABEL_FILE_PATH:
        from ..utils.misc import load_demo_labels

        labels = load_demo_labels(cfg.DEMO.LABEL_FILE_PATH)

    if cfg.DETECTION.ENABLE:
        return _demo_detection(cfg, model, variables, mesh, labels,
                               display=display, stream=stream)
    fwd = make_forward(cfg, model)
    preprocess = make_test_preprocess(cfg)

    # Playback rate of the annotated output: each window keeps NUM_FRAMES
    # frames spanning NUM_FRAMES*SAMPLING_RATE source frames, so real-time
    # playback is source_rate/SAMPLING_RATE — the file path resamples the
    # source to TARGET_FPS in the decoder, the camera path subsamples the
    # capture stream directly.
    if stream is None and _is_camera_source(cfg.DEMO.DATA_SOURCE):
        capture = _open_camera(cfg)
        # camera windows buffer raw capture frames (no TARGET_FPS resample),
        # so both playback rate AND the logged window timestamps follow the
        # capture rate, not TARGET_FPS
        src_fps = _capture_fps(capture)
        out_fps = src_fps / cfg.DATA.SAMPLING_RATE
        stream = camera_window_stream(cfg, capture)
    else:
        if stream is None:
            info = decoder.probe(cfg.DEMO.DATA_SOURCE)
            assert info is not None, f"cannot open {cfg.DEMO.DATA_SOURCE}"
            stream = file_window_stream(cfg, info)
        src_fps = cfg.DATA.TARGET_FPS  # decoder resamples files to TARGET_FPS
        out_fps = src_fps / cfg.DATA.SAMPLING_RATE
    clip_len_s = cfg.DATA.NUM_FRAMES * cfg.DATA.SAMPLING_RATE / src_fps

    short = cfg.DATA.TEST_CROP_SIZE
    results = []
    writer = _LazyWriter(cfg.DEMO.OUTPUT_FILE, out_fps)
    close_display = lambda: None  # noqa: E731
    if display is None:
        display, close_display = _make_display(cfg)
    rep = replicated(mesh)
    if not cfg.TPU.INT8_EVAL or "quant" in variables:
        # warm up the compiled preprocess+forward on a dummy window so the
        # first window's FPS overlay measures inference, not compilation —
        # including int8 runs that loaded a persisted calibration above.
        # (uncalibrated int8: the forward can't run yet — it calibrates on
        # the first real window instead, whose FPS includes the compile)
        _warm = np.zeros((cfg.DATA.NUM_FRAMES, short, short * 2, 3), np.uint8)
        _ = fwd(variables, preprocess(
            jax.device_put(_warm[None], rep),
            jax.device_put(np.asarray([short], np.int32), rep),
            jax.device_put(np.asarray([1], np.int32), rep)))
    t0 = time.time()
    t_prev = t0
    try:
        for widx, frames in stream:
            from ..data.datasets import fit_canvas

            canvas, width, _ = fit_canvas(frames, short)
            # single-clip window: replicate rather than data-shard (batch 1
            # is not divisible by the mesh; the demo is a latency, not
            # throughput, path)
            fb = jax.device_put(canvas[None], rep)
            wb = jax.device_put(np.asarray([width], np.int32), rep)
            sidx = jax.device_put(np.asarray([1], np.int32), rep)  # center
            inputs = preprocess(fb, wb, sidx)
            if cfg.TPU.INT8_EVAL and "quant" not in variables:
                variables = _demo_calibrate(cfg, model, variables, inputs,
                                            widx)
            preds = np.asarray(jax.device_get(fwd(variables, inputs)))[0]
            topk = np.argsort(-preds)[: cfg.TENSORBOARD.HISTOGRAM.TOPK or 3]
            t_now = time.time()
            # frames/s over this window, like the reference's per-iteration
            # speed overlay (reference: tools/demo_net.py:240-255)
            win_fps = cfg.DATA.NUM_FRAMES / max(t_now - t_prev, 1e-6)
            t_prev = t_now
            entry = {
                "_type": "demo_window",
                "window": widx,
                "sec": round(widx * clip_len_s, 2),
                "top_classes": [labels[i] if labels else int(i)
                                for i in topk],
                "scores": [round(float(preds[i]), 4) for i in topk],
                "fps": round(win_fps, 1),
            }
            log_json_stats(entry)
            results.append(entry)
            if cfg.DEMO.OUTPUT_FILE or display is not None:
                drawn = _annotate(frames, entry)
                writer.write(drawn)
                if display is not None and not display(drawn):
                    logger.info("Display quit (Esc) at window %d", widx)
                    break
    finally:
        # always release the display and finalize the mp4 (trailer) — an
        # interrupted recording must stay playable
        close_display()
        writer.close()
    fps_measured = len(results) * cfg.DATA.NUM_FRAMES / max(time.time() - t0, 1e-6)
    logger.info("Demo done: %d windows, %.1f frames/s", len(results), fps_measured)
    return results


def _demo_detection(cfg, model, variables, mesh, labels, display=None,
                    stream=None):
    """Sliding-window action detection. Person boxes come from a
    DEMO.DETECTOR_FN live detector (per-window callable over the raw
    frames — the reference's detectron2 branch, tools/demo_net.py:130-146,
    with the detector pluggable) or a DEMO.BOXES_FILE json of precomputed
    normalized [x1,y1,x2,y2] boxes per window."""
    from ..data.ava_dataset import MAX_BOXES
    from ..data.preprocess import make_detection_preprocess
    from .state import make_detection_forward

    if cfg.DEMO.DETECTOR_FN:
        get_boxes = _load_detector(cfg)
    else:
        assert cfg.DEMO.BOXES_FILE, (
            "detection demo needs person boxes: set DEMO.DETECTOR_FN "
            "('module:symbol' live detector) or DEMO.BOXES_FILE (json: "
            "window idx -> normalized [x1,y1,x2,y2] boxes)"
        )
        with open(cfg.DEMO.BOXES_FILE) as f:
            boxes_by_window = {int(k): np.asarray(v, np.float32)
                               for k, v in json.load(f).items()}
        get_boxes = lambda frames, widx: boxes_by_window.get(  # noqa: E731
            widx, np.zeros((0, 4), np.float32))
        assert stream is not None or not _is_camera_source(
            cfg.DEMO.DATA_SOURCE), (
            "DEMO.BOXES_FILE holds per-window boxes of a known video, "
            "which a live camera cannot have. Set DEMO.DETECTOR_FN to run "
            "a live person detector (any detector plugs in), or use a "
            "file source"
        )
    preprocess = make_detection_preprocess(cfg)
    fwd = make_detection_forward(cfg, model)

    if stream is None and _is_camera_source(cfg.DEMO.DATA_SOURCE):
        capture = _open_camera(cfg)
        # camera windows follow the capture rate (no TARGET_FPS resample),
        # same convention as the classification camera path
        clip_len_s = (cfg.DATA.NUM_FRAMES * cfg.DATA.SAMPLING_RATE
                      / _capture_fps(capture))
        stream = camera_window_stream(cfg, capture)
    else:
        if stream is None:
            info = decoder.probe(cfg.DEMO.DATA_SOURCE)
            assert info is not None, f"cannot open {cfg.DEMO.DATA_SOURCE}"
            stream = file_window_stream(cfg, info)
        clip_len_s = (cfg.DATA.NUM_FRAMES * cfg.DATA.SAMPLING_RATE
                      / cfg.DATA.TARGET_FPS)

    short = cfg.DATA.TEST_CROP_SIZE
    rep = replicated(mesh)
    results = []
    # windows hold NUM_FRAMES frames spanning NUM_FRAMES*SAMPLING_RATE
    # source frames (TARGET_FPS for files, capture rate for cameras) —
    # NUM_FRAMES/clip_len_s is that rate post-subsampling
    writer = _LazyWriter(cfg.DEMO.OUTPUT_FILE,
                         cfg.DATA.NUM_FRAMES / clip_len_s)
    close_display = lambda: None  # noqa: E731
    if display is None:
        display, close_display = _make_display(cfg)
    from ..data.datasets import canvas_width

    _wc = canvas_width(short)
    if not cfg.TPU.INT8_EVAL or "quant" in variables:
        # warm up the compiled preprocess+forward so window 0's FPS overlay
        # measures inference, not compilation (mirrors the classification
        # path, incl. int8 with a persisted calibration; uncalibrated int8
        # calibrates on the first real window instead)
        _ = fwd(variables,
                preprocess(jax.device_put(
                    np.zeros((1, cfg.DATA.NUM_FRAMES, short, _wc, 3),
                             np.uint8),
                    rep)),
                jax.device_put(np.zeros((1, MAX_BOXES, 4), np.float32), rep))
    t0 = time.time()
    try:
        _detection_window_loop(
            cfg, model, variables, fwd, preprocess, rep, get_boxes,
            stream, short, _wc, clip_len_s, labels, results, writer,
            display)
    finally:
        close_display()
        writer.close()
    fps_measured = (len(results) * cfg.DATA.NUM_FRAMES
                    / max(time.time() - t0, 1e-6))
    logger.info("Demo done: %d detection windows, %.1f frames/s",
                len(results), fps_measured)
    if cfg.DEMO.OUTPUT_FILE and writer.frames_written == 0:
        logger.warning(
            "DEMO.OUTPUT_FILE set but no window produced frames "
            "(detector/boxes yielded nothing for any window?) — "
            "nothing written")
    return results


def _detection_window_loop(cfg, model, variables, fwd, preprocess, rep,
                           get_boxes, stream, short, _wc,
                           clip_len_s, labels, results, writer, display):
    from ..data.ava_dataset import MAX_BOXES
    from ..data.datasets import fit_canvas

    t_prev = time.time()
    for widx, frames in stream:
        canvas, width, _ = fit_canvas(frames, short)
        nboxes = get_boxes(frames, widx)
        if len(nboxes) == 0:
            # keep the output video time-continuous: pass the window
            # through un-annotated instead of silently dropping it
            writer.write(canvas)
            continue
        if len(nboxes) > MAX_BOXES:
            logger.warning(
                "window %d: %d boxes exceed MAX_BOXES=%d; extra boxes "
                "dropped", widx, len(nboxes), MAX_BOXES)
        # normalized (over the RAW frame) -> canvas pixels: undo the
        # fit_canvas resize + center crops so boxes land on the content
        t_, fh, fw, _c = frames.shape
        if fh <= fw:
            nh, nw = short, max(short, int(round(fw * short / fh)))
        else:
            nh, nw = int(round(fh * short / fw)), short
        yoff = max((nh - short) // 2, 0)
        xoff = max((nw - _wc) // 2, 0)
        px = np.zeros((MAX_BOXES, 4), np.float32)
        n = min(len(nboxes), MAX_BOXES)
        px[:n, 0] = np.clip(nboxes[:n, 0] * nw - xoff, 0, width)
        px[:n, 1] = np.clip(nboxes[:n, 1] * nh - yoff, 0, short)
        px[:n, 2] = np.clip(nboxes[:n, 2] * nw - xoff, 0, width)
        px[:n, 3] = np.clip(nboxes[:n, 3] * nh - yoff, 0, short)
        inputs = preprocess(jax.device_put(canvas[None], rep))
        rois = jax.device_put(px[None], rep)
        if cfg.TPU.INT8_EVAL and "quant" not in variables:
            from .state import _flatten_rois

            variables = _demo_calibrate(
                cfg, model, variables, (inputs, _flatten_rois(rois)), widx)
        scores = np.asarray(jax.device_get(fwd(variables, inputs, rois)))[:n]
        t_now = time.time()
        win_fps = cfg.DATA.NUM_FRAMES / max(t_now - t_prev, 1e-6)
        t_prev = t_now
        box_entries = []
        for bi in range(n):
            topk = np.argsort(-scores[bi])[: cfg.TENSORBOARD.HISTOGRAM.TOPK or 3]
            box_entries.append({
                "box": [round(float(v), 1) for v in px[bi]],
                "top_classes": [labels[i] if labels else int(i) for i in topk],
                "scores": [round(float(scores[bi][i]), 4) for i in topk],
            })
        entry = {
            "_type": "demo_window",
            "window": widx,
            "sec": round(widx * clip_len_s, 2),
            "boxes": box_entries,
            "fps": round(win_fps, 1),
        }
        log_json_stats(entry)
        results.append(entry)
        if cfg.DEMO.OUTPUT_FILE or display is not None:
            # draw on the canvas (the coordinate frame the boxes live in)
            drawn = _annotate_boxes(canvas, entry)
            writer.write(drawn)
            if display is not None and not display(drawn):
                logger.info("Display quit (Esc) at window %d", widx)
                break


def _annotate_boxes(frames: np.ndarray, entry) -> np.ndarray:
    """Draw each person box + its top-1 action label
    (reference demo overlays detector boxes + action labels)."""
    from PIL import Image, ImageDraw

    out = np.empty_like(frames)
    for i in range(frames.shape[0]):
        im = Image.fromarray(frames[i])
        draw = ImageDraw.Draw(im)
        for be in entry["boxes"]:
            x1, y1, x2, y2 = be["box"]
            draw.rectangle([x1, y1, x2, y2], outline=(0, 255, 0))
            draw.text((x1 + 2, max(y1 - 10, 0)),
                      f"{be['top_classes'][0]}: {be['scores'][0]:.2f}",
                      fill=(0, 255, 0))
        out[i] = np.asarray(im)
    return out


def _annotate(frames: np.ndarray, entry) -> np.ndarray:
    """Overlay the top-k label lines + measured FPS onto each frame
    (reference: tools/demo_net.py:240-255,310-393 draws label + speed)."""
    from PIL import Image, ImageDraw

    out = np.empty_like(frames)
    lines = [
        f"{cls}: {score:.2f}"
        for cls, score in zip(entry["top_classes"], entry["scores"])
    ] + [f"Speed: {entry['fps']:.1f} fps"]
    for i in range(frames.shape[0]):
        im = Image.fromarray(frames[i])
        draw = ImageDraw.Draw(im)
        for li, text in enumerate(lines):
            draw.text((4, 4 + 12 * li), text, fill=(255, 255, 0))
        out[i] = np.asarray(im)
    return out

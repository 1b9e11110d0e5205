"""Native decoder tests using self-encoded fixture media (SURVEY §4:
PyAV-style container/codec round-trip tests)."""

import os

import numpy as np
import pytest

from efficient_slowfast_tpu.data import decoder


@pytest.fixture(scope="module")
def fixture_video(tmp_path_factory):
    """120-frame video, frame index encoded in the red channel (×2)."""
    path = str(tmp_path_factory.mktemp("media") / "fixture.mp4")
    n, h, w = 120, 120, 160
    frames = np.zeros((n, h, w, 3), np.uint8)
    for i in range(n):
        frames[i, :, :, 0] = i * 2
        frames[i, :, :, 1] = 128
    decoder.write_test_video(path, frames, fps=30)
    return path


def red_indices(clip):
    """Recover source frame indices from the red channel."""
    return [float(clip[i, :, :, 0].mean()) / 2.0 for i in range(clip.shape[0])]


def test_probe(fixture_video):
    info = decoder.probe(fixture_video)
    assert info["nb_frames"] == 120
    assert info["width"] == 160 and info["height"] == 120
    assert 29 < info["fps"] < 32


def test_decode_shapes_and_aspect(fixture_video):
    clip = decoder.decode_clip(fixture_video, num_frames=8, sampling_rate=2,
                               clip_idx=0, num_clips=10, target_fps=30,
                               short_side=64, random_clip=False)
    assert clip.shape == (8, 64, 85, 3)  # 160/120 aspect → 85 wide


def test_uniform_test_clips_cover_video(fixture_video):
    """Clip k of 10 must start near (N - clip_size) * k / 10 (decoder.py:55-83)."""
    clip_size = 2 * 8 / 30 * 30  # 16 frames
    for k in (0, 5, 9):
        clip = decoder.decode_clip(fixture_video, num_frames=8,
                                   sampling_rate=2, clip_idx=k, num_clips=10,
                                   target_fps=30, short_side=64,
                                   random_clip=False)
        idx = red_indices(clip)
        expected_start = (120 - clip_size) * k / 10
        assert abs(idx[0] - expected_start) < 4, (k, idx)
        assert abs(idx[-1] - (expected_start + clip_size - 1)) < 4, (k, idx)
        # monotone non-decreasing frame order
        assert all(b >= a - 2 for a, b in zip(idx, idx[1:]))


def test_random_clip_within_bounds(fixture_video):
    clip = decoder.decode_clip(fixture_video, num_frames=8, sampling_rate=2,
                               clip_idx=-1, num_clips=1, target_fps=30,
                               short_side=64, random_clip=True)
    idx = red_indices(clip)
    assert 0 <= idx[0] <= 120 and 0 <= idx[-1] <= 122


def test_decode_max_aspect_cfg_key_and_warning(tmp_path, caplog):
    """TPU.DECODE_MAX_ASPECT (r5, VERDICT r4 weak #5): the long-axis decode
    cap is a cfg key, and a one-time warning fires when it engages — never
    a silent center-crop."""
    import logging

    from efficient_slowfast_tpu.config import get_cfg
    from efficient_slowfast_tpu.data.build import build_dataset

    rs = np.random.RandomState(9)
    p = str(tmp_path / "wide3.mp4")  # 3:1 media
    decoder.write_test_video(p, rs.randint(0, 255, (40, 80, 240, 3),
                                           np.uint8))
    (tmp_path / "test.csv").write_text(f"{p} 0\n")

    def make(max_aspect):
        cfg = get_cfg()
        cfg.DATA.PATH_TO_DATA_DIR = str(tmp_path)
        cfg.DATA.NUM_FRAMES = 4
        cfg.DATA.TEST_CROP_SIZE = 48
        cfg.TEST.NUM_ENSEMBLE_VIEWS = 2
        cfg.TPU.DECODE_MAX_ASPECT = max_aspect
        return build_dataset("kinetics", cfg, "test")

    # cap BELOW the media aspect: long axis clipped to the cap + warning
    ds = make(2.5)
    with caplog.at_level(logging.WARNING):
        frames = ds._decode_all_views(0)
    assert frames.shape[3] == int(round(2.5 * 48))
    assert "DECODE_MAX_ASPECT" in caplog.text

    # default cap above the media aspect: full extent, no warning
    caplog.clear()
    ds = make(4.0)
    with caplog.at_level(logging.WARNING):
        frames = ds._decode_all_views(0)
    assert frames.shape[3] == 144  # 240 * 48/80 — uncapped 3:1 extent
    assert "DECODE_MAX_ASPECT" not in caplog.text


def test_union_decode_views_bit_identical(tmp_path):
    """esf_decode_views (one union decode serving every temporal test view,
    VERDICT r4 next #5) must be BIT-identical to per-view decode_clip calls
    across landscape, >2:1 wide, portrait and shorter-than-clip media."""
    specs = {"land": (100, 160, 90), "wide": (100, 300, 90),
             "tall": (300, 100, 90), "short": (64, 96, 12)}
    for name, (h, w, n) in specs.items():
        path = str(tmp_path / f"{name}.mp4")
        rs = np.random.RandomState(5)
        decoder.write_test_video(path, rs.randint(0, 255, (n, h, w, 3),
                                                  np.uint8))
        union = decoder.decode_views(path, num_frames=8, sampling_rate=2,
                                     num_clips=10, target_fps=30,
                                     short_side=64, max_aspect=4.0)
        assert union is not None, name
        for v in range(10):
            single = decoder.decode_clip(
                path, num_frames=8, sampling_rate=2, clip_idx=v,
                num_clips=10, target_fps=30, short_side=64,
                random_clip=False, max_aspect=4.0)
            assert union[v].shape == single.shape, (name, v)
            assert (union[v] == single).all(), (name, v)


def test_union_decode_length_guard_bails_on_long_seekable_media(tmp_path):
    """Seekable media whose view windows cannot overlap (frames >=
    clip_size * (num_clips + 1)) must make decode_views bail (rc -16 →
    None) BEFORE paying its two full decode passes: per-view seek decodes
    are measured 2-3x faster there (PERF.md r5 length-guard note), and the
    dataset layer falls back to them on None."""
    path = str(tmp_path / "long.mp4")
    rs = np.random.RandomState(9)
    decoder.write_test_video(path, rs.randint(0, 255, (200, 90, 160, 3),
                                              np.uint8))
    # clip_size = 2*8/30*30 = 16; bound = 16 * (10+1) = 176 <= 200 frames
    assert decoder.decode_views(path, num_frames=8, sampling_rate=2,
                                num_clips=10, target_fps=30, short_side=64,
                                max_aspect=4.0) is None
    # fewer views -> bound 16*31 = 496 > 200: union engages and stays
    # bit-identical to the per-view decodes it replaces
    union = decoder.decode_views(path, num_frames=8, sampling_rate=2,
                                 num_clips=30, target_fps=30, short_side=64,
                                 max_aspect=4.0)
    assert union is not None
    for v in (0, 29):
        single = decoder.decode_clip(
            path, num_frames=8, sampling_rate=2, clip_idx=v, num_clips=30,
            target_fps=30, short_side=64, random_clip=False, max_aspect=4.0)
        assert (union[v] == single).all(), v


def test_union_bail_uses_per_view_memo_entries(tmp_path, monkeypatch):
    """When the union declines a video (length guard), the dataset must
    (a) probe the union only ONCE for that path, and (b) serve its items
    through per-(path, view) memo entries — the layout that lets different
    loader threads decode different views in parallel, instead of one
    all-views entry serializing every view into its holder thread."""
    from efficient_slowfast_tpu.config import get_cfg
    from efficient_slowfast_tpu.data.build import build_dataset
    from efficient_slowfast_tpu.data import decoder as dec_mod

    d = tmp_path / "data"
    d.mkdir()
    rs = np.random.RandomState(8)
    p = str(d / "long.mp4")
    # clip = 2*4/30*30 = 8; bound = 8 * (5+1) = 48 <= 120 frames -> bail
    decoder.write_test_video(p, rs.randint(0, 255, (120, 90, 160, 3),
                                           np.uint8))
    (d / "test.csv").write_text(f"{p} 0\n")

    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(d)
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TEST_CROP_SIZE = 48
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 5
    cfg.TEST.NUM_SPATIAL_CROPS = 3

    calls = {"n": 0}
    real = dec_mod.decode_views

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(dec_mod, "decode_views", counting)
    dataset = build_dataset("kinetics", cfg, "test")
    items = [dataset[i] for i in range(len(dataset))]
    assert len(items) == 5 * 3
    assert calls["n"] == 1  # one union probe, then _union_unsupported
    assert p in dataset._union_unsupported
    # memo holds per-(path, view) tuple keys, not one whole-path entry
    keys = list(dataset._test_decode_memo._entries)
    assert keys and all(isinstance(k, tuple) for k in keys)
    # and the items are the per-view decodes
    ref = decoder.decode_clip(p, 4, 2, 0, 5, 30, 48, False,
                              max_aspect=4.0)
    from efficient_slowfast_tpu.data.datasets import fit_canvas
    want, _, _ = fit_canvas(ref, 48, keep_portrait=True, long_view=0)
    assert (items[0]["frames"] == want).all()


def test_union_decode_width_hint_identical(tmp_path):
    """The exact-width second-visit buffer must not change union output."""
    path = str(tmp_path / "hint.mp4")
    rs = np.random.RandomState(6)
    decoder.write_test_video(path, rs.randint(0, 255, (60, 90, 160, 3),
                                              np.uint8))
    a = decoder.decode_views(path, 8, 2, 4, 30, 64, max_aspect=4.0)
    hint = max(a.shape[2], a.shape[3])
    b = decoder.decode_views(path, 8, 2, 4, 30, 64, max_aspect=4.0,
                             width_hint=hint)
    assert a.shape == b.shape and (a == b).all()


def test_kinetics_test_items_identical_with_and_without_union_decode(
        tmp_path, monkeypatch):
    """The dataset's test items must be byte-identical whether the union
    decode or the per-view fallback serves them (the fallback engages for
    streams decode_views cannot match exactly)."""
    from efficient_slowfast_tpu.config import get_cfg
    from efficient_slowfast_tpu.data.build import build_dataset
    from efficient_slowfast_tpu.data import datasets as ds_mod

    d = tmp_path / "data"
    d.mkdir()
    rs = np.random.RandomState(7)
    lines = []
    for vi, (h, w) in enumerate([(90, 160), (100, 260)]):
        p = str(d / f"v{vi}.mp4")
        decoder.write_test_video(p, rs.randint(0, 255, (70, h, w, 3),
                                               np.uint8))
        lines.append(f"{p} {vi}")
    (d / "test.csv").write_text("\n".join(lines) + "\n")

    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(d)
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TEST_CROP_SIZE = 48
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 5
    cfg.TEST.NUM_SPATIAL_CROPS = 3

    def items(force_fallback):
        dataset = build_dataset("kinetics", cfg, "test")
        if force_fallback:
            monkeypatch.setattr(ds_mod, "np", ds_mod.np)  # no-op anchor
            from efficient_slowfast_tpu.data import decoder as dec_mod
            monkeypatch.setattr(dec_mod, "decode_views",
                                lambda *a, **k: None)
        out = [dataset[i] for i in range(len(dataset))]
        monkeypatch.undo()
        return out

    with_union = items(False)
    with_fallback = items(True)
    assert len(with_union) == 2 * 5 * 3
    for a, b in zip(with_union, with_fallback):
        assert (a["frames"] == b["frames"]).all()
        for k in ("width", "portrait", "label", "index", "spatial_idx",
                  "temporal_idx"):
            assert a[k] == b[k], k


def test_decode_failure_returns_none(tmp_path):
    bad = tmp_path / "nope.mp4"
    bad.write_bytes(b"not a video")
    assert decoder.decode_clip(str(bad), 8, 2, 0, 10, 30, 64, False) is None


def test_unloadable_library_is_rebuilt(tmp_path):
    """A stale or wrong-platform .so (e.g. a linux binary installed on
    another ABI) must be rebuilt from csrc/ on load failure, not crash
    ctypes — the installed-wheel recovery path.

    Runs in a subprocess: dlopen caches by path, so a process that already
    loaded the good library (this one, via earlier tests) would get the old
    handle back instead of reading the corrupted file. The corruption itself
    goes through os.replace (a new inode) so this process's live mapping of
    the old library stays intact.
    """
    import subprocess
    import sys

    path = decoder._lib_path()
    with open(path, "rb") as f:
        good = f.read()
    garbage = tmp_path / "garbage.so"
    garbage.write_bytes(b"garbage, not an ELF")
    try:
        os.replace(garbage, path)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        proc = subprocess.run(
            [sys.executable, "-c",
             f"import sys; sys.path.insert(0, {repo!r})\n"
             "from efficient_slowfast_tpu.data import decoder\n"
             "lib = decoder.get_lib()\n"
             "assert lib.esf_probe is not None\n"
             "print('REBUILT_OK')\n"],
            capture_output=True, text=True, timeout=300,
        )
        assert proc.returncode == 0, proc.stderr
        assert "REBUILT_OK" in proc.stdout
        assert os.path.getsize(path) > 1000  # really rebuilt
    finally:
        if not os.path.exists(path) or os.path.getsize(path) < 1000:
            restore = tmp_path / "restore.so"
            restore.write_bytes(good)
            os.replace(restore, path)


def test_kinetics_dataset_end_to_end(fixture_video, tmp_path):
    """List-file dataset → native decode → canvas sample (kinetics.py flow)."""
    from efficient_slowfast_tpu.config import get_cfg
    from efficient_slowfast_tpu.data.build import build_dataset

    ddir = tmp_path / "k400"
    ddir.mkdir()
    (ddir / "test.csv").write_text(f"{fixture_video} 3\n")
    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(ddir)
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TEST_CROP_SIZE = 64
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 10
    cfg.TEST.NUM_SPATIAL_CROPS = 3
    cfg.MODEL.NUM_CLASSES = 10
    ds = build_dataset("kinetics", cfg, "test")
    assert len(ds) == 30  # 1 video × 30 views
    item = ds[4]  # temporal idx 1, spatial idx 1
    assert item["frames"].shape == (8, 64, 128, 3)
    assert item["width"] == 85
    assert item["label"] == 3
    assert item["temporal_idx"] == 1 and item["spatial_idx"] == 1
    # canvas right-padding must be zero
    assert item["frames"][:, :, 86:].max() == 0


def test_streaming_encoder_roundtrip(tmp_path):
    """VideoEncoder (csrc esf_encoder_open/append/close): per-window appends
    produce one decodable mp4 with the requested fps and total frame count,
    byte-equivalent in content to the one-shot esf_write_test_video path
    (which now composes the same encoder)."""
    import numpy as np

    from efficient_slowfast_tpu.data import decoder

    rs = np.random.RandomState(7)
    windows = [rs.randint(0, 255, (4, 48, 64, 3), np.uint8)
               for _ in range(3)]

    spath = str(tmp_path / "stream.mp4")
    with decoder.VideoEncoder(spath, width=64, height=48, fps=12) as enc:
        for w in windows:
            enc.append(w)
    assert enc.frames_written == 12

    info = decoder.probe(spath)
    assert info is not None
    assert info["nb_frames"] == 12
    assert round(info["fps"]) == 12
    assert (info["width"], info["height"]) == (64, 48)

    # one-shot writer over the same frames -> same decoded content
    opath = str(tmp_path / "oneshot.mp4")
    decoder.write_test_video(opath, np.concatenate(windows, axis=0), fps=12)
    a = decoder.decode_clip(spath, num_frames=12, sampling_rate=1,
                            clip_idx=0, num_clips=1, target_fps=12,
                            short_side=48, random_clip=False)
    b = decoder.decode_clip(opath, num_frames=12, sampling_rate=1,
                            clip_idx=0, num_clips=1, target_fps=12,
                            short_side=48, random_clip=False)
    assert a is not None and b is not None
    np.testing.assert_array_equal(a, b)

    # size/shape/dtype mismatches are rejected, not silently mis-encoded
    import pytest

    with decoder.VideoEncoder(str(tmp_path / "x.mp4"), 64, 48, 12) as enc2:
        with pytest.raises(ValueError):
            enc2.append(rs.randint(0, 255, (2, 32, 32, 3), np.uint8))
        with pytest.raises(ValueError):  # RGBA: wrong channel count
            enc2.append(rs.randint(0, 255, (2, 48, 64, 4), np.uint8))
        with pytest.raises(ValueError):  # float frames are not truncated
            enc2.append(rs.rand(2, 48, 64, 3).astype(np.float32))


def test_decode_portrait_keeps_vertical_extent(tmp_path):
    """Tall videos decode in natural portrait orientation with the FULL
    vertical extent (up to the 2:1 canvas), not center-cropped square —
    esf_decode_clip2 keep_tall + the zero-copy swap-back in decode_clip.
    A vertical gradient pins the orientation and crop correctness."""
    path = str(tmp_path / "portrait.mp4")
    n, h, w = 40, 192, 112  # 12:7 portrait
    frames = np.zeros((n, h, w, 3), np.uint8)
    # rows encode their own position; columns encode theirs in green
    frames[:, :, :, 0] = np.arange(h, dtype=np.uint8)[None, :, None]
    frames[:, :, :, 1] = (np.arange(w) * 2).astype(np.uint8)[None, None, :]
    decoder.write_test_video(path, frames, fps=30)

    short = 56  # half-size decode: expect (T, 96, 56, 3)
    clip = decoder.decode_clip(path, num_frames=4, sampling_rate=2,
                               clip_idx=0, num_clips=2, target_fps=30,
                               short_side=short, random_clip=False)
    assert clip.shape[1:] == (96, short, 3), clip.shape
    # vertical gradient preserved along axis 1 (rows), ~2x downsampled
    red_rows = clip[0, :, :, 0].mean(axis=1)
    assert red_rows[5] < red_rows[48] < red_rows[90]
    expected = (np.arange(96) * 2 + 0.5).astype(np.float32)  # src row ≈ 2*out
    assert np.abs(red_rows - expected).mean() < 3.0
    # horizontal gradient along axis 2 (cols)
    green_cols = clip[0, :, :, 1].mean(axis=0)
    assert green_cols[5] < green_cols[28] < green_cols[50]


def test_decode_portrait_beyond_2to1_center_crops(tmp_path):
    """Aspect > 2:1 portrait still caps at the 2:1 canvas, centered."""
    path = str(tmp_path / "tall.mp4")
    n, h, w = 20, 300, 100  # 3:1
    frames = np.zeros((n, h, w, 3), np.uint8)
    frames[:, :, :, 0] = np.linspace(0, 250, h).astype(np.uint8)[None, :, None]
    decoder.write_test_video(path, frames, fps=30)
    short = 50
    clip = decoder.decode_clip(path, num_frames=4, sampling_rate=2,
                               clip_idx=0, num_clips=2, target_fps=30,
                               short_side=short, random_clip=False)
    assert clip.shape[1:] == (100, short, 3), clip.shape  # capped at 2*short
    # centered: the visible gradient spans the middle third of the source
    red = clip[0, :, :, 0].mean()
    full = float(np.linspace(0, 250, h).mean())
    assert abs(red - full) < 12.0


def test_decode_max_aspect_keeps_wide_extent(tmp_path):
    """``max_aspect`` widens the decode buffer so >2:1 content keeps its
    full long axis for the test protocol's per-view canvas windows
    (datasets.TEST_DECODE_ASPECT; default 2.0 center-crops as before)."""
    path = str(tmp_path / "cinema.mp4")
    n, h, w = 20, 100, 300  # 3:1 "cinemascope"
    frames = np.zeros((n, h, w, 3), np.uint8)
    frames[:, :, :, 0] = np.linspace(0, 250, w).astype(np.uint8)[None, None, :]
    decoder.write_test_video(path, frames, fps=30)
    short = 50

    wide = decoder.decode_clip(path, num_frames=4, sampling_rate=2,
                               clip_idx=0, num_clips=2, target_fps=30,
                               short_side=short, random_clip=False,
                               max_aspect=4.0)
    assert wide.shape[1:] == (short, 150, 3), wide.shape  # full 3:1 extent
    # the horizontal gradient spans its full range (nothing cropped away)
    red_cols = wide[0, :, :, 0].mean(axis=0)
    assert red_cols[0] < 15.0 and red_cols[-1] > 235.0

    capped = decoder.decode_clip(path, num_frames=4, sampling_rate=2,
                                 clip_idx=0, num_clips=2, target_fps=30,
                                 short_side=short, random_clip=False)
    assert capped.shape[1:] == (short, 100, 3), capped.shape
    # default is the old centered 2:1 window of the same content
    np.testing.assert_array_equal(capped[..., 0], wide[:, :, 25:125, 0])


def test_kinetics_test_views_window_wide_content(tmp_path):
    """E2E: the test loader's 3 spatial items of a >2:1 video carry
    per-view canvas windows spanning the full long axis (left view holds
    the leftmost source columns, right view the rightmost), composing
    decode max_aspect → fit_canvas long_view (reference 30-view protocol,
    transform.py:425-468)."""
    from efficient_slowfast_tpu.config import get_cfg
    from efficient_slowfast_tpu.data.build import build_dataset

    path = str(tmp_path / "cinema.mp4")
    n, h, w = 20, 100, 300  # 3:1
    frames = np.zeros((n, h, w, 3), np.uint8)
    frames[:, :, :, 0] = np.linspace(0, 250, w).astype(np.uint8)[None, None, :]
    decoder.write_test_video(path, frames, fps=30)

    ddir = tmp_path / "k400"
    ddir.mkdir()
    (ddir / "test.csv").write_text(f"{path} 0\n")
    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(ddir)
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TEST_CROP_SIZE = 50
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 2
    cfg.TEST.NUM_SPATIAL_CROPS = 3
    cfg.MODEL.NUM_CLASSES = 10
    ds = build_dataset("kinetics", cfg, "test")

    views = [ds[k] for k in (0, 1, 2)]  # temporal view 0, spatial 0/1/2
    for k, item in enumerate(views):
        assert item["spatial_idx"] == k
        assert item["width"] == 100  # window fills the 2:1 canvas
    red = [v["frames"][0, :, :, 0].astype(np.float32) for v in views]
    # left view starts at the dark (left) edge, right view ends bright
    assert red[0][:, 0].mean() < 15.0
    assert red[2][:, -1].mean() > 235.0
    # center view sits between and all three windows are distinct
    assert red[0].mean() < red[1].mean() < red[2].mean()
    # windows overlap-consistently: view1 is view0 shifted by 25 source cols
    # (L=150, window starts 0/25/50 at short=50, wc=100)
    np.testing.assert_array_equal(red[0][:, 25:], red[1][:, :75])
    np.testing.assert_array_equal(red[1][:, 25:], red[2][:, :75])

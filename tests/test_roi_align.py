"""ROIAlign numerical tests vs an independent numpy reference
(SURVEY §4: detectron2-style ROIAlign numerical tests)."""

import numpy as np
import jax.numpy as jnp

from efficient_slowfast_tpu.ops.roi_align import roi_align


def np_roi_align(feat, boxes, out, scale, n=2, aligned=True):
    """Straightforward loop reference (feat: (B,H,W,C))."""
    b, H, W, C = feat.shape
    R = len(boxes)
    res = np.zeros((R, out, out, C), np.float64)
    for r, (bi, x1, y1, x2, y2) in enumerate(boxes):
        off = 0.5 if aligned else 0.0
        x1, y1, x2, y2 = (v * scale - off for v in (x1, y1, x2, y2))
        rw, rh = x2 - x1, y2 - y1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / out, rh / out
        f = feat[int(bi)]
        for ph in range(out):
            for pw in range(out):
                acc = np.zeros(C)
                for iy in range(n):
                    for ix in range(n):
                        y = y1 + (ph + (iy + 0.5) / n) * bh
                        x = x1 + (pw + (ix + 0.5) / n) * bw
                        if y < -1 or y > H or x < -1 or x > W:
                            continue
                        yc = min(max(y, 0), H - 1)
                        xc = min(max(x, 0), W - 1)
                        y0, x0 = int(np.floor(yc)), int(np.floor(xc))
                        y1b, x1b = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
                        fy, fx = yc - y0, xc - x0
                        v = (f[y0, x0] * (1 - fy) * (1 - fx)
                             + f[y1b, x0] * fy * (1 - fx)
                             + f[y0, x1b] * (1 - fy) * fx
                             + f[y1b, x1b] * fy * fx)
                        acc += v
                res[r, ph, pw] = acc / (n * n)
    return res


def test_roi_align_matches_numpy_reference():
    rs = np.random.RandomState(0)
    feat = rs.randn(2, 14, 14, 8).astype(np.float32)
    boxes = np.array([
        [0, 16.0, 16.0, 128.0, 128.0],
        [0, 0.0, 0.0, 224.0, 224.0],
        [1, 50.0, 30.0, 180.0, 200.0],
        [1, 100.0, 100.0, 120.0, 130.0],  # small box
    ], np.float32)
    out = roi_align(jnp.asarray(feat), jnp.asarray(boxes), 7, 1.0 / 16, 2, True)
    ref = np_roi_align(feat, boxes, 7, 1.0 / 16, 2, True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_roi_align_identity_box():
    """A box covering exactly the feature map with 1 sample per bin and
    out == H reproduces the feature values at pixel centers."""
    H = 8
    feat = np.arange(H * H, dtype=np.float32).reshape(1, H, H, 1)
    # aligned: sample x = (x1 - 0.5) + (p + 0.5) = p for box [0, 0, H, H] —
    # pixel centers land exactly on integer coords.
    boxes = np.array([[0, 0.0, 0.0, float(H), float(H)]], np.float32)
    out = roi_align(jnp.asarray(feat), jnp.asarray(boxes), H, 1.0, 1, True)
    np.testing.assert_allclose(np.asarray(out)[0, :, :, 0],
                               feat[0, :, :, 0], atol=1e-5)


def test_roi_align_out_of_bounds_zero():
    feat = np.ones((1, 8, 8, 1), np.float32)
    boxes = np.array([[0, -100.0, -100.0, -50.0, -50.0]], np.float32)
    out = roi_align(jnp.asarray(feat), jnp.asarray(boxes), 4, 1.0, 2, True)
    assert float(np.abs(np.asarray(out)).max()) == 0.0

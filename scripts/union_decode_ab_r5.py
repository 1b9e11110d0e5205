"""A/B: per-view window decodes vs esf_decode_views union decode (r5).

Measures host decode wall-time for the full 10-temporal-view protocol of
one video at Kinetics-like settings (T=32, sampling 2, short side 256),
across media lengths/aspects. Writes scripts/union_decode_ab_r5.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from efficient_slowfast_tpu.data.decoder import (  # noqa: E402
    decode_clip, decode_views, write_test_video)


def _warm_pages(nbytes):
    # this VM first-faults never-touched memory at ~25-50 MB/s (PERF.md r5
    # "measurement hazard"): pre-touch the union's output-buffer footprint
    # before each timed leg so both legs run on warm pages and the A/B
    # measures decode work, not the page-fault tax
    import gc

    a = np.empty(nbytes, np.uint8)
    a[:] = 0
    del a
    gc.collect()


def bench(path, views=10, t=32, short=256, reps=3):
    # warm (page cache, lib init)
    decode_clip(path, t, 2, 0, views, 30, short, False, max_aspect=4.0)
    out_bytes = views * t * short * (short * 4) * 3
    per_view = []
    for _ in range(reps):
        t0 = time.monotonic()
        for v in range(views):
            c = decode_clip(path, t, 2, v, views, 30, short, False,
                            max_aspect=4.0)
            assert c is not None
        per_view.append(time.monotonic() - t0)
    union = []
    for _ in range(reps):
        _warm_pages(out_bytes)
        t0 = time.monotonic()
        u = decode_views(path, t, 2, views, 30, short, max_aspect=4.0)
        assert u is not None
        union.append(time.monotonic() - t0)
    return min(per_view), min(union)


def main():
    d = "/tmp/union_ab_media"
    os.makedirs(d, exist_ok=True)
    out = {}
    specs = {
        # (frames, h, w): 10 s @30fps 16:9, 10 s cinema 2.39:1, 5 s 16:9
        "300f_16x9": (300, 720, 1280),
        "300f_cinema": (300, 536, 1280),
        "150f_16x9": (150, 720, 1280),
    }
    for name, (n, h, w) in specs.items():
        path = os.path.join(d, name + ".mp4")
        if not os.path.exists(path):
            rs = np.random.RandomState(0)
            # smooth content: random noise kills the codec (encode time +
            # unrealistic bitrate); gradients compress like real video
            base = np.zeros((n, h, w, 3), np.uint8)
            base[..., 0] = np.linspace(0, 255, w)[None, None, :]
            base[..., 1] = np.linspace(0, 255, h)[None, :, None]
            base[..., 2] = (np.arange(n) % 255)[:, None, None]
            write_test_video(path, base, fps=30)
        pv, un = bench(path)
        out[name] = {"per_view_s": round(pv, 4), "union_s": round(un, 4),
                     "speedup": round(pv / un, 2)}
        print(name, out[name], flush=True)
    with open("/root/repo/scripts/union_decode_ab_r5.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

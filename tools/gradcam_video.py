#!/usr/bin/env python3
"""Grad-CAM visualization CLI (reference: wdf_visualization/gradcam_video.py).

Loads a config + checkpoint, runs Grad-CAM on a video at a target layer, and
writes one heatmap-overlay mp4 per pathway (optionally a GIF, the reference's
save_class_activation_images_as_gif output). ``--print-flops`` prints the
per-layer flop table (the reference's --print_flops via ptflops).

Example:
    python tools/gradcam_video.py --cfg configs/Kinetics/SLOWFAST_8x8_R50.yaml \
        --video clip.mp4 --target-layer s5 --gif \
        TEST.CHECKPOINT_FILE_PATH checkpoints/checkpoint_epoch_00196.pyth
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from efficient_slowfast_tpu.utils.env import honor_jax_platforms

honor_jax_platforms()

from efficient_slowfast_tpu.config.parser import load_config_from


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cfg", required=True, help="Path to config yaml.")
    ap.add_argument("--video", required=True, help="Video file to explain.")
    ap.add_argument("--target-layer", default="s5",
                    help="Slash-joined flax module path. Stage names per "
                         "family (reference README 'Visualize (Grad-CAM)'): "
                         "ResNet-SlowFast/CMDA expose s1..s5 + s{1..4}_fuse; "
                         "the efficient backbones (ShuffleNet/V2, GhostNet, "
                         "MobileNetV2) expose s1..s4 + s{1..3}_fuse — their "
                         "last stage is s4, so use --target-layer s4 there. "
                         "Deeper paths like s4/pathway1_res3 also work.")
    ap.add_argument("--target-class", type=int, default=None,
                    help="Class index to explain (default: the argmax).")
    ap.add_argument("--out-dir", default=None,
                    help="Output directory (default: cfg.OUTPUT_DIR).")
    ap.add_argument("--gif", action="store_true",
                    help="Also write a GIF per pathway.")
    ap.add_argument("--print-flops", action="store_true",
                    help="Print the per-layer flop table and exit.")
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=None,
                    help="KEY VALUE config override pairs.")
    args = ap.parse_args()

    cfg = load_config_from(args.cfg, args.opts)

    if args.print_flops:
        from efficient_slowfast_tpu.engine.state import pathway_inputs
        from efficient_slowfast_tpu.models import build_model
        from efficient_slowfast_tpu.utils.misc import flops_per_layer_table

        print(flops_per_layer_table(build_model(cfg), pathway_inputs(cfg, 1)))
        return

    from efficient_slowfast_tpu.visualization.video_cam import gradcam_video

    result = gradcam_video(cfg, args.video, args.target_layer,
                           target_class=args.target_class,
                           out_dir=args.out_dir, write_gif=args.gif)
    preds = result["predictions"][0]
    top = preds.argsort()[::-1][:5]
    labels = None
    if cfg.DEMO.LABEL_FILE_PATH:
        from efficient_slowfast_tpu.utils.misc import load_demo_labels

        labels = load_demo_labels(cfg.DEMO.LABEL_FILE_PATH)
    for k in top:
        name = labels[k] if labels and k < len(labels) else str(k)
        print(f"{name}: {preds[k]:.4f}")
    for p in result["outputs"]:
        print(p)


if __name__ == "__main__":
    main()

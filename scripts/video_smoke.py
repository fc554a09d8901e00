"""Real-TPU video production-loop smoke (VERDICT r4 #7): the full
image->video cross-over chain on the real chip —

  run_image (1 epoch, real style paintings)          -> epoch-1 checkpoint
  run_video (epochs 2-3, synthetic SceneFlow + real WikiArt styles,
             resumes off the IMAGE run's checkpoint filename)  -> orbax
  infer CLI consuming the video run's own epoch-3 snapshots     -> PNG

Synthetic SceneFlow fixtures: Monkaa + FlyingThings3D trees whose frames
are smooth moving gradients with a KNOWN constant flow (frame i+1 = frame
i shifted 2 px right => into_past flow u=+2), so the temporal losses see
physically consistent (img1, img2, flow, mask) tuples, not noise.  Styles
are the reference's real bundled paintings.

Run: python scripts/video_smoke.py [--out artifacts] [--tmp /tmp/video_smoke]
(~15-25 min: two training compiles on the tunneled chip dominate.)
"""

import argparse
import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_STYLES = "/root/reference/MHAdaSTr/styles"
REF_CONTENTS = "/root/reference/MHAdaSTr/contents"


def _gradient_frame(t, h, w):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # moving gradients; +2 px/frame horizontal motion (xx - 2t)
    img = np.stack(
        [
            127 + 120 * np.sin((xx - 2 * t) / 19.0),
            127 + 120 * np.sin((yy + 0.3 * (xx - 2 * t)) / 23.0),
            127 + 120 * np.sin((xx - 2 * t + yy) / 31.0),
        ],
        axis=-1,
    )
    return np.clip(img, 0, 255).astype(np.uint8)


def build_sceneflow_fixtures(root, h=128, w=256):
    """Monkaa (6 frames) + FlyingThings3D (10 frames) trees with consistent
    motion: into_past flow at frame i maps frame i pixels to frame i-1
    (u=-2 constant; every pixel valid except the 2-px inflow edge)."""
    from PIL import Image
    from mhada_tpu.data import flowlib

    def write_scene(frame_dir, flow_dir_of, mb_dir, n):
        os.makedirs(frame_dir, exist_ok=True)
        os.makedirs(mb_dir, exist_ok=True)
        for i in range(n):
            Image.fromarray(_gradient_frame(i, h, w)).save(
                os.path.join(frame_dir, f"{i:04d}.png"))
            for d in ("into_future", "into_past"):
                os.makedirs(flow_dir_of(d), exist_ok=True)
                flow3 = np.zeros((h, w, 3), np.float32)
                flow3[..., 0] = -2.0 if d == "into_past" else 2.0
                flowlib.write_pfm(
                    os.path.join(flow_dir_of(d), f"{i:04d}.pfm"), flow3)
            mb = np.zeros((h, w), np.uint8)  # no motion boundaries
            Image.fromarray(mb).save(os.path.join(mb_dir, f"{i:04d}.png"))

    mk = os.path.join(root, "monkaa")
    write_scene(
        os.path.join(mk, "frames_finalpass", "sceneA", "left"),
        lambda d: os.path.join(mk, "optical_flow", "sceneA", d, "left"),
        os.path.join(mk, "motion_boundaries", "sceneA", "into_future", "left"),
        6,
    )
    ft = os.path.join(root, "flyingthings3d")
    write_scene(
        os.path.join(ft, "frames_finalpass/TRAIN", "A", "0000", "left"),
        lambda d: os.path.join(ft, "optical_flow/TRAIN", "A", "0000", d, "left"),
        os.path.join(ft, "motion_boundaries/TRAIN", "A", "0000",
                     "into_future", "left"),
        10,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts")
    ap.add_argument("--tmp", default="/tmp/video_smoke")
    ap.add_argument("--image-steps", type=int, default=5)
    ap.add_argument("--video-steps", type=int, default=5)
    args = ap.parse_args()

    tmp = args.tmp
    shutil.rmtree(tmp, ignore_errors=True)
    data = os.path.join(tmp, "datasets")
    models = os.path.join(tmp, "models")
    os.makedirs(data, exist_ok=True)

    # real style paintings -> WikiArt/; fixtures -> SceneFlowDatasets/
    wikiart = os.path.join(data, "WikiArt", "bundled")
    os.makedirs(wikiart, exist_ok=True)
    for p in sorted(glob.glob(os.path.join(REF_STYLES, "*"))):
        os.symlink(p, os.path.join(wikiart, os.path.basename(p)))
    build_sceneflow_fixtures(os.path.join(data, "SceneFlowDatasets"))
    print(f"[smoke] fixtures at {data}", flush=True)

    # phase 1: one image epoch -> checkpoint_epoch_1_batchSize_8
    from mhada_tpu.train import run_image, run_video

    img_jsonl = os.path.join(tmp, "image_metrics.jsonl")
    run_image.main([
        "--coco", REF_CONTENTS, "--wikiart", REF_STYLES,
        "--models-dir", models, "--epochs", "1", "--batch-size", "8",
        "--dtype", "bfloat16", "--seed", "0", "--log-every", "1",
        "--steps-per-epoch", str(args.image_steps),
        "--metrics-jsonl", img_jsonl,
    ])
    assert os.path.exists(
        os.path.join(models, "checkpoint_epoch_1_batchSize_8")), \
        "image phase produced no epoch checkpoint"
    print("[smoke] image phase done", flush=True)

    # phase 2: video epochs 2-3, cross-over resume off the image checkpoint
    vid_jsonl = os.path.join(tmp, "video_metrics.jsonl")
    run_video.main([
        "--datasets", data, "--models-dir", models,
        "--epoch-start", "2", "--epochs", "3", "--batch-size", "2",
        "--image-batch-size", "8", "--dtype", "bfloat16", "--seed", "0",
        "--log-every", "1", "--steps-per-epoch", str(args.video_steps),
        "--metrics-jsonl", vid_jsonl,
    ])
    print("[smoke] video phase done", flush=True)

    # phase 3: infer CLI on the video run's own epoch-3 orbax snapshots
    from mhada_tpu.infer import image as infer_image

    suffix = "_epoch_3_batchSize_2"
    out_png = os.path.join(args.out, "video_smoke_epoch3.png")
    infer_image.main([
        "--content", os.path.join(REF_CONTENTS, sorted(
            os.listdir(REF_CONTENTS))[0]),
        "--style", os.path.join(REF_STYLES, sorted(
            os.listdir(REF_STYLES))[0]),
        "--ada", os.path.join(models, f"AdaFormer{suffix}"),
        "--vitc", os.path.join(models, f"ViT_C{suffix}"),
        "--vits", os.path.join(models, f"ViT_S{suffix}"),
        "--out", out_png, "--size", "256", "256",
    ])
    from PIL import Image

    arr = np.asarray(Image.open(out_png))
    assert arr.std() > 1.0, "degenerate (constant) inference output"
    print(f"[smoke] inference on video checkpoints -> {out_png} "
          f"(range [{arr.min()}, {arr.max()}])", flush=True)

    os.makedirs(args.out, exist_ok=True)
    shutil.copy(vid_jsonl, os.path.join(args.out, "video_smoke_metrics.jsonl"))
    losses = [json.loads(l)["loss"] for l in open(vid_jsonl)]
    print(f"[smoke] video losses: {losses[0]:.1f} -> {losses[-1]:.1f} "
          f"({len(losses)} logged steps)", flush=True)
    print("[smoke] OK", flush=True)


if __name__ == "__main__":
    main()

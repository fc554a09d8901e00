"""Smoke tests for infer drivers, exps harnesses, and analysis tools
(tiny shapes, CPU, random weights)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from mhada_tpu.config import ModelConfig
from mhada_tpu.train.train_image import build_models
from mhada_tpu.infer.image import init_inference_params

TINY = ModelConfig(hidden_dim=64, mlp_dim=128, num_heads=4)
RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def setup():
    models = build_models(TINY)
    params = init_inference_params(models, jax.random.PRNGKey(0))
    return models, params


def _img(path, hw=(80, 96)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(RNG.integers(0, 255, (*hw, 3), dtype=np.uint8)).save(path)
    return path


def test_infer_image_cli(tmp_path, setup):
    from mhada_tpu.infer import image as m

    c = _img(str(tmp_path / "c.jpg"))
    s = _img(str(tmp_path / "s.jpg"))
    out = str(tmp_path / "out.png")
    # drive main() with tiny size; random weights path
    m.main = m.main  # CLI main uses full-size models; call API instead
    models, params = setup
    res = m.stylize_image(
        params, models, np.float32(np.zeros((64, 64, 3))),
        np.float32(np.zeros((64, 64, 3))),
    )
    assert res.shape == (64, 64, 3)
    del c, s, out


def test_grid_driver(tmp_path, setup):
    from mhada_tpu.infer.image_all import run_grid

    models, params = setup
    cps = [_img(str(tmp_path / f"c{i}.jpg")) for i in range(2)]
    sps = [_img(str(tmp_path / f"s{i}.jpg")) for i in range(2)]
    run_grid(params, models, cps, sps, str(tmp_path / "out"), (64, 64))
    files = os.listdir(tmp_path / "out")
    assert sorted(files) == [
        "content_0_style_0.jpg", "content_0_style_1.jpg",
        "content_1_style_0.jpg", "content_1_style_1.jpg",
    ]


def test_video_driver(tmp_path, setup):
    import cv2

    models, params = setup
    vid = str(tmp_path / "in.mp4")
    frames = [RNG.integers(0, 255, (64, 96, 3), dtype=np.uint8)
              for _ in range(4)]
    vw = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 5, (96, 64))
    for f in frames:
        vw.write(f[:, :, ::-1])
    vw.release()

    from mhada_tpu.infer.video import stream_stylize

    style = RNG.uniform(0, 255, (64, 64, 3)).astype(np.float32)
    n = stream_stylize(
        params, models, vid, style, str(tmp_path / "out"), (64, 96),
        write_mp4=True,
    )
    assert n == 4
    assert os.path.exists(tmp_path / "out" / "video.mp4")
    assert os.path.exists(tmp_path / "out" / "frame_00003.jpg")


def test_exps_image_csv(tmp_path, setup):
    from mhada_tpu.evals.exps_image import MetricSuite, run, FIELDNAMES
    import csv

    models, params = setup
    for sub in ("contents", "styles"):
        for name in ("a.jpg", "b.jpg"):
            _img(str(tmp_path / sub / name))
    pairs = [("contents/a.jpg", "styles/a.jpg"),
             ("contents/b.jpg", "styles/b.jpg")]
    rows = run(
        params, models, MetricSuite(), str(tmp_path), str(tmp_path / "res"),
        pairs=pairs, image_size=(64, 64),
    )
    assert len(rows) == 2
    with open(tmp_path / "res" / "results.csv") as f:
        rd = list(csv.DictReader(f))
    assert list(rd[0].keys()) == FIELDNAMES
    assert rd[-1]["content"] == "average"
    assert float(rd[0]["entropy"]) > 0


def test_exps_video_metrics(setup):
    from mhada_tpu.evals.exps_video import evaluate_clip

    models, params = setup
    frames = [RNG.uniform(0, 255, (32, 48, 3)).astype(np.float32)
              for _ in range(3)]
    pairs = list(zip(frames[:-1], frames[1:]))

    def stylize_pair(c1, c2):
        return c1 * 0.5, c2 * 0.5

    def flow_fn(a, b):
        return np.zeros((32, 48, 2), np.float32)

    out = evaluate_clip(pairs, stylize_pair, flow_fn)
    assert out["frames"] == 2
    assert out["warping_error"] > 0
    assert out["flow_mse"] == 0.0


def test_exps_sintel(tmp_path, setup):
    from mhada_tpu.evals.exps_sintel import run
    from mhada_tpu.data import flowlib

    models, params = setup
    scene = tmp_path / "MPI/training/final/alley_2"
    for i in range(3):
        _img(str(scene / f"frame_{i:04d}.png"), hw=(32, 48))
    fdir = tmp_path / "flows"
    os.makedirs(fdir)
    for i in range(2):
        for d in ("fwd", "bwd"):
            flowlib.write_flow(str(fdir / f"alley_2_{i:04d}_{d}.flo"),
                               np.zeros((32, 64, 2), np.float32))
    style = RNG.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    res = run(
        params, models, style, str(tmp_path / "MPI"), scenes=["alley_2"],
        image_size=(32, 64), flow_dir=str(fdir),
        results_csv=str(tmp_path / "sintel.csv"),
    )
    assert "alley_2" in res and np.isfinite(res["alley_2"])
    assert os.path.exists(tmp_path / "sintel.csv")


def test_counts(setup):
    from mhada_tpu.analysis import count_params, count_params_mb, count_flops

    models, params = setup
    n = count_params(params["adaFormer"])
    assert n > 0
    assert count_params_mb(params["adaFormer"]) == pytest.approx(
        n * 4 / 1024**2
    )
    x = jnp.zeros((1, 32, 32, 3))
    fl = count_flops(
        lambda x: models["vit_c"].apply({"params": params["vit_c"]}, x), x
    )
    assert fl["gflops"] > 0


def test_visual_inversion(setup):
    from mhada_tpu.analysis import invert_vit_features, normalize_per_channel

    models, params = setup
    target = jnp.asarray(RNG.uniform(0, 255, (1, 32, 32, 3)), jnp.float32)
    apply = lambda x: models["vit_c"].apply({"params": params["vit_c"]}, x)
    img = invert_vit_features(apply, target, iters=5, lr=0.5)
    assert img.shape == target.shape
    u8 = normalize_per_channel(img[0])
    assert u8.dtype == np.uint8


def test_inversion_build_is_differentiable():
    """Regression (ADVICE r2): feature inversion takes jax.grad through the
    encoders, so the visualize driver must use the training build — the
    inference build's token-major attention kernel (engaged on TPU for
    512<=L<=4096) is forward-only and fails under reverse-mode autodiff."""
    import inspect

    from mhada_tpu.analysis import visualize
    from mhada_tpu.train.train_image import build_models as bm

    src = inspect.getsource(visualize.main)
    assert "for_training=True" in src

    # the training build must route attention through VJP-capable paths
    m = bm(ModelConfig(mhada_backend="pallas"), for_training=True)
    assert not m["vit_c"].tokmaj and not m["vit_s"].tokmaj
    assert not m["adaFormer"].fuse_prologue

    # ...and grad actually flows through that exact build
    x = jnp.asarray(RNG.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        params = m["vit_c"].init(jax.random.PRNGKey(0), x)["params"]

        def loss(img):
            feats = m["vit_c"].apply({"params": params}, img)
            return sum(jnp.mean(jnp.square(f)) for f in feats)

        g = jax.grad(loss)(x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_progressive_lbfgs_reconstruction():
    """visual_cnn parity: LBFGS progressive reconstruction converges (loss
    drops substantially within a few quasi-Newton steps) and yields the 5
    relu-prefix images in [0, 1]."""
    import jax

    from mhada_tpu.analysis import progressive_vgg_reconstruction
    from mhada_tpu.models import VGG19Features

    model = VGG19Features()
    vgg_params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 16, 16, 3)))["params"]
    apply01 = lambda x: model.apply({"params": vgg_params}, x * 255.0)
    target = jnp.asarray(RNG.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
    results = list(progressive_vgg_reconstruction(apply01, target, iters=12))
    assert [name for name, _, _ in results] == [
        "relu1_1",
        "relu1_1_relu2_1",
        "relu1_1_relu2_1_relu3_1",
        "relu1_1_relu2_1_relu3_1_relu4_1",
        "relu1_1_relu2_1_relu3_1_relu4_1_relu5_1",
    ]
    for name, img, losses in results:
        assert img.shape == target.shape
        assert img.min() >= 0.0 and img.max() <= 1.0
        assert losses[-1] < losses[0] * 0.5, (name, losses[0], losses[-1])


def test_hist_plot(tmp_path):
    from mhada_tpu.analysis import plot_bgr_histograms

    paths = [_img(str(tmp_path / f"h{i}.png")) for i in range(2)]
    out = plot_bgr_histograms(paths, str(tmp_path / "hist.png"))
    assert os.path.exists(out)


def test_video_driver_chunked(tmp_path, setup):
    """chunk>1 must produce identical frames to chunk=1."""
    import cv2

    models, params = setup
    vid = str(tmp_path / "in2.mp4")
    frames = [RNG.integers(0, 255, (64, 96, 3), dtype=np.uint8)
              for _ in range(5)]
    vw = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 5, (96, 64))
    for f in frames:
        vw.write(f[:, :, ::-1])
    vw.release()

    from mhada_tpu.infer.video import stream_stylize

    style = RNG.uniform(0, 255, (64, 64, 3)).astype(np.float32)
    n1 = stream_stylize(params, models, vid, style, str(tmp_path / "o1"),
                        (64, 96), write_mp4=False, chunk=1)
    n2 = stream_stylize(params, models, vid, style, str(tmp_path / "o2"),
                        (64, 96), write_mp4=False, chunk=2)
    assert n1 == n2 == 5
    import imageio

    for i in range(5):
        a = imageio.imread(tmp_path / "o1" / f"frame_{i:05d}.jpg")
        b = imageio.imread(tmp_path / "o2" / f"frame_{i:05d}.jpg")
        np.testing.assert_array_equal(a, b)


def test_exps_image_all_csv(tmp_path, setup):
    import csv

    from mhada_tpu.evals.exps_image import MetricSuite
    from mhada_tpu.evals.exps_image_all import run, FIELDNAMES

    models, params = setup
    cps = [_img(str(tmp_path / f"c{i}.jpg")) for i in range(2)]
    sps = [_img(str(tmp_path / f"s{i}.jpg")) for i in range(2)]
    rows = run(params, models, MetricSuite(), cps, sps,
               str(tmp_path / "res"), (64, 64))
    assert len(rows) == 5  # 2x2 grid + average
    with open(tmp_path / "res" / "results_all.csv") as f:
        rd = list(csv.DictReader(f))
    assert list(rd[0].keys()) == FIELDNAMES
    assert rd[-1]["content"] == "average"
    assert os.path.exists(tmp_path / "res" / "content_1_style_1.jpg")


def test_reference_gate_smoke():
    """scripts/reference_gate.py --smoke: seeded weights round-trip through
    .pth export -> the gate's own import path, pixel-bound asserted — keeps
    the standing acceptance command (BASELINE.md) runnable."""
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import reference_gate

    reference_gate.main(["--smoke", "--smoke-size", "64"])

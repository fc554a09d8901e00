"""Data layer: flow-file I/O roundtrips, host-side flow math parity with the
device ops, loaders and dataset walkers over synthetic trees."""

import os

import numpy as np
import pytest
import jax.numpy as jnp
from PIL import Image

from mhada_tpu.data import flowlib
from mhada_tpu.data.flow_np import (
    warp_np,
    flow_warp_mask_np,
    resize_flow_np,
    resize_bilinear_np,
)
from mhada_tpu import ops

RNG = np.random.default_rng(0)


def test_flo_roundtrip(tmp_path):
    flow = RNG.standard_normal((12, 20, 2)).astype(np.float32)
    p = str(tmp_path / "a.flo")
    flowlib.write_flow(p, flow)
    got = flowlib.read_flow(p)
    np.testing.assert_array_equal(got, flow)
    assert flowlib.read(p).shape == (12, 20, 2)


def test_pfm_roundtrip(tmp_path):
    img = RNG.standard_normal((8, 10, 3)).astype(np.float32)
    p = str(tmp_path / "a.pfm")
    flowlib.write_pfm(p, img)
    got, scale = flowlib.read_pfm(p)
    np.testing.assert_array_equal(got, img)
    assert scale == 1.0
    # flow read takes first two channels
    np.testing.assert_array_equal(flowlib.read_flow(p), img[:, :, :2])


def test_pfm_gray_roundtrip(tmp_path):
    img = RNG.standard_normal((8, 10)).astype(np.float32)
    p = str(tmp_path / "g.pfm")
    flowlib.write_pfm(p, img)
    got, _ = flowlib.read_pfm(p)
    np.testing.assert_array_equal(got, img)


def test_float3_roundtrip(tmp_path):
    data = RNG.standard_normal((6, 8, 3)).astype(np.float32)
    p = str(tmp_path / "a.float3")
    flowlib.write_float(p, data)
    np.testing.assert_array_equal(flowlib.read_float(p), data)


def test_warp_np_matches_device_op():
    x = RNG.standard_normal((10, 14, 3)).astype(np.float32)
    flow = (RNG.standard_normal((10, 14, 2)) * 2).astype(np.float32)
    ref = np.asarray(ops.warp(jnp.asarray(x)[None], jnp.asarray(flow)[None]))[0]
    got = warp_np(x, flow)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_flow_warp_mask_np_matches_device_op():
    f01 = (RNG.standard_normal((10, 14, 2)) * 2).astype(np.float32)
    f10 = (RNG.standard_normal((10, 14, 2)) * 2).astype(np.float32)
    ref = np.asarray(ops.flow_warp_mask(jnp.asarray(f01), jnp.asarray(f10)))
    got = flow_warp_mask_np(f01, f10)
    np.testing.assert_array_equal(got, ref)


def test_resize_bilinear_np_matches_device_op():
    x = RNG.standard_normal((9, 11, 4)).astype(np.float32)
    ref = np.asarray(ops.resize_bilinear(jnp.asarray(x), (16, 20)))
    got = resize_bilinear_np(x, (16, 20))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_resize_flow_vector_rescaling():
    flow = np.ones((8, 8, 2), np.float32)
    out = resize_flow_np(flow, (16, 24))
    np.testing.assert_allclose(out[..., 0], 3.0, atol=1e-5)  # W ratio 24/8
    np.testing.assert_allclose(out[..., 1], 2.0, atol=1e-5)  # H ratio 16/8


def _write_img(path, hw=(64, 96)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = RNG.integers(0, 255, (*hw, 3), dtype=np.uint8)
    Image.fromarray(arr).save(path)


def test_coco_wikiart_dataset(tmp_path):
    from mhada_tpu.data import CocoWikiArt

    for i in range(3):
        _write_img(str(tmp_path / f"coco/cls/{i}.jpg"))
    for i in range(2):
        _write_img(str(tmp_path / f"WikiArt/cls/{i}.jpg"))
    ds = CocoWikiArt(
        (32, 32), str(tmp_path / "coco"), str(tmp_path / "WikiArt"), seed=0
    )
    assert len(ds) == 3
    c, s = ds[0]
    assert c.shape == (32, 32, 3) and s.shape == (32, 32, 3)
    assert c.dtype == np.float32 and c.max() > 1.0  # 0-255 domain


def test_dataloader_batches(tmp_path):
    from mhada_tpu.data import CocoWikiArt, DataLoader

    for i in range(10):
        _write_img(str(tmp_path / f"coco/c/{i}.jpg"))
    _write_img(str(tmp_path / "WikiArt/c/0.jpg"))
    ds = CocoWikiArt((32, 32), str(tmp_path / "coco"),
                     str(tmp_path / "WikiArt"), seed=0)
    dl = DataLoader(ds, batch_size=4, num_workers=2, seed=0)
    batches = list(dl)
    assert len(batches) == 2  # drop_last
    c, s = batches[0]
    assert c.shape == (4, 32, 32, 3) and s.shape == (4, 32, 32, 3)


def _make_sceneflow_tree(root, kind="monkaa", n_frames=4):
    """Minimal Monkaa/FlyingThings3D layout with pfm flows + motion pgm."""
    if kind == "monkaa":
        scenes = [("sceneA",)]
        frame_dir = lambda s: os.path.join(root, "frames_finalpass", s[0], "left")
        flow_dir = lambda s, d: os.path.join(root, "optical_flow", s[0], d, "left")
        mb_dir = lambda s: os.path.join(
            root, "motion_boundaries", s[0], "into_future", "left"
        )
    else:
        scenes = [("A", "0000")]
        frame_dir = lambda s: os.path.join(
            root, "frames_finalpass/TRAIN", s[0], s[1], "left"
        )
        flow_dir = lambda s, d: os.path.join(
            root, "optical_flow/TRAIN", s[0], s[1], d, "left"
        )
        mb_dir = lambda s: os.path.join(
            root, "motion_boundaries/TRAIN", s[0], s[1], "into_future", "left"
        )
        n_frames = 10  # FlyingThings3D assumes 10-frame scenes

    for s in scenes:
        for i in range(n_frames):
            _write_img(os.path.join(frame_dir(s), f"{i:04d}.png"), hw=(32, 48))
            for d in ("into_future", "into_past"):
                os.makedirs(flow_dir(s, d), exist_ok=True)
                flow3 = np.zeros((32, 48, 3), np.float32)
                flow3[..., 0] = 1.0
                flowlib.write_pfm(
                    os.path.join(flow_dir(s, d), f"{i:04d}.pfm"), flow3
                )
            os.makedirs(mb_dir(s), exist_ok=True)
            mb = np.zeros((32, 48), np.uint8)
            Image.fromarray(mb).save(os.path.join(mb_dir(s), f"{i:04d}.png"))


def test_monkaa_dataset(tmp_path):
    from mhada_tpu.data import Monkaa

    _make_sceneflow_tree(str(tmp_path), "monkaa")
    ds = Monkaa(str(tmp_path), resolution=(64, 32))
    assert len(ds) == 3
    img1, img2, flow, mask = ds[0]
    assert img1.shape == (32, 64, 3) and img2.shape == (32, 64, 3)
    assert flow.shape == (32, 64, 2)
    # flow vectors rescaled by W ratio 64/48
    np.testing.assert_allclose(flow[..., 0], 64 / 48, rtol=1e-5)
    assert mask.shape == (32, 64)
    assert set(np.unique(mask)).issubset({0.0, 1.0})


def test_flyingthings3d_dataset(tmp_path):
    from mhada_tpu.data import FlyingThings3D

    _make_sceneflow_tree(str(tmp_path), "ft3d")
    ds = FlyingThings3D(str(tmp_path), resolution=(64, 32))
    assert len(ds) == 9
    img1, img2, flow, mask = ds[0]
    assert img1.shape == (32, 64, 3)


def test_sintel_with_precomputed_flows(tmp_path):
    from mhada_tpu.data import Sintel

    scene_dir = tmp_path / "MPI/training/final/alley_1"
    for i in range(3):
        _write_img(str(scene_dir / f"frame_{i:04d}.png"), hw=(32, 48))
    flow_dir = tmp_path / "flows"
    os.makedirs(flow_dir)
    for i in range(2):
        for d in ("fwd", "bwd"):
            flowlib.write_flow(
                str(flow_dir / f"alley_1_{i:04d}_{d}.flo"),
                np.zeros((32, 64, 2), np.float32),
            )
    ds = Sintel((32, 64), str(tmp_path / "MPI"), scene="alley_1",
                flow_dir=str(flow_dir))
    assert len(ds) == 2
    img1, img2, flow, mask = ds[0]
    assert img1.shape == (32, 64, 3)
    # Interior is fully consistent for zero flow; borders are invalid due to
    # the reference warp's normalise/unnormalise edge quirk (utilities.py:
    # 111-117), which we reproduce faithfully.
    np.testing.assert_array_equal(mask[2:-2, 2:-2], 1.0)


def test_sintel_without_flow_raises(tmp_path):
    from mhada_tpu.data import Sintel

    scene_dir = tmp_path / "MPI/training/final/alley_1"
    for i in range(2):
        _write_img(str(scene_dir / f"frame_{i:04d}.png"), hw=(32, 48))
    ds = Sintel((32, 64), str(tmp_path / "MPI"), scene="alley_1")
    with pytest.raises(RuntimeError, match="flow"):
        ds[0]

"""Native C IO library vs the numpy reference implementations."""

import numpy as np
import pytest

from mhada_tpu.data import flowlib, native
from mhada_tpu.data.flow_np import flow_warp_mask_np, resize_flow_np

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)

RNG = np.random.default_rng(0)


def test_native_flo_read(tmp_path):
    flow = RNG.standard_normal((20, 30, 2)).astype(np.float32)
    p = str(tmp_path / "x.flo")
    flowlib.write_flow(p, flow)
    np.testing.assert_array_equal(native.read_flo(p), flow)


def test_native_pfm_read_le(tmp_path):
    img = RNG.standard_normal((16, 12, 3)).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    flowlib.write_pfm(p, img)
    got, scale = native.read_pfm(p)
    np.testing.assert_array_equal(got, img)
    assert scale == 1.0


def test_native_pfm_read_gray(tmp_path):
    img = RNG.standard_normal((8, 10)).astype(np.float32)
    p = str(tmp_path / "g.pfm")
    flowlib.write_pfm(p, img)
    got, _ = native.read_pfm(p)
    np.testing.assert_array_equal(got, img)


def test_native_resize_flow_matches_numpy():
    flow = (RNG.standard_normal((24, 32, 2)) * 5).astype(np.float32)
    ref = resize_flow_np(flow, (16, 48))
    got = native.resize_flow(flow, (16, 48))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_native_mask_matches_numpy():
    f01 = (RNG.standard_normal((20, 28, 2)) * 2).astype(np.float32)
    f10 = (RNG.standard_normal((20, 28, 2)) * 2).astype(np.float32)
    ref = flow_warp_mask_np(f01, f10)
    got = native.flow_warp_mask(f01, f10)
    # bilinear rounding can flip pixels sitting exactly at the threshold
    assert np.mean(got != ref) < 0.01

"""SceneFlow video-training datasets (reference datasets.py:129-390).

FlyingThings3D / Monkaa: consecutive left-view frame pairs with ground-truth
forward/backward flow (.pfm/.flo), flow rescaled to the working resolution
with vector rescaling, and validity mask = flow-consistency mask x inverted
motion-boundary mask.  All host-side numpy; returns float32 HWC tuples
``(img1, img2, flow_into_past, mask)``.
"""

import os
import random
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np
from PIL import Image

from . import flowlib
from . import native
from .flow_np import flow_warp_mask_np, resize_flow_np
from .image_folder import ImageFolder
from ..utils.image_io import list_files


def _read_flow(path: str) -> np.ndarray:
    """Flow read via the native C library when available (data/native.py)."""
    if native.available():
        if path.endswith((".flo", ".FLO")):
            return native.read_flo(path)
        if path.endswith((".pfm", ".PFM")):
            return native.read_pfm(path)[0][:, :, :2]
    return flowlib.read_flow(path)


def _resize_flow(flow: np.ndarray, out_hw) -> np.ndarray:
    out = native.resize_flow(flow, out_hw) if native.available() else None
    return out if out is not None else resize_flow_np(flow, out_hw)


def _consistency_mask(f01: np.ndarray, f10: np.ndarray) -> np.ndarray:
    out = native.flow_warp_mask(f01, f10) if native.available() else None
    return out if out is not None else flow_warp_mask_np(f01, f10)


def _load_frame(path: str, resolution_wh: Tuple[int, int]) -> np.ndarray:
    with Image.open(path) as img:
        img = img.convert("RGB").resize(resolution_wh, Image.BILINEAR)
        return np.asarray(img, dtype=np.float32)


def _load_motion_mask(path: str, resolution_wh: Tuple[int, int]) -> np.ndarray:
    """Motion boundaries -> inverted binary mask (datasets.py:224-227)."""
    with Image.open(path) as img:
        img = img.resize(resolution_wh, Image.BILINEAR)
        arr = np.asarray(img)
    if arr.ndim == 3:
        arr = arr[..., 0]
    return (arr == 0).astype(np.float32)


class _SceneFlowBase:
    """Shared __getitem__ given per-sample (frames, (flow_fwd, flow_bwd),
    motion) path tuples."""

    frame: List[Sequence[str]]
    flow: List[Tuple[str, str]]
    motion: List[str]
    resolution: Tuple[int, int]  # (W, H)
    frame_num: int

    def __len__(self):
        return len(self.frame)

    def __getitem__(self, idx: int):
        res = self.resolution
        imgs = [_load_frame(p, res) for p in self.frame[idx]]
        img1 = np.concatenate(imgs[: self.frame_num], axis=-1)
        img2 = np.concatenate(imgs[1 : self.frame_num + 1], axis=-1)

        out_hw = (res[1], res[0])
        flow_fwd = _resize_flow(_read_flow(self.flow[idx][0]), out_hw)
        flow_bwd = _resize_flow(_read_flow(self.flow[idx][1]), out_hw)

        motion = _load_motion_mask(self.motion[idx], res)
        mask = _consistency_mask(flow_fwd, flow_bwd) * motion
        return img1, img2, flow_bwd, mask


class FlyingThings3D(_SceneFlowBase):
    """frames_finalpass/TRAIN/{A,B,C} scenes (reference datasets.py:129-233).

    Flow pairing per sample i (datasets.py:169): forward flow of the first
    frame (into_future[i+frame_num-1]) and backward flow of the second
    (into_past[i+frame_num]).
    """

    def __init__(self, path: str, resolution: Tuple[int, int] = (512, 256),
                 frame_num: int = 1):
        assert 1 <= frame_num <= 9
        self.resolution = resolution
        self.frame_num = frame_num
        self.frame, self.flow, self.motion = [], [], []

        pf = os.path.join(path, "frames_finalpass/TRAIN")
        pfl = os.path.join(path, "optical_flow/TRAIN")
        pm = os.path.join(path, "motion_boundaries/TRAIN")
        for sub in ("A", "B", "C"):
            if not os.path.isdir(os.path.join(pf, sub)):
                continue  # tolerate partial downloads (reference assumes all)
            for scene in sorted(os.listdir(os.path.join(pf, sub))):
                files = list_files(os.path.join(pf, sub, scene, "left"))
                ff = list_files(os.path.join(pfl, sub, scene, "into_future", "left"))
                fp = list_files(os.path.join(pfl, sub, scene, "into_past", "left"))
                fm = list_files(os.path.join(pm, sub, scene, "into_future", "left"))
                for i in range(10 - frame_num):
                    self.frame.append(files[i : i + frame_num + 1])
                    self.flow.append((ff[i + frame_num - 1], fp[i + frame_num]))
                    self.motion.append(fm[i + frame_num])


class Monkaa(_SceneFlowBase):
    """Monkaa subset (reference datasets.py:236-340)."""

    def __init__(self, path: str, resolution: Tuple[int, int] = (512, 256),
                 frame_num: int = 1):
        assert 1 <= frame_num <= 9
        self.resolution = resolution
        self.frame_num = frame_num
        self.frame, self.flow, self.motion = [], [], []

        pf = os.path.join(path, "frames_finalpass")
        pfl = os.path.join(path, "optical_flow")
        pm = os.path.join(path, "motion_boundaries")
        for scene in sorted(os.listdir(pf)):
            files = list_files(os.path.join(pf, scene, "left"))
            ff = list_files(os.path.join(pfl, scene, "into_future", "left"))
            fp = list_files(os.path.join(pfl, scene, "into_past", "left"))
            fm = list_files(os.path.join(pm, scene, "into_future", "left"))
            for i in range(len(files) - frame_num):
                self.frame.append(files[i : i + frame_num + 1])
                self.flow.append((ff[i + frame_num - 1], fp[i + frame_num]))
                self.motion.append(fm[i + frame_num])


class FlyingThings3DMonkaa:
    """Concatenation wrapper (reference datasets.py:343-370)."""

    def __init__(self, path: Union[str, list],
                 resolution: Tuple[int, int] = (512, 256), frame_num: int = 1):
        if isinstance(path, str):
            self.monkaa = Monkaa(os.path.join(path, "monkaa"), resolution, frame_num)
            self.ft3d = FlyingThings3D(
                os.path.join(path, "flyingthings3d"), resolution, frame_num
            )
        else:
            self.monkaa = Monkaa(path[0], resolution, frame_num)
            self.ft3d = FlyingThings3D(path[1], resolution, frame_num)

    def __len__(self):
        return len(self.monkaa) + len(self.ft3d)

    def __getitem__(self, idx: int):
        if idx < len(self.monkaa):
            return self.monkaa[idx]
        return self.ft3d[idx - len(self.monkaa)]


class FlyingThings3DMonkaaWikiArt:
    """Video-training dataset: random WikiArt style + SceneFlow tuple
    (reference datasets.py:373-390)."""

    def __init__(
        self,
        image_size1: Tuple[int, int] = (256, 256),
        image_size2: Tuple[int, int] = (256, 512),
        path: str = "../datasets",
        seed: Optional[int] = None,
    ):
        rng = random.Random(seed) if seed is not None else None
        self.wikiart = ImageFolder(
            os.path.join(path, "WikiArt"), (512, 512), image_size1, rng
        )
        self.sceneflow = FlyingThings3DMonkaa(
            os.path.join(path, "SceneFlowDatasets"),
            resolution=(image_size2[1], image_size2[0]),
        )
        self._rng = rng or random

    def __len__(self):
        return len(self.sceneflow)

    def __getitem__(self, idx: int):
        style = self.wikiart[self._rng.randint(0, len(self.wikiart) - 1)]
        return (style, *self.sceneflow[idx])

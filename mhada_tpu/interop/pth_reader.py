"""Torch-free PyTorch ``.pth`` checkpoint reader.

Reads the modern zipfile serialisation format (torch >= 1.6) without importing
torch: ``data.pkl`` is unpickled with a restricted unpickler whose
``persistent_load`` resolves storage records to raw byte files inside the
archive, and ``_rebuild_tensor_v2`` is emulated with numpy strided views.
Falls back to ``torch.load`` for legacy formats when torch is importable.

Needed so TPU hosts can ingest reference checkpoints
(``*_epoch_{E}_batchSize_{B}.pth``, reference train_image.py:167-186) and
torchvision backbone weights without a torch dependency.
"""

import io
import pickle
import zipfile
from typing import Any, Dict

import numpy as np

_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": None,  # handled specially
}


class _StorageStub:
    def __init__(self, dtype_name: str, data: bytes):
        self.dtype_name = dtype_name
        self.data = data

    def to_numpy(self) -> np.ndarray:
        if self.dtype_name == "BFloat16Storage":
            raw = np.frombuffer(self.data, dtype=np.uint16)
            return (raw.astype(np.uint32) << 16).view(np.float32)
        dt = _DTYPES[self.dtype_name]
        return np.frombuffer(self.data, dtype=dt)


def _rebuild_tensor_v2(storage, storage_offset, size, stride, *_args):
    arr = storage.to_numpy()
    if len(size) == 0:
        return arr[storage_offset].copy()
    itemsize = arr.itemsize
    return np.lib.stride_tricks.as_strided(
        arr[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * itemsize for s in stride),
    ).copy()


class _ODict(dict):
    """OrderedDict stand-in tolerating pickle BUILD state (state_dicts carry
    a ``_metadata`` attribute we don't need)."""

    def __setstate__(self, state):
        pass


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self._zf = zf
        self._prefix = prefix

    def persistent_load(self, pid):
        kind, storage_type, key, _location, _numel = pid
        assert kind == "storage"
        name = storage_type if isinstance(storage_type, str) else storage_type.__name__
        data = self._zf.read(f"{self._prefix}/data/{key}")
        return _StorageStub(name, data)

    def find_class(self, module: str, name: str):
        if name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if name == "_rebuild_parameter":
            return lambda data, *a: data
        if module == "collections" and name == "OrderedDict":
            return _ODict
        if name.endswith("Storage"):
            return name  # dtype tag for persistent_load
        if module == "torch" and name in ("float32", "float64", "float16",
                                          "int64", "int32", "uint8", "bool"):
            return getattr(np, name if name != "bool" else "bool_")
        raise pickle.UnpicklingError(
            f"blocked class during .pth load: {module}.{name}"
        )


def _to_plain(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {k: _to_plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_plain(v) for v in obj)
    return obj


def load_pth(path: str) -> Dict[str, Any]:
    """Load a .pth file into (possibly nested) dicts of numpy arrays."""
    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as zf:
            pkl_names = [n for n in zf.namelist() if n.endswith("/data.pkl")]
            if not pkl_names:
                raise ValueError(f"no data.pkl inside {path}")
            prefix = pkl_names[0][: -len("/data.pkl")]
            with zf.open(pkl_names[0]) as f:
                data = f.read()
            obj = _Unpickler(io.BytesIO(data), zf, prefix).load()
            return _to_plain(obj)
    # Legacy (pre-1.6 tar / pickle) format: delegate to torch if present.
    try:
        import torch  # noqa: F401
    except ImportError as e:
        raise ValueError(
            f"{path} is a legacy torch checkpoint; torch is required to read it"
        ) from e
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)

    def conv(o):
        if isinstance(o, torch.Tensor):
            return o.numpy()
        if isinstance(o, dict):
            return {k: conv(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return type(o)(conv(v) for v in o)
        return o

    return conv(obj)

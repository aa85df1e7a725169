"""Torch-free ``.pth`` state_dict reader.

The reference's perceptual losses are *defined* by torchvision-pretrained
weights (``vgg19_feature_model.py:9-24``) and the ``lpips`` package's
checkpoints, both shipped as torch ``.pth`` files. A torch ``.pth`` saved with
the (default since torch 1.6) zip serialization is just a zip archive holding
one pickle (``data.pkl``) whose tensors are persistent-ID references into raw
little-endian storage files (``data/<key>``). This module unpickles that
format directly into numpy arrays — no ``import torch`` — so pretrained
weights load in torch-less deployments (e.g. a TPU pod image without the CPU
torch wheel).

When torch *is* importable we still prefer this reader (identical output,
exercised by tests either way); ``load_state_dict`` only falls back to
``torch.load`` for legacy non-zip files.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any, Dict

import numpy as np

# torch storage class name -> numpy dtype (bfloat16 handled via ml_dtypes).
_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _StorageRef:
    """A lazily-read storage: (dtype, raw bytes)."""

    def __init__(self, dtype, data: bytes):
        self.dtype = dtype
        self.data = data


def _rebuild_tensor_v2(storage: _StorageRef, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None):
    if storage.dtype == "bfloat16":
        raw = np.frombuffer(storage.data, dtype=np.uint16)
        # bf16 -> f32: the 16 stored bits are the high half of the float32.
        flat = (raw.astype(np.uint32) << 16).view(np.float32)
    else:
        flat = np.frombuffer(storage.data, dtype=storage.dtype)
    if not size:
        return flat[storage_offset].copy()
    itemsize = flat.dtype.itemsize
    arr = np.lib.stride_tricks.as_strided(
        flat[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * itemsize for s in stride),
    )
    return np.ascontiguousarray(arr)


def _rebuild_parameter(tensor, requires_grad=False, backward_hooks=None):
    return tensor


class _ODict(dict):
    """collections.OrderedDict stand-in.

    A dict subclass (rather than dict itself) so pickle BUILD can attach the
    ``_metadata`` attribute torch stores on every ``model.state_dict()`` —
    real torchvision ``.pth`` files carry it."""


class _TorchUnpickler(pickle.Unpickler):
    """Unpickler that resolves torch rebuild fns / storage classes locally."""

    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self._zf = zf
        self._prefix = prefix

    def find_class(self, module: str, name: str):
        if name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if name == "_rebuild_parameter":
            return _rebuild_parameter
        if module == "torch" and name in _STORAGE_DTYPES:
            return _STORAGE_DTYPES[name]
        if module == "torch" and name == "BFloat16Storage":
            return "bfloat16"
        if module == "torch.serialization" and name == "_get_layout":
            return lambda *a: None
        if (module, name) == ("collections", "OrderedDict"):
            return _ODict
        if module == "torch" and name in ("float32", "float64", "float16",
                                          "bfloat16", "int64", "int32",
                                          "uint8", "int8", "bool"):
            return name
        raise pickle.UnpicklingError(
            f"torch_weights: refusing to unpickle {module}.{name} "
            "(only tensor/state_dict payloads are supported)")

    def persistent_load(self, pid):
        kind, storage_type, key, _location, _numel = pid
        assert kind == "storage", f"unknown persistent id {pid!r}"
        data = self._zf.read(f"{self._prefix}data/{key}")
        return _StorageRef(storage_type, data)


def load_state_dict(path: str) -> Dict[str, Any]:
    """Read a torch ``.pth``/``.pt`` file into ``{name: np.ndarray}``.

    Handles the zip serialization format without torch; legacy pickle files
    fall back to ``torch.load`` when torch is importable.
    """
    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as zf:
            pkl_name = next(n for n in zf.namelist() if n.endswith("data.pkl"))
            prefix = pkl_name[: -len("data.pkl")]
            with zf.open(pkl_name) as f:
                obj = _TorchUnpickler(io.BytesIO(f.read()), zf, prefix).load()
    else:
        import torch  # legacy (pre-1.6) serialization only

        obj = torch.load(path, map_location="cpu", weights_only=True)
        obj = {k: np.asarray(v) for k, v in obj.items()}
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return obj

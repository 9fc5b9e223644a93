"""ctypes bindings for the native data runtime (loader.cpp).

Drop-in native counterparts of PointCloudDataset / BatchIterator with a
background prefetch thread. ``is_available()`` gates usage; the Python
pipeline is the fallback when the shared library hasn't been built
(``make native``). The library is also auto-built on first import when a
compiler is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_THIS_DIR, "libsugloader.so")
_LIB = None


def _build() -> bool:
    srcs = [
        os.path.join(_THIS_DIR, "loader.cpp"),
        os.path.join(_THIS_DIR, "pointops.cpp"),
    ]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        *srcs, "-o", _SO_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.sug_dataset_load.restype = ctypes.c_void_p
    lib.sug_dataset_load.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_uint,
    ]
    lib.sug_dataset_from_arrays.restype = ctypes.c_void_p
    lib.sug_dataset_from_arrays.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
    ]
    lib.sug_dataset_size.restype = ctypes.c_int64
    lib.sug_dataset_size.argtypes = [ctypes.c_void_p]
    lib.sug_dataset_num_points.restype = ctypes.c_int
    lib.sug_dataset_num_points.argtypes = [ctypes.c_void_p]
    lib.sug_dataset_class_counts.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.sug_dataset_get_all.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.sug_dataset_destroy.argtypes = [ctypes.c_void_p]
    lib.sug_iter_create.restype = ctypes.c_void_p
    lib.sug_iter_create.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_uint,
    ]
    lib.sug_iter_num_batches.restype = ctypes.c_int
    lib.sug_iter_num_batches.argtypes = [ctypes.c_void_p]
    lib.sug_iter_next.restype = ctypes.c_int
    lib.sug_iter_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.sug_iter_reset.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.sug_iter_destroy.argtypes = [ctypes.c_void_p]
    # point ops (pointops.cpp) — absent from .so files built before round 3
    try:
        lib.sug_fps.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.sug_icp_fitness.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_float, ctypes.c_void_p,
        ]
        lib._has_pointops = True
    except AttributeError:
        lib._has_pointops = False
    _LIB = lib
    return lib


def is_available() -> bool:
    return _load() is not None


class NativePointCloudDataset:
    """Native ingest of the .npy dump contract (normalize + optional fixed
    x-rotation + pad/subsample), mirroring PointCloudDataset."""

    def __init__(
        self,
        pts_path: str,
        label_path: str,
        num_points: int = 1024,
        fixed_x_rotation: bool = False,
        seed: int = 666,
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable (build with `make native`)")
        self._lib = lib
        self._h = lib.sug_dataset_load(
            pts_path.encode(), label_path.encode(), num_points,
            int(fixed_x_rotation), seed,
        )
        if not self._h:
            raise RuntimeError(f"failed to load {pts_path} / {label_path}")
        self.num_points = num_points

    @classmethod
    def from_arrays(cls, pts: np.ndarray, labels: np.ndarray):
        """Adopt preprocessed (M, num_points, 3) f32 / (M,) i32 arrays — the
        native route for train-time splitter subsets, which exist only in
        memory (sug_tpu.data.splitter materializes points, not file paths)."""
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable (build with `make native`)")
        pts = np.ascontiguousarray(pts, dtype=np.float32)
        labels = np.ascontiguousarray(labels, dtype=np.int32)
        self = cls.__new__(cls)
        self._lib = lib
        self._h = lib.sug_dataset_from_arrays(
            pts.ctypes.data_as(ctypes.c_void_p),
            labels.ctypes.data_as(ctypes.c_void_p),
            pts.shape[0],
            pts.shape[1],
        )
        if not self._h:
            raise RuntimeError("sug_dataset_from_arrays failed")
        self.num_points = int(pts.shape[1])
        return self

    def __len__(self) -> int:
        return int(self._lib.sug_dataset_size(self._h))

    @property
    def cls_num_counter(self):
        out = np.zeros(10, dtype=np.int32)
        self._lib.sug_dataset_class_counts(self._h, out.ctypes.data_as(ctypes.c_void_p))
        return out.tolist()

    def arrays(self):
        M = len(self)
        pts = np.empty((M, self.num_points, 3), dtype=np.float32)
        labels = np.empty((M,), dtype=np.int32)
        self._lib.sug_dataset_get_all(
            self._h,
            pts.ctypes.data_as(ctypes.c_void_p),
            labels.ctypes.data_as(ctypes.c_void_p),
        )
        return pts, labels

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.sug_dataset_destroy(self._h)
            self._h = None


class NativeBatchIterator:
    """Prefetching batch iterator over a NativePointCloudDataset. A worker
    thread assembles the next batch while the previous one is on device."""

    def __init__(
        self,
        dataset: NativePointCloudDataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        class_balance: bool = False,
        class_per_batch: int = 10,
        seed: int = 666,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self._lib = dataset._lib
        self._h = self._lib.sug_iter_create(
            dataset._h, batch_size, int(shuffle), int(drop_last),
            int(class_balance), class_per_batch, seed,
        )
        self._epoch = 0

    def __len__(self) -> int:
        return int(self._lib.sug_iter_num_batches(self._h))

    def set_epoch(self, epoch: int) -> None:
        """Rebuild the epoch order; safe mid-epoch (the DG loop zips paired
        iterators and abandons the longer one — the C side quiesces its
        prefetch thread before rebuilding)."""
        self._epoch = int(epoch)
        self._lib.sug_iter_reset(self._h, self._epoch)

    def __iter__(self):
        np_pts = np.empty(
            (self.batch_size, self.dataset.num_points, 3), dtype=np.float32
        )
        np_labels = np.empty((self.batch_size,), dtype=np.int32)
        while self._lib.sug_iter_next(
            self._h,
            np_pts.ctypes.data_as(ctypes.c_void_p),
            np_labels.ctypes.data_as(ctypes.c_void_p),
        ):
            yield np_pts.copy(), np_labels.copy()
        self._epoch += 1
        self._lib.sug_iter_reset(self._h, self._epoch)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.sug_iter_destroy(self._h)
            self._h = None


# ---------------------------------------------------------------------------
# native point ops (pointops.cpp): host-path FPS / ICP for the offline
# splitter, so preprocessing never has to attach to the TPU
# ---------------------------------------------------------------------------


def pointops_available() -> bool:
    lib = _load()
    return bool(lib is not None and getattr(lib, "_has_pointops", False))


def fps_native(pts: np.ndarray, npoint: int, start_idx=None) -> np.ndarray:
    """Farthest-point sampling on the host: (B, N, 3) f32 -> (B, npoint) i32.
    Bit-exact vs ops.geometry.farthest_point_sample (same f32 update order,
    first-index argmax tie-break)."""
    lib = _load()
    pts = np.ascontiguousarray(pts, dtype=np.float32)
    B, N, _ = pts.shape
    out = np.empty((B, npoint), dtype=np.int32)
    start = (
        None
        if start_idx is None
        else np.ascontiguousarray(start_idx, dtype=np.int32)
    )
    lib.sug_fps(
        pts.ctypes.data_as(ctypes.c_void_p), B, N, npoint,
        start.ctypes.data_as(ctypes.c_void_p) if start is not None else None,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def icp_fitness_native(
    anchor: np.ndarray, clouds: np.ndarray, iters: int = 15,
    max_corr: float = 0.15,
) -> np.ndarray:
    """Batched point-to-point ICP inlier fraction on the host: align anchor
    (P, 3) onto each of clouds (M, P, 3); mirrors the jax
    offline_splitter._icp_fitness_batch (fixed Kabsch iterations)."""
    lib = _load()
    anchor = np.ascontiguousarray(anchor, dtype=np.float32)
    clouds = np.ascontiguousarray(clouds, dtype=np.float32)
    M, P, _ = clouds.shape
    out = np.empty((M,), dtype=np.float32)
    lib.sug_icp_fitness(
        anchor.ctypes.data_as(ctypes.c_void_p),
        clouds.ctypes.data_as(ctypes.c_void_p),
        M, P, iters, max_corr,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out

"""ctypes binding for the native loader (native/npy_loader.cpp).

The native path exists for corpora that exceed device memory: files stay
mmapped on the host, batches are assembled by a C++ thread team and only
the assembled (B, 6, 75, 216) window slabs cross to the device — the
role the reference's 16 DataLoader worker processes played
(exp180d…py:281-288), without pickling or process pools. A background
prefetch thread double-buffers the next batch while the device computes.
"""

import ctypes
import os
import queue
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libmpe_loader.so")


def build_native_library(force: bool = False) -> str:
    """Build libmpe_loader.so via the Makefile if not present."""
    if force or not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    return _LIB_PATH


def _load_lib():
    lib = ctypes.CDLL(build_native_library())
    lib.mpe_dataset_create.restype = ctypes.c_void_p
    lib.mpe_dataset_create.argtypes = [ctypes.c_int] * 4
    lib.mpe_dataset_add_file.restype = ctypes.c_long
    lib.mpe_dataset_add_file.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                         ctypes.c_char_p]
    lib.mpe_dataset_num_windows.restype = ctypes.c_long
    lib.mpe_dataset_num_windows.argtypes = [ctypes.c_void_p]
    lib.mpe_dataset_error.restype = ctypes.c_char_p
    lib.mpe_dataset_error.argtypes = [ctypes.c_void_p]
    lib.mpe_dataset_fill_batch.restype = ctypes.c_int
    lib.mpe_dataset_fill_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_long), ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int]
    lib.mpe_dataset_destroy.argtypes = [ctypes.c_void_p]
    return lib


class NativeWindowLoader:
    """Window loader over per-file (hcqt.npy, annot.npy) pairs.

    Args:
        file_pairs: list of (hcqt_path, annot_path).
        context/stride: window geometry (dataset_context semantics).
        target_slice: (lo, hi) annotation rows (experiments use (24, 96)).
        n_threads: C++ batch-assembly threads.
    """

    def __init__(self, file_pairs: Sequence[Tuple[str, str]],
                 context: int = 75, stride: int = 50,
                 target_slice: Tuple[int, int] = (24, 96),
                 n_threads: int = 8, channels: int = 6, freq_bins: int = 216):
        self._lib = _load_lib()
        self.context = context
        self.channels = channels
        self.freq_bins = freq_bins
        self.n_bins = target_slice[1] - target_slice[0]
        self.n_threads = n_threads
        self._ds = self._lib.mpe_dataset_create(
            context, stride, target_slice[0], target_slice[1])
        for hcqt_path, annot_path in file_pairs:
            n = self._lib.mpe_dataset_add_file(
                self._ds, hcqt_path.encode(), annot_path.encode())
            if n < 0:
                err = self._lib.mpe_dataset_error(self._ds).decode()
                raise IOError(err)

    def __len__(self):
        return int(self._lib.mpe_dataset_num_windows(self._ds))

    def fill(self, indices: np.ndarray,
             out_x: Optional[np.ndarray] = None,
             out_y: Optional[np.ndarray] = None):
        """Assemble windows for global ``indices`` → (X (n,C,ctx,F) f32,
        y (n, n_bins) f32)."""
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        n = len(idx)
        x = out_x if out_x is not None else np.empty(
            (n, self.channels, self.context, self.freq_bins), np.float32)
        y = out_y if out_y is not None else np.empty((n, self.n_bins),
                                                     np.float32)
        rc = self._lib.mpe_dataset_fill_batch(
            self._ds, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), n,
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.n_threads)
        if rc != 0:
            raise IOError("native fill_batch failed")
        return x, y

    def batches(self, batch_size: int, shuffle: bool = True,
                seed: int = 0, prefetch: int = 2):
        """Generator of (X, y) numpy batches with background prefetch."""
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        chunks = [order[i:i + batch_size]
                  for i in range(0, len(order) - batch_size + 1, batch_size)]
        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        stop = threading.Event()

        def put(item):
            """Bounded put that aborts when the consumer is gone — a
            plain q.put would block forever if the generator is
            abandoned mid-epoch, leaking the thread and pinning this
            loader (and its mmap) alive."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for chunk in chunks:
                    if stop.is_set() or not put(self.fill(chunk)):
                        return
                put(None)
            except BaseException as e:       # surface in the consumer
                put(e)                       # (a dead producer would
                                             # leave q.get blocked)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            t.join(timeout=5.0)

    def __del__(self):
        try:
            if getattr(self, "_ds", None):
                self._lib.mpe_dataset_destroy(self._ds)
                self._ds = None
        except Exception:
            pass


def trainer_batches(loader: "NativeWindowLoader", batch_size: int,
                    shuffle: bool = True, seed: int = 0,
                    compression: float = 10.0):
    """Adapt native-loader batches to the Trainer's (x, y) convention:
    X log-compressed (B, C, ctx, F) and y (B, 1, 1, n_bins) device-ready
    numpy arrays. (Augmentation-free path: augment on device with
    data.augment if needed.)"""
    for x, y in loader.batches(batch_size, shuffle=shuffle, seed=seed):
        if compression is not None:
            x = np.log1p(compression * x)
        yield x, y[:, None, None, :]

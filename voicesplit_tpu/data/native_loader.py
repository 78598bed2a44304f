"""ctypes wrapper for the native C++ prefetching loader.

Drop-in alternative to the pure-Python `BatchIterator` item loading:
same deterministic schedule (the shuffle permutation is computed in
Python from ``(seed, epoch)`` exactly like `BatchIterator._epoch_order`,
then handed to C++), same `state`/`load_state` resume contract, but wav
decode + npy parse + crop/pad run in a C++ thread pool with an in-order
bounded ring, overlapping the next batches with TPU step time.

The shared library builds on first use with g++ (cached under
``~/.cache/voicesplit_tpu``); environments without a toolchain fall back
to the Python loader automatically (`make_train_iterator`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional

import numpy as np

from voicesplit_tpu.data.dataset import IteratorState, SampleFiles, SeparationDataset

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native", "loader.cc")
_CACHE_DIR = os.path.expanduser("~/.cache/voicesplit_tpu")
_LIB_PATH = os.path.join(_CACHE_DIR, "libvsloader.so")

_lib = None


def _build_library() -> str:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
        return _LIB_PATH
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-o", _LIB_PATH + ".tmp", _SRC, "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(_LIB_PATH + ".tmp", _LIB_PATH)
    return _LIB_PATH


def _load_library():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_build_library())
    lib.vsl_create.restype = ctypes.c_void_p
    lib.vsl_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.vsl_start.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
    lib.vsl_next.restype = ctypes.c_int
    lib.vsl_next.argtypes = [ctypes.c_void_p] + [ctypes.POINTER(ctypes.c_float)] * 3 + [
        ctypes.POINTER(ctypes.c_int32)
    ]
    lib.vsl_destroy.argtypes = [ctypes.c_void_p]
    lib.vsl_error_count.restype = ctypes.c_int64
    lib.vsl_error_count.argtypes = [ctypes.c_void_p]
    lib.vsl_last_error.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
    _lib = lib
    return lib


def _as_npy_embedding(path: str) -> str:
    """The C loader parses .npy only; reference-format datasets ship
    torch ``*-emb.pt`` d-vectors (`utils/dataset.py:20-27`).  Convert
    those once to a cached .npy sidecar (keyed by absolute path + mtime)
    instead of silently feeding zeros."""
    if not path.endswith(".pt"):
        return path
    import hashlib

    key = hashlib.sha1(
        f"{os.path.abspath(path)}:{os.path.getmtime(path)}".encode()
    ).hexdigest()
    cache = os.path.join(_CACHE_DIR, "emb_npy", key + ".npy")
    if not os.path.exists(cache):
        import torch

        vec = np.asarray(torch.load(path, map_location="cpu", weights_only=True),
                         np.float32).reshape(-1)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        tmp = cache + f".tmp{os.getpid()}.npy"  # np.save keeps an .npy name as-is
        np.save(tmp, vec)
        os.replace(tmp, cache)
    return cache


def native_loader_available() -> bool:
    try:
        _load_library()
        return True
    except Exception:
        return False


class NativeBatchIterator:
    """C++-prefetched batches with the `BatchIterator` interface."""

    def __init__(
        self,
        dataset: SeparationDataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 42,
        shard_id: int = 0,
        num_shards: int = 1,
        n_threads: int = 8,
        queue_cap: int = 8,
    ):
        if not drop_last:
            raise ValueError("native loader requires drop_last=True (fixed shapes)")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.shard_id = shard_id
        self.num_shards = num_shards
        self._state = IteratorState(seed=seed)
        self._lib = _load_library()

        samples: List[SampleFiles] = dataset.samples
        n = len(samples)
        emb_paths = [_as_npy_embedding(s.emb) for s in samples]
        self._emb_arr = (ctypes.c_char_p * n)(*[p.encode() for p in emb_paths])
        self._tgt_arr = (ctypes.c_char_p * n)(*[s.target_wav.encode() for s in samples])
        self._mix_arr = (ctypes.c_char_p * n)(*[s.mixed_wav.encode() for s in samples])
        self._handle = self._lib.vsl_create(
            self._emb_arr, self._tgt_arr, self._mix_arr, n,
            batch_size, dataset.emb_dim, dataset.n_samples, n_threads, queue_cap,
            int(dataset.ap.sample_rate),
        )
        self._epoch_running: Optional[int] = None

    # -- state (identical contract to BatchIterator) --------------------
    @property
    def state(self) -> IteratorState:
        return IteratorState(**self._state.to_dict())

    def load_state(self, state: IteratorState) -> None:
        self._state = IteratorState(**state.to_dict())
        self._epoch_running = None  # restart prefetch at the new position

    def _epoch_order(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            order = np.random.default_rng((self._state.seed, epoch)).permutation(n)
        else:
            order = np.arange(n)
        # equal shard lengths (mirrors BatchIterator — a longer shard
        # would desync multi-host collectives)
        per_shard = n // self.num_shards
        return order[self.shard_id :: self.num_shards][:per_shard]

    def batches_per_epoch(self) -> int:
        return len(self._epoch_order(0)) // self.batch_size

    # -- iteration ------------------------------------------------------
    def _start_epoch(self) -> None:
        st = self._state
        order = self._epoch_order(st.epoch).astype(np.int64)
        nb = self.batches_per_epoch()
        sched = order[st.position * self.batch_size : nb * self.batch_size]
        ptr = sched.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        self._lib.vsl_start(self._handle, ptr, len(sched))
        self._epoch_running = st.epoch

    def __iter__(self):
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        st = self._state
        nb = self.batches_per_epoch()
        if nb == 0:
            raise ValueError("dataset smaller than one batch")
        if st.position >= nb:
            st.epoch += 1
            st.position = 0
            self._epoch_running = None
        if self._epoch_running != st.epoch:
            self._start_epoch()

        B, E, L = self.batch_size, self.dataset.emb_dim, self.dataset.n_samples
        emb = np.empty((B, E), np.float32)
        tgt = np.empty((B, L), np.float32)
        mix = np.empty((B, L), np.float32)
        wl = np.empty((B,), np.int32)
        ok = self._lib.vsl_next(
            self._handle,
            emb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            tgt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mix.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            wl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if not ok:
            raise RuntimeError("native loader stopped unexpectedly")
        n_err = self._lib.vsl_error_count(self._handle)
        if n_err:
            buf = ctypes.create_string_buffer(1024)
            self._lib.vsl_last_error(self._handle, buf, len(buf))
            raise RuntimeError(
                f"native loader hit {n_err} data error(s); first: "
                f"{buf.value.decode(errors='replace')}"
            )
        st.position += 1
        hop = self.dataset.ap.hop_length
        seq = np.minimum(self.dataset.n_frames, 1 + wl // hop).astype(np.int32)
        return {"emb": emb, "target_wav": tgt, "mixed_wav": mix,
                "wav_len": wl, "seq_len": seq}

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.vsl_destroy(self._handle)
                self._handle = None
        except Exception:
            pass


def make_train_iterator(dataset, batch_size, **kwargs):
    """Native loader when a toolchain exists, Python fallback otherwise."""
    from voicesplit_tpu.data.dataset import BatchIterator

    prefer_native = kwargs.pop("prefer_native", True)
    if prefer_native and native_loader_available():
        try:
            return NativeBatchIterator(dataset, batch_size, **kwargs)
        except Exception as e:
            print(f" ! native loader unavailable ({e}); python fallback")
    kwargs.pop("n_threads", None)
    kwargs.pop("queue_cap", None)
    return BatchIterator(dataset, batch_size, **kwargs)

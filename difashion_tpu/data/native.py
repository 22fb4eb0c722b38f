"""ctypes bindings for the native C++ image pipeline (native/difashion_io.cc).

Provides JPEG/PNG decode + white-composite + pad-square + PIL-compatible Lanczos-3
resize + [-1,1] normalization, and a pthread-pool batch loader — the native runtime
component replacing the reference's torch-DataLoader/PIL host path. Falls back to the
pure-PIL pipeline (`difashion_tpu.data.preprocessing`) when the .so isn't built.

Build: `make -C native` (libjpeg/libpng required).
"""
from __future__ import annotations

import ctypes
import os
from typing import Sequence

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "libdifashion_io.so",
)

_lib = None


_SRC_PATH = os.path.join(os.path.dirname(_LIB_PATH), "difashion_io.cc")


def _source_hash() -> str:
    import hashlib

    with open(_SRC_PATH, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _check_freshness(lib) -> None:
    """Refuse a stale binary: the .so embeds the sha256 of the .cc it was built
    from (see native/Makefile); if it doesn't match the on-disk source, callers
    fall back to the PIL pipeline instead of silently running old native code.
    (Round 3 shipped a stale .so whose committed source had fixes the binary
    lacked — this guard makes that class of skew impossible.)"""
    try:
        lib.dfio_source_hash.restype = ctypes.c_char_p
        built_from = lib.dfio_source_hash().decode()
    except AttributeError:
        built_from = "<pre-hash binary>"
    if not os.path.exists(_SRC_PATH):
        return  # installed without source; trust the binary
    current = _source_hash()
    if built_from != current:
        import logging

        logging.getLogger("difashion_tpu").warning(
            "native library %s is STALE (built from source hash %s, on-disk "
            "source is %s) — falling back to the PIL pipeline. Rebuild with "
            "`make -C native`.", _LIB_PATH, built_from[:12], current[:12],
        )
        raise OSError(f"stale native library: {_LIB_PATH} (run `make -C native`)")


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        raise OSError(f"native library not built: {_LIB_PATH} (run `make -C native`)")
    lib = ctypes.CDLL(_LIB_PATH)
    _check_freshness(lib)
    lib.dfio_prepare_image.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float)
    ]
    lib.dfio_prepare_image.restype = ctypes.c_int
    lib.dfio_image_size.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)
    ]
    lib.dfio_image_size.restype = ctypes.c_int
    lib.dfio_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int, ctypes.c_int
    ]
    lib.dfio_loader_create.restype = ctypes.c_void_p
    lib.dfio_loader_load.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.dfio_loader_load.restype = ctypes.c_int64
    lib.dfio_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False


def prepare_image(path: str, size: int = 512) -> np.ndarray:
    """Decode + composite + pad + Lanczos resize -> [size, size, 3] f32 in [-1,1]."""
    lib = _load()
    out = np.empty((size, size, 3), np.float32)
    ok = lib.dfio_prepare_image(
        path.encode(), size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    if not ok:
        raise IOError(f"failed to decode {path}")
    return out


class NativeCatalogLoader:
    """Thread-pooled batch loader over a fixed catalog path list."""

    def __init__(self, paths: Sequence[str], size: int = 512,
                 n_threads: int = 0):
        lib = _load()
        self._lib = lib
        self.size = size
        self._paths_buf = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths_buf))(*self._paths_buf)
        self._handle = lib.dfio_loader_create(arr, len(self._paths_buf), size,
                                              n_threads)
        if not self._handle:
            raise OSError("failed to create native loader")

    def load(self, ids: Sequence[int]) -> np.ndarray:
        """ids -> [n, size, size, 3] f32 in [-1,1]; failed decodes become the white
        null image (catalog convention), counted in `self.last_failed` and warned."""
        if self._handle is None:
            raise ValueError("loader is closed")
        ids_arr = np.ascontiguousarray(ids, np.int64)
        out = np.empty((len(ids_arr), self.size, self.size, 3), np.float32)
        failed = self._lib.dfio_loader_load(
            self._handle,
            ids_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(ids_arr),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        self.last_failed = int(failed)
        if failed:
            import logging

            logging.getLogger("difashion_tpu").warning(
                "native loader: %d/%d decodes failed (substituted the white "
                "null image) — check catalog paths", failed, len(ids_arr),
            )
        return out

    def close(self) -> None:
        if self._handle:
            self._lib.dfio_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

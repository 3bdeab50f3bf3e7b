"""ctypes bindings to the native runtime library (native/plpslam_native.cpp).

Native components (see the C++ file for the reference mapping):
  * AsyncSnapshotWriter — non-blocking map checkpointing.
  * NativePublisher — TCP broadcast of binary map packets to viewers
    (reference: src/socket_publisher/).

The library auto-builds with ``make`` on first use; everything degrades
gracefully (``available() == False``) if the toolchain is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libplpslam_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.snapshot_writer_create.restype = ctypes.c_void_p
    lib.snapshot_writer_create.argtypes = [ctypes.c_char_p]
    lib.snapshot_writer_submit.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64,
    ]
    lib.snapshot_writer_wait.argtypes = [ctypes.c_void_p]
    lib.snapshot_writer_destroy.argtypes = [ctypes.c_void_p]
    lib.publisher_create.restype = ctypes.c_void_p
    lib.publisher_create.argtypes = [ctypes.c_int]
    lib.publisher_port.restype = ctypes.c_int
    lib.publisher_port.argtypes = [ctypes.c_void_p]
    lib.publisher_num_clients.restype = ctypes.c_int
    lib.publisher_num_clients.argtypes = [ctypes.c_void_p]
    lib.publisher_packets_sent.restype = ctypes.c_uint64
    lib.publisher_packets_sent.argtypes = [ctypes.c_void_p]
    lib.publisher_publish.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64,
    ]
    lib.publisher_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


class AsyncSnapshotWriter:
    """Latest-wins background checkpoint writer (atomic rename)."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.snapshot_writer_create(path.encode())

    def submit(self, blob: bytes):
        self._lib.snapshot_writer_submit(self._h, blob, len(blob))

    def wait(self):
        self._lib.snapshot_writer_wait(self._h)

    def close(self):
        if self._h:
            self._lib.snapshot_writer_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class NativePublisher:
    """TCP broadcast server for binary map packets (length-prefixed)."""

    def __init__(self, port: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.publisher_create(port)
        if not self._h:
            raise OSError(f"could not bind publisher port {port}")

    @property
    def port(self) -> int:
        return self._lib.publisher_port(self._h)

    @property
    def num_clients(self) -> int:
        return self._lib.publisher_num_clients(self._h)

    @property
    def packets_sent(self) -> int:
        return self._lib.publisher_packets_sent(self._h)

    def publish(self, blob: bytes):
        self._lib.publisher_publish(self._h, blob, len(blob))

    def close(self):
        if self._h:
            self._lib.publisher_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()

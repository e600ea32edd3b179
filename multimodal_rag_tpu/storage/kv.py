"""KV backends for the raw-content store.

The reference stored raw chunks in an external redis-server
(``app/utils/retriever.py:180-210``). Here the default backend is the
in-process **native C++ store** (``native/kvstore.cc`` via ctypes): the same
get/set/delete/scan surface the retriever needs, gzip helpers at zlib speed,
and snapshot persistence. A pure-Python ``MemoryKV`` serves as fallback when
the shared library can't be built, and ``RedisKV`` speaks to a real Redis
when the ``redis`` package is installed (kept for corpus compatibility —
the key schema is identical).
"""

from __future__ import annotations

import ctypes
import gzip as _pygzip
import logging
import os
import subprocess
from typing import Dict, List, Optional

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmmkv.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
            )
        except Exception as e:  # noqa: BLE001
            logger.warning("native kv build failed: %s", e)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        logger.warning("native kv load failed: %s", e)
        return None
    lib.kv_open.restype = ctypes.c_void_p
    lib.kv_open.argtypes = [ctypes.c_char_p]
    lib.kv_close.argtypes = [ctypes.c_void_p]
    lib.kv_set.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t,
    ]
    lib.kv_get.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_char)),
        ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.kv_del.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
    ]
    lib.kv_count.restype = ctypes.c_long
    lib.kv_count.argtypes = [ctypes.c_void_p]
    lib.kv_scan.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_char)),
        ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.kv_clear.argtypes = [ctypes.c_void_p]
    lib.kv_save.argtypes = [ctypes.c_void_p]
    lib.kv_free.argtypes = [ctypes.POINTER(ctypes.c_char)]
    lib.kv_gzip.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_char)),
        ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.kv_gunzip.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_char)),
        ctypes.POINTER(ctypes.c_size_t),
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


class NativeKV:
    """ctypes wrapper over native/kvstore.cc."""

    def __init__(self, persist_dir: Optional[str] = None):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native kv library unavailable")
        self._lib = lib
        self.persist_dir = persist_dir
        if persist_dir:
            os.makedirs(persist_dir, exist_ok=True)
        self._h = lib.kv_open(
            persist_dir.encode() if persist_dir else b""
        )

    def set(self, key: str, value: bytes) -> None:
        kb = key.encode()
        self._lib.kv_set(self._h, kb, len(kb), value, len(value))

    def get(self, key: str) -> Optional[bytes]:
        kb = key.encode()
        out = ctypes.POINTER(ctypes.c_char)()
        outlen = ctypes.c_size_t()
        found = self._lib.kv_get(
            self._h, kb, len(kb), ctypes.byref(out), ctypes.byref(outlen)
        )
        if not found:
            return None
        try:
            return ctypes.string_at(out, outlen.value)
        finally:
            self._lib.kv_free(out)

    def mget(self, keys: List[str]) -> List[Optional[bytes]]:
        return [self.get(k) for k in keys]

    def delete(self, *keys: str) -> int:
        n = 0
        for key in keys:
            kb = key.encode()
            n += self._lib.kv_del(self._h, kb, len(kb))
        return n

    def scan(self, prefix: str) -> List[str]:
        pb = prefix.encode()
        out = ctypes.POINTER(ctypes.c_char)()
        outlen = ctypes.c_size_t()
        self._lib.kv_scan(
            self._h, pb, len(pb), ctypes.byref(out), ctypes.byref(outlen)
        )
        try:
            data = ctypes.string_at(out, outlen.value)
        finally:
            self._lib.kv_free(out)
        return data.decode().split("\n") if data else []

    def count(self) -> int:
        return self._lib.kv_count(self._h)

    def clear(self) -> None:
        self._lib.kv_clear(self._h)

    def save(self) -> None:
        if self.persist_dir:
            self._lib.kv_save(self._h)

    def close(self) -> None:
        if self._h:
            self._lib.kv_close(self._h)
            self._h = None

    def ping(self) -> bool:
        return self._h is not None

    # gzip at zlib speed through the native lib
    def gzip(self, data: bytes, level: int = 6) -> bytes:
        out = ctypes.POINTER(ctypes.c_char)()
        outlen = ctypes.c_size_t()
        rc = self._lib.kv_gzip(
            data, len(data), level, ctypes.byref(out), ctypes.byref(outlen)
        )
        if rc != 0:
            return _pygzip.compress(data, compresslevel=level)
        try:
            return ctypes.string_at(out, outlen.value)
        finally:
            self._lib.kv_free(out)

    def gunzip(self, data: bytes) -> bytes:
        out = ctypes.POINTER(ctypes.c_char)()
        outlen = ctypes.c_size_t()
        rc = self._lib.kv_gunzip(
            data, len(data), ctypes.byref(out), ctypes.byref(outlen)
        )
        if rc != 0:
            return _pygzip.decompress(data)
        try:
            return ctypes.string_at(out, outlen.value)
        finally:
            self._lib.kv_free(out)


class MemoryKV:
    """Pure-Python fallback with the same surface."""

    def __init__(self, persist_dir: Optional[str] = None):
        self.persist_dir = persist_dir
        self._data: Dict[str, bytes] = {}
        if persist_dir:
            os.makedirs(persist_dir, exist_ok=True)
            self._load()

    def _snapshot_path(self) -> str:
        return os.path.join(self.persist_dir, "kv.msgpack")

    def _load(self) -> None:
        import msgpack

        path = self._snapshot_path()
        if os.path.exists(path):
            with open(path, "rb") as f:
                self._data = {
                    k.decode() if isinstance(k, bytes) else k: v
                    for k, v in msgpack.unpackb(f.read(), raw=True).items()
                }

    def set(self, key: str, value: bytes) -> None:
        self._data[key] = value

    def get(self, key: str) -> Optional[bytes]:
        return self._data.get(key)

    def mget(self, keys: List[str]) -> List[Optional[bytes]]:
        return [self._data.get(k) for k in keys]

    def delete(self, *keys: str) -> int:
        n = 0
        for key in keys:
            if key in self._data:
                del self._data[key]
                n += 1
        return n

    def scan(self, prefix: str) -> List[str]:
        return [k for k in self._data if k.startswith(prefix)]

    def count(self) -> int:
        return len(self._data)

    def clear(self) -> None:
        self._data.clear()

    def save(self) -> None:
        if not self.persist_dir:
            return
        import msgpack

        tmp = self._snapshot_path() + ".tmp"
        with open(tmp, "wb") as f:
            f.write(msgpack.packb(self._data))
        os.replace(tmp, self._snapshot_path())

    def close(self) -> None:
        pass

    def ping(self) -> bool:
        return True

    def gzip(self, data: bytes, level: int = 6) -> bytes:
        return _pygzip.compress(data, compresslevel=level)

    def gunzip(self, data: bytes) -> bytes:
        return _pygzip.decompress(data)


def open_kv(backend: str = "native", persist_dir: Optional[str] = None):
    """Factory honoring ``KV_BACKEND``: native | memory | redis."""
    if backend == "native":
        try:
            return NativeKV(persist_dir)
        except RuntimeError:
            logger.warning("falling back to MemoryKV")
            return MemoryKV(persist_dir)
    if backend == "redis":
        try:
            from multimodal_rag_tpu.storage.redis_kv import RedisKV

            return RedisKV()
        except ImportError:
            logger.warning("redis package unavailable; falling back to native")
            return open_kv("native", persist_dir)
    return MemoryKV(persist_dir)

"""Optional Redis backend — identical keyspace, for deployments that keep
their existing redis-server (stored corpora work unchanged)."""

from __future__ import annotations

import gzip as _pygzip
from typing import List, Optional

import redis  # raises ImportError when not installed; gated by open_kv

from multimodal_rag_tpu.config import settings


class RedisKV:
    def __init__(self):
        self._r = redis.Redis(
            host=settings.REDIS_HOST,
            port=settings.REDIS_PORT,
            db=settings.REDIS_DB,
            password=settings.REDIS_PASSWORD,
            max_connections=settings.RETRIEVER_CONNECTION_POOL_SIZE,
        )

    def set(self, key: str, value: bytes) -> None:
        self._r.set(key, value)

    def get(self, key: str) -> Optional[bytes]:
        return self._r.get(key)

    def mget(self, keys: List[str]) -> List[Optional[bytes]]:
        return self._r.mget(keys) if keys else []

    def delete(self, *keys: str) -> int:
        return self._r.delete(*keys) if keys else 0

    def scan(self, prefix: str) -> List[str]:
        out = []
        cursor = 0
        while True:
            cursor, keys = self._r.scan(cursor, match=prefix + "*", count=100)
            out.extend(k.decode() for k in keys)
            if cursor == 0:
                return out

    def count(self) -> int:
        return self._r.dbsize()

    def clear(self) -> None:
        self._r.flushdb()

    def save(self) -> None:
        pass  # redis handles its own durability

    def close(self) -> None:
        self._r.close()

    def ping(self) -> bool:
        return bool(self._r.ping())

    def gzip(self, data: bytes, level: int = 6) -> bytes:
        return _pygzip.compress(data, compresslevel=level)

    def gunzip(self, data: bytes) -> bytes:
        return _pygzip.decompress(data)

"""Cross-modal (text↔image) retrieval index over extracted figures.

BASELINE.json config 2: "CLIP ViT-B/32 text+image embed over figures/*.png
with joint cross-modal top-k retrieval". The reference *declares*
``CLIP_MODEL`` but never consumes it (reference config.py:106, SURVEY.md
§5.6); this component makes it real. Figures extracted at upload time are
embedded with a dual encoder into a dedicated device-resident collection
(separate from the 384-d summary index, since the joint space has its own
dimensionality), and text or image queries search it with the same fused
MIPS top-k kernel.

Encoder family is selected by the ``CLIP_MODEL`` env knob the deployments
already carry: a value containing "siglip" picks the SigLIP-B/16 towers
(``models.siglip``); anything else picks CLIP ViT-B/32 (``models.clip``).
Construction is lazy — the towers are ~87M params and most deployments
never hit the cross-modal route, so nothing compiles until first use.
"""

from __future__ import annotations

import asyncio
import base64 as b64
import logging
import threading
import time
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from multimodal_rag_tpu.config import settings
from multimodal_rag_tpu.vectorstore import VectorStore

logger = logging.getLogger(__name__)

COLLECTION = "figures_crossmodal"


def build_dual_encoder(model_name: Optional[str] = None):
    """CLIP_MODEL knob → encoder instance. "siglip" anywhere in the name
    selects SigLIP-B/16; default is CLIP ViT-B/32."""
    name = (model_name or settings.CLIP_MODEL or "ViT-B/32").lower()
    ckpt = settings.MMRAG_CLIP_CHECKPOINT_PATH or None
    if "siglip" in name:
        from multimodal_rag_tpu.models.siglip import SigLIPEncoder

        return SigLIPEncoder(checkpoint_path=ckpt)
    from multimodal_rag_tpu.models.clip import CLIPEncoder

    return CLIPEncoder(checkpoint_path=ckpt)


class CrossModalIndex:
    """Figure index: add images per document, search by text or image."""

    def __init__(
        self,
        encoder=None,
        model_name: Optional[str] = None,
        store: Optional[VectorStore] = None,
        persist_dir: Optional[str] = None,
    ) -> None:
        self._encoder = encoder
        self._model_name = model_name
        self._store = store
        self.persist_dir = persist_dir
        self._lock = threading.Lock()
        self.stats = {"images_indexed": 0, "text_queries": 0,
                      "image_queries": 0}

    # -- lifecycle ---------------------------------------------------------

    def _ensure(self) -> None:
        with self._lock:
            if self._encoder is None:
                t0 = time.time()
                self._encoder = build_dual_encoder(self._model_name)
                logger.info(
                    "Cross-modal encoder %s ready in %.1fs",
                    type(self._encoder).__name__, time.time() - t0,
                )
            if self._store is None:
                loaded = None
                if self.persist_dir:
                    try:
                        loaded = VectorStore.load(self.persist_dir, COLLECTION)
                        logger.info(
                            "Restored cross-modal store (%d figures)",
                            loaded.count(),
                        )
                    except FileNotFoundError:
                        loaded = None
                if loaded is not None and loaded.dim != self._encoder.dim:
                    # Persisted under a different CLIP_MODEL (e.g. CLIP
                    # 512-d → SigLIP 768-d): every later query/add would
                    # fail a shape assert. Start fresh instead — figures
                    # re-index on their next upload. (Same-dim encoder
                    # swaps still need a manual wipe: the spaces differ
                    # but the shapes can't tell them apart.)
                    logger.warning(
                        "Cross-modal store at %s has dim=%d but encoder "
                        "%s produces dim=%d — ignoring the persisted "
                        "index (figures need re-indexing)",
                        self.persist_dir, loaded.dim,
                        self._model_name, self._encoder.dim,
                    )
                    loaded = None
                self._store = loaded or VectorStore(
                    dim=self._encoder.dim, name=COLLECTION
                )

    async def initialize(self) -> None:
        """No-op by design: towers build lazily on first use."""

    async def cleanup(self) -> None:
        if self.persist_dir and self._store is not None:
            await asyncio.to_thread(self._store.save, self.persist_dir)

    @property
    def ready(self) -> bool:
        return self._encoder is not None

    # -- indexing ----------------------------------------------------------

    @staticmethod
    def _image_bytes(image: Dict[str, Any]) -> Optional[bytes]:
        """Parser image object ({id, path?, base64?, metadata}) → bytes."""
        if image.get("base64"):
            try:
                return b64.b64decode(image["base64"])
            except Exception:  # noqa: BLE001
                return None
        path = image.get("path")
        if path:
            try:
                with open(path, "rb") as f:
                    return f.read()
            except OSError:
                return None
        return None

    async def index_document_images(
        self, doc_id: str, images: Sequence[Dict[str, Any]]
    ) -> int:
        """Embed a document's extracted figures into the joint space.
        Returns the number indexed."""
        if not images:
            return 0
        await asyncio.to_thread(self._ensure)
        payload = []
        for img in images:
            data = self._image_bytes(img)
            if data is not None:
                payload.append((img, data))
        if not payload:
            return 0
        vecs = await asyncio.to_thread(
            self._encoder.encode_images, [d for _, d in payload]
        )
        ids = [f"{doc_id}_{img['id']}" for img, _ in payload]
        metas = [
            {
                "doc_id": doc_id,
                "item_id": img["id"],
                "type": "image",
                "path": img.get("path"),
            }
            for img, _ in payload
        ]
        docs = [img.get("path") or img["id"] for img, _ in payload]
        await asyncio.to_thread(
            self._store.add, ids, np.asarray(vecs, np.float32), docs, metas
        )
        self.stats["images_indexed"] += len(ids)
        return len(ids)

    # -- search ------------------------------------------------------------

    def _format(self, res) -> List[Dict[str, Any]]:
        out = []
        for id_, dist, meta in zip(
            res["ids"][0], res["distances"][0], res["metadatas"][0]
        ):
            out.append(
                {
                    "id": id_,
                    "doc_id": (meta or {}).get("doc_id"),
                    "path": (meta or {}).get("path"),
                    "relevance": 1.0 - min(float(dist), 1.0),
                }
            )
        return out

    async def _search(self, encode, payload, stat_key: str, k: int):
        """Shared ensure → encode → query → format pipeline for both
        modalities (only the encoder call and stats key differ)."""
        await asyncio.to_thread(self._ensure)
        if self._store.count() == 0:
            return []
        emb = await asyncio.to_thread(encode, [payload])
        res = await asyncio.to_thread(
            self._store.query, np.asarray(emb), k, ("metadatas", "distances")
        )
        self.stats[stat_key] += 1
        return self._format(res)

    async def search_text(self, query: str, k: int = 5) -> List[Dict]:
        """Text → figures (the cross-modal direction RAG needs)."""
        await asyncio.to_thread(self._ensure)
        return await self._search(
            self._encoder.encode_texts, query, "text_queries", k
        )

    async def search_image(self, image_bytes: bytes, k: int = 5) -> List[Dict]:
        """Image → similar figures."""
        await asyncio.to_thread(self._ensure)
        return await self._search(
            self._encoder.encode_images, image_bytes, "image_queries", k
        )

    # -- maintenance ---------------------------------------------------------

    async def delete_document(self, doc_id: str) -> int:
        if self._store is None:
            return 0
        return await asyncio.to_thread(
            self._store.delete, None, {"doc_id": doc_id}
        )

    async def delete_all(self) -> None:
        if self._store is not None:
            await asyncio.to_thread(self._store.delete_all)

    def get_stats(self) -> Dict[str, Any]:
        return {
            **self.stats,
            "figures": self._store.count() if self._store else 0,
            "encoder": type(self._encoder).__name__ if self._encoder else None,
            "ready": self.ready,
        }

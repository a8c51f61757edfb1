"""Embedding store: persistent collections with exact cosine top-k."""

from multimodal_embeddings_tpu.store.embedding_store import (
    Client,
    Collection,
    get_embedding_from_db,
    initialize_db,
)

from .executor import BatchingSearchExecutor
from .matrix import INT4, EmbeddingMatrix, chunk_key, deserialize_embedding, key_item, serialize_embedding
from .searcher import SearchResult, Searcher

__all__ = [
    "BatchingSearchExecutor",
    "EmbeddingMatrix",
    "INT4",
    "serialize_embedding",
    "deserialize_embedding",
    "chunk_key",
    "key_item",
    "Searcher",
    "SearchResult",
]

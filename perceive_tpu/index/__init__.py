from .matrix import EmbeddingMatrix, deserialize_embedding, serialize_embedding
from .searcher import SearchResult, Searcher

__all__ = [
    "EmbeddingMatrix",
    "serialize_embedding",
    "deserialize_embedding",
    "Searcher",
    "SearchResult",
]

"""Contract layer: the protocols every component types against.

Mirrors the reference's protocol-first layering (reference: src/mlvectordb/interfaces/*.py)
while widening the contracts to the full capability surface the reference *documents*
(range search, metadata filters, true upsert, sharding/replication — see SURVEY.md §0.1).
"""

from .vector import VectorDTO, VectorProtocol
from .index import SearchResultProtocol, SearchIndexProtocol
from .storage_engine import StorageEngineProtocol
from .query_processor import QueryProcessorProtocol

__all__ = [
    "VectorDTO",
    "VectorProtocol",
    "SearchResultProtocol",
    "SearchIndexProtocol",
    "StorageEngineProtocol",
    "QueryProcessorProtocol",
]

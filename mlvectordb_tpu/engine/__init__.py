"""Query engine: the L2 orchestration layer (write/read/search paths)."""

from .query_processor import QueryProcessor, QueryStats
from .filters import matches_filter, FilterMaskCache

__all__ = ["QueryProcessor", "QueryStats", "matches_filter", "FilterMaskCache"]

"""HTTP surface: aiohttp REST API + server CLI."""

from .rest_api import RestAPI

__all__ = ["RestAPI"]

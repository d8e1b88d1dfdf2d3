from .registry import REGISTRY, QueryDef, query

# importing the modules populates REGISTRY
from . import parity  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import textdata  # noqa: E402,F401

__all__ = ["REGISTRY", "QueryDef", "query"]

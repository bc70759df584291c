from .filters import BloomFilter, CuckooFilter
from .frontier import Frontier, FrontierConfig

__all__ = ["BloomFilter", "CuckooFilter", "Frontier", "FrontierConfig"]

from .filters import BloomFilter, CuckooFilter
from .frontier import Frontier, FrontierConfig

__all__ = ["BloomFilter", "CuckooFilter", "Frontier", "FrontierConfig"]


import forum_dl_ray as _fdr

_fdr.ship_by_value()

from .crawler import CrawlConfig, Crawler, crawl_fixture

__all__ = ["CrawlConfig", "Crawler", "crawl_fixture"]


import forum_dl_ray as _fdr

_fdr.ship_by_value()

from .crawler import CrawlConfig, Crawler, crawl_fixture

__all__ = ["CrawlConfig", "Crawler", "crawl_fixture"]

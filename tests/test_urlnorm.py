import numpy as np
import pytest

from forum_dl_ray.urlnorm import (
    get_relative_url,
    host_of,
    normalize_url,
    url_hash64,
    url_hash64_array,
)


def test_normalize_strips_index_php_and_appends_slash():
    assert normalize_url("https://f.example/forum/index.php") == "https://f.example/forum/"
    assert normalize_url("https://f.example/forum") == "https://f.example/forum/"
    assert normalize_url("https://f.example/forum/") == "https://f.example/forum/"


def test_normalize_drops_query_params_and_fragment():
    assert (
        normalize_url("https://f.example/t/1?sid=abc&x=1#post-9") == "https://f.example/t/1/"
    )


def test_normalize_keeps_whitelisted_queries_no_slash():
    out = normalize_url("https://f.example/board?page=3&sid=zzz", keep_queries=("page",))
    assert out == "https://f.example/board?page=3"


def test_normalize_suffix_kept_when_queries_whitelisted_and_present():
    # parity with reference: suffixes only stripped when no kept query
    out = normalize_url("https://f.example/index.php?page=2", keep_queries=("page",))
    assert out == "https://f.example/index.php?page=2"


def test_relative_url_same_site_filter():
    assert get_relative_url("https://f.example/forum/t/1", "https://f.example/forum") == "t/1"
    with pytest.raises(ValueError):
        get_relative_url("https://f.example/elsewhere/t/1", "https://f.example/forum")


def test_host_of():
    assert host_of("https://hot.delta.test/x/y") == "hot.delta.test"


def test_hash64_stable_and_batch_consistent():
    urls = [f"https://h{i}.example/p/{i}" for i in range(100)]
    batch = url_hash64_array(urls)
    assert batch.dtype == np.int64
    assert [url_hash64(u) for u in urls] == batch.tolist()
    assert url_hash64("https://a.example/") == url_hash64("https://a.example/")
    assert len(set(batch.tolist())) == 100


def test_join_canon_equals_slow_path():
    from urllib.parse import urljoin

    from forum_dl_ray.urlnorm import join_canon, normalize_url

    cases = [
        ("/thread/t3", "http://alpha.test/board/b1/", ("page",)),
        ("/board/b1?page=2", "http://alpha.test/", ("page",)),
        ("/img/x-im00001.png", "http://hot.delta.test/thread/t9?page=3", ()),
        ("http://beta.test/index.php", "http://alpha.test/", ()),
        ("/", "http://alpha.test/", ("page",)),
        ("/api/t/t1/posts.json?ids=1,2,3", "http://s.test/api/index.json", ("page", "ids")),
        ("rel/path", "http://alpha.test/a/b/", ()),
        ("/a/index.php", "http://alpha.test/", ()),
        ("/a#frag", "http://alpha.test/", ()),
    ]
    for href, base, keep in cases:
        assert join_canon(href, base, keep) == normalize_url(
            urljoin(base, href), keep_queries=keep
        ), (href, base, keep)

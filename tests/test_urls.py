import pandas as pd

from web_crawler_spark.core.urls import canonicalize_series, host_of_series, path_of_series

KNOWN = [
    ("HTTP://Example.COM:80/a/b#frag", "http://example.com/a/b"),
    ("https://h.example:443/x", "https://h.example/x"),
    ("http://h.example/a/./b", "http://h.example/a/b"),
    ("http://h.example/a/c/../b", "http://h.example/a/b"),
    ("http://h.example//a///b", "http://h.example/a/b"),
    ("http://h.example/p?b=2&a=1", "http://h.example/p?a=1&b=2"),
    ("http://h.example/p?utm_source=x&a=1&fbclid=z", "http://h.example/p?a=1"),
    ("http://h.example/p?utm_source=x", "http://h.example/p"),
    ("http://h.example", "http://h.example/"),
    ("  http://h.example/a  ", "http://h.example/a"),
]


def test_known_pairs():
    got = canonicalize_series(pd.Series([a for a, _ in KNOWN]))
    for (raw, want), g in zip(KNOWN, got):
        assert g == want, f"{raw!r}: got {g!r}, want {want!r}"


def test_idempotent():
    once = canonicalize_series(pd.Series([a for a, _ in KNOWN]))
    twice = canonicalize_series(once)
    assert list(once) == list(twice)


def test_host_path_extract():
    s = pd.Series(["http://h7.example/a/b?x=1", "https://h.example/"])
    assert list(host_of_series(s)) == ["h7.example", "h.example"]
    assert list(path_of_series(s)) == ["/a/b", "/"]

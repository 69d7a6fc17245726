"""robots.txt parser (sources/robots.py): grammar, group selection, and
the Spark ingestion path."""

from web_crawler_spark.sources.robots import load_robots_txt_dir, parse_robots_txt


def test_parse_basic_group():
    txt = """# comment
User-agent: *
Disallow: /private
Disallow: /tmp
Crawl-delay: 2
"""
    r = parse_robots_txt(txt)
    assert r == {"disallow": ["/private", "/tmp"], "crawl_delay": 2.0}


def test_specific_agent_group_wins_over_star():
    txt = """User-agent: *
Disallow: /
User-agent: wcs-crawler
Disallow: /only-this
Crawl-delay: 1
"""
    r = parse_robots_txt(txt, agent="wcs-crawler")
    assert r == {"disallow": ["/only-this"], "crawl_delay": 1.0}
    other = parse_robots_txt(txt, agent="googlebot")
    assert other["disallow"] == ["/"]


def test_stacked_agents_share_group_and_empty_disallow():
    txt = """User-agent: a
User-agent: b
Disallow:
"""
    assert parse_robots_txt(txt, agent="a") == {"disallow": [], "crawl_delay": 0.0}
    assert parse_robots_txt("", agent="x") == {"disallow": [], "crawl_delay": 0.0}


def test_spark_ingestion_matches_fixture_json(spark, fix_dir):
    import json

    with open(f"{fix_dir}/robots.json") as f:
        want = json.load(f)
    got = {r.host: (list(r.disallow), float(r.crawl_delay))
           for r in load_robots_txt_dir(spark, f"{fix_dir}/robots_txt").collect()}
    assert set(got) == set(want)
    for host, (dis, delay) in got.items():
        assert dis == want[host]["disallow"], host
        assert delay == float(want[host]["crawl_delay"]), host

"""web_crawler_spark — a from-scratch PySpark-native crawl-analytics engine.

Capabilities mirror MaticBernik/web_crawler (reference snapshot empty at
survey time; binding behavioral spec: BASELINE.json north_rule — see
SURVEY.md §0): a distributed URL frontier + fetch scheduler with
canonicalized-URL seen set, per-host politeness buckets with robots.txt
gating, priority frontier, and MinHash/pHash near-duplicate rejection over
image+caption rows — re-expressed Spark-first (DataFrame/Catalyst/AQE),
not a port.
"""

__version__ = "0.1.0"

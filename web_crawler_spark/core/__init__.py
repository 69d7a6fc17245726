"""Pure-Python/numpy core shared by the Spark engine (inside pandas UDFs)
and the reference oracle (oracle/refcrawler.py). No pyspark imports here —
this is what guarantees bit-exact agreement between the two (BASELINE.json:
crawl-order + seen-set match = 100%)."""

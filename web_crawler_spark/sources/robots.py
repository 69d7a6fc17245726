"""robots.txt ingestion (SURVEY.md S4): real robots.txt text → the
engine's per-host gating table (host, disallow[], crawl_delay).

The reference gates fetches with urllib.robotparser over live robots.txt
(north_star: "per-host politeness buckets with robots.txt gating"); in
this engine the fetched robots.txt bodies land as text files (one per
host, `<host>.txt`) and are parsed VECTORIZED — a pandas UDF over
whole-file rows — into the broadcastable dimension table the crawl loop
joins against. Grammar: User-agent groups, Disallow prefixes,
Crawl-delay; the most specific matching group wins ('*' fallback),
matching urllib.robotparser's group-selection behavior.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F, types as T


def parse_robots_txt(text: str, agent: str = "wcs-crawler") -> dict:
    """Parse one robots.txt body for `agent`. Returns
    {"disallow": [prefixes...], "crawl_delay": float}."""
    groups: list[tuple[list[str], list[str], float | None]] = []
    cur_agents: list[str] = []
    cur_dis: list[str] = []
    cur_delay: float | None = None
    in_group_body = False

    def flush():
        nonlocal cur_agents, cur_dis, cur_delay, in_group_body
        if cur_agents:
            groups.append((cur_agents, cur_dis, cur_delay))
        cur_agents, cur_dis, cur_delay, in_group_body = [], [], None, False

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if in_group_body:
                flush()
            cur_agents.append(val.lower())
        elif key == "disallow":
            in_group_body = True
            if val:
                cur_dis.append(val)
        elif key == "crawl-delay":
            in_group_body = True
            try:
                cur_delay = float(val)
            except ValueError:
                pass
        elif key == "allow":
            in_group_body = True  # recognized; prefix-gating ignores Allow
    flush()

    agent = agent.lower()
    best: tuple[int, list[str], float | None] | None = None
    for agents, dis, delay in groups:
        for a in agents:
            if a == "*":
                score = 0
            elif a in agent:  # one-way substring, mirroring robotparser
                score = len(a)
            else:
                continue
            if best is None or score > best[0]:
                best = (score, dis, delay)
    if best is None:
        return {"disallow": [], "crawl_delay": 0.0}
    return {"disallow": best[1], "crawl_delay": best[2] if best[2] is not None else 0.0}


_OUT = T.StructType([
    T.StructField("disallow", T.ArrayType(T.StringType())),
    T.StructField("crawl_delay", T.DoubleType()),
])


def load_robots_txt_dir(spark: SparkSession, txt_dir: str,
                        agent: str = "wcs-crawler") -> DataFrame:
    """<txt_dir>/<host>.txt files → DataFrame(host, disallow, crawl_delay).
    Whole files as rows; parsing is an Arrow-batched pandas UDF (the
    per-host robots corpus at crawl scale is millions of small files —
    parsed where the data is, only the dimension table comes back)."""

    @F.pandas_udf(_OUT)
    def parse_udf(texts: pd.Series) -> pd.DataFrame:
        parsed = [parse_robots_txt(t or "", agent) for t in texts]
        return pd.DataFrame(parsed)

    files = (
        spark.read.text(os.path.join(txt_dir, "*.txt"), wholetext=True)
        .withColumn("file", F.input_file_name())
        .withColumn("host", F.regexp_extract("file", r"([^/]+)\.txt$", 1))
    )
    return (
        files.withColumn("p", parse_udf("value"))
        .select("host", F.col("p.disallow").alias("disallow"),
                F.col("p.crawl_delay").alias("crawl_delay"))
    )

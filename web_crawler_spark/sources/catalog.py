"""ManifestCatalog — Iceberg-semantics table layer without the Iceberg jar.

The north_rule requires Iceberg tables with snapshot checkpoints and
resume; the Iceberg runtime jar is absent in this sandbox (SURVEY.md §7.3),
so this catalog provides the same semantics over parquet directories:

- every table write creates a NEW immutable version directory
  (``tables/<name>/v<k>``) — never in-place mutation;
- a round commit atomically publishes ``manifest.json`` (tmp + os.replace)
  pinning one version per table plus the engine counters — readers always
  see a consistent snapshot;
- resume = read the manifest, continue from ``round + 1``;
- time travel = read any older ``manifest-r<k>.json``.

On a real cluster the same interface is backed by Iceberg
(``writeTo(...).append()`` / snapshot-id pinned reads) — the engine code
only talks to this interface.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class ManifestCatalog:
    def __init__(self, spark: SparkSession, run_dir: str):
        self.spark = spark
        self.run_dir = run_dir
        self.tables_dir = os.path.join(run_dir, "tables")
        os.makedirs(self.tables_dir, exist_ok=True)
        self.manifest: dict = {"round": -1, "versions": {}, "appends": {}, "counters": {}}
        mpath = os.path.join(run_dir, "manifest.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                self.manifest = json.load(f)
            self.manifest.setdefault("appends", {})

    # -- reads ------------------------------------------------------------
    def exists(self, name: str) -> bool:
        return name in self.manifest["versions"] or name in self.manifest["appends"]

    def read(self, name: str) -> DataFrame:
        if name in self.manifest["appends"]:
            parts = [os.path.join(self.tables_dir, name, f"v{v}")
                     for v in self.manifest["appends"][name]]
            return self.spark.read.parquet(*parts)
        v = self.manifest["versions"][name]
        return self.spark.read.parquet(os.path.join(self.tables_dir, name, f"v{v}"))

    def counters(self) -> dict:
        return dict(self.manifest["counters"])

    @property
    def round(self) -> int:
        return int(self.manifest["round"])

    # -- writes -----------------------------------------------------------
    def stage(self, name: str, df: DataFrame, partitions: int | None = None) -> int:
        """Write a new version of ``name``; becomes visible only at commit."""
        v = int(self.manifest["versions"].get(name, -1)) + 1
        path = os.path.join(self.tables_dir, name, f"v{v}")
        w = df.coalesce(partitions) if partitions else df
        w.write.mode("overwrite").parquet(path)
        self._staged = getattr(self, "_staged", {})
        self._staged[name] = v
        return v

    def append(self, name: str, df: DataFrame, partitions: int | None = None) -> int:
        """Append-only table: write ONLY the delta as a new part (Iceberg
        append semantics — no rewrite amplification for logs/metrics/seen)."""
        prior = self.manifest["appends"].get(name, [])
        staged = getattr(self, "_staged_appends", {})
        v = (max(prior + staged.get(name, [])) + 1) if (prior or staged.get(name)) else 0
        path = os.path.join(self.tables_dir, name, f"v{v}")
        w = df.coalesce(partitions) if partitions else df
        w.write.mode("overwrite").parquet(path)
        self._staged_appends = staged
        staged.setdefault(name, []).append(v)
        return v

    def commit(self, round_no: int, counters: dict) -> None:
        staged = getattr(self, "_staged", {})
        self.manifest["versions"].update(staged)
        for name, vs in getattr(self, "_staged_appends", {}).items():
            self.manifest["appends"].setdefault(name, []).extend(vs)
        self._staged_appends = {}
        self.manifest["round"] = round_no
        self.manifest["counters"] = counters
        tmp = os.path.join(self.run_dir, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(self.manifest, f)
        # atomic publish + retained per-round snapshot (time travel / audit)
        os.replace(tmp, os.path.join(self.run_dir, "manifest.json"))
        shutil.copyfile(
            os.path.join(self.run_dir, "manifest.json"),
            os.path.join(self.run_dir, f"manifest-r{round_no}.json"),
        )
        self._staged = {}

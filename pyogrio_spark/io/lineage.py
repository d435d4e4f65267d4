"""Per-partition lineage + checkpoint/resume (north_rule requirement).

A long pipeline stage over 10^12 docs is split into deterministic work
units keyed by cell range. Each completed unit commits (a) its output
rows and (b) one lineage row: (stage, unit_key, input_snapshot,
row_count, digest). Resume = anti-join the full unit list against
completed lineage — a killed job re-runs only missing units, and the
digest detects input drift. Mirrors, at cluster scale, the transaction
guarantee the reference gets from GDAL drivers
(/root/reference/pyogrio/_io.pyx:3059-3061).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyogrio_spark.io.writer import _atomic_write_manifest, _read_manifest, write_table


class StageCheckpoint:
    """Checkpointed execution of one pipeline stage, unit-by-unit."""

    def __init__(self, spark: SparkSession, root: str, stage: str, input_snapshot: str = ""):
        self.spark = spark
        self.root = os.path.join(root, stage)
        self.stage = stage
        self.input_snapshot = input_snapshot
        os.makedirs(self.root, exist_ok=True)

    # lineage is tiny (one row per unit) — a json sidecar, atomically swapped
    def _lineage_path(self) -> str:
        return os.path.join(self.root, "_lineage.json")

    def completed(self) -> dict[str, dict]:
        p = self._lineage_path()
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return json.load(f)

    def pending(self, unit_keys: list[str]) -> list[str]:
        done = self.completed()
        return [
            k for k in unit_keys
            if k not in done or done[k].get("input_snapshot") != self.input_snapshot
        ]

    def run_unit(self, unit_key: str, produce: Callable[[], DataFrame]) -> dict:
        """Execute one unit if not already committed *for this input
        snapshot*; a completed unit whose recorded input_snapshot differs
        is stale (input drifted since the kill) and re-runs."""
        done = self.completed()
        if unit_key in done and done[unit_key].get("input_snapshot") == self.input_snapshot:
            return done[unit_key]
        out = produce()
        unit_dir = os.path.join(self.root, "units", unit_key.replace("/", "_"))
        snap = write_table(out, unit_dir, mode="overwrite")
        committed = _read_manifest(unit_dir)["current"]
        row = {
            "stage": self.stage,
            "unit_key": unit_key,
            "input_snapshot": self.input_snapshot,
            "output_snapshot": snap,
            "row_count": committed["row_count"],
            "digest": snap,  # snapshot id is content-derived
        }
        done = self.completed()
        done[unit_key] = row
        tmp = self._lineage_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(done, f, indent=1, sort_keys=True)
        os.replace(tmp, self._lineage_path())
        return row

    def read_output(self) -> DataFrame:
        done = self.completed()
        if not done:
            raise FileNotFoundError(f"stage {self.stage}: no completed units")
        from pyogrio_spark.io.writer import read_committed

        dfs = [read_committed(self.spark, os.path.join(self.root, "units", k.replace("/", "_"))) for k in sorted(done)]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out


def cell_range_units(df: DataFrame, cell_col: str = "cell_id", n_units: int = 16) -> list[tuple[str, int, int]]:
    """Split a table into ~equal-row contiguous cell ranges (the stage's
    deterministic work units). Uses approx quantiles — one cheap pass."""
    qs = [i / n_units for i in range(n_units + 1)]
    cuts = df.approxQuantile(cell_col, qs, 0.001)
    cuts = sorted(set(int(c) for c in cuts))
    units = []
    for i in range(len(cuts) - 1):
        lo, hi = cuts[i], cuts[i + 1]
        units.append((f"cells_{lo}_{hi}", lo, hi))
    return units


def unit_filter(df: DataFrame, lo: int, hi: int, last: bool, cell_col: str = "cell_id") -> DataFrame:
    cond = (F.col(cell_col) >= lo) & (F.col(cell_col) < hi) if not last else (F.col(cell_col) >= lo) & (F.col(cell_col) <= hi)
    return df.filter(cond)

"""Metrics as data: per-stage counters written to Parquet, replacing the
reference's driver-resident scalar counters and rich console panels
(``duplicate_face.py:29-31,231-248``)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


class MetricsSink:
    def __init__(self):
        self.rows: list[tuple] = []

    def add(self, stage: str, counter: str, value: int):
        self.rows.append((stage, counter, int(value)))

    def table(self) -> pa.Table:
        s, c, v = zip(*self.rows) if self.rows else ((), (), ())
        return pa.table(
            {
                "stage": pa.array(list(s), pa.string()),
                "counter": pa.array(list(c), pa.string()),
                "value": pa.array(list(v), pa.int64()),
            }
        )

    def write(self, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        pq.write_table(self.table(), os.path.join(out_dir, "metrics.parquet"))

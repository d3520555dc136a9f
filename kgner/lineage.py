"""Per-stage lineage/metrics (north-rule requirement).

Each pipeline stage records (stage, rows_in, rows_out, wall_ms, status) into
`lineage` rows appended under the workdir. Row counts come from
`df.observe()` — collected as a side effect of the stage's own write action,
NOT from extra count() jobs, so lineage adds no passes over the data.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


@dataclass
class StageRecord:
    stage: str
    rows_out: int
    wall_ms: int
    status: str
    run_id: str
    inputs: tuple[str, ...] = ()  # upstream stages/tables; rows_in of this
    # stage = rows_out of each input's record (stages are table-to-table)


class LineageLog:
    def __init__(self, workdir: str):
        self.dir = os.path.join(workdir, "_lineage")
        os.makedirs(self.dir, exist_ok=True)
        self.run_id = uuid.uuid4().hex[:12]

    def record(self, rec: StageRecord) -> None:
        path = os.path.join(self.dir, f"{rec.stage}.json")
        with open(path, "w") as f:
            json.dump(asdict(rec), f)

    def observed_write(
        self, stage: str, df: DataFrame, write_fn, inputs: tuple[str, ...] = ()
    ) -> None:
        """Run write_fn(df_with_observation); capture row count + wall time."""
        obs = Observation(f"lineage_{stage}")
        t0 = time.monotonic()
        write_fn(df.observe(obs, F.count(F.lit(1)).alias("rows")))
        wall = int((time.monotonic() - t0) * 1000)
        rows = int(obs.get.get("rows", 0))
        self.record(StageRecord(stage, rows, wall, "ok", self.run_id, inputs))

    def read_all(self) -> list[dict]:
        out = []
        for fn in sorted(os.listdir(self.dir)):
            if fn.endswith(".json"):
                with open(os.path.join(self.dir, fn)) as f:
                    out.append(json.load(f))
        return out

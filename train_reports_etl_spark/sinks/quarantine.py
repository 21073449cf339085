"""Quarantine and snapshot sinks (S8).

The reference writes error rows, duplicates, and a pre-load snapshot of
the full cleaned frame as zipped CSVs
(`reports_exporter_v0.83.py:601-603,1778-1780,1793-1797`). Spark form:
compressed CSV directories (gzip — zip is not a native codec; same
audit purpose). One job writes each side-output; callers should persist
the parent frame before fanning out so the pipeline runs once.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame


def write_quarantine(
    df: DataFrame,
    base_dir: str,
    report: str,
    kind: str,
    timestamp: str | None = None,
    compression: str = "gzip",
) -> str:
    """Write one quarantine side-output (error rows / duplicates /
    snapshot) as compressed CSV; returns the output path.

    Path shape mirrors the reference's
    ``export/<report> <kind> <ts>.csv.zip`` naming (`:601-603`).
    """
    ts = timestamp or time.strftime("%Y%m%d-%H%M%S")
    path = f"{base_dir}/{report}_{kind}_{ts}"
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("compression", compression)
        .csv(path)
    )
    return path

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


def write_quarantine_zip(
    df: DataFrame,
    base_dir: str,
    report: str,
    kind: str,
    timestamp: str | None = None,
) -> str:
    """S8 byte-format parity: ONE real ``.zip`` container per
    side-output, named ``<report> <kind> <ts>.csv.zip`` exactly like
    the reference (`reports_exporter_v0.83.py:601-603,1778-1780`) —
    a consumer of the reference's quarantine files can open these with
    the same tooling. Inside: one CSV member per Spark partition
    (``part-00000.csv`` ...), so the distributed write order is
    preserved without a single-threaded collect.

    Mechanism: executors write plain CSV parts (distributed), then the
    driver streams each part file into a stdlib ``zipfile`` container —
    O(bytes) driver I/O but zero row materialization. Quarantine
    outputs are error/duplicate slices, orders of magnitude smaller
    than the data; for full-corpus snapshots at scale prefer
    :func:`write_quarantine` (native gzip CSV, fully distributed).
    """
    import glob
    import os
    import shutil
    import zipfile

    ts = timestamp or time.strftime("%Y%m%d-%H%M%S")
    tmp = f"{base_dir}/.__zip_tmp_{report}_{kind}_{ts}"
    (
        df.write.mode("overwrite")
        .option("header", "true")
        # RFC-4180 doubled quotes, matching pandas to_csv (the
        # reference's writer) — Spark's default backslash-escape is
        # not what a csv.reader of the reference's files expects.
        .option("escape", '"')
        .csv(tmp)
    )
    out = f"{base_dir}/{report} {kind} {ts}.csv.zip"
    parts = sorted(glob.glob(os.path.join(tmp, "part-*")))
    with zipfile.ZipFile(out, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        for i, p in enumerate(parts):
            zf.write(p, arcname=f"part-{i:05d}.csv")
    shutil.rmtree(tmp)
    return out

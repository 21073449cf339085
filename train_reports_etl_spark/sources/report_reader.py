"""Report ingestion: discover → sniff → typed all-string read (S1–S4).

The reference enumerates ``*.xlsx`` in the working directory, sniffs
every sheet, and reads matching sheets as all-string frames
(`reports_exporter_v0.83.py:1684-1724,522-528`). Excel is an inherently
driver-side format (no splittable readers in this container — the
``com.crealytics:spark-excel`` datasource would slot in on a real
cluster); the scalable pattern used here is:

- the *file/sheet list* is the parallel unit (the reference's dead-code
  ``ParallelPool`` idea, `Old/reports_exporter_v0.82.ipynb:484-554`,
  done properly): sheets are read per-task and unioned;
- each sheet becomes an all-string DataFrame with the exact sniffed
  header, feeding the same pipeline as any other source;
- for tests and bulk data the same entry points accept CSV/parquet,
  where Spark's native splittable readers take over.
"""

from __future__ import annotations

import os
from collections.abc import Iterable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from train_reports_etl_spark.operators.union import union_all
from train_reports_etl_spark.sources.sniffer import PROBE_DEPTH, SniffResult, sniff_rows

try:  # optional: openpyxl/xlrd are not in this container
    import openpyxl  # noqa: F401

    HAVE_EXCEL = True
except ImportError:
    HAVE_EXCEL = False


@dataclass(frozen=True)
class SheetRef:
    """One discovered (file, sheet) input and its sniff result."""

    path: str
    sheet: str
    sniff: SniffResult


def discover_files(directory: str, pattern: str = ".xlsx") -> list[str]:
    """S1 — enumerate candidate report files (driver-side listing; at
    scale this is an object-store listing, still a metadata op)."""
    return sorted(
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if f.lower().endswith(pattern) and not f.startswith("~")
    )


def _iter_sheets(path: str) -> Iterable[tuple[str, list[list]]]:
    """Yield (sheet_name, first PROBE_DEPTH rows) per sheet."""
    if not HAVE_EXCEL:
        raise NotImplementedError(
            "Excel ingestion requires openpyxl (not in this container); "
            "use csv/parquet inputs or install an excel reader."
        )
    wb = openpyxl.load_workbook(path, read_only=True, data_only=True)
    try:
        for name in wb.sheetnames:
            ws = wb[name]
            rows = []
            for i, row in enumerate(ws.iter_rows(values_only=True)):
                if i >= PROBE_DEPTH:
                    break
                rows.append(list(row))
            yield name, rows
    finally:
        wb.close()


def discover_reports(directory: str) -> dict[str, list[SheetRef]]:
    """S1+S2 — sniff every sheet of every file; group by report type
    (`reports_exporter_v0.83.py:1690-1724`). Unknown sheets are skipped.
    """
    found: dict[str, list[SheetRef]] = {}
    for path in discover_files(directory):
        for sheet, rows in _iter_sheets(path):
            res = sniff_rows(rows)
            if res is not None:
                found.setdefault(res.report_type, []).append(SheetRef(path, sheet, res))
    return found


def read_sheet_as_strings(spark: SparkSession, ref: SheetRef) -> DataFrame:
    """S3 — typed all-string read of one sniffed sheet: header from the
    sniffed row, every value stringified (dtype=str parity,
    `reports_exporter_v0.83.py:522-528`). Downstream coercion is the
    pipelines' job (F1/F2)."""
    if not HAVE_EXCEL:
        raise NotImplementedError("Excel ingestion requires openpyxl")
    import openpyxl as _oxl

    wb = _oxl.load_workbook(ref.path, read_only=True, data_only=True)
    try:
        ws = wb[ref.sheet]
        it = ws.iter_rows(values_only=True)
        for _ in range(ref.sniff.header_row):
            next(it)
        header = [str(c) if c is not None else f"Unnamed: {i}" for i, c in enumerate(next(it))]
        data = [
            [None if c is None else str(c) for c in row]
            for row in it
        ]
    finally:
        wb.close()
    schema = StructType([StructField(name, StringType(), True) for name in header])
    return spark.createDataFrame(data, schema=schema)


def read_report(
    spark: SparkSession, refs: list[SheetRef]
) -> DataFrame:
    """S4/U1 — read all sheets of one report type and union them.

    Sheet reads are independent; with an excel datasource each becomes
    its own input split. Here they are read sequentially on the driver
    then unioned (the union itself is lazy/narrow)."""
    return union_all([read_sheet_as_strings(spark, r) for r in refs])


def read_report_csv(spark: SparkSession, paths: list[str]) -> DataFrame:
    """CSV variant of the same contract: all-string schema, header row,
    splittable + distributed (the test/bulk path)."""
    return (
        spark.read.option("header", "true")
        .option("inferSchema", "false")
        .csv(paths)
    )

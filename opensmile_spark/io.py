"""Sources & sinks — the cDataSource/cDataSink surface (SURVEY.md §2.1).

The reference's IO components are scans/appenders with small option sets;
their Spark equivalents are thin, but the option *semantics* are preserved:

  cCsvSource (/root/reference/src/iocore/csvSource.cpp:43-51): delimiter,
      header auto/yes/no, line range start/end -> csv_source
  cCsvSink (csvSink.cpp:40-53): header, per-frame append, `lag` delayed
      emission, timestamp/index columns -> csv_sink (lag -> drop the last
      `lag` rows per conv: in batch, delayed emission == not-yet-emittable)
  cDatadumpSink / cDataPrintSink (datadumpSink.cpp:45-47) -> parquet_dump
  cNullSink (nullSink.cpp) -> null_sink (forces evaluation, noop write)
  cWaveSinkCut (waveSinkCut.cpp: write each detected turn as a file)
      -> partitioned_sink (partitionBy session)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def csv_source(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    header: str = "auto",
    start: int | None = None,
    end: int | None = None,
    schema=None,
) -> DataFrame:
    """CSV scan with the reference's option set. start/end are 0-based line
    ranges (csvSource.cpp:47-48); they imply a file order, so they are
    applied via a monotonic index on a single-file read — a scan-range
    pushdown at the reader level, like the reference."""
    reader = spark.read.option("sep", delimiter)
    if header == "auto":
        reader = reader.option("header", True).option("inferSchema", schema is None)
    else:
        reader = reader.option("header", header in ("yes", "true", True))
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.csv(path)
    if start is not None or end is not None:
        w = Window.orderBy(F.monotonically_increasing_id())
        df = df.withColumn("__line", F.row_number().over(w) - 1)
        if start is not None:
            df = df.filter(F.col("__line") >= start)
        if end is not None:
            df = df.filter(F.col("__line") <= end)
        df = df.drop("__line")
    return df


def csv_sink(
    df: DataFrame,
    path: str,
    header: bool = True,
    lag: int = 0,
    add_index: bool = False,
    partition_cols=("conv_id",),
    order_col: str = "turn_idx",
    mode: str = "overwrite",
) -> None:
    """CSV writer; lag>0 withholds the trailing `lag` frames per conv
    (csvSink.cpp:42 delayed emission)."""
    out = df
    if lag > 0:
        w = Window.partitionBy(*partition_cols).orderBy(F.col(order_col).desc())
        out = out.withColumn("__rev", F.row_number().over(w)) \
            .filter(F.col("__rev") > lag).drop("__rev")
    if add_index:
        w = Window.partitionBy(*partition_cols).orderBy(order_col)
        out = out.withColumn("frameIndex", F.row_number().over(w) - 1)
    out.write.mode(mode).option("header", header).csv(path)


def parquet_dump(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def null_sink(df: DataFrame) -> None:
    """Force full evaluation, discard output (cNullSink)."""
    df.write.format("noop").mode("overwrite").save()


def partitioned_sink(df: DataFrame, path: str,
                     partition_cols=("conv_id", "session_id"),
                     mode: str = "overwrite") -> None:
    """One directory per detected segment (cWaveSinkCut analogue)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)

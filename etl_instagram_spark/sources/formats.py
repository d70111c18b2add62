"""Multi-format source readers with corrupt-record dead-lettering.

The engine's landing data arrives as parquet (the test tables), JSON
lines (scraped payload dumps), or CSV (exported rate sheets). All three
read through one helper with an EXPLICIT schema (no inference pass) and
PERMISSIVE parsing: malformed rows land in a ``_corrupt_record`` column
instead of failing the job (E3, SURVEY §1.4 "permissive mode +
_corrupt_record"), and ``split_corrupt`` routes them to the dead-letter
side exactly like the sentinel filter does for pages.

Scale notes: explicit schemas keep ingestion single-pass; for CSV/JSON
the text scan parallelizes by file split; corrupt rows cost nothing
extra (the parser already visited them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_landing(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema_ddl: str,
    csv_header: bool = True,
) -> DataFrame:
    """Read a landing directory in ``parquet`` | ``orc`` | ``json`` |
    ``csv`` with an explicit schema; json/csv attach
    ``_corrupt_record`` (the binary columnar formats have no permissive
    row mode — a corrupt file fails loudly, which is the correct
    dead-letter granularity for self-describing formats)."""
    if fmt == "parquet":
        return spark.read.schema(schema_ddl).parquet(path)
    if fmt == "orc":
        return spark.read.schema(schema_ddl).orc(path)
    schema_with_corrupt = f"{schema_ddl}, {CORRUPT_COL} STRING"
    if fmt == "json":
        return (
            spark.read.schema(schema_with_corrupt)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
    if fmt == "csv":
        return (
            spark.read.schema(schema_with_corrupt)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .option("header", str(csv_header).lower())
            .csv(path)
        )
    raise ValueError(f"unsupported landing format {fmt!r}")


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, dead_letter_rows). Clean rows
    drop the corrupt column; dead rows keep only it plus any populated
    key columns for triage."""
    if CORRUPT_COL not in df.columns:
        return df, df.limit(0)
    # permissive json/csv needs the corrupt column materialized before
    # filtering on it (Spark requires a persistence boundary here).
    # localCheckpoint instead of cache(): cached plans pin executor
    # memory in the CacheManager until an explicit unpersist — which no
    # caller can be trusted to pair per ingestion tick — while local
    # checkpoint blocks are garbage-collected with the DataFrame.
    df = df.localCheckpoint(eager=True)
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    dead = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, dead

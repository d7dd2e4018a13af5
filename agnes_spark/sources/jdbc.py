"""JDBC database source/sink.

Closes reference FUTURE.md "Additional source types: Databases" with
what the sandbox actually ships: Spark's built-in JDBC data source
plus the Derby embedded driver bundled in spark's jars (the gate and
tests run against an embedded Derby instance — no external server
needed; any server database is the same API with its driver jar on
the classpath).

Scale notes baked into the API:
- reads accept (partition_column, lower, upper, num_partitions) so a
  big table arrives as parallel range-partitioned queries instead of
  one executor streaming the whole table through one connection —
  THE difference between a usable and a pathological JDBC ingest.
- `fetchsize` defaults to 10k (most drivers default to tiny row
  batches); `batchsize` likewise for writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(path: str, create: bool = True) -> str:
    """Embedded-Derby JDBC url for a local database directory. Also
    points derby.log at the JVM tempdir (Derby writes it to the CWD
    otherwise) — effective only if the engine isn't booted yet."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is not None:
        import tempfile

        spark._jvm.java.lang.System.setProperty(  # noqa: SLF001
            "derby.stream.error.file",
            tempfile.gettempdir() + "/agnes_derby.log",
        )
    return f"jdbc:derby:{path}" + (";create=true" if create else "")


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str = DERBY_DRIVER,
    partition_column: str | None = None,
    lower: int | None = None,
    upper: int | None = None,
    num_partitions: int = 8,
    fetchsize: int = 10_000,
) -> DataFrame:
    """Read a table (or `(subquery) alias`) over JDBC. With
    `partition_column` (+ lower/upper bounds) the read issues
    `num_partitions` parallel range queries — always set it for
    anything bigger than a dimension table."""
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("fetchsize", str(fetchsize))
    )
    if partition_column is not None:
        if lower is None or upper is None:
            raise ValueError("partition_column requires lower and upper bounds")
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower))
            .option("upperBound", str(upper))
            .option("numPartitions", str(num_partitions))
        )
    return r.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    driver: str = DERBY_DRIVER,
    mode: str = "overwrite",
    batchsize: int = 10_000,
) -> None:
    """Write a DataFrame to a database table over JDBC (one connection
    per partition; `batchsize` rows per INSERT batch)."""
    (
        df.write.mode(mode)
        .format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("batchsize", str(batchsize))
        .save()
    )

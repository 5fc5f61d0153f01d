"""JDBC source/sink — the reference's Postgres-warehouse surface.

The reference ingests CommCare data into Postgres and publishes
aggregate tables back to it. Spark-first equivalents:

- ``read_jdbc``: partitioned parallel reads (partitionColumn/bounds/
  numPartitions) so a 1000-executor cluster fans the table scan out;
  optional pushdown predicate embedded as a dbtable subquery.
- ``write_jdbc``: batched append/overwrite.
- ``merge_sql``: ANSI MERGE for key-based upsert. Spark's JDBC writer
  has no native upsert; the scalable pattern is write-to-staging +
  one server-side MERGE, which this generates.

No database exists in this container, so these are exercised by
option/SQL-construction unit tests; the call surface is standard
``spark.read.format("jdbc")`` so nothing changes against a live DB.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# Identifiers (tables, columns) are interpolated into SQL; restrict to
# plain [schema.]name form so a crafted value can't smuggle SQL in. The
# ``predicate`` string remains free-form by design (that's the pushdown
# surface) — it is the CALLER's obligation that predicates come from
# trusted code, never from end-user input.
_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)?$")


def _check_ident(name: str, what: str) -> str:
    if not _IDENT_RE.match(name):
        raise ValueError(f"unsafe SQL {what}: {name!r}")
    return name


@dataclass
class JdbcConfig:
    url: str
    table: str
    user: str = ""
    password: str = ""
    driver: str = "org.postgresql.Driver"
    fetch_size: int = 10_000
    batch_size: int = 10_000
    num_partitions: int | None = None
    partition_column: str | None = None
    lower_bound: str | None = None
    upper_bound: str | None = None
    extra: dict[str, str] = field(default_factory=dict)


def reader_options(cfg: JdbcConfig, predicate: str | None = None) -> dict[str, str]:
    """Build the option map for a (possibly partitioned) JDBC read.

    ``predicate`` is pushed into the database as a subquery so filtering
    happens server-side, not in Spark.
    """
    table = cfg.table
    if predicate:
        _check_ident(cfg.table, "table name")
        table = f"(SELECT * FROM {cfg.table} WHERE {predicate}) AS src"
    opts = {
        "url": cfg.url,
        "dbtable": table,
        "driver": cfg.driver,
        "fetchsize": str(cfg.fetch_size),
    }
    if cfg.user:
        opts["user"] = cfg.user
    if cfg.password:
        opts["password"] = cfg.password
    partition_opts = (
        cfg.num_partitions,
        cfg.partition_column,
        cfg.lower_bound,
        cfg.upper_bound,
    )
    if any(v is not None for v in partition_opts):
        if any(v is None for v in partition_opts):
            raise ValueError(
                "partitioned JDBC read needs all of num_partitions, "
                "partition_column, lower_bound, upper_bound"
            )
        opts.update(
            {
                "numPartitions": str(cfg.num_partitions),
                "partitionColumn": str(cfg.partition_column),
                "lowerBound": str(cfg.lower_bound),
                "upperBound": str(cfg.upper_bound),
            }
        )
    opts.update(cfg.extra)
    return opts


def writer_options(cfg: JdbcConfig) -> dict[str, str]:
    opts = {
        "url": cfg.url,
        "dbtable": cfg.table,
        "driver": cfg.driver,
        "batchsize": str(cfg.batch_size),
    }
    if cfg.user:
        opts["user"] = cfg.user
    if cfg.password:
        opts["password"] = cfg.password
    opts.update(cfg.extra)
    return opts


def read_jdbc(
    spark: SparkSession, cfg: JdbcConfig, predicate: str | None = None
) -> DataFrame:
    return spark.read.format("jdbc").options(**reader_options(cfg, predicate)).load()


def write_jdbc(df: DataFrame, cfg: JdbcConfig, mode: str = "append") -> None:
    df.write.format("jdbc").options(**writer_options(cfg)).mode(mode).save()


def merge_sql(
    target: str, staging: str, keys: list[str], columns: list[str]
) -> str:
    """ANSI MERGE upsert from a staging table (write_jdbc the staging
    table first, then execute this server-side). Table and column
    identifiers are validated against a safe pattern before
    interpolation."""
    if not keys:
        raise ValueError("upsert needs at least one key column")
    _check_ident(target, "table name")
    _check_ident(staging, "table name")
    for c in [*keys, *columns]:
        _check_ident(c, "column name")
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    non_keys = [c for c in columns if c not in keys]
    set_clause = ", ".join(f"{c} = s.{c}" for c in non_keys)
    cols = ", ".join(columns)
    vals = ", ".join(f"s.{c}" for c in columns)
    update = f"WHEN MATCHED THEN UPDATE SET {set_clause} " if non_keys else ""
    return (
        f"MERGE INTO {target} t USING {staging} s ON {on} "
        f"{update}"
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    )

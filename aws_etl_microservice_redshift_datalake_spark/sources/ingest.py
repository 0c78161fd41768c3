"""Oracle-checked roundtrips for the ingest/unload surface — SURVEY.md §2.1
S2/S3/S6/S7 as driver-contract queries.

Reference parity: COPY (CSV/JSON with declared DDL and bad-row tolerance)
and UNLOAD (partitioned parquet, compressed CSV) are the reference service's
data-movement verbs (public Redshift semantics; /root/reference is empty —
SURVEY.md §0). Each query here UNLOADs a driver table to repo-local scratch,
ingests it back through the declared-schema reader, and returns a result the
DuckDB oracle computes from the original table — so the hash match proves
the full write→read cycle is lossless, not just that the reader ran.

Scale notes (100 TB):
- `unload` writes hive-partitioned parquet (partition pruning + DPP for
  downstream readers) with `maxRecordsPerFile` bounding file sizes like
  UNLOAD MAXFILESIZE; the re-read proves the layout is self-describing.
- CSV/JSON ingest use DECLARED schemas (COPY's target-DDL semantics), never
  inference — inference at 100 TB is a full extra pass over the data.
- Parquet roundtrips are bit-exact for doubles; text formats (CSV/JSON) use
  shortest-roundtrip formatting, so money aggregates still follow the §5.3
  rounding discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import money_col, o_money_col, query, rnd
from ..schemas import SCHEMAS
from .io import ingest_csv, ingest_json, load_table, unload, unload_csv

from ..scratch import process_scratch


def _tag(sf_dir: str) -> str:
    return sf_dir.strip("/").replace("/", "-")


@query(
    "q_unload_roundtrip",
    # NULLIF models the hive-partition CHANNEL (r8 degdates mirror, same
    # contract as the CSV channel below): partitionBy writes both '' and
    # NULL as __HIVE_DEFAULT_PARTITION__ and the re-read surfaces both as
    # NULL (pinned in tests/test_ingest.py), so the oracle reads the
    # parquet truth through the same conflation. A no-op on corpora with
    # no empty-string status.
    oracle=f"""
    SELECT NULLIF(o_orderstatus, '') AS o_orderstatus,
           COUNT(*) AS n_orders,
           ROUND(SUM({o_money_col("o_totalprice")}), 2) AS total_price
    FROM orders
    GROUP BY 1
    """,
)
def q_unload_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: UNLOAD ... PARTITION BY analog — orders written as hive-partitioned
    parquet (partitioned by status, file size bounded), re-read, aggregated.
    The hash match against the *original* table proves losslessness (modulo
    the partition channel's documented ''/NULL conflation — see the oracle
    note); the status filter below proves partition pruning works on the
    layout."""
    path = f"{process_scratch()}/unload-orders-{_tag(sf_dir)}"
    src = load_table(spark, sf_dir, "orders")
    unload(src, path, partition_cols=["o_orderstatus"], max_records_per_file=100_000)
    # read back with the DECLARED schema, not inference: an empty UNLOAD
    # (0-row source → partitionBy writes no data files) has nothing to
    # infer from and the re-read would fail — exactly the degenerate-branch
    # outage tests/test_degenerate.py sweeps for. The declared DDL is the
    # production contract anyway (the catalog, not the files, owns schema).
    back = spark.read.schema(src.schema).parquet(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        rnd(F.sum(money_col(F.col("o_totalprice")))).alias("total_price"),
    )


@query(
    "q_ingest_csv_roundtrip",
    # NULLIF models the CSV channel (r7 degraded-twin gate): CSV cannot
    # carry the NULL-vs-empty-string distinction — Spark's reader maps both
    # the unquoted and the quoted empty field to NULL, exactly like
    # Redshift's UNLOAD/COPY ``NULL AS ''`` default — so the oracle reads
    # the parquet truth THROUGH the same conflation. A no-op on corpora
    # with no empty-string names.
    oracle="""
    SELECT n.n_nationkey, NULLIF(n.n_name, '') AS n_name,
           NULLIF(r.r_name, '') AS region_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def q_ingest_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 + S2: UNLOAD ... CSV GZIP analog, then COPY ... FORMAT CSV analog —
    nation and region written as gzip CSV with headers, ingested back through
    their DECLARED schemas (no inference), then joined. The CSV channel
    conflates '' with NULL (Redshift ``NULL AS ''`` semantics) — the oracle
    twin applies the same conflation via NULLIF."""
    np_, rp = (
        f"{process_scratch()}/csv-nation-{_tag(sf_dir)}",
        f"{process_scratch()}/csv-region-{_tag(sf_dir)}",
    )
    unload_csv(load_table(spark, sf_dir, "nation"), np_, codec="gzip")
    unload_csv(load_table(spark, sf_dir, "region"), rp, codec="gzip")
    nation = ingest_csv(spark, np_, SCHEMAS["nation"], mode="FAILFAST")
    region = ingest_csv(spark, rp, SCHEMAS["region"], mode="FAILFAST")
    return nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name", F.col("r_name").alias("region_name"))


@query(
    "q_ingest_json_roundtrip",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           ROUND(SUM({o_money_col("value")}), 2) AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def q_ingest_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: COPY ... FORMAT JSON analog — events written as newline-delimited
    JSON (sans the ns timestamp, which JSON cannot carry losslessly), ingested
    back through a declared schema, aggregated per event type."""
    path = f"{process_scratch()}/json-events-{_tag(sf_dir)}"
    src = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "props"
    )
    src.write.mode("overwrite").json(path)
    schema = "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    from pyspark.sql.types import _parse_datatype_string

    back = ingest_json(spark, path, _parse_datatype_string(schema))
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        rnd(F.sum(money_col(F.col("value")))).alias("sum_value"),
    )


@query(
    "q_ingest_orc_roundtrip",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_cust,
           ROUND(SUM({o_money_col("c_acctbal")}), 2) AS sum_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q_ingest_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 variant: ORC write→read roundtrip (Spark's second built-in columnar
    format; Redshift COPY accepts ORC from S3). Customer is written as ORC,
    read back through the DECLARED schema (COPY target-DDL semantics — no
    inference pass), aggregated; the hash match against the original parquet
    proves the cycle is lossless, doubles included (ORC roundtrips IEEE
    doubles bit-exactly)."""
    path = f"{process_scratch()}/orc-customer-{_tag(sf_dir)}"
    load_table(spark, sf_dir, "customer").write.mode("overwrite").orc(path)
    back = spark.read.schema(SCHEMAS["customer"]).orc(path)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        rnd(F.sum(money_col(F.col("c_acctbal")))).alias("sum_bal"),
    )


@query(
    "q_ingest_binaryfile_roundtrip",
    # the oracle re-derives every per-file fact from the TABLE, so the
    # hash match proves the whole write→binaryFile-read cycle is lossless
    # without the oracle ever touching the written files. The text writer
    # terminates each row with '\n' (lineSep default), so the file bytes
    # are exactly the UTF-8 text plus one newline — strlen (DuckDB's
    # BYTE length of a VARCHAR, unlike length's char count) + 1 and
    # md5(text || chr(10)) are the table-side twins of the file size and
    # content digest.
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) + 1 AS BIGINT) AS n_bytes,
           md5(text || chr(10)) AS content_md5
    FROM documents
    WHERE text IS NOT NULL AND doc_id % 20 = 0
    """,
)
def q_ingest_binaryfile_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-file ingestion roundtrip — Spark's built-in ``binaryFile``
    source, the bulk MULTIMODAL ingestion path at 100 TB (raw image/audio
    files on the lake become (path, modificationTime, length, content)
    rows; `spark.sql.files.maxPartitionBytes` batches small files per
    task, and the listing parallelizes like any file source). The fixture
    leg writes each selected document's text as ONE raw file via a
    doc_id-partitioned text write (a distributed write — no driver-side
    file loop), reads the directory back as binary, and reports each
    file's byte length and content md5 keyed by the doc_id parsed from
    its path.

    Contract notes: ``recursiveFileLookup`` is set, which DISABLES
    partition discovery — deliberate, so an EMPTY selection (a degraded
    lake where every text is NULL) still reads with the fixed binaryFile
    schema instead of failing on a missing inferred partition column; the
    doc_id comes from the path string in both the populated and empty
    branches. The path regex accepts negative ids (snowflake-shifted
    degraded corpora). md5 runs on the raw bytes JVM-side; nothing but
    the final tiny projection leaves the scan."""
    path = f"{process_scratch()}/binfiles-{_tag(sf_dir)}"
    sel = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.col("doc_id") % 20 == 0))
        .select("doc_id", "text")
    )
    sel.write.mode("overwrite").partitionBy("doc_id").text(path)
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    return bf.select(
        F.regexp_extract(F.col("path"), r"doc_id=(-?\d+)", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )

"""Scalar function families — SURVEY.md §2.7 F1-F9 + §2.8-adjacent hashes.

Reference parity: the Redshift scalar-function surface (string/date/math/
null/array/struct/JSON/hash/decimal — public semantics; /root/reference is
empty — SURVEY.md §0). One representative query per family exercises several
functions at once, keeping the inventory testable without hundreds of
micro-queries.

All functions here are Spark built-ins → JVM-side, inside whole-stage
codegen; nothing in this module drops to Python at any scale.

Cross-engine notes baked into the oracles:
- DuckDB length/instr/levenshtein/year/... return BIGINT where Spark returns
  INT — the wider side is cast explicitly so schemas agree.
- DuckDB has no initcap → emulated with upper/lower/substr in the oracle.
- dayofweek: Spark is 1=Sunday..7, DuckDB 0=Sunday..6 → oracle adds 1.
- Transcendental outputs (exp/ln/log10) are rounded: JVM vs libm can differ
  in the last ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import MONEY_MAX, QTY_MAX, guarded_bigint, o_guarded_bigint, query
from ..sources.io import load_table


@query(
    "q_str_funcs",
    oracle="""
    SELECT p_partkey,
           concat_ws('|', p_name, p_brand) AS tagged,
           upper(p_name) AS name_uc,
           lower(p_brand) AS brand_lc,
           substr(p_name, 1, 5) AS name5,
           CAST(length(p_name) AS INTEGER) AS name_len,
           trim('  ' || p_type || ' ') AS trimmed,
           lpad(p_brand, 12, '*') AS brand_pad,
           replace(p_type, 'A', '@') AS type_repl,
           string_split(p_name, ' ')[1] AS first_word,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           CASE WHEN length(p_name) = strlen(p_name)
                THEN CAST(levenshtein(p_name, 'red widget') AS INTEGER)
           END AS lev,
           CAST(instr(p_name, 'a') AS INTEGER) AS a_pos,
           translate(p_type, 'AEIOU', 'aeiou') AS type_tr,
           CASE WHEN regexp_matches(p_type, '^[A-Za-z]*$')
                THEN upper(substr(p_type, 1, 1)) || lower(substr(p_type, 2))
           END AS type_cap,
           reverse(p_brand) AS brand_rev,
           repeat(p_brand, 2) AS brand2
    FROM part
    """,
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: string family — concat/case/substr/trim/pad/replace/split/regex/
    levenshtein/instr/translate/initcap/reverse/repeat.

    Two engine-semantic divergences carry conformance CASEs in both twins
    (r8 advdimstr mirror): DuckDB levenshtein counts UTF-8 BYTES where
    Spark counts CHARACTERS, so ``lev`` is defined only for pure-ASCII
    names (chars == bytes ⟺ length == strlen/octet_length — where the two
    metrics coincide) and NULL otherwise; and the engines disagree on
    word-boundary rules around punctuation for initcap, so ``type_cap``
    is defined only for single alpha words (where initcap(lower(x)) ≡
    upper-first + lower-rest in both). Both CASEs are no-ops on the
    ASCII fixture."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat_ws("|", "p_name", "p_brand").alias("tagged"),
        F.upper("p_name").alias("name_uc"),
        F.lower("p_brand").alias("brand_lc"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.length("p_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("trimmed"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.regexp_replace("p_type", "A", "@").alias("type_repl"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.when(
            F.length("p_name") == F.octet_length("p_name"),
            F.levenshtein("p_name", F.lit("red widget")),
        ).alias("lev"),
        F.instr("p_name", "a").alias("a_pos"),
        F.translate("p_type", "AEIOU", "aeiou").alias("type_tr"),
        F.when(
            F.col("p_type").rlike(r"^[A-Za-z]*\z"),
            F.initcap(F.lower("p_type")),
        ).alias("type_cap"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat("p_brand", 2).alias("brand2"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)      AS yr,
           CAST(month(o_orderdate) AS INTEGER)     AS mo,
           CAST(day(o_orderdate) AS INTEGER)       AS dom,
           CAST(quarter(o_orderdate) AS INTEGER)   AS qtr,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           last_day(o_orderdate)                   AS month_end,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE)   AS plus30,
           CAST(o_orderdate + INTERVAL 2 MONTH AS DATE)  AS plus2mo,
           CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER) AS days_since,
           strftime(o_orderdate, '%Y-%m-%d')       AS iso_day,
           epoch(o_orderdate)::BIGINT              AS epoch_s,
           make_date(CAST(year(o_orderdate) AS INTEGER), CAST(month(o_orderdate) AS INTEGER), 1) AS first_of_month
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: date/time family — extract/trunc/last_day/interval add/datediff/
    format/epoch/make_date (DATEADD/DATEDIFF/DATE_TRUNC analogs)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.quarter(d).alias("qtr"),
        F.dayofweek(d).alias("dow"),
        F.dayofyear(d).alias("doy"),
        F.date_trunc("month", d).alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.date_add(d, 30).alias("plus30"),
        F.add_months(d, 2).alias("plus2mo"),
        F.datediff(d, F.lit("1995-01-01").cast("timestamp")).alias("days_since"),
        F.date_format(d, "yyyy-MM-dd").alias("iso_day"),
        F.unix_timestamp(d).alias("epoch_s"),
        F.make_date(F.year(d), F.month(d), F.lit(1)).alias("first_of_month"),
    )


@query(
    "q_math_funcs",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 30000.0::DOUBLE) AS abs_dev,
           -- MONEY_MAX guards (r7 extreme-money sweep): floor/ceil/sign of a
           -- 1e308/NaN/±Inf price otherwise throw the ANSI BIGINT/INT cast —
           -- the BETWEEN guard (NaN and ±Inf fail it in both engines) nulls
           -- non-conforming rows identically in both twins
           CASE WHEN l_extendedprice BETWEEN -{MONEY_MAX:.0f} AND {MONEY_MAX:.0f}
                THEN CAST(floor(l_extendedprice) AS BIGINT) END AS price_floor,
           CASE WHEN l_extendedprice BETWEEN -{MONEY_MAX:.0f} AND {MONEY_MAX:.0f}
                THEN CAST(ceil(l_extendedprice) AS BIGINT) END  AS price_ceil,
           -- >= 0 guard, same asymmetry as ln below: Spark sqrt(negative)
           -- returns NaN, DuckDB's THROWS Out of Range (r7 extreme-money
           -- sweep) — negative prices degrade to NULL identically instead
           CASE WHEN l_extendedprice >= 0
                THEN sqrt(l_extendedprice) END    AS price_sqrt,
           pow(l_quantity, 2.0::DOUBLE)           AS qty_sq,
           ROUND(exp(l_quantity / 50.0::DOUBLE), 6) AS qty_exp,
           -- > 0 guards (r7 degraded-twin gate): Spark's log/log10 return
           -- NULL for non-positive input, DuckDB's ln/log10 THROW Out of
           -- Range — zero-priced rows (a legal lake state) must degrade to
           -- NULL identically in both twins
           CASE WHEN l_extendedprice > 0
                THEN ROUND(ln(l_extendedprice), 6) END    AS price_ln,
           CASE WHEN l_extendedprice > 0
                THEN ROUND(log10(l_extendedprice), 6) END AS price_log10,
           CASE WHEN l_extendedprice BETWEEN -{MONEY_MAX:.0f} AND {MONEY_MAX:.0f}
                THEN CAST(sign(l_extendedprice - 30000.0::DOUBLE) AS INTEGER)
                END AS dev_sign,
           greatest(l_extendedprice, l_quantity * 1000.0::DOUBLE) AS hi,
           least(l_extendedprice, l_quantity * 1000.0::DOUBLE)    AS lo,
           l_orderkey % 7 AS okey_mod7
    FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: math family — abs/floor/ceil/sqrt/pow/exp/ln/log10/sign/greatest/
    least/pmod. sqrt and pow-of-integral are IEEE-exact (unrounded);
    transcendentals are rounded (JVM vs libm last-ulp). The int-landing
    columns (floor/ceil/sign) carry the MONEY_MAX guard (r7 extreme-money
    sweep): a 1e308/NaN/±Inf price otherwise throws the ANSI narrowing
    cast — non-conforming rows null identically in both twins."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    qty = F.col("l_quantity")
    price_ok = price.between(-MONEY_MAX, MONEY_MAX)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(price - 30000.0).alias("abs_dev"),
        F.when(price_ok, F.floor(price)).alias("price_floor"),
        F.when(price_ok, F.ceil(price)).alias("price_ceil"),
        F.when(price >= 0, F.sqrt(price)).alias("price_sqrt"),
        F.pow(qty, 2.0).alias("qty_sq"),
        F.round(F.exp(qty / 50.0), 6).alias("qty_exp"),
        F.round(F.log(price), 6).alias("price_ln"),
        F.round(F.log10(price), 6).alias("price_log10"),
        F.when(price_ok, F.signum(price - 30000.0)).cast("int").alias("dev_sign"),
        F.greatest(price, qty * 1000.0).alias("hi"),
        F.least(price, qty * 1000.0).alias("lo"),
        F.pmod("l_orderkey", F.lit(7)).alias("okey_mod7"),
    )


@query(
    "q_null_funcs",
    oracle="""
    SELECT c_custkey,
           NULLIF(c_mktsegment, 'BUILDING') AS seg,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(none)') AS seg_filled,
           CASE WHEN NULLIF(c_mktsegment, 'BUILDING') IS NOT NULL
                THEN 'has_seg' ELSE 'no_seg' END AS nvl2_out,
           NULLIF(c_mktsegment, 'BUILDING') IS NULL AS seg_is_null,
           COALESCE(NULLIF(c_acctbal, c_acctbal), c_acctbal, 0.0::DOUBLE) AS bal_chain
    FROM customer
    """,
)
def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: null/conditional family — nullif/coalesce/nvl2-equivalent/isnull
    (nulls manufactured via NULLIF; base data is null-free)."""
    c = load_table(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        seg.alias("seg"),
        F.coalesce(seg, F.lit("(none)")).alias("seg_filled"),
        F.when(seg.isNotNull(), "has_seg").otherwise("no_seg").alias("nvl2_out"),
        seg.isNull().alias("seg_is_null"),
        F.coalesce(F.nullif(F.col("c_acctbal"), F.col("c_acctbal")), F.col("c_acctbal"), F.lit(0.0)).alias(
            "bal_chain"
        ),
    )


@query(
    "q_array_funcs",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           array_to_string(toks[1:3], ' ') AS first3,
           list_contains(toks, 'key') AS has_key,
           CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
           array_to_string(list_transform(toks[1:3], x -> upper(x)), ' ') AS first3_uc,
           CAST(len(list_filter(toks, x -> length(x) > 4)) AS INTEGER) AS n_long,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_chars,
           len(list_filter(toks, x -> length(x) > 6)) > 0 AS any_very_long,
           array_to_string(list_sort(list_distinct(toks))[1:5], ',') AS first5_sorted
    FROM t
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: array family + higher-order functions — size/slice/contains/
    distinct/transform/filter/aggregate/exists/sort (the SUPER/semi-structured
    analog). Array outputs are serialized to strings (scalar-primitive output
    policy)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    t = d.select("doc_id", toks.alias("toks"))
    return t.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.array_join(F.slice("toks", 1, 3), " ").alias("first3"),
        F.array_contains("toks", "key").alias("has_key"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.array_join(F.transform(F.slice("toks", 1, 3), lambda x: F.upper(x)), " ").alias("first3_uc"),
        F.size(F.filter("toks", lambda x: F.length(x) > 4)).alias("n_long"),
        F.aggregate(
            "toks", F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x).cast("bigint")
        ).alias("total_chars"),
        F.exists("toks", lambda x: F.length(x) > 6).alias("any_very_long"),
        F.array_join(F.slice(F.sort_array(F.array_distinct("toks")), 1, 5), ",").alias(
            "first5_sorted"
        ),
    )


@query(
    "q_struct_map_funcs",
    oracle="""
    SELECT event_id,
           user_id AS uid_out,
           event_type AS etype_from_map,
           2 AS map_size,
           'u=' || CAST(user_id AS VARCHAR) || ';t=' || event_type AS packed
    FROM events
    """,
)
def q_struct_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: struct/map family — named_struct + dot access, create_map +
    element_at, map_keys cardinality. The struct/map values are unpacked back
    to scalars in the output (scalar-primitive output policy); the oracle is
    the identity those round-trips must satisfy."""
    e = load_table(spark, sf_dir, "events")
    st = F.named_struct(F.lit("uid"), F.col("user_id"), F.lit("etype"), F.col("event_type"))
    mp = F.create_map(
        F.lit("t"), F.col("event_type"), F.lit("u"), F.col("user_id").cast("string")
    )
    return e.select(
        "event_id",
        st.getField("uid").alias("uid_out"),
        F.element_at(mp, "t").alias("etype_from_map"),
        F.size(mp).alias("map_size"),
        F.concat(
            F.lit("u="), F.element_at(mp, "u"), F.lit(";t="), F.element_at(mp, "t")
        ).alias("packed"),
    )


@query(
    "q_json_funcs",
    # json_valid guard (r7 degraded-twin gate): Spark's get_json_object /
    # PERMISSIVE from_json return NULL on malformed/empty/non-object JSON,
    # but DuckDB's json_extract_string THROWS on malformed input — the
    # guard makes the oracle degrade identically. The roundtrip is guarded
    # on k in BOTH twins because the engines' null-field conventions differ
    # (Spark to_json omits null fields, DuckDB emits "k":null).
    #
    # Integer-format guards (r7 review): an ANSI Spark cast on a VALID but
    # non-integer k ('{"k": 1.5}', '{"k": "abc"}') would kill the stage,
    # and DuckDB's CAST would round '1.5' to 2 — both contract violations.
    # The contract is spelled as ONE regex in both twins:
    #   k_get   — path extraction is UNTYPED text (Redshift
    #             JSON_EXTRACT_PATH_TEXT semantics), so a quoted integer
    #             '"7"' extracts and casts; 18-digit bound keeps the ANSI
    #             cast overflow-free in both engines.
    #   k_schema — from_json is TYPED, so a quoted '"7"' is NOT a BIGINT
    #             (NULL); the oracle tests the raw JSON repr (quotes
    #             intact) against the same grammar, 19 digits + TRY_CAST
    #             mirroring Jackson's int64-range acceptance (verified on
    #             int64-max and 20-digit overflow — both engines agree).
    # Everything non-integer degrades to NULL identically in both engines.
    oracle="""
    WITH j AS (
        SELECT event_id,
               CASE WHEN json_valid(props)
                    THEN json_extract_string(props, '$.k') END AS s,
               CASE WHEN json_valid(props)
                    THEN CAST(json_extract(props, '$.k') AS VARCHAR) END AS repr
        FROM events
    ), k AS (
        SELECT event_id,
               CASE WHEN regexp_matches(s, '^-?[0-9]{1,18}$')
                    THEN CAST(s AS BIGINT) END AS k_get,
               CASE WHEN regexp_matches(repr, '^-?[0-9]{1,19}$')
                    THEN TRY_CAST(s AS BIGINT) END AS k_schema
        FROM j
    )
    SELECT event_id, k_get, k_schema,
           CASE WHEN k_get IS NOT NULL
                THEN to_json(struct_pack(k := k_get)) END AS roundtrip
    FROM k
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: JSON family over events.props ('{"k": <int>}') — path extraction
    (JSON_EXTRACT_PATH_TEXT analog), schema-driven from_json, to_json
    round-trip. The roundtrip emits NULL (not '{}' / '{"k":null}') when k
    is absent — the one spelling both engines can agree on, since Spark
    omits null struct fields and DuckDB serializes them. Non-integer k
    degrades to NULL per column (see the oracle note): extraction is
    untyped text so '"7"' still yields 7, while the from_json column is
    typed and rejects it — exactly the Redshift
    JSON_EXTRACT_PATH_TEXT-vs-SUPER distinction."""
    e = load_table(spark, sf_dir, "events")
    raw = F.get_json_object("props", "$.k")
    # integer-format guard BEFORE the ANSI cast: 18 digits can never
    # overflow int64, so the guarded cast is throw-free at any scale.
    # \z, not $: Java's $ also matches before a TRAILING NEWLINE, so a
    # string k of '123\n' would pass here (and ANSI cast trims it) while
    # the oracle's RE2 $ rejects it — \z is absolute end-of-input in both
    # grammars (r7 full-round review).
    k_get = F.when(raw.rlike(r"^-?[0-9]{1,18}\z"), raw.cast("bigint"))
    return e.select(
        "event_id",
        k_get.alias("k_get"),
        F.from_json("props", "k BIGINT").getField("k").alias("k_schema"),
        F.when(
            k_get.isNotNull(), F.to_json(F.named_struct(F.lit("k"), k_get))
        ).alias("roundtrip"),
    )


@query(
    "q_hash_funcs",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           lower(hex(doc_id)) AS id_hex,
           base64(encode(substr(text, 1, 16))) AS head_b64
    FROM documents
    """,
)
def q_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: hash/encode family — md5/sha2/hex/base64 (dedup-key primitives)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.lower(F.hex("doc_id")).alias("id_hex"),
        F.base64(F.substring("text", 1, 16).cast("binary")).alias("head_b64"),
    )


@query("q_hash_native")  # rows-only: xxhash64/crc32 have no DuckDB twin
def q_hash_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8b: Spark-native hashes (xxhash64 — the MinHash workhorse — crc32,
    murmur3). No cross-engine oracle exists; pytest asserts determinism
    across runs instead."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.xxhash64("text").alias("text_xxh64"),
        F.crc32(F.col("text").cast("binary")).alias("text_crc32"),
        F.hash("text").alias("text_murmur3"),
    )


@query(
    "q_decimal_money",
    oracle=f"""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_extendedprice BETWEEN -{MONEY_MAX:.0f} AND {MONEY_MAX:.0f}
                         THEN CAST(l_extendedprice AS DECIMAL(18,2)) END)
                AS DOUBLE) AS sum_exact,
           CAST(MIN(CASE WHEN l_extendedprice BETWEEN -{MONEY_MAX:.0f} AND {MONEY_MAX:.0f}
                         THEN CAST(l_extendedprice AS DECIMAL(18,2)) END)
                AS DOUBLE) AS min_exact,
           CAST(MAX(CASE WHEN l_extendedprice BETWEEN -{MONEY_MAX:.0f} AND {MONEY_MAX:.0f}
                         THEN CAST(l_extendedprice AS DECIMAL(18,2)) END)
                AS DOUBLE) AS max_exact,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_decimal_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: decimal (Redshift money) arithmetic — sums in DECIMAL(18,2) are
    exact and order-insensitive (no float discipline needed!), surfaced as
    doubles under the scalar-primitive output policy. This is the recommended
    money path at 100 TB: decimal partial aggregates merge exactly. The
    decimal hop carries the MONEY_MAX guard (r7 extreme-money sweep): one
    corrupted 1e308 price otherwise throws the whole stage out of decimal
    range under ANSI — non-conforming rows null into the aggregates, which
    both engines skip identically."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    price_dec = F.when(price.between(-MONEY_MAX, MONEY_MAX), price).cast(
        "decimal(18,2)"
    )
    return li.groupBy("l_returnflag").agg(
        F.sum(price_dec).cast("double").alias("sum_exact"),
        F.min(price_dec).cast("double").alias("min_exact"),
        F.max(price_dec).cast("double").alias("max_exact"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_try_funcs",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
           l_extendedprice / NULLIF(l_quantity - 1.0, 0.0) AS unit_price_m1,
           CASE WHEN l_quantity BETWEEN -{QTY_MAX:.0f} AND {QTY_MAX:.0f}
                THEN CAST(l_quantity AS INTEGER) END AS qty_int,
           TRY_CAST(substr(l_returnflag, 1, 0) AS DOUBLE) AS empty_as_double
    FROM lineitem
    WHERE l_orderkey < 50
    """,
)
def q_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-family: error-safe TRY_* surface under ANSI mode (Spark 4 ships
    ANSI on, where bad casts and div-by-zero THROW — the ETL-safe forms
    are try_cast / try_divide, Redshift's CAN_CAST-style guarded DML).
    try_cast('A' as int) → NULL, try_divide(x, 0) → NULL, an
    overflow-guarded int narrowing, and a cast of an empty string — each
    oracled against DuckDB's TRY_CAST / NULLIF-div equivalents. Row-local,
    codegen, pushdown-safe.

    qty_int carries the QTY_MAX BETWEEN guard in BOTH twins (r8 degmoney
    wave): Spark's try_cast(1e308 AS INT) nulls, but DuckDB's TRY_CAST
    still THROWS on an out-of-range double→INT (and on NaN), so TRY_CAST
    alone is not a safe mirror — the guard nulls non-conforming values
    before either engine's cast runs (QTY_MAX < 2^31, so guarded values
    can never overflow INT). The Spark side keeps try_cast underneath:
    that is the operator under test."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 50)
    qty = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_returnflag").try_cast("integer").alias("flag_as_int"),
        F.try_divide(
            F.col("l_extendedprice"), F.col("l_quantity") - F.lit(1.0)
        ).alias("unit_price_m1"),
        F.when(qty.between(-QTY_MAX, QTY_MAX), qty)
        .try_cast("integer")
        .alias("qty_int"),
        F.substring("l_returnflag", 1, 0).try_cast("double").alias(
            "empty_as_double"
        ),
    )


@query(
    "q_bitwise_aggs",
    oracle=f"""
    SELECT l_returnflag,
           BIT_AND({o_guarded_bigint("l_quantity")}) AS qty_and,
           BIT_OR({o_guarded_bigint("l_quantity")}) AS qty_or,
           BIT_XOR({o_guarded_bigint("l_quantity")}) AS qty_xor,
           BIT_OR(1 << (l_linenumber % 7)) AS line_mask
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_bitwise_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-family: bitwise aggregate surface (BIT_AND / BIT_OR / BIT_XOR) —
    the flag-mask rollup idiom (e.g. which linenumber slots ever occur per
    group, as one bigint mask). Fully associative/commutative integer
    lattice operations → two-phase map-side-combinable aggregates with no
    ordering sensitivity at all — the easiest possible 100 TB aggregate.
    The quantity narrowing carries the QTY_MAX guard (r7 extreme-money
    sweep: ANSI CAST_OVERFLOW on a 1e308 sentinel; one conformance
    contract per column suite-wide); bit-aggs skip the resulting NULLs
    identically in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    q = guarded_bigint(F.col("l_quantity"))
    return li.groupBy("l_returnflag").agg(
        F.bit_and(q).alias("qty_and"),
        F.bit_or(q).alias("qty_or"),
        F.bit_xor(q).alias("qty_xor"),
        F.bit_or(F.expr("shiftleft(1, l_linenumber % 7)")).alias("line_mask"),
    )


@query(
    "q_value_histogram",
    oracle="""
    SELECT event_type,
           CASE WHEN value IS NOT NULL AND NOT isnan(value)
                     AND abs(value) < 5e10
                THEN CAST(floor(value / 50.0) AS INTEGER) + 1 END AS bucket,
           COUNT(*) AS n_events,
           ROUND(MIN(CASE WHEN value IS NOT NULL AND NOT isnan(value)
                               AND abs(value) < 5e10 THEN value END), 2) AS lo,
           ROUND(MAX(CASE WHEN value IS NOT NULL AND NOT isnan(value)
                               AND abs(value) < 5e10 THEN value END), 2) AS hi
    FROM events
    GROUP BY event_type, bucket
    """,
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-family: equi-width histogram — the profiling histogram every
    warehouse exposes (Redshift: WIDTH_BUCKET; Spark ships width_bucket
    too, but DuckDB 1.0 does not, so BOTH sides spell the 50-unit bucket
    explicitly: floor(value/50)+1 — one correctly-rounded division + floor
    on the same parquet doubles, bit-identical cross-engine). Min/max per
    bucket are raw parquet values, rounded only for display. Shuffle
    bounded by |types|×|buckets| groups.

    Non-finite and bucket-overflow values land in the NULL bucket instead
    of killing the job: floor(+Inf/50) saturates to Long.MAX and the ANSI
    INT cast then throws CAST_OVERFLOW — a crash the r6 degraded-events
    sweep hit on the first run, and exactly what a 100 TB instrumentation
    feed (which always contains NaN/±Inf doubles) would do to the whole
    stage. The guard admits |value| < 5e10 (bucket ≤ 1e9, comfortably
    inside INT); both engines spell it identically so the twins stay in
    lockstep on clean and degraded corpora alike.

    lo/hi aggregate over the SAME in_range guard as the bucket (ADVICE r6):
    raw NaN/±Inf reaching MIN/MAX in the NULL bucket would make the twins'
    agreement hinge on the harness's NaN canonicalization (NaN != NaN under
    naive comparison). With the guard, the NULL bucket reports NULL lo/hi —
    deterministic and finite in both engines — while every finite bucket is
    untouched (its rows all satisfy in_range by construction)."""
    e = load_table(spark, sf_dir, "events")
    v = F.col("value")
    in_range = v.isNotNull() & ~F.isnan(v) & (F.abs(v) < 5e10)
    bucket = F.when(in_range, F.floor(v / 50.0).cast("int") + 1)
    return e.groupBy("event_type", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.min(F.when(in_range, v)), 2).alias("lo"),
        F.round(F.max(F.when(in_range, v)), 2).alias("hi"),
    )

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar-function surface (SURVEY.md §2.4 "Scalar fns"): string, date, math,
  * array, and conditional expressions, all Catalyst built-ins (whole-stage
  * codegen, no UDFs). Parity notes per query where Spark and DuckDB dialects
  * could diverge (regex flavor, rounding mode, integer division).
  */
object Scalars {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // String functions: lower/upper/substring/concat/length/trim/replace.
    "sc1_string_funcs" -> { (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          lower(col("p_name")).as("lname"),
          upper(col("p_brand")).as("ubrand"),
          substring(col("p_type"), 1, 5).as("type5"),
          concat_ws("|", col("p_brand"), col("p_type")).as("bt"),
          length(col("p_name")).as("name_len"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("devoweled"),
          split(col("p_name"), " ").getItem(0).as("first_word"))
        .orderBy(col("p_partkey"))
    },
    // Date/time functions: extract parts, truncate, date arithmetic.
    "sc2_date_funcs" -> { (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("epoch_us"))
        .orderBy(col("o_orderkey"))
    },
    // Math functions (sqrt is IEEE-exact on both engines; round only on
    // DECIMAL where half-up is well-defined — double round is engine-specific).
    "sc3_math_funcs" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - lit(0.05)).as("disc_dev"),
          floor(col("l_extendedprice")).cast("bigint").as("price_floor"),
          ceil(col("l_extendedprice")).cast("bigint").as("price_ceil"),
          sqrt(col("l_quantity")).as("qty_sqrt"),
          (col("l_partkey") % 7).as("pk_mod"),
          round(col("l_extendedprice").cast("decimal(18,2)"), 1).cast("double").as("price_r1"))
        // Total order over every emitted column (r11): (orderkey,
        // linenumber) is unique on the driver corpus but NOT on the
        // GenData sf1 corpus, and a tie leaves row order engine-dependent
        // — the sf1 gate caught the row-wise compare diverging. Sorting by
        // all outputs makes equal rows interchangeable, so duplicates
        // cannot destabilize the compare.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("price_floor"),
          col("price_r1"), col("disc_dev"), col("pk_mod"), col("qty_sqrt"))
    },
    // Conditional bucketing: CASE WHEN chains.
    "sc4_case_when" -> { (s, d) =>
      Tables.orders(s, d)
        .withColumn("bucket",
          when(col("o_totalprice") < 100000, "small")
            .when(col("o_totalprice") < 300000, "medium")
            .otherwise("large"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
             sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
        .orderBy(col("bucket"))
    },
    // Array functions over the embeddings table: size, element access, slice.
    // Deliberately UNFILTERED (unlike the s-family): these are the scalar
    // demos, so they must be total over hostile rows — try_element_at
    // returns NULL out of bounds / on NULL arrays, exactly DuckDB's
    // list-index semantics (ANSI element_at would fail the job on the
    // first short or empty array).
    "sc5_array_funcs" -> { (s, d) =>
      Tables.embeddings(s, d)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          try_element_at(col("embedding"), lit(1)).cast("double").as("first_elem"),
          try_element_at(col("embedding"), lit(64)).cast("double").as("last_elem"),
          size(filter(col("embedding"), x => x > 0)).as("n_positive"))
        .orderBy(col("vec_id"))
    },
    // Edit distance (exact integer metric — same definition both engines).
    "sc7_edit_distance" -> { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_partkey") <= 50)
        .select(col("p_partkey"),
          levenshtein(col("p_brand"), col("p_type")).as("brand_type_dist"),
          levenshtein(split(col("p_name"), " ").getItem(0),
                      split(col("p_name"), " ").getItem(1)).as("word_dist"))
        .orderBy(col("p_partkey"))
    },
    // Structured JSON parsing: from_json into a typed struct (the schema-
    // ful twin of e6's get_json_object path); absent keys surface as
    // typed nulls, malformed documents as a fully-null struct.
    "sc8_from_json" -> { (s, d) =>
      Tables.events(s, d)
        .withColumn("j", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, missing STRING")))
        .select(col("event_id"),
          col("j.k").as("k"),
          col("j.missing").as("missing"),
          (col("j.k") * 2).as("k2"))
        .orderBy(col("event_id"))
    },
    // Higher-order array functions: transform + ordered aggregate fold.
    // The fold is sequential left-to-right on both engines (Spark `aggregate`,
    // DuckDB sum(x ORDER BY i)), so double results are bit-identical.
    "sc6_array_fold" -> { (s, d) =>
      Tables.embeddings(s, d)
        .select(
          col("vec_id"),
          aggregate(transform(col("embedding"), x => x.cast("double") * x.cast("double")),
                    lit(0.0), (acc, x) => acc + x).as("sq_norm"))
        .orderBy(col("vec_id"))
    }
  )

  def oracle: Map[String, String] = Map(
    "sc1_string_funcs" ->
      """SELECT p_partkey,
        |  lower(p_name) AS lname,
        |  upper(p_brand) AS ubrand,
        |  substring(p_type, 1, 5) AS type5,
        |  concat_ws('|', p_brand, p_type) AS bt,
        |  length(p_name) AS name_len,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled,
        |  string_split(p_name, ' ')[1] AS first_word
        |FROM part ORDER BY p_partkey""".stripMargin,
    "sc2_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(o_orderdate AS DATE) + 30 AS due_date,
        |  epoch_us(o_orderdate) AS epoch_us
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "sc3_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - 0.05) AS disc_dev,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  l_partkey % 7 AS pk_mod,
        |  CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_r1
        |FROM lineitem
        |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST, price_floor NULLS FIRST,
        |  price_r1 NULLS FIRST, disc_dev NULLS FIRST, pk_mod NULLS FIRST, qty_sqrt NULLS FIRST""".stripMargin,
    "sc4_case_when" ->
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
        |            WHEN o_totalprice < 300000 THEN 'medium'
        |            ELSE 'large' END AS bucket,
        |  count(*) AS n,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "sc5_array_funcs" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first_elem,
        |  CAST(embedding[64] AS DOUBLE) AS last_elem,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "sc7_edit_distance" ->
      """SELECT p_partkey,
        |  levenshtein(p_brand, p_type) AS brand_type_dist,
        |  levenshtein(string_split(p_name, ' ')[1], string_split(p_name, ' ')[2]) AS word_dist
        |FROM part WHERE p_partkey <= 50 ORDER BY p_partkey""".stripMargin,
    // NULL list → NULL (Spark aggregate propagates null input); EMPTY list
    // → 0.0 (the fold's init value); a NULL ELEMENT poisons the fold (the
    // accumulator goes NULL and stays NULL) where DuckDB's sum would skip
    // it — the CASE arms reproduce all three against unnest, which yields
    // zero rows for NULL and [] alike and drops NULL products.
    "sc6_array_fold" ->
      """SELECT vec_id,
        |  CASE WHEN embedding IS NULL THEN NULL
        |       WHEN len(list_filter(embedding, x -> x IS NULL)) > 0 THEN NULL
        |       ELSE (SELECT coalesce(sum(CAST(u.x AS DOUBLE) * CAST(u.x AS DOUBLE)), 0.0)
        |             FROM unnest(embedding) u(x)) END AS sq_norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    // json_valid guard = Spark's PERMISSIVE from_json (malformed input
    // parses to an all-null struct, never an error).
    "sc8_from_json" ->
      """SELECT event_id,
        |  CAST(CASE WHEN json_valid(props) THEN props->>'$.k' END AS BIGINT) AS k,
        |  CAST(CASE WHEN json_valid(props) THEN props->>'$.missing' END AS VARCHAR) AS missing,
        |  CAST(CASE WHEN json_valid(props) THEN props->>'$.k' END AS BIGINT) * 2 AS k2
        |FROM events ORDER BY event_id NULLS FIRST""".stripMargin
  )
}

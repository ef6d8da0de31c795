package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.8 scalar-function inventory: string, date/time, math,
  * array (higher-order), JSON, and generator (explode) families. All
  * expressions are codegen'd built-ins — each query is one
  * WholeStageCodegen span over the scan (plus the final sort), so
  * per-row cost is identical at any scale.
  *
  * Width discipline: Spark int-typed derivations (length, instr, year,
  * floor…) are cast to long so the output schema matches DuckDB's
  * BIGINT results.
  */
object Functions extends QueryModule {

  val stringFuncs = QueryDef(
    "q_string_funcs",
    (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up_name"),
          length(col("p_name")).cast("long").as("name_len"),
          substring(col("p_name"), 1, 5).as("name_prefix"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          expr("replace(p_type, ' ', '_')").as("type_snake"),
          lpad(col("p_brand"), 12, "*").as("brand_padded"),
          instr(col("p_name"), "a").cast("long").as("first_a"),
          regexp_extract(col("p_brand"), "(\\d+)", 1).as("brand_num"),
          trim(col("p_name")).as("trimmed"),
          size(split(col("p_name"), " ")).cast("long").as("word_count"))
        .orderBy(col("p_partkey")),
    Some("""
      SELECT p_partkey,
             upper(p_name) AS up_name,
             CAST(length(p_name) AS BIGINT) AS name_len,
             substr(p_name, 1, 5) AS name_prefix,
             concat_ws('-', p_brand, p_type) AS brand_type,
             replace(p_type, ' ', '_') AS type_snake,
             lpad(p_brand, 12, '*') AS brand_padded,
             CAST(instr(p_name, 'a') AS BIGINT) AS first_a,
             regexp_extract(p_brand, '(\d+)', 1) AS brand_num,
             trim(p_name) AS trimmed,
             CAST(len(string_split(p_name, ' ')) AS BIGINT) AS word_count
      FROM part
      ORDER BY p_partkey
    """))

  val dateFuncs = QueryDef(
    "q_date_funcs",
    (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("order_year"),
          month(col("o_orderdate")).cast("long").as("order_month"),
          dayofmonth(col("o_orderdate")).cast("long").as("order_day"),
          quarter(col("o_orderdate")).cast("long").as("order_quarter"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          last_day(col("o_orderdate")).as("month_end"),
          date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
          datediff(lit("2002-01-01").cast("date"),
            col("o_orderdate").cast("date")).cast("long").as("days_to_2002"),
          unix_timestamp(col("o_orderdate")).as("epoch_sec"),
          date_format(col("o_orderdate"), "yyyy-MM").as("year_month"))
        .orderBy(col("o_orderkey")),
    Some("""
      SELECT o_orderkey,
             year(o_orderdate) AS order_year,
             month(o_orderdate) AS order_month,
             day(o_orderdate) AS order_day,
             quarter(o_orderdate) AS order_quarter,
             CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
             last_day(CAST(o_orderdate AS DATE)) AS month_end,
             CAST(o_orderdate AS DATE) + 30 AS due_date,
             date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
             CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec,
             strftime(o_orderdate, '%Y-%m') AS year_month
      FROM orders
      ORDER BY o_orderkey
    """))

  /** Transcendentals round(6) — JVM libm vs C libm may differ in the
    * last ulp.
    */
  val mathFuncs = QueryDef(
    "q_math_funcs",
    (s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          // round at 4 decimals: the exact value has 3, so the binary
          // error (~1e-12) can never straddle a rounding boundary —
          // round(x*0.1, 2) WOULD (Spark rounds the shortest decimal
          // repr, DuckDB the binary value; they disagree at .xx5).
          round(col("l_extendedprice") * 0.1, 4).as("price_tenth"),
          floor(col("l_discount") * 100).cast("long").as("disc_pct_floor"),
          ceil(col("l_discount") * 100).cast("long").as("disc_pct_ceil"),
          abs(col("l_quantity") - 25.0).as("qty_dev"),
          pow(col("l_quantity"), 2).as("qty_sq"),
          round(sqrt(col("l_extendedprice")), 6).as("price_sqrt"),
          round(log(col("l_extendedprice")), 6).as("price_ln"),
          round(exp(col("l_discount")), 6).as("disc_exp"),
          signum(col("l_quantity") - 25.0).as("qty_sign"),
          (col("l_orderkey") % 7).as("key_mod7"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some("""
      SELECT l_orderkey, l_linenumber,
             round(l_extendedprice * 0.1, 4) AS price_tenth,
             CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct_floor,
             CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
             abs(l_quantity - 25.0) AS qty_dev,
             pow(l_quantity, 2) AS qty_sq,
             round(sqrt(l_extendedprice), 6) AS price_sqrt,
             round(ln(l_extendedprice), 6) AS price_ln,
             round(exp(l_discount), 6) AS disc_exp,
             CAST(sign(l_quantity - 25.0) AS DOUBLE) AS qty_sign,
             l_orderkey % 7 AS key_mod7
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber
    """))

  /** Higher-order array functions over the 64-dim embedding column:
    * transform/aggregate (fold), filter, exists, forall, slice. These
    * are the building blocks of the vector ops in Similarity — all
    * codegen-friendly, no UDFs.
    */
  val arrayFuncs = QueryDef(
    "q_array_funcs",
    (s, d) =>
      Tables.embeddings(s, d)
        .select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          element_at(col("embedding"), 1).cast("double").as("first_val"),
          expr("round(aggregate(transform(embedding, x -> cast(x AS double) * cast(x AS double)), cast(0 AS double), (acc, v) -> acc + v), 4)").as("sum_sq"),
          expr("cast(size(filter(embedding, x -> x > 0)) AS bigint)").as("n_positive"),
          expr("exists(embedding, x -> x > 2.0)").as("has_big"),
          expr("forall(embedding, x -> abs(x) < 10.0)").as("all_small"),
          expr("cast(array_max(embedding) AS double)").as("max_val"),
          expr("round(aggregate(slice(embedding, 1, 8), cast(0 AS double), (acc, v) -> acc + cast(v AS double)), 4)").as("head8_sum"))
        .orderBy(col("vec_id")),
    Some("""
      SELECT vec_id,
             CAST(len(embedding) AS BIGINT) AS dim,
             CAST(embedding[1] AS DOUBLE) AS first_val,
             round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sum_sq,
             CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive,
             len(list_filter(embedding, x -> x > 2.0)) > 0 AS has_big,
             len(list_filter(embedding, x -> abs(x) >= 10.0)) = 0 AS all_small,
             CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS max_val,
             round(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))), 4) AS head8_sum
      FROM embeddings
      ORDER BY vec_id
    """))

  /** JSON-in-string extraction from events.props (schema-on-read). */
  val jsonFuncs = QueryDef(
    "q_json_funcs",
    (s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_value"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType)))).getField("k").as("k_typed"),
          to_json(struct(get_json_object(col("props"), "$.k").cast("long").as("k"))).as("rebuilt"))
        .orderBy(col("event_id")),
    Some("""
      SELECT event_id,
             CAST(props->>'k' AS BIGINT) AS k_value,
             CAST(props->>'k' AS BIGINT) AS k_typed,
             '{"k":' || (props->>'k') || '}' AS rebuilt
      FROM events
      ORDER BY event_id
    """))

  /** VARIANT semi-structured path (new in Spark 4): parse_json into
    * the binary VARIANT type once, then typed variant_get extraction —
    * the engine-native answer to schemaless JSON columns. Unlike
    * get_json_object (string re-parse per access, q_json_funcs), the
    * document parses once and fields extract from the binary encoding,
    * which is the 100 TB-friendly path when many fields are read.
    * try_parse_json exercises the malformed-input contract (NULL, not
    * error). Aggregated per event_type so the VARIANT column itself
    * (not oracle-comparable) stays internal to the plan.
    */
  val variantFuncs = QueryDef(
    "q_variant_funcs",
    (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"),
          expr("variant_get(try_parse_json(props), '$.missing', 'bigint')").as("m"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          count(col("m")).as("missing_non_null"))
        .orderBy(col("event_type")),
    Some("""
      SELECT event_type,
             count(*) AS n_events,
             CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
             min(CAST(props->>'k' AS BIGINT)) AS min_k,
             max(CAST(props->>'k' AS BIGINT)) AS max_k,
             count(CAST(props->>'missing' AS BIGINT)) AS missing_non_null
      FROM events
      GROUP BY event_type
      ORDER BY event_type
    """))

  /** Generator: explode tokenized text into a token-frequency table.
    * Trailing-space tokens filtered on both sides. The explode
    * multiplies rows ~60× before the partial aggregate collapses them
    * — map-side combine keeps the shuffle at |vocabulary| not |tokens|.
    */
  val explodeTokens = QueryDef(
    "q_explode_tokens",
    (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(100),
    Some("""
      SELECT token, count(*) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      WHERE token <> ''
      GROUP BY token
      ORDER BY cnt DESC, token
      LIMIT 100
    """))

  /** Map functions over a derived map column (no stored map columns
    * exist — §1.2; maps appear as derived results only).
    */
  val mapFuncs = QueryDef(
    "q_map_funcs",
    (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          map(lit("k"), get_json_object(col("props"), "$.k").cast("long"),
            lit("k2"), get_json_object(col("props"), "$.k").cast("long") * 2).as("m"))
        .select(col("event_id"),
          element_at(col("m"), "k").as("k_value"),
          element_at(col("m"), "k2").as("k_doubled"),
          size(col("m")).cast("long").as("n_keys"),
          array_join(map_keys(col("m")), ",").as("keys_str"),
          array_join(transform(map_values(col("m")), v => v.cast("string")), ",")
            .as("vals_str"))
        .orderBy(col("event_id")),
    Some("""
      SELECT event_id,
             m['k'][1] AS k_value,
             m['k2'][1] AS k_doubled,
             CAST(cardinality(m) AS BIGINT) AS n_keys,
             array_to_string(map_keys(m), ',') AS keys_str,
             array_to_string(list_transform(map_values(m), v -> CAST(v AS VARCHAR)), ',') AS vals_str
      FROM (
        SELECT event_id,
               MAP {'k': CAST(props->>'k' AS BIGINT),
                    'k2': CAST(props->>'k' AS BIGINT) * 2} AS m
        FROM events)
      ORDER BY event_id
    """))

  /** posexplode: token positions (0-based) for a bounded doc slice. */
  val posExplode = QueryDef(
    "q_posexplode",
    (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 5)
        .select(col("doc_id"),
          posexplode(expr("filter(split(text, ' '), t -> t != '')")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("token"))
        .orderBy(col("doc_id"), col("pos")),
    Some("""
      SELECT doc_id, u['pos'] AS pos, u['token'] AS token
      FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(toks)),
                 i -> {'pos': i - 1, 'token': toks[i]})) AS u
        FROM (
          SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
          FROM documents
          WHERE doc_id < 5))
      ORDER BY doc_id, pos
    """))

  /** stack (unpivot): wide per-status price stats → long (metric,
    * value) rows; oracle is the equivalent UNION ALL.
    */
  val stackUnpivot = QueryDef(
    "q_unpivot",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(
          round(min(col("o_totalprice")), 2).as("min_price"),
          round(max(col("o_totalprice")), 2).as("max_price"),
          round(avg(col("o_totalprice")), 4).as("avg_price"))
        .selectExpr("o_orderstatus",
          "stack(3, 'min', min_price, 'max', max_price, 'avg', avg_price) AS (metric, value)")
        .orderBy(col("o_orderstatus"), col("metric")),
    Some("""
      WITH stats AS (
        SELECT o_orderstatus,
               round(min(o_totalprice), 2) AS min_price,
               round(max(o_totalprice), 2) AS max_price,
               round(avg(o_totalprice), 4) AS avg_price
        FROM orders GROUP BY o_orderstatus)
      SELECT o_orderstatus, metric, value FROM (
        SELECT o_orderstatus, 'min' AS metric, min_price AS value FROM stats
        UNION ALL
        SELECT o_orderstatus, 'max', max_price FROM stats
        UNION ALL
        SELECT o_orderstatus, 'avg', avg_price FROM stats)
      ORDER BY o_orderstatus, metric
    """))

  /** Ordered string aggregation (listagg ≡ string_agg): canonical
    * per-group concatenation with an explicit WITHIN GROUP order.
    */
  val stringAgg = QueryDef(
    "q_string_agg",
    (s, d) => {
      Tables.nation(s, d).createOrReplaceTempView("nation_sa_v")
      s.sql("""
        SELECT n_regionkey,
               listagg(n_name, '|') WITHIN GROUP (ORDER BY n_name) AS nations
        FROM nation_sa_v
        GROUP BY n_regionkey
        ORDER BY n_regionkey
      """)
    },
    Some("""
      SELECT n_regionkey,
             string_agg(n_name, '|' ORDER BY n_name) AS nations
      FROM nation
      GROUP BY n_regionkey
      ORDER BY n_regionkey
    """))

  /** Bitwise operators on integer keys. */
  val bitwiseFuncs = QueryDef(
    "q_bitwise",
    (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          (col("o_orderkey").bitwiseAND(255L)).as("low_byte"),
          (col("o_orderkey").bitwiseOR(4096L)).as("with_flag"),
          (col("o_orderkey").bitwiseXOR(col("o_custkey"))).as("key_xor"),
          shiftleft(col("o_orderkey"), 2).as("shifted"),
          shiftright(col("o_orderkey"), 3).as("down_shifted"))
        .orderBy(col("o_orderkey")),
    Some("""
      SELECT o_orderkey,
             o_orderkey & 255 AS low_byte,
             o_orderkey | 4096 AS with_flag,
             xor(o_orderkey, o_custkey) AS key_xor,
             o_orderkey << 2 AS shifted,
             o_orderkey >> 3 AS down_shifted
      FROM orders
      ORDER BY o_orderkey
    """))

  /** Regex family: matching, global replace, extract, and match
    * counting — plus the chained text-normalization shape (lowercase →
    * strip non-alphanumerics → collapse whitespace) every LLM-corpus
    * cleaner runs before dedup. Patterns stay in the character-class
    * subset where Java and RE2 regex semantics coincide. Dialect note:
    * DuckDB regexp_replace needs the 'g' flag to match Spark's
    * replace-all; match counts come from len(regexp_extract_all).
    */
  val regexFuncs = QueryDef(
    "q_regex_funcs",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          trim(regexp_replace(
            regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
            " +", " ")).as("normalized"),
          col("text").rlike("[0-9]").as("has_digit"),
          regexp_count(col("text"), lit("[0-9]+")).cast("long").as("num_runs"),
          regexp_extract(col("text"), "^(\\w+)", 1).as("first_word"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g')) AS normalized,
             regexp_matches(text, '[0-9]') AS has_digit,
             CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS num_runs,
             regexp_extract(text, '^(\w+)', 1) AS first_word
      FROM documents
      ORDER BY doc_id
    """))

  /** Second string family: translate, repeat, reverse, split_part,
    * left/right slices — (initcap is skipped: absent in the oracle
    * dialect). All codegen'd built-ins, one span over the scan.
    */
  val stringFuncs2 = QueryDef(
    "q_string_funcs2",
    (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          translate(col("p_name"), "aeiou", "AEIOU").as("vowels_up"),
          expr("repeat(p_brand, 2)").as("brand_twice"),
          reverse(col("p_type")).as("type_rev"),
          expr("split_part(p_type, ' ', 1)").as("type_first"),
          expr("left(p_name, 4)").as("name_left4"),
          expr("right(p_name, 3)").as("name_right3"))
        .orderBy(col("p_partkey")),
    Some("""
      SELECT p_partkey,
             translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
             repeat(p_brand, 2) AS brand_twice,
             reverse(p_type) AS type_rev,
             split_part(p_type, ' ', 1) AS type_first,
             left(p_name, 4) AS name_left4,
             right(p_name, 3) AS name_right3
      FROM part
      ORDER BY p_partkey
    """))

  /** Second date family: month-end, day-of-week (normalized to
    * DuckDB's Sunday=0), ISO week, calendar-clamped add_months, and
    * string formatting.
    */
  val dateFuncs2 = QueryDef(
    "q_date_funcs2",
    (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          last_day(col("o_orderdate")).cast("date").as("month_end"),
          (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow"),
          weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
          add_months(col("o_orderdate"), 1).cast("date").as("next_month"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .orderBy(col("o_orderkey")),
    Some("""
      SELECT o_orderkey,
             CAST(last_day(CAST(o_orderdate AS TIMESTAMP)) AS DATE) AS month_end,
             CAST(date_part('dow', o_orderdate) AS BIGINT) AS dow,
             CAST(date_part('week', o_orderdate) AS BIGINT) AS iso_week,
             CAST(date_add(CAST(o_orderdate AS TIMESTAMP), INTERVAL 1 MONTH) AS DATE) AS next_month,
             strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS ym
      FROM orders
      ORDER BY o_orderkey
    """))

  /** Transcendental math family: trig, exponentials, logs, sign.
    * Every transcendental output is FLOAT-cast — libm implementations
    * differ between engines in the last double ulp, and a float cast
    * collapses that without decimal-boundary hazards (same rationale
    * as q_stats). sign() is exact and stays integral.
    */
  val mathFuncs2 = QueryDef(
    "q_math_funcs2",
    (s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          sin(col("l_quantity")).cast("float").as("qty_sin"),
          cos(col("l_quantity")).cast("float").as("qty_cos"),
          atan2(col("l_quantity"), lit(10.0)).cast("float").as("qty_atan2"),
          exp(col("l_quantity") / 50.0).cast("float").as("qty_exp"),
          log2(col("l_quantity")).cast("float").as("qty_log2"),
          log10(col("l_extendedprice")).cast("float").as("price_log10"),
          signum(col("l_quantity") - 25.0).cast("long").as("qty_side"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some("""
      SELECT l_orderkey, l_linenumber,
             CAST(sin(l_quantity) AS FLOAT) AS qty_sin,
             CAST(cos(l_quantity) AS FLOAT) AS qty_cos,
             CAST(atan2(l_quantity, 10.0) AS FLOAT) AS qty_atan2,
             CAST(exp(l_quantity / 50.0) AS FLOAT) AS qty_exp,
             CAST(log2(l_quantity) AS FLOAT) AS qty_log2,
             CAST(log10(l_extendedprice) AS FLOAT) AS price_log10,
             CAST(sign(l_quantity - 25.0) AS BIGINT) AS qty_side
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber
    """))

  /** ANSI-safe `try_*` family: Spark 4 runs ANSI mode by default
    * (division by zero and overflow THROW), so production pipelines
    * over dirty data use try_divide / try_cast / try_add — NULL on
    * failure instead of killing a 1000-executor job 6 hours in. DuckDB
    * mirrors: CASE-guarded division, TRY_CAST, and plain + (the sums
    * here cannot overflow HUGEINT).
    */
  val tryFuncs = QueryDef(
    "q_try_funcs",
    (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("try_divide(l_extendedprice, l_quantity - 17)").cast("float")
            .as("price_per_extra_unit"),
          // dirty data is a MINORITY in practice — fail the cast on
          // line 1 only: an always-failing string cast pays a caught
          // JVM exception per row (~7µs — measured 4.3s over sf0.1
          // alone), which is a misleading cost model for try_*
          expr("try_cast(CASE WHEN l_linenumber = 1 THEN concat('x', l_returnflag) " +
            "ELSE CAST(CAST(l_quantity AS BIGINT) AS STRING) END AS int)").as("bad_int"),
          expr("try_cast(l_quantity AS int)").as("qty_int"),
          expr("try_add(l_orderkey, l_linenumber)").as("key_sum"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some("""
      SELECT l_orderkey, l_linenumber,
             CAST(CASE WHEN l_quantity - 17 = 0 THEN NULL
                  ELSE l_extendedprice / (l_quantity - 17) END AS FLOAT) AS price_per_extra_unit,
             TRY_CAST(CASE WHEN l_linenumber = 1 THEN concat('x', l_returnflag)
                  ELSE CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) END AS INT) AS bad_int,
             TRY_CAST(l_quantity AS INT) AS qty_int,
             l_orderkey + l_linenumber AS key_sum
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber
    """))

  /** The remaining §2.8 generators: inline (explode an array of
    * structs into columns) and explode_outer (null-preserving — the
    * row survives with a NULL where plain explode would drop it).
    * DuckDB twins: unnest(…, recursive := true) flattens the struct
    * fields; the outer contract is unnest(coalesce(arr, [NULL])).
    */
  val generatorFuncs = QueryDef(
    "q_generator_funcs",
    (s, d) => {
      val base = Tables.orders(s, d).filter(col("o_custkey") < 10)
      base
        .select(col("o_orderkey"), col("o_orderstatus"),
          inline(array(
            struct(lit("base").as("kind"), col("o_totalprice").as("amount")),
            struct(lit("tax").as("kind"),
              round(col("o_totalprice") * 0.1, 2).as("amount")))))
        .withColumn("flag",
          explode_outer(when(col("o_orderstatus") === "O", array(lit("open")))
            .otherwise(lit(null).cast("array<string>"))))
        .select(col("o_orderkey"), col("kind"), col("amount"), col("flag"))
        .orderBy(col("o_orderkey"), col("kind"))
    },
    Some("""
      WITH s1 AS (
        SELECT o_orderkey, o_orderstatus,
               unnest([
                 {'kind': 'base', 'amount': o_totalprice},
                 {'kind': 'tax',  'amount': round(o_totalprice * 0.1, 2)}],
                 recursive := true)
        FROM orders WHERE o_custkey < 10)
      SELECT o_orderkey, kind, amount,
             unnest(coalesce(CASE WHEN o_orderstatus = 'O' THEN ['open'] END,
                             [NULL])) AS flag
      FROM s1
      ORDER BY o_orderkey, kind
    """))

  /** Array SET operations — union / intersect / except between the
    * distinct token sets of adjacent documents, plus the sorted
    * intersection itself. Spark's array_intersect/array_union/
    * array_except have engine-specific ELEMENT ORDER, so every
    * compared array goes through array_sort and the same pipeline
    * (lower → split → drop empties → distinct) runs in both engines.
    * Map-side per pair after one equi-join on the adjacent-id key —
    * no shuffle beyond the join at any scale.
    */
  val arraySetOps = QueryDef(
    "q_array_setops",
    (s, d) => {
      val toks = expr("filter(array_distinct(split(lower(text), ' +')), x -> x != '')")
      val docs = Tables.documents(s, d).select(col("doc_id"), toks.as("t"))
      docs.as("a")
        .join(docs.as("b"), col("a.doc_id") + 1 === col("b.doc_id"))
        .select(col("a.doc_id").as("doc_id"),
          expr("cast(size(array_union(a.t, b.t)) as bigint)").as("n_union"),
          expr("cast(size(array_intersect(a.t, b.t)) as bigint)").as("n_inter"),
          expr("cast(size(array_except(a.t, b.t)) as bigint)").as("n_except"),
          // canonical-string encode (q_collect_list pattern): the
          // harness hash compare can't hash array cells. coalesce''d
          // on BOTH sides: DuckDB's array_to_string returns NULL for
          // an EMPTY list where Spark's array_join returns '' — a
          // divergence no doc pair triggered below sf1 (found by the
          // r8 10x scale validation)
          coalesce(
            expr("array_join(array_sort(array_intersect(a.t, b.t)), ' ')"),
            lit("")).as("inter_tokens"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id,
               list_distinct(list_filter(string_split_regex(lower(text), ' +'),
                                         x -> x != '')) AS t
        FROM documents)
      SELECT a.doc_id AS doc_id,
             CAST(len(list_distinct(list_concat(a.t, b.t))) AS BIGINT) AS n_union,
             CAST(len(list_filter(a.t, x -> list_contains(b.t, x))) AS BIGINT) AS n_inter,
             CAST(len(list_filter(a.t, x -> NOT list_contains(b.t, x))) AS BIGINT) AS n_except,
             coalesce(array_to_string(list_sort(list_filter(a.t, x -> list_contains(b.t, x))), ' '), '') AS inter_tokens
      FROM toks a JOIN toks b ON a.doc_id + 1 = b.doc_id
      ORDER BY doc_id
    """))

  def defs: Seq[QueryDef] = Seq(
    stringFuncs, dateFuncs, mathFuncs, arrayFuncs, jsonFuncs, variantFuncs,
    explodeTokens, mapFuncs, posExplode, stackUnpivot, stringAgg, bitwiseFuncs,
    regexFuncs, stringFuncs2, dateFuncs2, mathFuncs2, tryFuncs, generatorFuncs,
    arraySetOps)
}

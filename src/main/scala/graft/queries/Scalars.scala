package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryModule}
import graft.sources.Catalog

/** SURVEY.md §2.8 — scalar function library (string/date/math/array/json).
  *
  * JX scalar ops (reference jx_base/expressions, mo_times, mo_math per
  * SURVEY.md §2.8 [P]) re-expressed as codegen'd Column expressions from
  * org.apache.spark.sql.functions — no UDFs anywhere, so every query
  * stays inside whole-stage codegen and scales to 100 TB without a
  * serialization boundary per row.
  */
object Scalars extends QueryModule {

  def defs: Seq[QueryDef] = Seq(

    // JX `concat` skips missing operands (SURVEY §2.8) — concat_ws has
    // exactly that null-skipping semantic in both engines.
    QueryDef(
      "str_concat",
      (s, dir) =>
        Catalog.table(s, dir, "customer")
          .select(
            col("c_custkey"),
            concat_ws("|", col("c_name"),
              when(col("c_mktsegment") === "MACHINERY", lit(null))
                .otherwise(col("c_mktsegment"))).as("joined"))
          .orderBy("c_custkey")
          .limit(1000),
      Some("""SELECT c_custkey,
        concat_ws('|', c_name, nullif(c_mktsegment, 'MACHINERY')) AS joined
        FROM customer ORDER BY c_custkey LIMIT 1000""")),

    QueryDef(
      "str_length",
      (s, dir) =>
        Catalog.table(s, dir, "documents")
          .select(col("doc_id"), length(col("text")).as("len"))
          .orderBy("doc_id")
          .limit(500),
      Some("""SELECT doc_id, length(text) AS len FROM documents
        ORDER BY doc_id LIMIT 500""")),

    // JX left/right/not_left/not_right (SURVEY §2.8).
    QueryDef(
      "str_leftright",
      (s, dir) =>
        Catalog.table(s, dir, "customer")
          .select(
            col("c_custkey"),
            substring(col("c_name"), 1, 8).as("l8"),
            substring(col("c_name"), -6, 6).as("r6"),
            expr("substring(c_name, 9)").as("not_l8"),
            expr("substring(c_name, 1, length(c_name) - 6)").as("not_r6"))
          .orderBy("c_custkey")
          .limit(500),
      Some("""SELECT c_custkey, left(c_name, 8) AS l8, right(c_name, 6) AS r6,
        substr(c_name, 9) AS not_l8,
        left(c_name, length(c_name) - 6) AS not_r6
        FROM customer ORDER BY c_custkey LIMIT 500""")),

    // JX `find`: 0-based index of substring, missing when absent.
    QueryDef(
      "str_find",
      (s, dir) =>
        Catalog.table(s, dir, "documents")
          .select(
            col("doc_id"),
            (expr("nullif(locate('agg', text), 0)") - 1).as("idx"))
          .orderBy("doc_id")
          .limit(500),
      Some("""SELECT doc_id, nullif(strpos(text, 'agg'), 0) - 1 AS idx
        FROM documents ORDER BY doc_id LIMIT 500""")),

    // JX `between {prefix, suffix}`: substring between markers.
    QueryDef(
      "str_between",
      (s, dir) =>
        Catalog.table(s, dir, "documents")
          .select(
            col("doc_id"),
            regexp_extract(col("text"), "table (\\w+) row", 1).as("mid"))
          .orderBy("doc_id")
          .limit(500),
      Some("""SELECT doc_id,
        coalesce(regexp_extract(text, 'table (\w+) row', 1), '') AS mid
        FROM documents ORDER BY doc_id LIMIT 500""")),

    QueryDef(
      "str_case",
      (s, dir) =>
        Catalog.table(s, dir, "part")
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("uc"),
            lower(col("p_type")).as("lc"))
          .orderBy("p_partkey")
          .limit(500),
      Some("""SELECT p_partkey, upper(p_name) AS uc, lower(p_type) AS lc
        FROM part ORDER BY p_partkey LIMIT 500""")),

    QueryDef(
      "str_trim",
      (s, dir) =>
        Catalog.table(s, dir, "customer")
          .select(
            col("c_custkey"),
            trim(concat(lit("  "), col("c_name"), lit("  "))).as("t"),
            ltrim(concat(lit("  "), col("c_name"))).as("lt"),
            rtrim(concat(col("c_name"), lit("  "))).as("rt"))
          .orderBy("c_custkey")
          .limit(500),
      Some("""SELECT c_custkey, trim('  ' || c_name || '  ') AS t,
        ltrim('  ' || c_name) AS lt, rtrim(c_name || '  ') AS rt
        FROM customer ORDER BY c_custkey LIMIT 500""")),

    // Declared output serializes the array with a delimiter join, not
    // to_json: the driver comparator cannot sort array cells, and JSON
    // string escaping is library-dependent (Jackson vs yyjson disagree
    // on control/unicode escapes), while a plain join of the same
    // pieces is engine-invariant. The split itself stays array-native
    // for downstream ops.
    QueryDef(
      "str_split",
      (s, dir) =>
        Catalog.table(s, dir, "documents")
          .select(
            col("doc_id"),
            array_join(split(col("text"), " "), "|").as("words"),
            size(split(col("text"), " ")).as("n_words"))
          .orderBy("doc_id")
          .limit(200),
      Some("""SELECT doc_id, array_to_string(string_split(text, ' '), '|') AS words,
        len(string_split(text, ' ')) AS n_words
        FROM documents ORDER BY doc_id LIMIT 200""")),

    // JX `number`: tolerant string→number (missing on failure).
    QueryDef(
      "cast_number",
      (s, dir) =>
        Catalog.table(s, dir, "events")
          .select(
            col("event_id"),
            expr("try_cast(regexp_extract(props, '(\\\\d+)', 1) AS DOUBLE)").as("k_num"),
            expr("try_cast(event_type AS DOUBLE)").as("bad"))
          .orderBy("event_id")
          .limit(1000),
      Some("""SELECT event_id,
        try_cast(regexp_extract(props, '(\d+)', 1) AS DOUBLE) AS k_num,
        try_cast(event_type AS DOUBLE) AS bad
        FROM events ORDER BY event_id LIMIT 1000""")),

    QueryDef(
      "cast_string",
      (s, dir) =>
        Catalog.table(s, dir, "orders")
          .select(
            col("o_orderkey"),
            col("o_orderkey").cast("string").as("key_s"),
            col("o_orderdate").cast("string").as("date_s"))
          .orderBy("o_orderkey")
          .limit(1000),
      Some("""SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS key_s,
        CAST(o_orderdate AS VARCHAR) AS date_s
        FROM orders ORDER BY o_orderkey LIMIT 1000""")),

    QueryDef(
      "math_arith",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            round((col("l_extendedprice") * (lit(1) - col("l_discount"))
              + col("l_tax") - lit(1)) / lit(7), 6).as("v"))
          .orderBy("l_orderkey", "l_linenumber", "v")
          .limit(2000),
      Some("""SELECT l_orderkey, l_linenumber,
        round((l_extendedprice * (1 - l_discount) + l_tax - 1) / 7, 6) AS v
        FROM lineitem ORDER BY l_orderkey, l_linenumber, v LIMIT 2000""")),

    QueryDef(
      "math_mod",
      (s, dir) =>
        Catalog.table(s, dir, "orders")
          .select(
            col("o_orderkey"),
            (col("o_orderkey") % 7).as("m7"),
            pmod(col("o_orderkey"), lit(13)).as("pm13"))
          .orderBy("o_orderkey")
          .limit(1000),
      Some("""SELECT o_orderkey, o_orderkey % 7 AS m7, o_orderkey % 13 AS pm13
        FROM orders ORDER BY o_orderkey LIMIT 1000""")),

    // JX floor is floor-to-multiple (SURVEY §2.8). Spark floor returns
    // BIGINT, DuckDB DOUBLE — cast both sides to BIGINT.
    QueryDef(
      "math_floorceil",
      (s, dir) =>
        Catalog.table(s, dir, "customer")
          .select(
            col("c_custkey"),
            (floor(col("c_acctbal") / 100) * 100).as("bal_floor100"),
            ceil(col("c_acctbal")).as("bal_ceil"))
          .orderBy("c_custkey")
          .limit(1000),
      Some("""SELECT c_custkey,
        CAST(floor(c_acctbal / 100) AS BIGINT) * 100 AS bal_floor100,
        CAST(ceil(c_acctbal) AS BIGINT) AS bal_ceil
        FROM customer ORDER BY c_custkey LIMIT 1000""")),

    QueryDef(
      "math_round",
      (s, dir) =>
        Catalog.table(s, dir, "customer")
          .select(col("c_custkey"), round(col("c_acctbal"), 1).as("bal_r1"))
          .orderBy("c_custkey")
          .limit(1000),
      Some("""SELECT c_custkey, round(c_acctbal, 1) AS bal_r1
        FROM customer ORDER BY c_custkey LIMIT 1000""")),

    QueryDef(
      "math_abs_sign",
      (s, dir) =>
        Catalog.table(s, dir, "customer")
          .select(
            col("c_custkey"),
            round(abs(col("c_acctbal")), 2).as("abs_bal"),
            signum(col("c_acctbal")).cast("int").as("sign_bal"))
          .orderBy("c_custkey")
          .limit(1000),
      Some("""SELECT c_custkey, round(abs(c_acctbal), 2) AS abs_bal,
        CAST(sign(c_acctbal) AS INT) AS sign_bal
        FROM customer ORDER BY c_custkey LIMIT 1000""")),

    QueryDef(
      "math_exp_log",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            round(exp(col("l_discount")), 8).as("e"),
            round(log(col("l_quantity") + 1), 8).as("ln1p"),
            round(sqrt(col("l_extendedprice")), 8).as("rt"),
            round(pow(col("l_quantity"), 1.5), 8).as("p15"))
          .orderBy("l_orderkey", "l_linenumber", "e", "ln1p", "rt", "p15")
          .limit(1000),
      Some("""SELECT l_orderkey, l_linenumber, round(exp(l_discount), 8) AS e,
        round(ln(l_quantity + 1), 8) AS ln1p,
        round(sqrt(l_extendedprice), 8) AS rt,
        round(pow(l_quantity, 1.5), 8) AS p15
        FROM lineitem ORDER BY l_orderkey, l_linenumber, e, ln1p, rt, p15 LIMIT 1000""")),

    // JX variadic min/max across expressions → least/greatest.
    QueryDef(
      "math_minmax_n",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            least(col("l_quantity"), col("l_discount") * 100, lit(25.0)).as("lo"),
            greatest(col("l_quantity"), col("l_tax") * 100, lit(25.0)).as("hi"))
          .orderBy("l_orderkey", "l_linenumber", "lo", "hi")
          .limit(1000),
      Some("""SELECT l_orderkey, l_linenumber,
        least(l_quantity, l_discount * 100, 25.0) AS lo,
        greatest(l_quantity, l_tax * 100, 25.0) AS hi
        FROM lineitem ORDER BY l_orderkey, l_linenumber, lo, hi LIMIT 1000""")),

    // mo_times Date.floor(Duration) → date_trunc (SURVEY §2.8).
    QueryDef(
      "date_floor",
      (s, dir) =>
        Catalog.table(s, dir, "events")
          .select(
            col("event_id"),
            date_trunc("day", col("ts")).as("day"),
            date_trunc("week", col("ts")).as("week"),
            date_trunc("month", col("ts")).as("month"))
          .orderBy("event_id")
          .limit(1000),
      Some("""SELECT event_id, date_trunc('day', ts) AS day,
        date_trunc('week', ts) AS week, date_trunc('month', ts) AS month
        FROM events ORDER BY event_id LIMIT 1000""")),

    QueryDef(
      "date_parts",
      (s, dir) =>
        Catalog.table(s, dir, "events")
          .select(
            col("event_id"),
            year(col("ts")).as("y"),
            month(col("ts")).as("mo"),
            dayofmonth(col("ts")).as("d"),
            hour(col("ts")).as("h"),
            minute(col("ts")).as("mi"))
          .orderBy("event_id")
          .limit(1000),
      Some("""SELECT event_id, CAST(year(ts) AS INT) AS y,
        CAST(month(ts) AS INT) AS mo, CAST(day(ts) AS INT) AS d,
        CAST(hour(ts) AS INT) AS h, CAST(minute(ts) AS INT) AS mi
        FROM events ORDER BY event_id LIMIT 1000""")),

    QueryDef(
      "date_diff",
      (s, dir) =>
        Catalog.table(s, dir, "orders")
          .select(
            col("o_orderkey"),
            datediff(lit("2002-01-01").cast("timestamp"), col("o_orderdate"))
              .as("days_to"),
            (unix_timestamp(lit("2002-01-01").cast("timestamp"))
              - unix_timestamp(col("o_orderdate"))).as("secs_to"))
          .orderBy("o_orderkey")
          .limit(1000),
      Some("""SELECT o_orderkey,
        CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INT) AS days_to,
        CAST(epoch(TIMESTAMP '2002-01-01') - epoch(o_orderdate) AS BIGINT) AS secs_to
        FROM orders ORDER BY o_orderkey LIMIT 1000""")),

    // JX times are epoch seconds (SURVEY §1.2) — both directions.
    QueryDef(
      "date_from_unix",
      (s, dir) =>
        Catalog.table(s, dir, "events")
          .select(
            col("event_id"),
            unix_timestamp(col("ts")).as("epoch_s"),
            timestamp_seconds(unix_timestamp(col("ts"))).as("ts_rt"))
          .orderBy("event_id")
          .limit(1000),
      Some("""SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
        TIMESTAMP '1970-01-01' + to_seconds(CAST(floor(epoch(ts)) AS BIGINT)) AS ts_rt
        FROM events ORDER BY event_id LIMIT 1000""")),

    // FlatList element get / length / contains (SURVEY §1.1, §2.8).
    QueryDef(
      "arr_ops",
      (s, dir) =>
        Catalog.table(s, dir, "documents")
          .withColumn("words", split(col("text"), " "))
          .select(
            col("doc_id"),
            element_at(col("words"), 2).as("second"),
            size(col("words")).as("n"),
            array_contains(col("words"), "join").as("has_join"))
          .orderBy("doc_id")
          .limit(500),
      Some("""SELECT doc_id, string_split(text, ' ')[2] AS second,
        len(string_split(text, ' ')) AS n,
        list_contains(string_split(text, ' '), 'join') AS has_join
        FROM documents ORDER BY doc_id LIMIT 500""")),

    // FlatList broadcast-over-elements → higher-order functions.
    QueryDef(
      "arr_hof",
      (s, dir) =>
        Catalog.table(s, dir, "documents")
          .withColumn("words", split(col("text"), " "))
          .select(
            col("doc_id"),
            to_json(transform(col("words"), w => length(w))).as("lens"),
            // doc-text strings: delimiter join, not to_json (escaping
            // is library-dependent; see str_split).
            array_join(filter(col("words"), w => length(w) > 4), "|")
              .as("long_words"),
            aggregate(col("words"), lit(0),
              (acc, w) => acc + length(w)).as("total_chars"))
          .orderBy("doc_id")
          .limit(200),
      Some("""SELECT doc_id,
        CAST(to_json(list_transform(string_split(text, ' '), w -> length(w))) AS VARCHAR) AS lens,
        array_to_string(list_filter(string_split(text, ' '), w -> length(w) > 4), '|') AS long_words,
        CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS INTEGER) AS total_chars
        FROM documents ORDER BY doc_id LIMIT 200""")),

    // Nested descent `from: t.child` (SURVEY §2.8) → explode + re-agg.
    QueryDef(
      "arr_explode",
      (s, dir) =>
        Catalog.table(s, dir, "documents")
          .select(col("lang"), explode(split(col("text"), " ")).as("word"))
          .filter(length(col("word")) > 5)
          .groupBy("lang", "word")
          .agg(count(lit(1)).as("n"))
          .orderBy("lang", "word"),
      Some("""SELECT lang, word, count(*) AS n FROM (
          SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE length(word) > 5
        GROUP BY lang, word ORDER BY lang, word""")),

    // Dynamic payload access Data[path] on events.props JSON (SURVEY §2.8).
    QueryDef(
      "json_get",
      (s, dir) =>
        Catalog.table(s, dir, "events")
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .orderBy("event_id")
          .limit(2000),
      Some("""SELECT event_id,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events ORDER BY event_id LIMIT 2000""")),

    // mo_math hashes for keys/dedup (SURVEY §2.8).
    QueryDef(
      "hash_ops",
      (s, dir) =>
        Catalog.table(s, dir, "documents")
          .select(
            col("doc_id"),
            md5(col("text")).as("h_md5"),
            sha2(col("text"), 256).as("h_sha256"))
          .orderBy("doc_id")
          .limit(500),
      Some("""SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256
        FROM documents ORDER BY doc_id LIMIT 500""")),

    // Multivalue set algebra (JX multivalue-of-scalar, SURVEY §1.2):
    // intersect / except / union between array columns. Results are
    // DISTINCT-SORTED on both engines before the data-independent
    // sentinel join — element order out of the raw set ops is
    // engine-specific and duplicate handling differs (DuckDB
    // list_intersect keeps dups), so both are normalized away.
    QueryDef(
      "arr_setops",
      (s, dir) =>
        Catalog.table(s, dir, "documents")
          .withColumn("w", split(col("text"), " "))
          .withColumn("a", slice(col("w"), 1, 15))
          .withColumn("b", slice(col("w"), 10, 15))
          .select(
            col("doc_id"),
            array_join(sort_array(array_distinct(
              array_intersect(col("a"), col("b")))), "|").as("both"),
            array_join(sort_array(array_distinct(
              array_except(col("a"), col("b")))), "|").as("only_a"),
            array_join(sort_array(array_distinct(
              array_union(col("a"), col("b")))), "|").as("uni"))
          .orderBy("doc_id")
          .limit(500),
      Some("""SELECT doc_id,
          array_to_string(list_sort(list_distinct(list_intersect(a, b))), '|') AS both,
          array_to_string(list_sort(list_distinct(
            list_filter(a, x -> NOT list_contains(b, x)))), '|') AS only_a,
          array_to_string(list_sort(list_distinct(list_concat(a, b))), '|') AS uni
        FROM (SELECT doc_id,
            list_slice(string_split(text, ' '), 1, 15) AS a,
            list_slice(string_split(text, ' '), 10, 24) AS b
          FROM documents)
        ORDER BY doc_id LIMIT 500""")),

    // Dynamic-key JSON → map explosion: one row per (key, value) pair
    // with NO fixed schema — the semi-structured access pattern
    // json_get (fixed path) cannot cover. Generator runs row-local;
    // no shuffle before the output sort.
    QueryDef(
      "json_map_explode",
      (s, dir) =>
        Catalog.table(s, dir, "events")
          .select(col("event_id"),
            explode(from_json(col("props"),
                org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")))
              .as(Seq("k", "v")))
          .orderBy("event_id", "k")
          .limit(2000),
      Some("""SELECT event_id, k, CAST(json_extract(props, '$.' || k) AS BIGINT) AS v
        FROM (SELECT event_id, props, unnest(json_keys(props)) AS k FROM events)
        ORDER BY event_id, k LIMIT 2000""")),

    // mo_dots set_default: merge a defaults document UNDER each row's
    // dynamic JSON — existing keys win, missing keys fill from the
    // default (the reference's signature Data-object operation).
    // map_zip_with unions the key sets with existing-wins coalesce;
    // output is exploded to sorted (k, v) rows so the hash is
    // independent of either engine's JSON key order.
    // DECLARED CONSTRAINT: props values must be scalar and non-null.
    // RFC 7386 merge-patch (the oracle's json_merge_patch) DELETES a
    // key whose incoming value is JSON null, while set_default keeps
    // it and falls back to the default — and nested objects replace
    // wholesale rather than zip. The fixture's props are flat numeric
    // scalars, which is the domain this op is declared over; a
    // null-tolerant variant would filter null-valued keys on BOTH
    // sides before merging.
    QueryDef(
      "json_set_default",
      (s, dir) => {
        val defaults = map(lit("plan"), lit("free"), lit("tier"), lit("0"))
        val props = from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,string>"))
        Catalog.table(s, dir, "events")
          .filter(col("event_id") < 1500)
          .select(col("event_id"),
            explode(map_zip_with(defaults, props,
              (_, d, p) => coalesce(p, d))).as(Seq("k", "v")))
          .orderBy("event_id", "k")
      },
      Some("""SELECT event_id, k, json_extract_string(m, '$.' || k) AS v
        FROM (SELECT event_id,
            json_merge_patch('{"plan":"free","tier":"0"}', props) AS m
          FROM events WHERE event_id < 1500),
          LATERAL (SELECT unnest(json_keys(m)) AS k)
        ORDER BY event_id, k""")),

    // Regex group extraction — pull structured fields out of string
    // columns (the log-parsing workhorse). Pure codegen'd regexp, no
    // shuffle.
    QueryDef(
      "str_regex_extract",
      (s, dir) =>
        Catalog.table(s, dir, "customer")
          .select(col("c_custkey"),
            regexp_extract(col("c_name"), "^([A-Za-z]+)#([0-9]+)$", 1)
              .as("prefix"),
            regexp_extract(col("c_name"), "^([A-Za-z]+)#([0-9]+)$", 2)
              .as("digits"))
          .orderBy("c_custkey")
          .limit(500),
      Some("""SELECT c_custkey,
          regexp_extract(c_name, '^([A-Za-z]+)#([0-9]+)$', 1) AS prefix,
          regexp_extract(c_name, '^([A-Za-z]+)#([0-9]+)$', 2) AS digits
        FROM customer ORDER BY c_custkey LIMIT 500""")),

    // Calendar-aware month arithmetic (SURVEY §1.1: durations include
    // calendar months — months are not fixed-width, so both engines
    // must clamp month-end: Jan 31 + 1 month = Feb 29, not Mar 2).
    QueryDef(
      "date_months",
      (s, dir) =>
        Catalog.table(s, dir, "orders")
          .filter(col("o_orderkey") < 1000)
          .select(col("o_orderkey"),
            add_months(col("o_orderdate"), 3).as("plus3m"),
            last_day(col("o_orderdate")).as("eom"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
          CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
          last_day(CAST(o_orderdate AS DATE)) AS eom
        FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""")),

    // Padding / repetition / reversal — the fixed-width formatting
    // corner of the mo-strings surface (key canonicalization, aligned
    // text keys). Pure codegen'd string exprs.
    QueryDef(
      "str_pad",
      (s, dir) =>
        Catalog.table(s, dir, "customer")
          .select(col("c_custkey"),
            lpad(col("c_custkey").cast("string"), 10, "0").as("padded_key"),
            rpad(col("c_mktsegment"), 12, ".").as("seg_cell"),
            reverse(col("c_name")).as("rev_name"),
            repeat(lit("-"), (col("c_custkey") % 5 + 1).cast("int")).as("bar"))
          .orderBy("c_custkey")
          .limit(1000),
      Some("""SELECT c_custkey,
          lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
          rpad(c_mktsegment, 12, '.') AS seg_cell,
          reverse(c_name) AS rev_name,
          repeat('-', CAST(c_custkey % 5 + 1 AS INT)) AS bar
        FROM customer ORDER BY c_custkey LIMIT 1000""")),

    // Literal substring replacement (non-regex) — distinct from
    // llm_pii_redact's regexp path; replace() is the safe form when the
    // pattern is user data that must not be interpreted.
    QueryDef(
      "str_replace",
      (s, dir) =>
        Catalog.table(s, dir, "documents")
          .select(col("doc_id"),
            expr("replace(text, 'the', 'THE')").as("subst"),
            ((length(col("text")) -
              length(expr("replace(text, 'the', '')"))) / 3)
              .cast("long").as("n_hits"))
          .orderBy("doc_id")
          .limit(300),
      Some("""SELECT doc_id, replace(text, 'the', 'THE') AS subst,
          (length(text) - length(replace(text, 'the', ''))) // 3 AS n_hits
        FROM documents ORDER BY doc_id LIMIT 300""")),

    // Timestamp → formatted string (mo_times rendering). Pattern
    // languages differ (JDK letters vs strftime) but the rendered
    // text must agree byte-for-byte.
    QueryDef(
      "date_format_str",
      (s, dir) =>
        Catalog.table(s, dir, "events")
          .filter(col("event_id") < 2000)
          .select(col("event_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm").as("rendered"),
            date_format(col("ts"), "EEE").as("dow"))
          .orderBy("event_id"),
      Some("""SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M') AS rendered,
          strftime(ts, '%a') AS dow
        FROM events WHERE event_id < 2000 ORDER BY event_id""")),

    // Trigonometry / inverse trig — the long tail of mo_math. Rounded
    // to 9 digits so codegen'd libm vs DuckDB libm ulps can't flip the
    // hash.
    QueryDef(
      "math_trig",
      (s, dir) =>
        Catalog.table(s, dir, "lineitem")
          .filter(col("l_orderkey") < 3000)
          .select(col("l_orderkey"), col("l_linenumber"),
            round(sin(col("l_quantity")), 9).as("s"),
            round(cos(col("l_discount")), 9).as("c"),
            round(atan2(col("l_quantity"), col("l_extendedprice")), 9).as("a2"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
          round(sin(l_quantity), 9) AS s,
          round(cos(l_discount), 9) AS c,
          round(atan2(l_quantity, l_extendedprice), 9) AS a2
        FROM lineitem WHERE l_orderkey < 3000
        ORDER BY l_orderkey, l_linenumber""")),

    // Edit distance (levenshtein) — the fuzzy-match primitive behind
    // entity resolution / tolerant key matching; codegen'd on Spark,
    // same DP definition in DuckDB.
    QueryDef(
      "str_fuzzy",
      (s, dir) =>
        Catalog.table(s, dir, "customer")
          .filter(col("c_custkey") < 500)
          .select(col("c_custkey"),
            levenshtein(col("c_name"), lit("Customer#000000100")).as("dist"),
            round(lit(1.0) -
              levenshtein(col("c_name"), lit("Customer#000000100"))
                .cast("double") /
              greatest(length(col("c_name")), lit(18)), 6).as("sim"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
          levenshtein(c_name, 'Customer#000000100') AS dist,
          round(1.0 - levenshtein(c_name, 'Customer#000000100')::DOUBLE
            / greatest(length(c_name), 18), 6) AS sim
        FROM customer WHERE c_custkey < 500 ORDER BY c_custkey""")),

    // Bitwise scalar ops — flag masks / packed-field decoding (the
    // same family the SimHash fingerprints build on, exposed as a
    // declared scalar surface).
    QueryDef(
      "math_bitwise",
      (s, dir) =>
        Catalog.table(s, dir, "orders")
          .filter(col("o_orderkey") < 4000)
          .select(col("o_orderkey"),
            col("o_orderkey").bitwiseAND(lit(255L)).as("lo_byte"),
            col("o_orderkey").bitwiseOR(lit(4096L)).as("with_flag"),
            col("o_orderkey").bitwiseXOR(col("o_custkey")).as("mixed"),
            shiftleft(col("o_orderkey"), 3).as("shl"),
            shiftright(col("o_orderkey"), 2).as("shr"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
          o_orderkey & 255 AS lo_byte,
          o_orderkey | 4096 AS with_flag,
          xor(o_orderkey, o_custkey) AS mixed,
          o_orderkey << 3 AS shl,
          o_orderkey >> 2 AS shr
        FROM orders WHERE o_orderkey < 4000 ORDER BY o_orderkey""")),

    // Map-typed column surface (SURVEY §2.8): build a per-customer
    // status→count map with map_from_entries (entries sorted so the
    // map's internal order is deterministic), then read it back with
    // element_at / map_keys / map_values and fold the values with the
    // aggregate HOF. The map stays intra-row (no map-typed shuffle
    // key); the oracle checks the extracted scalars via conditional
    // aggregation — element_at on a missing key is NULL, mirrored by
    // SUM(CASE...) over an empty set.
    QueryDef(
      "map_ops",
      (s, dir) => {
        val per = Catalog.table(s, dir, "orders")
          .groupBy("o_custkey", "o_orderstatus")
          .agg(count(lit(1)).as("n"))
        per.groupBy("o_custkey")
          .agg(map_from_entries(sort_array(collect_list(
            struct(col("o_orderstatus"), col("n"))))).as("m"))
          .select(col("o_custkey"),
            element_at(col("m"), "F").as("n_f"),
            element_at(col("m"), "O").as("n_o"),
            element_at(col("m"), "P").as("n_p"),
            size(map_keys(col("m"))).as("n_status"),
            expr("aggregate(map_values(m), 0L, (acc, x) -> acc + x)")
              .as("n_total"))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey,
          CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_f,
          CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_o,
          CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS n_p,
          CAST(count(DISTINCT o_orderstatus) AS INT) AS n_status,
          CAST(count(*) AS BIGINT) AS n_total
        FROM orders GROUP BY o_custkey ORDER BY o_custkey""")))
}

package graft.operators

import org.apache.spark.sql.functions._
import graft.Spec
import graft.sources.Tables

/** SURVEY.md §2.8 — scalar function families. One query per family, each
  * exercising several functions with results that hash-match DuckDB.
  *
  * Cross-engine determinism rules applied here:
  *  - String/date/integer functions are exact — used freely.
  *  - Transcendental libm functions (ln/exp/pow) are NOT guaranteed
  *    bit-identical between the JVM and DuckDB's C++ — avoided in oracle
  *    queries; `sqrt` IS IEEE-754 correctly-rounded everywhere and is safe.
  *  - `round` on raw doubles differs at representation edges — rounding is
  *    always done on a decimal-cast value (exact, same HALF_UP rule both
  *    engines).
  * All functions below are Catalyst built-ins (whole-stage-codegen'd) except
  * the one deliberate UDF in `fn_udf_scalar`, quarantined to its own query
  * (a UDF is an opaque box to the optimizer: no pushdown through it, no
  * codegen — the 100 TB rule is "built-ins everywhere they exist").
  */
object Functions {
  def specs: Seq[Spec] = Seq(fnString, fnDate, fnMath, fnArray, fnMap,
    fnJson, fnUdfScalar, fnUdtfExplode, fnRegex, fnEncode, fnVariant,
    fnVariantExplode,
    fnAvroRoundtrip, fnCsvRoundtrip, fnXmlRoundtrip, fnTryArith,
    fnNaFill, fnCollation, fnStack, fnInterval, fnSequenceArray, fnMask,
    fnAesRoundtrip, fnArraySetOps, fnMapHof, fnRounding, fnUrl,
    fnTryCast, fnTimezone, fnDateParts, fnPrintf, fnStrToMap,
    fnDatetimeFormat, fnXpath, fnExplodeOuter, fnNumberFormat,
    fnWidthBucket, fnLuhn, fnToNumber, fnReflect, fnIdGeneration,
    fnArrayEdit, fnStringEdit, fnDatetimeMake, fnRegexPosition,
    fnBinaryConv, fnArrayConstruct, fnDatetimeNames, fnGuards,
    fnJsonMeta, sqlUdfScalar, sqlUdfTable)

  /** `width_bucket` — equi-width histogram binning as a single
    * expression (the SQL-standard spelling of "which of n uniform
    * buckets does this value fall in", with the under/overflow buckets
    * 0 and n+1): the map-side half of any histogram at 100 TB — bucket
    * per row, then ONE hash aggregate; `agg_histogram` builds the same
    * thing from arithmetic, this row pins the built-in. Integer inputs
    * ⇒ every intermediate is exactly representable, so the DuckDB
    * replay (floor arithmetic with explicit under/overflow clamps —
    * DuckDB has no width_bucket) is bit-deterministic. Both in-range
    * and the overflow bucket are exercised (hi=41 puts p_size 41–50
    * into bucket n+1). */
  private val fnWidthBucket = Spec(
    "fn_width_bucket",
    """SELECT p_partkey,
      |  CAST(CASE WHEN p_size >= 41 THEN 9
      |            ELSE (p_size - 1) // 5 + 1 END AS BIGINT) AS bucket,
      |  CAST((p_size - 1) // 5 + 1 AS BIGINT)               AS bucket10
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        expr("width_bucket(p_size, 1, 41, 8)").as("bucket"),
        expr("width_bucket(p_size, 1, 51, 10)").as("bucket10"))
      .orderBy(col("p_partkey"))
  }

  /** Map HIGHER-ORDER functions (`transform_keys` / `transform_values` /
    * `map_filter` / `map_zip_with`) — per-row map algebra as codegen'd
    * lambdas, the map-typed sibling of [[fnArraySetOps]] and the family
    * [[fnMap]]'s constructor/accessor row does not touch. The
    * per-feature-map reweighting a 100 TB feature store does stays a
    * projection (no explode → relational op → re-collect_map round
    * trip, which is three shuffles and a non-deterministic rebuild
    * order). Maps are UNORDERED on both engines, so every output
    * serializes through entries SORTED BY KEY (array_sort on the entry
    * structs — lexicographic on key then value) before joining; the
    * oracle computes the same strings directly from the base columns
    * the maps were built from, sidestepping DuckDB's different MAP
    * builtin set entirely. */
  private val fnMapHof = Spec(
    "fn_map_hof",
    """WITH m AS (SELECT o_orderkey,
      |    o_orderkey % 5 AS x, o_orderkey % 3 AS y FROM orders)
      |SELECT o_orderkey,
      |  'A:' || x || ',B:' || y AS tk,
      |  'a:' || (x * 2) || ',b:' || (y * 2) AS tv,
      |  concat_ws(',',
      |    CASE WHEN x >= 2 THEN 'a:' || x END,
      |    CASE WHEN y >= 2 THEN 'b:' || y END) AS mf,
      |  'a:' || x || ',b:' || (y + 10) || ',c:1' AS mz
      |FROM m ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    def ser(m: org.apache.spark.sql.Column) =
      array_join(transform(array_sort(map_entries(m)),
        e => concat(e.getField("key"), lit(":"),
          e.getField("value").cast("string"))), ",")
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        map(lit("a"), col("o_orderkey") % 5,
          lit("b"), col("o_orderkey") % 3).as("m1"),
        map(lit("b"), lit(10L), lit("c"), lit(1L)).as("m2"))
      .select(col("o_orderkey"),
        ser(expr("transform_keys(m1, (k, v) -> upper(k))")).as("tk"),
        ser(expr("transform_values(m1, (k, v) -> v * 2)")).as("tv"),
        ser(expr("map_filter(m1, (k, v) -> v >= 2)")).as("mf"),
        ser(expr("map_zip_with(m1, m2, (k, v1, v2) -> " +
          "coalesce(v1, 0L) + coalesce(v2, 0L))")).as("mz"))
      .orderBy(col("o_orderkey"))
  }

  /** Rounding POLICY (`round` HALF_UP vs `bround` HALF_EVEN): the two
    * modes genuinely differ on the fixture (any price with 5 in the
    * hundredths place rounds differently at 1 decimal), and a financial
    * pipeline at 100 TB must pick one deliberately — HALF_EVEN is the
    * IEEE/banker's default that cancels systematic half-cent drift over
    * billions of rows; HALF_UP is the retail convention. Both computed
    * on the EXACT decimal (never the raw double — rounding a double's
    * nearest-representable value flips edge cases), cast to double only
    * for the comparator. DuckDB's own `round_even` macro is NOT usable
    * as the oracle: it routes through DOUBLE internally and misrounds
    * the borderline .x5 cents the row exists to pin (measured: 11
    * divergences at sf0.001, e.g. 75914.65 → 75914.7), so the oracle
    * spells banker's rounding EXACTLY in integer cents — ties pick the
    * even 10-cent quotient. */
  private val fnRounding = Spec(
    "fn_rounding",
    """WITH c AS (SELECT o_orderkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents FROM orders),
      |q AS (SELECT o_orderkey, cents // 10 AS q, cents % 10 AS r FROM c)
      |SELECT o_orderkey,
      |  CAST(CASE WHEN r >= 5 THEN q + 1 ELSE q END AS DOUBLE) / 10
      |    AS r_half_up,
      |  CAST(CASE WHEN r > 5 THEN q + 1
      |            WHEN r < 5 THEN q
      |            WHEN q % 2 = 0 THEN q ELSE q + 1 END AS DOUBLE) / 10
      |    AS r_half_even
      |FROM q ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        round(col("o_totalprice").cast("decimal(18,2)"), 1).cast("double")
          .as("r_half_up"),
        bround(col("o_totalprice").cast("decimal(18,2)"), 1).cast("double")
          .as("r_half_even"))
      .orderBy(col("o_orderkey"))
  }

  /** Array SET algebra (`array_union` / `array_intersect` /
    * `array_except` / `flatten` / `array_position`) — per-row set
    * operations on array columns (tag lists, token sets, feature IDs),
    * the family [[fnArray]]'s slice/transform row does not touch. All
    * codegen'd expressions evaluated row-local — no explode + relational
    * set op + re-collect (three shuffles for what one projection does),
    * which is the 100 TB difference for per-document tag math. Arrays
    * are data-driven with a duplicate planted (union/intersect/except
    * all dedupe — Spark preserves first-occurrence order, DuckDB's
    * list_distinct is order-unspecified, so both sides sort before the
    * string join; the COMPARATOR rejects raw array columns by design).
    * array_position is 1-based in both engines. */
  private val fnArraySetOps = Spec(
    "fn_array_set_ops",
    """WITH m AS (SELECT o_orderkey,
      |    [o_orderkey % 5, o_orderkey % 3, o_orderkey % 5] AS a,
      |    [o_orderkey % 3, o_orderkey % 7] AS b
      |  FROM orders)
      |SELECT o_orderkey,
      |  array_to_string(list_sort(list_distinct(a || b)), ',') AS un,
      |  COALESCE(array_to_string(list_sort(list_distinct(
      |    list_filter(a, x -> list_contains(b, x)))), ','), '') AS inter,
      |  COALESCE(array_to_string(list_sort(list_distinct(
      |    list_filter(a, x -> NOT list_contains(b, x)))), ','), '') AS exc,
      |  array_to_string(flatten([a, b]), ',') AS flat,
      |  list_position(a, o_orderkey % 3) AS pos
      |FROM m ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    // DuckDB renders an empty list as NULL through array_to_string where
    // Spark's array_join gives '' — COALESCE the two columns that can
    // legitimately go empty (intersect/except).
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        array(col("o_orderkey") % 5, col("o_orderkey") % 3,
          col("o_orderkey") % 5).as("a"),
        array(col("o_orderkey") % 3, col("o_orderkey") % 7).as("b"))
      .select(col("o_orderkey"),
        array_join(sort_array(array_union(col("a"), col("b"))), ",")
          .as("un"),
        array_join(sort_array(array_intersect(col("a"), col("b"))), ",")
          .as("inter"),
        array_join(sort_array(array_except(col("a"), col("b"))), ",")
          .as("exc"),
        array_join(flatten(array(col("a"), col("b"))), ",").as("flat"),
        array_position(col("a"), col("o_orderkey") % 3).as("pos"))
      .orderBy(col("o_orderkey"))
  }

  /** `sequence(start, stop)` + `explode` — DIMENSION GENERATION inside
    * the engine (integer spines, retry schedules, per-row fan-out of a
    * data-driven width). The generator runs in the same codegen stage
    * as the scan — no driver-side `Seq.range` collect-and-parallelize,
    * no join against a pre-built numbers table — and the fan-out width
    * is a per-row expression, which a static spine table cannot express.
    * Output size is sum(width) — bounded here by width ≤ 4; the
    * size(…) column witnesses the array length the generator produced.
    * DuckDB spells it unnest(generate_series(…)). */
  private val fnSequenceArray = Spec(
    "fn_sequence_array",
    """SELECT o_orderkey,
      |  unnest(generate_series(1, o_orderkey % 4 + 1)) AS step,
      |  (o_orderkey % 4 + 1) AS width
      |FROM orders
      |ORDER BY o_orderkey, step""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        expr("sequence(1L, o_orderkey % 4 + 1)").as("steps"))
      .select(col("o_orderkey"), explode(col("steps")).as("step"),
        size(col("steps")).cast("bigint").as("width"))
      .orderBy(col("o_orderkey"), col("step"))
  }

  /** `mask()` (Spark 3.4+) — structure-preserving PII masking: upper →
    * 'X', lower → 'x', digits → 'n', other characters kept, so format
    * validators and length-based joins still work on the masked column.
    * This is the FUNCTION-level companion of `llm_pii_scrub`'s
    * pattern-level scrubbing: one codegen'd expression, no regex
    * engine, applied at read time in the privacy boundary every
    * compliant 100 TB export crosses. Second column keeps letters and
    * masks ONLY digits (`mask(c, NULL, NULL, '*', NULL)` — NULL means
    * keep-category), the redact-account-numbers shape. The oracle
    * spells both as regexp_replace class chains (fixture strings are
    * ASCII; Spark's Unicode category and the oracle's [A-Z] class agree
    * there). */
  private val fnMask = Spec(
    "fn_mask",
    """SELECT c_custkey,
      |  regexp_replace(regexp_replace(regexp_replace(
      |    c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n',
      |    'g') AS m_default,
      |  regexp_replace(c_name, '[0-9]', '*', 'g') AS m_digits
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .select(col("c_custkey"),
        expr("mask(c_name)").as("m_default"),
        expr("mask(c_name, NULL, NULL, '*', NULL)").as("m_digits"))
      .orderBy(col("c_custkey"))
  }

  /** `aes_encrypt`/`aes_decrypt` (Spark 3.3+) — column-level encryption
    * at rest, the lawful-basis path for keeping re-identifiable keys in
    * a 100 TB lake (encrypt on write, decrypt under the key only in the
    * authorized read path). ECB mode deliberately: GCM salts a random
    * IV per call (right for production, untestable for a hash oracle) —
    * ECB is deterministic, which here is the point: the round-trip
    * identity AND the ciphertext length (PKCS#7 block padding:
    * (len/16 + 1) * 16) are both oracle-checkable. The oracle computes
    * the padding arithmetic; the engine produces real AES blocks. */
  private val fnAesRoundtrip = Spec(
    "fn_aes_roundtrip",
    """SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS rt,
      |  (length(CAST(o_orderkey AS VARCHAR)) // 16 + 1) * 16 AS ct_len
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val key = "graft-0123456789"
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        expr(s"CAST(aes_decrypt(aes_encrypt(CAST(o_orderkey AS STRING), " +
          s"'$key', 'ECB'), '$key', 'ECB') AS STRING)").as("rt"),
        expr(s"CAST(octet_length(aes_encrypt(CAST(o_orderkey AS STRING), " +
          s"'$key', 'ECB')) AS BIGINT)").as("ct_len"))
      .orderBy(col("o_orderkey"))
  }

  /** The `stack(n, k1, v1, k2, v2, …)` generator — wide→long reshaping
    * as a GENERATOR (one input row fans out to n output rows in the
    * same codegen stage), the inverse of `pivot_status` and the
    * expression-level sibling of `agg_unpivot`'s relational UNPIVOT.
    * Map-only: no shuffle, no UNION re-scan of the input (the naive
    * spelling scans the table once per measure — n scans where stack
    * does one), which is the difference at 100 TB. Oracle spells the
    * fan-out as the UNION ALL it replaces. */
  private val fnStack = Spec(
    "fn_stack",
    """SELECT o_orderkey, 'price' AS metric, o_totalprice AS val
      |FROM orders
      |UNION ALL
      |SELECT o_orderkey, 'cust', CAST(o_custkey AS DOUBLE) FROM orders
      |ORDER BY o_orderkey, metric""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        expr("stack(2, 'price', o_totalprice, " +
          "'cust', CAST(o_custkey AS DOUBLE)) AS (metric, val)"))
      .orderBy(col("o_orderkey"), col("metric"))
  }

  /** Interval arithmetic (`make_dt_interval` day-time intervals and
    * ANSI `INTERVAL 'n' MONTH` year-month intervals on timestamps) —
    * SLA due-dates, retention horizons, calendar bucketing. The two
    * interval families deliberately differ: day-time is a fixed
    * number of microseconds (codegen'd long addition), year-month is
    * calendar arithmetic with end-of-month clamping — both engines
    * clamp (Jan 31 + 1 month = Feb 28/29), which the oracle verifies
    * value-for-value across every fixture date. Emitted as strings:
    * the comparator's timestamp path is engine-dtype-sensitive, and
    * the string render is the exact same 'yyyy-MM-dd HH:mm:ss' on
    * both engines. */
  private val fnInterval = Spec(
    "fn_interval",
    """SELECT o_orderkey,
      |  CAST(o_orderdate + INTERVAL 3 DAY + INTERVAL 12 HOUR
      |       + INTERVAL 30 MINUTE AS VARCHAR) AS due,
      |  CAST(o_orderdate + INTERVAL 2 MONTH AS VARCHAR) AS due_m
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        (col("o_orderdate") + expr("make_dt_interval(3, 12, 30, 0)"))
          .cast("string").as("due"),
        (col("o_orderdate") + expr("INTERVAL '2' MONTH"))
          .cast("string").as("due_m"))
      .orderBy(col("o_orderkey"))
  }

  /** The `try_*` arithmetic family (Spark 3.5+/ANSI-mode companions):
    * division by zero, BIGINT overflow — each yields NULL instead of a
    * runtime error, which is what lets a 100 TB batch job survive the
    * one poisoned row in shard 9 000 without an executor-killing
    * exception and without globally disabling ANSI checks. The error
    * cases are DATA-DRIVEN (o_orderkey mod classes), so both NULL and
    * non-NULL paths appear in the output; the DuckDB oracle spells the
    * same semantics with CASE guards, and the non-error divisions are
    * identical IEEE doubles on both engines. */
  private val fnTryArith = Spec(
    "fn_try_arith",
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 3 = 0 THEN NULL
      |       ELSE o_totalprice / (o_orderkey % 3) END AS safe_div,
      |  CASE WHEN o_orderkey = 0 THEN 0
      |       WHEN o_orderkey = 1 THEN 9223372036854775807
      |       ELSE NULL END AS safe_mul,
      |  CASE WHEN o_orderkey = 0 THEN 9223372036854775807
      |       ELSE NULL END AS safe_add
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    // orderkey 0 (the fixture has one) does NOT overflow: 0·MAX = 0 and
    // MAX+0 = MAX — the oracle spells out exactly which rows error
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        expr("try_divide(o_totalprice, o_orderkey % 3)").as("safe_div"),
        expr("try_multiply(o_orderkey, 9223372036854775807L)")
          .as("safe_mul"),
        expr("try_add(9223372036854775807L, o_orderkey)").as("safe_add"))
      .orderBy(col("o_orderkey"))
  }

  /** The `DataFrameNaFunctions` null-policy surface (`na.fill` /
    * `na.replace` / `na.drop`) — the declarative spelling of the three
    * null decisions every 100 TB ingest makes (impute, canonicalize,
    * discard). All three desugar to plain Catalyst projections/filters
    * (coalesce / CASE / IsNotNull), so they stay inside whole-stage
    * codegen and the drop-filter still pushes down — nothing here is an
    * opaque cleaning UDF. Nulls are manufactured data-driven (orderkey
    * mod classes) so both policy paths appear in the output; the oracle
    * spells the identical semantics with CASE/WHERE. The filled price is
    * value-identical passthrough (no arithmetic), so the hash is exact. */
  private val fnNaFill = Spec(
    "fn_na_fill",
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 3 = 0 THEN -1.0 ELSE o_totalprice END AS price,
      |  CASE WHEN o_orderpriority = '1-URGENT' THEN 'URGENT'
      |       ELSE o_orderpriority END AS prio
      |FROM orders WHERE o_orderkey % 5 <> 0
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 3 === 0, lit(null))
          .otherwise(col("o_totalprice")).as("price"),
        when(col("o_orderkey") % 5 === 0, lit(null))
          .otherwise(col("o_orderpriority")).as("prio"))
      .na.fill(Map("price" -> -1.0))
      .na.replace("prio", Map("1-URGENT" -> "URGENT"))
      .na.drop(Seq("prio"))
      .orderBy(col("o_orderkey"))
  }

  /** String collation (Spark 4's `COLLATE` type modifier via
    * `functions.collate`): equality, DISTINCT, and grouping become
    * collation-aware WITHOUT rewriting every comparison through
    * `lower()` — the engine compares via ICU collation keys, hashes
    * stay partition-consistent, and at 100 TB a case-insensitive
    * distinct-count is one typed column instead of a normalize-rewrite
    * of every consumer. The query case-mangles p_type data-driven (even
    * keys lowered), then counts binary-distinct vs UTF8_LCASE-distinct
    * (12 vs 6 on the fixture — the 2× collapse IS the witness) plus a
    * collated equality hit-count against a lowercase literal matching
    * rows of BOTH casings. The collated value itself is never emitted —
    * under a collation two binary-different strings compare equal, so
    * any representative choice (min/max/group key) would be
    * tie-nondeterministic; counts are not. Oracle spells the same
    * semantics via lower(). */
  private val fnCollation = Spec(
    "fn_collation",
    """WITH m AS (SELECT CASE WHEN p_partkey % 2 = 0 THEN lower(p_type)
      |                       ELSE p_type END AS t FROM part)
      |SELECT COUNT(DISTINCT t) AS n_binary,
      |  COUNT(DISTINCT lower(t)) AS n_lcase,
      |  COUNT(CASE WHEN lower(t) = 'promo' THEN 1 END) AS n_eq
      |FROM m""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .select(when(col("p_partkey") % 2 === 0, lower(col("p_type")))
        .otherwise(col("p_type")).as("t"))
      .agg(countDistinct(col("t")).as("n_binary"),
        countDistinct(collate(col("t"), "UTF8_LCASE")).as("n_lcase"),
        count(when(collate(col("t"), "UTF8_LCASE") === lit("promo"), 1))
          .as("n_eq"))
  }

  /** CSV record serde (`to_csv`/`from_csv` + an explicit StructType) —
    * the text-line sibling of [[fnAvroRoundtrip]]'s binary wire path:
    * struct → one CSV line → struct, the per-record codec under every
    * "CSV lines on a queue / in a text column" ingest. Round-trip
    * identity is NOT trivial for doubles (render + reparse), which is
    * exactly why it's oracle-checked: Java's shortest-representation
    * double formatting reparses to the identical bits, and a locale or
    * quoting regression would break the row hash. Map-only; both
    * directions are Catalyst built-ins (codegen'd). */
  private val fnCsvRoundtrip = Spec(
    "fn_csv_roundtrip",
    """SELECT s_suppkey, s_name, s_acctbal FROM supplier
      |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("s_suppkey", LongType),
      StructField("s_name", StringType), StructField("s_acctbal", DoubleType)))
    Tables.supplier(s, d)
      .select(struct(col("s_suppkey"), col("s_name"), col("s_acctbal"))
        .as("rec"))
      .select(to_csv(col("rec")).as("line"))
      .select(from_csv(col("line"), schema, Map.empty[String, String])
        .as("rec"))
      .select(col("rec.s_suppkey").as("s_suppkey"),
        col("rec.s_name").as("s_name"),
        col("rec.s_acctbal").as("s_acctbal"))
      .orderBy(col("s_suppkey"))
  }

  /** XML record serde (`to_xml`/`from_xml`, native in Spark 4) — the
    * third record codec next to Avro and CSV: struct → one XML element →
    * struct, with entity escaping and tag-per-field structure exercised
    * on real fixture strings. Identity oracle; map-only built-ins. */
  private val fnXmlRoundtrip = Spec(
    "fn_xml_roundtrip",
    """SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("o_orderkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_orderpriority", StringType)))
    Tables.orders(s, d)
      .select(struct(col("o_orderkey"), col("o_orderstatus"),
        col("o_orderpriority")).as("rec"))
      .select(to_xml(col("rec")).as("doc"))
      .select(from_xml(col("doc"), schema,
        new java.util.HashMap[String, String]()).as("rec"))
      .select(col("rec.o_orderkey").as("o_orderkey"),
        col("rec.o_orderstatus").as("o_orderstatus"),
        col("rec.o_orderpriority").as("o_orderpriority"))
      .orderBy(col("o_orderkey"))
  }

  /** Avro wire-format serde — struct → Avro binary → struct, the
    * value-serde path every Kafka/stream-transport pipeline runs on each
    * record. This image bundles the avro serde ENGINE but not the
    * external module's `to_avro`/`from_avro` expressions (resolution
    * fails with AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE), so the engine
    * carries its own native-Expression pair —
    * [[org.apache.spark.sql.graft.AvroWire]] — per the preference order
    * (built-ins > native Expression > UDF). With the transport jar
    * absent from the image (the one non-actionable gap, SURVEY §2.1),
    * this registers the SERDE half of that story: the same
    * `toAvro(struct(...))` column feeds a kafka sink's `value` unchanged.
    * ONE Avro schema — generated from the catalyst type by Spark's own
    * `SchemaConverters.toAvroType`, so serializer compatibility and
    * union-branch layout are by construction — is passed to BOTH
    * directions. Map-only (no shuffle but the final presentation sort);
    * the binary wire column lives only inside the plan. The oracle is
    * the identity projection — any serde corruption (field order,
    * union-branch index, zig-zag varint width, UTF-8 handling) breaks
    * the row hash. */
  private val fnAvroRoundtrip = Spec(
    "fn_avro_roundtrip",
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.graft.AvroWire
    val withRec = Tables.customer(s, d)
      .select(struct(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .as("rec"))
    val recField = withRec.schema("rec")
    val avroJson = org.apache.spark.sql.avro.SchemaConverters
      .toAvroType(recField.dataType, recField.nullable, "cust", "").toString
    withRec
      .select(AvroWire.toAvro(col("rec"), avroJson).as("wire"))
      .select(AvroWire.fromAvro(col("wire"), avroJson).as("rec"))
      .select(col("rec.c_custkey").as("c_custkey"),
        col("rec.c_name").as("c_name"),
        col("rec.c_acctbal").as("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** Spark 4 VariantType — the OPEN semi-structured path that replaces
    * schema-on-read JSON strings: `parse_json` builds the binary variant
    * ONCE at ingest (at 100 TB, that one parse amortizes every later
    * field access — `variant_get` reads the binary encoding, it never
    * re-parses text, which is the whole economic argument for the type),
    * then typed extraction, existence probing via try_variant_get, and a
    * schema round-trip through schema_of_variant. The extraction paths
    * ($.k typed long, a missing $.missing as NULL) are mirrored in
    * DuckDB's JSON operators — same values, so the row hash checks the
    * whole pipeline even though the binary encodings differ. */
  private val fnVariant = Spec(
    "fn_variant",
    """SELECT event_id,
      |  CAST(props->>'k' AS BIGINT) AS k_typed,
      |  props->>'missing' AS missing_str,
      |  props->>'k' IS NOT NULL AS has_k,
      |  'OBJECT<k: BIGINT>' AS v_schema
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val v = parse_json(col("props"))
    Tables.events(s, d)
      .select(col("event_id"), v.as("v"))
      .select(col("event_id"),
        variant_get(col("v"), "$.k", "bigint").as("k_typed"),
        try_variant_get(col("v"), "$.missing", "string").as("missing_str"),
        try_variant_get(col("v"), "$.k", "bigint").isNotNull.as("has_k"),
        schema_of_variant(col("v")).as("v_schema"))
      .orderBy(col("event_id"))
  }

  /** `variant_explode` — the TVF generator over VariantType (Spark 4),
    * completing the variant surface beside [[fnVariant]]'s scalar
    * extraction: shred a semi-structured object into (pos, key, value)
    * rows through correlated LATERAL, the shape that turns a
    * ragged-schema event payload into a long-format key/value table
    * without declaring its schema up front. Planned as an ordinary
    * Generate over the outer row (the `sql_udf_table` /`join_lateral`
    * decorrelation guarantee), map-only at any scale. The typed value
    * is emitted through CAST(variant AS BIGINT); the oracle replays the
    * fixture's known single-key object shape ({"k": <int>},
    * FIXTURES.md — the same contract [[fnJson]]/[[fnVariant]] pin)
    * with literal pos/key, which is exactly what makes the explode
    * output deterministic to hash. */
  private val fnVariantExplode = Spec(
    "fn_variant_explode",
    """SELECT event_id, 0 AS pos, 'k' AS key,
      |  CAST(props->>'k' AS BIGINT) AS val
      |FROM events WHERE event_id < 200
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .filter(col("event_id") < 200)
      .select(col("event_id"), col("props"))
      .createOrReplaceTempView("graft_vexp_events")
    s.sql(
      """SELECT event_id, v.pos, v.key, CAST(v.value AS BIGINT) AS val
        |FROM graft_vexp_events,
        |  LATERAL variant_explode(parse_json(props)) v
        |ORDER BY event_id""".stripMargin)
  }

  /** Binary codec family — base64 / hex over UTF-8 document bytes plus a
    * decode round-trip proof. This is the interchange surface every
    * pipeline hits at its edges (payloads in JSON envelopes, keys in URLs,
    * blobs in text logs); all four directions are codegen'd built-ins over
    * the string→binary cast, map-only at any scale. Byte-level parity:
    * both engines encode the SAME UTF-8 bytes (Spark `cast(string as
    * binary)` ≡ DuckDB `encode()`), and RFC 4648 base64 / uppercase hex
    * are canonical in both, so even multi-byte codepoints hash-match. */
  private val fnEncode = Spec(
    "fn_encode",
    """SELECT doc_id,
      |  base64(encode(COALESCE(text, ''))) AS b64,
      |  hex(encode(COALESCE(text, ''))) AS hx,
      |  decode(from_base64(base64(encode(COALESCE(text, '')))))
      |    = COALESCE(text, '') AS rt_ok
      |FROM documents WHERE doc_id % 25 = 0
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        coalesce(col("text"), lit("")).cast("binary").as("bytes"))
      .select(col("doc_id"),
        // Spark's base64 MIME-chunks long output with CRLF every 76 chars
        // (legacy chunking); strip to the canonical unchunked RFC 4648
        // form DuckDB emits
        regexp_replace(base64(col("bytes")), "\r\n", "").as("b64"),
        hex(col("bytes")).as("hx"),
        (unbase64(base64(col("bytes"))).cast("string")
          === col("bytes").cast("string")).as("rt_ok"))
      .orderBy(col("doc_id"))
  }

  /** Regex function family over part names ("small ring", "red widget"):
    * extract / extract-all count / boolean match. Patterns stay inside the
    * character-class + alternation + anchors subset where Java regex
    * (Spark) and RE2 (DuckDB) agree; Spark's regexp_extract returns '' on
    * no-match, matching DuckDB. Per-row projection, codegen'd. */
  private val fnRegex = Spec(
    "fn_regex",
    """SELECT p_partkey,
      |  regexp_extract(p_name, '^[a-z]+', 0)              AS first_word,
      |  regexp_extract(p_name, '([a-z]+)$', 1)            AS last_word,
      |  len(regexp_extract_all(p_name, '[aeiou]+'))       AS n_vowel_runs,
      |  regexp_matches(p_name, '^(red|blue|green) ')      AS is_colored
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        regexp_extract(col("p_name"), "^[a-z]+", 0).as("first_word"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        size(expr("regexp_extract_all(p_name, '[aeiou]+', 0)"))
          .cast("long").as("n_vowel_runs"),
        col("p_name").rlike("^(red|blue|green) ").as("is_colored"))
      .orderBy(col("p_partkey"))
  }

  private val fnString = Spec(
    "fn_string",
    """SELECT p_partkey,
      |  upper(p_name)                              AS up,
      |  lower(p_brand)                             AS lo,
      |  substring(p_type, 1, 3)                    AS ty3,
      |  length(p_name)                             AS nlen,
      |  concat(p_brand, ':', p_type)               AS tag,
      |  replace(p_name, ' ', '_')                  AS snake,
      |  trim(concat('  ', p_name, '  '))           AS trimmed,
      |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS pad,
      |  split_part(p_name, ' ', 1)                 AS word1,
      |  regexp_extract(p_name, '([a-z]+)$', 1)     AS lastword
      |FROM part
      |WHERE p_name LIKE '%a%'
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .filter(col("p_name").like("%a%"))
      .select(col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        substring(col("p_type"), 1, 3).as("ty3"),
        length(col("p_name")).as("nlen"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("tag"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("pad"),
        split(col("p_name"), " ").getItem(0).as("word1"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("lastword"))
      .orderBy(col("p_partkey"))
  }

  private val fnDate = Spec(
    "fn_date",
    """SELECT o_orderkey,
      |  year(o_orderdate)                                   AS y,
      |  month(o_orderdate)                                  AS m,
      |  dayofmonth(o_orderdate)                             AS dom,
      |  date_trunc('month', o_orderdate)                    AS month_start,
      |  datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since,
      |  o_orderdate + INTERVAL 30 DAY                       AS due,
      |  CAST(last_day(o_orderdate) AS TIMESTAMP)            AS month_end,
      |  CAST(epoch(o_orderdate) AS BIGINT)                  AS epoch_s
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .as("days_since"),
        (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("due"),
        last_day(col("o_orderdate")).cast("timestamp").as("month_end"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy(col("o_orderkey"))
  }

  /** Exact-only math (see header): sqrt is correctly-rounded, squares are
    * plain double multiply, round happens on a decimal cast. */
  private val fnMath = Spec(
    "fn_math",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(floor(l_quantity) AS BIGINT)    AS fl,
      |  CAST(ceil(l_quantity) AS BIGINT)     AS ce,
      |  abs(l_discount - 0.05)               AS ab,
      |  sqrt(l_quantity)                     AS sq,
      |  l_quantity * l_quantity              AS sq2,
      |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg,
      |  greatest(l_quantity, l_discount*100) AS gr,
      |  least(l_tax, l_discount)             AS le,
      |  CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS rnd,
      |  CASE WHEN l_quantity < 10 THEN 'low'
      |       WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS bucket
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        floor(col("l_quantity")).as("fl"),
        ceil(col("l_quantity")).as("ce"),
        abs(col("l_discount") - 0.05).as("ab"),
        sqrt(col("l_quantity")).as("sq"),
        (col("l_quantity") * col("l_quantity")).as("sq2"),
        signum(col("l_discount") - 0.05).as("sg"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("gr"),
        least(col("l_tax"), col("l_discount")).as("le"),
        round(col("l_extendedprice").cast("decimal(18,2)"), 1).cast("double")
          .as("rnd"),
        when(col("l_quantity") < 10, "low")
          .when(col("l_quantity") < 30, "mid")
          .otherwise("high").as("bucket"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Array ops over tokenized document text (strings are exact across
    * engines; float-array math lives in llm_cosine_topk with its epsilon
    * convention). DuckDB's list_distinct does not preserve order — both
    * sides sort after distinct. Array-typed outputs are serialized to CSV
    * scalars (`array_join` / `array_to_string`) for the driver's pandas
    * comparator; the array machinery (slice/distinct/transform) is intact. */
  private val fnArray = Spec(
    "fn_array",
    """SELECT doc_id,
      |  len(words)                                   AS n_words,
      |  words[1]                                     AS first_word,
      |  array_to_string(list_slice(words, 1, 4), ',') AS head4,
      |  array_to_string(list_sort(list_distinct(words)), ',') AS vocab,
      |  list_contains(words, 'key')                  AS has_key,
      |  array_to_string(list_transform(list_slice(words, 1, 4), x -> upper(x)), ',')
      |    AS head4_up
      |FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .select(col("doc_id"),
        size(col("words")).as("n_words"),
        col("words").getItem(0).as("first_word"),
        array_join(slice(col("words"), 1, 4), ",").as("head4"),
        array_join(sort_array(array_distinct(col("words"))), ",").as("vocab"),
        array_contains(col("words"), "key").as("has_key"),
        array_join(transform(slice(col("words"), 1, 4), x => upper(x)), ",")
          .as("head4_up"))
      .orderBy(col("doc_id"))
  }

  /** Map built from the props JSON (single-key objects per FIXTURES.md);
    * emitted as scalar extractions + a CSV-serialized sorted key list so the
    * driver comparator (which cannot hash list cells) sees only scalars. */
  private val fnMap = Spec(
    "fn_map",
    """SELECT event_id,
      |  array_to_string(list_sort(json_keys(props)), ',') AS ks,
      |  CAST(props->>'k' AS BIGINT)            AS k_val,
      |  len(json_keys(props))                  AS n_keys
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val m = from_json(col("props"),
      org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>"))
    Tables.events(s, d)
      .select(col("event_id"),
        array_join(sort_array(map_keys(m)), ",").as("ks"),
        element_at(m, "k").as("k_val"),
        size(map_keys(m)).as("n_keys"))
      .orderBy(col("event_id"))
  }

  /** JSON extract / parse / re-serialize round-trip. */
  private val fnJson = Spec(
    "fn_json",
    """SELECT event_id,
      |  props->>'k'                                         AS k_str,
      |  CAST(props->>'k' AS BIGINT)                         AS k_int,
      |  CAST(to_json(struct_pack(k := CAST(props->>'k' AS BIGINT))) AS VARCHAR)
      |    AS rt
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val kInt = from_json(col("props"),
      org.apache.spark.sql.types.DataType.fromDDL("struct<k:bigint>"))
      .getField("k")
    Tables.events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        kInt.as("k_int"),
        to_json(struct(kInt.as("k"))).as("rt"))
      .orderBy(col("event_id"))
  }

  /** The one deliberate scalar UDF (Knuth multiplicative hash, 16-bit
    * constant), with the identical arithmetic cross-checked as a built-in
    * expression column — demonstrating both the UDF surface and why
    * built-ins are preferred (the UDF column blocks codegen/pushdown; the
    * expr column doesn't). The 16-bit constant 40503 keeps k*c below 2^63
    * for any key < 2.27e14, so the built-in multiply cannot hit an ANSI
    * ARITHMETIC_OVERFLOW on a realistic keyspace (the 32-bit constant
    * 2654435761 would overflow signed 64-bit for keys > 3.4e9). */
  private val fnUdfScalar = Spec(
    "fn_udf_scalar",
    """SELECT o_orderkey,
      |  (o_orderkey * 40503) % 4294967296 AS h_udf,
      |  (o_orderkey * 40503) % 4294967296 AS h_expr
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val knuth = udf((k: Long) => (k * 40503L) & 0xffffffffL)
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        knuth(col("o_orderkey")).as("h_udf"),
        pmod(col("o_orderkey") * lit(40503L), lit(4294967296L))
          .as("h_expr"))
      .orderBy(col("o_orderkey"))
  }

  /** Row-generator surface: posexplode of tokenized text (Spark's built-in
    * Generator — the UDTF shape without a custom UDTF). 0-based pos is
    * emitted 1-based to match SQL ordinality. */
  private val fnUdtfExplode = Spec(
    "fn_udtf_explode",
    """SELECT doc_id,
      |  generate_subscripts(string_split(text, ' '), 1) AS pos,
      |  unnest(string_split(text, ' '))                 AS word
      |FROM documents
      |WHERE doc_id < 100
      |ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos0", "word")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("word"))
      .orderBy(col("doc_id"), col("pos"))
  }

  /** URL function family (`parse_url` / `url_encode` / `url_decode`,
    * all codegen'd built-ins): the log-sessionization shape — clickstream
    * and crawl pipelines at 100 TB spend a scan extracting host/path/
    * query-param from URL columns, and the built-ins keep that inside
    * whole-stage codegen (a regex UDF here would also block pushdown of
    * any predicate written over the extracted parts). The URL is built
    * from part columns ('#' swapped out of p_brand — parse_url treats it
    * as the fragment delimiter, which would truncate PATH). DuckDB has no
    * parse_url, so the oracle recomputes each component from the same
    * columns; url_encode is oracled as replace(' ','+') — valid because
    * p_name is lowercase-ASCII + space (FixtureContractSpec pins the
    * generator), and Java's URLEncoder leaves unreserved chars alone. */
  private val fnUrl = Spec(
    "fn_url",
    """SELECT p_partkey,
      |  'ex.com'                                                    AS host,
      |  '/catalog/' || replace(p_brand, '#', '-') || '/' || p_partkey
      |                                                              AS path,
      |  'sz=' || p_size || '&ty=' || replace(p_type, ' ', '+')     AS query,
      |  CAST(p_size AS VARCHAR)                                     AS sz,
      |  replace(p_name, ' ', '+')                                   AS enc,
      |  p_name                                                      AS dec
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    val url = concat(lit("https://ex.com/catalog/"),
      translate(col("p_brand"), "#", "-"), lit("/"),
      col("p_partkey").cast("string"), lit("?sz="),
      col("p_size").cast("string"), lit("&ty="),
      translate(col("p_type"), " ", "+"))
    Tables.part(s, d)
      .select(col("p_partkey"),
        parse_url(url, lit("HOST")).as("host"),
        parse_url(url, lit("PATH")).as("path"),
        parse_url(url, lit("QUERY")).as("query"),
        parse_url(url, lit("QUERY"), lit("sz")).as("sz"),
        url_encode(col("p_name")).as("enc"),
        url_decode(url_encode(col("p_name"))).as("dec"))
      .orderBy(col("p_partkey"))
  }

  /** `try_cast` + the try_* conversion family (`try_to_timestamp`,
    * `try_element_at`) — the NULL-on-error conversion semantics that make
    * dirty-data ingestion survivable at 100 TB (the companion of
    * `fn_try_arith`, which covers arithmetic): under Spark 4's
    * ANSI-on default a single malformed cell would otherwise kill a
    * 1000-executor job hours in; try_cast quarantines it as NULL to be
    * counted/filtered downstream. DuckDB's TRY_CAST has identical
    * semantics (parse failure AND numeric overflow → NULL), so the
    * oracle is direct; try_element_at's 1-based, NULL-past-end indexing
    * maps to DuckDB list indexing. ok_ts is emitted as TIMESTAMP_NTZ —
    * the fixture convention (see `fn_date`): LTZ instants round-trip
    * through the parquet dump as tz-aware and crash the comparator. */
  private val fnTryCast = Spec(
    "fn_try_cast",
    """SELECT p_partkey,
      |  TRY_CAST(p_type AS INTEGER)                     AS bad_int,
      |  TRY_CAST(CAST(p_partkey AS VARCHAR) AS INTEGER) AS roundtrip,
      |  TRY_CAST(p_size * 7 AS TINYINT)                 AS small,
      |  TRY_CAST('2024-01-02 03:04:05' AS TIMESTAMP)    AS ok_ts,
      |  TRY_CAST(p_name AS TIMESTAMP)                   AS bad_ts,
      |  string_split(p_name, ' ')[1]                    AS w1,
      |  string_split(p_name, ' ')[9]                    AS w9
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        expr("try_cast(p_type AS INT)").as("bad_int"),
        expr("try_cast(CAST(p_partkey AS STRING) AS INT)").as("roundtrip"),
        expr("try_cast(p_size * 7 AS TINYINT)").as("small"),
        try_to_timestamp(lit("2024-01-02 03:04:05"))
          .cast("timestamp_ntz").as("ok_ts"),
        try_to_timestamp(col("p_name")).cast("timestamp_ntz").as("bad_ts"),
        try_element_at(split(col("p_name"), " "), lit(1)).as("w1"),
        try_element_at(split(col("p_name"), " "), lit(9)).as("w9"))
      .orderBy(col("p_partkey"))
  }

  /** Timezone shifts (`from_utc_timestamp` / `to_utc_timestamp` /
    * `convert_timezone`) — event-time normalization, the first transform
    * of any multi-region log pipeline. Fixed UTC offsets only: they make
    * the semantics oracle-expressible as exact interval arithmetic in
    * DuckDB, where a NAMED zone would drag two engines' (identical ICU
    * vs JDK tzdb — but unpinned) databases into the hash. All outputs
    * are cast to TIMESTAMP_NTZ before the dump (fixture convention, see
    * `fn_try_cast`); under the pinned UTC session the cast preserves the
    * instant's wall-clock reading, so the oracle is ts + INTERVAL. */
  private val fnTimezone = Spec(
    "fn_timezone",
    """SELECT event_id,
      |  ts + INTERVAL 330 MINUTE                        AS ist,
      |  ts + INTERVAL 480 MINUTE                        AS from_pst,
      |  ts + INTERVAL 300 MINUTE                        AS hop,
      |  CAST(hour(ts + INTERVAL 330 MINUTE) AS INTEGER) AS ist_hour
      |FROM events
      |WHERE event_id < 400
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .filter(col("event_id") < 400)
      .select(col("event_id"),
        from_utc_timestamp(col("ts"), "+05:30")
          .cast("timestamp_ntz").as("ist"),
        to_utc_timestamp(col("ts"), "-08:00")
          .cast("timestamp_ntz").as("from_pst"),
        expr("convert_timezone('+02:00', '+07:00', CAST(ts AS TIMESTAMP_NTZ))")
          .as("hop"),
        hour(from_utc_timestamp(col("ts"), "+05:30"))
          .cast("int").as("ist_hour"))
      .orderBy(col("event_id"))
  }

  /** Calendar-part family beyond `fn_date`'s basics: quarter / ISO week /
    * day-of-week / day-of-year / add_months / next_day — the partition-key
    * derivations of time-partitioned 100 TB layouts (weekly compaction
    * windows, fiscal-quarter rollups, next-Monday SLA deadlines).
    * Cross-engine notes baked into the oracle: Spark dayofweek is 1-based
    * Sunday vs DuckDB 0-based (shift by one); both weekofyear and week()
    * are ISO-8601; both add_months and `+ INTERVAL 1 MONTH` clamp to
    * month end (Jan 31 → Feb 28); Spark next_day('MO') = first Monday
    * STRICTLY after, replayed in DuckDB as isodow arithmetic with the
    * 0→7 wrap. Dates emitted as VARCHAR (fixture convention — date
    * dtypes round-trip differently through the comparator). */
  private val fnDateParts = Spec(
    "fn_date_parts",
    """SELECT o_orderkey,
      |  CAST(quarter(o_orderdate) AS INTEGER)        AS q,
      |  CAST(week(o_orderdate) AS INTEGER)           AS woy,
      |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER)  AS dow,
      |  CAST(dayofyear(o_orderdate) AS INTEGER)      AS doy,
      |  CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE)
      |       AS VARCHAR)                             AS plus_month,
      |  CAST(CAST(o_orderdate AS DATE) +
      |    CAST(CASE WHEN (8 - isodow(o_orderdate)) % 7 = 0 THEN 7
      |          ELSE (8 - isodow(o_orderdate)) % 7 END AS INTEGER)
      |       AS VARCHAR)                             AS next_mon
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        quarter(col("o_orderdate")).cast("int").as("q"),
        weekofyear(col("o_orderdate")).cast("int").as("woy"),
        dayofweek(col("o_orderdate")).cast("int").as("dow"),
        dayofyear(col("o_orderdate")).cast("int").as("doy"),
        add_months(col("o_orderdate").cast("date"), 1)
          .cast("string").as("plus_month"),
        next_day(col("o_orderdate").cast("date"), "MO")
          .cast("string").as("next_mon"))
      .orderBy(col("o_orderkey"))
  }

  /** `format_string` (a.k.a. `printf`) — C-style formatting as a
    * codegen'd built-in: ID badging, fixed-width export records, hex
    * debug keys. Both engines implement printf conversions, but their
    * FLOAT tie-rounding differs (Java Formatter HALF_UP vs C
    * round-half-even), so the row formats only integers and strings —
    * exact in both — and leaves decimal formatting to the established
    * decimal-cast conventions (`fn_rounding`). */
  private val fnPrintf = Spec(
    "fn_printf",
    """SELECT o_orderkey,
      |  printf('ORD-%09d', o_orderkey)                      AS badge,
      |  printf('%s/%s', o_orderstatus, o_orderpriority)     AS tag,
      |  printf('%016x', o_custkey)                          AS hexkey,
      |  printf('[%8s]', o_orderstatus)                      AS padded
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        format_string("ORD-%09d", col("o_orderkey")).as("badge"),
        format_string("%s/%s", col("o_orderstatus"),
          col("o_orderpriority")).as("tag"),
        format_string("%016x", col("o_custkey")).as("hexkey"),
        format_string("[%8s]", col("o_orderstatus")).as("padded"))
      .orderBy(col("o_orderkey"))
  }

  /** `str_to_map` — the Hive log-parsing idiom: `k:v,k:v` strings (access
    * logs, k8s labels, legacy exports) parsed to a MAP in one codegen'd
    * expression instead of a per-row UDF. The row is a genuine round-trip:
    * the kv-string is BUILT from columns, parsed back, and read through
    * element_at/size — the oracle sees only the original columns, so the
    * hash proves build→parse→extract is lossless. Map values never leave
    * the query (maps are comparator-hostile; the fn_map convention). */
  private val fnStrToMap = Spec(
    "fn_str_to_map",
    """SELECT o_orderkey,
      |  o_orderstatus            AS status,
      |  o_orderpriority          AS prio,
      |  CAST(2 AS INTEGER)       AS n_keys,
      |  CAST(NULL AS VARCHAR)    AS missing
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val kv = concat(lit("status:"), col("o_orderstatus"),
      lit(",prio:"), col("o_orderpriority"))
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        str_to_map(kv, lit(","), lit(":")).as("m"))
      .select(col("o_orderkey"),
        element_at(col("m"), "status").as("status"),
        element_at(col("m"), "prio").as("prio"),
        size(col("m")).as("n_keys"),
        element_at(col("m"), "absent").as("missing"))
      .orderBy(col("o_orderkey"))
  }

  /** `date_format` / format-directed `to_date` — the pattern-based
    * datetime formatting/parsing surface (ingest normalization of the
    * dozens of exporter-specific date spellings a 100 TB lake receives,
    * and the partition-path stamps it writes). Spark patterns are
    * java.time (yyyy/MM/dd); the oracle maps each to DuckDB strftime/
    * strptime %-directives — same rendered text, both exact. The parse
    * direction re-reads Spark's own rendering, so the oracle only needs
    * the identity on the original date. */
  private val fnDatetimeFormat = Spec(
    "fn_datetime_format",
    """SELECT o_orderkey,
      |  strftime(o_orderdate, '%Y/%m/%d')            AS slash,
      |  strftime(o_orderdate, '%d-%b-%Y')            AS dmy,
      |  strftime(o_orderdate, '%A')                  AS weekday,
      |  strftime(o_orderdate, 'y=%Y/m=%m/d=%d')      AS part_path,
      |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR)   AS reparsed
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy/MM/dd").as("slash"),
        date_format(col("o_orderdate"), "dd-MMM-yyyy").as("dmy"),
        date_format(col("o_orderdate"), "EEEE").as("weekday"),
        date_format(col("o_orderdate"), "'y='yyyy'/m='MM'/d='dd")
          .as("part_path"),
        to_date(date_format(col("o_orderdate"), "yyyy/MM/dd"),
          "yyyy/MM/dd").cast("string").as("reparsed"))
      .orderBy(col("o_orderkey"))
  }

  /** The `xpath_*` family — Hive-compat XPath extraction over XML
    * strings, the third XML surface beside `scan_xml` (file ingest) and
    * `fn_xml_roundtrip` (schema-directed from_xml/to_xml): a decade of
    * feed-processing SQL extracts fields with xpath one path at a time,
    * no declared schema, including the node-set form (`xpath(...)` →
    * array) that from_xml's struct binding cannot express over variable
    * repetition. The XML is BUILT from part columns (letters/digits
    * only — no escaping hazards), so the oracle sees only the original
    * columns and the hash proves build→extract is lossless; the array
    * result is serialized through array_join (maps/arrays never leave a
    * query, the comparator convention). */
  private val fnXpath = Spec(
    "fn_xpath",
    """SELECT p_partkey,
      |  p_type                         AS typ,
      |  p_partkey                      AS id_back,
      |  CAST(p_size AS INTEGER)        AS size_back,
      |  p_name                         AS tags_back,
      |  CAST(length(p_name) - length(replace(p_name, ' ', '')) + 1
      |       AS INTEGER)               AS n_tags
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    val xml = concat(
      lit("<part><id>"), col("p_partkey").cast("string"),
      lit("</id><size>"), col("p_size").cast("string"),
      lit("</size><type>"), col("p_type"),
      lit("</type><tags><t>"),
      regexp_replace(col("p_name"), " ", "</t><t>"),
      lit("</t></tags></part>"))
    Tables.part(s, d)
      .select(col("p_partkey"), xml.as("xml"))
      .select(col("p_partkey"),
        xpath_string(col("xml"), lit("/part/type")).as("typ"),
        xpath_long(col("xml"), lit("/part/id")).as("id_back"),
        xpath_int(col("xml"), lit("/part/size")).as("size_back"),
        array_join(xpath(col("xml"), lit("/part/tags/t/text()")), " ")
          .as("tags_back"),
        size(xpath(col("xml"), lit("/part/tags/t"))).as("n_tags"))
      .orderBy(col("p_partkey"))
  }

  /** `posexplode_outer` — the OUTER generator variant: an empty or NULL
    * array still emits ONE row (NULL pos/word) instead of silently
    * dropping the parent. The semantics corner that matters at 100 TB:
    * an inner explode over a tokenizer output quietly deletes every
    * empty document from the pipeline — the parent-preserving outer form
    * is what a fan-out that must keep row provenance uses
    * ([[fnUdtfExplode]] pins the inner form). Empty and NULL branches
    * are driven from p_size so all three paths carry data; the oracle
    * spells the outer semantics as inner-unnest UNION ALL the
    * empty/NULL parents. */
  private val fnExplodeOuter = Spec(
    "fn_explode_outer",
    """WITH base AS (
      |  SELECT p_partkey,
      |    CASE WHEN p_size % 3 = 0 THEN []
      |         WHEN p_size % 5 = 0 THEN NULL
      |         ELSE string_split(p_name, ' ') END AS arr
      |  FROM part)
      |SELECT p_partkey,
      |  CAST(generate_subscripts(arr, 1) - 1 AS INTEGER) AS pos,
      |  unnest(arr) AS word
      |FROM base WHERE len(arr) > 0
      |UNION ALL
      |SELECT p_partkey, NULL, NULL
      |FROM base WHERE arr IS NULL OR len(arr) = 0
      |ORDER BY p_partkey, pos""".stripMargin) { (s, d) =>
    val arr = when(pmod(col("p_size"), lit(3)) === 0,
        array().cast("array<string>"))
      .when(pmod(col("p_size"), lit(5)) === 0,
        lit(null).cast("array<string>"))
      .otherwise(split(col("p_name"), " "))
    Tables.part(s, d)
      .select(col("p_partkey"), arr.as("arr"))
      .select(col("p_partkey"),
        posexplode_outer(col("arr")).as(Seq("pos", "word")))
      .orderBy(col("p_partkey"), col("pos"))
  }

  /** `format_number` + format-directed `to_number` — grouped display
    * formatting and its parse inverse (the report/ingest pair: exports
    * render '1,234,567.89', re-ingestion must parse it back). Exercised
    * as a ROUND-TRIP on exact decimals (format_number on DECIMAL is
    * exact; on raw doubles its HALF_UP tie behavior is the
    * engine-private edge `fn_rounding` documents): to_number must
    * recover the original decimal bit-for-bit. The rendered string
    * itself is not emitted — its grouping is hash-checked via the comma
    * COUNT, which the oracle derives from the integer-digit length —
    * because DuckDB has no locale-grouped formatter to recompute the
    * full text with. */
  private val fnNumberFormat = Spec(
    "fn_number_format",
    """SELECT o_orderkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS back,
      |  CAST((length(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR))
      |        - 1) // 3 AS INTEGER)                          AS n_commas
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val dec = col("o_totalprice").cast("decimal(18,2)")
    val fmt = format_number(dec, 2)
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        to_number(fmt, lit("999,999,999,999.99")).cast("double").as("back"),
        (length(fmt) - length(regexp_replace(fmt, ",", "")))
          .cast("int").as("n_commas"))
      .orderBy(col("o_orderkey"))
  }

  /** `luhn_check` — the built-in mod-10 checksum validator (credit-card /
    * IMEI / account-number style check digits). In a 100 TB ingest this
    * is a data-quality tripwire: a single codegen'd scalar pass flags
    * malformed identifiers at scan time, no UDF, no shuffle (the
    * aggregate here just proves the per-row flags against a count).
    * DuckDB has no Luhn built-in, so the oracle REPLAYS the algorithm
    * in SQL — `list_transform(range(...))` walks the digit string from
    * the right (negative string indexing), doubles every second digit
    * with the >9 ⇒ −9 fold, and checks the sum mod 10 — an exact
    * integer replay, no float anywhere. */
  private val fnLuhn = Spec(
    "fn_luhn",
    """WITH t AS (SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS s
      |           FROM orders)
      |SELECT o_orderkey,
      |  (list_sum(list_transform(range(1, length(s) + 1),
      |    i -> CASE WHEN i % 2 = 0
      |      THEN CASE WHEN 2 * CAST(s[-i] AS INT) > 9
      |           THEN 2 * CAST(s[-i] AS INT) - 9
      |           ELSE 2 * CAST(s[-i] AS INT) END
      |      ELSE CAST(s[-i] AS INT) END)) % 10 = 0) AS is_luhn
      |FROM t ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        call_function("luhn_check", col("o_orderkey").cast("string"))
          .as("is_luhn"))
      .orderBy(col("o_orderkey"))
  }

  /** `to_number` — the PARSE direction of the formatted-number surface
    * (`fn_number_format` covers the render direction): turn
    * human/ledger-formatted strings ("1,234.56", "$1,234.56") back into
    * exact decimals at scan time, codegen'd, no UDF. The round-trip here
    * renders each price with `format_number` then parses it back through
    * two format masks (grouped, and currency-prefixed) — so a parse that
    * drops a grouping separator or mis-anchors the '$' breaks the hash
    * against the oracle's direct DECIMAL cast. Spark's masks tolerate
    * absent optional grouping commas, which is what makes one mask valid
    * for every magnitude in the column. */
  private val fnToNumber = Spec(
    "fn_to_number",
    """SELECT o_orderkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS parsed,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS parsed_cur
      |FROM orders WHERE o_orderkey % 50 = 0
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val rendered = format_number(col("o_totalprice"), 2)
    Tables.orders(s, d)
      .filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey"),
        to_number(rendered, lit("999,999,999.99"))
          .cast("double").as("parsed"),
        to_number(concat(lit("$"), rendered), lit("$999,999,999.99"))
          .cast("double").as("parsed_cur"))
      .orderBy(col("o_orderkey"))
  }

  /** `reflect` / `java_method` — the Hive-compat escape hatch that calls
    * a static JVM method per row (result always stringified). Registered
    * because a decade of migrated Hive SQL uses it, and QUARANTINED for
    * the same reason as `fn_udf_scalar`: the call is a reflective
    * invocation — no codegen, no pushdown through it, boxing on every
    * row — so at 100 TB anything expressible as a built-in must be (both
    * results here HAVE built-in spellings: `pmod`, `conv`; the row
    * exists to pin the surface, not to recommend it). `Math.floorMod` on
    * a deliberately sign-mixed argument pins the floor-vs-truncation
    * distinction (Java `%` truncates; floorMod is what bucketing needs),
    * replayed in DuckDB as ((x%7)+7)%7; `Long.toOctalString` replays as
    * `to_base(k, 8)`. */
  private val fnReflect = Spec(
    "fn_reflect",
    """SELECT o_orderkey,
      |  CAST((((o_orderkey % 100 - 50) % 7) + 7) % 7 AS VARCHAR) AS mod7,
      |  to_base(o_orderkey, 8) AS oct
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        reflect(lit("java.lang.Math"), lit("floorMod"),
          col("o_orderkey") % 100L - 50L, lit(7L)).as("mod7"),
        reflect(lit("java.lang.Long"), lit("toOctalString"),
          col("o_orderkey")).as("oct"))
      .orderBy(col("o_orderkey"))
  }

  /** Distributed ID assignment — `monotonically_increasing_id()`,
    * `spark_partition_id()`, `uuid()`: how a 100 TB pipeline mints row
    * ids WITHOUT a driver-side sequence or a global sort (mono ids embed
    * the partition ordinal in the upper 31 bits, so every executor
    * assigns locally with zero coordination — the whole point vs a
    * `row_number() OVER ()` which would funnel the table through ONE
    * window partition). The VALUES are partition-layout-dependent and
    * uuid is random, so the row pins what IS deterministic — the
    * CONTRACT: exact uniqueness of both id kinds, non-negativity, the
    * pinned partition count under an explicit repartition(8), and the
    * RFC-4122-v4 wire format of every uuid. The oracle predicts each
    * witness exactly from COUNT(*); a collision, a dropped partition, or
    * a malformed uuid anywhere in the column flips a boolean and fails
    * the hash. */
  private val fnIdGeneration = Spec(
    "fn_id_generation",
    """SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(COUNT(*) AS BIGINT) AS n_mono,
      |  true AS mono_nonneg,
      |  CAST(8 AS INT) AS n_pids,
      |  CAST(COUNT(*) AS BIGINT) AS n_uuid,
      |  true AS uuid_v4
      |FROM orders""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .repartition(8)
      .select(monotonically_increasing_id().as("mono"),
        spark_partition_id().as("pid"), expr("uuid()").as("u"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("mono")).as("n_mono"),
        (min(col("mono")) >= 0L).as("mono_nonneg"),
        countDistinct(col("pid")).cast("int").as("n_pids"),
        countDistinct(col("u")).as("n_uuid"),
        every(col("u").rlike(
          "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"))
          .as("uuid_v4"))
  }

  /** Array EDITING (Spark 3.4+ `array_insert` / `array_append` /
    * `array_prepend` / `array_compact` / `array_remove`) — the in-place
    * list surgery a feature-engineering pipeline does on collected
    * sequences without exploding them (each is one codegen'd expression
    * over the array cell; explode→edit→re-collect_list would be a
    * shuffle per edit). DuckDB has no array_insert — the oracle replays
    * it as 1-based slice surgery (`l[1:p-1] || [e] || l[p:]`, exactly
    * the insert-BEFORE-position semantics the probe confirmed);
    * compact/remove replay as list_filter lambdas (safe here: the base
    * array is NULL-free, so the `x <> v` filter cannot eat NULLs). */
  private val fnArrayEdit = Spec(
    "fn_array_edit",
    """WITH t AS (SELECT o_orderkey,
      |  generate_series(1::BIGINT, o_orderkey % 4 + 2) AS arr
      |  FROM orders)
      |SELECT o_orderkey,
      |  array_to_string(arr[1:1] || [99::BIGINT] || arr[2:], ',') AS ins,
      |  array_to_string(list_append(arr, 0::BIGINT), ',') AS app,
      |  array_to_string(list_prepend(-1::BIGINT, arr), ',') AS pre,
      |  array_to_string(list_filter(list_prepend(NULL::BIGINT, arr),
      |              x -> x IS NOT NULL), ',') AS compacted,
      |  array_to_string(list_filter(arr, x -> x <> 2), ',') AS removed
      |FROM t ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    // arrays serialize to comma-joined strings — the driver comparator
    // (and parquet→pandas hashing) only handles scalar cells
    val arr = sequence(lit(1L), col("o_orderkey") % 4 + 2)
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        array_join(array_insert(arr, lit(2), lit(99L)), ",").as("ins"),
        array_join(array_append(arr, lit(0L)), ",").as("app"),
        array_join(array_prepend(arr, lit(-1L)), ",").as("pre"),
        array_join(array_compact(array_prepend(arr, lit(null).cast("long"))),
          ",").as("compacted"),
        array_join(array_remove(arr, lit(2L)), ",").as("removed"))
      .orderBy(col("o_orderkey"))
  }

  /** String EDITING (`initcap` / `overlay` / `substring_index` / `elt` /
    * `char_length`) — the display/ETL string-surgery family. DuckDB has
    * no initcap: the oracle rebuilds it word-by-word
    * (split → upper first codepoint ‖ rest → re-join), which is faithful
    * here because `p_name` is lowercase single-spaced ASCII (initcap
    * also LOWERCASES the tail of each word — on mixed-case input the
    * replay would need a lower() on the tail). `overlay` replays as
    * substr-concat surgery, `substring_index` as a 1-based list slice
    * re-join, `elt` as the CASE ladder it desugars to. */
  private val fnStringEdit = Spec(
    "fn_string_edit",
    """SELECT p_partkey,
      |  array_to_string(list_transform(string_split(p_name, ' '),
      |    w -> upper(w[1:1]) || w[2:]), ' ') AS ic,
      |  substr(p_name, 1, 2) || 'XX' || substr(p_name, 5) AS ov,
      |  array_to_string((string_split(p_name, ' '))[1:1], ' ') AS si,
      |  CASE p_partkey % 3 + 1 WHEN 1 THEN 'alpha' WHEN 2 THEN 'beta'
      |    ELSE 'gamma' END AS e,
      |  CAST(length(p_name) AS BIGINT) AS cl
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        initcap(col("p_name")).as("ic"),
        overlay(col("p_name"), lit("XX"), lit(3)).as("ov"),
        substring_index(col("p_name"), " ", 1).as("si"),
        expr("elt(p_partkey % 3 + 1, 'alpha', 'beta', 'gamma')").as("e"),
        char_length(col("p_name")).cast("long").as("cl"))
      .orderBy(col("p_partkey"))
  }

  /** Datetime CONSTRUCTION + unit arithmetic (`make_date` /
    * `make_timestamp` / `months_between` / `timestampdiff` /
    * `timestampadd` / `unix_date` / `date_from_unix_date`) — how a
    * pipeline builds temporal keys from parts and bills in calendar
    * units. Cross-engine rules established by probe: Spark
    * `timestampdiff` is the TRUNCATED µs difference (NOT DuckDB
    * date_diff's boundary counting — the oracle bills whole days × 24
    * over an epoch anchor, positive by construction so truncation ==
    * floor); `months_between` returns an exact integer when both day
    * components are equal, so the fixture-driven pair clamps
    * day-of-month to ≤ 28 before `add_months` (end-of-month clamping
    * would desync the day components and surface the /31 fraction),
    * while the fraction rule itself is pinned on a LITERAL pair whose
    * HALF_UP-8 rounding the DuckDB `round(x, 8)` replay matches
    * bit-for-bit (probed). Dates emit as VARCHAR per the comparator
    * convention. */
  private val fnDatetimeMake = Spec(
    "fn_datetime_make",
    """WITH t AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS dd
      |           FROM orders),
      |u AS (SELECT o_orderkey, dd,
      |        make_date(CAST(year(dd) AS INT), CAST(month(dd) AS INT),
      |                  CAST(least(day(dd), 28) AS INT)) AS d28
      |      FROM t)
      |SELECT o_orderkey,
      |  CAST(make_date(CAST(year(dd) AS INT), CAST(month(dd) AS INT),
      |                 CAST(day(dd) AS INT)) AS VARCHAR) AS md_rt,
      |  CAST(make_timestamp(CAST(year(dd) AS INT), CAST(month(dd) AS INT),
      |                      CAST(day(dd) AS INT), 12, 30, 0.0)
      |       AS VARCHAR) AS mts,
      |  CAST(o_orderkey % 24 AS DOUBLE) AS mb_int,
      |  round(2 + 5/31.0, 8) AS mb_frac,
      |  datediff('day', DATE '1970-01-01', dd) * 24 AS tdh,
      |  CAST(CAST(dd AS TIMESTAMP) + to_hours(o_orderkey % 48)
      |       AS VARCHAR) AS ta,
      |  datediff('day', DATE '1970-01-01', dd) AS ud,
      |  CAST(dd + 7 AS VARCHAR) AS dfu
      |FROM u ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        col("o_orderdate").cast("date").as("dd"))
      .withColumn("d28", expr(
        "make_date(year(dd), month(dd), least(day(dd), 28))"))
      .select(col("o_orderkey"),
        expr("make_date(year(dd), month(dd), day(dd))")
          .cast("string").as("md_rt"),
        expr("make_timestamp(year(dd), month(dd), day(dd), 12, 30, 0)")
          .cast("string").as("mts"),
        months_between(expr("add_months(d28, o_orderkey % 24)"),
          col("d28")).as("mb_int"),
        months_between(lit("2024-03-15").cast("date"),
          lit("2024-01-10").cast("date")).as("mb_frac"),
        expr("timestampdiff(HOUR, TIMESTAMP '1970-01-01 00:00:00', " +
          "CAST(dd AS TIMESTAMP))").as("tdh"),
        expr("timestampadd(HOUR, o_orderkey % 48, CAST(dd AS TIMESTAMP))")
          .cast("string").as("ta"),
        unix_date(col("dd")).cast("long").as("ud"),
        date_from_unix_date(unix_date(col("dd")) + 7)
          .cast("string").as("dfu"))
      .orderBy(col("o_orderkey"))
  }

  /** Regex POSITION/EXTRACTION (`regexp_instr` / `regexp_substr`) — the
    * locate-and-slice half of the regex family (`fn_regex` owns
    * match/replace/extract-group). DuckDB has neither function; the
    * oracle derives the 1-based match position from the length of a
    * lazy prefix capture (`^(.*?)pattern`) and maps regexp_substr's
    * no-match NULL through NULLIF (safe because the pattern cannot
    * match the empty string — `[1-9]` requires a character). Data-driven
    * on the customer-name digit tail: the first-nonzero position varies
    * with key magnitude, and key 0 exercises the no-match path in both
    * outputs. */
  private val fnRegexPosition = Spec(
    "fn_regex_position",
    """SELECT c_custkey,
      |  CASE WHEN regexp_matches(c_name, '[1-9]')
      |    THEN 1 + length(regexp_extract(c_name, '^(.*?)[1-9]', 1))
      |    ELSE 0 END AS pos_nonzero,
      |  NULLIF(regexp_extract(c_name, '[1-9][0-9]*$'), '') AS key_digits
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .select(col("c_custkey"),
        regexp_instr(col("c_name"), lit("[1-9]")).cast("int")
          .as("pos_nonzero"),
        regexp_substr(col("c_name"), lit("[1-9][0-9]*$")).as("key_digits"))
      .orderBy(col("c_custkey"))
  }

  /** Binary conversion (`to_binary` / `unhex` / `bit_get`/`getbit`,
    * plus `sha1`/`crc32`) — string↔bytes↔bits plumbing. `to_binary(x,
    * 'hex')` and `unhex` are exercised as full hex→bytes→string
    * round-trips that BOTH engines recompute independently (DuckDB
    * unhex+hex are exact twins); bit probes replay as shift-and-mask
    * arithmetic. `sha1`/`crc32` have no DuckDB twin, so — same honesty
    * rule as `fn_number_format`'s comma count — they are pinned by
    * their structural contracts (40 lowercase-hex chars; value inside
    * [0, 2³²)), which still catches a wrong-type/wrong-width
    * implementation while never hashing a digest DuckDB cannot
    * recompute. */
  private val fnBinaryConv = Spec(
    "fn_binary_conv",
    """WITH t AS (SELECT o_orderkey,
      |             CAST(o_orderkey AS VARCHAR) AS s FROM orders)
      |SELECT o_orderkey,
      |  CAST(unhex(hex(s)) AS VARCHAR) AS rt_unhex,
      |  CAST(unhex(hex(s)) AS VARCHAR) AS rt_tobin,
      |  CAST((o_orderkey >> 3) & 1 AS INT) AS bit3,
      |  CAST((o_orderkey >> 0) & 1 AS INT) AS bit0,
      |  true AS sha1_shape,
      |  true AS crc32_range
      |FROM t ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val str = col("o_orderkey").cast("string")
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        unhex(hex(str)).cast("string").as("rt_unhex"),
        expr("to_binary(hex(CAST(o_orderkey AS STRING)), 'hex')")
          .cast("string").as("rt_tobin"),
        expr("bit_get(o_orderkey, 3)").cast("int").as("bit3"),
        expr("getbit(o_orderkey, 0)").cast("int").as("bit0"),
        sha1(str).rlike("^[0-9a-f]{40}$").as("sha1_shape"),
        (crc32(str.cast("binary")) >= 0L &&
          crc32(str.cast("binary")) < (1L << 32)).as("crc32_range"))
      .orderBy(col("o_orderkey"))
  }

  /** Array/map/struct CONSTRUCTION (`arrays_zip` / `map_from_arrays` /
    * `array_repeat` / `array_max`/`array_min` / `named_struct`) — the
    * builders that assemble nested cells from parallel columns (the
    * inverse of the explode family). arrays_zip names its struct fields
    * `0`,`1` for anonymous inputs, accessed with backticks; everything
    * nested serializes to joined strings for the comparator (DuckDB
    * replays element-wise over generate_series — index arithmetic, no
    * list_zip needed). map_from_arrays entries are emitted SORTED: map
    * entry order is an implementation detail neither engine promises. */
  private val fnArrayConstruct = Spec(
    "fn_array_construct",
    """WITH t AS (SELECT o_orderkey, o_orderstatus,
      |             o_orderkey % 3 + 2 AS k FROM orders)
      |SELECT o_orderkey,
      |  array_to_string(list_transform(generate_series(1::BIGINT, k),
      |    i -> i::VARCHAR || ':' || (i*10)::VARCHAR), ',') AS az,
      |  array_to_string(list_transform(generate_series(1::BIGINT, k),
      |    i -> i::VARCHAR || '=' || (i*10)::VARCHAR), ',') AS mfa,
      |  array_to_string(list_transform(generate_series(1, CAST(k AS INT)),
      |    i -> o_orderstatus), ',') AS rep,
      |  k * 10 AS amax, CAST(10 AS BIGINT) AS amin,
      |  o_orderkey::VARCHAR || '/' || o_orderstatus AS ns
      |FROM t ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .withColumn("k", col("o_orderkey") % 3 + 2)
      .select(col("o_orderkey"),
        expr("array_join(transform(arrays_zip(sequence(1L, k), " +
          "sequence(10L, k*10, 10L)), s -> concat(s.`0`, ':', s.`1`)), ',')")
          .as("az"),
        expr("array_join(sort_array(transform(map_entries(" +
          "map_from_arrays(sequence(1L, k), sequence(10L, k*10, 10L))), " +
          "e -> concat(e.key, '=', e.value))), ',')").as("mfa"),
        expr("array_join(array_repeat(o_orderstatus, CAST(k AS INT)), ',')")
          .as("rep"),
        expr("array_max(sequence(10L, k*10, 10L))").as("amax"),
        expr("array_min(sequence(10L, k*10, 10L))").as("amin"),
        expr("concat(named_struct('k', o_orderkey, 's', o_orderstatus).k," +
          " '/', named_struct('k', o_orderkey, 's', o_orderstatus).s)")
          .as("ns"))
      .orderBy(col("o_orderkey"))
  }

  /** Calendar NAMES (`dayname` / `monthname`, Spark 4.0) + ISO
    * `weekofyear` — the human-calendar render surface every report
    * GROUP BY uses. Spark's names are the locale-independent 3-letter
    * English abbreviations, which is exactly DuckDB's C-locale
    * `strftime %a / %b`; weekofyear is ISO 8601 in both engines (the
    * week containing the first Thursday), so the year-boundary rows the
    * fixture contains hash-match without adjustment. */
  private val fnDatetimeNames = Spec(
    "fn_datetime_names",
    """WITH t AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS dd
      |           FROM orders)
      |SELECT o_orderkey,
      |  strftime(dd, '%a') AS dn,
      |  strftime(dd, '%b') AS mn,
      |  CAST(weekofyear(dd) AS INT) AS wk
      |FROM t ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        col("o_orderdate").cast("date").as("dd"))
      .select(col("o_orderkey"),
        expr("dayname(dd)").as("dn"),
        expr("monthname(dd)").as("mn"),
        weekofyear(col("dd")).cast("int").as("wk"))
      .orderBy(col("o_orderkey"))
  }

  /** NULL/error GUARDS (`nullifzero` / `zeroifnull` / `equal_null` /
    * `assert_true` / `raise_error`) — the data-quality tripwire family.
    * nullifzero/zeroifnull (Spark 4) replay as the NULLIF/COALESCE they
    * desugar to; equal_null is IS NOT DISTINCT FROM (the NULL-safe
    * comparison `join_null_safe` pins as a JOIN key, here as a scalar).
    * The error half is witnessed by NOT firing: raise_error sits in a
    * CASE branch no fixture row takes, and assert_true(price ≥ 0)
    * returns NULL (emitted through isnull ⇒ true) — if either guard
    * ever fired, Verify would abort loudly instead of hashing, which is
    * the point of shipping guards inside a 100 TB pipeline's
    * projections. */
  private val fnGuards = Spec(
    "fn_guards",
    """SELECT o_orderkey,
      |  NULLIF(o_orderkey % 3, 0) AS nz,
      |  COALESCE(NULLIF(o_orderkey % 3, 0), 0) AS zn,
      |  (NULLIF(o_orderkey % 3, 0) IS NOT DISTINCT FROM
      |   NULLIF(o_orderkey % 2, 0)) AS eqn,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS guarded,
      |  true AS asserted
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        expr("nullifzero(o_orderkey % 3)").as("nz"),
        expr("zeroifnull(nullifzero(o_orderkey % 3))").as("zn"),
        expr("equal_null(nullifzero(o_orderkey % 3), " +
          "nullifzero(o_orderkey % 2))").as("eqn"),
        expr("CASE WHEN o_totalprice < 0 THEN raise_error('negative') " +
          "ELSE CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) END")
          .as("guarded"),
        isnull(expr("assert_true(o_totalprice >= 0)")).as("asserted"))
      .orderBy(col("o_orderkey"))
  }

  /** JSON METADATA (`json_array_length` / `schema_of_json`) — the
    * introspection half of the JSON family (`fn_json` owns
    * parse/extract/render). The array length is data-driven (a JSON
    * array built from the row's own modulus, measured by both engines'
    * native JSON machinery); schema_of_json — Spark's schema INFERENCE
    * on a sample document, the first step of every schema-on-read
    * ingest — has no DuckDB twin, so its (deterministic, literal-input)
    * DDL render is pinned against the expected literal. */
  private val fnJsonMeta = Spec(
    "fn_json_meta",
    """WITH t AS (SELECT o_orderkey, o_orderkey % 4 + 1 AS k FROM orders)
      |SELECT o_orderkey,
      |  CAST(json_array_length('[' ||
      |    array_to_string(generate_series(1::BIGINT, k), ',') || ']')
      |    AS INT) AS jal,
      |  'STRUCT<a: BIGINT, b: STRING>' AS soj
      |FROM t ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .withColumn("k", col("o_orderkey") % 4 + 1)
      .select(col("o_orderkey"),
        expr("json_array_length(concat('[', array_join(transform(" +
          "sequence(1L, k), x -> cast(x as string)), ','), ']'))")
          .cast("int").as("jal"),
        expr("""schema_of_json('{"a":1,"b":"x"}')""").as("soj"))
      .orderBy(col("o_orderkey"))
  }

  /** SQL-language scalar functions (Spark 4 `CREATE FUNCTION … RETURNS
    * … RETURN <expr>`) — the last user-extension API beside the Scala
    * UDF/UDAF/UDTF/optimizer-rule rows. Unlike [[fnUdfScalar]]'s opaque
    * Scala closure, a SQL UDF is SUGAR: analysis inlines the body into
    * the caller's plan, so composition (`band(net(x))`) folds into one
    * codegen'd Project and a simple-comparison body used in WHERE
    * (`is_big`) inlines all the way into the parquet scan's
    * PushedFilters — both pinned in PlanSpec. That inlining is the
    * 100 TB story: shared business logic named once and reused across
    * queries costs NOTHING over writing the expression by hand (no
    * codegen break, no pushdown loss — the exact costs the quarantined
    * Scala-UDF row demonstrates). The oracle replays each body inline;
    * the net arithmetic is the same IEEE multiply order in both
    * engines, and the band thresholds compare the identical product
    * bits. TEMPORARY scope keeps re-invocation idempotent via OR
    * REPLACE (the persistent `CREATE FUNCTION` form works in this
    * image's Derby-backed catalog too — probed — but session scope is
    * what a registered query should own). */
  private val sqlUdfScalar = Spec(
    "sql_udf_scalar",
    """SELECT o_orderkey,
      |  o_totalprice * (1.0 - 0.04) AS net,
      |  CASE WHEN o_totalprice * (1.0 - 0.04) >= 300000.0 THEN 'jumbo'
      |       WHEN o_totalprice * (1.0 - 0.04) >= 150000.0 THEN 'large'
      |       ELSE 'standard' END AS band
      |FROM orders
      |WHERE o_totalprice > 190000.0
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_udf_net(p DOUBLE)
            |RETURNS DOUBLE RETURN p * (1.0 - 0.04)""".stripMargin)
    s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_udf_band(m DOUBLE)
            |RETURNS STRING RETURN
            |  CASE WHEN m >= 300000.0 THEN 'jumbo'
            |       WHEN m >= 150000.0 THEN 'large'
            |       ELSE 'standard' END""".stripMargin)
    s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_udf_is_big(p DOUBLE)
            |RETURNS BOOLEAN RETURN p > 190000.0""".stripMargin)
    Tables.orders(s, d).createOrReplaceTempView("graft_udf_orders")
    s.sql(
      """SELECT o_orderkey,
        |  graft_udf_net(o_totalprice) AS net,
        |  graft_udf_band(graft_udf_net(o_totalprice)) AS band
        |FROM graft_udf_orders
        |WHERE graft_udf_is_big(o_totalprice)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** SQL-language TABLE function (`RETURNS TABLE (…) RETURN SELECT …`)
    * invoked through correlated LATERAL — the declarative UDTF: the
    * body (tokenize + position + length, dropping empty tokens) is a
    * named, reusable relation-producing view that analysis expands into
    * the caller's plan as an ordinary Generate, NOT a per-row subquery
    * execution — PlanSpec pins Generate-no-nested-loop, the same
    * decorrelation guarantee `join_lateral` pins for inline subqueries.
    * vs [[fnUdtfExplode]]: same generator machinery, but the logic is
    * packaged behind a catalog name a whole team can call.
    *
    * THE SCALE RULE THIS ROW PINS (found by plan audit, round 15):
    * Catalyst decorrelates the TVF via a DOMAIN join — it CLONES the
    * outer relation, deduplicates the correlated argument, runs the
    * generator once per distinct value, and hash-joins back. The clone
    * inherits only predicates already applied BENEATH the lateral, so
    * `FROM docs, LATERAL f(text) WHERE doc_id < 60` leaves the domain
    * branch scanning and shuffling the ENTIRE corpus (the doc_id
    * predicate cannot push through a domain keyed on text) — at 100 TB
    * that is a full-table shuffle for a 60-row query. Filtering in a
    * subquery FIRST gives both scans the pushed filter; PlanSpec
    * asserts every documents scan in this plan carries it. Oracle =
    * DuckDB unnest/generate_subscripts with the identical empty-token
    * filter. */
  private val sqlUdfTable = Spec(
    "sql_udf_table",
    """SELECT doc_id, pos, word, length(word) AS wlen FROM (
      |  SELECT doc_id,
      |    generate_subscripts(string_split(text, ' '), 1) AS pos,
      |    unnest(string_split(text, ' ')) AS word
      |  FROM documents WHERE doc_id < 60)
      |WHERE word <> ''
      |ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_udf_tok(s STRING)
        |RETURNS TABLE (pos INT, word STRING, wlen INT) RETURN
        |  SELECT CAST(pos + 1 AS INT), col, length(col)
        |  FROM (SELECT posexplode(split(s, ' ')))
        |  WHERE col <> ''""".stripMargin)
    // filter BEFORE the LATERAL (see the scale rule above): the domain
    // clone of the outer relation then carries the pushed doc_id range
    Tables.documents(s, d).filter(col("doc_id") < 60)
      .select(col("doc_id"), col("text"))
      .createOrReplaceTempView("graft_udf_docs")
    s.sql(
      """SELECT doc_id, t.pos, t.word, t.wlen
        |FROM graft_udf_docs, LATERAL graft_udf_tok(text) t
        |ORDER BY doc_id, t.pos""".stripMargin)
  }
}

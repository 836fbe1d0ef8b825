package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.GraftFunctions._
import graft.core._

/** One registry entry: the Spark implementation plus (where ANSI-SQL can
  * express it) the equivalent DuckDB oracle SQL the driver diffs against.
  *
  * Determinism rules applied throughout (so value-hash compare is exact):
  *  - double SUMs go through DECIMAL (exact, order-independent) and are
  *    emitted as ×10^4-scaled BIGINT — identical bits in Spark and DuckDB.
  *    (DECIMAL output itself is not portable through the driver's hash
  *    canonicalization: round-1 gate failed every DECIMAL(38,10) column
  *    with values verified identical. DOUBLE is not portable either —
  *    DuckDB's decimal->double cast is not correctly rounded.)
  *  - every query ends in a total ORDER BY;
  *  - column names are aliased identically on both sides.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** SUM(double) with exact, engine-independent semantics, emitted as a
    * hash-stable scaled integer: the exact DECIMAL(30,10) sum rounded
    * half-up to 4 decimal places and shifted ×10^4 into a BIGINT.
    * Spark's decimal scale-down cast rounds HALF_UP but DuckDB's
    * TRUNCATES, so the oracle must round(x, 4) (half away from zero =
    * HALF_UP) before its cast. Precisions are chosen so no implicit Catalyst
    * precision-loss adjustment fires: (28,4) × (5,0) -> DECIMAL(34,4),
    * exact; headroom is 24 integer digits on the sum and the ×10^4 value
    * stays far below Long.MaxValue up to ~sf100. */
  private def dsum(c: Column): Column =
    scaledLong(sum(c.cast(DecimalType(30, 10))))

  /** Exact decimal -> ×10^4 BIGINT (see dsum). SQL equivalent:
    * CAST(CAST(round(x, 4) AS DECIMAL(28,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT). */
  private[graft] def scaledLong(c: Column): Column =
    c.cast(DecimalType(28, 4))
      .multiply(lit(10000L).cast(DecimalType(5, 0)))
      .cast("long")

  // ---------------------------------------------------------------------
  // Reference dataflow shapes (SURVEY §2.A / §2.E)
  // ---------------------------------------------------------------------

  private val analytics: Seq[QueryDef] = Seq(
    // TPC-H Q1-shaped pricing summary: the flagship scan+agg. Filter is
    // pushed to the parquet scan; aggregation is partial (map-side) then
    // final — 2-phase, no wide shuffle beyond the 9-group exchange.
    QueryDef("q1_lineitem_agg",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(round(SUM(CAST(l_quantity AS DECIMAL(30,10))), 4) AS DECIMAL(28,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT) AS sum_qty,
               CAST(CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(30,10))), 4) AS DECIMAL(28,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT) AS sum_base_price,
               CAST(CAST(round(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,10))), 4) AS DECIMAL(28,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT) AS sum_disc_price,
               CAST(CAST(round(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(30,10))), 4) AS DECIMAL(28,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT) AS sum_charge,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // 3-way join + top-k revenue (TPC-H Q3 shape). customer/orders sides are
    // filtered before the join; AQE broadcasts the small build sides.
    QueryDef("q3_top_revenue",
      (s, dir) => {
        val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val ord = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val li = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy(desc("revenue"), col("l_orderkey"))
          .limit(10)
      },
      Some("""
        SELECT l_orderkey, o_orderdate,
               CAST(CAST(round(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,10))), 4) AS DECIMAL(28,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10""")),

    // A1 shape: the incremental half-open window filter
    // (prev_end, cur_end] — ref incremental_log.sql:53-82. Catalyst pushes
    // both bounds into the parquet scan (PushedFilters).
    QueryDef("a1_window_filter",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate").cast("timestamp") > lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate").cast("timestamp") <= lit("1996-07-01").cast("timestamp"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("l_returnflag"),
      Some("""
        SELECT l_returnflag, COUNT(*) AS n_rows,
               CAST(CAST(round(SUM(CAST(l_quantity AS DECIMAL(30,10))), 4) AS DECIMAL(28,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT) AS sum_qty
        FROM lineitem
        WHERE CAST(l_shipdate AS TIMESTAMP) > TIMESTAMP '1996-01-01 00:00:00'
          AND CAST(l_shipdate AS TIMESTAMP) <= TIMESTAMP '1996-07-01 00:00:00'
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // A3 shape: distinct touched day-partitions of a batch
    // (ref partition_helpers.sql:18-23).
    QueryDef("a3_partitions_distinct",
      (s, dir) =>
        t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-03-01").cast("timestamp"))
          .select(to_date(col("o_orderdate")).as("part_date"))
          .distinct()
          .orderBy("part_date"),
      Some("""
        SELECT DISTINCT CAST(o_orderdate AS DATE) AS part_date
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-03-01 00:00:00'
        ORDER BY part_date""")),

    // A6 shape: top-1 by window end — the reference's
    // `qualify row_number() over (order by runWindowEnd desc) = 1`
    // (log_helpers.sql:100-106), here per event_type.
    QueryDef("a6_window_top1",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val w = Window.partitionBy("event_type").orderBy(desc("ts"), desc("event_id"))
        ev.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type, event_id, epoch_us(ts) AS ts_us
        FROM (
          SELECT event_type, event_id, ts,
                 row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) q
        WHERE rn = 1
        ORDER BY event_type""")),

    // TPC-H Q5 shape: 6-way join through the region->nation->customer/
    // supplier star. Dims chain-broadcast; the only fact shuffle is the
    // final group-by. Exercises Catalyst join planning breadth.
    QueryDef("q5_local_supplier_volume",
      (s, dir) => {
        val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
        val nation = t(s, dir, "nation")
        val cust = t(s, dir, "customer")
        val ord = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        val li = t(s, dir, "lineitem")
        val supp = t(s, dir, "supplier")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(supp, col("l_suppkey") === col("s_suppkey"))
          .join(cust, col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy(desc("revenue"), col("n_name"))
      },
      Some("""
        SELECT n_name,
               CAST(CAST(round(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,10))), 4) AS DECIMAL(28,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name""")),

    // Window frames: running total + partitioned rank over customers'
    // orders (the frame/window breadth the reference's single QUALIFY
    // use-case doesn't exercise).
    QueryDef("w1_running_total",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        t(s, dir, "orders")
          .filter(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderkey"),
            scaledLong(sum(col("o_totalprice").cast(DecimalType(30, 10)))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
              .as("running_total"),
            row_number().over(w).cast("long").as("order_seq"),
            lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"))
          .orderBy("o_custkey", "order_seq")
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               CAST(CAST(round(SUM(CAST(o_totalprice AS DECIMAL(30,10)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DECIMAL(28,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT) AS running_total,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq,
               lag(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
        FROM orders
        WHERE o_custkey < 100
        ORDER BY o_custkey, order_seq""")),

    // Skew-salted join equals the plain join (operator correctness through
    // the gate); oracle is the unsalted formulation.
    QueryDef("skew_salted_join",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val ord = t(s, dir, "orders").select("o_orderkey", "o_orderdate", "o_custkey")
        graft.operators.Skew.saltedJoin(
          li.withColumnRenamed("l_orderkey", "o_orderkey"), ord,
          Seq("o_orderkey"), 8)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("o_custkey")
      },
      Some("""
        SELECT o_custkey, COUNT(*) AS n,
               CAST(CAST(round(SUM(CAST(l_quantity AS DECIMAL(30,10))), 4) AS DECIMAL(28,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT) AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_custkey
        ORDER BY o_custkey""")),

    // Batch tumbling-window aggregation over event time (the batch analog
    // of the streaming windowedCounts; date_trunc bucket per hour).
    QueryDef("w2_tumbling_window",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .select(unix_micros(col("window_start")).as("ws_us"), col("event_type"),
            col("n"), col("sum_value"))
          .orderBy("ws_us", "event_type"),
      Some("""
        SELECT epoch_us(date_trunc('hour', ts)) AS ws_us, event_type,
               COUNT(*) AS n,
               CAST(CAST(round(SUM(CAST(value AS DECIMAL(30,10))), 4) AS DECIMAL(28,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT) AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY ws_us, event_type""")),

    // Rollup / grouping sets: subtotal+total lattice in one pass (partial
    // aggregation expands grouping sets map-side; one shuffle).
    QueryDef("g1_rollup",
      (s, dir) =>
        t(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(CAST(round(SUM(CAST(l_quantity AS DECIMAL(30,10))), 4) AS DECIMAL(28,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // Semi/anti joins: customers with vs without 1996 orders. Both compile
    // to existence joins (no row multiplication, build side broadcast).
    QueryDef("j1_semi_anti",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val ord96 = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .select("o_custkey")
        val withOrders = cust.join(ord96, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), lit("active_1996").as("segment"))
        val without = cust.join(ord96, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), lit("inactive_1996").as("segment"))
        withOrders.unionByName(without).orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey,
               CASE WHEN EXISTS (SELECT 1 FROM orders
                                 WHERE o_custkey = c_custkey
                                   AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                                   AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
                    THEN 'active_1996' ELSE 'inactive_1996' END AS segment
        FROM customer
        ORDER BY c_custkey""")),

    // Events: JSON prop extraction + per-type rollup (harness extension;
    // reference has no JSON but events.props is a JSON string).
    QueryDef("events_json_extract",
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"),
            col("value"))
          .groupBy(col("event_type"))
          .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"),
            dsum(col("value")).as("sum_value"))
          .orderBy("event_type"),
      Some("""
        SELECT event_type,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               COUNT(*) AS n,
               CAST(CAST(round(SUM(CAST(value AS DECIMAL(30,10))), 4) AS DECIMAL(28,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT) AS sum_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type"""))
  )

  // ---------------------------------------------------------------------
  // Scalar function library demos (SURVEY §2.D) — each oracle states the
  // expected result through an independent formulation.
  // ---------------------------------------------------------------------

  private val dfuncs: Seq[QueryDef] = Seq(
    // D1: roundtrip ints (incl. sign bit set) through 4-byte BYTES.
    QueryDef("d01_bytes4_to_int32",
      (s, dir) => {
        val k = pmod(col("l_orderkey"), lit(100000L))
        val x = when(pmod(col("l_linenumber"), lit(2)) === 1, k + lit(2147483648L)).otherwise(k)
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            bytes4ToInt32(unhex(lpad(hex(x), 8, "0"))).as("decoded"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_linenumber % 2 = 1
                    THEN (l_orderkey % 100000) + 2147483648 - 4294967296
                    ELSE l_orderkey % 100000 END AS decoded
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber""")),

    // D2: base64 ordinal of a text character (spaces/etc -> NULL).
    QueryDef("d02_base64_map",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            base64Map(col("text"), (pmod(col("doc_id"), lit(20L)) + 1).cast("int")).as("ord"))
          .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               NULLIF(CASE WHEN substr(text, CAST(doc_id % 20 + 1 AS INT), 1) = '' THEN -1
                           ELSE strpos('ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/',
                                       substr(text, CAST(doc_id % 20 + 1 AS INT), 1)) - 1 END,
                      -1) AS ord
        FROM documents
        ORDER BY doc_id""")),

    // D3: hex nibble ordinal over md5 text digests.
    QueryDef("d03_hex_map",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            hexMap(md5(col("text")), (pmod(col("doc_id"), lit(32L)) + 1).cast("int")).as("nib"))
          .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               NULLIF(strpos('0123456789abcdef',
                             lower(substr(md5(text), CAST(doc_id % 32 + 1 AS INT), 1))) - 1,
                      -1) AS nib
        FROM documents
        ORDER BY doc_id""")),

    // D4: byte-order reversal of hex strings, with and without 0x.
    QueryDef("d04_reverse_hex_bytes",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
            reverseHexBytes(md5(col("text"))).as("rev"),
            reverseHexBytes(concat(lit("0x"), md5(col("text"))), add0x = true).as("rev0x"))
          .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               array_to_string(list_reverse(regexp_extract_all(md5(text), '..')), '') AS rev,
               '0x' || array_to_string(list_reverse(regexp_extract_all(md5(text), '..')), '') AS rev0x
        FROM documents
        ORDER BY doc_id""")),

    // D5: hex->int64 with 0x/0X prefixes and overflow->NULL.
    QueryDef("d05_hex_to_int",
      (s, dir) => {
        val v = pmod(col("l_linenumber"), lit(4))
        val h = when(v === 0, hex(col("l_orderkey")))
          .when(v === 1, concat(lit("0x"), lower(hex(col("l_orderkey")))))
          .when(v === 2, concat(lit("0X"), hex(col("l_orderkey"))))
          .otherwise(lit("ffffffffffffffff"))
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), hexToInt(h).as("decoded"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_linenumber % 4 = 3 THEN NULL ELSE l_orderkey END AS decoded
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber""")),

    // D6: single radix-16 digit to 4 bits.
    QueryDef("d06_digit_to_bitstring",
      (s, dir) =>
        t(s, dir, "part")
          .select(col("p_partkey"),
            digitToBitstring(pmod(col("p_partkey"), lit(16L)), 16).as("bits"))
          .orderBy("p_partkey"),
      Some("""
        SELECT p_partkey, lpad(bin(p_partkey % 16), 4, '0') AS bits
        FROM part
        ORDER BY p_partkey""")),

    // D7: fixed-width bitstring incl. negative two's complement.
    QueryDef("d07_value_to_bitstring",
      (s, dir) =>
        t(s, dir, "part")
          .select(col("p_partkey"),
            valueToBitstring(pmod(col("p_partkey"), lit(1000L)) - 500, 16).as("bits"))
          .orderBy("p_partkey"),
      Some("""
        SELECT p_partkey,
               array_to_string(
                 list_transform(range(15, -1, -1),
                                i -> (((p_partkey % 1000 - 500) >> i) & 1)::VARCHAR),
                 '') AS bits
        FROM part
        ORDER BY p_partkey""")),

    // D8: bitstring -> int roundtrip.
    QueryDef("d08_bitstring_to_int",
      (s, dir) =>
        t(s, dir, "part")
          .select(col("p_partkey"),
            bitstringToInt(valueToBitstring(pmod(col("p_partkey"), lit(60000L)), 16)).as("decoded"))
          .orderBy("p_partkey"),
      Some("""
        SELECT p_partkey, p_partkey % 60000 AS decoded
        FROM part
        ORDER BY p_partkey""")),

    // D9/D10/D11: IEEE-754 decode/reassemble. Exponent kept in [0,5] and the
    // 52-bit fraction a multiple of 2^22 so every intermediate double is
    // exact and ROUND(...,5) can never straddle an engine-dependent tie.
    QueryDef("d09_double_components",
      (s, dir) => {
        val e = pmod(col("p_partkey"), lit(6L))             // 0..5
        val sign = pmod(col("p_partkey"), lit(2L))
        val m52 = pmod(col("p_partkey"), lit(1048576L)) * lit(4194304L)
        val expBits = valueToBitstring(e + lit(1023L), 11)
        val fracBits = valueToBitstring(m52, 52)
        t(s, dir, "part")
          .select(col("p_partkey"),
            doubleUnbiasedExponent(expBits).as("exp_decoded"),
            doubleMantissa(fracBits).as("mantissa"),
            doubleFromComponents(sign, doubleMantissa(fracBits),
              doubleUnbiasedExponent(expBits)).as("value"))
          .orderBy("p_partkey")
      },
      Some("""
        SELECT p_partkey,
               p_partkey % 6 AS exp_decoded,
               1.0 + (p_partkey % 1048576) * 4194304 * power(2.0, -52) AS mantissa,
               round((CASE WHEN p_partkey % 2 = 1 THEN -1.0 ELSE 1.0 END)
                     * (1.0 + (p_partkey % 1048576) * 4194304 * power(2.0, -52))
                     * power(2.0, p_partkey % 6), 5) AS value
        FROM part
        ORDER BY p_partkey""")),

    // D12: RFC-4122 v5 UUIDs vs python uuid.uuid5 ground truth
    // (namespace 3bfbbd36-410b-43fa-999a-bb990a6db5c7, names 'doc-<id>').
    QueryDef("d12_uuid_v5",
      (s, dir) =>
        t(s, dir, "documents")
          .filter(col("doc_id") < 20)
          .select(col("doc_id"),
            uuidV5(concat(lit("doc-"), col("doc_id").cast("string")),
              "3bfbbd36-410b-43fa-999a-bb990a6db5c7").as("uuid"))
          .orderBy("doc_id"),
      Some {
        val vectors = Seq(
          0 -> "09a3ebed-dffb-5041-b2ad-9a568fdebd87",
          1 -> "2523681b-c254-55d2-8ff8-fcae0b95c5ac",
          2 -> "346c9f6b-c7b1-5ec8-962f-66e4d34bd837",
          3 -> "a79d5bb9-e916-51ee-9301-497e9e33f003",
          4 -> "dac23d6d-0517-5e66-9f65-723c2b478445",
          5 -> "1cda363c-7ee8-54b9-a442-3c3588aeca6d",
          6 -> "43233d10-6556-5c18-842e-b691e9cc5d06",
          7 -> "cfcc1539-5780-51b4-a0a6-a4e53af65147",
          8 -> "62073432-9f48-5481-ae14-2c3af33b9f35",
          9 -> "a03664a8-9070-5a68-a579-19d58f4301f5",
          10 -> "fed6af5c-b19c-5a0a-b1ee-c1f22f8e920f",
          11 -> "a343cf14-e847-5e29-8742-07b3a17cd1b3",
          12 -> "4774f953-d3bb-5f60-adc6-764a5135bdd0",
          13 -> "98739063-3e70-55f2-b3ed-c5fe65b65a79",
          14 -> "43ea7e03-2b61-5dc7-8cbc-c18fe571d3d6",
          15 -> "6119a580-70d8-5b33-bfb6-19a8ebd1090c",
          16 -> "c13385f6-6012-5356-a020-ba3f85c3c496",
          17 -> "c9f93de5-f954-59eb-9ffa-df61264f26c1",
          18 -> "98dbbb8c-c40e-561f-9b4b-464d0f11f268",
          19 -> "1a2b658c-678b-543e-b434-c24b9e340641")
        val values = vectors.map { case (i, u) => s"($i, '$u')" }.mkString(", ")
        s"""
        SELECT d.doc_id, v.uuid
        FROM documents d
        JOIN (VALUES $values) v(doc_id, uuid) ON d.doc_id = v.doc_id
        WHERE d.doc_id < 20
        ORDER BY d.doc_id"""
      }),

    // D13: quote escaping (driver-side string function, demonstrated through
    // a literal frame; oracle builds the expected strings with chr()).
    QueryDef("d13_quote_replace",
      (s, dir) => {
        val cases = Seq("it's", "say \"hi\"", "plain", "'''", "a\"b'c")
        val rows = cases.zipWithIndex.map { case (in, i) => (i, in, QuoteReplace(in)) }
        s.createDataFrame(rows).toDF("case_id", "input", "escaped").orderBy("case_id")
      },
      Some {
        val cases = Seq("it's", "say \"hi\"", "plain", "'''", "a\"b'c")
        def sqlStr(v: String): String =
          if (v.isEmpty) "''"
          else v.map(c => s"chr(${c.toInt})").mkString("(", " || ", ")")
        val values = cases.zipWithIndex.map { case (in, i) =>
          s"(${i}, ${sqlStr(in)}, ${sqlStr(QuoteReplace(in))})"
        }.mkString(", ")
        s"""
        SELECT case_id, input, escaped
        FROM (VALUES $values) v(case_id, input, escaped)
        ORDER BY case_id"""
      })
  )

  // ---------------------------------------------------------------------
  // Naming / config policy (SURVEY §2.B) — pure functions demonstrated over
  // a case table; oracle is the expected VALUES (cross-checked in CoreSpec).
  // ---------------------------------------------------------------------

  private val policy: Seq[QueryDef] = Seq(
    QueryDef("b1_naming_policy",
      (s, dir) => {
        val cases: Seq[(Int, String, String, String, String, String, String)] = Seq(
          // (id, ctx, domain, group, layer, name, version)
          (1, "", "sales", "orders", "dataproduct", "daily", ""),
          (2, "", "sales", "orders", "curated", "daily", ""),
          (3, "dev", "sales", "orders", "dataproduct", "daily", ""),
          (4, "ci", "sales", "orders", "curated", "daily", ""),
          (5, "", "iot", "meters", "staging", "readings", "2.0"),
          (6, "", "iot", "meters", "dataproduct", "readings", "1.0"),
          (7, "", "iot", "meters", "dataproduct", "readings", "10.0"),
          (8, "", "iot", "meters", "dataproduct", "readings", "1.1"),
          (9, "", "iot", "meters", "dataproduct", "readings", "2.1.3"))
        val rows = cases.map { case (id, ctx, domain, group, layer, name, ver) =>
          val env = Env.fromContext(ctx)
          val ref = ModelRef(domain, group, layer, name)
          val schema = Naming.schemaFor(env, ref, "default_schema", userId = "7")
          val alias = Naming.aliasFor(ref, Some(ver).filter(_.nonEmpty))
          val deployed = Naming.deployedRelation(env,
            TableId("proj", schema, alias), ref).schema
          (id, schema, alias, deployed)
        }
        s.createDataFrame(rows).toDF("case_id", "schema_name", "alias_name", "deployed_schema")
          .orderBy("case_id")
      },
      Some("""
        SELECT * FROM (VALUES
          (1, 'sales_orders', 'daily', 'sales_orders'),
          (2, 'sales_orders_curated', 'daily', 'sales_orders_curated'),
          (3, 'dbt_cloud_user_7', 'daily', 'sales_orders'),
          (4, 'default_schema', 'daily', 'sales_orders_curated'),
          (5, 'iot_meters_curated', 'readings_v2', 'iot_meters_curated'),
          (6, 'iot_meters', 'readings', 'iot_meters'),
          (7, 'iot_meters', 'readings', 'iot_meters'),
          (8, 'iot_meters', 'readings_v1-1', 'iot_meters'),
          (9, 'iot_meters', 'readings_v2-1-3', 'iot_meters')
        ) v(case_id, schema_name, alias_name, deployed_schema)
        ORDER BY case_id""")),

    // A8 — cloud_env_sql_values (log_helpers.sql:146-162): each env var
    // becomes its value or NULL (absent OR empty), shown over injected
    // env maps so the gate is environment-independent.
    QueryDef("a8_provenance",
      (s, dir) => {
        val full = Map(
          "DBT_CLOUD_INVOCATION_CONTEXT" -> "dev",
          "DBT_CLOUD_JOB_ID" -> "123",
          "DBT_CLOUD_RUN_ID" -> "456",
          "DBT_CLOUD_RUN_REASON_CATEGORY" -> "scheduled",
          "DBT_CLOUD_RUN_REASON" -> "cron",
          "DBT_CLOUD_GIT_SHA" -> "abc123")
        val cases: Seq[(Int, Map[String, String])] = Seq(
          1 -> full,
          2 -> (full - "DBT_CLOUD_GIT_SHA"),            // absent -> NULL
          3 -> (full + ("DBT_CLOUD_RUN_REASON" -> "")), // empty  -> NULL
          4 -> Map.empty)
        val rows = cases.map { case (id, env) =>
          val p = graft.runlog.Provenance.fromEnv(env)
          (id, p.invocationContext, p.jobId, p.runId,
            p.runReasonCategory, p.runReason, p.gitSha)
        }
        s.createDataFrame(rows)
          .toDF("case_id", "ctx", "job_id", "run_id", "reason_cat", "reason", "git_sha")
          .orderBy("case_id")
      },
      Some("""
        SELECT * FROM (VALUES
          (1, 'dev', '123', '456', 'scheduled', 'cron', 'abc123'),
          (2, 'dev', '123', '456', 'scheduled', 'cron', NULL),
          (3, 'dev', '123', '456', 'scheduled', NULL, 'abc123'),
          (4, NULL, NULL, NULL, NULL, NULL, NULL)
        ) v(case_id, ctx, job_id, run_id, reason_cat, reason, git_sha)
        ORDER BY case_id""")),

    // B4 — get_config_or_meta precedence (config_helpers.sql:2-15):
    // meta[key] wins over top-level config[key]; a null meta value falls
    // through; default when neither is present.
    QueryDef("b4_config_meta",
      (s, dir) => {
        val cases: Seq[(Int, ModelConfig)] = Seq(
          (1, ModelConfig(top = Map("owner" -> "top"), meta = Map("owner" -> "meta"))),
          (2, ModelConfig(top = Map("owner" -> "top"))),
          (3, ModelConfig(meta = Map("owner" -> "meta"))),
          (4, ModelConfig(top = Map("owner" -> "top"), meta = Map("owner" -> null))),
          (5, ModelConfig()))
        val rows = cases.map { case (id, mc) =>
          (id, Option(mc.getOrMeta("owner", "default")).map(_.toString))
        }
        s.createDataFrame(rows).toDF("case_id", "value").orderBy("case_id")
      },
      Some("""
        SELECT * FROM (VALUES
          (1, 'meta'), (2, 'top'), (3, 'meta'), (4, 'top'), (5, 'default')
        ) v(case_id, value)
        ORDER BY case_id""")),

    QueryDef("a10_history_limit",
      (s, dir) => {
        val start = "2024-01-01 00:00:00.000000 UTC"
        val end = "2024-03-01 00:00:00.000000 UTC"
        val cases: Seq[(Int, String)] = Seq(
          (1, HistoryLimit(None, Some(start), end, Env.Prod)),
          (2, HistoryLimit(Some(10), Some(start), end, Env.Prod)),
          (3, HistoryLimit(Some(90), Some(start), end, Env.Prod)),
          (4, HistoryLimit(Some(30), Some(start), end, Env.Dev)),
          (5, HistoryLimit(Some(30), Some(start), end, Env.Ci, Some(5))),
          (6, HistoryLimit(Some(10), None, end, Env.Prod)),
          (7, HistoryLimit.adjusted(Some(90), Some(start), end, Env.Prod,
            Some("2024-02-01 00:00:00.000000 UTC"))),
          (8, HistoryLimit.adjusted(Some(5), Some(start), end, Env.Prod,
            Some("2024-02-01 00:00:00.000000 UTC"))))
        s.createDataFrame(cases).toDF("case_id", "window_end").orderBy("case_id")
      },
      Some("""
        SELECT * FROM (VALUES
          (1, '2024-03-01 00:00:00.000000 UTC'),
          (2, '2024-01-11 00:00:00.000000 UTC'),
          (3, '2024-03-01 00:00:00.000000 UTC'),
          (4, '2024-01-02 00:00:00.000000 UTC'),
          (5, '2024-01-06 00:00:00.000000 UTC'),
          (6, '2024-03-01 00:00:00.000000 UTC'),
          (7, '2024-02-01 00:00:00.000000 UTC'),
          (8, '2024-01-06 00:00:00.000000 UTC')
        ) v(case_id, window_end)
        ORDER BY case_id"""))
  )

  // ---------------------------------------------------------------------
  // Materialization lifecycles (SURVEY §2.A1/A2) — run the REAL operators
  // against a temp warehouse, then oracle the final table state with an
  // independent DuckDB formulation of the same semantics.
  // ---------------------------------------------------------------------

  private def tmpWarehouse(s: SparkSession): graft.warehouse.Warehouse =
    new graft.warehouse.Warehouse(
      java.nio.file.Files.createTempDirectory("graft_q_wh_").toString, s)

  private val materializations: Seq[QueryDef] = Seq(
    // A2 end-to-end: CTAS run then a merge run with overlapping keys
    // (batch keys shifted by 3), newer event times, partition pruning.
    QueryDef("a2_partition_merge",
      (s, dir) => {
        import graft.materialize.{MergeConfig, MergeIntoPartitioned}
        val wh = tmpWarehouse(s)
        val tgt = TableId("proj", "demo", "merged")
        val m = new MergeIntoPartitioned(wh, s)
        val cfg = MergeConfig(partitionField = "updated_at",
          uniqueKey = Seq("id"), eventTime = Some("updated_at"))
        def proj(df: DataFrame) = df.select(
          col("o_orderkey").as("id"),
          col("o_orderdate").as("updated_at"),
          col("o_orderstatus").as("status"),
          col("o_totalprice").as("amount"))
        val ord = t(s, dir, "orders")
        val target0 = proj(ord.filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-02-01").cast("timestamp")))
        val batch = ord.filter(
          col("o_orderdate") >= lit("1996-01-15").cast("timestamp") &&
            col("o_orderdate") < lit("1996-02-15").cast("timestamp"))
          .select(
            (col("o_orderkey") - 3).as("id"),
            (col("o_orderdate") + expr("INTERVAL 12 HOURS")).as("updated_at"),
            lit("U").as("status"),
            (col("o_totalprice") * 2).as("amount"))
        m.run(target0, tgt, cfg) // first run: CTAS
        m.run(batch, tgt, cfg)   // second run: partition-pruned merge
        wh.read(tgt)
          .select("id", "updated_at", "status", "amount")
          .orderBy("id", "updated_at")
      },
      Some("""
        WITH t AS (
          SELECT o_orderkey AS id, o_orderdate AS updated_at,
                 o_orderstatus AS status, o_totalprice AS amount
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND o_orderdate <  TIMESTAMP '1996-02-01 00:00:00'),
        s AS (
          SELECT o_orderkey - 3 AS id,
                 o_orderdate + INTERVAL 12 HOUR AS updated_at,
                 'U' AS status, o_totalprice * 2 AS amount
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1996-01-15 00:00:00'
            AND o_orderdate <  TIMESTAMP '1996-02-15 00:00:00'),
        touched AS (SELECT DISTINCT CAST(updated_at AS DATE) AS d FROM s),
        t_in  AS (SELECT t.* FROM t JOIN touched ON CAST(t.updated_at AS DATE) = touched.d),
        t_out AS (SELECT t.* FROM t ANTI JOIN touched ON CAST(t.updated_at AS DATE) = touched.d),
        upd AS (
          SELECT t_in.id,
                 CASE WHEN s.id IS NOT NULL AND s.updated_at > t_in.updated_at
                      THEN s.updated_at ELSE t_in.updated_at END AS updated_at,
                 CASE WHEN s.id IS NOT NULL AND s.updated_at > t_in.updated_at
                      THEN s.status ELSE t_in.status END AS status,
                 CASE WHEN s.id IS NOT NULL AND s.updated_at > t_in.updated_at
                      THEN s.amount ELSE t_in.amount END AS amount
          FROM t_in LEFT JOIN s ON t_in.id = s.id),
        ins AS (SELECT s.* FROM s ANTI JOIN t_in ON s.id = t_in.id)
        SELECT id, updated_at, status, amount
        FROM (SELECT * FROM upd UNION ALL SELECT * FROM ins
              UNION ALL SELECT * FROM t_out)
        ORDER BY id, updated_at""")),

    // A2 through the SQL front door: identical fixture and oracle to
    // a2_partition_merge, but the second run is a literal MERGE INTO
    // statement — Spark's parser + GraftSparkExtensions route it to
    // MergeIntoPartitioned (unique_key from ON, event_time from the
    // recency guard, partition field from the table's _partition_meta).
    QueryDef("merge_sql",
      (s, dir) => {
        import graft.materialize.{MergeConfig, MergeIntoPartitioned}
        val wh = tmpWarehouse(s)
        val tgt = TableId("proj", "demo", "merged_sql")
        val m = new MergeIntoPartitioned(wh, s)
        val cfg = MergeConfig(partitionField = "updated_at",
          uniqueKey = Seq("id"), eventTime = Some("updated_at"))
        def proj(df: DataFrame) = df.select(
          col("o_orderkey").as("id"),
          col("o_orderdate").as("updated_at"),
          col("o_orderstatus").as("status"),
          col("o_totalprice").as("amount"))
        val ord = t(s, dir, "orders")
        val target0 = proj(ord.filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-02-01").cast("timestamp")))
        val batch = ord.filter(
          col("o_orderdate") >= lit("1996-01-15").cast("timestamp") &&
            col("o_orderdate") < lit("1996-02-15").cast("timestamp"))
          .select(
            (col("o_orderkey") - 3).as("id"),
            (col("o_orderdate") + expr("INTERVAL 12 HOURS")).as("updated_at"),
            lit("U").as("status"),
            (col("o_totalprice") * 2).as("amount"))
        m.run(target0, tgt, cfg) // first run: CTAS, declares _partition_meta
        s.conf.set(graft.sql.GraftMergeInto.RootConf, wh.root)
        batch.createOrReplaceTempView("merge_sql_batch")
        s.sql("""
          MERGE INTO proj.demo.merged_sql AS t
          USING merge_sql_batch AS s
          ON t.id = s.id
          WHEN MATCHED AND s.updated_at > t.updated_at THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""")
        wh.read(tgt)
          .select("id", "updated_at", "status", "amount")
          .orderBy("id", "updated_at")
      },
      Some("""
        WITH t AS (
          SELECT o_orderkey AS id, o_orderdate AS updated_at,
                 o_orderstatus AS status, o_totalprice AS amount
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND o_orderdate <  TIMESTAMP '1996-02-01 00:00:00'),
        s AS (
          SELECT o_orderkey - 3 AS id,
                 o_orderdate + INTERVAL 12 HOUR AS updated_at,
                 'U' AS status, o_totalprice * 2 AS amount
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1996-01-15 00:00:00'
            AND o_orderdate <  TIMESTAMP '1996-02-15 00:00:00'),
        touched AS (SELECT DISTINCT CAST(updated_at AS DATE) AS d FROM s),
        t_in  AS (SELECT t.* FROM t JOIN touched ON CAST(t.updated_at AS DATE) = touched.d),
        t_out AS (SELECT t.* FROM t ANTI JOIN touched ON CAST(t.updated_at AS DATE) = touched.d),
        upd AS (
          SELECT t_in.id,
                 CASE WHEN s.id IS NOT NULL AND s.updated_at > t_in.updated_at
                      THEN s.updated_at ELSE t_in.updated_at END AS updated_at,
                 CASE WHEN s.id IS NOT NULL AND s.updated_at > t_in.updated_at
                      THEN s.status ELSE t_in.status END AS status,
                 CASE WHEN s.id IS NOT NULL AND s.updated_at > t_in.updated_at
                      THEN s.amount ELSE t_in.amount END AS amount
          FROM t_in LEFT JOIN s ON t_in.id = s.id),
        ins AS (SELECT s.* FROM s ANTI JOIN t_in ON s.id = t_in.id)
        SELECT id, updated_at, status, amount
        FROM (SELECT * FROM upd UNION ALL SELECT * FROM ins
              UNION ALL SELECT * FROM t_out)
        ORDER BY id, updated_at""")),

    // SQL SELECT surface: a warehouse table read by 4-part name through
    // the DSv2 catalog (graft.sql.GraftCatalog), with a part_date
    // predicate resolved as a planning-time PartitionFilter.
    QueryDef("select_catalog",
      (s, dir) => {
        val wh = tmpWarehouse(s)
        val tgt = TableId("proj", "demo", "cat_orders")
        val jan = t(s, dir, "orders").filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-02-01").cast("timestamp"))
          .select(
            col("o_orderkey").as("id"),
            col("o_orderdate").as("updated_at"),
            col("o_orderstatus").as("status"))
        wh.overwritePartitioned(tgt,
          jan.withColumn("part_date", to_date(col("updated_at"))))
        s.conf.set(graft.sql.GraftMergeInto.RootConf, wh.root)
        s.sql("""
          SELECT id, status FROM graft.proj.demo.cat_orders
          WHERE part_date >= DATE'1996-01-10'
          ORDER BY id""")
      },
      Some("""
        SELECT o_orderkey AS id, o_orderstatus AS status
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-02-01 00:00:00'
          AND CAST(o_orderdate AS DATE) >= DATE '1996-01-10'
        ORDER BY id""")),

    // DSv2 write path: INSERT INTO an UNpartitioned warehouse table via
    // SQL (v2 parquet append); partitioned tables stay read-only (their
    // write path is MERGE INTO — enforced, see CatalogSpec).
    QueryDef("insert_catalog",
      (s, dir) => {
        val wh = tmpWarehouse(s)
        val tgt = TableId("proj", "demo", "nat_ins")
        val nat = t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
        wh.append(tgt, nat.filter(col("n_nationkey") < 13))
        s.conf.set(graft.sql.GraftMergeInto.RootConf, wh.root)
        nat.filter(col("n_nationkey") >= 13).createOrReplaceTempView("nat_rest")
        s.sql("INSERT INTO graft.proj.demo.nat_ins SELECT * FROM nat_rest")
        s.sql("""
          SELECT n_nationkey, n_name, n_regionkey
          FROM graft.proj.demo.nat_ins ORDER BY n_nationkey""")
      },
      Some("""
        SELECT n_nationkey, n_name, n_regionkey
        FROM nation
        ORDER BY n_nationkey""")),

    // Schema drift on append (the reference's append_new_columns shape):
    // a later batch carries a new column; the sidecar widens once, and
    // pre-drift rows surface NULL for it — no mergeSchema footer scans.
    QueryDef("schema_drift",
      (s, dir) => {
        val wh = tmpWarehouse(s)
        val tgt = TableId("proj", "demo", "drifted")
        wh.append(tgt, t(s, dir, "region").select(
          col("r_regionkey").as("k"), col("r_name").as("name")))
        wh.append(tgt, t(s, dir, "nation").select(
          (col("n_nationkey") + 100).as("k"), col("n_name").as("name"),
          col("n_regionkey").as("extra_key")))
        wh.read(tgt).select("k", "name", "extra_key").orderBy("k")
      },
      Some("""
        SELECT r_regionkey AS k, r_name AS name, CAST(NULL AS BIGINT) AS extra_key
        FROM region
        UNION ALL
        SELECT n_nationkey + 100 AS k, n_name AS name, n_regionkey AS extra_key
        FROM nation
        ORDER BY k""")),

    // DSv2 DDL: CREATE TABLE AS SELECT through the catalog (create =
    // sidecar schema, fill = v2 parquet append), read back via SQL.
    QueryDef("ctas_catalog",
      (s, dir) => {
        val wh = tmpWarehouse(s)
        s.conf.set(graft.sql.GraftMergeInto.RootConf, wh.root)
        t(s, dir, "region").createOrReplaceTempView("region_v")
        s.sql("""
          CREATE TABLE graft.proj.demo.region_ctas
          AS SELECT r_regionkey, r_name FROM region_v""")
        s.sql("""
          SELECT r_regionkey, r_name
          FROM graft.proj.demo.region_ctas ORDER BY r_regionkey""")
      },
      Some("""
        SELECT r_regionkey, r_name
        FROM region
        ORDER BY r_regionkey""")),

    // A1 end-to-end: two incremental_log runs over events; final target =
    // exactly one copy of every event with ts <= second window end.
    QueryDef("a1_incremental_log",
      (s, dir) => {
        import graft.materialize.{IncrementalLog, IncrementalLogConfig}
        val wh = tmpWarehouse(s)
        val log = new graft.runlog.EventLog(wh, s)
        val il = new IncrementalLog(wh, log, s)
        val tgt = TableId("proj", "demo", "events_inc")
        val ref = ModelRef("demo", "events", "curated", "events_inc")
        // day-partitioned + clustered target: the at-scale configuration
        val cfg = IncrementalLogConfig(runWindowColumn = "ts",
          partitionBy = Some("ts"), clusterBy = Seq("event_id"))
        def model() = Tables.events(s, dir)
          .select("event_id", "ts", "event_type", "value")
        il.run(() => model(), tgt, ref, Env.Prod, cfg,
          now = () => "2024-03-01 00:00:00.000000 UTC")
        il.run(() => model(), tgt, ref, Env.Prod, cfg,
          now = () => "2024-06-01 00:00:00.000000 UTC")
        wh.read(tgt).select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, epoch_us(ts) AS ts_us
        FROM events
        WHERE ts <= TIMESTAMP '2024-06-01 00:00:00'
        ORDER BY event_id"""))
  )

  // A4/A6/A7 — the run-event log protocol through the gate: two real
  // IncrementalLog runs, then the LOG table's deterministic columns.
  private val runlogQueries: Seq[QueryDef] = Seq(
    QueryDef("a4_event_log",
      (s, dir) => {
        import graft.materialize.{IncrementalLog, IncrementalLogConfig}
        val wh = tmpWarehouse(s)
        val log = new graft.runlog.EventLog(wh, s)
        val il = new IncrementalLog(wh, log, s)
        val tgt = TableId("proj", "demo_events", "rollup")
        val ref = ModelRef("demo", "events", "curated", "rollup")
        val cfg = IncrementalLogConfig(runWindowColumn = "ts")
        def model() = Tables.events(s, dir).select("event_id", "ts", "value")
        il.run(() => model(), tgt, ref, Env.Prod, cfg,
          now = () => "2024-03-01 00:00:00.000000 UTC")
        il.run(() => model(), tgt, ref, Env.Prod, cfg,
          now = () => "2024-06-01 00:00:00.000000 UTC")
        wh.read(log.logTableFor(tgt, ref.domain))
          .select(col("eventType").as("event_type"),
            date_format(col("runWindowStart"), "yyyy-MM-dd HH:mm:ss.SSSSSS 'UTC'").as("window_start"),
            date_format(col("runWindowEnd"), "yyyy-MM-dd HH:mm:ss.SSSSSS 'UTC'").as("window_end"),
            col("bigQueryTableId").as("table_id"),
            col("dbtModelName").as("model_name"))
          .orderBy("window_end", "event_type")
      },
      Some("""
        SELECT * FROM (VALUES
          ('model_run_started',   '1900-01-01 00:00:00.000000 UTC', '2024-03-01 00:00:00.000000 UTC', 'proj.demo_events.rollup', 'rollup'),
          ('model_run_succeeded', '1900-01-01 00:00:00.000000 UTC', '2024-03-01 00:00:00.000000 UTC', 'proj.demo_events.rollup', 'rollup'),
          ('model_run_started',   '2024-03-01 00:00:00.000000 UTC', '2024-06-01 00:00:00.000000 UTC', 'proj.demo_events.rollup', 'rollup'),
          ('model_run_succeeded', '2024-03-01 00:00:00.000000 UTC', '2024-06-01 00:00:00.000000 UTC', 'proj.demo_events.rollup', 'rollup')
        ) v(event_type, window_start, window_end, table_id, model_name)
        ORDER BY window_end, event_type""")),

    // A9 — bootstrap-from-earliest-source-partition (minus 1 microsecond),
    // and the window computed from it.
    QueryDef("a9_bootstrap",
      (s, dir) => {
        val wh = tmpWarehouse(s)
        val log = new graft.runlog.EventLog(wh, s)
        import s.implicits._
        val src = TableId("proj", "raw", "events_src")
        wh.overwritePartitioned(src,
          Seq((1L, "2024-03-05"), (2L, "2024-03-07"), (3L, "2024-03-06"))
            .toDF("id", "d").withColumn("part_date", col("d").cast("date")))
        val tgt = TableId("proj", "demo", "boot")
        val ref = ModelRef("demo", "grp", "curated", "boot")
        val w = log.computeWindow(log.logTableFor(tgt, ref.domain), tgt, ref,
          Env.Prod, maxHistoryLoadDays = Some(2),
          now = () => "2024-06-01 00:00:00.000000 UTC",
          earliestSourcePartition = log.earliestPartitionTimestamp(src))
        s.createDataFrame(Seq((1, w._1, w._2)))
          .toDF("case_id", "window_start", "window_end")
      },
      Some("""
        SELECT 1 AS case_id,
               '2024-03-04 23:59:59.999999 UTC' AS window_start,
               '2024-03-06 23:59:59.999999 UTC' AS window_end"""))
  )

  // C1-C6 — every validator rule through the gate: each case either passes
  // or throws the reference's message.
  private val validatorQueries: Seq[QueryDef] = Seq(
    QueryDef("c1_validator_rules",
      (s, dir) => {
        import graft.registry._
        val wh = tmpWarehouse(s)
        val reg = new Registry(wh, s)
        val v = new Validator(reg, wh)
        val ref = ModelRef("sales", "orders", "dataproduct", "daily")
        val rel = TableId("proj", "sales_orders", "daily")
        val df = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
        val okCfg = DataproductConfig(owner = Some("team-x"))
        val okMeta = ModelMeta(Some("desc"),
          Map("n_nationkey" -> "k", "n_name" -> "n"))
        // register the product so registered-only rules can fire
        wh.overwrite(rel, df)
        reg.register(df, rel, ref, okCfg, okMeta)
        val cases: Seq[(Int, () => Unit)] = Seq(
          1 -> (() => v.validate(df, rel, ref, Env.Prod, Some(okCfg), okMeta)),
          2 -> (() => v.validate(df, rel, ref, Env.Prod, Some(okCfg.copy(owner = None)), okMeta)),
          3 -> (() => v.validate(df, rel, ref, Env.Prod,
            Some(okCfg.copy(version = Some("1"))), okMeta)),
          4 -> (() => v.validate(df, rel, ref, Env.Prod,
            Some(okCfg.copy(previewWhereClause = Some("no_such_col > 0"))), okMeta)),
          5 -> (() => v.validate(df, TableId("proj", "sales_orders_curated", "daily"),
            ref.copy(layer = "curated"), Env.Prod, Some(okCfg), okMeta)),
          6 -> (() => v.validate(df, rel, ref, Env.Prod, Some(okCfg),
            okMeta.copy(description = None))),
          7 -> (() => v.validate(df, rel, ref, Env.Prod, Some(okCfg),
            okMeta.copy(columnDescriptions = Map("n_nationkey" -> "k")))),
          8 -> (() => v.validate(df.select("n_nationkey"), rel, ref, Env.Prod,
            Some(okCfg), okMeta)),
          9 -> (() => v.validate(df, rel, ref, Env.Prod, None, okMeta)))
        val rows = cases.map { case (id, run) =>
          val result = try { run(); "OK" }
          catch { case e: ValidationException => e.getMessage.take(40) }
          (id, result)
        }
        s.createDataFrame(rows).toDF("case_id", "result").orderBy("case_id")
      },
      Some("""
        SELECT * FROM (VALUES
          (1, 'OK'),
          (2, 'Dataproduct owner must be set'),
          (3, 'Version string portion was too short or '),
          (4, 'Invalid previewWhereClause ''no_such_col '),
          (5, 'Models for registered dataproducts must '),
          (6, 'Dataproducts must have a description'),
          (7, 'Dataproduct columns must have a descript'),
          (8, 'Schema of registered dataproduct can''t b'),
          (9, 'Can''t unregister dataproduct.')
        ) v(case_id, result)
        ORDER BY case_id"""))
  )

  // C7/C8 — registry upsert through the gate: insert, update-preserving-
  // registeredTime, second insert; ids cross-checked against DuckDB's md5.
  private val governance: Seq[QueryDef] = Seq(
    QueryDef("c8_registry_upsert",
      (s, dir) => {
        import java.sql.Timestamp
        import graft.registry._
        val wh = tmpWarehouse(s)
        val reg = new Registry(wh, s)
        val ref = ModelRef("sales", "orders", "dataproduct", "daily")
        val rel = TableId("proj", "sales_orders", "daily")
        val df = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
        val meta = ModelMeta(Some("d"), Map("n_nationkey" -> "k", "n_name" -> "n"))
        val t1 = new Timestamp(1700000000000L)
        val t2 = new Timestamp(1800000000000L)
        reg.register(df, rel, ref, DataproductConfig(owner = Some("team-x")), meta, () => t1)
        reg.register(df, rel, ref, DataproductConfig(owner = Some("team-y"),
          version = Some("2.1")), meta, () => t2) // update: keeps registeredTime
        reg.register(df, TableId("proj", "sales_orders", "weekly"),
          ref.copy(name = "weekly"), DataproductConfig(owner = Some("team-z")), meta, () => t2)
        reg.readCatalog().select(
          col("id"), col("name"), col("owner"),
          col("bigquery.datasetId").as("dataset_id"),
          col("bigquery.tableId").as("table_id"),
          unix_millis(col("registeredTime")).as("registered_ms"),
          unix_millis(col("lastUpdateTime")).as("updated_ms"),
          col("version"), size(col("columns")).cast("long").as("n_cols"))
          .orderBy("table_id")
      },
      Some("""
        SELECT * FROM (VALUES
          (md5('sales_orders-daily'), 'daily', 'team-y', 'sales_orders', 'daily',
           1700000000000, 1800000000000, '2.1', CAST(2 AS BIGINT)),
          (md5('sales_orders-weekly'), 'weekly', 'team-z', 'sales_orders', 'weekly',
           1800000000000, 1800000000000, NULL, CAST(2 AS BIGINT))
        ) v(id, name, owner, dataset_id, table_id, registered_ms, updated_ms, version, n_cols)
        ORDER BY table_id"""))
  )

  /** All registered queries, in registration order. */
  def all: Seq[QueryDef] =
    analytics ++ dfuncs ++ policy ++ materializations ++ runlogQueries ++
      validatorQueries ++ governance ++ QueriesLlm.all ++ QueriesExt.all ++
      QueriesR6.all ++ QueriesR7.all ++ QueriesR8.all ++ QueriesR9.all ++
      QueriesR10.all ++ QueriesR10b.all ++ QueriesR11.all ++
      QueriesR12.all ++ QueriesR13.all ++ QueriesR14.all ++
      QueriesR15.all ++ QueriesR16.all ++ QueriesR17.all ++ QueriesR18.all
}

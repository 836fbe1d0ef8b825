package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 gate queries: forward / nearest as-of directions (the
  * backward path has been gated since `asof_enrich`; these pin the other
  * two directions' semantics — frame orientation, per-direction
  * tolerance, exact ties breaking backward — against a window-free
  * DuckDB formulation). */
object QueriesR10 {

  // same snapshot source and tolerance as asof_enrich (QueriesExt):
  // sparse value-filtered snapshots so matches genuinely reach across
  // hours and a real fraction of events fall outside tolerance
  private val SnapThreshold = 150.0
  private val AsOfTolUs = 6L * 3600 * 1000000 // 6 h

  private def snapsOf(ev: org.apache.spark.sql.DataFrame) =
    ev.filter(col("value") >= SnapThreshold)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("snap_ts"))
      .agg(count(lit(1)).as("n_snap"))

  private val OracleCtes = s"""
        WITH e AS (SELECT event_id, event_type, ts FROM events),
        s AS (SELECT event_type, date_trunc('hour', ts) AS snap_ts,
                     CAST(COUNT(*) AS BIGINT) AS n_snap
              FROM events WHERE value >= $SnapThreshold GROUP BY 1, 2)"""

  val all: Seq[QueryDef] = Seq(

    // ---- as-of FORWARD: earliest snapshot at or after each event -------
    // Mirror image of asof_enrich: hourly snapshots land at or AFTER the
    // event (snap_ts >= ts, within 6 h). date_trunc floors, so most
    // matches are genuinely forward-looking and the >= tie shows up on
    // exact-hour events.
    QueryDef("asof_forward",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        graft.operators.AsOfJoin.asOf(
            ev.select("event_id", "event_type", "ts"), snapsOf(ev),
            key = "event_type", leftTime = "ts", rightTime = "snap_ts",
            payload = Seq("snap_ts", "n_snap"), toleranceUs = Some(AsOfTolUs),
            direction = "forward")
          .select(col("event_id"),
            unix_micros(col("snap_ts")).as("snap_us"),
            col("n_snap"))
          .orderBy("event_id")
      },
      Some(OracleCtes + s""",
        m AS (SELECT e.event_id, e.event_type,
                     min(CASE WHEN s.snap_ts >= e.ts
                               AND epoch_us(s.snap_ts) - epoch_us(e.ts)
                                     <= $AsOfTolUs
                              THEN s.snap_ts END) AS snap_ts
              FROM e LEFT JOIN s ON e.event_type = s.event_type
              GROUP BY 1, 2)
        SELECT m.event_id, epoch_us(m.snap_ts) AS snap_us, s.n_snap
        FROM m LEFT JOIN s
          ON m.event_type = s.event_type AND m.snap_ts = s.snap_ts
        ORDER BY event_id""")),

    // ---- as-of NEAREST: closer of the two directions, ties backward ----
    // Each event takes whichever in-tolerance snapshot is temporally
    // closer; equal distances keep the backward match (the one already
    // knowable at event time). The oracle computes both one-sided bests
    // window-free and applies the same tie rule.
    QueryDef("asof_nearest",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        graft.operators.AsOfJoin.asOf(
            ev.select("event_id", "event_type", "ts"), snapsOf(ev),
            key = "event_type", leftTime = "ts", rightTime = "snap_ts",
            payload = Seq("snap_ts", "n_snap"), toleranceUs = Some(AsOfTolUs),
            direction = "nearest")
          .select(col("event_id"),
            unix_micros(col("snap_ts")).as("snap_us"),
            col("n_snap"))
          .orderBy("event_id")
      },
      Some(OracleCtes + s""",
        bf AS (SELECT e.event_id, e.event_type, e.ts,
                      max(CASE WHEN s.snap_ts <= e.ts
                                AND epoch_us(e.ts) - epoch_us(s.snap_ts)
                                      <= $AsOfTolUs
                               THEN s.snap_ts END) AS bt,
                      min(CASE WHEN s.snap_ts >= e.ts
                                AND epoch_us(s.snap_ts) - epoch_us(e.ts)
                                      <= $AsOfTolUs
                               THEN s.snap_ts END) AS ft
               FROM e LEFT JOIN s ON e.event_type = s.event_type
               GROUP BY 1, 2, 3),
        pick AS (SELECT event_id, event_type,
                        CASE WHEN bt IS NOT NULL AND (ft IS NULL OR
                                  epoch_us(ts) - epoch_us(bt)
                                    <= epoch_us(ft) - epoch_us(ts))
                             THEN bt ELSE ft END AS snap_ts
                 FROM bf)
        SELECT p.event_id, epoch_us(p.snap_ts) AS snap_us, s.n_snap
        FROM pick p LEFT JOIN s
          ON p.event_type = s.event_type AND p.snap_ts = s.snap_ts
        ORDER BY event_id"""))
  )
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.graph.PropertyGraph

/** Structured Streaming pipelines over the events stream — the incremental
  * counterpart of the reference's batch one-shot ETL (its extractor rebuilds
  * the whole graph per run, main.go:732-835; here new memberships/grants
  * arrive as events and merge incrementally).
  *
  * Scale notes: windowed aggregations carry a watermark so state is
  * bounded; the foreachBatch graph merge reuses the same idempotent
  * anti-join upsert as the batch path (A6/A9), so replayed micro-batches
  * (at-least-once delivery) cannot duplicate vertices or edges.
  */
object EventPipeline {

  /** Watermarked tumbling-window aggregation:
    * (window_start, event_type, cnt, sum_value). */
  def windowedCounts(events: DataFrame,
                     windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"), col("sum_value"))

  /** Sliding-window variant (windowLen every slide). */
  def slidingCounts(events: DataFrame, windowLen: String = "2 hours",
                    slide: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"))

  /** Stateful sessionization with mapGroupsWithState: per-user running
    * (event count, max value) with processing-time state that a real
    * pipeline would expire via timeout. */
  case class UserEvent(user_id: Long, event_type: String, value: Double)
  case class UserStat(user_id: Long, n_events: Long, max_value: Double)

  def userStats(events: Dataset[UserEvent]): Dataset[UserStat] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserStat, UserStat](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(uid, 0L, Double.MinValue))
          val next = batch.foldLeft(prev)((s, e) =>
            UserStat(uid, s.n_events + 1, math.max(s.max_value, e.value)))
          state.update(next)
          next
      }
  }

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  case class SessionState(start: Long, end: Long, n: Long)
  case class UserSession(user_id: Long, start: java.sql.Timestamp,
                         end: java.sql.Timestamp, n_events: Long)

  /** Event-time sessionization: split each user's stream into sessions
    * separated by ≥ `gapMs` of silence. Closed sessions are emitted as the
    * group function observes the gap; the last open session is emitted when
    * the event-time watermark passes it (state timeout) — the standard
    * flatMapGroupsWithState + EventTimeTimeout pattern, so state is bounded
    * by the watermark, not by stream length. */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long,
                 watermark: String = "1 hour"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          def toSession(s: SessionState) = UserSession(uid,
            new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n)
          if (state.hasTimedOut) {
            val out = state.getOption.map(toSession).toSeq
            state.remove()
            out.iterator
          } else {
            val times = batch.map(_.ts.getTime).toSeq.sorted
            var closed = List.empty[UserSession]
            var cur = state.getOption
            times.foreach { t =>
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  // A late-but-within-watermark event can predate the current
                  // session start; lower the start too, or out-of-order input
                  // yields sessions with start > event ts.
                  cur = Some(s.copy(start = math.min(s.start, t),
                    end = math.max(s.end, t), n = s.n + 1))
                case Some(s) =>
                  closed ::= toSession(s)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Stream-stream interval join: purchases attributed to a prior click by
    * the same user within `joinWindow`. Both sides carry a watermark and
    * the join condition bounds event-time distance, so Spark can evict
    * join state once the watermark passes — state stays O(window), not
    * O(stream). Inner join ⇒ rows emit as soon as both sides arrive. */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame,
                       watermark: String = "1 hour",
                       joinWindow: String = "30 minutes"): DataFrame = {
    val l = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("l_user"), col("ts").as("click_ts"))
    val r = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("r_user"), col("ts").as("purchase_ts"), col("value"))
    l.join(r, col("l_user") === col("r_user")
        && col("purchase_ts") >= col("click_ts")
        && col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $joinWindow"))
      .select(col("l_user").as("user_id"), col("click_ts"),
        col("purchase_ts"), col("value"))
  }

  /** Streaming exact dedup with bounded state: at-least-once sources
    * replay records, and `dropDuplicatesWithinWatermark` holds each key
    * only until the watermark passes its event time — unlike plain
    * `dropDuplicates`, whose state grows with the whole stream. */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Mutable holder for a graph maintained across micro-batches. Thread-safe
    * enough for a single streaming query (foreachBatch runs serially). */
  final class GraphState(initial: PropertyGraph) {
    @volatile var graph: PropertyGraph = initial
  }

  /** foreachBatch incremental graph merge: each micro-batch of events
    * upserts `user` vertices and user→event_type edges. Idempotent per
    * batch (anti-join upsert), so at-least-once replays are safe. Batches
    * are checkpointed into the state so lineage does not grow unboundedly
    * across a long-running stream. */
  def graphMergeBatch(state: GraphState, userBase: Long, typeBase: Long)
                     (batch: DataFrame, batchId: Long): Unit = {
    val users = batch.select(
      (lit(userBase) + col("user_id")).as("id"), lit("user").as("label"),
      col("user_id").cast("string").as("key"),
      map(lit("source"), lit("stream")).as("props"))
    // Event-type id: the 60-bit md5 hash used everywhere else, folded into
    // the 2^56 label stride. Spark's 32-bit `hash` would both collide far
    // sooner (merging distinct event types into one vertex id) and leak a
    // negative id out of the stride via abs(Int.MinValue).
    val typeId = lit(typeBase) +
      pmod(graft.functions.Hashing.md5Long(col("event_type")), lit(graft.graph.GraphBuilder.B))
    val types = batch.select(
      typeId.as("id"),
      lit("eventType").as("label"), col("event_type").as("key"),
      map().cast("map<string,string>").as("props"))
    val edges = batch.select(
      (lit(userBase) + col("user_id")).as("src"),
      typeId.as("dst"),
      lit("in").as("label"), lit(1).as("weight"))
    val merged = state.graph
      .upsertVertices(users.unionByName(types))
      .upsertEdges(edges)
    state.graph = PropertyGraph(
      merged.vertices.localCheckpoint(), merged.edges.localCheckpoint())
  }
}

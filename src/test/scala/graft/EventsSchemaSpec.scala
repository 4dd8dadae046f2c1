package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins `SparkEntry.events()`'s schema-adaptive parquet TIMESTAMP(NANOS)
  * handling so a Spark runtime bump fails HERE, not in the driver bench.
  *
  * History: Spark ≤4.0 rejected parquet NANOS unless
  * `spark.sql.legacy.parquet.nanosAsLong=true` (reading LongType nanos);
  * Spark 4.1 reads NANOS natively as TIMESTAMP_NTZ and silently ignores
  * that conf — which broke 6 gates in round 9. `events()` now branches on
  * the schema actually read; this spec exercises every branch it can
  * construct on the current runtime plus the real testdata file.
  */
class EventsSchemaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def stage(write: String => Unit): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events-schema").toString
    write(s"$dir/events.parquet")
    dir
  }

  // One micro-batch of truth: (event_id, nanos-since-epoch). 1.5s spacing
  // exercises sub-second digits through the ns→µs truncation.
  private val baseNanos = Seq(0L, 1500000000L, 3000000000L, 86400L * 1000000000L)
  private def baseDf = baseNanos.zipWithIndex
    .map { case (ns, i) => (i.toLong, ns) }.toDF("event_id", "ts")

  test("LongType variant: nanos column rebuilds a µs timestamp") {
    val dir = stage(p => baseDf.write.parquet(p))
    val out = SparkEntry.events(spark, dir)
    assert(out.schema("ts").dataType == TimestampType)
    val micros = out.orderBy("event_id").select(unix_micros(col("ts"))).as[Long].collect()
    assert(micros.toSeq == baseNanos.map(_ / 1000))
  }

  test("TIMESTAMP_NTZ variant: cast preserves the UTC instant") {
    val dir = stage(p => baseDf
      .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      .write.parquet(p))
    val out = SparkEntry.events(spark, dir)
    assert(out.schema("ts").dataType == TimestampType)
    val micros = out.orderBy("event_id").select(unix_micros(col("ts"))).as[Long].collect()
    assert(micros.toSeq == baseNanos.map(_ / 1000))
  }

  test("plain TIMESTAMP variant passes through untouched") {
    val dir = stage(p => baseDf
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .write.parquet(p))
    val out = SparkEntry.events(spark, dir)
    assert(out.schema("ts").dataType == TimestampType)
    val micros = out.orderBy("event_id").select(unix_micros(col("ts"))).as[Long].collect()
    assert(micros.toSeq == baseNanos.map(_ / 1000))
  }

  test("real TIMESTAMP(NANOS) testdata reads on this runtime") {
    // Whatever this Spark does with parquet NANOS, events() must land on a
    // µs TIMESTAMP (or throw its own loud IllegalStateException — never the
    // analyzer's DATATYPE_MISMATCH downstream).
    val out = SparkEntry.events(spark, "/root/testdata/sf0.001")
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.filter(col("ts").isNotNull).count() > 0)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing.
  *
  * All dedup/similarity operators hash through md5 rather than Spark's
  * internal `hash`/`xxhash64` so that any engine with an md5 function can
  * reproduce results bit-for-bit (the DuckDB oracle uses
  * `('0x' || substr(md5(x), 1, 15))::BIGINT`). md5 is codegen'd
  * (`org.apache.spark.sql.catalyst.expressions.Md5`), so this stays inside
  * whole-stage codegen; it is ~2x slower than xxhash64 but portability is
  * the point — swap [[fastLong]] in when reproducibility outside Spark is
  * not needed.
  */
object Hashing {

  /** 60-bit non-negative hash: first 15 hex digits of md5. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Seeded variant: mixes a distinct seed into the hashed value. */
  def md5Long(c: Column, seed: Int): Column =
    md5Long(concat(c.cast("string"), lit("|" + seed)))

  /** Non-portable fast path (xxhash64) for Spark-only pipelines. */
  def fastLong(c: Column, seed: Int = 0): Column =
    xxhash64(lit(seed), c)
}

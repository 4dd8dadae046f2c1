package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) corpus interchange — the de-facto
  * training-data wire format (one document object per line; HuggingFace
  * datasets, The Pile, Dolma, most crawl drops all ship it).
  *
  * Reading ALWAYS takes an explicit schema: schema inference scans the
  * whole corpus once before the real read (a full extra pass at 100 TB)
  * and silently widens types on dirty lines. With a schema the scan is
  * single-pass, codegen'd Jackson parsing, and column pruning still
  * applies (unreferenced JSON fields are never materialized).
  *
  * Corrupt lines follow `mode`:
  *   - "PERMISSIVE" (default): bad lines land in the
  *     `_corrupt_record` column added here when absent — ingest audits
  *     count them instead of dying mid-corpus;
  *   - "FAILFAST": any malformed line aborts — the right mode for
  *     round-trip/export paths where corruption means a code bug.
  *
  * Writes are plain `spark.write.json` — one shard per partition, so
  * [[graft.operators.Dedup.shuffleShard]] upstream controls shard count
  * and content determinism. Gzip-compress with
  * `.option("compression", "gzip")` semantics via `codec`. */
object JsonlCorpus {

  def write(df: DataFrame, path: String, codec: Option[String] = None,
            mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    codec.fold(w)(c => w.option("compression", c)).json(path)
  }

  def read(spark: SparkSession, path: String, schema: StructType,
           mode: String = "PERMISSIVE"): DataFrame = {
    require(Set("PERMISSIVE", "FAILFAST", "DROPMALFORMED")(mode),
      s"unsupported JSON parse mode: $mode")
    val withAudit =
      if (mode == "PERMISSIVE" && !schema.fieldNames.contains("_corrupt_record"))
        schema.add("_corrupt_record", "string")
      else schema
    spark.read.schema(withAudit).option("mode", mode).json(path)
  }
}

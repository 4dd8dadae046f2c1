package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Hashing.md5Long

/** DataFrame-native k-means-lite: a coarse quantizer for IVF-style
  * similarity search, not a general ML library. Lloyd iterations expressed
  * as joins + aggregations:
  *
  *   assign:  corpus ⋈ broadcast(centroids), argmin L2 via window rank —
  *            one pass, centroids always broadcast (k rows);
  *   update:  posexplode(vec) → groupBy (cluster, dim) avg → re-assemble
  *            arrays with sort_array(collect_list(struct(dim, mean))) —
  *            partial aggregation does the heavy lifting map-side.
  *
  * Deterministic seeding (k rows with smallest md5(id)) so runs are
  * reproducible; centroid means are floating-point reductions, so exact
  * bits may vary with partitioning — downstream users (IVF probing)
  * tolerate that by construction.
  */
object Clustering {

  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  private def assign(v: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vid")).orderBy(col("__d"), col("cid"))
    v.crossJoin(broadcast(centroids))
      .withColumn("__d", l2sq(col("vec"), col("cvec")))
      .withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
      .select(col("vid"), col("vec"), col("cid"))
  }

  /** Returns (assignments(vid, vec, cid), centroids(cid, cvec)). */
  def kmeansLite(vecs: DataFrame, idCol: String, vecCol: String,
                 k: Int, iters: Int = 2): (DataFrame, DataFrame) = {
    val v = vecs.select(col(idCol).as("vid"),
        transform(col(vecCol), x => x.cast("double")).as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seedW = Window.orderBy(col("__h"), col("vid"))
    var centroids = v.withColumn("__h", md5Long(col("vid")))
      .withColumn("__rn", row_number().over(seedW)).filter(col("__rn") <= k)
      .select((col("__rn") - 1).cast("int").as("cid"), col("vec").as("cvec"))
      .localCheckpoint()
    (1 to iters).foreach { _ =>
      centroids = assign(v, centroids)
        .select(col("cid"), posexplode(col("vec")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("col")).as("m"))
        .groupBy(col("cid"))
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("cvec"))
        .localCheckpoint() // k rows; sever the growing lineage per round
    }
    (assign(v, centroids), centroids)
  }
}

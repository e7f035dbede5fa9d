package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table storage layout: the co-located-join scale path.
  *
  * A fact-to-fact join (orders ⋈ lineitem at 100 TB) normally shuffles
  * BOTH sides on the key every time it runs. Writing the tables bucketed
  * AND sorted on the join key pays that shuffle once at write time; every
  * subsequent join of two same-bucket-count tables on the bucket key is
  * then exchange-free — Catalyst proves the children's `HashPartitioning`
  * matches the join requirement and plans a SortMergeJoin with NO
  * Exchange on either side (asserted in BucketedSpec). On a cluster this
  * is the difference between a per-query terabyte shuffle and a purely
  * local merge per bucket.
  *
  * Guidance encoded here:
  *  - bucket count is fixed at write time and both sides must match —
  *    pick it for the LARGER table's target partition size (~128-256 MB
  *    of post-compression bytes per bucket) and reuse it fleet-wide for
  *    that key domain;
  *  - `sortBy` the bucket key so the merge needs no per-task sort (Spark
  *    still inserts a defensive Sort node when a bucket holds multiple
  *    files — compact or write with one file per bucket to drop it);
  *  - bucketed tables live in the session catalog; `path` makes them
  *    EXTERNAL so the data outlives catalog recreation.
  */
object Bucketed {

  /** Write `df` as an external bucketed+sorted parquet table rooted at
    * `path`. The write shuffles on `key` once (that is the point). */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Inner-join two bucketed tables on their shared bucket key. With
    * matching bucket counts this plans exchange-free (the caller keeps
    * whatever projections/filters it needs — they push into the bucketed
    * scans like any parquet scan). */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}

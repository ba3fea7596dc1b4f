package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** S5 — idempotent keyed upsert onto a parquet store (the reference's
  * DynamoDB put_item semantics, s3_dynamodb_utils.py:27-32): writing the
  * same key again replaces the row; re-running a batch is a no-op.
  *
  * Emulation without a table format: rows are partitioned by a stable
  * hash bucket of the key; an upsert rewrites ONLY the buckets touched by
  * the incoming batch (read-modify-write per touched bucket under dynamic
  * partition overwrite). At scale this bounds each upsert's I/O to
  * |touched buckets| / |buckets| of the table instead of a full rewrite —
  * the same incremental-update discipline as the reference's per-item
  * puts (and a MERGE on Delta/Iceberg drops in behind the same
  * signature).
  */
object KeyedUpsertSink {

  val NumBuckets = 64

  private def withBucket(df: DataFrame, keyCol: String): DataFrame =
    df.withColumn("__bucket", pmod(hash(col(keyCol)), lit(NumBuckets)))

  def upsert(batch: DataFrame, path: String, keyCol: String): Unit = {
    val spark = batch.sparkSession
    // session-wide conf, so the previous value is restored on exit:
    // leaking "dynamic" would silently change later partitioned
    // Overwrite writes from replace-the-table to merge-partitions
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // put_item is last-wins per key, so a batch carrying the same key
    // twice must land exactly one row. dropDuplicates keeps an ARBITRARY
    // row per key, which breaks the sink's replay contract: re-running
    // the same batch could persist a DIFFERENT winner. The winner is
    // instead picked by max_by over a content hash of the whole row —
    // deterministic for any column types (to_json covers maps/arrays/
    // binary that struct ordering cannot), so replaying a batch always
    // persists the same row. Callers that want a SEMANTIC winner (e.g.
    // latest version) should still pre-reduce with
    // groupBy(key).agg(max_by(struct(cols), versionCol)).
    val valueCols = batch.columns.filterNot(_ == keyCol)
    val oneRowPerKey =
      if (valueCols.isEmpty) batch.dropDuplicates(keyCol) // key-only rows are identical
      else batch
        .groupBy(col(keyCol))
        .agg(max_by(struct(valueCols.map(col): _*),
          md5(to_json(struct(batch.columns.map(col): _*)))).as("__row"))
        .select(col(keyCol) +: valueCols.map(c => col(s"__row.$c").as(c)): _*)
    val incoming = withBucket(oneRowPerKey, keyCol).cache()
    try {
      // Hadoop FS resolution, not java.io.File: the store may live on
      // HDFS/S3/any Hadoop-supported FS; a local-only check would miss an
      // existing remote store and dynamic overwrite would then drop every
      // previously stored row in the touched buckets
      val hadoopPath = new org.apache.hadoop.fs.Path(path)
      val fs = hadoopPath.getFileSystem(spark.sessionState.newHadoopConf())
      val exists = fs.exists(hadoopPath)
      val merged =
        if (!exists) incoming
        else {
          val touched = incoming.select(col("__bucket")).distinct()
          val existing = spark.read.parquet(path)
            .join(broadcast(touched), Seq("__bucket"), "left_semi")
          // incoming wins on key collision; localCheckpoint materializes
          // the surviving rows so the subsequent overwrite of the same
          // path is legal (production: staging dir + atomic swap, or a
          // table format's MERGE)
          val kept = existing.join(
            broadcast(incoming.select(col(keyCol)).distinct()),
            Seq(keyCol), "left_anti")
            .localCheckpoint()
          incoming.unionByName(kept)
        }
      merged.write
        .mode(SaveMode.Overwrite)
        .partitionBy("__bucket")
        .parquet(path)
    } finally {
      incoming.unpersist()
      prevMode match {
        case Some(m) =>
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
        case None =>
          spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("__bucket")
}

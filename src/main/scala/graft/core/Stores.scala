package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared store-read probe for the incremental seen/temporal/vector
  * stores. Existence is probed via the Hadoop FS API BEFORE calling
  * `read.parquet`: Spark logs an AnalysisException stack for
  * PATH_NOT_FOUND even when the caller catches it, and a fresh-store
  * bench/first-run log dominated by a scary-but-benign stack trace costs
  * real triage time (it did in round 13's driver artifact). Only a
  * genuinely ABSENT root counts as empty — any transient FS failure
  * (from `exists` or the read itself) must propagate, or dedup would
  * silently run against an empty set and leak every known duplicate. */
object Stores {

  def hadoopFs(spark: SparkSession,
      path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Some(frame) when `path` exists, None when absent — without ever
    * surfacing a logged AnalysisException for the expected-absent case. */
  def readParquetIfExists(spark: SparkSession,
      path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    if (!hadoopFs(spark, path).exists(p)) None
    else Some(spark.read.parquet(path))
  }

  /** `<path><suffix>` as a SIBLING of path, built via parent+name: string
    * concat on a trailing-slash config path would silently produce a
    * CHILD of the directory, and renaming a directory under itself fails
    * forever — the shared tmp/old/retired-generation path helper for
    * every store's commit protocol. */
  def sibling(path: String, suffix: String): org.apache.hadoop.fs.Path = {
    val p = new org.apache.hadoop.fs.Path(path) // normalizes trailing slashes
    Option(p.getParent)
      .map(new org.apache.hadoop.fs.Path(_, p.getName + suffix))
      .getOrElse(new org.apache.hadoop.fs.Path(p.getName + suffix))
  }
}

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

  /** ONE-JOB counted append — the shared write path of every incremental
    * store's append (seen/near fingerprints, vocab and host-graph
    * partials, temporal versions, vector rows).
    *
    * The r19 shape paid three jobs per append: an eager memo barrier
    * (localCheckpoint / reliable checkpoint) so count + write (+ sidecar)
    * saw one frame while the store changed under them, a count() over the
    * memo, and the append-mode write. At gate scale each extra job is
    * mostly scheduling floor; at cluster scale the barrier materializes
    * the whole increment a second time. Here the count rides the write
    * itself (`Dataset.observe` + `Observation`: the metric is aggregated
    * by the SAME action that writes), so count-vs-write consistency is
    * structural — the frame is evaluated exactly once, and executor loss
    * during that one job is ordinary task retry (the reliable-checkpoint
    * barrier existed to protect the memo's LATER consumers, which no
    * longer exist).
    *
    * Protocol: the frame lands in a SIBLING `<store>_append_tmp` dir
    * ([[sibling]] — never a child, which a crash would leave inside a
    * possibly not-yet-existing store and turn a first read into a
    * no-schema failure); if the observed count is > 0 the part files
    * rename into the store under a unique `append-<tag>-` prefix; the
    * tmp dir is deleted either way, and a stale tmp from a crashed run
    * is deleted up front. Crash exposure class is unchanged from
    * append-mode: a crash during the tmp write leaves the store
    * byte-identical (append-mode staged in `_temporary` the same way); a
    * crash mid-rename leaves a partial file set, exactly like a crash in
    * append-mode's job-commit rename phase — every caller's documented
    * at-least-once / re-run story applies verbatim.
    *
    * Returns (rows appended, renamed file paths): the paths let sidecar
    * updates (Bloom fold-in, banded rows) re-read EXACTLY the appended
    * rows without recomputing the increment's plan. */
  def appendCountedFiles(df: DataFrame,
      storePath: String): (Long, Seq[String]) = {
    import org.apache.spark.sql.functions.{count, lit}
    val root = new org.apache.hadoop.fs.Path(storePath)
    val fs = hadoopFs(df.sparkSession, storePath)
    val tmp = sibling(storePath, "_append_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true) // crashed prior append
    val obs = org.apache.spark.sql.Observation()
    df.observe(obs, count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(tmp.toString)
    val n = obs.get("n").asInstanceOf[Long]
    val moved =
      if (n > 0) {
        if (!fs.exists(root)) fs.mkdirs(root)
        val tag = java.util.UUID.randomUUID().toString.take(8)
        fs.listStatus(tmp).toSeq
          .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
          .map { st =>
            val dst = new org.apache.hadoop.fs.Path(root,
              s"append-$tag-${st.getPath.getName}")
            if (!fs.rename(st.getPath, dst))
              sys.error(s"appendCounted: rename failed for ${st.getPath}")
            dst.toString
          }
      } else Seq.empty
    fs.delete(tmp, true)
    (n, moved)
  }

  /** [[appendCountedFiles]] when the caller only needs the count. */
  def appendCounted(df: DataFrame, storePath: String): Long =
    appendCountedFiles(df, storePath)._1
}

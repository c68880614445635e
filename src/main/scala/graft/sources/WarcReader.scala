package graft.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Batch WARC reader — the web-crawl ingestion path (CommonCrawl-style
  * `.warc` / `.warc.gz` archives) feeding the text-curation family
  * (StripHtml → Normalize → Dedup → PerplexityScore → …).
  *
  * Scale model, matching how production crawl processing works: WARC
  * gzip members are not byte-splittable without an external index, so
  * parallelism is ONE FILE PER TASK — a crawl segment is tens of
  * thousands of ~1 GB files, far more than any cluster's task slots, so
  * per-file tasks saturate 1000 executors without splitting. Each task
  * STREAMS its file (Hadoop FS → gzip → record parser): memory is
  * bounded by one record (`maxRecordBytes` clips outliers and flags
  * them `truncated` rather than OOMing the executor), never the file.
  * The file listing itself is a driver-side glob — the same listing
  * Spark's own FileSourceScan does.
  *
  * Format per ISO 28500 (WARC 1.0/1.1): `WARC/1.x` version line, CRLF
  * header lines to an empty line, Content-Length payload bytes, CRLF
  * CRLF trailer. `.gz` files are concatenated per-record gzip members —
  * Java's GZIPInputStream consumes multi-member streams natively.
  * `parseHttp` additionally splits response records' HTTP envelope into
  * status + Content-Type + body, which is what the text pipeline wants.
  */
object WarcReader {

  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("record_index", IntegerType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = true),
    StructField("http_status", IntegerType, nullable = true),
    StructField("http_content_type", StringType, nullable = true),
    StructField("payload", BinaryType, nullable = true),
    StructField("truncated", BooleanType, nullable = false)))

  /** Read every WARC file matching `pattern` (glob, any Hadoop FS). */
  def read(spark: SparkSession, pattern: String,
      maxRecordBytes: Int = 16 << 20, parseHttp: Boolean = true): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(pattern)
    val fs = p.getFileSystem(conf)
    val statuses = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    val files = statuses.filter(_.isFile).map(_.getPath.toString)
    readPaths(spark, files, maxRecordBytes, parseHttp)
  }

  /** Read an explicit file list, one task per file. */
  def readPaths(spark: SparkSession, paths: Seq[String],
      maxRecordBytes: Int = 16 << 20, parseHttp: Boolean = true): DataFrame = {
    require(maxRecordBytes > 0, "maxRecordBytes must be positive")
    val sc = spark.sparkContext
    val confBc = sc.broadcast(new SerializableHadoopConf(sc.hadoopConfiguration))
    val n = math.max(paths.size, 1)
    val rows = sc.parallelize(paths, n).flatMap { file =>
      val fs = new Path(file).getFileSystem(confBc.value.value)
      val raw = fs.open(new Path(file))
      val in: InputStream =
        if (file.endsWith(".gz")) new GZIPInputStream(new BufferedInputStream(raw))
        else new BufferedInputStream(raw)
      // the iterator closes itself at EOF, but a task that stops EARLY
      // (limit/take, downstream failure, short-circuited join) never
      // drains it — close unconditionally at task end or a long-lived
      // executor leaks one file handle per abandoned scan
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => in.close()))
      new WarcRecordIterator(file, in, maxRecordBytes, parseHttp)
    }
    spark.createDataFrame(rows, schema)
  }

  /** Streaming record iterator over one (decompressed) WARC stream.
    * Bounded memory: header lines + min(Content-Length, maxRecordBytes). */
  private final class WarcRecordIterator(file: String, in: InputStream,
      maxRecordBytes: Int, parseHttp: Boolean)
      extends Iterator[Row] {
    private var nextRow: Row = _
    private var idx = 0
    private var closed = false

    override def hasNext: Boolean = {
      if (nextRow == null && !closed) advance()
      nextRow != null
    }
    override def next(): Row = {
      if (!hasNext) throw new NoSuchElementException
      val r = nextRow; nextRow = null; r
    }

    private def close(): Unit = if (!closed) { closed = true; in.close() }

    private def advance(): Unit = {
      try {
        // skip inter-record CRLFs / junk to the next version line
        var line = readLine()
        while (line != null && !line.startsWith("WARC/")) line = readLine()
        if (line == null) { close(); return }

        val headers = scala.collection.mutable.Map.empty[String, String]
        var h = readLine()
        while (h != null && h.nonEmpty) {
          val i = h.indexOf(':')
          if (i > 0) headers(h.substring(0, i).trim.toLowerCase) =
            h.substring(i + 1).trim
          h = readLine()
        }
        val len = headers.get("content-length").flatMap(s =>
          scala.util.Try(s.toLong).toOption).getOrElse(0L)
        val keep = math.min(len, maxRecordBytes.toLong).toInt
        val payload = readFully(keep)
        skipFully(len - keep)

        val warcType = headers.get("warc-type").orNull
        var status: Integer = null
        var httpCt: String = null
        var body = payload
        if (parseHttp && warcType == "response" && startsWithHttp(payload)) {
          val sep = indexOfCrlfCrlf(payload)
          if (sep >= 0) {
            val head = new String(payload, 0, sep, "ISO-8859-1")
            val lines = head.split("\r\n")
            val parts = lines.head.split(" ", 3)
            if (parts.length >= 2)
              status = scala.util.Try(Integer.valueOf(parts(1))).toOption.orNull
            httpCt = lines.tail.collectFirst {
              case l if l.toLowerCase.startsWith("content-type:") =>
                l.substring(13).trim
            }.orNull
            body = java.util.Arrays.copyOfRange(payload, sep + 4, payload.length)
          }
        }
        val lenBoxed: java.lang.Long =
          if (headers.contains("content-length")) java.lang.Long.valueOf(len)
          else null
        nextRow = Row(file, idx, warcType, headers.get("warc-record-id").orNull,
          headers.get("warc-target-uri").orNull, headers.get("warc-date").orNull,
          headers.get("content-type").orNull, lenBoxed,
          status, httpCt, body, len > keep)
        idx += 1
      } catch {
        case _: EOFException => close()
      }
    }

    /** CRLF (or bare LF, tolerated) terminated line; null at EOF. */
    private def readLine(): String = {
      val buf = new ByteArrayOutputStream(64)
      var b = in.read()
      if (b < 0) return null
      while (b >= 0 && b != '\n') {
        buf.write(b)
        b = in.read()
      }
      val bytes = buf.toByteArray
      val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r')
        bytes.length - 1 else bytes.length
      new String(bytes, 0, n, "ISO-8859-1")
    }

    private def readFully(n: Int): Array[Byte] = {
      val out = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(out, off, n - off)
        if (r < 0) throw new EOFException("truncated WARC record")
        off += r
      }
      out
    }

    private def skipFully(n: Long): Unit = {
      var left = n
      val junk = new Array[Byte](8192)
      while (left > 0) {
        val r = in.read(junk, 0, math.min(left, junk.length.toLong).toInt)
        if (r < 0) throw new EOFException("truncated WARC record")
        left -= r
      }
    }

    private def startsWithHttp(p: Array[Byte]): Boolean =
      p.length >= 5 && p(0) == 'H' && p(1) == 'T' && p(2) == 'T' &&
        p(3) == 'P' && p(4) == '/'

    private def indexOfCrlfCrlf(p: Array[Byte]): Int = {
      var i = 0
      while (i + 3 < p.length) {
        if (p(i) == '\r' && p(i + 1) == '\n' && p(i + 2) == '\r' &&
          p(i + 3) == '\n') return i
        i += 1
      }
      -1
    }
  }

  // ---- fixture synthesis (tests + gate; the format is its own spec) -------

  /** Serialize one WARC response record wrapping `body` as an HTTP 200. */
  def responseRecord(uri: String, date: String, recordId: String,
      body: Array[Byte], httpContentType: String = "text/plain"): Array[Byte] = {
    val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $httpContentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1")
    val payload = http ++ body
    (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: $recordId\r\n" +
      s"WARC-Target-URI: $uri\r\nWARC-Date: $date\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("ISO-8859-1") ++
      payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  /** Gzip one record as its own member (the standard .warc.gz layout). */
  def gzipMember(record: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(record); gz.close()
    bos.toByteArray
  }

  /** Serialize one WARC conversion record (ISO 28500 §6.8 — the record
    * type WET text extracts use): plain payload, no HTTP envelope. */
  def conversionRecord(uri: String, date: String, recordId: String,
      body: Array[Byte]): Array[Byte] =
    (s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Record-ID: $recordId\r\n" +
      s"WARC-Target-URI: $uri\r\nWARC-Date: $date\r\n" +
      s"Content-Type: text/plain\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1") ++
      body ++ "\r\n\r\n".getBytes("ISO-8859-1")

  /** Hadoop Configuration is not Serializable; ship it via writeFields,
    * the standard wrapper pattern. */
  private[sources] final class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }
}

/** Distributed WET-style WARC export — the curated corpus back out in the
  * crawl interchange format. Each partition streams its rows into ONE
  * `part-NNNNN.warc.gz` of per-record gzip members (the layout
  * [[WarcReader]] and every WARC tool consume): no shuffle, no driver
  * traffic, memory bounded by one record. File names are deterministic
  * per partition index; each attempt writes an attempt-unique dot-hidden
  * temp and renames into place, so retried or SPECULATIVE attempts of
  * the same partition can never interleave bytes in the final file —
  * every committed part is some attempt's complete output.
  * Returns a per-file summary frame (file, records, bytes) —
  * the caller's action on it IS the write; keep it to an aggregate
  * (count/sum) rather than a collect at 100k-partition scale. */
object WarcWriter {

  val summarySchema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("records", LongType, nullable = false),
    StructField("bytes", LongType, nullable = false)))

  /** Write `df`'s (`uriCol`, `textCol`) as conversion records under `dir`.
    * `date` stamps every record (pass a fixed one for reproducible
    * output); record ids are `<urn:graft:<part>-<n>>`, unique per file. */
  def write(df: DataFrame, dir: String, uriCol: String, textCol: String,
      date: String = java.time.Instant.now()
        .truncatedTo(java.time.temporal.ChronoUnit.SECONDS).toString): DataFrame = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    val confBc = sc.broadcast(
      new WarcReader.SerializableHadoopConf(sc.hadoopConfiguration))
    val rows = df.select(col(s"`$uriCol`").cast("string"),
        col(s"`$textCol`").cast("string")).rdd
      .mapPartitionsWithIndex { (part, it) =>
        if (it.isEmpty) Iterator.empty
        else {
          val file = new Path(dir, f"part-$part%05d.warc.gz")
          val fs = file.getFileSystem(confBc.value.value)
          // attempt-unique temp + rename: two concurrent attempts of the
          // same partition (speculation, retry racing a zombie) writing
          // the FINAL path directly interleave bytes on local/S3A-style
          // stores and corrupt the gzip members. Each attempt writes its
          // own dot-hidden temp (invisible to Hadoop globs) and renames
          // into place — every committed file is some attempt's COMPLETE
          // output, last completer wins.
          val attempt = Option(org.apache.spark.TaskContext.get())
            .map(_.taskAttemptId()).getOrElse(0L)
          val tmp = new Path(dir, f".part-$part%05d.warc.gz.a$attempt.tmp")
          val out = fs.create(tmp, true)
          var n = 0L
          try {
            try it.foreach { r =>
              val body = Option(r.getString(1)).getOrElse("").getBytes("UTF-8")
              out.write(WarcReader.gzipMember(WarcReader.conversionRecord(
                Option(r.getString(0)).getOrElse(""), date,
                s"<urn:graft:$part-$n>", body)))
              n += 1
            } finally out.close()
            val len = fs.getFileStatus(tmp).getLen
            if (!fs.rename(tmp, file)) {
              // dst exists (HDFS-semantics rename refuses): replace it —
              // the loser attempt's file is complete too, ours is newer.
              // The delete+rename pair is NOT atomic: the final path is
              // briefly absent between the two calls, and when a zombie
              // attempt replaces the file after a winner committed, the
              // summary row below describes the REPORTING attempt's
              // records/bytes, which may differ from the file a later
              // attempt left on disk. Acceptable for the
              // last-complete-wins contract (every committed file is
              // some attempt's complete output over the same partition
              // rows); readers needing exact byte counts should re-stat
              // the final path after the job.
              fs.delete(file, false)
              if (!fs.rename(tmp, file)) {
                fs.delete(tmp, false)
                require(fs.exists(file),
                  s"WarcWriter: could not commit $file")
              }
            }
            Iterator(Row(file.toString, n, len))
          } catch {
            case e: Throwable =>
              try fs.delete(tmp, false) catch { case _: Throwable => () }
              throw e
          }
        }
      }
    spark.createDataFrame(rows, summarySchema)
  }
}

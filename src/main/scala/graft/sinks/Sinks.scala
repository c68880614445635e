package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.pipeline.PipelineConfig.ConfigOps
import graft.render.Render

/** Sink router (reference: output/). Batch writers; streaming pipelines
  * reuse them inside `foreachBatch`, which replaces the reference's
  * count/size/interval bulk triggers with micro-batch boundaries
  * (SURVEY §2.7). */
object Sinks {

  def writeBatch(name: String, conf: Map[String, Any], df: DataFrame): DataFrame = {
    name match {
      case "Stdout" =>
        // toLocalIterator streams one partition at a time to the driver —
        // bounded memory at any scale, unlike a collect()
        // (reference: output/stdout_output.go prints per event in-flow)
        val it = df.select(
          to_json(struct(df.columns.map(c => col(s"`$c`")): _*)).as("json"))
          .toLocalIterator()
        while (it.hasNext) println(it.next().getString(0))
      case "Dot" =>
        // limit caps the scan — a debug sink must not force a full count
        println("." * df.limit(1000).count().toInt)
      case "Parquet" =>
        df.write.mode(conf.str("mode").getOrElse("overwrite"))
          .parquet(conf.strReq("path"))
      case "Warc" =>
        // WET-style conversion-record export, one .warc.gz per partition;
        // the scalar aggregate forces the distributed write without
        // collecting the per-file summary to the driver
        val summary = graft.sources.WarcWriter.write(df,
          conf.strReq("path"), conf.strReq("uri_field"), conf.strReq("src"))
        val total = summary.agg(coalesce(sum("records"), lit(0L))).head.getLong(0)
        System.err.println(s"[warc] wrote $total records to ${conf.strReq("path")}")
      case "Kafka" =>
        kafkaProjection(conf, df).write.format("kafka")
          .option("topic", conf.strReq("topic"))
          .options(kafkaProducerOptions(conf))
          .save()
      case "TCP" =>
        // reference: output/tcp_output.go — JSON lines over `concurrent`
        // connections with redial; here one connection per partition.
        val addr = conf.strReq("address")
        // rightmost colon: a bare "host" or bracketed IPv6 literal must
        // fail with a config message, not a MatchError
        val cut = addr.lastIndexOf(':')
        if (cut <= 0 || cut == addr.length - 1)
          sys.error(s"TCP output address must be host:port, got '$addr'")
        val (host, port) = (addr.substring(0, cut).stripPrefix("[")
          .stripSuffix("]"), addr.substring(cut + 1))
        df.select(to_json(struct(df.columns.map(c => col(s"`$c`")): _*)).as("json"))
          .foreachPartition { (rows: Iterator[Row]) =>
            if (rows.nonEmpty) {
              val sock = new java.net.Socket(host, port.toInt)
              val out = new java.io.PrintWriter(
                new java.io.OutputStreamWriter(sock.getOutputStream, "UTF-8"))
              try { rows.foreach(r => out.println(r.getString(0))); out.flush() }
              finally sock.close()
            }
          }
      case "Elasticsearch" =>
        writeElasticsearch(conf, df)
      case "ClickHouse" =>
        writeClickHouse(conf, df)
      case "Influxdb" =>
        writeInflux(conf, df)
      case "Custom" =>
        // user sink class (reference plugin surface: output/output.go:46-67)
        graft.pipeline.Plugins.forConf(conf) match {
          case p: graft.pipeline.Plugins.OutputPlugin => p.write(df)
          case other => sys.error(s"custom output ${other.getClass.getName} " +
            "must implement graft.pipeline.Plugins.OutputPlugin")
        }
      case other => sys.error(s"unknown output '$other'")
    }
    df
  }

  /** Producer options from a YAML output conf (reference:
    * output/kafka_output.go producer_settings). Scalar settings forward
    * kafka.-prefixed; healer-internal keys (`healer.*`, e.g. magicbyte)
    * drop with a warning; sasl/tls config — flat dotted keys OR nested
    * blocks, both reference-documented — translates through the same
    * [[graft.pipeline.Planner.securityOptions]] as the consumer (a flat
    * `sasl.user` forwarded verbatim was junk to the client and the
    * producer never built a jaas.config); any OTHER nested value fails
    * loudly instead of stringifying Map(...) into the handshake.
    * Factored from the writer so the translation is spec-testable
    * without a broker. */
  def kafkaProducerOptions(conf: Map[String, Any]): Map[String, String] = {
    val raw = conf.anyMap("producer_settings")
    raw.collect {
      case (k, v: Map[_, _]) if k != "sasl" && k != "tls" =>
        sys.error(s"Kafka producer_settings.$k is a nested block with no " +
          "translation — inline it as flat Kafka client properties")
      case (k, _: Seq[_]) =>
        sys.error(s"Kafka producer_settings.$k is a list — Kafka client " +
          "options are scalars")
    }: Unit
    val scalars = raw.collect { case (k, v)
      if !v.isInstanceOf[Map[_, _]] && !v.isInstanceOf[Seq[_]] =>
        k -> String.valueOf(v)
    }
    if (!scalars.contains("bootstrap.servers"))
      sys.error("Kafka output needs bootstrap.servers")
    val healerKeys = scalars.keySet.filter(_.startsWith("healer."))
    healerKeys.foreach { k =>
      System.err.println(s"[graft] Kafka producer_settings.$k is " +
        "healer-internal — dropped")
    }
    val passthrough = (scalars -- healerKeys)
      .filter { case (k, _) =>
        k != "tls.enabled" && !k.startsWith("sasl.") && !k.startsWith("tls.")
      }
      .map { case (k, v) => s"kafka.$k" -> v }
    passthrough ++ graft.pipeline.Planner.securityOptions(raw)
  }

  /** Kafka record projection: JSON value plus the optional render-derived
    * message key (reference: output/kafka_output.go:34-85 `key` option).
    * Factored from the writer so the record shape is spec-testable
    * without a broker. */
  def kafkaProjection(conf: Map[String, Any], df: DataFrame): DataFrame = {
    val valueCol = to_json(struct(df.columns.map(c => col(s"`$c`")): _*)).as("value")
    val cols = conf.str("key")
      .map(k => Seq(Render.compile(k)(df).cast("string").as("key"), valueCol))
      .getOrElse(Seq(valueCol))
    df.select(cols: _*)
  }

  /** ClickHouse dispatch (reference: output/clickhouse_output.go:350-507).
    * Table schema comes from `desc table` against a live host at plan time
    * — the reference's startup desc (clickhouse_output.go:65-153) — unless
    * the config pins `columns` ("name Type" strings, the offline/test
    * form). `conform` then turns the per-event convert loop into one
    * codegen'd projection and the JDBC write batches `bulk_actions` rows
    * per executeBatch inside foreachPartition. */
  def writeClickHouse(conf: Map[String, Any], df: DataFrame): Unit = {
    val table = conf.strReq("table")
    val hosts = conf.strSeq("hosts")
    val bulkActions = conf.int("bulk_actions", 1000)
    val schema = conf.get("columns") match {
      case Some(cols: Seq[_]) => cols.map { c =>
        c.toString.split("\\s+", 2) match {
          case Array(n, t) => ClickHouseWriter.ChColumn(n, t.trim)
          case _ => sys.error(s"ClickHouse columns entries must be 'name Type': $c")
        }
      }
      case Some(other) => sys.error(s"ClickHouse columns must be a list: $other")
      case None => ClickHouseWriter.descTable(hosts, table)
    }
    ClickHouseWriter.write(df, hosts, table, schema, bulkActions)
  }

  /** ES bulk over foreachPartition: one EsBulkWriter per partition, index
    * name rendered per row from the `%{field}`/`%{+fmt}` pattern as a
    * codegen'd column BEFORE the partition loop. */
  def writeElasticsearch(conf: Map[String, Any], df: DataFrame): Unit = {
    val hosts = conf.strSeq("hosts")
    val indexSpec = conf.strReq("index")
    val idField = conf.str("id_field")
    val routingField = conf.str("routing_field")
    val bulkActions = conf.int("bulk_actions", 5000)
    val bulkBytes = conf.long("bulk_size", 15L) * 1024 * 1024
    val gzip = conf.bool("compress", true)

    // source_field passthrough: ship one pre-rendered field as the doc
    // body instead of re-encoding the event
    // (reference: elasticsearch_output.go:553-569)
    val docCol = conf.str("source_field")
      .orElse(conf.str("bytes_source_field"))
      .map(f => col(s"`$f`").cast("string"))
      .getOrElse(to_json(struct(df.columns.map(c => col(s"`$c`")): _*)))
    val withMeta = df
      .withColumn("__graft_index", Render.compile(indexSpec)(df))
      .withColumn("__graft_doc", docCol)
    val idCol = idField.map(f => col(s"`$f`").cast("string"))
    val routingCol = routingField.map(f => col(s"`$f`").cast("string"))
    val projected = withMeta.select(
      Seq(col("__graft_index"), col("__graft_doc")) ++
        idCol.map(_.as("__graft_id")).toSeq ++
        routingCol.map(_.as("__graft_routing")).toSeq: _*)

    projected.foreachPartition { (rows: Iterator[Row]) =>
      val writer = new EsBulkWriter(hosts, bulkActions, bulkBytes, gzip)
      var nullDocs = 0L
      rows.foreach { r =>
        val idx = r.getString(0)
        val doc = r.getString(1)
        var f = 2
        val id = if (idField.isDefined) { val v = Option(r.getString(f)); f += 1; v } else None
        val routing = if (routingField.isDefined) Option(r.getString(f)) else None
        // a null source_field is one malformed row, not a reason to kill
        // a streaming query with an NPE — skip it and say so
        if (doc == null) nullDocs += 1
        else writer.add(EsBulkWriter.actionMeta(idx, id, routing), doc)
      }
      if (nullDocs > 0) System.err.println(
        s"[es] skipped $nullDocs rows with a null source_field document")
      writer.close()
    }
  }

  /** InfluxDB line protocol (reference: output/influxdb_output.go). */
  def influxLine(measurement: String, tags: Seq[(String, String)],
      fields: Seq[(String, Any)], tsNanos: Long): String = {
    // backslash FIRST (escaping the escape), then the delimiters; line
    // protocol has no newline escape, so embedded newlines map to spaces
    // — a raw '\n' would split one point into two garbage lines and
    // poison the whole batch body
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace(" ", "\\ ").replace(",", "\\,")
        .replace("=", "\\=").replace("\n", " ").replace("\r", " ")
    def escField(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", " ").replace("\r", " ")
    val tagPart = tags.filter(_._2 != null)
      .map { case (k, v) => s"${esc(k)}=${esc(v)}" }.mkString(",")
    val fieldPart = fields.filter(_._2 != null).map {
      case (k, v: String) => s"""${esc(k)}="${escField(v)}""""
      case (k, v: Long) => s"${esc(k)}=${v}i"
      case (k, v: Int) => s"${esc(k)}=${v}i"
      case (k, v) => s"${esc(k)}=$v"
    }.mkString(",")
    val head = if (tagPart.isEmpty) esc(measurement) else s"${esc(measurement)},$tagPart"
    s"$head $fieldPart $tsNanos"
  }

  /** One client per executor JVM — HttpClient owns a connection pool and
    * a selector thread; building one per partition per batch leaked both. */
  private lazy val httpClient = java.net.http.HttpClient.newHttpClient()

  /** Event-time nanos projection for the Influx sink. A time-series point
    * must carry the EVENT's time: stamping the wall clock (the old
    * behavior) rewrites history on any replay or backfill. Matches the
    * reference's configurable `timestamp` key encoded as UnixNano
    * (reference: output/influxdb_output.go:55-58,134-137); wall clock is
    * only the fallback when the column is absent or the value is null. */
  def influxTsNanos(df: DataFrame, tsField: String): Option[org.apache.spark.sql.Column] =
    if (df.columns.contains(tsField))
      Some(unix_micros(col(s"`$tsField`").cast("timestamp")) * 1000L)
    else None

  private def writeInflux(conf: Map[String, Any], df: DataFrame): Unit = {
    val measurement = conf.strReq("measurement")
    val tags = conf.strSeq("tags")
    val fields = conf.strSeq("fields")
    val hosts = conf.strSeq("hosts")
    val db = conf.strReq("db")
    val tsField = conf.str("timestamp").getOrElse("@timestamp")
    val tsNanosCol = influxTsNanos(df, tsField)
    val hasTs = tsNanosCol.isDefined
    val projected = tsNanosCol.map(c => df.withColumn("__graft_ts_nanos", c)).getOrElse(df)
    projected.foreachPartition { (rows: Iterator[Row]) =>
      val selector = new HostSelector(hosts,
        startIdx = Option(org.apache.spark.TaskContext.get())
          .map(_.partitionId()).getOrElse(0))
      val lines = rows.map { r =>
        val tagVals = tags.map(t => t -> Option(r.getAs[Any](t)).map(_.toString).orNull)
        val fieldVals = fields.map(f => f -> r.getAs[Any](f))
        val nanos =
          (if (hasTs) Option(r.getAs[Any]("__graft_ts_nanos")) else None) match {
            case Some(n: Long) => n
            case _ => System.currentTimeMillis() * 1000000L
          }
        influxLine(measurement, tagVals, fieldVals, nanos)
      }.mkString("\n")
      // check status + fail over (reference: influxdb_output.go retries
      // through the selector) — BodyHandlers.discarding with no status
      // check silently dropped every 4xx/5xx batch
      if (lines.nonEmpty) {
        var attempts = hosts.size
        var done = false
        while (!done) {
          val host = selector.select().getOrElse(
            throw new RuntimeException("Influx write: all hosts in cooldown"))
          val req = java.net.http.HttpRequest.newBuilder(
              java.net.URI.create(s"$host/write?db=$db"))
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(lines)).build()
          val status =
            try httpClient.send(req,
              java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode()
            catch { case _: java.io.IOException => -1 }
          if (status >= 200 && status < 300) {
            selector.reportSuccess(host); done = true
          } else if (status >= 400 && status < 500) {
            // the server parsed and REJECTED the body — no other host
            // will accept it; a retry loop would just re-fail
            throw new RuntimeException(
              s"Influx write rejected: HTTP $status from $host")
          } else {
            selector.reportFailure(host)
            attempts -= 1
            if (attempts <= 0) throw new RuntimeException(
              s"Influx write failed on every host (last: HTTP $status)")
          }
        }
      }
    }
  }
}

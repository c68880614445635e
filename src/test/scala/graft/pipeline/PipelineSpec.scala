package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("yaml parse with env expansion") {
    val spec = PipelineConfig.parse(
      """inputs:
        |  - Text:
        |      path: ${HOME}/data.txt
        |filters:
        |  - Add:
        |      fields: {x: "1"}
        |outputs:
        |  - Stdout: {}
        |""".stripMargin)
    assert(spec.inputs.head._1 == "Text")
    assert(spec.inputs.head._2("path").toString.startsWith(sys.env("HOME")))
    assert(spec.filters.head._1 == "Add")
    assert(spec.outputs.head._1 == "Stdout")
  }

  test("end-to-end batch pipeline: Text -> Grok -> Date -> Convert -> Drop -> Parquet") {
    // mirrors the reference's e2e test shape (gohangout_test.go:207-228)
    val dir = Files.createTempDirectory("graft_e2e")
    val logFile = dir.resolve("access.log")
    Files.write(logFile, java.util.Arrays.asList(
      """2024-03-05T10:20:30 alice 200""",
      """2024-03-05T10:21:00 bob 500""",
      """2024-03-05T10:22:00 carol 404""",
      "not a log line"))
    val outDir = dir.resolve("out").toString

    val yaml =
      s"""inputs:
         |  - Text:
         |      path: $logFile
         |filters:
         |  - Grok:
         |      src: message
         |      match:
         |        - '^(?P<logtime>\\S+) (?P<name>\\w+) (?P<status>\\d+)$$'
         |      failTag: grokfail
         |  - Date:
         |      src: logtime
         |      formats: ['2006-01-02T15:04:05']
         |      remove_fields: ['logtime']
         |  - Convert:
         |      fields:
         |        status: {to: int}
         |  - Drop:
         |      if:
         |        - 'EQ(status,500)'
         |outputs:
         |  - Parquet:
         |      path: $outDir
         |""".stripMargin

    Planner.fromYaml(yaml).runBatch(spark)
    val out = spark.read.parquet(outDir)
    val rows = out.collect()
    assert(rows.length == 3) // 500 dropped; garbage line kept with fail tag
    val byName = rows.filter(r => !r.isNullAt(r.fieldIndex("name")))
      .map(r => r.getString(r.fieldIndex("name")) -> r).toMap
    assert(byName.keySet == Set("alice", "carol"))
    assert(byName("alice").getLong(byName("alice").fieldIndex("status")) == 200L)
    assert(byName("alice").getTimestamp(byName("alice").fieldIndex("@timestamp"))
      .toString.startsWith("2024-03-05 10:20:30"))
    val garbage = rows.find(r => r.isNullAt(r.fieldIndex("name"))).get
    assert(garbage.getSeq[String](garbage.fieldIndex("tags")).contains("grokfail"))
  }

  test("multiple inputs union, output if-guard routes") {
    val dir = Files.createTempDirectory("graft_union")
    val f1 = dir.resolve("a.txt"); Files.write(f1, java.util.Arrays.asList("aaa", "abc"))
    val f2 = dir.resolve("b.txt"); Files.write(f2, java.util.Arrays.asList("bbb"))
    val out = dir.resolve("out").toString
    val yaml =
      s"""inputs:
         |  - Text: {path: $f1}
         |  - Text: {path: $f2}
         |filters: []
         |outputs:
         |  - Parquet:
         |      path: $out
         |      if:
         |        - 'HasPrefix(message,"a")'
         |""".stripMargin
    Planner.fromYaml(yaml).runBatch(spark)
    assert(spark.read.parquet(out).count() == 2)
  }

  test("CLI main runs a batch config end-to-end and detects streaming specs") {
    val dir = Files.createTempDirectory("graft_cli")
    val in = dir.resolve("in.txt")
    Files.write(in, java.util.Arrays.asList("alpha 1", "beta 2"))
    val out = dir.resolve("out").toString
    val cfg = dir.resolve("pipeline.yml")
    Files.writeString(cfg,
      s"""inputs:
         |  - Text: {path: $in}
         |filters:
         |  - Grok:
         |      src: message
         |      match: ['^%{WORD:w} %{INT:n}$$']
         |outputs:
         |  - Parquet: {path: $out}
         |""".stripMargin)
    graft.Main.run(spark, cfg.toString)
    val rows = spark.read.parquet(out)
    assert(rows.count() == 2)
    assert(rows.select("w").collect().map(_.getString(0)).toSet == Set("alpha", "beta"))

    assert(!graft.Main.isStreamingSpec(Planner.fromFile(cfg.toString).spec))
    assert(graft.Main.isStreamingSpec(PipelineConfig.parse(
      "inputs:\n  - Kafka: {topic: {t: 1}}\noutputs:\n  - Stdout: {}\n")))
    // a Custom input's frame shape is invisible at spec level: the
    // `streaming: true` hint routes it through runStreaming (r14 fix)
    assert(graft.Main.isStreamingSpec(PipelineConfig.parse(
      "inputs:\n  - Custom: {class: x.Y, streaming: true}\noutputs:\n  - Stdout: {}\n")))
    assert(!graft.Main.isStreamingSpec(PipelineConfig.parse(
      "inputs:\n  - Custom: {class: x.Y}\noutputs:\n  - Stdout: {}\n")))
  }

  test("config guards: empty yaml and missing inputs fail with named errors") {
    val empty = intercept[RuntimeException](
      PipelineConfig.parse("# just a comment\n"))
    assert(empty.getMessage.contains("empty"))
    val noInputs = intercept[RuntimeException](
      Planner.fromYaml("outputs:\n  - Stdout: {}\n").runBatch(spark))
    assert(noInputs.getMessage.contains("inputs"))
  }

  test("SIGUSR1 triggers the same reload path as a config-file change") {
    // reference: gohangout.go:149-155 (kill -USR1 → re-read config). The
    // handler seam is the reload closure Main.run hands to ConfigWatcher.
    val fired = new java.util.concurrent.CountDownLatch(1)
    val installed = graft.Main.trapReloadSignal(() => fired.countDown())
    if (!installed) cancel("JVM reserves SIGUSR1 here; trap degraded to no-op as designed")
    sun.misc.Signal.raise(new sun.misc.Signal("USR1"))
    assert(fired.await(5, java.util.concurrent.TimeUnit.SECONDS),
      "USR1 handler did not run")
  }

  test("Kafka input options: subscribe vs assign, group, backpressure, offsets") {
    val subscribed = Planner.kafkaOptions(Map(
      "topic" -> Map("logs" -> 2, "metrics" -> 1),
      "consumer_settings" -> Map(
        "bootstrap.servers" -> "k1:9092,k2:9092",
        "group.id" -> "graft",
        "from.beginning" -> "true"),
      "max_offsets_per_trigger" -> "50000"))
    assert(subscribed("kafka.bootstrap.servers") == "k1:9092,k2:9092")
    assert(subscribed("subscribe").split(",").toSet == Set("logs", "metrics"))
    assert(subscribed("kafka.group.id") == "graft")
    assert(subscribed("startingOffsets") == "earliest")
    assert(subscribed("maxOffsetsPerTrigger") == "50000")

    val assigned = Planner.kafkaOptions(Map(
      "assign" -> """{"logs":[0,1]}""",
      "consumer_settings" -> Map("bootstrap.servers" -> "k1:9092")))
    assert(assigned("assign") == """{"logs":[0,1]}""")
    assert(!assigned.contains("subscribe") && !assigned.contains("startingOffsets"))

    // reference configs write assign as a YAML map → rendered to JSON
    val assignedMap = Planner.kafkaOptions(Map(
      "assign" -> Map("logs" -> Seq(0, 1), "metrics" -> Seq(2)),
      "consumer_settings" -> Map("bootstrap.servers" -> "k1:9092")))
    assert(assignedMap("assign") == """{"logs":[0,1],"metrics":[2]}""")

    val err = intercept[RuntimeException](Planner.kafkaOptions(Map(
      "topic" -> Map("t" -> 1), "consumer_settings" -> Map.empty[String, String])))
    assert(err.getMessage.contains("bootstrap.servers"))

    // EVERY other consumer setting passes through kafka.-prefixed —
    // dropping SASL/TLS config silently connected PLAINTEXT (r14 fix);
    // from.beginning stays reference-semantic, never a consumer property
    val secured = Planner.kafkaOptions(Map(
      "topic" -> Map("t" -> 1),
      "consumer_settings" -> Map(
        "bootstrap.servers" -> "k1:9093",
        "security.protocol" -> "SASL_SSL",
        "sasl.mechanism" -> "SCRAM-SHA-256",
        "from.beginning" -> "true")))
    assert(secured("kafka.security.protocol") == "SASL_SSL")
    assert(secured("kafka.sasl.mechanism") == "SCRAM-SHA-256")
    assert(!secured.contains("kafka.from.beginning"))
    assert(secured("startingOffsets") == "earliest")
  }

  test("Kafka input options: reserved keys translate, nested sasl/tls " +
      "become client security properties") {
    // Spark-reserved consumer options must not forward kafka.-prefixed
    // (Spark throws at plan time on them): auto.offset.reset maps to
    // startingOffsets, offset/deserializer management keys drop
    val reserved = Planner.kafkaOptions(Map(
      "topic" -> Map("t" -> 1),
      "consumer_settings" -> Map(
        "bootstrap.servers" -> "k1:9092",
        "auto.offset.reset" -> "latest",
        "enable.auto.commit" -> "false",
        "auto.commit.interval.ms" -> "5000",
        "messages_queue_length" -> 10,
        "key.deserializer" -> "X", "value.deserializer" -> "Y",
        "retry.backoff.ms" -> 1000)))
    assert(reserved("startingOffsets") == "latest")
    Seq("kafka.auto.offset.reset", "kafka.enable.auto.commit",
      "kafka.auto.commit.interval.ms", "kafka.messages_queue_length",
      "kafka.key.deserializer", "kafka.value.deserializer").foreach { k =>
      assert(!reserved.contains(k), s"$k must not pass through")
    }
    // a real Kafka client property still passes through
    assert(reserved("kafka.retry.backoff.ms") == "1000")
    val badReset = intercept[RuntimeException](Planner.kafkaOptions(Map(
      "topic" -> Map("t" -> 1),
      "consumer_settings" -> Map("bootstrap.servers" -> "k",
        "auto.offset.reset" -> "none"))))
    assert(badReset.getMessage.contains("startingOffsets"))

    // the reference README's nested sasl block (mechanism/user/password)
    // → mechanism + jaas.config + security.protocol
    val sasl = Planner.kafkaOptions(Map(
      "topic" -> Map("t" -> 1),
      "consumer_settings" -> Map(
        "bootstrap.servers" -> "k1:9094",
        "sasl" -> Map("mechanism" -> "PLAIN", "user" -> "admin",
          "password" -> """adm"in"""))))
    assert(sasl("kafka.sasl.mechanism") == "PLAIN")
    assert(sasl("kafka.security.protocol") == "SASL_PLAINTEXT")
    assert(sasl("kafka.sasl.jaas.config") ==
      """org.apache.kafka.common.security.plain.PlainLoginModule required username="admin" password="adm\"in";""")

    // nested tls block: PEM material is INLINED (executors need no local
    // files); insecure.skip.verify disables hostname verification
    val dir = java.nio.file.Files.createTempDirectory("graft-kafka-tls")
    val ca = dir.resolve("ca.pem"); val cert = dir.resolve("cert.pem")
    val key = dir.resolve("key.pem")
    java.nio.file.Files.write(ca, "CA-PEM".getBytes("UTF-8"))
    java.nio.file.Files.write(cert, "CERT-PEM".getBytes("UTF-8"))
    java.nio.file.Files.write(key, "KEY-PEM".getBytes("UTF-8"))
    val tls = Planner.kafkaOptions(Map(
      "topic" -> Map("t" -> 1),
      "consumer_settings" -> Map(
        "bootstrap.servers" -> "k1:9095",
        "tls" -> Map("ca" -> ca.toString, "cert" -> cert.toString,
          "key" -> key.toString, "insecure.skip.verify" -> "true"))))
    assert(tls("kafka.security.protocol") == "SSL")
    assert(tls("kafka.ssl.truststore.type") == "PEM")
    assert(tls("kafka.ssl.truststore.certificates") == "CA-PEM")
    assert(tls("kafka.ssl.keystore.certificate.chain") == "CERT-PEM")
    assert(tls("kafka.ssl.keystore.key") == "KEY-PEM")
    assert(tls("kafka.ssl.endpoint.identification.algorithm") == "")

    // FLAT dotted sasl keys (the reference README's kafka-output form,
    // healer accepts both) translate like the nested block — forwarded
    // verbatim, kafka.sasl.user was junk and auth never happened
    val flatSasl = Planner.kafkaOptions(Map(
      "topic" -> Map("t" -> 1),
      "consumer_settings" -> Map(
        "bootstrap.servers" -> "k1:9094",
        "sasl.mechanism" -> "PLAIN",
        "sasl.user" -> "admin", "sasl.password" -> "s3c")))
    assert(flatSasl("kafka.security.protocol") == "SASL_PLAINTEXT")
    assert(flatSasl("kafka.sasl.jaas.config").contains("""username="admin""""))
    assert(!flatSasl.contains("kafka.sasl.user"))

    // an EXPLICIT security.protocol wins over the inferred one: SASL
    // against a TLS broker trusted via system CAs has no tls: block and
    // must not be forced down to SASL_PLAINTEXT
    val explicitProto = Planner.kafkaOptions(Map(
      "topic" -> Map("t" -> 1),
      "consumer_settings" -> Map(
        "bootstrap.servers" -> "k1:9094",
        "security.protocol" -> "SASL_SSL",
        "sasl" -> Map("mechanism" -> "PLAIN", "user" -> "u",
          "password" -> "p"))))
    assert(explicitProto("kafka.security.protocol") == "SASL_SSL")

    // sasl + tls compose to SASL_SSL; any OTHER nested block fails loudly
    // instead of stringifying Map(...) into a broker option
    val both = Planner.kafkaOptions(Map(
      "topic" -> Map("t" -> 1),
      "consumer_settings" -> Map(
        "bootstrap.servers" -> "k",
        "sasl" -> Map("mechanism" -> "SCRAM-SHA-512", "user" -> "u",
          "password" -> "p"),
        "tls" -> Map("ca" -> ca.toString))))
    assert(both("kafka.security.protocol") == "SASL_SSL")
    assert(both("kafka.sasl.jaas.config").contains("ScramLoginModule"))
    val nested = intercept[RuntimeException](Planner.kafkaOptions(Map(
      "topic" -> Map("t" -> 1),
      "consumer_settings" -> Map("bootstrap.servers" -> "k",
        "net" -> Map("timeout" -> 1)))))
    assert(nested.getMessage.contains("nested block"))
    // cert without key: a half keystore must fail, not half-configure
    val half = intercept[RuntimeException](Planner.kafkaOptions(Map(
      "topic" -> Map("t" -> 1),
      "consumer_settings" -> Map("bootstrap.servers" -> "k",
        "tls" -> Map("cert" -> cert.toString)))))
    assert(half.getMessage.contains("cert"))
  }

  test("Kafka decode: message/@timestamp projection and @metadata decoration") {
    val raw = Seq(("payload", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        "logs", 3, 42L))
      .toDF("value", "timestamp", "topic", "partition", "offset")
    val plain = Planner.kafkaDecode(raw, decorate = false)
    assert(plain.columns.toSeq == Seq("message", "@timestamp"))
    assert(plain.collect().head.getString(0) == "payload")

    val dec = Planner.kafkaDecode(raw, decorate = true).collect().head
    val meta = dec.getStruct(dec.fieldIndex("@metadata"))
    assert(meta.getString(0) == "logs" && meta.getInt(1) == 3 && meta.getLong(2) == 42L)

    // codec json parses with the declared schema, plain fallback otherwise
    val jsonRaw = Seq(
      ("""{"a": 5, "b": "x"}""", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        "t", 0, 1L),
      ("not json", java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), "t", 0, 2L))
      .toDF("value", "timestamp", "topic", "partition", "offset")
    val parsed = Planner.kafkaDecode(jsonRaw, decorate = false, codec = "json",
        schema = Some(org.apache.spark.sql.types.StructType.fromDDL("a LONG, b STRING")))
      .orderBy(org.apache.spark.sql.functions.col("a").asc_nulls_last).collect()
    assert(parsed(0).getLong(parsed(0).fieldIndex("a")) == 5L)
    assert(parsed(0).isNullAt(parsed(0).fieldIndex("message")))
    assert(parsed(1).getString(parsed(1).fieldIndex("message")) == "not json")

    val noSchema = intercept[RuntimeException](
      Planner.kafkaDecode(jsonRaw, decorate = false, codec = "json"))
    assert(noSchema.getMessage.contains("schema"))
  }

  test("IPIP filter dispatches from YAML: CIDR database, target struct, if-guard") {
    val dir = Files.createTempDirectory("graft_ipip")
    val db = dir.resolve("geo.csv")
    Files.write(db, java.util.Arrays.asList(
      "cidr,country_name,isp",
      "10.0.0.0/8,Wonderland,ACME",
      "192.168.0.0/16,Oz,EMCA"))

    val input = Seq(
      ("e1", "10.1.2.3"),
      ("e2", "192.168.7.9"),
      ("e3", "172.16.0.1"), // no range matches → null attributes
    ).toDF("id", "ip")

    val yaml =
      s"""filters:
         |  - IPIP:
         |      src: ip
         |      database: $db
         |""".stripMargin
    val out = Planner.fromYaml(yaml).transform(input)
    val rows = out.collect().map(r => r.getString(0) -> r).toMap
    def geo(id: String, f: String): Any = {
      val r = rows(id)
      val s = r.getStruct(r.fieldIndex("geoip"))
      if (s == null || s.isNullAt(s.fieldIndex(f))) null else s.get(s.fieldIndex(f))
    }
    assert(geo("e1", "country_name") == "Wonderland" && geo("e1", "isp") == "ACME")
    assert(geo("e2", "country_name") == "Oz")
    assert(geo("e3", "country_name") == null)

    // top-level form (`target: ''`) with an if-guard
    val yamlTop =
      s"""filters:
         |  - IPIP:
         |      src: ip
         |      database: $db
         |      target: ''
         |      if: ['HasPrefix(ip,"10.")']
         |""".stripMargin
    val topRows = Planner.fromYaml(yamlTop).transform(input)
      .collect().map(r => r.getString(r.fieldIndex("id")) -> r).toMap
    def attr(id: String, f: String): Any = {
      val r = topRows(id)
      if (r.isNullAt(r.fieldIndex(f))) null else r.get(r.fieldIndex(f))
    }
    assert(attr("e1", "country_name") == "Wonderland")
    assert(attr("e2", "country_name") == null) // guard blocked the 192.* row

    // box options: add_fields on lookup hit, failTag on lookup miss
    val yamlBox =
      s"""filters:
         |  - IPIP:
         |      src: ip
         |      database: $db
         |      add_fields: {located: "yes"}
         |      failTag: _geolookup_failure
         |""".stripMargin
    val boxRows = Planner.fromYaml(yamlBox).transform(input)
      .collect().map(r => r.getString(r.fieldIndex("id")) -> r).toMap
    def s(id: String, f: String): Any = {
      val r = boxRows(id)
      if (r.isNullAt(r.fieldIndex(f))) null else r.get(r.fieldIndex(f))
    }
    assert(s("e1", "located") == "yes")
    assert(s("e3", "located") == null) // miss → add_fields skipped
    val e3 = boxRows("e3")
    assert(e3.getSeq[String](e3.fieldIndex("tags")) == Seq("_geolookup_failure"))
    assert(s("e1", "tags") == null)
  }

  test("Funnel and Retention dispatch from YAML with DSL step predicates") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val input = Seq(
      (1L, t("2024-01-01 00:00:00"), "signup"),
      (1L, t("2024-01-01 00:10:00"), "view"),
      (1L, t("2024-01-01 00:20:00"), "click"),
      (2L, t("2024-01-08 12:00:00"), "signup"),
      (2L, t("2024-01-15 12:00:00"), "view"),
    ).toDF("uid", "ts", "et")

    val funnel = Planner.fromYaml(
      """filters:
        |  - Funnel:
        |      key: uid
        |      timestamp: ts
        |      window: 3600
        |      steps: ['EQ(et,"view")', 'EQ(et,"click")']
        |""".stripMargin).transform(input)
      .as[(Long, Int)].collect().toMap
    assert(funnel == Map(1L -> 2, 2L -> 1))

    val retention = Planner.fromYaml(
      """filters:
        |  - Retention:
        |      key: uid
        |      timestamp: ts
        |      anchor: 'EQ(et,"signup")'
        |      period: 604800
        |""".stripMargin).transform(input)
      .as[(Long, Long, Long)].collect()
      .map { case (c, o, n) => (c, o) -> n }.toMap
    // both users active in their signup week; u2 active again a week later
    assert(retention.values.sum == 3L)
    assert(retention.count { case ((_, o), _) => o == 1L } == 1)
  }

  test("Sessionize and AsOfJoin dispatch from YAML") {
    val dir = Files.createTempDirectory("graft_asof")
    val dimPath = dir.resolve("dim.parquet").toString
    // slowly-changing dimension: (k, version ts, label)
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "v1"),
        (1L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), "v2"))
      .toDF("k", "ts", "label").write.parquet(dimPath)

    val input = Seq(
      (10L, 1L, java.sql.Timestamp.valueOf("2024-01-01 06:00:00")), // → v1, session 1
      (11L, 1L, java.sql.Timestamp.valueOf("2024-01-01 06:30:00")), // → v1, session 1
      (12L, 1L, java.sql.Timestamp.valueOf("2024-01-01 13:00:00")), // → v2, session 2
    ).toDF("id", "k", "ts")

    val yaml =
      s"""filters:
         |  - AsOfJoin:
         |      right: {input: Parquet, path: $dimPath}
         |      keys: [k]
         |      timestamp: ts
         |      suffix: _dim
         |  - Sessionize:
         |      key: k
         |      timestamp: ts
         |      gap: 3600
         |""".stripMargin
    val out = Planner.fromYaml(yaml).transform(input)
      .select("id", "label_dim", "session_seq").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(10L) == (("v1", 1L)))
    assert(out(11L) == (("v1", 1L)))
    assert(out(12L) == (("v2", 2L)))
  }

  test("analytics chain from MIGRATION.md: Sessionize then strict-order Funnel") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val input = Seq(
      // u1: clean view->click->purchase chain -> level 3
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 10:05:00"), "click"),
      (1L, t("2024-01-01 10:10:00"), "purchase"),
      // u2: an error event between view and click freezes strict_order -> 1
      (2L, t("2024-01-01 10:00:00"), "view"),
      (2L, t("2024-01-01 10:01:00"), "error"),
      (2L, t("2024-01-01 10:05:00"), "click"),
      (2L, t("2024-01-01 10:10:00"), "purchase"),
    ).toDF("user_id", "ts", "event_type")
    val yaml =
      """filters:
        |  - Sessionize:
        |      key: user_id
        |      timestamp: ts
        |      gap: 1800
        |      target: session_seq
        |  - Funnel:
        |      key: user_id
        |      timestamp: ts
        |      steps: ['EQ(event_type,"view")', 'EQ(event_type,"click")',
        |              'EQ(event_type,"purchase")']
        |      window: 86400
        |      mode: strict_order
        |""".stripMargin
    val out = Planner.fromYaml(yaml).transform(input)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 3, 2L -> 1))
  }

  test("SequenceCount and Retention conditions-mode dispatch from YAML") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val input = Seq(
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 10:05:00"), "click"),
      (1L, t("2024-01-01 10:06:00"), "view"),
      (1L, t("2024-01-01 10:07:00"), "click"),
    ).toDF("user_id", "ts", "event_type")
    val seq = Planner.filterStage("SequenceCount", Map(
      "key" -> "user_id", "timestamp" -> "ts",
      "steps" -> List("EQ(event_type,\"view\")", "EQ(event_type,\"click\")")))(input)
    assert(seq.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 2L))
    val flags = Planner.filterStage("Retention", Map(
      "key" -> "user_id", "timestamp" -> "ts",
      "conditions" -> List("EQ(event_type,\"view\")", "EQ(event_type,\"click\")")))(input)
    assert(flags.columns.toSeq == Seq("user_id", "r1", "r2"))
    assert(flags.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq ==
      Seq((1L, 1, 1)))
  }
}

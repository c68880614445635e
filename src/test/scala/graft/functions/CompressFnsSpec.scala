package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompressFnsSpec extends SparkSpec {
  import spark.implicits._

  test("compressionRatio: repetitive text compresses far below varied prose") {
    val rep = ("spam " * 200).trim
    val varied = (1 to 200).map(i => s"w${i * 7919 % 9973}x$i").mkString(" ")
    val out = Seq((0L, rep), (1L, varied), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .select(col("id"), CompressFns.compressionRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1)))).toMap
    assert(out(0L).doubleValue() < 0.1, s"repetitive ratio ${out(0L)}")
    assert(out(1L).doubleValue() > 0.4, s"varied ratio ${out(1L)}")
    assert(out(2L).doubleValue() == 1.0) // empty: neutral
    assert(out(3L) == null)
  }

  test("deflateLen matches a direct Deflater run and registers in SQL") {
    val s = "the quick brown fox jumps over the lazy dog"
    val expect = CompressFns.deflateLenKernel(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    GraftExtensions.register(spark)
    val got = spark.sql(s"SELECT deflate_len('$s')").head.getInt(0)
    assert(got == expect && expect > 0 && expect < s.length + 16)
  }

  test("deflate_len stays inside whole-stage codegen") {
    val df = spark.range(4).select(
      concat(lit("text body "), col("id")).as("text"))
    val plan = df.select(CompressFns.deflateLen(col("text")).as("dl"))
      .queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("deflate_len")).get
    assert(line.trim.startsWith("*("), s"not codegen'd: $line")
  }

  test("CompressionRatio stage dispatches flag and drop modes") {
    val df = Seq((0L, ("dup " * 300).trim), (1L, (1 to 100).map(i => s"q${i * 31 % 97}z$i").mkString(" ")))
      .toDF("id", "text")
    val flagged = graft.pipeline.Planner.corpusStage("CompressionRatio",
      Map("src" -> "text"))(df)
    assert(flagged.columns.contains("compression_ratio"))
    val dropped = graft.pipeline.Planner.corpusStage("CompressionRatio",
      Map("src" -> "text", "mode" -> "drop", "min" -> 0.2))(df)
    assert(dropped.columns.toSeq == Seq("id", "text"))
    assert(dropped.select("id").as[Long].collect().toSeq == Seq(1L))
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GeoIpSpec extends SparkSpec {
  import spark.implicits._

  lazy val ranges = Seq(
    (0L, 255L, "ZERO"),                   // 0.0.0.0 - 0.0.0.255
    (16777216L, 33554431L, "ONE"),        // 1.0.0.0 - 1.255.255.255 (wide)
  ).toDF("ip_from", "ip_to", "country")

  test("ipToLong/longToIp round-trip") {
    val df = Seq("1.2.3.4", "0.0.0.255", "255.255.255.255").toDF("ip")
    val out = df.select(GeoIp.longToIp(GeoIp.ipToLong($"ip")).as("rt"))
      .as[String].collect().toSeq
    assert(out == Seq("1.2.3.4", "0.0.0.255", "255.255.255.255"))
  }

  test("enrich matches ranges, including wide multi-bucket ranges") {
    val df = Seq("0.0.0.7", "1.2.3.4", "9.9.9.9").toDF("ip")
    val out = GeoIp.enrich(df, ranges, "ip")
      .select($"ip", $"country").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("0.0.0.7").contains("ZERO"))
    assert(out("1.2.3.4").contains("ONE")) // spans 256 /16 buckets
    assert(out("9.9.9.9").isEmpty)         // miss keeps null attributes
  }
}

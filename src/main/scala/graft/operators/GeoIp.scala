package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GeoIP enrichment: the reference's IPIP filter (filter/ipip.go:32-135)
  * looks up an IP in an interval database and sets country/province/city/
  * isp/lat/lon fields.
  *
  * Spark-first shape: an IP-interval lookup is a RANGE join. A naive
  * `ipl BETWEEN ip_from AND ip_to` broadcast join plans as a
  * BroadcastNestedLoopJoin — every probe row scans every range, O(n·m),
  * which dies at 1M-range GeoIP databases. Instead we bucket the IPv4
  * space by the high `bucketBits` bits:
  *
  *   - build side: each range row is EXPLODED to every /bucketBits prefix
  *     it spans (a real GeoIP DB's ranges are small, so explode factor is
  *     ~1; a handful of wide ranges fan out to at most 2^bucketBits rows).
  *   - probe side: one prefix per row, computed from the IP — the join is
  *     then a plain broadcast HASH join on the prefix plus a residual
  *     BETWEEN filter. Probe side never shuffles.
  */
object GeoIp {

  /** Dotted-quad string → 32-bit value in a long. */
  def ipToLong(ip: Column): Column = {
    val o = split(ip, "\\.")
    element_at(o, 1).cast("long") * 16777216L +
      element_at(o, 2).cast("long") * 65536L +
      element_at(o, 3).cast("long") * 256L +
      element_at(o, 4).cast("long")
  }

  /** 32-bit value → dotted-quad string. */
  def longToIp(ipl: Column): Column =
    concat_ws(".",
      (ipl / 16777216L).cast("long") % 256,
      (ipl / 65536L).cast("long") % 256,
      (ipl / 256L).cast("long") % 256,
      ipl % 256)

  /** CIDR string → (ip_from, ip_to) columns; e.g. "10.1.0.0/16".
    * The reference ships binary ipip.net datx/ipdb files — any tabular
    * form with a CIDR or from/to columns loads into the same range dim. */
  def cidrToRange(cidr: Column): (Column, Column) = {
    val parts = split(cidr, "/")
    val base = ipToLong(element_at(parts, 1))
    val prefix = element_at(parts, 2).cast("int")
    val span = pow(lit(2.0), lit(32) - prefix).cast("long")
    val from = (base / span).cast("long") * span
    (from, from + span - 1)
  }

  /** Load a CSV of `cidr,attr1,attr2,…` (header row) into a ranges dim. */
  def loadCidrCsv(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    val (from, to) = cidrToRange(col("cidr"))
    raw.withColumn("ip_from", from).withColumn("ip_to", to).drop("cidr")
  }

  /** Enrich `df` with the attribute columns of `ranges` (which must carry
    * `ip_from`/`ip_to` longs; every other column is an attribute). Left
    * join — unmatched IPs keep null attributes, like the reference leaves
    * fields unset on lookup miss. Assumes non-overlapping ranges (true of
    * GeoIP databases). */
  def enrich(df: DataFrame, ranges: DataFrame, ipCol: String,
      bucketBits: Int = 16): DataFrame = {
    val shift = 32 - bucketBits
    val b = ranges.withColumn("__graft_b",
      explode(sequence(shiftright(col("ip_from"), shift),
        shiftright(col("ip_to"), shift))))
    val probe = df.withColumn("__graft_ipl", ipToLong(col(ipCol)))
      .withColumn("__graft_b", shiftright(col("__graft_ipl"), shift))
    probe.join(broadcast(b),
        probe("__graft_b") === b("__graft_b") &&
          col("__graft_ipl") >= col("ip_from") && col("__graft_ipl") <= col("ip_to"),
        "left")
      .drop("__graft_b", "__graft_ipl", "ip_from", "ip_to")
  }
}

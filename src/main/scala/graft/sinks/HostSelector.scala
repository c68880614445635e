package graft.sinks

/** Weighted round-robin host failover (reference:
  * output/host_selector.go:23-75): every host starts at full weight;
  * a reported failure drops it to 0 for `cooldownMs` (reference: 30 min),
  * after which it is re-enabled. Pure + synchronized: one instance lives
  * per executor inside a foreachPartition writer. */
final class HostSelector(hosts: Seq[String],
    cooldownMs: Long = 30L * 60 * 1000,
    now: () => Long = System.currentTimeMillis,
    startIdx: Int = 0) {
  require(hosts.nonEmpty, "HostSelector needs at least one host")

  private val disabledUntil = scala.collection.mutable.Map[String, Long]()
  // startIdx staggers the first pick: writers build one selector PER
  // PARTITION, and with a fixed -1 start every partition in the cluster
  // opened on hosts(0) — hundreds of writers hammering one node while
  // the rest idled. Seed with the partition id for spread.
  private var idx = math.floorMod(startIdx, hosts.size) - 1

  def select(): Option[String] = synchronized {
    val t = now()
    val live = hosts.filter(h => disabledUntil.getOrElse(h, 0L) <= t)
    if (live.isEmpty) None
    else {
      idx = (idx + 1) % live.size
      Some(live(idx))
    }
  }

  def reportFailure(host: String): Unit = synchronized {
    disabledUntil(host) = now() + cooldownMs
  }

  def reportSuccess(host: String): Unit = synchronized {
    disabledUntil.remove(host): Unit
  }
}

package graft.sources

import java.net.{DatagramPacket, DatagramSocket, InetAddress}

import graft.SparkSpec

class UdpSourceSpec extends SparkSpec {
  import spark.implicits._

  test("udp micro-batch source receives datagrams end-to-end") {
    val port = 30000 + scala.util.Random.nextInt(20000)
    val df = spark.readStream.format("graft-udp").option("port", port).load()
    assert(df.schema.fieldNames.toSeq == Seq("message", "remote_addr", "@timestamp"))
    // bind the listener BEFORE sending — datagrams to an unbound port are
    // silently dropped (the whole point of UDP); listener() acquires a
    // ref, released in the outer finally
    val l = UdpSource.listener(port, 65536)
    val q = df.writeStream.format("memory").queryName("udp_in").start()
    try {
      val sender = new DatagramSocket()
      val addr = InetAddress.getByName("127.0.0.1")
      val deadline = System.currentTimeMillis() + 10000
      while (l.size < 2 && System.currentTimeMillis() < deadline) {
        Seq("hello udp", "second packet").foreach { m =>
          val bytes = m.getBytes("UTF-8")
          sender.send(new DatagramPacket(bytes, bytes.length, addr, port))
        }
        Thread.sleep(100)
      }
      sender.close()
      q.processAllAvailable()
      val rows = spark.sql("select message, remote_addr from udp_in")
        .as[(String, String)].collect().toSet
      assert(rows.map(_._1) == Set("hello udp", "second packet"))
      assert(rows.forall(_._2 == "127.0.0.1"))
    } finally { q.stop(); UdpSource.release(port) }
  }

  test("tcp micro-batch source receives connection lines end-to-end") {
    val port = 30000 + scala.util.Random.nextInt(20000)
    val df = spark.readStream.format("graft-tcp").option("port", port).load()
    assert(df.schema.fieldNames.toSeq == Seq("message", "remote_addr", "@timestamp"))
    val l = TcpSource.listener(port) // bind before the client connects (ref released below)
    val q = df.writeStream.format("memory").queryName("tcp_in").start()
    try {
      val sock = new java.net.Socket("127.0.0.1", port)
      val out = new java.io.PrintWriter(
        new java.io.OutputStreamWriter(sock.getOutputStream, "UTF-8"))
      out.print("hello tcp\nsecond line\n"); out.flush()
      val deadline = System.currentTimeMillis() + 10000
      while (l.size < 2 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      sock.close()
      q.processAllAvailable()
      val rows = spark.sql("select message, remote_addr from tcp_in")
        .as[(String, String)].collect().toSet
      assert(rows.map(_._1) == Set("hello tcp", "second line"))
      assert(rows.forall(_._2 == "127.0.0.1"))
    } finally { q.stop(); TcpSource.release(port) }
  }

  test("BoundedLog.appendBlocking waits for trim instead of dropping (TCP)") {
    val log = new BoundedLog(2)
    log.append("a", "x", 0L); log.append("b", "x", 0L)
    @volatile var appended = false
    val t = new Thread(() => { log.appendBlocking("c", "x", 0L); appended = true })
    t.setDaemon(true); t.start()
    Thread.sleep(200)
    assert(!appended) // full log blocks the reliable-transport writer
    log.trim(1)       // consumer commits → space frees → writer resumes
    t.join(5000)
    assert(appended && log.end == 3)
    assert(log.slice(1, 3).map(_._1).toSeq == Seq("b", "c"))
  }

  test("TCP listener with TWO consumers trims to the min commit — no deadlock") {
    // the r13 single-consumer gate skipped trims entirely with two
    // streams on one port, so appendBlocking waited forever once the
    // buffer filled; per-consumer commits trim to the slowest reader
    val port = 30000 + scala.util.Random.nextInt(20000)
    val (l, c1) = TcpSource.listenerForConsumer(port, maxBuffer = 4)
    val (l2, c2) = TcpSource.listenerForConsumer(port, maxBuffer = 4)
    assert(l eq l2) // one listener per port
    try {
      (0 until 6).foreach(i => l.appendForTest(i.toString, "t", 0L))
      // consumer 1 commits ahead, consumer 2 lags: trim must follow c2
      l.commitAs(c1, 6L)
      assert(l.size == 6L)
      l.commitAs(c2, 3L)
      // entries below min(6, 3) = 3 are gone; slice from 3 still serves
      assert(l.slice(3L, 6L).length == 3)
      // the lagging consumer catches up: trim advances to 6
      l.commitAs(c2, 6L)
      assert(l.slice(0L, 6L).isEmpty)
      // releasing the laggard un-pins future trims
      TcpSource.releaseConsumer(port, c2)
      l.appendForTest("x", "t", 0L)
      l.commitAs(c1, 7L)
      assert(l.slice(0L, 7L).isEmpty)
    } finally TcpSource.releaseConsumer(port, c1)
  }

  test("BoundedLog.rebaseTo fast-forwards a fresh log after restart") {
    val log = new BoundedLog(10)
    log.rebaseTo(500) // checkpointed offset from a previous incarnation
    assert(log.end == 500)
    log.append("post-restart", "x", 0L)
    assert(log.slice(500, 501).map(_._1).toSeq == Seq("post-restart"))
    assert(log.slice(0, 500).isEmpty) // downtime range is gone, not wrong
  }

  test("listener buffer is bounded: overflow drops oldest, commit trims") {
    val l = new UdpSource.Listener(0, 1024, maxBuffer = 4).start()
    val sender = new DatagramSocket()
    try {
      val addr = InetAddress.getByName("127.0.0.1")
      for (i <- 0 until 10) {
        val before = l.size
        val bytes = s"m$i".getBytes("UTF-8")
        val deadline = System.currentTimeMillis() + 5000
        while (l.size == before && System.currentTimeMillis() < deadline) {
          sender.send(new DatagramPacket(bytes, bytes.length, addr, l.boundPort))
          Thread.sleep(10)
        }
      }
      // logical offset counts every datagram; physical buffer holds ≤ 4
      assert(l.size >= 10)
      val held = l.slice(0, l.size)
      assert(held.length <= 4)
      assert(held.last._1.startsWith("m")) // newest survive, oldest dropped
      // committing the consumed range empties the physical buffer but
      // leaves the logical offset monotonic
      val end = l.size
      l.trim(end)
      assert(l.slice(0, end).isEmpty && l.size == end)
    } finally { sender.close(); l.close() }
  }
}

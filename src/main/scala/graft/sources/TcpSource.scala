package graft.sources

import java.net.ServerSocket
import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** TCP line input (reference: input/tcp_input.go) as a DataSource V2
  * MicroBatchStream — replaces Spark's dev-only `socket` source for the
  * reference's TCP listener shape: the driver ACCEPTS connections (the
  * reference listens; Spark's socket source dials out), each connection's
  * lines land in a shared `BoundedLog`, and micro-batches ship [start,
  * end) slices inside their InputPartitions so executors need no network
  * access. Like the UDP twin this is an edge-ingest/dev source: offsets
  * restart from the live buffer on recovery, durability belongs to the
  * downstream sink.
  *
  * Usage: `spark.readStream.format("graft-tcp").option("port", 9999)`.
  * Schema: message STRING, remote_addr STRING, `@timestamp` TIMESTAMP.
  */
class TcpSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-tcp"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    UdpSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TcpTable(properties.getOrDefault("port", "9999").toInt,
      properties.getOrDefault("max_buffer", "65536").toInt)
}

object TcpSource {
  private val listeners = new util.concurrent.ConcurrentHashMap[Int, Listener]()

  // acquire and release both lock the map, and the refcount increment
  // happens INSIDE the lock: if the caller acquired after returning, a
  // concurrent release could drop the count to 0 and close the socket in
  // the gap, handing out a dead listener. Every listener() call must be
  // paired with a release(port).
  // private[sources]: this path does NOT register in the per-consumer
  // committed map, so a registered consumer's commitAs could trim lines
  // an unregistered acquirer has not read yet — all shared-port stream
  // acquisition must go through listenerForConsumer; this remains only
  // as a bind-before-connect test seam.
  private[sources] def listener(port: Int, maxBuffer: Int = 65536): Listener = listeners.synchronized {
    listeners.computeIfAbsent(port, p => new Listener(p, maxBuffer).start()).acquire()
  }

  /** Acquire as a REGISTERED consumer (returns the listener plus a
    * consumer id): commits trim to the MIN committed offset across live
    * consumers, so two streams sharing one port both keep flowing — the
    * old single-consumer gate skipped trims entirely with two readers,
    * and `appendBlocking` then waited forever once the log filled. */
  def listenerForConsumer(port: Int,
      maxBuffer: Int = 65536): (Listener, Long) = listeners.synchronized {
    val l = listeners.computeIfAbsent(port, p => new Listener(p, maxBuffer).start())
    (l, l.acquireConsumer())
  }

  /** Ref-counted release: the listener is shared per port per JVM, so the
    * server socket closes only when the LAST stream consumer stops. */
  private[sources] def release(port: Int): Unit = listeners.synchronized {
    val l = listeners.get(port)
    if (l != null && l.releaseRef() <= 0) {
      listeners.remove(port)
      l.close()
    }
  }

  /** Release a registered consumer: its committed offset leaves the trim
    * minimum (a stopped slow stream must not pin the buffer forever). */
  private[sources] def releaseConsumer(port: Int, id: Long): Unit =
    listeners.synchronized {
      val l = listeners.get(port)
      if (l != null && l.releaseConsumer(id) <= 0) {
        listeners.remove(port)
        l.close()
      }
    }

  /** Accept loop + one reader thread per connection, all daemons; lines
    * append to the shared bounded log with BLOCKING back-pressure (TCP is
    * reliable — a full log must slow the client, not lose its lines). */
  final class Listener(port: Int, maxBuffer: Int) {
    private val log = new BoundedLog(maxBuffer)
    private val refs = new java.util.concurrent.atomic.AtomicInteger(0)
    private val server = new ServerSocket(port)
    val boundPort: Int = server.getLocalPort
    private val acceptThread = new Thread(() => {
      while (!server.isClosed) {
        try {
          val sock = server.accept()
          val addr = sock.getInetAddress.getHostAddress
          val t = new Thread(() => {
            val in = new java.io.BufferedReader(
              new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
            try {
              var line = in.readLine()
              while (line != null) {
                log.appendBlocking(line, addr, System.currentTimeMillis() * 1000L)
                line = in.readLine()
              }
            } catch { case _: Exception => () }
            finally sock.close()
          }, s"graft-tcp-$port-conn")
          t.setDaemon(true)
          t.start()
        } catch {
          // a persistent accept() failure (fd exhaustion) must not spin
          // the accept thread hot; closed-socket exceptions exit the loop
          case _: Exception => if (!server.isClosed) Thread.sleep(100)
        }
      }
    }, s"graft-tcp-$port-accept")
    acceptThread.setDaemon(true)

    def start(): this.type = { acceptThread.start(); this }
    def acquire(): this.type = { refs.incrementAndGet(); this }
    def releaseRef(): Int = refs.decrementAndGet()
    def singleConsumer: Boolean = refs.get() <= 1
    // per-consumer committed offsets: trim advances to the min across
    // live consumers — reliable-transport back-pressure is paced by the
    // SLOWEST consumer, never a deadlock
    private val committed = scala.collection.mutable.Map.empty[Long, Long]
    private val nextConsumerId = new java.util.concurrent.atomic.AtomicLong(0L)
    def acquireConsumer(): Long = committed.synchronized {
      refs.incrementAndGet()
      val id = nextConsumerId.incrementAndGet()
      committed(id) = 0L
      id
    }
    def commitAs(id: Long, upTo: Long): Unit = committed.synchronized {
      committed.get(id).foreach(prev => committed(id) = math.max(prev, upTo))
      if (committed.nonEmpty) log.trim(committed.values.min)
    }
    def releaseConsumer(id: Long): Int = committed.synchronized {
      if (committed.remove(id).isDefined && committed.nonEmpty)
        log.trim(committed.values.min)
      refs.decrementAndGet()
    }
    def size: Long = log.end
    /** Test seam: non-blocking append, so trim-policy specs don't need a
      * live socket (the blocking path has BoundedLog's own spec). */
    private[sources] def appendForTest(msg: String, addr: String,
        tsMicros: Long): Unit = log.append(msg, addr, tsMicros)
    def slice(from: Long, until: Long): Array[(String, String, Long)] =
      log.slice(from, until)
    def trim(upTo: Long): Unit = log.trim(upTo)
    def rebaseTo(offset: Long): Unit = log.rebaseTo(offset)
    def close(): Unit = server.close()
  }
}

final class TcpTable(port: Int, maxBuffer: Int)
    extends Table with SupportsRead {
  override def name(): String = s"tcp:$port"
  override def schema(): StructType = UdpSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = UdpSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new TcpMicroBatchStream(port, maxBuffer)
      }
    }
}

final class TcpMicroBatchStream(port: Int, maxBuffer: Int)
    extends MicroBatchStream {
  // stop() may run without the lazy listener ever initializing (query fails
  // before offsets are read); an unconditional release would then decrement
  // ANOTHER stream's refcount and close the shared listener under it
  @volatile private var acquired = false
  @volatile private var consumerId = 0L
  private lazy val listener = {
    val (l, id) = TcpSource.listenerForConsumer(port, maxBuffer) // registers inside the lock
    consumerId = id
    acquired = true
    l
  }

  override def initialOffset(): Offset = UdpOffset(0L)
  override def latestOffset(): Offset = UdpOffset(listener.size)
  override def deserializeOffset(json: String): Offset = {
    val o = UdpOffset(json.toLong)
    listener.rebaseTo(o.n) // checkpointed restart: fast-forward a fresh log
    o
  }
  override def commit(end: Offset): Unit =
    listener.commitAs(consumerId, end.asInstanceOf[UdpOffset].n)
  override def stop(): Unit =
    if (acquired) TcpSource.releaseConsumer(port, consumerId)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val rows = listener.slice(start.asInstanceOf[UdpOffset].n,
      end.asInstanceOf[UdpOffset].n)
    Array(UdpPartition(rows, addRemote = true))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[UdpPartition]
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < p.rows.length }
        override def get(): InternalRow = {
          val (msg, addr, ts) = p.rows(i)
          InternalRow(UTF8String.fromString(msg), UTF8String.fromString(addr), ts)
        }
        override def close(): Unit = ()
      }
    }
}

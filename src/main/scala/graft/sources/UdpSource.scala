package graft.sources

import java.net.{DatagramPacket, DatagramSocket}
import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** UDP streaming input (reference: input/udp_input.go:32-122) as a
  * DataSource V2 MicroBatchStream — the one reference input with no Spark
  * built-in equivalent.
  *
  * A driver-side daemon thread drains the datagram socket into a bounded
  * in-memory buffer (the reference's 10-slot channel, scaled up); each
  * micro-batch takes the [start, end) slice of that buffer and ships the
  * rows INSIDE the InputPartition, so executors need no socket access.
  * Datagrams are inherently lossy/unordered — like the reference, this is
  * a dev/edge-ingest source, not an exactly-once one; offsets restart
  * from the live buffer on recovery.
  *
  * Usage: `spark.readStream.format("graft-udp").option("port", 9999)`.
  * Schema: message STRING, remote_addr STRING, `@timestamp` TIMESTAMP.
  */
class UdpSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-udp"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    UdpSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new UdpTable(properties.getOrDefault("port", "9999").toInt,
      properties.getOrDefault("max_length", "65536").toInt,
      properties.getOrDefault("add_remote_addr", "true").toBoolean)
}

object UdpSource {
  val schema: StructType = StructType(Seq(
    StructField("message", StringType),
    StructField("remote_addr", StringType),
    StructField("@timestamp", TimestampType)))

  /** One listener per port per JVM; (message, addr, epochMicros) log. */
  private val buffers = new util.concurrent.ConcurrentHashMap[Int, Listener]()

  // acquire and release both lock the map, and the refcount increment
  // happens INSIDE the lock: if the caller acquired after returning, a
  // concurrent release could drop the count to 0 and close the socket in
  // the gap, handing out a dead listener. Every listener() call must be
  // paired with a release(port).
  def listener(port: Int, maxLength: Int, maxBuffer: Int = 65536): Listener =
    buffers.synchronized {
      buffers.computeIfAbsent(port, p => new Listener(p, maxLength, maxBuffer).start())
        .acquire()
    }

  /** Ref-counted release: the listener is shared per port per JVM, so the
    * socket closes only when the LAST stream consumer stops. */
  private[sources] def release(port: Int): Unit = buffers.synchronized {
    val l = buffers.get(port)
    if (l != null && l.releaseRef() <= 0) {
      buffers.remove(port)
      l.close()
    }
  }

  /** Datagram listener over a `BoundedLog` (the reference's bounded
    * channel, input/udp_input.go's 10-slot channel scaled up; UDP is
    * lossy by contract, so overflow drops oldest). */
  final class Listener(port: Int, maxLength: Int, maxBuffer: Int) {
    private val log = new BoundedLog(maxBuffer)
    private val refs = new java.util.concurrent.atomic.AtomicInteger(0)
    private val socket = new DatagramSocket(port)
    val boundPort: Int = socket.getLocalPort
    private val thread = new Thread(() => {
      val packet = new DatagramPacket(new Array[Byte](maxLength), maxLength)
      while (!socket.isClosed) {
        try {
          // receive() SHRINKS packet.length to the datagram's size and
          // truncates every later datagram to it — reset before each
          // receive or one short message clips the listener forever
          packet.setLength(maxLength)
          socket.receive(packet)
          val msg = new String(packet.getData, packet.getOffset, packet.getLength, "UTF-8")
          val addr = packet.getAddress.getHostAddress
          log.append(msg, addr, System.currentTimeMillis() * 1000L)
        } catch { case _: Exception => () }
      }
    }, s"graft-udp-$port")
    thread.setDaemon(true)

    def start(): this.type = { thread.start(); this }
    def acquire(): this.type = { refs.incrementAndGet(); this }
    def releaseRef(): Int = refs.decrementAndGet()
    /** trim-on-commit is only safe when this stream is the sole reader —
      * a second consumer still needs the uncommitted-by-it rows. */
    def singleConsumer: Boolean = refs.get() <= 1
    /** Logical end offset (total datagrams ever appended). */
    def size: Long = log.end
    def slice(from: Long, until: Long): Array[(String, String, Long)] =
      log.slice(from, until)
    /** Drop entries below the committed offset (micro-batch completed). */
    def trim(upTo: Long): Unit = log.trim(upTo)
    def rebaseTo(offset: Long): Unit = log.rebaseTo(offset)
    def close(): Unit = socket.close()
  }
}

final case class UdpOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

final class UdpTable(port: Int, maxLength: Int, addRemote: Boolean)
    extends Table with SupportsRead {
  override def name(): String = s"udp:$port"
  override def schema(): StructType = UdpSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = UdpSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new UdpMicroBatchStream(port, maxLength, addRemote)
      }
    }
}

final class UdpMicroBatchStream(port: Int, maxLength: Int, addRemote: Boolean)
    extends MicroBatchStream {
  // stop() may run without the lazy listener ever initializing (query fails
  // before offsets are read); an unconditional release would then decrement
  // ANOTHER stream's refcount and close the shared listener under it
  @volatile private var acquired = false
  private lazy val listener = {
    val l = UdpSource.listener(port, maxLength) // acquires inside the lock
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
  // consumed rows are physically dropped once the micro-batch commits —
  // with the buffer cap this bounds driver memory for the query lifetime.
  // Skipped when another stream shares the port listener (it still needs
  // the rows this stream has consumed).
  override def commit(end: Offset): Unit =
    if (listener.singleConsumer) listener.trim(end.asInstanceOf[UdpOffset].n)
  override def stop(): Unit = if (acquired) UdpSource.release(port)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val rows = listener.slice(start.asInstanceOf[UdpOffset].n,
      end.asInstanceOf[UdpOffset].n)
    Array(UdpPartition(rows, addRemote))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[UdpPartition]
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < p.rows.length }
        override def get(): InternalRow = {
          val (msg, addr, ts) = p.rows(i)
          InternalRow(UTF8String.fromString(msg),
            if (p.addRemote) UTF8String.fromString(addr) else null,
            ts)
        }
        override def close(): Unit = ()
      }
    }
}

/** Rows ride inside the partition — executors never touch the socket. */
final case class UdpPartition(rows: Array[(String, String, Long)],
    addRemote: Boolean) extends InputPartition

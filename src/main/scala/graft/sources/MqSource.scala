package graft.sources

import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S2 (SURVEY.md §2.1): message-queue source — the "mq" of the project.
  *
  * No MQ connector jar ships in this zero-egress environment, so the
  * broker is embedded in-process: topics hold partitioned, offset-ordered
  * message logs, and the DataSource V2 [[MqMicroBatchStream]] reads them
  * with real offset-range semantics — `initialOffset`/`latestOffset`
  * per-partition offset vectors, replayable `planInputPartitions(start,
  * end)` slices, checkpoint-JSON round-trip — exactly the contract a
  * networked Kafka-class connector implements. Swapping the embedded
  * broker for a remote one changes [[MqBroker]] only; the Spark-facing
  * offset/partition machinery is the part that must be (and is) right.
  *
  * Scale posture: one Spark input partition per MQ partition per batch,
  * so read parallelism equals broker partitioning and follows it on a
  * real cluster; no driver-side buffering of message payloads beyond the
  * embedded broker itself.
  */
object MqBroker {
  final case class Message(partition: Int, offset: Long, key: String, value: String,
                           timestampUs: Long)

  /** Hard cap on retained messages per partition. The embedded broker
    * keeps its whole log on the heap (that is what makes replayable
    * offset-range fetches trivial in-process); this guard makes the
    * retention bound explicit so the test broker can never masquerade as
    * the durable path — a real deployment swaps [[MqBroker]] for a
    * networked broker with disk-backed retention, leaving the Spark-facing
    * offset machinery untouched.
    */
  val MaxRetainedPerPartition: Int = 1 << 22 // 4M messages ≈ a few GB of heap

  private val topics = new ConcurrentHashMap[String, Array[ArrayBuffer[Message]]]()
  // keyless round-robin cursor per topic (totalSize-based placement would
  // race under concurrent writers: read-then-append is not atomic)
  private val rr = new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  def createTopic(topic: String, partitions: Int): Unit = {
    topics.putIfAbsent(topic, Array.fill(partitions)(ArrayBuffer.empty[Message]))
    rr.putIfAbsent(topic, new java.util.concurrent.atomic.AtomicLong(0L))
  }

  def deleteTopic(topic: String): Unit = { topics.remove(topic); rr.remove(topic) }

  private def log(topic: String): Array[ArrayBuffer[Message]] = {
    val l = topics.get(topic)
    require(l != null, s"mq: unknown topic '$topic'")
    l
  }

  /** Append a message; partition chosen by key hash (sticky per key, like
    * a keyed MQ producer), or round-robin-ish via offset when keyless.
    */
  def publish(topic: String, key: String, value: String, timestampUs: Long): Unit = {
    val l = log(topic)
    val p = if (key == null) (rr.get(topic).getAndIncrement() % l.length).toInt
            else math.floorMod(key.hashCode, l.length)
    l(p).synchronized {
      require(l(p).size < MaxRetainedPerPartition,
        s"mq: embedded broker retention cap hit on '$topic' partition $p " +
          s"($MaxRetainedPerPartition messages) — use a durable broker for larger logs")
      l(p) += Message(p, l(p).size.toLong, key, value, timestampUs)
    }
  }

  def numPartitions(topic: String): Int = log(topic).length

  /** Current end offset (exclusive) of every partition. */
  def endOffsets(topic: String): Array[Long] =
    log(topic).map(p => p.synchronized(p.size.toLong))

  def totalSize(topic: String): Long = endOffsets(topic).sum

  /** Replayable range read: offsets [from, until) of one partition. */
  def fetch(topic: String, partition: Int, from: Long, until: Long): Seq[Message] = {
    val p = log(topic)(partition)
    p.synchronized(p.slice(from.toInt, until.toInt).toVector)
  }
}

/** S2d: admission-control allocation + BACKPRESSURE OBSERVABILITY.
  *
  * The allocation itself ([[allocate]]) is the pure largest-remainder
  * proportional split [[MqMicroBatchStream.latestOffset]] applies under
  * `maxOffsetsPerTrigger`; factoring it out makes the policy spec-able
  * in isolation and lets operators reason about it.
  *
  * Observability: every capped batch records its per-partition
  * (backlog, admitted) vector, and [[metricsFrame]] surfaces the
  * history as a DataFrame — (batch_seq, partition, backlog, admitted,
  * deferred) — the admitted-vs-backlog signal an operator watches to
  * size `maxOffsetsPerTrigger` or scale consumers. Driver-side bounded
  * metadata by construction: per topic at most [[MaxEvents]] most
  * recent batch vectors are retained (a long-lived stream drops the
  * oldest), each one partition-count rows — never message payloads.
  */
object MqAdmission {
  /** Retained capped-batch vectors per topic (oldest dropped beyond). */
  val MaxEvents: Int = 1024

  final case class BatchAdmission(seq: Long, backlog: Array[Long],
                                  admitted: Array[Long])

  private val events =
    new ConcurrentHashMap[String, java.util.ArrayDeque[BatchAdmission]]()
  private val seqs = new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  /** Largest-remainder proportional split of `budget` rows across
    * partition backlogs (callers guarantee Σavail > budget ≥ 1): floors
    * of the exact proportional share, topped up by descending remainder
    * (partition index tie-break) so the FULL budget is admitted — a
    * bare floor would round every share to zero whenever the budget is
    * below the backlogged-partition count and collapse throughput.
    * BigInt for the proportional product: backlog × budget can exceed
    * Long at wide-backlog/large-budget extremes.
    */
  def allocate(avail: IndexedSeq[Long], budget: Long): Array[Long] = {
    val total = avail.sum
    val take = avail.map(a => (BigInt(a) * budget / total).toLong).toArray
    var rem = budget - take.sum
    val byRemainder = avail.indices
      .sortBy(p => (-(BigInt(avail(p)) * budget % total), BigInt(p)))
    byRemainder.foreach { p =>
      if (rem > 0 && take(p) < avail(p)) { take(p) += 1; rem -= 1 }
    }
    take
  }

  /** Record one capped batch's allocation (bounded ring per topic). */
  def record(topic: String, backlog: Array[Long], admitted: Array[Long]): Unit = {
    val seq = seqs.computeIfAbsent(topic,
      _ => new java.util.concurrent.atomic.AtomicLong(0L)).getAndIncrement()
    val q = events.computeIfAbsent(topic,
      _ => new java.util.ArrayDeque[BatchAdmission]())
    q.synchronized {
      q.addLast(BatchAdmission(seq, backlog, admitted))
      while (q.size > MaxEvents) q.removeFirst()
    }
  }

  /** The recorded admission history of a topic as a metrics frame:
    * (batch_seq, partition, backlog, admitted, deferred). Empty frame
    * when the topic never ran capped.
    */
  def metricsFrame(spark: org.apache.spark.sql.SparkSession,
                   topic: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val snap = Option(events.get(topic)) match {
      case Some(q) => q.synchronized(q.toArray(Array.empty[BatchAdmission]).toSeq)
      case None    => Seq.empty
    }
    snap.flatMap { e =>
      e.backlog.indices.map(p =>
        (e.seq, p, e.backlog(p), e.admitted(p), e.backlog(p) - e.admitted(p)))
    }.toDF("batch_seq", "partition", "backlog", "admitted", "deferred")
  }

  /** Drop a topic's recorded history (test isolation / topic teardown). */
  def clear(topic: String): Unit = { events.remove(topic); seqs.remove(topic) }
}

object MqSource {
  /** The MQ record shape every Kafka-class connector exposes. */
  val schema: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("key", StringType),
    StructField("value", StringType),
    StructField("timestamp", TimestampType)))

  /** Format string for `spark.readStream.format(...)`. */
  val format: String = classOf[MqDataSource].getName
}

/** `spark.read[Stream].format(classOf[MqDataSource].getName)` entry. */
class MqDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = MqSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val topic = properties.get("topic")
    require(topic != null, "mq source requires .option(\"topic\", ...)")
    new MqTable(topic)
  }
}

class MqTable(topic: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"mq:$topic"
  override def schema(): StructType = MqSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ,
      TableCapability.STREAMING_WRITE, TableCapability.BATCH_WRITE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // Kafka-convention per-trigger admission control (rows ≈ offsets here:
    // one message per offset)
    val maxPerTrigger = Option(options.get("maxOffsetsPerTrigger")).map { v =>
      val n = v.toLong
      require(n > 0, s"maxOffsetsPerTrigger must be positive, got $n " +
        "(omit the option for unlimited)")
      n
    }
    // Column pruning pushed into the reader: a decode query touches only
    // `value` (sometimes key/timestamp); the other per-message fields are
    // then never materialized into Spark rows at all. At ingest scale
    // that is the difference between copying every key+topic string per
    // message and copying none.
    // Offset/partition predicates prune the planned fetch RANGES — the
    // "seek, don't scan" a replayable log offers (a bounded replay of
    // partition 2 from offset 10⁹ must not read the whole topic). The
    // pruning is exact on the broker's own coordinates, but every filter
    // is still reported residual so Spark re-checks rows — pushdown here
    // is purely an IO reduction, never a correctness dependency.
    new ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
      private var required: StructType = MqSource.schema
      private var pushed: Array[Filter] = Array.empty
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        pushed = filters.filter(MqPruning.prunable)
        filters // all residual: re-evaluated above the scan
      }
      override def pushedFilters(): Array[Filter] = pushed
      override def build(): Scan = new MqScan(topic, maxPerTrigger, required, pushed)
    }
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new MqWrite(topic, MqWriterCols.resolve(info.schema()))
    }
}

class MqScan(topic: String, maxPerTrigger: Option[Long] = None,
             required: StructType = MqSource.schema,
             pushed: Array[Filter] = Array.empty) extends Scan {
  override def readSchema(): StructType = required
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MqMicroBatchStream(topic, maxPerTrigger, required)
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val ends = MqBroker.endOffsets(topic)
      ends.indices.flatMap { p =>
        MqPruning.offsetRange(pushed, p, ends(p)).map {
          case (from, until) => MqInputPartition(topic, p, from, until): InputPartition
        }
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new MqReaderFactory(required.fieldNames)
  }
}

/** Maps pushed-down predicates on the broker coordinates (`partition`,
  * `offset`) to fetch-range pruning. Conservative by construction: a
  * shape it does not recognize prunes nothing, and recognized shapes
  * only ever SHRINK the exact range — the filters stay residual above
  * the scan either way.
  */
object MqPruning {
  def prunable(f: Filter): Boolean = f match {
    case EqualTo(a, _)            => a == "partition" || a == "offset"
    case In(a, _)                 => a == "partition"
    case GreaterThan(a, _)        => a == "offset"
    case GreaterThanOrEqual(a, _) => a == "offset"
    case LessThan(a, _)           => a == "offset"
    case LessThanOrEqual(a, _)    => a == "offset"
    case _                        => false
  }

  private def asLong(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue)
    case _ => None
  }

  /** Fetch range for one broker partition under the pushed conjuncts:
    * None = the partition is pruned entirely; Some((from, until)) is the
    * narrowed half-open range.
    */
  def offsetRange(pushed: Array[Filter], partition: Int,
                  end: Long): Option[(Long, Long)] = {
    var from = 0L
    var until = end
    var keep = true
    pushed.foreach {
      case EqualTo("partition", v) =>
        keep &&= asLong(v).forall(_ == partition.toLong)
      case In("partition", vs) =>
        keep &&= vs.exists(v => asLong(v).contains(partition.toLong))
      case EqualTo("offset", v) => asLong(v).foreach { o =>
        from = math.max(from, o); until = math.min(until, o + 1)
      }
      case GreaterThan("offset", v)        => asLong(v).foreach(o => from = math.max(from, o + 1))
      case GreaterThanOrEqual("offset", v) => asLong(v).foreach(o => from = math.max(from, o))
      case LessThan("offset", v)           => asLong(v).foreach(o => until = math.min(until, o))
      case LessThanOrEqual("offset", v)    => asLong(v).foreach(o => until = math.min(until, o + 1))
      case _ => ()
    }
    if (keep && from < until) Some((from, until)) else None
  }
}

/** Offset = vector of per-partition end offsets, JSON `[o0,o1,...]`.
  * Equality MUST be by content: the engine compares committed vs available
  * offsets to decide whether a new micro-batch is needed — the synthesized
  * case-class equals would compare the Array by reference and make every
  * fresh latestOffset() look like new data (empty batches forever on an
  * idle topic).
  */
case class MqOffset(ends: Array[Long]) extends Offset {
  override def json(): String = ends.mkString("[", ",", "]")
  override def equals(o: Any): Boolean = o match {
    case x: Offset => json() == x.json()
    case _ => false
  }
  override def hashCode(): Int = json().hashCode
}
object MqOffset {
  def parse(json: String): MqOffset =
    MqOffset(json.trim.stripPrefix("[").stripSuffix("]").split(",").map(_.trim.toLong))
}

class MqMicroBatchStream(topic: String, maxPerTrigger: Option[Long] = None,
                         required: StructType = MqSource.schema)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  // End offsets captured at query start for Trigger.AvailableNow, so the
  // run processes exactly the data present at start and then terminates.
  @volatile private var availableNowEnd: Option[MqOffset] = None

  override def initialOffset(): Offset =
    MqOffset(Array.fill(MqBroker.numPartitions(topic))(0L))

  override def latestOffset(): Offset =
    availableNowEnd.getOrElse(MqOffset(MqBroker.endOffsets(topic)))

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(MqOffset(MqBroker.endOffsets(topic)))

  override def reportLatestOffset(): Offset = MqOffset(MqBroker.endOffsets(topic))

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  /** Admission control: cap each micro-batch at the requested row budget,
    * allocated across partitions proportionally to their backlog — the
    * same posture as the Kafka source's maxOffsetsPerTrigger. Under
    * Trigger.AvailableNow the cap still applies per batch; the engine
    * keeps issuing batches until the prepared end is reached. The split
    * itself is [[MqAdmission.allocate]] (largest-remainder top-up so the
    * full budget is always admitted); every capped-mode batch also
    * records its (backlog, admitted) vector into [[MqAdmission]] so
    * operators can read the backpressure signal as a metrics frame.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val hard = availableNowEnd.getOrElse(MqOffset(MqBroker.endOffsets(topic))).ends
    // A CompositeReadLimit (e.g. once a min-rows/min-trigger option is
    // composed in by the engine) must still honour its ReadMaxRows
    // component — matching only the bare class would silently disable
    // admission control (the Kafka source extracts the same way).
    val maxRows: Option[Long] = limit match {
      case rows: ReadMaxRows      => Some(rows.maxRows)
      case c: CompositeReadLimit  =>
        c.getReadLimits.collectFirst { case rows: ReadMaxRows => rows.maxRows }
      case _: ReadLimit           => None // allAvailable and min-only limits: no cap
    }
    maxRows match {
      case Some(budget) =>
        val s = start.asInstanceOf[MqOffset].ends
        val avail = hard.indices.map(p => hard(p) - s(p))
        val total = avail.sum
        if (total <= budget) {
          // uncapped drain: still observable (admitted == backlog)
          if (total > 0)
            MqAdmission.record(topic, avail.toArray, avail.toArray)
          MqOffset(hard)
        } else {
          val take = MqAdmission.allocate(avail, budget)
          MqAdmission.record(topic, avail.toArray, take.clone())
          MqOffset(s.indices.map(p => s(p) + take(p)).toArray)
        }
      case None => MqOffset(hard)
    }
  }

  override def deserializeOffset(json: String): Offset = MqOffset.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[MqOffset].ends
    val e = end.asInstanceOf[MqOffset].ends
    e.indices.collect {
      case p if e(p) > s(p) => MqInputPartition(topic, p, s(p), e(p)): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MqReaderFactory(required.fieldNames)

  override def commit(end: Offset): Unit = () // broker log is replayable; nothing to ack
  override def stop(): Unit = ()
}

case class MqInputPartition(topic: String, partition: Int, from: Long, until: Long)
    extends InputPartition

/** S5b: MQ write-back — publish query results to a broker topic, the other
  * half of the namesake MQ-app story (consume topic A → transform → produce
  * topic B). Input frames follow the Kafka-producer column convention:
  * required `value` STRING, optional `key` STRING (keyed partition routing),
  * optional `timestamp` TIMESTAMP (defaults to 0 when absent — the broker
  * stores whatever the row says, keeping replays byte-identical).
  *
  * Delivery semantics: each task publishes as it writes, so a retried task
  * can re-publish rows — at-least-once, exactly like the Kafka sink;
  * downstream consumers dedup by key within a watermark (T5) when they need
  * effective exactly-once. Scale posture: publishing happens per-partition
  * on executors (here: same JVM), with no driver-side buffering and no
  * coordination beyond Spark's task commit.
  */
object MqWriterCols {
  final case class Cols(key: Int, value: Int, ts: Int)

  def resolve(schema: StructType): Cols = {
    // case-insensitive name match must be UNIQUE: two case-variants of
    // 'value' silently routing to the first would publish the wrong column
    def idx(name: String): Int = {
      val hits = schema.fieldNames.zipWithIndex.filter(_._1.equalsIgnoreCase(name))
      require(hits.length <= 1,
        s"mq sink: ambiguous column '$name' (matches ${hits.map(_._1).mkString(", ")})")
      hits.headOption.map(_._2).getOrElse(-1)
    }
    def typed(i: Int, want: Set[DataType], name: String): Int = {
      require(i < 0 || want.contains(schema(i).dataType),
        s"mq sink: column '$name' must be one of ${want.mkString("/")}, got ${schema(i).dataType}")
      i
    }
    val v = idx("value")
    require(v >= 0, s"mq sink requires a 'value' column; input has ${schema.fieldNames.mkString(", ")}")
    Cols(
      typed(idx("key"), Set(StringType), "key"),
      typed(v, Set(StringType), "value"),
      // NTZ carries the same long-micros internal representation, so the
      // writer's getLong path serves both timestamp flavors
      typed(idx("timestamp"), Set(TimestampType, TimestampNTZType), "timestamp"))
  }
}

/** One Write serving both the batch and streaming paths (same row protocol,
  * same writers; only the epoch bookkeeping differs and the broker log is
  * append-only either way).
  */
class MqWrite(topic: String, cols: MqWriterCols.Cols) extends Write {
  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
      val f = new MqWriterFactory(topic, cols)
      (partitionId: Int, _: Long) => f.create(partitionId)
    }
    override def commit(messages: Array[WriterCommitMessage]): Unit = ()
    override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  }
  override def toStreaming: StreamingWrite = new StreamingWrite {
    override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory = {
      val f = new MqWriterFactory(topic, cols)
      (partitionId: Int, _: Long, _: Long) => f.create(partitionId)
    }
    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  }
}

class MqWriterFactory(topic: String, cols: MqWriterCols.Cols) extends Serializable {
  def create(partitionId: Int): DataWriter[InternalRow] = new DataWriter[InternalRow] {
    override def write(row: InternalRow): Unit = {
      val key =
        if (cols.key >= 0 && !row.isNullAt(cols.key)) row.getUTF8String(cols.key).toString
        else null
      val value = if (row.isNullAt(cols.value)) null else row.getUTF8String(cols.value).toString
      val ts = if (cols.ts >= 0 && !row.isNullAt(cols.ts)) row.getLong(cols.ts) else 0L
      MqBroker.publish(topic, key, value, ts)
    }
    override def commit(): WriterCommitMessage = MqCommitMessage
    override def abort(): Unit = ()
    override def close(): Unit = ()
  }
}

case object MqCommitMessage extends WriterCommitMessage

/** Emits rows shaped exactly as the scan's (possibly pruned) readSchema:
  * one extractor per surviving field, resolved once per reader, so an
  * unrequested column is never converted or copied.
  */
class MqReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[MqInputPartition]
    val topicU = UTF8String.fromString(p.topic)
    val extractors: Array[MqBroker.Message => Any] = fields.map {
      case "topic"     => (_: MqBroker.Message) => topicU
      case "partition" => (m: MqBroker.Message) => m.partition
      case "offset"    => (m: MqBroker.Message) => m.offset
      case "key"       => (m: MqBroker.Message) => UTF8String.fromString(m.key)
      case "value"     => (m: MqBroker.Message) => UTF8String.fromString(m.value)
      case "timestamp" => (m: MqBroker.Message) => m.timestampUs
      case f => throw new IllegalArgumentException(s"unknown mq column: $f")
    }
    new PartitionReader[InternalRow] {
      // local[*]: same JVM as the broker. A networked broker would fetch
      // over the wire here; the offset-range contract is identical.
      private val it = MqBroker.fetch(p.topic, p.partition, p.from, p.until).iterator
      private var cur: MqBroker.Message = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = InternalRow.fromSeq(
        extractors.map(_(cur)).toIndexedSeq)
      override def close(): Unit = ()
    }
  }
}

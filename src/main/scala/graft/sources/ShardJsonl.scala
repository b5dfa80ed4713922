package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The session's Hadoop configuration, captured ONCE on the driver at
  * planning time and shipped to tasks (readers/writers must not build a
  * vanilla `new Configuration()` — that discards every `spark.hadoop.*`
  * setting: s3a credentials, fs.defaultFS, kerberos). Serialization is
  * the Writable round trip. */
final class SerializableHadoopConf(@transient var conf: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}

/** `graft-jsonl` — a DataSource V2 connector for the sharded-JSONL
  * training layout ([[Sinks.jsonlShards]] writes it): a directory of
  * `shard_id=K/` subdirectories, each holding text files with one JSON
  * object per line. This is the engine's external-connector surface —
  * the S5 row of the coverage inventory (the reference ships a
  * Cassandra connector; with no external service in this environment,
  * the honest analog is the full V2 contract against a real on-disk
  * format): TableProvider → Table → ScanBuilder with BOTH pushdown
  * mix-ins → Batch planning → per-file PartitionReader, plus the write
  * and micro-batch streaming faces.
  *
  * What makes it scale-shaped rather than a toy:
  *  - **Shard pruning** ([[SupportsPushDownFilters]]): `shard_id`
  *    conjuncts (=, IN, <, <=, >, >=) are consumed at PLANNING time —
  *    pruned shard directories are never listed into partitions, so a
  *    loader asking for shard 7 of a million-shard corpus opens one
  *    directory. Consumed filters are reported as pushed and NOT
  *    re-evaluated by Spark; anything else is left to Spark's post-scan
  *    filter (visible in `.explain` as the residual Filter node).
  *  - **Column pruning** ([[SupportsPushDownRequiredColumns]]): readers
  *    parse ONLY the projected fields from each JSON line; `shard_id`
  *    itself is restored from the directory name, never parsed.
  *  - **One InputPartition per data file** — the layout writer produces
  *    one ordered file per shard, so shard reads are sequential and
  *    task count tracks the pruned shard set.
  *
  * Schema: pass one explicitly (`spark.read.format("graft-jsonl")
  * .schema(...)`) — the deterministic 100 TB path — or let
  * [[ShardJsonl.inferSchema]] sample the first line of the first file
  * (long/double/boolean/string fields; `shard_id` is always LONG).
  * Registered via META-INF/services as `graft-jsonl`. */
class ShardJsonlSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-jsonl"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ShardJsonl.inferSchema(ShardJsonl.pathOf(options.asCaseSensitiveMap()))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new ShardJsonlTable(ShardJsonl.pathOf(properties), schema)
}

class ShardJsonlTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  tableSchema.fields.find(_.name == "shard_id").foreach(f =>
    require(f.dataType == LongType,
      s"graft-jsonl: shard_id must be LONG, got ${f.dataType.sql}"))

  override def name(): String = s"graft-jsonl `$path`"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ShardJsonlScanBuilder(path, tableSchema)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new ShardJsonlWriteBuilder(path, info.schema())
}

class ShardJsonlScanBuilder(path: String, tableSchema: StructType)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition(ShardJsonl.isShardFilter)
    pushed = accepted
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new ShardJsonlScan(path, required, pushed)
}

class ShardJsonlScan(path: String, required: StructType,
                     pushed: Array[Filter]) extends Scan with Batch {
  // the session Hadoop conf, captured at planning on the driver
  private val sConf = new SerializableHadoopConf(ShardJsonl.hadoopConf())
  // listed ONCE at planning, after shard pruning — a pruned shard's
  // directory never reaches the partition list
  private lazy val shardFiles: Seq[(Long, String)] =
    ShardJsonl.listShardFiles(path, pushed, sConf.conf)

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ShardJsonlMicroBatchStream(path, required, pushed, sConf)
  override def description(): String = {
    val shards = shardFiles.map(_._1).distinct.sorted
    s"graft-jsonl path=$path shards=[${shards.mkString(",")}] " +
      s"files=${shardFiles.size} pushed=[${pushed.mkString(",")}] " +
      s"columns=[${required.fieldNames.mkString(",")}]"
  }
  override def planInputPartitions(): Array[InputPartition] =
    shardFiles.map { case (sid, f) => ShardJsonlPartition(sid, f) }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ShardJsonlReaderFactory(required, sConf)
}

final case class ShardJsonlPartition(shardId: Long, file: String)
    extends InputPartition

/** Offset for the streaming face: the SET of data files seen, as a
  * sorted JSON array. Shard files are immutable once written (the
  * layout writers append new files, never rewrite), so set difference
  * between two offsets is exactly the new micro-batch's files — no
  * ordering assumption on file NAMES, which arrive non-monotonically
  * (a late `shard_id=0/part-7` sorts before everything in shard 1).
  * At production scale a compacted seen-file log (the FileStreamSource
  * discipline) replaces the in-offset list; the contract is the same. */
final case class ShardJsonlOffset(files: Seq[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = {
    val arr = new ObjectMapper().createArrayNode()
    files.foreach(arr.add)
    arr.toString
  }
}

/** Structured-Streaming face of the connector: each trigger's
  * micro-batch is the set of data files that appeared since the last
  * offset (shard pruning applies to streams too — pruned shard
  * directories are never listed). Use it to TAIL a growing training
  * layout: a crawl pipeline appends shards with
  * [[Sinks.jsonlShards]]`(mode = "append")` or the V2 writer, and a
  * downstream curation/manifest stream consumes them continuously. */
class ShardJsonlMicroBatchStream(path: String, required: StructType,
                                 pushed: Array[Filter],
                                 sConf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  override def initialOffset(): Offset = ShardJsonlOffset(Nil)

  override def latestOffset(): Offset =
    ShardJsonlOffset(
      ShardJsonl.listShardFiles(path, pushed, sConf.conf).map(_._2).sorted)

  override def deserializeOffset(json: String): Offset = {
    val node = new ObjectMapper().readTree(json)
    val b = Seq.newBuilder[String]
    node.elements().forEachRemaining(e => b += e.asText())
    ShardJsonlOffset(b.result())
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    // the batch is derived from the OFFSET DELTA alone — never from a
    // second directory listing: a re-list that races an
    // eventually-consistent store (or a concurrent truncate) could drop
    // a file that the committed end-offset already claims as seen,
    // losing its rows from the stream forever. The shard id is parsed
    // from the path the offset carries.
    val seen = start.asInstanceOf[ShardJsonlOffset].files.toSet
    end.asInstanceOf[ShardJsonlOffset].files
      .filterNot(seen.contains)
      .flatMap(f => ShardJsonl.shardOfPath(f).map(sid => ShardJsonlPartition(sid, f)))
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ShardJsonlReaderFactory(required, sConf)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class ShardJsonlReaderFactory(required: StructType,
                              sConf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ShardJsonlReader(p.asInstanceOf[ShardJsonlPartition], required,
      sConf.conf)
}

class ShardJsonlReader(p: ShardJsonlPartition, required: StructType,
                       conf: Configuration)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val hPath = new Path(p.file)
  private val in = new BufferedReader(new InputStreamReader(
    hPath.getFileSystem(conf).open(hPath), StandardCharsets.UTF_8))
  private var row: InternalRow = _

  @annotation.tailrec
  final override def next(): Boolean = {
    val line = in.readLine()
    if (line == null) false
    else if (line.isEmpty) next()
    else { row = parse(line); true }
  }

  private def parse(line: String): InternalRow = {
    val node = mapper.readTree(line)
    val vals: Array[Any] = required.fields.map { f =>
      if (f.name == "shard_id") p.shardId
      else {
        val v = node.get(f.name)
        if (v == null || v.isNull) null
        else f.dataType match {
          case LongType => v.asLong()
          case IntegerType => v.asInt()
          case DoubleType => v.asDouble()
          case BooleanType => v.asBoolean()
          case StringType => UTF8String.fromString(v.asText())
          case t => throw new IllegalArgumentException(
            s"graft-jsonl: unsupported type ${t.sql} for field '${f.name}'")
        }
      }
    }
    new GenericInternalRow(vals)
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

/** The write side of the V2 contract. The Write declares
  * [[org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering]] —
  * clustered by `shard_id`, ordered by `(shard_id, pos_in_shard)` — so
  * Spark INSERTS the exchange and sort the layout needs: a caller can
  * `df.write.format("graft-jsonl").save(dir)` an unsorted frame and
  * still get one ordered file per shard (each shard hashes wholly into
  * one task; within a task the sort makes shards contiguous runs, and
  * the writer rolls to a new file on each shard boundary). This is the
  * declarative V2 form of what [[Sinks.jsonlShards]] does by hand with
  * repartition + sortWithinPartitions. `mode("overwrite")` truncates
  * the existing shard directories (driver-side, before tasks launch).
  *
  * Commit protocol: tasks write HIDDEN temp files
  * (`.part-<p>-<t>-<writeId>.jsonl.tmp` — readers skip dotfiles by
  * contract), and the driver RENAMES them to their final names only in
  * `BatchWrite.commit` — so a crashed executor's partial file is never
  * visible to a reader, and a task retry cannot collide (the attempt's
  * temp is simply never renamed; leftover temps stay hidden). Final
  * names carry a per-write id, so APPENDS from different application
  * runs cannot clobber an earlier run's files — the immutability the
  * streaming offset contract depends on. */
class ShardJsonlWriteBuilder(path: String, writeSchema: StructType)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  require(writeSchema.fieldNames.contains("shard_id"),
    "graft-jsonl write needs a shard_id column (run Packing.shuffleShards first)")
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new ShardJsonlWrite(path, writeSchema, doTruncate)
}

class ShardJsonlWrite(path: String, writeSchema: StructType, truncate: Boolean)
    extends org.apache.spark.sql.connector.write.Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
  import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}

  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution =
    org.apache.spark.sql.connector.distributions.Distributions.clustered(
      Array(Expressions.identity("shard_id")))

  // strict, not best-effort: with the default the planner may accept an
  // input partitioning that splits one shard across tasks (measured:
  // writing a shuffleShards frame directly produced two files for one
  // shard) — the one-ordered-file-per-shard contract requires the
  // exchange whenever clustering isn't already exact
  override def distributionStrictlyRequired(): Boolean = true

  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    val keys = Seq("shard_id") ++
      (if (writeSchema.fieldNames.contains("pos_in_shard")) Seq("pos_in_shard")
       else Nil)
    keys.map(k =>
      Expressions.sort(Expressions.column(k), SortDirection.ASCENDING)).toArray
  }

  override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
    new ShardJsonlBatchWrite(path, writeSchema, truncate)
}

/** (temp, final) path pairs of one committed task attempt. */
final case class ShardJsonlCommit(files: Seq[(String, String)])
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

class ShardJsonlBatchWrite(path: String, writeSchema: StructType,
                           truncate: Boolean)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  // one id per write job: final filenames carry it, so appends from
  // different runs (same partition/task ids) can never collide
  // (sources-visible so the zombie-sweep contract is spec-testable)
  private[sources] val writeId = java.util.UUID.randomUUID().toString.take(8)
  private val sConf = new SerializableHadoopConf(ShardJsonl.hadoopConf())
  // truncate mode: the files the PREVIOUS layout owned, recorded at
  // factory creation and deleted only in commit() AFTER every rename
  // succeeded — a failed job leaves the prior layout fully intact
  // (the r10 cut deleted them up front, destroying the old layout
  // before any task had written a byte)
  private var priorFiles: Seq[Path] = Nil
  // ... and ALL prior shard_id= dirs, files or not: an already-empty
  // prior dir contributes no priorFiles, so without this it would dodge
  // the empty-dir cleanup and survive the overwrite as a stale
  // zero-row shard
  private var priorDirs: Seq[Path] = Nil

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory = {
    // truncate: COLLECT, don't delete — deletion is deferred to commit
    if (truncate) {
      val rootPath = new Path(path)
      val fs = rootPath.getFileSystem(sConf.conf)
      if (fs.exists(rootPath)) {
        priorDirs = fs.listStatus(rootPath).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("shard_id="))
          .map(_.getPath)
        priorFiles = priorDirs.flatMap(d => fs.listStatus(d).toSeq.map(_.getPath))
      }
    }
    new ShardJsonlWriterFactory(path, writeSchema, writeId, sConf)
  }

  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val rootPath = new Path(path)
    val fs = rootPath.getFileSystem(sConf.conf)
    // publish: rename every committed attempt's hidden temps to their
    // final names — only now do the files become visible to readers.
    // A rename failing PARTWAY must not leave a half-published layout
    // next to the intact prior one: roll the already-renamed files back
    // to their hidden temps (best-effort — a rollback rename that also
    // fails is logged and left for the writeId-scoped sweep of a later
    // overwrite), then rethrow so abort() cleans the temps.
    val commits = messages.collect { case c: ShardJsonlCommit => c }
    val renamed = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    commits.foreach { c =>
      c.files.foreach { case (tmp, fin) =>
        if (!fs.rename(new Path(tmp), new Path(fin))) {
          renamed.reverseIterator.foreach { case (t, f) =>
            if (!fs.rename(new Path(f), new Path(t)))
              org.slf4j.LoggerFactory.getLogger(getClass).warn(
                s"graft-jsonl: rollback rename failed, orphan published file: $f")
          }
          throw new java.io.IOException(
            s"graft-jsonl: commit rename failed: $tmp -> $fin")
        }
        renamed += ((tmp, fin))
      }
    }
    // truncate: retire the prior layout only now that the new one is
    // fully published. Not isolated from CONCURRENT readers (they can
    // see both layouts between rename and delete — documented), but
    // atomic against job failure: abort never reaches this point.
    priorFiles.foreach(p => fs.delete(p, false))
    // sweep zombie temps of THIS write: a failed/zombie task attempt
    // whose abort never ran leaves hidden `.part-*-<writeId>.jsonl.tmp`
    // files; committed attempts cover the same partitions, so the dirs
    // the commit messages touched are where zombies can hide. The
    // writeId scoping makes the sweep safe against concurrent writers.
    val touchedDirs =
      (commits.flatMap(_.files.map { case (_, fin) => new Path(fin).getParent }) ++
        priorDirs).distinct
    touchedDirs.foreach { d =>
      if (fs.exists(d)) {
        fs.listStatus(d).foreach { s =>
          val n = s.getPath.getName
          if (n.startsWith(".") && n.endsWith(s"-$writeId.jsonl.tmp"))
            fs.delete(s.getPath, false)
        }
        // a truncated shard dir that received no new files would read as
        // an empty (zero-row) shard — drop it with the old layout
        // (recursive: ChecksumFileSystem hides .crc sidecars from
        // listStatus but they still block a non-recursive delete)
        if (fs.listStatus(d).isEmpty) fs.delete(d, true)
      }
    }
    fs.create(new Path(rootPath, "_SUCCESS"), true).close()
  }

  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(sConf.conf)
    messages.foreach {
      case ShardJsonlCommit(files) =>
        files.foreach { case (tmp, _) => fs.delete(new Path(tmp), false) }
      case _ =>
    }
  }
}

class ShardJsonlWriterFactory(path: String, writeSchema: StructType,
                              writeId: String, sConf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new ShardJsonlWriter(path, writeSchema, writeId, partitionId, taskId,
      sConf.conf)
}

/** Per-task writer: rows arrive sorted by (shard_id, pos_in_shard) — the
  * Write's required ordering — so at most ONE output stream is open at a
  * time; each shard boundary rolls to a fresh hidden temp file (the
  * commit protocol on [[ShardJsonlWriteBuilder]]). Fields other than
  * shard_id serialize as one JSON object per line (null fields omitted,
  * matching `to_json` in [[Sinks.jsonlShards]]); a NULL shard_id is an
  * error, not a silent shard 0. */
class ShardJsonlWriter(path: String, writeSchema: StructType, writeId: String,
                       partitionId: Int, taskId: Long, conf: Configuration)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  private val mapper = new ObjectMapper()
  private val fs = new Path(path).getFileSystem(conf)
  private val shardIdx = writeSchema.fieldIndex("shard_id")
  private val dataFields = writeSchema.fields.zipWithIndex
    .filter(_._1.name != "shard_id")
  private var currentShard: Long = Long.MinValue
  private var out: java.io.BufferedWriter = _
  // (temp, final) per opened file
  private val written = scala.collection.mutable.ArrayBuffer.empty[(String, String)]

  override def write(row: InternalRow): Unit = {
    if (row.isNullAt(shardIdx))
      throw new IllegalArgumentException(
        "graft-jsonl: NULL shard_id — layout rows must carry a shard " +
          "(run Packing.shuffleShards first)")
    val sid = row.getLong(shardIdx)
    if (sid != currentShard || out == null) {
      if (out != null) out.close()
      val base = s"part-$partitionId-$taskId-$writeId.jsonl"
      val tmp = new Path(path, s"shard_id=$sid/.$base.tmp")
      val fin = new Path(path, s"shard_id=$sid/$base")
      out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        fs.create(tmp, true), StandardCharsets.UTF_8))
      written += ((tmp.toString, fin.toString))
      currentShard = sid
    }
    val obj = new java.util.LinkedHashMap[String, Any]()
    dataFields.foreach { case (f, i) =>
      if (!row.isNullAt(i)) {
        val v: Any = f.dataType match {
          case LongType => row.getLong(i)
          case IntegerType => row.getInt(i)
          case DoubleType => row.getDouble(i)
          case BooleanType => row.getBoolean(i)
          case StringType => row.getUTF8String(i).toString
          case t => throw new IllegalArgumentException(
            s"graft-jsonl: unsupported type ${t.sql} for field '${f.name}'")
        }
        obj.put(f.name, v)
      }
    }
    out.write(mapper.writeValueAsString(obj))
    out.write("\n")
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    if (out != null) out.close()
    ShardJsonlCommit(written.toSeq)
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    written.foreach { case (tmp, _) => fs.delete(new Path(tmp), false) }
  }

  override def close(): Unit = if (out != null) { out.close(); out = null }
}

object ShardJsonl {
  /** Driver-side session Hadoop conf (falls back to a plain
    * Configuration only when no session is active — test harnesses). */
  private[sources] def hadoopConf(): Configuration =
    try org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    catch { case _: Throwable => new Configuration() }

  private[sources] def pathOf(props: java.util.Map[String, String]): String = {
    val p = props.get("path")
    require(p != null && p.nonEmpty, "graft-jsonl requires a path: .load(dir)")
    p
  }

  /** `shard_id` conjuncts the scan consumes at planning time.
    * IsNotNull is consumed too: the id comes from the directory name,
    * so it is never null — leaving it residual would put a vacuous
    * Filter node above every pruned scan. A filter carrying a NULL
    * comparison value is NOT consumed (left residual — Spark's null
    * semantics apply there; consuming it would NPE the planner). */
  def isShardFilter(f: Filter): Boolean = f match {
    case EqualTo("shard_id", v) => v != null
    case In("shard_id", vs) => vs != null && vs.forall(_ != null)
    case GreaterThan("shard_id", v) => v != null
    case GreaterThanOrEqual("shard_id", v) => v != null
    case LessThan("shard_id", v) => v != null
    case LessThanOrEqual("shard_id", v) => v != null
    case IsNotNull("shard_id") => true
    case _ => false
  }

  private def toL(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case other => other.toString.toLong
  }

  private def accepts(sid: Long, f: Filter): Boolean = f match {
    case EqualTo(_, v) => sid == toL(v)
    case In(_, vs) => vs.exists(v => sid == toL(v))
    case GreaterThan(_, v) => sid > toL(v)
    case GreaterThanOrEqual(_, v) => sid >= toL(v)
    case LessThan(_, v) => sid < toL(v)
    case LessThanOrEqual(_, v) => sid <= toL(v)
    case _ => true
  }

  /** The shard id encoded in a data file's path, if any. */
  private[sources] def shardOfPath(file: String): Option[Long] =
    file.split('/').reverseIterator
      .collectFirst { case seg if seg.startsWith("shard_id=") =>
        seg.stripPrefix("shard_id=")
      }
      .flatMap(_.toLongOption)

  /** List `(shard_id, file)` pairs under `root`, pruning shard
    * directories that fail the pushed filters BEFORE listing their
    * contents. Hidden/metadata entries (`_SUCCESS`, dotfiles — which
    * include the write protocol's uncommitted temps) are skipped, and
    * so are directories whose suffix is not a LONG (a
    * `__HIVE_DEFAULT_PARTITION__` from a null-keyed writer must not
    * crash every subsequent read of the layout). */
  def listShardFiles(root: String, pushed: Array[Filter],
                     conf: Configuration = null): Seq[(Long, String)] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(
      if (conf != null) conf else hadoopConf())
    require(fs.exists(rootPath), s"graft-jsonl: no such directory: $root")
    fs.listStatus(rootPath).toSeq
      .filter(_.isDirectory)
      .flatMap { d =>
        val name = d.getPath.getName
        if (!name.startsWith("shard_id=")) Nil
        else name.stripPrefix("shard_id=").toLongOption match {
          case None => Nil
          case Some(sid) =>
            if (!pushed.forall(accepts(sid, _))) Nil
            else fs.listStatus(d.getPath).toSeq
              .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
                !s.getPath.getName.startsWith("."))
              .map(s => (sid, s.getPath.toString))
        }
      }
      .sortBy(identity)
  }

  /** Sample the first JSON line of the first data file: integral →
    * LONG, fractional → DOUBLE, boolean → BOOLEAN, else STRING;
    * `shard_id` appended as LONG (it lives in the directory name). */
  def inferSchema(root: String): StructType = {
    val conf = hadoopConf()
    val files = listShardFiles(root, Array.empty, conf)
    require(files.nonEmpty, s"graft-jsonl: no shard data files under $root")
    val hPath = new Path(files.head._2)
    val in = new BufferedReader(new InputStreamReader(
      hPath.getFileSystem(conf).open(hPath), StandardCharsets.UTF_8))
    val line = try in.readLine() finally in.close()
    require(line != null && line.nonEmpty,
      s"graft-jsonl: first file is empty, pass an explicit schema: ${files.head._2}")
    val node = new ObjectMapper().readTree(line)
    val fields = scala.collection.mutable.ArrayBuffer.empty[StructField]
    node.fields().forEachRemaining { e =>
      val t = e.getValue match {
        case v if v.isIntegralNumber => LongType
        case v if v.isFloatingPointNumber => DoubleType
        case v if v.isBoolean => BooleanType
        case _ => StringType
      }
      fields += StructField(e.getKey, t)
    }
    StructType(fields.toSeq :+ StructField("shard_id", LongType))
  }
}

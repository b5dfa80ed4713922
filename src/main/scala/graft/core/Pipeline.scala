package graft.core

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.util.control.NonFatal

/** Element-level error channel mirroring the reference's
  * `handleError` / `recover` ops (SURVEY §2.2 P6; CITE:
  * kernel/src/main/scala/trembita/DataPipelineT.scala, recalled path —
  * /root/reference empty). A failed element becomes a row, not a job abort —
  * at 100 TB one poison row must never kill a 1000-executor stage.
  */
final case class Attempt[B](ok: Option[B], err: Option[String]) {
  def isOk: Boolean = ok.isDefined
  /** Exception class alone — deterministic even when HotSpot's fast-throw
    * optimization replaces a hot exception with a message-less instance. */
  def errClass: Option[String] = err.map(_.takeWhile(_ != ':'))
}

object Attempt {
  def apply[A, B](a: A)(f: A => B): Attempt[B] =
    try Attempt(Some(f(a)), None)
    catch {
      case NonFatal(e) =>
        Attempt(None, Some(
          e.getClass.getName + Option(e.getMessage).fold("")(m => s": $m")))
    }
}

/** Typed fluent facade over `Dataset[A]` reproducing the reference's
  * kernel operator surface (SURVEY §2.1–2.5). trembita models a pipeline as
  * `DataPipelineT[F, A, E]` — an effect type, an element type, and an
  * execution environment (CITE: kernel/src/main/scala/trembita/
  * DataPipelineT.scala + Environment.scala, recalled paths). Here:
  *   - the environment phantom type collapses into Spark itself (one
  *     distributed engine instead of Sequential/Parallel/Akka/Spark),
  *   - laziness comes from Catalyst (`LogicalPlan` is the pipeline AST),
  *   - `F[_]` per-element effects become [[mapAsync]] (bounded concurrency
  *     inside partitions) and the [[attempt]] error channel.
  *
  * Everything delegates to Dataset/Column ops so Catalyst sees a fully
  * declarative plan: pushdown, pruning, join selection, AQE all apply.
  */
final class Pipeline[A](val ds: Dataset[A]) extends Serializable {
  def toDF: DataFrame = ds.toDF()
  def spark: SparkSession = ds.sparkSession
  /** Dataset-qualified column — disambiguates join conditions when both
    * sides share field names (`left("id") === right("id")`). */
  def apply(name: String): Column = ds.col(name)

  // ----- §2.2 per-element ops ------------------------------------------
  def map[B: Encoder](f: A => B): Pipeline[B] = new Pipeline(ds.map(f))

  def filter(p: A => Boolean): Pipeline[A] = new Pipeline(ds.filter(p))

  /** `collect(pf)` = filter + map in one (reference kernel op P3). */
  def collectPf[B: Encoder](pf: PartialFunction[A, B]): Pipeline[B] =
    new Pipeline(ds.filter((a: A) => pf.isDefinedAt(a)).map(pf))

  def flatMap[B: Encoder](f: A => IterableOnce[B]): Pipeline[B] =
    new Pipeline(ds.flatMap(f))

  /** Reference `mapM`/`mapG` — effectful per-element map (SURVEY §2.2 P5).
    * No Catalyst analog: run `f` with at most `parallelism` in-flight
    * futures per partition. Results keep partition-local order, so a
    * downstream deterministic sort yields reproducible output. `f`
    * schedules its own futures — this operator only bounds how many are
    * in flight (it used to take an ExecutionContext it never used, which
    * read as if it controlled where `f` runs).
    */
  def mapAsync[B: Encoder](parallelism: Int, timeout: Duration = Duration.Inf)(
      f: A => Future[B]): Pipeline[B] =
    new Pipeline(ds.mapPartitions { it =>
      // sliding in-flight window, not batch-await: completing the head
      // immediately admits the next element, so slow outliers don't stall
      // a whole batch. Order-preserving → deterministic downstream sorts.
      val inFlight = scala.collection.mutable.Queue.empty[Future[B]]
      val width = math.max(1, parallelism)
      new Iterator[B] {
        def hasNext: Boolean = inFlight.nonEmpty || it.hasNext
        def next(): B = {
          while (it.hasNext && inFlight.size < width) inFlight.enqueue(f(it.next()))
          Await.result(inFlight.dequeue(), timeout)
        }
      }
    })

  /** Reference `handleError` (P6): route per-element failures into a value
    * channel instead of failing the task.
    */
  def attempt[B: Encoder](f: A => B)(implicit e: Encoder[Attempt[B]]): Pipeline[Attempt[B]] =
    new Pipeline(ds.map((a: A) => Attempt(a)(f)))

  /** Reference `recover`: like [[attempt]] but collapses back to `B` with a
    * fallback for failed elements.
    */
  def recoverMap[B: Encoder](f: A => B)(fallback: (A, Throwable) => B): Pipeline[B] =
    new Pipeline(ds.map { a =>
      try f(a) catch { case NonFatal(e) => fallback(a, e) }
    })

  /** Reference slf4j `log` tap (P7): observe without changing elements.
    * Spark-native: a named observation with a count metric — no extra job.
    */
  def observe(name: String): Pipeline[A] =
    new Pipeline(ds.observe(name, count(lit(1)).as(s"${name}_rows")))

  /** Reference `pausedWith` throttling (P8) — deliberately a per-partition
    * token-bucket; never on a verified/bench path (SURVEY §7.5).
    */
  def throttled(perSecondPerPartition: Double): Pipeline[A] = {
    // rate <= 0 made nanosPer overflow (1e9/0 → Infinity → Long.MaxValue)
    // and `next` wrap negative — throttling silently OFF, the opposite of
    // what a non-positive rate could possibly mean
    require(perSecondPerPartition > 0,
      s"throttle rate must be positive, got $perSecondPerPartition")
    new Pipeline(ds.mapPartitions { it =>
      val nanosPer = (1e9 / perSecondPerPartition).toLong
      var next = System.nanoTime()
      it.map { a =>
        val now = System.nanoTime()
        if (now < next) Thread.sleep((next - now) / 1000000, ((next - now) % 1000000).toInt)
        next = math.max(now, next) + nanosPer
        a
      }
    }(ds.encoder))
  }

  // ----- §2.3 typed joins (reference CanJoin: theta-join to pairs) -----
  /** Inner theta-join to (A, B) pairs — the reference's `join(that)(on)`.
    * Equi-shaped conditions plan as broadcast/shuffled hash joins; pure
    * theta degenerates to a nested loop, exactly as in the reference. */
  def join[B](that: Pipeline[B], on: Column): Pipeline[(A, B)] =
    new Pipeline(ds.joinWith(that.ds, on, "inner"))

  /** Left outer theta-join — `joinLeft(that)(on)`: unmatched left rows get
    * None. */
  def joinLeft[B](that: Pipeline[B], on: Column)(
      implicit e: Encoder[(A, Option[B])]): Pipeline[(A, Option[B])] =
    new Pipeline(ds.joinWith(that.ds, on, "left_outer")
      .map { case (a, b) => (a, Option(b)) })

  /** Cartesian pairing (reference CanJoin default). */
  def cross[B](that: Pipeline[B]): Pipeline[(A, B)] =
    new Pipeline(ds.joinWith(that.ds, lit(true), "cross"))

  // ----- §2.5 dedup / sort / limit / set ops ---------------------------
  def distinct: Pipeline[A] = new Pipeline(ds.distinct())

  /** Keep exactly one element per key, chosen deterministically as the
    * minimum by `ord` (positional "first" is undefined in a distributed
    * bag — SURVEY §7.5). Implemented as a typed reduceGroups — one shuffle,
    * map-side partial combine, no window materialization.
    */
  def distinctBy[K: Encoder](key: A => K)(implicit ord: Ordering[A]): Pipeline[A] =
    new Pipeline(ds.groupByKey(key).reduceGroups((a: A, b: A) => ord.min(a, b)).map(_._2)(ds.encoder))

  def sortBy(cols: Column*): Pipeline[A] = new Pipeline(ds.orderBy(cols: _*))

  /** top-k: Catalyst plans orderBy+limit as TakeOrderedAndProject — no full
    * sort at scale. */
  def take(n: Int, order: Column*): Pipeline[A] =
    new Pipeline(ds.orderBy(order: _*).limit(n))

  def union(that: Pipeline[A]): Pipeline[A] = new Pipeline(ds.union(that.ds))
  def ++(that: Pipeline[A]): Pipeline[A] = union(that)

  def intersect(that: Pipeline[A]): Pipeline[A] = new Pipeline(ds.intersect(that.ds))
  def except(that: Pipeline[A]): Pipeline[A] = new Pipeline(ds.except(that.ds))

  // ----- §2.4 QL entry point (reference `pipeline.query(_...)`) --------
  /** trembita-ql parity: `pipeline.query(_.where(...).groupBy(...)
    * .aggregate(...).having(...).orderBy(...))` compiled to one
    * groupBy+agg Catalyst node (SURVEY §3 EP3). */
  def query(build: graft.agg.Ql => graft.agg.Ql): DataFrame =
    build(graft.agg.Ql(ds.toDF())).result

  // ----- partitioning controls (the engine's Environment knobs) --------
  /** Hash-repartition to `n` partitions — a full shuffle; size so
    * partitions fit executor memory at the target scale (SURVEY §4.2). */
  def repartition(n: Int): Pipeline[A] = new Pipeline(ds.repartition(n))
  /** Co-locate by expressions — pre-shuffle once, reuse across joins/aggs
    * on the same keys. */
  def repartitionBy(cols: Column*): Pipeline[A] =
    new Pipeline(ds.repartition(cols: _*))
  /** Narrow partition-count reduction (no shuffle) — for post-filter
    * small outputs. */
  def coalesce(n: Int): Pipeline[A] = new Pipeline(ds.coalesce(n))

  // ----- caching (reference `caching/` module) -------------------------
  def cached(level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Pipeline[A] =
    new Pipeline(ds.persist(level))

  // ----- terminal ops (reference Output.* — SURVEY §2.1 S6–S8) ---------
  def evalVector: Vector[A] = ds.collect().toVector
  def evalForeach(f: A => Unit): Unit = ds.foreach(f)
  def evalSize: Long = ds.count()
  def evalReduce(f: (A, A) => A): A = ds.reduce(f)
  /** Fold with zero (reference `foldLeft`/Monoid `combineAll`): `op` must
    * be associative — the distributed bag has no element order. Empty
    * pipeline → zero. Single job: per-partition partial folds, combined on
    * the driver (an isEmpty probe would re-run the whole upstream plan). */
  def evalFold(zero: A)(op: (A, A) => A): A = {
    val partials = ds.mapPartitions { it =>
      if (it.hasNext) Iterator.single(it.reduce(op)) else Iterator.empty
    }(ds.encoder).collect()
    if (partials.isEmpty) zero else op(zero, partials.reduce(op))
  }
  /** Output.ignore — run the plan, discard rows (noop sink). */
  def evalIgnore(): Unit = ds.write.format("noop").mode("overwrite").save()
}

object Pipeline {
  /** Input.sequential / Input.parallel (S1): lift a driver-side collection.
    * Sequential-vs-parallel collapses into Spark local parallelism.
    */
  def fromSeq[A: Encoder](spark: SparkSession, xs: Seq[A]): Pipeline[A] =
    new Pipeline(spark.createDataset(xs))

  /** Input.repeat (S3): n generated elements. `spark.range` is a narrow,
    * codegen'd source — no driver-side materialization. */
  def range(spark: SparkSession, n: Long): Pipeline[java.lang.Long] =
    new Pipeline(spark.range(n).as(org.apache.spark.sql.Encoders.LONG))

  /** Input.file (S2): one element per line. */
  def textFile(spark: SparkSession, path: String): Pipeline[String] = {
    import spark.implicits._
    new Pipeline(spark.read.textFile(path))
  }

  def apply[A](ds: Dataset[A]): Pipeline[A] = new Pipeline(ds)
}

/** Untyped positional ops that need an explicit deterministic ordering key:
  * a distributed bag has no stable positions, so the reference's
  * `zip`/`zipWithIndex`/`drop`/`slice` (SURVEY §2.2 P10, §2.3 J7, §2.5 D5)
  * take order columns and compile to a range-partitioned two-pass index.
  *
  * Scale design (100 TB): NO single-partition global window. The frame is
  * range-partitioned on the order key and sorted within partitions (global
  * order across partition boundaries), then RDD `zipWithIndex` assigns
  * offsets — one lightweight per-partition count job, then a narrow map
  * that adds `partition_offset + local_position`. Every stage is parallel
  * across all executors; the only driver-side state is one Long per
  * partition.
  */
object Positional {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
  import org.apache.spark.sql.graftbridge.ColumnBridge
  import org.apache.spark.sql.types.LongType

  private def withIndex(df: DataFrame, order: Seq[Column], idxCol: String): DataFrame = {
    require(!df.columns.contains(idxCol),
      s"zipWithIndex writes '$idxCol'; input already has it — pass another idxCol or rename")
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(idxCol, LongType, nullable = false)
    // toRdd avoids the InternalRow→Row→InternalRow double conversion of the
    // public .rdd path; rows are copied because sorter output buffers are
    // reused and downstream operators may hold references.
    val indexed = sorted.queryExecution.toRdd.zipWithIndex().mapPartitions { it =>
      it.map { case (row, i) =>
        new JoinedRow(row.copy(), new GenericInternalRow(Array[Any](i))): InternalRow
      }
    }
    ColumnBridge.internalCreateDataFrame(spark, indexed, schema)
  }

  /** 0-based index attached by explicit total order — distributed two-pass
    * offset indexing (see object doc), not a global window. */
  def zipWithIndex(df: DataFrame, order: Seq[Column], idxCol: String = "idx"): DataFrame =
    withIndex(df, order, idxCol)

  /** Positional zip of two frames under their own explicit orders. */
  def zip(left: DataFrame, leftOrder: Seq[Column],
          right: DataFrame, rightOrder: Seq[Column]): DataFrame = {
    val l = withIndex(left, leftOrder, "__zip_idx")
    val r = withIndex(right, rightOrder, "__zip_idx")
    l.join(r, "__zip_idx").drop("__zip_idx")
  }

  /** slice(a until b) by explicit order — 0-based, end-exclusive. */
  def slice(df: DataFrame, order: Seq[Column], from: Int, until: Int): DataFrame =
    withIndex(df, order, "__slice_idx")
      .where(col("__slice_idx") >= from && col("__slice_idx") < until)
      .drop("__slice_idx")

  def drop(df: DataFrame, order: Seq[Column], n: Int): DataFrame =
    withIndex(df, order, "__drop_idx")
      .where(col("__drop_idx") >= n)
      .drop("__drop_idx")
}

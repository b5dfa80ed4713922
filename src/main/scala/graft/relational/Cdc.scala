package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application — the engine's MUTATE face: a batch
  * `MERGE INTO` (upsert + delete) and its temporal twin (state
  * reconstruction as of a version) over an append-only changelog, the
  * two operations every snapshot-plus-delta deployment needs between
  * compactions (the storage layer here is plain parquet — no
  * table-format dependency, the changelog IS the source of truth).
  *
  * Changelog contract: rows carry the key columns, a totally-ordered
  * `versionCol` (commit timestamp / LSN), an `opCol` of `'U'`
  * (upsert — full payload) or `'D'` (delete), and the payload columns.
  * `(key, version)` must be unique — two changes to one key in one
  * version have no defined winner anywhere (enforced upstream by the
  * log's writer; ties here would break determinism silently, so the
  * per-key ranking orders by version alone and the contract is
  * documented, not guessed around).
  *
  * Shape for 100 TB: the changelog reduces to latest-per-key via ONE
  * key-hash exchange + window (`row_number`, partitioned — a
  * `max(struct)` aggregate would plan the ObjectHashAggregate
  * sort-fallback the r15 retention redesign removed); the base join
  * then REUSES that hash partitioning on the change side, so an
  * upsert costs one changelog exchange + one base exchange, both
  * codegen. `snapshotAsOf` pushes the version predicate INTO the scan
  * (visible as PushedFilters on a parquet changelog) before anything
  * shuffles.
  */
object Cdc {

  /** The op column, validated at execution: any code outside {U, D}
    * (or a NULL) raises instead of half-applying — an 'X' row used to
    * pass the delete filter but miss the payload swap, leaking the
    * BASE payload (all-NULL for a new key). A corrupt changelog must
    * surface, not leak. */
  private def validatedOp(opCol: String): Column =
    when(col(opCol).isin("U", "D"), col(opCol))
      .otherwise(raise_error(concat(
        lit(s"CDC changelog op ('$opCol') must be 'U' or 'D', got: "),
        coalesce(col(opCol).cast("string"), lit("NULL")))))

  private def latest(changes: DataFrame, keyCols: Seq[String],
                     versionCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc)
    changes
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Apply `changes` to `base`: per key the highest-version change
    * wins — `'U'` replaces (or inserts) the row, `'D'` removes it;
    * keys without changes pass through. `base` columns must be
    * exactly `keyCols ++ payload`; `changes` adds `versionCol` and
    * `opCol`. Emits the merged snapshot with base's columns, ORDER BY
    * the keys. */
  def upsert(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
             versionCol: String = "version",
             opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    val payload = base.columns.filterNot(keyCols.contains).toSeq
    val missing = (keyCols ++ payload ++ Seq(versionCol, opCol))
      .filterNot(changes.columns.contains)
    require(missing.isEmpty, s"changelog is missing columns: $missing")
    val last = latest(
      changes.select((keyCols ++ payload ++ Seq(versionCol)).map(col) :+
        validatedOp(opCol).as(opCol): _*),
      keyCols, versionCol)
    val chg = last.select(
      keyCols.map(col) ++
        payload.map(c => col(c).as(s"__c_$c")) :+
        col(opCol).as("__op"): _*)
    base.join(chg, keyCols, "full_outer")
      .where(col("__op").isNull || col("__op") =!= "D")
      .select(keyCols.map(col) ++ payload.map { c =>
        when(col("__op") === "U", col(s"__c_$c"))
          .otherwise(col(c)).as(c)
      }: _*)
      .orderBy(keyCols.map(col): _*)
  }

  /** Reconstruct the live state AS OF `version` (inclusive) from the
    * changelog alone: restrict to `versionCol <= version` (pushed into
    * the scan), take latest-per-key, drop keys whose latest visible
    * change is a delete. Emits key + payload columns, ORDER BY keys. */
  def snapshotAsOf(changes: DataFrame, version: Column,
                   keyCols: Seq[String], versionCol: String = "version",
                   opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "snapshotAsOf needs at least one key column")
    val visible = changes.where(col(versionCol) <= version)
      .withColumn(opCol, validatedOp(opCol))
    latest(visible, keyCols, versionCol)
      .where(col(opCol) =!= "D")
      .drop(versionCol, opCol)
      .orderBy(keyCols.map(col): _*)
  }
}

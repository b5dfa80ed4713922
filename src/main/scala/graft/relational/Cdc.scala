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
  /** Reject changelog columns the snapshot doesn't know (r17): payload
    * is derived from the BASE/SNAPSHOT side, so an extra or renamed
    * changelog column — upstream schema evolution, a typo'd rename —
    * would be silently dropped, losing data with no signal (the same
    * silent-behavior class the op-code and knnLabel guards kill).
    * Additive evolution is explicit: evolve the snapshot first
    * (null-backfill the new column), then the changelog may carry it. */
  private def requireNoUnexpected(changes: DataFrame, expected: Seq[String],
                                  what: String): Unit = {
    val unexpected = changes.columns.filterNot(expected.contains).toSeq
    require(unexpected.isEmpty,
      s"changelog carries columns the $what does not: " +
        s"${unexpected.mkString(", ")} — these would be silently " +
        "dropped (payload is derived from the snapshot's schema). " +
        "Select exactly the expected columns, or evolve the snapshot " +
        "schema first (null-backfill the new column) so the merge " +
        "carries it.")
  }

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
    requireNoUnexpected(changes,
      keyCols ++ payload ++ Seq(versionCol, opCol), "base")
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

  // ---- streaming MERGE (r16): versioned snapshot + per-batch merge ----
  //
  // Batch `upsert` ranks versions WITHIN one changelog frame; a
  // changelog arriving as a STREAM splits across micro-batches, so the
  // snapshot itself must remember each key's applied version (or a
  // late-arriving lower version would clobber a newer payload) and must
  // keep DELETE tombstones (or a late lower-version 'U' would resurrect
  // a deleted key). The versioned snapshot carries exactly that:
  // `__cdc_version` (long) and `__cdc_deleted` per key, stripped by
  // [[publicSnapshot]]. Tombstone GC is a compaction concern — a
  // tombstone may be dropped once no in-flight change can carry a lower
  // version — outside this operator's scope and documented here.

  /** Applied-version column of a versioned snapshot. */
  val VersionCol = "__cdc_version"
  /** Tombstone flag column of a versioned snapshot. */
  val DeletedCol = "__cdc_deleted"

  /** Lift `base` (key + payload columns) into a versioned snapshot at
    * `baseVersion` — the bootstrap every stream starts from (an empty
    * base bootstraps an empty snapshot). */
  def bootstrap(base: DataFrame, keyCols: Seq[String],
                baseVersion: Long = 0L): DataFrame = {
    require(keyCols.nonEmpty, "bootstrap needs at least one key column")
    base.withColumn(VersionCol, lit(baseVersion))
      .withColumn(DeletedCol, lit(false))
  }

  /** One micro-batch's MERGE: apply `changes` to the versioned
    * `snapshot`, returning the next versioned snapshot. Winner per key:
    * the change iff its version is >= the snapshot's applied version
    * (>= — not > — so an at-least-once REPLAY of the same batch
    * re-applies identical payloads and the merge is idempotent); a
    * losing change (late, lower version) leaves the snapshot row —
    * including a tombstone — untouched. A winning 'D' writes a
    * tombstone (null payload, version recorded); a 'D' for an unseen
    * key still writes one, so a later out-of-order lower-version 'U'
    * for that key loses. Versions cast to long (the total order the
    * contract already requires).
    *
    * Replay idempotence REQUIRES per-key version uniqueness (the
    * `(key, version)` contract above): `>=` makes a replayed batch a
    * fixed point only because an equal-version change carries the SAME
    * payload. Two DISTINCT changes to one key at one version are
    * order-dependent across micro-batches — last-applied wins, and an
    * at-least-once replay of the older batch flips the payload back.
    * The log's writer owns the invariant (commit LSNs are unique per
    * key by construction); this operator does not scan for duplicates
    * — a per-batch uniqueness assertion would cost an extra exchange
    * per micro-batch to detect an upstream bug.
    *
    * Shape: latest-per-key window (one changelog key-hash exchange) +
    * full-outer join riding that hash on the change side — the
    * [[upsert]] plan, with the snapshot side pruned to changed buckets
    * by the streaming sink before it ever reaches this join. */
  def mergeVersioned(snapshot: DataFrame, changes: DataFrame,
                     keyCols: Seq[String], versionCol: String = "version",
                     opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "mergeVersioned needs at least one key column")
    val internal = Seq(VersionCol, DeletedCol)
    require(internal.forall(snapshot.columns.contains),
      s"snapshot is not versioned (missing $internal) — bootstrap() it")
    val payload = snapshot.columns
      .filterNot(keyCols.contains).filterNot(internal.contains).toSeq
    val missing = (keyCols ++ payload ++ Seq(versionCol, opCol))
      .filterNot(changes.columns.contains)
    require(missing.isEmpty, s"changelog is missing columns: $missing")
    requireNoUnexpected(changes,
      keyCols ++ payload ++ Seq(versionCol, opCol), "snapshot")
    val payloadTypes = payload.map(c => c -> snapshot.schema(c).dataType).toMap
    // keys align to the SNAPSHOT's dtypes like payload does: an int-keyed
    // changelog joined against a long-keyed snapshot would miss every
    // key (and hash to different buckets in the streaming sink)
    val keyTypes = keyCols.map(c => c -> snapshot.schema(c).dataType).toMap
    val last = latest(
      changes.select(keyCols.map(c => col(c).cast(keyTypes(c))) ++
        payload.map(c => col(c).cast(payloadTypes(c))) ++
        Seq(col(versionCol).cast("long").as(versionCol)) :+
        validatedOp(opCol).as(opCol): _*),
      keyCols, versionCol)
    // USING-join on the key NAMES (the upsert pattern), not a null-safe
    // <=> condition: keys are non-null by contract, and <=> makes the
    // join hash on (coalesce(k), isnull(k)) — the latest-per-key
    // window's plain hash(k) then satisfies nothing and each merge pays
    // an extra exchange per side (Explain-caught r16, 7 → 5 executed).
    // The USING join also emits the coalesced key columns itself.
    val chg = last.select(
      keyCols.map(col) ++
        payload.map(c => col(c).as(s"__c_$c")) ++
        Seq(col(versionCol).as("__c_version"), col(opCol).as("__op")): _*)
    val changeWins = col("__c_version").isNotNull &&
      (col(VersionCol).isNull || col("__c_version") >= col(VersionCol))
    snapshot.join(chg, keyCols, "full_outer")
      .select(
        keyCols.map(col) ++
          payload.map { c =>
            when(changeWins,
              when(col("__op") === "D", lit(null).cast(payloadTypes(c)))
                .otherwise(col(s"__c_$c")))
              .otherwise(col(c)).as(c)
          } ++ Seq(
            when(changeWins, col("__c_version"))
              .otherwise(col(VersionCol)).as(VersionCol),
            when(changeWins, col("__op") === "D")
              .otherwise(col(DeletedCol)).as(DeletedCol)): _*)
  }

  /** The readable face of a versioned snapshot: live rows, internal
    * columns stripped. */
  def publicSnapshot(snapshot: DataFrame): DataFrame =
    snapshot.where(!col(DeletedCol)).drop(VersionCol, DeletedCol)

  /** Tombstone GC — the compaction step closing the CDC lifecycle: a
    * tombstone exists only to out-rank a LATER-arriving LOWER version,
    * so once the log's writer guarantees no in-flight change below
    * `horizon` (a watermark on the version domain — commit LSN floor,
    * retention cutoff), every tombstone with version < `horizon` is
    * dead weight and drops. Tombstones AT or ABOVE the horizon stay —
    * a late change they must still out-rank may yet arrive. Live rows
    * are never touched: their version memory still orders future
    * changes. Returns the compacted versioned snapshot (same schema) —
    * a LAZY frame over the input; to rewrite a stored snapshot in
    * place use `StreamOps.compactCdcSnapshot`, which cuts before
    * overwriting the files this frame reads. */
  def compact(snapshot: DataFrame, horizon: Long): DataFrame = {
    require(Seq(VersionCol, DeletedCol).forall(snapshot.columns.contains),
      s"snapshot is not versioned — compact() takes bootstrap()/merge output")
    snapshot.where(!col(DeletedCol) || col(VersionCol) >= horizon)
  }

  /** Reconstruct the live state AS OF `asOfVersion` (inclusive) from a
    * RETAINED versioned snapshot plus the changelog recorded since it —
    * time travel that stays cheap after [[snapshotAsOf]]'s full-history
    * replay has become too expensive (r17, the round-16 stretch ask).
    *
    * The base must be a snapshot CAPTURED at or below `asOfVersion`
    * (the bootstrap, or a copy the deployment retained before the
    * maintained snapshot advanced past `asOfVersion`) — a versioned
    * snapshot records only each key's LATEST state, so changes cannot
    * be un-applied; a base row already applied ABOVE `asOfVersion`
    * makes the requested state unreconstructible from these inputs and
    * raises in-plan rather than silently serving future data. `changes`
    * must cover every change in `(base, asOfVersion]` (the deployment's
    * changelog-retention contract); records above `asOfVersion` are
    * filtered before anything shuffles (pushed into a parquet scan).
    *
    * Compaction interplay: tombstone GC on the RETAINED base must use a
    * horizon at or below the oldest changelog version this read may
    * still replay — a GC'd tombstone would let a lower-version 'U' in
    * the replayed segment resurrect a key that was already deleted.
    * [[compact]]'s writer-horizon contract covers this: "no in-flight
    * change below the horizon" extends to retained-for-time-travel
    * segments, not just the live stream.
    *
    * Emits PUBLIC rows (key + payload, internal columns stripped),
    * un-ordered — callers add ORDER BY. Shape: one changelog key-hash
    * exchange + one full-outer merge, the [[mergeVersioned]] plan; the
    * version guard is a per-row filter predicate (never a pruned
    * projection — a dropped guard column would make it vacuous). */
  def asOf(base: DataFrame, changes: DataFrame, asOfVersion: Long,
           keyCols: Seq[String], versionCol: String = "version",
           opCol: String = "op"): DataFrame =
    publicSnapshot(mergeVersioned(guardAtOrBelow(base, asOfVersion),
      changes.where(col(versionCol).cast("long") <= asOfVersion),
      keyCols, versionCol, opCol))

  /** [[asOf]]'s base-freshness guard, shared with the bucket-pruned
    * read face (`StreamOps.readAsOf`, which must guard its UNTOUCHED
    * leg too): a per-row FILTER predicate — never a projection, which
    * column pruning would silently drop — raising on any snapshot row
    * already applied above the requested version. */
  private[graft] def guardAtOrBelow(snapshot: DataFrame,
                                    asOfVersion: Long): DataFrame =
    snapshot.where(
      when(col(VersionCol) <= asOfVersion, lit(true))
        .otherwise(staleBaseError(asOfVersion)))

  private def staleBaseError(asOfVersion: Long): Column =
    raise_error(concat(
      lit("asOf: base snapshot row already applied at version "),
      col(VersionCol).cast("string"),
      lit(s" > requested $asOfVersion — the base must be a snapshot" +
        " retained at or below the requested version (changes" +
        " cannot be un-applied from latest state)")))

  /** [[publicSnapshot]] ∘ [[guardAtOrBelow]] as ONE non-splittable
    * predicate — for a leg that is read DIRECTLY (no merge above it,
    * e.g. `StreamOps.readAsOf`'s untouched buckets). Stacking the two
    * filters is silently WRONG there: the plain `!deleted` predicate
    * pushes into the parquet scan while the raise_error guard cannot,
    * so tombstone rows are eliminated before the guard ever evaluates
    * — a snapshot advanced past `asOfVersion` only by DELETES would
    * read as silently wrong historical state (live-at-asOf keys
    * missing) instead of raising (r18, the round-17 high advice).
    * Fused, a tombstone above the cut raises like any other stale row. */
  private[graft] def publicAtOrBelow(snapshot: DataFrame,
                                     asOfVersion: Long): DataFrame =
    snapshot.where(
      when(col(VersionCol) <= asOfVersion, !col(DeletedCol))
        .otherwise(staleBaseError(asOfVersion)))
      .drop(VersionCol, DeletedCol)

  /** Derive the CHANGELOG between two PUBLIC snapshots — the INVERSE of
    * [[upsert]] (r18): a key in `next` whose payload differs from
    * `prev` (or is new) emits `'U'` with next's payload; a key present
    * only in `prev` emits `'D'` (payload = prev's, carried because the
    * changelog contract requires the columns — values ignored by the
    * merge); unchanged keys emit nothing. Every deployment that
    * receives periodic full dumps instead of a log derives its
    * changelog exactly this way, then feeds [[upsert]]/
    * [[mergeVersioned]]/`StreamOps.cdcStream` as if a log existed.
    * `version` stamps every emitted row (one version per diff — the
    * dump's snapshot id; per-key uniqueness across diffs follows from
    * stamping successive dumps with increasing versions).
    *
    * The defining law (spec-pinned): `upsert(prev, diffSnapshots(prev,
    * next, keys, v)) == next` for any two public snapshots.
    *
    * Null-safe per column (`<=>`): a payload moving null↔value is a
    * change; null==null is not. Shape for 100 TB: ONE co-partitioned
    * full-outer join on the keys — both sides exchange once, the
    * comparison is a narrow projection, and unchanged keys (the bulk
    * of adjacent dumps) are filtered before anything else runs.
    * Emits keyCols ++ payload ++ (versionCol, opCol), un-ordered. */
  def diffSnapshots(prev: DataFrame, next: DataFrame, keyCols: Seq[String],
                    version: Long, versionCol: String = "version",
                    opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "diffSnapshots needs at least one key column")
    require(prev.columns.toSet == next.columns.toSet,
      s"snapshot schemas differ: ${prev.columns.toSeq.sorted} vs " +
        s"${next.columns.toSeq.sorted} — evolve/align before diffing")
    require(!prev.columns.contains(versionCol) && !prev.columns.contains(opCol),
      s"snapshots must not carry '$versionCol'/'$opCol' — diffSnapshots " +
        "takes PUBLIC rows and emits the changelog columns itself")
    // the diff builds marker/renamed columns under these prefixes; a
    // payload column already named __p_x/__n_x/__in_p/__in_n would
    // collide and silently corrupt the diff — fail loudly like the
    // version/op collision above (r19, the r18 advice)
    val reserved = prev.columns.filter(c =>
      c.startsWith("__p_") || c.startsWith("__n_") || c.startsWith("__in_"))
    require(reserved.isEmpty,
      s"snapshot columns collide with diffSnapshots' reserved " +
        s"__p_/__n_/__in_ prefixes: ${reserved.mkString(", ")} — rename " +
        "them before diffing")
    val payload = next.columns.filterNot(keyCols.contains).toSeq
    val p = prev.select(keyCols.map(col) ++
      payload.map(c => col(c).as(s"__p_$c")) :+ lit(true).as("__in_p"): _*)
    val n = next.select(keyCols.map(col) ++
      payload.map(c => col(c).as(s"__n_$c")) :+ lit(true).as("__in_n"): _*)
    val changed = payload.map(c => !(col(s"__p_$c") <=> col(s"__n_$c")))
      .foldLeft(lit(false))(_ || _)
    p.join(n, keyCols, "full_outer")
      .where(col("__in_p").isNull || col("__in_n").isNull || changed)
      .select(keyCols.map(col) ++
        payload.map { c =>
          when(col("__in_n").isNotNull, col(s"__n_$c"))
            .otherwise(col(s"__p_$c")).as(c)
        } ++ Seq(
          lit(version).as(versionCol),
          when(col("__in_n").isNull, "D").otherwise("U").as(opCol)): _*)
  }

  /** Reconstruct the live state AS OF `version` (inclusive) from the
    * changelog alone: restrict to `versionCol <= version` (pushed into
    * the scan), take latest-per-key, drop keys whose latest visible
    * change is a delete. Emits key + payload columns, ORDER BY keys.
    * For a changelog whose history below a retained snapshot has been
    * GC'd, use [[asOf]] (snapshot + tail) instead. */
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

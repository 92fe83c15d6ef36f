package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture primitives: compacting a change log to its latest
  * row per key and applying a change set onto a snapshot (batch MERGE /
  * upsert). This is the batch mirror of the streaming pk-idempotent JDBC
  * sink (reference semantics: services/kstream-agg-rs/src/sink.rs upsert
  * path) — the same "latest write per key wins" contract expressed as a
  * declarative plan instead of per-batch probes.
  *
  * Scale: [[latestByKey]] is one keyed window (single shuffle on the key;
  * rows of one key meet in one partition, never the whole log);
  * [[applyChanges]] is one full-outer join on the key, which AQE
  * broadcasts when the compacted change set is small — the common case,
  * since compaction collapses the log to at most one row per touched key.
  */
object ChangeCapture {

  /** Compact a change log to the LATEST row per key: the row with the
    * greatest (`tsCol`, `tieCol`) pair. `tieCol` must be unique within a
    * key (a sequence/offset column) so the winner — and therefore every
    * downstream merge — is deterministic under any partitioning.
    */
  def latestByKey(log: DataFrame, keyCol: String, tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).desc, col(tieCol).desc)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** SCD TYPE-2 history merge: fold a (compacted) change batch into a
    * versioned dimension table. `history` rows carry `valid_from_us` /
    * `valid_to_us` (micros; `valid_to_us` null = current); `changes`
    * rows carry `tsMicrosCol`, the effective time of the new version.
    * For every changed key the current row CLOSES (`valid_to_us` = change
    * time) and a new current row appends; unchanged keys pass through;
    * new keys open their first version. Value equality is NOT tested —
    * a change row always cuts a version (idempotent re-application is the
    * caller's concern via [[latestByKey]] compaction and effective-time
    * dedup), keeping the operator deterministic under null-valued columns.
    * With `skipReapplied = true` the effective-time guard runs inline: a
    * change whose time is at or before its key's open-version
    * `valid_from_us` is treated as already applied and skipped, so
    * re-merging the same (compacted) batch is a NO-OP — evaluated on the
    * row the merge join already produced, zero extra shuffles. The guard
    * also absorbs stale changes older than the open version (the inverted
    * interval the unguarded merge would flag).
    *
    * Preconditions: at most one change row per key (run [[latestByKey]]
    * first) AND a well-formed history — at most one open
    * (`valid_to_us` null) row per key; a second open row would fan out
    * the join, emitting duplicate closed and current versions (the
    * one-open-version invariant is cheap to assert downstream and is
    * pinned in ChangeCaptureSpec). Change time must be at or after the
    * key's current `valid_from_us`; a change older than the open version would produce
    * an inverted interval — flagged by the output (`valid_to_us <
    * valid_from_us`), never silently reordered.
    *
    * Plan: history splits into closed rows (pass through untouched) and
    * current rows (one full-outer join against the change batch — AQE
    * broadcasts the typically-small compacted changes). No window, no
    * global sort; at 100 TB the closed majority of the dimension is
    * never shuffled (the current-row slice is at most one row per live
    * key).
    */
  def scd2Merge(
      history: DataFrame, changes: DataFrame, keyCol: String,
      tsMicrosCol: String, skipReapplied: Boolean = false): DataFrame = {
    val histCols = history.columns.toSeq
    require(histCols.contains("valid_from_us") && histCols.contains("valid_to_us"),
      "history needs valid_from_us / valid_to_us (micros; null valid_to_us = current)")
    requireNoReservedColumns("scd2Merge", "history",
      histCols.filterNot(c => c == "valid_from_us" || c == "valid_to_us"))
    requireNoReservedColumns("scd2Merge", "changes", changes.columns.toSeq)
    val valueCols = changes.columns.toSeq.filterNot(c => c == keyCol || c == tsMicrosCol)
    require(valueCols.nonEmpty, "changes need at least one value column")
    require(valueCols.forall(histCols.contains),
      s"history is missing change value columns: ${valueCols.filterNot(histCols.contains)}")
    val closed = history.filter(col("valid_to_us").isNotNull)
    val current = history.filter(col("valid_to_us").isNull)
    val chg = changes.select(
      (col(keyCol) +: col(tsMicrosCol).as("__chg_ts") +:
        valueCols.map(c => col(c).as(s"__c_$c"))): _*)
      .withColumn("__c_mark", lit(1))
    val joined = current.withColumn("__s_mark", lit(1))
      .join(chg, Seq(keyCol), "full_outer")
    // a change "applies" unless the guard recognizes it as already folded
    // in: its key has an open version starting at or after the change time
    val applies =
      if (skipReapplied)
        col("__c_mark").isNotNull &&
          !(col("__s_mark").isNotNull && col("__chg_ts") <= col("valid_from_us"))
      else col("__c_mark").isNotNull
    // current rows of changed keys: close at the change's effective time
    val closedNow = joined
      .filter(col("__s_mark").isNotNull && applies)
      .select(histCols.map {
        case "valid_to_us" => col("__chg_ts").as("valid_to_us")
        case c => col(c)
      }: _*)
    // new current rows: changed keys (new version) + brand-new keys (first)
    val opened = joined
      .filter(applies)
      .select(histCols.map {
        case "valid_from_us" => col("__chg_ts").as("valid_from_us")
        case "valid_to_us" => lit(null).cast("long").as("valid_to_us")
        case c if valueCols.contains(c) => col(s"__c_$c").as(c)
        case c if c == keyCol => col(c)
        case c => col(c) // history-only attribute: carried from the key's current (open) row; null on brand-new keys
      }: _*)
    val untouched = joined
      .filter(col("__s_mark").isNotNull && !applies)
      .select(histCols.map(col): _*)
    closed.unionByName(closedNow).unionByName(opened).unionByName(untouched)
  }

  /** Both merge operators manufacture `__s_*`/`__c_*`/`__chg_ts` marker
    * columns and (applyChanges) an `op` output column; an input already
    * carrying one would silently collide — e.g. re-merging applyChanges
    * output without dropping `op`. Rejected up front with a clear error.
    */
  private def requireNoReservedColumns(
      opName: String, side: String, cols: Seq[String]): Unit = {
    val bad = cols.filter(c => c.startsWith("__") || c == "op")
    require(bad.isEmpty,
      s"$opName: $side carries reserved column name(s) ${bad.mkString(", ")} " +
        "('op' and '__'-prefixed names are manufactured by the merge; " +
        "drop or rename them first)")
  }

  /** Apply a (compacted) change set onto a snapshot — batch MERGE:
    * columns present in BOTH frames take the change's value where a
    * change row exists; snapshot-only columns pass through (null on
    * inserted rows); change-only columns pass through (null on untouched
    * rows). Adds `op`: 'I' (key only in changes), 'U' (both), 'K' (key
    * only in snapshot — kept untouched).
    *
    * Existence is tested on constant marker columns added to each side
    * before the join, never on data columns — a legitimately-null data
    * value in an existing row must not read as "row absent", and a null
    * change value must NOT clobber the snapshot's (coalesce keeps the
    * snapshot value, the standard MERGE column rule).
    *
    * Precondition: `changes` has at most one row per key (run
    * [[latestByKey]] first) — duplicate change keys would fan out the
    * join. Deletes are modeled upstream as a change row carrying a
    * tombstone column the caller filters on after the merge; the merge
    * itself never drops a key.
    */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, keyCol: String): DataFrame = {
    val snapCols = snapshot.columns.toSeq
    val chgCols = changes.columns.toSeq
    require(snapCols.contains(keyCol) && chgCols.contains(keyCol),
      s"both frames need key column '$keyCol'")
    requireNoReservedColumns("applyChanges", "snapshot", snapCols)
    requireNoReservedColumns("applyChanges", "changes", chgCols)
    val s = snapshot.select(snapCols.map(c =>
        if (c == keyCol) col(c) else col(c).as(s"__s_$c")): _*)
      .withColumn("__s_mark", lit(1))
    val c = changes.select(chgCols.map(cc =>
        if (cc == keyCol) col(cc) else col(cc).as(s"__c_$cc")): _*)
      .withColumn("__c_mark", lit(1))
    val shared = snapCols.toSet.intersect(chgCols.toSet) - keyCol
    val outCols =
      Seq(col(keyCol)) ++
        snapCols.filterNot(_ == keyCol).map { cc =>
          if (shared(cc)) coalesce(col(s"__c_$cc"), col(s"__s_$cc")).as(cc)
          else col(s"__s_$cc").as(cc)
        } ++
        chgCols.filterNot(cc => cc == keyCol || shared(cc)).map(cc => col(s"__c_$cc").as(cc))
    s.join(c, Seq(keyCol), "full_outer")
      .select(outCols :+
        when(col("__s_mark").isNull, lit("I"))
          .when(col("__c_mark").isNull, lit("K"))
          .otherwise(lit("U")).as("op"): _*)
  }

  /** Point-in-time (backdated) dimension join: each probe row picks up
    * the `attrCols` of the history version whose `validFromCol` is the
    * LATEST at or before the probe's `probeTsCol` — the feature-store
    * primitive that prevents training-serving skew (features joined as
    * they were KNOWN at event time, never leaked from the future).
    *
    * NOT a range join: probes × versions as a theta join explodes
    * quadratically per key at scale. Instead the [[q20-asof]] union
    * trick, generalized to carry a whole attribute struct: union
    * versions (kind 0) and probes (kind 1), shuffle ONCE by key, sort by
    * (ts, kind) — versions sort before same-instant probes, making
    * valid_from inclusive — and carry the latest version's struct
    * forward with `last(ignoreNulls)` over an unbounded-preceding frame.
    * One shuffle + one sort regardless of version density; probes before
    * the first version keep NULL attrs.
    *
    * Preconditions: `(key, validFrom)` unique in `history` (the SCD2
    * invariant [[scd2Merge]] maintains — equal-instant versions would be
    * ambiguous); probe and attr column names disjoint.
    */
  def pointInTimeJoin(
      probe: DataFrame, history: DataFrame, keyCol: String,
      probeTsCol: String, validFromCol: String, attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "need at least one attribute column")
    require(!attrCols.contains(keyCol), "keyCol cannot be an attribute")
    val clash = probe.columns.toSet.intersect(attrCols.toSet)
    require(clash.isEmpty, s"probe already has attribute column(s): ${clash.mkString(", ")}")
    val probeStruct = struct(probe.columns.map(col).toIndexedSeq: _*)
    val attrStruct = struct(attrCols.map(col).toIndexedSeq: _*)
    val h = history.select(
      col(keyCol).as("__pit_key"),
      col(validFromCol).cast("bigint").as("__pit_ts"),
      lit(0).as("__pit_kind"),
      attrStruct.as("__pit_attr"),
      lit(null).cast(probe.schema).as("__pit_row"))
    val p = probe.select(
      col(keyCol).as("__pit_key"),
      col(probeTsCol).cast("bigint").as("__pit_ts"),
      lit(1).as("__pit_kind"),
      lit(null).cast(h.schema("__pit_attr").dataType).as("__pit_attr"),
      probeStruct.as("__pit_row"))
    val w = Window.partitionBy(col("__pit_key"))
      .orderBy(col("__pit_ts"), col("__pit_kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h.unionByName(p)
      .withColumn("__pit_cur", last(col("__pit_attr"), ignoreNulls = true).over(w))
      .filter(col("__pit_kind") === 1)
      .select(probe.columns.map(c => col(s"__pit_row.$c").as(c)) ++
        attrCols.map(a => col(s"__pit_cur.$a").as(a)): _*)
  }

  /** Interval form of [[pointInTimeJoin]] for a CLOSED-INTERVAL history
    * (each version carries `[validFrom, validTo)`, `validTo` null = still
    * open — exactly [[scd2Merge]]'s output shape): probes left-join the
    * version whose interval contains the probe time.
    *
    * Semantically identical to [[pointInTimeJoin]] whenever the intervals
    * tile contiguously per key (the SCD2 invariant); the reason it
    * exists: the interval predicate is a plain per-row join condition, so
    * it runs UNCHANGED on a STREAMING probe frame as a stateless
    * stream-static join — the online feature-serving side of the same
    * dimension (StreamingEnrichSpec pins stream ≡ batch
    * pointInTimeJoin). The union/window trick cannot run on a stream
    * (it would need unbounded cross-input ordering state).
    *
    * Scale shape: with a broadcast-sized dimension this is a map-only
    * probe scan per micro-batch; a dimension too big to broadcast
    * becomes an equi-join on key with the interval filter applied
    * post-join — per-key version fan-out, the usual SCD2 bound. For
    * offline backfill over a huge dimension prefer [[pointInTimeJoin]]'s
    * single-sort shape.
    */
  /** Incremental aggregate maintenance from CDC deltas — keep a
    * per-group `(n_rows, sum_micro)` aggregate current WITHOUT
    * rescanning the base table: each CDC record carries before/after
    * images (the Debezium shape) and contributes an exact integer delta
    * (`I`: +after, `D`: −before, `U`: after−before; unknown ops fail
    * loudly). Deltas collapse map-side per group, merge into the running
    * aggregate with one outer join, and groups whose count reaches zero
    * drop out — so maintaining an aggregate over a 100 TB table costs
    * O(batch + touched groups) per batch, never a rescan. Inverse
    * (sum/count-style) aggregates only, by construction; min/max need
    * the base table on deletes.
    *
    * Streaming form: call from `foreachBatch` over a CDC stream —
    * ChangeCaptureSpec pins replay-fold ≡ direct aggregate of the final
    * table, any batch split.
    */
  def applyCdcToAggregate(
      agg: DataFrame, batch: DataFrame, groupCol: String,
      opCol: String, beforeCol: String, afterCol: String): DataFrame = {
    val bm = round(col(beforeCol) * lit(1e6)).cast("bigint")
    val am = round(col(afterCol) * lit(1e6)).cast("bigint")
    val bad = raise_error(concat(lit("applyCdcToAggregate: unknown op "), col(opCol)))
    val deltas = batch.select(col(groupCol).as("grp"),
        when(col(opCol) === "I", lit(1L)).when(col(opCol) === "D", lit(-1L))
          .when(col(opCol) === "U", lit(0L)).otherwise(bad.cast("bigint")).as("dn"),
        when(col(opCol) === "I", am).when(col(opCol) === "D", -bm)
          .when(col(opCol) === "U", am - bm).as("ds"))
      .groupBy(col("grp"))
      .agg(sum(col("dn")).as("dn"), sum(col("ds")).as("ds"))
    agg.select(col("grp"), col("n_rows"), col("sum_micro"))
      .join(deltas, Seq("grp"), "full_outer")
      .select(col("grp"),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_rows"),
        (coalesce(col("sum_micro"), lit(0L)) + coalesce(col("ds"), lit(0L))).as("sum_micro"))
      .filter(col("n_rows") > 0)
  }

  /** The zero-state starting aggregate for [[applyCdcToAggregate]] (or
    * compute one directly from an existing table). */
  def aggregateOf(rows: DataFrame, groupCol: String, valueCol: String): DataFrame =
    rows.select(col(groupCol).as("grp"),
        round(col(valueCol) * lit(1e6)).cast("bigint").as("vm"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"), sum(col("vm")).as("sum_micro"))

  /** BITEMPORAL as-of join: versions carry a VALID-time interval
    * `[validFrom, validTo)` (when the fact was true in the world) AND a
    * TRANSACTION-time interval `[txFrom, txTo)` (when the system knew
    * it; null = still open on that axis). Each probe row asks "what did
    * we know at `txTsCol` about the value valid at `validTsCol`" — the
    * reproducible-training-snapshot question ([[pointInTimeJoin]] only
    * answers the valid-time half; with late-arriving or corrected
    * dimension data the two DIFFER, and training on the valid-time
    * answer leaks knowledge the pipeline did not have).
    *
    * When valid intervals tile per key (the [[scd2Merge]] invariant), at
    * most one version matches both axes — no tie-break needed; the tx
    * filter can only turn a match into a miss (the honest "we did not
    * know yet").
    *
    * Same scale shape as [[intervalEnrich]]: a plain per-row join
    * condition — broadcast dim = map-only probe scan (and unchanged on a
    * streaming probe frame); too-big-to-broadcast = key equi-join with
    * both interval filters post-join, per-key version fan-out.
    */
  def bitemporalAsOf(
      probe: DataFrame, history: DataFrame, keyCol: String,
      validTsCol: String, txTsCol: String,
      validFromCol: String, validToCol: String,
      txFromCol: String, txToCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "need at least one attribute column")
    require(!attrCols.contains(keyCol), "keyCol cannot be an attribute")
    val clash = probe.columns.toSet.intersect(attrCols.toSet)
    require(clash.isEmpty, s"probe already has attribute column(s): ${clash.mkString(", ")}")
    val reserved = probe.columns.filter(_.startsWith("__bt_"))
    require(reserved.isEmpty,
      s"probe column(s) use the reserved __bt_ prefix: ${reserved.mkString(", ")}")
    val h = history.select(
      (Seq(col(keyCol).as("__bt_key"),
        col(validFromCol).cast("bigint").as("__bt_vf"),
        col(validToCol).cast("bigint").as("__bt_vt"),
        col(txFromCol).cast("bigint").as("__bt_tf"),
        col(txToCol).cast("bigint").as("__bt_tt")) ++ attrCols.map(col)): _*)
    probe.join(h,
      probe(keyCol) === h("__bt_key") &&
        probe(validTsCol).cast("bigint") >= col("__bt_vf") &&
        (col("__bt_vt").isNull || probe(validTsCol).cast("bigint") < col("__bt_vt")) &&
        probe(txTsCol).cast("bigint") >= col("__bt_tf") &&
        (col("__bt_tt").isNull || probe(txTsCol).cast("bigint") < col("__bt_tt")),
      "left")
      .drop("__bt_key", "__bt_vf", "__bt_vt", "__bt_tf", "__bt_tt")
  }

  def intervalEnrich(
      probe: DataFrame, history: DataFrame, keyCol: String,
      probeTsCol: String, validFromCol: String, validToCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "need at least one attribute column")
    require(!attrCols.contains(keyCol), "keyCol cannot be an attribute")
    val clash = probe.columns.toSet.intersect(attrCols.toSet)
    require(clash.isEmpty, s"probe already has attribute column(s): ${clash.mkString(", ")}")
    val reserved = probe.columns.filter(_.startsWith("__ie_"))
    require(reserved.isEmpty,
      s"probe column(s) use the reserved __ie_ prefix: ${reserved.mkString(", ")}")
    val h = history.select(
      (Seq(col(keyCol).as("__ie_key"),
        col(validFromCol).cast("bigint").as("__ie_vf"),
        col(validToCol).cast("bigint").as("__ie_vt")) ++ attrCols.map(col)): _*)
    probe.join(h,
      probe(keyCol) === h("__ie_key") &&
        probe(probeTsCol).cast("bigint") >= col("__ie_vf") &&
        (col("__ie_vt").isNull || probe(probeTsCol).cast("bigint") < col("__ie_vt")),
      "left")
      .drop("__ie_key", "__ie_vf", "__ie_vt")
  }

  /** SNAPSHOT RECONCILIATION DIFF — the release-gate comparison of two
    * keyed snapshots (yesterday's publish vs today's, source-of-truth vs
    * replica): how many keys were ADDED, REMOVED, kept in COMMON, and —
    * per compared column — how many common keys CHANGED value. The
    * question every lakehouse asks before promoting a snapshot, answered
    * as one exact report instead of eyeballed row counts.
    *
    * Null semantics: values compare with IS DISTINCT FROM, so
    * null → value and value → null both count as changes while
    * null → null does not. `changed_ppm` is exact over the common keys
    * (−1 when there are none). Keys are assumed unique per snapshot
    * (compact with [[latestByKey]] first); duplicate keys would fan the
    * join out and inflate every count.
    *
    * Scale shape: ONE full-outer join on the key (the only shuffle —
    * AQE broadcasts a genuinely small side), then ONE aggregation
    * computes the added/removed/common counts AND every column's change
    * count simultaneously (the [[DataPrep.constraintAudit]] one-pass
    * shape), unpivoted to |columns| rows. Adding a compared column costs
    * zero extra passes.
    */
  def snapshotDiff(
      a: DataFrame, b: DataFrame, keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "snapshotDiff: at least one compare column")
    require(compareCols.distinct.length == compareCols.length,
      "snapshotDiff: compare columns must be distinct")
    require(compareCols.forall(_.matches("[A-Za-z0-9_]+")),
      "snapshotDiff: column names must be [A-Za-z0-9_]+ (embedded in the " +
        "unpivot expression)")
    val aa = a.select(col(keyCol).as("k") +:
      compareCols.map(c => col(c).as(s"a_$c")): _*).withColumn("ina", lit(1))
    val bb = b.select(col(keyCol).as("k") +:
      compareCols.map(c => col(c).as(s"b_$c")): _*).withColumn("inb", lit(1))
    val j = aa.join(bb, Seq("k"), "full_outer")
    val aggs = Seq(
      sum(when(col("ina").isNotNull, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("inb").isNotNull, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("ina").isNull, 1L).otherwise(0L)).as("added"),
      sum(when(col("inb").isNull, 1L).otherwise(0L)).as("removed"),
      sum(when(col("ina").isNotNull && col("inb").isNotNull, 1L)
        .otherwise(0L)).as("common")) ++
      compareCols.map { c =>
        sum(when(col("ina").isNotNull && col("inb").isNotNull &&
            expr(s"a_$c IS DISTINCT FROM b_$c"), 1L)
          .otherwise(0L)).as(s"ch_$c")
      }
    val base = j.agg(aggs.head, aggs.tail: _*)
    val stackExpr = s"stack(${compareCols.length}, " +
      compareCols.map(c => s"'$c', ch_$c").mkString(", ") +
      ") AS (column_name, changed)"
    base.select(col("n_a"), col("n_b"), col("added"), col("removed"),
        col("common"), expr(stackExpr))
      .select(col("column_name"), col("n_a"), col("n_b"), col("added"),
        col("removed"), col("common"),
        coalesce(col("changed"), lit(0L)).as("changed"),
        when(col("common") === 0L, lit(-1L))
          .otherwise(expr(
            """CAST((CAST(1000000 AS DECIMAL(38,0)) * changed)
              | DIV common AS BIGINT)""".stripMargin))
          .as("changed_ppm"))
  }
}

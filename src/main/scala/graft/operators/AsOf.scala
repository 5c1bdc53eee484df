package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join family: for each probe row, attach the nearest
  * build row with the same key on one side of the probe timestamp — the
  * temporal-lookup operator (prevailing rate, latest-state-at-time, next
  * scheduled event) that Spark's join zoo lacks natively.
  *
  *  - [[joinBackward]]: most recent build row with `buildTs <= probeTs`
  *  - [[joinForward]]:  earliest build row with `buildTs >= probeTs`
  *  - both take an optional `tolerance` (an interval string) bounding how
  *    far the matched row may sit from the probe; matches outside it
  *    surface as nulls, exactly like a missing match
  *
  * The naive formulations both die at scale: a range-join
  * (`p.key = b.key AND b.ts <= p.ts` + window-max) multiplies every probe
  * row by its whole build history before pruning, and a per-key
  * `collect_list` + binary-search UDF holds entire key histories in single
  * rows. This implementation is the union-merge plan instead:
  *
  *   1. tag build rows side=0 (payload struct populated) and probe rows
  *      side=1 (payload null), union them — column-aligned, no data copy
  *      beyond the tag;
  *   2. one hash shuffle on the key, sort within partitions by
  *      (ts, side, tie) — direction flips the ts/tie order; at equal
  *      timestamps builds sort BEFORE probes, so a same-instant build is
  *      visible to the probe ("at or before" / "at or after");
  *   3. running `last(payload, ignoreNulls)` over
  *      rowsBetween(unboundedPreceding, 0) hands every probe row the
  *      nearest qualifying build payload;
  *   4. keep side=1, apply the tolerance bound, unpack the struct.
  *
  * Cost: ONE shuffle of |probe| + |build| rows and a per-partition sort —
  * the same plan shape at 60k rows and 100 TB. Ties among build rows at
  * the same (key, ts) resolve deterministically (backward: greatest
  * `buildTie` wins, matching `ORDER BY ts DESC, tie DESC LIMIT 1`;
  * forward: smallest wins, matching `ORDER BY ts ASC, tie ASC LIMIT 1`).
  *
  * HOT-KEY BOUND (inherent, documented not hidden): the window partitions
  * by the equi-key, so ONE key's entire merged history (its build + probe
  * rows) sorts and scans inside ONE task — per-key work is sequential no
  * matter how many executors exist. This is the standard Spark limitation
  * of any per-key ordered operator (window, mapGroups, session assembly):
  * a "monster key" holding 1% of a 100 TB table makes a ~1 TB task.
  * Mitigations preserve semantics only when applied per use-case: split a
  * monster key by coarse time-bucket and run the join per bucket carrying
  * the previous bucket's last state forward (the streaming variant of this
  * operator does exactly that with watermarked state), or pre-aggregate
  * build rows to the per-(key, ts) winner before joining — the tie rule
  * makes that reduction exact. AQE cannot split a window partition. The
  * OperatorsSpec monster-key case pins correctness (not speed) under a key
  * holding ~50x every other key's history, so skew changes surface as spec
  * diffs, not silent plan drift.
  *
  * Reference anchor: the reference has no temporal operator (SURVEY.md
  * §2.4 "No sort-merge, range, as-of ... joins exist") — this is part of
  * the §2.10-style extension surface for event/state data, alongside
  * q49's bounded range join.
  */
object AsOf {

  /** Most recent build row at or before the probe timestamp. See
    * [[join]] for parameters. */
  def joinBackward(probe: DataFrame, build: DataFrame, keys: Seq[String],
      probeTs: String, buildTs: String, buildTie: String,
      buildPayload: Seq[String], prefix: String = "asof_",
      tolerance: Option[String] = None): DataFrame =
    join(probe, build, keys, probeTs, buildTs, buildTie, buildPayload,
      backward = true, prefix, tolerance)

  /** Earliest build row at or after the probe timestamp. See [[join]]
    * for parameters. */
  def joinForward(probe: DataFrame, build: DataFrame, keys: Seq[String],
      probeTs: String, buildTs: String, buildTie: String,
      buildPayload: Seq[String], prefix: String = "asof_",
      tolerance: Option[String] = None): DataFrame =
    join(probe, build, keys, probeTs, buildTs, buildTie, buildPayload,
      backward = false, prefix, tolerance)

  /** @param probe        left side; every row is preserved (left-join)
    * @param build        right side, the looked-up history
    * @param keys         equi-join key columns (same names both sides)
    * @param probeTs      probe ordering column (name in `probe`)
    * @param buildTs      build ordering column (name in `build`)
    * @param buildTie     unique integral build column breaking equal-ts
    *                     ties deterministically
    * @param buildPayload build columns to surface; emitted as
    *                     `prefix + name`, null where no build row qualifies
    * @param backward     true = latest at-or-before; false = earliest
    *                     at-or-after
    * @param tolerance    optional interval literal (e.g. "10 minutes",
    *                     timestamp ts columns only): a match farther than
    *                     this from the probe ts is nulled out
    */
  private def join(probe: DataFrame, build: DataFrame, keys: Seq[String],
      probeTs: String, buildTs: String, buildTie: String,
      buildPayload: Seq[String], backward: Boolean, prefix: String,
      tolerance: Option[String]): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one equi-key")
    locally {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val tieType = build.schema(buildTie).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(tieType),
        s"buildTie '$buildTie' must be an integral column (found " +
          s"${tieType.simpleString}): a silent cast would null it out and " +
          "make equal-ts tie resolution nondeterministic")
    }
    // the build ts travels inside the payload (as __bts) so the tolerance
    // bound can be applied after the window without re-joining
    val payload = struct(
      build(buildTs).as("__bts") +: buildPayload.map(build(_)): _*)
    val probeCols = probe.columns

    val buildSide = build
      // a null build ts satisfies no ts-comparison predicate, but the sort
      // would place it at one end of the key group and leak its payload —
      // drop such rows up front (probe-side null ts needs no guard: it
      // sorts before all builds in either direction's null ordering and
      // correctly sees none — NULLS FIRST under ASC, and under DESC the
      // probe's nulls-last position is harmless because the frame only
      // looks backward at build rows that are all non-null)
      .filter(build(buildTs).isNotNull)
      .select(
      keys.map(build(_)) ++ Seq(
        build(buildTs).as("__ts"),
        lit(0).as("__side"),
        build(buildTie).cast("long").as("__tie"),
        payload.as("__payload")) ++
      probeCols.filterNot(keys.contains)
        .map(c => lit(null).cast(probe.schema(c).dataType).as(c)): _*)
    val probeSide = probe.select(
      keys.map(probe(_)) ++ Seq(
        probe(probeTs).as("__ts"),
        lit(1).as("__side"),
        lit(0L).as("__tie"),
        lit(null).cast(buildSide.schema("__payload").dataType)
          .as("__payload")) ++
      probeCols.filterNot(keys.contains).map(probe(_)): _*)

    // backward: latest at-or-before wins -> ascending scan, greatest tie
    // last; forward: earliest at-or-after wins -> descending scan, smallest
    // tie last (the running last() keeps the final qualifying build seen).
    // Null probe timestamps must sort FIRST in both directions (desc
    // defaults to NULLS LAST, which would let a null-ts probe see every
    // build) so they correctly match nothing.
    val ordering =
      if (backward)
        Seq(col("__ts").asc_nulls_first, col("__side").asc, col("__tie").asc)
      else
        Seq(col("__ts").desc_nulls_first, col("__side").asc, col("__tie").desc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = buildSide.unionByName(probeSide)
      .withColumn("__m", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val bounded = tolerance match {
      case None => matched
      case Some(t) =>
        val iv = expr(s"INTERVAL $t")
        val inRange =
          if (backward) col("__m.__bts") >= col("__ts") - iv
          else col("__m.__bts") <= col("__ts") + iv
        matched.withColumn("__m", when(inRange, col("__m")))
    }
    bounded.select(probeCols.map(col) ++
      buildPayload.map(c => col(s"__m.$c").as(prefix + c)): _*)
  }
}

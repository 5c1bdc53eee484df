package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each probe row, attach the most recent build
  * row with the same key and `buildTs <= probeTs` — the temporal-lookup
  * operator (prevailing rate, latest-state-at-time) that Spark's join
  * zoo lacks natively.
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
  *      (ts, side, tie): at equal timestamps builds sort BEFORE probes,
  *      so a same-instant build is visible to the probe ("at or before");
  *   3. running `last(payload, ignoreNulls)` over
  *      rowsBetween(unboundedPreceding, 0) hands every probe row the
  *      latest build payload at or before it;
  *   4. keep side=1, unpack the struct.
  *
  * Cost: ONE shuffle of |probe| + |build| rows and a per-partition sort —
  * the same plan shape at 60k rows and 100 TB. Ties among build rows at
  * the same (key, ts) resolve deterministically to the greatest `buildTie`
  * (the sort is total), matching the oracle's
  * `ORDER BY ts DESC, tie DESC LIMIT 1`.
  *
  * Reference anchor: the reference has no temporal operator (SURVEY.md
  * §2.4 "No sort-merge, range, as-of ... joins exist") — this is part of
  * the §2.10-style extension surface for event/state data, alongside
  * q49's bounded range join.
  */
object AsOf {

  /** @param probe        left side; every row is preserved (left-join)
    * @param build        right side, the looked-up history
    * @param keys         equi-join key columns (same names both sides)
    * @param probeTs      probe ordering column (name in `probe`)
    * @param buildTs      build ordering column (name in `build`)
    * @param buildTie     unique build column breaking equal-ts ties
    *                     deterministically (greatest wins)
    * @param buildPayload build columns to surface; emitted as
    *                     `prefix + name`, null where no build row qualifies
    */
  def joinBackward(probe: DataFrame, build: DataFrame, keys: Seq[String],
      probeTs: String, buildTs: String, buildTie: String,
      buildPayload: Seq[String], prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one equi-key")
    locally {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val tieType = build.schema(buildTie).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(tieType),
        s"buildTie '$buildTie' must be an integral column (found " +
          s"${tieType.simpleString}): a silent cast would null it out and " +
          "make equal-ts tie resolution nondeterministic")
    }
    val payload = struct(buildPayload.map(build(_)): _*)
    val probeCols = probe.columns

    val buildSide = build
      // a null build ts satisfies no `buildTs <= probeTs` predicate, but an
      // ASC sort would put it FIRST and leak its payload to every probe in
      // the key — drop such rows up front (probe-side null ts needs no
      // guard: it sorts before all builds and correctly sees none)
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

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    buildSide.unionByName(probeSide)
      .withColumn("__m", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(probeCols.map(col) ++
        buildPayload.map(c => col(s"__m.$c").as(prefix + c)): _*)
  }
}

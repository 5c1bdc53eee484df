package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage — Fellegi & Sunter 1969 ("A Theory for
  * Record Linkage", JASA 64), the classical decision model behind every
  * modern entity-resolution system (Splink, dedupe.io, JedAI all implement
  * it). The reference pipeline's contacts matcher (cleaning/fill_missing_
  * contact_info.py:64-99) is the degenerate rule-based form: "agree on
  * >= 2 of 3 keys -> match". Fellegi-Sunter replaces the hand-tuned
  * threshold with per-field evidence weights derived from data statistics:
  *
  *   agreement on field f contributes  log2(m_f / u_f)
  *   disagreement contributes          log2((1-m_f) / (1-u_f))
  *
  * where m_f = P(field agrees | pair is a true match) (a supplied model
  * parameter — learned by EM in full systems) and u_f = P(field agrees |
  * pair is random), which IS estimable from the data alone: for exact
  * equality, u_f = sum_v P(value = v)^2 over the field's value
  * distribution (the birthday-collision probability). A rare surname
  * agreeing is strong evidence (small u -> big weight); a common segment
  * agreeing is weak evidence. The summed weight is thresholded into
  * match / possible (clerical review) / non-match.
  *
  * Scale posture (100 TB): u-estimation is ONE corpus scan — all fields
  * explode into (field, value) rows and aggregate with map-side combine
  * (shuffle = sum of per-field distinct-value counts, each row 2 small
  * columns); the per-field u's fold into a 1-row broadcast. Scoring is
  * two id-keyed hash joins (pairs are produced by a blocking stage —
  * [[Fuzzy.blockedPairs]] / [[Fuzzy.sortedNeighborhood]] / the LSH
  * family — never all-pairs) plus per-row arithmetic. Nothing collects;
  * nothing is quadratic beyond the caller's blocking contract.
  *
  * Determinism: each u_f is a sum of (n_v/N)^2 over the value
  * distribution — summation order differs across engines, so u is rounded
  * to 9 decimals before entering any weight; the per-pair weight is a
  * fixed-order sum of |fields| doubles rounded to 6. log2 via ln/ln(2) in
  * both engines; 1e-15-scale libm noise cannot move a 6-decimal rounding.
  *
  * Null stance: a comparison with a NULL on either side is NEITHER
  * agreement nor disagreement — it contributes weight 0 (the standard
  * missing-at-random treatment; Splink's default). u_f is estimated over
  * non-null values only.
  */
object Linkage {

  /** One scored field: exact-equality comparison on `name` with
    * match-probability `m` (0 < m < 1). */
  case class FsField(name: String, m: Double)

  /** Per-field u-probabilities as a single-row frame with one column
    * `u_<field>` per field, each rounded to 9 decimals and clamped to
    * [1e-9, 1 - 1e-9] (a constant field would otherwise give u = 1 and an
    * infinite disagreement weight). One corpus scan: every field's
    * (value -> count) distribution rides the same explode + hash
    * aggregate; per-field collision mass sum((n_v/N)^2) is a second,
    * |distinct-values|-sized aggregate. */
  private[graft] def uProbabilities(records: DataFrame,
      fields: Seq[FsField]): DataFrame = {
    val fv = records.select(explode(array(fields.map(f =>
        struct(lit(f.name).as("f"),
          col(f.name).cast("string").as("v"))): _*)).as("fv"))
      .select(col("fv.f").as("f"), col("fv.v").as("v"))
      .filter(col("v").isNotNull)
    val counts = fv.groupBy(col("f"), col("v")).agg(count(lit(1)).as("n"))
    val mass = counts.groupBy(col("f")).agg(
      (sum(col("n") * col("n")).cast("double")
        / (sum(col("n")) * sum(col("n")))).as("u_raw"))
    val clamped = round(least(greatest(col("u_raw"), lit(1e-9)),
      lit(1.0 - 1e-9)), 9)
    mass.agg(
      max(when(col("f") === fields.head.name, clamped))
        .as(s"u_${fields.head.name}"),
      fields.tail.map(f =>
        max(when(col("f") === f.name, clamped)).as(s"u_${f.name}")): _*)
  }

  private def log2(c: Column): Column = log(2.0, c)

  /** Score `pairs(idA, idB)` against `records(idCol, fields...)` under the
    * Fellegi-Sunter model. Returns one row per pair:
    * (id_a, id_b, agree_<field>... (int: 1 agree / 0 disagree / null when
    * either side is null), weight (rounded 6), decision ('match' iff
    * weight >= upperT, 'non_match' iff weight <= lowerT, else
    * 'possible')). */
  def fellegiSunter(records: DataFrame, idCol: String, pairs: DataFrame,
      fields: Seq[FsField], upperT: Double, lowerT: Double): DataFrame = {
    require(fields.nonEmpty, "at least one scored field")
    require(fields.forall(f => f.m > 0 && f.m < 1),
      "m-probabilities must be in (0, 1)")
    require(lowerT <= upperT, "lowerT must be <= upperT")

    val u = uProbabilities(records, fields)
    val aSide = records.select(col(idCol).as("__ida") +:
      fields.map(f => col(f.name).as(s"__a_${f.name}")): _*)
    val bSide = records.select(col(idCol).as("__idb") +:
      fields.map(f => col(f.name).as(s"__b_${f.name}")): _*)

    val joined = pairs
      .select(col(pairs.columns(0)).as("id_a"),
        col(pairs.columns(1)).as("id_b"))
      .join(aSide, col("id_a") === col("__ida"))
      .join(bSide, col("id_b") === col("__idb"))

    val agreeCols = fields.map { f =>
      when(col(s"__a_${f.name}").isNull || col(s"__b_${f.name}").isNull,
        lit(null).cast("int"))
        .when(col(s"__a_${f.name}") === col(s"__b_${f.name}"), lit(1))
        .otherwise(lit(0)).as(s"agree_${f.name}")
    }
    // fixed left-to-right sum in field order — both engines add the same
    // |fields| doubles in the same order, so only the final round matters
    val weight = fields.map { f =>
      val uf = col(s"u_${f.name}")
      when(col(s"agree_${f.name}").isNull, lit(0.0))
        .when(col(s"agree_${f.name}") === 1, log2(lit(f.m) / uf))
        .otherwise(log2(lit(1.0 - f.m) / (lit(1.0) - uf)))
    }.reduceLeft(_ + _)

    joined
      .select(col("id_a") +: col("id_b") +: agreeCols: _*)
      .crossJoin(broadcast(u))
      .withColumn("weight", round(weight, 6))
      .withColumn("decision",
        when(col("weight") >= upperT, lit("match"))
          .when(col("weight") <= lowerT, lit("non_match"))
          .otherwise(lit("possible")))
      .drop(fields.map(f => s"u_${f.name}"): _*)
  }
}

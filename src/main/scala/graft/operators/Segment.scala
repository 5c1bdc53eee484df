package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** TextTiling topic segmentation (Hearst, CL 1997, simplified to the
  * block-comparison variant with immediate-neighbor depth) — find the
  * places where a document changes subject by scoring the lexical
  * cosine between adjacent fixed-width token blocks and flagging the
  * valleys. Curation uses: chunking long documents for RAG at TOPIC
  * boundaries instead of q74's fixed offsets (a chunk that straddles
  * a topic shift embeds as neither topic), and splitting concatenated
  * multi-article pages (a crawl artifact) before dedup so each piece
  * dedups independently.
  *
  * Depth of gap i = (cos(i−1) − cos(i)) + (cos(i+1) − cos(i)) — how
  * far the valley sits below both shoulders (missing shoulders count
  * 0); a gap is a boundary when its depth exceeds the per-doc
  * μ + 0.5σ cutoff (Hearst's liberal cutoff, sign-flipped for depth).
  *
  * Scale posture: token explode → (doc, block, term) counts → the gap
  * similarity is an equi-join of the count frame with itself shifted
  * one block (term-aligned), all doc-keyed; depth and the cutoff ride
  * doc-partitioned windows over |blocks|-sized frames. Nothing
  * global, nothing quadratic in document length. */
object Segment {

  /** Per (doc, gap) rows: gap g sits between blocks g and g+1
    * (0-based, only docs with ≥ 2 blocks emit rows): cos (rounded 6),
    * depth (rounded 6), is_boundary. `blockTokens` is the block width
    * in tokens. */
  def textTiling(docs: DataFrame, idCol: String, textCol: String,
      blockTokens: Int = 10): DataFrame = {
    val toks = docs
      .select(col(idCol), posexplode(Text.tokens(col(textCol)))
        .as(Seq("p", "tok")))
      .select(col(idCol), floor(col("p") / blockTokens).as("blk"),
        col("tok"))
    val counts = toks.groupBy(col(idCol), col("blk"), col("tok"))
      .agg(count(lit(1)).as("n"))
    val norms = counts.groupBy(col(idCol), col("blk"))
      .agg(sum(col("n") * col("n")).as("nrm2"))
    val a = counts.select(col(idCol), col("blk").as("g"), col("tok"),
      col("n").as("na"))
    val b = counts.select(col(idCol), (col("blk") - 1).as("g"),
      col("tok"), col("n").as("nb"))
    val dots = a.join(b, Seq(idCol, "g", "tok"))
      .groupBy(col(idCol), col("g"))
      .agg(sum(col("na") * col("nb")).as("dot"))
    // every adjacent block pair is a gap, even with zero shared terms
    val gaps = norms.select(col(idCol), col("blk").as("g"),
        col("nrm2").as("n2a"))
      .join(norms.select(col(idCol), (col("blk") - 1).as("g"),
        col("nrm2").as("n2b")), Seq(idCol, "g"))
      .join(dots, Seq(idCol, "g"), "left")
      .select(col(idCol), col("g"),
        round(coalesce(col("dot"), lit(0L))
          / sqrt(col("n2a") * col("n2b")), 6).as("cos"))
    val wOrd = Window.partitionBy(col(idCol)).orderBy(col("g"))
    val wAll = Window.partitionBy(col(idCol))
    gaps
      // + 0.0 canonicalizes IEEE -0.0 (DuckDB's round keeps the sign
      // of a tiny negative, Spark's BigDecimal path does not)
      .withColumn("depth",
        round(coalesce(lag(col("cos"), 1).over(wOrd) - col("cos"),
            lit(0.0))
          + coalesce(lead(col("cos"), 1).over(wOrd) - col("cos"),
            lit(0.0)), 6) + lit(0.0))
      .withColumn("cutoff", round(avg(col("depth")).over(wAll)
        + lit(0.5) * stddev_pop(col("depth")).over(wAll), 6))
      .select(col(idCol), col("g"), col("cos"), col("depth"),
        (col("depth") > col("cutoff")).as("is_boundary"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules — Agrawal & Srikant 1994 ("Fast
  * Algorithms for Mining Association Rules", the Apriori paper), restricted
  * to item PAIRS: the 2-itemset tier is the workhorse of co-occurrence
  * analytics (also-bought, co-click, term co-occurrence) and is fully
  * relational; deeper tiers grow combinatorially for marginal analytic
  * value. Complements q81's PMI (an information-theoretic score over the
  * same co-occurrence counts) with the classic support / confidence / lift
  * rule measures.
  *
  * Scale posture (100 TB): the only non-linear step is the within-basket
  * pair expansion — a self-join keyed on the basket id (co-partitioned
  * shuffle, never a cross join), emitting C(|basket|, 2) rows per basket.
  * That is quadratic in BASKET size, not corpus size; `maxBasketSize`
  * caps it (the q89 maxGramDf stance: a pathological mega-basket — one
  * "order" holding half the catalog — would otherwise dominate the stage).
  * Everything else is hash aggregates with map-side combine (pair counts,
  * item counts, one scalar basket count broadcast back).
  */
object Baskets {

  /** Association rules over the item pairs of `df(basketCol, itemCol)`
    * (rows are basket-item memberships; duplicates are deduped first).
    * Baskets larger than `maxBasketSize` items are dropped whole — from
    * the pair stage AND the supports — so the guard changes no surviving
    * statistic, it only excludes pathological baskets. Returns, per
    * unordered pair with co-occurrence count >= `minPairCount`:
    * (item_a, item_b, pair_cnt, cnt_a, cnt_b, support, conf_ab, conf_ba,
    * lift), support/confidence/lift rounded to 6, ordered by lift desc
    * with the (item_a, item_b) total tiebreak, truncated to `topK`. */
  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long, maxBasketSize: Int, topK: Int): DataFrame = {
    val member = df.select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .distinct()
    val sized = member.groupBy(col("bk"))
      .agg(count(lit(1)).as("__bsz"))
      .filter(col("__bsz") <= maxBasketSize)
      .select(col("bk"))
    val kept = member.join(sized, Seq("bk"))

    val nBaskets = kept.agg(countDistinct(col("bk")).as("n_baskets"))
    val itemCnt = kept.groupBy(col("it")).agg(count(lit(1)).as("cnt"))
    val pairs = kept.as("a").join(kept.as("b"),
        col("a.bk") === col("b.bk") && col("a.it") < col("b.it"))
      .groupBy(col("a.it").as("item_a"), col("b.it").as("item_b"))
      .agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= minPairCount)

    pairs
      .join(itemCnt.select(col("it").as("item_a"), col("cnt").as("cnt_a")),
        Seq("item_a"))
      .join(itemCnt.select(col("it").as("item_b"), col("cnt").as("cnt_b")),
        Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("pair_cnt"),
        col("cnt_a"), col("cnt_b"),
        round(col("pair_cnt").cast("double") / col("n_baskets"), 6)
          .as("support"),
        round(col("pair_cnt").cast("double") / col("cnt_a"), 6)
          .as("conf_ab"),
        round(col("pair_cnt").cast("double") / col("cnt_b"), 6)
          .as("conf_ba"),
        round(col("pair_cnt").cast("double") * col("n_baskets")
          / (col("cnt_a") * col("cnt_b")), 6).as("lift"))
      .orderBy(col("lift").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Deterministic shard assignment + per-epoch data ordering for training
  * dataloaders (the content-addressed "global shuffle" of pretraining
  * runs — e.g. Megatron/T5-style sharded datasets): every example maps to
  * a shard by content hash, and within a shard the read order for epoch e
  * is a pseudo-random permutation keyed by (content, epoch). Both are
  * pure functions of the data — independent of input partitioning, file
  * order, or cluster size — so a resumed or re-provisioned job sees the
  * exact same stream, and two epochs see different permutations without
  * any stored shuffle state.
  *
  * Scale posture: shard = pmod(hash, S) needs no shuffle at all; the
  * within-shard position is one row_number per epoch over the shard
  * partition — a single exchange keyed on shard (S-way parallel sort of
  * corpus/S rows each; this is the dataloader's own per-shard order, so
  * the sort IS the product, not overhead). The portable md5-based hash
  * keeps orderings engine-checkable; swap xxhash64 for raw speed when
  * cross-engine reproducibility is not needed.
  */
object Sharding {

  /** Epoch-salted order hash of `id`. */
  private def orderHash(id: Column, epoch: Int): Column =
    Text.md5Long(concat(id.cast("string"), lit(":"), lit(epoch)))

  /** (id, shard, pos_e<each epoch>) for `df(idCol)`: shard in [0, S),
    * pos 1-based within shard, one column per requested epoch. Ties on
    * the order hash (vanishingly rare) break by id for total order. */
  def deterministicShards(df: DataFrame, idCol: String, numShards: Int,
      epochs: Seq[Int] = Seq(0)): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val id = col(idCol)
    val base = df.select(id.as("id"),
      pmod(Text.md5Long(id.cast("string")), lit(numShards)).as("shard"))
    epochs.foldLeft(base) { (acc, e) =>
      val w = Window.partitionBy(col("shard"))
        .orderBy(orderHash(col("id"), e).asc, col("id").asc)
      acc.withColumn(s"pos_e$e", row_number().over(w).cast("long"))
    }
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing — batch construction for training pipelines: pack
  * documents into fixed-budget bins (token/char budget per training
  * sequence) so short documents share a sequence instead of wasting
  * pad tokens.
  *
  * The packing discipline is GREEDY CONTIGUOUS within deterministic
  * shards: documents are sharded by `id % shards`, ordered by id within
  * the shard, and each document joins the current bin unless that would
  * push the bin over `budget` (then it starts the next bin). A document
  * larger than the whole budget gets a bin of its own. This is the
  * streaming-friendly discipline real packers use (first-fit against
  * one open bin): one sequential pass, O(1) state, and — unlike
  * best-fit/FFD over the whole corpus — it needs no global sort by
  * size, so the answer is a pure function of (id order, weights) and
  * replays exactly in SQL (recursive CTE) for the oracle.
  *
  * Scale shape: the shard is the parallel unit — `repartition(shard)`
  * hash-routes each shard to one task, `sortWithinPartitions` gives the
  * in-shard id order via the shuffle's own sort machinery (no in-memory
  * group materialization — a shard streams through the packer iterator
  * at O(1) memory, so shards can be arbitrarily large), and the greedy
  * scan itself is a `mapPartitions` that resets at shard boundaries.
  * At 100 TB, `shards` is sized to executor count × a small factor;
  * packing quality is unaffected by shard count (bins never cross
  * shards by construction).
  */
object Packing {

  /** Pack `docs` into bins of at most `budget` total `weightCol`
    * (where any single overweight doc occupies its own bin).
    *
    * Returns (shard, bin, doc_id, weight) — bin numbering restarts at 0
    * per shard; (shard, bin) is the packed-sequence key.
    *
    * `idCol` must be integral (it defines both the shard and the
    * in-shard order); `weightCol` must be non-negative and integral
    * (token or character counts).
    */
  def packGreedy(docs: DataFrame, idCol: String, weightCol: String,
                 budget: Long, shards: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(pmod(col(idCol).cast("long"), lit(shards.toLong)).as("shard"),
              col(idCol).cast("long").as("doc_id"),
              col(weightCol).cast("long").as("weight"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // a partition holds whole shards (hash-routed), sorted by
        // (shard, id): scan sequentially, resetting per shard
        var curShard = -1L
        var bin = 0L
        var fill = 0L
        it.map { case (shard, id, w) =>
          require(w >= 0, s"negative weight $w for doc $id")
          if (shard != curShard) { curShard = shard; bin = 0L; fill = 0L }
          if (fill > 0 && fill + w > budget) { bin += 1; fill = 0L }
          fill += w
          (shard, bin, id, w)
        }
      }
      .toDF("shard", "bin", "doc_id", "weight")
  }

  /** First-fit-decreasing packing within each shard — the opt-in
    * bin-QUALITY variant: documents are sorted by weight descending
    * (id tiebreak) inside the shard and each one lands in the FIRST
    * open bin with room, so small documents backfill the gaps big ones
    * leave and the per-bin fill fraction beats the greedy contiguous
    * scan. The tradeoffs real packers weigh against that quality win:
    * bin membership is no longer contiguous in id order (worse for
    * curriculum-style orderings), and the scan keeps a list of open
    * bins instead of one.
    *
    * The open-bin list is BOUNDED at `maxOpenBins`: when it
    * overflows, the fullest open bin closes (it can accept the fewest
    * future docs — weights only decrease, so closing it first costs
    * the least fill). That keeps per-task state at O(maxOpenBins)
    * regardless of shard size — the same O(1)-memory discipline as
    * the greedy scan, paid for with a bounded deviation from true FFD
    * on adversarial weight mixes.
    *
    * Output contract matches [[packGreedy]]: (shard, bin, doc_id,
    * weight), bin numbering restarting at 0 per shard, deterministic
    * (a pure function of the shard's (weight desc, id) order).
    */
  def packFirstFitDecreasing(docs: DataFrame, idCol: String, weightCol: String,
                             budget: Long, shards: Int,
                             maxOpenBins: Int = 64): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    require(maxOpenBins > 0, s"maxOpenBins must be positive, got $maxOpenBins")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(pmod(col(idCol).cast("long"), lit(shards.toLong)).as("shard"),
              col(idCol).cast("long").as("doc_id"),
              col(weightCol).cast("long").as("weight"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("weight").desc, col("doc_id"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var curShard = -1L
        var nextBin = 0L
        // open bins as parallel arrays (binId, fill), small and scanned
        // linearly — maxOpenBins is tens, not thousands
        val binIds = scala.collection.mutable.ArrayBuffer.empty[Long]
        val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
        it.map { case (shard, id, w) =>
          require(w >= 0, s"negative weight $w for doc $id")
          if (shard != curShard) {
            curShard = shard; nextBin = 0L; binIds.clear(); fills.clear()
          }
          var i = 0
          while (i < binIds.length && fills(i) + w > budget) i += 1
          val bin = if (i < binIds.length) {
            fills(i) += w
            val b = binIds(i)
            // a bin filled to the brim can't take any more — close it
            if (fills(i) >= budget) { binIds.remove(i); fills.remove(i) }
            b
          } else {
            val b = nextBin
            nextBin += 1
            // an at-or-over-budget doc fills its bin outright; only
            // bins with remaining room join the open list
            if (w < budget) {
              binIds += b
              fills += w
              if (binIds.length > maxOpenBins) {
                // close the fullest open bin (least future capacity)
                var maxI = 0
                var j = 1
                while (j < fills.length) {
                  if (fills(j) > fills(maxI)) maxI = j
                  j += 1
                }
                binIds.remove(maxI)
                fills.remove(maxI)
              }
            }
            b
          }
          (shard, bin, id, w)
        }
      }
      .toDF("shard", "bin", "doc_id", "weight")
  }

  /** Per-bin packing summary: how full each packed sequence is —
    * (shard, bin, n_docs, bin_weight, fill_frac). The padding-waste
    * audit a packing run ships with.
    */
  def packStats(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("weight")).as("bin_weight"))
      .withColumn("fill_frac",
        round(least(col("bin_weight") / budget.toDouble, lit(1.0)), 6))

  /** Length-bucketed batching — the other batch-construction
    * discipline (dynamic batching): group similarly-sized documents so
    * each batch pads to its own bucket's max instead of the corpus
    * max. Bucket edges are exact weight percentiles computed in ONE
    * percentile aggregate and broadcast as a 1-row frame (the t52
    * threshold-comparison pattern — never an ntile/global-rank window,
    * which would funnel the corpus through one task); assignment is a
    * per-row threshold CASE. Edges round to 6dp before comparison —
    * exact-percentile implementations differ by an ulp at tied-value
    * knots, and bucket labels must compare exactly across engines.
    *
    * Output: per bucket — doc count, weight min/max/sum, the padding
    * waste a max-padded batch of that bucket pays
    * (n_docs · max_w − sum_w), and its ratio. The corpus-wide waste
    * without bucketing is the degenerate numBuckets = 1 row.
    */
  def lengthBuckets(docs: DataFrame, idCol: String, weightCol: String,
                    numBuckets: Int): DataFrame = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    val w = docs.select(col(idCol), col(weightCol).cast("long").as("w"))
    val qs = (1 until numBuckets).map(_.toDouble / numBuckets)
    val bucketed =
      if (qs.isEmpty) w.withColumn("bucket", lit(0))
      else {
        val thr = w.agg(percentile(col("w"),
            array(qs.map(lit): _*)).as("__p"))
          .select((0 until qs.size).map(i =>
            round(col("__p").getItem(i), 6).as(s"__q$i")): _*)
        val b = qs.indices.foldLeft(lit(numBuckets - 1)) { (acc, i) =>
          // first threshold the weight fits under wins; fold from the
          // highest down so lower buckets override
          when(col("w") <= col(s"__q${qs.size - 1 - i}"),
               qs.size - 1 - i).otherwise(acc)
        }
        w.crossJoin(broadcast(thr)).withColumn("bucket", b)
      }
    bucketed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
           min(col("w")).as("min_w"),
           max(col("w")).as("max_w"),
           sum(col("w")).as("sum_w"))
      .withColumn("padding_waste",
        col("n_docs") * col("max_w") - col("sum_w"))
      // a bucket whose max weight is 0 (all-empty docs) has 0 waste of
      // a 0 budget: define the ratio as 0 rather than 0/0 (NULL in
      // Spark but NaN in an unguarded oracle CAST division)
      .withColumn("waste_ratio",
        when(col("max_w") > 0,
          round(col("padding_waste") /
            (col("n_docs") * col("max_w")).cast("double"), 6))
          .otherwise(lit(0.0)))
  }
}

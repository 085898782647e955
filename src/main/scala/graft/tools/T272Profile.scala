package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Pq, Similarity}
import graft.Tables

/** Dev probe: leg-by-leg wall times of t272_margin_ivfpq (warm). */
object T272Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.toolSession(defaultCpus = "32")
    graft.GraftSession.warmUp(spark, sfDir)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[t272] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // mirror clusteredEmbeddings (prewarm it once so legs are warm)
    val emb = Tables.embeddings(spark, sfDir)
    val centers = emb.filter(col("vec_id") < 16 && col("vec_id") % 2 === 0)
      .select(floor(col("vec_id") / 2).cast("int").as("c"),
              col("embedding").as("cvec"))
    val clustered0 = emb.join(broadcast(centers),
        (floor(col("vec_id") / 2) % 8).cast("int") === col("c"))
      .select(col("vec_id"),
        zip_with(col("cvec"), col("embedding"),
          (a, b) => a * lit(0.85) + b * lit(0.15)).as("embedding"))
      .localCheckpoint(true)
    for (round <- 1 to 2) {
      println(s"--- pass $round ---")
      val clustered = clustered0.filter(col("vec_id") < 1000)
      val src = clustered.filter(col("vec_id") % 2 === 0)
      val tgt = clustered.filter(col("vec_id") % 2 =!= 0)
      val srcQ = src.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val bfNn = t("bfNn persist+count") {
        val b = Similarity.bruteForceTopK(tgt, "vec_id", "embedding",
            srcQ, "qid", "qvec", k = 4)
          .select(col("qid"), col("id")).persist()
        b.count(); b
      }
      val (centsT, cbT) = t("ivfPqTrain tgt") {
        Pq.ivfPqTrain(tgt, "embedding", nlist = 16, refineIters = 1,
          m = 8, ksub = 256, iters = 1) }
      val (centsS, cbS) = t("ivfPqTrain src") {
        Pq.ivfPqTrain(src, "embedding", nlist = 16, refineIters = 1,
          m = 8, ksub = 256, iters = 1) }
      val provider: Similarity.TopKProvider =
        (corpus, idCol, vecCol, q, qidCol, qvecCol, k) => {
          val (cents, cb) =
            if (idCol == "src_id") (centsS, cbS) else (centsT, cbT)
          Pq.ivfPqTopK(corpus, idCol, vecCol, q, qidCol, qvecCol, k,
            nlist = 16, nprobe = 8, rerank = 8,
            codebook = Some(cb), centroids = Some(cents))
        }
      def mine(topK: Similarity.TopKProvider) =
        Similarity.marginMine(src, "vec_id", "embedding",
          tgt, "vec_id", "embedding", k = 4, threshold = 1.0, topK = topK)
      val bf = t("bf mine (fwd ckpt)") {
        mine(Similarity.bruteForceTopK)
          .select(col("src_id"), col("tgt_id").as("bf_tgt")) }
      val ann = t("ann mine (fwd ckpt)") {
        mine(provider).select(col("src_id"), col("tgt_id").as("ann_tgt")) }
      val joined = t("joined ckpt") {
        bf.join(ann, Seq("src_id")).localCheckpoint(true) }
      val annNn = provider(tgt, "vec_id", "embedding", srcQ, "qid", "qvec", 4)
        .select(col("qid"), col("id"))
      t("nnRecall noop") {
        annNn.join(bfNn, Seq("qid", "id"), "left_semi")
          .agg(count(lit(1))).write.format("noop").mode("overwrite").save() }
      t("scanAudit noop") {
        Pq.ivfPqScanAudit(tgt, "vec_id", "embedding", srcQ, "qid", "qvec",
            nlist = 16, nprobe = 8, refineIters = 1,
            centroids = Some(centsT))
          .write.format("noop").mode("overwrite").save() }
      t("agg legs noop") {
        joined.agg(count(lit(1))).write.format("noop").mode("overwrite").save() }
      bfNn.unpersist()
    }
    spark.stop()
  }
}

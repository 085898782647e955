package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{pq_adc, pq_decode, pq_encode}

/** Product quantization (Jégou et al. 2011) — the compression layer of
  * a 100 TB similarity index. Vectors split into `m` contiguous
  * subvectors; each subspace gets its own `ksub`-codeword L2 k-means
  * codebook; a vector stores as `m` small codes (8-32× smaller than
  * the raw floats). Queries score against the COMPRESSED corpus via
  * asymmetric distance (exact query × reconstructed corpus cosine) —
  * at scale the corpus scan is IO-bound, so the compression ratio is
  * the speedup, and the raw vectors never need to be resident.
  *
  * Codebook size is ksub × dim doubles TOTAL (m × ksub × dim/m) —
  * driver-bounded and independent of corpus size, the same pattern as
  * the IVF centroid matrix ([[Similarity.MaxDriverNlist]] rationale).
  * All training passes are distributed aggregates; the driver only
  * ever holds the codebook.
  */
object Pq {

  /** Subvector slices of `vecCol` as (subspace index, ARRAY<DOUBLE>)
    * rows — the shared front-end of seeding, refinement, and audits.
    */
  private def subvectors(vecs: DataFrame, vecCol: String, m: Int,
                         dsub: Int): DataFrame =
    vecs.select(posexplode(array((0 until m).map(i =>
        slice(col(vecCol), i * dsub + 1, dsub).cast("array<double>")): _*))
      .as(Seq("m_idx", "sub")))

  /** Train an m × ksub × (dim/m) codebook: per subspace, deterministic
    * hash-ordered distinct seeds (the [[Similarity]] seeding rationale
    * — a hot duplicated subvector can never supply every codeword),
    * then `iters` distributed Lloyd passes (assign via one
    * [[graft.functions.PqEncodeExpr]] kernel scan, re-center via one
    * per-(subspace, code, dim) aggregate; a codeword that loses all
    * members keeps its previous value). A subspace with fewer than
    * `ksub` DISTINCT subvectors trains a smaller codebook — with every
    * distinct subvector a codeword, encoding is exact by construction
    * (the t58 gate pins this).
    *
    * Driver state per pass: the codebook itself (ksub × dim doubles)
    * — never corpus-sized.
    */
  def trainCodebook(vecs: DataFrame, vecCol: String, m: Int, ksub: Int,
                    iters: Int = 1): Array[Array[Array[Double]]] = {
    require(m >= 1, s"m must be >= 1, got $m")
    require(ksub >= 1, s"ksub must be >= 1, got $ksub")
    val dimRow = vecs.select(size(col(vecCol)).as("d")).filter(col("d") > 0).head()
    val dim = dimRow.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    val sub = subvectors(vecs.select(col(vecCol)).filter(col(vecCol).isNotNull),
      vecCol, m, dsub)
    val seedW = Window.partitionBy(col("m_idx"))
      .orderBy(xxhash64(col("sub")), col("sub").cast("string"))
    val seeds = sub.distinct()
      .withColumn("rn", row_number().over(seedW))
      .filter(col("rn") <= ksub)
      .select(col("m_idx"), col("rn"), col("sub"))
      .collect()
    var codebook: Array[Array[Array[Double]]] =
      (0 until m).map { mi =>
        seeds.filter(_.getInt(0) == mi).sortBy(_.getInt(1))
          .map(_.getSeq[Double](2).toArray)
      }.toArray
    require(codebook.forall(_.nonEmpty), "a subspace trained zero codewords")
    for (_ <- 0 until iters) {
      val cb = codebook.map(_.map(_.toSeq).toSeq).toSeq
      val means = vecs.select(col(vecCol))
        .filter(col(vecCol).isNotNull)
        .select(pq_encode(col(vecCol), cb).as("codes"), col(vecCol))
        .select(col("codes"), posexplode(array((0 until m).map(i =>
            slice(col(vecCol), i * dsub + 1, dsub).cast("array<double>")): _*))
          .as(Seq("m_idx", "sub")))
        .select(col("m_idx"),
          element_at(col("codes"), col("m_idx") + 1).as("code"),
          posexplode(col("sub")).as(Seq("d", "x")))
        .groupBy(col("m_idx"), col("code"), col("d"))
        .agg(avg(col("x")).as("mu"))
        .collect()
      val byCell = means.groupBy(r => (r.getInt(0), r.getShort(1).toInt))
      codebook = codebook.zipWithIndex.map { case (words, mi) =>
        words.zipWithIndex.map { case (old, w) =>
          byCell.get((mi, w)).fold(old) { rows =>
            rows.sortBy(_.getInt(2)).map(_.getDouble(3))
          }
        }
      }
    }
    codebook
  }

  private def toSeqs(cb: Array[Array[Array[Double]]]): Seq[Seq[Seq[Double]]] =
    cb.map(_.map(_.toSeq).toSeq).toSeq

  /** (idCol, codes ARRAY<SMALLINT>) — the compressed index frame. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             codebook: Array[Array[Array[Double]]]): DataFrame =
    corpus.select(col(idCol),
      pq_encode(col(vecCol), toSeqs(codebook)).as("codes"))

  /** Reconstruction (ARRAY<DOUBLE>) of a codes column. */
  def decode(codes: Column, codebook: Array[Array[Array[Double]]]): Column =
    pq_decode(codes, toSeqs(codebook))

  /** Approximate top-k over the COMPRESSED corpus: train (or accept) a
    * codebook, encode once, broadcast the queries, score every
    * (code row, query) with the ADC kernel, cut with the bounded-heap
    * partial top-k (no per-query funnel — see
    * [[Similarity.topKPerQuery]]). The corpus never shuffles: scoring
    * is map-side against broadcast queries, and only
    * O(partitions · |queries| · k · rerank) heap entries reach the
    * final shuffle.
    *
    * `rerank` > 1 is the standard ADC+R design (Jégou et al. 2011
    * §VI): the compressed scan shortlists k·rerank candidates per
    * query, then ONLY those rows' raw vectors are fetched (semi-join
    * on id — bounded by |queries|·k·rerank, never corpus-sized) and
    * re-scored with the exact cosine. At 100 TB the corpus scan still
    * reads nothing but codes — the rerank fetch is a point lookup set,
    * so quantization error stops costing recall without giving back
    * the compression.
    */
  def pqTopK(corpus: DataFrame, idCol: String, vecCol: String,
             queries: DataFrame, qidCol: String, qvecCol: String,
             k: Int, m: Int = 8, ksub: Int = 16, iters: Int = 1,
             rerank: Int = 1,
             codebook: Option[Array[Array[Array[Double]]]] = None): DataFrame = {
    require(rerank >= 1, s"rerank must be >= 1, got $rerank")
    val cb = codebook.getOrElse(
      trainCodebook(corpus.select(col(vecCol)), vecCol, m, ksub, iters))
    val codes = encode(corpus, idCol, vecCol, cb)
      .select(col(idCol).as("id"), col("codes"))
    val q = queries.select(col(qidCol).as("qid"), col(qvecCol).as("qvec"))
    val scored = codes
      .join(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .withColumn("cosine", pq_adc(col("codes"), col("qvec"), toSeqs(cb)))
    cutAndRerank(corpus, idCol, vecCol, q, scored, k, rerank)
  }

  /** The shared tail of every PQ serving path: cut `scored`
    * (qid, id, cosine over ADC) to k·rerank with the bounded-heap
    * partial top-k, then (rerank > 1 — the ADC+R design, Jégou et al.
    * 2011 §VI) re-score ONLY the shortlist's raw vectors with the
    * exact cosine. The shortlist rides back over the corpus scan as a
    * broadcast, so the raw-vector read prunes map-side to the
    * |queries|·k·rerank candidate set — no corpus shuffle, no
    * per-query funnel.
    */
  private def cutAndRerank(corpus: DataFrame, idCol: String, vecCol: String,
                           q: DataFrame, scored: DataFrame,
                           k: Int, rerank: Int): DataFrame = {
    val idType = corpus.schema(idCol).dataType
    if (rerank == 1) Similarity.topKPerQuery(scored, k, idType)
    else {
      val shortlist = Similarity.topKPerQuery(scored, k * rerank, idType)
        .select(col("qid").as("sq"), col("id").as("sid"))
      val exact = corpus
        .select(col(idCol).as("id"), col(vecCol).as("vec"))
        .join(broadcast(shortlist), col("id") === col("sid"))
        .join(broadcast(q), col("sq") === col("qid"))
        .withColumn("cosine",
          graft.functions.VectorFunctions.cosine_sim(col("vec"), col("qvec")))
        .select(col("qid"), col("id"), col("cosine"))
      Similarity.topKPerQuery(exact, k, idType)
    }
  }

  /** IVF-PQ — the standard 100 TB serving layout (FAISS `IVFx,PQy`):
    * the corpus is assigned ONCE to `nlist` coarse cells and stored as
    * (id, cell, codes) — compressed codes partitioned by cell — so a
    * query's ADC scan reads only its `nprobe` probed cells instead of
    * the whole corpus. [[pqTopK]] alone compresses the scan 8-32× but
    * still touches every row per query batch; the cell prune multiplies
    * that by nprobe/nlist (nprobe=4 of nlist=16 → ~25% of the corpus,
    * and at index-quality nlist in the thousands → well under 1%).
    *
    * The coarse quantizer is [[Similarity.trainCentroids]] (same
    * deterministic seeding as [[Similarity.ivfTopK]] — identical
    * parameters partition identically), probe selection is the
    * constant-codegen `top_cells` kernel, cell assignment the
    * `argmax_cell` kernel; both matrices are driver-bounded reference
    * objects (nlist × dim and ksub × dim), independent of corpus size.
    * Recall at a given (nprobe, rerank) is gated like plain PQ
    * (the t78 harness pins the production-setting floor).
    */
  def ivfPqTopK(corpus: DataFrame, idCol: String, vecCol: String,
                queries: DataFrame, qidCol: String, qvecCol: String,
                k: Int, nlist: Int = 16, nprobe: Int = 4,
                refineIters: Int = 0, m: Int = 8, ksub: Int = 16,
                iters: Int = 1, rerank: Int = 1,
                codebook: Option[Array[Array[Array[Double]]]] = None,
                centroids: Option[Array[Seq[Double]]] = None): DataFrame = {
    val cents = centroids.getOrElse(
      ivfPqTrainCentroids(corpus, vecCol, nlist, refineIters))
    val cb = codebook.getOrElse(
      trainCodebook(corpus.select(col(vecCol)), vecCol, m, ksub, iters))
    ivfPqServe(ivfPqIndex(corpus, idCol, vecCol, cents, cb),
      corpus, idCol, vecCol, queries, qidCol, qvecCol,
      k, nprobe, rerank, cents, cb)
  }

  /** The coarse half of [[ivfPqTrain]] (exposed so a caller supplying
    * its own codebook still trains centroids identically).
    */
  def ivfPqTrainCentroids(corpus: DataFrame, vecCol: String, nlist: Int,
                          refineIters: Int = 0): Array[Seq[Double]] =
    Similarity.trainCentroids(
      corpus.select(col(vecCol).as("vec")), nlist, refineIters)

  /** Train the two driver-bounded halves of an IVF-PQ index — the
    * coarse centroid matrix (nlist × dim) and the PQ codebook
    * (ksub × dim). Both are pure functions of the training corpus
    * under deterministic seeding, so any later caller holding them can
    * extend the index without touching the original data.
    */
  def ivfPqTrain(corpus: DataFrame, vecCol: String, nlist: Int = 16,
                 refineIters: Int = 0, m: Int = 8, ksub: Int = 16,
                 iters: Int = 1)
      : (Array[Seq[Double]], Array[Array[Array[Double]]]) =
    // the two halves are INDEPENDENT chains of small driver-bounded
    // jobs (seed collect + Lloyd collects each) — overlapped per
    // guide §2.6 so the training wall is max(halves), not their sum
    graft.util.Par.par2(
      ivfPqTrainCentroids(corpus, vecCol, nlist, refineIters),
      trainCodebook(corpus.select(col(vecCol)), vecCol, m, ksub, iters))

  /** (id, cell, codes) index rows for `corpus` under a FIXED index —
    * the build AND the APPEND path (the FAISS `add()` contract):
    * assignment is a pure per-row function of (vector, centroids,
    * codebook), independent of partitioning and of every other row, so
    * extending a served index with a new ingest batch is exactly this
    * over the batch, unioned (or appended to the stored cell-bucketed
    * table) — no retraining, no touching existing rows. One scan, two
    * kernel calls per row, both matrices codegen reference objects.
    * The t81 gate pins the contract: appended rows must be bit-equal
    * to what a full-corpus build assigns them.
    */
  def ivfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                 centroids: Array[Seq[Double]],
                 codebook: Array[Array[Array[Double]]]): DataFrame = {
    val cents = centroids.map(_.toIndexedSeq).toIndexedSeq
    corpus.select(col(idCol).as("id"),
      graft.functions.VectorFunctions.argmax_cell(col(vecCol), cents)
        .as("cell"),
      pq_encode(col(vecCol), toSeqs(codebook)).as("codes"))
  }

  /** Serve top-k from a prebuilt (id, cell, codes) `index`: probe the
    * `nprobe` top cells per query ([[graft.functions.TopCellsExpr]]
    * kernel), ADC-score ONLY the probed cells' code rows (the join on
    * cell is the scan prune), cut + optionally rerank against `raw`
    * (the raw-vector table, read only for the shortlist point-lookups).
    */
  def ivfPqServe(index: DataFrame, raw: DataFrame, idCol: String,
                 vecCol: String, queries: DataFrame, qidCol: String,
                 qvecCol: String, k: Int, nprobe: Int, rerank: Int,
                 centroids: Array[Seq[Double]],
                 codebook: Array[Array[Array[Double]]]): DataFrame = {
    require(rerank >= 1, s"rerank must be >= 1, got $rerank")
    require(nprobe >= 1 && nprobe <= centroids.length,
      s"nprobe must be in [1, nlist=${centroids.length}], got $nprobe")
    val cents = centroids.map(_.toIndexedSeq).toIndexedSeq
    val q = queries.select(col(qidCol).as("qid"), col(qvecCol).as("qvec"))
    val probes = q.select(col("qid"), col("qvec"),
      explode(graft.functions.VectorFunctions.top_cells(
        col("qvec"), cents, nprobe)).as("cell"))
    val scored = index.join(broadcast(probes), Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .withColumn("cosine", pq_adc(col("codes"), col("qvec"), toSeqs(codebook)))
    cutAndRerank(raw, idCol, vecCol, q, scored, k, rerank)
  }

  /** Prune accounting for [[ivfPqTopK]] — the witness that the cell
    * join actually cuts the ADC scan: (check, value) rows for
    * `scanned_rows` (code rows reaching the ADC kernel = Σ over
    * queries of their probed cells' populations), `full_scan_rows`
    * (what [[pqTopK]] would score: |corpus| · |queries|), and
    * `scan_fraction` (their ratio — ≈ nprobe/nlist under balanced
    * cells). Uses the same deterministic centroid training as
    * [[ivfPqTopK]], so the cells audited are the cells served.
    */
  def ivfPqScanAudit(corpus: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qidCol: String, qvecCol: String,
                     nlist: Int = 16, nprobe: Int = 4,
                     refineIters: Int = 0,
                     centroids: Option[Array[Seq[Double]]] = None)
      : DataFrame = {
    // centroid training is deterministic, so a caller that already
    // trained the served index passes its centroid matrix and the
    // audit skips the (bit-identical) retraining jobs
    val cents0 = centroids.getOrElse(Similarity.trainCentroids(
      corpus.select(col(vecCol).as("vec")), nlist, refineIters))
    val cents = cents0.map(_.toIndexedSeq).toIndexedSeq
    val cellSizes = corpus
      .select(graft.functions.VectorFunctions.argmax_cell(col(vecCol), cents)
        .as("cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("cn"))
    val probes = queries.select(
      explode(graft.functions.VectorFunctions.top_cells(
        col(qvecCol), cents, nprobe)).as("cell"))
    val scanned = probes.join(cellSizes, Seq("cell"))
      .agg(coalesce(sum(col("cn")), lit(0L)).cast("double").as("scanned"))
    val full = corpus.agg(count(lit(1)).as("nc"))
      .crossJoin(queries.agg(count(lit(1)).as("nq")))
      .select((col("nc") * col("nq")).cast("double").as("full"))
    scanned.crossJoin(full)
      .select(
        array(
          struct(lit("scanned_rows").as("check"), col("scanned").as("value")),
          struct(lit("full_scan_rows").as("check"), col("full").as("value")),
          struct(lit("scan_fraction").as("check"),
            round(col("scanned") / col("full"), 6).as("value"))).as("rs"))
      .select(explode(col("rs")).as("r"))
      .select(col("r.check").as("check"), col("r.value").as("value"))
  }

  /** [[pqTopK]] at fixed compression parameters as a
    * [[Similarity.TopKProvider]] — the drop-in approximate candidate
    * pass for [[Similarity.marginMine]] at extreme scale.
    */
  def pqProvider(m: Int = 8, ksub: Int = 16, iters: Int = 1,
                 rerank: Int = 1): Similarity.TopKProvider =
    (corpus, idCol, vecCol, queries, qidCol, qvecCol, k) =>
      pqTopK(corpus, idCol, vecCol, queries, qidCol, qvecCol, k,
        m, ksub, iters, rerank)

  /** [[ivfPqTopK]] at fixed index parameters as a
    * [[Similarity.TopKProvider]] — the CELL-ROUTED candidate pass for
    * [[Similarity.marginMine]], i.e. production bitext mining's
    * actual serving layout (CCMatrix mines LASER embeddings against
    * FAISS IVF-PQ indexes): where [[pqProvider]] compresses the ADC
    * scan but still touches every code row per query batch, this one
    * multiplies it by nprobe/nlist (the t78-audited prune), which is
    * what makes billion-pair mining tractable. Defaults are the
    * t272-gated production setting on the clustered corpus —
    * nlist=16, nprobe=8, ksub=256 (the FAISS-standard 8-bit
    * codebook: the t272 sweep showed a 4-bit ksub=16 codebook
    * cannot rank within DENSE near-tie clusters — same-cluster
    * codes collapse to near-identical ADC scores and the shortlist
    * goes arbitrary, recall 0.44 at sf0.1 — while 8-bit codes
    * restore 0.93), rerank=8 (exact-cosine re-scoring of the 8k
    * shortlist — bounded at |queries|*8k rows), one Lloyd round on
    * the coarse centroids.
    *
    * Stays an EXPLICITLY-requested provider rather than the
    * [[Similarity.DefaultTopK]]: each provider call trains and
    * assigns a fresh index (two per mine — one per direction), the
    * right trade only when the index amortizes over a large query
    * side or persists via the roundtrip helpers below, while the
    * training-free LSH default serves the one-shot call pattern the
    * t85 gate pins. At index scale the caller holds a served index
    * anyway and passes `ivfPqServe` partially applied.
    */
  def ivfPqProvider(nlist: Int = 16, nprobe: Int = 8, m: Int = 8,
                    ksub: Int = 256, iters: Int = 1, rerank: Int = 8,
                    refineIters: Int = 1): Similarity.TopKProvider =
    (corpus, idCol, vecCol, queries, qidCol, qvecCol, k) =>
      ivfPqTopK(corpus, idCol, vecCol, queries, qidCol, qvecCol, k,
        nlist = nlist, nprobe = nprobe, refineIters = refineIters,
        m = m, ksub = ksub, iters = iters, rerank = rerank)

  // ---- index persistence ------------------------------------------------
  //
  // The (id, cell, codes) table is already a DataFrame and persists
  // like any table; these four helpers round-trip the two DRIVER-HELD
  // halves — the coarse centroid matrix and the PQ codebook — through
  // flat (indices, value) relations, so a trained index survives as
  // three plain parquet tables and a fresh session serves it without
  // retraining (FAISS write_index/read_index, warehouse-style). The
  // collect on read is bounded by the same nlist×dim / ksub×dim driver
  // budget the training path already holds in memory.

  /** Centroid matrix → (cell, d_idx, v, n_cells, n_dim) rows. The two
    * shape columns are constant, deliberately redundant metadata:
    * inferring the shape from max(index)+1 alone cannot detect losing
    * every row of the TRAILING cell or dimension (a dropped
    * part-file), which would silently serve a smaller index.
    */
  def centroidsToDf(spark: org.apache.spark.sql.SparkSession,
                    centroids: Array[Seq[Double]]): DataFrame = {
    import spark.implicits._
    val nlist = centroids.length
    val dim = centroids.head.length
    centroids.zipWithIndex.flatMap { case (c, i) =>
      require(c.length == dim, s"ragged centroid row $i")
      c.zipWithIndex.map { case (v, d) => (i, d, v, nlist, dim) }
    }.toSeq.toDF("cell", "d_idx", "v", "n_cells", "n_dim")
  }

  /** (cell, d_idx, v) rows → centroid matrix (inverse of
    * [[centroidsToDf]]): every (cell, d_idx) slot must appear EXACTLY
    * once — duplicates and gaps both reject (a row-count check alone
    * would let a duplicate+gap pair slip through and leave an
    * unfilled slot feeding NaN into the cosine kernels, where NaN
    * ranks as the BEST score).
    */
  def centroidsFromDf(df: DataFrame): Array[Seq[Double]] = {
    val rows = df.select(col("cell").cast("int"), col("d_idx").cast("int"),
        col("v").cast("double"), col("n_cells").cast("int"),
        col("n_dim").cast("int"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2),
        r.getInt(3), r.getInt(4)))
    require(rows.nonEmpty, "empty centroid table")
    require(rows.map(r => (r._1, r._2)).distinct.length == rows.length,
      "duplicate (cell, d_idx) rows in centroid table")
    val shapes = rows.map(r => (r._4, r._5)).distinct
    require(shapes.length == 1,
      s"inconsistent shape metadata in centroid table: $shapes")
    // the DECLARED shape, not max(index)+1 — losing the trailing
    // cell's rows is detected, not silently served smaller
    val (nlist, dim) = shapes.head
    require(rows.forall(r => r._1 >= 0 && r._1 < nlist &&
        r._2 >= 0 && r._2 < dim),
      s"centroid index out of declared $nlist x $dim range")
    require(rows.length == nlist * dim,
      s"centroid table not dense: ${rows.length} rows for $nlist x $dim")
    val m = Array.fill(nlist, dim)(Double.NaN)
    rows.foreach { case (c, d, v, _, _) => m(c)(d) = v }
    m.map(_.toSeq)
  }

  /** PQ codebook → (m_idx, k_idx, d_idx, v, n_sub, n_k, n_dsub) rows.
    * Shape metadata rides every row (n_k is PER-SUBSPACE — codebooks
    * are legitimately ragged) so trailing-subspace / trailing-
    * dimension / trailing-codeword loss is detectable on read — see
    * [[centroidsToDf]].
    */
  def codebookToDf(spark: org.apache.spark.sql.SparkSession,
                   codebook: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    val m = codebook.length
    val dsub = codebook.head.head.length
    codebook.zipWithIndex.flatMap { case (sub, mi) =>
      sub.zipWithIndex.flatMap { case (cw, ki) =>
        require(cw.length == dsub, s"ragged codeword dims in subspace $mi")
        cw.zipWithIndex.map { case (v, d) =>
          (mi, ki, d, v, m, sub.length, dsub)
        }
      }
    }.toSeq.toDF("m_idx", "k_idx", "d_idx", "v", "n_sub", "n_k", "n_dsub")
  }

  /** (m_idx, k_idx, d_idx, v) rows → PQ codebook (inverse of
    * [[codebookToDf]]). RAGGED codebooks are legitimate —
    * [[trainCodebook]]'s documented contract trains a subspace with
    * fewer than ksub distinct subvectors to a SMALLER codeword set
    * (e.g. constant zero-padded tail dimensions) — so validation is
    * per-subspace: within each (m_idx, k_idx) codeword the d range
    * must be dense, codeword indices per subspace must be contiguous
    * from 0, and every slot must appear exactly once (duplicates
    * reject rather than last-write-win).
    */
  def codebookFromDf(df: DataFrame): Array[Array[Array[Double]]] = {
    val rows = df.select(col("m_idx").cast("int"), col("k_idx").cast("int"),
        col("d_idx").cast("int"), col("v").cast("double"),
        col("n_sub").cast("int"), col("n_k").cast("int"),
        col("n_dsub").cast("int"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3),
        r.getInt(4), r.getInt(5), r.getInt(6)))
    require(rows.nonEmpty, "empty codebook table")
    require(rows.map(r => (r._1, r._2, r._3)).distinct.length == rows.length,
      "duplicate (m_idx, k_idx, d_idx) rows in codebook table")
    val globals = rows.map(r => (r._5, r._7)).distinct
    require(globals.length == 1,
      s"inconsistent shape metadata in codebook table: $globals")
    val (m, dsub) = globals.head
    require(rows.map(_._1).distinct.length == m,
      s"codebook table missing subspaces: " +
        s"${rows.map(_._1).distinct.length} of $m")
    (0 until m).toArray.map { mi =>
      val sub = rows.filter(_._1 == mi)
      val ks = sub.map(_._6).distinct
      require(ks.length == 1,
        s"inconsistent n_k metadata in subspace $mi: $ks")
      val ksubI = ks.head // DECLARED codeword count, not max(k_idx)+1
      require(sub.forall(r => r._2 >= 0 && r._2 < ksubI &&
          r._3 >= 0 && r._3 < dsub),
        s"codebook index out of declared $ksubI x $dsub range in " +
          s"subspace $mi")
      require(sub.length == ksubI * dsub,
        s"codebook subspace $mi not dense: ${sub.length} rows for " +
          s"$ksubI x $dsub")
      val cw = Array.fill(ksubI, dsub)(Double.NaN)
      sub.foreach { case (_, ki, d, v, _, _, _) => cw(ki)(d) = v }
      cw
    }
  }
}

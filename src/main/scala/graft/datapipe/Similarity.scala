package graft.datapipe

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline: a broadcast of the (small)
  * query set against the corpus — one narrow pass, no shuffle except the final
  * per-query top-k. The dot product is a Catalyst higher-order expression
  * (zip_with + aggregate), NOT a UDF — it stays inside whole-stage codegen.
  *
  * The scale path is IVF: k-means-lite centroids partition the corpus into
  * `nCells` inverted lists; a query probes only `nProbe` nearest cells, cutting
  * scanned rows by ~nCells/nProbe. The write-time artifact is real here:
  * `centroids` + `assignCells` produce the cell column once (persist it
  * bucketed by cell), and `ivfTopKAssigned` serves queries against it — at
  * 100 TB the corpus pass is the cost, and IVF turns it into a
  * partition-pruned read of probed cells only. The Lloyd refinement shuffles
  * fixed-point per-dimension partial sums (O(nCells × dim) rows), never whole
  * vectors into one reducer.
  */
object Similarity {

  /** Codegen'd cosine similarity between two array<float> columns — the native
    * CosineSim expression (one static call in whole-stage codegen; bit-identical
    * to the HOF formulation below, which is kept for the parity test). */
  def cosineCol(a: String, b: String): Column =
    graft.functions.CosineSim(col(a), col(b))

  /** zip_with + aggregate higher-order-function formulation (parity baseline). */
  def cosineColHof(a: String, b: String): Column = expr(
    s"""aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)
       | / (sqrt(aggregate($a, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double)))
       |    * sqrt(aggregate($b, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double))))""".stripMargin)

  /** Exact brute-force cosine top-k: for each query row, the k nearest corpus
    * rows. queries: (qid, qvec); corpus: (id, vec). Queries are broadcast. */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qidCol: String, qvecCol: String,
                     k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val q = queries.select(col(qidCol).as("qid"), col(qvecCol).as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cosine", cosineCol("vec", "qvec"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("id"), round(col("cosine"), 4).as("cosine"), col("rk"))
  }

  /** Fixed-point scale for Lloyd partial sums: float×2^24 is exactly
    * representable in a double, so floor() is exact and long sums are
    * order-independent → centroids are bit-deterministic at any parallelism
    * (and replicable by the DuckDB oracle). */
  val FixedPoint: Long = 1L << 24

  /** Deterministic k-means-lite centroids: seeded from the first nCells rows
    * (by id order), refined with `iters` Lloyd steps computed distributed.
    *
    * Scale shape: each Lloyd step shuffles O(nCells × dim) fixed-point partial
    * sums (posexplode → groupBy(cell, dim) with map-side combine) — NEVER a
    * collect_list of vectors into one reducer, which would OOM a single task
    * on a popular cell at 100 TB. The driver collects only nCells × dim longs
    * per iteration. */
  def centroids(corpus: DataFrame, idCol: String, vecCol: String,
                nCells: Int, iters: Int = 2): Array[(Int, Array[Float])] = {
    val spark = corpus.sparkSession
    var cents: Array[(Int, Array[Float])] =
      corpus.orderBy(col(idCol)).limit(nCells)
        .select(col(vecCol)).collect()
        .zipWithIndex.map { case (r, i) => (i, r.getSeq[Float](0).toArray) }
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val assignUdf = udf { (v: Seq[Float]) => nearestCell(bc.value, v.toArray) }
      val sums = corpus
        .select(assignUdf(col(vecCol)).as("cell"), posexplode(col(vecCol)))
        .select(col("cell"), col("pos").as("dim"),
          floor(col("col").cast("double") * FixedPoint).cast("long").as("xf"))
        .groupBy("cell", "dim")
        .agg(count(lit(1)).as("n"), sum("xf").as("s"))
        .collect()
      val byCell = sums.groupBy(_.getInt(0))
      cents = cents.map { case (i, c) =>
        byCell.get(i) match {
          case Some(rows) =>
            val arr = c.clone()
            for (r <- rows) {
              val d = r.getInt(1); val n = r.getLong(2); val s = r.getLong(3)
              if (d < arr.length && n > 0) arr(d) = (s.toDouble / n / FixedPoint).toFloat
            }
            (i, arr)
          case None => (i, c)
        }
      }
    }
    cents
  }

  /** Squared L2 in double (promote floats BEFORE subtracting — keeps the
    * arithmetic identical to the DuckDB oracle's double fold). */
  private[datapipe] def sqDist(c: Array[Float], v: Array[Float]): Double = {
    var d = 0.0; var j = 0
    val L = math.min(c.length, v.length)
    while (j < L) { val t = c(j).toDouble - v(j).toDouble; d += t * t; j += 1 }
    d
  }

  private[datapipe] def nearestCell(cents: Array[(Int, Array[Float])], v: Array[Float]): Int = {
    var best = -1; var bestD = Double.MaxValue
    for ((i, c) <- cents) {
      val d = sqDist(c, v)
      if (d < bestD) { bestD = d; best = i }
    }
    best
  }

  /** Write-time cell assignment: corpus + `cell` column for the given
    * centroids. At scale this runs ONCE when the table is written (store the
    * cell as a partition/bucket column); queries then do a partition-pruned
    * read of probed cells only. */
  def assignCells(corpus: DataFrame, vecCol: String,
                  cents: Array[(Int, Array[Float])]): DataFrame = {
    val bc = corpus.sparkSession.sparkContext.broadcast(cents)
    val assignUdf = udf { (v: Seq[Float]) => nearestCell(bc.value, v.toArray) }
    corpus.withColumn("cell", assignUdf(col(vecCol)))
  }

  /** Probe UDF: the nProbe nearest cells for a query vector — distance ties
    * to the smaller cell id (the nearestCell strict-< convention, which the
    * oracle replays as ORDER BY d, cell). Shared by the IVF and IVF-PQ read
    * paths so the two can never disagree on the probe set. */
  private def probeCellsUdf(spark: org.apache.spark.sql.SparkSession,
                            cents: Array[(Int, Array[Float])], nProbe: Int) = {
    val bc = spark.sparkContext.broadcast(cents)
    udf { (v: Seq[Float]) =>
      val arr = v.toArray
      bc.value.map { case (i, c) => (i, sqDist(c, arr)) }
        .sortBy { case (i, d) => (d, i) }.take(nProbe).map(_._1)
    }
  }

  /** IVF approximate top-k over a corpus whose `cell` column is already
    * assigned (the write-time artifact): each query probes the nProbe nearest
    * cells only. */
  def ivfTopKAssigned(assigned: DataFrame, idCol: String, vecCol: String,
                      queries: DataFrame, qidCol: String, qvecCol: String,
                      k: Int, cents: Array[(Int, Array[Float])], nProbe: Int): DataFrame = {
    val spark = assigned.sparkSession
    val probeUdf = probeCellsUdf(spark, cents, nProbe)
    val c = assigned.select(col(idCol).as("id"), col(vecCol).as("vec"), col("cell"))
    val q = queries.select(col(qidCol).as("qid"), col(qvecCol).as("qvec"))
      .withColumn("cell", explode(probeUdf(col("qvec"))))
    val scored = c.join(broadcast(q), "cell")
      .withColumn("cosine", cosineCol("vec", "qvec"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("id"), round(col("cosine"), 4).as("cosine"), col("rk"))
  }

  /** IVF approximate top-k, one-shot convenience: centroids + assignment
    * computed inline (for repeated query loads, compute `centroids` once,
    * persist `assignCells` output bucketed by cell, and call
    * `ivfTopKAssigned`). */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qidCol: String, qvecCol: String,
              k: Int, nCells: Int = 16, nProbe: Int = 4,
              precomputed: Option[Array[(Int, Array[Float])]] = None): DataFrame = {
    val cents = precomputed.getOrElse(centroids(corpus, idCol, vecCol, nCells))
    val assigned = assignCells(corpus.select(col(idCol), col(vecCol)), vecCol, cents)
    ivfTopKAssigned(assigned, idCol, vecCol, queries, qidCol, qvecCol, k, cents, nProbe)
  }

  /** SemDeDup-style semantic deduplication (cluster-then-prune, the published
    * scale recipe for embedding dedup — Abbas et al. 2023, arXiv:2303.09540):
    * instead of LSH-bucketing all pairs ([[cosineNearDuplicates]]), reuse the
    * IVF write-time artifact — k-means cells partition the corpus, and only
    * WITHIN-cell pairs are compared. At 100 TB the number of cells scales
    * with the corpus, so per-cell work is constant and the whole pass is one
    * cell-keyed shuffle + a co-partitioned self-join; there is never a
    * corpus×corpus candidate stage.
    *
    * Pruning rule (deterministic, oracle-replayable): a row is DROPPED iff
    * some same-cell row with a smaller id has cosine ≥ threshold to it —
    * the "keep the first seen" convention of the exact-dedup ops, applied to
    * the similarity relation. (The paper keeps one representative per
    * within-cluster duplicate group; smallest-id domination is the
    * one-pass distributed variant of that choice.) Cells larger than
    * `maxCell` are passed through un-pruned — the same oversized-bucket
    * convention as every LSH band cap in [[Dedup]]; at real scale the cell
    * count is sized so no cell exceeds it.
    *
    * Input `assigned` must carry (idCol, vecCol, "cell") — the persisted
    * cell-assigned corpus from [[assignCells]]. Returns every input row as
    * (id, cell, kept). */
  def semanticDedup(assigned: DataFrame, idCol: String, vecCol: String,
                    threshold: Double = 0.3, maxCell: Int = 4096): DataFrame = {
    val a0 = assigned.select(col(idCol).as("id"), col(vecCol).as("vec"), col("cell"))
    // cell sizes are an nCells-row aggregate — broadcast them onto the corpus
    // instead of a window over the cell partitioning, which Spark would
    // re-execute (shuffle and all) on BOTH sides of the self-join below
    val sizes = a0.groupBy("cell").agg(count(lit(1)).as("csz"))
    val pairable = a0.join(
      broadcast(sizes.filter(col("csz").between(2, maxCell))), Seq("cell"))
    val l = pairable.select(col("cell"), col("id").as("id_a"), col("vec").as("vec_a"))
    val r = pairable.select(col("cell"), col("id").as("id_b"), col("vec").as("vec_b"))
    val dominated = l.join(r, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      // round-4 double cosine — the exact parity contract of
      // cosineNearDuplicates' verify step (both engines fold doubles in
      // array order, so the rounded value is bit-identical)
      .filter(round(cosineCol("vec_a", "vec_b"), 4) >= threshold)
      .select(col("id_b").as("id")).distinct()
    a0.join(dominated.withColumn("dom", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cell"), col("dom").isNull.as("kept"))
  }

  // ---- product quantization (Jégou, Douze, Schmid 2011: "Product
  // Quantization for Nearest Neighbor Search", IEEE TPAMI 33(1)) ----

  /** Fixed-point scale for ADC distances: per-subspace squared distances are
    * floored to integers BEFORE summing, so the total is an exact long —
    * order-independent across engines and partitions (same trick as the
    * Lloyd partial sums). */
  val AdcFixedPoint: Long = 1L << 24

  /** Per-subspace PQ codebooks: the vector is split into `m` contiguous
    * subspaces of dim/m dimensions; each subspace gets `kSub` centroids from
    * the SAME bit-deterministic fixed-point Lloyd as the IVF coarse
    * quantizer ([[centroids]] on the sliced corpus). Returns
    * (subspace, code, subCentroid) rows — small (m × kSub), broadcast-sized
    * by construction, and dumpable as an aux parquet for the DuckDB oracle.
    *
    * Scale: training touches the corpus m × iters times but shuffles only
    * fixed-point partial sums (never vectors); at 100 TB you train on a
    * deterministic hash-sample and encode the full corpus once at write
    * time, exactly like the IVF cell assignment. */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                  m: Int = 8, kSub: Int = 16,
                  iters: Int = 2): Array[(Int, Int, Array[Float])] = {
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    (0 until m).flatMap { s =>
      val sliced = corpus.select(col(idCol),
        expr(s"slice($vecCol, ${s * subDim + 1}, $subDim)").as(vecCol))
      centroids(sliced, idCol, vecCol, kSub, iters)
        .map { case (code, cent) => (s, code, cent) }
    }.toArray
  }

  /** Write-time PQ encoding: corpus + `codes` column (array<int>, length m)
    * — each vector compressed to m small codes (m bytes at kSub ≤ 256
    * against 4·dim bytes raw: the memory-compression half of PQ). Nearest
    * sub-centroid per subspace, ties to the smallest code (the [[nearestCell]]
    * strict-< convention, which the oracle replays as ORDER BY d, code). */
  def pqEncode(corpus: DataFrame, vecCol: String,
               books: Array[(Int, Int, Array[Float])]): DataFrame = {
    val bySub = books.groupBy(_._1).map { case (s, rows) =>
      (s, rows.sortBy(_._2).map(_._3))
    }
    val m = bySub.size
    val subDim = books.head._3.length
    val bc = corpus.sparkSession.sparkContext.broadcast(bySub)
    val encodeUdf = udf { (v: Seq[Float]) =>
      val arr = v.toArray
      (0 until m).map { s =>
        val sub = java.util.Arrays.copyOfRange(arr, s * subDim, (s + 1) * subDim)
        val cents = bc.value(s)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cents.length) {
          val d = sqDist(cents(c), sub)
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        best
      }.toArray
    }
    corpus.withColumn("codes", encodeUdf(col(vecCol)))
  }

  /** PQ approximate top-k by asymmetric distance (ADC): the query keeps its
    * full-precision vector; each encoded corpus row is scored as
    * Σ_s floor(‖q_s − book_s[code_s]‖² × 2^24) — an exact long, so ranking
    * is bit-stable across engines. Smaller is nearer; ties to the smaller
    * id. `encoded` is the write-time [[pqEncode]] artifact — compose with
    * the IVF cell column to probe-prune BEFORE scoring (IVF-PQ): the scan
    * reads only probed cells' codes, m bytes per row, never the raw
    * vectors. */
  def pqTopKEncoded(encoded: DataFrame, idCol: String,
                    queries: DataFrame, qidCol: String, qvecCol: String,
                    k: Int, books: Array[(Int, Int, Array[Float])]): DataFrame = {
    val adcUdf = adcScoreUdf(encoded.sparkSession, books)
    val c = encoded.select(col(idCol).as("id"), col("codes"))
    val q = queries.select(col(qidCol).as("qid"), col(qvecCol).as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("adc", adcUdf(col("qvec"), col("codes")))
    val w = Window.partitionBy("qid").orderBy(col("adc").asc, col("id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("id"), col("adc"), col("rk"))
  }

  /** ADC scoring UDF: Σ_s floor(‖q_s − book_s[code_s]‖² × 2^24) as an exact
    * long — shared by the full-scan ([[pqTopKEncoded]]) and cell-pruned
    * ([[ivfPqTopKEncoded]]) paths so both rank with identical arithmetic. */
  private def adcScoreUdf(spark: org.apache.spark.sql.SparkSession,
                          books: Array[(Int, Int, Array[Float])]) = {
    val bySub = books.groupBy(_._1).map { case (s, rows) =>
      (s, rows.sortBy(_._2).map(_._3))
    }
    val m = bySub.size
    val subDim = books.head._3.length
    val bc = spark.sparkContext.broadcast(bySub)
    udf { (q: Seq[Float], codes: Seq[Int]) =>
      val arr = q.toArray
      var total = 0L
      var s = 0
      while (s < m) {
        val sub = java.util.Arrays.copyOfRange(arr, s * subDim, (s + 1) * subDim)
        val d = sqDist(bc.value(s)(codes(s)), sub)
        total += math.floor(d * AdcFixedPoint).toLong
        s += 1
      }
      total
    }
  }

  /** IVF-PQ composed top-k (the Jégou et al. 2011 IVFADC read path): the
    * corpus artifact carries BOTH write-time columns — the IVF `cell` and the
    * PQ `codes` — so a query (a) probes its nProbe nearest cells and joins on
    * `cell` FIRST, pruning the scan to probed cells only, then (b) ranks the
    * surviving rows by the same exact-integer ADC as [[pqTopKEncoded]]. At
    * 100 TB the scan reads only probed cells' code columns (m bytes/row,
    * cell-partition-pruned) — never raw vectors, never the full corpus; this
    * is the registered scale path the full-scan ADC query is the baseline
    * for. `encoded` must carry (idCol, "codes", "cell"). */
  def ivfPqTopKEncoded(encoded: DataFrame, idCol: String,
                       queries: DataFrame, qidCol: String, qvecCol: String,
                       k: Int, cents: Array[(Int, Array[Float])], nProbe: Int,
                       books: Array[(Int, Int, Array[Float])]): DataFrame = {
    val spark = encoded.sparkSession
    val probeUdf = probeCellsUdf(spark, cents, nProbe)
    val adcUdf = adcScoreUdf(spark, books)
    val c = encoded.select(col(idCol).as("id"), col("codes"), col("cell"))
    val q = queries.select(col(qidCol).as("qid"), col(qvecCol).as("qvec"))
      .withColumn("cell", explode(probeUdf(col("qvec"))))
    // cell-equality join BEFORE any ADC work: the pruning gate is in the plan
    val scored = c.join(broadcast(q), "cell")
      .withColumn("adc", adcUdf(col("qvec"), col("codes")))
    val w = Window.partitionBy("qid").orderBy(col("adc").asc, col("id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("id"), col("adc"), col("rk"))
  }

  // ---------- scalar quantization (SQ8) ----------

  /** INT8 scalar quantization of the embedding column — the memory-bound
    * companion to PQ: one signed byte per dimension plus one per-vector
    * scale (4× smaller than float32 and integer-SIMD-friendly, vs PQ's
    * m bytes/row at coarser fidelity). `code_i = round(127 · v_i / s)` with
    * `s = max_i |v_i|`, so codes span [-127, 127]; the all-zero vector gets
    * s = 1 and all-zero codes. Write-time artifact: encode once at ingest,
    * every query ranks from the codes — at 10^12 vectors the float32
    * embeddings never need to be read again for search.
    * Pure Catalyst HOFs (no UDF); round() is HALF_UP in both engines, so
    * the DuckDB oracle re-derives identical codes from the same floats. */
  def sq8Encode(corpus: DataFrame, vecCol: String): DataFrame = corpus
    .withColumn("sq8_scale",
      expr(s"aggregate($vecCol, 0D, (a, x) -> greatest(a, abs(cast(x as double))))"))
    .withColumn("sq8_scale",
      when(col("sq8_scale") === 0.0, lit(1.0)).otherwise(col("sq8_scale")))
    .withColumn("sq8_codes",
      expr(s"transform($vecCol, x -> cast(round(cast(x as double) * 127.0D / sq8_scale) as int))"))

  /** Top-k per query over SQ8 codes: the integer dot product
    * `idot = Σ qc_i · vc_i` is exact and order-independent; ranking uses
    * `qs · vs · idot` (the de-quantized approximate dot — two per-row
    * doubles whose product both engines compute identically), ties broken
    * by id. Queries are quantized with the same encoder and broadcast;
    * the corpus side streams codes only — the scan never touches the
    * float32 column (`ReadSchema` prunes to id + scale + codes when the
    * encoded table is materialized). */
  def sq8TopKEncoded(encoded: DataFrame, idCol: String,
                     queries: DataFrame, qidCol: String, qvecCol: String,
                     k: Int): DataFrame = {
    val q = sq8Encode(
        queries.select(col(qidCol).as("qid"), col(qvecCol).as("qvec")), "qvec")
      .select(col("qid"), col("sq8_scale").as("qs"), col("sq8_codes").as("qc"))
    val c = encoded.select(col(idCol).as("id"),
      col("sq8_scale").as("vs"), col("sq8_codes").as("vc"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("idot", expr(
        "aggregate(zip_with(qc, vc, (x, y) -> cast(x as bigint) * cast(y as bigint)), 0L, (a, v) -> a + v)"))
      .withColumn("score", col("qs") * col("vs") * col("idot"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("id"), col("idot"), col("rk"))
  }

  /** Deterministic seeded Gaussian hyperplanes (the LSH projection basis).
    * Exposed so Verify can dump them as an aux parquet — the DuckDB oracle
    * recomputes the exact signatures from the same planes. */
  def hyperplanes(dim: Int, nPlanes: Int, seed: Long = 42L): Array[Array[Float]] = {
    val r = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(r.nextGaussian().toFloat))
  }

  /** Embedding-cosine near-duplicate pairs (cosine ≥ threshold) via random
    * hyperplane LSH banding; exact verify on candidates. */
  def cosineNearDuplicates(corpus: DataFrame, idCol: String, vecCol: String,
                           threshold: Double = 0.95, nPlanes: Int = 16,
                           bands: Int = 4, seed: Long = 42L, maxBucket: Int = 256): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    val planes = hyperplanes(dim, nPlanes, seed)
    val bcP = corpus.sparkSession.sparkContext.broadcast(planes)
    val sigUdf = udf { (v: Seq[Float]) =>
      val arr = v.toArray
      var sig = 0L
      for (p <- bcP.value.indices) {
        var d = 0.0; var j = 0
        val pl = bcP.value(p)
        val L = math.min(pl.length, arr.length)
        // promote BEFORE multiplying: double products, double accumulation —
        // the same arithmetic the SQL oracle's double fold performs
        while (j < L) { d += pl(j).toDouble * arr(j).toDouble; j += 1 }
        if (d >= 0) sig |= (1L << p)
      }
      sig
    }
    val rows = nPlanes / bands
    val mask = (1L << rows) - 1
    val sigs = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("sig", sigUdf(col("vec")))
      .localCheckpoint(false)
    val banded = sigs.select(col("id"),
      posexplode(expr(s"transform(sequence(0, ${bands - 1}), b -> (sig >> (b * $rows)) & $mask)")))
      .select(col("id"), col("pos").as("band"), col("col").as("chunk"))
    // two-pass bounded bucket build (Dedup.boundedBuckets): hot keys are
    // count-filtered BEFORE the collect_list, so no aggregation buffer ever
    // materializes an over-cap membership array (same membership — see the
    // helper's equivalence note)
    val buckets = Dedup.boundedBuckets(banded, Seq("band", "chunk"), maxBucket)
      .agg(collect_list("id").as("ids"))
    // ordered within-bucket pairs, pure Catalyst and id-type-generic
    // (Dedup.bucketPairRows: projected sort + two Generates — no UDF
    // boundary, no per-pair re-sort, O(k) peak memory per bucket)
    val pairs = Dedup.bucketPairRows(buckets, "ids").distinct()
    pairs
      .join(sigs.select(col("id").as("id_a"), col("vec").as("vec_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("vec").as("vec_b")), "id_b")
      .withColumn("cosine", round(cosineCol("vec_a", "vec_b"), 4))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Recall@k of an approximate ANN result against the exact baseline — the
    * index-quality metric a production pipeline monitors whenever the IVF /
    * PQ artifacts are rebuilt (probe count and cell count are tuned against
    * exactly this number). Both inputs carry (qid, id) rows with ≤ k rows
    * per qid (the shape of [[bruteForceTopK]] / [[ivfTopKAssigned]] /
    * pqTopKEncoded output). Integer-exact per-mille recall (floor division)
    * so the result is engine-reproducible bit-for-bit.
    *
    * Scale shape: one left-semi join on (qid, id) — both sides are
    * (queries × k)-sized result tables, ≪ corpus — then two query-sized
    * aggregates. Nothing corpus-sized moves. */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val hits = exact.select("qid", "id")
      .join(approx.select("qid", "id"), Seq("qid", "id"), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    val totals = exact.groupBy("qid").agg(count(lit(1)).as("k"))
    totals.join(hits, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        col("k"),
        expr("coalesce(hits, 0L) * 1000L div k").as("recall_permille"))
  }
}

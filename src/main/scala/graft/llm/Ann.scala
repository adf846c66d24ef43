package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Scale design:
  *  - brute-force top-k is the exact baseline: one map stage (cosine
  *    via the native fused-loop CosineSim expression, whole-stage
  *    codegen) + a TakeOrdered - no shuffle of the full table, no
  *    collect.
  *  - the LSH path buckets vectors by random-hyperplane sign bits;
  *    queries only scan their own bucket (plus optional multi-probe
  *    neighbors), so cluster-wide cost drops from O(N) per query to
  *    O(N / 2^bits) - the standard SimHash-for-cosine scheme
  *    (Charikar '02).
  *  - pairwise near-dup joins only within buckets - never a crossJoin.
  */
object Ann {

  /** Double-precision dot product of two array columns (float inputs
    * upcast per element so accumulation is IEEE-double) via the native
    * fused-loop [[graft.functions.DotProduct]] - folds in ascending
    * index order, bit-identical to the aggregate(zip_with) HOF it
    * replaces, and usable inside centroid-list lambdas without the
    * nested interpreted loop. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(graft.functions.DotProduct(
      org.apache.spark.sql.GraftSqlBridge.expression(a),
      org.apache.spark.sql.GraftSqlBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity via the native fused-loop
    * [[graft.functions.CosineSim]] expression: one pass over both
    * arrays inside whole-stage codegen. The HOF formulation this
    * replaces (aggregate + zip_with, three array walks) is
    * CodegenFallback - interpreted, a lambda call per element - and
    * the native kernel folds in the same ascending index order, so
    * every double (and every oracle hash) is bit-identical. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(graft.functions.CosineSim(
      org.apache.spark.sql.GraftSqlBridge.expression(a),
      org.apache.spark.sql.GraftSqlBridge.expression(b)))

  /** Exact brute-force cosine top-k for one query vector. The plan is a
    * single scan + TakeOrderedAndProject - the right baseline at any
    * scale, and the verifier for the LSH path. */
  def cosineTopK(embeddings: DataFrame, query: Seq[Double], k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = array(query.map(lit): _*)
    embeddings
      .select(col(idCol), cosine(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Deterministic random hyperplanes (seeded) as literal arrays - tiny,
    * so they inline into the expression tree and broadcast for free. */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(bits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket id of a vector under the given hyperplanes. */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.foldLeft(lit(0L)) { case (acc, (p, i)) =>
      acc + when(dot(vec, array(p.map(lit): _*)) > 0, shiftleft(lit(1L), i))
        .otherwise(0L)
    }

  /** Driver-side bucket of a query vector under the same hyperplanes. */
  def queryBucket(query: Seq[Double], planes: Seq[Seq[Double]]): Long =
    planes.zipWithIndex.foldLeft(0L) { case (acc, (p, i)) =>
      val d = p.zip(query).map { case (a, b) => a * b }.sum
      if (d > 0) acc | (1L << i) else acc
    }

  /** Random-projection dimensionality reduction: project each embedding
    * onto `planes` (a literal matrix of driver-side rows, e.g. from
    * [[hyperplanes]]) - the Johnson-Lindenstrauss sketch that shrinks a
    * 1024-dim embedding column to 8-64 dims while approximately
    * preserving pairwise distances. Pure map stage of codegen'd dot
    * products; the plane matrix inlines into the expression tree, so
    * nothing is broadcast or joined. Adds `projected: array<double>`. */
  def randomProject(embeddings: DataFrame, planes: Seq[Seq[Double]],
                    vecCol: String = "embedding"): DataFrame =
    embeddings.withColumn("projected",
      array(planes.map(p => dot(col(vecCol), array(p.map(lit): _*))): _*))

  /** Scalar quantization of an array<double> column to int64 grid
    * cells (`floor(x * scale)`): the compressed representation stored
    * by vector indexes (per-component int8/int16 in real indexes; the
    * grid index is the engine-level primitive). Quantization also makes
    * projected values comparable across engines - a raw double dot
    * product differs by ~1 ulp between summation orders, a grid cell at
    * any sane scale does not. */
  def quantize(vec: Column, scale: Double): Column =
    transform(vec, x => floor(x * scale).cast("long"))

  /** Product-quantization code assignment - the PQ compression step of
    * an IVF-PQ index (Jegou et al. '11): the vector splits into
    * `codebooks.size` contiguous subvectors, and each subvector is
    * assigned the id of its nearest (L2) codeword in that subspace's
    * codebook. Codebooks are literal driver-side matrices (trained
    * offline, like IVF centroids), so this is a pure map stage of
    * codegen'd dot products - the representation that stores a 100 TB
    * float corpus in m bytes per vector.
    *
    * argmin_c ||s - c||^2 = argmax_c (s.c - |c|^2/2) since |s|^2 is
    * constant per subvector - dot products only, the same numeric
    * surface the IVF oracles already prove engine-exact. First-max
    * tie-break via array_position. Adds one int column per subspace
    * (`pq_code_<j>`). */
  def pqAssign(embeddings: DataFrame, codebooks: Seq[Seq[Seq[Double]]],
               vecCol: String = "embedding"): DataFrame = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty codebook")
    val subDim = codebooks.head.head.size
    codebooks.zipWithIndex.foldLeft(embeddings) { case (df, (cb, j)) =>
      val sub = slice(col(vecCol), j * subDim + 1, subDim)
      val scores = array(cb.map { c =>
        val half = c.map(x => x * x).sum / 2.0
        dot(sub, array(c.map(lit): _*)) - lit(half)
      }: _*)
      df.withColumn(s"pq_code_$j",
        (array_position(scores, array_max(scores)) - 1).cast("int"))
    }
  }

  /** Unit-normalized centroids - the driver-side precompute ivfAssign
    * bakes into its plan (see there for why). */
  def unitCentroids(centroids: Seq[Seq[Double]]): Seq[Seq[Double]] =
    centroids.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0) c else c.map(_ / n)
    }

  /** Driver-side probe-cell choice for ivfTopK: the nprobe cells whose
    * centroids are cosine-closest to the query (lowest index on ties). */
  def probeCells(query: Seq[Double], centroids: Seq[Seq[Double]],
                 nprobe: Int): Seq[Int] = {
    def norm(v: Seq[Double]) = math.sqrt(v.map(x => x * x).sum)
    val qn = norm(query)
    val cellSims = centroids.zipWithIndex.map { case (c, i) =>
      val d = norm(c) * qn
      val sim = if (d == 0) 0.0 else c.zip(query).map { case (a, b) => a * b }.sum / d
      (i, sim)
    }
    cellSims.sortBy { case (i, sim) => (-sim, i) }
      .take(math.max(1, nprobe)).map(_._1)
  }

  /** ANN top-k: restrict the exact scan to the query's LSH bucket.
    * `bits` trades recall for speed (each bit halves the candidate set).
    * Falls back to nothing gracefully: callers wanting guaranteed k
    * should multi-probe (probe=1 flips each single bit). */
  def annTopK(embeddings: DataFrame, query: Seq[Double], k: Int,
              dim: Int, bits: Int = 8, probe: Int = 1, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplanes(dim, bits, seed)
    // query bucket + optional 1-bit-flip probes, computed on the driver
    val qBucket = queryBucket(query, planes)
    val probes: Seq[Long] =
      if (probe <= 0) Seq(qBucket)
      else qBucket +: (0 until bits).map(b => qBucket ^ (1L << b))

    val q = array(query.map(lit): _*)
    embeddings
      .withColumn("bucket", lshBucket(col(vecCol), planes))
      .filter(col("bucket").isin(probes: _*)) // partition-prunable predicate
      .select(col(idCol), cosine(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucketed self-join plus
    * exact cosine verification within buckets. Vectors are L2-normalized
    * BEFORE the join so the per-pair work is one dot product - norms are
    * computed n times, not n^2 times. Each vector lives in exactly one
    * bucket, so pairs are unique by construction (no dedupe pass).
    *
    * Scale guards against degenerate clusters (many near-identical
    * embeddings - exactly what a dedup corpus contains):
    *  1. buckets over `maxBucketSize` are SUB-SPLIT by `refineBits`
    *     additional hyperplanes (finer LSH, same cosine guarantee
    *     probabilistically - near-identical vectors still share the sign
    *     bits of the refining planes w.h.p.);
    *  2. buckets still oversized after refinement are dropped - such a
    *     bucket is a cluster of >maxBucketSize mutually-near-identical
    *     vectors whose true pair output is itself quadratic; emitting it
    *     would be as pathological as computing it. Exact dedup first is
    *     the right treatment for those.
    * Worst-case candidate count is bounded by buckets * cap^2 regardless
    * of input skew. */
  def cosineNearDupPairs(embeddings: DataFrame, dim: Int, threshold: Double = 0.95,
                         bits: Int = 10, seed: Long = 42L,
                         maxBucketSize: Int = 2000, refineBits: Int = 8,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplanes(dim, bits, seed)
    val refinePlanes = hyperplanes(dim, refineBits, seed + 1)
    // stage the norm as a column FIRST: embedding it inside the transform
    // lambda would re-evaluate the whole norm expression once per element
    // (O(dim^2) per row - the quadratic HOF re-evaluation trap)
    val withNorm = embeddings.select(col(idCol).as("id"), col(vecCol),
      norm(col(vecCol)).as("nrm"), lshBucket(col(vecCol), planes).as("bucket"),
      lshBucket(col(vecCol), refinePlanes).as("refine"))
    val unit = when(col("nrm") === 0, transform(col(vecCol), _ => lit(0.0)))
      .otherwise(transform(col(vecCol), x => x.cast("double") / col("nrm")))
    val bucketed = withNorm.select(col("id"), unit.as("v"), col("bucket"), col("refine"))

    // guard 1: sub-split oversized buckets with the refining planes
    val wB = Window.partitionBy(col("bucket"))
    val refined = bucketed.withColumn("bSize", count(lit(1)).over(wB))
      .withColumn("sub", when(col("bSize") > maxBucketSize, col("refine")).otherwise(lit(-1L)))
      .drop("bSize", "refine")
    // guard 2: hard cap after refinement (degenerate identical-vector cluster)
    val wB2 = Window.partitionBy(col("bucket"), col("sub"))
    val bounded = refined.withColumn("bSize", count(lit(1)).over(wB2))
      .filter(col("bSize") <= maxBucketSize).drop("bSize")

    val l = bounded.select(col("bucket"), col("sub"), col("id").as("id_a"), col("v").as("v_a"))
    val r = bounded.select(col("bucket"), col("sub"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("bucket", "sub"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", dot(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** IVF-style coarse quantization: assign each vector to its nearest of
    * `centroids` (tiny literal list, e.g. trained offline); queries scan
    * only the closest `nprobe` cells. This is the scale path when LSH
    * recall is insufficient. */
  /** IVF probe search: scan only the `nprobe` cells whose centroids are
    * closest to the query (cell choice is a driver-side computation over
    * the tiny centroid list), exact cosine within them. With cell
    * assignment precomputed and the table partitioned/bucketed by
    * `ivf_cell`, the filter prunes partitions and the per-query scan cost
    * drops from O(N) to O(N * nprobe / cells). */
  def ivfTopK(embeddings: DataFrame, query: Seq[Double], k: Int,
              centroids: Seq[Seq[Double]], nprobe: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val probes = probeCells(query, centroids, nprobe)
    val q = array(query.map(lit): _*)
    ivfAssign(embeddings, centroids, vecCol)
      .filter(col("ivf_cell").isin(probes: _*)) // partition-prunable
      .select(col(idCol), cosine(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Full IVF-PQ search with asymmetric-distance computation (ADC,
    * Jegou et al. '11) - the compressed-index form of [[ivfTopK]]: the
    * corpus is stored as [[pqAssign]] codes (m small ints per vector,
    * the representation that fits a 100 TB float corpus in RAM), and a
    * query scores a row WITHOUT touching its floats. Per query the
    * driver precomputes two tiny lookup tables over the codebooks -
    * T_j[c] = q_j . c and N_j[c] = |c|^2 - and the per-row approximate
    * cosine is
    *
    *   sum_j T_j[code_j] / (|q| * sqrt(sum_j N_j[code_j]))
    *
    * - m literal-array lookups and one division, a pure codegen'd map
    * over the probed cells (coarse IVF filter first, as in ivfTopK; at
    * scale the code table is bucketed by ivf_cell so the probe is a
    * partition prune). The lookup sums are fixed-order over literal
    * doubles, so an independent engine reproduces them bit-for-bit -
    * tighter than the float-scan oracles, whose ~ulp summation margins
    * the ANN convention documents. */
  def ivfPqTopK(embeddings: DataFrame, query: Seq[Double], k: Int,
                centroids: Seq[Seq[Double]],
                codebooks: Seq[Seq[Seq[Double]]], nprobe: Int = 2,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty codebook")
    val subDim = codebooks.head.head.size
    require(codebooks.size * subDim == query.size,
      s"codebooks cover ${codebooks.size * subDim} dims, query has ${query.size}")
    val probes = probeCells(query, centroids, nprobe)
    val qnorm = math.sqrt(query.map(x => x * x).sum)
    val tTables = codebooks.zipWithIndex.map { case (cb, j) =>
      cb.map(c => c.zipWithIndex.map { case (x, i) =>
        x * query(j * subDim + i) }.sum)
    }
    val nTables = codebooks.map(_.map(c => c.map(x => x * x).sum))
    val coded = pqAssign(
      ivfAssign(embeddings.filter(col(vecCol).isNotNull), centroids, vecCol)
        .filter(col("ivf_cell").isin(probes: _*)), // partition-prunable
      codebooks, vecCol)
    val dotApprox = codebooks.indices.map { j =>
      element_at(array(tTables(j).map(lit): _*), col(s"pq_code_$j") + 1)
    }.reduce(_ + _)
    val normSq = codebooks.indices.map { j =>
      element_at(array(nTables(j).map(lit): _*), col(s"pq_code_$j") + 1)
    }.reduce(_ + _)
    coded
      .select(col(idCol),
        (dotApprox / (lit(qnorm) * sqrt(normSq))).as("adc_cosine"))
      .orderBy(col("adc_cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Lloyd k-means over the embedding column - the "train the IVF
    * centroids offline" step. Assignment reuses [[ivfAssign]] (cosine,
    * like the probe search); the update step computes per-(cell,
    * dimension) means with one hash aggregation (posexplode rows combine
    * map-side, so the shuffle carries k*dim partial sums per mapper, not
    * the data). Only the k*dim centroid matrix ever reaches the driver -
    * that is the IVF contract (centroids are a broadcastable literal).
    *
    * Deterministic farthest-point init (k-means++ without the random
    * draw): seed 1 is the lowest-id vector; each next seed is the vector
    * minimizing its max cosine to the seeds so far (ties by id). One
    * min_by aggregation per seed - k-1 passes over the data, each a
    * map-side-combining scan, no collect beyond the k seed vectors.
    * Separated clusters always get one seed each, which plain
    * lowest-k-ids or hash-bucket sampling cannot guarantee. Empty cells
    * during Lloyd keep their previous centroid. */
  def kmeansCentroids(embeddings: DataFrame, k: Int, iters: Int = 5,
                      idCol: String = "vec_id", vecCol: String = "embedding")
      : Seq[Seq[Double]] = {
    val rows = embeddings.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val first = rows.orderBy(col("id")).limit(1)
      .collect().map(_.getSeq[Double](1).toSeq)
    require(first.nonEmpty, "kmeansCentroids on an empty table")
    val init: Seq[Seq[Double]] = (1 until k).foldLeft(first.toVector) { (seeds, _) =>
      val sims = seeds.map(sv => cosine(col("v"), array(sv.map(lit): _*)))
      val maxSim = sims.reduce((a, b) => greatest(a, b))
      val next = rows
        .agg(min_by(col("v"), struct(maxSim.as("s"), col("id"))).as("v"))
        .head().getSeq[Double](0).toSeq
      seeds :+ next
    }
    require(init.size == k, s"need at least $k vectors, found ${init.size}")
    (0 until iters).foldLeft(init) { (cents, _) =>
      val means = ivfAssign(embeddings, cents, vecCol)
        .select(col("ivf_cell"), posexplode(col(vecCol)))
        .groupBy(col("ivf_cell"), col("pos"))
        .agg(avg(col("col").cast("double")).as("m"))
        .collect()
      val byCell = means.groupBy(_.getInt(0))
      cents.indices.map { c =>
        byCell.get(c)
          .map(_.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
          .getOrElse(cents(c))
      }
    }
  }

  /** One Lloyd update step as an oracle-checkable DataFrame: assignment
    * via [[ivfAssign]] (cosine argmax, first-max tie-break), update =
    * per-(cell, dimension) mean over coordinates quantized to an integer
    * grid (floor(x*scale)), so the aggregation is an exact integer sum
    * in any engine followed by one int/int division - the engine-stable
    * registered surface for the iterative [[kmeansCentroids]] (which
    * averages raw doubles; a cross-engine double sum is accumulation-
    * order noise, so THAT stays unit-pinned against planted clusters).
    * Same plan shape as the real update: one hash aggregation with
    * map-side combine, k*dim result rows.
    *
    * Null embeddings are filtered (a null vector has no coordinates to
    * contribute; leaving the row in would let its ivf_cell assignment
    * count toward nothing on this side while a naive per-dimension
    * oracle still counts it in `n`). Vectors shorter than the nominal
    * dimension remain a precondition: coordinates are produced only for
    * positions present in the array, so ragged inputs diverge from any
    * fixed-width recomputation - inputs must be fixed-width, like the
    * other ANN oracles. */
  def kmeansStep(embeddings: DataFrame, centroids: Seq[Seq[Double]],
                 scale: Double = 1000.0,
                 vecCol: String = "embedding"): DataFrame =
    ivfAssign(embeddings.filter(col(vecCol).isNotNull), centroids, vecCol)
      .select(col("ivf_cell"), posexplode(col(vecCol).cast("array<double>")))
      .groupBy(col("ivf_cell"), col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("col") * scale)).as("qsum"))
      .withColumn("mean_q", col("qsum").cast("double") / col("n"))

  def ivfAssign(embeddings: DataFrame, centroids: Seq[Seq[Double]],
                vecCol: String = "embedding"): DataFrame = {
    // argmax_i cos(v, c_i) = argmax_i dot(v, c_i/|c_i|): the row norm |v|
    // scales every similarity equally, so pre-normalizing the centroids on
    // the driver removes it from the plan entirely. The sims array is
    // materialized once per row; a naive when-chain reduction over
    // per-centroid structs duplicates the accumulated tree at every step
    // (2^k leaf copies, all interpreted - measured 17s vs <2s at sf0.1).
    val cents = array(unitCentroids(centroids).map(c => array(c.map(lit): _*)): _*)
    embeddings
      .withColumn("ivf_sims", transform(cents, c => dot(col(vecCol), c)))
      // array_position finds the FIRST max, matching lowest-index tie-break
      .withColumn("ivf_cell",
        (array_position(col("ivf_sims"), array_max(col("ivf_sims"))) - 1).cast("int"))
      .drop("ivf_sims")
  }

  /** Batch KNN join: the top-`k` corpus neighbors for EVERY query row -
    * the "retrieve neighbors for each training example" shape, where a
    * per-query driver loop (N single-vector searches) would be N full
    * scans. IVF-celled: the corpus is assigned to cells once
    * ([[ivfAssign]]); each QUERY row computes its own `nprobe` nearest
    * cells (a per-row sort of the tiny centroid-sim array - no driver
    * involvement, unlike [[ivfTopK]]'s literal query) and equi-joins
    * corpus rows on the cell id. Per-query work drops from O(N) to
    * O(N * nprobe / cells); the join is an equi-join a cell-bucketed
    * corpus table co-locates. Top-k per query under the TOTAL
    * (cosine desc, id asc) order; cells are disjoint so no candidate
    * dedupe is needed. `excludeSelf` drops q_id == neighbor id matches
    * when queries are drawn from the corpus itself. */
  /** Per-row probe cells: the `nprobe` cells whose unit centroids are
    * closest to the row's vector, as an array column under the total
    * (sim desc, cell asc) order - the column-level analogue of
    * [[probeCells]] (ties resolve exactly like the oracle's first-max
    * CASE chain). Shared by [[knnJoin]] and
    * [[graft.llm.Contamination.semanticScreen]]. */
  def probeCellsCol(vec: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column = {
    require(nprobe >= 1 && nprobe <= centroids.size,
      s"nprobe $nprobe outside [1, ${centroids.size}]")
    val sims = array(unitCentroids(centroids).zipWithIndex.map {
      case (cvec, i) =>
        struct(dot(vec, array(cvec.map(lit): _*)).as("s"), lit(i).as("cell"))
    }: _*)
    val cmp = (l: Column, r: Column) =>
      when(l.getField("s") > r.getField("s"), -1)
        .when(l.getField("s") < r.getField("s"), 1)
        .when(l.getField("cell") < r.getField("cell"), -1)
        .when(l.getField("cell") > r.getField("cell"), 1)
        .otherwise(0)
    transform(slice(array_sort(sims, cmp), 1, nprobe), s => s.getField("cell"))
  }

  def knnJoin(queries: DataFrame, corpus: DataFrame, k: Int,
              centroids: Seq[Seq[Double]], nprobe: Int = 2,
              excludeSelf: Boolean = false,
              qIdCol: String = "q_id", cIdCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val probed = queries
      .select(col(qIdCol).as("q_id"), col(vecCol).as("__qv"))
      .withColumn("cell",
        explode(probeCellsCol(col("__qv"), centroids, nprobe)))
    val cells = ivfAssign(corpus, centroids, vecCol)
      .select(col(cIdCol).as("neighbor_id"), col(vecCol).as("__cv"),
        col("ivf_cell").as("cell"))
    val joined = probed.join(cells, Seq("cell"))
    val matched = if (excludeSelf)
      joined.filter(col("q_id") =!= col("neighbor_id")) else joined
    val w = Window.partitionBy(col("q_id"))
      .orderBy(cosine(col("__qv"), col("__cv")).desc, col("neighbor_id").asc)
    matched.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. '23,
    * arXiv:2303.09540): coarse-cluster the embeddings ([[ivfAssign]]
    * over a literal centroid list), then within each cell greedily keep
    * the lowest-id member of every near-duplicate neighborhood - a
    * vector is dropped iff SOME lower-id vector in its cell is
    * cosine-similar above `threshold`. That keep rule is deliberately
    * non-transitive: a chain A~B~C with cos(A,C) < threshold keeps both
    * A and C (the paper's per-pair semantics), which is what makes the
    * result a single anti-join rather than an iterative
    * connected-components pass - see [[graft.llm.Dedup.nearDupSurvivors]]
    * for the transitive-cluster variant over text.
    *
    * Scale shape: pairwise work happens only inside a cell (the paper's
    * point - clustering turns the O(N^2) pairwise pass into
    * O(sum n_c^2)), as one equi-join on the cell id; cell size is
    * governed by k, the paper's own scaling lever (k grows with the
    * corpus). For hard per-bucket caps under adversarial skew layer the
    * [[cosineNearDupPairs]] sub-split guards over the same join shape.
    *
    * Null embeddings are kept unconditionally (nothing to compare);
    * zero-norm vectors compare at cosine 0 (as in [[cosine]]) and so
    * never exceed a positive threshold. Output: one row per input row -
    * (idCol, ivf_cell [null for null embeddings], kept). */
  def semanticDedup(embeddings: DataFrame, centroids: Seq[Seq[Double]],
                    threshold: Double,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(threshold > 0,
      s"threshold=$threshold must be positive (zero-norm rows compare at 0)")
    // stage the norm as a column first - same quadratic-HOF trap as
    // cosineNearDupPairs (a norm inside the transform lambda re-evaluates
    // per element)
    val assigned = ivfAssign(embeddings.filter(col(vecCol).isNotNull), centroids, vecCol)
      .select(col(idCol).as("id"), col("ivf_cell"), col(vecCol),
        norm(col(vecCol)).as("nrm"))
    val unit = when(col("nrm") === 0, transform(col(vecCol), _ => lit(0.0)))
      .otherwise(transform(col(vecCol), x => x.cast("double") / col("nrm")))
    val cells = assigned.select(col("id"), col("ivf_cell"), unit.as("v"))
    val lo = cells.select(col("ivf_cell").as("cell_lo"), col("id").as("id_lo"),
      col("v").as("v_lo"))
    // LEFT SEMI: "exists a lower-id near neighbor" needs one witness, so
    // the pair set is never materialized - on a degenerate cell (all
    // vectors identical) each probe row short-circuits at its first
    // match instead of emitting O(n^2) pairs
    val dups = cells.join(lo,
        col("ivf_cell") === col("cell_lo") && col("id_lo") < col("id") &&
          dot(col("v"), col("v_lo")) >= threshold, "left_semi")
      .select(col("id")).withColumn("__dup", lit(1))
    cells.select(col("id"), col("ivf_cell"))
      .unionByName(embeddings.filter(col(vecCol).isNull)
        .select(col(idCol).as("id"), lit(null).cast("int").as("ivf_cell")))
      .join(dups, Seq("id"), "left")
      .select(col("id").as(idCol), col("ivf_cell"),
        col("__dup").isNull.cast("int").as("kept"))
  }

  /** Prototypicality-based data pruning (Sorscher et al. '22 "Beyond
    * neural scaling laws", arXiv:2206.14486): rank each cluster's
    * members by cosine similarity to their assigned centroid and drop
    * the most prototypical `fraction` (floor(n*fraction) rows per cell
    * under the total (similarity desc, id asc) order) - redundant
    * examples near the cluster core go first, the informative tail is
    * kept. With abundant data the paper prunes easy/prototypical
    * examples; passing the rank ascending instead (keep the core, drop
    * the tail) is the scarce-data regime and is the same plan with the
    * window order flipped - this implements the abundant-data direction.
    *
    * One scan + one per-cell window (single shuffle on the cell id);
    * similarity to the OWN centroid is array_max over the same
    * unit-centroid dot list [[ivfAssign]] computes, divided by the row
    * norm, so no second pass over the vector and nothing reaches the
    * driver. Zero-norm rows rank at similarity 0. Null embeddings are a
    * precondition violation like the other ANN oracles (filter first).
    * Output: (idCol, ivf_cell, kept). */
  def prototypicalityPrune(embeddings: DataFrame, centroids: Seq[Seq[Double]],
                           fraction: Double,
                           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(fraction >= 0 && fraction < 1, s"fraction=$fraction outside [0, 1)")
    val cents = array(unitCentroids(centroids).map(c => array(c.map(lit): _*)): _*)
    val sims = embeddings
      .withColumn("__sims", transform(cents, c => dot(col(vecCol), c)))
      .withColumn("ivf_cell",
        (array_position(col("__sims"), array_max(col("__sims"))) - 1).cast("int"))
      .withColumn("__nrm", norm(col(vecCol)))
      .withColumn("__sim", when(col("__nrm") === 0, lit(0.0))
        .otherwise(array_max(col("__sims")) / col("__nrm")))
    val w = Window.partitionBy(col("ivf_cell"))
      .orderBy(col("__sim").desc, col(idCol).asc)
    val n = Window.partitionBy(col("ivf_cell"))
    sims.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
      .select(col(idCol), col("ivf_cell"),
        (col("__rn") > floor(col("__n") * fraction)).cast("int").as("kept"))
  }

  /** ANN quality self-evaluation: per-query recall@k of the IVF probe
    * search ([[knnJoin]]) against brute-force exact cosine top-k over
    * the same corpus - the standard acceptance metric for any
    * approximate index (tune nprobe/centroid count until measured
    * recall clears the bar, on a sampled query set).
    *
    * Scale shape: the approximate side is the production [[knnJoin]]
    * plan (probe-cell equi-join, per-query window). The exact side is
    * the deliberate brute-force baseline - the query set BROADCASTS
    * against the corpus (evaluation query sets are 1e2-1e5 rows vs
    * 1e9+ corpus rows), one map-side pass + per-query top-k, no corpus
    * shuffle. Never run it with a large query frame; sample first.
    * Both sides share the (cosine desc, id asc) total order, so ties
    * rank identically. Output: (q_id, n_hits, recall) with
    * recall = n_hits / k, one int/int division. */
  def recallAtK(queries: DataFrame, corpus: DataFrame, k: Int,
                centroids: Seq[Seq[Double]], nprobe: Int = 2,
                excludeSelf: Boolean = false,
                qIdCol: String = "q_id", cIdCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val approx = knnJoin(queries, corpus, k, centroids, nprobe, excludeSelf,
        qIdCol, cIdCol, vecCol)
      .select(col("q_id"), col("neighbor_id")).withColumn("__hit", lit(1))
    val q = queries.select(col(qIdCol).as("q_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(cIdCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val crossed = c.crossJoin(broadcast(q))
    val matched = if (excludeSelf)
      crossed.filter(col("q_id") =!= col("neighbor_id")) else crossed
    val w = Window.partitionBy(col("q_id"))
      .orderBy(cosine(col("__qv"), col("__cv")).desc, col("neighbor_id").asc)
    matched.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col("q_id"), col("neighbor_id"))
      .join(approx, Seq("q_id", "neighbor_id"), "left")
      .groupBy(col("q_id"))
      .agg(sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_hits"))
      .withColumn("recall", col("n_hits").cast("double") / k)
  }
}

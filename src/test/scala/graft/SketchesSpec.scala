package graft

import graft.llm.Sketches
import org.apache.spark.sql.functions._

/** Sketch invariants the oracle cannot see: HLL estimate accuracy vs
  * exact distinct, register mergeability (the 100 TB property - partial
  * sketches combine without rescan), CMS est >= truth and cell-wise
  * merge, and hand-checkable tf-idf / PMI rankings. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def wordDocs(n: Int, perDoc: Int, tag: String) =
    (1 to n).map { i =>
      (i.toLong, (0 until perDoc).map(j => s"$tag${(i * perDoc + j)}").mkString(" "))
    }.toDF("doc_id", "text")
      .withColumn("source", lit("s0"))

  test("hllEstimate within 10% of exact distinct at p=10") {
    // 4000 distinct single-occurrence words; expected rel err ~1.04/sqrt(1024)=3.2%
    val docs = wordDocs(400, 10, "w")
    val words = docs.select(col("source"),
      explode(graft.llm.TextAnalysis.normalizedWords(col("text"))).as("w"))
    val exact = words.select("w").distinct().count()
    val est = Sketches.hllEstimate(
      Sketches.hllReport(words, "source", col("w"), p = 10), p = 10)
      .select("est_distinct").as[Double].head()
    assert(math.abs(est - exact) / exact < 0.10,
      s"est=$est exact=$exact")
  }

  test("hll registers merge by max: two halves == whole") {
    val docs = wordDocs(100, 8, "m")
    val words = docs.select(col("source"),
      explode(graft.llm.TextAnalysis.normalizedWords(col("text"))).as("w"))
    val a = words.filter(length(col("w")) % 2 === 0)
    val b = words.filter(length(col("w")) % 2 === 1)
    val merged = Sketches.hllRegisters(a, "source", col("w"), 10)
      .unionByName(Sketches.hllRegisters(b, "source", col("w"), 10))
      .groupBy("source", "bucket").agg(max("m_j").as("m_j"))
    val whole = Sketches.hllRegisters(words, "source", col("w"), 10)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("cms estimate >= true count, exact when width is collision-free") {
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val words = docs.select(
      explode(graft.llm.TextAnalysis.normalizedWords(col("text"))).as("w"))
    val r = Sketches.cmsHeavyHitterCheck(words, col("w"), k = 3)
      .select("v", "true_cnt", "cms_est").as[(String, Long, Long)]
      .collect().toSeq.sortBy(_._1)
    assert(r.forall { case (_, t, e) => e >= t })
    // 3 distinct values in a 4x512 grid: no collisions, est == truth
    assert(r == Seq(("a", 3L, 3L), ("b", 2L, 2L), ("c", 1L, 1L)))
  }

  test("cms sketches merge by cell-wise sum") {
    val words = Seq.tabulate(60)(i => s"t${i % 7}").toDF("w")
    val whole = Sketches.cmsSketch(words, col("w"))
    // disjoint value split: sketch(whole) == cell-wise sum of the parts
    val h1 = Sketches.cmsSketch(words.filter(col("w").isin("t0", "t1", "t2")), col("w"))
    val h2 = Sketches.cmsSketch(words.filter(!col("w").isin("t0", "t1", "t2")), col("w"))
    val merged = h1.unionByName(h2)
      .groupBy("d", "c").agg(sum("cnt").as("cnt"))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("tfidfTopTerms ranks the stratum-specific term above shared ones") {
    // 'zebra' only in s1 docs; 'the' everywhere (idf ln(1)=0 -> score 0)
    val docs = Seq(
      (1L, "s1", "the zebra zebra runs"), (2L, "s1", "the zebra sleeps"),
      (3L, "s2", "the cat sits"), (4L, "s2", "the cat naps"))
      .toDF("doc_id", "source", "text")
    val top = Sketches.tfidfTopTerms(docs, k = 2)
      .select("source", "w", "rnk").as[(String, String, Int)].collect()
    assert(top.contains(("s1", "zebra", 1)))
    assert(top.contains(("s2", "cat", 1)))
    // 'the' appears in every doc -> idf 0 -> never outranks specific terms
    assert(!top.exists { case (_, w, r) => w == "the" && r == 1 })
  }

  test("tfidf two-level shard top-k equals the plain global-window top-k") {
    val docs = (1 to 50).map { i =>
      (i.toLong, s"s${i % 3}", s"alpha w$i w${i % 11} w${i % 5} beta")
    }.toDF("doc_id", "source", "text")
    val got = Sketches.tfidfTopTerms(docs, k = 5)
    import org.apache.spark.sql.expressions.Window
    // reference: single window over the full scored frame
    val occ = docs.select(col("source"), col("doc_id"),
      explode(graft.llm.TextAnalysis.normalizedWords(col("text"))).as("w"))
    val n = docs.count().toDouble
    val dfreq = occ.select("doc_id", "w").distinct()
      .groupBy("w").agg(count(lit(1)).as("df_docs"))
      .withColumn("idf_micro",
        round(log(lit(n) / col("df_docs").cast("double")) * 1e6).cast("long"))
    val scored = occ.groupBy("source", "w").agg(count(lit(1)).as("tf"))
      .join(dfreq, Seq("w"))
      .withColumn("score_micro", col("tf") * col("idf_micro"))
    val ref = scored.withColumn("rnk", row_number().over(
        Window.partitionBy("source").orderBy(col("score_micro").desc, col("w"))))
      .filter(col("rnk") <= 5)
      .select("source", "w", "tf", "df_docs", "score_micro", "rnk")
    assert(got.select(ref.columns.map(col).toSeq: _*).exceptAll(ref).isEmpty
      && ref.exceptAll(got.select(ref.columns.map(col).toSeq: _*)).isEmpty)
  }

  test("native BottomKMd5 equals the HOF sort/slice construction") {
    val docs = (1 to 40).map { i =>
      (i.toLong, (1 to 20).map(j => s"w${(i * 3 + j) % 50}").mkString(" "))
    }.toDF("doc_id", "text")
    val sh = graft.llm.Dedup.shingles(col("text"), 3)
    val native = docs.select(col("doc_id"),
      org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.BottomKMd5(
          org.apache.spark.sql.GraftSqlBridge.expression(sh), 12)).as("bk"))
    val hof = docs.select(col("doc_id"),
      slice(array_sort(transform(sh,
        s => substring(md5(s), 1, 16))), 1, 12).as("bk"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
    // short doc: fewer shingles than k -> all of them, still sorted
    val one = Seq((1L, "a b")).toDF("doc_id", "text")
    val bk = one.select(org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.BottomKMd5(
          org.apache.spark.sql.GraftSqlBridge.expression(
            graft.llm.Dedup.shingles(col("text"), 3)), 12)))
      .as[Seq[String]].head()
    assert(bk.length == 1 && bk.head.length == 16)
  }

  test("hashed tf-idf knn ranks the vocabulary-sharing doc first") {
    val df = Seq(
      (1L, "apple banana cherry durian elderberry fig"),
      (2L, "apple banana cherry durian grape honeydew"),   // 4 shared rare
      (3L, "the of and to is it common words only here"),
      (4L, "zebra yak xerus wolf vole urchin"))
      .toDF("doc_id", "text")
    // dim 1024 so toy-corpus bucket collisions can't distort the ranks
    // (at dim 64 a 6-word doc's rare terms can collide into a stranger)
    val r = Sketches.textKnnByTfidf(df, col("doc_id") === 1, k = 3,
        dim = 1024)
      .select("doc_id", "rnk").as[(Long, Int)].collect().toMap
    assert(r.get(2L).contains(1), s"got $r")
    // dense vectors: same weights as the sparse frame, zeros filled
    val dense = Sketches.hashedTfidfVectors(df)
      .select("vec_csv").as[String].collect()
    assert(dense.forall(_.split(",").length == 64))
    val sparseSum = Sketches.hashedTfidfSparse(df)
      .agg(sum("v")).as[Long].head()
    assert(dense.map(_.split(",").map(_.toLong).sum).sum == sparseSum)
  }

  test("pmiCollocations surfaces the glued bigram first") {
    // 'hong kong' always adjacent; filler words independent
    val rows = (1 to 30).map { i =>
      (i.toLong, s"hong kong f${i % 7} g${i % 5} f${(i + 3) % 7}")
    }
    val r = Sketches.pmiCollocations(rows.toDF("doc_id", "text"),
      minCount = 5L, k = 3)
      .select("prev", "w", "rnk").as[(String, String, Int)].collect()
    assert(r.contains(("hong", "kong", 1)))
  }
}

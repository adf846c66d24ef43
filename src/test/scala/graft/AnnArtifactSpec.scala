package graft

import graft.llm.{Ann, AnnArtifact}

/** AnnArtifact: the IVF/PQ index ship-and-serve round trip. */
class AnnArtifactSpec extends SparkSpec {

  test("centroids and codebooks round-trip bit-exact through parquet") {
    val centroids = Ann.hyperplanes(16, 8, seed = 11L)
    val codebooks = Seq.tabulate(4)(j =>
      Seq.tabulate(8)(c => Seq.tabulate(4)(d =>
        math.sin(j * 97 + c * 13 + d) * 1e3))) // irrational doubles
    val dir = java.nio.file.Files.createTempDirectory("ann_artifact_spec")
      .toString
    try {
      AnnArtifact.save(spark, centroids, codebooks, dir)
      assert(AnnArtifact.loadCentroids(spark, dir) == centroids)
      assert(AnnArtifact.loadCodebooks(spark, dir) == codebooks)
    } finally {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("search under the loaded artifact equals search under the " +
    "original literals") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val emb = (0L until 60L).map(i =>
      (i, Seq.fill(16)((rnd.nextGaussian() + (i % 4) * 0.8).toFloat)))
      .toDF("vec_id", "embedding")
    val centroids = Ann.hyperplanes(16, 8, seed = 11L)
    val query = Ann.hyperplanes(16, 1, seed = 7L).head
    val dir = java.nio.file.Files.createTempDirectory("ann_artifact_spec2")
      .toString
    try {
      AnnArtifact.save(spark, centroids, Seq(Seq(Seq(0.0))), dir)
      val loaded = AnnArtifact.loadCentroids(spark, dir)
      val a = Ann.ivfTopK(emb, query, 5, centroids, nprobe = 2)
        .collect().map(_.toSeq).toSeq
      val b = Ann.ivfTopK(emb, query, 5, loaded, nprobe = 2)
        .collect().map(_.toSeq).toSeq
      assert(a == b)
    } finally {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }
}

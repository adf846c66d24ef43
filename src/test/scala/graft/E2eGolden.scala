package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Canonical row dumps for the CLI golden end-to-end comparison: one
  * deterministic text line per row (columns sorted by name, rows sorted
  * lexicographically), so output parquet state can be diffed exactly
  * against a checked-in golden file. Shared by E2eSpec (the assertion)
  * and E2eGoldenGen (the one-off regeneration main).
  */
object E2eGolden {

  val fixtureDir = "src/test/resources/e2e"
  val goldenDir = s"$fixtureDir/golden"

  /** First line pins the schema (sorted name:type pairs); the rest are
    * sorted rows, tab-joined, with a printable null sentinel. */
  def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val header = cols.map(c => s"$c:${types(c)}").mkString("\t")
    val lines = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect()
      .map(r => cols.indices.map(i => fmt(r.get(i))).mkString("\t"))
      .sorted
      .toSeq
    header +: lines
  }

  private def fmt(v: Any): String = v match {
    case null => "<null>"
    case ts: java.sql.Timestamp => ts.toInstant.toString // session TZ is UTC
    case d: java.sql.Date => d.toString
    case a: Seq[_] => a.map(fmt).mkString("[", ",", "]")
    case other => other.toString
  }

  def write(df: DataFrame, name: String): Unit = {
    val p = Paths.get(goldenDir, s"$name.tsv")
    Files.createDirectories(p.getParent)
    Files.write(p, canon(df).asJava)
  }

  def readGolden(name: String): Seq[String] =
    Files.readAllLines(Paths.get(goldenDir, s"$name.tsv")).asScala.toSeq

  /** Run both CLI file-input flows into `out`; returns the output dirs
    * keyed by golden name. Kept here so the generator and the spec run
    * the IDENTICAL command lines. */
  def runFlows(spark: SparkSession, out: String): Map[String, String] = {
    val sf = "/root/testdata/sf0.001"
    val species = graft.tools.Cli.run(Array(
      "--species", "rat", "--sfDir", sf, "--out", out,
      "--hcop", s"$fixtureDir/hcop.tsv",
      "--ncbi", s"$fixtureDir/ncbi_gene_orthologs.tsv",
      "--sanityFloor", "10"), spark)
    require(species == 0, s"species flow exit code $species")
    val agr = graft.tools.Cli.run(Array(
      "--agrOrthologs", "--sfDir", sf, "--out", out,
      "--alliance", s"$fixtureDir/alliance_orthology.tsv"), spark)
    require(agr == 0, s"agr flow exit code $agr")
    // tokenizer-artifact round trip: train+save in one run, load+encode
    // in another - the cross-session artifact contract (X-session ids)
    val bpeSave = graft.tools.Cli.run(Array(
      "--bpeSave", s"$out/bpe_artifact", "--sfDir", sf), spark)
    require(bpeSave == 0, s"bpe save exit code $bpeSave")
    val bpeLoad = graft.tools.Cli.run(Array(
      "--bpeLoad", s"$out/bpe_artifact", "--sfDir", sf, "--out", out), spark)
    require(bpeLoad == 0, s"bpe load exit code $bpeLoad")
    Map(
      "rat_orthologs" -> s"$out/rat/orthologs",
      "rat_associations" -> s"$out/rat/associations",
      "agr_orthologs" -> s"$out/agr_orthologs",
      "bpe_encoded" -> s"$out/bpe_encoded")
  }
}

/** One-off golden regeneration: `sbt "Test/runMain graft.E2eGoldenGen"`.
  * Regenerate ONLY when an intentional semantic change shifts the
  * pipeline's output; review the diff line by line before committing. */
object E2eGoldenGen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val out = Files.createTempDirectory("e2e_golden_gen").toString
    E2eGolden.runFlows(spark, out).foreach { case (name, dir) =>
      E2eGolden.write(spark.read.parquet(dir), name)
      println(s"golden $name <- $dir")
    }
    spark.stop()
  }
}

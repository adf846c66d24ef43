package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.functions.Exprs
import graft.operators.Maintenance

/** Brute-force semantic pin for the three evidence-list canonicalization
  * surfaces the oracle mirrors (X2 + the M7 family):
  *
  *  1. parse-time sanitize (OrthologRelationParser.java:126-136):
  *     split on BARE "," with Java's default limit (trailing empty
  *     tokens drop), NO trim (a token keeps its leading space and
  *     sorts by it), TreeSet order, joined with
  *     Utils.concatenate(", ") - which appends the separator only when
  *     the builder is non-empty, so the set's single leading ""
  *     element contributes NOTHING (no separator either); single-token
  *     inputs return sourcesOrig[0] verbatim (a trailing "," is
  *     dropped by the default-limit split);
  *  2. insert validation (OrthologRelationDao.java:447-459): split on
  *     ", " (default limit), >1 tokens only, rewrite ONLY when the
  *     canonical form differs AND is STRICTLY shorter;
  *  3. the fixXRefDataSet maintenance sweep (M7,
  *     OrthologRelationDao.java:707-767): same rule as (2) over the
  *     ortholog state and over weak_ortholog associations (other assoc
  *     types untouched), empty/null skipped.
  *
  * The models below are row-at-a-time Scala transcriptions of the
  * reference's exact Java calls (String.split has identical semantics
  * in Scala); the engine is the set-wise column expression. Coverage
  * probes assert every corner class actually occurred: leading-space
  * tokens reordering ahead of letters, interior empty tokens collapsing
  * without a separator, trailing separators dropping, same-length
  * canonical forms REJECTED by the strictly-shorter rule, and
  * single-token skips.
  *
  * Teeth (verified-to-fail): against the pre-round-16 engine this spec
  * fails in three distinct ways - sanitizeEvidence trimmed tokens (so
  * " B, A" canonicalized to "A, B" instead of the reference's
  * " B, A"), canonicalXrefDataSet split with limit -1 (so a trailing
  * ", " injected an empty token that made the canonical form LONGER
  * and blocked the rewrite the reference performs), and the join kept
  * empty tokens with separators where Utils.concatenate drops them.
  */
class XrefCanonPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Utils.concatenate(Collection, sep): separator only when the
    * builder is non-empty - a leading "" element vanishes entirely. */
  private def concatJava(ts: Iterable[String], sep: String): String = {
    val sb = new StringBuilder
    ts.foreach { t => if (sb.nonEmpty) sb.append(sep); sb.append(t) }
    sb.toString
  }

  /** OrthologRelationParser.sanitizeXRefDataSet, verbatim. */
  private def sanitizeModel(s: String): String = {
    val toks = s.split(",") // Java default limit
    if (toks.length > 1)
      concatJava(scala.collection.immutable.TreeSet(toks: _*), ", ")
    else toks(0) // generator guarantees >=1 token
  }

  /** The shared rewrite rule of insert validation and both M7 sweeps
    * (split ", ", single-token skip, differs AND strictly shorter).
    * Returns None when the reference leaves the value untouched. */
  private def canonModel(s: String): Option[String] = {
    if (s == null || s.isEmpty) return None
    val toks = s.split(", ") // Java default limit
    if (toks.length <= 1) return None
    val canon = concatJava(
      scala.collection.immutable.TreeSet(toks: _*), ", ")
    if (canon != s && canon.length < s.length) Some(canon) else None
  }

  // token pool exercising order-by-leading-space, case, and no-space
  // comma tokens; the generator never emits an all-empty-token string
  // (xrefDataSet values of only separators - unreachable in the
  // reference's data, and the one corner where the Dao's two identical
  // rewrites disagree with each other on the length==0 guard)
  private val tokGen = Gen.oneOf(
    "A", "B", "b", " B", "A ", "OrthoDB", "Ensembl", " Ensembl", "")
  private def listGen(maxN: Int): Gen[List[String]] =
    Gen.choose(1, maxN).flatMap(n => Gen.listOfN(n, tokGen))
      .map(ts => if (ts.exists(_.trim.nonEmpty)) ts else "A" :: ts)

  test("property: parse-time evidence sanitize equals the reference's " +
    "split-on-bare-comma + TreeSet + concatenate model") {
    // raw strings joined with bare commas (the HCOP column format),
    // sometimes with trailing commas
    val rawGen = for {
      ts <- listGen(5)
      trail <- Gen.oneOf("", ",", ",,")
    } yield ts.mkString(",") + trail

    var sawSpaceSort = 0; var sawTrailingDrop = 0; var sawEmptyCollapse = 0
    var sawSingle = 0

    var seed = Seed(161001L)
    for (_ <- 1 to 12) {
      val raws = (1 to 40).map { _ =>
        val s = rawGen.pureApply(Gen.Parameters.default, seed)
        seed = seed.next; s
      }.filter(_.split(",").length >= 1) // guard the AIOOBE corner
      val expected = raws.map(s => s -> sanitizeModel(s))

      raws.foreach { s =>
        val toks = s.split(",")
        if (toks.length > 1 && toks.exists(t => t.startsWith(" ")))
          sawSpaceSort += 1
        if (s.endsWith(",")) sawTrailingDrop += 1
        if (toks.length > 1 && toks.contains("")) sawEmptyCollapse += 1
        if (toks.length <= 1) sawSingle += 1
      }

      val got = raws.toDF("raw")
        .select(col("raw"), Exprs.sanitizeEvidence(col("raw")).as("out"))
        .as[(String, String)].collect().toMap
      expected.foreach { case (s, exp) =>
        assert(got(s) == exp,
          s"sanitize('$s'): engine='${got(s)}' model='$exp'")
      }
    }
    assert(sawSpaceSort > 0, "never sorted a leading-space token")
    assert(sawTrailingDrop > 0, "never dropped a trailing separator")
    assert(sawEmptyCollapse > 0, "never collapsed an interior empty token")
    assert(sawSingle > 0, "never skipped a single-token value")
  }

  test("property: the insert/M7 canonical rewrite equals the " +
    "reference's split-comma-space + strictly-shorter model, over " +
    "orthologs and weak_ortholog associations") {
    // ", "-joined values, sometimes with trailing ", " runs and
    // interior empty tokens; plus raw no-space strings that are a
    // single ", "-token
    val valGen = Gen.frequency(
      5 -> (for {
        ts <- listGen(4)
        trail <- Gen.oneOf("", ", ", ", , ")
      } yield ts.mkString(", ") + trail),
      1 -> Gen.oneOf("A,B", "OrthoDB,Ensembl", "", "solo"))

    var sawRewrite = 0; var sawSameLenReject = 0; var sawTrailingSkip = 0
    var sawEmptySkip = 0; var sawAssocTypeSkip = 0

    var seed = Seed(161002L)
    for (_ <- 1 to 12) {
      val vals = (1 to 40).map { _ =>
        val s = valGen.pureApply(Gen.Parameters.default, seed)
        seed = seed.next; s
      }

      vals.foreach { s =>
        canonModel(s) match {
          case Some(_) => sawRewrite += 1
          case None =>
            if (s.nonEmpty && s.split(", ").length > 1) {
              val canon = concatJava(scala.collection.immutable.TreeSet(
                s.split(", "): _*), ", ")
              if (canon != s && canon.length >= s.length) sawSameLenReject += 1
            }
            if (s.endsWith(", ") && s.split(", ").length <= 1)
              sawTrailingSkip += 1
            if (s.isEmpty) sawEmptySkip += 1
        }
      }

      // ---- orthologs sweep ----
      val state = vals.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("key", "xrefDataSet")
      val (newState, updated) = Maintenance.fixXrefDataSetInOrthologs(state)
      val gotNew = newState.as[(Long, String)].collect().toMap
      val gotUpd = updated.select(col("key")).as[Long].collect().toSet
      vals.zipWithIndex.foreach { case (s, i) =>
        val exp = canonModel(s)
        assert(gotNew(i.toLong) == exp.getOrElse(s),
          s"fixXref('$s'): engine='${gotNew(i.toLong)}' model='${exp.getOrElse(s)}'")
        assert(gotUpd.contains(i.toLong) == exp.isDefined,
          s"fixXref updated-set for '$s'")
      }

      // ---- associations sweep: weak_ortholog rows only ----
      val assocState = vals.zipWithIndex.map { case (s, i) =>
        (i.toLong, if (i % 3 == 0) "paralog" else "weak_ortholog", s) }
        .toDF("assocKey", "assocType", "assocSubType")
      val (newAssoc, updAssoc) = Maintenance.fixXrefDataSetInAssociations(assocState)
      val gotAssoc = newAssoc.select(col("assocKey"), col("assocSubType"))
        .as[(Long, String)].collect().toMap
      vals.zipWithIndex.foreach { case (s, i) =>
        val exp = if (i % 3 == 0) None else canonModel(s)
        if (i % 3 == 0 && canonModel(s).isDefined) sawAssocTypeSkip += 1
        assert(gotAssoc(i.toLong) == exp.getOrElse(s),
          s"fixAssoc('$s', type=${if (i % 3 == 0) "paralog" else "weak"}): " +
            s"engine='${gotAssoc(i.toLong)}'")
      }
      assert(updAssoc.select(col("assocKey")).as[Long].collect().toSet ==
        vals.zipWithIndex.filter { case (s, i) => i % 3 != 0 && canonModel(s).isDefined }
          .map(_._2.toLong).toSet)

      // ---- the same expression feeds insert validation (Merge) ----
      val gotExpr = vals.toDF("v")
        .select(col("v"), Exprs.canonicalXrefDataSet(col("v")).as("out"))
        .as[(String, String)].collect().toMap
      vals.foreach { s =>
        assert(gotExpr(s) == canonModel(s).getOrElse(s),
          s"canonicalXrefDataSet('$s'): engine='${gotExpr(s)}'")
      }
    }
    assert(sawRewrite > 0, "never rewrote a value")
    assert(sawSameLenReject > 0,
      "never saw a same-length canonical form rejected")
    assert(sawTrailingSkip > 0,
      "never saw a trailing-separator single-token skip")
    assert(sawEmptySkip > 0, "never skipped an empty value")
    assert(sawAssocTypeSkip > 0,
      "never saw a non-weak assoc row ride through untouched")
  }
}

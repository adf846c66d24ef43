package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-helper library: the reference's scalar logic re-expressed as
  * codegen-friendly compositions of built-in Spark functions (no UDFs on
  * the hot path - every helper here stays inside whole-stage codegen).
  */
object Exprs {

  /** Strong-ortholog source priority; higher wins.
    * Ref: OrthologRelationDao.java:879-890. */
  def sourcePriority(src: Column): Column =
    when(src === "RGD", 4)
      .when(src === "Alliance", 3)
      .when(src === "HGNC", 2)
      .when(src === "NCBI", 1)
      .otherwise(0)

  /** Evidence count = 1 + number of commas in the evidence CSV; 0 for
    * null/empty. Ref: OrthologRelationLoader.java:580-588,
    * OrthologRelationDao.java:190-201. */
  /** Faithfulness note: getEvidenceCount (OrthologRelationDao.java:
    * 192-201) literally returns 1 for "" (non-null starts at 1) and
    * ignores a comma at position 0 - but the reference runs on Oracle,
    * where '' IS NULL, so the empty string can never reach it and 0 is
    * the production-faithful value; the leading-comma corner is
    * unreachable (evidence lists are built by joining non-empty
    * tokens). */
  def evidenceCount(dataSet: Column): Column =
    when(dataSet.isNull || dataSet === "", 0)
      .otherwise(size(split(dataSet, ",", -1)))

  /** Sorted-set canonicalization of a separator-delimited list: split,
    * trim tokens, distinct, sort, re-join (the generic O4 shape used by
    * oracle-expressible queries). The REFERENCE-exact variants are
    * [[sanitizeEvidence]] and [[canonicalXrefDataSet]] below. */
  def canonicalizeList(c: Column, sepRegex: String, joinSep: String): Column =
    concat_ws(joinSep,
      array_sort(array_distinct(transform(split(c, sepRegex, -1), t => trim(t)))))

  /** Java's default-limit `String.split(sep)` as a column: trailing
    * empty tokens drop. Trailing empties exist exactly when the string
    * ends with separator repetitions, so stripping `(sep)+$` first and
    * splitting with limit -1 reproduces the token list (the split is
    * greedy left-to-right, so any terminal separator run IS a
    * separator boundary). `sepQuoted` must be regex-safe. */
  private def javaSplit(c: Column, sepQuoted: String): Column =
    split(regexp_replace(c, s"($sepQuoted)+$$", ""), sepQuoted, -1)

  /** TreeSet + Utils.concatenate(", ") over a token array: dedupe,
    * sort, and DROP the empty-string element - Utils.concatenate
    * appends the separator only when its builder is non-empty, so the
    * set's single "" element (which sorts first) contributes neither
    * content nor separator (rgdcore Utils.concatenate bytecode). */
  private def treeSetJoin(toks: Column): Column =
    concat_ws(", ", array_remove(array_sort(array_distinct(toks)), ""))

  /** Evidence CSV sanitization as done at HCOP parse time (X2),
    * reference-exact (XrefCanonPropertySpec): split on BARE commas with
    * Java's default limit, NO trim (a leading-space token keeps its
    * space and sorts by it), TreeSet order, Utils.concatenate(", ");
    * single-token values return token[0] verbatim (so a trailing ","
    * still drops). Ref: OrthologRelationParser.java:126-136. */
  def sanitizeEvidence(c: Column): Column = {
    val toks = javaSplit(c, ",")
    when(size(toks) <= 1, element_at(toks, 1)).otherwise(treeSetJoin(toks))
  }

  /** XREF_DATA_SET canonical rewrite used by insert validation and the
    * fixXRefDataSet maintenance flow (M7), reference-exact
    * (XrefCanonPropertySpec): null/empty skipped, split on ", " with
    * Java's default limit, single-token values skipped, and the
    * rewrite kept ONLY if it differs AND is STRICTLY shorter (so
    * "b, a" -> "a, b" is same-length and stays untouched).
    * Ref: OrthologRelationDao.java:447-459,707-767.
    * (The one unreachable divergence: a value of ONLY separators, e.g.
    * ", ", Java-splits to a length-0 array, which the insert path's
    * `length>1` skips but the fixXref path's `length==1` proceeds on;
    * here both skip - xref data sets are built from non-empty source
    * tokens, so the corner cannot occur in data.) */
  def canonicalXrefDataSet(c: Column): Column = {
    val toks = javaSplit(c, ", ")
    val canon = treeSetJoin(toks)
    when(c.isNull || c === "", c)
      .when(size(toks) <= 1, c)
      .when(canon =!= c && length(canon) < length(c), canon)
      .otherwise(c)
  }

  /** '|'-separated algorithm list sort (X3). Ref: AgrTsvLoader.java:224-229. */
  def sortAlgorithms(c: Column): Column =
    concat_ws("|", array_sort(array_distinct(split(c, "\\|", -1))))

  /** Greek-letter transliteration (X4): the 15-codepoint map of
    * AgrTsvLoader.parseSymbol, as a native codegen'd Catalyst expression
    * (one char scan; the regexp_replace chain equivalent costs 15 regex
    * passes per row). Other >127 chars are dropped, matching the
    * reference (which logs and skips them).
    * Ref: AgrTsvLoader.java:437-486. */
  def transliterateGreek(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      GreekTransliterate(org.apache.spark.sql.GraftSqlBridge.expression(c)))

  /** Case-insensitive symbol equality (X5), null-safe: null == null.
    * Ref: Utils.stringsCompareToIgnoreCase via
    * OrthologRelationLoader.java:562. */
  def symbolMatches(a: Column, b: Column): Column =
    lower(a) <=> lower(b)

  /** Strip an id prefix like "RGD:" / "MGI:" and cast to int (X6).
    * Ref: AgrTsvLoader.java:346 (geneId.substring(4)). */
  def stripPrefixToInt(c: Column, prefixLen: Int): Column =
    substring(c, prefixLen + 1, Int.MaxValue - 1).cast("int")

  /** Quoted-field trim (X8). Ref: OrthoTool.java:119-124. */
  def unquoteTrim(c: Column): Column =
    trim(regexp_replace(c, "^\"(.*)\"$", "$1"))

  /** Ortholog type assignment (M3): human-involved pairs get the direct
    * type, others the transitive type. Ref: OrthologRelationDao.java:460-468. */
  def orthologTypeKey(srcSp: Column, destSp: Column): Column =
    when(srcSp === graft.model.Species.HUMAN || destSp === graft.model.Species.HUMAN,
      graft.model.Species.directOrthologTypeKey)
      .otherwise(graft.model.Species.transitiveOrthologTypeKey)
}

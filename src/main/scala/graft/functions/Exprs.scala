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
    * trim tokens, distinct, sort, re-join (the reference's TreeSet
    * pattern - O4). `sepRegex` is the split regex, `joinSep` the output
    * separator. Ref: OrthologRelationParser.java:126-136,
    * OrthologGroup.java:53-60, AgrTsvLoader.java:224-229. */
  def canonicalizeList(c: Column, sepRegex: String, joinSep: String): Column =
    concat_ws(joinSep,
      array_sort(array_distinct(transform(split(c, sepRegex, -1), t => trim(t)))))

  /** Evidence CSV sanitization as done at HCOP parse time (X2): split on
    * bare commas, dedupe+sort, join with ", ".
    * Ref: OrthologRelationParser.java:126-136. */
  def sanitizeEvidence(c: Column): Column = canonicalizeList(c, ",", ", ")

  /** XREF_DATA_SET canonical rewrite used by insert validation and the
    * fixXRefDataSet maintenance flow (M7): split on ", ", dedupe+sort,
    * and keep the rewrite ONLY if it differs and is strictly shorter.
    * Ref: OrthologRelationDao.java:447-459,707-767. */
  def canonicalXrefDataSet(c: Column): Column = {
    val canon = concat_ws(", ", array_sort(array_distinct(split(c, ", ", -1))))
    when(c.isNull || c === "", c)
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

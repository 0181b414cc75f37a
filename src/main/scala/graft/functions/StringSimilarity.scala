package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native Catalyst expression.
  *
  * Spark ships levenshtein but no Jaro-Winkler; entity-matching pipelines
  * (fuzzy record linkage over names/titles) want JW because it is
  * length-normalized and prefix-weighted. Semantics match DuckDB's
  * `jaro_winkler_similarity` bit-for-bit (verified against probe cases in
  * FuzzyJoinSpec) so the oracle can mirror the operator:
  *   - both-empty and either-empty → 0.0 (DuckDB convention, not 1.0);
  *   - match window = max(len)/2 - 1 (floored, ≥ 0);
  *   - transpositions counted pairwise / 2;
  *   - Winkler prefix bonus (scale 0.1, prefix capped at 4) applied only
  *     when the Jaro score exceeds the classic 0.7 boost threshold.
  *
  * The tight char loop is O(len_a · window); candidates reaching it should
  * already be blocked (see operators.FuzzyJoin) — never evaluate JW on an
  * unblocked cross join.
  */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two STRING arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimilarity.jaroWinkler(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  /** Whole-stage codegen: a static call into the same Scala kernel
    * [[nullSafeEval]] uses (one shared implementation, no Java-string
    * transliteration to drift) — enough to keep the enclosing stage fused
    * instead of breaking at every similarity call like a CodegenFallback
    * would. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSimilarity.jaroWinkler(" +
        s"$a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerSimilarity =
    copy(left = l, right = r)
}

object StringSimilarity {

  /** Column API: `jaroWinkler($"a", $"b")` — DOUBLE in [0, 1]. */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinklerSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  private final val WinklerScale = 0.1
  private final val WinklerMaxPrefix = 4
  private final val BoostThreshold = 0.7

  def jaro(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val c = s1.charAt(i)
      val lo = math.max(i - window, 0)
      val hi = math.min(i + window + 1, l2)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s2.charAt(j) == c) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: walk matched chars of both strings in order
    var transpositions = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val t = transpositions / 2
    (m / l1 + m / l2 + (m - t) / m) / 3.0
  }

  def jaroWinkler(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j <= BoostThreshold) return j
    var prefix = 0
    val maxP = math.min(math.min(s1.length, s2.length), WinklerMaxPrefix)
    while (prefix < maxP && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    j + prefix * WinklerScale * (1.0 - j)
  }
}

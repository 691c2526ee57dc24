package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.kernel.Weights

/** Parity pin for the native codegen verify kernel: the PairScoreMax
  * expression must be BIT-identical to the pairScoreMaxPre UDF on every
  * input class (both run [[KernelExprs.pairScoreMax]]; this spec guards
  * the expression plumbing — null channels, byte casts, literal
  * embedding in generated code).
  */
class KernelExprsSpec extends SparkSpecBase {

  private val K = Kernels.test

  /** Deterministic normKey-ish pairs: strings over the compact class
    * alphabet (codepoints 33..59 = the 27-class test alphabet), lengths
    * 0..12, edit distances 0..large, plus null rows.
    */
  private def pairs: Seq[(String, String, Byte, Byte)] = {
    var state = 0xDEADBEEFL
    def next(n: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      ((state >>> 33) % n).toInt
    }
    def word(): String =
      (0 until next(13)).map(_ => (33 + next(27)).toChar).mkString
    val rand = (1 to 400).map { _ =>
      val a = word()
      // half the pairs are perturbations of a (near dups), half random
      val b =
        if (next(2) == 0) word()
        else {
          val sb = new StringBuilder(a)
          if (sb.nonEmpty && next(2) == 0) sb.setCharAt(next(sb.length), (33 + next(27)).toChar)
          if (next(3) == 0) sb.append((33 + next(27)).toChar)
          sb.toString
        }
      (a, b, next(3).toByte, next(3).toByte)
    }
    rand ++ Seq(
      (null, "abc", 0.toByte, 0.toByte),
      ("abc", null, 0.toByte, 1.toByte),
      ("", "abc", 2.toByte, 0.toByte),
      ("abc", "", 0.toByte, 2.toByte),
      ("abc", "abc", 0.toByte, 0.toByte),
      ("abc", "abc", 0.toByte, 1.toByte))
  }

  test("PairScoreMax expression == pairScoreMaxPre UDF, bit for bit") {
    import spark.implicits._
    assert(spark.catalog.functionExists("pair_score_max"),
      "SparkSpecBase must install GraftExtensions")
    val df = pairs.toDF("na", "nb", "ca", "cb")
      .select(col("na"), col("nb"),
        col("ca").cast("byte").as("ca"), col("cb").cast("byte").as("cb"))
    val w = Weights()
    val both = df.select(
      K.pairScoreMaxPre(col("na"), col("nb"), col("ca"), col("cb"), 3, w)
        .as("udf"),
      K.pairScoreMaxPreIn(spark)(col("na"), col("nb"), col("ca"), col("cb"), 3, w)
        .as("native"))
      .collect()
    assert(both.length == pairs.length)
    var scored = 0
    both.foreach { r =>
      val u = if (r.isNullAt(0)) None else Some(r.getDouble(0))
      val n = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      assert(u == n, s"udf=$u native=$n") // exact, not tolerance
      if (n.isDefined) scored += 1
    }
    // the fixture must exercise BOTH channels meaningfully
    assert(scored > 50, s"only $scored scored pairs — fixture too thin")
    assert(scored < both.length, "no null results — fixture too easy")
  }

  test("non-default weights and maxEditDistance reach the generated code") {
    import spark.implicits._
    val w = Weights(ld = 0.7, lcs = 0.1, prefix = 0.1, suffix = 0.05,
      caseW = 0.05)
    val df = pairs.toDF("na", "nb", "ca", "cb")
      .select(col("na"), col("nb"),
        col("ca").cast("byte").as("ca"), col("cb").cast("byte").as("cb"))
    val both = df.select(
      K.pairScoreMaxPre(col("na"), col("nb"), col("ca"), col("cb"), 1, w)
        .as("udf"),
      K.pairScoreMaxPreIn(spark)(col("na"), col("nb"), col("ca"), col("cb"), 1, w)
        .as("native"))
      .collect()
    both.foreach { r =>
      val u = if (r.isNullAt(0)) None else Some(r.getDouble(0))
      val n = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      assert(u == n, s"udf=$u native=$n")
    }
  }

  test("pairAccept decision == pairScoreMax >= threshold, every weight set") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    // short fixture pairs + transcript-length near-dups (the production
    // shape, exercising the lower-bound accept, the upper-bound reject,
    // and the binary-search + diagonal-scan fallback)
    var state = 0x5EEDL
    def next(n: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      ((state >>> 33) % n).toInt
    }
    val rng = new scala.util.Random(4242L)
    val long = (1 to 150).map { _ =>
      val a = graft.sources.SyntheticText.phrase(rng, 5 + rng.nextInt(40))
      val b =
        if (rng.nextInt(5) == 0) graft.sources.SyntheticText.phrase(rng, 5 + rng.nextInt(40))
        else graft.sources.SyntheticText.corrupt(rng, a, 1 + rng.nextInt(3))
      (a, b, next(3).toByte, next(3).toByte)
    }
    val weightSets = Seq(
      Weights(),
      Weights(ld = 1.0, lcs = 0.0, prefix = 0.2, suffix = 0.2, caseW = 0.1),
      Weights(ld = 0.1, lcs = 1.0, prefix = 0.1, suffix = 0.1, caseW = 0.1),
      Weights(ld = 0.5, lcs = -0.2, prefix = 0.3, suffix = 0.3, caseW = 0.1))
    val thresholds = Seq(0.0, 0.3, 0.5, 0.7, 0.9, 1.0)
    var accepts = 0
    var rejectsScored = 0
    for ((a, b, ca, cb) <- pairs ++ long; w <- weightSets; t <- thresholds) {
      val score = KernelExprs.pairScoreMax(u8(a), u8(b), ca, cb, 3,
        w.ld, w.lcs, w.prefix, w.suffix, w.caseW)
      val expected = !java.lang.Double.isNaN(score) && score >= t
      val got = KernelExprs.pairAccept(u8(a), u8(b), ca, cb, 3,
        w.ld, w.lcs, w.prefix, w.suffix, w.caseW, t)
      assert(got == expected, s"a=$a b=$b w=$w t=$t score=$score")
      if (expected) accepts += 1
      else if (!java.lang.Double.isNaN(score)) rejectsScored += 1
    }
    // the grid must exercise both outcomes on scored pairs
    assert(accepts > 100, s"only $accepts accepts — fixture too thin")
    assert(rejectsScored > 100, s"only $rejectsScored scored rejects")
  }

  test("PairAccept expression == pair_score_max >= threshold in a plan") {
    import spark.implicits._
    assert(spark.catalog.functionExists("pair_accept"),
      "SparkSpecBase must install GraftExtensions")
    val w = Weights()
    val df = pairs.toDF("na", "nb", "ca", "cb")
      .select(col("na"), col("nb"),
        col("ca").cast("byte").as("ca"), col("cb").cast("byte").as("cb"))
    val score = K.pairScoreMaxPreIn(spark)(
      col("na"), col("nb"), col("ca"), col("cb"), 3, w)
    for (t <- Seq(0.5, 0.7, 0.9)) {
      val both = df.select(
        (score.isNotNull && score >= t).as("viaScore"),
        K.pairAcceptPreIn(spark)(col("na"), col("nb"), col("ca"), col("cb"),
          3, t, w).as("viaAccept"))
        .collect()
      both.foreach { r =>
        assert(!r.isNullAt(1), "pair_accept must never be null")
        assert(r.getBoolean(0) == r.getBoolean(1), s"t=$t row=$r")
      }
    }
  }

  test("the accept-filter plan stays codegen'd with the extension") {
    val df = spark.range(50).select(
      concat(lit("abcd"), (col("id") % 7).cast("string")).as("na"),
      concat(lit("abc"), (col("id") % 5).cast("string")).as("nb"),
      (col("id") % 3).cast("byte").as("ca"),
      (col("id") % 3).cast("byte").as("cb"))
    val plan = df.filter(
      K.pairAcceptPreIn(spark)(col("na"), col("nb"), col("ca"), col("cb"), 3,
        0.7, Weights()))
      .queryExecution.executedPlan.toString
    assert(plan.contains("pair_accept"), plan)
    assert(!plan.contains("UDF"), s"native path still routes through a UDF:\n$plan")
  }

  test("the verify plan stays codegen'd (no UDF boundary) with the extension") {
    // a range source, not a local literal table: ConvertToLocalRelation
    // would otherwise evaluate the projection at plan time and leave
    // nothing to inspect (which exercises eval(), not the plan)
    val df = spark.range(50).select(
      concat(lit("abcd"), (col("id") % 7).cast("string")).as("na"),
      concat(lit("abc"), (col("id") % 5).cast("string")).as("nb"),
      (col("id") % 3).cast("byte").as("ca"),
      (col("id") % 3).cast("byte").as("cb"))
    val plan = df.select(
      K.pairScoreMaxPreIn(spark)(col("na"), col("nb"), col("ca"), col("cb"), 3,
        Weights()).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("pair_score_max"), plan)
    assert(!plan.contains("UDF"), s"native path still routes through a UDF:\n$plan")
  }
}

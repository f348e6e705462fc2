package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL users reach the native expressions through SparkSessionExtensions —
  * the engine's extension-point packaging (spark.sql.extensions).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("graft functions are SQL-callable and agree with the column helpers") {
    // withExtensions only applies at session CREATION (getOrCreate on a live
    // context ignores it) — register() is the existing-session path, scoped
    // to a fresh child session here
    val s = SparkTestBase.spark.newSession()
    GraftExtensions.register(s)
    import s.implicits._
    val df = Seq(("alpha beta gamma", Array(1.0f, 2.0f, 3.0f))).toDF("text", "vec")
    df.createOrReplaceTempView("gx")
    val row = s.sql(
      """SELECT graft_simhash64(text) AS sh,
        |  size(graft_word_shingles(text, 2)) AS n2,
        |  size(graft_minhash_sig(graft_word_shingles(text, 2), 8)) AS nmh,
        |  graft_dot(vec, vec) AS dp
        |FROM gx""".stripMargin).head()
    // agree with the DataFrame column helpers
    val expected = df.select(
      CatalystExprs.simHash64($"text"),
      CatalystExprs.dotF($"vec", $"vec")).head()
    assert(row.getLong(0) == expected.getLong(0))
    assert(row.getInt(1) == 2) // "alpha beta","beta gamma"
    assert(row.getInt(2) == 8)
    assert(row.getDouble(3) == expected.getDouble(1) && row.getDouble(3) == 14.0)

    // round-6 registrations: strict word grams + repetition stats
    val r2 = s.sql(
      """SELECT size(graft_word_grams(text, 2)) AS ng,
        |  graft_repetition_stats(text).tokens AS toks,
        |  graft_repetition_stats(text).uniq_words AS uw
        |FROM gx""".stripMargin).head()
    assert(r2.getInt(0) == 2)
    assert(r2.getInt(1) == 3 && r2.getInt(2) == 3) // all three words distinct
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions registers the native functions when a session is built
  * with `spark.sql.extensions` — validated with its own SparkSession
  * (extensions apply at session construction, so this suite must not
  * reuse the shared one; a fresh session on the same SparkContext picks
  * up the extension config passed here).
  */
class ExtensionsRegSpec extends AnyFunSuite {

  test("spark.sql.extensions wires rolling_hash64 into SQL") {
    // getOrCreate returns the suite-shared session when one is already
    // default/active — with THIS builder's extensions silently ignored
    // (they apply only at construction). Clear both slots so a genuinely
    // new session is built (on the existing SparkContext), then restore:
    // the test must pass in ANY suite order, not just when it runs first.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val got = spark.sql("SELECT rolling_hash64('hello') AS h").head().getLong(0)
      var h = 1125899906842597L
      "hello".foreach(c => h = 31 * h + c)
      assert(got === h)
      // the full native-function surface resolves in SQL
      val row = spark.sql(
        """SELECT normalize_nfc('x') AS n,
          |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |  simhash64(array('a', 'b')) AS s,
          |  size(minhash(array('a', 'b'), 4)) AS mk,
          |  size(shingles(array('a', 'b', 'c'), 2)) AS sh,
          |  top_gram_chars(array('a', 'b', 'a', 'b'), 2) AS tg""".stripMargin)
        .head()
      assert(row.getString(0) === "x")
      assert(row.getDouble(1) === 11.0)
      assert(row.getInt(3) === 4)
      assert(row.getInt(4) === 2)
      assert(row.getLong(5) === 6L) // "a b" twice, 3 chars each
    } finally {
      // leave the context running for other suites; the extra session
      // object is discarded and the shared session slots are restored
      prevDefault.fold(SparkSession.clearDefaultSession())(
        SparkSession.setDefaultSession)
      prevActive.fold(SparkSession.clearActiveSession())(
        SparkSession.setActiveSession)
    }
  }
}

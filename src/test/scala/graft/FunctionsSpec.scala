package graft

import graft.functions.{GraftFunctions, VectorOps}
import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Native cosine_sim Catalyst expression: kernel agreement, codegen path,
  * SQL registration (direct + SparkSessionExtensions), null/type handling.
  */
class FunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-functionsspec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("VectorOps.cosine agrees bit-for-bit with Similarity.cosine") {
    val rng = new graft.fixtures.Fixtures.Rng(7L)
    (1 to 50).foreach { _ =>
      val a = Array.fill(24)((rng.nextDouble * 2 - 1).toFloat)
      val b = Array.fill(24)((rng.nextDouble * 2 - 1).toFloat)
      val expected = Similarity.cosine(a, b)
      val got = VectorOps.cosine(
        ArrayData.toArrayData(a), ArrayData.toArrayData(b))
      assert(got == expected) // bit equality, not approx
    }
  }

  test("cosine_sim through DataFrame codegen equals the kernel") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rng = new graft.fixtures.Fixtures.Rng(13L)
    val rows = (1 to 20).map { i =>
      (i.toLong,
        Array.fill(8)((rng.nextDouble * 2 - 1).toFloat).toSeq,
        Array.fill(8)((rng.nextDouble * 2 - 1).toFloat).toSeq)
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("c", expr("cosine_sim(a, b)"))
    val got = df.select("id", "c").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, a, b) =>
      assert(got(id) == Similarity.cosine(a.toArray, b.toArray), s"row $id")
    }
  }

  test("cosine_sim is available via SparkSessionExtensions (no explicit register)") {
    val v = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c")
      .head().getDouble(0)
    assert(v == 1.0)
  }

  test("null inputs -> null; wrong types -> analysis error") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq((Some(Seq(1f, 0f)), Option.empty[Seq[Float]])).toDF("a", "b")
      .withColumn("c", expr("cosine_sim(a, b)"))
    assert(df.head().isNullAt(2))
    val err = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b").withColumn("c", expr("cosine_sim(a, b)")).head()
    }
    assert(err.getMessage.toLowerCase.contains("array") ||
      err.getMessage.toLowerCase.contains("type"))
  }

  test("lm_score: SQL surface matches Scorer.singleScore; ordering sensible") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = Seq("die bedeutung der finanziellen", "qqxz zxqq jjkk", "a")
      .toDF("t").withColumn("s", expr("lm_score(t)")).collect()
    val byText = rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    Seq("die bedeutung der finanziellen", "qqxz zxqq jjkk", "a").foreach { t =>
      assert(byText(t) == graft.lm.Scorer.singleScore(t))
    }
    // German-like text scores better (lower) than consonant noise
    assert(byText("die bedeutung der finanziellen") < byText("qqxz zxqq jjkk"))
    assert(byText("a").isPosInfinity) // single-char special case
  }

  test("nfc_normalize: codegen surface equals java.text.Normalizer NFC; null passes through") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val vectors = Seq(
      "café",            // e + combining acute -> é
      "Ångström",   // ANGSTROM SIGN singleton -> Å
      "already ascii",         // NFC no-op fast path
      "mixed café and Å ring") // A + combining ring -> Å
    val got = vectors.toDF("t")
      .withColumn("n", expr("nfc_normalize(t)"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    vectors.foreach { v =>
      val want = java.text.Normalizer.normalize(
        v, java.text.Normalizer.Form.NFC)
      assert(got(v) == want, s"vector ${v.codePoints().toArray.toSeq}")
    }
    assert(got("café") == "café")
    assert(got("café").length == 4)
    // null in -> null out
    val nullRow = Seq(Option.empty[String]).toDF("t")
      .withColumn("n", expr("nfc_normalize(t)")).head()
    assert(nullRow.isNullAt(1))
    // available via SparkSessionExtensions without explicit register
    assert(spark.sql("SELECT nfc_normalize('x') AS n").head().getString(0) == "x")
  }

  test("zero-norm and empty vectors -> 0.0") {
    assert(VectorOps.cosine(
      ArrayData.toArrayData(Array(0f, 0f)), ArrayData.toArrayData(Array(1f, 2f))) == 0.0)
    assert(VectorOps.cosine(
      ArrayData.toArrayData(Array.empty[Float]), ArrayData.toArrayData(Array.empty[Float])) == 0.0)
  }

  test("dot_product / vec_norm: hoisted-norm cosine is bit-equal to cosine_sim") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rng = new graft.fixtures.Fixtures.Rng(99L)
    val rows = (1 to 30).map { i =>
      (i.toLong,
        Array.fill(16)((rng.nextDouble * 2 - 1).toFloat).toSeq,
        Array.fill(16)((rng.nextDouble * 2 - 1).toFloat).toSeq)
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.selectExpr(
      "cosine_sim(a, b) AS direct",
      "dot_product(a, b) / (vec_norm(a) * vec_norm(b)) AS hoisted").collect()
    out.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // bit equality, not approx
    }
    // zero-vector convention matches the kernel (0.0, not NaN) when guarded
    val z = Seq((1L, Seq(0f, 0f), Seq(1f, 2f))).toDF("id", "a", "b")
      .selectExpr("cosine_sim(a, b) AS c",
        "CASE WHEN vec_norm(a) * vec_norm(b) = 0.0 THEN 0.0 " +
          "ELSE dot_product(a, b) / (vec_norm(a) * vec_norm(b)) END AS h")
      .collect()(0)
    assert(z.getDouble(0) == 0.0 && z.getDouble(1) == 0.0)
  }

  test("NULL array elements count as 0.0 — defined, engine-independent") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(cast(1.0 as float), cast(null as float)), " +
        "array(cast(1.0 as float), cast(2.0 as float))) AS c, " +
        "dot_product(array(cast(1.0 as float), cast(null as float)), " +
        "array(cast(1.0 as float), cast(2.0 as float))) AS d, " +
        "vec_norm(array(cast(null as float), cast(3.0 as float))) AS n")
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0 / math.sqrt(5.0)) < 1e-12) // (1,0)·(1,2)
    assert(r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == 3.0)
  }

  test("wrong argument count raises a clear analysis error, not IndexOutOfBounds") {
    GraftFunctions.register(spark)
    val e = intercept[Exception](
      spark.sql("SELECT cosine_sim(array(cast(1.0 as float)))").collect())
    assert(e.getMessage.contains("expects 2"), e.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT vec_norm(array(cast(1.0 as float)), 2)").collect())
    assert(e2.getMessage.contains("expects 1"), e2.getMessage)
  }
}

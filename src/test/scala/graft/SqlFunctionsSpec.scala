package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftExtensions, TextFunctions, VectorFunctions}

/** The SQL surface of the engine's native expressions: every registration
  * in [[GraftExtensions.functions]] must produce the same results as its
  * DSL twin, and non-literal shape arguments must fail with the
  * plan-time-literal message rather than misplan. The shared test session
  * predates the extension, so registrations are applied through the SAME
  * builder list the extension injects — what is tested is what ships.
  */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val registered: Unit =
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }

  test("every SQL registration matches its DSL twin") {
    registered
    Seq(("the quick brown fox jumps over the lazy dog", 1L))
      .toDF("text", "id").createOrReplaceTempView("sqlfn_t")
    val sql = spark.sql(
      """SELECT word_shingles(text, 3, true) AS ws,
        |       word_shingle_hashes(text, 3, true) AS wsh,
        |       char_ngrams(text, 4) AS cng,
        |       minhash_sig(word_shingles(text, 3, true), 4) AS mh,
        |       minhash_md5_lanes(word_shingles(text, 3, true), 4) AS lanes,
        |       simhash_md5_chunks(word_shingles(text, 3, true), 16, 4) AS chunks,
        |       simhash64(word_shingles(text, 3, true)) AS sh,
        |       cosine_sim(array(1.0F, 2.0F), array(2.0F, 4.0F)) AS cs,
        |       quantized_dot(array(1.0F, 2.0F), array(2.0F, 4.0F), 64) AS qd
        |FROM sqlfn_t""".stripMargin)
    val t = col("text")
    def shingles = TextFunctions.word_shingles(t, 3, distinct = true)
    val vec1 = array(lit(1.0f), lit(2.0f))
    val vec2 = array(lit(2.0f), lit(4.0f))
    val dsl = spark.table("sqlfn_t").select(
      TextFunctions.word_shingles(t, 3, distinct = true).as("ws"),
      TextFunctions.word_shingle_hashes(t, 3, distinct = true).as("wsh"),
      TextFunctions.char_ngrams(t, 4).as("cng"),
      TextFunctions.minhash_sig(shingles, 4).as("mh"),
      TextFunctions.minhash_md5_lanes(shingles, 4).as("lanes"),
      TextFunctions.simhash_md5_chunks(shingles, 16, 4).as("chunks"),
      TextFunctions.simhash64(shingles).as("sh"),
      VectorFunctions.cosine_sim(vec1, vec2).as("cs"),
      VectorFunctions.quantized_dot(vec1, vec2, 64).as("qd"))
    assert(sql.collect().toSeq == dsl.collect().toSeq)
  }

  test("wrong arity fails with the function name, not an index error") {
    registered
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles('a b c d', 3)").collect()
    }
    assert(e.getMessage.contains("word_shingles expects 3"), e.getMessage)
  }

  test("non-literal shape arguments fail at plan time with a clear message") {
    registered
    Seq(("abc", 1L)).toDF("text", "id").createOrReplaceTempView("sqlfn_t2")
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles(text, length(text), true) FROM sqlfn_t2")
        .collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }
}

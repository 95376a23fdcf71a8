package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("cosine_sim and srp_buckets are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
               srp_buckets(array(1.0D, 2.0D, 3.0D), 8, 4) AS b""").head()
    assert(row.getDouble(0) === 1.0)
    assert(row.getSeq[Long](1).length === 4)
  }

  test("dot_product and normalize_unicode are callable from SQL") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
               normalize_unicode('éclair', 'NFC') AS s""").head()
    assert(row.getDouble(0) === 11.0)
    assert(row.getString(1) === "éclair")
  }

  test("simhash64 and minhash_sig are callable from SQL and match the Column API") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    val viaSql = spark.sql(
      """SELECT simhash64(array('alpha', 'beta')) AS sh,
                minhash_sig(array('alpha', 'beta'), 8) AS mh""").head()
    val viaCol = spark.range(1).select(
      graft.functions.SimHash64.simhash64(array(lit("alpha"), lit("beta"))).as("sh"),
      graft.functions.MinHashSig.minhashSig(array(lit("alpha"), lit("beta")), 8).as("mh")).head()
    assert(viaSql.getLong(0) === viaCol.getLong(0))
    assert(viaSql.getSeq[Long](1) === viaCol.getSeq[Long](1))
  }

  test("char_ngrams and pq_encode are callable from SQL and match the Column API") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    // 2 subvectors of 2 dims, 2 codewords each: flat layout [(s*k+j)*dsub+i]
    val books = Array(1.0, 0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 1.0)
    val booksSql = books.map(b => s"${b}D").mkString("array(", ", ", ")")
    val viaSql = spark.sql(
      s"""SELECT char_ngrams('abcd', 3) AS g,
                 pq_encode(array(1.0D, 0.0D, 0.0D, 1.0D), $booksSql, 2, 2) AS codes,
                 word_ngrams(array('a', 'b', 'c'), 2) AS wg""").head()
    val viaCol = spark.range(1).select(
      graft.functions.CharNgrams.charNgrams(lit("abcd"), 3).as("g"),
      graft.functions.PqEncode.pqEncode(
        array(lit(1.0), lit(0.0), lit(0.0), lit(1.0)), books, 2, 2).as("codes"),
      graft.functions.WordNgrams.wordNgrams(array(lit("a"), lit("b"), lit("c")), 2).as("wg")).head()
    assert(viaSql.getSeq[String](0) === viaCol.getSeq[String](0))
    assert(viaSql.getSeq[Int](1) === viaCol.getSeq[Int](1))
    assert(viaSql.getSeq[String](2) === Seq("a b", "b c"))
    assert(viaCol.getSeq[String](2) === Seq("a b", "b c"))
    assert(viaSql.getSeq[Int](1) === Seq(0, 1)) // unit vector picks its codewords
    // non-constant codebook is rejected with a clear message
    val err = intercept[Exception] {
      spark.sql("SELECT pq_encode(array(1.0D), array(rand()), 1, 1)").head()
    }
    assert(err.getMessage.toLowerCase.contains("foldable"))
  }

  test("simhash64 and minhash_sig skip null array elements (no NPE from SQL)") {
    GraftExtensions.register(spark)
    val withNull = spark.sql(
      """SELECT simhash64(array('alpha', CAST(NULL AS STRING), 'beta')) AS sh,
                minhash_sig(array('alpha', CAST(NULL AS STRING), 'beta'), 8) AS mh""").head()
    val without = spark.sql(
      """SELECT simhash64(array('alpha', 'beta')) AS sh,
                minhash_sig(array('alpha', 'beta'), 8) AS mh""").head()
    assert(withNull.getLong(0) === without.getLong(0))
    assert(withNull.getSeq[Long](1) === without.getSeq[Long](1))
  }

  test("SQL cosine_sim matches the Column API on real embeddings") {
    GraftExtensions.register(spark)
    graft.sources.Tables.load(spark, TestSpark.sfDir, "embeddings").limit(20)
      .createOrReplaceTempView("emb_ext_test")
    val viaSql = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS c
         FROM emb_ext_test a JOIN emb_ext_test b ON b.vec_id = a.vec_id + 1
         ORDER BY a.vec_id""").collect().map(_.getDouble(1))
    import org.apache.spark.sql.functions._
    val a = spark.table("emb_ext_test").select(col("vec_id"), col("embedding").as("ea"))
    val b = spark.table("emb_ext_test").select((col("vec_id") - 1).as("vec_id"), col("embedding").as("eb"))
    val viaCol = a.join(b, "vec_id").orderBy("vec_id")
      .select(graft.functions.VectorFunctions.cosine(col("ea"), col("eb")))
      .collect().map(_.getDouble(0))
    assert(viaSql.toSeq === viaCol.toSeq)
  }
}

package graft

class GraftExtensionsSpec extends SparkSpec {

  test("SQL surface: fvec_dot / fvec_norm / fvec_cosine") {
    val r = spark.sql(
      """SELECT fvec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |       fvec_norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n,
        |       fvec_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                   array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c
        |""".stripMargin).head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 5.0 && math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("SQL surface: word_shingles and simhash64/minhash_signature compose") {
    val sh = spark.sql("SELECT word_shingles('a b c d', 2) AS s").head().getSeq[String](0)
    assert(sh == Seq("a b", "b c", "c d"))
    val sig = spark.sql(
      """SELECT minhash_signature(transform(word_shingles('a b c d e f', 3), x -> xxhash64(x)), 16, 42) AS m,
        |       simhash64(transform(word_shingles('a b c d e f', 3), x -> xxhash64(x))) AS h
        |""".stripMargin).head()
    assert(sig.getSeq[Long](0).size == 16)
    // deterministic
    val again = spark.sql(
      "SELECT simhash64(transform(word_shingles('a b c d e f', 3), x -> xxhash64(x))) AS h").head()
    assert(sig.getLong(1) == again.getLong(0))
  }

  test("SQL surface: topk_by_score aggregate") {
    spark.sql("SELECT * FROM VALUES (1, 0.9, 10L), (1, 0.5, 11L), (1, 0.9, 9L), (2, 0.1, 7L) AS t(q, s, id)")
      .createOrReplaceTempView("scored")
    val rows = spark.sql(
      "SELECT q, topk_by_score(s, id, 2) AS top FROM scored GROUP BY q ORDER BY q")
      .collect()
    val top1 = rows(0).getSeq[org.apache.spark.sql.Row](1)
    assert(top1.map(r => (r.getDouble(0), r.getLong(1))) == Seq((0.9, 9L), (0.9, 10L)))
    assert(rows(1).getSeq[org.apache.spark.sql.Row](1).size == 1)
  }

  test("bad literal args produce clear errors") {
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles('a b', 'x')").collect()
    }
    assert(e.getMessage.contains("k must be an integer literal"))
  }
}

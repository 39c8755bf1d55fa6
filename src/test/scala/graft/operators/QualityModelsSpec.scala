package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class QualityModelsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def toyCorpus = {
    import spark.implicits._
    // pos dialect: {good clean fine}, neg dialect: {spam junk noise},
    // "the" is shared so both classes carry it
    Seq(
      (0L, "good clean fine the", true),
      (1L, "good good clean the", true),
      (2L, "fine clean good the", true),
      (3L, "spam junk noise the", false),
      (4L, "junk junk spam the", false),
      (5L, "noise spam junk the", false)
    ).toDF("doc_id", "text", "pos")
  }

  test("NB classifier separates the two planted dialects on held-out docs") {
    import spark.implicits._
    val train = toyCorpus
    val eval = Seq(
      (10L, "good clean good fine"),   // pure pos dialect
      (11L, "junk noise spam junk"),   // pure neg dialect
      (12L, "good spam")               // mixed: one token each side
    ).toDF("doc_id", "text")
    val out = QualityModels.nbQualityScores(train, eval, col("pos"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(out(10L)._1 > 0 && out(10L)._2, s"pos dialect should score > 0: $out")
    assert(out(11L)._1 < 0 && !out(11L)._2, s"neg dialect should score < 0: $out")
    // mixed doc: symmetric token evidence cancels, prior = ln(4/4) = 0
    assert(math.abs(out(12L)._1) < 0.5, s"mixed doc should sit near 0: $out")
  }

  test("NB: hand-computed score for a single-token held-out doc") {
    import spark.implicits._
    val train = toyCorpus
    val eval = Seq((20L, "good")).toDF("doc_id", "text")
    // train: cp(good)=4, cn(good)=0; np=12, nn=12, V=7; dp=dn=3
    val expected = BigDecimal(
      math.log(5.0 / 19) - math.log(1.0 / 19))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = QualityModels.nbQualityScores(train, eval, col("pos"))
      .collect().head.getDouble(1)
    assert(got == expected, s"got $got expected $expected")
  }

  test("NB: OOV-only doc gets exactly the smoothed-zero score") {
    import spark.implicits._
    val train = toyCorpus
    val eval = Seq((30L, "zzz qqq")).toDF("doc_id", "text")
    // each OOV token contributes ln(1/19) - ln(1/19) = 0; prior = 0
    val got = QualityModels.nbQualityScores(train, eval, col("pos"))
      .collect().head.getDouble(1)
    assert(got == 0.0, s"OOV-only doc should score prior-only 0: $got")
  }

  test("persisted model scores bit-identically to direct training-time scoring") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val eval = docs.filter(col("doc_id") % 5 === 0)
    val direct = QualityModels.nbQualityScores(train, eval, col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSeq
    QualityModels.writeNbModel(train, col("lang") === "en", "nb_spec_model")
    val served = QualityModels.scoreAgainstModel(eval, "nb_spec_model")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSeq
    assert(served == direct, "model table + scalars must be sufficient statistics")
  }

  test("scoreAgainstModel refuses a table not written by writeNbModel") {
    import spark.implicits._
    Dedup.dropManaged(spark, "nb_spec_bogus")
    Seq(("x", 0.5)).toDF("t", "w").write.mode("overwrite")
      .saveAsTable("nb_spec_bogus")
    val e = intercept[IllegalArgumentException] {
      QualityModels.scoreAgainstModel(
        Seq((1L, "x")).toDF("doc_id", "text"), "nb_spec_bogus")
    }
    assert(e.getMessage.contains("graft.prior"))
  }

  test("DSIR ranks target-dialect docs above off-target docs") {
    import spark.implicits._
    // target = docs speaking {alpha beta}; raw corpus adds {gamma delta}
    val docs = Seq(
      (0L, "alpha beta alpha beta", true),
      (1L, "beta alpha beta alpha", true),
      (2L, "gamma delta gamma delta", false),
      (3L, "delta gamma delta gamma", false),
      (4L, "alpha beta gamma delta", false) // half-target candidate
    ).toDF("doc_id", "text", "tgt")
    val w = QualityModels.dsirWeights(docs, col("tgt"), topN = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(0L) > w(4L) && w(1L) > w(4L),
      s"pure target dialect must outweigh the mixed doc: $w")
    assert(w(4L) > w(2L) && w(4L) > w(3L),
      s"mixed doc must outweigh pure off-target docs: $w")
  }

  test("DSIR topN selection is deterministic and ordered (weight desc, id asc)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = QualityModels.dsirWeights(docs, col("lang") === "en", topN = 20).collect()
    val b = QualityModels.dsirWeights(docs.repartition(7), col("lang") === "en",
      topN = 20).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq,
      "selection must be partitioning-independent")
    val pairs = a.map(r => (r.getDouble(1), r.getLong(0)))
    assert(pairs.sliding(2).forall { case Array((w1, i1), (w2, i2)) =>
      w1 > w2 || (w1 == w2 && i1 < i2) },
      s"output must be (weight desc, id asc) ordered: ${pairs.toSeq}")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import graft.analysis.Analyzer

class ExpressionsSpec extends AnyFunSuite {

  // the shared test session may already exist (extensions conf applies only
  // at build time), so register imperatively — same path GraftCli uses
  private lazy val spark: SparkSession = {
    val s = SparkTestSession.spark
    graft.spark.GraftExtensions.register(s)
    s
  }

  test("graft_tokenize expression matches Analyzer.tokenize on golden vectors") {
    import spark.implicits._
    val inputs = Goldens.load("text_vectors.json").elements().asScala
      .map(_.get("input").asText()).toSeq
    val df = inputs.toDF("text")
    df.createOrReplaceTempView("ext_texts")
    val got = spark.sql("SELECT graft_tokenize(text) FROM ext_texts")
      .as[Seq[String]].collect()
    got.zip(inputs).foreach { case (g, in) =>
      assert(g == Analyzer.tokenize(in).toSeq, in.take(50))
    }
  }

  test("graft_normalize expression matches Analyzer.normalizeText") {
    import spark.implicits._
    val inputs = Goldens.load("text_vectors.json").elements().asScala
      .map(_.get("input").asText()).toSeq
    val got = inputs.toDF("text")
      .selectExpr("graft_normalize(text)").as[String].collect()
    got.zip(inputs).foreach { case (g, in) =>
      assert(g == Analyzer.normalizeText(in), in.take(50))
    }
  }

  test("expressions stay inside whole-stage codegen (no ScalaUDF)") {
    // literal input would be constant-folded (interpreted eval path);
    // a range source forces the generated-code path
    val df = spark.range(5)
      .selectExpr("concat('a b the c ', id) AS text")
      .selectExpr("size(graft_tokenize(text)) AS n", "graft_normalize(text) AS t")
      .filter("n > 0")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    // '*(n)' prefixes mark operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project") && plan.contains("*(1) Filter"), plan)
    val rows = df.collect()
    assert(rows.length == 5 && rows.head.getInt(0) == 3) // b,c,<id> ('a','the' are stopwords)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

class CodegenSpec extends SparkSpec {

  test("CosineSim runs under codegen with fallback disabled") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Tables.embeddings(spark, sfDir)
        .select(VectorExprs.cosineSim(col("embedding"),
          typedlit(Array.tabulate(64)(i => (i + 1).toDouble / 64))).as("c"))
      // would throw if the generated code failed to compile
      val n = df.filter(col("c").isNotNull).count()
      assert(n > 0)
      // WSCG renders as a `*(stageId)` prefix in the simple plan string
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*(1) Project"), s"expected WSCG-starred Project in:\n$plan")
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("delegated expressions execute inside a WSCG project") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Tables.documents(spark, sfDir)
        .select(
          VectorExprs.charNgrams(col("text"), 3).as("g"),
          VectorExprs.simHash64(split(trim(col("text")), "\\s+")).as("sh"),
          VectorExprs.minHashSig(col("text")).as("mh"))
      assert(df.collect().nonEmpty)
      assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual: measure the exact-cosine pair probe's two shapes at sf0.1 —
  * per-pair `cosine(va, vb)` (3 dot kernels per enumerated pair) vs
  * per-row precomputed norms with a per-pair single dot. Both produce
  * bit-identical pair sets (norm2 per row is the same kernel on the
  * same input; the division shape is unchanged).
  * Run: sbt "Test/runMain graft.CosProbe [sfDir]" */
object CosProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id").cast("long").as("id"),
              col("embedding").cast("array<double>").as("v"))
      .localCheckpoint(false)
    val n = emb.count()
    println(s"rows = $n")
    def time(tag: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val c = f
        println(f"$tag pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c pairs)")
      }
    }
    val a = emb.select(col("id").as("id_a"), col("v").as("va"))
    val b = emb.select(col("id").as("id_b"), col("v").as("vb"))
    time("per-pair cosine   ") {
      a.join(b, col("id_a") < col("id_b"))
        .filter(functions.VectorFunctions.cosine(col("va"), col("vb"))
                  >= 0.9)
        .count()
    }
    val an = emb.select(col("id").as("id_a"), col("v").as("va"),
                        functions.VectorFunctions.norm2(col("v")).as("na"))
    val bn = emb.select(col("id").as("id_b"), col("v").as("vb"),
                        functions.VectorFunctions.norm2(col("v")).as("nb"))
    time("precomputed norms ") {
      an.join(bn, col("id_a") < col("id_b"))
        .filter(functions.VecDot.vec_dot(col("va"), col("vb")) /
                  (col("na") * col("nb")) >= 0.9)
        .count()
    }
    // the maintainer's exact shape: child-session conf (width 8, AQE
    // off), =!= condition, least/greatest + distinct on the survivors
    val child = spark.newSession()
    child.conf.set("spark.sql.adaptive.enabled", "false")
    child.conf.set("spark.sql.shuffle.partitions", "8")
    val embC = org.apache.spark.sql.graft.bridge.reRoot(emb, child)
    val a2 = embC.select(col("id").as("id_a"), col("v").as("va"))
    val b2 = embC.select(col("id").as("id_b"), col("v").as("vb"))
    time("maint per-pair    ") {
      a2.join(b2, col("id_a") =!= col("id_b"))
        .filter(functions.VectorFunctions.cosine(col("va"), col("vb"))
                  >= 0.9)
        .select(least(col("id_a"), col("id_b")).as("src"),
                greatest(col("id_a"), col("id_b")).as("dst"))
        .distinct().count()
    }
    val a3 = embC.select(col("id").as("id_a"), col("v").as("va"))
      .withColumn("na", functions.VectorFunctions.norm2(col("va")))
    val b3 = embC.select(col("id").as("id_b"), col("v").as("vb"))
      .withColumn("nb", functions.VectorFunctions.norm2(col("vb")))
    time("maint hoisted     ") {
      a3.join(b3, col("id_a") =!= col("id_b"))
        .filter(functions.VectorFunctions.cosineHoisted(
                  col("va"), col("vb"), col("na"), col("nb")) >= 0.9)
        .select(least(col("id_a"), col("id_b")).as("src"),
                greatest(col("id_a"), col("id_b")).as("dst"))
        .distinct().count()
    }
    println("== hoisted plan ==")
    a3.join(b3, col("id_a") =!= col("id_b"))
      .filter(functions.VectorFunctions.cosineHoisted(
                col("va"), col("vb"), col("na"), col("nb")) >= 0.9)
      .explain("formatted")
    spark.stop()
  }
}

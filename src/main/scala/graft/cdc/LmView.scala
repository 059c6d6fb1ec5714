package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Serve-side ADD-ONE-SMOOTHED BIGRAM LM scoring over the maintained
  * count tables ([[TokenFreqView]] in its unigram and bigram
  * modalities): nll(doc) = −Σ tf·ln((cnt+1)/(ctx_n+V)) / Σ tf, with
  * cnt/ctx_n coalesced to 0 for bigrams/contexts ABSENT from the live
  * corpus — unlike a train-set self-score, fixed probes outlive the
  * docs they came from, so the unseen branch is load-bearing. Serve
  * joins the tiny probe term-frequency frame against the
  * vocabulary-bounded states; the corpus is never re-tokenized. */
object LmView {

  /** `probesTf`: (idCol, bg, tf) — per-probe bigram term frequencies
    * (fixed, tiny). `bgState`/`uniState`: live (token, n) count tables
    * from the maintained views. */
  def score(probesTf: DataFrame, idCol: String,
            bgState: DataFrame, uniState: DataFrame): DataFrame = {
    val v = uniState.agg(count(lit(1)).as("v"))
    val ctx = bgState
      .groupBy(substring_index(col("token"), " ", 1).as("w1"))
      .agg(sum(col("n")).as("ctx_n"))
    probesTf
      .join(bgState.select(col("token").as("bg"), col("n").as("cnt")),
            Seq("bg"), "left")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_bg"),
           round(-sum(col("tf").cast("double") *
                      log((coalesce(col("cnt"), lit(0L)) + 1)
                            .cast("double") /
                          (coalesce(col("ctx_n"), lit(0L)) + col("v")))) /
                   sum(col("tf")),
                 4).as("nll"))
  }
}

package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Silhouette-style cluster-quality audit over labeled embeddings — the
  * "are these labels/clusters actually separated?" check run before
  * trusting a classifier or k-means assignment — WITHOUT any pairwise
  * join: the mean SQUARED distance from point i to class C decomposes as
  *
  *   Σ_{j∈C} d²(i,j) = Σ_d (n_C·q_id² − 2·q_id·S_Cd + Q_Cd)
  *
  * over per-(class, dim) sums S and squared-sums Q — so the whole audit is
  * one flatten aggregation (classes × dims rows, broadcast back), one
  * map-side expansion join, and a per-point aggregation. a(i) is the mean
  * over the OWN class excluding self (denominator n_c − 1; the self term
  * contributes 0 to the sum), b(i) the smallest mean among other classes;
  * silhouette = (b − a) / max(a, b) ∈ [−1, 1].
  *
  * Determinism: quantized integer sums are exact at any partition order
  * (all < 2⁵³, so the final double casts are exact), and every division is
  * a single IEEE op on identical operands with identical parenthesization
  * in the oracle — the repo's exact-ratio rule. Singleton classes yield
  * NULL a and silhouette (no "other point" to measure against).
  *
  * BOUNDED-CLASS CONTRACT: the classes×dims model frame broadcasts and
  * every point expands ×C in the per-class join — both assume the label
  * cardinality is dimension-like (≲10³: k-means cells, language/source
  * labels, quality tiers), NOT key-like. `maxClasses` enforces it loudly
  * (a bounded-probe job, same discipline as the dense-vocabulary cap);
  * raise it only with the broadcast and ×C expansion costs in view.
  */
object ClusterQuality {

  private[vector] def requireBoundedClasses(df: DataFrame, labelCol: String,
                                            cap: Int, who: String): Unit = {
    val probe = df.select(col(labelCol)).distinct().limit(cap + 1).count()
    require(probe <= cap,
      s"$who is a class-statistics operator: its classes x dims model " +
        s"broadcast and per-point x-classes expansion need a bounded label " +
        s"domain, but '$labelCol' has > $cap distinct values — this is a " +
        "key, not a class label (or raise maxClasses deliberately)")
  }

  def silhouette(df: DataFrame, idCol: String, vecCol: String,
                 labelCol: String, quantScale: Double = 10000.0,
                 maxClasses: Int = 1024): DataFrame = {
    requireBoundedClasses(df, labelCol, maxClasses, "silhouette")
    val flat = df.select(
      col(idCol).cast("long").as("id"),
      col(labelCol).cast("long").as("label"),
      posexplode(transform(col(vecCol),
        x => floor(x.cast("double") * lit(quantScale)).cast("long"))).as(Seq("dim", "qv")))
    val model = flat.groupBy(col("label").as("cls"), col("dim"))
      .agg(sum("qv").as("s"), sum(col("qv") * col("qv")).as("q2"),
        count(lit(1)).as("n"))
    val perClass = flat.join(broadcast(model), Seq("dim"))
      .withColumn("term",
        col("n") * col("qv") * col("qv") - lit(2) * col("qv") * col("s") + col("q2"))
      .groupBy(col("id"), col("label"), col("cls"))
      .agg(sum("term").as("x"), max("n").as("nc"))
    val ratios = perClass.withColumn("ratio",
      when(col("cls") === col("label"),
        when(col("nc") > 1, col("x").cast("double") / (col("nc") - 1)))
        .otherwise(col("x").cast("double") / col("nc")))
    ratios.groupBy(col("id").as("vec_id"), col("label"))
      .agg(
        max(when(col("cls") === col("label"), col("ratio"))).as("a_own"),
        min(when(col("cls") =!= col("label"), col("ratio"))).as("b_other"))
      .withColumn("silhouette",
        (col("b_other") - col("a_own")) / greatest(col("a_own"), col("b_other")))
  }
}

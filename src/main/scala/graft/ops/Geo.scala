package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Planar grid-bucketed spatial operators. Web-corpus uses: IP-geo point
  * clustering, lat/lon dedup of business listings, map-tile heat rollups —
  * anywhere "find nearby points" must not become an all-pairs join.
  *
  * Coordinates are treated as PLANAR doubles (for lat/lon at city scale,
  * pre-project or accept the small-angle approximation; a haversine
  * predicate would drag libm trig into the cross-engine contract, while
  * squared euclidean distance is pure +/−/× — bit-reproducible anywhere).
  */
object Geo {

  /** All unordered pairs of points within `eps` (euclidean): each point is
    * bucketed into an integer grid cell of side `eps`
    * (`floor(x/eps), floor(y/eps)`), the LEFT side is replicated onto its
    * own + 8 neighboring cells, and candidates meet by an equi-join on the
    * cell key — any pair with distance ≤ eps differs by at most 1 in each
    * cell index, so the bucketing is LOSSLESS and the exact
    * `dist² ≤ eps²` filter runs only on per-cell candidates, never on the
    * full cross product. `id_a < id_b` keeps each pair once.
    *
    * Output: id_a, id_b, dist2 (squared distance — kept squared so the
    * whole predicate is polynomial in the inputs). Scale shape: one 9×
    * explode of a slim (id, x, y) projection + one integer-key equi-join;
    * a dense cell is a hot join key (AQE skew split applies) but the
    * candidate set stays neighborhood-local by construction.
    */
  def gridNeighbors(df: DataFrame, idCol: String, xCol: String,
                    yCol: String, eps: Double): DataFrame = {
    require(eps > 0, "eps must be positive")
    val pts = df.select(col(idCol).as("_id"),
      col(xCol).cast("double").as("_x"), col(yCol).cast("double").as("_y"),
      floor(col(xCol).cast("double") / eps).cast("long").as("_cx"),
      floor(col(yCol).cast("double") / eps).cast("long").as("_cy"))
    val offsets = Seq(-1L, 0L, 1L)
    val repl = pts.withColumn("_dx", explode(array(offsets.map(lit): _*)))
      .withColumn("_dy", explode(array(offsets.map(lit): _*)))
      .select(col("_id").as("id_a"), col("_x").as("_xa"),
        col("_y").as("_ya"), (col("_cx") + col("_dx")).as("_jx"),
        (col("_cy") + col("_dy")).as("_jy"))
    val right = pts.select(col("_id").as("id_b"), col("_x").as("_xb"),
      col("_y").as("_yb"), col("_cx").as("_jx"), col("_cy").as("_jy"))
    val d2 = (col("_xa") - col("_xb")) * (col("_xa") - col("_xb")) +
      (col("_ya") - col("_yb")) * (col("_ya") - col("_yb"))
    repl.join(right, Seq("_jx", "_jy"))
      .where(col("id_a") < col("id_b") && d2 <= lit(eps * eps))
      .select(col("id_a"), col("id_b"), d2.as("dist2"))
  }
}

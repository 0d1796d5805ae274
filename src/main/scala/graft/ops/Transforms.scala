package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions._

/** Engine-level derived-instance transforms with provenance: each output row
  * carries the derived text, its metadata, its own content id and the parent
  * instance id (`to_cnf`) — the Spark analog of the reference transformers'
  * link features (/root/reference/src/Main.cc:366-375: `local`, `hash`,
  * `to_cnf`). Derived text goes to one table, features to another, exactly
  * as the reference separates the streams (SURVEY.md §2.1 S4).
  */
object Transforms {

  /** Normalized derived instance (cnf2cnf Normaliser). */
  def normalized(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("to_cnf", gbd_hash(col(textCol)))
      .withColumn("derived_text", normalize_cnf_file(col(textCol)))
      .withColumn("hash", gbd_hash(col("derived_text")))

  /** Sanitized derived instance (cnf2cnf Sanitiser). */
  def sanitized(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("to_cnf", gbd_hash(col(textCol)))
      .withColumn("derived_text", sanitize_cnf(col(textCol)))
      .withColumn("hash", gbd_hash(col("derived_text")))

  /** k-independent-set reformulation (cnf2kis) + metadata. */
  def kis(df: DataFrame, textCol: String): DataFrame = {
    val k = kis_transform(col(textCol))
    df.withColumn("to_cnf", gbd_hash(col(textCol)))
      .withColumn("derived_text", k.getField("text"))
      .withColumn("kis_nodes", k.getField("nodes"))
      .withColumn("kis_edges", k.getField("edges"))
      .withColumn("kis_k", k.getField("k"))
      .withColumn("hash", md5(k.getField("text").cast("binary")))
  }

  /** Directed bipartite incidence graph (cnf2bip) + metadata. */
  def bipartite(df: DataFrame, textCol: String): DataFrame = {
    val b = bip_transform(col(textCol))
    df.withColumn("to_cnf", gbd_hash(col(textCol)))
      .withColumn("derived_text", b.getField("text"))
      .withColumn("bip_nodes", b.getField("nodes"))
      .withColumn("bip_edges", b.getField("edges"))
      .withColumn("hash", md5(b.getField("text").cast("binary")))
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** S4 split sink (Main.cc:296-380 analog): the derived corpus lands as
    * TWO tables — a CONTENT-ADDRESSED text table (hash → derived_text,
    * deduplicated on hash exactly as the reference writes one file per
    * instance id) and a feature table carrying provenance + metadata but
    * no payload. Separating the streams is what makes the metadata side
    * cheap to scan at corpus scale; the text side compresses (zstd) and
    * is only fetched by hash.
    *
    * The input is scanned once per sink (two actions). At 100-TB scale
    * recomputing a linear derive kernel beats caching multi-TB derived
    * text between the two writes; callers who disagree can persist()
    * before calling.
    */
  def writeSplit(derived: DataFrame, outDir: String,
                 textCompression: String = "zstd"): Unit = {
    derived
      .select(col("hash"), col("derived_text"))
      .dropDuplicates("hash")
      .write.mode("overwrite")
      .option("compression", textCompression)
      .parquet(s"$outDir/text")
    derived
      .drop("derived_text")
      .write.mode("overwrite")
      .parquet(s"$outDir/features")
  }

  /** Read both sides of a [[writeSplit]] layout: (text, features). */
  def readSplit(spark: SparkSession, outDir: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$outDir/text"), spark.read.parquet(s"$outDir/features"))

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

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sources & sinks mirroring the reference's serializer surface
  * (SURVEY §2.2, dd_core/dataflow/custom_serialize.py).
  */
object Serializers {

  /** `SerializerJsonlines.load` (custom_serialize.py:142): .jsonl →
    * rows with an explicit schema (never infer — at 100 TB schema
    * inference is a full extra pass).
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
      maxDatapoints: Option[Int] = None): DataFrame = {
    val df = spark.read.schema(schema).json(path)
    maxDatapoints.fold(df)(df.limit)
  }

  /** `SerializerJsonlines.save` (custom_serialize.py:157). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** `SerializerTabsepFiles` (custom_serialize.py:187): one row per
    * line, tab-separated columns.
    */
  def readTabsep(spark: SparkSession, path: String, columns: Seq[String],
      maxDatapoints: Option[Int] = None): DataFrame = {
    val lines = spark.read.text(path)
    val parts = split(col("value"), "\t")
    val df = lines.select(columns.zipWithIndex.map { case (c, i) => parts.getItem(i).as(c) }: _*)
    maxDatapoints.fold(df)(df.limit)
  }

  def writeTabsep(df: DataFrame, path: String): Unit =
    df.select(concat_ws("\t", df.columns.map(col): _*).as("value"))
      .write.mode("overwrite").text(path)

  /** `SerializerFiles.load` (custom_serialize.py:258): recursive
    * directory walk filtered by extension, optional deterministic sort
    * — the reference's two-walk + zip mini-DAG collapses to one
    * binaryFile scan with a glob.
    */
  def readFilesDir(spark: SparkSession, dir: String, extension: String,
      sort: Boolean = true, maxDatapoints: Option[Int] = None): DataFrame = {
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", s"*.$extension")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(col("path"), col("length"), col("content"))
    val sorted = if (sort) df.orderBy("path") else df
    maxDatapoints.fold(sorted)(sorted.limit)
  }

  /** `SerializerCoco.load` (custom_serialize.py:582): the reference
    * builds in-memory `img_to_anns` hash indexes (CocoParser:349-375)
    * to pre-join annotations onto images; distributed, that's a real
    * hash aggregation — groupBy(image_id) + sort_array(collect_list)
    * (deterministic order), then a broadcast-friendly equi-join.
    */
  def cocoPreJoin(images: DataFrame, annotations: DataFrame,
      imageIdCol: String = "image_id", annIdCol: String = "id"): DataFrame = {
    val structCols = col(annIdCol) +: annotations.columns
      .filter(c => c != imageIdCol && c != annIdCol).map(col).toSeq
    val anns = annotations
      .groupBy(col(imageIdCol))
      .agg(sort_array(collect_list(struct(structCols: _*))).as("anns"),
        count(lit(1)).as("n_anns"))
    images.join(anns, images("id") === anns(imageIdCol), "left")
      .drop(imageIdCol)
      .withColumn("n_anns", coalesce(col("n_anns"), lit(0L)))
  }

  /** Dataset registry (dd_datasets/base.py:46 `DatasetBase` +
    * `MergeDataset` :179): named input tables over an sf dir;
    * merge = unionByName.
    */
  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "documents" -> ((s, dir) => s.read.parquet(s"$dir/documents.parquet")),
    "embeddings" -> ((s, dir) => s.read.parquet(s"$dir/embeddings.parquet")),
    "events" -> ((s, dir) => s.read.parquet(s"$dir/events.parquet")),
    "turns" -> ((s, dir) => Turns.synth(s, dir).toDF())
  )

  def dataset(name: String)(spark: SparkSession, sfDir: String): DataFrame =
    registry(name)(spark, sfDir)

  def mergeDatasets(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_))
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.assemble.DatasetAssembly
import graft.expr.ImscCompiler
import graft.schema.ImscSchema

/** The full imsc ingestion pipeline (variable extraction → template
  * rendering → casts → dataset assembly → datablock) run as a relational
  * query over the documents table: each document row becomes a synthetic
  * "file" with a NeXus-tree payload, and the closed ScicatDataset output
  * is projected to scalar columns the DuckDB oracle can replicate —
  * end-to-end parity of §3.2's offline-ingestor program as ONE Spark plan.
  */
object IngestDemo {

  val schemaYaml: String =
    """order: 1
      |id: ingest-demo
      |name: Ingest Demo Schema
      |instrument: graft
      |selector: 'filename:starts_with:/data/'
      |variables:
      |  doc_key:
      |    source: NXS
      |    path: /entry/doc_id
      |    value_type: string
      |  title:
      |    source: NXS
      |    path: /entry/title
      |    value_type: string
      |  temperature:
      |    source: NXS
      |    path: /entry/temperature
      |    value_type: float
      |  null_source:
      |    source: VALUE
      |    value: ''
      |    value_type: none
      |schema:
      |  run_number:
      |    field_type: high_level
      |    machine_name: runNumber
      |    value: <doc_key>
      |    type: string
      |  dataset_name:
      |    field_type: high_level
      |    machine_name: datasetName
      |    value: ds_<title>
      |    type: string
      |  principal_investigator:
      |    field_type: high_level
      |    machine_name: principalInvestigator
      |    value: ''
      |    type: string
      |  creation_location:
      |    field_type: high_level
      |    machine_name: creationLocation
      |    value: 'ESS:graft'
      |    type: string
      |  owner:
      |    field_type: high_level
      |    machine_name: owner
      |    value: ''
      |    type: string
      |  owner_email:
      |    field_type: high_level
      |    machine_name: ownerEmail
      |    value: ''
      |    type: string
      |  source_folder_item:
      |    field_type: high_level
      |    machine_name: sourceFolder
      |    value: <null_source>
      |    type: string
      |  contact_email:
      |    field_type: high_level
      |    machine_name: contactEmail
      |    value: ''
      |    type: string
      |  creation_time:
      |    field_type: high_level
      |    machine_name: creationTime
      |    value: '2024-01-01T00:00:00Z'
      |    type: date
      |  sample_temperature:
      |    field_type: scientific_metadata
      |    machine_name: sample_temperature
      |    human_name: Sample Temperature
      |    value: <temperature>
      |    type: string
      |""".stripMargin

  lazy val schema: ImscSchema = ImscSchema.fromYamlOrJson(schemaYaml)

  /** documents → synthetic file rows → full pipeline → scalar projection. */
  def pipelineQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val nullStr = lit(null).cast("string")
    val docs = Tables.documents(spark, sfDir)
      .withColumn("data_file_path",
        concat(lit("/data/"), col("lang"), lit("/"), col("source"), lit("/run.nxs")))
      .withColumn("nexus_json", to_json(struct(
        struct(
          struct(array(col("doc_id").cast("string")).as("__value")).as("doc_id"),
          struct(array(substring(col("text"), 1, 30)).as("__value")).as("title"),
          struct(array(col("n_chars").cast("double")).as("__value"),
            struct(lit("K").as("units")).as("__attrs")).as("temperature")
        ).as("entry"))))
      .withColumn("files", array(
        struct(col("data_file_path").as("path"), col("n_chars").as("size"),
          lit("2024-01-01T00:00:00Z").as("time"), nullStr.as("chk"),
          nullStr.as("uid"), nullStr.as("gid"), nullStr.as("perm")),
        struct(concat(lit("/data/"), col("lang"), lit("/"), col("source"), lit("/aux.json")).as("path"),
          lit(24L).as("size"), lit("2024-01-01T00:00:05Z").as("time"),
          nullStr.as("chk"), nullStr.as("uid"), nullStr.as("gid"), nullStr.as("perm"))))

    val out = DatasetAssembly.pipeline(schema, ImscCompiler.Context())(docs)
    out.select(
      col("runNumber").as("run_number"),
      col("datasetName").as("dataset_name"),
      col("size"),
      col("numberOfFiles").as("n_files"),
      col("sourceFolder").as("source_folder"),
      col("creationTime").as("creation_time"),
      element_at(col("scientificMetadata"), "sample_temperature")
        .getField("value").as("temp_value"),
      element_at(col("scientificMetadata"), "sample_temperature")
        .getField("unit").as("temp_unit"))
  }

  /** DuckDB oracle replicating every pipeline step. */
  val oracle: String =
    """SELECT cast(doc_id as varchar) AS run_number,
      |  'ds_' || substr(text, 1, 30) AS dataset_name,
      |  n_chars + 24 AS size,
      |  cast(2 as bigint) AS n_files,
      |  '/data/' || lang || '/' || source AS source_folder,
      |  '2024-01-01T00:00:00+00:00' AS creation_time,
      |  cast(cast(n_chars as double) as varchar) AS temp_value,
      |  'K' AS temp_unit
      |FROM documents""".stripMargin
}

package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

/** Control-message model + wire codec.
  *
  * The reference consumes FlatBuffer-encoded messages whose schema id
  * sits at payload bytes [4:8] — `"wrdn"` = writing finished, `"pl72"` =
  * run start (ref: src/scicat_kafka.py:89-96,198-205). The FlatBuffers
  * toolchain isn't available in this environment, so the engine uses the
  * same framing (4 reserved bytes + 4-byte schema id) with a JSON body;
  * the byte-slice type filter — the part with streaming semantics — is
  * identical, and a FlatBuffers body codec would slot into
  * [[MessageCodec.decodeJson]] unchanged.
  */
object Messages {

  /** ref: WritingFinished fields used at src/scicat_kafka.py:104,128-131;
    * full constructor tests/_scicat_ingestor.py:87-93. */
  final case class WritingFinished(
      service_id: String,
      job_id: String,
      error_encountered: Boolean,
      file_name: String,
      metadata: String,
      message: String)

  /** ref: pl72 fields used at src/scicat_sample_ingestor.py:186-188,211. */
  final case class RunStartInfo(
      job_id: String,
      filename: String,
      instrument_name: String)

  val WrdnId = "wrdn"
  val Pl72Id = "pl72"
}

object MessageCodec {
  import Messages._
  import graft.sources.NexusExtractor.jsonStr

  /** 4 reserved bytes + 4-byte schema id + JSON body. */
  def frame(schemaId: String, body: String): Array[Byte] = {
    require(schemaId.length == 4)
    Array[Byte](0, 0, 0, 0) ++ schemaId.getBytes(UTF_8) ++ body.getBytes(UTF_8)
  }

  def schemaId(payload: Array[Byte]): Option[String] =
    if (payload == null || payload.length < 8) None
    else Some(new String(payload, 4, 4, UTF_8))

  def encodeWrdn(m: WritingFinished): Array[Byte] = frame(WrdnId,
    s"""{"service_id":${jsonStr(m.service_id)},"job_id":${jsonStr(m.job_id)},""" +
      s""""error_encountered":${m.error_encountered},"file_name":${jsonStr(m.file_name)},""" +
      s""""metadata":${jsonStr(m.metadata)},"message":${jsonStr(m.message)}}""")

  def encodePl72(m: RunStartInfo): Array[Byte] = frame(Pl72Id,
    s"""{"job_id":${jsonStr(m.job_id)},"filename":${jsonStr(m.filename)},""" +
      s""""instrument_name":${jsonStr(m.instrument_name)}}""")

  def body(payload: Array[Byte]): String =
    if (payload == null || payload.length <= 8) "{}"
    else new String(payload, 8, payload.length - 8, UTF_8)
}

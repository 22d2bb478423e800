package graft.sources.pgn

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Read side of `format("pgn")` — parses the blocks the write side (and
  * the reference's `write_to_pgn`, `/root/reference/etl/transform.py:
  * 36-54`) emits back into rows, making PGN a full round-trip source.
  *
  * Splitting: one InputPartition per .pgn file (PGN files are many and
  * small by construction — one per writing task; a single giant PGN
  * would need in-file block splitting, which the format's `[Game N]`
  * markers support but nothing here produces). Column pruning is pushed
  * into the scan: projected schemas materialize only the requested
  * fields. `"?"` round-trips to NULL (the PGN unknown-value convention
  * the writer encodes — lossy only for a literal "?" player name).
  */
object PgnParse {

  private val TagRe = """\[([A-Za-z ]+) "(.*)"\]""".r

  /** Parse one file's text into field maps (tag name → value). */
  def parseBlocks(text: String): Seq[Map[String, String]] =
    text.split("(?m)(?=^\\[Game \\d+\\]$)").toIndexedSeq
      .filter(_.trim.nonEmpty)
      .map { block =>
        val lines = block.linesIterator.toVector
        val tags = lines.collect { case TagRe(k, v) => k -> v }.toMap
        val blank = lines.indexWhere(_.trim.isEmpty)
        val moves =
          if (blank >= 0) lines.drop(blank + 1).mkString("\n").trim else ""
        tags + ("Moves" -> moves)
      }

  /** Writer tag name for each schema column. */
  val tagOf: Map[String, String] = Map(
    "game_id" -> "Game ID", "white_name" -> "White",
    "black_name" -> "Black", "opening_eco" -> "Opening Eco",
    "opening_name" -> "Opening Name", "winner" -> "Game Winner",
    "moves" -> "Moves")
}

private[pgn] class PgnScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var required: StructType = PgnDataSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new Scan {
    override def readSchema(): StructType = required
    override def toBatch: Batch = new PgnBatch(path, required)
    override def description(): String =
      s"PgnScan(path=$path, columns=${required.fieldNames.mkString(",")})"
  }
}

private[pgn] case class PgnInputPartition(file: String) extends InputPartition

private[pgn] class PgnBatch(dir: String, required: StructType) extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.isDirectory(p)) {
      val files = java.nio.file.Files.list(p)
      try files.iterator().asScala
        .filter(_.toString.endsWith(".pgn"))
        .map(f => PgnInputPartition(f.toString): InputPartition)
        .toArray.sortBy(_.asInstanceOf[PgnInputPartition].file)
      finally files.close()
    } else Array(PgnInputPartition(dir): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PgnReaderFactory(required)
}

private[pgn] class PgnReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PgnReader(partition.asInstanceOf[PgnInputPartition].file, required)
}

private[pgn] class PgnReader(file: String, required: StructType)
    extends PartitionReader[InternalRow] {
  private val fields = required.fieldNames
  private val blocks = PgnParse.parseBlocks(
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file)),
      java.nio.charset.StandardCharsets.UTF_8)).iterator
  private var current: InternalRow = _

  override def next(): Boolean =
    if (!blocks.hasNext) false
    else {
      val tags = blocks.next()
      val row = new GenericInternalRow(fields.length)
      var i = 0
      while (i < fields.length) {
        val v = tags.getOrElse(PgnParse.tagOf(fields(i)), "?")
        row.update(i, if (v == "?" || v == "None") null else UTF8String.fromString(v))
        i += 1
      }
      current = row
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

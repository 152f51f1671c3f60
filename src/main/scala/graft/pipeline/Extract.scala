package graft.pipeline

import scala.util.{Try, Success, Failure}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.kernels.{Segment, Match, Nms, Order}

/** Pipeline configuration — mirrors the reference's
  * `conf_dd_one.yaml:145-186` knobs (tolerances, matching rule) plus
  * the DOM-heuristic thresholds of the segmenter.
  */
final case class ExtractConfig(
    startingPointTolerance: Double = 0.005,
    brokenLineTolerance: Double = 0.003,
    heightTolerance: Double = 2.0,
    paragraphBreak: Double = 0.035,
    matchRule: String = "ioa",
    matchThreshold: Double = 0.3,
    maxParentOnly: Boolean = true,
    nmsThreshold: Double = 0.9,
    maxLinkDensity: Double = 0.4,
    /** turns per salt bucket for skewed long conversations (north rule) */
    saltChunkSize: Int = 256
)

/** The extraction pipeline: `Dataset[Turn] → Dataset[ExtractedTurn]`.
  *
  * Reference lifecycle analogue (SURVEY §3.1): every pipeline component
  * is a pure function `Turn → Turn`-ish, chained inside ONE
  * `mapPartitions` stage — segmentation → NMS → word↔block matching →
  * reading order → main-content classification → projection. All state
  * is row-local, so there is no shuffle between components; the only
  * exchange in the whole job is the explicit salted repartition before
  * the kernel (and whatever the sink needs).
  */
object Extract {

  /** Pure per-turn kernel. Never throws: parse failures quarantine into
    * a row with `metrics.parseFailed = true` (reference:
    * `MappingContextManager`, dd_core/mapper/maputils.py:41).
    */
  def extractTurn(t: Turn, cfg: ExtractConfig = ExtractConfig()): ExtractedTurn = {
    val turnId = Ids.turnId(t.conv_id, t.turn_idx)
    Try(extractTurnUnsafe(t, turnId, cfg)) match {
      case Success(et) => et
      case Failure(_) =>
        ExtractedTurn(t.conv_id, t.turn_idx, turnId, t.role, t.ts, "", "und",
          Array.empty, Array.empty, Array.empty, Array.empty,
          TurnMetrics(0, 0, 0, 0, parseFailed = true))
    }
  }

  private def extractTurnUnsafe(t: Turn, turnId: String, cfg: ExtractConfig): ExtractedTurn = {
    val payload = if (t.text != null && t.text.nonEmpty) t.text
                  else if (t.tool != null) t.tool else ""
    val seg = Segment.segment(payload)

    // ---- NMS over block candidates (AnnotationNmsService analogue,
    // pipe/common.py:458; no-op for non-overlapping renders) ----
    val segBlocks = seg.blocks
    val candidates = segBlocks.zipWithIndex.map { case (b, i) =>
      Nms.Candidate(i.toString, b.box, 1.0, b.kind)
    }
    val surviving = Nms.suppress(candidates.toIndexedSeq, cfg.nmsThreshold).map(_.toInt).toSet
    val blocks0 = segBlocks.zipWithIndex.filter { case (_, i) => surviving.contains(i) }.map(_._1)

    // block ids (deterministic, content-derived)
    val blockIds = blocks0.map(b => Ids.annId(turnId, b.kind, b.begin, b.end))

    // ---- words + word↔block assignment via the IoA matching kernel
    // (MatchingService analogue, pipe/common.py:271) ----
    val allWords = blocks0.flatMap(_.words)
    val wordIds = allWords.map(w => Ids.annId(turnId, LayoutLabel.WORD, w.begin, w.end))
    val parentBoxes = blocks0.map(_.box).toIndexedSeq
    val childBoxes = allWords.map(_.box).toIndexedSeq
    val assignment: Map[Int, Int] = Match.matchByIntersection(
      parentBoxes, childBoxes, cfg.matchRule, cfg.matchThreshold,
      maxParentOnly = cfg.maxParentOnly
    ).map { case (c, p) => c -> p }.toMap

    // ---- per-block word ordering (TextOrderService level (a):
    // group_words_into_lines, pipe/order.py:71) ----
    val wordsByBlock: Map[Int, Array[Int]] =
      allWords.indices.toArray.groupBy(wi => assignment.getOrElse(wi, -1))

    val orderedWords = Array.fill[Word](allWords.length)(null)
    val blockTexts = Array.fill(blocks0.length)("")
    for ((bi, wis) <- wordsByBlock if bi >= 0) {
      val triples = Order.groupWordsIntoLines(
        wis.map(wi => (wi.toString, allWords(wi).box)).toIndexedSeq)
      val sb = new StringBuilder
      for ((pos, line, key) <- triples) {
        val wi = key.toInt
        val w = allWords(wi)
        orderedWords(wi) = Word(wordIds(wi), w.text, w.begin, w.end, w.box,
          blockIds(bi), pos, line, LayoutLabel.TOKEN_OTHER)
        if (sb.nonEmpty) sb.append(' ')
        sb.append(w.text)
      }
      blockTexts(bi) = sb.toString
    }
    // unassigned words (no parent above threshold) stay residual
    for (wi <- allWords.indices if orderedWords(wi) == null) {
      val w = allWords(wi)
      orderedWords(wi) = Word(wordIds(wi), w.text, w.begin, w.end, w.box, "", -1, -1,
        LayoutLabel.TOKEN_OTHER)
    }

    // ---- synthetic text lines (TextLineService analogue,
    // pipe/order.py:581): per block, rows split at paragraph breaks ----
    val lines: Array[LineOut] = wordsByBlock.toArray.sortBy(_._1).flatMap { case (bi, wis) =>
      if (bi < 0) Array.empty[LineOut]
      else {
        graft.kernels.Lines.createLines(
          wis.map(wi => (wi.toString, allWords(wi).box)).toIndexedSeq,
          seg.pageWidth, seg.pageHeight, makeSubLines = true, cfg.paragraphBreak)
          .map { lr =>
            val ws = lr.childIds.map(_.toInt)
            val b = ws.map(allWords(_).begin).min
            val e = ws.map(allWords(_).end).max
            LineOut(Ids.annId(turnId, LayoutLabel.LINE, b, e), blockIds(bi), b, e, ws.length)
          }.toArray
      }
    }

    // ---- main-content classification + block-level reading order
    // (TextOrderService level (b): order_blocks, pipe/order.py:201) ----
    val keptIdx = blocks0.indices.filter(i => Segment.isMainContent(blocks0(i), cfg.maxLinkDensity))
    val orderPairs = Order.orderBlocks(
      keptIdx.map(i => (i.toString, blocks0(i).box)),
      seg.pageWidth, seg.pageHeight,
      cfg.startingPointTolerance, cfg.brokenLineTolerance, cfg.heightTolerance
    )
    val readingOrder: Map[Int, Int] = orderPairs.map { case (ord, key) => key.toInt -> ord }.toMap

    val blocks = blocks0.indices.map { i =>
      val b = blocks0(i)
      Block(blockIds(i), b.kind, b.begin, b.end, b.box, 1.0,
        readingOrder.getOrElse(i, -1), kept = readingOrder.contains(i),
        b.textDensity, b.linkDensity, b.tagDepth, blockTexts(i))
    }.toArray

    // ---- table reconstruction (TableSegmentationService analogue,
    // pipe/segment.py:840) — only when markup contains a table ----
    val tables: Array[TableData] =
      if (payload.contains("<table")) {
        graft.kernels.Table.parseTables(payload).map { tr =>
          TableData(Ids.annId(turnId, LayoutLabel.TABLE, tr.begin, tr.end),
            tr.begin, tr.end, tr.nRows, tr.nCols, tr.html,
            tr.cells.map(c => TableCellOut(c.row, c.col, c.rowSpan, c.colSpan,
              c.text, c.begin, c.end)))
        }.toArray
      } else Array.empty[TableData]

    // ---- projection (`Page.text` analogue, view.py:1318-1336):
    // kept blocks by reading order, '\n'-joined ----
    val extractedText = blocks.filter(_.kept).sortBy(_.readingOrder).map(_.text).mkString("\n")

    val kept = blocks.count(_.kept)
    ExtractedTurn(t.conv_id, t.turn_idx, turnId, t.role, t.ts, extractedText,
      graft.operators.TextStats.langIdScala(extractedText),
      blocks, orderedWords, lines, tables,
      TurnMetrics(kept, blocks.length - kept, orderedWords.length,
        orderedWords.count(_.readingOrder > 0), parseFailed = false))
  }

  /** Distributed runner: explicit salted repartition on
    * `hash(conv_id, turn_idx / saltChunkSize)` so a single monster
    * conversation spreads over many partitions (north rule: skew), then
    * one fused mapPartitions kernel. Only one exchange in the job.
    */
  def run(ds: Dataset[Turn], cfg: ExtractConfig = ExtractConfig(),
          numPartitions: Option[Int] = None): Dataset[ExtractedTurn] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val parts = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    ds.repartition(parts, hash(col("conv_id"), floor(col("turn_idx") / cfg.saltChunkSize)))
      .mapPartitions(_.map(t => extractTurn(t, cfg)))
  }

  /** Chunk-level exploded output (the reference's `Page.chunks`,
    * view.py:1409-1441): one row per kept block in reading order.
    */
  def chunks(ds: Dataset[ExtractedTurn]): Dataset[Chunk] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { et =>
      et.blocks.filter(_.kept).sortBy(_.readingOrder).map { b =>
        Chunk(et.conv_id, et.turn_id, et.turn_idx, b.id, b.readingOrder, b.kind,
          b.text, b.begin, b.end)
      }
    }
  }
}

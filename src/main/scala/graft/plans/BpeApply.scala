package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM-local registry of MERGE-RANK vocabularies for [[BpeApplyMerges]]
  * — ordered `(a, b)` pairs as learned by
  * [[graft.operators.BpeTrain.learnMerges]] (the [[BpeVocabs]] registry
  * stores flat piece lists for greedy longest-match; merge-ORDER
  * inference needs the pairs and their priorities). Same shipping
  * contract as [[BpeVocabs]]: the expression serializes only the id. */
object BpeMergeRanks {
  private val suppliers =
    new java.util.concurrent.ConcurrentHashMap[String, () => Seq[(String, String)]]()
  private val resolved =
    new java.util.concurrent.ConcurrentHashMap[String, Map[(String, String), Int]]()

  /** In-memory registration — reaches only THIS JVM. Correct under
    * `local[*]` (driver = executors, the q127 path); on a cluster use
    * [[registerFile]], whose lazy file read resolves on whichever JVM
    * evaluates first (ship the file with `spark-submit --files`, the
    * BpeVocabs contract). */
  def register(id: String, merges: Seq[(String, String)]): Unit = {
    suppliers.put(id, () => merges)
    resolved.remove(id) // re-registration must not serve stale ranks
    ()
  }

  /** File-backed registration: one merge per line, `a b` (two symbols
    * separated by a single space — symbols never contain spaces), `#`
    * comments and blanks skipped, rank = line order. The executor-safe
    * sibling of [[register]]; [[writeFile]] round-trips it. */
  def registerFile(id: String, path: java.nio.file.Path): Unit = {
    suppliers.put(id, () => {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(path).asScala.toSeq
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l =>
          val sp = l.indexOf(' ')
          require(sp > 0 && sp < l.length - 1, s"bad merge line '$l' in $path")
          (l.substring(0, sp), l.substring(sp + 1))
        }
    })
    resolved.remove(id)
    ()
  }

  /** Write merges in [[registerFile]]'s format. */
  def writeFile(path: java.nio.file.Path, merges: Seq[(String, String)]): Unit = {
    java.nio.file.Files.writeString(path,
      merges.map { case (a, b) => s"$a $b" }.mkString("", "\n", "\n"))
    ()
  }

  def ranks(id: String): Map[(String, String), Int] = {
    val m = resolved.get(id)
    if (m != null) m
    else resolved.computeIfAbsent(id, _ => {
      val s = suppliers.get(id)
      require(s != null, s"no merge-rank vocab registered under '$id' " +
        s"(known: ${suppliers.keySet()})")
      // First occurrence wins on a duplicated pair (zipWithIndex.toMap
      // would keep the LAST = highest rank): reference tokenizers honor
      // the first listing, and a silent rank shift changes segmentation.
      s().zipWithIndex.foldLeft(Map.empty[(String, String), Int]) {
        case (m, (pair, rank)) => if (m.contains(pair)) m else m.updated(pair, rank)
      }
    })
  }
}

/** `bpe_apply_merges(text, vocabId)` — EXACT BPE inference: segment each
  * lowercased whitespace word by applying the learned merges in RANK
  * order (always merge the present adjacent pair with the lowest rank;
  * each application is the same greedy left-to-right ⌊run/2⌋ pass as
  * training). This is the production BPE tokenizer algorithm — and it is
  * provably equivalent to replaying the merges one-by-one in learning
  * order, because a pair's component symbols only exist once all their
  * own (strictly earlier) merges have fired, so no later merge can
  * create an occurrence of an earlier pair (the property
  * BpeApplySpec pins empirically against the sequential fold, on
  * training AND unseen words).
  *
  * Contrast with [[BpeTokenizeVocab]]'s greedy longest-MATCH over a
  * piece list (WordPiece-style application): on a BPE-trained vocab the
  * two can legitimately segment differently — longest-match maximizes
  * each step's piece length, merge-order replays the training
  * statistics. Both surfaces exist because both conventions ship in
  * production tokenizers; this one reproduces training segmentations
  * exactly ([[graft.PipelineQueries.q127]] pins that against the
  * trainer oracle's final segmentation table).
  *
  * Word semantics mirror `bpe_tokenize`: lowercase, split on single
  * spaces, empty words skipped, output pieces in document order.
  * CodegenFallback for the same reason as the hash expressions: the
  * per-word merge loop dominates, a codegen split costs nothing
  * measurable. */
final case class BpeApplyMerges(child: Expression, vocabId: String)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "bpe_apply_merges"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${child.dataType.catalogString}")

  @transient private lazy val ranks = BpeMergeRanks.ranks(vocabId)

  private def segment(word: String): Seq[String] = {
    var syms: Array[String] = word.map(_.toString).toArray
    var done = syms.length < 2
    while (!done) {
      // lowest-rank adjacent pair present in the current segmentation
      var best = Int.MaxValue
      var a = ""
      var b = ""
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; a = syms(i); b = syms(i + 1) }
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // apply that one merge greedy left-to-right (training's pass)
        val out = Array.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
            out += a + b; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
        done = syms.length < 2
      }
    }
    syms.toSeq
  }

  override def nullSafeEval(input: Any): Any = {
    // UTF8String.toLowerCase == Spark's lower(): locale-independent, so
    // inference segmentation matches training (which lowercases via
    // lower()) even under e.g. a Turkish default JVM locale.
    val text = input.asInstanceOf[UTF8String].toLowerCase.toString
    val pieces = Seq.newBuilder[Any]
    text.split(" ", -1).foreach { w =>
      if (w.nonEmpty) segment(w).foreach(p => pieces += UTF8String.fromString(p))
    }
    new GenericArrayData(pieces.result().toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

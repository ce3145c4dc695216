package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed BPE vocabulary TRAINING — the learning half of the
  * subword stack ([[graft.plans.BpeTokenize]] applies a vocab; this
  * derives one from the corpus, closing the production loop: learn →
  * write merges file → [[graft.plans.BpeVocabs.registerMerges]] →
  * `bpe_tokenize_vocab`, round-tripped in BpeTrainSpec).
  *
  * Classic BPE (Sennrich et al. 2016) restated Spark-first:
  *
  *  1. Train on the WORD-FREQUENCY table, not the token stream — the
  *     corpus-sized `groupBy(word)` happens ONCE; every merge iteration
  *     then works on distinct words (≈10⁵–10⁸ rows at 100 TB, orders of
  *     magnitude below the corpus) weighted by their counts.
  *  2. Each iteration is ONE pair-count aggregation (`word_ngrams(syms,
  *     2)` explode → sum(cnt), a vocabulary-sized shuffle) + ONE bounded
  *     `limit(1).collect()` (the argmax pair — a single row, the same
  *     driver discipline as IVF centroid training) + a map-only merge
  *     application. The word table is re-persisted and the previous
  *     iteration unpersisted each round (the PageRank/CC lineage rule),
  *     so per-iteration cost stays flat in the merge index.
  *  3. Merge application is the greedy LEFT-TO-RIGHT single pass of the
  *     reference implementation, expressed as an in-row `aggregate` fold
  *     (no shuffle): scanning symbols, `[…, a] + b → […, ab]` unless the
  *     trailing `a` was itself just produced by this merge — which gives
  *     runs of an identical symbol the standard ⌊run/2⌋ pairing
  *     (`aaaa → aa aa`, `aaa → aa a`). The argmax tie-break is (count
  *     DESC, then the space-joined pair ASC) — total, so the merge
  *     sequence is deterministic and engine-reproducible (q126 re-derives
  *     it in DuckDB with the island-parity formulation of the same
  *     left-to-right pass).
  *
  * At a production 32k merges the driver loop issues 32k small jobs;
  * the known optimization (incremental pair-count deltas instead of
  * recount) trades exactness of this shape for bookkeeping and is
  * documented, not implemented — the recount form is the one whose
  * per-iteration cost is a pure function of the distinct-word table.
  */
object BpeTrain {

  /** One learned merge: `piece = a + b`, `pairCount` the weighted
    * adjacency count that won the iteration. */
  final case class Merge(rank: Int, a: String, b: String, pairCount: Long) {
    def piece: String = a + b
  }

  /** Lowercased whitespace word-frequency table: `(w, cnt)`. */
  def wordTable(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(graft.functions.TextOps.tokens(text)).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Greedy left-to-right application of one merge to a symbol array —
    * in-row fold, no shuffle. Exposed for spec-level equivalence checks. */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      // `last == a` can never be confused with this merge's own output:
      // the output is a+b and b is non-empty, so a freshly-merged symbol
      // never re-matches as the pair's left side (runs of an identical
      // symbol therefore pair up floor(run/2) times, the reference
      // behavior)
      when(size(acc) > 0 && element_at(acc, -1) === a && x === b,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
      .otherwise(concat(acc, array(x))))

  /** Learn `numMerges` merges from the corpus. Returns them in rank
    * order; stops early if no adjacent pair remains.
    *
    * `truncateEvery`: the per-iteration persist serves the DATA, but the
    * logical plan still nests one fold layer per merge — at a production
    * 32k merges the ANALYZER cost of iteration k is O(k) and the total
    * O(k²) (the exact failure mode Graph/connectedComponents hit).
    * Every `truncateEvery` iterations the word table is lazily
    * `localCheckpoint`ed, cutting the plan back to a leaf — the
    * Graph.checkpointEvery discipline, on by default here because
    * training is inherently many-round. */
  def learnMerges(docs: DataFrame, text: Column, numMerges: Int,
      truncateEvery: Int = 16,
      onIteration: (Int, Double) => Unit = (_, _) => ()): Seq[Merge] = {
    require(numMerges >= 1, s"need numMerges >= 1, got $numMerges")
    require(truncateEvery >= 1, s"need truncateEvery >= 1, got $truncateEvery")
    val spark = docs.sparkSession
    var words = wordTable(docs, text)
      .select(col("w"), col("cnt"),
        // seed segmentation: one symbol per character
        expr("regexp_extract_all(w, '(.)', 1)").as("syms"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val out = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val iterT0 = System.nanoTime()
      val top = words
        .select(explode(graft.plans.GraftFunctions.wordNGrams(col("syms"), 2)).as("pair"),
          col("cnt"))
        .groupBy("pair").agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("pair"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        // symbols never contain spaces (they concatenate word chars), so
        // the 2-gram splits back unambiguously
        val Array(a, b) = top(0).getString(0).split(" ", 2)
        out += Merge(rank, a, b, top(0).getLong(1))
        val prev = words
        val next = prev.select(col("w"), col("cnt"),
            applyMerge(col("syms"), a, b).as("syms"))
        // checkpoint iterations skip the Dataset-level persist:
        // localCheckpoint already caches at the RDD level, and stacking
        // the CacheManager on top just materializes the same rows twice
        words =
          if (rank % truncateEvery == 0) next.localCheckpoint(false)
          else next.persist(StorageLevel.MEMORY_AND_DISK)
        words.count() // materialize before dropping the parent
        prev.unpersist(blocking = false)
        onIteration(rank, (System.nanoTime() - iterT0) / 1e9)
        rank += 1
      }
    }
    words.unpersist(blocking = false)
    out.result()
  }

  /** The learned pieces in merge order — the exact content of a merges
    * file ([[graft.plans.BpeVocabLarge.loadMerges]] format: one piece
    * per line). */
  def pieces(merges: Seq[Merge]): Seq[String] = merges.map(_.piece)
}

package graft.ingest

import org.scalacheck.{Gen, Prop, Properties}

/** Property test for [[IngestJob.readPgnSplittable]]'s two-pass
  * protocol, run entirely driver-side (no Spark): random files built
  * from game blocks, banners, header-only blocks, and blank lines are
  * chunked at every "\n[Event " boundary exactly as the Hadoop record
  * reader would, the chunks are partitioned into random consecutive
  * "splits", and the pass-1 walk + [[IngestJob.planSplits]] + pass-2
  * emission must reproduce [[PgnParser.splitGames]] over the whole file
  * byte-for-byte, in order, for EVERY possible split arrangement the
  * generator produces — including all-moveless splits, empty splits,
  * moveless file tails, and carries that chain across several splits.
  */
object SplitProtocolPropertySpec extends Properties("split-protocol") {

  private val game: Gen[String] = for {
    ev <- Gen.alphaNumStr.map(_.take(8))
    moves <- Gen.oneOf("1. e4 e5 2. Nf3 *", "1. d4 d5 1/2-1/2",
      "1. c4 { note } c5 0-1",
      // a brace comment carrying a line-start "[Event" AFTER move text:
      // both the wholetext splitter and the delimiter chunker tear the
      // game at that line -- what matters is they tear IDENTICALLY
      "1. e4 { spans\n[Event \"fake\" } e5 *")
  } yield s"""[Event "g$ev"]\n[White "A"]\n[Black "B"]\n\n$moves"""

  private val banner: Gen[String] =
    Gen.oneOf("% banner", "; comment line", "[Site \"header only\"]",
      "% two\n% lines",
      // starts with "[Event" but is NOT a "\n[Event " delimiter match:
      // the wholetext splitter starts a new (moveless, merge-forward)
      // block on it while the Hadoop chunker leaves it INSIDE the
      // preceding movesful chunk — the exact shape that broke walkChunks
      // before splitRawsWithTail (phantom closed slot, shifted game_ids)
      "[EventDate \"2024.01.01\"]",
      "[EventSponsor \"acme\"]\n[Site \"trailing tags\"]")

  // a file = nonempty mix of games and moveless blocks, blank-separated
  private val file: Gen[String] = for {
    blocks <- Gen.nonEmptyListOf(Gen.frequency(4 -> game, 2 -> banner))
    sep <- Gen.oneOf("\n\n", "\n\n\n")
  } yield blocks.mkString(sep)

  /** Chunk at every "\n[Event " like the delimiter-based record reader:
    * chunk 0 is the file head; later chunks get the prefix back.
    */
  private def chunksOf(text: String): Vector[String] = {
    val parts = text.split("\n\\[Event ", -1).toVector
    parts.head +: parts.tail.map("[Event " + _)
  }

  private def partitions(n: Int): Gen[List[Int]] =
    if (n == 0) Gen.const(Nil)
    else for {
      k <- Gen.choose(1, n)
      rest <- partitions(n - k)
    } yield k :: rest

  property("splitRawsWithTail == splitRaws with the trailing moveless " +
    "block held back untrimmed") =
    Prop.forAll(file) { text =>
      val whole = PgnParser.splitRaws(text)
      val (closed, tail) = PgnParser.splitRawsWithTail(text)
      val rejoined =
        if (tail.trim.nonEmpty) closed :+ tail.trim else closed
      Prop(rejoined == whole &&
        closed.forall(PgnParser.hasMoveText) &&
        (tail.isEmpty || text.endsWith(tail))) :|
        s"closed=$closed tail=${tail.take(80)}"
    }

  property("two-pass protocol == splitGames for every split arrangement") =
    Prop.forAll(file) { text =>
      val expected = PgnParser.splitGames(text).map(s => (s.index, s.raw))
      val chunks = chunksOf(text)
      Prop.forAll(partitions(chunks.length)) { sizes =>
        // consecutive splits; start key = running chunk index (stands in
        // for the byte offset: any strictly increasing key works)
        val splits = sizes.scanLeft(0)(_ + _).zip(sizes).map {
          case (at, k) => (at.toLong, chunks.slice(at, at + k))
        }
        val reports = splits.map { case (start, cs) =>
          val (slots, trailing) =
            IngestJob.walkChunks(cs.iterator, carryIn = "")
          ("f", start, slots.size, trailing)
        }
        val plan = IngestJob.planSplits(reports)
        val emitted = splits.flatMap { case (start, cs) =>
          val (carryIn, base, tailText) =
            plan.getOrElse(("f", start), ("", 0, ""))
          val (slots, _) = IngestJob.walkChunks(cs.iterator, carryIn)
          val tail =
            if (tailText.nonEmpty) PgnParser.splitGames(tailText).map(_.raw)
            else Vector.empty
          (slots ++ tail).zipWithIndex.map { case (raw, i) =>
            (base + i + 1, raw)
          }
        }.sortBy(_._1)
        Prop(emitted == expected) :| s"sizes=$sizes\nemitted=$emitted\nexpected=$expected"
      }
    }
}

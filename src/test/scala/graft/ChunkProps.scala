package graft

import graft.operators.Curation
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties over the chunk-layout kernel (SURVEY §5.3 style):
  * random document lengths and window configs, not hand-picked cases. */
object ChunkProps extends Properties("chunking") {
  import Prop.forAll

  private val configs: Gen[(Long, Int, Int)] = for {
    n <- Gen.choose(1L, 5000L)
    size <- Gen.choose(2, 512)
    overlap <- Gen.choose(0, size - 1)
  } yield (n, size, overlap)

  property("every token index is covered by at least one chunk") =
    forAll(configs) { case (n, size, overlap) =>
      val covered = Curation.chunkBounds(n, size, overlap)
        .flatMap { case (_, start, len) => start until (start + len) }.toSet
      covered == (0L until n).toSet
    }

  property("chunk ids are dense 0..k-1 with strictly increasing starts") =
    forAll(configs) { case (n, size, overlap) =>
      val b = Curation.chunkBounds(n, size, overlap)
      b.map(_._1) == (0L until b.size) &&
        b.map(_._2).sliding(2).forall { case Seq(a, c) => a < c; case _ => true }
    }

  property("consecutive FULL chunks overlap by exactly `overlap` tokens") =
    forAll(configs) { case (n, size, overlap) =>
      Curation.chunkBounds(n, size, overlap).sliding(2).forall {
        case Seq((_, s1, l1), (_, s2, l2)) if l1 == size && l2 == size =>
          (s1 + l1) - s2 == overlap
        case _ => true
      }
    }

  property("no chunk exceeds chunkSize and the last chunk ends at n") =
    forAll(configs) { case (n, size, overlap) =>
      val b = Curation.chunkBounds(n, size, overlap)
      b.forall { case (_, _, len) => len >= 1 && len <= size } &&
        (b.last._2 + b.last._3) == n
    }
}

package graft

import graft.operators.{Dedup, SnippetGen}
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties (SURVEY §5.3) over the pure kernels — random
  * inputs, not hand-picked cases. */
object SnippetProps extends Properties("graft") {
  import Prop.forAll

  private val tokens: Gen[List[String]] =
    Gen.listOfN(40, Gen.oneOf("scan", "hash", "join", "sort", "agg", "key", "row"))
      .flatMap(l => Gen.choose(0, 40).map(l.take))

  property("windows: ids dense 1..k") = forAll(tokens) { ts =>
    SnippetGen.windowsOf(ts).map(_._1) == (1 to SnippetGen.windowsOf(ts).size)
  }

  property("windows: count = floor((n-1)/3)+1 for n>=1") = forAll(tokens) { ts =>
    val k = SnippetGen.windowsOf(ts).size
    if (ts.isEmpty) k == 0 else k == (ts.size - 1) / 3 + 1
  }

  property("windows: every token covered") = forAll(tokens) { ts =>
    SnippetGen.windowsOf(ts).flatMap(_._2).toSet == ts.toSet
  }

  property("windows: window i covers tokens[3(i-1), 3(i-1)+5)") = forAll(tokens) { ts =>
    SnippetGen.windowsOf(ts).forall { case (id, w) =>
      w == ts.slice((id - 1) * 3, (id - 1) * 3 + 5)
    }
  }

  property("windows: consecutive full windows overlap by exactly 2") = forAll(tokens) { ts =>
    SnippetGen.windowsOf(ts).sliding(2).forall {
      case Seq((_, a), (_, b)) if a.size == 5 && b.size == 5 => a.takeRight(2) == b.take(2)
      case _ => true
    }
  }

  property("simhash: deterministic and order-insensitive only for identical bags") =
    forAll(tokens, tokens) { (a, b) =>
      val same = Dedup.simhash64(a) == Dedup.simhash64(a)
      val eqIfEqual = a != b || Dedup.simhash64(a) == Dedup.simhash64(b)
      same && eqIfEqual
    }

  private val texts: Gen[String] =
    Gen.listOf(Gen.oneOf("ab", "cd.", "ef!", "gh?", "x")).map(_.mkString(" "))

  property("sentence split never loses non-terminator characters") = forAll(texts) { t =>
    val joined = t.trim.split("[.!?]\\s+").mkString(" ")
    val stripped = t.trim.replaceAll("[.!?]\\s+", " ")
    joined == stripped
  }
}

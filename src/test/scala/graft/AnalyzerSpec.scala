package graft

import graft.core.Analyzer
import graft.query.BM25
import org.scalatest.funsuite.AnyFunSuite

class AnalyzerSpec extends AnyFunSuite {

  test("tokenize: lowercase [a-z0-9]+ runs, all lengths kept") {
    assert(Analyzer.tokenize("Binary-Search_Tree v2!").toSeq ==
      Seq("binary", "search", "tree", "v2"))
    assert(Analyzer.tokenize("a  b\n\tC").toSeq == Seq("a", "b", "c"))
    assert(Analyzer.tokenize("").isEmpty)
    assert(Analyzer.tokenize(null).isEmpty)
  }

  test("queryTerms drops terms shorter than 3 (reference BM25_MIN_TERM_LENGTH)") {
    assert(Analyzer.queryTerms("a to the python tutorial").toSeq ==
      Seq("the", "python", "tutorial"))
    assert(Analyzer.distinctQueryTerms("python python tutorial").toSeq ==
      Seq("python", "tutorial"))
  }

  test("BM25 hand-computed fixture (PROJECT_FLOW.md formula, k1=1.2 b=0.75)") {
    // N=5 docs, term df=2, doc tf=3, dl=100, avgdl=80
    val idf = math.log((5 - 2 + 0.5) / (2 + 0.5))
    assert(BM25.idf(5, 2) === idf)
    val tfn = 3 * 2.2 / (3 + 1.2 * (1 - 0.75 + 0.75 * 100.0 / 80.0))
    assert(BM25.tfNorm(3, 100, 80.0) === tfn)
    assert(BM25.contribution(3, 100, 80.0, 5, 2) === idf * tfn)
    // documented formula goes negative when df > N/2 — WAND handles it
    assert(BM25.idf(10, 9) < 0)
    // lucene variant stays positive
    assert(BM25.idf(10, 9, BM25.Params(luceneIdf = true)) > 0)
  }

  test("blockUpperBound respects idf sign") {
    assert(BM25.blockUpperBound(2.0, 1.5, 0.2) == 3.0)  // positive: idf*max
    assert(BM25.blockUpperBound(-1.0, 1.5, 0.2) == -0.2) // negative: idf*min
  }
}

package graft

import graft.sources.ChatIngest

/** Specs for ChatML-style transcript parsing + SFT loss masking. */
class ChatIngestSpec extends SparkSpec {

  test("parseChat: roles, ordering, token counts and loss flags") {
    val turns = ChatIngest.parseChat(
      "<|system|>\nBe terse.\n<|user|>\nTwo words\n<|assistant|>\nok then")
    assert(turns === Seq(
      (0, "system", "Be terse.", 2L, false),
      (1, "user", "Two words", 2L, false),
      (2, "assistant", "ok then", 2L, true)))
  }

  test("parseChat: pre-marker garbage and unknown roles drop") {
    val turns = ChatIngest.parseChat(
      "junk before\n<|user|>\nhi\n<|tool|>\nnever seen\n<|assistant|>\nyo")
    assert(turns.map(t => (t._2, t._3)) === Seq(("user", "hi"), ("assistant", "yo")))
    // a transcript with no markers at all parses to nothing
    assert(ChatIngest.parseChat("just prose, no markers").isEmpty)
    assert(ChatIngest.parseChat(null).isEmpty)
    assert(ChatIngest.parseChat("").isEmpty)
  }

  test("parseChat: empty turns keep their slot with zero tokens") {
    val turns = ChatIngest.parseChat("<|user|>\n<|assistant|>\nreply")
    assert(turns === Seq(
      (0, "user", "", 0L, false),
      (1, "assistant", "reply", 1L, true)))
  }

  test("parseChat: multi-line content collapses, markers must be whole lines") {
    val turns = ChatIngest.parseChat(
      "<|user|>\nline one\n  line two\nmentions <|assistant|> inline\n<|assistant|>\nfin")
    // the inline marker text is CONTENT (markers are whole trimmed
    // lines), so the user turn keeps it and no phantom turn opens...
    assert(turns.length === 2)
    assert(turns(0)._3 === "line one line two mentions <|assistant|> inline")
    assert(turns(1) === ((1, "assistant", "fin", 1L, true)))
  }

  test("buildChat fixture reduces to the oracle's closed-form turn list") {
    val body = "Plain body words here."
    val turns = ChatIngest.parseChat(ChatIngest.buildChat(9L, body))
    assert(turns === Seq(
      (0, "system", "You are assistant 9.", 4L, false),
      (1, "user", body, 4L, false),
      (2, "assistant", "Reply one for doc 9.", 5L, true),
      (3, "user", "Follow-up 9?", 2L, false),
      (4, "assistant", "Reply two.", 2L, true)))
  }
}

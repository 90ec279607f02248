"""Streaming single-document validation: chunked feeds must equal the
batch walk bit-for-bit (violations, captures, pass/fail) at EVERY chunk
size, fast-fail must stop consuming input early, and forward
link-reference definitions must be rejected, not silently diverged."""

import pytest

from mdvalidate_ray.evaluate.evaluator import evaluate_spans
from mdvalidate_ray.schema.compiler import compile_schema
from mdvalidate_ray.sources.markdown import markdown_to_spans
from mdvalidate_ray.stages.stream_validate import (
    StreamingDocValidator,
    StreamingUnsupported,
    validate_text_stream,
)

SCHEMA = (
    "# `title:/[A-Za-z][\\w ]*/`\n"
    "\n"
    "`intro:/Intro .*/`{1,3}\n"
    "\n"
    "- `item:/it .*/`{1,4}\n"
    "\n"
    "```\n"
    "{code:/c .*/}\n"
    "```\n"
    "\n"
    "`outro:/Outro .*/`\n"
)

GOOD_DOC = (
    "# My Title\n"
    "\n"
    "Intro one\n"
    "\n"
    "Intro two\n"
    "\n"
    "- it alpha\n"
    "- it beta\n"
    "\n"
    "```\n"
    "c body\n"
    "```\n"
    "\n"
    "Outro done\n"
)

BAD_MIDDLE = GOOD_DOC.replace("Intro two", "WRONG two")
BAD_FIRST = GOOD_DOC.replace("# My Title", "# 9bad")
EXTRA_TAIL = GOOD_DOC + "\nSurplus paragraph\n"

DOCS = [GOOD_DOC, BAD_MIDDLE, BAD_FIRST, EXTRA_TAIL,
        # quote + table + linkdef-before-use material
        ("# Quoted\n\nIntro a\n\n- it x\n\n```\nc z\n```\n\n"
         "Outro [ok][ref]\n\n"),
        ]


def chunked(text: str, size: int):
    return [text[i:i + size] for i in range(0, len(text), size)]


@pytest.mark.parametrize("size", [1, 3, 7, 16, 64, 10_000])
def test_stream_equals_batch_all_chunk_sizes(size):
    for doc in DOCS:
        want = evaluate_spans(markdown_to_spans(doc),
                              compile_schema(SCHEMA))
        got = validate_text_stream(chunked(doc, size), SCHEMA)
        assert got.passed == want.passed, (size, doc[:30])
        assert got.violations == want.violations, (size, doc[:30])
        assert got.captures == want.captures, (size, doc[:30])


def test_stream_fast_fail_stops_consuming():
    """A violation in the FIRST block (finalized as soon as the second
    block's text arrives) stops the fail-fast driver before the rest of
    the stream is read."""
    v = StreamingDocValidator(SCHEMA, fail_fast=True)
    chunks = chunked(BAD_FIRST, 8)
    consumed = 0
    for c in chunks:
        consumed += 1
        if v.feed(c)["failed"]:
            break
    assert consumed < len(chunks)
    res = v.finish()
    assert not res.passed
    # the finalized violation is the same one batch reports first
    want = evaluate_spans(markdown_to_spans(BAD_FIRST),
                          compile_schema(SCHEMA))
    assert res.violations[0] == want.violations[0]


def test_stream_progress_and_farthest_pos():
    v = StreamingDocValidator(SCHEMA)
    states = [v.feed(c) for c in chunked(GOOD_DOC, 12)]
    assert states[-1]["blocks_done"] >= 1          # mid-stream progress
    assert states[-1]["farthest_reached_pos"] > 0
    res = v.finish()
    assert res.passed
    # farthest pos ends at the full span count
    assert v.farthest_reached_pos == len(v.spans)


def test_forward_link_definition_rejected():
    doc = ("# My Title\n"
           "\n"
           "Intro see [note][x]\n"
           "\n"
           "Intro two\n"
           "\n"
           "- it a\n"
           "\n"
           "```\nc b\n```\n"
           "\n"
           "Outro end\n"
           "\n"
           "[x]: http://example.com\n")
    # batch mode handles it fine
    batch = evaluate_spans(markdown_to_spans(doc), compile_schema(SCHEMA))
    assert batch is not None
    with pytest.raises(StreamingUnsupported):
        validate_text_stream(chunked(doc, 16), SCHEMA)


def test_stream_single_feed_equals_batch():
    """Whole document in one feed() is just batch with extra steps."""
    for doc in DOCS:
        got = validate_text_stream([doc], SCHEMA)
        want = evaluate_spans(markdown_to_spans(doc),
                              compile_schema(SCHEMA))
        assert (got.passed, got.violations, got.captures) == \
            (want.passed, want.violations, want.captures)


# ---------------------------------------------------------------------------
# Char-level partial tolerance at chunk boundaries (the reference's pre-EOF
# compare: matchers.rs:176-203, helpers/compare_text_contents.rs:88-105)
# ---------------------------------------------------------------------------

PARA_MATCHER = "`name:/[a-z ]+/`\n"
PARA_LITERAL = "Hello world\n"


def test_probe_resolves_matcher_mid_regex():
    """A matcher split mid-regex RESOLVES optimistically at the chunk
    boundary (capture exposed, nothing committed) instead of deferring
    every signal to EOF."""
    v = StreamingDocValidator(PARA_MATCHER)
    st = v.feed("hel")                      # mid-word, no stable cut
    assert st["probe"] is not None
    assert st["probe"]["resolved"] is True
    assert st["probe"]["captures"] == {"name": "hel"}
    assert st["probe"]["early_fail"] is False
    v.feed("lo world\n")
    res = v.finish()
    assert res.passed and res.captures == {"name": "hello world"}


def test_probe_definitive_literal_divergence_fails_early():
    """Chars already in hand diverge from the literal expectation ->
    definitive failure AT the boundary; fail-fast stops reading the
    stream before EOF."""
    v = StreamingDocValidator(PARA_LITERAL, fail_fast=True)
    st = v.feed("Hellx wo")
    assert st["failed"] is True
    assert st["probe"]["early_fail"] is True
    # driver contract: stream truncated before the remaining chunks
    chunks = ["Hellx wo", "rld\n", "never", "read"]
    v2 = StreamingDocValidator(PARA_LITERAL, fail_fast=True)
    consumed = 0
    for c in chunks:
        consumed += 1
        if v2.feed(c)["failed"]:
            break
    assert consumed == 1
    assert not v2.finish().passed


def test_probe_prefix_compatible_waits():
    """An in-prefix partial match is NOT an error before EOF (the
    reference's 'partial match is OK')."""
    v = StreamingDocValidator(PARA_LITERAL)
    st = v.feed("Hello wo")
    assert st["failed"] is False
    assert st["probe"]["early_fail"] is False
    v.feed("rld\n")
    assert v.finish().passed


def test_probe_overlong_literal_fails_early():
    """Input already LONGER than the literal expectation is definitive
    (compare_text_contents.rs:91-103 errors on over-long input)."""
    v = StreamingDocValidator(PARA_LITERAL, fail_fast=True)
    st = v.feed("Hello world and then some")
    assert st["failed"] is True and st["probe"]["early_fail"] is True


def test_probe_inline_ambiguous_never_early_fails():
    """'a *bo' diverges char-wise from the flattened 'a bold c' but '*'
    may still open an emphasis that repairs it -- must wait, and the
    full stream must pass at every chunk size."""
    schema = "a *bold* c\n"
    doc = "a *bold* c\n"
    v = StreamingDocValidator(schema)
    st = v.feed("a *bo")
    assert st["failed"] is False
    assert st["probe"] is None or st["probe"]["early_fail"] is False
    v.feed("ld* c\n")
    assert v.finish().passed
    for size in (1, 2, 3, 5, 100):
        assert validate_text_stream(chunked(doc, size), schema).passed


def test_probe_early_fail_only_on_batch_failures():
    """Soundness sweep: an early_fail signal at ANY chunk size for ANY
    corpus doc implies the batch verdict is a failure too."""
    for doc in DOCS:
        want = evaluate_spans(markdown_to_spans(doc),
                              compile_schema(SCHEMA))
        for size in (1, 3, 7, 16, 64):
            v = StreamingDocValidator(SCHEMA)
            saw_early = False
            for c in chunked(doc, size):
                st = v.feed(c)
                if st["probe"] is not None and st["probe"]["early_fail"]:
                    saw_early = True
            res = v.finish()
            assert (res.passed, res.violations, res.captures) == \
                (want.passed, want.violations, want.captures), (size,)
            if saw_early:
                assert not want.passed, (size, doc[:30])

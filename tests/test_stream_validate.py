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

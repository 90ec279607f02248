"""Markdown document → span-sequence flattener.

The reference parses input documents with tree-sitter-markdown (reference:
src/mdschema/validation/ts_utils.rs:97–108); our engine's input contract is
the flattened span table, so this module is the ingestion analog: it turns
real Markdown text into `(kind, text, media_ref, offset)` span rows with the
same flattening conventions the evaluator expects
(:mod:`mdvalidate_ray.evaluate.evaluator` module docstring).

This makes the CLI a drop-in analog of the reference's ``mdv schema input``:
markdown files in, verdict + violations + captures out — and at scale, a
``map_batches`` stage that converts a raw-text corpus column into the spans
shape (one stateless task per batch, no shuffle).
"""

from __future__ import annotations

import re

import pyarrow as pa

from mdvalidate_ray.corpus import DOCUMENTS_SCHEMA

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*)$")
_RULER_RE = re.compile(r"^(-{3,}|\*{3,}|_{3,})\s*$")
_LIST_RE = re.compile(r"^(\s*)([-*+]|\d+\.)\s+(.*)$")
_LINK_RE = re.compile(r"(!?)\[([^\]]*)\]\(([^)]*)\)")
_REFLINK_RE = re.compile(r"(!?)\[([^\]]*)\]\[([^\]]*)\]")
_LINKDEF_RE = re.compile(r"^\s*\[([^\]]+)\]:\s*(\S+)(?:\s+.*)?$")
_CODE_SPAN_RE = re.compile(r"`([^`]*)`")
# CommonMark autolink (§6.5): absolute URI or bare email between < >
_AUTOLINK_RE = re.compile(
    r"<([A-Za-z][A-Za-z0-9+.-]{1,31}://[^\s<>]+"
    r"|[^\s<>@]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,})>")
_STRONG_RE = re.compile(r"\*\*([^*]+)\*\*")
# nested-aware: `*a **b** c*` matches as ONE emphasis spanning the inner
# strong (whose markers are stripped when the span text is emitted — the
# evaluator compares flattened text, matching the schema compiler's
# _flatten_unit)
_EM_RE = re.compile(r"\*((?:[^*\n]|\*\*[^*\n]+\*\*)+)\*(?!\*)")
_SETEXT_RE = re.compile(r"^(=+|-+)\s*$")
# block-level HTML opener (CommonMark type-6-ish): tag, closing tag,
# comment/declaration or processing instruction at ≤3 spaces indent
_HTML_BLOCK_RE = re.compile(r"^\s{0,3}<(?:[A-Za-z][A-Za-z0-9-]*[\s/>]"
                            r"|/[A-Za-z]|!|\?)")


def _indent_depth(ws: str) -> int:
    return ws.count("\t") + ws.replace("\t", "").count("  ")


def _flatten_inline(text: str, add, linkdefs: dict | None = None) -> None:
    """Emit inline child spans for one textual container.  ``linkdefs``
    resolves reference-style links ``[text][label]`` / ``[text][]``
    against the document's link reference definitions."""
    pos = 0
    tokens = []
    for m in sorted(
        list(_LINK_RE.finditer(text)) + list(_CODE_SPAN_RE.finditer(text))
        + list(_STRONG_RE.finditer(text)) + list(_EM_RE.finditer(text))
        + list(_AUTOLINK_RE.finditer(text))
        + (list(_REFLINK_RE.finditer(text)) if linkdefs else []),
        key=lambda m: m.start(),
    ):
        if m.start() < pos:
            continue  # overlapping (e.g. * inside **) — keep first match
        tokens.append(m)
        pos = m.end()
    pos = 0
    for m in tokens:
        if m.start() > pos:
            add("text", text[pos:m.start()])
        if m.re is _LINK_RE:
            kind = "image" if m.group(1) else "link"
            add(kind, m.group(2), media_ref=m.group(3))
        elif m.re is _REFLINK_RE:
            kind = "image" if m.group(1) else "link"
            label = (m.group(3) or m.group(2)).lower()
            add(kind, m.group(2), media_ref=linkdefs.get(label, ""))
        elif m.re is _AUTOLINK_RE:
            url = m.group(1)
            add("link", url,
                media_ref=url if "://" in url else f"mailto:{url}")
        elif m.re is _CODE_SPAN_RE:
            add("code_span", m.group(1))
        elif m.re is _STRONG_RE:
            add("strong_emphasis", m.group(1))
        else:
            # strip interior strong markers: flattened-text compare
            add("emphasis", m.group(1).replace("**", ""))
        pos = m.end()
    if pos < len(text):
        add("text", text[pos:])


def _collect_linkdefs(all_lines: list[str]) -> tuple[set, dict]:
    """Pass 1: find link reference definitions ('[label]: url').

    CODE-AWARE: lines inside fenced code blocks or 4-space-indented code
    are never definitions (stripping them corrupted code bodies), and a
    definition cannot interrupt a paragraph (CommonMark) — it must follow
    a blank line, the document start, or another definition.  Returns the
    set of recognized definition line indices plus the label → url map."""
    def_idx: set[int] = set()
    defs: dict[str, str] = {}
    in_fence = False
    prev_blank_or_def = True
    for idx, raw in enumerate(all_lines):
        stripped = raw.strip()
        if stripped.startswith("```"):
            in_fence = not in_fence
            prev_blank_or_def = False
            continue
        if in_fence or raw.startswith("    "):
            prev_blank_or_def = not stripped
            continue
        dm = _LINKDEF_RE.match(raw)
        if dm and prev_blank_or_def and not _LIST_RE.match(raw):
            def_idx.add(idx)
            defs.setdefault(dm.group(1).lower(), dm.group(2))
            continue                       # a def keeps prev_blank_or_def
        prev_blank_or_def = not stripped
    return def_idx, defs


def markdown_to_spans(text: str,
                      _outer_linkdefs: dict | None = None) -> list[dict]:
    """One markdown document → span dicts (kind, text, media_ref, offset).

    Each span also carries a ``line`` key (1-based source line of the
    block it belongs to) for the CLI's source-context error reports; the
    Arrow documents schema ignores it (struct conversion drops unknown
    keys), so the storage contract is unchanged.

    ``_outer_linkdefs``: internal — definitions inherited from the
    enclosing document when flattening a nested quote body (reference
    definitions are document-global)."""
    spans: list[dict] = []
    cur_line = [1]

    def add(kind, t="", media_ref=""):
        spans.append({"kind": kind, "text": t, "media_ref": media_ref,
                      "offset": len(spans), "line": cur_line[0]})

    all_lines = text.split("\n")
    def_idx, linkdefs = _collect_linkdefs(all_lines)
    if _outer_linkdefs:
        linkdefs = {**_outer_linkdefs, **linkdefs}
    lines = []
    orig_line = []
    for idx, raw in enumerate(all_lines):
        if idx not in def_idx:
            lines.append(raw)
            orig_line.append(idx + 1)
    i, n = 0, len(lines)
    in_table = False
    while i < n:
        cur_line[0] = orig_line[i]
        line = lines[i]
        if not line.strip():
            in_table = False
            i += 1
            continue
        hm = _HEADING_RE.match(line)
        if hm:
            body = hm.group(2).strip()
            # rich inline content (links/images/code spans/emphasis)
            # becomes CHILD spans, mirroring the reference's heading
            # children (tests/textual_container.rs heading_link_and_…,
            # tests/links.rs link_inside_heading); plain text stays in
            # the heading span itself (the compact common case)
            if (_LINK_RE.search(body) or _CODE_SPAN_RE.search(body)
                    or _STRONG_RE.search(body) or _EM_RE.search(body)
                    or _AUTOLINK_RE.search(body)
                    or (linkdefs and _REFLINK_RE.search(body))):
                add(f"heading{len(hm.group(1))}", "")
                _flatten_inline(body, add, linkdefs)
            else:
                add(f"heading{len(hm.group(1))}", body)
            i += 1
            continue
        if _RULER_RE.match(line.strip()) and not _LIST_RE.match(line):
            add("ruler")
            i += 1
            continue
        if line.strip().startswith("```"):
            info = line.strip()[3:].strip()
            add("code_lang", info)
            body = []
            i += 1
            while i < n and not lines[i].strip().startswith("```"):
                body.append(lines[i])
                i += 1
            i += 1
            add("code_body", "\n".join(body))
            continue
        lm = _LIST_RE.match(line)
        if lm:
            # Adjacent sibling lists are DISTINCT list nodes in the
            # reference's tree (tree-sitter gives each its own node;
            # lists.rs validates them separately).  Per CommonMark a new
            # list starts when the top-level marker CLASS changes
            # ("- a" then "* b" or "1. c"); a blank line between items of
            # the same marker continues one (loose) list.  Emit a
            # ``list_break`` marker span at each boundary so the flat
            # encoding does not merge siblings.
            def _marker_class(marker: str) -> str:
                return "1." if marker[0].isdigit() else marker[0]

            _last_list_marker: list = [None]
            while i < n:
                m2 = _LIST_RE.match(lines[i])
                if not m2:
                    # hanging-indent continuation: a non-blank line indented
                    # ≥2 spaces continues the previous item's paragraph
                    # (CommonMark soft break, joined with a space)
                    if (lines[i].strip() and lines[i][:2] == "  "
                            and spans and spans[-1]["kind"] in
                            ("list_item", "ordered_list_item")):
                        spans[-1]["text"] += " " + lines[i].strip()
                        i += 1
                        continue
                    if i < n and not lines[i].strip():
                        # blank line: the list continues if the next
                        # non-blank line is another list item, or an
                        # indented paragraph belonging to the SAME item
                        # (a multi-paragraph/loose item).  The reference
                        # validates only an item's FIRST paragraph
                        # (lists.rs:568–581: marker → next sibling must
                        # be THE paragraph), so extra item paragraphs
                        # flatten as validation-transparent `item_extra`
                        # spans — preserved in the data, ignored by the
                        # block walk, verdicts match the reference.
                        j = i + 1
                        while j < n and not lines[j].strip():
                            j += 1
                        if j < n and _LIST_RE.match(lines[j]):
                            i = j
                            continue
                        def _indented(s: str) -> bool:
                            return s[:2] == "  " or s[:1] == "\t"

                        if j < n and _indented(lines[j]) and \
                                lines[j].strip() and spans and \
                                spans[-1]["kind"] in ("list_item",
                                                      "ordered_list_item",
                                                      "item_extra"):
                            para = []
                            i = j
                            while i < n and lines[i].strip() and \
                                    _indented(lines[i]) and \
                                    not _LIST_RE.match(lines[i]):
                                para.append(lines[i].strip())
                                i += 1
                            add("item_extra", " ".join(para))
                            continue
                    break
                cur_line[0] = orig_line[i]
                depth = _indent_depth(m2.group(1))
                cls = _marker_class(m2.group(2))
                if depth == 0:
                    if _last_list_marker[0] is not None and \
                            _last_list_marker[0] != cls:
                        add("list_break")
                    _last_list_marker[0] = cls
                add("ordered_list_item" if cls == "1." else "list_item",
                    "\t" * depth + m2.group(3))
                i += 1
            continue
        if line.lstrip().startswith(">"):
            from mdvalidate_ray.schema.compiler import _quote_is_blocky

            content = []
            while i < n and lines[i].lstrip().startswith(">"):
                content.append(lines[i].lstrip()[1:].lstrip())
                i += 1
            add("quote")
            if _quote_is_blocky(content):
                # nested blocks inside the quote: flatten recursively
                # (inheriting the document's link definitions) and close
                # with a quote_end marker so the evaluator can scope the
                # body (reference: block_quote children are full block
                # nodes, quotes.rs:63–66)
                for s in markdown_to_spans("\n".join(content),
                                           _outer_linkdefs=linkdefs):
                    add(s["kind"], s["text"], s["media_ref"])
            else:
                _flatten_inline("\n".join(content), add, linkdefs)
            # EVERY quote body closes with quote_end so the evaluator's
            # nesting-aware body scan never miscounts an inline quote
            # nested inside a blocky one
            add("quote_end")
            continue
        if line.lstrip().startswith("|"):
            from mdvalidate_ray.schema.compiler import split_cells_escaped

            rows = []
            while i < n and lines[i].lstrip().startswith("|"):
                # escaped pipes (\|) are literal characters inside cells
                rows.append(split_cells_escaped(lines[i].strip()))
                i += 1
            header = rows[0] if rows else []
            body_rows = rows[1:]
            if body_rows and all(re.match(r"^:?-{3,}:?$", c)
                                 for c in body_rows[0]):
                body_rows = body_rows[1:]
            for c in header:
                add("table_header_cell", c)
            for row in body_rows:
                for c in row:
                    add("table_cell", c)
            in_table = False
            continue
        # HTML block: one OPAQUE span holding the raw lines up to the
        # next blank line — the tree-sitter taxonomy's html_block node
        # (reference ts_types.rs:33–203); the evaluator treats it like
        # any other block kind (schema without an html_block span at
        # that position reports NodeTypeMismatch, matching the
        # reference's dispatch fallback)
        if _HTML_BLOCK_RE.match(line):
            body = []
            while i < n and lines[i].strip():
                body.append(lines[i])
                i += 1
            add("html_block", "\n".join(body))
            continue
        # indented code block (4-space indent, CommonMark)
        if line.startswith("    ") and line.strip():
            body = []
            while i < n and (lines[i].startswith("    ")
                             or not lines[i].strip()):
                if not lines[i].strip():
                    # blank line continues the block only if more indented
                    # code follows
                    j = i
                    while j < n and not lines[j].strip():
                        j += 1
                    if j >= n or not lines[j].startswith("    "):
                        break
                    body.extend("" for _ in range(j - i))
                    i = j
                    continue
                body.append(lines[i][4:])
                i += 1
            add("code_lang", "")
            add("code_body", "\n".join(body))
            continue
        # paragraph (a trailing setext underline turns it into a heading)
        para = []
        while i < n and lines[i].strip() and not (
            _HEADING_RE.match(lines[i]) or _LIST_RE.match(lines[i])
            or lines[i].lstrip().startswith((">", "|", "```"))
            or _RULER_RE.match(lines[i].strip())
            or _HTML_BLOCK_RE.match(lines[i])
            or (para and _SETEXT_RE.match(lines[i].strip()))
        ):
            seg = lines[i].strip()
            # hard line break: a trailing backslash is a break MARKER,
            # not text — drop it (the newline join already preserves the
            # break; trailing double-spaces are consumed by strip())
            if seg.endswith("\\") and not seg.endswith("\\\\"):
                seg = seg[:-1].rstrip()
            para.append(seg)
            i += 1
        if para and i < n and _SETEXT_RE.match(lines[i].strip()):
            underline = lines[i].strip()
            add("heading1" if underline[0] == "=" else "heading2",
                " ".join(para))
            i += 1
            continue
        add("paragraph")
        _flatten_inline("\n".join(para), add, linkdefs)
    return spans


def markdown_batch_to_documents(batch: pa.Table, *, text_column: str = "text",
                                id_column: str = "doc_id") -> pa.Table:
    """Stateless map_batches body: raw-text corpus → the spans-shaped
    documents table (ingestion at scale)."""
    ids = batch.column(id_column).cast(pa.string()).to_pylist()
    texts = batch.column(text_column).to_pylist()
    span_lists = [markdown_to_spans(t or "") for t in texts]
    return pa.Table.from_arrays(
        [pa.array(ids, pa.string()),
         pa.array(span_lists, DOCUMENTS_SCHEMA.field("spans").type)],
        schema=DOCUMENTS_SCHEMA)

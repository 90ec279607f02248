"""CLI — the engine's analog of the reference's ``mdv <schema> <input>
[output] [-f|--fast-fail] [-q|--quiet]`` (reference: src/main.rs:16–31).

Two modes, chosen by the input path:

* **single-document mode** (``input`` is a ``.md`` file or ``-`` for
  stdin): parse the markdown into spans, evaluate in-process (no Ray —
  same latency profile as the reference's one-doc-per-process design),
  print the captures JSON on success or pretty violation reports on
  stderr, exit 0/1 (reference src/main.rs:85–90, cmd.rs:152–178).
* **single-document STREAMING mode** (``--stream``): the analog of the
  reference's chunked stdin loop (cmd.rs:95–122) — ``BUFFER_SIZE``-byte
  reads, optimistic revalidation of the accumulated prefix, fast-fail on
  violations more input cannot cure, authoritative EOF pass
  (validator.rs:161–168); chunking never changes the verdict.
* **corpus mode** (``input`` is a parquet file/dir): run the distributed
  pipeline (validate → verdicts/violations parquet under ``output``),
  print a summary, exit 0/1 on global pass/fail.  ``--fast-fail`` aborts
  after the first batch that contains violations (driver-side early stop,
  the batch analog of cmd.rs:118–121).

The CLI owns its Ray session (guarded init) — the only places allowed to.
"""

from __future__ import annotations

import argparse
import json
import sys


def _read_text(path: str) -> str:
    if path == "-":
        return sys.stdin.read()
    with open(path, encoding="utf-8") as f:
        return f.read()


def print_violation_report(violations: list, quiet: bool,
                           out=sys.stderr) -> None:
    """Small pretty-printer for violation samples — the batch analog of the
    reference's ariadne reports (errors.rs:543–559)."""
    if quiet:
        return
    for v in violations:
        doc = f"[{v['doc_id']}] " if "doc_id" in v else ""
        print(f"{doc}{v['kind']} at span {v['span_index']} "
              f"({v['constraint_id']}): expected {v['expected']!r}, "
              f"got {v['actual']!r}", file=out)


def print_source_report(violations: list, spans: list, source: str,
                        input_path: str, out=sys.stderr) -> None:
    """Source-context error report for single-document mode — the analog
    of the reference's ariadne reports (errors.rs:543–947): each violation
    points at the offending source line with a caret label."""
    src_lines = source.split("\n")
    by_offset = {s["offset"]: s for s in spans}
    for v in violations:
        span = by_offset.get(v["span_index"])
        line_no = span.get("line") if span else None
        print(f"error[{v['kind']}] ({v['constraint_id']})", file=out)
        if line_no and 1 <= line_no <= len(src_lines):
            src = src_lines[line_no - 1]
            gutter = f"{line_no:>4} "
            print(f"  --> {input_path}:{line_no}", file=out)
            print(f"{gutter}| {src}", file=out)
            print(f"{' ' * len(gutter)}| {'^' * max(len(src.strip()), 1)} "
                  f"expected {v['expected']!r}, got {v['actual']!r}",
                  file=out)
        else:
            print(f"  at span {v['span_index']}: expected "
                  f"{v['expected']!r}, got {v['actual']!r}", file=out)
        print(file=out)


def run_single(schema_text: str, input_path: str, output, args) -> int:
    from mdvalidate_ray.evaluate.evaluator import evaluate_spans
    from mdvalidate_ray.schema.compiler import compile_schema
    from mdvalidate_ray.sources.markdown import markdown_to_spans

    compiled = compile_schema(schema_text)
    source = _read_text(input_path)
    spans = markdown_to_spans(source)
    result = evaluate_spans(spans, compiled)
    if result.passed:
        print(result.captures_json(), file=output)
        if not args.quiet:
            print("validation passed", file=sys.stderr)
        return 0
    if not args.quiet:
        print_source_report([dict(v) for v in result.violations],
                            spans, source,
                            input_path if input_path != "-" else "<stdin>")
    return 1


def run_single_stream(schema_text: str, input_path: str, output,
                      args) -> int:
    """Streaming single-document mode — the analog of the reference's
    chunked stdin loop (cmd.rs:95–122): ``BUFFER_SIZE``-byte reads
    (env-overridable, default 2048 — cmd.rs:11, 181–186).

    True INCREMENTAL mode (stages/stream_validate.py): the tail of the
    text is flattened only past provably-stable cut points, finalized
    schema blocks never re-walk (their violations are final — the
    fast-fail signal), and memory holds spans + the unstable tail, not
    re-walk passes — per-chunk CPU is O(tail).  The one construct whose
    meaning depends on later input (a forward link-reference
    definition) falls back to the batch whole-text walk, so the verdict
    always equals non-streaming mode (chunk-size invariance is pinned
    by test_cli_stream_chunk_size_invariance and the
    test_stream_validate equivalence sweeps)."""
    import codecs
    import os

    from mdvalidate_ray.evaluate.evaluator import evaluate_spans
    from mdvalidate_ray.schema.compiler import compile_schema
    from mdvalidate_ray.sources.markdown import markdown_to_spans
    from mdvalidate_ray.stages.stream_validate import (
        StreamingDocValidator,
        StreamingUnsupported,
    )

    compiled = compile_schema(schema_text)
    bufsize = max(1, int(os.environ.get("BUFFER_SIZE", "2048")))
    reader = sys.stdin.buffer if input_path == "-" else \
        open(input_path, "rb")
    dec = codecs.getincrementaldecoder("utf-8")()
    text = ""                       # kept for the caret source report
    v = StreamingDocValidator(schema_text, fail_fast=args.fast_fail)
    streaming_ok = True
    result = None
    try:
        while True:
            chunk = reader.read(bufsize)
            eof = not chunk
            piece = dec.decode(chunk or b"", final=eof)
            text += piece
            if streaming_ok and piece:
                try:
                    state = v.feed(piece)
                except StreamingUnsupported:
                    streaming_ok = False   # batch EOF pass decides
                else:
                    if args.fast_fail and state["failed"]:
                        # finalized violations cannot be cured by more
                        # input — the rest of the stream is never read
                        spans = markdown_to_spans(text)
                        if not args.quiet:
                            print_source_report(
                                [dict(x) for x in v.violations], spans,
                                text, input_path if input_path != "-"
                                else "<stdin>")
                        return 1
            if eof:
                break
    finally:
        if reader is not sys.stdin.buffer:
            reader.close()
    if streaming_ok:
        result = v.finish()
    spans = markdown_to_spans(text)
    if result is None:
        # authoritative batch pass (forward-definition fallback)
        result = evaluate_spans(spans, compiled)
    if result.passed:
        print(result.captures_json(), file=output)
        if not args.quiet:
            print("validation passed", file=sys.stderr)
        return 0
    if not args.quiet:
        print_source_report([dict(v) for v in result.violations],
                            spans, text,
                            input_path if input_path != "-" else "<stdin>")
    return 1


def run_corpus(schema_text: str, input_path: str, out_dir, args) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    import ray.data

    from mdvalidate_ray.stages.validate import (
        validate_dataset,
        violations_dataset,
    )

    if args.checkpoint:
        if not out_dir:
            print("error: --checkpoint requires an OUTPUT directory",
                  file=sys.stderr)
            return 2
        return _run_checkpointed_cli(schema_text, input_path, out_dir, args)

    docs = ray.data.read_parquet(input_path)
    if args.text_column:
        from mdvalidate_ray.sources.markdown import markdown_batch_to_documents

        docs = docs.map_batches(
            lambda b: markdown_batch_to_documents(
                b, text_column=args.text_column),
            batch_format="pyarrow")
    validated = validate_dataset(docs, schema_text)

    errored = False
    if args.fast_fail:
        for b in validated.iter_batches(batch_format="pyarrow",
                                        batch_size=1024):
            nv = sum(b.column("n_violations").to_pylist())
            if nv:
                import pyarrow.compute as pc

                from mdvalidate_ray.stages.validate import explode_violations

                sample = explode_violations(b).slice(0, 10).to_pylist()
                print_violation_report(sample, args.quiet)
                errored = True
                break
        return 1 if errored else 0

    if out_dir:
        validated.write_parquet(f"{out_dir}/verdicts")
        viols = violations_dataset(
            ray.data.read_parquet(f"{out_dir}/verdicts"))
        viols.write_parquet(f"{out_dir}/violations")
        n_viol = ray.data.read_parquet(f"{out_dir}/violations").count()
        n = ray.data.read_parquet(f"{out_dir}/verdicts").count()
    else:
        rows = validated.select_columns(
            ["doc_id", "passed", "n_violations"]).take_all()
        n = len(rows)
        n_viol = sum(r["n_violations"] for r in rows)
    if not args.quiet:
        print(f"{n} documents validated, {n_viol} violations",
              file=sys.stderr)
    return 1 if n_viol else 0


def _run_checkpointed_cli(schema_text: str, input_path: str, out_dir: str,
                          args) -> int:
    """Checkpointed corpus validation: the input's parquet files are split
    into K partitions; finished partitions are skipped on re-run."""
    import glob
    import json
    import os

    import ray.data

    from mdvalidate_ray.pipelines.checkpoint import (
        global_report,
        run_checkpointed,
    )

    files = sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    if not files and os.path.isfile(input_path):
        files = [input_path]
    if not files:
        print(f"error: no parquet files under {input_path}", file=sys.stderr)
        return 2
    k = min(args.partitions, len(files))
    groups = [files[i::k] for i in range(k)]

    run_checkpointed(
        lambda i: ray.data.read_parquet(groups[i]),
        lambda i: {"kind": "parquet_files", "files": groups[i]},
        k, out_dir, schema_text)
    report = global_report(out_dir, k)
    if not args.quiet:
        print(json.dumps({kk: vv for kk, vv in report.items()
                          if kk != "partitions"}), file=sys.stderr)
    return 0 if report["complete"] and report["n_violations"] == 0 else 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="mdv-ray",
        description="Ray-Data-native markdown-schema constraint validation")
    p.add_argument("schema", help="mdschema file ('-' = stdin)")
    p.add_argument("input", help=".md file / '-' (single-doc) or parquet "
                                 "path (corpus)")
    p.add_argument("output", nargs="?", default=None,
                   help="output file (single-doc captures JSON) or "
                        "directory (corpus verdicts/violations parquet)")
    p.add_argument("-f", "--fast-fail", action="store_true",
                   help="exit on first violation")
    p.add_argument("-q", "--quiet", action="store_true")
    p.add_argument("--print-spans", action="store_true",
                   help="dev tool: print the flattened span table of a "
                        "markdown INPUT (ignores the schema walk) — the "
                        "analog of mdvalidate-utils print-tree")
    p.add_argument("--stream", action="store_true",
                   help="single-doc mode: chunked streaming reads "
                        "(BUFFER_SIZE env, default 2048 B) with "
                        "optimistic revalidation; -f exits early on "
                        "violations more input cannot cure; the EOF "
                        "pass is authoritative")
    p.add_argument("--text-column", default=None,
                   help="corpus mode: treat INPUT as raw markdown text in "
                        "this column and flatten it to spans first")
    p.add_argument("--checkpoint", action="store_true",
                   help="corpus mode: run partition-by-partition with a "
                        "resumable manifest under OUTPUT (re-running skips "
                        "finished partitions)")
    p.add_argument("--partitions", type=int, default=8,
                   help="number of checkpoint partitions (with --checkpoint)")
    args = p.parse_args(argv)

    try:
        schema_text = _read_text(args.schema)
    except OSError as e:
        print(f"error: cannot read schema {args.schema}: {e.strerror}",
              file=sys.stderr)
        return 2
    try:
        from mdvalidate_ray.schema.compiler import compile_schema

        compile_schema(schema_text)
    except Exception as e:
        print(f"error: invalid schema: {e}", file=sys.stderr)
        return 2
    if args.print_spans:
        # dev tree dump (reference utils/src/main.rs:19–29 print-tree):
        # one line per span, offset-indexed, media_ref when present
        from mdvalidate_ray.sources.markdown import markdown_to_spans

        for s in markdown_to_spans(_read_text(args.input)):
            ref = f"  -> {s['media_ref']}" if s["media_ref"] else ""
            text = s["text"].replace("\n", "\\n")
            print(f"{s['offset']:>4} {s['kind']:<20} {text!r}{ref}")
        return 0
    single = args.input == "-" or args.input.endswith((".md", ".markdown"))
    if single:
        out = sys.stdout if args.output in (None, "-") else \
            open(args.output, "w", encoding="utf-8")
        try:
            if args.stream:
                return run_single_stream(schema_text, args.input, out,
                                         args)
            return run_single(schema_text, args.input, out, args)
        finally:
            if out is not sys.stdout:
                out.close()
    return run_corpus(schema_text, args.input, args.output, args)


if __name__ == "__main__":
    sys.exit(main())

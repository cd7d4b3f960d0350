"""Command-line surface mirroring the reference's example.py tool.

Reference: /root/reference/pdf_parser/example.py:10-413 — three
subcommands over the single-document API:

- ``replace``  (example.py:17-33, 69-107): find/replace on one page,
  optional ``--analyze`` font census, default output path
  ``output/{name}_replaced{ext}`` (example.py:72-77).
- ``search``   (example.py:36-45, 109-264): all-pages or one-page hit
  list with JSON / array / group-by-text output modes and a default
  JSON dump path ``output/{name}[_pageN]_search_{text}.json``
  (example.py:230-236).
- ``parse``    (example.py:48-60, 266-413): page element dump with the
  same three JSON shapes, default path
  ``output/{name}_page{N}_parsed.json`` (example.py:335-341).

The grouping transforms are semantics-exact ports of the reference's
inline loops (example.py:123-183 for search, 280-330 for parse):
"grouped array" emits ``[{text, details:[{..., index}]}]`` with a
global running index; "flat array" emits ``[{index, text, details}]``;
"hierarchical" emits ``{text: [details]}``. Details are the result
dict minus its ``text``/``context`` keys.

Divergence, by design: invoking with no subcommand prints help and
exits 2 instead of the reference's implicit-replace fallback
(example.py:65-66), which crashes on the missing replace-only
arguments anyway. ``--allow-auto-insert`` here drives the WORKING
auto-insert path (safe-code allocation + CMap/Widths merge + glyph
embedding); the reference's own is broken (embedding.py:68).

Spark is intentionally not imported: this is the per-document kernel
surface (api.py), usable on a laptop or inside an executor.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from .api import (
    PDFTextReplacer,
    parse_page_text,
    replace_pdf_text,
    search_text_in_pdf,
)

__all__ = ["main", "group_results"]


def group_results(
    results: list[dict],
    default_text: str,
    array_format: bool,
    group_by_text: bool,
):
    """The reference's three JSON shapes (example.py:123-183, 280-330).

    Text is taken from the item's ``text`` key, else ``context``, else
    *default_text* (example.py:128-134); the remaining keys become the
    ``details`` dict.
    """
    keyed: list[tuple[str, dict]] = []
    for item in results:
        text = item.get("text", item.get("context", default_text))
        details = {k: v for k, v in item.items() if k not in ("text", "context")}
        keyed.append((text, details))

    if not array_format:  # hierarchical {text: [details]}
        out: dict[str, list[dict]] = {}
        for text, details in keyed:
            out.setdefault(text, []).append(details)
        return out

    groups: dict[str, list[dict]] = {}
    if group_by_text:
        for idx, (text, details) in enumerate(keyed):
            groups.setdefault(text, []).append({**details, "index": idx})
        return [{"text": t, "details": d} for t, d in groups.items()]

    # flat array — grouped first, then flattened with a fresh global
    # index (example.py:154-182: the index follows group order, not
    # document order)
    for text, details in keyed:
        groups.setdefault(text, []).append(details)
    flat = []
    idx = 0
    for text, details_list in groups.items():
        for details in details_list:
            flat.append({"index": idx, "text": text, "details": details})
            idx += 1
    return flat


def _dump_json(payload, json_file: str | None, default_path: str) -> None:
    print(json.dumps(payload, indent=2, ensure_ascii=False))
    path = json_file or default_path
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(payload, fh, indent=2, ensure_ascii=False)
    print(f"JSON results saved to: {path}")


def _build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="pdf-parser-spark",
        description="PDF Text Replacement and Search Tool",
    )
    sub = parser.add_subparsers(dest="command", help="Command to execute")

    rp = sub.add_parser("replace", help="Replace text in PDF")
    rp.add_argument("--input", "-i", required=True)
    rp.add_argument("--output", "-o")
    rp.add_argument("--find", "-f", required=True)
    rp.add_argument("--replace", "-r", required=True)
    rp.add_argument("--page", "-p", type=int, default=0)
    rp.add_argument("--instance", "-ist", type=int, default=-1)
    rp.add_argument("--analyze", action="store_true")
    rp.add_argument("--debug", action="store_true")
    rp.add_argument("--allow-auto-insert", action="store_true")
    rp.add_argument("--verbose", "-v", type=int, choices=[0, 1, 2, 3], default=1)

    sp = sub.add_parser("search", help="Search text in PDF")
    sp.add_argument("--input", "-i", required=True)
    sp.add_argument("--find", "-f", required=True)
    sp.add_argument("--page", "-p", type=int)
    sp.add_argument("--case-sensitive", "-cs", action="store_true")
    sp.add_argument("--json", "-j", action="store_true")
    sp.add_argument("--json-file", "-jf")
    sp.add_argument("--array-format", "-af", action="store_true")
    sp.add_argument(
        "--group-by-text", "-gbt", action="store_true", default=True
    )

    pp = sub.add_parser(
        "parse", help="Parse and extract all replaceable text from a PDF page"
    )
    pp.add_argument("--input", "-i", required=True)
    pp.add_argument("--page", "-p", type=int, default=0)
    pp.add_argument("--json", "-j", action="store_true")
    pp.add_argument("--json-file", "-jf")
    pp.add_argument("--with-coordinates", "-c", action="store_true")
    pp.add_argument("--array-format", "-af", action="store_true", default=True)
    pp.add_argument(
        "--group-by-text", "-gbt", action="store_true", default=True
    )

    lp = sub.add_parser(
        "save-latest",
        help="Copy the newest replacement result out of the output dir",
    )
    lp.add_argument("--dir", "-d", default="output")
    lp.add_argument("--to", "-t", required=True)
    return parser


def _cmd_replace(args) -> int:
    output = args.output
    if not output:
        name, ext = os.path.splitext(os.path.basename(args.input))
        output = f"output/{name}_replaced{ext}"
    d = os.path.dirname(output)
    if d:
        os.makedirs(d, exist_ok=True)

    print(f"Replacing '{args.find}' with '{args.replace}' on page {args.page + 1}...")
    success = replace_pdf_text(
        input_pdf=args.input,
        output_pdf=output,
        target_text=args.find,
        replacement_text=args.replace,
        page_num=args.page,
        instance_index=args.instance,
        debug=args.debug,
        allow_auto_insert=args.allow_auto_insert,
        verbose=args.verbose,
    )
    if success:
        print(f"Replacement successful! Output saved to: {output}")
    else:
        print("Replacement failed or nothing was replaced.")

    if args.analyze:
        # reference example.py:101-107 → analyzer writes
        # output/font_mapping_analysis.txt
        print("\nAnalyzing PDF font mappings...")
        census = PDFTextReplacer(args.input).analyze_fonts()
        os.makedirs("output", exist_ok=True)
        report = "output/font_mapping_analysis.txt"
        with open(report, "w", encoding="utf-8") as fh:
            for font in sorted(census):
                info = census[font]
                fh.write(f"Font: {font}\n")
                fh.write(f"  chars: {''.join(info['chars'])!r}\n")
                for ch in sorted(info["char_codes"]):
                    codes = ", ".join(
                        f"0x{c:02x}" for c in info["char_codes"][ch]
                    )
                    fh.write(f"  {ch!r}: {codes}\n")
                fh.write(
                    "  used codes: "
                    + ", ".join(f"0x{c:02x}" for c in info["used_codes"])
                    + "\n\n"
                )
        print(f"Font analysis complete. Results saved to {report}")
    return 0 if success else 1


def _cmd_search(args) -> int:
    print(f"Searching for '{args.find}' in {args.input}...")
    if args.page is not None:
        print(f"Searching only on page {args.page + 1}")
    try:
        results = search_text_in_pdf(
            pdf=args.input,
            search_text=args.find,
            page_num=args.page,
            case_sensitive=args.case_sensitive,
        )
    except Exception as exc:  # reference example.py:263-264
        print(f"Error during search: {exc}")
        return 1

    if not results:
        print(f"No occurrences of '{args.find}' found.")
        return 0

    if args.json:
        payload = group_results(
            results, args.find, args.array_format, args.group_by_text
        )
        name, _ = os.path.splitext(os.path.basename(args.input))
        safe = args.find.replace(" ", "_")[:20]
        page_str = f"_page{args.page}" if args.page is not None else ""
        _dump_json(
            payload,
            args.json_file,
            f"output/{name}{page_str}_search_{safe}.json",
        )
    else:
        print(f"\nFound {len(results)} instances of '{args.find}':")
        for i, result in enumerate(results):
            context = result["context"].strip().replace("\n", " ")
            if len(context) > 100:
                context = context[:100] + "..."
            print(f"  {i + 1}. Page {result['page'] + 1}: {context}")
            rect = result.get("rect")
            if rect:
                print(
                    f"     Position: x0={rect['x0']:.2f}, y0={rect['y0']:.2f},"
                    f" x1={rect['x1']:.2f}, y1={rect['y1']:.2f}"
                )
    return 0


def _cmd_parse(args) -> int:
    print(f"Parsing text from page {args.page + 1} in {args.input}...")
    try:
        results = parse_page_text(pdf=args.input, page_num=args.page)
    except Exception as exc:
        print(f"Error during parsing: {exc}")
        return 1

    if not results:
        print("No text elements found.")
        return 0

    if args.json:
        # parse results always carry a "text" key; context never set
        payload = group_results(
            results, "", args.array_format, args.group_by_text
        )
        name, _ = os.path.splitext(os.path.basename(args.input))
        _dump_json(
            payload, args.json_file, f"output/{name}_page{args.page}_parsed.json"
        )
    else:
        print(
            f"\nExtracted {len(results)} text elements from page"
            f" {args.page + 1} (including duplicates):"
        )
        for i, result in enumerate(results):
            text = result["text"]
            if len(text) > 100:
                text = text[:100] + "..."
            print(f"  {i + 1}. {text}")
            rect = result.get("rect")
            if args.with_coordinates and rect:
                print(
                    f"     Position: x0={rect['x0']:.2f}, y0={rect['y0']:.2f},"
                    f" x1={rect['x1']:.2f}, y1={rect['y1']:.2f}"
                )
    return 0


def latest_output(out_dir: str = "output") -> str | None:
    """Newest replacement result by mtime, or None (reference O6:
    pdf_gui.py:1322-1326 — ``replaced_*.pdf`` there; this engine's
    replace default is ``{name}_replaced.pdf``, so both spellings
    count)."""
    if not os.path.isdir(out_dir):
        return None
    pdfs = [
        f
        for f in os.listdir(out_dir)
        if f.endswith(".pdf")
        and (f.startswith("replaced_") or f.removesuffix(".pdf").endswith("_replaced"))
    ]
    if not pdfs:
        return None
    return os.path.join(
        out_dir, max(pdfs, key=lambda f: os.path.getmtime(os.path.join(out_dir, f)))
    )


def _cmd_save_latest(args) -> int:
    import shutil

    src = latest_output(args.dir)
    if src is None:
        # reference pdf_gui.py:1324-1325 message shape
        print("No replacement result to save; please run a replacement first")
        return 1
    d = os.path.dirname(args.to)
    if d:
        os.makedirs(d, exist_ok=True)
    shutil.copy2(src, args.to)
    print(f"Saved: {args.to} (from {src})")
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = _build_parser()
    args = parser.parse_args(argv)
    try:
        if args.command == "replace":
            return _cmd_replace(args)
        if args.command == "search":
            return _cmd_search(args)
        if args.command == "parse":
            return _cmd_parse(args)
        if args.command == "save-latest":
            return _cmd_save_latest(args)
    except BrokenPipeError:  # downstream `| head` closed stdout
        return 0
    parser.print_help()
    return 2


if __name__ == "__main__":
    sys.exit(main())

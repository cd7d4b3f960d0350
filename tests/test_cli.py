"""CLI surface (cli.py) vs the reference's example.py semantics.

Covers the three subcommands, the three JSON output shapes
(example.py:123-183/280-330), default dump paths, and the
auto-insert pass-through.
"""

import json
import os

import pytest

from pdf_parser_spark.cli import group_results, main
from pdf_parser_spark.pdfgen.writer import text_to_pdf

SRC = "Hello World\nthe quick brown fox\nHello World"


@pytest.fixture(scope="module")
def pdf_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("cli") / "doc.pdf"
    p.write_bytes(text_to_pdf(SRC))
    return str(p)


def run_in(tmp_path, monkeypatch, argv):
    monkeypatch.chdir(tmp_path)
    return main(argv)


# -- grouping transforms (pure) --------------------------------------


RESULTS = [
    {"text": "a", "page": 0, "rect": None},
    {"text": "b", "page": 0, "rect": None},
    {"text": "a", "page": 1, "rect": None},
]


def test_group_by_text_array():
    out = group_results(RESULTS, "x", array_format=True, group_by_text=True)
    assert [g["text"] for g in out] == ["a", "b"]
    # global running index in encounter order (example.py:127-140)
    assert [d["index"] for d in out[0]["details"]] == [0, 2]
    assert out[1]["details"][0]["index"] == 1
    assert "text" not in out[0]["details"][0]


def test_flat_array_reindexes_group_order():
    out = group_results(RESULTS, "x", array_format=True, group_by_text=False)
    # reference flattens the groups, so index follows group order,
    # not document order (example.py:154-182)
    assert [(r["index"], r["text"]) for r in out] == [
        (0, "a"), (1, "a"), (2, "b"),
    ]


def test_hierarchical_shape():
    out = group_results(RESULTS, "x", array_format=False, group_by_text=True)
    assert sorted(out) == ["a", "b"]
    assert len(out["a"]) == 2 and "text" not in out["a"][0]


def test_context_fallback_for_search_rows():
    rows = [{"context": "ctx here", "page": 0}]
    out = group_results(rows, "needle", True, True)
    assert out[0]["text"] == "ctx here"
    assert "context" not in out[0]["details"][0]


# -- subcommands -----------------------------------------------------


def test_parse_json_default_path(tmp_path, monkeypatch, pdf_path, capsys):
    rc = run_in(tmp_path, monkeypatch, ["parse", "-i", pdf_path, "--json"])
    assert rc == 0
    dump = tmp_path / "output" / "doc_page0_parsed.json"
    assert dump.exists()
    payload = json.loads(dump.read_text())
    texts = {g["text"] for g in payload}
    assert "Hello World" in texts
    # stdout carries the same JSON (example.py prints then saves)
    assert "Hello World" in capsys.readouterr().out


def test_parse_friendly_with_coordinates(tmp_path, monkeypatch, pdf_path, capsys):
    rc = run_in(tmp_path, monkeypatch, ["parse", "-i", pdf_path, "-c"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "text elements from page 1" in out
    assert "Position: x0=" in out


def test_search_json_file_and_hits(tmp_path, monkeypatch, pdf_path):
    dump = tmp_path / "hits.json"
    rc = run_in(
        tmp_path,
        monkeypatch,
        ["search", "-i", pdf_path, "-f", "Hello", "--json", "-af",
         "-jf", str(dump)],
    )
    assert rc == 0
    payload = json.loads(dump.read_text())
    assert payload[0]["text"].startswith("Hello")
    assert len(payload[0]["details"]) == 2  # two Hello World lines


def test_search_no_hits_is_success(tmp_path, monkeypatch, pdf_path, capsys):
    rc = run_in(tmp_path, monkeypatch, ["search", "-i", pdf_path, "-f", "zzz"])
    assert rc == 0
    assert "No occurrences" in capsys.readouterr().out


def test_search_default_dump_name(tmp_path, monkeypatch, pdf_path):
    rc = run_in(
        tmp_path,
        monkeypatch,
        ["search", "-i", pdf_path, "-f", "quick brown", "--json", "-af",
         "-p", "0"],
    )
    assert rc == 0
    # spaces → underscores, page suffix (example.py:230-236)
    assert (tmp_path / "output" / "doc_page0_search_quick_brown.json").exists()


def test_replace_roundtrip(tmp_path, monkeypatch, pdf_path, capsys):
    rc = run_in(
        tmp_path,
        monkeypatch,
        ["replace", "-i", pdf_path, "-f", "the quick brown fox", "-r", "the quiet brown fox"],
    )
    assert rc == 0
    out_pdf = tmp_path / "output" / "doc_replaced.pdf"
    assert out_pdf.exists()
    from pdf_parser_spark.pdfcore.extract import extract_pdf

    text = " ".join(t for _, _, t, _, _ in extract_pdf(out_pdf.read_bytes()).items)
    assert "quiet" in text and "quick" not in text
    assert "Replacement successful" in capsys.readouterr().out


def test_replace_failure_exit_code(tmp_path, monkeypatch, pdf_path):
    rc = run_in(
        tmp_path,
        monkeypatch,
        ["replace", "-i", pdf_path, "-f", "absent-text", "-r", "x"],
    )
    assert rc == 1


def test_replace_analyze_writes_report(tmp_path, monkeypatch, pdf_path):
    rc = run_in(
        tmp_path,
        monkeypatch,
        ["replace", "-i", pdf_path, "-f", "the quick brown fox", "-r", "the quick brown dog", "--analyze"],
    )
    assert rc == 0
    report = (tmp_path / "output" / "font_mapping_analysis.txt").read_text()
    assert report.startswith("Font: ")
    assert "used codes" in report


def test_no_subcommand_prints_help(tmp_path, monkeypatch, capsys):
    rc = run_in(tmp_path, monkeypatch, [])
    assert rc == 2
    assert "Command to execute" in capsys.readouterr().out


def test_api_auto_insert_passthrough(tmp_path, pdf_path):
    """api.replace_pdf_text(allow_auto_insert=True) reaches the working
    rewrite auto-insert path (was dropped on the floor pre-r4)."""
    from pdf_parser_spark.api import PDFTextReplacer, replace_pdf_text

    out = tmp_path / "auto.pdf"
    ok = replace_pdf_text(
        pdf_path, str(out), "the quick brown fox", "the quick bröwn föx", allow_auto_insert=True
    )
    assert ok
    from pdf_parser_spark.pdfcore.extract import extract_pdf

    text = " ".join(t for _, _, t, _, _ in extract_pdf(out.read_bytes()).items)
    assert "bröwn föx" in text

    r = PDFTextReplacer(open(pdf_path, "rb").read()).replace_text(
        "the quick brown fox", "the quick bröwn föx", allow_auto_insert=True
    )
    assert r.success


def test_save_latest_picks_newest_by_mtime(tmp_path, monkeypatch):
    """O6 (pdf_gui.py:1322-1328): newest replacement result wins."""
    import os
    import time

    out = tmp_path / "output"
    out.mkdir()
    (out / "a_replaced.pdf").write_bytes(b"old")
    (out / "replaced_b.pdf").write_bytes(b"new")
    (out / "unrelated.pdf").write_bytes(b"nope")
    old_t = time.time() - 100
    os.utime(out / "a_replaced.pdf", (old_t, old_t))
    rc = run_in(tmp_path, monkeypatch, ["save-latest", "--to", "dest.pdf"])
    assert rc == 0
    assert (tmp_path / "dest.pdf").read_bytes() == b"new"


def test_save_latest_empty_dir_fails(tmp_path, monkeypatch, capsys):
    rc = run_in(tmp_path, monkeypatch, ["save-latest", "--to", "dest.pdf"])
    assert rc == 1
    assert "No replacement result" in capsys.readouterr().out

"""F2/F3 span hygiene: ghost-rect filter + rounded rect dedup."""

from pyspark.sql import Row


def _parsed(spark, spans):
    from pdf_parser_spark.engine.extractor import PARSED_SCHEMA

    return spark.createDataFrame(
        [
            Row(
                url="u1",
                kind="pdf",
                text="t",
                n_pages=1,
                n_items=len(spans),
                n_spans=len(spans),
                error=None,
                parse_ms=1.0,
                payload_bytes=10,
                partition_id=0,
                fallback_pages=0,
                recovered=0,
                spans=spans,
                items=[],
            )
        ],
        schema=PARSED_SCHEMA,
    )


def _span(seq, x, y, size=12.0, width=50.0, text="hello"):
    return Row(
        page_no=0, seq=seq, text=text, x=x, y=y,
        font="/F1", size=size, width=width,
    )


def test_ghost_and_dedup_filters(spark):
    from pdf_parser_spark.engine.extractor import clean_spans_view

    spans = [
        _span(0, 72.0, 700.0),                       # keep
        _span(1, 72.0, 650.0, width=0.5),            # ghost: width < 1
        _span(2, 72.0, 640.0, size=0.2),             # ghost: height < 1
        _span(3, 0.0, 0.0),                          # ghost: origin (0,0)
        _span(4, 72.04, 700.04, text="dup"),         # dup of seq 0 at 0.1pt
        _span(5, 200.0, 700.0),                      # keep (same y, new x)
    ]
    out = clean_spans_view(_parsed(spark, spans)).collect()
    kept = sorted(r["seq"] for r in out)
    # seq 0 and 4 collapse to one (either survives); 1,2,3 ghosted
    assert len(kept) == 2
    assert kept[1] == 5
    assert kept[0] in (0, 4)

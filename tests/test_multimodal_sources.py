"""Multimodal payload plumbing (schema/batch/determinism) and the
format-sniffing sources (S1 CSV/TSV, S5 VCF, S6 MAF)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.multimodal import (
    attach_payload,
    extract_features,
    fake_feature,
    frame_sample,
)
from vectordb_bioinsight_spark.sources.readers import (
    read_csv_sniffed,
    read_maf,
    read_vcf,
    sniff_delimiter,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [(1, "hello world"), (2, "x" * 600), (3, "a")]
    df = spark.createDataFrame(rows, ["id", "txt"])
    return attach_payload(df, "id", "txt")


def test_media_schema_and_payload_bytes(media):
    assert media.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,payload:binary,meta:map<string,string>>"
    )
    row = media.filter(F.col("media_id") == 1).first()
    assert bytes(row["payload"]) == b"hello world"
    assert row["meta"]["orig_col"] == "txt"


def test_extract_features_deterministic_md5(media):
    out = {r["media_id"]: r for r in extract_features(media, dim=4).collect()}
    digest = hashlib.md5(b"hello world").hexdigest()
    assert out[1]["payload_md5"] == digest
    assert out[1]["n_bytes"] == 11
    assert out[1]["feature"] == fake_feature(b"hello world", 4)
    assert all(0.0 <= v <= 1.0 for v in out[2]["feature"])


def test_extract_features_dim_bounds(media):
    with pytest.raises(ValueError):
        extract_features(media, dim=17)


def test_frame_sample_chunking(spark, media):
    frames = frame_sample(media, frame_bytes=256, every_n=2).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    # 600 bytes -> frames 0,1,2 -> sampled 0,2 ; frame 2 has 600-512=88 bytes
    f2 = sorted(by_id[2], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in f2] == [0, 2]
    assert [len(bytes(r["frame"])) for r in f2] == [256, 88]
    # 11 bytes and 1 byte -> single frame 0
    assert [r["frame_idx"] for r in by_id[1]] == [0]
    assert len(bytes(by_id[3][0]["frame"])) == 1


def test_sniff_and_read_csv_tsv(spark, tmp_path):
    tsv = tmp_path / "m.tsv"
    tsv.write_text("gene_id\tsample\tcount\ng1\ts1\t5\ng2\ts1\t7\n")
    csvf = tmp_path / "m.csv"
    csvf.write_text("gene_id,sample,count\ng1,s1,5\ng2,s1,7\n")
    assert sniff_delimiter(str(tsv)) == "\t"
    assert sniff_delimiter(str(csvf)) == ","
    for p in (tsv, csvf):
        df = read_csv_sniffed(spark, str(p))
        assert df.columns == ["gene_id", "sample", "count"]
        assert df.count() == 2
        assert df.filter(F.col("gene_id") == "g2").first()["count"] == 7


VCF_TEXT = """##fileformat=VCFv4.2
##INFO=<ID=DP,Number=1,Type=Integer>
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO
chr1\t12345\trs1\tA\tT\t50\tPASS\tDP=100;AF=0.5
chr2\t999\t.\tG\tC,GA\t.\tq10\tDP=7
"""


def test_read_vcf(spark, tmp_path):
    p = tmp_path / "v.vcf"
    p.write_text(VCF_TEXT)
    df = read_vcf(spark, str(p))
    rows = {r["variant_id"]: r for r in df.collect()}
    assert len(rows) == 2
    assert rows["rs1"]["chromosome"] == "chr1"
    assert rows["rs1"]["position"] == 12345
    assert rows["rs1"]["info"] == "DP=100;AF=0.5"
    # INFO field extraction downstream via regexp (the reference's parse)
    dp = df.select(
        F.regexp_extract("info", r"DP=(\d+)", 1).cast("int").alias("dp")
    ).collect()
    assert sorted(r["dp"] for r in dp) == [7, 100]


def test_read_maf(spark, tmp_path):
    p = tmp_path / "m.maf"
    p.write_text(
        "Hugo_Symbol\tChromosome\tStart_Position\tVariant_Classification\n"
        "TP53\t17\t7577120\tMissense_Mutation\n"
        "KRAS\t12\t25398284\tNonsense_Mutation\n"
    )
    df = read_maf(spark, str(p))
    assert df.count() == 2
    assert df.filter(F.col("Hugo_Symbol") == "TP53").first()["Start_Position"] == 7577120


def test_parse_vcf_info_and_driver_scores(spark, tmp_path):
    from vectordb_bioinsight_spark.operators.variant import driver_scores, parse_vcf_info

    p = tmp_path / "d.vcf"
    p.write_text(VCF_TEXT)
    from vectordb_bioinsight_spark.sources.readers import read_vcf

    vcf = parse_vcf_info(read_vcf(spark, str(p)))
    rows = {r["variant_id"]: r for r in vcf.collect()}
    assert rows["rs1"]["dp"] == 100 and rows["rs1"]["af"] == 0.5

    variants = spark.createDataFrame(
        [
            # hotspot + cosmic + missense + oncogene-activating:
            # 40 + 20 + 0.6*15 + 10 = 79 -> driver
            ("KRAS", "p.G12D", "missense", 0.45, True),
            # TSG + frameshift LoF + cosmic: 20 + 1.0*15 + 15 = 50 -> driver
            ("TP53", "p.R175fs", "frameshift", 0.2, True),
            # synonymous nobody-gene: 0.1*15 = 1.5 -> not driver
            ("GAPDH", "p.L10L", "synonymous", 0.1, False),
        ],
        ["gene", "aa_change", "effect", "vaf", "in_cosmic"],
    )
    hotspots = spark.createDataFrame([("KRAS", "p.G12D")], ["gene", "aa_change"])
    roles = spark.createDataFrame(
        [("KRAS", "Oncogene"), ("TP53", "TSG")], ["gene", "role"]
    )
    got = {r["gene"]: r for r in driver_scores(variants, hotspots, roles).collect()}
    assert got["KRAS"]["driver_score"] == pytest.approx(79.0)
    assert got["KRAS"]["is_driver"] and got["KRAS"]["is_hotspot"]
    assert "hotspot:KRAS p.G12D" in got["KRAS"]["evidence"]
    assert "clonal_vaf" in got["KRAS"]["evidence"]
    assert got["TP53"]["driver_score"] == pytest.approx(50.0)
    assert got["TP53"]["is_driver"] and "tsg_lof" in got["TP53"]["evidence"]
    assert got["GAPDH"]["driver_score"] == pytest.approx(1.5)
    assert not got["GAPDH"]["is_driver"] and got["GAPDH"]["role"] == "Unknown"


def test_resize_images_plumbing(spark):
    """Resize stage: binary in/out, exact target byte size, deterministic
    under repartition, empty payload padded."""
    from vectordb_bioinsight_spark.operators.multimodal import attach_payload, resize_images

    docs = spark.createDataFrame(
        [(1, "some long enough text payload for striding"), (2, "x"), (3, "")],
        ["doc_id", "text"],
    )
    media = attach_payload(docs, "doc_id", "text", kind="image")
    out = resize_images(media, target_w=4, target_h=3).orderBy("media_id").collect()
    assert [r["media_id"] for r in out] == [1, 2, 3]
    assert all(r["n_bytes"] == 12 and len(r["resized"]) == 12 for r in out)
    assert all(r["width"] == 4 and r["height"] == 3 for r in out)
    again = resize_images(media.repartition(5), 4, 3).orderBy("media_id").collect()
    assert [bytes(r["resized"]) for r in out] == [bytes(r["resized"]) for r in again]


def _mini_pdf(paragraphs: list[str]) -> bytes:
    import zlib

    shows = b" T* T* ".join(
        b" T* ".join(b"(" + line.encode("latin-1") + b") Tj" for line in para.split("\n"))
        for para in [p.replace("(", "\\(").replace(")", "\\)") for p in paragraphs]
    )
    content = b"BT /F1 12 Tf 72 720 Td " + shows + b" ET"
    stream = zlib.compress(content)
    return (
        b"%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(stream)).encode()
        + b" /Filter /FlateDecode >> stream\n" + stream
        + b"\nendstream endobj\ntrailer << /Root 1 0 R >>\n%%EOF"
    )


def test_parse_pdf_binary_end_to_end_sections(spark):
    """S3 real path without PyMuPDF: synthesize a FlateDecode PDF, decode it
    distributed (mapInPandas), then structure sections JVM-side."""
    from vectordb_bioinsight_spark.sources.readers import (
        parse_pdf_binary,
        sections_from_text,
    )

    pdf = _mini_pdf(
        [
            "Introduction\nThis paper studies distributed joins.",
            "Methods\nWe use hash partitioning (fast) everywhere.",
        ]
    )
    df = spark.createDataFrame([(1, bytearray(pdf)), (2, None)], ["media_id", "payload"])
    decoded = parse_pdf_binary(df)
    rows = {r["id"]: r for r in decoded.collect()}
    assert "distributed joins" in rows[1]["text"]
    assert rows[1]["n_chars"] > 50 and rows[2]["n_chars"] == 0
    secs = sections_from_text(decoded.filter("id = 1"), "id", "text").collect()
    headers = [s["header"] for s in secs]
    assert "Introduction" in headers and "Methods" in headers
    bodies = " ".join(s["body"] for s in secs)
    assert "hash partitioning (fast)" in bodies


def test_parse_pdf_binary_ocr_fallback_seam(spark):
    """pdf_parser.py:469-475 semantics: a doc whose text layer is under
    ocr_min_chars retries through the injectable OCR callable and keeps
    the longer text, flagged ocr_used; text-rich docs never flip."""
    from vectordb_bioinsight_spark.sources.readers import parse_pdf_binary

    # local def -> cloudpickle serializes it BY VALUE (a module-level fake
    # would pickle by reference to a module executors can't import)
    def _fake_ocr(data: bytes) -> str:
        return f"\n[PAGE_0]\nOCR RECOVERED {len(data)} BYTES OF SCANNED TEXT"

    scanned = b"%PDF-1.4\n% no text layer at all\ntrailer\n%%EOF"
    rich = _mini_pdf(["Results\n" + ("real text-layer words " * 40)])
    df = spark.createDataFrame(
        [(1, bytearray(scanned)), (2, bytearray(rich))], ["media_id", "payload"]
    )
    rows = {r["id"]: r for r in parse_pdf_binary(df, ocr=_fake_ocr).collect()}
    assert rows[1]["ocr_used"] is True
    assert "OCR RECOVERED" in rows[1]["text"]
    assert rows[2]["ocr_used"] is False and "real text-layer" in rows[2]["text"]
    # disabled OCR keeps the (empty) text layer and stays un-flagged
    off = {r["id"]: r for r in parse_pdf_binary(
        df, ocr=_fake_ocr, ocr_min_chars=0
    ).collect()}
    assert off[1]["ocr_used"] is False and off[1]["n_chars"] == 0


def test_read_jsonl_corpus_isolates_corrupt_lines(spark, tmp_path):
    import json as _json

    from vectordb_bioinsight_spark.sources.readers import (
        read_jsonl_corpus,
        split_corrupt_rows,
    )

    p = tmp_path / "corpus.jsonl"
    lines = [
        _json.dumps({"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "s0"}),
        'this is { not json',
        _json.dumps({"doc_id": 2, "text": "gamma", "lang": "de", "source": "s1"}),
        '{"doc_id": "notanint", "text": 3}',
    ]
    p.write_text("\n".join(lines) + "\n")
    df = read_jsonl_corpus(spark, str(p))
    clean, corrupt = split_corrupt_rows(df)
    rows = {r["doc_id"]: r for r in clean.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["text"] == "alpha beta" and rows[2]["lang"] == "de"
    bad = [r["raw_line"] for r in corrupt.collect()]
    assert len(bad) == 2 and any("not json" in b for b in bad)


# ---------------------------------------------------------------------------
# WARC scan (sources/readers.py: read_warc / warc_responses_to_documents)
# ---------------------------------------------------------------------------


def _warc_record(rtype: str, uri: str, rid: str, body: str) -> str:
    block = (
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Date: 2024-01-15T10:00:00Z\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + f"Content-Length: {len(body)}\r\n\r\n{body}\r\n\r\n"
    )
    return "WARC/1.0\r\n" + block


def test_read_warc_and_documents_handoff(spark, tmp_path):
    from vectordb_bioinsight_spark.sources.readers import (
        read_warc,
        warc_responses_to_documents,
    )

    http1 = (
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        "<p>Hello <b>crawl</b></p> see https://example.com/a"
    )
    http2 = "HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\ngone"
    warc_text = (
        _warc_record("warcinfo", "", "aaa", "software: test")
        + _warc_record("request", "http://x.io/a", "bbb", "GET /a HTTP/1.1")
        + _warc_record("response", "http://x.io/a", "ccc", http1)
        + _warc_record("response", "http://x.io/b", "ddd", http2)
    )
    p = tmp_path / "seg.warc"
    p.write_text(warc_text)

    recs = read_warc(spark, str(p))
    by_id = {r["record_id"]: r for r in recs.collect()}
    assert len(by_id) == 4
    assert by_id["<urn:uuid:ccc>"]["warc_type"] == "response"
    assert by_id["<urn:uuid:ccc>"]["target_uri"] == "http://x.io/a"
    assert by_id["<urn:uuid:ccc>"]["warc_date"] == "2024-01-15T10:00:00Z"
    assert by_id["<urn:uuid:ccc>"]["content_length"] == len(http1)
    assert by_id["<urn:uuid:aaa>"]["target_uri"] == ""  # warcinfo has none

    docs = {r["url"]: r for r in warc_responses_to_documents(recs).collect()}
    assert set(docs) == {"http://x.io/a", "http://x.io/b"}
    assert docs["http://x.io/a"]["http_status"] == 200
    assert docs["http://x.io/a"]["text"].startswith("<p>Hello")
    assert docs["http://x.io/b"]["http_status"] == 404

    # handoff into the hygiene tier: strip the HTML of the 200 response
    from vectordb_bioinsight_spark.operators.cleaning import strip_html
    from pyspark.sql import functions as F

    cleaned = (
        warc_responses_to_documents(recs)
        .filter(F.col("http_status") == 200)
        .select(strip_html(F.col("text")).alias("t"))
        .first()["t"]
    )
    assert cleaned == "Hello crawl\n see https://example.com/a"


def test_read_warc_is_scan_local(spark, tmp_path):
    from vectordb_bioinsight_spark.sources.readers import read_warc

    p = tmp_path / "one.warc"
    p.write_text(_warc_record("response", "http://a.io", "x", "HTTP/1.1 200 OK\r\n\r\nhi"))
    plan = read_warc(spark, str(p))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_read_warc_gzip_segment(spark, tmp_path):
    """Common Crawl ships .warc.gz per segment; Spark's text source
    decompresses per-file transparently — same rows as the plain read."""
    import gzip

    seg = _warc_record("response", "http://gz.io/a", "g1", "HTTP/1.1 200 OK\r\n\r\nzipped body")
    plain = tmp_path / "p.warc"
    plain.write_text(seg)
    gz = tmp_path / "p.warc.gz"
    gz.write_bytes(gzip.compress(seg.encode()))

    from vectordb_bioinsight_spark.sources.readers import read_warc

    a = sorted(map(tuple, read_warc(spark, str(plain)).collect()))
    b = sorted(map(tuple, read_warc(spark, str(gz)).collect()))
    assert a == b and len(a) == 1


def test_read_warc_framing_validation(spark, tmp_path):
    """ADVICE r04: the substring separator must not silently corrupt.
    (a) A bare 'WARC/1.0' WITHOUT a version-line CRLF inside a payload no
    longer splits the record at all (separator is anchored at
    'WARC/1.0\\r\\n'). (b) A payload embedding a full version line DOES
    mis-split — both fragments must come back suspect, and
    warc_responses_to_documents must drop them. (c) Intact records pass
    the Content-Length octet check and are not suspect."""
    from vectordb_bioinsight_spark.sources.readers import (
        read_warc,
        warc_responses_to_documents,
    )

    ok_body = "HTTP/1.1 200 OK\r\n\r\npage about the WARC/1.0 format"
    evil_body = (
        "HTTP/1.1 200 OK\r\n\r\ncrawled spec text:\r\nWARC/1.0\r\n"
        "WARC-Type: response\r\nlooks like a header block"
    )
    seg = (
        _warc_record("response", "http://ok.io/a", "ok1", ok_body)
        + _warc_record("response", "http://evil.io/b", "ev1", evil_body)
        + _warc_record("response", "http://ok.io/c", "ok2", "HTTP/1.1 200 OK\r\n\r\nfine")
    )
    p = tmp_path / "mix.warc"
    p.write_text(seg)

    recs = read_warc(spark, str(p)).collect()
    by_uri = {}
    for r in recs:
        by_uri.setdefault(r["target_uri"], []).append(r)
    # (a) bare marker: one intact, non-suspect record containing it
    (a,) = by_uri["http://ok.io/a"]
    assert a["suspect"] is False and "WARC/1.0 format" in a["payload"]
    # (b) the embedded version line split the evil record: its head
    # fragment fails the length check, the fabricated tail either fails
    # validation or never parses as a record — nothing clean survives
    evil = [r for r in recs if r["target_uri"].startswith("http://evil.io")]
    assert evil and all(r["suspect"] for r in evil)
    # (c) intact trailing record unharmed
    (c,) = by_uri["http://ok.io/c"]
    assert c["suspect"] is False and c["payload"].endswith("fine")
    # the documents handoff drops every suspect row
    urls = {r["url"] for r in
            warc_responses_to_documents(read_warc(spark, str(p))).collect()}
    assert urls == {"http://ok.io/a", "http://ok.io/c"}

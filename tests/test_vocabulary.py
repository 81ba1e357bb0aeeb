"""V7 vocabulary dispatch: query normalization, three-way branch selection,
anchor scoring, and the broadcast-dimension plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vectordb_bioinsight_spark.operators.vocabulary import (
    dispatch_search,
    extract_key_from_query,
    vocab_dimension,
    vocab_match_scores,
)
from vectordb_bioinsight_spark.plans.catalog_coverage import VOCAB_ENTRIES
from vectordb_bioinsight_spark.sources.readers import load_table


class TestExtractKey:
    def test_primary_term(self):
        assert extract_key_from_query("join", VOCAB_ENTRIES) == ("join", "")

    def test_synonym_resolves_to_canonical_key(self):
        assert extract_key_from_query("merge", VOCAB_ENTRIES) == ("join", "")

    def test_modifiers_survive_extraction(self):
        key, rest = extract_key_from_query("join vector spark", VOCAB_ENTRIES)
        assert key == "join" and rest == "vector spark"

    def test_longest_term_wins(self):
        # 'stream' (6 chars) must beat 'scan' if both were present; here the
        # guarantee tested is that a LONGER containing term is preferred
        entries = VOCAB_ENTRIES + [("streaming", "streaming", "primary", 1.0)]
        key, rest = extract_key_from_query("streaming data", entries)
        assert key == "streaming" and rest == "data"

    def test_case_insensitive(self):
        assert extract_key_from_query("MERGE", VOCAB_ENTRIES)[0] == "join"

    def test_no_match_returns_none(self):
        assert extract_key_from_query("window hash", VOCAB_ENTRIES) == (
            None,
            "window hash",
        )


class TestDispatch:
    def test_three_branches(self, spark):
        docs = load_table(spark, SF_SMALL, "documents")
        assert dispatch_search(docs, "merge", VOCAB_ENTRIES)[0] == "list_all"
        assert dispatch_search(docs, "join vector", VOCAB_ENTRIES)[0] == "keywords"
        assert dispatch_search(docs, "window hash", VOCAB_ENTRIES)[0] == "lexical"

    def test_keyword_branch_requires_a_hit(self, spark):
        docs = load_table(spark, SF_SMALL, "documents")
        _, out = dispatch_search(docs, "join vector", VOCAB_ENTRIES)
        rows = out.collect()
        assert rows and all(r["keyword_hits"] >= 1 for r in rows)
        assert all(
            abs(r["total_score"] - (r["keyword_hits"] * 10.0 + r["vocab_score"])) < 1e-6
            for r in rows
        )

    def test_anchor_prefers_primary_over_synonym(self, spark):
        # one doc where the PRIMARY term appears in the 'title' zone and the
        # synonym later: primary weight 1.0*100 beats synonym 0.8*anything
        df = spark.createDataFrame(
            [(1, "join quickly " + "x " * 80 + " merge")], "doc_id long, text string"
        )
        vocab = vocab_dimension(spark, VOCAB_ENTRIES)
        out = vocab_match_scores(df, vocab, "doc_id", "text", "join").collect()
        assert len(out) == 1
        assert out[0]["matched_term"] == "join"
        assert out[0]["vocab_score"] == 100.0

    def test_vocab_join_is_broadcast(self, spark):
        docs = load_table(spark, SF_SMALL, "documents")
        vocab = vocab_dimension(spark, VOCAB_ENTRIES)
        plan = vocab_match_scores(
            docs, vocab, "doc_id", "text", "join"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan
        assert "CartesianProduct" not in plan


class TestReviewFixes:
    def test_midword_term_does_not_fragment_query(self):
        """'merged results' must NOT match vocab term 'merge' (word-bounded
        extraction — review finding r04: raw substring removal left 'd
        results' as garbage keywords)."""
        assert extract_key_from_query("merged results", VOCAB_ENTRIES) == (
            None,
            "merged results",
        )
        # boundaries still allow punctuation-adjacent matches
        key, rest = extract_key_from_query("merge, please", VOCAB_ENTRIES)
        assert key == "join"
        assert rest == ", please"

    def test_fragmented_branch_goes_lexical(self, spark):
        from tests.conftest import SF_SMALL

        docs = load_table(spark, SF_SMALL, "documents")
        strategy, _ = dispatch_search(docs, "merged results", VOCAB_ENTRIES)
        assert strategy == "lexical"

    def test_mixed_case_doc_anchors_and_keywords_hit(self, spark):
        """Doc-side matching must be case-insensitive like the reference
        (precision_search.py:286-341 lowercases BOTH content and term):
        'Diabetes' anchors vocab term 'diabetes', mixed-case docs still
        count lowercased residual keywords, and the title-zone position is
        measured in the lowered text (ADVICE r04)."""
        from vectordb_bioinsight_spark.operators.vocabulary import (
            keyword_priority_scores,
        )

        entries = [("diabetes", "diabetes", "primary", 1.0)]
        docs = spark.createDataFrame(
            [
                (1, "Diabetes Mellitus: INSULIN response studies"),
                (2, "a body paragraph. " * 10 + "Then DIABETES appears late"),
                (3, "no match here"),
            ],
            "doc_id long, text string",
        )
        vocab = vocab_dimension(spark, entries)
        out = {r["doc_id"]: r for r in
               vocab_match_scores(docs, vocab, "doc_id", "text", "diabetes").collect()}
        assert set(out) == {1, 2}
        assert out[1]["vocab_score"] == 100.0      # title zone, full weight
        assert out[2]["vocab_score"] == 60.0       # body zone
        anchored = vocab_match_scores(docs, vocab, "doc_id", "text", "diabetes")
        kw = {r["doc_id"]: r for r in
              keyword_priority_scores(anchored, docs, "doc_id", "text", ["insulin"]).collect()}
        assert set(kw) == {1} and kw[1]["keyword_hits"] == 1


class TestMeshSeed:
    """The packaged MeSH-subset vocabulary (functions/mesh_seed.py) — the
    realistic seed the reference ships as medical_vocabulary.py:62-207."""

    def test_seed_breadth_and_shape(self):
        from vectordb_bioinsight_spark.functions.mesh_seed import (
            MESH_SEED,
            mesh_seed_entries,
        )

        assert len(MESH_SEED) >= 60
        entries = mesh_seed_entries()
        assert len(entries) >= 180
        keys = {k for k, _t, _kd, _w in entries}
        assert keys == set(MESH_SEED)
        # every MeSH unique ID looks like the NLM format
        import re
        for _k, (_p, mesh_id, _s, _a) in MESH_SEED.items():
            assert re.fullmatch(r"D\d{6,9}", mesh_id), mesh_id
        # short-abbreviation gate: nothing under 4 chars reaches doc-side
        # substring anchoring by default
        assert all(len(t) >= 4 for _k, t, kd, _w in entries if kd == "abbreviation")
        # terms are pre-lowered (matching is lower-vs-lower; the dimension
        # stores the canonical lowered surface form)
        assert all(t == t.lower() for _k, t, _kd, _w in entries)

    def test_query_normalization_on_seed(self):
        from vectordb_bioinsight_spark.functions.mesh_seed import mesh_seed_entries

        entries = mesh_seed_entries()
        # longest-term-first: 'type 2 diabetes' beats bare 'diabetes'
        key, rest = extract_key_from_query("Type 2 Diabetes treatment options", entries)
        assert key == "diabetes_type2"
        assert rest == "treatment options"
        # synonym tier resolves to the canonical key
        assert extract_key_from_query("heart attack", entries)[0] == "myocardial_infarction"
        # abbreviation tier (>= 4 chars)
        assert extract_key_from_query("COPD exacerbation", entries)[0] == "copd"
        # no vocabulary term -> branch 3
        assert extract_key_from_query("spark window hash", entries) == (
            None,
            "spark window hash",
        )

    def test_dispatch_anchors_mixed_case_medical_docs(self, spark):
        from vectordb_bioinsight_spark.functions.mesh_seed import mesh_seed_entries

        entries = mesh_seed_entries()
        docs = spark.createDataFrame(
            [
                (1, "Alzheimer Disease progression in APOE4 carriers"),
                (2, "A cohort with Type 2 Diabetes and hypertension"),
                (3, "spark notes, unrelated"),
            ],
            "doc_id long, text string",
        )
        strategy, out = dispatch_search(docs, "alzheimer disease", entries)
        assert strategy == "list_all"
        rows = out.collect()
        assert [r["doc_id"] for r in rows] == [1]
        assert rows[0]["vocab_key"] == "alzheimer"

    def test_mesh_ids_join_dimension(self, spark):
        from vectordb_bioinsight_spark.functions.mesh_seed import (
            MESH_SEED,
            mesh_id_dimension,
        )

        dim = {r["vocab_key"]: r["mesh_id"] for r in mesh_id_dimension(spark).collect()}
        assert dim["alzheimer"] == "D000544"
        assert len(dim) == len(MESH_SEED)

"""QUERIES.md must stay in sync with the catalog (generated file)."""


def test_queries_md_up_to_date():
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "gen_queries_md", os.path.join(repo, "scripts", "gen_queries_md.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert open(os.path.join(repo, "QUERIES.md")).read() == mod.build()

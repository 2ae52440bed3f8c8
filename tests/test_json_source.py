"""JSON source: dot-flattening + type mapping (JsonDocumentParser.h:23-63
analogue)."""

import json

from diagon_spark.sources.json_source import read_json_documents


def test_flatten_and_types(spark, tmp_path):
    docs = [
        {"title": "hello", "meta": {"lang": "py", "stats": {"stars": 5}},
         "tags": ["a", "b"], "active": True, "score": 1.5},
        {"title": "world", "meta": {"lang": "c", "stats": {"stars": 2}},
         "tags": [], "active": False, "score": 2.0},
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(json.dumps(d) for d in docs))
    df = read_json_documents(spark, str(p))
    assert set(df.columns) == {"title", "meta.lang", "meta.stats.stars",
                               "tags", "active", "score"}
    rows = {r["title"]: r for r in df.collect()}
    assert rows["hello"]["meta.lang"] == "py"
    assert rows["hello"]["meta.stats.stars"] == 5
    assert rows["hello"]["tags"] == ["a", "b"]
    assert rows["hello"]["active"] == "true"  # bool -> string rule
    assert isinstance(rows["hello"]["score"], float)


def test_flattened_json_indexable(spark, tmp_path):
    from diagon_spark import build_index, Searcher
    from diagon_spark.search.query import Term
    docs = [{"id": i, "body": {"text": f"alpha beta doc{i}"}}
            for i in range(10)]
    p = tmp_path / "c.jsonl"
    p.write_text("\n".join(json.dumps(d) for d in docs))
    flat = read_json_documents(spark, str(p))
    cat = build_index(spark, flat, str(tmp_path / "idx"), num_segments=1,
                      num_buckets=2, id_col="id", content_col="`body.text`",
                      positions=False)
    s = Searcher(spark, cat)
    assert s.count(Term("alpha")) == 10

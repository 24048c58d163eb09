"""Field-tree / FieldsParser validation tier (controllers/Fields.scala:12-95,
FieldsParser.scala:26-150, Errors.scala:36-90) and the immense-term write
guard (ImmenseTermProcessor.scala:16-60)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scalligraph_spark.fields import (
    AttributeCheckingError,
    FNumber,
    FObject,
    FSeq,
    FString,
    FieldsParser,
    from_json,
    validate_chain,
)


def test_field_tree_roundtrip_and_paths():
    f = from_json({"a": {"b": [1, {"c": "x"}]}, "s": "str", "n": 2.5, "t": True, "z": None})
    assert isinstance(f, FObject)
    assert f.get("a.b[1].c") == FString("x")
    assert f.get("a.b[0]") == FNumber(1.0)
    assert not f.get("a.missing").is_defined()
    assert not f.get("a.b[9]").is_defined()
    assert f.to_json()["a"]["b"][1]["c"] == "x"


def test_fields_parser_accumulates_errors():
    """All violations surface at once — the reference's Every[AttributeError]
    accumulation, not fail-fast (FieldsParser.scala:26-33)."""
    p = FieldsParser(from_json({"name": 42, "size": "big"}))
    p.read_string("name")
    p.read_number("size")
    p.read_boolean("flag")  # missing
    with pytest.raises(AttributeCheckingError) as ei:
        p.result(None)
    types = sorted(e.type for e in ei.value.errors)
    assert types == ["InvalidFormatAttributeError", "InvalidFormatAttributeError", "MissingAttributeError"]
    msgs = str(ei.value)
    assert "name" in msgs and "size" in msgs and "flag" in msgs


def test_validate_chain_good_and_bad():
    good = [{"_name": "allPeople"}, {"_name": "page", "from": 0, "to": 10}]
    assert validate_chain(good, known_queries=("allPeople",)) == good

    bad = [
        {"_name": "nosuch"},                       # unknown query
        {"_name": "page", "to": "ten"},            # non-numeric to
        {"limit": 5},                              # missing _name
        {"_name": "sort", "_fields": "age"},       # _fields not an array
    ]
    with pytest.raises(AttributeCheckingError) as ei:
        validate_chain(bad, known_queries=("allPeople",))
    errs = ei.value.errors
    assert len(errs) == 4
    assert any(e.type == "UnknownAttributeError" and e.name == "[0]._name" for e in errs)
    assert any(e.type == "InvalidFormatAttributeError" and e.name == "[1].to" for e in errs)
    assert any(e.type == "MissingAttributeError" and e.name == "[2]._name" for e in errs)
    assert any(e.type == "InvalidFormatAttributeError" and e.name == "[3]._fields" for e in errs)

    with pytest.raises(AttributeCheckingError):
        validate_chain({"_name": "not-an-array"})


def test_parse_and_execute_front_door(modern):
    from scalligraph_spark.qlang.executor import QueryExecutor

    ex = QueryExecutor(modern)
    ex.register_init("allPeople", lambda g, s, a: g.V("person"))
    t = ex.parse_and_execute([{"_name": "allPeople"}, {"_name": "limit", "n": 2}])
    assert t.df.count() == 2
    with pytest.raises(AttributeCheckingError):
        ex.parse_and_execute([{"_name": "allPeople"}, {"_name": "limit", "n": "two"}])


def test_immense_term_guard_strategies(spark):
    from scalligraph_spark.writes import immense_term_guard

    big = "x" * 50
    df = spark.createDataFrame(
        [(1, "short", ["a", big]), (2, big, ["b"]), (3, None, None)],
        "id long, txt string, tags array<string>",
    )
    # truncate with per-column threshold override
    out = immense_term_guard(df, {"txt": "truncate(10)", "tags": "truncate(10)"})
    rows = {r["id"]: r for r in out.collect()}
    assert rows[2]["txt"] == "x" * 10 and rows[1]["tags"][1] == "x" * 10
    assert rows[3]["txt"] is None  # nulls untouched

    # delete drops the offending row (DeleteVertex)
    kept = immense_term_guard(df, {"txt": "delete(10)"}).select("id").collect()
    assert sorted(r["id"] for r in kept) == [1, 3]

    # log flags without mutating (LogData)
    flagged = {r["id"]: r["_immense_txt"] for r in immense_term_guard(df, {"txt": "log(10)"}).collect()}
    assert flagged == {1: False, 2: True, 3: False}

    with pytest.raises(ValueError, match="unknown immense term strategy"):
        immense_term_guard(df, {"txt": "explode"})

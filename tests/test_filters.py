"""Unit tests for the metadata-filter mini-language."""

import pytest

from mlvectordb_tpu.engine.filters import matches_filter


def test_equality_shorthand():
    assert matches_filter({"a": 1}, {"a": 1})
    assert not matches_filter({"a": 2}, {"a": 1})
    assert not matches_filter({}, {"a": 1})


def test_comparison_ops():
    m = {"n": 5}
    assert matches_filter(m, {"n": {"$gt": 4}})
    assert matches_filter(m, {"n": {"$gte": 5}})
    assert matches_filter(m, {"n": {"$lt": 6}})
    assert matches_filter(m, {"n": {"$lte": 5}})
    assert matches_filter(m, {"n": {"$ne": 4}})
    assert not matches_filter(m, {"n": {"$gt": 5}})
    assert matches_filter(m, {"n": {"$gt": 4, "$lt": 6}})  # implicit AND within field


def test_in_nin_exists():
    m = {"color": "red"}
    assert matches_filter(m, {"color": {"$in": ["red", "blue"]}})
    assert not matches_filter(m, {"color": {"$nin": ["red"]}})
    assert matches_filter(m, {"color": {"$exists": True}})
    assert matches_filter(m, {"size": {"$exists": False}})
    assert matches_filter(m, {"size": {"$ne": 1}})  # missing != 1
    assert matches_filter(m, {"size": {"$nin": [1]}})


def test_logical_combinators():
    m = {"a": 1, "b": 2}
    assert matches_filter(m, {"$and": [{"a": 1}, {"b": 2}]})
    assert matches_filter(m, {"$or": [{"a": 9}, {"b": 2}]})
    assert not matches_filter(m, {"$or": [{"a": 9}, {"b": 9}]})
    assert matches_filter(m, {"$not": {"a": 9}})
    assert not matches_filter(m, {"$not": {"a": 1}})


def test_dotted_paths():
    m = {"user": {"age": 30, "tags": {"vip": True}}}
    assert matches_filter(m, {"user.age": {"$gte": 18}})
    assert matches_filter(m, {"user.tags.vip": True})
    assert not matches_filter(m, {"user.missing": 1})


def test_type_mismatch_is_false_not_error():
    assert not matches_filter({"a": "str"}, {"a": {"$gt": 3}})


def test_empty_filter_matches_everything():
    assert matches_filter({}, None)
    assert matches_filter({"x": 1}, {})


def test_unknown_operator_raises():
    with pytest.raises(ValueError):
        matches_filter({"a": 1}, {"a": {"$regex": ".*"}})
    with pytest.raises(ValueError):
        matches_filter({"a": 1}, {"$xor": []})

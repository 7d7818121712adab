"""REPROOF.json rotation tier (r15): verdict-mandated re-proofs must
enter the driver's ~50-query sweep window even when the source-dirty
population exceeds it, and must go inert once proven."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipelinejobs_indexer_spark import registry  # noqa: E402

registry.load_all()


def _write(tmp_path, payload) -> str:
    p = tmp_path / "REPROOF.json"
    p.write_text(json.dumps(payload))
    return str(tmp_path)


def test_reproof_entries_apply_while_unproven(tmp_path):
    name = next(iter(registry.QUERIES))
    root = _write(tmp_path, {"round": 99, "queries": [name]})
    # evidence older than the file's round -> obligation active
    assert registry._reproof_queries({name: 98}, root) == {name}
    # never-proven also qualifies (latest.get -> -1 < round)
    assert registry._reproof_queries({}, root) == {name}


def test_reproof_inert_once_proven_at_or_after_round(tmp_path):
    name = next(iter(registry.QUERIES))
    root = _write(tmp_path, {"round": 15, "queries": [name]})
    assert registry._reproof_queries({name: 15}, root) == set()
    assert registry._reproof_queries({name: 16}, root) == set()


def test_reproof_ignores_unknown_names_and_bad_files(tmp_path):
    root = _write(tmp_path, {"round": 15, "queries": ["no_such_query", 42]})
    assert registry._reproof_queries({}, root) == set()
    (tmp_path / "REPROOF.json").write_text("{not json")
    assert registry._reproof_queries({}, str(tmp_path)) == set()
    assert registry._reproof_queries({}, str(tmp_path / "missing")) == set()


def test_repo_reproof_queries_inside_sweep_window():
    """The committed REPROOF.json's r15 obligations must sit inside the
    first ~50 registry names (the driver sweep window) as long as they
    remain unproven for r15."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "REPROOF.json")) as fh:
        data = json.load(fh)
    latest = registry._latest_green_round()
    names = list(registry.QUERIES)
    for q in data["queries"]:
        assert q in registry.QUERIES, q
        if latest.get(q, -1) < data["round"]:
            assert names.index(q) < 50, (q, names.index(q))

"""Replay corpus regression suite (PrestoQueryReplayRunner.h:31-47 analog):
every stored statement re-runs through the full SQL front door each round
and must match DuckDB. The corpus grows automatically when the SQL fuzzer
finds a failing input (tests/test_parser_fuzz.py records it)."""

import pytest

from tools.replay import load_corpus, replay_one

_CORPUS = load_corpus()


@pytest.mark.parametrize("entry", _CORPUS, ids=[e["name"] for e in _CORPUS])
def test_replay_corpus(spark, sf_dir, entry):
    replay_one(spark, sf_dir, entry)


def test_corpus_not_empty():
    assert len(_CORPUS) >= 15

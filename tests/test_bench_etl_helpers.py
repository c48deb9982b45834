"""Unit tests for the wiki-ETL bench harness's quarantine accounting (the
r8 advice item closed in r10): the exact-count expectation must only apply
to sidecar-verified generator dumps, ``corrupt_every=1`` must be rejected
at parse time, and a mismatch must be REPORTED in the result JSON rather
than discarding a completed timed run. Pure helpers — no Spark session."""

from __future__ import annotations

import importlib.util
import os

import pytest

_SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "bench_wiki_etl.py",
)
_spec = importlib.util.spec_from_file_location("bench_wiki_etl", _SCRIPT)
bench_wiki_etl = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and bench_wiki_etl)


def test_corrupt_count_matches_generator_rule():
    # the generator corrupts page i iff i % k == k // 2 — spot-check the
    # closed form against a literal enumeration
    for n_pages, k in [(0, 10), (5, 10), (10, 3), (1000, 7), (24, 2)]:
        want = sum(
            1 for i in range(n_pages) if k and i % k == k // 2
        )
        assert bench_wiki_etl.corrupt_count(n_pages, k) == want
    assert bench_wiki_etl.corrupt_count(1000, 0) == 0


def test_validate_corrupt_every_rejects_one_and_negative():
    assert bench_wiki_etl.validate_corrupt_every(0) == 0
    assert bench_wiki_etl.validate_corrupt_every(2) == 2
    assert bench_wiki_etl.validate_corrupt_every(10_000) == 10_000
    with pytest.raises(SystemExit, match="corrupts every page"):
        bench_wiki_etl.validate_corrupt_every(1)
    with pytest.raises(SystemExit, match=">= 0"):
        bench_wiki_etl.validate_corrupt_every(-3)


def test_quarantine_report_verified_match_and_mismatch():
    expected = bench_wiki_etl.corrupt_count(10_000, 100)
    ok = bench_wiki_etl.quarantine_report(expected, 10_000, 100, True)
    assert ok == {
        "quarantine_actual": expected,
        "quarantine_expected": expected,
        "quarantine_match": True,
    }
    bad = bench_wiki_etl.quarantine_report(expected + 1, 10_000, 100, True)
    assert bad["quarantine_match"] is False
    assert bad["quarantine_expected"] == expected
    assert bad["quarantine_actual"] == expected + 1


def test_quarantine_report_unverified_dump_never_asserts():
    # a reused dump WITHOUT a sidecar (allowed with a warning) may hold
    # anything — the expectation must be honestly absent, not a guess
    r = bench_wiki_etl.quarantine_report(7, 10_000, 100, False)
    assert r == {
        "quarantine_actual": 7,
        "quarantine_expected": None,
        "quarantine_match": None,
    }

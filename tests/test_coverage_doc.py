"""COVERAGE.md drift guard (round-2 VERDICT item 8): the coverage document
and the query registry must not diverge in either direction — round 1
already saw documented counts drift from reality.

Rules:
- every qNN token referenced in COVERAGE.md must exist in the registry;
- every registered query must be mentioned in COVERAGE.md (or sit in the
  explicit exemption list below with a reason).
"""

from __future__ import annotations

import re

from gh_archive_data_pipeline_spark.plans.registry import all_queries

COVERAGE_PATH = "/root/repo/COVERAGE.md"

# Registered queries deliberately not given their own COVERAGE.md row,
# with the reason. Keep this list SHORT — additions need a justification.
EXEMPT: dict[str, str] = {}


def _registry_ids() -> dict[str, str]:
    """qNN -> full registered name."""
    out = {}
    for name in all_queries():
        m = re.match(r"(q\d+)_", name)
        assert m, f"registry name without qNN prefix: {name}"
        assert m.group(1) not in out, f"duplicate query number: {name}"
        out[m.group(1)] = name
    return out


def test_coverage_doc_mentions_only_real_queries():
    ids = _registry_ids()
    doc = open(COVERAGE_PATH).read()
    mentioned = set(re.findall(r"\bq\d+", doc))
    ghosts = sorted(m for m in mentioned if m not in ids)
    assert not ghosts, (
        f"COVERAGE.md references non-existent queries: {ghosts}")


def test_every_registered_query_is_documented():
    ids = _registry_ids()
    doc = open(COVERAGE_PATH).read()
    mentioned = set(re.findall(r"\bq\d+", doc))
    missing = sorted(
        ids[q] for q in ids
        if q not in mentioned and ids[q] not in EXEMPT)
    assert not missing, (
        f"registered queries absent from COVERAGE.md (document them or add "
        f"an EXEMPT entry with a reason): {missing}")


def test_exemptions_are_not_stale():
    names = set(all_queries())
    stale = sorted(q for q in EXEMPT if q not in names)
    assert not stale, f"EXEMPT entries for unregistered queries: {stale}"


def test_readme_counts_match_registry():
    """Round-3 VERDICT item: README's catalog counts drifted once; derive
    them from the registry and fail on any future drift."""
    qs = all_queries()
    total = len(qs)
    oracled = sum(1 for s in qs.values() if s.sql)
    rows_only = total - oracled
    readme = open("/root/repo/README.md").read()
    m = re.search(
        r"(\d+) named queries over the fixtures,\s*\n.*?(\d+) paired\s*\n"
        r".*?\(the (\d+)\s*\n\s*rows-only",
        readme)
    assert m, "README.md no longer states the catalog counts in plans/ blurb"
    got = tuple(int(x) for x in m.groups())
    assert got == (total, oracled, rows_only), (
        f"README counts {got} != registry ({total}, {oracled}, {rows_only})")

"""Doc-rot guard: every entry name COVERAGE.md claims must exist in
the __spark_entry__ registry, and every registered entry must have an
oracle — the docs and the correctness gate can't drift apart."""

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _registry():
    import __spark_entry__ as e
    return set(e.queries()), e.oracle_sql()


def test_coverage_entry_names_exist():
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    claimed = set(re.findall(
        r"entr(?:y|ies)\s+`([a-z][a-z0-9_]+)`", text))
    # also names listed as `x` + `y` after an "entries" word
    for m in re.finditer(r"entr(?:y|ies)\s+((?:`[a-z0-9_]+`"
                         r"(?:\s*(?:\+|,|/)\s*)?)+)", text):
        claimed.update(re.findall(r"`([a-z][a-z0-9_]+)`", m.group(1)))
    q, _ = _registry()
    missing = sorted(c for c in claimed if c not in q)
    assert not missing, f"COVERAGE.md claims unknown entries: {missing}"
    assert len(claimed & q) > 50  # the extraction actually found them


def test_every_entry_has_an_oracle():
    q, o = _registry()
    assert q == set(o), (sorted(q - set(o)), sorted(set(o) - q))


def test_round_notes_entry_count_is_current():
    q, _ = _registry()
    assert len(q) == 104, (
        "entry registry changed size — update ROUND_NOTES/COVERAGE "
        f"references (now {len(q)})")

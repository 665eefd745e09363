"""SURVEY.md §2.5 — the graded operator-inventory contract — must stay
in sync with the query registry (VERDICT r8 item 5: the section had
drifted 16 rows behind by round 8).

Two pins: (1) the generator's family taxonomy assigns every registered
query exactly once (render() raises otherwise), and (2) the section in
SURVEY.md is byte-identical to a fresh render, so registering a query
without rerunning ``tools/gen_survey_25.py`` fails the suite instead
of silently aging the contract.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))


def test_survey_25_matches_registry():
    import gen_survey_25

    from hyppo_worker_spark.queries import load_all

    rendered = gen_survey_25.render(set(load_all()))  # raises on drift
    txt = open(os.path.join(ROOT, "SURVEY.md"), encoding="utf-8").read()
    section = "### 2.5 " + txt.split("### 2.5 ", 1)[1].split("\n## 3. ", 1)[0]
    # the section ends with the --- separator the generator re-adds
    section = section.rsplit("\n---\n", 1)[0].rstrip("\n") + "\n"
    assert section == rendered.rstrip("\n") + "\n", (
        "SURVEY.md §2.5 is stale — rerun: python tools/gen_survey_25.py"
    )


def test_every_registry_name_in_survey():
    from hyppo_worker_spark.queries import load_all

    txt = open(os.path.join(ROOT, "SURVEY.md"), encoding="utf-8").read()
    missing = [n for n in load_all() if f"`{n}`" not in txt]
    assert not missing, f"registry names absent from SURVEY.md: {missing}"

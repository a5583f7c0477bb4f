"""Round-end record-integrity gate (VERDICT r10 #7).

Round 10's changelog asserted two evidence artifacts
(a 6-entry CORRECTNESS_SF1SPAN.json, a BENCH_SF1_r10.json) that were
never committed — the runs happened in scratch space but the record
didn't land, and the snapshot text claimed it anyway. This test makes
that class of error impossible to commit silently: every evidence-class
artifact filename mentioned in CHANGELOG.md or README.md must exist in
the tree.

Mentions inside a ``*[CORRECTED ... ]*`` block are exempt — that is the
documented retraction syntax, where naming a file that was never
committed is the point.
"""

from __future__ import annotations

import os
import re
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tracked_files() -> set[str] | None:
    """Names git actually tracks (staged or committed). An artifact
    sitting untracked in the working tree is EXACTLY the r10 failure
    mode this gate exists for (ADVICE r11: os.path.exists passed
    locally while the claim was missing from the commit). Returns None
    outside a git checkout — callers fall back to existence."""
    try:
        out = subprocess.run(
            ["git", "ls-files"],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=30,
        )
    except OSError:
        return None
    if out.returncode != 0:
        return None
    return {line.strip() for line in out.stdout.splitlines() if line.strip()}

# The artifact classes the verification protocol rests on. Anything
# matching this, asserted in prose, must be in the tree.
ARTIFACT_RE = re.compile(
    r"\b((?:CORRECTNESS|BENCH|PARCURVE|COPYCHECK|LEAKCHECK|BASELINE)"
    r"[A-Za-z0-9_]*\.json)\b"
)
CORRECTED_RE = re.compile(r"\*\[CORRECTED.*?\]\*", re.DOTALL)


def claimed_artifacts(text: str) -> set[str]:
    return set(ARTIFACT_RE.findall(CORRECTED_RE.sub("", text)))


def test_changelog_and_readme_artifact_claims_exist():
    tracked = _tracked_files()
    missing = []
    for doc in ("CHANGELOG.md", "README.md", "BENCH_NOTES.md"):
        path = os.path.join(REPO, doc)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            text = f.read()
        for name in sorted(claimed_artifacts(text)):
            if tracked is not None:
                ok = name in tracked
            else:
                ok = os.path.exists(os.path.join(REPO, name))
            if not ok:
                missing.append(f"{doc} claims {name}")
    assert not missing, (
        "documents assert evidence artifacts that are not git-tracked "
        "(git add the artifact or retract with a *[CORRECTED ...]* "
        "block; untracked-but-present files fail on purpose — that was "
        "the r10 failure mode): " + "; ".join(missing)
    )


def test_corrected_block_exemption_works():
    text = (
        "green (CORRECTNESS_REAL.json) done\n"
        "*[CORRECTED in round 11: BENCH_GHOST_r99.json was never "
        "committed]*\n"
    )
    assert claimed_artifacts(text) == {"CORRECTNESS_REAL.json"}


# ---------------------------------------------------------------- tier walls
#
# VERDICT r11 #2: README's test-tier wall claims must come from a
# committed measurement, not prose optimism (the "<10 min" claim the
# r10/r11 judges both falsified). Contract: BENCH_TIERS.json holds the
# measured walls; README quotes minutes with the literal syntax
# "measured ~Nm (BENCH_TIERS.json)"; this gate re-derives N from the
# artifact and fails on ANY drift between the two documents.

TIER_CLAIM_RE = re.compile(r"measured ~(\d+)m \(BENCH_TIERS\.json\)")


def test_readme_tier_walls_match_committed_measurement():
    import json

    readme = open(os.path.join(REPO, "README.md")).read()
    claims = TIER_CLAIM_RE.findall(readme)
    assert claims, (
        "README.md must quote the test-tier walls with the syntax "
        "'measured ~Nm (BENCH_TIERS.json)' — one per tier (fast / not "
        "fuzz / full); prose numbers without the artifact reference "
        "were the r10 failure"
    )
    path = os.path.join(REPO, "BENCH_TIERS.json")
    assert os.path.exists(path), "BENCH_TIERS.json is claimed but absent"
    tiers = json.load(open(path))
    measured = sorted(
        round(v["wall_sec"] / 60) for k, v in tiers.items()
        if isinstance(v, dict) and "wall_sec" in v
    )
    claimed = sorted(int(c) for c in claims)
    assert claimed == measured, (
        f"README tier minutes {claimed} != BENCH_TIERS.json minutes "
        f"{measured}: re-measure (pytest per tier on the idle box), "
        "update BENCH_TIERS.json, and quote the new numbers"
    )

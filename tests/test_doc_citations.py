"""Doc-lint: every exp/ artifact cited in docs/*.md must be committed.

Round-4 VERDICT weak #3: harvest logs cited by published tables were on
disk but uncommitted (or lost to a VM reset) — one reset away from the
tables being unverifiable.  This test makes the CLAUDE.md harvest rule
("exp/ is gitignored — git add -f harvest logs") machine-checked: any
``exp/...`` path a doc cites must appear in ``git ls-files``, unless the
doc explicitly annotates it as lost (the path appears on a line
containing "lost").
"""

import re
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

_CITE = re.compile(r"exp/[A-Za-z0-9_{},./-]*[A-Za-z0-9_}]")


def _expand_braces(s):
    m = re.search(r"\{([^{}]*)\}", s)
    if not m:
        return [s]
    out = []
    for alt in m.group(1).split(","):
        out.extend(_expand_braces(s[: m.start()] + alt + s[m.end():]))
    return out


def _cited_paths():
    """(path, doc, line_text) for every exp/ citation in docs/*.md."""
    for doc in sorted((REPO / "docs").glob("*.md")):
        for line in doc.read_text().splitlines():
            for raw in _CITE.findall(line):
                for p in _expand_braces(raw):
                    yield p.rstrip("."), doc.name, line


def test_cited_exp_artifacts_are_committed():
    tracked = set(
        subprocess.run(
            ["git", "ls-files", "exp"], cwd=REPO,
            capture_output=True, text=True, check=True,
        ).stdout.split()
    )
    # Directory citations count as satisfied if any tracked file is inside.
    tracked_dirs = {str(Path(t).parent) for t in tracked}

    missing = []
    for path, doc, line in _cited_paths():
        if "lost" in line.lower():
            continue  # annotated lost-to-reset artifact
        if "build_doc_corpus" in line:
            continue  # regenerable: the citing line names the generator
        if path in tracked or path in tracked_dirs:
            continue
        if any(t.startswith(path + "/") for t in tracked):
            continue
        missing.append(f"{doc}: {path}")
    assert not missing, (
        "docs cite exp/ artifacts not in git (git add -f them, or annotate "
        "the citing line with 'lost'): " + "; ".join(sorted(set(missing)))
    )


if __name__ == "__main__":
    pytest.main([__file__, "-q"])

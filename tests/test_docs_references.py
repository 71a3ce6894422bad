"""Artifact/claim consistency gate (VERDICT r4 items 1 + 10).

Round 4 shipped docs claiming artifacts (`docs/ral23_results_stiction.md`)
that did not exist in the tree.  This fast test makes that class of stale
claim impossible to ship silently:

  1. every `docs/<file>.md` / `docs/<file>.json` path mentioned in README,
     any docs/*.md file, or a scripts/*.py module docstring must exist;
  2. every recorded sweep JSON must carry a provenance stamp (script name +
     git hash + matmul precision) so the generating revision is auditable.
"""

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

# docs/<stem>.<ext> references, tolerating `docs/foo.{md,json}` brace shorthand
_REF_RE = re.compile(r"docs/([A-Za-z0-9_.-]+?)\.(md|json|log|\{md,json\})")


def _referenced_docs():
    sources = [REPO / "README.md"]
    sources += sorted((REPO / "docs").glob("*.md"))
    sources += sorted((REPO / "scripts").glob("*.py"))
    refs = {}
    for src in sources:
        text = src.read_text(errors="replace")
        for m in _REF_RE.finditer(text):
            stem, ext = m.group(1), m.group(2)
            if ext == "{md,json}":
                names = [f"{stem}.md", f"{stem}.json"]
            else:
                names = [f"{stem}.{ext}"]
            for n in names:
                refs.setdefault(n, set()).add(
                    str(src.relative_to(REPO))
                )
    return refs


def test_every_referenced_doc_exists():
    missing = {
        name: sorted(srcs)
        for name, srcs in _referenced_docs().items()
        if not (REPO / "docs" / name).exists()
    }
    assert not missing, (
        "docs referenced but absent from the tree (stale claims): "
        f"{missing}"
    )


def test_recorded_sweeps_carry_provenance():
    stamped = [
        "ral23_results.json",
        "ral23_results_stiction.json",
        "ral23_results_regularized.json",
        "aligned_differential.json",
        "ral25_results_h20.json",
    ]
    for name in stamped:
        path = REPO / "docs" / name
        assert path.exists(), f"recorded sweep artifact missing: {name}"
        data = json.loads(path.read_text())
        prov = data.get("_provenance")
        assert prov, f"{name} lacks a _provenance stamp"
        for key in ("script", "git_hash", "matmul_precision",
                    "friction_model"):
            assert key in prov, f"{name} provenance missing {key!r}"

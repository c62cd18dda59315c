#!/usr/bin/env python3
"""Pre-commit guard for the per-row evidence checklist.

A commit that REGISTERS a new query row (a `QueryDef("name"` that HEAD
does not have) must also stage the row's evidence kit:
  - a BASELINE.md mention (the solo pin),
  - a SCALE.md mention (the x10 growth ratio),
  - a COVERAGE.md mention (the round-section row).

Rounds 15/16 satisfied this protocol manually; the guard makes the
discipline structural — a new row with a missing kit fails the commit
loudly instead of shipping undocumented.

Escape hatch for work-in-progress commits: GRAFT_SKIP_ROWCHECK=1.
Install: ln -sf ../../tools/precommit_rowcheck.py .git/hooks/pre-commit
"""
import os
import re
import subprocess
import sys

NAME_RE = re.compile(r'QueryDef\(\s*"([a-z0-9_]+)"', re.S)


def names_at(rev: str) -> set:
    """All registered QueryDef names in src/main at the given rev
    (":0" = the index / staged tree)."""
    try:
        if rev == ":0":
            # the INDEX list, so files added by this very commit are seen
            files = subprocess.run(
                ["git", "ls-files", "--cached", "--", "src/main"],
                capture_output=True, text=True, check=True).stdout.split()
        else:
            files = subprocess.run(
                ["git", "ls-tree", "-r", "--name-only", rev, "src/main"],
                capture_output=True, text=True, check=True).stdout.split()
    except subprocess.CalledProcessError:
        return set()  # fresh repo: no HEAD yet
    out = set()
    for f in files:
        if not f.endswith(".scala"):
            continue
        spec = f"{rev}:{f}" if rev != ":0" else f":0:{f}"
        r = subprocess.run(["git", "show", spec], capture_output=True,
                           text=True)
        if r.returncode == 0:
            out.update(NAME_RE.findall(r.stdout))
    return out


def staged_doc(path: str) -> str:
    r = subprocess.run(["git", "show", f":0:{path}"], capture_output=True,
                       text=True)
    return r.stdout if r.returncode == 0 else ""


def main() -> int:
    if os.environ.get("GRAFT_SKIP_ROWCHECK") == "1":
        return 0
    # prose counts are checked UNCONDITIONALLY: the stale-count commit
    # shapes are exactly the ones the evidence-kit gate skips (doc-only
    # edits, and src commits that REMOVE a QueryDef — 'new' is empty for
    # both), so this must run before any early return
    prose = check_prose_counts()
    if prose != 0:
        return prose
    # anything staged under src/main? (cheap early exit for doc-only commits)
    staged = subprocess.run(
        ["git", "diff", "--cached", "--name-only"],
        capture_output=True, text=True, check=True).stdout.split()
    if not any(f.startswith("src/main") and f.endswith(".scala")
               for f in staged):
        return 0
    new = names_at(":0") - names_at("HEAD")
    if not new:
        return 0
    docs = {p: staged_doc(p) for p in
            ("BASELINE.md", "SCALE.md", "COVERAGE.md")}
    missing = []
    for name in sorted(new):
        # word-boundary match: plain substring would let a new row whose
        # name is a prefix of an existing documented row (q_avro after
        # q_avro_source) false-pass all three checks
        pat = re.compile(rf"\b{re.escape(name)}\b")
        lacks = [p for p, txt in docs.items() if not pat.search(txt)]
        if lacks:
            missing.append((name, lacks))
    if missing:
        print("precommit_rowcheck: new query rows lack their evidence kit:",
              file=sys.stderr)
        for name, lacks in missing:
            print(f"  {name}: missing from {', '.join(lacks)}",
                  file=sys.stderr)
        print("Stage a BASELINE.md solo pin, a SCALE.md x10 ratio, and a "
              "COVERAGE.md row for each (or GRAFT_SKIP_ROWCHECK=1 for WIP).",
              file=sys.stderr)
        return 1
    return 0


# "All NNN registered queries" style claims that go stale when rows land
# (README.md:243 said 252 while the registry was 254 — r19 verdict item).
# Any staged prose count of "registered queries" must equal the staged
# registry's QueryDef count.
PROSE_RE = re.compile(r"\b(\d+)\s+registered\s+quer(?:y|ies)", re.I)


def check_prose_counts() -> int:
    actual = len(names_at(":0"))
    if actual == 0:
        return 0
    bad = []
    for doc in ("README.md", "SURVEY.md", "COVERAGE.md"):
        txt = staged_doc(doc)
        if not txt:
            # fall back to the working tree: a src-only commit must still
            # fail if the checked-in prose is stale
            try:
                with open(doc, encoding="utf-8") as f:
                    txt = f.read()
            except OSError:
                continue
        for m in PROSE_RE.finditer(txt):
            if int(m.group(1)) != actual:
                bad.append((doc, m.group(0)))
    if bad:
        print(f"precommit_rowcheck: stale prose registry counts "
              f"(registry has {actual} QueryDefs):", file=sys.stderr)
        for doc, claim in bad:
            print(f"  {doc}: '{claim}'", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

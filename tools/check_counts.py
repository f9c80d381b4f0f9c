#!/usr/bin/env python3
"""Guard against README/SKILL query-count drift (a recurring VERDICT nit:
r5 said 191 when the contract was 191-going-on-198; r6 said 195/197 when
it was 196/198).

The scan is SCOPED to the registration map bodies (`val queries ... =
Map(...)` / `val oracle ... = Map(...)`, extracted by paren balancing)
— the ADVICE-r7 fix: a query name merely MENTIONED elsewhere (a comment,
a helper map, an arrow-containing string) no longer reclassifies it.
A name in a queries body is a contract query; a name also in an oracle
body is oracle-checked; queries-only names are rows-only (a01/a02
native sketches, by design).

ContractCountsSpec is the authoritative compiled-contract guard inside
`sbt test`; this script is the no-JVM quick check.

Usage: python3 tools/check_counts.py    (exit 1 on drift)
"""
import pathlib
import re
import sys

root = pathlib.Path(__file__).resolve().parent.parent
name_pat = re.compile(r'"([a-z]\d{2}[a-z0-9_]*)"\s*->')
decl_pat = re.compile(r'val (queries|oracle)\b')
map_open = re.compile(r'Map\s*\(')


def map_body(text, start):
    """Balanced-paren body of the first `Map(` at/after start (the type
    annotation uses `Map[...]`, so `Map(` is the literal)."""
    m = map_open.search(text, start)
    if not m:
        return ""
    i = m.end() - 1
    depth, j = 0, i
    while j < len(text):
        if text[j] == "(":
            depth += 1
        elif text[j] == ")":
            depth -= 1
            if depth == 0:
                return text[i:j + 1]
        j += 1
    return text[i:]


queries, oracle = set(), set()
for f in (root / "src" / "main" / "scala").rglob("*.scala"):
    text = f.read_text()
    for m in decl_pat.finditer(text):
        names = {n.group(1) for n in name_pat.finditer(map_body(text, m.end()))}
        (queries if m.group(1) == "queries" else oracle).update(names)

total = len(queries)
rows_only = sorted(queries - oracle)
checked = total - len(rows_only)
stray = sorted(oracle - queries)
print(f"contract: {total} queries, {checked} oracle-checked, "
      f"rows-only: {', '.join(rows_only)}")

fails = []
if stray:
    fails.append(f"oracle entries with no query registration: {stray}")

readme = (root / "README.md").read_text()
m = re.search(r"(\d+) of the (\d+) queries", readme)
if not m:
    fails.append("README.md: could not find the 'N of the M queries' line")
elif (int(m.group(1)), int(m.group(2))) != (checked, total):
    fails.append(f"README.md says {m.group(1)}/{m.group(2)}, "
                 f"contract is {checked}/{total}")

mig = (root / "MIGRATION.md").read_text()
m = re.search(r"`SparkEntry.queries` \((\d+) queries", mig)
if not m:
    fails.append("MIGRATION.md: could not find the '(N queries' line")
elif int(m.group(1)) != total:
    fails.append(f"MIGRATION.md says {m.group(1)}, contract is {total}")

skill_path = root / ".claude" / "skills" / "verify" / "SKILL.md"
if skill_path.exists():
    skill = skill_path.read_text()
    m = re.search(r"Expect `(\d+) pass", skill)
    if not m:
        fails.append("SKILL.md: could not find the 'Expect `N pass' line")
    elif int(m.group(1)) != checked:
        fails.append(f"SKILL.md expects {m.group(1)} passes, "
                     f"contract is {checked}")

if fails:
    for f in fails:
        print(f"DRIFT: {f}")
    sys.exit(1)
print("counts in sync")

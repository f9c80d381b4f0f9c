#!/usr/bin/env python3
"""Guard against README/SKILL query-count drift (a recurring VERDICT nit:
r5 said 191 when the contract was 191-going-on-198; r6 said 195/197 when
it was 196/198).

Counts the contract from the SOURCE: every `"xNN_name" ->` registration
in src/main/scala. A query registered in both a `queries` map and an
`oracle`/`oracleSql` map appears >= 2x (oracle-checked); a name appearing
exactly once is a rows-only query (a01/a02 native sketches, by design).
Compares the derived (total, oracle-checked) pair against the numbers
written in README.md and .claude/skills/verify/SKILL.md.

Usage: python3 tools/check_counts.py    (exit 1 on drift)
"""
import pathlib
import re
import sys

root = pathlib.Path(__file__).resolve().parent.parent
pat = re.compile(r'"([a-z]\d{2}[a-z0-9_]*)"\s*->')

names = {}
for f in (root / "src" / "main" / "scala").rglob("*.scala"):
    for m in pat.finditer(f.read_text()):
        names[m.group(1)] = names.get(m.group(1), 0) + 1

total = len(names)
rows_only = sorted(n for n, c in names.items() if c == 1)
checked = total - len(rows_only)
print(f"contract: {total} queries, {checked} oracle-checked, "
      f"rows-only: {', '.join(rows_only)}")

fails = []

readme = (root / "README.md").read_text()
m = re.search(r"(\d+) of the (\d+) queries", readme)
if not m:
    fails.append("README.md: could not find the 'N of the M queries' line")
elif (int(m.group(1)), int(m.group(2))) != (checked, total):
    fails.append(f"README.md says {m.group(1)}/{m.group(2)}, "
                 f"contract is {checked}/{total}")

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

"""Regenerate tests/gate_proven.json — the schema-proven manifest.

The smoke-tier atomic-schema gate (tests/test_gate_schema.py) skips
queries the driver has already hashed (a green CORRECTNESS row proves
the schema was pandas-canonicalizable).  That exemption must die when
the gate function changes — a rewired or edited ``_q_*`` can introduce
a nested column the stale green row would mask.  So the manifest keys
each proven query on the md5 of its gate function's source: the test
honors an entry only while the source hash still matches.

Only GIT-TRACKED CORRECTNESS_r*.json files count (untracked/stale
artifacts in the working tree must not grant exemptions).  Run after
each round's CORRECTNESS file is committed:

    python scripts/update_gate_proven.py
"""

from __future__ import annotations

import hashlib
import inspect
import json
import subprocess
import sys

sys.path.insert(0, "/root/repo")

MANIFEST = "/root/repo/tests/gate_proven.json"


def source_hash(fn) -> str:
    return hashlib.md5(inspect.getsource(fn).encode()).hexdigest()


def main() -> int:
    import __spark_entry__ as entry

    tracked = subprocess.run(
        ["git", "-C", "/root/repo", "ls-files", "CORRECTNESS_r*.json"],
        capture_output=True, text=True, check=True,
    ).stdout.split()

    proven = set()
    for path in tracked:
        data = json.load(open(f"/root/repo/{path}"))
        for name, rec in data.items():
            if isinstance(rec, dict) and not rec.get("err"):
                proven.add(name)

    qs = entry.queries()
    manifest = {name: source_hash(qs[name])
                for name in sorted(proven) if name in qs}
    with open(MANIFEST, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {MANIFEST}: {len(manifest)} proven queries "
          f"(from {len(tracked)} tracked CORRECTNESS files)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

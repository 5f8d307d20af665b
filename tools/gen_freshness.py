"""Generate FRESHNESS.json — per-query driver-evidence ledger computed
FROM the CORRECTNESS_r*.json artifacts instead of maintained as prose
(VERDICT r12 ask #4: the hand-written freshness claim missed one entry;
a derived table cannot).

For every query in the current registry: the latest round whose driver
CORRECTNESS artifact contains it with a clean result (no err and, when
an oracle exists, hash_match), plus the list of never-sampled entries
and the minimum evidence round across the registry.

Usage: python tools/gen_freshness.py   (writes FRESHNESS.json at repo
root and prints the summary line)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from polar_spark.queries import QUERIES  # imports register the registry

    evidence: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        with open(path) as f:
            data = json.load(f)
        for name, res in data.items():
            if not isinstance(res, dict):
                continue
            # clean evidence: hash-green when an oracle ran; for the
            # by-design rows-only entries the driver records
            # err="no_oracle" and the returned row count is the check
            err = res.get("err")
            if err == "no_oracle":
                if not res.get("spark_rows"):
                    continue
            elif err or res.get("hash_match") is False:
                continue
            evidence[name] = max(evidence.get(name, -1), rnd)

    registry = sorted(QUERIES)
    per_query = {q: evidence.get(q) for q in registry}
    sampled = {q: r for q, r in per_query.items() if r is not None}
    never = sorted(q for q, r in per_query.items() if r is None)
    out = {
        "rounds_scanned": sorted(rounds),
        "registry_size": len(registry),
        "sampled": len(sampled),
        "never_driver_sampled": never,
        "min_evidence_round": min(sampled.values()) if sampled else None,
        "stalest": sorted(sampled, key=sampled.get)[:15],
        "evidence_round": dict(sorted(sampled.items())),
    }
    dst = os.path.join(REPO, "FRESHNESS.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        json.dumps(
            {
                "registry": len(registry),
                "sampled": len(sampled),
                "never": never,
                "min_evidence_round": out["min_evidence_round"],
                "stalest_5": out["stalest"][:5],
            }
        )
    )


if __name__ == "__main__":
    main()

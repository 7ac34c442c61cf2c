"""README banner counts must match the live registry (VERDICT r14
item 5: the hand-edited counts drifted three rounds running)."""

import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_readme_counts_match_registry():
    from tools.registry_counts import counts

    n_q, n_o = counts()
    readme = (REPO / "README.md").read_text()
    m = re.search(r"\((\d+); (\d+) with oracles\)", readme)
    assert m, "README.md lost its '(<N>; <M> with oracles)' banner"
    assert (int(m.group(1)), int(m.group(2))) == (n_q, n_o), (
        f"README banner says {m.group(1)}/{m.group(2)} but the registry "
        f"holds {n_q} registered / {n_o} oracle-backed — update README.md "
        "(run: python tools/registry_counts.py)"
    )

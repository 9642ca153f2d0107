"""Per-sf-dir scratch paths for sink-style operators.

Lives in its own module (not operators.relational) so that modules
needing a scratch dir don't transitively trigger relational.py's
query registration — registry.load_all() controls registration order
for bounded verification sweeps.
"""

from __future__ import annotations

import tempfile
from pathlib import Path

_SCRATCH = Path(tempfile.gettempdir()) / "svs_scratch"


def scratch(sf_dir: str, name: str) -> str:
    p = _SCRATCH / Path(sf_dir).name / name
    p.parent.mkdir(parents=True, exist_ok=True)
    return str(p)

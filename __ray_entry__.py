"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the rayrep library) calls ``ray.init``/``ray.shutdown``.

- ``entry()``: flagship streaming CDC replay — a changelog derived from
  ``/root/testdata/sf0.001`` scale, replayed through augment → hash
  shuffle → stateful applier → exactly-once manifests; returns the
  converged transcript lake table.
- ``queries()``: one entry per implemented operator (SURVEY.md §2 plus the
  training-data ops); each callable takes ``sf_dir``.
- ``oracle_sql()``: DuckDB-equivalent SQL per query where expressible;
  heuristic/stateful ops are rows-only (pytest oracles cover them).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

sys.path.insert(0, str(Path(__file__).resolve().parent))

from rayrep import queries as _q


def entry() -> Any:
    """Flagship pipeline at sf0.001 scale; driver checks rows >= 0."""
    return _q.cdc_replay_transcripts("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()

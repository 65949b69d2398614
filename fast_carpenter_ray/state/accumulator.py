"""Driver-collectable counter accumulator (named Ray actor).

Used when a pipeline needs the CutFlow's *filtered stream* and its counters
in ONE pass: the pure alternative (a second consumption of the dataset for
``CutFlow.cutflow``) re-executes upstream stages.  The actor gives the same
single-run exactness guarantee as the reference's in-worker accumulators
(``backends/coffea.py:59-74``) — and the same caveat: a retried block would
double-count.  For retry-exact counters use the pure two-phase
``CutFlow.cutflow`` path instead (it is what the correctness oracle uses).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["CutflowAccumulator"]


def CutflowAccumulator():
    """Create the accumulator actor (deferred ``ray.remote`` so importing
    this module never touches Ray)."""
    import ray

    @ray.remote(num_cpus=0)
    class _CutflowAccumulator:
        def __init__(self):
            self._totals: Dict[str, np.ndarray] = {}

        def add(self, name: str, counters) -> None:
            counters = np.asarray(counters)
            if name in self._totals:
                self._totals[name] = self._totals[name] + counters
            else:
                self._totals[name] = counters

        def totals(self) -> Dict[str, np.ndarray]:
            return dict(self._totals)

        def reset(self) -> None:
            self._totals.clear()

    return _CutflowAccumulator.remote()

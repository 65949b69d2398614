"""Run manifest — the reproducibility record.

Reference analogue: the book-keeping tarball of configs + versions +
platform + user metadata (``fast_carpenter/bookkeeping.py:71-111``).  Ours
is a JSON manifest written into the checkpoint directory so a resumed run
can verify it is resuming the *same* pipeline.
"""

from __future__ import annotations

import json
import os
import platform
import time
from typing import Any, Dict, Optional

__all__ = ["write_manifest", "read_manifest"]


def write_manifest(out_dir: str, config: Optional[Dict[str, Any]] = None,
                   **run_args) -> str:
    import numpy
    import pyarrow
    import ray

    os.makedirs(out_dir, exist_ok=True)
    manifest = {
        "written_at": time.time(),
        "platform": platform.platform(),
        "python": platform.python_version(),
        "versions": {
            "ray": ray.__version__,
            "pyarrow": pyarrow.__version__,
            "numpy": numpy.__version__,
        },
        "config": config,
        "run_args": run_args,
    }
    path = os.path.join(out_dir, "run_manifest.json")
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, default=str)
    os.replace(tmp, path)
    return path


def read_manifest(out_dir: str) -> Optional[Dict[str, Any]]:
    path = os.path.join(out_dir, "run_manifest.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)

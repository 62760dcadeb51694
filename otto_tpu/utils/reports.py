"""Report naming + numeric summaries (C3 parity).

Mirrors the reference utilities: timestamp+git-hash artifact names
(reference: utils.py:56-74) and percentile describe tables
(reference: utils.py:17-34).
"""
from __future__ import annotations

import subprocess
from datetime import datetime
from typing import Dict, List, Optional, Sequence

import numpy as np


def git_hash(short: int = 8) -> Optional[str]:
    try:
        out = subprocess.check_output(
            ["git", "log", "-1", "--pretty=format:%H"],
            stderr=subprocess.DEVNULL,
        )
        return out.decode()[:short]
    except Exception:
        return None


def timestamp() -> str:
    return datetime.now().strftime("%Y%m%d%H%M%S")


def report_name(prefix: str = "submission", tag: Optional[str] = None) -> str:
    """`{prefix}-{timestamp}[-tag][-githash]` (reference: utils.py:70-74)."""
    parts = [prefix, timestamp()]
    if tag:
        parts.append(tag)
    h = git_hash()
    if h:
        parts.append(h)
    return "-".join(parts)


def describe_numeric(
    values: np.ndarray,
    percentiles: Sequence[float] = (0.01, 0.05, 0.10, 0.25, 0.50, 0.75, 0.90, 0.95, 0.99),
) -> Dict[str, float]:
    """Percentile summary of a 1-D array (reference: utils.py:17-34)."""
    v = np.asarray(values, np.float64)
    out = {
        "count": float(v.size),
        "mean": float(v.mean()) if v.size else float("nan"),
        "std": float(v.std()) if v.size else float("nan"),
        "min": float(v.min()) if v.size else float("nan"),
        "max": float(v.max()) if v.size else float("nan"),
    }
    for p in percentiles:
        out[f"{int(p * 100)}%"] = float(np.percentile(v, p * 100)) if v.size else float("nan")
    return out
